package graft.tools
import org.apache.spark.sql.SparkSession
object DecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val model = spark.sparkContext.broadcast(graft.text.TextModel.default)
    val clips = graft.app.FilterJob.readClips(spark,
      Seq(if (args.nonEmpty) args(0) else "/tmp/graft_bench/clips_n50000_s42_f256_g2"))
    def c(): Unit = { graft.pipeline.FilterPipeline.decisions(clips, graft.model.Presets.default, model).count(): Unit }
    (1 to 2).foreach(_ => c())
    val ts = (1 to 3).map { _ => val t0=System.nanoTime(); c(); (System.nanoTime()-t0)/1e9 }
    println(f"[decprobe] best ${ts.min}%.2f all ${ts.map(t=>f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
