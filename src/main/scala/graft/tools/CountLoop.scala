package graft.tools

import org.apache.spark.sql.SparkSession
import graft.app.FilterJob
import graft.pipeline.FilterPipeline

/** Repeated warm decode-stage runs for CPU-saturation profiling. */
object CountLoop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val model = spark.sparkContext.broadcast(graft.text.TextModel.default)
    val clips = FilterJob.readClips(spark, Seq("/tmp/graft_bench/clips_n20000_s42_f256"))
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      val n = FilterPipeline.decisions(clips, graft.model.Presets.default, model).count()
      println(f"[loop] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
