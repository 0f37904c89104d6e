package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter-sweep timing probe for embNearDupLsh: bands × rowsPerBand ×
  * probeBits × maxBucket combos with warm best-of-3 and pair counts — how
  * the 40×8+1-probe re-parameterization and its cap cost were measured. */
object EmbTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def run(b: Int, r: Int, pb: Int, cap: Int): Set[(Long, Long)] =
      graft.pipeline.Dedup.embNearDupLsh(
        emb, "vec_id", "embedding", 64, 0.45, b, r, probeBits = pb, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((b, r, pb, cap) <- Seq((40,8,1,256),(40,8,1,0),(48,8,1,256),(96,6,0,256),(32,2,0,0))) {
      val s = run(b, r, pb, cap)
      val t = (1 to 3).map(_ => timed(run(b, r, pb, cap): Unit)).min
      println(f"b=$b r=$r probe=$pb cap=$cap pairs=${s.size} best3=$t%6.2f s")
    }
    spark.stop()
  }
}
