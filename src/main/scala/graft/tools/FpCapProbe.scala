package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Output-invariance + timing probe for fingerprintNearDup's guards: runs
  * the pipeline with/without the stop-gram DF cap and reports pair-set
  * deltas against the uncapped baseline — how the q_docs_fingerprint cap
  * value was validated (equal output down to cap 512 on these corpora). */
object FpCapProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val copies = d.filter(col("doc_id") < 30)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" xqz")).as("text"))
    val docs = d.union(copies)
    def pairSet(df: DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed(tag: String)(f: => Set[(Long, Long)]): Set[(Long, Long)] = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  pairs=${r.size}"); r
    }
    // warm
    pairSet(Dedup.fingerprintNearDup(docs, "doc_id", "text"))
    val base = timed("uncapped")(pairSet(Dedup.fingerprintNearDup(docs, "doc_id", "text")))
    for (cap <- Seq(0, 512)) {
      val c = timed(s"fpJ-tier cap=$cap")(pairSet(
        Dedup.fingerprintNearDup(docs, "doc_id", "text", maxDocFreq = cap)))
      println(s"  cap=$cap equal=${c == base} missing=${(base -- c).size} extra=${(c -- base).size}")
    }
    spark.stop()
  }
}
