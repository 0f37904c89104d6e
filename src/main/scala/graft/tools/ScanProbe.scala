package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-path experiments over the bench clips fixture: parquet codec and
  * reader-mode cost for the large incompressible `bytes` column. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val snap = "/tmp/graft_bench/clips_n50000_s42_f256_g2"
    val unc = "/tmp/graft_bench/clips_uncomp"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(unc, "_SUCCESS")))
      spark.read.parquet(snap)
        .write.option("compression", "uncompressed").parquet(unc)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best3(tag: String)(f: => Unit): Unit = {
      f
      println(f"[scan] $tag%-40s ${(1 to 3).map(_ => timed(f)).min}%6.2f s")
    }
    def scanAll(path: String): Unit =
      spark.read.parquet(path)
        .select(sum(length(col("bytes"))), sum(length(col("transcript"))),
          sum(col("sr_hz")), sum(col("dur_ms")))
        .collect(): Unit

    best3("snappy, vectorized")(scanAll(snap))
    best3("uncompressed, vectorized")(scanAll(unc))
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    best3("snappy, row reader")(scanAll(snap))
    best3("uncompressed, row reader")(scanAll(unc))
    spark.stop()
  }
}
