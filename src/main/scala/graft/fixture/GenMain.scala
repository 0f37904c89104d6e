package graft.fixture

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Writes the deterministic synthetic clips table as parquet (the engine's
  * input fixture at test/bench scales — FIXTURES.md §2).
  *
  *   runMain graft.fixture.GenMain <outDir> <rows> [seed] [maxDurMs] [files]
  *
  * Generation is a pure function of (seed, row index): any partitioning
  * produces identical rows, so files are written in `files` balanced slices.
  */
object GenMain {

  /** Generate and write; reusable from bench/test code. */
  def generate(spark: SparkSession, outDir: String, params: ClipGen.Params,
               files: Int = 32): Unit = {
    import spark.implicits._
    spark.range(0, params.n, 1, files)
      .map(i => ClipGen.row(i, params))
      // encoded audio is high-entropy (measured 96% snappy ratio on the
      // bytes column, which is >99% of the table): compression is pure
      // decode-side overhead on every scan (guide §6 / §2.3), so the blob
      // fixture is written uncompressed — values are identical either way
      .write.mode(SaveMode.Overwrite)
      .option("compression", "uncompressed").parquet(outDir)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val n = args(1).toLong
    val seed = if (args.length > 2) args(2).toLong else 42L
    val maxDur = if (args.length > 3) args(3).toInt else 30000
    val files = if (args.length > 4) args(4).toInt else 32
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    generate(spark, outDir, ClipGen.Params(n, seed, maxDurMs = maxDur), files)
    println(f"[gen] wrote $n rows to $outDir in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
