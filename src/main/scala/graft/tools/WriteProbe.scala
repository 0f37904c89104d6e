package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.app.FilterJob
import graft.pipeline.FilterPipeline

/** Write-path matrix: codec × checksum × cores. */
object WriteProbe {
  def wipe(p: String): Unit = BenchProbe.wipe(p)
  def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

  def run(cores: Int, codec: String, rawFs: Boolean): Unit = {
    val b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.compression.codec", codec)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    if (rawFs) b.config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val model = spark.sparkContext.broadcast(graft.text.TextModel.default)
    val feats = FilterPipeline.decisions(
      FilterJob.readClips(spark, Seq("/tmp/graft_bench/clips_n50000_s42_f256")),
      graft.model.Presets.default, model)
    def w(): Unit = {
      wipe("/tmp/graft_bench/wprobe")
      feats.repartition(col("keep"), col("lang"),
          pmod(xxhash64(col("clip_id")), lit(8)))
        .write.mode("overwrite").partitionBy("keep", "lang")
        .parquet("/tmp/graft_bench/wprobe")
    }
    w() // warm
    val xs = (1 to 3).map(_ => timed(w()))
    println(f"[wprobe] cores=$cores codec=$codec rawFs=$rawFs: median ${xs.sorted.apply(1)}%.2f (${xs.map(x => f"$x%.2f").mkString(",")})")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    run(32, "snappy", rawFs = false)
    run(32, "zstd", rawFs = false)
    run(32, "snappy", rawFs = true)
    run(8, "snappy", rawFs = true)
    run(8, "zstd", rawFs = false)
  }
}
