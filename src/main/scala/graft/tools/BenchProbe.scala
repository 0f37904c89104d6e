package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.app.FilterJob
import graft.pipeline.FilterPipeline

/** Warm-median probe: decode-stage vs write-path cost at two core counts. */
object BenchProbe {

  def wipe(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val path = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.walk(path).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists)
  }

  def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def phase(cores: Int, warmups: Int): Unit = {
    val spark = session(cores)
    val model = spark.sparkContext.broadcast(graft.text.TextModel.default)
    val clips = FilterJob.readClips(spark, Seq("/tmp/graft_bench/clips_n20000_s42_f256"))
    def count(): Unit = {
      FilterPipeline.decisions(clips, graft.model.Presets.default, model).count(): Unit
    }
    def write(): Unit = {
      wipe("/tmp/graft_bench/probe_w")
      FilterPipeline.decisions(clips, graft.model.Presets.default, model)
        .repartition(64, pmod(xxhash64(col("clip_id")), lit(64)))
        .write.mode("overwrite").partitionBy("keep", "lang")
        .parquet("/tmp/graft_bench/probe_w")
    }
    def job(): Unit = {
      wipe("/tmp/graft_bench/probe_j")
      FilterJob.run(spark, FilterJob.JobArgs("/tmp/graft_bench/clips_n20000_s42_f256",
        "/tmp/graft_bench/probe_j", chunks = 4, saltBuckets = 64)): Unit
    }
    (1 to warmups).foreach(_ => count())
    val c = (1 to 3).map(_ => timed(count()))
    val w = (1 to 3).map(_ => timed(write()))
    val j = (1 to 3).map(_ => timed(job()))
    println(f"[probe] n$cores count: median ${median(c)}%.2f  (${c.map(x => f"$x%.2f").mkString(",")})")
    println(f"[probe] n$cores write: median ${median(w)}%.2f  (${w.map(x => f"$x%.2f").mkString(",")})")
    println(f"[probe] n$cores job:   median ${median(j)}%.2f  (${j.map(x => f"$x%.2f").mkString(",")})")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    phase(32, warmups = 3)
    phase(8, warmups = 1)
  }
}
