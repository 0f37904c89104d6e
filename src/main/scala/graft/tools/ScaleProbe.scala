package graft.tools

import org.apache.spark.sql.SparkSession
import graft.app.FilterJob

/** Focused repeated full-job runs at two core counts for scaling analysis. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val clipsDir = "/tmp/graft_bench/clips_n50000_s42_f256"
    def phase(cores: Int, reps: Int): Seq[Double] = {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // warm
      BenchProbe.wipe("/tmp/graft_bench/sp_w")
      FilterJob.run(spark, FilterJob.JobArgs(clipsDir, "/tmp/graft_bench/sp_w", chunks = 4, saltBuckets = 8))
      val xs = (1 to reps).map { _ =>
        BenchProbe.wipe("/tmp/graft_bench/sp")
        BenchProbe.timed(
          FilterJob.run(spark, FilterJob.JobArgs(clipsDir, "/tmp/graft_bench/sp", chunks = 4, saltBuckets = 8)): Unit)
      }
      println(f"[scale] n$cores: min ${xs.min}%.2f  all ${xs.map(x => f"$x%.2f").mkString(",")}")
      spark.stop()
      xs
    }
    val reps8 = if (args.nonEmpty) args(0).toInt else 5
    val reps2 = if (args.length > 1) args(1).toInt else 3
    val hi = phase(8, reps8)
    val lo = phase(2, reps2)
    println(f"[scale] eff(2->8) = ${(lo.min / hi.min) / 4}%.3f")
  }
}
