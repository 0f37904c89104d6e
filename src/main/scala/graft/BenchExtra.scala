package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

import graft.app.FilterJob
import graft.fixture.{ClipGen, GenMain}

/** Supplementary benchmarks NOT part of the frozen driver contract
  * (graft.Bench is hashed and unchanged): guide-§1.4 noop-sink isolation
  * per declared query — timing the COMPUTATION of every column of every
  * row without the count()'s column pruning — plus the filter-job
  * per-stage breakdown (decode+write / stats / commit per chunk, via
  * FilterJob's timing prints) that attributes pipeline_nN minus
  * decode_score_nN. Reads the same SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS
  * contract, prints one JSON line, and writes the full JSON to
  * BENCH/last_run_extra.json so the numbers survive stdout truncation. */
object BenchExtra {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def best3(f: => Unit): Double = (1 to 3).map(_ => timed(f)).min

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS",
      if (sfDir.contains("sf0.1")) "50000" else "5000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("clips_")).foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"noop:$name")
        noop(fn(spark, sfDir)) // warm
        results(s"noop_$name") = best3(noop(fn(spark, sfDir)))
      }

    // ---- filter-job stage breakdown at local[cpus] -----------------------
    // same fixture path and job parameters as graft.Bench's pipeline rows;
    // the per-chunk stage prints (decode+write / stats / commit) land on
    // stdout via FilterJob's timing flag
    sys.props("graft.job.timing") = "1"
    val clipsDir = s"/tmp/graft_bench/clips_n${benchRows}_s42_f256_g2"
    if (!Files.exists(Paths.get(clipsDir, "_SUCCESS")))
      GenMain.generate(spark, clipsDir, ClipGen.Params(benchRows, seed = 42L),
        files = 256)
    def wipe(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      val path = Paths.get(p)
      if (Files.exists(path))
        Files.walk(path).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists)
    }
    val model = spark.sparkContext.broadcast(graft.text.TextModel.default)
    def countOnly(): Unit = {
      graft.pipeline.FilterPipeline.decisions(
        FilterJob.readClips(spark, Seq(clipsDir)),
        graft.model.Presets.default, model).count()
      ()
    }
    spark.sparkContext.setJobDescription("pipeline: decode+score only")
    (1 to 2).foreach(_ => countOnly())
    results(s"decode_score_n$cpus") = best3(countOnly())
    spark.sparkContext.setJobDescription("pipeline: full job")
    def runJob(out: String): Double = {
      wipe(out)
      timed {
        FilterJob.run(spark, FilterJob.JobArgs(clipsDir, out, chunks = 4,
          saltBuckets = 8))
        ()
      }
    }
    runJob("/tmp/graft_bench/outx_warm")
    results(s"pipeline_n$cpus") =
      (1 to 3).map(_ => runJob(s"/tmp/graft_bench/outx_$cpus")).min
    results(s"pipeline_minus_decode_n$cpus") =
      results(s"pipeline_n$cpus") - results(s"decode_score_n$cpus")

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val json =
      f"""{"metric":"extra","unit":"sec","sf":"$sfDir","bench_rows":$benchRows,"queries":$qs}"""
    println(json)
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/last_run_extra.json"), json + "\n")
    spark.stop()
  }
}
