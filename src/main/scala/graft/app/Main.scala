package graft.app

import org.apache.spark.sql.SparkSession

/** spark-submit entry point (SURVEY §7.2 step 7).
  *
  *   spark-submit --class graft.app.Main <jar> \
  *     --input <clips table dir> --output <decision table dir> \
  *     [--preset default] [--chunks 8] [--salt 32] [--parallel 2] \
  *     [--format parquet|jsonl|csv]
  *
  * Also runnable via `sbt "runMain graft.app.Main ..."` (master defaults to
  * local[*] when not provided by spark-submit).
  */
object Main {
  def main(rawArgs: Array[String]): Unit = {
    val a = parse(rawArgs.toList, Map.empty)
    val input = a.getOrElse("input", sys.error("--input required"))
    val output = a.getOrElse("output", sys.error("--output required"))
    val args = FilterJob.JobArgs(
      input = input,
      output = output,
      preset = a.getOrElse("preset", "default"),
      chunks = a.getOrElse("chunks", "8").toInt,
      saltBuckets = a.getOrElse("salt", "8").toInt,
      parallelChunks = a.getOrElse("parallel", "2").toInt,
      format = a.getOrElse("format", "parquet")
    )

    val builder = SparkSession.builder().appName("graft-filter")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    // master comes from spark-submit when present; default for sbt run
    val spark = sys.props.get("spark.master")
      .fold(builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]")))(_ => builder)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val counters = FilterJob.run(spark, args)
    val secs = (System.nanoTime() - t0) / 1e9

    // job summary (reference C5/G12 counters + timing, app.py:132-151)
    println(s"[graft] completed in ${f"$secs%.1f"}s; counters:")
    counters.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"[graft]   $k = $v") }
    val dec = FilterJob.readDecisions(spark, output)
    dec.groupBy("keep").count().collect()
      .foreach(r => println(s"[graft]   keep=${r.get(0)} -> ${r.getLong(1)}"))
    // persist the per-partition lineage table (north-rule lineage clause;
    // reference C4 intermediate-step lineage): cheap scalar aggregation of
    // the committed output, one small parquet next to the data
    FilterJob.lineageOf(spark, output).coalesce(1)
      .write.mode("overwrite").parquet(s"$output/lineage")
    println(s"[graft]   lineage -> $output/lineage")
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case key :: value :: rest if key.startsWith("--") =>
        parse(rest, acc + (key.stripPrefix("--") -> value))
      case Nil => acc
      case other => sys.error(s"cannot parse args at: $other")
    }
}
