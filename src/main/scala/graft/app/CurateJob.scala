package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.pipeline.{Dedup, TextProfile}
import graft.text.Scrubber

/** spark-submit entry for end-to-end document curation — the composed
  * pipeline (`q_docs_curate`'s shape) as a runnable job over a documents
  * table `(id, text, …)`:
  *
  *   spark-submit --class graft.app.CurateJob <jar> \
  *     --input <documents parquet> --output <dir> \
  *     [--id doc_id] [--text text] \
  *     [--ref <eval/benchmark parquet>] [--refText text] \
  *     [--minLen 50] [--maxPunctRatio 0.1] [--fullKeepLen 400]
  *
  * Stages, in the standard order:
  *   1. decontaminate  — drop docs whose exact text occurs in --ref
  *                       (broadcast md5 anti-join; skipped without --ref)
  *   2. scrub          — PII/toxicity regex chain; downstream stages see
  *                       the SCRUBBED text
  *   3. exact dedup    — one keeper (min id) per distinct scrubbed text;
  *                       the election shuffles only (id, md5, scalars),
  *                       never the text
  *   4. quality gate   — length ≥ minLen and punct ratio ≤ maxPunctRatio
  *   5. weighted sample— keep probability length/fullKeepLen (md5-decided,
  *                       content-stable; docs ≥ fullKeepLen always kept)
  *
  * Outputs under --output:
  *   kept/    (id, scrubbed text, n_chars_clean) of surviving documents
  *   report/  one row of per-stage survivor counts — the funnel a curation
  *            run is audited by (silent attrition is the anti-pattern)
  */
object CurateJob {

  final case class Args(
      input: String, output: String,
      idCol: String = "doc_id", textCol: String = "text",
      ref: Option[String] = None, refTextCol: String = "text",
      minLen: Int = 50, maxPunctRatio: Double = 0.1, fullKeepLen: Int = 400)

  def run(spark: SparkSession, a: Args): Map[String, Long] = {
    val docs = spark.read.parquet(a.input)
    val nIn = docs.count()

    val clean = a.ref match {
      case Some(r) =>
        Dedup.decontaminate(docs, a.textCol,
          spark.read.parquet(r).select(col(a.refTextCol)), a.refTextCol)
      case None => docs
    }

    val (sc, _) = Scrubber.scrubCol(col(a.textCol))
    // the keeper election + gates need only scalars of the scrubbed text;
    // keep the text column for the kept/ output but let the window key on
    // the hash (the exchange carries the projected row once, like exact())
    val scr = clean.select(col(a.idCol).as("id"), sc.as("sc"))
      .select(col("id"), col("sc"), md5(col("sc")).as("h"),
        length(col("sc")).as("lc"),
        length(regexp_replace(col("sc"), "[a-zA-Z0-9 ]", "")).as("pc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nClean = scr.count()
      val wnd = Window.partitionBy(col("h")).orderBy(col("id"))
      val deduped = scr.withColumn("rn", row_number().over(wnd))
        .filter(col("rn") === 1)
      val nDeduped = deduped.count()
      val quality = deduped.filter(col("lc") >= a.minLen &&
        col("pc").cast("double") / col("lc") <= a.maxPunctRatio)
      val nQuality = quality.count()
      val kept = TextProfile.weightedSample(quality, "id",
          col("lc").cast("double") / a.fullKeepLen)
        .select(col("id").as(a.idCol), col("sc").as(a.textCol),
          col("lc").as("n_chars_clean"))
      kept.write.mode("overwrite").parquet(s"${a.output}/kept")
      val nKept = spark.read.parquet(s"${a.output}/kept").count()
      val counts = Map(
        "rows_in" -> nIn, "after_decontaminate" -> nClean,
        "after_dedup" -> nDeduped, "after_quality" -> nQuality,
        "kept" -> nKept)
      spark.createDataFrame(Seq((nIn, nClean, nDeduped, nQuality, nKept)))
        .toDF("rows_in", "after_decontaminate", "after_dedup",
          "after_quality", "kept")
        .write.mode("overwrite").parquet(s"${a.output}/report")
      counts
    } finally scr.unpersist(blocking = false)
  }

  def main(rawArgs: Array[String]): Unit = {
    val m = parse(rawArgs.toList, Map.empty)
    val a = Args(
      input = m.getOrElse("input", sys.error("--input required")),
      output = m.getOrElse("output", sys.error("--output required")),
      idCol = m.getOrElse("id", "doc_id"),
      textCol = m.getOrElse("text", "text"),
      ref = m.get("ref"),
      refTextCol = m.getOrElse("refText", "text"),
      minLen = m.getOrElse("minLen", "50").toInt,
      maxPunctRatio = m.getOrElse("maxPunctRatio", "0.1").toDouble,
      fullKeepLen = m.getOrElse("fullKeepLen", "400").toInt)

    val builder = SparkSession.builder().appName("graft-curate")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    val spark = sys.props.get("spark.master")
      .fold(builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]")))(_ => builder)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val counts = run(spark, a)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[curate] completed in $secs%.1fs")
    counts.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"[curate]   $k = $v") }
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case key :: value :: rest if key.startsWith("--") =>
        parse(rest, acc + (key.drop(2) -> value))
      case other => sys.error(s"cannot parse args at $other")
    }
}
