package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.pipeline.{Dedup, Spans, TextProfile}
import graft.text.Scrubber

/** spark-submit entry for end-to-end document curation — the composed
  * pipeline (`q_docs_curate`'s shape) as a runnable job over a documents
  * table `(id, text, …)`:
  *
  *   spark-submit --class graft.app.CurateJob <jar> \
  *     --input <documents parquet> --output <dir> \
  *     [--id doc_id] [--text text] \
  *     [--ref <eval/benchmark parquet>] [--refText text] \
  *     [--neardup true] [--minJaccard 0.5] \
  *     [--mirrors true] [--source source] [--mirrorJaccard 0.8] \
  *     [--spans true] [--spanSep '\n{2,}'] [--substr 8] [--nfc true] \
  *     [--quality heuristic|learned] [--minQuality 0.5] \
  *     [--minLen 50] [--maxPunctRatio 0.1] [--fullKeepLen 400] \
  *     [--ccnet true] [--stratum lang] [--nBuckets 3] [--keepBuckets 2] \
  *     [--mixTau 0.5] [--mixFrac 0.5]
  *
  * Stages, in the standard order (the reference's own canonical pipeline is
  * a full chain, not a subset — image_processing.py:51-184):
  *   1. decontaminate  — drop docs whose exact text occurs in --ref
  *                       (broadcast md5 anti-join; skipped without --ref)
  *   2. scrub          — PII/toxicity regex chain; downstream stages see
  *                       the SCRUBBED text
  *   3. exact dedup    — one keeper (min id) per distinct scrubbed text;
  *                       the election shuffles only (id, md5, scalars),
  *                       never the text
  *   4. near-dup       — (--neardup) MinHash-LSH pairs → connected
  *                       components → remove every non-keeper (keeper =
  *                       component minimum id); only skinny id pairs
  *                       shuffle
  *   4b. source mirrors— (--mirrors) RefinedWeb-style domain dedup: drop
  *                       every doc of a source whose word-gram UNION
  *                       Jaccard-matches another source at
  *                       --mirrorJaccard (keeper = most surviving docs);
  *                       catches re-hosted crawls whose re-chunking
  *                       defeats doc-level near-dup
  *   5. span dedup     — (--spans) drop duplicated paragraphs across the
  *                       corpus and reassemble each document from its
  *                       surviving spans; all-boilerplate docs vanish
  *   5b. substr dedup  — (--substr k, k ≥ 2) ExactSubstr pass (Lee et al.
  *                       2022): any k-token window duplicated corpus-wide
  *                       keeps one canonical copy and is cut everywhere
  *                       else — verbatim reuse below span granularity;
  *                       fully-cut docs vanish
  *   6. quality gate   — heuristic: length ≥ minLen and punct ratio ≤
  *                       maxPunctRatio; learned: the trained quality head
  *                       (broadcast artifact) score ≥ minQuality, plus the
  *                       same length floor
  *   7. CCNet buckets  — (--ccnet) per-stratum (--stratum column, e.g.
  *                       lang; one global stratum without it) score
  *                       tertiles by exact rank cutoffs
  *                       (TextProfile.rankBuckets over the mean-word-length
  *                       LM-quality proxy); keep the best --keepBuckets of
  *                       --nBuckets (head+middle by default, the standard
  *                       CCNet policy of discarding the tail)
  *   8. mix            — (--mixTau > 0) temperature-scaled stratum mixing:
  *                       p_s ∝ n_s^tau acceptance rates over --stratum
  *                       (mT5-style low-resource upweighting), target
  *                       volume --mixFrac of the surviving corpus
  *   9. weighted sample— keep probability length/fullKeepLen (md5-decided,
  *                       content-stable; docs ≥ fullKeepLen always kept)
  *
  * Outputs under --output:
  *   kept/    (id, scrubbed text, n_chars_clean) of surviving documents
  *   report/  one row of per-stage survivor counts — the funnel a curation
  *            run is audited by (silent attrition is the anti-pattern);
  *            skipped stages report the pass-through count
  *   drift/   per-bucket PSI of the KEPT corpus vs the INPUT over document
  *            length (100-char buckets) — "what did the funnel do to the
  *            distribution it kept"; Σ psi read on the 0.1/0.25 lights
  */
object CurateJob {

  final case class Args(
      input: String, output: String,
      idCol: String = "doc_id", textCol: String = "text",
      ref: Option[String] = None, refTextCol: String = "text",
      nearDup: Boolean = false, minJaccard: Double = 0.5,
      mirrors: Boolean = false, sourceCol: String = "source",
      mirrorJaccard: Double = 0.8,
      spans: Boolean = false, spanSep: String = "\\n{2,}",
      substrK: Int = 0, nfc: Boolean = true,
      quality: String = "heuristic", minQuality: Double = 0.5,
      minLen: Int = 50, maxPunctRatio: Double = 0.1, fullKeepLen: Int = 400,
      ccnet: Boolean = false, stratum: Option[String] = None,
      nBuckets: Int = 3, keepBuckets: Int = 2,
      mixTau: Double = 0.0, mixFrac: Double = 0.5,
      smallGraphLimit: Long = 2000000L)

  def run(spark: SparkSession, a: Args): Map[String, Long] = {
    require(a.substrK == 0 || a.substrK >= 2,
      s"--substr ${a.substrK}: window size must be >= 2 (0 disables)")
    val docs = spark.read.parquet(a.input)
    val nIn = docs.count()

    val clean = a.ref match {
      case Some(r) =>
        Dedup.decontaminate(docs, a.textCol,
          spark.read.parquet(r).select(col(a.refTextCol)), a.refTextCol)
      case None => docs
    }

    // (--nfc) Unicode canonicalization BEFORE scrub/hash: decomposed and
    // composed spellings of the same text must collapse to one md5 or
    // every downstream dedup stage misses them (codegen'd, zero-alloc on
    // already-NFC input — on by default, the production order)
    val rawText =
      if (a.nfc) graft.functions.NfcNormalize.col(col(a.textCol))
      else col(a.textCol)
    val (sc, _) = Scrubber.scrubCol(rawText)
    // the keeper election needs only scalars of the scrubbed text; keep the
    // text column for the kept/ output but let the window key on the hash
    // (the exchange carries the projected row once, like exact())
    val scr = clean.select(col(a.idCol).as("id"), sc.as("sc"))
      .select(col("id"), col("sc"), md5(col("sc")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nClean = scr.count()
      val wnd = Window.partitionBy(col("h")).orderBy(col("id"))
      var cur: DataFrame = scr.withColumn("rn", row_number().over(wnd))
        .filter(col("rn") === 1).select("id", "sc")
      val nDeduped = cur.count()

      val nNearDup = if (a.nearDup) {
        // pairs → components → keepers: remove every non-keeper. Pairs are
        // skinny (long, long); the anti-join ships only ids — the corpus
        // text never re-shuffles for this stage.
        val pairs = Dedup.nearDupPairs(cur, "id", "sc",
          minJaccard = a.minJaccard, maxBucket = 1024).select("id_a", "id_b")
        // adaptive: small pair sets union-find on the driver (identical
        // output, none of the per-round contraction overhead); above the
        // limit the distributed star contraction runs
        val nonKeepers = Dedup.components(pairs,
            smallGraphLimit = a.smallGraphLimit)
          .filter(col("id") =!= col("comp")).select("id")
        cur = cur.join(nonKeepers, Seq("id"), "left_anti")
        cur.count()
      } else nDeduped

      val nMirrors = if (a.mirrors) {
        // source-level mirror removal (RefinedWeb-style domain dedup): a
        // re-hosted source whose re-chunking defeats doc-level near-dup
        // still matches on its word-gram UNION. Pair resolution is driver-
        // side union-find over the FOUND pairs only — mirror pairs number
        // far below source counts by nature, and the bound is asserted.
        // Keeper per mirror cluster = most surviving docs (ties → the
        // lexicographically smallest source); every other member's docs
        // drop via a tiny isin predicate (no corpus shuffle).
        val st = docs.select(col(a.idCol).as("id"),
          col(a.sourceCol).as("src"))
        val withSrc = cur.join(st, Seq("id"))
        val pairRows = Dedup.sourceMirrors(withSrc, "src", "sc",
            minJaccard = a.mirrorJaccard)
          .select("src_a", "src_b").collect()
        require(pairRows.length <= 100000,
          s"${pairRows.length} mirror pairs exceed the driver-side resolve " +
            "bound — raise --mirrorJaccard or resolve externally")
        if (pairRows.isEmpty) nNearDup
        else {
          val parent = scala.collection.mutable.Map.empty[String, String]
          def find(x: String): String = {
            val p = parent.getOrElse(x, x)
            if (p == x) x else { val r = find(p); parent(x) = r; r }
          }
          pairRows.foreach { r =>
            val (rx, ry) = (find(r.getString(0)), find(r.getString(1)))
            if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
          }
          val mirrored = pairRows
            .flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
          val counts = withSrc.filter(col("src").isin(mirrored.toSeq: _*))
            .groupBy("src").agg(count(lit(1)).as("n")).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val dropSrcs = mirrored.groupBy(find).values.flatMap { members =>
            val keeper = members
              .sortBy(s => (-counts.getOrElse(s, 0L), s)).head
            members.filterNot(_ == keeper)
          }.toSeq
          // NULL-source docs belong to no mirror cluster: keep them
          // explicitly — `!isin` alone is NULL under three-valued logic
          // and would silently drop them
          cur = withSrc.filter(col("src").isNull ||
            !col("src").isin(dropSrcs: _*)).drop("src")
          cur.count()
        }
      } else nNearDup

      val nSpans = if (a.spans) {
        // drop cross-corpus duplicate paragraphs, reassemble in span order;
        // docs whose every span was boilerplate drop out entirely
        // 'cdc' selects insertion-resilient content-defined chunks (the
        // DedupJob spans-mode sentinel); anything else is a split regex
        val sp =
          if (a.spanSep == "cdc") Spans.cdcChunks(cur, "id", "sc")
          else Spans.split(cur, "id", "sc", a.spanSep)
        cur = Spans.removeDups(sp,
            joinWith = if (a.spanSep == "cdc") " " else "\n\n")
          .select(col("id"), col("cleaned_text").as("sc"))
        cur.count()
      // skipped stage passes the PREVIOUS stage's count through — falling
      // back to nNearDup here misreported after_spans when --mirrors had
      // already shrunk the corpus
      } else nMirrors

      val nSubstr = if (a.substrK >= 2) {
        // cut every non-canonical duplicated k-token window (tokens only
        // ever shuffle one word wide); docs reduced to nothing vanish
        cur = graft.pipeline.ExactSubstr.clean(cur, "id", "sc", a.substrK)
          .select(col("id"), col("cleaned_text").as("sc"))
        cur.count()
      } else nSpans

      // gate scalars are (re)computed here: the spans stage rewrites text
      val gated = cur.select(col("id"), col("sc"),
        length(col("sc")).as("lc"),
        length(regexp_replace(col("sc"), "[a-zA-Z0-9 ]", "")).as("pc"))
      val quality = a.quality match {
        case "heuristic" =>
          gated.filter(col("lc") >= a.minLen &&
            col("pc").cast("double") / col("lc") <= a.maxPunctRatio)
        case "learned" =>
          // broadcast-artifact pattern: the trained head scores each doc in
          // the same narrow stage (document-side analog of the learned
          // clips preset); bitwise-checked against the independent
          // OracleText.quality implementation in CurateSpec
          val bc = spark.sparkContext.broadcast(graft.text.TextModel.default)
          val scoreUdf = udf((s: String) => bc.value.qualityScore(s))
          gated.filter(col("lc") >= a.minLen &&
            scoreUdf(col("sc")) >= a.minQuality)
        case other => sys.error(s"unknown --quality $other (heuristic|learned)")
      }
      val nQuality = quality.count()

      val afterBuckets = if (a.ccnet) {
        require(a.keepBuckets >= 1 && a.keepBuckets < a.nBuckets,
          s"keepBuckets ${a.keepBuckets} must be in [1, ${a.nBuckets})")
        // re-attach the stratum from the input table (the span stage
        // rewrites rows, so the column cannot ride through) — a skinny
        // (id, stratum) AQE-sized join, then exact-rank tertiles over the
        // mean-word-length score (the Gopher-family LM-quality proxy;
        // near-unique per doc, so the tertiles are live); keep the best
        // keepBuckets, drop the tail (Wenzek 2020 §4.3 policy)
        val st = docs.select(col(a.idCol).as("id"),
          a.stratum.map(col).getOrElse(lit("all")).as("st"))
        val scored = quality.join(st, Seq("id"))
        TextProfile.rankBuckets(scored, "st",
            round(col("lc").cast("double") /
              greatest(size(split(col("sc"), " ")), lit(1)), 6), a.nBuckets)
          .filter(col("bucket") < a.keepBuckets)
          .drop("st", "score", "bucket")
      } else quality
      val nBucketsN = if (a.ccnet) afterBuckets.count() else nQuality

      val afterMix = if (a.mixTau > 0) {
        // temperature mixing over the SURVIVING corpus: rates derive from
        // the post-gate per-stratum counts (one tiny aggregate), so a
        // stratum decimated upstream is still upweighted here
        val st = docs.select(col(a.idCol).as("id"),
          a.stratum.map(col).getOrElse(lit("all")).as("mix_stratum"))
        TextProfile.temperatureMix(afterBuckets.join(st, Seq("id")),
            "id", "mix_stratum", tau = a.mixTau, targetFrac = a.mixFrac)
          .drop("mix_stratum", "mix_rate")
      } else afterBuckets
      val nMix = if (a.mixTau > 0) afterMix.count() else nBucketsN

      val kept = TextProfile.weightedSample(afterMix, "id",
          col("lc").cast("double") / a.fullKeepLen)
        .select(col("id").as(a.idCol), col("sc").as(a.textCol),
          col("lc").as("n_chars_clean"))
      kept.write.mode("overwrite").parquet(s"${a.output}/kept")
      val nKept = spark.read.parquet(s"${a.output}/kept").count()
      // funnel-shift audit: the kept distribution vs the raw input over
      // document length — two one-pass counts + bucket-sized math
      TextProfile.psiDrift(
          docs.select(length(col(a.textCol)).cast("double").as("m")),
          spark.read.parquet(s"${a.output}/kept")
            .select(col("n_chars_clean").cast("double").as("m")),
          col("m"), bucketWidth = 100.0, nBuckets = 20)
        .write.mode("overwrite").parquet(s"${a.output}/drift")
      val counts = Map(
        "rows_in" -> nIn, "after_decontaminate" -> nClean,
        "after_dedup" -> nDeduped, "after_neardup" -> nNearDup,
        "after_mirrors" -> nMirrors,
        "after_spans" -> nSpans, "after_substr" -> nSubstr,
        "after_quality" -> nQuality,
        "after_ccnet" -> nBucketsN, "after_mix" -> nMix, "kept" -> nKept)
      spark.createDataFrame(
          Seq((nIn, nClean, nDeduped, nNearDup, nMirrors, nSpans, nSubstr,
            nQuality, nBucketsN, nMix, nKept)))
        .toDF("rows_in", "after_decontaminate", "after_dedup",
          "after_neardup", "after_mirrors", "after_spans", "after_substr",
          "after_quality", "after_ccnet", "after_mix", "kept")
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
      nearDup = m.getOrElse("neardup", "false").toBoolean,
      minJaccard = m.getOrElse("minJaccard", "0.5").toDouble,
      mirrors = m.getOrElse("mirrors", "false").toBoolean,
      sourceCol = m.getOrElse("source", "source"),
      mirrorJaccard = m.getOrElse("mirrorJaccard", "0.8").toDouble,
      spans = m.getOrElse("spans", "false").toBoolean,
      spanSep = m.getOrElse("spanSep", "\\n{2,}"),
      substrK = m.getOrElse("substr", "0").toInt,
      nfc = m.getOrElse("nfc", "true").toBoolean,
      quality = m.getOrElse("quality", "heuristic"),
      minQuality = m.getOrElse("minQuality", "0.5").toDouble,
      minLen = m.getOrElse("minLen", "50").toInt,
      maxPunctRatio = m.getOrElse("maxPunctRatio", "0.1").toDouble,
      fullKeepLen = m.getOrElse("fullKeepLen", "400").toInt,
      ccnet = m.getOrElse("ccnet", "false").toBoolean,
      stratum = m.get("stratum"),
      nBuckets = m.getOrElse("nBuckets", "3").toInt,
      keepBuckets = m.getOrElse("keepBuckets", "2").toInt,
      mixTau = m.getOrElse("mixTau", "0.0").toDouble,
      mixFrac = m.getOrElse("mixFrac", "0.5").toDouble,
      smallGraphLimit = m.getOrElse("smallGraph", "2000000").toLong)

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
