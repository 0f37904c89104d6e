package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.codec.Codecs
import graft.model._
import graft.rules.Heuristics
import graft.text.{Scrubber, TextModel}

/** Per-clip feature row emitted by the single heavyweight pass. Everything
  * downstream of this is declarative Catalyst (`when` rules, salted
  * repartition, partitioned write). */
final case class FeatureRow(
    clip_id: String,
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String,
    decode_ok: Boolean,
    decode_err: String,
    n_samples: Int,
    rms_db: Double,
    peak: Double,
    silence_frac: Double,
    clip_frac: Double,
    dyn_range_db: Double,
    speech_ms: Double,
    n_segments: Int,
    dyn_range_mid_db: Double,
    dyn_range_long_db: Double,
    band_contrast_db: Double,
    dc_offset: Double,
    hum_frac: Double,
    // 64-bit acoustic fingerprint of the analysis-grid waveform (gain/
    // codec/length-invariant; Heuristics.audioFingerprint) — feeds batch
    // AND streaming audio near-dup; 0 when undecodable
    audio_fp: Long,
    segment_ms: Seq[Double],
    dur_mismatch: Double,
    lang: String,
    lang_conf: Double,
    ppl_char: Double,
    ppl_word: Double,
    chars_per_sec: Double,
    max_repeat_run: Int,
    symbol_frac: Double,
    quality_score: Double,
    scrubbed_transcript: String,
    scrub_hits: Seq[ScrubHit],
    token_scores: Seq[TokenScore]
)

/** The quality-filter pipeline (SURVEY §3.1 Spark lifecycle):
  *
  *   scan → mapPartitions(decode + features + LID + PPL + scrub)   [narrow]
  *        → `when`-rule decision columns                            [Catalyst]
  *        → salted repartition → partitioned snapshot write         [1 shuffle]
  *
  * One heavyweight narrow stage; the waveform never leaves the decode pass
  * (only scalar features travel). Model artifacts are broadcast once per
  * executor (reference's lazy singletons `ocr_engine.py:26-70` →
  * SURVEY §4.2(1)); decode failures are data, not exceptions
  * (`Backend/app.py:429-461` → drop_reasons).
  */
object FilterPipeline {

  /** Accumulators for job-level counters (reference G12 success/failure
    * counts, `Backend/app.py:426-491`). */
  final class Counters(spark: SparkSession) extends Serializable {
    val rows: LongAccumulator = spark.sparkContext.longAccumulator("graft.rows")
    val decodeErrors: LongAccumulator = spark.sparkContext.longAccumulator("graft.decodeErrors")
    val scrubbed: LongAccumulator = spark.sparkContext.longAccumulator("graft.scrubbedRows")
  }

  /** Heavyweight narrow pass: decode bytes → PCM → audio features, score
    * transcript (LID, char/word PPL), heuristics, scrub. PCM is dropped
    * before return. */
  def features(
      clips: Dataset[ClipRow],
      cfg: FilterConfig,
      model: Broadcast[TextModel],
      counters: Option[Counters] = None
  ): Dataset[FeatureRow] = {
    import clips.sparkSession.implicits._
    clips.mapPartitions { it =>
      val m = model.value
      it.map { clip =>
        counters.foreach(_.rows.add(1))
        val decoded = Codecs.decode(clip.codec, clip.bytes)
        val (ok, err, af, mismatch, afp) = decoded match {
          case Right(pcm) =>
            // S10 analog: optionally bound feature extraction to a prefix;
            // H4 metadata sanity always sees the true decoded length
            val analyzed =
              if (cfg.maxAnalyzeMs > 0) {
                val cap = (clip.sr_hz.toLong * cfg.maxAnalyzeMs / 1000L).toInt
                if (pcm.length > cap) java.util.Arrays.copyOf(pcm, cap) else pcm
              } else pcm
            // P21 analog: score every clip on the same reference frame grid
            // regardless of native rate (resize-before-compare)
            val (ana, anaHz) =
              if (cfg.referenceHz > 0 && clip.sr_hz != cfg.referenceHz)
                (Codecs.resampleLinear(analyzed, clip.sr_hz, cfg.referenceHz),
                  cfg.referenceHz)
              else (analyzed, clip.sr_hz)
            // M9 analog: strip leading/trailing silence padding before
            // analysis (fused into the feature pass — no copy, frame
            // energies computed once); interior pauses still count toward H5
            val f0 = Heuristics.audioFeatures(ana, anaHz, cfg,
              trim = cfg.trimSilence)
            val f = f0.copy(n_samples = pcm.length)
            (true, "", f,
              Heuristics.durMismatch(pcm.length, clip.sr_hz, clip.dur_ms),
              Heuristics.audioFingerprint(ana))
          case Left(reason) =>
            counters.foreach(_.decodeErrors.add(1))
            (false, reason,
              AudioFeatures(0, -180.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0,
                0.0, 0.0, 0.0, 0.0, 0.0, Nil), 0.0, 0L)
        }

        val t = clip.transcript
        val (lang, conf) =
          if (t.isEmpty) ("und", 0.0) else m.lid(t)

        // scrub BEFORE perplexity: planted PII tokens are noise the scrubber
        // removes, so keepable rows aren't dropped for the PII's surprisal
        val (scrubbed, hits) =
          if (cfg.scrubEnabled && t.nonEmpty) Scrubber.scrub(t) else (t, Nil)
        if (hits.nonEmpty) counters.foreach(_.scrubbed.add(1))

        // PPL under the LID-predicted language's LM when known (incl. the
        // non-accepted class), else best accepted — garbled text scores high
        // under every LM, wrong-language text scores low under its own.
        val pplLang = if (m.langIndex(lang) >= 0) lang else m.langs.head
        val pplC = if (t.isEmpty) 0.0 else m.pplChar(scrubbed, pplLang)
        val pplW = if (t.isEmpty) 0.0 else m.pplWord(scrubbed, pplLang)

        // O6 analog: per-token surprisal debug vector for a deterministic
        // clip_id-hash sample of rows (reference per-word confidence boxes)
        val tokScores =
          if (cfg.tokenScoresFrac > 0 && t.nonEmpty &&
              Math.floorMod(clip.clip_id.hashCode, 10000) < cfg.tokenScoresFrac * 10000)
            m.tokenSurprisals(scrubbed, pplLang)
              .map { case (w, lp) => TokenScore(w, lp) }.toSeq
          else Nil

        FeatureRow(
          clip_id = clip.clip_id,
          sr_hz = clip.sr_hz, dur_ms = clip.dur_ms, codec = clip.codec,
          transcript = t,
          decode_ok = ok, decode_err = err,
          n_samples = af.n_samples, rms_db = af.rms_db, peak = af.peak,
          silence_frac = af.silence_frac, clip_frac = af.clip_frac,
          dyn_range_db = af.dyn_range_db, speech_ms = af.speech_ms,
          n_segments = af.n_segments,
          dyn_range_mid_db = af.dyn_range_mid_db,
          dyn_range_long_db = af.dyn_range_long_db,
          band_contrast_db = af.band_contrast_db,
          dc_offset = af.dc_offset,
          hum_frac = af.hum_frac,
          audio_fp = afp,
          segment_ms = af.segment_ms,
          dur_mismatch = mismatch,
          lang = lang, lang_conf = conf, ppl_char = pplC, ppl_word = pplW,
          chars_per_sec = Heuristics.charsPerSec(t, clip.dur_ms),
          max_repeat_run = Heuristics.maxRepeatRun(t),
          symbol_frac = Heuristics.symbolFrac(t),
          // learned head scores the SCRUBBED text, like the PPL rules
          quality_score = if (t.isEmpty) 0.0 else m.qualityScore(scrubbed),
          scrubbed_transcript = scrubbed,
          scrub_hits = hits,
          token_scores = tokScores
        )
      }
    }
  }

  /** Declarative decision layer: every rule is a Catalyst `when` expression
    * over feature columns (reference's data-dependent branches,
    * `image_processing.py:130-133, 93-97` → CASE WHEN, SURVEY §4.1) —
    * visible to the optimizer, codegen'd, zero additional passes. */
  def decide(feats: DataFrame, cfg: FilterConfig): DataFrame = {
    val nonEmpty = length(col("transcript")) > 0
    val decoded = col("decode_ok")

    val reasonExprs = Seq(
      when(!decoded, Reason.DecodeError),
      when(!nonEmpty, Reason.EmptyText),
      when(nonEmpty && !col("lang").isin(cfg.acceptedLangs.toSeq: _*), Reason.WrongLanguage),
      when(nonEmpty && col("lang").isin(cfg.acceptedLangs.toSeq: _*) &&
        col("lang_conf") < cfg.minLangConf, Reason.LowLangConf),
      when(nonEmpty && col("ppl_char") > cfg.maxPplChar, Reason.HighPplChar),
      when(nonEmpty && col("ppl_word") > cfg.maxPplWord, Reason.HighPplWord),
      when(nonEmpty && (col("chars_per_sec") < cfg.minCharsPerSec ||
        col("chars_per_sec") > cfg.maxCharsPerSec), Reason.LengthRatio),
      when(col("max_repeat_run") > cfg.maxRepeatRun, Reason.Repetition),
      when(col("symbol_frac") > cfg.maxSymbolFrac, Reason.SymbolDensity),
      when(decoded && col("dur_mismatch") > cfg.maxDurMismatch, Reason.DurMismatch),
      when(decoded && col("silence_frac") > cfg.maxSilenceFrac, Reason.Silence),
      when(decoded && col("clip_frac") > cfg.maxClipFrac, Reason.Clipping),
      when(decoded && col("dyn_range_db") < cfg.minDynRangeDb, Reason.FlatRange),
      when(decoded && col("hum_frac") > cfg.maxHumFrac, Reason.Hum)
    ) ++
      // learned quality head: opt-in rule (Presets.learned) — a disabled
      // config contributes no expression, so default plans are unchanged
      (if (cfg.minQualityScore > 0)
        Seq(when(nonEmpty && col("quality_score") < cfg.minQualityScore,
          Reason.LowQuality))
      else Nil)

    feats
      .withColumn("drop_reasons",
        filter(array(reasonExprs: _*), x => x.isNotNull))
      .withColumn("keep", size(col("drop_reasons")) === 0)
  }

  /** Adaptive variant of the PPL cutoff (SURVEY T2/T5): instead of the fixed
    * `maxPplChar`, each (lang) cohort gets a `mean + k·std` threshold
    * (Niblack form) computed from the data itself — the reference's adaptive
    * thresholding family (`image_processing.py:572-578` Niblack;
    * `:72-86` per-neighborhood mean), lifted from pixel neighborhoods to
    * language cohorts. Two passes: a cheap aggregate over the feature table,
    * broadcast-joined back (no second heavyweight decode — callers pass the
    * same cached/checkpointed features frame). */
  /** Per-cohort adaptive PPL cutoffs — the thresholding core of
    * `decideAdaptive`, exposed for tests and diagnostics. */
  def adaptiveCutoffs(feats: DataFrame, cfg: FilterConfig): DataFrame = {
    val stats = feats
      .filter(col("decode_ok") && length(col("transcript")) > 0)
      .groupBy(col("lang"))
      .agg(avg(col("ppl_char")).as("ppl_mean"),
        coalesce(stddev_pop(col("ppl_char")), lit(0.0)).as("ppl_std"),
        min(col("ppl_char")).as("ppl_min"),
        max(col("ppl_char")).as("ppl_max"))
    val cutoff = cfg.adaptiveMethod match {
      case "sauvola" =>
        // T4: Sauvola m·(1 + k·(s/R − 1)) on min-max-normalized cohort
        // scores. Raw-PPL stats invert the formula (std ≫ R), so normalize
        // to [0,1] first; k < 0 is the polarity-flipped parameterization
        // (good rows are LOW-ppl ↔ Sauvola's dark-text convention): a tight
        // cohort (s ≪ R) pushes the cutoff well above the mean (lenient), a
        // dispersed one pulls it toward the mean (aggressive).
        val range = col("ppl_max") - col("ppl_min")
        val mNorm = (col("ppl_mean") - col("ppl_min")) / range
        val sNorm = col("ppl_std") / range
        val tNorm = mNorm * (lit(1.0) +
          lit(cfg.sauvolaK) * (sNorm / lit(cfg.sauvolaR) - lit(1.0)))
        // P18: gamma LUT as a pow column expr over the normalized cutoff
        val tGamma =
          if (cfg.adaptiveGamma == 1.0) tNorm
          else pow(greatest(tNorm, lit(0.0)), lit(cfg.adaptiveGamma))
        when(range > 0, col("ppl_min") + tGamma * range)
          .otherwise(lit(cfg.maxPplChar))
      case _ => // niblack: m + k·s
        col("ppl_mean") + lit(cfg.niblackK) * col("ppl_std")
    }
    stats.withColumn("ppl_cutoff", cutoff)
      .select(col("lang"), col("ppl_mean"), col("ppl_max"), col("ppl_cutoff"))
  }

  def decideAdaptive(feats: DataFrame, cfg: FilterConfig): DataFrame =
    decideWithCutoffs(feats, cfg,
      adaptiveCutoffs(feats, cfg).select("lang", "ppl_cutoff"))

  /** Decision layer with the adaptive PPL cutoff taken from an explicit
    * (lang, ppl_cutoff) cohort frame — `decideAdaptive` derives the cohorts
    * from the same feature frame (share it via persist: `decisionsManaged`);
    * the plain `decisions` API materializes them eagerly instead so nothing
    * stays persisted behind the caller's back. */
  private def decideWithCutoffs(feats: DataFrame, cfg: FilterConfig,
                                cohorts: DataFrame): DataFrame = {
    val joined = feats.join(broadcast(cohorts), Seq("lang"), "left")
    val base = decide(joined, cfg)
    // swap the fixed high_ppl_char verdict for the cohort-adaptive one
    base
      .withColumn("drop_reasons",
        array_distinct(concat(
          filter(col("drop_reasons"), r => r =!= Reason.HighPplChar),
          filter(array(when(length(col("transcript")) > 0 &&
            col("ppl_char") > coalesce(col("ppl_cutoff"), lit(cfg.maxPplChar)),
            Reason.HighPplChar)), x => x.isNotNull))))
      .withColumn("keep", size(col("drop_reasons")) === 0)
      .drop("ppl_cutoff")
  }

  /** Full decision table in the canonical output column order.
    *
    * Adaptive configs: leak-free — the (tiny, one row per lang) cohort
    * cutoffs are computed EAGERLY with one Spark job at call time and baked
    * into the returned plan as a literal frame, so nothing stays persisted
    * behind the caller's back (the round-2 version delegated to
    * `decisionsManaged` and dropped the release thunk — a session-lifetime
    * MEMORY_AND_DISK leak for any non-FilterJob caller). Costs one extra
    * decode pass vs `decisionsManaged` (cutoff job + the caller's action);
    * use the managed variant to share a single persisted feature pass. */
  def decisions(
      clips: Dataset[ClipRow],
      cfg: FilterConfig,
      model: Broadcast[TextModel],
      counters: Option[Counters] = None
  ): DataFrame =
    if (!cfg.adaptivePpl) decisionsManaged(clips, cfg, model, counters)._1
    else {
      val spark = clips.sparkSession
      import spark.implicits._
      // the cohort-cutoff job runs a COUNTER-FREE feature pass: the returned
      // plan re-evaluates features (that second decode pass is the
      // documented cost of the leak-free plain API), so threading `counters`
      // through both passes would double-count every accumulator relative
      // to `decisionsManaged`. Counters are incremented exactly once — by
      // the caller's action on the returned frame.
      val cutoffFeats = features(clips, cfg, model, None).toDF()
      val cohorts = adaptiveCutoffs(cutoffFeats, cfg).select("lang", "ppl_cutoff")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
        .toDF("lang", "ppl_cutoff")
      finish(decideWithCutoffs(
        features(clips, cfg, model, counters).toDF(), cfg, cohorts))
    }

  /** As `decisions`, returning a release thunk: adaptive mode persists the
    * feature frame (cohort stats + decisions = two scans over the expensive
    * decode pass); callers invoke the thunk after their consuming action.
    * Non-adaptive mode persists nothing and the thunk is a no-op. */
  def decisionsManaged(
      clips: Dataset[ClipRow],
      cfg: FilterConfig,
      model: Broadcast[TextModel],
      counters: Option[Counters] = None
  ): (DataFrame, () => Unit) = {
    val feats = features(clips, cfg, model, counters).toDF()
    val (d, release) =
      if (cfg.adaptivePpl) {
        val cached = feats.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (decideAdaptive(cached, cfg), () => { cached.unpersist(false); () })
      } else (decide(feats, cfg), () => ())
    (finish(d), release)
  }

  /** Canonical output column order shared by the plain and managed APIs. */
  private def finish(d: DataFrame): DataFrame =
    d.select(
      col("clip_id"), col("keep"), col("drop_reasons"),
      col("scrubbed_transcript"), col("lang"), col("lang_conf"),
      col("ppl_char"), col("ppl_word"), col("sr_hz"), col("dur_ms"),
      col("codec"), col("n_samples"), col("rms_db"), col("peak"),
      col("silence_frac"), col("clip_frac"), col("dyn_range_db"),
      col("speech_ms"), col("n_segments"),
      col("dyn_range_mid_db"), col("dyn_range_long_db"),
      col("band_contrast_db"), col("dc_offset"), col("hum_frac"),
      col("audio_fp"), col("segment_ms"),
      col("chars_per_sec"),
      col("max_repeat_run"), col("symbol_frac"), col("scrub_hits"),
      col("token_scores"), col("quality_score"))

  /** Per-partition lineage rows (reference C4/G12: intermediate-step lineage
    * + batch counters, shrunk to scalars per SURVEY §4.2(2)): one row per
    * input partition with row/keep counts, per-reason counts, clip_id range.
    * Map-side partial aggregation makes this a near-free pass. */
  def lineage(decisions: DataFrame): DataFrame = {
    val withPid = decisions.withColumn("partition_id", spark_partition_id())
    val reasonCounts = Reason.all.map(r =>
      sum(when(array_contains(col("drop_reasons"), r), 1L).otherwise(0L))
        .as(s"n_$r"))
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
      sum(when(size(col("scrub_hits")) > 0, 1L).otherwise(0L)).as("n_scrubbed"),
      min(col("clip_id")).as("min_clip_id"),
      max(col("clip_id")).as("max_clip_id")
    ) ++ reasonCounts
    withPid.groupBy(col("partition_id")).agg(aggs.head, aggs.tail: _*)
  }
}
