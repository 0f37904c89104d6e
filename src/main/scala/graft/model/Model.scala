package graft.model

/** Core data model for the audio-clip quality-filter pipeline.
  *
  * Input row shape is fixed by the task's `input_hint`: an Iceberg-style table
  * of audio clip + transcript pairs. Mirrors the reference's "record = one
  * media item" abstraction (reference `Backend/app.py:50-62`: raw bytes +
  * implied codec, decoded per record), re-expressed as a typed Spark row.
  */
final case class ClipRow(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String
)

/** Per-clip audio features extracted from decoded PCM inside the decode
  * mapPartitions stage. The PCM itself is dropped immediately after feature
  * extraction — at 10^12-clip scale the waveform must never travel through a
  * shuffle. Mirrors the reference's per-image diagnostic statistics
  * (`experimental_evaluator.py:106-119` per-side stats; `image_processing.py
  * :464-469` local-contrast diagnostic) as a compact struct.
  *
  * All fields are cheap scalars; `n_samples` is the decoded length.
  */
final case class AudioFeatures(
    n_samples: Int,
    rms_db: Double,          // overall RMS level in dBFS
    peak: Double,            // max |sample|
    silence_frac: Double,    // fraction of frames below energy floor
    clip_frac: Double,       // fraction of samples at/near full scale
    dyn_range_db: Double,    // p95 - p5 of frame RMS in dB
    speech_ms: Double,       // speech span after open/close mask repair
    n_segments: Int,         // speech segments (utterances) detected
    // P8 multiscale: dyn range at mid (5×frame) / long (25×frame) windows
    dyn_range_mid_db: Double,
    dyn_range_long_db: Double,
    // P13 saliency: smoothed-envelope band contrast (high-residual vs
    // low-pass energy, dB) — the 1-D DoG analog
    band_contrast_db: Double,
    // P19 polarity/offset sanity: mean sample (DC offset)
    dc_offset: Double,
    // H7 spectral hum: fraction of spectral power in the mains-hum band
    // (≤ 75 Hz, DC excluded; Hann-windowed 1024-sample frames) — the 1-D
    // analog of the reference's periodic line-artifact detection
    hum_frac: Double,
    // O5 per-segment vector: duration of each detected speech segment (ms)
    segment_ms: Seq[Double]
)

/** One decision row per input clip — the engine's primary output.
  * Mirrors the reference's pipeline result record (`image_processing.py:199-
  * 205`): final artifact + metrics + lineage, shrunk to scalars per SURVEY
  * §4.2(2). `drop_reasons` empty ⇔ `keep`.
  */
final case class DecisionRow(
    clip_id: String,
    keep: Boolean,
    drop_reasons: Seq[String],
    scrubbed_transcript: String,
    lang: String,
    lang_conf: Double,
    ppl_char: Double,
    ppl_word: Double,
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    // audio features flattened for Catalyst visibility (rules are `when` exprs)
    n_samples: Int,
    rms_db: Double,
    peak: Double,
    silence_frac: Double,
    clip_frac: Double,
    dyn_range_db: Double,
    hum_frac: Double,
    speech_ms: Double,
    n_segments: Int,
    chars_per_sec: Double,
    max_repeat_run: Int,
    symbol_frac: Double,
    scrub_hits: Seq[ScrubHit]
)

final case class ScrubHit(rule: String, count: Int)

/** One word token with its log-probability under the scoring LM (SURVEY O6:
  * reference word boxes + per-word confidence, `ocr_engine.py:382-432`,
  * recast as a per-token surprisal vector). Debug column, sampled per
  * `FilterConfig.tokenScoresFrac`; `exp(−mean(logp)) == ppl_word`. */
final case class TokenScore(token: String, logp: Double)

/** Stable drop-reason codes (reference analog: structured error taxonomy,
  * `Backend/app.py:429-461`, `ocr_engine.py:373-380` — errors are data). */
object Reason {
  val DecodeError   = "decode_error"
  val EmptyText     = "empty_transcript"
  val WrongLanguage = "wrong_language"
  val LowLangConf   = "low_lang_conf"
  val HighPplChar   = "high_ppl_char"
  val HighPplWord   = "high_ppl_word"
  val LengthRatio   = "length_ratio"      // H1
  val Repetition    = "repetition"        // H2
  val SymbolDensity = "symbol_density"    // H3
  val DurMismatch   = "dur_text_mismatch" // H4
  val Silence       = "silence"           // H5
  val Clipping      = "clipping"          // H5
  val FlatRange     = "flat_dyn_range"    // H6
  val Hum           = "mains_hum"         // H7
  val LowQuality    = "low_quality_model" // learned head (opt-in)
  val all: Seq[String] = Seq(DecodeError, EmptyText, WrongLanguage, LowLangConf,
    HighPplChar, HighPplWord, LengthRatio, Repetition, SymbolDensity,
    DurMismatch, Silence, Clipping, FlatRange, Hum, LowQuality)
}

/** Typed filter configuration (reference analog: 40-key settings map with
  * defaults + 8 named presets, `Backend/utils/config.py:11-220`, re-expressed
  * as a case class per SURVEY §1.4 — knobs stay, but typed; broadcast via
  * closure). Defaults are the "premium"-equivalent semantics.
  */
final case class FilterConfig(
    // language
    acceptedLangs: Set[String] = Set("aa", "bb", "cc"),
    minLangConf: Double = 0.60,
    // perplexity cutoffs (fixed defaults for determinism; adaptive Sauvola-form
    // rule available via `adaptivePpl`, SURVEY T4)
    maxPplChar: Double = 25.0,
    maxPplWord: Double = 100000.0,
    adaptivePpl: Boolean = false,
    // adaptive cutoff method: "niblack" = mean + k·std per cohort (SURVEY
    // T5); "sauvola" = m·(1 + k·(s/R − 1)) on min-max-normalized cohort
    // scores (SURVEY T4 — the pixel-range form inverts on raw PPL values,
    // so scores are normalized to [0,1] first and k < 0 flips polarity:
    // good rows are LOW-ppl, the dual of Sauvola's dark-text convention)
    adaptiveMethod: String = "niblack",
    niblackK: Double = 2.0,
    sauvolaK: Double = -0.5,
    sauvolaR: Double = 0.5,
    // P18 gamma LUT analog: pow-curve correction applied to the normalized
    // adaptive cutoff (γ < 1 lifts it — more lenient; γ > 1 lowers it)
    adaptiveGamma: Double = 1.0,
    // H1 length ratio: transcript chars per second of audio
    minCharsPerSec: Double = 2.0,
    maxCharsPerSec: Double = 60.0,
    // H2 repetition: max consecutive repeats of a word
    maxRepeatRun: Int = 6,
    // H3 symbol density
    maxSymbolFrac: Double = 0.30,
    // H4 metadata sanity: |decoded_ms − dur_ms| / dur_ms ceiling
    maxDurMismatch: Double = 0.2,
    // H5 energy bounds
    maxSilenceFrac: Double = 0.90,
    maxClipFrac: Double = 0.02,
    // H6 dynamic range floor (dB)
    minDynRangeDb: Double = 3.0,
    // H7 mains-hum ceiling: max fraction of spectral power in the ≤ 75 Hz
    // band. Clean speech at the 8 kHz grid sits < 0.005 (hum-band content
    // is noise + Hann sidelobe leakage only); 50/60 Hz hum riding under the
    // signal pushes it over 0.1
    maxHumFrac: Double = 0.02,
    // learned quality head floor (≤ 0 disables the rule; the score column
    // is always emitted) — reference's model-based scoring path
    // (`ai_processor.py:169-331`) as an opt-in decision rule
    minQualityScore: Double = 0.0,
    // audio framing
    frameMs: Int = 20,
    silenceFloorDb: Double = -35.0,
    // P21 analog: resample decoded PCM to a common reference grid before
    // feature extraction, so clips at different sr_hz are scored on
    // comparable frames (reference resize-before-compare,
    // ai_processor.py:69-76). 8 kHz (telephony band) — energy-envelope
    // features need no wider band, and a downsample-mostly grid keeps the
    // analysis pass cheaper than native-rate. 0 = analyze at native rate.
    referenceHz: Int = 8000,
    // M9 analog: trim leading/trailing silence before feature extraction
    // (reference border/artifact removal, image_processing.py:211-362) —
    // edge padding is an artifact to remove, not a reason to drop; interior
    // silence still counts toward the H5 silence rule
    trimSilence: Boolean = true,
    // O6 analog: emit per-token surprisal vectors for this fraction of rows
    // (deterministic clip_id hash sampling; 0 = off)
    tokenScoresFrac: Double = 0.0,
    // morphological repair of the speech mask (frames): drop bursts shorter
    // than minBurst (opening, M2), bridge gaps shorter than maxGap (closing, M3)
    minBurstFrames: Int = 3,
    maxGapFrames: Int = 5,
    // S10 analog: bound per-row analysis cost — audio features are computed
    // on at most this many ms of decoded PCM (0 = analyze everything);
    // metadata sanity (H4) always uses the full decoded length
    maxAnalyzeMs: Int = 0,
    // scrub
    scrubEnabled: Boolean = true,
    // salted repartition: number of salt buckets
    saltBuckets: Int = 256
) {
  // C3 analog (reference coerces/validates per step, e.g. odd kernel sizes,
  // image_processing.py:1548-1552): fail fast on the driver, never in a task
  require(minLangConf >= 0 && minLangConf <= 1, s"minLangConf $minLangConf")
  require(maxPplChar > 0 && maxPplWord > 0, "ppl cutoffs must be positive")
  require(minCharsPerSec >= 0 && maxCharsPerSec > minCharsPerSec, "H1 band invalid")
  require(maxRepeatRun >= 1, s"maxRepeatRun $maxRepeatRun")
  require(maxSymbolFrac >= 0 && maxSymbolFrac <= 1, s"maxSymbolFrac $maxSymbolFrac")
  require(maxDurMismatch > 0, s"maxDurMismatch $maxDurMismatch")
  require(maxSilenceFrac >= 0 && maxSilenceFrac <= 1, s"maxSilenceFrac $maxSilenceFrac")
  require(maxClipFrac >= 0 && maxClipFrac <= 1, s"maxClipFrac $maxClipFrac")
  require(maxHumFrac >= 0 && maxHumFrac <= 1, s"maxHumFrac $maxHumFrac")
  require(frameMs >= 1 && frameMs <= 1000, s"frameMs $frameMs")
  require(referenceHz >= 0, s"referenceHz $referenceHz")
  require(tokenScoresFrac >= 0 && tokenScoresFrac <= 1, s"tokenScoresFrac $tokenScoresFrac")
  require(Set("niblack", "sauvola").contains(adaptiveMethod), s"adaptiveMethod $adaptiveMethod")
  require(sauvolaR > 0, s"sauvolaR $sauvolaR")
  require(adaptiveGamma > 0, s"adaptiveGamma $adaptiveGamma")
  require(minBurstFrames >= 1 && maxGapFrames >= 0, "mask morphology params invalid")
  require(maxAnalyzeMs >= 0, s"maxAnalyzeMs $maxAnalyzeMs")
  require(saltBuckets >= 1, s"saltBuckets $saltBuckets")
}

/** Named presets (reference `config.py:61-220`: preset = defaults + overrides). */
object Presets {
  val default: FilterConfig = FilterConfig()
  val strict: FilterConfig = default.copy(
    minLangConf = 0.80, maxPplChar = 15.0, maxSymbolFrac = 0.15,
    maxSilenceFrac = 0.70, minDynRangeDb = 6.0)
  val lenient: FilterConfig = default.copy(
    minLangConf = 0.40, maxPplChar = 60.0, maxSymbolFrac = 0.50,
    maxSilenceFrac = 0.98, minDynRangeDb = 0.5, maxRepeatRun = 8)
  val adaptive: FilterConfig = default.copy(adaptivePpl = true)
  val adaptiveSauvola: FilterConfig =
    default.copy(adaptivePpl = true, adaptiveMethod = "sauvola")
  val debug: FilterConfig = default.copy(tokenScoresFrac = 0.05)
  val learned: FilterConfig = default.copy(minQualityScore = 0.5)
  val byName: Map[String, FilterConfig] = Map(
    "default" -> default, "premium" -> default, "strict" -> strict,
    "lenient" -> lenient, "adaptive" -> adaptive,
    "adaptive-sauvola" -> adaptiveSauvola, "debug" -> debug,
    "learned" -> learned)
  /** Alias-tolerant lookup (reference `app.py:128-150`). */
  def apply(name: String): FilterConfig =
    byName.getOrElse(name.trim.toLowerCase, default)
}
