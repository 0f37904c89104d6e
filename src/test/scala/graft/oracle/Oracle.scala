package graft.oracle

import graft.model.{ClipRow, FilterConfig}
import graft.text.TextModel

/** Independent plain-Scala reference implementation (FIXTURES.md §3).
  *
  * Shares only the *specs* with the engine — the G.711/IMA public codec
  * specs, the TextModel artifact, the scrub pattern list, the documented
  * rule thresholds — but every code path is written separately. The engine
  * never sees this code; tests compare engine output against it row by row
  * (keep/drop F1 ≥ 0.99, PCM SNR ≥ 30 dB, exact scrubbed-text equality).
  */
object Oracle {

  // ---- independent codec decoders -----------------------------------------

  /** G.711 µ-law decode via the spec formula on the 14-bit magnitude:
    * mag14 = ((2m + 33) << e) − 33; pcm16 = sign · 4 · mag14. */
  def decodeUlaw(bytes: Array[Byte]): Array[Float] =
    bytes.map { b =>
      val u = (~b) & 0xFF
      val e = (u >> 4) & 7
      val m = u & 0xF
      val mag14 = ((2 * m + 33) << e) - 33
      val pcm = (if ((u & 0x80) != 0) -4 * mag14 else 4 * mag14)
      pcm / 32768.0f
    }

  /** G.711 A-law decode via the closed-form magnitude expression
    * (independent of the engine's shift-accumulate form):
    * mag = (2m+1)·8 for segment 0, (2m+33)·2^(e+2) otherwise; the wire
    * byte has its even bits toggled (xor 0x55) and sign bit SET means
    * non-negative. */
  def decodeAlaw(bytes: Array[Byte]): Array[Float] =
    bytes.map { b =>
      val u = (b & 0xFF) ^ 0x55
      val e = (u >> 4) & 7
      val m = u & 0xF
      val mag = if (e == 0) (2 * m + 1) << 3 else (2 * m + 33) << (e + 2)
      val pcm = if ((u & 0x80) != 0) mag else -mag
      pcm / 32768.0f
    }

  def decodePcm16(bytes: Array[Byte]): Option[Array[Float]] =
    if (bytes.isEmpty || bytes.length % 2 != 0) None
    else Some {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Float](bytes.length / 2)
      for (i <- out.indices) out(i) = bb.getShort(2 * i) / 32768.0f
      out
    }

  private val imaStep = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767)
  private val imaIdx = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  def decodeAdpcm(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes.length < 4) return None
    val n = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(0)
    if (n < 0 || bytes.length - 4 != (n + 1) / 2) return None
    val out = new Array[Float](n)
    var pred = 0
    var idx = 0
    for (i <- 0 until n) {
      val byte = bytes(4 + i / 2) & 0xFF
      val nib = if (i % 2 == 0) byte & 0xF else byte >>> 4
      val step = imaStep(idx)
      // diff = (step * (2*mag + 1)) / 8 computed the shift-accumulate way
      var diff = step >> 3
      if ((nib & 4) != 0) diff += step
      if ((nib & 2) != 0) diff += step >> 1
      if ((nib & 1) != 0) diff += step >> 2
      pred = if ((nib & 8) != 0) pred - diff else pred + diff
      pred = math.max(-32768, math.min(32767, pred))
      idx = math.max(0, math.min(88, idx + imaIdx(nib)))
      out(i) = pred.toShort / 32768.0f
    }
    Some(out)
  }

  def decode(codec: String, bytes: Array[Byte]): Option[Array[Float]] =
    if (bytes == null || bytes.isEmpty) None
    else codec match {
      case "pcm_s16le" => decodePcm16(bytes)
      case "ulaw8"     => Some(decodeUlaw(bytes))
      case "alaw8"     => Some(decodeAlaw(bytes))
      case "adpcm4"    => decodeAdpcm(bytes)
      case _           => None
    }

  // ---- independent scrubber (same pattern specs, own application loop) ----

  def scrub(text: String): String = {
    var t = text
    for (r <- graft.text.Scrubber.rules)
      t = r.pattern.matcher(t).replaceAll(r.replacement)
    t
  }

  // ---- independent audio features -----------------------------------------

  /** Independent linear resampler to the documented spec (P21): output
    * length floor(n·to/from), pos = i·from/to, linear interp in double,
    * clamped indices. */
  def resample(pcm: Array[Float], fromHz: Int, toHz: Int): Array[Float] = {
    if (fromHz == toHz || pcm.isEmpty) return pcm
    val n = (pcm.length.toLong * toHz / fromHz).toInt
    (0 until n).map { i =>
      val pos = i * (fromHz.toDouble / toHz)
      val j = pos.toInt
      val lo = pcm(math.min(j, pcm.length - 1)).toDouble
      val hi = pcm(math.min(j + 1, pcm.length - 1)).toDouble
      (lo + (hi - lo) * (pos - j)).toFloat
    }.toArray
  }

  /** Independent M9 edge trim to the documented spec: first..last frame with
    * RMS ≥ the silence floor; no trim when no frame qualifies. */
  def trim(pcm: Array[Float], srHz: Int, cfg: FilterConfig): Array[Float] = {
    if (pcm.isEmpty) return pcm
    val flen = math.max(1, srHz * cfg.frameMs / 1000)
    val nf = math.max(1, pcm.length / flen)
    val loud = (0 until nf).filter { f =>
      val seg = pcm.slice(f * flen, f * flen + flen)
      val rms = math.sqrt(seg.map(s => s.toDouble * s.toDouble).sum / flen)
      20.0 * math.log10(math.max(rms, 1e-9)) >= cfg.silenceFloorDb
    }
    if (loud.isEmpty) pcm
    else pcm.slice(loud.head * flen,
      if (loud.last == nf - 1) pcm.length else (loud.last + 1) * flen)
  }

  final case class AFeat(nSamples: Int, silenceFrac: Double, clipFrac: Double,
                         dynRangeDb: Double, humFrac: Double)

  /** Independent H7 hum fraction to the documented spec — computed WITHOUT
    * an FFT: per 1024-sample periodic-Hann frame, the hum-band bins
    * (1..kMax, kMax = floor(75·1024/srHz)) come from direct DFT sums, and
    * the half-spectrum total Σ_{k=1..511} P(k) comes from Parseval
    * (Σ_k|X(k)|² = N·Σ|x·w|²) minus the directly-summed DC and Nyquist
    * bins, halved (real input ⇒ P(k) = P(N−k)). */
  def humFrac(pcm: Array[Float], srHz: Int): Double = {
    val n = 1024
    if (srHz <= 0) return 0.0
    val kMax = math.floor(75.0 * n / srHz).toInt
    if (kMax < 1) return 0.0
    val nFrames = pcm.length / n
    if (nFrames == 0) return 0.0
    // same strided frame sample as the documented spec: stride
    // max(1, nFrames/8) from frame 0, at most 8 frames
    val stride = math.max(1, nFrames / 8)
    val frames = (0 until nFrames by stride).take(8)
    var hum = 0.0
    var tot = 0.0
    for (f <- frames) {
      val w = Array.tabulate(n)(i =>
        pcm(f * n + i).toDouble * (0.5 - 0.5 * math.cos(2.0 * math.Pi * i / n)))
      val energy = w.map(x => x * x).sum
      def bin(k: Int): Double = {
        var re = 0.0; var im = 0.0
        for (i <- 0 until n) {
          val a = -2.0 * math.Pi * k * i / n
          re += w(i) * math.cos(a); im += w(i) * math.sin(a)
        }
        re * re + im * im
      }
      val p0 = { val s = w.sum; s * s }
      val pNyq = { var s = 0.0; for (i <- 0 until n) s += (if (i % 2 == 0) w(i) else -w(i)); s * s }
      tot += (n * energy - p0 - pNyq) / 2.0
      for (k <- 1 to kMax) hum += bin(k)
    }
    if (tot <= 0.0) 0.0 else hum / tot
  }

  def audioFeatures(pcm: Array[Float], srHz: Int, cfg: FilterConfig): AFeat = {
    val n = pcm.length
    if (n == 0) return AFeat(0, 1.0, 0.0, 0.0, 0.0)
    val clip = pcm.count(s => math.abs(s.toDouble) >= 0.97).toDouble / n
    val flen = math.max(1, srHz * cfg.frameMs / 1000)
    val nf = math.max(1, n / flen)
    val fdb = (0 until nf).map { f =>
      val seg = pcm.slice(f * flen, f * flen + flen)
      val rms = math.sqrt(seg.map(s => s.toDouble * s.toDouble).sum / flen)
      20.0 * math.log10(math.max(rms, 1e-9))
    }.toArray
    val silence = fdb.count(_ < cfg.silenceFloorDb).toDouble / nf
    val sorted = fdb.sorted
    def pct(q: Double) = sorted(math.floor(q * (sorted.length - 1)).toInt)
    AFeat(n, silence, clip, pct(0.95) - pct(0.05), humFrac(pcm, srHz))
  }

  // ---- independent decision cascade ---------------------------------------

  final case class Expected(
      clipId: String,
      keep: Boolean,
      reasons: Set[String],
      scrubbed: String,
      pcm: Option[Array[Float]]
  )

  def expected(row: ClipRow, cfg: FilterConfig, model: TextModel): Expected = {
    val reasons = Set.newBuilder[String]
    val decoded = decode(row.codec, row.bytes)
    if (decoded.isEmpty) reasons += "decode_error"

    val t = row.transcript
    val scrubbed = if (cfg.scrubEnabled && t.nonEmpty) scrub(t) else t

    if (t.isEmpty) reasons += "empty_transcript"
    else {
      // independent scorer (OracleText) over the same broadcast artifact —
      // the engine's lid/pplChar/pplWord never run in this code path
      val (lang, conf) = OracleText.lid(model, t)
      if (!cfg.acceptedLangs.contains(lang)) reasons += "wrong_language"
      else if (conf < cfg.minLangConf) reasons += "low_lang_conf"
      val pplLang = if (model.langIndex(lang) >= 0) lang else model.langs.head
      if (OracleText.pplChar(model, scrubbed, pplLang) > cfg.maxPplChar) reasons += "high_ppl_char"
      if (OracleText.pplWord(model, scrubbed, pplLang) > cfg.maxPplWord) reasons += "high_ppl_word"
      val cps = if (row.dur_ms <= 0) 0.0 else t.length * 1000.0 / row.dur_ms
      if (cps < cfg.minCharsPerSec || cps > cfg.maxCharsPerSec) reasons += "length_ratio"
    }

    // repetition / symbols apply to empty + nonempty alike (empty: 0 → pass)
    val words = t.split("\\s+").filter(_.nonEmpty)
    val runs = if (words.isEmpty) 0 else {
      var best = 1; var cur = 1
      for (i <- 1 until words.length) {
        if (words(i) == words(i - 1)) { cur += 1; best = math.max(best, cur) }
        else cur = 1
      }
      best
    }
    if (runs > cfg.maxRepeatRun) reasons += "repetition"
    val syms =
      if (t.isEmpty) 0.0
      else t.count(c => !Character.isLetterOrDigit(c) && !Character.isWhitespace(c))
        .toDouble / t.length
    if (syms > cfg.maxSymbolFrac) reasons += "symbol_density"

    decoded.foreach { pcm =>
      // analysis grid: resample to the reference rate, then edge-trim —
      // H4 metadata sanity always uses the NATIVE decoded length
      val (ana, anaHz) =
        if (cfg.referenceHz > 0 && row.sr_hz != cfg.referenceHz)
          (resample(pcm, row.sr_hz, cfg.referenceHz), cfg.referenceHz)
        else (pcm, row.sr_hz)
      val trimmed = if (cfg.trimSilence) trim(ana, anaHz, cfg) else ana
      val f = audioFeatures(trimmed, anaHz, cfg)
      val actualMs = pcm.length * 1000.0 / row.sr_hz
      val mism = if (row.dur_ms <= 0) 1.0 else math.abs(actualMs - row.dur_ms) / row.dur_ms
      if (mism > cfg.maxDurMismatch) reasons += "dur_text_mismatch"
      if (f.silenceFrac > cfg.maxSilenceFrac) reasons += "silence"
      if (f.clipFrac > cfg.maxClipFrac) reasons += "clipping"
      if (f.dynRangeDb < cfg.minDynRangeDb) reasons += "flat_dyn_range"
      if (f.humFrac > cfg.maxHumFrac) reasons += "mains_hum"
    }

    val rs = reasons.result()
    Expected(row.clip_id, rs.isEmpty, rs, scrubbed, decoded)
  }
}
