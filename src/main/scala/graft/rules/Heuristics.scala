package graft.rules

import graft.model.{AudioFeatures, FilterConfig}

/** Pure heuristic feature extraction (SURVEY §7.2 step 4) — no Spark here,
  * so every rule is unit/property-testable in isolation, and the Spark layer
  * stays a thin declarative shell.
  */
object Heuristics {

  // ---- text features -------------------------------------------------------

  /** H1 — transcript chars per second of claimed audio duration
    * (reference analog: text-ratio diagnostic, `experimental_evaluator.py:
    * 88-91`). */
  def charsPerSec(transcript: String, durMs: Int): Double =
    if (durMs <= 0) 0.0 else transcript.length * 1000.0 / durMs

  /** H2 — longest run of consecutively repeated words (reference analog:
    * small-component / speck cleanup thresholds M2/M7,
    * `image_processing.py:1424-1434`). "word word word" → 3. */
  def maxRepeatRun(transcript: String): Int = {
    val words = transcript.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return 0
    var best = 1
    var run = 1
    var i = 1
    while (i < words.length) {
      if (words(i) == words(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best
  }

  /** H3 — fraction of non-letter/digit/whitespace chars (reference analog:
    * noise `text_ratio`, `experimental_evaluator.py:88-91`). */
  def symbolFrac(transcript: String): Double = {
    if (transcript.isEmpty) return 0.0
    var sym = 0
    var i = 0
    while (i < transcript.length) {
      val c = transcript.charAt(i)
      if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) sym += 1
      i += 1
    }
    sym.toDouble / transcript.length
  }

  // ---- audio features ------------------------------------------------------

  @inline private def db(x: Double): Double =
    20.0 * math.log10(math.max(x, 1e-9))

  /** Run-length "morphology" on a boolean mask (reference M1-M3:
    * erosion/dilation/opening/closing on binary masks,
    * `image_processing.py:101-123`): opening drops true-runs shorter than
    * `minRun`; closing bridges false-gaps of length ≤ `maxGap`. */
  def openMask(mask: Array[Boolean], minRun: Int): Array[Boolean] = {
    val out = mask.clone()
    var i = 0
    while (i < out.length) {
      if (out(i)) {
        var j = i
        while (j < out.length && out(j)) j += 1
        if (j - i < minRun) { var k = i; while (k < j) { out(k) = false; k += 1 } }
        i = j
      } else i += 1
    }
    out
  }

  def closeMask(mask: Array[Boolean], maxGap: Int): Array[Boolean] = {
    val out = mask.clone()
    var i = 0
    while (i < out.length) {
      if (!out(i)) {
        var j = i
        while (j < out.length && !out(j)) j += 1
        // interior gap only (not leading/trailing silence)
        if (i > 0 && j < out.length && j - i <= maxGap) {
          var k = i; while (k < j) { out(k) = true; k += 1 }
        }
        i = j
      } else i += 1
    }
    out
  }

  private def countSegments(mask: Array[Boolean]): Int = {
    var n = 0
    var i = 0
    while (i < mask.length) {
      if (mask(i) && (i == 0 || !mask(i - 1))) n += 1
      i += 1
    }
    n
  }

  /** P3 analog — envelope smoothing: centered moving average with window
    * `w` (reference Gaussian blur `image_processing.py:1548-1560`, recast as
    * the 1-D low-pass used by the band-contrast saliency split). */
  def movingAvg(x: Array[Float], w: Int): Array[Float] = {
    if (x.isEmpty || w <= 1) return x
    val out = new Array[Float](x.length)
    val half = w / 2
    var sum = 0.0
    var lo = 0
    var hi = -1
    var i = 0
    while (i < x.length) {
      val nlo = math.max(0, i - half)
      val nhi = math.min(x.length - 1, i + half)
      while (hi < nhi) { hi += 1; sum += x(hi) }
      while (lo < nlo) { sum -= x(lo); lo += 1 }
      out(i) = (sum / (nhi - nlo + 1)).toFloat
      i += 1
    }
    out
  }

  /** Percentile over a sorted copy, index = floor(q·(n−1)) — fixed spec so
    * the oracle matches bit-for-bit. */
  def percentile(xs: Array[Double], q: Double): Double = {
    if (xs.isEmpty) return 0.0
    val s = xs.clone()
    java.util.Arrays.sort(s)
    s(math.floor(q * (s.length - 1)).toInt)
  }

  /** M9 edge trim: sample bounds [from, until) of the first..last frame at
    * or above the silence floor (reference border/artifact removal,
    * `image_processing.py:211-362`, recast to 1-D: leading/trailing silence
    * is an artifact to strip before analysis, not content). Returns the full
    * range when no frame reaches the floor (an all-silent clip is left for
    * the H5 silence rule to drop) — never an empty slice. */
  def trimBounds(pcm: Array[Float], srHz: Int, cfg: FilterConfig): (Int, Int) = {
    val n = pcm.length
    if (n == 0) return (0, 0)
    val frameLen = math.max(1, srHz * cfg.frameMs / 1000)
    val nFrames = math.max(1, n / frameLen)
    var first = -1
    var last = -1
    var f = 0
    while (f < nFrames) {
      var s = 0.0
      var j = f * frameLen
      // clamp to the clip: for clips shorter than one frame (n < frameLen)
      // the forced single frame must not read past the end — matches the
      // fused kernel in `audioFeatures` (energies normalized by frameLen
      // either way, so the two paths stay bit-identical)
      val end = math.min(j + frameLen, n)
      while (j < end) { val x = pcm(j).toDouble; s += x * x; j += 1 }
      if (db(math.sqrt(s / frameLen)) >= cfg.silenceFloorDb) {
        if (first < 0) first = f
        last = f
      }
      f += 1
    }
    if (first < 0) (0, n)
    else (first * frameLen,
      if (last == nFrames - 1) n else (last + 1) * frameLen)
  }

  /** 64-bit acoustic fingerprint — the audio analog of text SimHash,
    * feeding the same banded Hamming near-dup machinery
    * (`Dedup.hamming64Pairs`). Two 32-bit halves:
    *
    *  - bits 0..31 — ENVELOPE SHAPE: the clip's time axis splits into 33
    *    equal segments; bit i = [energy(segment i+1) > energy(segment i)].
    *  - bits 32..63 — SPECTRAL LEVEL: a thermometer code of the mean
    *    zero-crossing rate (bit 32+j = [zcr > j/64], thresholds covering
    *    0..0.5 crossings/sample), so carrier-frequency distance maps to
    *    small Hamming distance instead of arbitrary bit flips. Steady
    *    same-envelope signals at different pitches — degenerate for an
    *    envelope-only fingerprint — separate on this half.
    *
    * Invariances: GAIN (both halves compare, never measure amplitude;
    * zero crossings are sign-based), CODEC (quantization noise flips only
    * near-tie bits / shifts zcr by at most a thermometer step), LENGTH
    * (segments scale with the clip). Near-identical recordings
    * (re-uploads, re-encodes, gain changes) land within a small Hamming
    * distance. Clips shorter than 33 samples fingerprint as 0. */
  def audioFingerprint(pcm: Array[Float]): Long = {
    val segs = 33
    val n = pcm.length
    if (n < segs) return 0L
    val e = new Array[Double](segs)
    var crossings = 0L
    // segment-outer iteration: sample i belongs to seg floor(i·segs/n), so
    // seg s spans [ceil(s·n/segs), ceil((s+1)·n/segs)) — identical
    // assignment to the former per-sample (i·segs)/n divide, without a
    // 20-cycle integer division per sample (this division was ~60% of the
    // fingerprint's cost, FeatProbe). Energy accumulates in the same order;
    // crossing count compares the same neighbors: bit-identical.
    var s = 0
    var i = 0
    var prevPos = pcm(0) > 0f
    while (s < segs) {
      val segEnd = (((s + 1).toLong * n + segs - 1) / segs).toInt
      var es = e(s)
      var cr = 0
      while (i < segEnd) {
        val x = pcm(i)
        es += x.toDouble * x
        val pos = x > 0f
        // branch-free: pos != prevPos adds exactly 1 (i = 0 is excluded by
        // prevPos being initialized to pcm(0)'s own sign)
        cr += (if (pos != prevPos) 1 else 0)
        prevPos = pos
        i += 1
      }
      crossings += cr
      e(s) = es
      s += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (e(b + 1) > e(b)) fp |= (1L << b); b += 1 }
    val zcr = crossings.toDouble / n
    var j = 0
    while (j < 32) { if (zcr > j / 64.0) fp |= (1L << (32 + j)); j += 1 }
    fp
  }

  /** Extract the full audio feature struct from decoded PCM.
    * Frame-based (non-overlapping `cfg.frameMs` windows): RMS energy per
    * frame → silence mask → opening/closing repair → speech span + segment
    * count (reference F1 gradient text detection + F4 projection-profile
    * line segmentation, `ocr_engine.py:319-346`, recast to 1-D energy).
    *
    * `trim = true` fuses the M9 edge trim (SURVEY M9, `trimBounds` spec)
    * into this pass: frame energies are computed once on the full grid, the
    * first..last frame at or above the silence floor select the analysis
    * range, and every statistic is then computed over that range only —
    * sample- and frame-identical to trimming the array first, without the
    * copy or the second frame-energy pass. */
  def audioFeatures(pcm: Array[Float], srHz: Int, cfg: FilterConfig,
                    trim: Boolean = false): AudioFeatures = {
    val nAll = pcm.length
    if (nAll == 0)
      return AudioFeatures(0, -180.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0,
        0.0, 0.0, 0.0, 0.0, 0.0, Nil)

    // ---- pass 1: frame energies on the full grid (drives trim + masks) ----
    val frameLen = math.max(1, srHz * cfg.frameMs / 1000)
    val nFramesAll = math.max(1, nAll / frameLen)
    val msqAll = new Array[Double](nFramesAll)
    var f = 0
    while (f < nFramesAll) {
      var s = 0.0
      var j = f * frameLen
      val end = math.min(j + frameLen, nAll)
      while (j < end) { val x = pcm(j).toDouble; s += x * x; j += 1 }
      msqAll(f) = s / frameLen
      f += 1
    }

    // M9 trim range in frames → samples ([from, until) of the analysis)
    var f0 = 0
    var f1 = nFramesAll - 1
    if (trim) {
      var first = -1; var last = -1
      var k = 0
      while (k < nFramesAll) {
        if (db(math.sqrt(msqAll(k))) >= cfg.silenceFloorDb) {
          if (first < 0) first = k
          last = k
        }
        k += 1
      }
      if (first >= 0) { f0 = first; f1 = last }
    }
    val from = f0 * frameLen
    val until = if (f1 == nFramesAll - 1) nAll else (f1 + 1) * frameLen
    val n = until - from
    val nFrames = f1 - f0 + 1
    val frameMsq = if (f0 == 0 && f1 == nFramesAll - 1) msqAll
      else java.util.Arrays.copyOfRange(msqAll, f0, f1 + 1)
    val frameDb = frameMsq.map(m => db(math.sqrt(m)))

    // ---- pass 2 (fused): sample stats + DC + band contrast over [from,until)
    var sumSq = 0.0
    var peak = 0.0
    var clipped = 0
    var dcSum = 0.0
    var eLow = 0.0
    var eHigh = 0.0
    // centered moving average (P3 smoother, window ~1 ms) kept incrementally;
    // the interior runs with a CONSTANT window (one add, one subtract, one
    // multiply per sample — no clamping, no division), only the ≤half-sized
    // head/tail edges pay the general clamped form
    val half = math.max(2, srHz / 1000) / 2
    val wFull = 2 * half + 1
    val invFull = 1.0 / wFull
    @inline def step(i: Int, smooth: Double): Unit = {
      val x = pcm(i).toDouble
      sumSq += x * x
      val a = math.abs(x)
      if (a > peak) peak = a
      // 0.97, not ~1.0: lossy codecs decode hard-clipped audio below full
      // scale (µ-law's max decode level is 32124/32768 ≈ 0.980)
      if (a >= 0.97) clipped += 1
      dcSum += x
      val resid = x - smooth
      eLow += smooth * smooth
      eHigh += resid * resid
    }
    var winSum = 0.0
    var lo = from
    var hi = from - 1
    val midEnd = until - half // first index whose window would clamp right
    var i = from
    while (i < until && (i < from + half || i >= midEnd)) {
      // edge region (head until the window fills; tail once it shrinks)
      val nlo = math.max(from, i - half)
      val nhi = math.min(until - 1, i + half)
      while (hi < nhi) { hi += 1; winSum += pcm(hi) }
      while (lo < nlo) { winSum -= pcm(lo); lo += 1 }
      step(i, winSum / (nhi - nlo + 1))
      i += 1
      if (i == from + half && i < midEnd) {
        // enter the constant-window interior: window = [i-half, i+half]
        while (hi < i + half) { hi += 1; winSum += pcm(hi) }
        while (lo < i - half) { winSum -= pcm(lo); lo += 1 }
        while (i < midEnd) {
          step(i, winSum * invFull)
          i += 1
          if (i < midEnd) { winSum += pcm(i + half) - pcm(i - half - 1) }
        }
        // re-sync the incremental bounds for the tail edge: winSum covers
        // the window of the LAST interior index i−1, i.e. [i−1−half, i−1+half]
        lo = i - 1 - half
        hi = i - 1 + half
      }
    }
    val rmsDb = db(math.sqrt(sumSq / n))
    val clipFrac = clipped.toDouble / n
    val bandContrast = 10.0 * math.log10(math.max(eHigh, 1e-18) / math.max(eLow, 1e-18))
    val dcOffset = dcSum / n

    val speechRaw = frameDb.map(_ >= cfg.silenceFloorDb)
    val silenceFrac = 1.0 - speechRaw.count(identity).toDouble / nFrames
    val speech = closeMask(openMask(speechRaw, cfg.minBurstFrames), cfg.maxGapFrames)
    val speechMs = speech.count(identity).toDouble * cfg.frameMs
    val dynRange = percentile(frameDb, 0.95) - percentile(frameDb, 0.05)

    // P8 multiscale: the same spread statistic over mid (5×) and long (25×)
    // windows, aggregated in the energy domain from the base frames
    def dynAt(scale: Int): Double = {
      val m = frameMsq.grouped(scale).map(g => db(math.sqrt(g.sum / g.length))).toArray
      percentile(m, 0.95) - percentile(m, 0.05)
    }
    val dynMid = dynAt(5)
    val dynLong = dynAt(25)

    // O5: per-segment durations (ms) of the repaired speech mask
    val segMs = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < speech.length) {
        if (speech(i)) {
          var j = i
          while (j < speech.length && speech(j)) j += 1
          out += (j - i).toDouble * cfg.frameMs
          i = j
        } else i += 1
      }
      out.toSeq
    }

    AudioFeatures(
      n_samples = n,
      rms_db = rmsDb,
      peak = peak,
      silence_frac = silenceFrac,
      clip_frac = clipFrac,
      dyn_range_db = dynRange,
      speech_ms = speechMs,
      n_segments = countSegments(speech),
      dyn_range_mid_db = dynMid,
      dyn_range_long_db = dynLong,
      band_contrast_db = bandContrast,
      dc_offset = dcOffset,
      hum_frac = spectralHumFrac(pcm, from, until, srHz),
      segment_ms = segMs
    )
  }

  /** H4 — claimed `dur_ms` vs actual decoded length: relative mismatch. */
  def durMismatch(nSamples: Int, srHz: Int, durMs: Int): Double = {
    if (durMs <= 0 || srHz <= 0) return 1.0
    val actualMs = nSamples * 1000.0 / srHz
    math.abs(actualMs - durMs) / durMs
  }

  // ---- spectral hum detection (H7) ----------------------------------------

  /** Spectral frame length for [[spectralHumFrac]] (samples). 1024 at the
    * 8 kHz reference grid = 128 ms frames, 7.8 Hz bins — fine enough to
    * separate 50/60 Hz mains hum from the ≥ 100 Hz speech band. */
  val HumFrameLen = 1024

  /** Hum band ceiling (Hz): spectral power at or below this frequency counts
    * as hum. 75 Hz keeps a ≥ 3-bin guard band below the speech fundamental
    * range so Hann-window leakage from voiced speech stays at sidelobe level
    * (−31 dB), not mainlobe level. */
  val HumMaxHz = 75.0

  /** Frame budget for [[spectralHumFrac]]: mains hum is stationary, so a
    * bounded, evenly-strided sample of frames measures it as well as every
    * frame — and caps the FFT cost per clip at O(HumMaxFrames·N·log N)
    * regardless of duration (an uncapped scan added ~50% to the whole
    * decode+score stage on 6.5 s-average clips). 8 frames ≈ 1 s of audio;
    * the decision margin is ≥ 10x, far above the sampling noise. */
  val HumMaxFrames = 8

  private val hannWin: Array[Double] =
    Array.tabulate(HumFrameLen)(i =>
      0.5 - 0.5 * math.cos(2.0 * math.Pi * i / HumFrameLen))

  // Per-length twiddle tables for [[fft]]: for each stage len, the half=len/2
  // complex factors e^{-2πik/len}, computed directly per k (MORE accurate
  // than the former per-butterfly recurrence, which accumulated rounding
  // across k) and reused across every frame/clip — the recurrence cost 4
  // multiplies per butterfly on top of the butterfly itself. Keyed by n; in
  // practice only the fixed analysis lengths (1024, fbank frames) occur.
  private val twiddleCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Double], Array[Double])]()

  private def twiddles(n: Int): (Array[Double], Array[Double]) =
    twiddleCache.computeIfAbsent(n, { _ =>
      // stage len's table occupies [len/2, len) (so total size n), index
      // (len/2 + k) holds e^{-2πik/len}
      val tr = new Array[Double](n)
      val ti = new Array[Double](n)
      var len = 2
      while (len <= n) {
        val half = len >> 1
        var k = 0
        while (k < half) {
          val ang = -2.0 * math.Pi * k / len
          tr(half + k) = math.cos(ang)
          ti(half + k) = math.sin(ang)
          k += 1
        }
        len <<= 1
      }
      (tr, ti)
    })

  /** In-place iterative radix-2 complex FFT (length must be a power of 2).
    * Textbook Cooley-Tukey: bit-reversal permutation, then butterflies with
    * precomputed per-stage twiddle tables (exact per-index factors — at or
    * below the former recurrence's rounding error, well inside the 1e-9
    * engine-vs-DFT-oracle gate). The independent test oracle never calls
    * this — it verifies via direct DFT sums + Parseval instead. */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    val (twr, twi) = twiddles(n)
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val half = len >> 1
      var s = 0
      while (s < n) {
        var k = 0
        while (k < half) {
          val cr = twr(half + k)
          val ci = twi(half + k)
          val ur = re(s + k); val ui = im(s + k)
          val xr = re(s + k + half); val xi = im(s + k + half)
          val vr = xr * cr - xi * ci
          val vi = xr * ci + xi * cr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + half) = ur - vr; im(s + k + half) = ui - vi
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** H7 — fraction of spectral power in the mains-hum band (≤ [[HumMaxHz]],
    * DC excluded), the 1-D analog of the reference's periodic-artifact /
    * line-pattern removal (`image_processing.py:817-871` detects and erases
    * ruled-line interference; here the interference is 50/60 Hz electrical
    * hum riding under the speech band).
    *
    * Spec (shared with the independent test oracle, which recomputes it via
    * direct DFT sums + Parseval rather than an FFT):
    * non-overlapping [[HumFrameLen]]-sample frames fully inside
    * `[from, until)`, sampled at an even stride
    * `max(1, nFrames / HumMaxFrames)` starting at frame 0 and capped at
    * [[HumMaxFrames]] frames; each analyzed frame is periodic-Hann
    * windowed; per frame the power spectrum `P(k) = |X(k)|²` contributes
    * `P(1..kMax)` to the hum accumulator and `P(1..N/2−1)` (half spectrum,
    * DC and Nyquist excluded) to the total, where
    * `kMax = floor(HumMaxHz·N/srHz)`. Returns hum/total over the analyzed
    * frames; 0 when no complete frame fits, the band is unresolvable
    * (`kMax < 1`), or total power is 0.
    */
  def spectralHumFrac(pcm: Array[Float], from: Int, until: Int, srHz: Int): Double = {
    val n = HumFrameLen
    if (srHz <= 0) return 0.0
    val kMax = math.floor(HumMaxHz * n / srHz).toInt
    if (kMax < 1) return 0.0
    val nFrames = (until - from) / n
    if (nFrames <= 0) return 0.0
    val stride = math.max(1, nFrames / HumMaxFrames)
    var hum = 0.0
    var tot = 0.0
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var f = 0
    var analyzed = 0
    while (f < nFrames && analyzed < HumMaxFrames) {
      val base = from + f * n
      var i = 0
      while (i < n) {
        re(i) = pcm(base + i).toDouble * hannWin(i)
        im(i) = 0.0
        i += 1
      }
      fft(re, im)
      var k = 1
      while (k < n / 2) {
        val p = re(k) * re(k) + im(k) * im(k)
        tot += p
        if (k <= kMax) hum += p
        k += 1
      }
      f += stride
      analyzed += 1
    }
    if (tot <= 0.0) 0.0 else hum / tot
  }
}
