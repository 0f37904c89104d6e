package graft.fixture

import graft.codec.Codecs
import graft.model.ClipRow

/** Deterministic synthetic clips-table generator (FIXTURES.md).
  *
  * Pure per-row function `row(i, params)` — each row derives its own PRNG
  * stream from (seed, i), so generation is order- and partitioning-free:
  * any executor layout yields byte-identical rows. Mirrors the reference's
  * curated defect corpora (`/root/reference/image/original/`,
  * `image/test-image/`: clean/stained/handwritten pages) as planted,
  * labeled flaws at FIXTURES §4 rates.
  *
  * Skew by construction (north-rule clause): language `aa` ≈ 70% of rows and
  * codec `pcm_s16le` ≈ 60%, so partitioning by language/codec hot-spots and
  * the salted repartition is genuinely exercised.
  */
object ClipGen {

  final case class Params(
      n: Long,
      seed: Long = 42L,
      minDurMs: Int = 300,
      maxDurMs: Int = 30000
  )

  /** Defect classes, disjoint per row (single uniform draw over ranges). */
  object Defect {
    val None          = "none"
    val BadBytes      = "bad_bytes"       // 1%
    val WrongLang     = "wrong_lang"      // 5%  (language dd)
    val Garbled       = "garbled"         // 2%
    val Repetition    = "repetition"      // 3%
    val SymbolHeavy   = "symbol_heavy"    // 2%
    val DurMismatch   = "dur_mismatch"    // 2%
    val NearSilence   = "near_silence"    // 5%
    val Clipped       = "clipped"         // 3%
    val FlatRange     = "flat_range"      // 2%
    val Pii           = "pii"             // 4%  (kept, scrubbed)
    val EmptyText     = "empty_text"      // 3%
    val PaddedSilence = "padded_silence"  // 3%  (kept — M9 edge trim rescues)
    val Hum           = "hum"             // 2%  (50/60 Hz mains hum under speech)
  }

  private val defectCdf: IndexedSeq[(Double, String)] = {
    val probs = IndexedSeq(
      Defect.BadBytes -> 0.01, Defect.WrongLang -> 0.05, Defect.Garbled -> 0.02,
      Defect.Repetition -> 0.03, Defect.SymbolHeavy -> 0.02,
      Defect.DurMismatch -> 0.02, Defect.NearSilence -> 0.05,
      Defect.Clipped -> 0.03, Defect.FlatRange -> 0.02, Defect.Pii -> 0.04,
      Defect.EmptyText -> 0.03,
      // appended last so earlier classes' draw ranges are unchanged
      Defect.PaddedSilence -> 0.03,
      Defect.Hum -> 0.02)
    var acc = 0.0
    probs.map { case (d, p) => acc += p; (acc, d) }
  }

  private def drawDefect(rng: Prng): String = {
    val r = rng.nextDouble()
    defectCdf.find(r < _._1).map(_._2).getOrElse(Defect.None)
  }

  /** Bijective permutation on [0, n) via affine cycle-walking over the next
    * power of two — the "seeded shuffle" of FIXTURES §1 in O(1)/row. */
  def permute(i: Long, n: Long, seed: Long): Long = {
    var bits = 1L
    while (bits < n) bits <<= 1
    val mask = bits - 1
    val a = (seed | 1L) & mask // odd multiplier ⇒ affine map is bijective mod 2^k
    val c = (seed >>> 17) & mask
    var x = i
    do {
      x = (a * x + c) & mask
      x ^= (x >>> 7) & mask
      x = (a * x + (c ^ 0x5A5AL)) & mask
    } while (x >= n)
    x
  }

  // ---- waveform synthesis --------------------------------------------------

  /** Speech-like waveform: alternating bursts (sinusoid stack + noise) and
    * pauses. `mode` tweaks amplitude structure for planted audio defects. */
  private def synthWave(rng: Prng, nSamples: Int, srHz: Int, mode: String): Array[Short] = {
    val out = new Array[Short](nSamples)
    if (nSamples == 0) return out
    val f1 = 100.0 + rng.nextDouble() * 200.0
    val f2 = 400.0 + rng.nextDouble() * 600.0
    val f3 = 1000.0 + rng.nextDouble() * 1500.0
    val noiseAmp0 = 0.02 + rng.nextDouble() * 0.02

    val (speechAmp, gain) = mode match {
      case Defect.NearSilence => (0.002, 1.0)
      case Defect.Clipped     => (0.5, 6.0)
      case _                  => (0.25 + rng.nextDouble() * 0.25, 1.0)
    }
    // near-silence rows must sit below the silence floor, noise included
    val noiseAmp = if (mode == Defect.NearSilence) noiseAmp0 * 0.05 else noiseAmp0
    val flat = mode == Defect.FlatRange
    // mains hum rides under everything, pauses included (H7 planted defect);
    // draws only happen in hum mode so other modes' PRNG streams are unchanged
    val (humAmp, humHz) =
      if (mode == Defect.Hum)
        (0.06 + rng.nextDouble() * 0.04, if (rng.nextDouble() < 0.5) 50.0 else 60.0)
      else (0.0, 0.0)

    // burst/pause schedule in samples
    var i = 0
    var inSpeech = true
    var segEnd =
      if (flat) nSamples
      else math.min(nSamples, (srHz * (0.2 + rng.nextDouble() * 0.6)).toInt)
    val twoPi = 2.0 * math.Pi
    while (i < nSamples) {
      if (i >= segEnd && !flat) {
        inSpeech = !inSpeech
        val durS = if (inSpeech) 0.2 + rng.nextDouble() * 0.6
                   else 0.1 + rng.nextDouble() * 0.3
        segEnd = math.min(nSamples, i + math.max(1, (srHz * durS).toInt))
      }
      val t = i.toDouble / srHz
      // slow tremolo so frame RMS genuinely varies (~20 dB swing) — keeps
      // clean clips clear of the H6 flat-range floor; flat rows skip it, and
      // clipped rows skip it so the overdrive clips hard and sustained
      val mod =
        if (flat || mode == Defect.Clipped) 1.0
        else 0.55 + 0.45 * math.sin(twoPi * 2.0 * t)
      val base =
        if (inSpeech || flat)
          mod * speechAmp * (math.sin(twoPi * f1 * t) + 0.5 * math.sin(twoPi * f2 * t) +
            0.25 * math.sin(twoPi * f3 * t)) / 1.75
        else 0.0
      val x0 = (base + (if (flat) 0.0 else noiseAmp * rng.nextGaussian() * 0.3) +
        humAmp * math.sin(twoPi * humHz * t)) * gain
      val x = math.max(-0.9999, math.min(0.9999, x0))
      out(i) = math.round(x * 32767.0).toShort
      i += 1
    }
    out
  }

  // ---- transcript synthesis ------------------------------------------------

  private val garbleChars =
    "abcdefghijklmnopqrstuvwxyz0123456789      ".toCharArray

  private def garbled(rng: Prng, len: Int): String = {
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) { sb.append(garbleChars(rng.nextInt(garbleChars.length))); i += 1 }
    sb.toString.trim
  }

  /** Insert PII tokens without pushing chars/sec past the H1 ceiling —
    * PII rows must stay KEPT (scrub rewrites, never drops). `budgetChars`
    * is the headroom below ~85% of the H1 maximum. */
  private def injectPii(rng: Prng, text: String, budgetChars: Int): String = {
    val kinds = IndexedSeq(
      () => s"user${rng.nextInt(999)}@example${rng.nextInt(99)}.com",
      () => f"${100 + rng.nextInt(900)}%03d-${10 + rng.nextInt(90)}%02d-${1000 + rng.nextInt(9000)}%04d",
      () => f"AB${1000000 + rng.nextInt(9000000)}%07d",
      () => s"+${1 + rng.nextInt(99)} ${100 + rng.nextInt(900)} ${100 + rng.nextInt(900)} ${1000 + rng.nextInt(9000)}",
      () => Scrub.toxWord(rng)
    )
    val words = text.split(" ").toBuffer
    val nInserts = math.min(1 + rng.nextInt(3), math.max(0, budgetChars / 30))
    var k = 0
    while (k < nInserts) {
      val tok = kinds(rng.nextInt(kinds.length))()
      words.insert(rng.nextInt(words.length + 1), tok)
      k += 1
    }
    words.mkString(" ")
  }

  private object Scrub {
    private val lex = graft.text.Scrubber.toxLexicon.toIndexedSeq
    def toxWord(rng: Prng): String = lex(rng.nextInt(lex.length))
  }

  private def injectRepetition(rng: Prng, text: String): String = {
    val words = text.split(" ").toBuffer
    if (words.isEmpty) return text
    val pos = rng.nextInt(words.length)
    val w = words(pos)
    val times = 6 + rng.nextInt(5)
    words.insertAll(pos, Seq.fill(times)(w))
    words.mkString(" ")
  }

  private def injectSymbols(rng: Prng, text: String): String = {
    val syms = "#$%&*@!{}[]<>~^|\\".toCharArray
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      sb.append(text.charAt(i))
      if (rng.nextDouble() < 0.8) sb.append(syms(rng.nextInt(syms.length)))
      i += 1
    }
    sb.toString
  }

  // ---- row assembly --------------------------------------------------------

  private val srChoices = IndexedSeq(8000, 16000, 22050, 44100)
  private val srWeights = IndexedSeq(0.3, 0.4, 0.2, 0.1)
  private val codecChoices = IndexedSeq(Codecs.PcmS16le, Codecs.Ulaw8, Codecs.Adpcm4)
  private val codecWeights = IndexedSeq(0.6, 0.25, 0.15)
  private val langChoices = IndexedSeq("aa", "bb", "cc")
  private val langWeights = IndexedSeq(0.7, 0.2, 0.1)

  /** Generate row `i` of the table. Fully deterministic in (params, i). */
  def row(i: Long, params: Params): ClipRow = {
    val rng = Prng.derive(params.seed, 0xC11F5L, i)
    val clipId = f"clip-${permute(i, params.n, params.seed)}%012d"
    val defect = drawDefect(rng)

    val srHz = rng.choose(srChoices, srWeights)
    val codec = rng.choose(codecChoices, codecWeights)
    // log-uniform duration
    val lnLo = math.log(params.minDurMs.toDouble)
    val lnHi = math.log(params.maxDurMs.toDouble)
    val durDraw = math.exp(lnLo + rng.nextDouble() * (lnHi - lnLo)).toInt.max(params.minDurMs)
    // padded rows need a speech span of several frames after 95% padding
    val trueDurMs = if (defect == Defect.PaddedSilence) durDraw.max(8000) else durDraw
    val nSamples = (srHz.toLong * trueDurMs / 1000L).toInt

    val wave = defect match {
      case Defect.PaddedSilence =>
        // keepable speech confined to a short interior span with true-silence
        // edge padding: > 90% silent untrimmed (would trip H5), normal once
        // the M9 edge trim strips the pads
        val lead = (nSamples * 0.50).toInt
        val tail = (nSamples * 0.45).toInt
        val act = math.max(1, nSamples - lead - tail)
        val inner = synthWave(rng, act, srHz, Defect.None)
        val out = new Array[Short](nSamples)
        System.arraycopy(inner, 0, out, lead, act)
        out
      case _ => synthWave(rng, nSamples, srHz, defect)
    }
    val encoded = Codecs.encode(codec, wave)
    val bytes = defect match {
      case Defect.BadBytes =>
        // corrupt deterministically: truncate to an invalid length
        codec match {
          case Codecs.PcmS16le => encoded.take(math.max(1, encoded.length - 1)) // odd
          case Codecs.Ulaw8    => Array.empty[Byte]
          case Codecs.Adpcm4   => encoded.take(math.max(2, encoded.length / 3)) // header/len mismatch
        }
      case _ => encoded
    }

    val durMs = defect match {
      case Defect.DurMismatch => (trueDurMs * (2.0 + rng.nextDouble())).toInt
      case _                  => trueDurMs
    }

    val lang = if (defect == Defect.WrongLang) "dd" else rng.choose(langChoices, langWeights)
    // couple transcript length to duration: chars/sec ~ U[8, 30] → H1-safe
    val cps = 8.0 + rng.nextDouble() * 22.0
    val targetChars = math.max(8, (trueDurMs / 1000.0 * cps).toInt)
    val base = LangGen.byName(lang).sentence(rng, targetChars)
    val transcript = defect match {
      case Defect.EmptyText   => ""
      case Defect.Garbled     => garbled(rng, targetChars)
      case Defect.Repetition  => injectRepetition(rng, base)
      case Defect.SymbolHeavy => injectSymbols(rng, base)
      case Defect.Pii =>
        val budget = (trueDurMs / 1000.0 * 60.0 * 0.85).toInt - base.length
        injectPii(rng, base, budget)
      case _                  => base
    }

    ClipRow(clipId, bytes, srHz, durMs, codec, transcript)
  }

  /** The defect the generator planted in row i (test/diagnostic use only —
    * the engine and the oracle recompute everything from row content). */
  def plantedDefect(i: Long, params: Params): String =
    drawDefect(Prng.derive(params.seed, 0xC11F5L, i))
}
