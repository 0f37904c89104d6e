package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

import graft.codec.Codecs
import graft.fixture.ClipGen
import graft.model.{ClipRow, Presets}
import graft.oracle.Oracle
import graft.pipeline.FilterPipeline
import graft.text.TextModel

/** End-to-end gates vs the independent oracle (BASELINE.md):
  * keep/drop F1 ≥ 0.99, exact scrubbed-transcript equality, per-row decoded
  * PCM SNR ≥ 30 dB. Fixture: 1000 deterministic synthetic clips. */
class PipelineSpec extends AnyFunSuite {

  private val N = 1000
  private val params = ClipGen.Params(N)
  private val cfg = Presets.default

  // generated once on the driver (parallel streams), shared by engine + oracle
  private lazy val rows: Vector[ClipRow] =
    java.util.stream.LongStream.range(0, N).parallel()
      .mapToObj(i => ClipGen.row(i, params))
      .collect(java.util.stream.Collectors.toList[ClipRow]).asScala.toVector

  private lazy val oracleByIdCache: Map[String, Oracle.Expected] =
    rows.map(r => r.clip_id -> Oracle.expected(r, cfg, TextModel.default)).toMap

  test("acoustic fingerprint: gain-invariant, codec-robust, discriminative") {
    import graft.rules.Heuristics.audioFingerprint
    def synth(seed: Int): Array[Float] = {
      // seed-dependent amplitude envelope over a carrier: distinct energy
      // profiles per seed, deterministic
      val n = 16000
      Array.tabulate(n) { i =>
        val env = 0.15 + 0.85 * math.abs(
          math.sin(2 * math.Pi * i / (400.0 + (seed % 9) * 230.0)) *
            math.cos(2 * math.Pi * i / (900.0 + (seed % 5) * 170.0)))
        (env * 0.6 * math.sin(2 * math.Pi * 440 * i / 16000.0)).toFloat
      }
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val p = synth(1)
    // positive gain changes the energies, never the comparisons
    assert(audioFingerprint(p) == audioFingerprint(p.map(_ * 0.37f)))
    // µ-law re-encode: quantization noise flips only near-tie bits
    val shorts = p.map(x => (math.max(-1f, math.min(1f, x)) * 32767f).toShort)
    val roundTrip = Codecs.decodeUlaw(Codecs.encodeUlaw(shorts))
    val hEnc = ham(audioFingerprint(p), audioFingerprint(roundTrip))
    assert(hEnc <= 6, s"codec round-trip hamming $hEnc")
    // distinct recordings sit far outside the near-dup radius (<= 6)
    val hDiff = ham(audioFingerprint(synth(2)), audioFingerprint(p))
    assert(hDiff >= 12, s"distinct-signal hamming $hDiff")
    // same envelope, different pitch: separated by the spectral half
    val octaveUp = Array.tabulate(p.length) { i =>
      val env = 0.15 + 0.85 * math.abs(
        math.sin(2 * math.Pi * i / (400.0 + (1 % 9) * 230.0)) *
          math.cos(2 * math.Pi * i / (900.0 + (1 % 5) * 170.0)))
      (env * 0.6 * math.sin(2 * math.Pi * 1760 * i / 16000.0)).toFloat
    }
    val hPitch = ham(audioFingerprint(p), audioFingerprint(octaveUp))
    assert(hPitch >= 8, s"two-octave pitch shift hamming $hPitch")
    assert(audioFingerprint(Array.empty[Float]) == 0L)
  }

  test("acoustic fingerprint collisions imply genuine envelope similarity") {
    // semantic-precision gate: fixture clips that COLLIDE (hamming 0,
    // duration within 2%) must be truly same-shaped — normalized-envelope
    // correlation near 1 — while random same-ish-duration pairs sit near 0.
    // (On this fixture the shared 2 Hz tremolo makes equal-duration clips
    // legitimately envelope-identical; the fingerprint is measuring shape,
    // not hallucinating matches.)
    import graft.rules.Heuristics.audioFingerprint
    def env(p: Array[Float], k: Int = 32): Array[Double] = {
      val e = new Array[Double](k)
      var i = 0
      while (i < p.length) { e(((i.toLong * k) / p.length).toInt) += p(i) * p(i); i += 1 }
      e
    }
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val ma = a.sum / a.length; val mb = b.sum / b.length
      val num = a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum
      val d = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum) *
        math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      if (d == 0) 0.0 else num / d
    }
    val decoded = rows.take(600).flatMap { c =>
      Codecs.decode(c.codec, c.bytes).toOption
        .filter(_.length > 1000).map(p => (c.clip_id, audioFingerprint(p), p))
    }
    val colliding = decoded.groupBy(_._2).values.filter(_.size > 1).flatMap { g =>
      g.combinations(2).collectFirst {
        case Seq((_, _, pa), (_, _, pb))
          if math.abs(pa.length - pb.length) <=
            math.max(pa.length, pb.length) * 0.02 => corr(env(pa), env(pb))
      }
    }.toSeq
    colliding.foreach(c => assert(c > 0.9, s"colliding pair corr $c"))
    val randomPairs = (0 until 20).map { k =>
      corr(env(decoded(k * 13 % decoded.size)._3),
        env(decoded((k * 29 + 311) % decoded.size)._3))
    }
    assert(randomPairs.max < 0.9, s"random pairs must not all correlate")
  }

  private lazy val engineById: Map[String, (Boolean, Set[String], String)] = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val model = spark.sparkContext.broadcast(TextModel.default)
    val clips = spark.createDataset(rows)
    FilterPipeline.decisions(clips, cfg, model)
      .select("clip_id", "keep", "drop_reasons", "scrubbed_transcript")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getSeq[String](2).toSet, r.getString(3))))
      .toMap
  }

  test("generator is deterministic and clip_ids are unique") {
    val again = ClipGen.row(17, params)
    val orig = rows(17)
    assert(orig.clip_id == again.clip_id)
    assert(orig.bytes.sameElements(again.bytes))
    assert(orig.transcript == again.transcript)
    assert(rows.map(_.clip_id).distinct.size == N)
  }

  test("fixture is skewed as specified (one lang ~70%, one codec ~60%)") {
    val byCodec = rows.groupBy(_.codec).view.mapValues(_.size).toMap
    assert(byCodec(Codecs.PcmS16le).toDouble / N > 0.5)
    assert(byCodec.keySet == Set(Codecs.PcmS16le, Codecs.Ulaw8, Codecs.Adpcm4))
  }

  test("GATE: keep/drop F1 >= 0.99 vs oracle labels") {
    assert(engineById.size == N)
    var tp = 0; var fp = 0; var fn = 0; var tn = 0
    rows.foreach { r =>
      val e = engineById(r.clip_id)._1
      val o = oracleByIdCache(r.clip_id).keep
      (e, o) match {
        case (true, true)   => tp += 1
        case (true, false)  => fp += 1
        case (false, true)  => fn += 1
        case (false, false) => tn += 1
      }
    }
    val precision = tp.toDouble / math.max(1, tp + fp)
    val recall = tp.toDouble / math.max(1, tp + fn)
    val f1 = 2 * precision * recall / math.max(1e-12, precision + recall)
    info(f"keep/drop vs oracle: tp=$tp fp=$fp fn=$fn tn=$tn F1=$f1%.4f")
    assert(f1 >= 0.99, f"F1 $f1%.4f below gate")
  }

  test("GATE: drop reasons agree with oracle on >= 99% of rows") {
    val mismatches = rows.filter { r =>
      engineById(r.clip_id)._2 != oracleByIdCache(r.clip_id).reasons
    }
    info(s"reason-set mismatches: ${mismatches.size}/$N")
    mismatches.take(3).foreach { r =>
      info(s"  ${r.clip_id}: engine=${engineById(r.clip_id)._2} oracle=${oracleByIdCache(r.clip_id).reasons}")
    }
    assert(mismatches.size <= N / 100)
  }

  test("GATE: scrubbed transcript exactly equals oracle scrub for every row") {
    rows.foreach { r =>
      assert(engineById(r.clip_id)._3 == oracleByIdCache(r.clip_id).scrubbed,
        s"scrub mismatch on ${r.clip_id}")
    }
  }

  test("GATE: engine decode vs oracle decode SNR >= 30 dB per decodable row") {
    rows.take(200).foreach { r =>
      (Codecs.decode(r.codec, r.bytes), Oracle.decode(r.codec, r.bytes)) match {
        case (Right(e), Some(o)) =>
          assert(e.length == o.length, s"${r.clip_id} length")
          var sig = 0.0; var err = 0.0
          for (i <- e.indices) {
            sig += o(i).toDouble * o(i)
            val d = o(i).toDouble - e(i); err += d * d
          }
          val snr = if (err == 0) Double.PositiveInfinity else 10 * math.log10(sig / err)
          assert(snr >= 30.0, s"${r.clip_id} snr=$snr")
        case (Left(_), None) => // both reject — agreement
        case (e, o) => fail(s"${r.clip_id}: decode disagreement engine=$e oracle defined=${o.isDefined}")
      }
    }
  }

  test("M9 edge trim: padded_silence rows are kept; without trim they drop as silence") {
    val padded = rows.indices
      .filter(i => ClipGen.plantedDefect(i, params) == ClipGen.Defect.PaddedSilence)
      .map(rows(_))
    assert(padded.nonEmpty, "fixture must contain padded_silence rows")
    padded.foreach { r =>
      assert(engineById(r.clip_id)._1,
        s"${r.clip_id} dropped: ${engineById(r.clip_id)._2}")
    }
    // the oracle shows the pads would trip H5 without the trim — edge
    // padding is an artifact the trim removes, not content to score
    val noTrim = cfg.copy(trimSilence = false)
    padded.foreach { r =>
      val e = Oracle.expected(r, noTrim, TextModel.default)
      assert(e.reasons.contains("silence"),
        s"${r.clip_id} expected silence-drop without trim, got ${e.reasons}")
    }
  }

  test("P21 resample: same analog content at 8k and 16k native rates scores alike") {
    def sample(srHz: Int): Array[Float] = {
      val n = srHz * 2
      Array.tabulate(n) { i =>
        val t = i.toDouble / srHz
        val env = if (t % 0.5 < 0.3) 0.4 else 0.0 // 60% duty bursts
        (env * math.sin(2 * math.Pi * 220 * t)).toFloat
      }
    }
    val f16 = graft.rules.Heuristics.audioFeatures(sample(16000), 16000, cfg)
    val f8on16 = graft.rules.Heuristics.audioFeatures(
      Codecs.resampleLinear(sample(8000), 8000, 16000), 16000, cfg)
    assert(math.abs(f16.silence_frac - f8on16.silence_frac) < 0.03,
      s"silence_frac ${f16.silence_frac} vs ${f8on16.silence_frac}")
    assert(math.abs(f16.speech_ms - f8on16.speech_ms) <= 2 * cfg.frameMs,
      s"speech_ms ${f16.speech_ms} vs ${f8on16.speech_ms}")
  }

  test("G2/G3: windowed correlation of engine vs oracle decode is 1 (SSIM analog)") {
    val decodable = rows.filter(r => Codecs.decode(r.codec, r.bytes).isRight).take(30)
    assert(decodable.nonEmpty)
    decodable.foreach { r =>
      val e = Codecs.decode(r.codec, r.bytes).toOption.get
      val o = Oracle.decode(r.codec, r.bytes).get
      val w = 256
      var worst = 1.0
      var i = 0
      while (i + w <= e.length) {
        var se = 0.0; var so = 0.0; var see = 0.0; var soo = 0.0; var seo = 0.0
        for (j <- i until i + w) {
          se += e(j); so += o(j)
          see += e(j).toDouble * e(j); soo += o(j).toDouble * o(j)
          seo += e(j).toDouble * o(j)
        }
        val ve = see - se * se / w; val vo = soo - so * so / w
        val cov = seo - se * so / w
        val corr = if (ve == 0 && vo == 0) 1.0
          else if (ve == 0 || vo == 0) 0.0
          else cov / math.sqrt(ve * vo)
        if (corr < worst) worst = corr
        i += w
      }
      assert(worst >= 0.999, s"${r.clip_id} windowed corr $worst")
    }
  }

  test("P3/P8/P13/P19/O5 features: smoothing, multiscale, band contrast, DC, segments") {
    import graft.rules.Heuristics
    // P3 moving average: constant signal is a fixed point
    val const = Array.fill(100)(0.5f)
    assert(Heuristics.movingAvg(const, 8).forall(v => math.abs(v - 0.5f) < 1e-6))
    // P13: white noise carries more high-band energy than a slow sinusoid
    val rng = new graft.fixture.Prng(7)
    val noise = Array.fill(16000)((0.3 * rng.nextGaussian()).toFloat)
    val slow = Array.tabulate(16000)(i => (0.3 * math.sin(2 * math.Pi * 40 * i / 16000.0)).toFloat)
    val fN = Heuristics.audioFeatures(noise, 16000, cfg)
    val fS = Heuristics.audioFeatures(slow, 16000, cfg)
    assert(fN.band_contrast_db > fS.band_contrast_db,
      s"noise ${fN.band_contrast_db} vs slow ${fS.band_contrast_db}")
    // P19: planted DC offset is measured
    val dc = Array.tabulate(16000)(i => (0.1 + 0.2 * math.sin(2 * math.Pi * 300 * i / 16000.0)).toFloat)
    assert(math.abs(Heuristics.audioFeatures(dc, 16000, cfg).dc_offset - 0.1) < 0.01)
    assert(math.abs(fS.dc_offset) < 0.01)
    // O5/P8: segment durations sum to speech_ms; multiscale fields populated
    val f = Heuristics.audioFeatures(
      Codecs.decode(rows.head.codec, rows.head.bytes).toOption
        .getOrElse(Array.fill(16000)(0.2f)), 16000, cfg)
    assert(math.abs(f.segment_ms.sum - f.speech_ms) < 1e-9)
    assert(f.segment_ms.length == f.n_segments)
  }

  test("H7 hum: FFT engine agrees with the Parseval/direct-DFT oracle; planted tones detected") {
    import graft.rules.Heuristics
    // pure 60 Hz tone at the 8 kHz grid: nearly all power in the hum band
    val tone = Array.tabulate(8192)(i => (0.3 * math.sin(2 * math.Pi * 60 * i / 8000.0)).toFloat)
    val eT = Heuristics.spectralHumFrac(tone, 0, tone.length, 8000)
    val oT = Oracle.humFrac(tone, 8000)
    assert(eT > 0.95, s"60 Hz tone hum_frac $eT")
    assert(math.abs(eT - oT) < 1e-9, s"engine $eT vs oracle $oT")
    // white noise: hum band holds ~kMax/511 of the power
    val rng = new graft.fixture.Prng(11)
    val noise = Array.fill(8192)((0.3 * rng.nextGaussian()).toFloat)
    val eN = Heuristics.spectralHumFrac(noise, 0, noise.length, 8000)
    assert(eN < 0.05, s"noise hum_frac $eN")
    assert(math.abs(eN - Oracle.humFrac(noise, 8000)) < 1e-9)
    // speech band (≥ 100 Hz) leaks only sidelobe-level power into the band
    val speech = Array.tabulate(8192) { i =>
      val t = i / 8000.0
      (0.3 * (math.sin(2 * math.Pi * 150 * t) + 0.5 * math.sin(2 * math.Pi * 700 * t))).toFloat
    }
    val eS = Heuristics.spectralHumFrac(speech, 0, speech.length, 8000)
    assert(eS < 0.01, s"speech hum_frac $eS")
    // offset range: [from, until) restricts the frames analyzed
    val mixed = tone ++ noise
    val eTail = Heuristics.spectralHumFrac(mixed, tone.length, mixed.length, 8000)
    assert(math.abs(eTail - eN) < 1e-12, "range-restricted analysis must match")
    // sub-frame input yields 0 (no complete 1024-sample frame)
    assert(Heuristics.spectralHumFrac(tone.take(1000), 0, 1000, 8000) == 0.0)
  }

  test("H7 hum: fixture hum rows drop as mains_hum; with the rule disabled they keep") {
    val humRows = rows.indices
      .filter(i => ClipGen.plantedDefect(i, params) == ClipGen.Defect.Hum)
      .map(rows(_))
    assert(humRows.nonEmpty, "fixture must contain hum rows")
    humRows.foreach { r =>
      val (keep, reasons, _) = engineById(r.clip_id)
      assert(!keep && reasons == Set("mains_hum"),
        s"${r.clip_id} keep=$keep reasons=$reasons")
    }
    // the hum is planted UNDER normal speech: with H7 off nothing else fires
    val noHum = cfg.copy(maxHumFrac = 1.0)
    humRows.foreach { r =>
      val e = Oracle.expected(r, noHum, TextModel.default)
      assert(e.keep, s"${r.clip_id} should keep with H7 disabled, got ${e.reasons}")
    }
  }

  test("pipeline output row count and lineage counters are consistent") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val model = spark.sparkContext.broadcast(TextModel.default)
    val clips = spark.createDataset(rows.take(200))
    val dec = FilterPipeline.decisions(clips, cfg, model)
    val lin = FilterPipeline.lineage(dec).collect()
    assert(lin.map(_.getAs[Long]("n_rows")).sum == 200)
    val kept = dec.filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(lin.map(_.getAs[Long]("n_kept")).sum == kept)
  }
}
