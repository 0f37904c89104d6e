package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.fixture.ClipGen
import graft.pipeline.Augment

/** Deterministic audio augmentation: speed/gain perturbation + loudness
  * normalization (the training-set expansion family) — plus the
  * segment-level audio dedup that consumes the same decode machinery. */
class AugmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("AudioDedup: shared jingle windows pair across clips; masks mark them") {
    import spark.implicits._
    val sr = 8000
    def s16(x: Double): Short = {
      val v = math.round(x * 32768.0)
      (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
    }
    // amplitude-modulated two-tone jingle (distinct envelope + zcr pattern)
    def jingle(ms: Int): Array[Short] =
      Array.tabulate(sr * ms / 1000) { i =>
        val t = i.toDouble / sr
        val f = if ((i / (sr / 10)) % 2 == 0) 600.0 else 1800.0
        s16(0.5 * (0.4 + 0.6 * math.abs(math.sin(2 * math.Pi * 3 * t))) *
          math.sin(2 * math.Pi * f * t))
      }
    def tone(ms: Int, f: Double): Array[Short] =
      Array.tabulate(sr * ms / 1000)(i =>
        s16(0.3 * math.sin(2 * math.Pi * f * i / sr)))
    val j = jingle(600)
    def clip(id: String, body: Array[Short], codec: String) = {
      val all = j ++ body
      val bytes = Codecs.encode(codec, all)
      (id, bytes, sr, all.length * 1000 / sr, codec, "t")
    }
    // c: no jingle, and a trailing 400 ms of silence (exercises the
    // content gate: silent windows emit no fingerprint row)
    val noJingle = tone(1200, 440.0) ++ Array.fill(sr * 2 / 5)(0.toShort)
    val rows = Seq(
      clip("a", tone(600, 500.0), "pcm_s16le"),
      clip("b", tone(600, 2000.0), "ulaw8"), // re-encoded copy of the jingle
      ("c", Codecs.encode("pcm_s16le", noJingle), sr,
        noJingle.length * 1000 / sr, "pcm_s16le", "t"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val fps = graft.pipeline.AudioDedup
      .windowFingerprints(rows, windowMs = 200, hopMs = 200).toDF()
    // a/b emit (600+600)/200 = 6 windows; c's 2 silent tail windows are
    // gated out of its 8
    val nFps = fps.groupBy("clip_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nFps == Map("a" -> 6L, "b" -> 6L, "c" -> 6L), nFps.toString)
    val pairs = graft.pipeline.AudioDedup.segmentPairs(fps, maxHamming = 3)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // all three jingle windows pair between a and b despite b's µ-law
    // re-encode (codec invariance of the fingerprint), aligned index-wise
    (0 until 3).foreach { w =>
      assert(pairs.contains(("a", w, "b", w)) || pairs.contains(("b", w, "a", w)),
        s"jingle window $w must pair across a/b; got ${pairs.toSeq}")
    }
    // the distinct content tones never pair, and c stays clean
    assert(!pairs.exists(p => p._1 == "c" || p._3 == "c"),
      s"clip c has no shared segment: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._2 >= 3 && p._4 >= 3),
      s"content windows must not pair: ${pairs.toSeq}")
    val masks = graft.pipeline.AudioDedup.dupWindowMask(fps,
        graft.pipeline.AudioDedup.segmentPairs(fps, maxHamming = 3))
      .collect().map(r => r.getString(0) ->
        (r.getInt(2), r.getString(3))).toMap
    assert(masks("a") == (3, "111000"), masks.toString)
    assert(masks("b") == (3, "111000"), masks.toString)
    // c keeps its full 8-slot mask: the 2 gated (silent) windows hold '0'
    assert(masks("c") == (0, "00000000"), masks.toString)
  }

  test("findClipsContaining: jingle query retrieves embedding clips at the " +
       "right offset, cross-codec; non-carriers stay out") {
    import spark.implicits._
    val sr = 8000
    def s16(x: Double): Short = {
      val v = math.round(x * 32768.0)
      (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
    }
    def jingle(ms: Int): Array[Short] =
      Array.tabulate(sr * ms / 1000) { i =>
        val t = i.toDouble / sr
        val f = if ((i / (sr / 10)) % 2 == 0) 600.0 else 1800.0
        s16(0.5 * (0.4 + 0.6 * math.abs(math.sin(2 * math.Pi * 3 * t))) *
          math.sin(2 * math.Pi * f * t))
      }
    def tone(ms: Int, f: Double): Array[Short] =
      Array.tabulate(sr * ms / 1000)(i =>
        s16(0.3 * math.sin(2 * math.Pi * f * i / sr)))
    val j = jingle(600)
    def mk(id: String, pcm: Array[Short], codec: String) =
      (id, Codecs.encode(codec, pcm), sr, pcm.length * 1000 / sr, codec, "t")
    val corpus = Seq(
      mk("front", j ++ tone(600, 500.0), "pcm_s16le"),   // jingle at 0
      mk("mid", tone(600, 2000.0) ++ j ++ tone(400, 350.0), "ulaw8"), // at 600ms, re-encoded
      mk("clean", tone(1600, 440.0), "pcm_s16le"))       // no jingle
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val query = Seq(mk("q_jingle", j, "pcm_s16le"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")

    val hits = graft.pipeline.AudioDedup.findClipsContaining(
        corpus, query, windowMs = 200, hopMs = 200, minCoverage = 0.9)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(4), r.getInt(5)))
      .toMap
    // both carriers found with full 3/3 window coverage at the true offset
    // (600 ms jingle / 200 ms windows; mid's jingle starts at window 3)
    assert(hits.keySet == Set("front", "mid"), hits.toString)
    assert(hits("front") == (("q_jingle", 1.0, 0)), hits.toString)
    assert(hits("mid") == (("q_jingle", 1.0, 3)), hits.toString)
  }

  test("findInIndex: a persisted fingerprint index answers snippet queries " +
       "decode-free and grows across ingests") {
    import spark.implicits._
    import graft.table.SnapshotTable
    val sr = 8000
    def s16(x: Double): Short = {
      val v = math.round(x * 32768.0)
      (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
    }
    def jingle(ms: Int): Array[Short] =
      Array.tabulate(sr * ms / 1000) { i =>
        val t = i.toDouble / sr
        val f = if ((i / (sr / 10)) % 2 == 0) 600.0 else 1800.0
        s16(0.5 * (0.4 + 0.6 * math.abs(math.sin(2 * math.Pi * 3 * t))) *
          math.sin(2 * math.Pi * f * t))
      }
    def tone(ms: Int, f: Double): Array[Short] =
      Array.tabulate(sr * ms / 1000)(i =>
        s16(0.3 * math.sin(2 * math.Pi * f * i / sr)))
    val j = jingle(600)
    def mk(id: String, pcm: Array[Short], codec: String) =
      (id, Codecs.encode(codec, pcm), sr, pcm.length * 1000 / sr, codec, "t")
    def df(rows: Seq[(String, Array[Byte], Int, Int, String, String)]) =
      rows.toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val ingest1 = df(Seq(
      mk("front", j ++ tone(600, 500.0), "pcm_s16le"),
      mk("clean", tone(1600, 440.0), "pcm_s16le")))
    val ingest2 = df(Seq(
      mk("late", tone(400, 900.0) ++ j, "ulaw8"))) // carrier in batch 2
    val query = df(Seq(mk("q_jingle", j, "pcm_s16le")))

    // decode each ingest ONCE into a snapshot-table chunk of skinny rows
    val table = java.nio.file.Files
      .createTempDirectory("graft-afp-idx").toString + "/t"
    SnapshotTable.open(table, 0)
    graft.pipeline.AudioDedup
      .windowFingerprints(ingest1, windowMs = 200, hopMs = 200).toDF()
      .write.parquet(SnapshotTable.chunkDir(table, 0))
    SnapshotTable.commitChunk(table, 0, 0, Map.empty)
    def index() = spark.read
      .option("basePath", java.nio.file.Paths.get(table, "data").toString)
      .parquet(SnapshotTable.committedDataDirs(table): _*)
      .select("clip_id", "win_idx", "fp")

    // index ≡ direct on ingest 1
    def hits(ix: org.apache.spark.sql.DataFrame) =
      graft.pipeline.AudioDedup.findInIndex(ix, query,
          windowMs = 200, hopMs = 200, minCoverage = 0.9)
        .collect().map(r => (r.getString(0), r.getDouble(4), r.getInt(5))).toSet
    val direct = graft.pipeline.AudioDedup.findClipsContaining(ingest1, query,
        windowMs = 200, hopMs = 200, minCoverage = 0.9)
      .collect().map(r => (r.getString(0), r.getDouble(4), r.getInt(5))).toSet
    assert(hits(index()) == direct && direct == Set(("front", 1.0, 0)),
      s"index ${hits(index())} vs direct $direct")

    // second ingest commits as the next chunk; the grown index retrieves
    // across both batches (the µ-law carrier at its 400 ms offset)
    graft.pipeline.AudioDedup
      .windowFingerprints(ingest2, windowMs = 200, hopMs = 200).toDF()
      .write.parquet(SnapshotTable.chunkDir(table, 1))
    SnapshotTable.commitChunk(table, 1, 0, Map.empty)
    assert(hits(index()) == Set(("front", 1.0, 0), ("late", 1.0, 2)),
      hits(index()).toString)
  }

  test("logMelFbank: tones land in the right mel channel, codec-invariant, " +
       "silence reads the floor, frames count exactly") {
    import spark.implicits._
    val sr = 8000
    def s16(x: Double): Short = {
      val v = math.round(x * 32768.0)
      (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
    }
    def tone(ms: Int, f: Double): Array[Short] =
      Array.tabulate(sr * ms / 1000)(i =>
        s16(0.4 * math.sin(2 * math.Pi * f * i / sr)))
    def mk(id: String, pcm: Array[Short], codec: String) =
      (id, Codecs.encode(codec, pcm), sr, pcm.length * 1000 / sr, codec, "t")
    val rows = Seq(
      mk("t1k", tone(1000, 1000.0), "pcm_s16le"),
      mk("t1k_ulaw", tone(1000, 1000.0), "ulaw8"),
      mk("t300", tone(1000, 300.0), "pcm_s16le"),
      ("sil", Codecs.encode("pcm_s16le", Array.fill(sr)(0.toShort)),
        sr, 1000, "pcm_s16le", "t"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")

    val out = graft.pipeline.AudioFeatures.logMelFbank(rows).collect()
    val byClip = out.groupBy(_.clip_id)
    // frame count: (8000 - 512)/256 + 1 = 30, n_frames rides along
    assert(byClip("t1k").length == 30 && byClip("t1k").head.n_frames == 30)
    // per-clip mean channel energies
    def meanCh(id: String): Array[Double] = {
      val fs = byClip(id)
      Array.tabulate(26)(c => fs.map(_.fbank(c).toDouble).sum / fs.length)
    }
    val m1k = meanCh("t1k")
    val m300 = meanCh("t300")
    // the 1 kHz argmax channel's center must sit nearest 1 kHz among
    // channel centers (recomputed with the op's own filter layout)
    val centers = {
      def hzToMel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
      def melToHz(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
      Array.tabulate(26)(c => melToHz(
        hzToMel(20.0) + (hzToMel(4000.0) - hzToMel(20.0)) * (c + 1) / 27))
    }
    val arg1k = m1k.indexOf(m1k.max)
    val nearest1k = centers.zipWithIndex.minBy(p => math.abs(p._1 - 1000.0))._2
    assert(math.abs(arg1k - nearest1k) <= 1,
      s"1 kHz peak channel $arg1k vs nearest-center $nearest1k")
    // a lower tone peaks in a lower channel, with clear separation
    val arg300 = m300.indexOf(m300.max)
    assert(arg300 < arg1k, s"300 Hz channel $arg300 !< 1 kHz channel $arg1k")
    // µ-law re-encode peaks in the same channel (codec invariance)
    val mU = meanCh("t1k_ulaw")
    assert(mU.indexOf(mU.max) == arg1k, "codec must not move the peak")
    // silence reads the eps floor everywhere
    val sil = meanCh("sil")
    assert(sil.forall(v => math.abs(v - math.log(1e-10)) < 1e-6),
      s"silence floor: ${sil.mkString(",")}")
    // determinism: a second run is bit-identical
    val again = graft.pipeline.AudioFeatures.logMelFbank(rows).collect()
      .groupBy(_.clip_id)
    byClip("t1k").sortBy(_.frame_idx).zip(again("t1k").sortBy(_.frame_idx))
      .foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a.fbank, b.fbank))
      }
  }

  test("specAugment masks deterministic floor regions; clipEmbedding pairs " +
       "a re-encoded copy through the embedding dedup family") {
    import spark.implicits._
    val sr = 8000
    def s16(x: Double): Short = {
      val v = math.round(x * 32768.0)
      (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
    }
    // band-limited per clip (distinct fundamental per id): mean pooling is
    // time-order-invariant, so clips must differ in SPECTRUM, not schedule
    def speechish(ms: Int, base: Double): Array[Short] =
      Array.tabulate(sr * ms / 1000) { i =>
        val t = i.toDouble / sr
        val f = base * (1.0 + 0.15 * ((i / (sr / 8)) % 3))
        s16(0.35 * math.sin(2 * math.Pi * f * t) *
          (0.5 + 0.5 * math.sin(2 * math.Pi * 3 * t)))
      }
    def mk(id: String, pcm: Array[Short], codec: String) =
      (id, Codecs.encode(codec, pcm), sr, pcm.length * 1000 / sr, codec, "t")
    val rows = Seq(
      mk("x", speechish(1500, 320.0), "pcm_s16le"),
      mk("x_ulaw", speechish(1500, 320.0), "ulaw8"), // re-encode of x
      mk("y", speechish(1500, 1100.0), "pcm_s16le"),
      mk("z", speechish(1500, 2400.0), "pcm_s16le"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val frames = graft.pipeline.AudioFeatures.logMelFbank(rows)

    // SpecAugment: floor regions exist, are clip-deterministic, in range
    val floor = math.log(1e-10).toFloat
    val aug = graft.pipeline.AudioFeatures.specAugment(frames).collect()
    val aug2 = graft.pipeline.AudioFeatures.specAugment(frames).collect()
    assert(aug.sortBy(f => (f.clip_id, f.frame_idx))
      .zip(aug2.sortBy(f => (f.clip_id, f.frame_idx)))
      .forall { case (a, b) => java.util.Arrays.equals(a.fbank, b.fbank) },
      "masks must be content-stable across runs")
    val xFrames = aug.filter(_.clip_id == "x").sortBy(_.frame_idx)
    val timeMasked = xFrames.filter(_.fbank.forall(_ == floor))
    assert(timeMasked.length == 5, // timeMaskLen default
      s"exactly one 5-frame time mask: ${timeMasked.length}")
    val freqMaskedCh = (0 until 26).filter(c =>
      xFrames.filterNot(_.fbank.forall(_ == floor))
        .forall(_.fbank(c) == floor))
    assert(freqMaskedCh.size == 4 && // freqMaskLen default, contiguous
      freqMaskedCh.sliding(2).forall {
        case Seq(a, b) => b == a + 1
        case _ => true
      }, s"one contiguous 4-channel freq mask: $freqMaskedCh")

    // pooled embedding: the µ-law re-encode pairs with x through the
    // EXISTING embedding dedup op while unrelated pairs sit far below
    // (measured 0.99 vs <= 0.28 — the floor lift is what makes this hold;
    // unlifted, the re-encode reads BELOW the unrelated pairs)
    val emb = graft.pipeline.AudioFeatures.clipEmbedding(frames)
    val all = graft.pipeline.Dedup.embNearDup(
        emb, "clip_id", "embedding", minSim = -1.0)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    assert(all(("x", "x_ulaw")) > 0.95,
      s"re-encode pair too far: ${all(("x", "x_ulaw"))}")
    (all - (("x", "x_ulaw"))).foreach { case (p, s) =>
      assert(s < 0.6, s"unrelated pair $p too close: $s")
    }
  }

  private def clips(n: Int) = {
    import spark.implicits._
    val params = ClipGen.Params(n, seed = 11, maxDurMs = 1500)
    spark.range(n).map(i => ClipGen.row(i, params)).toDF()
  }

  test("acoustic-mix query: clusters cover the corpus, balancing favors " +
       "small clusters, deterministic") {
    val fn = graft.SparkEntry.queries("clips_acoustic_mix")
    val rows = fn(spark, "unused").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // decode-failing planted defects (bad_bytes) yield no fbank frames and
    // so no embedding — everything that embeds gets labeled
    assert(rows.map(_._2).sum >= 480L && rows.map(_._2).sum <= 500L,
      s"labeled ${rows.map(_._2).sum} of 500")
    assert(rows.forall { case (_, n, s) => s <= n && n > 0 })
    // tau=0.5 balancing: a cluster at least 4x another's size must keep a
    // rate no higher than the smaller one's (p ∝ n^-0.5 after normalizing)
    val rates = rows.map { case (c, n, s) => (c, n, s.toDouble / n) }
    for ((_, nBig, rBig) <- rates; (_, nSmall, rSmall) <- rates
         if nBig >= 4 * nSmall)
      assert(rBig <= rSmall + 0.05,
        s"big cluster ($nBig @ $rBig) outkept small ($nSmall @ $rSmall)")
    // content-stable end to end: identical table on a second run
    val again = fn(spark, "unused").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.sameElements(again))
  }

  test("speedPerturb: 1.0 is a bit-identical pass-through for pcm clips; " +
       "0.9/1.1 scale duration by ~1/f; (clip_id, aug_idx) is a key") {
    import spark.implicits._
    val in = clips(60).cache()
    val out = Augment.speedPerturb(in, Seq(0.9, 1.0, 1.1)).cache()
    val nDecodable = in.as[graft.model.ClipRow].collect()
      .count(c => Codecs.decode(c.codec, c.bytes).isRight)
    assert(out.count() == nDecodable * 3L)
    assert(out.select("clip_id", "aug_idx").distinct().count() == out.count())
    // unit factor round-trips pcm_s16le bytes bit-identically
    val pcmIn = in.filter(col("codec") === "pcm_s16le")
      .select("clip_id", "bytes").as[(String, Array[Byte])]
      .collect().toMap
    assert(pcmIn.nonEmpty, "fixture must contain pcm_s16le clips")
    val unit = out.filter(col("aug") === "sp1.00")
      .select("clip_id", "bytes").as[(String, Array[Byte])]
      .collect().toMap
    pcmIn.foreach { case (id, b) =>
      assert(java.util.Arrays.equals(unit(id), b), s"unit factor mutated $id")
    }
    // duration scaling: sp0.90 is longer (slower), sp1.10 shorter
    val durs = out.groupBy("clip_id").pivot("aug").sum("dur_ms")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    durs.foreach { case (d090, d100, d110) =>
      assert(math.abs(d090 - d100 / 0.9) <= d100 * 0.02 + 2,
        s"sp0.90 duration $d090 vs base $d100")
      assert(math.abs(d110 - d100 / 1.1) <= d100 * 0.02 + 2,
        s"sp1.10 duration $d110 vs base $d100")
    }
    // determinism: a second run emits bit-identical bytes
    val again = Augment.speedPerturb(in, Seq(0.9, 1.0, 1.1))
      .select("clip_id", "aug", "bytes")
      .as[(String, String, Array[Byte])].collect()
      .map(t => (t._1, t._2) -> java.util.Arrays.hashCode(t._3)).toMap
    val first = out.select("clip_id", "aug", "bytes")
      .as[(String, String, Array[Byte])].collect()
      .map(t => (t._1, t._2) -> java.util.Arrays.hashCode(t._3)).toMap
    assert(again == first)
    out.unpersist(); in.unpersist()
  }

  test("gainPerturb: +6 dB raises RMS by ~6 dB below saturation; 0 dB is " +
       "identity for pcm clips") {
    import spark.implicits._
    val in = clips(40).cache()
    val out = Augment.gainPerturb(in, Seq(-6.0, 0.0, 6.0)).cache()
    def rmsDb(b: Array[Byte]): Double = {
      val p = Codecs.decodePcmS16le(b).toOption.get
      if (p.isEmpty) -999 else {
        val s = p.map(x => x.toDouble * x).sum / p.length
        if (s <= 0) -999 else 10 * math.log10(s)
      }
    }
    val byAug = out.select("clip_id", "aug", "bytes")
      .as[(String, String, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    var checked = 0
    byAug.foreach { case (id, m) =>
      val base = rmsDb(m("g+0.0dB"))
      // only meaningful away from silence and saturation
      if (base > -45 && base < -15) {
        val up = rmsDb(m("g+6.0dB")); val down = rmsDb(m("g-6.0dB"))
        assert(math.abs(up - base - 6.0) < 0.6, s"$id: +6dB gave ${up - base}")
        assert(math.abs(down - base + 6.0) < 0.6,
          s"$id: -6dB gave ${down - base}")
        checked += 1
      }
    }
    assert(checked > 5, s"only $checked clips in the testable band")
    out.unpersist(); in.unpersist()
  }

  test("normalizeLoudness: non-silent clips land on target ±0.5 dB, " +
       "sub-floor clips pass through at unit gain") {
    import spark.implicits._
    val in = clips(60)
    val out = Augment.normalizeLoudness(in, targetDb = -20.0, floorDb = -60.0)
      .cache()
    val rows = out.select("bytes", "rms_db_in", "gain_db")
      .as[(Array[Byte], Double, Double)].collect()
    assert(rows.nonEmpty)
    var normd = 0
    rows.foreach { case (b, rmsIn, gain) =>
      if (rmsIn >= -60.0 && rmsIn < -25.0) {
        // boosted upward with no saturation risk: must land on target
        val p = Codecs.decodePcmS16le(b).toOption.get
        val s = p.map(x => x.toDouble * x).sum / math.max(1, p.length)
        val got = 10 * math.log10(s)
        assert(math.abs(got - (-20.0)) < 0.5, s"normalized to $got")
        normd += 1
      }
      if (rmsIn < -60.0) assert(gain == 0.0, "sub-floor clip must not boost")
    }
    assert(normd > 3, s"only $normd clips exercised the boost path")
    out.unpersist()
  }

  test("removeHum: notch kills planted 50 Hz hum, preserves content bands, " +
       "near-identity on hum-free clips") {
    import spark.implicits._
    val sr = 8000
    def s16b(samples: Array[Double]): Array[Byte] =
      Codecs.encode("pcm_s16le", samples.map { x =>
        val v = math.round(x * 32768.0)
        (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
      })
    def content(i: Int): Double = {
      val t = i.toDouble / sr
      0.25 * math.sin(2 * math.Pi * 500.0 * t) +
        0.15 * math.sin(2 * math.Pi * 1200.0 * t)
    }
    val n = sr * 2
    val hummed = Array.tabulate(n)(i =>
      content(i) + 0.3 * math.sin(2 * math.Pi * 50.0 * i / sr))
    val clean = Array.tabulate(n)(i => content(i))
    val rows = Seq(
      ("hummed", s16b(hummed), sr, 2000, "pcm_s16le", "t"),
      ("clean", s16b(clean), sr, 2000, "pcm_s16le", "t"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")

    val out = graft.pipeline.Augment.removeHum(rows).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Array[Byte]](1), r.getDouble(6), r.getDouble(7))).toMap

    // the planted clip: hum fraction collapses below the H7 drop threshold
    val (hBytes, hIn, hOut) = out("hummed")
    assert(hIn > 0.3, s"planted hum must read high before: $hIn")
    assert(hOut < 0.02, s"hum must be notched out: $hIn -> $hOut")
    // content preserved: correlation of the filtered signal with the CLEAN
    // reference stays high (the notch only touches a ~12 Hz band at 50/60)
    val filtered = Codecs.decode("pcm_s16le", hBytes).toOption.get
    def corr(a: Array[Float], b: Array[Double]): Double = {
      var sab = 0.0; var saa = 0.0; var sbb = 0.0
      // skip the filter's transient head (2 cycles of 50 Hz)
      var i = sr / 25
      while (i < a.length) {
        sab += a(i) * b(i); saa += a(i) * a(i); sbb += b(i) * b(i); i += 1
      }
      sab / math.sqrt(saa * sbb)
    }
    assert(corr(filtered, clean) > 0.97,
      s"content must survive the notch: corr=${corr(filtered, clean)}")
    // hum-free clip: near-identity (both notches sit far below content)
    val (cBytes, cIn, cOut) = out("clean")
    assert(cIn < 0.02 && cOut < 0.02, s"clean clip hum: $cIn -> $cOut")
    val cleanFiltered = Codecs.decode("pcm_s16le", cBytes).toOption.get
    // 0.998 floor: the only losses are s16 re-quantization and the
    // notches' (inaudible) passband ripple — measured 0.9988
    assert(corr(cleanFiltered, clean) > 0.998,
      s"hum-free clip must pass near-identically: ${corr(cleanFiltered, clean)}")
  }
}
