package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.functions.TextSim
import graft.pipeline.{ExactSubstr, Spans, TextProfile}

/** Property-based laws over the deterministic operators: each law is
  * checked against N generated cases with FIXED seeds (Gen + explicit
  * Seed — reproducible by construction, no flaky shrink paths). Spark
  * laws use small frames; pure-JVM laws (codecs, simhash) run wide. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).getOrElse(
      sys.error(s"generator failed at seed $seed"))

  // small-vocab token docs: collisions across docs are likely → real
  // duplicated windows arise organically
  private val docGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(2, 8)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 14)
      ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("law: ExactSubstr mask and clean agree token-for-token") {
    for (seed <- 1L to 12L) {
      val docs = sample(docGen, seed).toDF("doc_id", "text")
      val k = 2 + (seed % 3).toInt // k in 2..4
      val masks = ExactSubstr.mask(docs, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      val cleaned = ExactSubstr.clean(docs, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val orig = sample(docGen, seed).map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty) }.toMap
      for ((id, (nTok, nRem, mask)) <- masks) {
        assert(nTok == orig(id).length, s"seed $seed doc $id token count")
        assert(mask.length == nTok.toInt, s"seed $seed doc $id mask len")
        assert(nRem == mask.count(_ == '1'), s"seed $seed doc $id n_removed")
        // clean == exactly the '0'-position tokens, in order
        val expect = orig(id).zip(mask).collect { case (t, '0') => t }
          .mkString(" ")
        if (expect.isEmpty)
          assert(!cleaned.contains(id), s"seed $seed doc $id should vanish")
        else assert(cleaned(id) == expect,
          s"seed $seed doc $id: '${cleaned(id)}' vs '$expect'")
      }
    }
  }

  test("law: disjoint-vocabulary corpora have no duplicated windows") {
    for (seed <- 1L to 6L) {
      val n = 2 + (seed % 4).toInt
      val docs = (0 until n).map { i =>
        (i.toLong, (0 until 8).map(j => s"w${i}_$j").mkString(" "))
      }.toDF("doc_id", "text")
      val m = ExactSubstr.mask(docs, "doc_id", "text", k = 3).collect()
      assert(m.forall(_.getLong(2) == 0L), s"seed $seed: covered tokens " +
        "in a corpus with per-doc-unique vocabulary")
    }
  }

  test("law: psiDrift(X, X) is identically zero; partitioning-invariant") {
    for (seed <- 1L to 8L) {
      val vals = sample(Gen.listOfN(60,
        Gen.choose(0.0, 100.0)), seed).toDF("v")
      val out = TextProfile.psiDrift(vals, vals, col("v"), 20.0, 5)
        .collect().sortBy(_.getLong(0))
      assert(out.forall(r => r.getDouble(5) == 0.0 &&
        r.getLong(1) == r.getLong(2)), s"seed $seed: nonzero self-PSI")
      // row order / partitioning must not change a single output value
      val re = TextProfile.psiDrift(vals.repartition(7), vals.repartition(3),
          col("v"), 20.0, 5)
        .collect().sortBy(_.getLong(0))
      assert(out.map(_.toString).sameElements(re.map(_.toString)),
        s"seed $seed: partitioning changed psiDrift output")
    }
  }

  test("law: span dedup elects exactly one keeper per distinct span") {
    for (seed <- 1L to 8L) {
      val docs = sample(docGen, seed).toDF("doc_id", "text")
      val verdicts = Spans.dedup(
        Spans.wordChunks(docs, "doc_id", "text", chunkWords = 3)).collect()
      val byHash = verdicts.groupBy(_.getString(2))
      byHash.foreach { case (h, rows) =>
        val keepers = rows.filterNot(_.getBoolean(6))
        assert(keepers.length == 1, s"seed $seed hash $h: " +
          s"${keepers.length} keepers of ${rows.length}")
        assert(rows.forall(_.getLong(5) == rows.length),
          s"seed $seed hash $h: n_copies")
      }
    }
  }

  private def toShorts(fs: Array[Float]): Array[Short] =
    fs.map { f =>
      val v = math.round(f * 32768.0f)
      (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
    }

  test("law: G.711 companding is idempotent after the first round trip") {
    val pcmGen = Gen.listOfN(256, Gen.choose(Short.MinValue, Short.MaxValue))
    for (seed <- 1L to 30L; codec <- Seq("ulaw8", "alaw8")) {
      val pcm = sample(pcmGen, seed).map(_.toShort).toArray
      val once = Codecs.decode(codec, Codecs.encode(codec, pcm))
        .fold(e => fail(s"$codec decode: $e"), identity)
      val twice = Codecs.decode(codec, Codecs.encode(codec, toShorts(once)))
        .fold(e => fail(s"$codec decode: $e"), identity)
      assert(java.util.Arrays.equals(once, twice),
        s"seed $seed $codec: companding not idempotent after first pass")
    }
  }

  test("law: pcm_s16le round trip is the identity") {
    val pcmGen = Gen.listOfN(512, Gen.choose(Short.MinValue, Short.MaxValue))
    for (seed <- 1L to 30L) {
      val pcm = sample(pcmGen, seed).map(_.toShort).toArray
      val back = Codecs.decode("pcm_s16le", Codecs.encode("pcm_s16le", pcm))
        .fold(e => fail(s"decode: $e"), identity)
      assert(java.util.Arrays.equals(toShorts(back), pcm), s"seed $seed")
    }
  }

  test("law: NfcNormalize is idempotent and equals the JDK reference") {
    val charGen = Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('e', 'a', 'n', 'o'),
      Gen.oneOf('́', '̀', '̃', '̈'), // combining marks
      Gen.oneOf('é', 'ñ', 'ö', 'à'))                      // precomposed
    val sGen = Gen.listOfN(40, charGen).map(_.mkString)
    for (seed <- 1L to 25L) {
      val raw = sample(sGen, seed)
      val df = Seq(Tuple1(raw)).toDF("t")
      val once = df.select(graft.functions.NfcNormalize.col(col("t")))
        .collect()(0).getString(0)
      assert(once == java.text.Normalizer.normalize(raw,
        java.text.Normalizer.Form.NFC), s"seed $seed: != JDK reference")
      val twice = Seq(Tuple1(once)).toDF("t")
        .select(graft.functions.NfcNormalize.col(col("t")))
        .collect()(0).getString(0)
      assert(twice == once, s"seed $seed: not idempotent")
    }
  }

  test("law: token SimHash is case/punctuation/whitespace invariant") {
    // word order IS part of the signature (bigram features, by design);
    // the invariance contract the streaming near-dup suppression relies
    // on is normalization: casing, punctuation, and whitespace runs
    // change nothing
    val wordsGen = Gen.listOfN(12, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
    for (seed <- 1L to 20L) {
      val ws = sample(wordsGen, seed)
      val a = TextSim.simhash64(ws.mkString(" "))
      val noisy = ws.map(w => if (w.length % 2 == 0) w.toUpperCase else w)
        .mkString("  ") + "!!!"
      assert(TextSim.hamming64(a, TextSim.simhash64(noisy)) == 0,
        s"seed $seed: simhash not normalization-invariant")
    }
  }
}
