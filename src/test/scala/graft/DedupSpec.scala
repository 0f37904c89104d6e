package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{CosineSim, TextSim}
import graft.pipeline.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs() = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals"),
    (4L, "another unrelated document mentioning audio transcript quality filtering"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps one id per distinct text") {
    val out = Dedup.exact(docs(), "doc_id", "text").collect()
    assert(out.length == 4)
    val dupGroup = out.find(_.getLong(1) == 2).get
    assert(dupGroup.getLong(0) == 1L) // keeper is min id
  }

  test("minhash LSH surfaces near-dup and exact-dup pairs, not unrelated ones") {
    val pairs = Dedup.nearDupPairs(docs(), "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)), "exact dup pair")
    assert(pairs.contains((1L, 2L)), "near dup pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc clean")
  }

  test("simhash: near-dups within small hamming distance; pure fn sane") {
    // a 1-word edit in a 13-word doc flips ~3 of ~25 features → hamming ~8;
    // ordering is what matters: near-dup ≪ unrelated
    assert(TextSim.hamming64(
      TextSim.simhash64(docs().collect()(0).getString(1)),
      TextSim.simhash64(docs().collect()(1).getString(1))) <= 12)
    assert(TextSim.hamming64(
      TextSim.simhash64(docs().collect()(0).getString(1)),
      TextSim.simhash64(docs().collect()(2).getString(1))) > 16)
    val pairs = Dedup.simhashPairs(docs(), "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)), "exact dup (hamming 0) must share a band")
  }

  test("winnowing fingerprint is stable under local edits") {
    val a = TextSim.fingerprint("the quick brown fox jumps over the lazy dog and runs far away")
    val b = TextSim.fingerprint("the quick brown fox jumps over the lazy dog and runs far away!")
    val overlap = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.size
    assert(overlap > 0.7, s"fingerprint overlap $overlap")
  }

  test("CosineSim native expression: correct values, interpreted and codegen") {
    val df = Seq(
      (Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0), 1.0),
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), 0.0),
      (Array(1.0, 1.0, 0.0), Array(1.0, 0.0, 0.0), 1.0 / math.sqrt(2)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0), 0.0)
    ).toDF("a", "b", "expected")
    val rows = df.withColumn("sim", CosineSim.col($"a", $"b")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("sim") - r.getAs[Double]("expected")) < 1e-12)
    }
    // interpreted path agrees
    import graft.codec.Codecs // unused, keep imports minimal
    val e = graft.functions.CosineSim(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("MatchCount / SketchHamming native expressions: eval + codegen paths") {
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 4L), 3, 0),
      (Array(0L, 0L), Array(0L, 0L), 2, 0),
      (Array(1L, 2L), Array(3L, 4L), 0, 0)
    ).toDF("a", "b", "expect_match", "pad")
    val rows = df.select(
      graft.functions.MatchCount.col($"a", $"b").as("m"),
      graft.functions.SketchHamming.col($"a", $"b").as("h"),
      $"expect_match").collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(2)))
    // hamming: popcount of elementwise xor
    assert(rows(0).getInt(1) ==
      java.lang.Long.bitCount(2L ^ 9L))
    assert(rows(1).getInt(1) == 0)
    assert(rows(2).getInt(1) ==
      java.lang.Long.bitCount(1L ^ 3L) + java.lang.Long.bitCount(2L ^ 4L))
    // interpreted path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val lit = (xs: Array[Long]) => Literal.create(xs, ArrayType(LongType))
    assert(graft.functions.MatchCount(lit(Array(7L, 8L)), lit(Array(7L, 9L)))
      .eval(null) == 1)
    assert(graft.functions.SketchHamming(lit(Array(0L)), lit(Array(255L)))
      .eval(null) == 8)
  }

  test("minhash_sig / match_count / sketch_hamming available from SQL") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT match_count(minhash_sig('hello world text', 5, 32),
        |                   minhash_sig('hello world text', 5, 32)) AS m,
        |       sketch_hamming(array(1L, 2L), array(1L, 2L)) AS h""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 32 && r.getInt(1) == 0)
  }

  test("nfc_normalize: composes decomposed text, no-op fast path, SQL-exposed") {
    graft.functions.GraftExtensions.register(spark)
    val decomposed = "café over the raña" // e+◌́, n+◌̃
    val composed = "café over the raña"
    val r = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS n, length('$decomposed') AS lr")
      .collect()(0)
    assert(r.getString(0) == composed, s"got '${r.getString(0)}'")
    assert(r.getString(0).length == decomposed.length - 2)
    // already-NFC input comes back identical (the allocation-free path)
    val same = spark.sql(s"SELECT nfc_normalize('$composed') AS n").collect()(0)
    assert(same.getString(0) == composed)
    // dedup consequence: the two spellings hash identically after NFC
    import org.apache.spark.sql.functions.md5
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
    val hashes = df.select(md5(graft.functions.NfcNormalize.col(col("t"))))
      .collect().map(_.getString(0)).distinct
    assert(hashes.length == 1, "NFC must unify the spellings for dedup")
  }

  test("cosine_sim is available from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    val r2 = spark.sql(
      "SELECT cosine_sim(array(1.0d, 1.0d), array(1.0d, 0.0d)) AS s").collect()
    assert(math.abs(r2(0).getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  private def embFixture() = {
    val rng = new graft.fixture.Prng(5)
    val vecs = (0 until 60).map { i =>
      val base = Array.fill(16)(rng.nextGaussian())
      (i.toLong, base.map(_.toFloat))
    }
    // plant 5 near-dups of vectors 0..4
    val planted = (0 until 5).map { i =>
      (100L + i, vecs(i)._2.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    }
    (vecs ++ planted).toDF("vec_id", "embedding")
  }

  test("embedding LSH near-dup: precision (subset of brute) AND recall ≥ 0.95") {
    val df = embFixture()
    val brute = Dedup.embNearDup(df, "vec_id", "embedding", minSim = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embNearDupLsh(df, "vec_id", "embedding", dim = 16,
      minSim = 0.95, bands = 16, rowsPerBand = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 5, s"expected planted pairs, got $brute")
    assert(lsh.subsetOf(brute), "cosine verify guarantees precision")
    // banded OR-amplification: P[miss] at sim 0.95 with b=16, r=3 ≈ 1e-9
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.95, s"LSH recall $recall vs brute ${brute.size} pairs")
    // near-identical vectors share every hyperplane side → LSH must find them
    assert((0 until 5).forall(i => lsh.contains((i.toLong, 100L + i))))
  }

  test("LSH kNN recall@5 ≥ 0.9 vs exact brute-force kNN") {
    val df = embFixture()
    val q = df.filter(col("vec_id") < 10)
    // exact top-5 via brute pairs on the same fixture
    val e = df.selectExpr("vec_id", "cast(embedding as array<double>) v")
    val qv = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = qv.join(e, col("query_id") =!= col("vec_id"))
      .withColumn("sim", CosineSim.col(col("qv"), col("v")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ann = Dedup.knnLsh(df, q, "vec_id", "embedding", dim = 16, k = 5,
      bands = 16, rowsPerBand = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall@5 $recall")
  }

  test("IVF kNN: fit is deterministic; recall@5 ≥ 0.8 vs exact brute force") {
    val df = embFixture()
    val q = df.filter(col("vec_id") < 10)
    // deterministic fit: same sample → same centroids
    val sample = (0 until 40).map(i =>
      Array.tabulate(16)(d => math.sin(i * 17 + d).toDouble)).toArray
    val c1 = graft.functions.Ivf.fit(sample, 4)
    val c2 = graft.functions.Ivf.fit(sample, 4)
    assert(c1.length == 4 && c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    // exact top-5 ground truth
    val e = df.selectExpr("vec_id", "cast(embedding as array<double>) v")
    val qv = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = qv.join(e, col("query_id") =!= col("vec_id"))
      .withColumn("sim", CosineSim.col(col("qv"), col("v")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // with 8 cells and 4 probes over a 65-vector corpus, half the cells are
    // probed per query — a real pruning ratio, not a degenerate full scan
    val ivf = Dedup.knnIvf(df, q, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 4, sampleN = 64)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall@5 $recall")
    // planted near-identical vectors land in the query's own best cell
    assert((0 until 5).forall(i => ivf.contains((i.toLong, 100L + i))),
      "planted near-dups must be retrieved")
  }

  test("SimHash64 / Fingerprint native expressions: eval + codegen parity") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "", "UPPER case And 123 numbers!", "short")
    val df = texts.toDF("t")
    // codegen path (dataframe) vs the pure kernel
    val rows = df.select(graft.functions.SimHash64.col($"t").as("sh"),
      graft.functions.Fingerprint.col($"t").as("fp"), $"t").collect()
    rows.foreach { r =>
      assert(r.getLong(0) == TextSim.simhash64(r.getString(2)))
      assert(r.getSeq[Long](1).toArray.sameElements(TextSim.fingerprint(r.getString(2))))
    }
    // interpreted eval path agrees with the kernel too
    import org.apache.spark.sql.catalyst.expressions.Literal
    val lit = (s: String) => Literal.create(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)
    assert(graft.functions.SimHash64(lit(texts.head)).eval(null) ==
      TextSim.simhash64(texts.head))
    assert(graft.functions.Fingerprint(lit(texts.head)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().sameElements(TextSim.fingerprint(texts.head)))
    // SQL registration
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT simhash64('hello world') AS s, size(fingerprint('hello world')) AS n")
      .collect()(0)
    assert(r.getLong(0) == TextSim.simhash64("hello world"))
    assert(r.getInt(1) == TextSim.fingerprint("hello world").length)
  }

  test("multi-probe simhash banding: pigeonhole recall at the probed radius") {
    // plant a pair at a Hamming distance the EXACT 4x16 banding can miss
    // (ham in 4..11 can straddle every band with 1-2 flipped bits per band)
    // but 2-bit probing structurally covers (4 bands x (2+1) - 1 = 11)
    val pairs = Dedup.simhashPairs(docs(), "doc_id", "text",
      maxHamming = 11, numBands = 4, probeBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs().collect().map(r =>
      r.getLong(0) -> TextSim.simhash64(r.getString(1))).toMap
    for {
      i <- sh.keys; j <- sh.keys if i < j
      if TextSim.hamming64(sh(i), sh(j)) <= 11
    } assert(pairs.contains((i, j)),
      s"pair ($i,$j) at ham ${TextSim.hamming64(sh(i), sh(j))} must be found")
  }

  test("hot-bucket cap bounds a planted 1000-doc identical cluster") {
    // 1,000 identical docs + the distinct base docs: uncapped, every LSH
    // generator would emit ~500k candidate pairs from the clique alone
    val clique = (1000L until 2000L).map(i =>
      (i, "totally identical boilerplate text repeated across the corpus"))
    val base = docs().collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val df = (base ++ clique).toDF("doc_id", "text")
    val n = base.size + clique.size

    // minhash: capped band buckets → bounded candidates, clique dropped
    val bands = df.select(col("doc_id").as("id"),
        explode(Dedup.minhashBandKeys(
          graft.functions.MinHashSig.col(col("text"), 5, 80), 80, 5)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val capped = Dedup.lshCandidates(bands, maxBucket = 50).count()
    assert(capped <= 50L * n,
      s"capped minhash candidates $capped must be ≤ cap·n")
    // the dropped-count side channel reports the clique's hot buckets
    val hot = Dedup.hotBuckets(bands, Seq("band", "band_hash"), 50)
      .collect()
    assert(hot.nonEmpty && hot.forall(_.getLong(2) >= 1000),
      "hot-bucket report must surface the 1000-doc clique")

    // capped near-dup pipelines COMPLETE with bounded work and still find
    // the non-clique planted pairs; exact dedup still surfaces the clique
    val nd = Dedup.nearDupPairs(df, "doc_id", "text", maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((1L, 2L)) && nd.contains((1L, 5L)),
      "non-clique near-dups survive the cap")
    val sp = Dedup.simhashPairs(df, "doc_id", "text",
      maxHamming = 12, numBands = 4, maxBucket = 50).count()
    assert(sp <= 50L * n * 4, s"capped simhash candidates $sp bounded")
    val fd = Dedup.fingerprintNearDup(df, "doc_id", "text", maxDocFreq = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fd.contains((1L, 2L)), "non-clique near-dup survives the DF cap")
    assert(!fd.exists(p => p._1 >= 1000L && p._2 >= 1000L),
      "clique pairs are the exact-dedup pass's job under the cap")
    val ex = Dedup.exact(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ex(1000L) == 1000L,
      "exact dedup still collapses the clique (keeper 1000, 1000 copies)")
  }

  test("capBuckets plans as a broadcast anti-join — the banded frame is not reshuffled") {
    val bands = docs().select(col("doc_id").as("id"),
        explode(Dedup.minhashBandKeys(
          graft.functions.MinHashSig.col(col("text"), 5, 80), 80, 5)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val capped = Dedup.capBuckets(bands, Seq("band", "band_hash"), 50)
    capped.collect() // finalize any adaptive replanning before reading the plan
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"guard must be a broadcast anti-join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the guarded frame must not be sort-merge-reshuffled by the guard")
  }

  test("embedding LSH candidate volume stays sub-quadratic at selective params") {
    val df = embFixture()
    val n = df.count()
    // 16 bands × 8 planes + 1-bit probe at sim ≥ 0.95: planted pairs are
    // found (recall test below) while the 65-vector random corpus emits
    // far fewer than n²/2 candidates
    val cands = Dedup.embLshCandidates(df, "vec_id", "embedding", 16,
      bands = 16, rowsPerBand = 8, probeBits = 1, maxBucket = 16)
    val c = cands.count()
    assert(c < n * n / 4, s"candidates $c must be ≪ all-pairs ${n * n / 2}")
    val lsh = Dedup.embNearDupLsh(df, "vec_id", "embedding", dim = 16,
      minSim = 0.95, bands = 16, rowsPerBand = 8, probeBits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 5).forall(i => lsh.contains((i.toLong, 100L + i))),
      "planted near-identical pairs found at the selective parameterization")
  }

  test("probe-all IVF and 64x1-band LSH kNN reproduce exact top-5") {
    val df = embFixture()
    val q = df.filter(col("vec_id") < 10)
    val e = df.selectExpr("vec_id", "cast(embedding as array<double>) v")
    val qv = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = qv.join(e, col("query_id") =!= col("vec_id"))
      .withColumn("sim", CosineSim.col(col("qv"), col("v")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"))).toSet
    val ivf = Dedup.knnIvf(df, q, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 8, sampleN = 64)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(ivf == exact, "probing every cell must reproduce exact top-5")
    val lsh = Dedup.knnLsh(df, q, "vec_id", "embedding", dim = 16, k = 5,
      bands = 64, rowsPerBand = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(lsh == exact, "64 single-plane bands: P[miss] ≈ 0 → exact top-5")
  }

  test("containment pairs: catches small-doc-inside-big-doc that Jaccard misses") {
    val big = "the quick brown fox jumps over the lazy dog near the river bank " +
      "while herons wade through shallow water hunting small silver fish at dawn " +
      "and the first light spreads across the quiet valley floor slowly"
    val contained = big.substring(0, 60) // prefix slice of the big doc
    val df = Seq(
      (1L, big),
      (2L, contained),
      (3L, "completely unrelated content about catalyst optimizer rules and plans")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(df, "doc_id", "text",
        minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.9),
      s"contained prefix must be found, got ${pairs.mkString(",")}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // and the symmetric-Jaccard path does NOT consider this a near-dup:
    // J = |A∩B|/|A∪B| ≈ |small|/|big| ≈ 0.27 < 0.5 — containment is a
    // genuinely different detector, not a re-labeled near-dup query
    val j = Dedup.nearDupPairs(df, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)), "Jaccard must miss the contained prefix")
  }

  test("hashSplit: deterministic, fraction-accurate, stable under corpus growth") {
    val small = (0L until 2000L).toDF("doc_id")
    val s1 = graft.pipeline.TextProfile.hashSplit(small, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // deterministic: identical on recompute
    val s2 = graft.pipeline.TextProfile.hashSplit(small, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2)
    // fractions within binomial noise of 10/10/80
    val n = s1.size.toDouble
    assert(math.abs(s1.values.count(_ == "test") / n - 0.1) < 0.03)
    assert(math.abs(s1.values.count(_ == "val") / n - 0.1) < 0.03)
    // content-stable: growing the corpus never migrates an existing doc
    val big = (0L until 4000L).toDF("doc_id")
    val s3 = graft.pipeline.TextProfile.hashSplit(big, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.forall { case (id, sp) => s3(id) == sp },
      "split assignment must be a pure function of the id")
  }

  test("hashSplit: boundary fractions summing to 1.0 assign every doc") {
    // floor(1.0·2^32) formats as NINE hex chars — without the sentinel
    // clamp, '100000000' sorts before 8-char md5 prefixes and silently
    // sends almost everything to 'train'
    val ids = (0L until 500L).toDF("doc_id")
    val allTest = graft.pipeline.TextProfile
      .hashSplit(ids, "doc_id", testFrac = 1.0, valFrac = 0.0)
      .collect().map(_.getString(1))
    assert(allTest.forall(_ == "test"), "testFrac = 1.0 → every doc is test")
    val noTrain = graft.pipeline.TextProfile
      .hashSplit(ids, "doc_id", testFrac = 0.3, valFrac = 0.7)
      .collect().map(_.getString(1))
    assert(!noTrain.contains("train"), "test+val = 1.0 → no train docs")
    assert(noTrain.count(_ == "test") > 0 && noTrain.count(_ == "val") > 0)
  }

  test("repetitionScore: repeated-gram fraction, zero for novel text") {
    val df = Seq(
      (1L, "a a a b"),          // 2-grams: "a a","a a","a b" → 1/3 repeat
      (2L, "w x y z"),          // all distinct → 0
      (3L, "p q p q p q")       // "p q","q p","p q","q p","p q" → 3/5
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.pipeline.TextProfile.repetitionScore(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 0.333333) < 1e-6, s"got ${out(1L)}")
    assert(out(2L) == 0.0)
    assert(math.abs(out(3L) - 0.6) < 1e-6, s"got ${out(3L)}")
  }

  test("ngramDocFreq counts distinct docs per word n-gram") {
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c x"),
      (3L, "a b c"),
      (4L, "a b c a b c"), // repeated gram inside one doc counts once
      (5L, "zz")           // shorter than n → whole text as one gram
    ).toDF("doc_id", "text")
    val out = graft.pipeline.TextProfile.ngramDocFreq(df, "doc_id", "text",
        n = 3, minDf = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a b c") == 4L, s"got $out")
    assert(!out.contains("b c d"), "df=1 grams filtered")
    assert(!out.contains("zz"), "short doc's gram has df=1 here")
  }

  test("hamming64Pairs: generic 64-bit banding finds close pairs, skips far") {
    // hand-built hashes: b is a at 2 flipped bits (ham 2, within the
    // 4-band pigeonhole radius 3); c differs in every band (ham 16)
    val a = 0x0123456789ABCDEFL
    val b = a ^ 0x0000000000000003L
    val c = a ^ 0x1111222233334444L
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "h")
    val pairs = Dedup.hamming64Pairs(df, "id", "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("decontaminate removes exact reference-text matches, corpus unshuffled") {
    val corpus = Seq((1L, "keep me"), (2L, "benchmark question one"),
      (3L, "also keep"), (4L, "benchmark question two")).toDF("doc_id", "text")
    val ref = Seq("benchmark question one", "benchmark question two",
      "never seen").toDF("text")
    val out = Dedup.decontaminate(corpus, "text", ref, "text")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L), s"got $out")
    // scale contract: broadcast anti-join — the corpus side never shuffles
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Dedup.decontaminate(corpus, "text", ref, "text")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"expected broadcast anti-join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("decontaminateBloom: identical to exact decontaminate, even at fpp=0.5") {
    // 200 corpus docs, every 10th also present in a 40-doc reference set
    val corpus = (0L until 200L).map(i => (i, s"document body number $i"))
      .toDF("doc_id", "text")
    val ref = ((0L until 200L by 10L).map(i => s"document body number $i") ++
      (0 until 20).map(i => s"ref-only entry $i")).toDF("text")
    val exact = Dedup.decontaminate(corpus, "text", ref, "text")
      .collect().map(_.getLong(0)).toSet
    assert(exact.size == 180)
    // a deliberately terrible filter (fpp=0.5, 1 shard) floods the
    // candidate set with false positives — the exact-confirm phase must
    // still reduce the output to the true answer bit-for-bit
    for ((fpp, shards) <- Seq((0.5, 1), (0.01, 4), (1e-4, 16))) {
      val bloom = Dedup.decontaminateBloom(corpus, "text", ref, "text",
        fpp = fpp, shards = shards).collect().map(_.getLong(0)).toSet
      assert(bloom == exact, s"fpp=$fpp shards=$shards diverged")
    }
  }

  test("decontaminateBloom: corpus never shuffles; only candidate md5s do") {
    val corpus = (0L until 300L).map(i => (i, s"body $i")).toDF("doc_id", "text")
    val ref = (0L until 300L by 7L).map(i => s"body $i").toDF("text")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Dedup.decontaminateBloom(corpus, "text", ref, "text",
        fpp = 0.01, shards = 4)
      val plan = out.queryExecution.executedPlan.toString
      // both joins on the corpus path are broadcast — no sort-merge, no
      // shuffled-hash join anywhere in the final plan
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"corpus-side wide join leaked into the plan:\n$plan")
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"expected broadcast anti-join:\n$plan")
      // the text column never crosses an exchange: the only exchange in the
      // plan is the candidate-md5 distinct (32-char hashes)
      val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(exchanges.forall(!_.contains("text")),
        s"document text crossed an exchange:\n${exchanges.mkString("\n")}")
      assert(out.count() == 300 - 43, "300 docs minus the 43 planted overlaps")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("stratifiedSample: per-stratum rates, exact 0/1, growth-stable") {
    val docs = (0L until 4000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val rates = Map("src0" -> 0.5, "src1" -> 0.0, "src2" -> 1.0)
    val kept = graft.pipeline.TextProfile
      .stratifiedSample(docs, "doc_id", "source", rates, defaultRate = 0.25)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(bySrc("src0") - 500) < 60, s"src0 ~50% of 1000: $bySrc")
    assert(!bySrc.contains("src1"), "rate 0 keeps nothing")
    assert(bySrc("src2") == 1000, "rate 1 keeps everything")
    assert(math.abs(bySrc("src3") - 250) < 50, s"default 25%: $bySrc")
    // growth stability: every kept doc stays kept in a bigger corpus
    val bigger = (0L until 8000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val keptBig = graft.pipeline.TextProfile
      .stratifiedSample(bigger, "doc_id", "source", rates, defaultRate = 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept.forall(k => keptBig.contains(k._1)), "no migration on growth")
  }

  test("thresholdSweep: exact counts, complete grid, monotone curve") {
    val docs = (0 until 100).map(i => Tuple1(i / 100.0)).toDF("score")
    val out = graft.pipeline.TextProfile
      .thresholdSweep(docs, col("score"), buckets = 10, maxScore = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out.length == 10, "one row per grid bucket")
    out.foreach { case (b, t, nKept, rate) =>
      assert(t == b / 10.0)
      assert(nKept == 100 - 10 * b, s"bucket $b: scores >= $t")
      assert(rate == (100 - 10 * b) / 100.0)
    }
    // empty buckets still appear (all scores identical → one hot bucket)
    val flat = (0 until 50).map(_ => Tuple1(0.55)).toDF("score")
    val f = graft.pipeline.TextProfile
      .thresholdSweep(flat, col("score"), buckets = 10, maxScore = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(f.size == 10 && f(0L) == 50 && f(5L) == 50 && f(6L) == 0)
  }

  test("weightedSample: 0/1 exact, ~rate fraction, growth-stable, " +
       "consistent with stratifiedSample at a constant rate") {
    val docs = (0L until 4000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val none = graft.pipeline.TextProfile
      .weightedSample(docs, "doc_id", lit(0.0)).count()
    assert(none == 0, "rate 0 keeps nothing")
    val all = graft.pipeline.TextProfile
      .weightedSample(docs, "doc_id", lit(1.0)).count()
    assert(all == 4000, "rate 1 keeps everything (9-hex-char cut trap)")
    val kept = graft.pipeline.TextProfile
      .weightedSample(docs, "doc_id", lit(0.25))
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(kept.size - 1000) < 100, s"~25%: ${kept.size}")
    // same md5 decision as the stratified path at the same constant rate
    val strat = graft.pipeline.TextProfile
      .stratifiedSample(docs, "doc_id", "source",
        rates = Map.empty, defaultRate = 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept == strat, "one keep decision, two surfaces")
    // growth stability
    val bigger = (0L until 8000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val keptBig = graft.pipeline.TextProfile
      .weightedSample(bigger, "doc_id", lit(0.25))
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(keptBig), "no migration on growth")
  }

  test("semDedup and pmiBigrams plan equi-joins, never a cartesian product") {
    val sd = Dedup.semDedupPairs(embFixture(), "vec_id", "embedding",
      k = 4, iters = 1, minSim = 0.95)
      .queryExecution.executedPlan.toString
    assert(!sd.contains("CartesianProduct"),
      "within-cluster self-join must key on the cluster column")
    val pmi = graft.pipeline.TextProfile
      .pmiBigrams(docs(), "text", minCount = 1, topK = 5)
      .queryExecution.executedPlan.toString
    assert(!pmi.contains("CartesianProduct"))
    assert(pmi.contains("TakeOrderedAndProject"),
      "top-k must plan as partial TakeOrdered, not a global sort")
  }

  test("pmiBigrams: closed-form PMI on a tiny corpus, count floor applied") {
    // corpus: "x y" ×6 docs, "x z" ×6 docs, plus "q r" ×2 (below floor 5)
    val docs = ((0 until 6).map(_ => "x y") ++ (0 until 6).map(_ => "x z") ++
      (0 until 2).map(_ => "q r")).map(Tuple1(_)).toDF("text")
    val out = graft.pipeline.TextProfile
      .pmiBigrams(docs, "text", minCount = 5, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // N = 28 tokens; n_x = 12, n_y = 6, n_xy = 6 → pmi = ln(6·28/(12·6))
    val want = BigDecimal(math.log(6.0 * 28 / (12.0 * 6)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.length == 2, s"q r is under the count floor: ${out.toSeq}")
    assert(out.toSet == Set(("x y", 6L, want), ("x z", 6L, want)))
  }

  test("rankBuckets: exact tertile cutoffs; ties share a bucket; per-stratum") {
    val df = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("x", 4.0), ("x", 5.0),
      ("x", 6.0), ("y", 1.0), ("y", 1.0), ("y", 1.0), ("y", 1.0), ("y", 5.0),
      ("y", 6.0)).toDF("lang", "sc")
    val out = graft.pipeline.TextProfile.rankBuckets(df, "lang", col("sc"), 3)
      .groupBy("lang", "score", "bucket").count().collect()
      .map(r => ((r.getString(0), r.getDouble(1)), (r.getInt(2), r.getLong(3))))
      .toMap
    // x: even spread → clean tertiles
    assert(out(("x", 1.0)) == ((0, 1L)) && out(("x", 2.0)) == ((0, 1L)))
    assert(out(("x", 3.0)) == ((1, 1L)) && out(("x", 4.0)) == ((1, 1L)))
    assert(out(("x", 5.0)) == ((2, 1L)) && out(("x", 6.0)) == ((2, 1L)))
    // y: the 4-way tie at 1.0 all lands in bucket 0 (cum_lt = 0), the rest
    // start at their exact rank → bucket 2
    assert(out(("y", 1.0)) == ((0, 4L)))
    assert(out(("y", 5.0)) == ((2, 1L)) && out(("y", 6.0)) == ((2, 1L)))
  }

  test("bpeMerges: closed-form merge sequence with greedy overlap and tie-break") {
    // words: "aaab" ×2, "ab" ×1. Round 1: (a,a) appears twice inside each
    // "aaab" → 4 beats (a,b)=3; greedy left-to-right turns " a a a b " into
    // " aa a b " (NOT " a aa b "). Round 2: (a,b)=3 beats (aa,a)=2.
    // Round 3: (aa,ab)=2 completes "aaab".
    val docs = Seq("aaab ab", "aaab").map(Tuple1(_)).toDF("text")
    val out = graft.pipeline.TextProfile.bpeMerges(docs, "text", rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)), out.toSeq.toString)
    // tie-break: (a,b) and (c,d) both count 2 → lexicographically smaller
    // (lhs, rhs) wins
    val tie = Seq("ab cd", "ab cd").map(Tuple1(_)).toDF("text")
    val first = graft.pipeline.TextProfile.bpeMerges(tie, "text", rounds = 1)
      .collect().head
    assert((first.getString(1), first.getString(2)) == ("a", "b"))
  }

  test("bpeEncode: learned merges tokenize docs greedily; unseen words stay chars") {
    val docs = Seq((1L, "aaab ab"), (2L, "aaab"), (3L, "xyz"), (4L, ""))
      .toDF("doc_id", "text")
    // merges from the bpeMerges closed-form test: aa, ab, then aa+ab
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val out = graft.pipeline.TextProfile.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // "aaab" → " a a a b " → " aa a b " → " aa ab " → " aaab " = 1 token;
    // "ab" → 1; "xyz" has no applicable merge → 3 chars = 3 tokens
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 3L, 4L -> 0L), out.toString)
  }

  test("kmeans: k larger than the corpus fails loudly, not silently") {
    val tiny = Seq((1L, Array(1f, 2f)), (2L, Array(3f, 4f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.kmeansFit(tiny, "vec_id", "embedding", k = 5, iters = 1)
    }
    assert(e.getMessage.contains("k=5"), e.getMessage)
  }

  test("kmeans: an emptied cluster keeps its previous centroid") {
    // 3 identical points: all assign to one centroid after init, so the
    // other clusters receive no members — their centroids must persist
    // (not NaN / zero) and labeling must stay total and deterministic
    val df = Seq((7L, Array(1f, 1f)), (8L, Array(1f, 1f)), (9L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val labels = Dedup.kmeansLabels(df, "vec_id", "embedding", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(labels.size == 3 && labels.values.toSet.size == 1,
      s"identical points share one cluster: $labels")
    val cents = Dedup.kmeansFit(df, "vec_id", "embedding", k = 3, iters = 2)
    assert(cents.length == 3)
    assert(cents.forall(c => c.forall(x => !x.isNaN)),
      "empty clusters keep finite centroids")
  }

  test("weightedSample: per-row varying rates match a driver md5 reference") {
    // rate varies per row (i % 5 / 4.0 ∈ {0, .25, .5, .75, 1}); the engine
    // decision must equal an independently-computed md5-prefix comparison
    def hex8(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
    val docs = (0L until 2000L).map(i => (i, (i % 5) / 4.0)).toDF("doc_id", "r")
    val got = graft.pipeline.TextProfile
      .weightedSample(docs, "doc_id", col("r"))
      .collect().map(_.getLong(0)).toSet
    val want = (0L until 2000L).filter { i =>
      val r = (i % 5) / 4.0
      r >= 1.0 || hex8(i) < f"${math.floor(r * 4294967296.0).toLong}%08x"
    }.toSet
    assert(got == want, s"diff ${got.diff(want).take(3)} / ${want.diff(got).take(3)}")
  }

  test("topPerGroup: best-k by score with deterministic ties") {
    val docs = Seq((1L, "a", 10), (2L, "a", 30), (3L, "a", 30), (4L, "a", 5),
      (5L, "b", 7)).toDF("doc_id", "grp", "score")
    val out = graft.pipeline.TextProfile
      .topPerGroup(docs, "grp", col("score"), "doc_id", k = 2)
      .collect().map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSet
    // ties at score 30 break on doc_id: ranks 1,2 = docs 2,3
    assert(out == Set(("a", 1, 2L), ("a", 2, 3L), ("b", 1, 5L)), s"got $out")
  }

  test("tfidfTopTerms: classic tf·ln(N/df), deterministic ranking") {
    val df = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana cherry cherry"),
      (3L, "durian durian durian banana")
    ).toDF("doc_id", "text")
    val out = graft.pipeline.TextProfile.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // doc 1: apple tf=2 df=1 → 2·ln(3); cherry tf=1 df=2 → ln(1.5);
    // banana df=3 → idf 0 scores 0 and never ranks above the others
    assert(out((1L, 1))._1 == "apple" &&
      math.abs(out((1L, 1))._4 - 2 * math.log(3.0)) < 1e-6, s"$out")
    assert(out((1L, 2))._1 == "cherry")
    // doc 3: durian tf=3 df=1 → 3·ln(3) top
    assert(out((3L, 1))._1 == "durian" && out((3L, 1))._2 == 3L)
  }

  test("contamination probe matches a driver-side brute-force oracle") {
    // overlapping synthetic vocab so train/test gram collisions are real
    val docs = (0L until 300L).map { i =>
      (i, s"w${i % 5} w${(i / 5) % 5} w${(i / 25) % 5} t${i % 11} t${i % 13} common suffix words")
    }.toDF("doc_id", "text")
    val out = graft.pipeline.TextProfile
      .contamination(docs, "doc_id", "text", n = 3,
        testFrac = 0.2, valFrac = 0.1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4), r.getLong(5))).toMap

    // brute force on the driver from the same hashSplit + gram definitions
    val split = graft.pipeline.TextProfile
      .hashSplit(docs, "doc_id", testFrac = 0.2, valFrac = 0.1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    def grams(t: String): Set[String] = {
      val ws = t.split(" ")
      if (ws.length <= 3) Set(ws.mkString(" "))
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val byId = docs.collect().map(r => r.getLong(0) -> grams(r.getString(1))).toMap
    val trainDf = byId.toSeq.filter(kv => split(kv._1) == "train")
      .flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val testIds = split.collect { case (id, "test") => id }.toSet
    assert(out.keySet == testIds, "every test doc appears exactly once")
    testIds.foreach { id =>
      val g = byId(id)
      val hits = g.filter(trainDf.contains)
      val (ng, nc, frac, wg, wd) = out(id)
      assert(ng == g.size && nc == hits.size, s"doc $id: ($ng,$nc) vs (${g.size},${hits.size})")
      assert(math.abs(frac - (BigDecimal(hits.size.toDouble / g.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)) < 1e-9)
      if (hits.isEmpty) assert(wg == "" && wd == 0L)
      else {
        val expected = hits.map(x => (x, trainDf(x)))
          .toSeq.sortBy { case (gr, df) => (-df, gr) }.head
        assert((wg, wd) == (expected._1, expected._2), s"doc $id worst")
      }
    }
  }

  test("components: chains and separate cliques collapse to min-id labels") {
    // chain 1-2-3-4 (diameter 3: needs multiple propagation rounds),
    // triangle 10-11-12, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L),
      s"got $comp")
    val k = Dedup.keepers(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k == Map(1L -> 4L, 10L -> 3L, 20L -> 2L), s"got $k")
  }

  test("components: the small-graph driver path matches the distributed fixpoint") {
    // a messy mix — chain, clique, self-pair-only id, duplicate and
    // reversed edges — must label identically under both execution paths
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L), (21L, 20L), (30L, 30L),
      (2L, 1L)).toDF("id_a", "id_b")
    val dist = Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Dedup.components(pairs, smallGraphLimit = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist, s"fast=$fast dist=$dist")
    assert(fast(30L) == 30L, "self-pair-only id labels itself on both paths")
    // a pair count over the limit falls back to the distributed path
    val big = Dedup.components(pairs, smallGraphLimit = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(big == dist)
  }

  test("components: 500-node chain converges in O(log² n) rounds, not diameter") {
    // a path graph is the adversarial case for label propagation (diameter
    // 499 → the round-3 algorithm needed ~499 rounds and silently gave up
    // at 64); large-star/small-star must finish within ~2·log²(500) ≈ 20 —
    // maxRounds = 20 doubles as the assertion: exceeding it throws
    val chain = (0L until 499L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.components(chain, maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 500 && comp.values.forall(_ == 0L),
      s"all 500 chain nodes must label 0, got ${comp.values.toSet}")
  }

  test("components: non-convergence is loud, not silent") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.components(chain, maxRounds = 1).count()
    }
    assert(ex.getMessage.contains("no convergence"), ex.getMessage)
  }

  test("components: property check vs driver union-find over random graphs") {
    // seeded pseudo-random edge sets across shapes (sparse, clustery,
    // chain-heavy) — every labeling must equal a classic union-find with
    // min-id canonical roots
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    for (seed <- 1 to 6) {
      val rng = graft.fixture.Prng.derive(0xCC00L, seed.toLong, 7L)
      val n = 150 + rng.nextInt(250)
      val edges = (0 until n).map { _ =>
        seed % 3 match {
          case 0 => // sparse random
            (rng.nextInt(400).toLong, rng.nextInt(400).toLong)
          case 1 => // clustery: endpoints inside one of 8 blocks
            val blk = rng.nextInt(8) * 50L
            (blk + rng.nextInt(50), blk + rng.nextInt(50))
          case _ => // chain-heavy: mostly consecutive ids + a few jumps
            val a = rng.nextInt(300).toLong
            (a, if (rng.nextDouble() < 0.9) a + 1 else rng.nextInt(300).toLong)
        }
      }.filter(e => e._1 != e._2)
      val expected = unionFind(edges)
      val got = Dedup.components(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $seed: ${got.size} vs ${expected.size} labels")
    }
  }

  test("components: reliable-checkpoint mode produces identical labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    val viaReliable = Dedup.components(pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLocal = Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaReliable == viaLocal, s"$viaReliable vs $viaLocal")
    // the reliable mode actually wrote RDD checkpoints to the dir
    assert(new java.io.File(dir).listFiles != null &&
      new java.io.File(dir).listFiles.nonEmpty, "checkpoint dir empty")
  }

  test("components: per-round checkpoint blocks are freed, storage is O(1) rounds deep") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // a 400-node chain needs ~10+ contraction rounds — without the explicit
    // per-round unpersist, each round's localCheckpoint blocks would linger
    val chain = (0L until 399L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assert(Dedup.components(chain).count() == 400)
    val leaked = (sc.getPersistentRDDs.keySet -- before).size
    assert(leaked <= 2,
      s"at most the round-0 id universe + the fixpoint checkpoint may stay " +
        s"persisted; found $leaked new persistent RDDs")
  }

  test("components: ids seen only in self-pairs label themselves") {
    val pairs = Seq((7L, 7L), (2L, 3L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(7L -> 7L, 2L -> 2L, 3L -> 2L), s"got $comp")
  }

  test("components: a non-integral id fails loudly, never silently drops") {
    val pairs = Seq(("doc-x", "doc-y")).toDF("id_a", "id_b")
    intercept[Exception] { Dedup.components(pairs).collect() }
  }

  test("containment estimate tier: prunes the short-doc bulk, keeps the asymmetric true pair") {
    // the population the gram-count estimate can NOT prune: short docs,
    // where its 4.5·sqrt(0.25/minFp) margin collapses the threshold to ~0 —
    // the MinHash tier's per-pair J_req ≈ C/(2−C) ≈ 0.82 cutoff must do the
    // work there, while the small-in-big planted pair (tiny J_req) survives
    val rng = graft.fixture.Prng.derive(0xC0DEL, 7L, 3L)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa")
    val shorts = (100L until 180L).map { i =>
      (i, (0 until 10).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val big = (0 until 40).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    val df = (shorts ++ Seq((1L, big), (2L, big.substring(0, 120))))
      .toDF("doc_id", "text")
    val ids = df.select(col("doc_id"))
    val cands = ids.select(col("doc_id").as("id_a"))
      .crossJoin(ids.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val nCands = cands.count()
    val kept = Dedup.containmentEstimateFilter(df, "doc_id", "text",
      cands, shingleK = 5, minContainment = 0.9)
    val keptPairs = kept.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keptPairs.contains((1L, 2L)), "planted contained prefix must survive the tier")
    assert(keptPairs.size <= nCands / 10,
      s"tier must prune the symmetric short-doc bulk: kept ${keptPairs.size} of $nCands")
    // end to end: the full operator still surfaces exactly the planted pair
    val pairs = Dedup.containmentPairs(df, "doc_id", "text", minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.9),
      s"got ${pairs.mkString(",")}")
  }

  test("DedupJob runs each mode end to end and writes pairs + hot-bucket report") {
    val in = java.nio.file.Files.createTempDirectory("graft_dj_in").toString
    // base docs + a clique that must land in the hot-bucket report
    val clique = (500L until 560L).map(i =>
      (i, "identical clique text shared by sixty documents in this corpus"))
    (docs().collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++ clique)
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)

    val exactOut = java.nio.file.Files.createTempDirectory("graft_dj_ex").toString
    val ex = graft.app.DedupJob.run(spark,
      graft.app.DedupJob.Args(in, exactOut, mode = "exact"))
    assert(ex("keepers") == 5L, s"4 distinct base texts + clique, got $ex")

    val mhOut = java.nio.file.Files.createTempDirectory("graft_dj_mh").toString
    val mh = graft.app.DedupJob.run(spark,
      graft.app.DedupJob.Args(in, mhOut, mode = "minhash", maxBucket = 16))
    val pairs = spark.read.parquet(s"$mhOut/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair survives the cap")
    assert(mh("hot_buckets") > 0L,
      "the 60-doc clique must appear in the dropped-key report")
    assert(!pairs.exists(p => p._1 >= 500L && p._2 >= 500L),
      "clique pairs are exact dedup's job under the cap")
  }

  test("DedupJob semdedup mode: pairs from an embeddings table + clusters") {
    val in = java.nio.file.Files.createTempDirectory("graft_dj_emb").toString
    embFixture().write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_dj_sd").toString
    val m = graft.app.DedupJob.run(spark,
      graft.app.DedupJob.Args(in, out, mode = "semdedup", idCol = "vec_id",
        kClusters = 4, cluster = true))
    assert(m("pairs") >= 5L, s"five planted near-dups must surface, got $m")
    val pairs = spark.read.parquet(s"$out/pairs")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    for (i <- 0 until 5) assert(pairs.contains((i.toLong, 100L + i)))
    val keepers = spark.read.parquet(s"$out/keepers")
      .collect().map(r => r.getLong(0)).toSet
    assert((0L until 5L).toSet.subsetOf(keepers), "min-id keeper per cluster")
  }

  test("CurateJob: staged funnel counts and scrubbed kept output") {
    val base = "clean filler words that make this document long enough to " +
      "pass the minimum length quality gate easily"
    val rows = Seq(
      (1L, base + " one"),
      (2L, base + " two"),
      (3L, base + " two"),                        // exact dup of 2 → dropped
      (4L, "eval question text that is long enough to pass the gate " + base),
      (5L, "short"),                              // length gate
      (6L, "!!! ??? *** ### $$$ %%% " + base.takeRight(30) + " !!!"), // punct
      (7L, base + " mail me at a.b@example.com please")) // scrubbed, kept
    val in = java.nio.file.Files.createTempDirectory("graft_cj_in").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val refIn = java.nio.file.Files.createTempDirectory("graft_cj_ref").toString
    Seq(Tuple1(rows(3)._2)).toDF("text")
      .write.mode("overwrite").parquet(refIn)
    val out = java.nio.file.Files.createTempDirectory("graft_cj_out").toString
    val m = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out, ref = Some(refIn),
        fullKeepLen = 10)) // every surviving doc ≥ 10 chars → sample = all
    assert(m("rows_in") == 7 && m("after_decontaminate") == 6)
    assert(m("after_dedup") == 5, "one of the exact-dup pair drops")
    assert(m("after_quality") == 3 && m("kept") == 3, s"got $m")
    val kept = spark.read.parquet(s"$out/kept")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet == Set(1L, 2L, 7L), s"got ${kept.keySet}")
    assert(kept(7L).contains("<EMAIL>") && !kept(7L).contains("example.com"),
      "kept text is the SCRUBBED text")
    val rep = spark.read.parquet(s"$out/report").collect()
    assert(rep.length == 1 && rep(0).getAs[Long]("kept") == 3)
    // skipped optional stages report the pass-through count
    assert(rep(0).getAs[Long]("after_neardup") == 5 &&
      rep(0).getAs[Long]("after_spans") == 5)
    // funnel-shift audit rows: populations reconcile, index is finite
    val drift = spark.read.parquet(s"$out/drift").collect()
    assert(drift.map(_.getAs[Long]("n_ref")).sum == 7L &&
      drift.map(_.getAs[Long]("n_cur")).sum == 3L, drift.mkString(";"))
    val idx = drift.map(_.getAs[Double]("psi")).sum
    assert(!idx.isNaN && !idx.isInfinite && idx >= 0.0, s"index $idx")
  }

  test("CurateJob --mirrors drops the re-hosted source; the keeper survives") {
    // mirror_a re-hosts source a's CONTENT re-chunked: no doc-level
    // near-dup pair exists, but the domain gram unions match
    val rows = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india " +
        "juliett kilo lima", "a"),
      (2L, "mike november oscar papa quebec romeo sierra tango uniform " +
        "victor whiskey xray", "a"),
      (3L, "alpha bravo charlie delta echo foxtrot golf hotel india " +
        "juliett kilo lima mike november oscar papa quebec romeo sierra " +
        "tango uniform victor whiskey xray", "mirror_a"),
      (4L, "yankee zulu one two three four five six seven eight nine ten " +
        "eleven twelve", "b"))
    val in = java.nio.file.Files.createTempDirectory("graft_cjm_in").toString
    rows.toDF("doc_id", "text", "source").write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_cjm_out").toString
    val m = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out, mirrors = true,
        mirrorJaccard = 0.7, minLen = 20, fullKeepLen = 10))
    // source a keeps (2 surviving docs beat mirror_a's 1); b untouched
    assert(m("after_mirrors") == 3 && m("kept") == 3, s"got $m")
    val kept = spark.read.parquet(s"$out/kept")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L), s"got $kept")
    // without the stage the mirror sails through
    val out2 = java.nio.file.Files.createTempDirectory("graft_cjm_o2").toString
    val m2 = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out2, minLen = 20, fullKeepLen = 10))
    assert(m2("kept") == 4, s"got $m2")
  }

  test("CurateJob NFC stage unifies decomposed/composed duplicate spellings") {
    val base = "clean filler words that make this document long enough to " +
      "pass the minimum length quality gate easily at the caf"
    val rows = Seq(
      (1L, base + "é"),  // decomposed é
      (2L, base + "é"))   // composed é — same text after NFC
    val in = java.nio.file.Files.createTempDirectory("graft_cjn_in").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_cjn_out").toString
    val m = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out, fullKeepLen = 10))
    assert(m("after_dedup") == 1 && m("kept") == 1,
      s"NFC default must collapse the spellings: $m")
    // opting out keeps them distinct (byte-level dedup only)
    val out2 = java.nio.file.Files.createTempDirectory("graft_cjn_o2").toString
    val m2 = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out2, fullKeepLen = 10, nfc = false))
    assert(m2("after_dedup") == 2, s"got $m2")
  }

  test("CurateJob --substr cuts duplicated windows, keeps one canonical copy") {
    val run10 = "quoted passage lifted verbatim across documents again and " +
      "again everywhere" // 10 tokens → three dup 8-windows when shared
    val rows = Seq(
      (1L, "first document original framing words precede the reuse " + run10),
      (2L, "second document other original framing words precede " + run10),
      (3L, run10)) // nothing but the duplicated run → vanishes
    val in = java.nio.file.Files.createTempDirectory("graft_cjs_in").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_cjs_out").toString
    val m = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out, substrK = 8,
        minLen = 20, fullKeepLen = 10))
    assert(m("after_substr") == 2 && m("kept") == 2, s"got $m")
    val kept = spark.read.parquet(s"$out/kept")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 holds the canonical copy intact; doc 2's copy is cut
    assert(kept(1L).endsWith(run10), s"doc1: ${kept(1L)}")
    assert(kept(2L) == "second document other original framing words precede",
      s"doc2: ${kept(2L)}")
    // window size 1 is rejected loudly
    val err = intercept[IllegalArgumentException] {
      graft.app.CurateJob.run(spark,
        graft.app.CurateJob.Args(in, out, substrK = 1))
    }
    assert(err.getMessage.contains("--substr"))
  }

  test("CurateJob: near-dup, span, and learned-quality stages in the funnel") {
    // the learned head is trained on the LangGen corpus distribution —
    // in-distribution sentences are the positives here (arbitrary English
    // filler would score as junk, correctly)
    val sents = graft.fixture.LangGen.corpus(10, seed = 555L)("aa")
    val para = sents(0) // shared boilerplate paragraph (small J vs any doc)
    val rows = Seq(
      (1L, sents(1) + " " + sents(2) + " " + sents(3) + "\n\n" + para),
      (2L, para + "\n\n" + sents(4) + " " + sents(5) + " " + sents(6)),
      (3L, para),                                 // pure boilerplate → vanishes
      (4L, sents(7) + " " + sents(8) + " ok"),    // near-dup keeper vs 5
      (5L, sents(7) + " " + sents(8) + " yes"),   // near-dup non-keeper
      (6L, "zqx " * 40)) // junk: repeated-token loop → learned head rejects
    val in = java.nio.file.Files.createTempDirectory("graft_cj2_in").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_cj2_out").toString
    val m = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out,
        nearDup = true, spans = true,
        quality = "learned", minQuality = 0.5,
        minLen = 20, fullKeepLen = 10)) // all survivors sampled in
    assert(m("rows_in") == 6 && m("after_dedup") == 6, s"got $m")
    assert(m("after_neardup") == 5, s"5 drops as 4's near-dup non-keeper: $m")
    // span stage: para kept once (doc 1, min (id, span_idx)), doc 3 vanishes
    assert(m("after_spans") == 4, s"pure-boilerplate doc 3 must vanish: $m")
    assert(m("after_quality") == 3 && m("kept") == 3,
      s"junk doc 6 fails the learned head: $m")
    val kept = spark.read.parquet(s"$out/kept")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet == Set(1L, 2L, 4L), s"got ${kept.keySet}")
    assert(kept(1L).contains(para), "doc 1 holds the span keeper copy")
    assert(!kept(2L).contains(para), "doc 2's duplicate span is removed")
    // learned head agrees bitwise with the independent oracle on the judged doc
    val oracleScore = graft.oracle.OracleText.quality(
      graft.text.TextModel.default, rows(5)._2)
    assert(oracleScore < 0.5, s"junk must score low, oracle says $oracleScore")
  }

  test("CurateJob: --ccnet drops each stratum's tail tertile by noise score") {
    // 6 docs per language with strictly increasing punct counts (0..5
    // commas on a punct-free base): tertiles are 0,0,1,1,2,2 → the two
    // noisiest docs per stratum are the tail and must drop; every doc
    // passes the heuristic gate first (ratios stay ≤ 0.1)
    val base = "clean filler words that make this document long enough to " +
      "pass the minimum length quality gate easily"
    val rows =
      (1L to 6L).map(i => (i, base + " english" + ("," * (i - 1).toInt), "en")) ++
      (11L to 16L).map(i => (i, base + " french" + ("," * (i - 11).toInt), "fr"))
    val in = java.nio.file.Files.createTempDirectory("graft_cj3_in").toString
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_cj3_out").toString
    val m = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out,
        ccnet = true, stratum = Some("lang"), fullKeepLen = 10))
    assert(m("after_quality") == 12, s"all docs pass the gate: $m")
    assert(m("after_ccnet") == 8 && m("kept") == 8, s"got $m")
    val kept = spark.read.parquet(s"$out/kept")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L), s"got $kept")
  }

  test("CurateJob: --mixTau temperature-mixes strata, off by default") {
    // skewed strata: 40 en vs 10 fr docs, all passing every gate; tau=0.5
    // at frac=0.5 gives rate_en ≈ 0.417, rate_fr ≈ 0.833 — the low-resource
    // stratum survives at roughly twice the rate of the dominant one
    val base = "clean filler words that make this document long enough to " +
      "pass the minimum length quality gate easily"
    val rows = (1L to 40L).map(i => (i, s"$base english token$i", "en")) ++
      (101L to 110L).map(i => (i, s"$base french token$i", "fr"))
    val in = java.nio.file.Files.createTempDirectory("graft_cj4_in").toString
    rows.toDF("doc_id", "text", "lang").write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_cj4_out").toString
    val m = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out, stratum = Some("lang"),
        mixTau = 0.5, mixFrac = 0.5, fullKeepLen = 10))
    assert(m("after_quality") == 50, s"all docs pass the gate: $m")
    assert(m("after_mix") < 50 && m("kept") == m("after_mix"), s"got $m")
    val kept = spark.read.parquet(s"$out/kept")
      .collect().map(_.getLong(0)).toSet
    val keptEn = kept.count(_ <= 40L); val keptFr = kept.count(_ > 100L)
    assert(keptFr >= 6, s"fr (rate ≈ 0.833) must mostly survive: $keptFr/10")
    assert(keptEn >= 9 && keptEn <= 25,
      s"en (rate ≈ 0.417) survives at about half fr's rate: $keptEn/40")
    // tau = 0 disables the stage: after_mix passes through
    val out0 = java.nio.file.Files.createTempDirectory("graft_cj4_o0").toString
    val m0 = graft.app.CurateJob.run(spark,
      graft.app.CurateJob.Args(in, out0, stratum = Some("lang"),
        fullKeepLen = 10))
    assert(m0("after_mix") == m0("after_ccnet") && m0("kept") == 50, s"$m0")
  }

  test("DedupJob --cluster writes components + keepers for a near-dup mode") {
    val in = java.nio.file.Files.createTempDirectory("graft_djc_in").toString
    docs().write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_djc_out").toString
    val m = graft.app.DedupJob.run(spark,
      graft.app.DedupJob.Args(in, out, mode = "minhash", cluster = true))
    // docs 1, 2, 5 form one near-dup cluster (1∼2 near, 1∼5 exact)
    assert(m("pairs") >= 2L && m.contains("components") && m.contains("keepers"), s"$m")
    val comp = spark.read.parquet(s"$out/components")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 5L -> 1L), s"got $comp")
    val k = spark.read.parquet(s"$out/keepers")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k == Map(1L -> 3L), s"one keeper (id 1, cluster of 3), got $k")
  }

  test("verified simhash and fingerprint near-dup surface the planted pair") {
    val sim = Dedup.simhashNearDup(docs(), "doc_id", "text",
      maxHamming = 12, numBands = 4, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.contains((1L, 5L)), s"exact dup must survive verify, got $sim")
    assert(!sim.exists(p => p._1 == 3L || p._2 == 3L))
    val fp = Dedup.fingerprintNearDup(docs(), "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fp.contains((1L, 5L)), s"exact dup shares every fingerprint, got $fp")
    assert(fp.contains((1L, 2L)), "near dup shares fingerprints + J ≥ 0.5")
    assert(!fp.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // ---- deterministic k-means / SemDeDup ------------------------------------

  /** Independent driver-side Lloyd reference replicating every pin of
    * `Dedup.kmeansFit` from the spec, not the code: md5-smallest-k init,
    * sequential-fold squared Euclidean with smaller-cid ties, DECIMAL(·,12)
    * sums, mean = round(sum/n, 6) HALF_UP, empty cluster keeps centroid. */
  private def refKmeans(rows: Seq[(Long, Array[Float])],
                        k: Int, iters: Int): Map[Long, Int] = {
    def hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val data = rows.map { case (id, v) => (id, v.map(_.toDouble)) }
    var cents: Array[Array[Double]] =
      data.sortBy { case (id, _) => (hex(id), id) }.take(k).map(_._2).toArray
    def assign(v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue
      for (c <- cents.indices) {
        var s = 0.0; var j = 0
        while (j < v.length) { val d = v(j) - cents(c)(j); s += d * d; j += 1 }
        if (s < bd) { bd = s; best = c }
      }
      best
    }
    val half = BigDecimal.RoundingMode.HALF_UP
    for (_ <- 1 to iters) {
      val byC = data.groupBy { case (_, v) => assign(v) }
      val next = cents.map(_.clone())
      byC.foreach { case (c, members) =>
        for (j <- members.head._2.indices) {
          val s = members.map(m => BigDecimal(m._2(j)).setScale(12, half)).sum
          next(c)(j) = BigDecimal(s.toDouble / members.size)
            .setScale(6, half).toDouble
        }
      }
      cents = next
    }
    data.map { case (id, v) => id -> assign(v) }.toMap
  }

  test("kmeans: labels match the independent driver-side Lloyd reference") {
    val df = embFixture()
    val got = Dedup.kmeansLabels(df, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = refKmeans(
      df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq,
      k = 4, iters = 2)
    assert(got == want, s"diff: ${got.toSet.diff(want.toSet).take(5)}")
    assert(got.values.toSet.subsetOf((0 until 4).toSet))
  }

  test("kmeans: labels are invariant to partition layout") {
    val df = embFixture()
    val a = Dedup.kmeansLabels(df.repartition(1), "vec_id", "embedding",
      k = 4, iters = 2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Dedup.kmeansLabels(df.repartition(7), "vec_id", "embedding",
      k = 4, iters = 2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "DECIMAL-summed means must make labels layout-independent")
  }

  test("semDedup: planted near-dups co-cluster and surface within-cluster") {
    val df = embFixture()
    val pairs = Dedup.semDedupPairs(df, "vec_id", "embedding",
      k = 4, iters = 2, minSim = 0.95).collect()
    val ids = pairs.map(r => (r.getLong(1), r.getLong(2))).toSet
    for (i <- 0 until 5)
      assert(ids.contains((i.toLong, 100L + i)),
        s"planted near-dup ($i, ${100 + i}) must share a cluster and surface")
    // contract: every emitted pair is within one cluster
    val labels = Dedup.kmeansLabels(df, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.foreach { r =>
      assert(labels(r.getLong(1)) == labels(r.getLong(2)))
      assert(r.getInt(0) == labels(r.getLong(1)), "cluster column = label")
    }
  }

  test("semDedup: maxCluster guard drops degenerate clusters, loudly not quietly") {
    val df = embFixture()
    // k = 1 puts all 65 rows in one cluster; cap 16 must drop it entirely
    val capped = Dedup.semDedupPairs(df, "vec_id", "embedding",
      k = 1, iters = 1, minSim = 0.95, maxCluster = 16).collect()
    assert(capped.isEmpty, "over-cap cluster contributes no pairs")
    val uncapped = Dedup.semDedupPairs(df, "vec_id", "embedding",
      k = 1, iters = 1, minSim = 0.95, maxCluster = 4096).collect()
    assert(uncapped.length >= 5, "uncapped single cluster surfaces the plants")
  }

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("temperatureMix: closed-form rates, tau upweights small sources, " +
       "expected survivor volume") {
    val sizes = Map("big" -> 3000, "mid" -> 750, "small" -> 250)
    val rows = sizes.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      (0 until n).map(i => (s"${s}_$i", s))
    }
    val docs = rows.toDF("doc_id", "source")
    val out = graft.pipeline.TextProfile
      .temperatureMix(docs, "doc_id", "source", tau = 0.5, targetFrac = 0.5)
    val gotRates = out.select("source", "mix_rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // driver replica of the quantized-weight rate computation
    val w = sizes.map { case (s, n) =>
      s -> BigDecimal.valueOf(math.pow(n.toDouble, 0.5))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val sw = w.values.sum.doubleValue
    val nTot = sizes.values.sum.toDouble
    val expRates = sizes.map { case (s, n) =>
      val p = w(s).doubleValue / sw
      s -> math.min(1.0, BigDecimal.valueOf(p * 0.5 * nTot / n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    expRates.foreach { case (s, r) =>
      assert(math.abs(gotRates(s) - r) < 1e-12,
        s"rate($s): got ${gotRates(s)} want $r")
    }
    // tau < 1 upweights the small source relative to its natural share
    assert(expRates("small") > expRates("big"),
      "temperature must favor the small source")
    // survivor volume tracks rate·n per source
    val kept = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (s, n) =>
      val exp = expRates(s) * n
      assert(math.abs(kept.getOrElse(s, 0L) - exp) < 4 * math.sqrt(exp) + 8,
        s"kept($s)=${kept.getOrElse(s, 0L)} expected ≈$exp")
    }
    // tau = 1 is natural proportions: every source keeps targetFrac
    val nat = graft.pipeline.TextProfile
      .temperatureMix(docs, "doc_id", "source", tau = 1.0, targetFrac = 0.5)
      .select("source", "mix_rate").distinct()
      .collect().map(_.getDouble(1)).toSet
    assert(nat.forall(r => math.abs(r - 0.5) < 1e-9),
      s"tau=1 rate must be targetFrac for every source: $nat")
  }

  test("upsample: exact whole copies, stable fractional draw, and the " +
       "r<1 case degenerates to weightedSample's keep set") {
    val docs = (0L until 1000L).map(i => (i, "x")).toDF("doc_id", "text")
    // integer rate: exactly 3 copies per doc, copy_idx 0..2
    val r3 = graft.pipeline.TextProfile
      .upsample(docs, "doc_id", lit(3.0))
      .groupBy("doc_id").agg(count(lit(1)).as("n"),
        min("copy_idx").as("lo"), max("copy_idx").as("hi"))
      .collect()
    assert(r3.length == 1000 &&
      r3.forall(r => r.getLong(1) == 3 && r.getInt(2) == 0 && r.getInt(3) == 2))
    // fractional rate: copies ∈ {2,3}, expected total = 2500
    val r25 = graft.pipeline.TextProfile
      .upsample(docs, "doc_id", lit(2.5))
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r25.values.forall(n => n == 2 || n == 3))
    val total = r25.values.sum
    assert(math.abs(total - 2500L) < 4 * math.sqrt(2500.0) + 8,
      s"total copies $total, expected ≈2500")
    // r<1: the set of emitted docs IS weightedSample's keep set (same cut)
    val up = graft.pipeline.TextProfile.upsample(docs, "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ws = graft.pipeline.TextProfile
      .weightedSample(docs, "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(up == ws, "fractional draw must match weightedSample's md5 cut")
    // determinism: the 2.5-rate third-copy subset is identical across runs
    val again = graft.pipeline.TextProfile
      .upsample(docs, "doc_id", lit(2.5))
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == r25)
  }

  test("packSequences matches a driver-side brute-force prefix sum; " +
       "offsets tile the token stream exactly") {
    val docs = (0L until 500L).map(i =>
      (i, ("w " * ((i % 17).toInt + 1)).trim)).toDF("doc_id", "text")
    val out = graft.pipeline.TextProfile
      .packSequences(docs, "doc_id", "text", budgetTokens = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // brute force: sort by md5(id) hex, exclusive running sum of word counts
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      String.format("%032x", new java.math.BigInteger(1, d))
    }
    var acc = 0L
    val exp = (0L until 500L).map(i => (i, (i % 17) + 1, md5hex(i.toString)))
      .sortBy(_._3)
      .map { case (i, n, _) =>
        val start = acc; acc += n; (i, n, start, start / 64)
      }.sortBy(_._1).toArray
    assert(out.sameElements(exp),
      s"first diff: ${out.zip(exp).find(p => p._1 != p._2)}")
    // the offsets tile [0, total): max(start+n_tok) = sum(n_tok)
    assert(out.map(t => t._3 + t._2).max == out.map(_._2).sum)
  }

  test("dupAwareSample: 1/cluster-size rates, singletons always survive") {
    val corpus = ((0L until 100L).map(i => (i, s"unique doc $i")) ++
      Seq((200L, "clique"), (201L, "clique"),
          (202L, "clique"), (203L, "clique"))).toDF("doc_id", "text")
    val pairs = Seq((200L, 201L), (200L, 202L), (200L, 203L))
      .toDF("id_a", "id_b")
    val comps = Dedup.components(pairs)
    val out = graft.pipeline.TextProfile
      .dupAwareSample(corpus, comps, "doc_id", beta = 1.0)
      .select("doc_id", "c_size", "samp_rate").collect()
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // every singleton kept at rate 1 with size 1
    (0L until 100L).foreach { i =>
      assert(byId.contains(i), s"singleton $i must survive")
      assert(byId(i) == ((1L, 1.0)), s"singleton $i: ${byId(i)}")
    }
    // clique members that survive carry size 4 / rate 0.25
    val clique = byId.keySet.filter(_ >= 200L)
    clique.foreach { i =>
      assert(byId(i) == ((4L, 0.25)), s"clique member $i: ${byId(i)}")
    }
    assert(clique.size < 4, "rate 1/4 cannot keep the whole clique " +
      "(md5 draw over 4 ids keeping all 4 has prob 1/256 per seed — " +
      "and the draw is deterministic, checked once here)")
    // beta = 0.5 dampens instead of flattening: rate = 1/sqrt(4) = 0.5
    val soft = graft.pipeline.TextProfile
      .dupAwareSample(corpus, comps, "doc_id", beta = 0.5)
      .filter(col("doc_id") >= 200L).select("samp_rate")
      .collect().map(_.getDouble(0)).toSet
    assert(soft == Set(0.5), s"beta=0.5 on size-4 cluster: $soft")
  }

  test("lmSelfScore matches a driver-side brute-force trigram LM replay") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat again"),
      (2L, "the dog sat on the log and the dog sat again"),
      (3L, "the cat and the dog sat on the mat together"),
      (4L, "zq!xv@wk#jp$qz%xw"), // alien trigrams → high nll
      (5L, "the the the the the the the the"),
      (6L, "ab"), // shorter than a trigram → no output row
      (7L, "plain english sentence about cats dogs and mats sitting")
    ).toDF("doc_id", "text")
    val got = graft.pipeline.TextProfile
      .lmSelfScore(docs, "doc_id", "text", k = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(!got.contains(6L), "sub-trigram docs carry no score row")

    // driver replica: same split, same counts, same rounding discipline
    val rows = graft.pipeline.TextProfile.hashSplit(docs, "doc_id")
      .select("doc_id", "text", "split")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(t: String): Seq[String] =
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val trainTris = rows.filter(_._3 == "train").flatMap(r => tris(r._2))
    assert(trainTris.nonEmpty, "fixture must land docs in the train split")
    val c3 = trainTris.groupBy(identity).map { case (g, o) => g -> o.size }
    val c2 = c3.groupBy(_._1.substring(0, 2))
      .map { case (p, m) => p -> m.values.sum }
    val v = c3.keys.map(_.substring(2, 3)).toSet.size
    rows.filter(_._2.length >= 3).foreach { case (id, t, _) =>
      val terms = tris(t).map { g =>
        val num = c3.getOrElse(g, 0) + 0.5
        val den = c2.getOrElse(g.substring(0, 2), 0) + 0.5 * v
        BigDecimal.valueOf(math.log(num / den))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      val nll = round6(-terms.sum.toDouble / terms.size)
      assert(got(id)._1 == terms.size.toLong, s"n_tri($id)")
      assert(got(id)._2 == nll, s"nll($id): got ${got(id)._2} want $nll")
    }
    // the alien-trigram doc scores strictly worse than every fluent doc
    val fluent = Seq(1L, 2L, 3L, 7L).filter(got.contains).map(got(_)._2)
    assert(fluent.nonEmpty && fluent.forall(_ < got(4L)._2),
      s"alien doc must be the outlier: alien=${got(4L)._2} fluent=$fluent")
  }

  test("PQ: codes valid + deterministic; ADC kNN preserves cluster structure") {
    val dim = 8
    // 3 well-separated clusters (offset 10 per dim) with small intra spread
    def vec(c: Int, i: Int): Array[Double] =
      Array.tabulate(dim)(d => c * 10.0 + ((i * 7 + d * 3) % 5) * 0.1)
    val rows = for (c <- 0 until 3; i <- 0 until 20) yield (c * 100L + i, vec(c, i))
    val emb = rows.toDF("vec_id", "embedding")
    val codes = Dedup.pqCodes(emb, "vec_id", "embedding", dim, m = 2, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(codes.length == 60 * 2, "one code per (vector, subspace)")
    assert(codes.forall(c => c._3 >= 0 && c._3 < 4), "codes in [0, k)")
    // deterministic: a recompute lands every vector on the same codes
    val again = Dedup.pqCodes(emb, "vec_id", "embedding", dim, m = 2, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(codes.toSet == again.toSet, "pqCodes must be a pure function of data")
    // within a cluster, quantized vectors collapse toward shared codes, so
    // ADC top-k must stay inside the query's true cluster (the structure a
    // coarse 2×4-code quantizer is obliged to preserve at separation 10σ)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val approx = Dedup.pqKnn(emb, queries, "vec_id", "embedding", dim,
        m = 2, k = 4, iters = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(approx.length == 15, "3 queries × top-5")
    approx.foreach { case (qid, nid) =>
      assert(nid / 100 == qid / 100,
        s"ADC neighbor $nid left query $qid's cluster")
    }
  }

  test("incrementalNearDup equals a full recompute restricted to cross pairs") {
    val corpus = docs() // ids 1..5
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today zz"), // near-dup of 1/5
      (102L, "entirely novel text about incremental minhash band indexes in spark"),
      (103L, "completely different content about spark catalyst optimizer internals") // exact dup of 3
    ).toDF("doc_id", "text")
    val index = Dedup.nearDupIndex(corpus, "doc_id", "text")
    val inc = Dedup.incrementalNearDup(batch, index, corpus, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e4)))
      .toSet
    // full recompute over the union; cross pairs have id_a = corpus (< 100)
    val full = Dedup.nearDupPairs(corpus.union(batch), "doc_id", "text")
      .filter(col("id_a") < 100L && col("id_b") >= 100L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), math.round(r.getDouble(2) * 1e4)))
      .toSet
    assert(inc == full, s"incremental $inc != full-recompute cross pairs $full")
    assert(inc.exists(p => p._1 == 103L && p._2 == 3L), "exact dup found via index")
    assert(inc.exists(p => p._1 == 101L && p._2 == 1L), "near dup found via index")
    assert(!inc.exists(_._1 == 102L), "novel doc stays clean")
  }

  test("DedupJob incremental: index bootstraps, matches, and grows across ingests") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val corpus1 = s"$tmp/corpus1"; val idx = s"$tmp/index"
    docs().write.parquet(corpus1)
    Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today zz"),
      (102L, "entirely novel text about incremental minhash band indexes in spark")
    ).toDF("doc_id", "text").write.parquet(s"$tmp/b1")
    val r1 = graft.app.DedupJob.run(spark, graft.app.DedupJob.Args(
      input = s"$tmp/b1", output = s"$tmp/o1", mode = "incremental",
      corpus = Some(corpus1), indexTable = Some(idx)))
    assert(r1("pairs") >= 1L, "batch-1 planted dup must match the corpus")
    assert(r1("survivors") == 1L, "only the novel doc survives batch 1")
    assert(r1("index_chunks") == 2L, "bootstrap chunk + batch-1 chunk")

    // ingest 2: a near-dup of batch-1's SURVIVOR — findable only because the
    // index grew; the corpus table (per the job contract) now includes past
    // survivors, exactly as the main table a filter pipeline appends to
    val corpus2 = s"$tmp/corpus2"
    spark.read.parquet(corpus1)
      .union(Seq((102L,
        "entirely novel text about incremental minhash band indexes in spark"))
        .toDF("doc_id", "text"))
      .write.parquet(corpus2)
    Seq(
      (201L, "entirely novel text about incremental minhash band indexes in spark !!"),
      (202L, "yet another unrelated piece regarding gopher quality heuristics")
    ).toDF("doc_id", "text").write.parquet(s"$tmp/b2")
    val r2 = graft.app.DedupJob.run(spark, graft.app.DedupJob.Args(
      input = s"$tmp/b2", output = s"$tmp/o2", mode = "incremental",
      corpus = Some(corpus2), indexTable = Some(idx)))
    val p2 = spark.read.parquet(s"$tmp/o2/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2.contains((201L, 102L)),
      s"batch-2 dup of a batch-1 survivor must match via the grown index: $p2")
    assert(r2("survivors") == 1L && r2("index_chunks") == 3L)

    // the coverage guard: an index id absent from --corpus must fail loudly,
    // not silently verify-drop its candidates
    Seq((301L, "any text at all")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/b3")
    val e = intercept[IllegalArgumentException] {
      graft.app.DedupJob.run(spark, graft.app.DedupJob.Args(
        input = s"$tmp/b3", output = s"$tmp/o3", mode = "incremental",
        corpus = Some(corpus1), indexTable = Some(idx))) // stale corpus1
    }
    assert(e.getMessage.contains("missing from --corpus"))
  }

  test("DedupJob sourcemirror mode writes mirror pairs, exact and sketch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-srcm").toString
    Seq(
      ("a", "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
      ("a", "kilo lima mike november oscar papa quebec romeo sierra tango"),
      ("mirror_a", "alpha bravo charlie delta echo foxtrot golf hotel " +
        "india juliett kilo lima mike november oscar papa quebec romeo sierra tango"),
      ("b", "tango sierra romeo quebec papa oscar november mike lima kilo")
    ).toDF("source", "text").write.parquet(s"$tmp/docs")
    Seq("false", "true").foreach { sk =>
      val m = graft.app.DedupJob.run(spark, graft.app.DedupJob.Args(
        input = s"$tmp/docs", output = s"$tmp/out-$sk",
        mode = "sourcemirror", sketch = sk.toBoolean))
      assert(m("pairs") == 1L, s"sketch=$sk: $m")
      val p = spark.read.parquet(s"$tmp/out-$sk/pairs").collect()(0)
      assert(p.getString(0) == "a" && p.getString(1) == "mirror_a")
    }
  }

  test("sourceMirrors: a re-chunked mirror domain pairs; unrelated do not; " +
       "sketch tier equals the exact tier") {
    // mirror_a re-hosts source a's CONTENT but re-chunks it: the two docs
    // are split differently, so no doc-level near-dup pair exists — yet
    // the domain gram unions match. b shares vocabulary only.
    val rows = Seq(
      ("a", "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
      ("a", "kilo lima mike november oscar papa quebec romeo sierra tango"),
      ("mirror_a", "alpha bravo charlie delta echo foxtrot golf hotel " +
        "india juliett kilo lima mike november oscar papa quebec romeo sierra tango"),
      ("b", "tango sierra romeo quebec papa oscar november mike lima kilo"),
      ("b", "juliett india hotel golf foxtrot echo delta charlie bravo alpha")
    ).toDF("source", "text")
    val exact = Dedup.sourceMirrors(rows, "source", "text",
      n = 3, minJaccard = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(exact.map(p => (p._1, p._2)).toSet == Set(("a", "mirror_a")),
      s"exact pairs: ${exact.mkString(", ")}")
    // re-chunking splices one boundary trigram pair into the mirror
    // ("sierra tango" ~ "juliett kilo" junction) — jaccard stays near 1
    assert(exact.head._3 > 0.85 && exact.head._3 <= 1.0)
    // doc-level near-dup sees NOTHING here (the re-chunk defeats it)
    val withIds = rows.withColumn("id", monotonically_increasing_id())
    assert(Dedup.nearDupPairs(withIds, "id", "text", minJaccard = 0.5)
      .count() == 0)

    // the sketch tier (union-minhash banding + exact verify on candidates)
    // returns the same rows at recall-safe params
    val sk = Dedup.sourceMirrorsSketch(rows, "source", "text",
      n = 3, minJaccard = 0.5, numHashes = 128, rowsPerBand = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(sk.toSet == exact.toSet, s"sketch ${sk.mkString(",")} vs " +
      s"exact ${exact.mkString(",")}")
  }

  test("keepersByScore: best copy wins, ties break to smallest id") {
    val labels = Seq((1L, 1L), (5L, 1L), (9L, 1L), (20L, 20L), (21L, 20L))
      .toDF("id", "comp")
    val scores = Seq((1L, 10), (5L, 30), (9L, 30), (20L, 7), (21L, 7))
      .toDF("doc_id", "q")
    val out = graft.pipeline.Dedup.keepersByScore(labels, scores, "doc_id", "q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).sortBy(_._1)
    // cluster 1: 5 and 9 tie at 30 → 5 wins (not min-id 1, not max-id 9)
    // cluster 20: tie at 7 → min id 20
    assert(out.toSeq == Seq((1L, 5L, 30, 3L), (20L, 20L, 7, 2L)),
      s"got ${out.mkString(",")}")
  }

  test("psiDrift: identical populations score 0, planted shift scores high") {
    val ref = (1 to 100).map(i => i % 50).toDF("v")
    // same distribution → every bucket's psi is exactly 0
    val same = graft.pipeline.TextProfile.psiDrift(ref, ref,
        col("v").cast("double"), bucketWidth = 10.0, nBuckets = 5)
      .collect()
    assert(same.length == 5)
    assert(same.forall(r => r.getDouble(5) == 0.0),
      s"got ${same.map(_.getDouble(5)).mkString(",")}")
    assert(same.forall(r => r.getLong(1) == 20L && r.getLong(2) == 20L))
    // cur collapsed into the low buckets → large positive index; the
    // emptied high buckets hit the eps clamp, not a NaN/-Inf
    val cur = (1 to 100).map(i => i % 10).toDF("v")
    val drift = graft.pipeline.TextProfile.psiDrift(ref, cur,
        col("v").cast("double"), bucketWidth = 10.0, nBuckets = 5)
      .collect().sortBy(_.getLong(0))
    val idx = drift.map(_.getDouble(5)).sum
    assert(idx > 0.25, s"index $idx") // "shifted" on the standard lights
    assert(drift.forall(r => !r.getDouble(5).isNaN &&
      !r.getDouble(5).isInfinite))
    // ref-only buckets present with n_cur = 0
    assert(drift.count(_.getLong(2) == 0L) == 4, drift.mkString(";"))
  }
}
