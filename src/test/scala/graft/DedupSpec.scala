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

  test("cosine_sim is available from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s").collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    val r2 = spark.sql(
      "SELECT cosine_sim(array(1.0d, 1.0d), array(1.0d, 0.0d)) AS s").collect()
    assert(math.abs(r2(0).getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("embedding LSH near-dup pairs are a subset of brute-force pairs") {
    val rng = new graft.fixture.Prng(5)
    val vecs = (0 until 60).map { i =>
      val base = Array.fill(16)(rng.nextGaussian())
      (i.toLong, base.map(_.toFloat))
    }
    // plant 5 near-dups of vectors 0..4
    val planted = (0 until 5).map { i =>
      (100L + i, vecs(i)._2.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    }
    val df = (vecs ++ planted).toDF("vec_id", "embedding")
    val brute = Dedup.embNearDup(df, "vec_id", "embedding", minSim = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embNearDupLsh(df, "vec_id", "embedding", dim = 16,
      minSim = 0.95, planes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 5, s"expected planted pairs, got $brute")
    assert(lsh.subsetOf(brute))
    // near-identical vectors share every hyperplane side → LSH must find them
    assert((0 until 5).forall(i => lsh.contains((i.toLong, 100L + i))))
  }
}
