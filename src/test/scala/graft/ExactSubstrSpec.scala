package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.ExactSubstr

class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // doc 1 and doc 2 share an exact 4-token run ("p q r s") embedded in
  // otherwise-distinct text; doc 3 is unrelated; doc 4 repeats the run
  // INSIDE itself twice
  private def corpus = Seq(
    (1L, "a b p q r s c d"),
    (2L, "e f p q r s g h"),
    (3L, "t u v w x y z zz"),
    (4L, "p q r s m n p q r s")
  ).toDF("doc_id", "text")

  test("windows: k-grams at 1-based starts, short docs contribute none") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val out = ExactSubstr.windows(df, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (1L, 2L)), s"got $out")
  }

  test("keepOne: canonical min-(id,pos) copy survives, every other masked") {
    val m = ExactSubstr.mask(corpus, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // doc 1 holds the canonical "p q r s" (smallest id) → nothing removed
    assert(m(1L) == "00000000", s"doc1 ${m(1L)}")
    // doc 2's copy is masked: positions 3..6
    assert(m(2L) == "00111100", s"doc2 ${m(2L)}")
    // doc 3 shares nothing
    assert(m(3L) == "00000000", s"doc3 ${m(3L)}")
    // doc 4: both its occurrences are non-canonical → 1..4 and 7..10
    // masked, the bridge "m n" kept
    assert(m(4L) == "1111001111", s"doc4 ${m(4L)}")
  }

  test("clean reassembles survivors; keepOne=false masks the canonical too") {
    val c = ExactSubstr.clean(corpus, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c(1L) == "a b p q r s c d")
    assert(c(2L) == "e f g h")
    assert(c(4L) == "m n")
    val all = ExactSubstr.mask(corpus, "doc_id", "text", k = 4,
        keepOne = false)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(all(1L) == "00111100", s"doc1 all ${all(1L)}")
    assert(all(2L) == "00111100", s"doc2 all ${all(2L)}")
  }

  test("all-duplicate document vanishes from clean output") {
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e")
    ).toDF("doc_id", "text")
    val c = ExactSubstr.clean(df, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(c == Map(1L -> "a b c d e"), s"got $c")
  }

  test("overlapping dup windows coalesce into one covered run") {
    // shared 5-token run with k=4 → two overlapping dup windows in doc 2;
    // coverage must be the union 1..5, not double-counted or gapped
    val df = Seq(
      (1L, "p q r s t x1 y1"),
      (2L, "p q r s t x2 y2")
    ).toDF("doc_id", "text")
    val m = ExactSubstr.mask(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m(1L) == "0000000", s"doc1 ${m(1L)}")
    assert(m(2L) == "1111100", s"doc2 ${m(2L)}")
  }

  test("incremental: corpus hits cut every batch copy, intra-batch dups " +
       "keep one, novel text untouched") {
    val corpus = Seq((1L, "p q r s t u v w x y")).toDF("doc_id", "text")
    val idx = ExactSubstr.windowIndex(corpus, "doc_id", "text", k = 4)
    val batch = Seq(
      (10L, "a1 b1 p q r s c1 d1"),    // corpus 4-run → cut (no keeper!)
      (11L, "m n o zz m n o qq"),      // novel text, no 4-dup → untouched
      (12L, "e2 f2 g2 h2 i2 j2"),      // batch-dup of 13 → keeper (min id)
      (13L, "e2 f2 g2 h2 i2 j2"))      // → fully cut
      .toDF("doc_id", "text")
    val out = ExactSubstr.cleanIncremental(batch, "doc_id", "text", 4, idx)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "a1 b1 c1 d1", s"got ${out.get(10L)}")
    assert(out(11L) == "m n o zz m n o qq", s"got ${out.get(11L)}")
    assert(out(12L) == "e2 f2 g2 h2 i2 j2", s"got ${out.get(12L)}")
    assert(!out.contains(13L), s"batch dup must vanish: ${out.get(13L)}")
  }

  test("windowIndex grows across snapshot-table chunks; cleanIncremental " +
       "reads the committed index") {
    import graft.table.SnapshotTable
    val table = java.nio.file.Files
      .createTempDirectory("graft_es_idx").toString + "/t"
    SnapshotTable.open(table, 0)
    // day 1 corpus commits its window hashes as chunk 0
    val day1 = Seq((1L, "p q r s t u v w")).toDF("doc_id", "text")
    ExactSubstr.windowIndex(day1, "doc_id", "text", k = 4)
      .write.parquet(SnapshotTable.chunkDir(table, 0))
    SnapshotTable.commitChunk(table, 0, 0, Map.empty)
    def index() = spark.read
      .option("basePath", java.nio.file.Paths.get(table, "data").toString)
      .parquet(SnapshotTable.committedDataDirs(table): _*)
      .select("win_hash")
    // a batch copying day-1 content is cut against the committed index
    val batch = Seq((10L, "x1 y1 p q r s z1 w1"),
        (11L, "e f g h i j k l")).toDF("doc_id", "text")
    val out1 = ExactSubstr.cleanIncremental(batch, "doc_id", "text", 4, index())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out1(10L) == "x1 y1 z1 w1" && out1(11L) == "e f g h i j k l",
      s"got $out1")
    // day 2 (e.g. yesterday's surviving batch) appends as the next chunk;
    // the grown index now also cuts day-2 content — no rebuild, no rescan
    ExactSubstr.windowIndex(
        Seq((2L, "e f g h i j k l")).toDF("doc_id", "text"),
        "doc_id", "text", k = 4)
      .write.parquet(SnapshotTable.chunkDir(table, 1))
    SnapshotTable.commitChunk(table, 1, 0, Map.empty)
    val out2 = ExactSubstr.cleanIncremental(batch, "doc_id", "text", 4, index())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(10L) == "x1 y1 z1 w1" && !out2.contains(11L), s"got $out2")
  }

  test("DedupJob substr mode writes per-token masks and cleaned docs") {
    val in = java.nio.file.Files.createTempDirectory("graft_djx_in").toString
    corpus.write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_djx_out").toString
    val m = graft.app.DedupJob.run(spark,
      graft.app.DedupJob.Args(in, out, mode = "substr", chunkWords = 4))
    assert(m("masks") == 4L && m("cleaned") == 4L, s"$m")
    val cleaned = spark.read.parquet(s"$out/cleaned")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(2L) == "e f g h" && cleaned(4L) == "m n", s"got $cleaned")
  }

  test("plan: only token-width rows shuffle — no document text in exchanges") {
    // the dedup aggregation sees (id, pos, md5) window rows only; the
    // coverage join/window shuffles (id, pos, tok) single-token rows —
    // document-width strings never cross an exchange.
    // AQE off for a deterministic static plan with materialized exchanges
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = ExactSubstr.mask(corpus, "doc_id", "text", k = 4)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      assert(shuffles.nonEmpty, "expected at least one exchange")
      shuffles.foreach { e =>
        assert(!e.child.output.map(_.name).contains("text"),
          s"document text crosses an exchange: ${e.child.output.map(_.name)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
