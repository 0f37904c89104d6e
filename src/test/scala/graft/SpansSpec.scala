package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Spans

class SpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("split: blank-line paragraphs, trimmed, empties dropped, idx stable") {
    val df = Seq(
      (1L, "para one here\n\n  para two  \n\n\n\npara three"),
      (2L, "single paragraph only")
    ).toDF("doc_id", "text")
    val out = Spans.split(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 0L, "para one here"), (1L, 1L, "para two"),
      (1L, 2L, "para three"), (2L, 0L, "single paragraph only")), s"got $out")
  }

  test("wordChunks: fixed windows, short tail, exact boundaries") {
    val df = Seq(
      (1L, "a b c d e f g"),   // 7 words, chunk 3 → "a b c","d e f","g"
      (2L, "x y z")            // exactly one chunk
    ).toDF("doc_id", "text")
    val out = Spans.wordChunks(df, "doc_id", "text", chunkWords = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 0L, "a b c"), (1L, 1L, "d e f"), (1L, 2L, "g"),
      (2L, 0L, "x y z")), s"got $out")
  }

  test("dedup: cross-doc repeated span elects min-(id,idx) keeper; mask emits") {
    // the shared license paragraph appears in all three docs; doc 3 also
    // repeats a span INSIDE itself (intra-doc dup)
    val df = Seq(
      (1L, "license text\n\nunique alpha"),
      (2L, "unique beta\n\nlicense text"),
      (3L, "license text\n\ngamma body\n\ngamma body")
    ).toDF("doc_id", "text")
    val d = Spans.dedup(Spans.split(df, "doc_id", "text"))
    val rows = d.collect().map(r => ((r.getLong(0), r.getLong(1)),
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    // license: keeper (1,0), 3 copies
    assert(rows((1L, 0L)) == (1L, 0L, 3L, false))
    assert(rows((2L, 1L)) == (1L, 0L, 3L, true))
    assert(rows((3L, 0L)) == (1L, 0L, 3L, true))
    // intra-doc: keeper (3,1), copy (3,2)
    assert(rows((3L, 1L)) == (3L, 1L, 2L, false))
    assert(rows((3L, 2L)) == (3L, 1L, 2L, true))
    // uniques are their own keepers
    assert(rows((1L, 1L)) == (1L, 1L, 1L, false))

    val m = Spans.dupMask(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(m(1L) == (2L, 0L, "00"), s"got ${m(1L)}")
    assert(m(2L) == (2L, 1L, "01"), s"got ${m(2L)}")
    assert(m(3L) == (3L, 2L, "101"), s"got ${m(3L)}")
  }

  test("removeDups reassembles cleaned docs; pure-boilerplate docs vanish") {
    val df = Seq(
      (1L, "license text\n\nunique alpha"),
      (2L, "unique beta\n\nlicense text"),
      (3L, "license text")                  // entirely duplicate → vanishes
    ).toDF("doc_id", "text")
    val cleaned = Spans.removeDups(Spans.split(df, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned == Map(
      1L -> "license text unique alpha",    // keeper copy stays in place
      2L -> "unique beta"), s"got $cleaned")
  }

  test("cdcChunks: partition property, and an insertion re-syncs where " +
       "fixed windows shift everything") {
    val words = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, words),
      (2L, "inserted " + words)) // one-token insertion at the front
    .toDF("doc_id", "text")
    val chunks = Spans.cdcChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // partition property: chunks reassemble to the exact token sequence
    for (id <- Seq(1L, 2L)) {
      val re = chunks.filter(_._1 == id).sortBy(_._2).map(_._3).mkString(" ")
      val want = if (id == 1L) words else "inserted " + words
      assert(re == want, s"doc $id reassembly")
      // span_idx is contiguous from 0
      val idxs = chunks.filter(_._1 == id).map(_._2).sorted
      assert(idxs.sameElements(idxs.indices.map(_.toLong)), s"doc $id idxs")
    }
    // re-sync: the two docs share most chunk TEXTS despite the shift
    val s1 = chunks.filter(_._1 == 1L).map(_._3).toSet
    val s2 = chunks.filter(_._1 == 2L).map(_._3).toSet
    val shared = s1.intersect(s2).size
    assert(shared >= math.min(s1.size, s2.size) - 3,
      s"CDC should re-sync after the insertion: $shared shared of " +
        s"${s1.size}/${s2.size}")
    // the fixed-window chunking shares NOTHING on the same input — the
    // failure mode CDC exists to fix
    val fixed = Spans.wordChunks(docs, "doc_id", "text", chunkWords = 10)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val f1 = fixed.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fixed.filter(_._1 == 2L).map(_._2).toSet
    assert(f1.intersect(f2).isEmpty,
      "fixed windows unexpectedly survived the shift")
  }

  test("removeBoilerplate drops wide-DF spans everywhere; dedup would keep one") {
    val df = Seq(
      (1L, "cookie banner text\n\nreal content one"),
      (2L, "cookie banner text\n\nreal content two"),
      (3L, "cookie banner text\n\nreal content three"),
      (4L, "cookie banner text"),                    // pure boilerplate
      (5L, "narrow dup\n\nbody five"),
      (6L, "narrow dup\n\nbody six"))                // df 2 < minDf 3 → kept
    .toDF("doc_id", "text")
    val spans = Spans.split(df, "doc_id", "text")
    val out = Spans.removeBoilerplate(spans, minDf = 3, joinWith = "\n\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the banner is gone from EVERY doc — no keeper survives (vs dedup)
    assert(out == Map(1L -> "real content one", 2L -> "real content two",
      3L -> "real content three", 5L -> "narrow dup\n\nbody five",
      6L -> "narrow dup\n\nbody six"), s"got $out")
    // a doc repeating its own span does NOT self-promote to boilerplate
    val selfRep = Seq((1L, "hdr\n\nhdr\n\nhdr\n\nbody")).toDF("doc_id", "text")
    val kept = Spans.removeBoilerplate(Spans.split(selfRep, "doc_id", "text"),
        minDf = 3, joinWith = "\n\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == "hdr\n\nhdr\n\nhdr\n\nbody", s"got $kept")
  }

  test("DedupJob spans mode writes verdicts, masks and cleaned docs") {
    val in = java.nio.file.Files.createTempDirectory("graft_djs_in").toString
    Seq((1L, "shared paragraph here\n\nalpha body"),
        (2L, "beta body\n\nshared paragraph here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = java.nio.file.Files.createTempDirectory("graft_djs_out").toString
    val m = graft.app.DedupJob.run(spark,
      graft.app.DedupJob.Args(in, out, mode = "spans"))
    assert(m("span_verdicts") == 4L && m("span_masks") == 2L &&
      m("cleaned") == 2L, s"$m")
    val cleaned = spark.read.parquet(s"$out/cleaned")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(2L) == "beta body", s"got $cleaned")
  }

  test("dedup shuffles hashes, not span text (scale contract)") {
    // every exchange's input schema must be free of the span column: only
    // (id, span_idx, 32-char md5) rows travel
    val df = Seq((1L, "aaa bbb\n\nccc ddd")).toDF("doc_id", "text")
    // AQE off for a deterministic static plan with materialized exchanges
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val shuffles = Spans.dedup(Spans.split(df, "doc_id", "text"))
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
      assert(shuffles.nonEmpty, "expected at least one exchange")
      shuffles.foreach { e =>
        assert(!e.child.output.map(_.name).contains("span"),
          s"span text crosses an exchange: ${e.child.output.map(_.name)}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
