package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.fixture.{ClipGen, GenMain}
import graft.model.Presets
import graft.pipeline.FilterPipeline
import graft.streaming.StreamingFilter
import graft.text.TextModel

/** Streaming mode produces the same decisions as batch over the same files. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streaming decisions match batch decisions row for row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-in").toString
    val params = ClipGen.Params(120, seed = 21, maxDurMs = 1500)
    GenMain.generate(spark, dir, params, files = 4)

    val model = spark.sparkContext.broadcast(TextModel.default)
    val stream = StreamingFilter.decisions(spark, dir, Presets.default, model)
    assert(stream.isStreaming)

    val q = stream.writeStream
      .format("memory").queryName("stream_out")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stream-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_out")
      .select("clip_id", "keep", "scrubbed_transcript")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet

    val batch = FilterPipeline.decisions(
        spark.range(120).map(i => ClipGen.row(i, params)), Presets.default, model)
      .select("clip_id", "keep", "scrubbed_transcript")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet

    assert(streamed.size == 120)
    assert(streamed == batch)
  }

  test("streaming exact dedup keeps one row per distinct transcript, bounded state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-dd").toString
    val params = ClipGen.Params(60, seed = 33, maxDurMs = 1200)
    GenMain.generate(spark, dir, params, files = 2)

    val model = spark.sparkContext.broadcast(TextModel.default)
    val deduped = StreamingFilter.dedupByTranscript(
      StreamingFilter.decisions(spark, dir, Presets.default, model))
    assert(deduped.isStreaming)

    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stream-dd-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("stream_dedup")
      .select("clip_id", "scrubbed_transcript").collect()
    val texts = rows.map(_.getString(1))
    assert(texts.distinct.length == texts.length,
      "no transcript may appear twice after the dedup stage")
    // the fixture plants duplicate transcripts across clips → dedup must
    // actually have removed rows, and every distinct transcript survives
    val batchTexts = FilterPipeline.decisions(
        spark.range(60).map(i => ClipGen.row(i, params)), Presets.default, model)
      .select("scrubbed_transcript").collect().map(_.getString(0))
    assert(rows.length == batchTexts.distinct.length,
      s"one survivor per distinct transcript (${rows.length} vs ${batchTexts.distinct.length})")
    assert(rows.length < 60, "fixture contains duplicate transcripts to drop")
  }

  test("streaming near-dup sketch suppresses planted near-duplicates") {
    import spark.implicits._
    import graft.functions.TextSim
    // fully disjoint vocabularies per doc — shared filler words would pull
    // the simhashes together and collide band keys between distinct docs
    val base = (0 until 12).map { i =>
      (0 until 24).map(k => s"w${i}x$k").mkString(" ")
    }
    // planted near-dups of base(0): punctuation/casing edits are token-
    // SimHash-invariant (Hamming 0 — structurally suppressed at any
    // banding); a small word edit must sit within the pigeonhole radius,
    // found by a deterministic search and asserted as a precondition so
    // the test can never pass vacuously
    val punctVariant = base(0).toUpperCase + "!!!"
    assert(TextSim.hamming64(TextSim.simhash64(base(0)),
      TextSim.simhash64(punctVariant)) == 0)
    val editVariant = (0 until 100).iterator
      .map(k => base(0) + s" extra$k")
      .find(v => TextSim.hamming64(TextSim.simhash64(base(0)),
        TextSim.simhash64(v)) <= 3)
      .getOrElse(fail("precondition: no 1-word edit within hamming 3"))
    // precondition for survivors: pairwise-distinct band keys among base
    def bands(t: String): Set[(Int, Long)] = {
      val sh = TextSim.simhash64(t)
      (0 until 4).map(b => b -> ((sh >>> (b * 16)) & 0xFFFFL)).toSet
    }
    for (i <- base.indices; j <- base.indices if i < j)
      assert(bands(base(i)).intersect(bands(base(j))).isEmpty,
        s"fixture docs $i,$j must not share a band")

    val dir = Files.createTempDirectory("graft-stream-nd").toString
    // originals first (file 0), variants after (file 1): AvailableNow
    // processes files in discovery order within one query
    base.zipWithIndex.map { case (t, i) => (s"c$i", t) }
      .toDF("clip_id", "scrubbed_transcript")
      .coalesce(1).write.parquet(s"$dir/batch=0")
    Seq(("v_punct", punctVariant), ("v_edit", editVariant),
        ("c0_exact", base(0)))
      .toDF("clip_id", "scrubbed_transcript")
      .coalesce(1).write.parquet(s"$dir/batch=1")

    val in = spark.readStream
      .schema("clip_id STRING, scrubbed_transcript STRING")
      // one file per micro-batch: within a single batch dropDuplicates
      // keeps an arbitrary row per key, so originals-before-variants must
      // be enforced by trigger, not hoped from file listing order
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/batch=*")
    val out = StreamingFilter.dedupNearBySimhash(in)
    assert(out.isStreaming)
    val q = out.writeStream
      .format("memory").queryName("stream_neardup")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stream-nd-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("stream_neardup")
      .select("clip_id").collect().map(_.getString(0)).toSet
    assert((0 until 12).forall(i => kept.contains(s"c$i")),
      s"all distinct originals survive, got $kept")
    assert(!kept.contains("v_punct") && !kept.contains("v_edit") &&
      !kept.contains("c0_exact"),
      s"planted near-dups must be suppressed, got $kept")
  }

  test("streaming audio near-dup suppresses a re-encoded half-gain copy") {
    import spark.implicits._
    import graft.codec.Codecs
    import graft.rules.Heuristics.audioFingerprint
    // originals at lengths 8000·1.1^i: consecutive lengths sit ≥ 2
    // log-duration buckets apart (ln 1.1 / ln 1.04 ≈ 2.4), so distinct
    // recordings can never be conflated by the duration-bucketed bands
    // regardless of fingerprint — the fixture's shared envelope shapes
    // stay apart by construction
    def synth(seed: Int, n: Int): Array[Float] =
      Array.tabulate(n) { i =>
        val env = 0.15 + 0.85 * math.abs(
          math.sin(2 * math.Pi * i / (400.0 + (seed % 9) * 230.0)) *
            math.cos(2 * math.Pi * i / (900.0 + (seed % 5) * 170.0)))
        (env * 0.6 * math.sin(2 * math.Pi * 440 * i / 16000.0)).toFloat
      }
    val originals = (0 until 8).map { i =>
      val p = synth(i + 1, (8000 * math.pow(1.1, i)).toInt)
      (s"a$i", p.length, audioFingerprint(p), p)
    }
    // µ-law re-encode at half gain: same length, small fingerprint distance
    val p0 = originals(0)._4
    val shorts = p0.map(x => (math.max(-1f, math.min(1f, x * 0.5f)) * 32767f).toShort)
    val reenc = Codecs.decodeUlaw(Codecs.encodeUlaw(shorts))
    val vFp = audioFingerprint(reenc)
    val ham = java.lang.Long.bitCount(originals(0)._3 ^ vFp)
    assert(ham <= 3, s"precondition: re-encode within the pigeonhole radius, got $ham")

    val dir = Files.createTempDirectory("graft-stream-afp").toString
    originals.map { case (id, n, fp, _) => (id, n, fp) }
      .toDF("clip_id", "n_samples", "audio_fp")
      .coalesce(1).write.parquet(s"$dir/batch=0")
    Seq(("v_reenc", reenc.length, vFp),            // near-dup of a0 → dropped
        ("a3_copy", originals(3)._2, originals(3)._3), // exact copy → dropped
        ("bad1", 0, 0L), ("bad2", 0, 0L))          // undecodable → pass through
      .toDF("clip_id", "n_samples", "audio_fp")
      .coalesce(1).write.parquet(s"$dir/batch=1")

    val in = spark.readStream
      .schema("clip_id STRING, n_samples INT, audio_fp BIGINT")
      // one file per micro-batch: the originals' file (earlier mtime) must
      // register its keys before the variants' file arrives — in a single
      // batch dropDuplicates keeps an arbitrary row per key
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/batch=*")
    val out = StreamingFilter.dedupNearByAudioFp(in)
    assert(out.isStreaming)
    val q = out.writeStream
      .format("memory").queryName("stream_audiodup")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stream-afp-ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("stream_audiodup")
      .select("clip_id").collect().map(_.getString(0)).toSet
    assert((0 until 8).forall(i => kept.contains(s"a$i")),
      s"all distinct recordings survive, got $kept")
    assert(!kept.contains("v_reenc") && !kept.contains("a3_copy"),
      s"re-encode and exact copy must be suppressed, got $kept")
    assert(kept.contains("bad1") && kept.contains("bad2"),
      s"undecodable rows pass through untouched, got $kept")
  }

  test("windowed decision counts stream aggregates with a watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-in2").toString
    GenMain.generate(spark, dir, ClipGen.Params(60, seed = 22, maxDurMs = 1200), files = 2)
    val model = spark.sparkContext.broadcast(TextModel.default)
    val counts = StreamingFilter.decisionCounts(
      StreamingFilter.decisions(spark, dir, Presets.default, model))
    val q = counts.writeStream
      .format("memory").queryName("stream_counts")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft-stream-ckpt2").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val n = spark.table("stream_counts").agg(sum("n")).collect()(0).getLong(0)
    assert(n == 60, s"windowed counts covered $n of 60 rows")
  }

  test("streaming sink commits micro-batches as snapshot-table chunks, " +
       "exactly-once under batch replay") {
    import graft.table.SnapshotTable
    val dir = Files.createTempDirectory("graft-sink-in").toString
    GenMain.generate(spark, dir,
      ClipGen.Params(60, seed = 23, maxDurMs = 1500), files = 3)
    val model = spark.sparkContext.broadcast(TextModel.default)
    val table = Files.createTempDirectory("graft-sink-out").toString + "/t"

    val q = StreamingFilter.sinkToSnapshotTable(
      StreamingFilter.decisions(spark, dir, Presets.default, model)
        .drop("drop_reasons"), // flat columns for the table schema DDL
      table,
      Files.createTempDirectory("graft-sink-ckpt").toString,
      partitionCols = Seq("keep"))
    q.processAllAvailable()
    q.stop()

    val snap = SnapshotTable.currentSnapshot(table).get
    assert(snap.counters("rows") == 60L, snap.counters.toString)
    assert(snap.committedChunks.nonEmpty)
    val read = SnapshotTable.readAligned(spark, table)
    assert(read.count() == 60)
    // batch semantics preserved through the stream + snapshot round-trip
    val batchKeep = FilterPipeline.decisions(
        spark.read.schema(graft.app.FilterJob.clipSchema).parquet(dir)
          .na.fill(Map("transcript" -> "")).as[graft.model.ClipRow](
            org.apache.spark.sql.Encoders.product[graft.model.ClipRow]),
        Presets.default, model)
      .select("clip_id", "keep").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSet
    val sunk = read.select("clip_id", "keep").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(sunk == batchKeep)

    // crash/replay idempotence: re-committing an ALREADY-COMMITTED batchId
    // (what Structured Streaming does after a failover) changes nothing,
    // even with different data in the replayed frame
    val chunk0 = snap.committedChunks.min
    val before = read.collect().map(_.toString).sorted
    StreamingFilter.commitBatch(
      read.limit(3).toDF(), chunk0.toLong, table, Seq("keep"))
    assert(SnapshotTable.currentSnapshot(table).get.id == snap.id,
      "replayed batch must not commit a new snapshot")
    assert(SnapshotTable.readAligned(spark, table)
      .collect().map(_.toString).sorted.sameElements(before))

    // a partially-written uncommitted chunk from a mid-batch crash is
    // swept and rewritten when the batch replays under its original id
    val orphanId = snap.committedChunks.max + 7
    val orphanDir = java.nio.file.Paths.get(
      SnapshotTable.chunkDir(table, orphanId))
    Files.createDirectories(orphanDir)
    Files.writeString(orphanDir.resolve("part-junk.parquet"), "junk")
    StreamingFilter.commitBatch(
      SnapshotTable.readAligned(spark, table).limit(5).toDF(),
      orphanId.toLong, table, Seq("keep"))
    val after = SnapshotTable.currentSnapshot(table).get
    assert(after.committedChunks.contains(orphanId))
    assert(!Files.exists(orphanDir.resolve("part-junk.parquet")))
    assert(SnapshotTable.readAligned(spark, table).count() == 65)
  }

  test("streaming snippet alerts: known jingle flagged at ingest, " +
       "clean clips silent, replay rewrites") {
    import spark.implicits._
    import graft.codec.Codecs
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
    val cols = Seq("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val dir = Files.createTempDirectory("graft-snip-in").toString
    Seq(mk("carrier", tone(400, 900.0) ++ j, "ulaw8"), // µ-law re-encode
        mk("clean", tone(1600, 440.0), "pcm_s16le"))
      .toDF(cols: _*).coalesce(1).write.mode("overwrite").parquet(dir)
    val snippets = Seq(mk("banned_jingle", j, "pcm_s16le")).toDF(cols: _*)
    val out = Files.createTempDirectory("graft-snip-out").toString

    val in = spark.readStream
      .schema(graft.app.FilterJob.clipSchema).parquet(dir)
    val q = StreamingFilter.snippetAlertSink(in, snippets, out,
      Files.createTempDirectory("graft-snip-ckpt").toString,
      windowMs = 200, hopMs = 200, minCoverage = 0.9)
    q.processAllAvailable()
    q.stop()

    val alerts = spark.read.option("basePath", out).parquet(out)
    val rows = alerts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4))).toSet
    // the µ-law carrier trips the alert at full coverage; clean is silent
    assert(rows.map(t => (t._1, t._2)) == Set(("carrier", "banned_jingle")),
      s"got $rows")
    assert(rows.forall(_._3 >= 0.9))

    // replay with different data rewrites the partition, never appends
    val b0 = alerts.select("batch_id").distinct()
      .collect().map(_.getAs[Number](0).longValue()).min
    StreamingFilter.snippetAlertBatch(
      Seq(mk("clean2", tone(800, 300.0), "pcm_s16le")).toDF(cols: _*),
      b0, snippets, out, 200, 200, 0.9)
    assert(spark.read.option("basePath", out).parquet(out).count() == 0,
      "replayed alert partition must be rewritten, not appended")
  }

  test("streaming drift monitor: per-batch PSI vs a static reference, " +
       "idempotent under replay") {
    val dir = Files.createTempDirectory("graft-drift-in").toString
    GenMain.generate(spark, dir,
      ClipGen.Params(60, seed = 29, maxDurMs = 1500), files = 3)
    val model = spark.sparkContext.broadcast(TextModel.default)
    val ref = FilterPipeline.decisions(
      spark.read.schema(graft.app.FilterJob.clipSchema).parquet(dir)
        .na.fill(Map("transcript" -> "")).as[graft.model.ClipRow](
          org.apache.spark.sql.Encoders.product[graft.model.ClipRow]),
      Presets.default, model).select("clip_id", "n_samples").toDF()
    val out = Files.createTempDirectory("graft-drift-out").toString

    val q = StreamingFilter.driftSink(
      StreamingFilter.decisions(spark, dir, Presets.default, model)
        .select("clip_id", "n_samples"),
      ref, col("n_samples").cast("double"), bucketWidth = 4000.0, nBuckets = 6,
      outDir = out,
      checkpoint = Files.createTempDirectory("graft-drift-ckpt").toString)
    q.processAllAvailable()
    q.stop()

    // the stream carries the SAME population as the reference → every
    // batch's index reads stable (the per-batch split only thins counts)
    val rows = spark.read.option("basePath", out).parquet(out)
    assert(rows.count() > 0)
    val perBatch = rows.groupBy("batch_id")
      .agg(org.apache.spark.sql.functions.sum("psi").as("idx"),
        org.apache.spark.sql.functions.sum("n_ref").as("nr"))
      .collect()
    perBatch.foreach { r =>
      val idx = r.getDouble(1)
      assert(!idx.isNaN && idx < 0.25, s"batch ${r.get(0)} index $idx")
      assert(r.getLong(2) == 60L, "reference population on every row set")
    }

    // replaying a committed batchId with DIFFERENT data rewrites its
    // partition (no duplicate monitor rows accumulate)
    val b0 = rows.select("batch_id").distinct()
      .collect().map(_.getAs[Number](0).longValue()).min
    val nBefore = rows.count()
    StreamingFilter.driftBatch(ref.limit(10).toDF(), b0, ref,
      col("n_samples").cast("double"), 4000.0, 6, out)
    val again = spark.read.option("basePath", out).parquet(out)
    assert(again.filter(col("batch_id") === b0).count() <= 6)
    assert(again.count() <= nBefore)
    // empty batch writes nothing (no spurious partition)
    StreamingFilter.driftBatch(ref.limit(0).toDF(), 999L, ref,
      col("n_samples").cast("double"), 4000.0, 6, out)
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/batch_id=999")))
  }
}
