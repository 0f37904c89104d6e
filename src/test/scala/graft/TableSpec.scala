package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.app.FilterJob
import graft.fixture.{ClipGen, GenMain}
import graft.table.SnapshotTable

/** Snapshot-table semantics: atomic commit log, snapshot-pinned reads, and
  * the north-rule resume invariant — a killed job rerun produces a table
  * with identical content to an uninterrupted run. */
class TableSpec extends AnyFunSuite {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("snapshot json renders and parses round-trip") {
    val dir = tmpDir("graft-snap")
    SnapshotTable.open(dir, 4)
    val s1 = SnapshotTable.commitChunk(dir, 2, 4, Map("rows" -> 10L))
    assert(s1.id == 0 && s1.committedChunks == Set(2))
    val s2 = SnapshotTable.commitChunk(dir, 0, 4, Map("rows" -> 5L))
    assert(s2.id == 1 && s2.committedChunks == Set(0, 2))
    assert(s2.counters("rows") == 15L)
    val cur = SnapshotTable.currentSnapshot(dir).get
    assert(cur == s2)
    assert(!SnapshotTable.isComplete(dir))
  }

  test("open() deletes uncommitted chunk dirs, keeps committed ones") {
    val dir = tmpDir("graft-open")
    SnapshotTable.open(dir, 4)
    val committedDir = Paths.get(SnapshotTable.chunkDir(dir, 1))
    Files.createDirectories(committedDir)
    Files.writeString(committedDir.resolve("keep.txt"), "x")
    SnapshotTable.commitChunk(dir, 1, 4, Map.empty)
    val orphan = Paths.get(SnapshotTable.chunkDir(dir, 3))
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("junk.txt"), "y")
    val committed = SnapshotTable.open(dir, 4)
    assert(committed == Set(1))
    assert(Files.exists(committedDir.resolve("keep.txt")))
    assert(!Files.exists(orphan))
  }

  test("GATE: resume after kill yields identical committed table content") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in")
    // small fast fixture: 240 rows, short clips
    GenMain.generate(spark, input, ClipGen.Params(240, seed = 7, maxDurMs = 2000), files = 8)

    val outA = tmpDir("graft-outA") + "/t"
    val outB = tmpDir("graft-outB") + "/t"
    val args = (o: String) => FilterJob.JobArgs(input, o, chunks = 4, saltBuckets = 8)

    // uninterrupted run
    FilterJob.run(spark, args(outA))
    // interrupted run: complete, then roll back to snapshot 1 (chunks {0,1})
    // and plant garbage in a now-uncommitted chunk — the kill scenario
    FilterJob.run(spark, args(outB))
    val meta = Paths.get(outB, "metadata")
    Files.writeString(meta.resolve("current"), "v1.json")
    Seq("v2.json", "v3.json").foreach(v => Files.deleteIfExists(meta.resolve(v)))
    val junk = Paths.get(SnapshotTable.chunkDir(outB, 3), "keep=true", "lang=aa")
    Files.createDirectories(junk)
    Files.writeString(junk.resolve("part-corrupt.parquet"), "not parquet")
    FilterJob.run(spark, args(outB)) // resume

    assert(SnapshotTable.isComplete(outA) && SnapshotTable.isComplete(outB))
    val a = FilterJob.readDecisions(spark, outA)
      .drop("chunk").collect().map(_.toString).sorted
    val b = FilterJob.readDecisions(spark, outB)
      .drop("chunk").collect().map(_.toString).sorted
    assert(a.length == 240 && b.length == 240)
    assert(a.sameElements(b), "resumed table content differs from uninterrupted run")
    // every job commit records the decisions schema in snapshot metadata
    // (the Iceberg schema-tracking analog) and readAligned honors it
    val snapSchema = SnapshotTable.currentSnapshot(outA).flatMap(_.schema)
    assert(snapSchema.exists(_.contains("clip_id")),
      s"job snapshot must carry the decisions DDL, got $snapSchema")
    val aligned = SnapshotTable.readAligned(spark, outA)
    assert(aligned.columns.contains("clip_id") && aligned.count() == 240)
  }

  test("incremental scan between snapshots yields exactly the delta chunks") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in-inc")
    GenMain.generate(spark, input,
      ClipGen.Params(160, seed = 31, maxDurMs = 1200), files = 8)
    val out = tmpDir("graft-out-inc") + "/t"
    FilterJob.run(spark, FilterJob.JobArgs(input, out, chunks = 4,
      saltBuckets = 4, parallelChunks = 1))
    // snapshots v0..v3 committed chunks one at a time; a consumer that
    // checkpointed v1 must see exactly the chunks of v2 and v3
    val curId = SnapshotTable.currentSnapshot(out).get.id
    assert(curId == 3L, s"4 chunk commits → v0..v3, got v$curId")
    val full = FilterJob.readDecisions(spark, out)
    val upTo1 = SnapshotTable.snapshotAt(out, 1L).get.committedChunks
    val delta = FilterJob.readDecisionsSince(spark, out, afterId = 1L)
    val deltaChunks = delta.select("chunk").distinct()
      .collect().map(_.getInt(0)).toSet
    val wantChunks = SnapshotTable.currentSnapshot(out).get
      .committedChunks -- upTo1
    assert(deltaChunks == wantChunks, s"$deltaChunks vs $wantChunks")
    // delta rows ∪ v1 rows == full table, with no overlap
    val v1Rows = full.filter(col("chunk").isin(upTo1.toSeq: _*)).count()
    assert(v1Rows + delta.count() == full.count())
    // same-snapshot range and unchanged-table poll → typed empty frame
    val none = FilterJob.readDecisionsSince(spark, out, afterId = curId)
    assert(none.count() == 0
      && none.columns.sameElements(full.columns))
    // stale cursor pointing at a truncated log must fail loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.incrementalDataDirs(out, afterId = 99L)
    }
  }

  test("driftSince: PSI of the post-snapshot batch vs the pinned corpus") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in-drift")
    GenMain.generate(spark, input,
      ClipGen.Params(160, seed = 31, maxDurMs = 1200), files = 8)
    val out = tmpDir("graft-out-drift") + "/t"
    FilterJob.run(spark, FilterJob.JobArgs(input, out, chunks = 4,
      saltBuckets = 4, parallelChunks = 1))
    val drift = FilterJob.driftSince(spark, out, afterId = 1L,
      metric = col("dur_ms").cast("double"), bucketWidth = 200.0,
      nBuckets = 6).collect().sortBy(_.getLong(0))
    // populations reconcile with the snapshot algebra
    val full = FilterJob.readDecisions(spark, out)
    val upTo1 = SnapshotTable.snapshotAt(out, 1L).get.committedChunks
    val v1Rows = full.filter(col("chunk").isin(upTo1.toSeq: _*)).count()
    assert(drift.map(_.getLong(1)).sum == v1Rows)
    assert(drift.map(_.getLong(2)).sum == full.count() - v1Rows)
    // same generator distribution on both sides → a finite, stable index
    val idx = drift.map(_.getDouble(5)).sum
    assert(!idx.isNaN && !idx.isInfinite && idx >= 0.0 && idx < 0.25,
      s"index $idx: chunks of one generator read as shifted")
    // no delta after the current snapshot → loud, not an empty frame
    val curId = SnapshotTable.currentSnapshot(out).get.id
    val err = intercept[IllegalArgumentException] {
      FilterJob.driftSince(spark, out, afterId = curId,
        metric = col("dur_ms"), bucketWidth = 200.0, nBuckets = 6)
    }
    assert(err.getMessage.contains("nothing to audit"))
  }

  test("input listing is pinned to the committed snapshot (Iceberg-read semantic)") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in3")
    GenMain.generate(spark, input, ClipGen.Params(40, seed = 13, maxDurMs = 1200), files = 2)
    val out = tmpDir("graft-out3") + "/t"
    FilterJob.run(spark, FilterJob.JobArgs(input, out, chunks = 2, saltBuckets = 4))
    val pinned = FilterJob.listDataFiles(spark, out)
    // a file landing in an UNCOMMITTED chunk dir must be invisible
    val rogue = Paths.get(SnapshotTable.chunkDir(out, 9))
    Files.createDirectories(rogue)
    val src = Paths.get(pinned.head.stripPrefix("file:"))
    Files.copy(src, rogue.resolve("rogue.parquet"))
    val after = FilterJob.listDataFiles(spark, out)
    assert(after == pinned, "uncommitted data leaked into a pinned read")
    // a plain directory input lists everything
    assert(FilterJob.listDataFiles(spark, input).size == 2)
  }

  test("resume pins the input manifest: files added after the kill are invisible") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in4")
    GenMain.generate(spark, input, ClipGen.Params(80, seed = 21, maxDurMs = 1200), files = 4)
    val outA = tmpDir("graft-out4a") + "/t"
    val outB = tmpDir("graft-out4b") + "/t"
    val args = (o: String) => FilterJob.JobArgs(input, o, chunks = 2, saltBuckets = 4)
    FilterJob.run(spark, args(outA)) // ground truth over the original listing

    // interrupted run: roll back to the first snapshot (one committed chunk)
    FilterJob.run(spark, args(outB))
    val meta = Paths.get(outB, "metadata")
    Files.writeString(meta.resolve("current"), "v0.json")
    Files.deleteIfExists(meta.resolve("v1.json"))
    // a new parquet file lands in the input directory AFTER the kill; the
    // plain-directory listing would re-slice the round-robin chunks —
    // committed chunks keeping old slices, new chunks new ones (silent
    // dups/omissions). The pinned manifest makes it invisible.
    val extraDir = tmpDir("graft-extra")
    GenMain.generate(spark, extraDir, ClipGen.Params(20, seed = 99, maxDurMs = 1200), files = 1)
    val lateSrc = FilterJob.listDataFiles(spark, extraDir).head
    Files.copy(Paths.get(lateSrc.stripPrefix("file:")),
      Paths.get(input, "zz-late-arrival.parquet"))

    FilterJob.run(spark, args(outB)) // resume
    assert(SnapshotTable.isComplete(outB))
    val a = FilterJob.readDecisions(spark, outA)
      .drop("chunk").collect().map(_.toString).sorted
    val b = FilterJob.readDecisions(spark, outB)
      .drop("chunk").collect().map(_.toString).sorted
    assert(a.length == 80 && b.length == 80,
      s"late-arriving input leaked into the resumed run (${b.length} rows)")
    assert(a.sameElements(b))
    // a FRESH job over the same input does see the new file
    val outC = tmpDir("graft-out4c") + "/t"
    FilterJob.run(spark, args(outC))
    assert(FilterJob.readDecisions(spark, outC).count() == 100)
  }

  test("compaction rewrites small files, preserves the row multiset; expire drops old snapshots + retained files") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in-cmp")
    GenMain.generate(spark, input,
      ClipGen.Params(120, seed = 43, maxDurMs = 1200), files = 4)
    val out = tmpDir("graft-out-cmp") + "/t"
    FilterJob.run(spark, FilterJob.JobArgs(input, out, chunks = 2,
      saltBuckets = 8, parallelChunks = 1))
    val before = FilterJob.readDecisions(spark, out)
      .collect().map(_.toString).sorted

    // fragment chunk 0 into many small files (what thousands of salted
    // writer tasks produce at scale): same rows, round-robin over 6 tasks
    val c0 = SnapshotTable.chunkDir(out, 0)
    val frag = tmpDir("graft-frag")
    spark.read.option("basePath", c0).parquet(c0)
      .repartition(6).write.partitionBy("keep", "lang")
      .mode("overwrite").parquet(frag)
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().forEachRemaining(rmTree) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rmTree(Paths.get(c0))
    Files.move(Paths.get(frag), Paths.get(c0))
    val id0 = SnapshotTable.currentSnapshot(out).get.id

    val stats = SnapshotTable.compactChunk(spark, out, chunk = 0)
    assert(stats("files_after") < stats("files_before"),
      s"compaction must shrink the file count: $stats")
    // snapshot log records the rewrite; chunk set unchanged
    val cur = SnapshotTable.currentSnapshot(out).get
    assert(cur.id == id0 + 1 && cur.counters("compactions") == 1L)
    assert(cur.committedChunks == Set(0, 1))
    // row multiset byte-identical through the rewrite
    val after = FilterJob.readDecisions(spark, out)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after), "compaction changed table content")
    // pre-compaction files retained until expiration
    assert(Files.exists(Paths.get(out, "data", s".chunk=0.v$id0.old")))

    // resume still works over the compacted table: open() keeps both chunks
    assert(SnapshotTable.open(out, 2) == Set(0, 1))
    assert(FilterJob.readDecisions(spark, out).count() == before.length)

    // expire all but the latest snapshot: old v-files AND the retained
    // pre-compaction dir go away; current snapshot keeps reading fine
    val expired = SnapshotTable.expireSnapshots(out, keepLast = 1)
    assert(expired.nonEmpty && !expired.contains(cur.id))
    assert(!Files.exists(Paths.get(out, "metadata", s"v$id0.json")))
    assert(!Files.exists(Paths.get(out, "data", s".chunk=0.v$id0.old")))
    assert(FilterJob.readDecisions(spark, out)
      .collect().map(_.toString).sorted.sameElements(before))
    // a reader pinned to an expired snapshot fails loudly
    intercept[IllegalStateException] { SnapshotTable.snapshotAt(out, id0) }
    intercept[IllegalStateException] {
      SnapshotTable.incrementalDataDirs(out, afterId = 0L)
    }
    // a never-existed future id still reads as absent, not expired
    assert(SnapshotTable.snapshotAt(out, cur.id + 50).isEmpty)
  }

  test("compaction crash mid-swap is repaired by open()") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in-cmp2")
    GenMain.generate(spark, input,
      ClipGen.Params(60, seed = 47, maxDurMs = 1200), files = 2)
    val out = tmpDir("graft-out-cmp2") + "/t"
    FilterJob.run(spark, FilterJob.JobArgs(input, out, chunks = 2, saltBuckets = 4))
    val before = FilterJob.readDecisions(spark, out)
      .collect().map(_.toString).sorted
    val id0 = SnapshotTable.currentSnapshot(out).get.id
    // simulate the crash window: live dir renamed to its retention name,
    // replacement never moved in (plus a stale compaction tmp dir)
    val live = Paths.get(SnapshotTable.chunkDir(out, 1))
    Files.move(live, Paths.get(out, "data", s".chunk=1.v$id0.old"))
    Files.createDirectories(Paths.get(out, "data", ".compact-tmp-chunk=1"))
    val committed = SnapshotTable.open(out, 2)
    assert(committed == Set(0, 1))
    assert(Files.exists(live), "open() must restore the retained chunk files")
    assert(!Files.exists(Paths.get(out, "data", ".compact-tmp-chunk=1")))
    val after = FilterJob.readDecisions(spark, out)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after))
  }

  test("schema evolution: additive add-column, aligned reads, time travel, " +
       "loud rejection of non-additive changes") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = tmpDir("graft-evolve") + "/t"
    SnapshotTable.open(dir, 3)
    // two chunks at schema v0: (clip_id, score)
    Seq((1L, 0.5), (2L, 0.7)).toDF("clip_id", "score")
      .write.parquet(SnapshotTable.chunkDir(dir, 0))
    SnapshotTable.commitChunk(dir, 0, 3, Map("rows" -> 2L),
      schema = Some("clip_id BIGINT,score DOUBLE"))
    Seq((3L, 0.9)).toDF("clip_id", "score")
      .write.parquet(SnapshotTable.chunkDir(dir, 1))
    SnapshotTable.commitChunk(dir, 1, 3, Map("rows" -> 1L))
    val preEvolve = SnapshotTable.currentSnapshot(dir).get
    assert(preEvolve.schema.contains("clip_id BIGINT,score DOUBLE"),
      "schema carries forward through a schema-less commit")

    // metadata-only evolution: append a nullable column, no data rewritten
    val evolved = SnapshotTable.evolveSchema(dir,
      "clip_id BIGINT,score DOUBLE,lang STRING")
    assert(evolved.id == preEvolve.id + 1 &&
      evolved.committedChunks == preEvolve.committedChunks)
    // a chunk written AFTER evolution carries the new column
    Seq((4L, 0.2, "en")).toDF("clip_id", "score", "lang")
      .write.parquet(SnapshotTable.chunkDir(dir, 2))
    SnapshotTable.commitChunk(dir, 2, 3, Map("rows" -> 1L))

    // aligned read: old chunks surface lang as typed null, order = schema
    val cur = SnapshotTable.readAligned(spark, dir)
    assert(cur.columns.toSeq == Seq("clip_id", "score", "lang"))
    val rows = cur.collect().map(r =>
      r.getLong(0) -> Option(r.getString(2))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> None, 4L -> Some("en")),
      s"got $rows")

    // time travel: a reader pinned before the evolution sees schema v0
    val old = SnapshotTable.readAligned(spark, dir,
      atSnapshot = Some(preEvolve.id))
    assert(old.columns.toSeq == Seq("clip_id", "score"))
    assert(old.count() == 3, "pre-evolution snapshot has only chunks 0+1")

    // non-additive evolutions fail loudly
    intercept[IllegalArgumentException] {
      SnapshotTable.evolveSchema(dir, "clip_id BIGINT,lang STRING")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.evolveSchema(dir,
        "clip_id BIGINT,score STRING,lang STRING")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.evolveSchema(dir, "clip_id BIGINT,score DOUBLE")
    }
    // a commit declaring a non-additive schema is rejected the same way
    intercept[IllegalArgumentException] {
      SnapshotTable.commitChunk(dir, 2, 3, Map.empty,
        schema = Some("clip_id STRING,score DOUBLE,lang STRING"))
    }
    // json round-trip of the schema field survives quoting
    val again = SnapshotTable.currentSnapshot(dir).get
    assert(again.schema.contains("clip_id BIGINT,score DOUBLE,lang STRING"))
  }

  test("decision table partition layout prunes on keep/lang") {
    val spark = SparkTestBase.spark
    val input = tmpDir("graft-in2")
    GenMain.generate(spark, input, ClipGen.Params(60, seed = 11, maxDurMs = 1500), files = 2)
    val out = tmpDir("graft-out2") + "/t"
    FilterJob.run(spark, FilterJob.JobArgs(input, out, chunks = 2, saltBuckets = 4))
    val dec = FilterJob.readDecisions(spark, out)
    val plan = dec.filter(org.apache.spark.sql.functions.col("keep") === true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("keep#"),
      s"expected partition pruning on keep; plan:\n$plan")
  }

  test("zone maps: chunk stats sidecars prune whole chunks, never results") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = tmpDir("graft-zonemap")
    SnapshotTable.open(dir, 3)
    // three chunks with disjoint id ranges — the time/id-clustered ingest
    // shape where manifest stats pay off
    Seq((0, 0L, 99L), (1, 100L, 199L), (2, 200L, 299L)).foreach {
      case (c, lo, hi) =>
        val df = (lo to hi).map(i => (i, s"row-$i")).toDF("id", "payload")
        df.write.mode("overwrite").parquet(SnapshotTable.chunkDir(dir, c))
        SnapshotTable.writeChunkStats(dir, c,
          SnapshotTable.chunkStats(df, Seq("id", "absent_col")))
        SnapshotTable.commitChunk(dir, c, 3, Map.empty)
    }
    // round-trip
    assert(SnapshotTable.readChunkStats(dir, 1).get("id") == (100.0, 199.0))
    assert(!SnapshotTable.readChunkStats(dir, 1).get.contains("absent_col"))
    // a point-range read proves exactly one chunk survives pruning
    val pruned = SnapshotTable.prunedDataDirs(dir, "id", 150, 160)
    assert(pruned == Seq(SnapshotTable.chunkDir(dir, 1)), pruned.toString)
    // pruned read + residual filter ≡ full read + filter (never drops rows)
    val got = spark.read.option("basePath", Paths.get(dir, "data").toString)
      .parquet(pruned: _*).filter(col("id").between(150, 160))
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(150L to 160L))
    // a stat-less chunk can never be skipped
    Files.deleteIfExists(Paths.get(dir, "metadata", "stats-chunk=0.json"))
    val pruned2 = SnapshotTable.prunedDataDirs(dir, "id", 150, 160)
    assert(pruned2.toSet ==
      Set(SnapshotTable.chunkDir(dir, 0), SnapshotTable.chunkDir(dir, 1)))
    // an unknown column prunes nothing
    assert(SnapshotTable.prunedDataDirs(dir, "nope", 0, 1).size == 3)
  }

  test("FilterJob records dur/ppl zone maps for every committed chunk") {
    val spark = SparkTestBase.spark
    val in = tmpDir("graft-zm-in")
    val out = tmpDir("graft-zm-out") + "/table"
    GenMain.generate(spark, in, ClipGen.Params(200, seed = 11, maxDurMs = 2000),
      files = 4)
    FilterJob.run(spark, FilterJob.JobArgs(in, out, chunks = 2, saltBuckets = 4))
    val snap = SnapshotTable.currentSnapshot(out).get
    assert(snap.committedChunks == Set(0, 1))
    snap.committedChunks.foreach { c =>
      val st = SnapshotTable.readChunkStats(out, c)
        .getOrElse(fail(s"chunk $c missing stats sidecar"))
      assert(st.contains("dur_ms") && st.contains("sr_hz"),
        s"chunk $c stats: $st")
      val (lo, hi) = st("dur_ms")
      assert(lo >= 0 && hi >= lo, s"chunk $c dur_ms range ($lo, $hi)")
    }
    // the recorded ranges must COVER the actual data (zone-map soundness)
    val dec = spark.read.option("basePath", Paths.get(out, "data").toString)
      .parquet(SnapshotTable.committedDataDirs(out): _*)
    val mm = dec.agg(
      org.apache.spark.sql.functions.min(col("dur_ms")).cast("double"),
      org.apache.spark.sql.functions.max(col("dur_ms")).cast("double"))
      .collect()(0)
    val allLo = snap.committedChunks.map(c =>
      SnapshotTable.readChunkStats(out, c).get("dur_ms")._1).min
    val allHi = snap.committedChunks.map(c =>
      SnapshotTable.readChunkStats(out, c).get("dur_ms")._2).max
    assert(allLo <= mm.getDouble(0) && allHi >= mm.getDouble(1))
  }

  test("equality deletes: stage, merge-on-read, time travel, purge, retention") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val in = tmpDir("graft-del-in")
    val out = tmpDir("graft-del-out") + "/t"
    GenMain.generate(spark, in, ClipGen.Params(80, seed = 53, maxDurMs = 1200),
      files = 2)
    FilterJob.run(spark, FilterJob.JobArgs(in, out, chunks = 2, saltBuckets = 4))
    val total = SnapshotTable.readAligned(spark, out).count()
    val ids = SnapshotTable.readAligned(spark, out)
      .select("clip_id").orderBy("clip_id").limit(3)
      .collect().map(_.getString(0))
    val preId = SnapshotTable.currentSnapshot(out).get.id

    // stage a 2-key takedown: the hot path never rewrites a data file
    val s1 = SnapshotTable.stageDelete(spark, out, "clip_id",
      ids.take(2).toSeq.toDF("clip_id"))
    assert(s1.deleteFiles == Seq(s".delete-v${s1.id}"))
    assert(s1.counters("delete_keys_staged") == 2L)
    val view = SnapshotTable.readAligned(spark, out)
    assert(view.count() == total - 2)
    assert(view.filter(col("clip_id").isin(ids.take(2).toSeq: _*)).count() == 0)
    // time travel before the delete still sees the rows (merge-on-read)
    assert(SnapshotTable.readAligned(spark, out, Some(preId)).count() == total)
    // the physical rows are untouched
    assert(SnapshotTable.readAligned(spark, out,
      applyDeletes = false).count() == total)

    // deletes accumulate, and later commits carry them forward: a
    // compaction (content-preserving) must not resurrect deleted rows
    val s2 = SnapshotTable.stageDelete(spark, out, "clip_id",
      Seq(ids(2), ids(2)).toDF("clip_id")) // dup keys collapse
    assert(s2.deleteFiles.size == 2 &&
      s2.counters("delete_keys_staged") == 3L)
    SnapshotTable.compactChunk(spark, out, chunk = 0)
    assert(SnapshotTable.currentSnapshot(out).get.deleteFiles.size == 2)
    assert(SnapshotTable.readAligned(spark, out).count() == total - 3)

    // purge refuses while pre-delete snapshots are still time-travelable
    val err = intercept[IllegalArgumentException] {
      SnapshotTable.purgeDeletes(spark, out)
    }
    assert(err.getMessage.contains("expireSnapshots"))

    // expire history to delete-aware versions, then reclaim physically
    SnapshotTable.expireSnapshots(out, keepLast = 1)
    val res = SnapshotTable.purgeDeletes(spark, out)
    assert(res("rows_deleted") == 3L && res("chunks_rewritten") == 2L)
    val cur = SnapshotTable.currentSnapshot(out).get
    assert(cur.deleteFiles.isEmpty)
    assert(cur.counters("delete_rows_purged") == 3L)
    // rows are physically gone now, and the visible view is unchanged
    assert(SnapshotTable.readAligned(spark, out,
      applyDeletes = false).count() == total - 3)
    assert(SnapshotTable.readAligned(spark, out).count() == total - 3)
    // the delete files survive while the pre-purge snapshot references
    // them, then expire drops the last reference and the dirs go away
    assert(Files.list(Paths.get(out, "data")).iterator().asScala
      .exists(_.getFileName.toString.startsWith(".delete-")))
    SnapshotTable.expireSnapshots(out, keepLast = 1)
    assert(!Files.list(Paths.get(out, "data")).iterator().asScala
      .exists(_.getFileName.toString.startsWith(".delete-")))
    // resume still green over the purged table
    assert(SnapshotTable.open(out, 2) == Set(0, 1))
    assert(SnapshotTable.readAligned(spark, out).count() == total - 3)
  }

  test("stageDelete: orphan from a crash is swept; bad key column rejected") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val in = tmpDir("graft-del2-in")
    val out = tmpDir("graft-del2-out") + "/t"
    GenMain.generate(spark, in, ClipGen.Params(40, seed = 59, maxDurMs = 1200),
      files = 2)
    FilterJob.run(spark, FilterJob.JobArgs(in, out, chunks = 1, saltBuckets = 4))
    // crash window: delete parquet written, snapshot never committed —
    // no v*.json references the dir, so open() treats it as never-happened
    val orphan = Paths.get(out, "data", ".delete-v99")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0.parquet"), "junk")
    SnapshotTable.open(out, 1)
    assert(!Files.exists(orphan), "orphan staged delete must be swept")
    // a key column outside the recorded schema fails loudly
    val bad = intercept[IllegalArgumentException] {
      SnapshotTable.stageDelete(spark, out, "no_such_col",
        Seq("x").toDF("no_such_col"))
    }
    assert(bad.getMessage.contains("no_such_col"))
    // an empty key set fails loudly (a takedown that deletes nothing is a
    // caller bug, not a no-op)
    intercept[IllegalArgumentException] {
      SnapshotTable.stageDelete(spark, out, "clip_id",
        Seq.empty[String].toDF("clip_id"))
    }
    // a committed delete whose file was manually removed fails the read
    val keep = SnapshotTable.readAligned(spark, out)
      .select("clip_id").limit(1).collect()(0).getString(0)
    val s = SnapshotTable.stageDelete(spark, out, "clip_id",
      Seq(keep).toDF("clip_id"))
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val st = Files.list(p)
        try st.iterator().forEachRemaining(rmTree) finally st.close()
      }
      Files.deleteIfExists(p)
    }
    rmTree(Paths.get(out, "data", s".delete-v${s.id}"))
    val gone = intercept[IllegalStateException] {
      SnapshotTable.readAligned(spark, out).count()
    }
    assert(gone.getMessage.contains("missing"))
  }

  test("partition-spec evolution: chunks with different layouts read as one " +
       "table") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = tmpDir("graft-pspec") + "/t"
    SnapshotTable.open(dir, 3)
    val ddl = "clip_id BIGINT,keep BOOLEAN,lang STRING,score DOUBLE"
    // chunk 0: Hive-partitioned by (keep, lang)
    Seq((1L, true, "en", 0.9), (2L, false, "de", 0.2))
      .toDF("clip_id", "keep", "lang", "score")
      .write.partitionBy("keep", "lang")
      .parquet(SnapshotTable.chunkDir(dir, 0))
    SnapshotTable.commitChunk(dir, 0, 3, Map("rows" -> 2L), schema = Some(ddl))
    // chunk 1: the spec evolved — partitioned by keep only
    Seq((3L, true, "fr", 0.7)).toDF("clip_id", "keep", "lang", "score")
      .write.partitionBy("keep").parquet(SnapshotTable.chunkDir(dir, 1))
    SnapshotTable.commitChunk(dir, 1, 3, Map("rows" -> 1L))
    // chunk 2: unpartitioned (spec dropped entirely)
    Seq((4L, false, "en", 0.4)).toDF("clip_id", "keep", "lang", "score")
      .write.parquet(SnapshotTable.chunkDir(dir, 2))
    SnapshotTable.commitChunk(dir, 2, 3, Map("rows" -> 1L))

    // one aligned read reconciles all three layouts: dir-encoded and
    // file-encoded columns surface identically, order = schema
    val read = SnapshotTable.readAligned(spark, dir)
    assert(read.columns.toSeq == Seq("clip_id", "keep", "lang", "score"))
    val rows = read.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(rows == Set(
      (1L, true, "en", 0.9), (2L, false, "de", 0.2),
      (3L, true, "fr", 0.7), (4L, false, "en", 0.4)), rows.toString)
    // time travel still respects the layout mix present at that snapshot
    assert(SnapshotTable.readAligned(spark, dir, atSnapshot = Some(1L))
      .count() == 3)
    // deletes apply across layouts too
    SnapshotTable.stageDelete(spark, dir, "clip_id", Seq(1L, 4L).toDF("clip_id"))
    assert(SnapshotTable.readAligned(spark, dir)
      .select("clip_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("sorted compaction clusters files by the sort column, same multiset") {
    val spark = SparkTestBase.spark
    val in = tmpDir("graft-sort-in")
    val out = tmpDir("graft-sort-out") + "/t"
    GenMain.generate(spark, in, ClipGen.Params(200, seed = 67, maxDurMs = 4000),
      files = 4)
    FilterJob.run(spark, FilterJob.JobArgs(in, out, chunks = 1, saltBuckets = 8))
    val before = SnapshotTable.readAligned(spark, out)
      .collect().map(_.toString).sorted

    SnapshotTable.compactChunk(spark, out, chunk = 0, targetTasks = 3,
      sortBy = Seq("dur_ms"))
    val after = SnapshotTable.readAligned(spark, out)
      .collect().map(_.toString).sorted
    assert(before.sameElements(after), "sorted compaction changed content")

    // per-file dur_ms ranges must be disjoint up to boundary ties — that
    // is what makes parquet file/row-group stats selective after the sort
    // within a LEAF dir (keep=/lang=): files come from distinct range
    // partitions, so their key ranges must be disjoint up to boundary ties
    val files = Files.walk(Paths.get(SnapshotTable.chunkDir(out, 0)))
      .iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq
    assert(files.size >= 2, s"want multiple files, got ${files.size}")
    var checkedLeaves = 0
    files.groupBy(_.getParent).foreach { case (leaf, fs) =>
      if (fs.size >= 2) {
        checkedLeaves += 1
        val ranges = fs.map { f =>
          val r = spark.read.parquet(f.toString)
            .agg(org.apache.spark.sql.functions.min(col("dur_ms")).cast("long"),
              org.apache.spark.sql.functions.max(col("dur_ms")).cast("long"))
            .collect()(0)
          (r.getLong(0), r.getLong(1))
        }.sortBy(_._1)
        ranges.sliding(2).foreach {
          case Seq((_, hi), (lo2, _)) =>
            assert(lo2 >= hi,
              s"file ranges in $leaf overlap beyond a boundary tie: $ranges")
          case _ =>
        }
      }
    }
    assert(checkedLeaves >= 1, "no leaf had multiple files to check")
  }

  test("TakedownJob: newline id list staged end-to-end, expire+purge path") {
    val spark = SparkTestBase.spark
    val in = tmpDir("graft-td-in")
    val out = tmpDir("graft-td-out") + "/t"
    GenMain.generate(spark, in, ClipGen.Params(60, seed = 61, maxDurMs = 1200),
      files = 2)
    graft.app.FilterJob.run(spark,
      graft.app.FilterJob.JobArgs(in, out, chunks = 2, saltBuckets = 4))
    val total = SnapshotTable.readAligned(spark, out).count()
    val victims = SnapshotTable.readAligned(spark, out)
      .select("clip_id").orderBy("clip_id").limit(2)
      .collect().map(_.getString(0))
    val idsFile = Paths.get(tmpDir("graft-td-ids"), "ids.txt")
    Files.writeString(idsFile, victims.mkString("", "\n", "\n"))

    val m = graft.app.TakedownJob.run(spark, graft.app.TakedownJob.Args(
      table = out, idsPath = idsFile.toString, expire = 1, purge = true))
    assert(m("delete_keys_staged") == 2L && m("rows_deleted") == 2L)
    val after = SnapshotTable.readAligned(spark, out)
    assert(after.count() == total - 2)
    assert(after.filter(col("clip_id").isin(victims.toSeq: _*)).count() == 0)
    // physically gone too (purge ran)
    assert(SnapshotTable.readAligned(spark, out,
      applyDeletes = false).count() == total - 2)
  }
}
