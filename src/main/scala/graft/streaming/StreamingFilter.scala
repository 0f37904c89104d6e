package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.app.FilterJob
import graft.model.FilterConfig
import graft.pipeline.FilterPipeline
import graft.text.TextModel

/** Structured Streaming mode of the quality filter.
  *
  * The reference is strictly batch (SURVEY §2.10) and the north rule's
  * resume story is snapshot commits; this module exists because the same
  * narrow pipeline (`features` → `decide`) is stage-compatible with
  * micro-batch execution unchanged — a `readStream` source swaps in for the
  * scan, checkpointing supplies exactly-once file sinks, and the decision
  * layer stays the identical Catalyst expression set. Useful when clips
  * arrive continuously (e.g. an ingestion landing zone) rather than as a
  * snapshotted table.
  */
object StreamingFilter {

  /** Streaming decision frame over a directory where clip parquet files
    * keep landing. Same columns as the batch `FilterPipeline.decisions`. */
  def decisions(
      spark: SparkSession,
      inputDir: String,
      cfg: FilterConfig,
      model: Broadcast[TextModel]
  ): DataFrame = {
    import spark.implicits._
    val clips = spark.readStream
      .schema(FilterJob.clipSchema)
      .parquet(inputDir)
      .na.fill(Map("transcript" -> ""))
      .as[graft.model.ClipRow]
    val d = FilterPipeline.decide(
      FilterPipeline.features(clips, cfg, model).toDF(), cfg)
    d.select(col("clip_id"), col("keep"), col("drop_reasons"),
      col("scrubbed_transcript"), col("lang"), col("lang_conf"),
      col("ppl_char"), col("ppl_word"), col("codec"),
      col("n_samples"), col("audio_fp"))
  }

  /** Streaming exact dedup: first-seen transcript wins inside the watermark
    * horizon — the streaming analog of the batch `Dedup.exact` pass that
    * precedes near-dup in a curation pipeline. State is BOUNDED:
    * `dropDuplicatesWithinWatermark` expires a key once the watermark
    * passes its arrival + delay, so the state store holds only the recent
    * horizon (an unbounded `dropDuplicates` would grow forever on a
    * 10^12-clip stream).
    *
    * Dedup key (default): the compound (64-bit transcript hash, transcript
    * length) — ~12 bytes of state per distinct recent transcript, not the
    * text. A distinct clip is silently dropped only on a SAME-LENGTH 64-bit
    * hash collision (~2^-64 per colliding pair within the watermark
    * horizon); at extreme scale or zero collision tolerance pass
    * `exactState = true` to key on the transcript itself — exact, at the
    * cost of storing the full text in the state store. */
  def dedupByTranscript(decisions: DataFrame,
                        delay: String = "2 minutes",
                        exactState: Boolean = false): DataFrame = {
    val wm = decisions
      .withColumn("arrival_ts", current_timestamp())
      .withWatermark("arrival_ts", delay)
    val deduped =
      if (exactState) wm.dropDuplicatesWithinWatermark("scrubbed_transcript")
      else wm
        .withColumn("text_hash", xxhash64(col("scrubbed_transcript")))
        .withColumn("text_len", length(col("scrubbed_transcript")))
        .dropDuplicatesWithinWatermark("text_hash", "text_len")
        .drop("text_hash", "text_len")
    deduped.drop("arrival_ts")
  }

  /** Streaming NEAR-dup sketch: approximate near-duplicate suppression
    * inside the watermark horizon, beside the exact `dedupByTranscript`.
    *
    * Mechanics: the 64-bit token SimHash is sliced into `numBands` band
    * keys and the stream passes through one `dropDuplicatesWithinWatermark`
    * PER BAND. A row that survives every stage registers all of its band
    * keys; a later row sharing ANY band key with a surviving row is
    * dropped at that band's stage. By the pigeonhole principle a new clip
    * within Hamming ≤ numBands−1 of a RETAINED clip shares at least one
    * untouched band, so it is structurally suppressed (4 bands → radius 3,
    * which covers exact dups, punctuation/casing edits — token SimHash is
    * invariant to those — and small word edits on long transcripts).
    *
    * Approximation contract, stated loudly:
    *  - false positives: two genuinely distinct clips sharing one
    *    64/numBands-bit band key are conflated (p ≈ numBands·2^-(64/numBands)
    *    per pair ≈ 6e-5 at 4 bands) — acceptable for dedup, where dropping
    *    one near-borderline clip costs nothing;
    *  - false negatives: none added by chaining — recall is against
    *    RETAINED clips as stated above. One asymmetry to know: a clip
    *    dropped at band stage b has already registered its keys at stages
    *    0..b−1, so a PARTIALLY-registered dropped clip can still suppress
    *    a later arrival on one of those earlier bands — suppression chains
    *    partially extend through dropped clips, adding false positives
    *    beyond the per-pair bound above (the recall guarantee is
    *    unaffected).
    *
    * State: numBands stores × one long key per retained recent clip,
    * expiring with the watermark — bounded like the exact pass. */
  def dedupNearBySimhash(decisions: DataFrame,
                         delay: String = "2 minutes",
                         numBands: Int = 4): DataFrame = {
    require(numBands > 0 && 64 % numBands == 0, s"bad numBands $numBands")
    val width = 64 / numBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    var d = decisions
      .withColumn("arrival_ts", current_timestamp())
      .withColumn("sh", graft.functions.SimHash64.col(col("scrubbed_transcript")))
      .withWatermark("arrival_ts", delay)
    (0 until numBands).foreach { b =>
      d = d
        .withColumn(s"band_$b",
          shiftrightunsigned(col("sh"), b * width).bitwiseAND(lit(mask)))
        .dropDuplicatesWithinWatermark(s"band_$b")
    }
    d.drop((0 until numBands).map(b => s"band_$b") ++ Seq("sh", "arrival_ts"): _*)
  }

  /** Streaming AUDIO near-dup sketch: the acoustic-fingerprint analog of
    * [[dedupNearBySimhash]] — re-uploads/re-encodes/gain changes of a
    * recently-retained recording are suppressed inside the watermark
    * horizon. Requires the `n_samples` and `audio_fp` columns the
    * [[decisions]] frame carries (`Heuristics.audioFingerprint` of the
    * analysis-grid waveform).
    *
    * The batch path (`clips_audio_neardup`) gates candidates on ±2%
    * duration; a streaming state key cannot express a range predicate, so
    * the gate becomes a QUANTIZED log-duration bucket
    * (`floor(ln n / ln(1+durTolerance))`, default 4% buckets) folded into
    * every band key: clips within the tolerance share a bucket unless they
    * straddle a boundary — a recall approximation on top of the band
    * sketch, stated here rather than hidden. Same pigeonhole recall as the
    * SimHash chain otherwise (numBands − 1 Hamming radius vs retained
    * clips), same partially-registered-dropped-clip caveat. Undecodable
    * rows (n_samples ≤ 0, fingerprint 0) pass through untouched — they
    * would otherwise all collide on the zero key. */
  def dedupNearByAudioFp(decisions: DataFrame,
                         delay: String = "2 minutes",
                         numBands: Int = 4,
                         durTolerance: Double = 0.04): DataFrame = {
    require(numBands > 0 && 64 % numBands == 0, s"bad numBands $numBands")
    require(durTolerance > 0 && durTolerance < 1, s"bad durTolerance $durTolerance")
    val width = 64 / numBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val wm = decisions
      .withColumn("arrival_ts", current_timestamp())
      .withWatermark("arrival_ts", delay)
    val passthrough = wm.filter(col("n_samples") <= 0).drop("arrival_ts")
    var d = wm.filter(col("n_samples") > 0)
      .withColumn("dur_b",
        floor(log(col("n_samples").cast("double")) / math.log(1 + durTolerance)))
    (0 until numBands).foreach { b =>
      d = d
        .withColumn(s"aband_$b",
          shiftrightunsigned(col("audio_fp"), b * width).bitwiseAND(lit(mask)))
        .dropDuplicatesWithinWatermark(s"aband_$b", "dur_b")
    }
    d.drop((0 until numBands).map(b => s"aband_$b") ++
        Seq("dur_b", "arrival_ts"): _*)
      .unionByName(passthrough)
  }

  /** Continuous keep/drop telemetry: windowed per-language decision counts
    * with a watermark (the streaming analog of the lineage rollup). Event
    * time is the micro-batch arrival time (clips carry no timestamp). */
  def decisionCounts(decisions: DataFrame, windowLen: String = "1 minute"): DataFrame =
    decisions
      .withColumn("arrival_ts", current_timestamp())
      .withWatermark("arrival_ts", "2 minutes")
      .groupBy(window(col("arrival_ts"), windowLen), col("lang"), col("keep"))
      .agg(count(lit(1)).as("n"))

  // ---- streaming sink into the snapshot table -------------------------------

  /** One micro-batch committed as one snapshot-table chunk, keyed by the
    * stream's monotonic `batchId` — the idempotence kernel of
    * [[sinkToSnapshotTable]], exposed for direct testing.
    *
    * SINGLE WRITER PER TABLE, required: the per-batch
    * `SnapshotTable.open` sweeps uncommitted chunk dirs and unreferenced
    * .delete-* dirs, so a CONCURRENT writer on the same table (a batch
    * job, a second stream, or an in-flight `stageDelete` between its
    * parquet write and its commit) would have its uncommitted files
    * deleted by this sink's sweep. One table = one writer at a time; the
    * metadata log carries no lock. Exactly-once
    * table content falls out of two existing invariants: a REPLAYED batch
    * (same batchId after a crash) finds its chunk already committed and
    * does nothing, and a partially-written uncommitted chunk is swept by
    * `SnapshotTable.open` before the rewrite. `totalChunks` is 0 by
    * convention: a stream has no completion count. */
  private[graft] def commitBatch(batch: DataFrame, batchId: Long,
                                     table: String,
                                     partitionCols: Seq[String]): Unit = {
    import graft.table.SnapshotTable
    require(batchId >= 0 && batchId <= Int.MaxValue, s"batchId $batchId")
    val chunk = batchId.toInt
    val committed = SnapshotTable.open(table, 0)
    if (!committed.contains(chunk)) {
      val rows = batch.persist()
      val n = rows.count()
      if (n > 0) {
        val w = rows.write.mode("overwrite")
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(SnapshotTable.chunkDir(table, chunk))
        SnapshotTable.commitChunk(table, chunk, 0,
          Map("rows" -> n, "batches" -> 1L),
          schema = Some(rows.schema.toDDL))
      }
      rows.unpersist()
    }
  }

  /** Continuous ingestion into a [[graft.table.SnapshotTable]]: every
    * micro-batch commits as one chunk (batchId = chunk id), giving the
    * STREAMING path the same atomic-commit / resume / time-travel /
    * incremental-scan / delete-file semantics as the batch job — a
    * downstream consumer `incrementalDataDirs`-polls the growing table
    * without knowing a stream writes it. Restart with the same
    * `checkpoint` dir resumes exactly-once (Structured Streaming replays
    * the in-flight batch under its original batchId; [[commitBatch]] makes
    * the replay a no-op when the chunk already committed). Empty batches
    * commit nothing. */
  def sinkToSnapshotTable(decisions: DataFrame, table: String,
                          checkpoint: String,
                          partitionCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    decisions.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, table, partitionCols)
      }
      .start()

  /** One micro-batch's drift rows, written idempotently (the kernel of
    * [[driftSink]], exposed for direct replay testing): PSI of the batch
    * against the static reference over `metric`, landed as the
    * `batch_id=<id>` partition dir with overwrite — a replayed batch
    * rewrites identical rows instead of appending duplicates. Empty
    * batches write nothing (no distribution to audit). */
  private[graft] def driftBatch(batch: DataFrame, batchId: Long,
                                ref: DataFrame,
                                metric: org.apache.spark.sql.Column,
                                bucketWidth: Double, nBuckets: Int,
                                outDir: String): Unit =
    if (batch.take(1).nonEmpty)
      graft.pipeline.TextProfile.psiDrift(ref, batch, metric,
          bucketWidth, nBuckets)
        .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** One micro-batch's known-snippet scan (the kernel of
    * [[snippetAlertSink]], exposed for replay testing): every clip in the
    * batch is checked for every static known snippet via the acoustic
    * fingerprint aligner; alert rows land as the overwrite-idempotent
    * `batch_id=<id>` partition. Empty batches write nothing. */
  private[graft] def snippetAlertBatch(batch: DataFrame, batchId: Long,
                                       snippets: DataFrame, outDir: String,
                                       windowMs: Int, hopMs: Int,
                                       minCoverage: Double): Unit =
    if (batch.take(1).nonEmpty)
      graft.pipeline.AudioDedup.findClipsContaining(batch, snippets,
          windowMs = windowMs, hopMs = hopMs, minCoverage = minCoverage)
        .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Streaming known-snippet alerting — the ingest-time compliance gate:
    * each micro-batch of incoming clips is scanned for a STATIC snippet
    * set (licensed jingles, ad beds, test tones pending takedown) with
    * the same offset-aligned fingerprint matcher the batch path uses
    * ([[graft.pipeline.AudioDedup.findClipsContaining]]), and the alert
    * rows (which clip contains which snippet, coverage, offset) land
    * under `outDir/batch_id=<id>/`. The snippet set is static and tiny
    * (every batch re-fingerprints it — bounded), the batch decodes once
    * in the narrow fingerprint pass, and a replayed batch rewrites its
    * partition rather than duplicating alerts. An alert consumer feeds
    * matches straight into `SnapshotTable.stageDelete` — the streaming
    * front half of the takedown pipeline. */
  def snippetAlertSink(clips: DataFrame, snippets: DataFrame,
                       outDir: String, checkpoint: String,
                       windowMs: Int = 500, hopMs: Int = 250,
                       minCoverage: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    clips.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        snippetAlertBatch(batch, batchId, snippets, outDir,
          windowMs, hopMs, minCoverage)
      }
      .start()

  /** Streaming ingest-drift monitor — [[graft.app.FilterJob.driftSince]]'s
    * per-commit audit at micro-batch cadence: every batch is PSI'd
    * against a STATIC reference population (yesterday's corpus, a golden
    * sample) over any numeric column, and the per-bucket drift rows land
    * under `outDir/batch_id=<id>/` (partition-discoverable with a
    * basePath read; Σ psi per batch = that batch's index against the
    * standard 0.1 / 0.25 lights). The reference is a static frame on the
    * batch side of a foreachBatch, so no stream-side join/aggregation
    * restrictions apply, and state is bounded by nBuckets per batch. */
  def driftSink(decisions: DataFrame, ref: DataFrame,
                metric: org.apache.spark.sql.Column,
                bucketWidth: Double, nBuckets: Int,
                outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    decisions.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        driftBatch(batch, batchId, ref, metric, bucketWidth, nBuckets,
          outDir)
      }
      .start()
}
