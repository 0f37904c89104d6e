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
}
