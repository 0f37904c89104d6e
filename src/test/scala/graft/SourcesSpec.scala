package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.app.FilterJob
import graft.fixture.ClipGen
import graft.model.Presets
import graft.sources.ClipSources
import graft.text.TextModel

/** Wire-format parity (SURVEY S1: the reference ingests base64 media in
  * JSON): the same clips delivered as parquet, base64-JSONL, and base64-CSV
  * must decode to identical bytes and produce identical decisions. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("jsonl and csv base64 sources round-trip to the parquet decisions") {
    import spark.implicits._
    val params = ClipGen.Params(80, seed = 31, maxDurMs = 1500)
    val clips = spark.range(80).map(i => ClipGen.row(i, params))

    val dir = Files.createTempDirectory("graft-src").toString
    clips.toDF().write.mode("overwrite").parquet(s"$dir/pq")
    val wire = ClipSources.toWire(clips)
    wire.write.mode("overwrite").json(s"$dir/jl")
    wire.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$dir/cs")

    val model = spark.sparkContext.broadcast(TextModel.default)
    def decide(ds: org.apache.spark.sql.Dataset[graft.model.ClipRow]) =
      graft.pipeline.FilterPipeline.decisions(ds, Presets.default, model)
        .select("clip_id", "keep", "drop_reasons", "scrubbed_transcript")
        .collect().map(_.toString).sorted

    val viaPq = decide(FilterJob.readClips(spark, Seq(s"$dir/pq")))
    val viaJl = decide(FilterJob.readClips(spark, Seq(s"$dir/jl"), "jsonl"))
    val viaCs = decide(FilterJob.readClips(spark, Seq(s"$dir/cs"), "csv"))
    assert(viaPq.length == 80)
    assert(viaJl.sameElements(viaPq), "jsonl decisions differ from parquet")
    assert(viaCs.sameElements(viaPq), "csv decisions differ from parquet")

    // bytes survive the base64 round-trip exactly (SNR-relevant invariant)
    val orig = clips.collect().map(r => r.clip_id -> r.bytes).toMap
    ClipSources.readJsonl(spark, Seq(s"$dir/jl")).collect().foreach { r =>
      assert(java.util.Arrays.equals(r.bytes, orig(r.clip_id)),
        s"${r.clip_id} bytes corrupted by jsonl round-trip")
    }
  }

  test("the resumable job runs end-to-end over a jsonl input") {
    import spark.implicits._
    val params = ClipGen.Params(60, seed = 37, maxDurMs = 1200)
    val clips = spark.range(60).map(i => ClipGen.row(i, params))
    val dir = Files.createTempDirectory("graft-src2").toString
    ClipSources.toWire(clips).repartition(3)
      .write.mode("overwrite").json(s"$dir/in")
    // .json writes .json files; rename to .jsonl for the format's listing
    val d = new java.io.File(s"$dir/in")
    d.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
      f.renameTo(new java.io.File(f.getParent, f.getName + "l"))
    }
    val out = s"$dir/out/t"
    val counters = FilterJob.run(spark,
      FilterJob.JobArgs(s"$dir/in", out, chunks = 2, saltBuckets = 4,
        format = "jsonl"))
    assert(counters("rows") == 60)
    assert(FilterJob.readDecisions(spark, out).count() == 60)
  }
}
