package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.app.FilterJob
import graft.fixture.{ClipGen, GenMain}
import graft.pipeline.FilterPipeline

/** Breakdown of the bench's decode_score stage at local[32]: parquet scan
  * alone, kernel-only (features consumed as objects, no encoder), features
  * through the row encoder, and the full decisions().count() the bench
  * times. Attributes decode_score_nN to scan / per-clip kernel / encoder /
  * decision-layer cost. */
object DecScoreProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = s"/tmp/graft_bench/clips_n${n}_s42_f256_g2"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS")))
      GenMain.generate(spark, dir, ClipGen.Params(n, seed = 42L), files = 256)

    val model = spark.sparkContext.broadcast(graft.text.TextModel.default)
    val clips = FilterJob.readClips(spark, Seq(dir))
    val cfg = graft.model.Presets.default

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best3(tag: String)(f: => Unit): Unit = {
      f // warm
      println(f"[dsp] $tag%-34s ${(1 to 3).map(_ => timed(f)).min}%6.2f s")
    }

    // 1. scan only: read every bytes column but do no decode
    best3("scan bytes+meta (no kernel)") {
      clips.toDF().select(sum(length(col("bytes"))), sum(length(col("transcript"))))
        .collect(): Unit
    }
    // 2. kernel, consumed as JVM objects — consecutive typed ops stay in
    // object form, so the FeatureRow->InternalRow encoder never runs
    best3("kernel as objects (no encoder)") {
      FilterPipeline.features(clips, cfg, model)
        .map(_.n_samples.toLong).reduce(_ + _): Unit
    }
    // 3. kernel through the encoder, all columns materialized (noop write)
    best3("features -> noop (encoder)") {
      FilterPipeline.features(clips, cfg, model).toDF()
        .write.format("noop").mode("overwrite").save()
    }
    // 4. what the bench times
    best3("decisions().count() [bench]") {
      FilterPipeline.decisions(clips, cfg, model).count(): Unit
    }
    spark.stop()
  }
}
