package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixture.ClipGen
import graft.model.Presets
import graft.pipeline.FilterPipeline
import graft.text.TextModel

/** Ad-hoc diagnostic: per-planted-defect feature distributions + decisions.
  * Not part of the driver contract; used to tune FilterConfig thresholds. */
object Diag {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-diag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val params = ClipGen.Params(n)
    val model = spark.sparkContext.broadcast(TextModel.default)
    val clips = spark.range(n).map(i => ClipGen.row(i, params))
    val planted = spark.range(n).map(i =>
      (f"clip-${ClipGen.permute(i, params.n, params.seed)}%012d",
       ClipGen.plantedDefect(i, params))).toDF("clip_id", "planted")

    val dec = FilterPipeline.decisions(clips, Presets.default, model)
      .join(planted, "clip_id")
    dec.cache()

    println("=== planted defect × keep ===")
    dec.groupBy("planted").agg(
      count(lit(1)).as("n"),
      sum(when($"keep", 1).otherwise(0)).as("kept"),
      round(avg($"lang_conf"), 3).as("avg_conf"),
      round(avg($"ppl_char"), 1).as("avg_pplc"),
      round(expr("percentile(ppl_char, 0.95)"), 1).as("p95_pplc"),
      round(avg($"ppl_word"), 1).as("avg_pplw"),
      round(avg($"silence_frac"), 2).as("avg_sil"),
      round(avg($"clip_frac"), 3).as("avg_clip"),
      round(avg($"dyn_range_db"), 1).as("avg_dyn"),
      round(avg($"chars_per_sec"), 1).as("avg_cps"),
      round(avg($"symbol_frac"), 3).as("avg_sym"),
      max($"max_repeat_run").as("max_rep")
    ).orderBy("planted").show(50, false)

    println("=== top reason combos per defect ===")
    dec.groupBy($"planted", $"drop_reasons").count()
      .orderBy($"planted", $"count".desc).show(80, false)

    println("=== lang × planted ===")
    dec.groupBy("planted", "lang").count().orderBy("planted", "lang").show(50, false)

    println("=== clean-row score spread (planted=none) ===")
    dec.filter($"planted" === "none").select(
      min($"lang_conf"), expr("percentile(lang_conf, 0.05)"),
      max($"ppl_char"), expr("percentile(ppl_char, 0.95)"),
      max($"ppl_word"), expr("percentile(ppl_word, 0.95)"),
      min($"dyn_range_db"), max($"silence_frac"), max($"clip_frac"),
      min($"chars_per_sec"), max($"chars_per_sec"), max($"symbol_frac"),
      max($"max_repeat_run")).show(false)

    spark.stop()
  }
}
