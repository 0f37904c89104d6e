package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.fixture.ClipGen
import graft.model.Presets
import graft.pipeline.FilterPipeline
import graft.text.TextModel

/** The Sauvola-form cohort-adaptive PPL cutoff (SURVEY T2/T4). */
class AdaptiveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("adaptive cutoff still separates garbled from clean and keeps clean rows") {
    import spark.implicits._
    val params = ClipGen.Params(300, seed = 3, maxDurMs = 2000)
    val model = spark.sparkContext.broadcast(TextModel.default)
    val clips = spark.range(300).map(i => ClipGen.row(i, params))
    val feats = FilterPipeline.features(clips, Presets.adaptive, model).toDF().cache()

    val fixed = FilterPipeline.decide(feats, Presets.default)
    val adaptive = FilterPipeline.decideAdaptive(feats, Presets.adaptive)

    // planted garbled rows must still drop with high_ppl_char under both
    val planted = spark.range(300).map(i =>
      (f"clip-${ClipGen.permute(i, params.n, params.seed)}%012d",
        ClipGen.plantedDefect(i, params))).toDF("clip_id", "planted")
    def pplDropIds(df: org.apache.spark.sql.DataFrame) =
      df.join(planted, "clip_id")
        .filter(array_contains(col("drop_reasons"), "high_ppl_char"))
        .select("planted").collect().map(_.getString(0))

    val fixedDrops = pplDropIds(fixed).count(_ == "garbled")
    val adaptDrops = pplDropIds(adaptive).count(_ == "garbled")
    assert(fixedDrops > 0, "fixture must contain garbled rows")
    assert(adaptDrops >= (fixedDrops * 9) / 10,
      s"adaptive caught $adaptDrops of $fixedDrops garbled rows")
    // and not start dropping clean rows
    // data-relative thresholds may clip the extreme tail of a small cohort;
    // allow <=1% clean-row drops
    val cleanTotal = planted.filter(col("planted") === "none").count()
    val cleanDropped = adaptive.join(planted, "clip_id")
      .filter(col("planted") === "none" && !col("keep")).count()
    assert(cleanDropped <= math.max(1, cleanTotal / 100),
      s"adaptive dropped $cleanDropped/$cleanTotal clean rows")

    // T4: the re-parameterized Sauvola cutoff must NOT invert — it sits
    // strictly above the cohort mean (so the dense good cluster survives)
    // and at or below the max (so the worst tail is cut), on every cohort,
    // including the skewed 70% one
    val sauvCuts = FilterPipeline.adaptiveCutoffs(feats, Presets.adaptiveSauvola)
      .collect()
    assert(sauvCuts.nonEmpty)
    sauvCuts.foreach { r =>
      val (m, mx, c) = (r.getAs[Double]("ppl_mean"), r.getAs[Double]("ppl_max"),
        r.getAs[Double]("ppl_cutoff"))
      assert(c > m, s"sauvola inverted on ${r.getAs[String]("lang")}: cutoff $c <= mean $m")
      assert(c <= mx, s"sauvola cutoff $c above max $mx")
    }
    // P18 gamma LUT: γ < 1 lifts the normalized cutoff (more lenient)
    val gammaCuts = FilterPipeline.adaptiveCutoffs(feats,
        Presets.adaptiveSauvola.copy(adaptiveGamma = 0.5))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("ppl_cutoff")).toMap
    sauvCuts.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(gammaCuts(lang) > r.getAs[Double]("ppl_cutoff"),
        s"gamma 0.5 must lift the cutoff for $lang")
    }

    // niblack vs sauvola: both adaptive forms separate the same garbled rows
    val sauvola = FilterPipeline.decideAdaptive(feats, Presets.adaptiveSauvola)
    val sauvDrops = pplDropIds(sauvola).count(_ == "garbled")
    assert(sauvDrops >= (fixedDrops * 9) / 10,
      s"sauvola caught $sauvDrops of $fixedDrops garbled rows")
    feats.unpersist()
  }
}
