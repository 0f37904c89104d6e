package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.fixture.ClipGen

/** Bucketed co-located joins (the shuffle-avoidance pattern for repeated
  * big-big joins at 10^12-row scale): two tables bucketed by the same key
  * into the same bucket count join WITHOUT a shuffle exchange on either
  * side — the join is planned bucket-local. The decisions table keyed by
  * clip_id is the natural use (re-joining decisions against a metadata or
  * label table keyed the same way). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bucketBy(clip_id) join plans with zero shuffle exchanges") {
    import spark.implicits._
    // external table paths — the session's warehouse dir is untouched
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val params = ClipGen.Params(300, seed = 23, maxDurMs = 1200)
    val clips = spark.range(300).map(i => ClipGen.row(i, params))
      .select($"clip_id", $"sr_hz", $"dur_ms", $"codec")

    // two tables bucketed by the SAME key into the SAME bucket count
    clips.write.mode("overwrite")
      .bucketBy(8, "clip_id").sortBy("clip_id")
      .option("path", s"$wh/t_meta").saveAsTable("t_meta")
    clips.select($"clip_id", ($"dur_ms" > 600).as("label"))
      .write.mode("overwrite")
      .bucketBy(8, "clip_id").sortBy("clip_id")
      .option("path", s"$wh/t_labels").saveAsTable("t_labels")

    // disable broadcast so the planner must choose between a shuffled and a
    // bucket-local sort-merge join — the scale-relevant comparison (at
    // 10^12 rows neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("t_meta").join(spark.table("t_labels"), "clip_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed co-located join must not shuffle; plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n$plan")
      assert(joined.count() == 300)

      // control: the same join over unbucketed parquet DOES shuffle —
      // the bucketing is what removed the exchanges
      clips.write.mode("overwrite").parquet(s"$wh/p_meta")
      val flat = spark.read.parquet(s"$wh/p_meta")
      val ctrl = flat.join(
        flat.select($"clip_id", ($"dur_ms" > 600).as("label")), "clip_id")
      assert(ctrl.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS t_meta")
      spark.sql("DROP TABLE IF EXISTS t_labels")
    }
  }
}
