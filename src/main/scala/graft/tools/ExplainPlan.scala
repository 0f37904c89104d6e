package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.app.FilterJob
import graft.pipeline.FilterPipeline

/** Prints the formatted physical plans of the hot paths (plan review). */
object ExplainPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val model = spark.sparkContext.broadcast(graft.text.TextModel.default)
    val clips = FilterJob.readClips(spark, Seq("/tmp/clips3k"))
    val dec = FilterPipeline.decisions(clips, graft.model.Presets.default, model)

    println("==== decisions (decode+score+rules) ====")
    dec.explain("formatted")
    println("==== salted write shape ====")
    dec.repartition(col("keep"), col("lang"),
      pmod(xxhash64(col("clip_id")), lit(8))).explain("formatted")
    println("==== committed-table read with keep-filter (partition pruning) ====")
    val table = FilterJob.readDecisions(spark, "/tmp/dec3k")
    table.filter(col("keep") === true).groupBy("lang").count().explain("formatted")
    println("==== knn query ====")
    graft.SparkEntry.queries("q_emb_knn")(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
