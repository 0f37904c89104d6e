package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Runs one SparkEntry query and prints the FINAL adaptive plan with
  * per-operator SQL metrics (output rows, codegen/eval time where
  * published) — finds row explosions and interpreted hot spots. */
object PlanMetricsProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    // execute THIS queryExecution (count() would plan a separate one and
    // leave these metric objects untouched)
    df.queryExecution.executedPlan.executeCollect()
    def walk(p: SparkPlan, depth: Int): Unit = {
      val interesting = p.metrics.filter { case (k, _) =>
        k.contains("numOutputRows") || k.contains("Time") || k.contains("time") }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + ms)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
      p.subqueries.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
