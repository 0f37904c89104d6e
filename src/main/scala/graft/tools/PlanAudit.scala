package graft.tools
import org.apache.spark.sql.SparkSession

/** Exchange-count audit over a list of SparkEntry queries: prints how many
  * hash exchanges each query plans and how many are reused — the quick check
  * that a "zero extra shuffle" claim still holds after a refactor.
  * Usage: PlanAudit <sfDir> [queryName...] (defaults to the span/profile set).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env.getOrElse(
      "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_docs_span_dedup", "q_docs_span_clean",
        "q_docs_contamination", "q_docs_tfidf")
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (q <- qs) {
      val df = graft.SparkEntry.queries(q)(s, dir)
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.split("\n").filter(l =>
        l.contains("Exchange") || l.contains("ReusedExchange"))
      println(s"=== $q: ${ex.count(_.contains("Exchange hashpartitioning"))} " +
        s"hash exchanges, ${ex.count(_.contains("ReusedExchange"))} reused ===")
      ex.take(12).foreach(l => println("  " + l.trim.take(150)))
    }
    s.stop()
  }
}
