package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_docs_span_dedup", "q_docs_span_clean", "q_docs_contamination", "q_docs_tfidf")) {
      val df = graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.split("\n").filter(l => l.contains("Exchange") || l.contains("ReusedExchange"))
      println(s"=== $q: ${ex.count(_.contains("Exchange hashpartitioning"))} hash exchanges, ${ex.count(_.contains("ReusedExchange"))} reused ===")
      ex.take(12).foreach(l => println("  " + l.trim.take(150)))
    }
    s.stop()
  }
}
