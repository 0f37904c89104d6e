package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_docs_substr_clean", "q_docs_drift", "q_docs_code_switch",
        "q_docs_keepers_quality", "q_docs_calibration", "q_docs_span_boilerplate")) {
      val plan = graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.child.output.map(_.name).mkString(",")
      }
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.requiredSchema.fieldNames.mkString(",")
      }
      println(s"== $q: ${exch.size} exchanges")
      exch.foreach(c => println(s"   xchg[$c]"))
      scans.foreach(c => println(s"   scan[$c]"))
    }
    spark.stop()
  }
}
