package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` of named SparkEntry queries to
  * <outDir>/<name>.txt — the plan-evidence artifact for optimization
  * rounds (plans/rNN/<query>_before|_after.txt).
  * Usage: DumpPlans <sfDir> <outDir> [suffix] <queryName...>
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val (suffix, names) =
      if (args(2).startsWith("_")) (args(2), args.drop(3).toSeq)
      else ("", args.drop(2).toSeq)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), txt)
      println(s"[plans] wrote $name$suffix")
    }
    spark.stop()
  }
}
