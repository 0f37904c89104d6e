package graft.tools
import org.apache.spark.sql.SparkSession
object OneQueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count()
    println(f"[one] $name best3 = ${(1 to 3).map(_ => timed(fn(spark, dir).count(): Unit)).min}%6.2f s")
    spark.stop()
  }
}
