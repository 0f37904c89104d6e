package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm best-of-3 per-query timing of the SparkEntry query suite (the
  * declarative half of the driver bench) — fast iteration on query
  * parameterizations without the pipeline scaling phases. */
object QueryBenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var total = 0.0
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("clips_")).foreach { case (name, fn) =>
        fn(spark, dir).count() // warm
        val t = (1 to 3).map(_ => timed(fn(spark, dir).count(): Unit)).min
        total += t
        println(f"$name%-24s $t%6.2f s")
      }
    println(f"TOTAL queries            $total%6.2f s")
    spark.stop()
  }
}
