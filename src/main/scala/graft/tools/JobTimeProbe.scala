package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job wall-time attribution for one SparkEntry query: runs the
  * query once warm, then once recorded, printing every scheduler job's
  * duration and first-stage name — shows where a multi-exchange / iterative
  * query actually spends its time (AQE stages each surface as a job). */
object JobTimeProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    fn(spark, dir).count() // warm 2
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val cs = e.stageInfos.map(_.name).headOption.getOrElse("")
        starts.put(e.jobId, (e.time, if (d.nonEmpty) d else cs))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.get(e.jobId)
        if (s != null) rows.add((e.jobId, (e.time - s._1) / 1e3, s._2))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        val run = si.taskMetrics.executorRunTime / 1e3
        val deser = si.taskMetrics.executorDeserializeTime / 1e3
        println(f"[stage] #${si.stageId}%-4d wall $wall%6.3f run $run%7.3f " +
          f"deser $deser%6.3f tasks ${si.numTasks}%-4d ${si.name.take(70)}")
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    val rs = rows.asScala.toSeq.sortBy(_._1)
    var sum = 0.0
    rs.foreach { case (id, secs, desc) =>
      sum += secs
      println(f"[job] #$id%-4d $secs%7.3f s  ${desc.take(90)}")
    }
    println(f"[job] total-job $sum%.3f s, wall $wall%.3f s, njobs ${rs.size}")
    spark.stop()
  }
}
