package graft.app

import org.apache.spark.sql.SparkSession

import graft.table.SnapshotTable

/** spark-submit entry for takedown/GDPR deletes against a committed
  * decision table — the operational wrapper over the table layer's
  * equality-delete files (the reference's closest analog is the manual
  * per-run output cleanup in its notebook; at 10^12-clip scale deletion
  * must be a metadata operation, not a rewrite):
  *
  *   spark-submit --class graft.app.TakedownJob <jar> \
  *     --table <snapshot table dir> --ids <file> \
  *     [--keyCol clip_id] [--idsFormat text|parquet] \
  *     [--purge false] [--expire 0]
  *
  * `--ids` is a newline-delimited id list (text, the usual legal-request
  * shape) or a parquet with the key column. The staged delete commits a new
  * snapshot; every reader via [[SnapshotTable.readAligned]] stops seeing
  * the rows immediately, with zero data files rewritten. `--purge true`
  * afterwards rewrites the chunks physically (requires history already
  * expired to delete-aware snapshots — pass `--expire 1` to do both), for
  * the compliance regimes where logical deletion is not enough.
  */
object TakedownJob {

  final case class Args(
      table: String,
      idsPath: String,
      keyCol: String = "clip_id",
      idsFormat: String = "text",
      purge: Boolean = false,
      expire: Int = 0
  )

  /** Stage the delete (and optionally expire history + purge physically).
    * Returns the summary counters of what ran. */
  def run(spark: SparkSession, args: Args): Map[String, Long] = {
    val keys = args.idsFormat match {
      case "parquet" => spark.read.parquet(args.idsPath).select(args.keyCol)
      case "text" =>
        spark.read.textFile(args.idsPath).toDF(args.keyCol)
          .filter(org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col(args.keyCol)) > 0)
      case other => sys.error(s"unknown --idsFormat $other")
    }
    val snap = SnapshotTable.stageDelete(spark, args.table, args.keyCol, keys)
    println(s"[takedown] staged delete file ${snap.deleteFiles.last} in " +
      s"snapshot v${snap.id} (${snap.counters("delete_keys_staged")} keys " +
      "staged over the table's lifetime)")
    var out = Map(
      "staged_snapshot" -> snap.id,
      "delete_keys_staged" -> snap.counters("delete_keys_staged"))
    if (args.expire > 0) {
      val dropped = SnapshotTable.expireSnapshots(args.table, keepLast = args.expire)
      println(s"[takedown] expired ${dropped.size} snapshot(s): " +
        dropped.mkString(", "))
      out += ("snapshots_expired" -> dropped.size.toLong)
    }
    if (args.purge) {
      val res = SnapshotTable.purgeDeletes(spark, args.table)
      println(s"[takedown] purged: rows_deleted=${res("rows_deleted")} " +
        s"chunks_rewritten=${res("chunks_rewritten")}")
      out ++= res
    }
    out
  }

  def main(rawArgs: Array[String]): Unit = {
    val a = parse(rawArgs.toList, Map.empty)
    val args = Args(
      table = a.getOrElse("table", sys.error("--table required")),
      idsPath = a.getOrElse("ids", sys.error("--ids required")),
      keyCol = a.getOrElse("keyCol", "clip_id"),
      idsFormat = a.getOrElse("idsFormat", "text"),
      purge = a.getOrElse("purge", "false").toBoolean,
      expire = a.getOrElse("expire", "0").toInt
    )
    val builder = SparkSession.builder().appName("graft-takedown")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.props.get("spark.master")
      .fold(builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]")))(_ => builder)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args)
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case key :: value :: rest if key.startsWith("--") =>
        parse(rest, acc + (key.stripPrefix("--") -> value))
      case Nil => acc
      case other => sys.error(s"cannot parse args at: $other")
    }
}
