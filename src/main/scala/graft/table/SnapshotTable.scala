package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Iceberg-style snapshot-committed Parquet table (SURVEY §7.1/§7.3).
  *
  * No Iceberg runtime jar exists offline, so the behaviors the north rule
  * names — snapshot log, atomic commit, partitioned layout, resume from the
  * last committed snapshot — are implemented directly:
  *
  *   table/
  *     data/chunk-<i>/keep=<b>/lang=<l>/part-*.parquet
  *     metadata/v<N>.json      — snapshot: committed chunk ids + counters
  *     metadata/current        — pointer file, atomically renamed into place
  *
  * A "chunk" is the unit of resumable work: a deterministic slice of the
  * input scan (by data file, the Iceberg planning unit). A killed job
  * reprocesses nothing committed and everything uncommitted: uncommitted
  * chunk dirs are deleted and rewritten, committed ones are never touched.
  *
  * JSON is hand-rolled (zero-dep environment); the schema is flat and the
  * reader only needs chunk ids, so a small extractor suffices.
  */
object SnapshotTable {

  final case class Snapshot(
      id: Long,
      committedChunks: Set[Int],
      totalChunks: Int,
      counters: Map[String, Long]
  )

  private def metaDir(table: String): Path = Paths.get(table, "metadata")
  /** key=value form so Spark's partition discovery reads `chunk` as a
    * partition column when scanning multiple committed chunk dirs. */
  def chunkDir(table: String, chunk: Int): String =
    Paths.get(table, "data", s"chunk=$chunk").toString

  /** Latest committed snapshot, if the table exists and has one. */
  def currentSnapshot(table: String): Option[Snapshot] = {
    val cur = metaDir(table).resolve("current")
    if (!Files.exists(cur)) return None
    val name = Files.readString(cur).trim
    val f = metaDir(table).resolve(name)
    if (!Files.exists(f)) return None
    Some(parseSnapshot(Files.readString(f)))
  }

  /** Begin (or resume) a write: ensures dirs exist and deletes any
    * uncommitted chunk dirs left by a killed run. Returns committed set. */
  def open(table: String, totalChunks: Int): Set[Int] = {
    Files.createDirectories(metaDir(table))
    Files.createDirectories(Paths.get(table, "data"))
    val committed = currentSnapshot(table).map(_.committedChunks).getOrElse(Set.empty)
    // clean partial output of uncommitted chunks (idempotent resume)
    val dataDir = Paths.get(table, "data")
    Using.resource(Files.list(dataDir)) { stream =>
      stream.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("chunk=")) {
          val id = n.stripPrefix("chunk=").toInt
          if (!committed.contains(id)) deleteRecursively(p)
        }
      }
    }
    committed
  }

  /** Pin the job's input file listing into the table metadata (the Iceberg
    * manifest semantic): a resumed run reads EXACTLY the files the first run
    * planned, even if the input directory gained files in between — committed
    * chunks keep their round-robin slices valid. Written once, atomically. */
  def writeManifest(table: String, files: Seq[String]): Unit = {
    val tmp = metaDir(table).resolve(".manifest.tmp")
    Files.write(tmp, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir(table).resolve("manifest.txt"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The pinned input manifest, if one was written by a previous run. */
  def readManifest(table: String): Option[Seq[String]] = {
    val f = metaDir(table).resolve("manifest.txt")
    if (!Files.exists(f)) None
    else Some(Files.readString(f).split("\n").toSeq.filter(_.nonEmpty))
  }

  /** Atomically commit `chunk` into a new snapshot. Single-writer protocol
    * (one driver), like an Iceberg metastore commit: write v<N+1>.json,
    * then swap the `current` pointer via atomic rename. */
  def commitChunk(
      table: String,
      chunk: Int,
      totalChunks: Int,
      counters: Map[String, Long]
  ): Snapshot = {
    val prev = currentSnapshot(table)
    val id = prev.map(_.id + 1).getOrElse(0L)
    val chunks = prev.map(_.committedChunks).getOrElse(Set.empty) + chunk
    val mergedCounters = prev.map(_.counters).getOrElse(Map.empty) ++
      counters.map { case (k, v) =>
        k -> (prev.flatMap(_.counters.get(k)).getOrElse(0L) + v)
      }
    val snap = Snapshot(id, chunks, totalChunks, mergedCounters)
    val body = renderSnapshot(snap)
    val vFile = metaDir(table).resolve(s"v$id.json")
    Files.write(vFile, body.getBytes(StandardCharsets.UTF_8))
    val tmp = metaDir(table).resolve(s".current.tmp.$id")
    Files.write(tmp, s"v$id.json".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir(table).resolve("current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  /** Data dirs of the current snapshot (what a reader should scan). */
  def committedDataDirs(table: String): Seq[String] =
    currentSnapshot(table).toSeq.flatMap(_.committedChunks.toSeq.sorted
      .map(chunkDir(table, _)))
      .filter(d => Files.exists(Paths.get(d)))

  def isComplete(table: String): Boolean =
    currentSnapshot(table).exists(s => s.committedChunks.size == s.totalChunks)

  /** A specific snapshot version from the metadata log (time travel). */
  def snapshotAt(table: String, id: Long): Option[Snapshot] = {
    val f = metaDir(table).resolve(s"v$id.json")
    if (Files.exists(f)) Some(parseSnapshot(Files.readString(f))) else None
  }

  /** Incremental append consumption — the Iceberg incremental-scan
    * contract: the chunk dirs committed AFTER snapshot `afterId`
    * (exclusive) up to `upToId` (inclusive; default the current snapshot).
    * Chunks are append-only and never rewritten once committed (the
    * table's commit discipline), so the delta between two snapshots IS
    * the set difference of their committed-chunk sets — a downstream
    * consumer (dedup index, embedding build, replication) processes only
    * new data instead of rescanning the table. Throws if either snapshot
    * id is absent from the metadata log: a consumer holding a stale
    * cursor must hear about it, not silently rescan nothing. */
  def incrementalDataDirs(table: String, afterId: Long,
                          upToId: Option[Long] = None): Seq[String] = {
    val from = snapshotAt(table, afterId).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot v$afterId missing from $table metadata log"))
    val to = upToId match {
      case Some(id) => snapshotAt(table, id).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot v$id missing from $table metadata log"))
      case None => currentSnapshot(table).getOrElse(
        throw new IllegalArgumentException(s"no current snapshot at $table"))
    }
    require(to.id >= from.id,
      s"incremental range inverted: v${from.id} → v${to.id}")
    (to.committedChunks -- from.committedChunks).toSeq.sorted
      .map(chunkDir(table, _))
      .filter(d => Files.exists(Paths.get(d)))
  }

  // ---- (de)serialization ---------------------------------------------------

  private def renderSnapshot(s: Snapshot): String = {
    val chunks = s.committedChunks.toSeq.sorted.mkString("[", ",", "]")
    val counters = s.counters.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"snapshot_id":${s.id},"total_chunks":${s.totalChunks},"committed_chunks":$chunks,"counters":$counters}"""
  }

  private[table] def parseSnapshot(json: String): Snapshot = {
    def longField(name: String): Long = {
      val m = s""""$name"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(json)
      m.map(_.group(1).toLong).getOrElse(
        throw new IllegalStateException(s"bad snapshot json: missing $name"))
    }
    def arrField(name: String): Set[Int] = {
      val m = s""""$name"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(json)
      m.map(_.group(1).trim).filter(_.nonEmpty)
        .map(_.split(",").map(_.trim.toInt).toSet).getOrElse(Set.empty)
    }
    val countersRe = """"counters"\s*:\s*\{([^}]*)\}""".r
    val counters = countersRe.findFirstMatchIn(json).map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) => Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toLong)
          case _ => None
        }
      }.toMap).getOrElse(Map.empty[String, Long])
    Snapshot(longField("snapshot_id"), arrField("committed_chunks"),
      longField("total_chunks").toInt, counters)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Using.resource(Files.list(p))(_.iterator().asScala.foreach(deleteRecursively))
    Files.deleteIfExists(p)
  }
}
