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
      counters: Map[String, Long],
      schema: Option[String] = None,
      deleteFiles: Seq[String] = Nil
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

  /** Begin (or resume) a write: ensures dirs exist, deletes any
    * uncommitted chunk dirs left by a killed run, and repairs a compaction
    * that crashed mid-swap (committed chunk dir missing, retained pre-
    * compaction files present → restore them). Returns committed set. */
  def open(table: String, totalChunks: Int): Set[Int] = {
    Files.createDirectories(metaDir(table))
    Files.createDirectories(Paths.get(table, "data"))
    val committed = currentSnapshot(table).map(_.committedChunks).getOrElse(Set.empty)
    // clean partial output of uncommitted chunks (idempotent resume) and
    // tmp dirs of compactions that crashed before their swap
    val dataDir = Paths.get(table, "data")
    val liveDeletes = referencedDeleteFiles(table)
    Using.resource(Files.list(dataDir)) { stream =>
      stream.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("chunk=")) {
          val id = n.stripPrefix("chunk=").toInt
          if (!committed.contains(id)) deleteRecursively(p)
        } else if (n.startsWith(".compact-tmp-")) deleteRecursively(p)
        else if (n.startsWith(".delete-") && !liveDeletes.contains(n))
          // stageDelete crashed between its parquet write and its commit:
          // no snapshot in the log references the dir, so it never happened
          deleteRecursively(p)
      }
    }
    // compaction/purge crash window: old dir already renamed to its
    // retention name, new dir not yet moved into place — restoring the
    // newest retention copy restores the still-current snapshot's committed
    // view exactly (compaction preserves rows; a purge's snapshot was never
    // committed, and the current one keeps applying its delete files)
    committed.foreach { c =>
      val live = Paths.get(chunkDir(table, c))
      if (!Files.exists(live)) retainedDirs(table, c).sortBy(-_._2)
        .headOption.foreach { case (p, _) =>
          Files.move(p, live, StandardCopyOption.ATOMIC_MOVE)
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
      counters: Map[String, Long],
      schema: Option[String] = None
  ): Snapshot = {
    val prev = currentSnapshot(table)
    val id = prev.map(_.id + 1).getOrElse(0L)
    val chunks = prev.map(_.committedChunks).getOrElse(Set.empty) + chunk
    val mergedCounters = prev.map(_.counters).getOrElse(Map.empty) ++
      counters.map { case (k, v) =>
        k -> (prev.flatMap(_.counters.get(k)).getOrElse(0L) + v)
      }
    // schema carries forward unless this commit declares one; a declared
    // schema must be additive over the table's current schema
    val prevSchema = prev.flatMap(_.schema)
    schema.foreach(s => prevSchema.foreach(validateAdditive(_, s)))
    val snap = Snapshot(id, chunks, totalChunks, mergedCounters,
      schema.orElse(prevSchema), prev.map(_.deleteFiles).getOrElse(Nil))
    writeSnapshot(table, snap)
    snap
  }

  private def writeSnapshot(table: String, snap: Snapshot): Unit = {
    val body = renderSnapshot(snap)
    val vFile = metaDir(table).resolve(s"v${snap.id}.json")
    Files.write(vFile, body.getBytes(StandardCharsets.UTF_8))
    val tmp = metaDir(table).resolve(s".current.tmp.${snap.id}")
    Files.write(tmp, s"v${snap.id}.json".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir(table).resolve("current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- schema evolution (Iceberg schema-evolution analog) ------------------

  /** Additive-evolution contract: every existing column keeps its position,
    * name and type; new nullable columns may only be appended. Renames,
    * drops, type changes and reorders fail loudly — they would silently
    * corrupt old-chunk reads in a name-based parquet world (Iceberg does
    * field-id tracking to permit them; a name-based table must not). */
  /** Nullability-normalized type (all fields/elements nullable): a
    * snapshot schema is a READ contract — parquet files round-trip
    * through partitioned writes and appends where Spark cannot prove
    * non-nullness, so NOT NULL markers in a recorded DDL would make the
    * aligned cast illegal and additive comparison brittle. */
  private def asAllNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = asAllNullable(f.dataType), nullable = true)))
      case a: ArrayType =>
        ArrayType(asAllNullable(a.elementType), containsNull = true)
      case m: MapType => MapType(asAllNullable(m.keyType),
        asAllNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  private[table] def validateAdditive(oldDdl: String, newDdl: String): Unit = {
    import org.apache.spark.sql.types.StructType
    val o = StructType.fromDDL(oldDdl)
    val n = StructType.fromDDL(newDdl)
    require(n.length >= o.length,
      s"schema evolution dropped columns: ${o.length} -> ${n.length}")
    o.zip(n.take(o.length)).foreach { case (oc, nc) =>
      require(oc.name == nc.name &&
          asAllNullable(oc.dataType) == asAllNullable(nc.dataType),
        s"schema evolution must be additive: column '${oc.name}: " +
          s"${oc.dataType.simpleString}' became '${nc.name}: " +
          s"${nc.dataType.simpleString}' (renames/type changes/reorders " +
          "are not supported in a name-based parquet table)")
    }
  }

  /** Metadata-only schema evolution (Iceberg `ALTER TABLE ... ADD COLUMN`):
    * commits a new snapshot with the evolved schema and unchanged data.
    * Existing chunks are never rewritten — readers reconcile via
    * [[readAligned]] (absent columns read as null). The new schema must be
    * additive over the current one ([[validateAdditive]]); evolving a
    * table with no current snapshot fails (nothing to evolve). */
  def evolveSchema(table: String, newDdl: String): Snapshot = {
    val prev = currentSnapshot(table).getOrElse(throw new IllegalStateException(
      s"evolveSchema: no current snapshot at $table"))
    prev.schema.foreach(validateAdditive(_, newDdl))
    // also reject a self-inconsistent DDL early
    org.apache.spark.sql.types.StructType.fromDDL(newDdl)
    val snap = prev.copy(id = prev.id + 1, schema = Some(newDdl))
    writeSnapshot(table, snap)
    snap
  }

  /** Schema-aligned table read: scans the snapshot's committed chunk dirs
    * and reconciles every row to the snapshot's recorded schema — columns
    * absent from old chunks (added by a later-than-that-chunk
    * [[evolveSchema]]) read as typed nulls, columns added AFTER the pinned
    * snapshot are invisible (time-travel reads see the schema of their
    * snapshot, not the current one), and column order is the schema's.
    * Falls back to the files' merged schema when the snapshot predates
    * schema tracking. The snapshot's staged equality deletes
    * ([[stageDelete]]) are applied (merge-on-read): rows matching a visible
    * delete file never surface; a snapshot pinned BEFORE a delete still
    * sees the rows. `applyDeletes = false` exposes the raw physical rows
    * (maintenance/debug only). */
  def readAligned(spark: org.apache.spark.sql.SparkSession, table: String,
                  atSnapshot: Option[Long] = None,
                  applyDeletes: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap = atSnapshot
      .map(id => snapshotAt(table, id).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot v$id missing from $table metadata log")))
      .orElse(currentSnapshot(table))
      .getOrElse(throw new IllegalStateException(
        s"readAligned: no snapshot at $table"))
    val dirs = snap.committedChunks.toSeq.sorted.map(chunkDir(table, _))
      .filter(d => Files.exists(Paths.get(d)))
    require(dirs.nonEmpty, s"readAligned: snapshot v${snap.id} has no data")
    // basePath keeps the chunk=N dirs (and any partitionBy subdirs under
    // them) parsing as partition columns of ONE table rather than
    // conflicting roots. Chunks may carry DIFFERENT partition layouts
    // (Iceberg partition-spec evolution: a table can re-partition its
    // future chunks without rewriting the past) — one Spark read cannot
    // mix layouts, so chunks group by their key=value dir signature, each
    // group reads under the shared basePath, and the groups union by name
    // (a column that is dir-encoded in one layout and file-encoded in
    // another reconciles; one absent from a chunk entirely reads as null,
    // the schema-evolution semantic)
    val raw = dirs.groupBy(d => partitionColsOf(d)).toSeq
      .sortBy(_._1.mkString(","))
      .map { case (_, ds) =>
        spark.read.option("mergeSchema", "true")
          .option("basePath", Paths.get(table, "data").toString)
          .parquet(ds: _*)
      }
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    val aligned = snap.schema match {
      case None => raw
      case Some(ddl) =>
        val target = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        val have = raw.columns.toSet
        raw.select(target.fields.toSeq.map { f =>
          val t = asAllNullable(f.dataType)
          if (have.contains(f.name)) col(f.name).cast(t)
          else lit(null).cast(t).as(f.name)
        }: _*)
    }
    if (applyDeletes) applyDeleteFiles(spark, table, snap, aligned)
    else aligned
  }

  /** Data dirs of the current snapshot (what a reader should scan). */
  def committedDataDirs(table: String): Seq[String] =
    currentSnapshot(table).toSeq.flatMap(_.committedChunks.toSeq.sorted
      .map(chunkDir(table, _)))
      .filter(d => Files.exists(Paths.get(d)))

  def isComplete(table: String): Boolean =
    currentSnapshot(table).exists(s => s.committedChunks.size == s.totalChunks)

  /** A specific snapshot version from the metadata log (time travel).
    * A version that EXISTED but was removed by [[expireSnapshots]] fails
    * loudly — a reader pinned to an expired snapshot must hear that its
    * snapshot is gone, never silently fall back to nothing. */
  def snapshotAt(table: String, id: Long): Option[Snapshot] = {
    val f = metaDir(table).resolve(s"v$id.json")
    if (Files.exists(f)) Some(parseSnapshot(Files.readString(f)))
    else if (currentSnapshot(table).exists(_.id > id))
      throw new IllegalStateException(
        s"snapshot v$id at $table was expired by retention " +
          "(expireSnapshots); re-pin to a retained snapshot")
    else None
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

  // ---- equality deletes (Iceberg merge-on-read delete files) ---------------

  /** Delete-file dirs referenced by ANY snapshot still in the metadata log
    * (time travel can reach each of them until [[expireSnapshots]] drops
    * the last referencing version). */
  private def referencedDeleteFiles(table: String): Set[String] = {
    val md = metaDir(table)
    if (!Files.exists(md)) return Set.empty
    val vRe = """v\d+\.json""".r
    Using.resource(Files.list(md)) { stream =>
      stream.iterator().asScala
        .filter(p => vRe.pattern.matcher(p.getFileName.toString).matches())
        .flatMap(p => parseSnapshot(Files.readString(p)).deleteFiles)
        .toSet
    }
  }

  /** Stage an equality delete (Iceberg merge-on-read delete file): the
    * takedown/GDPR path — removing specific clip ids from a 10^12-row table
    * must not rewrite a single data file on the hot path. The distinct,
    * non-null keys are written as a parquet delete file
    * (`data/.delete-v<id>`, single column = `keyCol`) and a new snapshot
    * commits with the file appended to its visible delete list. Readers
    * ([[readAligned]]) apply every visible delete file as a broadcast
    * anti-join; old snapshots keep their shorter delete lists, so a
    * time-travel read pinned before the delete still sees the rows.
    * Physical reclamation is [[purgeDeletes]]. A crash between the parquet
    * write and the snapshot commit leaves an orphan dir that the next
    * [[open]] sweeps.
    *
    * TOMBSTONE-UNTIL-PURGE semantics, deliberately: a staged delete file
    * carries forward to every later snapshot and [[readAligned]] applies
    * every visible file to the WHOLE read — so a row re-ingested after a
    * takedown under a previously-deleted key stays invisible until
    * [[purgeDeletes]] rewrites the data and drops the tombstones. This is
    * stricter than Iceberg's sequence-number-scoped equality deletes
    * (which only mask files older than the delete) and is the intended
    * behavior for the takedown/GDPR use case this surface serves: a
    * removed key stays removed until the operator physically purges and
    * re-admits it. Run purgeDeletes before re-ingesting content that is
    * MEANT to come back. */
  def stageDelete(spark: org.apache.spark.sql.SparkSession, table: String,
                  keyCol: String,
                  keys: org.apache.spark.sql.DataFrame): Snapshot = {
    import org.apache.spark.sql.functions.col
    val prev = currentSnapshot(table).getOrElse(throw new IllegalStateException(
      s"stageDelete: no current snapshot at $table"))
    prev.schema.foreach { ddl =>
      val names = org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames
      require(names.contains(keyCol),
        s"stageDelete: key column '$keyCol' is not in the table schema " +
          s"(${names.mkString(", ")})")
    }
    val id = prev.id + 1
    val name = s".delete-v$id"
    val dir = Paths.get(table, "data", name)
    deleteRecursively(dir)
    val distinct = keys.select(col(keyCol)).na.drop().distinct().persist()
    val n = distinct.count()
    require(n > 0, "stageDelete: empty key set (nothing to delete)")
    distinct.coalesce(1).write.parquet(dir.toString)
    distinct.unpersist()
    val snap = prev.copy(id = id,
      deleteFiles = prev.deleteFiles :+ name,
      counters = prev.counters +
        ("delete_keys_staged" ->
          (prev.counters.getOrElse("delete_keys_staged", 0L) + n)))
    writeSnapshot(table, snap)
    snap
  }

  /** Apply a snapshot's visible delete files to a read: one left-anti join
    * per delete file, each keyed on the file's own (single) column and cast
    * to the table column's type. Takedown lists are tiny next to the table,
    * so the delete side is broadcast — the corpus never shuffles for a
    * delete. A referenced file that is missing on disk fails loudly: the
    * snapshot's contract says those rows are gone, and silently returning
    * them would resurrect deleted data. */
  private def applyDeleteFiles(spark: org.apache.spark.sql.SparkSession,
                               table: String, snap: Snapshot,
                               df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    snap.deleteFiles.foldLeft(df) { (acc, name) =>
      val dir = Paths.get(table, "data", name)
      if (!Files.exists(dir)) throw new IllegalStateException(
        s"delete file $name referenced by snapshot v${snap.id} is missing " +
          s"from $table/data (expired or corrupted?)")
      val keys = spark.read.parquet(dir.toString)
      require(keys.columns.length == 1,
        s"delete file $name must have exactly one column, " +
          s"got ${keys.columns.mkString(", ")}")
      val kc = keys.columns.head
      require(acc.columns.contains(kc),
        s"delete key column '$kc' ($name) is absent from the table read")
      val typed = keys.select(col(kc).cast(acc.schema(kc).dataType).as(kc))
      acc.join(broadcast(typed), Seq(kc), "left_anti")
    }
  }

  /** Physically apply every staged delete (Iceberg
    * rewrite_data_files-with-deletes / "major compaction"): each committed
    * chunk is rewritten without the deleted rows — verified per chunk by
    * expected-row-count AND an order-insensitive content checksum against
    * the anti-joined frame before the swap — then one snapshot commits with
    * an empty delete list. Old file sets are retained
    * (`data/.chunk=<c>.v<id>.old`) and delete files stay on disk until
    * [[expireSnapshots]] drops the last snapshot referencing them.
    *
    * Precondition (loud): every snapshot still in the metadata log must
    * already see the full current delete list — physically removing rows
    * that an older retained snapshot can still time-travel to would
    * silently corrupt that view. Expire history down to the delete-aware
    * snapshots first (the Iceberg operational discipline: expire, then
    * reclaim). A crash mid-swap is repaired by [[open]] (the retained dir
    * restores; the not-yet-committed purge snapshot never existed, and the
    * still-current snapshot keeps applying its delete files at read). */
  def purgeDeletes(spark: org.apache.spark.sql.SparkSession,
                   table: String, targetTasks: Int = 1): Map[String, Long] = {
    val cur = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no current snapshot at $table"))
    if (cur.deleteFiles.isEmpty)
      return Map("chunks_rewritten" -> 0L, "rows_deleted" -> 0L)
    val wanted = cur.deleteFiles.toSet
    val vRe = """v(\d+)\.json""".r
    Using.resource(Files.list(metaDir(table))) { stream =>
      stream.iterator().asScala.foreach { p =>
        vRe.findFirstMatchIn(p.getFileName.toString).foreach { _ =>
          val s = parseSnapshot(Files.readString(p))
          require(wanted.subsetOf(s.deleteFiles.toSet),
            s"purgeDeletes: snapshot v${s.id} predates delete file(s) " +
              s"${(wanted -- s.deleteFiles.toSet).mkString(", ")} — a " +
              "time-travel read of it would lose rows it still claims; " +
              "expireSnapshots down to delete-aware versions first")
        }
      }
    }
    var rewritten = 0L
    var deleted = 0L
    cur.committedChunks.toSeq.sorted.foreach { c =>
      val live = chunkDir(table, c)
      val tmp = Paths.get(table, "data", s".compact-tmp-chunk=$c")
      deleteRecursively(tmp)
      val before = spark.read.option("basePath", live).parquet(live)
      val expected = applyDeleteFiles(spark, table, cur, before)
      val partCols = partitionColsOf(live)
      val writer = (if (partCols.nonEmpty)
          expected.repartition(math.max(1, targetTasks), partCols.map(
            org.apache.spark.sql.functions.col): _*)
        else expected.repartition(math.max(1, targetTasks)))
        .write.mode("overwrite")
      (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
        .parquet(tmp.toString)
      val (n0, _) = contentChecksum(before)
      val (ne, xe) = contentChecksum(expected)
      val (n1, x1) = contentChecksum(
        spark.read.option("basePath", tmp.toString).parquet(tmp.toString))
      if (ne != n1 || xe != x1) {
        deleteRecursively(tmp)
        throw new IllegalStateException(
          s"purge rewrite of $live failed verification: rows $ne→$n1, " +
            s"checksum $xe→$x1 — rewrite discarded, chunk untouched")
      }
      val retained = Paths.get(table, "data", s".chunk=$c.v${cur.id}.old")
      deleteRecursively(retained)
      Files.move(Paths.get(live), retained, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
      rewritten += 1
      deleted += n0 - ne
    }
    val snap = cur.copy(id = cur.id + 1, deleteFiles = Nil,
      counters = cur.counters +
        ("delete_rows_purged" ->
          (cur.counters.getOrElse("delete_rows_purged", 0L) + deleted)))
    writeSnapshot(table, snap)
    Map("chunks_rewritten" -> rewritten, "rows_deleted" -> deleted)
  }

  /** Row count + order-insensitive content checksum of a frame (bit_xor of
    * xxhash64 over every column, sorted column order) — the multiset
    * fingerprint maintenance rewrites are verified against. */
  private def contentChecksum(df: org.apache.spark.sql.DataFrame)
      : (Long, Long) = {
    import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val row = df.select(count(lit(1)), bit_xor(xxhash64(cols: _*))).collect()(0)
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  /** Partition columns of a Hive-layout chunk dir: the key=value directory
    * levels between the chunk dir and the data files, walked one branch
    * down (every branch has the same depth and keys). */
  private def partitionColsOf(live: String): Seq[String] = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = Paths.get(live)
    var descend = true
    while (descend) {
      val kv = Using.resource(Files.list(at))(_.iterator().asScala
        .find(p => Files.isDirectory(p) &&
          p.getFileName.toString.contains("=")))
      kv match {
        case Some(p) =>
          keys += p.getFileName.toString.takeWhile(_ != '='); at = p
        case None => descend = false
      }
    }
    keys.toSeq
  }

  // ---- chunk column statistics (Iceberg manifest zone maps) ----------------

  /** Numeric min/max for `cols` over a frame — one map-side-combined
    * aggregate; call it on the rows just written to a chunk and hand the
    * result to [[writeChunkStats]]. Columns that are all-null (or absent)
    * drop out of the map. */
  def chunkStats(df: org.apache.spark.sql.DataFrame,
                 cols: Seq[String]): Map[String, (Double, Double)] = {
    import org.apache.spark.sql.functions.{col, max, min}
    val present = cols.filter(df.columns.contains)
    if (present.isEmpty) return Map.empty
    val row = df.agg(
      min(col(present.head)).cast("double").as(s"min_${present.head}"),
      (present.tail.map(c => min(col(c)).cast("double").as(s"min_$c")) ++
        present.map(c => max(col(c)).cast("double").as(s"max_$c"))): _*
    ).collect()(0)
    present.flatMap { c =>
      val lo = row.getAs[Any](s"min_$c")
      val hi = row.getAs[Any](s"max_$c")
      if (lo == null || hi == null) None
      else Some(c -> (lo.asInstanceOf[Double], hi.asInstanceOf[Double]))
    }.toMap
  }

  /** Persist a chunk's column min/max sidecar
    * (`metadata/stats-chunk=<c>.json`) — the Iceberg manifest column-stats
    * analog. Written BEFORE the chunk's commit (same discipline as data:
    * an uncommitted chunk's sidecar is harmless; a committed chunk missing
    * its sidecar is merely unprunable, never wrong). Stats survive
    * [[compactChunk]] untouched because compaction preserves the row
    * multiset, and they are tiny: one file of a few numbers per chunk. */
  def writeChunkStats(table: String, chunk: Int,
                      stats: Map[String, (Double, Double)]): Unit = {
    Files.createDirectories(metaDir(table))
    val body = stats.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
      s""""$c":[$lo,$hi]"""
    }.mkString("{", ",", "}")
    val tmp = metaDir(table).resolve(s".stats-chunk=$chunk.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metaDir(table).resolve(s"stats-chunk=$chunk.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** A chunk's persisted stats, if a sidecar exists. */
  def readChunkStats(table: String, chunk: Int): Option[Map[String, (Double, Double)]] = {
    val f = metaDir(table).resolve(s"stats-chunk=$chunk.json")
    if (!Files.exists(f)) return None
    val body = Files.readString(f)
    val re = """"((?:[^"\\]|\\.)*)"\s*:\s*\[\s*([^,\]]+)\s*,\s*([^\]]+)\s*\]""".r
    Some(re.findAllMatchIn(body)
      .map(m => m.group(1) -> (m.group(2).trim.toDouble, m.group(3).trim.toDouble))
      .toMap)
  }

  /** Chunk dirs of the current snapshot whose recorded [min,max] for
    * `colName` intersects [lo, hi] — manifest-level file skipping, decided
    * from a few bytes of metadata BEFORE Spark ever plans a scan (parquet
    * row-group stats prune only after every file is opened; at 10^12-clip
    * scale with thousands of chunks the open cost alone dominates a
    * selective read). A chunk with no sidecar, or no stats for `colName`,
    * is always returned: a zone map may only skip what it can PROVE
    * non-matching. Ranges are inclusive on both ends. */
  def prunedDataDirs(table: String, colName: String,
                     lo: Double, hi: Double): Seq[String] = {
    require(lo <= hi, s"inverted range [$lo, $hi]")
    currentSnapshot(table).toSeq.flatMap(_.committedChunks.toSeq.sorted)
      .filter { c =>
        readChunkStats(table, c).flatMap(_.get(colName)) match {
          case Some((cLo, cHi)) => cHi >= lo && cLo <= hi
          case None => true
        }
      }
      .map(chunkDir(table, _))
      .filter(d => Files.exists(Paths.get(d)))
  }

  // ---- table maintenance (Iceberg expire_snapshots / rewrite_data_files) --

  /** Retention dirs holding a chunk's pre-compaction files, with the
    * snapshot id that last referenced them: `data/.chunk=<c>.v<id>.old`. */
  private def retainedDirs(table: String, chunk: Int): Seq[(Path, Long)] = {
    val dataDir = Paths.get(table, "data")
    if (!Files.exists(dataDir)) return Seq.empty
    val re = (s"\\.chunk=$chunk\\.v(\\d+)\\.old").r
    Using.resource(Files.list(dataDir)) { stream =>
      stream.iterator().asScala.flatMap { p =>
        re.findFirstMatchIn(p.getFileName.toString)
          .map(m => p -> m.group(1).toLong)
      }.toSeq
    }
  }

  /** Expire all but the newest `keepLast` snapshots (Iceberg
    * `expire_snapshots`): without retention, a chunked-commit table at
    * 10^12-clip scale accretes one metadata version per chunk commit and
    * one retained pre-compaction file set per compaction, forever.
    * Deletes the expired `v<N>.json` metadata files plus every retained
    * pre-compaction dir no surviving snapshot references (its recorded
    * snapshot id predates the oldest kept version). The current snapshot
    * is always kept; a reader later calling [[snapshotAt]] /
    * [[incrementalDataDirs]] with an expired id fails loudly.
    * Returns the expired snapshot ids. */
  def expireSnapshots(table: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val cur = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no current snapshot at $table"))
    val vRe = """v(\d+)\.json""".r
    val ids = Using.resource(Files.list(metaDir(table))) { stream =>
      stream.iterator().asScala.flatMap(p =>
        vRe.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
        .toSeq.sorted
    }
    val kept = ids.takeRight(keepLast).toSet + cur.id
    val expired = ids.filterNot(kept)
    expired.foreach(id => Files.deleteIfExists(metaDir(table).resolve(s"v$id.json")))
    // retained pre-compaction files are referenced only by snapshots whose
    // id <= the retention tag; once the oldest kept version is newer, no
    // reader can reach them any more
    val minKept = kept.min
    cur.committedChunks.foreach { c =>
      retainedDirs(table, c).collect { case (p, id) if id < minKept =>
        deleteRecursively(p)
      }
    }
    // delete files whose last referencing snapshot was just expired (e.g.
    // after purgeDeletes emptied the current list) are unreachable now
    val stillReferenced = referencedDeleteFiles(table)
    val dataDir = Paths.get(table, "data")
    if (Files.exists(dataDir)) Using.resource(Files.list(dataDir)) { stream =>
      stream.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".delete-") && !stillReferenced.contains(n))
          deleteRecursively(p)
      }
    }
    expired
  }

  /** Small-file compaction for one committed chunk (Iceberg
    * `rewrite_data_files`): a chunked commit protocol writes
    * |keep|·|lang|·salt files per CHUNK — at 10^12-clip scale with
    * thousands of resumable chunks the per-file open cost starts to
    * dominate reads. Rewrites the chunk with `targetTasks` writer tasks
    * (≈1 file per partition leaf), preserving the row multiset exactly —
    * verified before the swap by row count + an order-insensitive content
    * checksum (bit_xor of xxhash64 over every column) — then swaps the
    * rewrite in with the old file set retained as
    * `data/.chunk=<c>.v<id>.old` until [[expireSnapshots]] drops the last
    * snapshot that could reference it. Commits a new snapshot (same chunk
    * set, bumped id) so the log records the rewrite. A crash mid-swap is
    * repaired by [[open]]. Readers see identical rows throughout: the
    * snapshot log pins chunk CONTENT, which compaction never changes.
    *
    * `sortBy` additionally CLUSTERS the rewrite (the Iceberg
    * rewrite_data_files sort-order analog): rows are range-partitioned
    * across the `targetTasks` writers on the sort columns and sorted
    * within each file, so parquet row-group/file min-max stats become
    * selective for range predicates on those columns — the chunk-level
    * zone maps ([[prunedDataDirs]]) skip whole chunks, and a sorted
    * rewrite makes the stats INSIDE a surviving chunk prune too. Same
    * row-multiset contract, same checksum gate. */
  def compactChunk(spark: org.apache.spark.sql.SparkSession, table: String,
                   chunk: Int, targetTasks: Int = 1,
                   sortBy: Seq[String] = Nil): Map[String, Long] = {
    import org.apache.spark.sql.functions.{bit_xor => bxor, col, xxhash64}
    val cur = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no current snapshot at $table"))
    require(cur.committedChunks.contains(chunk),
      s"chunk $chunk is not committed at $table (cannot compact)")
    val live = chunkDir(table, chunk)
    val tmp = Paths.get(table, "data", s".compact-tmp-chunk=$chunk")
    deleteRecursively(tmp)

    def checksum(dir: String): (Long, Long, Long) = {
      val df = spark.read.option("basePath", dir).parquet(dir)
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      val row = df.select(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        bxor(xxhash64(cols: _*))).collect()(0)
      val nFiles = countFiles(Paths.get(dir))
      (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1), nFiles)
    }

    val before = spark.read.option("basePath", live).parquet(live)
    val partCols = partitionColsOf(live)
    val shaped =
      if (sortBy.nonEmpty)
        // range-partition on the sort key so FILE ranges are disjoint (up
        // to boundary ties), then sort leaf-dir columns first so each
        // writer emits one run per leaf
        before.repartitionByRange(math.max(1, targetTasks), sortBy.map(col): _*)
          .sortWithinPartitions((partCols ++ sortBy).map(col): _*)
      else if (partCols.nonEmpty)
        before.repartition(math.max(1, targetTasks), partCols.map(col): _*)
      else before.repartition(math.max(1, targetTasks))
    val writer = shaped.write.mode("overwrite")
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(tmp.toString)

    val (n0, x0, files0) = checksum(live)
    val (n1, x1, files1) = checksum(tmp.toString)
    if (n0 != n1 || x0 != x1) {
      deleteRecursively(tmp)
      throw new IllegalStateException(
        s"compaction of $live failed verification: rows $n0→$n1, " +
          s"checksum $x0→$x1 — rewrite discarded, chunk untouched")
    }
    val retained = Paths.get(table, "data", s".chunk=$chunk.v${cur.id}.old")
    deleteRecursively(retained)
    Files.move(Paths.get(live), retained, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, Paths.get(live), StandardCopyOption.ATOMIC_MOVE)
    commitChunk(table, chunk, cur.totalChunks, Map(
      "compactions" -> 1L,
      "compacted_files_removed" -> math.max(0L, files0 - files1)))
    Map("rows" -> n0, "files_before" -> files0, "files_after" -> files1)
  }

  private def countFiles(p: Path): Long =
    if (Files.isDirectory(p))
      Using.resource(Files.list(p))(_.iterator().asScala.map(countFiles).sum)
    else if (p.getFileName.toString.endsWith(".parquet")) 1L else 0L

  // ---- (de)serialization ---------------------------------------------------

  private def renderSnapshot(s: Snapshot): String = {
    val chunks = s.committedChunks.toSeq.sorted.mkString("[", ",", "]")
    val counters = s.counters.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val schema = s.schema.fold("") { ddl =>
      val esc = ddl.replace("\\", "\\\\").replace("\"", "\\\"")
      s""","schema":"$esc""""
    }
    val dels =
      if (s.deleteFiles.isEmpty) ""
      else s.deleteFiles.map(d => s""""$d"""")
        .mkString(""","delete_files":[""", ",", "]")
    s"""{"snapshot_id":${s.id},"total_chunks":${s.totalChunks},"committed_chunks":$chunks,"counters":$counters$schema$dels}"""
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
    val schema = """"schema"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json)
      .map(m => """\\(.)""".r.replaceAllIn(m.group(1),
        mm => java.util.regex.Matcher.quoteReplacement(mm.group(1))))
    // delete-file names never contain quotes/backslashes (we generate them);
    // absent field (pre-delete-tracking snapshots) parses as empty
    val dels = """"delete_files"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(json).map(_.group(1).trim).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")))
      .getOrElse(Nil)
    Snapshot(longField("snapshot_id"), arrField("committed_chunks"),
      longField("total_chunks").toInt, counters, schema, dels)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Using.resource(Files.list(p))(_.iterator().asScala.foreach(deleteRecursively))
    Files.deleteIfExists(p)
  }
}
