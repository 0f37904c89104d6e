package graft.app

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{ClipRow, FilterConfig}
import graft.pipeline.FilterPipeline
import graft.table.SnapshotTable
import graft.text.TextModel

/** The resumable filter job (SURVEY §7.2 steps 5-7).
  *
  * The input scan is split into `chunks` deterministic slices by data file
  * (the Iceberg planning unit — reference analog: the batch loop with
  * per-item isolation, `Backend/app.py:429-461`, lifted to file granularity).
  * Each chunk: read only its files → pipeline → salted repartition →
  * partitioned write → atomic snapshot commit. Kill + rerun resumes at the
  * first uncommitted chunk and reprocesses nothing committed.
  *
  * Salted repartition (north-rule skew clause): output partitioning is
  * (keep, lang) and one language is ~70% of rows, so shuffling by lang
  * would hot-spot one writer task. `pmod(xxhash64(clip_id), S)` spreads
  * every cohort uniformly over S shuffle partitions; each writer task then
  * appends to its own file per (keep, lang) dir. Skew defused without any
  * custom strategy (SURVEY §4.1).
  */
object FilterJob {

  val clipSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("sr_hz", IntegerType, nullable = false),
    StructField("dur_ms", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("transcript", StringType, nullable = true)
  ))

  final case class JobArgs(
      input: String,
      output: String,
      preset: String = "default",
      chunks: Int = 8,
      saltBuckets: Int = 8,
      // >1 runs that many chunk jobs concurrently (Spark interleaves their
      // stages, overlapping one chunk's write with another's decode);
      // snapshot commits stay serialized, so resume semantics are unchanged
      parallelChunks: Int = 2,
      // input wire format: parquet (binary bytes), jsonl or csv (base64
      // bytes_b64 — the reference's upload shape, SURVEY S1)
      format: String = "parquet"
  ) {
    require(Set("parquet", "jsonl", "csv").contains(format), s"format $format")
  }

  def readClips(spark: SparkSession, paths: Seq[String],
                format: String = "parquet"): Dataset[ClipRow] = {
    import spark.implicits._
    format match {
      case "jsonl" => graft.sources.ClipSources.readJsonl(spark, paths)
      case "csv"   => graft.sources.ClipSources.readCsv(spark, paths)
      case _ =>
        // The blob scan reads ~100 KB binary cells: the vectorized reader
        // grows one contiguous on-heap buffer per batch to hundreds of MB
        // (copy-on-grow, OOM-prone at wide parallelism) and measured 1.9x
        // SLOWER than the streaming row reader on this column shape
        // (ScanProbe, 50k clips: 2.39 s vectorized vs 1.28 s row reader).
        // The conf is scoped to a cloned session so every other parquet
        // scan in the application (skinny text/scalar columns, where the
        // columnar batch path wins) keeps the vectorized reader.
        val scanSession = spark.newSession()
        scanSession.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
        scanSession.read.schema(clipSchema).parquet(paths: _*)
          .na.fill(Map("transcript" -> ""))
          .as[ClipRow]
    }
  }

  private def extensionFor(format: String): String = format match {
    case "jsonl" => ".jsonl"
    case "csv"   => ".csv"
    case _       => ".parquet"
  }

  /** List input parquet data files, deterministically ordered.
    *
    * If the input is itself a snapshot table (has `metadata/current`), the
    * listing is PINNED to the committed snapshot's data dirs — files landing
    * after the job starts are invisible, so a resumed run sees exactly the
    * same input as the original (the Iceberg snapshot-read semantic).
    *
    * The walk is a level-synchronized parallel BFS on a small driver pool:
    * at 10^9-file scale a serial recursive listing is the last driver-side
    * bottleneck; directories at each depth are listed concurrently. */
  def listDataFiles(spark: SparkSession, input: String,
                    listParallelism: Int = 16,
                    format: String = "parquet"): Seq[String] = {
    val fs = FileSystem.get(new HPath(input).toUri, spark.sparkContext.hadoopConfiguration)
    val roots = graft.table.SnapshotTable.currentSnapshot(input) match {
      case Some(_) => graft.table.SnapshotTable.committedDataDirs(input)
      case None    => Seq(input)
    }
    val ext = extensionFor(format)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(listParallelism)
    try {
      val files = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      var frontier: Seq[HPath] = roots.map(new HPath(_))
      while (frontier.nonEmpty) {
        val futures = frontier.map { p =>
          pool.submit(new java.util.concurrent.Callable[Seq[HPath]] {
            def call(): Seq[HPath] = {
              val st = fs.listStatus(p)
              st.foreach { s =>
                if (!s.isDirectory && s.getPath.getName.endsWith(ext))
                  files.add(s.getPath.toString)
              }
              st.collect { case s if s.isDirectory => s.getPath }.toSeq
            }
          })
        }
        frontier = futures.flatMap(_.get())
      }
      import scala.jdk.CollectionConverters._
      files.asScala.toSeq.sorted
    } finally pool.shutdown()
  }

  /** Run (or resume) the job; returns the final counters. */
  def run(spark: SparkSession, args: JobArgs,
          cfgOverride: Option[FilterConfig] = None): Map[String, Long] = {
    val cfg = cfgOverride.getOrElse(graft.model.Presets(args.preset))
    val model = spark.sparkContext.broadcast(TextModel.default)
    val committed0 = SnapshotTable.open(args.output, args.chunks)
    // Resume pins the input to the manifest the FIRST run planned: for
    // plain-directory inputs, files added between a kill and the rerun would
    // otherwise reshuffle the round-robin chunk slices — committed chunks
    // would keep old slices while new chunks used new ones (silent dups /
    // omissions). First run writes the manifest before any chunk commits.
    val files = SnapshotTable.readManifest(args.output).getOrElse {
      val listed = listDataFiles(spark, args.input, format = args.format)
      SnapshotTable.writeManifest(args.output, listed)
      listed
    }

    // timing prints opt in via env OR system property (the property lets
    // an in-process harness like BenchExtra enable them without a re-exec)
    val verbose = sys.env.contains("GRAFT_JOB_TIMING") ||
      sys.props.contains("graft.job.timing")
    val commitLock = new Object
    def processChunk(c: Int): Unit = {
      val t0 = System.nanoTime()
      var tWrite = 0.0; var tStats = 0.0; var tCommit = 0.0
      // round-robin file assignment → even chunk sizes
      val slice = files.zipWithIndex.collect { case (f, i) if i % args.chunks == c => f }
      val counters = new FilterPipeline.Counters(spark)
      var chunkSchema: Option[String] = None
      if (slice.nonEmpty) {
        val clips = readClips(spark, slice, args.format)
        val (dec, release) =
          FilterPipeline.decisionsManaged(clips, cfg, model, Some(counters))
        // shuffle key = output partition columns + clip_id-hash salt: every
        // writer task holds a handful of (keep, lang, salt) groups, so the
        // file count stays ≈ |keep|·|lang|·salt per chunk instead of
        // tasks × dirs, and the salt still spreads the 70%-language cohort
        // over `saltBuckets` tasks (the skew clause)
        val salted = dec.repartition(
          col("keep"), col("lang"),
          pmod(xxhash64(col("clip_id")), lit(args.saltBuckets)))
        // manifest zone maps: min/max of the numeric decision columns,
        // harvested as OBSERVATION metrics inside the write action itself —
        // the rows being written ARE the chunk's rows, so the aggregates
        // are identical to the round-5 post-write re-read of the chunk
        // files, without scheduling a second scan job per chunk (the
        // re-read was a per-chunk straggler the bench's pipeline rows paid
        // 4× per run; guide §1.2 "don't compute things you throw away")
        val statCols = Seq("dur_ms", "sr_hz", "ppl_char")
          .filter(dec.columns.contains)
        val obs = org.apache.spark.sql.Observation(
          s"graft_chunk_stats_${c}_${System.nanoTime()}")
        val observed =
          if (statCols.isEmpty) salted
          else salted.observe(obs,
            min(col(statCols.head)).cast("double").as(s"min_${statCols.head}"),
            (statCols.tail.map(cc =>
              min(col(cc)).cast("double").as(s"min_$cc")) ++
              statCols.map(cc =>
                max(col(cc)).cast("double").as(s"max_$cc"))): _*)
        val tw0 = System.nanoTime()
        observed.write.mode("overwrite")
          .partitionBy("keep", "lang")
          .parquet(SnapshotTable.chunkDir(args.output, c))
        tWrite = (System.nanoTime() - tw0) / 1e9
        // record the decisions schema in the snapshot metadata (the
        // Iceberg schema-tracking analog): identical across chunks of a
        // run, so the carry-forward/additive validation is a no-op here —
        // but a later run appending a widened decisions row evolves the
        // table for readAligned consumers instead of silently diverging
        chunkSchema = Some(dec.schema.toDDL)
        // stats sidecar still lands BEFORE the commit, same discipline:
        // an uncommitted chunk's sidecar is harmless, a committed chunk
        // missing stats is merely unprunable
        val ts0 = System.nanoTime()
        if (statCols.nonEmpty) {
          val row = obs.get
          val stats = statCols.flatMap { cc =>
            (Option(row.getOrElse(s"min_$cc", null)),
              Option(row.getOrElse(s"max_$cc", null))) match {
              case (Some(lo), Some(hi)) =>
                Some(cc -> (lo.asInstanceOf[Double], hi.asInstanceOf[Double]))
              case _ => None
            }
          }.toMap
          SnapshotTable.writeChunkStats(args.output, c, stats)
        }
        tStats = (System.nanoTime() - ts0) / 1e9
        // adaptive mode persisted the chunk's features (two scans: cohort
        // stats + decisions); the write action consumed both — release it
        release()
      }
      // the metadata log is read-modify-write; serialize commits (chunk
      // ORDER in the log is irrelevant — snapshots carry a chunk-id set)
      val tc0 = System.nanoTime()
      commitLock.synchronized {
        SnapshotTable.commitChunk(args.output, c, args.chunks, Map(
          "rows" -> counters.rows.value,
          "decode_errors" -> counters.decodeErrors.value,
          "scrubbed" -> counters.scrubbed.value
        ), schema = chunkSchema)
      }
      tCommit = (System.nanoTime() - tc0) / 1e9
      if (verbose) {
        val total = (System.nanoTime() - t0) / 1e9
        // write includes decode+score (they stream into the write action);
        // stats is the observation harvest + sidecar, commit the log append
        println(f"[graft.job] chunk $c: $total%.2f s " +
          f"(decode+write $tWrite%.2f, stats $tStats%.3f, commit $tCommit%.3f)")
      }
    }

    val pending = (0 until args.chunks).filterNot(committed0.contains)
    if (args.parallelChunks <= 1 || pending.size <= 1) pending.foreach(processChunk)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(args.parallelChunks)
      try {
        val futures = pending.map(c =>
          pool.submit(new Runnable { def run(): Unit = processChunk(c) }))
        futures.foreach(_.get()) // propagate the first failure
      } catch {
        case e: Throwable =>
          // don't let still-running chunks keep committing snapshots after
          // run() has already reported failure to the caller
          pool.shutdownNow()
          pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS)
          throw e
      } finally pool.shutdown()
    }
    val snap = SnapshotTable.currentSnapshot(args.output)
    snap.map(_.counters).getOrElse(Map.empty)
  }

  /** Snapshot-pinned read of the committed decision table. Partition-column
    * type inference never yields booleans, so `keep` (a partition dir) comes
    * back as string — cast the partition columns to their logical types. */
  def readDecisions(spark: SparkSession, table: String): DataFrame = {
    val dirs = SnapshotTable.committedDataDirs(table)
    require(dirs.nonEmpty, s"no committed snapshot at $table")
    spark.read.option("basePath", table + "/data").parquet(dirs: _*)
      .withColumn("keep", col("keep").cast("boolean"))
      .withColumn("chunk", col("chunk").cast("int"))
  }

  /** Incremental read of the decisions committed AFTER snapshot `afterId`
    * (exclusive) — the Iceberg incremental-append-scan pattern: a
    * downstream consumer (dedup index, embedding build, replication)
    * checkpoints the snapshot id it last processed and scans only the
    * delta chunks, never the whole table. Empty delta → empty frame with
    * the table schema (a consumer polling an unchanged table gets a
    * well-typed no-op). */
  def readDecisionsSince(spark: SparkSession, table: String,
                         afterId: Long): DataFrame = {
    val dirs = SnapshotTable.incrementalDataDirs(table, afterId)
    if (dirs.isEmpty) readDecisions(spark, table).limit(0)
    else spark.read.option("basePath", table + "/data").parquet(dirs: _*)
      .withColumn("keep", col("keep").cast("boolean"))
      .withColumn("chunk", col("chunk").cast("int"))
  }

  /** Per-partition lineage table of the committed output (reference C4/G12
    * lineage contract) — computed over the cheap scalar columns of the
    * written table, aggregated map-side. */
  def lineageOf(spark: SparkSession, table: String): DataFrame =
    FilterPipeline.lineage(readDecisions(spark, table))

  /** Ingest-drift audit: PSI of the batch committed AFTER snapshot
    * `afterId` against the corpus as of `afterId`, over any numeric
    * decision column (duration, confidence, perplexity, …) — the
    * stop-the-line monitor a 10^12-clip ingest runs per commit: a shifted
    * index (> 0.25 on the standard lights) means today's data does not
    * look like the table it is joining, BEFORE downstream training eats
    * it. Pure read-side composition: two snapshot-pinned scans feeding
    * [[graft.pipeline.TextProfile.psiDrift]] (bucket-count rows only
    * after the scans); nothing is written and no metadata changes. */
  def driftSince(spark: SparkSession, table: String, afterId: Long,
                 metric: org.apache.spark.sql.Column, bucketWidth: Double,
                 nBuckets: Int): DataFrame = {
    val base = SnapshotTable.snapshotAt(table, afterId).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot v$afterId missing from $table metadata log"))
    val refDirs = base.committedChunks.toSeq.sorted
      .map(SnapshotTable.chunkDir(table, _))
      .filter(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
    require(refDirs.nonEmpty, s"snapshot v$afterId has no data chunks")
    val curDirs = SnapshotTable.incrementalDataDirs(table, afterId)
    require(curDirs.nonEmpty, s"no batch committed after v$afterId — " +
      "nothing to audit")
    def read(dirs: Seq[String]) =
      spark.read.option("basePath", table + "/data").parquet(dirs: _*)
    graft.pipeline.TextProfile.psiDrift(
      read(refDirs), read(curDirs), metric, bucketWidth, nBuckets)
  }
}
