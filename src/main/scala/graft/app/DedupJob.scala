package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** spark-submit entry for corpus deduplication — the library's dedup
  * operators as a runnable job over a documents table
  * `(id, text, …)`:
  *
  *   spark-submit --class graft.app.DedupJob <jar> \
  *     --input <documents parquet> --output <dir> \
  *     [--mode exact|minhash|simhash|fingerprint|containment|spans|substr|semdedup|incremental|sourcemirror] \
  *     [--source source] [--sketch false] \
  *     [--id doc_id] [--text text] [--minJaccard 0.5] \
  *     [--minContainment 0.9] [--maxBucket 65536] [--maxDocFreq 65536] \
  *     [--cluster true] [--checkpointDir <reliable dir>] [--smallGraph 2000000] \
  *     [--vec embedding] [--minSim 0.95] [--kClusters 256] \
  *     [--kmeansIters 2] [--maxCluster 4096]
  *
  * semdedup mode runs over an EMBEDDINGS table `(id, vec, …)` instead of
  * text: deterministic k-means buckets then within-cluster exact cosine ≥
  * --minSim (SemDeDup); hot_buckets/ reports clusters over --maxCluster.
  *
  * Outputs under --output:
  *   pairs/        verified duplicate pairs (or keepers/ for exact mode)
  *   hot_buckets/  the dropped-key report of the hot-bucket guard — a
  *                 capped run that silently reads as "covered everything"
  *                 is the anti-pattern; this table is the counter
  *   components/   (near-dup modes with --cluster true) the (id, comp)
  *                 cluster labels from large-star/small-star contraction
  *                 over the written pairs — a user running a near-dup mode
  *                 gets actionable one-keeper-per-cluster output, not a
  *                 pair list they still have to cluster
  *   keepers/      (with --cluster true) (keeper_id, cluster_size) per
  *                 component, derived from the written components table
  *   span_verdicts/ span_masks/ cleaned/  (spans mode) span-level dedup
  *                 verdicts, the per-doc dup-span masks, and the
  *                 reassembled cleaned documents (duplicate spans removed)
  *   masks/ cleaned/  (substr mode) ExactSubstr per-token removal masks
  *                 and the cleaned reassembly — duplicated --chunkWords-
  *                 token windows cut everywhere but one canonical copy
  *   summary printed as [dedup] lines (pair counts, dropped buckets).
  *
  * spans mode splits on --spanSep (regex; default blank-line paragraphs)
  * or fixed --chunkWords word windows when --spanSep is 'words'.
  *
  * --checkpointDir: reliable-storage checkpoint location for the
  * clustering contraction (cluster mode durability; defaults to fast
  * non-replicated localCheckpoint — see Dedup.components).
  *
  * incremental mode (daily ingest): --input is the NEW batch, --corpus the
  * committed corpus text table, --indexTable a SnapshotTable of persisted
  * MinHash band rows (bootstrapped from --corpus on first run, then one
  * committed chunk per ingest). Outputs pairs/ (batch-vs-corpus dups) and
  * survivors/ (batch ids with no corpus dup); survivors' band rows are
  * committed as the next index chunk so the next ingest matches against
  * them without re-hashing anything committed.
  *
  * Near-dup modes assume `exact` ran first (the standard pipeline order):
  * the hot-bucket guard deliberately drops identical-text mega-clusters,
  * whose pairs exact dedup surfaces at a groupBy's cost, not a join's.
  */
object DedupJob {

  final case class Args(
      input: String, output: String, mode: String = "minhash",
      idCol: String = "doc_id", textCol: String = "text",
      minJaccard: Double = 0.5, minContainment: Double = 0.9,
      maxBucket: Int = 65536, maxDocFreq: Int = 65536,
      cluster: Boolean = false, checkpointDir: Option[String] = None,
      spanSep: String = "\\n{2,}", chunkWords: Int = 10,
      vecCol: String = "embedding", minSim: Double = 0.95,
      kClusters: Int = 256, kmeansIters: Int = 2, maxCluster: Int = 4096,
      smallGraphLimit: Long = 2000000L,
      corpus: Option[String] = None, indexTable: Option[String] = None,
      sourceCol: String = "source", sketch: Boolean = false)

  def run(spark: SparkSession, a: Args): Map[String, Long] = {
    val docs = spark.read.parquet(a.input)

    def write(df: DataFrame, name: String): Long = {
      df.write.mode("overwrite").parquet(s"${a.output}/$name")
      spark.read.parquet(s"${a.output}/$name").count()
    }

    // the dropped-key report matching the mode's candidate bucket key
    def hotReport(): DataFrame = a.mode match {
      case "minhash" =>
        val bands = docs.select(col(a.idCol).as("id"),
            explode(Dedup.minhashBandKeys(
              graft.functions.MinHashSig.col(col(a.textCol), 5, 80), 80, 5)).as("bk"))
          .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
        Dedup.hotBuckets(bands, Seq("band", "band_hash"), a.maxBucket)
      case "simhash" =>
        val sh = Dedup.simhash(docs, a.idCol, a.textCol)
        val banded = sh.select(col("id"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("simhash"), b * 16)
                .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
          .select(col("id"), col("bk.band"), col("bk.key"))
        Dedup.hotBuckets(banded, Seq("band", "key"), a.maxBucket)
      case "fingerprint" | "containment" =>
        val fp = Dedup.fingerprints(docs, a.idCol, a.textCol)
          .select(col("id"), explode(col("fingerprint")).as("gram"))
        Dedup.hotBuckets(fp, Seq("gram"), a.maxDocFreq)
      case "semdedup" =>
        Dedup.hotBuckets(
          Dedup.kmeansLabels(docs, a.idCol, a.vecCol,
            k = a.kClusters, iters = a.kmeansIters),
          Seq("cluster"), a.maxCluster)
      case _ => spark.emptyDataFrame
    }

    // pairs → clusters → keepers, from the WRITTEN pairs table (read back,
    // not recomputed): components labels every id, keepers derive from the
    // written components table — one contraction, two outputs
    def clusterOut(): Map[String, Long] =
      if (!a.cluster) Map.empty
      else {
        val p = spark.read.parquet(s"${a.output}/pairs")
        val nc = write(
          Dedup.components(p, checkpointDir = a.checkpointDir,
            smallGraphLimit = a.smallGraphLimit), "components")
        val nk = write(Dedup.keepersFromComponents(
          spark.read.parquet(s"${a.output}/components")), "keepers")
        Map("components" -> nc, "keepers" -> nk)
      }

    a.mode match {
      case "exact" =>
        val n = write(Dedup.exact(docs, a.idCol, a.textCol), "keepers")
        Map("keepers" -> n)
      case "minhash" =>
        val n = write(Dedup.nearDupPairs(docs, a.idCol, a.textCol,
          minJaccard = a.minJaccard, maxBucket = a.maxBucket), "pairs")
        Map("pairs" -> n, "hot_buckets" -> write(hotReport(), "hot_buckets")) ++
          clusterOut()
      case "simhash" =>
        val n = write(Dedup.simhashNearDup(docs, a.idCol, a.textCol,
          maxHamming = 8, numBands = 4, minJaccard = a.minJaccard,
          probeBits = 2, maxBucket = a.maxBucket), "pairs")
        Map("pairs" -> n, "hot_buckets" -> write(hotReport(), "hot_buckets")) ++
          clusterOut()
      case "fingerprint" =>
        val n = write(Dedup.fingerprintNearDup(docs, a.idCol, a.textCol,
          minJaccard = a.minJaccard, maxDocFreq = a.maxDocFreq), "pairs")
        Map("pairs" -> n, "hot_buckets" -> write(hotReport(), "hot_buckets")) ++
          clusterOut()
      case "containment" =>
        val n = write(Dedup.containmentPairs(docs, a.idCol, a.textCol,
          minContainment = a.minContainment, maxDocFreq = a.maxDocFreq), "pairs")
        Map("pairs" -> n, "hot_buckets" -> write(hotReport(), "hot_buckets")) ++
          clusterOut()
      case "semdedup" =>
        val n = write(Dedup.semDedupPairs(docs, a.idCol, a.vecCol,
          k = a.kClusters, iters = a.kmeansIters, minSim = a.minSim,
          maxCluster = a.maxCluster), "pairs")
        Map("pairs" -> n, "hot_buckets" -> write(hotReport(), "hot_buckets")) ++
          clusterOut()
      case "incremental" =>
        // daily-ingest shape: --input is the NEW batch, --corpus the
        // committed corpus text table, --indexTable a SnapshotTable of
        // (id, band, band_hash) rows — one committed chunk per past ingest.
        // Bootstrap (no snapshot yet): hash the corpus once into chunk 0.
        // Then: match the batch via the index (corpus never re-hashed),
        // write cross-dup pairs + surviving batch ids, and commit the
        // SURVIVORS' band rows as the next chunk — a crash between write
        // and commit is cleaned by open()'s uncommitted-dir sweep, so the
        // index never double-counts a batch (idempotent re-ingest).
        import graft.table.SnapshotTable
        val corpusPath = a.corpus.getOrElse(sys.error("--corpus required"))
        val indexTable = a.indexTable.getOrElse(sys.error("--indexTable required"))
        val corpus = spark.read.parquet(corpusPath)
        val committed = SnapshotTable.open(indexTable, totalChunks = 1)
        if (committed.isEmpty) {
          Dedup.nearDupIndex(corpus, a.idCol, a.textCol)
            .write.mode("overwrite")
            .parquet(SnapshotTable.chunkDir(indexTable, 0))
          SnapshotTable.commitChunk(indexTable, 0, 1,
            Map("indexed_docs" -> corpus.count()))
        }
        val index = spark.read.option("basePath",
            java.nio.file.Paths.get(indexTable, "data").toString)
          .parquet(SnapshotTable.committedDataDirs(indexTable): _*)
          .select("id", "band", "band_hash")
        // coverage guard: every indexed id must have its text in --corpus,
        // or its candidates would silently drop out of the verify join
        // (false negatives). One skinny distinct-ids anti-join per ingest —
        // parallel long columns, cheap next to the match itself.
        val missing = index.select("id").distinct()
          .join(corpus.select(col(a.idCol).as("id")).distinct(),
            Seq("id"), "left_anti").count()
        if (missing > 0) throw new IllegalArgumentException(
          s"$missing indexed ids are missing from --corpus ($corpusPath): " +
            "the corpus table must include every previously-ingested " +
            "survivor (append survivors to it alongside each index commit)")
        val pairs = Dedup.incrementalNearDup(docs, index, corpus,
          a.idCol, a.textCol, minJaccard = a.minJaccard,
          maxBucket = a.maxBucket)
        val np = write(pairs, "pairs")
        val survivors = docs.join(
          spark.read.parquet(s"${a.output}/pairs")
            .select(col("new_id").as(a.idCol)).distinct(),
          Seq(a.idCol), "left_anti")
        val ns = write(survivors.select(col(a.idCol)), "survivors")
        val snap = SnapshotTable.currentSnapshot(indexTable).get
        val next = snap.committedChunks.max + 1
        Dedup.nearDupIndex(survivors, a.idCol, a.textCol)
          .write.mode("overwrite")
          .parquet(SnapshotTable.chunkDir(indexTable, next))
        SnapshotTable.commitChunk(indexTable, next, next + 1,
          Map("indexed_docs" -> ns))
        Map("pairs" -> np, "survivors" -> ns,
          "index_chunks" -> (next + 1).toLong)
      case "sourcemirror" =>
        // DOMAIN-level dedup: which sources mirror each other. --sketch
        // switches to the union-MinHash tier (the shape for web-scale
        // domain counts); the exact tier caps stop-grams at --maxDocFreq
        // shared sources, with the dropped grams reported as usual
        val pairsDf =
          if (a.sketch)
            Dedup.sourceMirrorsSketch(docs, a.sourceCol, a.textCol,
              minJaccard = a.minJaccard, maxBucket = a.maxBucket)
          else
            Dedup.sourceMirrors(docs, a.sourceCol, a.textCol,
              minJaccard = a.minJaccard, maxGramSources = a.maxDocFreq)
        val n = write(pairsDf.orderBy("src_a", "src_b"), "pairs")
        val hot = write(Dedup.hotBuckets(
          Dedup.sourceGrams(docs, a.sourceCol, a.textCol),
          Seq("gram"), a.maxDocFreq), "hot_buckets")
        Map("pairs" -> n, "hot_buckets" -> hot)
      case "spans" =>
        val sp =
          if (a.spanSep == "words")
            graft.pipeline.Spans.wordChunks(docs, a.idCol, a.textCol, a.chunkWords)
          else if (a.spanSep == "cdc")
            graft.pipeline.Spans.cdcChunks(docs, a.idCol, a.textCol)
          else graft.pipeline.Spans.split(docs, a.idCol, a.textCol, a.spanSep)
        val d = graft.pipeline.Spans.dedup(sp)
        Map(
          "span_verdicts" -> write(d, "span_verdicts"),
          "span_masks" -> write(graft.pipeline.Spans.dupMask(d), "span_masks"),
          "cleaned" -> write(graft.pipeline.Spans.removeDups(sp), "cleaned"))
      case "substr" =>
        // ExactSubstr pass: duplicated --chunkWords-token windows cut
        // everywhere but one canonical copy; masks/ is the per-token
        // removal lineage, cleaned/ the reassembled survivors. Both
        // outputs derive from ONE persisted coverage frame — the window
        // hashing + dup election runs once, not once per output.
        val cov = graft.pipeline.ExactSubstr.coverage(
            docs, a.idCol, a.textCol, a.chunkWords)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try Map(
          "masks" -> write(
            graft.pipeline.ExactSubstr.maskFromCoverage(cov), "masks"),
          "cleaned" -> write(
            graft.pipeline.ExactSubstr.cleanFromCoverage(cov), "cleaned"))
        finally cov.unpersist(blocking = false)
      case other => sys.error(s"unknown --mode $other")
    }
  }

  def main(rawArgs: Array[String]): Unit = {
    val m = parse(rawArgs.toList, Map.empty)
    val a = Args(
      input = m.getOrElse("input", sys.error("--input required")),
      output = m.getOrElse("output", sys.error("--output required")),
      mode = m.getOrElse("mode", "minhash"),
      idCol = m.getOrElse("id", "doc_id"),
      textCol = m.getOrElse("text", "text"),
      minJaccard = m.getOrElse("minJaccard", "0.5").toDouble,
      minContainment = m.getOrElse("minContainment", "0.9").toDouble,
      maxBucket = m.getOrElse("maxBucket", "65536").toInt,
      maxDocFreq = m.getOrElse("maxDocFreq", "65536").toInt,
      cluster = m.getOrElse("cluster", "false").toBoolean,
      checkpointDir = m.get("checkpointDir"),
      spanSep = m.getOrElse("spanSep", "\\n{2,}"),
      chunkWords = m.getOrElse("chunkWords", "10").toInt,
      vecCol = m.getOrElse("vec", "embedding"),
      minSim = m.getOrElse("minSim", "0.95").toDouble,
      kClusters = m.getOrElse("kClusters", "256").toInt,
      kmeansIters = m.getOrElse("kmeansIters", "2").toInt,
      maxCluster = m.getOrElse("maxCluster", "4096").toInt,
      smallGraphLimit = m.getOrElse("smallGraph", "2000000").toLong,
      corpus = m.get("corpus"),
      indexTable = m.get("indexTable"),
      sourceCol = m.getOrElse("source", "source"),
      sketch = m.getOrElse("sketch", "false").toBoolean)

    val builder = SparkSession.builder().appName("graft-dedup")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    val spark = sys.props.get("spark.master")
      .fold(builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]")))(_ => builder)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val counts = run(spark, a)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[dedup] mode=${a.mode} completed in $secs%.1fs")
    counts.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"[dedup]   $k = $v") }
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case key :: value :: rest if key.startsWith("--") =>
        parse(rest, acc + (key.drop(2) -> value))
      case other => sys.error(s"cannot parse args at $other")
    }
}
