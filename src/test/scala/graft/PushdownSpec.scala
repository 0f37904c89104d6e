package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scan-efficiency plan gates: predicates must reach the parquet reader
  * (`PushedFilters`) and the read schema must shrink to the referenced
  * columns (`ReadSchema`) — a scan that decodes every column for a
  * two-column projection is wrong at any scale, and catastrophic at 100 TB.
  * Declarative queries get both for free from Catalyst; these tests pin
  * that property so a refactor that breaks it (e.g. an opaque UDF in the
  * filter) fails loudly. */
class PushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pushdown").toString
    (0L until 1000L).map(i => (i, s"body of document $i", (i % 7).toInt))
      .toDF("doc_id", "text", "shard")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("filter pushes down to the parquet scan and columns prune") {
    val df = spark.read.parquet(dir)
      .filter(col("doc_id") < 30)
      .select("doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("LessThan(doc_id,30)"),
      s"doc_id predicate must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must read only the projected columns:\n$plan")
    assert(!plan.contains("shard:int"),
      "unreferenced column must not be decoded")
  }

  test("weightedSample is a pushable narrow predicate over a pruned scan") {
    val df = graft.pipeline.TextProfile.weightedSample(
        spark.read.parquet(dir), "doc_id",
        col("shard").cast("double") / 10.0)
      .select("doc_id", "shard")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the sampling decision must add no shuffle:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,shard:int>"),
      s"scan must prune to the referenced columns:\n$plan")
  }

  test("kmeans assignment pass is a single narrow stage over a pruned scan") {
    val emb = (0L until 200L).map(i =>
      (i, Array.fill(8)((i % 13).toFloat / 13f), s"pad$i"))
      .toDF("vec_id", "embedding", "extra")
    val d = java.nio.file.Files.createTempDirectory("graft_push_emb").toString
    emb.write.mode("overwrite").parquet(d)
    val cents = graft.pipeline.Dedup.kmeansFit(
      spark.read.parquet(d), "vec_id", "embedding", k = 4, iters = 1)
    val labels = graft.pipeline.Dedup.kmeansLabels(
      spark.read.parquet(d), "vec_id", "embedding", k = 4, iters = 1)
    labels.collect()
    val plan = labels.queryExecution.executedPlan.toString
    assert(cents.length == 4)
    assert(!plan.contains("Exchange"),
      s"labeling is assignment only — no shuffle:\n$plan")
    assert(!plan.contains("extra"),
      "unreferenced column must not be decoded")
  }

  test("PQ encode is one narrow stage: codebooks ride as literals, no shuffle") {
    val emb = (0L until 200L).map(i =>
      (i, Array.fill(8)((i % 13).toFloat / 13f), s"pad$i"))
      .toDF("vec_id", "embedding", "extra")
    val d = java.nio.file.Files.createTempDirectory("graft_push_pq").toString
    emb.write.mode("overwrite").parquet(d)
    val books = graft.pipeline.Dedup.pqFit(
      spark.read.parquet(d), "vec_id", "embedding", dim = 8, m = 2, k = 4,
      iters = 1)
    val codes = graft.pipeline.Dedup.pqCodesWith(
      spark.read.parquet(d), "vec_id", "embedding", dim = 8, books)
    codes.collect()
    val plan = codes.queryExecution.executedPlan.toString
    assert(books.length == 2 && books.forall(_.length == 4))
    assert(!plan.contains("Exchange"),
      s"code assignment is a projection — no shuffle:\n$plan")
    assert(!plan.contains("extra"),
      "unreferenced column must not be decoded")
  }

  test("rankBuckets never sorts the corpus — the window runs over the aggregate") {
    // the CCNet bucketing must plan its cumulative window ABOVE the
    // per-(stratum, score) aggregate: the only sort in the plan is over the
    // distinct-score table, and no corpus-sized exchange carries `text`
    val df = graft.pipeline.TextProfile.rankBuckets(
        spark.read.parquet(dir), "shard", col("doc_id") % 10, nBuckets = 3)
      .select("doc_id", "shard", "bucket")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // every Window sits above a HashAggregate (cumulative over the
    // aggregate), so Sort operators only ever see (stratum, score, cnt)
    // rows — assert no Sort/Window node lists the text column
    val badNode = plan.linesIterator.find(l =>
      (l.contains("Sort ") || l.contains("Window ")) && l.contains("text"))
    assert(badNode.isEmpty, s"corpus-row sort/window detected: $badNode")
    assert(plan.contains("Window"), "the cumulative window must exist")
  }

  test("bpeMerges ships only (pair, count) rows through its per-round shuffle") {
    // corpus text participates exactly once (the word-count pass); every
    // later exchange carries symbol pairs + counts, never words or toks
    val docs = spark.read.parquet(dir)
    val wc = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("toks",
        concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" ")))
      .select("cnt", "toks")
    val toksArr = split(trim(col("toks")), " ")
    val pairCounts = wc
      .filter(size(toksArr) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(0), size(toksArr) - 2),
        i => struct(element_at(toksArr, i + 1).as("lhs"),
          element_at(toksArr, i + 2).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("cnt").as("n"))
    pairCounts.collect()
    val plan = pairCounts.queryExecution.executedPlan.toString
    // the word-count groupBy is the one legitimate vocab shuffle (short
    // word strings + partial counts); the symbol-list representation must
    // never cross an exchange in any round
    val badExchange = plan.linesIterator.find(l =>
      l.contains("Exchange") && l.contains("toks"))
    assert(badExchange.isEmpty, s"toks crossed an exchange: $badExchange")
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"pair counts must map-side combine before the shuffle:\n$plan")
  }

  test("dedup signature queries prune the documents scan to (id, text)") {
    // the near-dup pipeline touches only two columns of a (possibly wide)
    // documents table — the scan must reflect that
    val wide = spark.read.parquet(dir)
    val pairs = graft.pipeline.Dedup.nearDupPairs(wide, "doc_id", "text")
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"dedup scan must prune to the two referenced columns:\n$plan")
  }

  test("temperatureMix never shuffles the corpus — rates broadcast back") {
    // the only exchanges belong to the source-sized count aggregate and its
    // normalization window; corpus rows (which carry text) join the rate
    // table through a broadcast and are then filtered by a pure predicate
    val df = graft.pipeline.TextProfile.temperatureMix(
      spark.read.parquet(dir), "doc_id", "shard",
      tau = 0.5, targetFrac = 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val badExchange = plan.linesIterator.find(l =>
      l.contains("Exchange") && l.contains("text"))
    assert(badExchange.isEmpty, s"corpus text crossed an exchange: $badExchange")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"the rate table must broadcast back onto the corpus:\n$plan")
  }

  test("upsampleMix adds no corpus exchange: rates broadcast, the copy " +
       "explode is narrow") {
    val df = graft.pipeline.TextProfile.upsampleMix(
      spark.read.parquet(dir), "doc_id", "shard",
      tau = 0.3, targetFrac = 1.5, maxEpochs = 4.0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val badExchange = plan.linesIterator.find(l =>
      l.contains("Exchange") && l.contains("text"))
    assert(badExchange.isEmpty, s"corpus text crossed an exchange: $badExchange")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"the rate table must broadcast back onto the corpus:\n$plan")
    assert(plan.contains("Generate explode"),
      s"copies must come from a narrow explode:\n$plan")
  }

  test("packSequences: the corpus crosses ONE skinny exchange (the 256-way " +
       "group hash), never the text; offsets broadcast back") {
    val df = graft.pipeline.TextProfile.packSequences(
      spark.read.parquet(dir), "doc_id", "text", budgetTokens = 64)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the prefix-sum decomposition must not move document text: the corpus
    // exchange carries only (id, order-key, group, token-count)
    val badExchange = plan.linesIterator.find(l =>
      l.contains("Exchange") && l.contains("text"))
    assert(badExchange.isEmpty, s"document text crossed an exchange: $badExchange")
    assert(plan.contains("BroadcastHashJoin"),
      s"group offsets must broadcast back onto the corpus:\n$plan")
    // the corpus-side window is partitioned (256 groups), not global: the
    // only SinglePartition exchange in the plan feeds the 256-row offsets
    // window, which sits under the broadcast side
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val single = finalPlan.linesIterator
      .count(_.contains("Exchange SinglePartition"))
    assert(single <= 1, s"more than one single-partition exchange:\n$finalPlan")
  }

  test("lmSelfScore ships only (id, partial sums) — text never shuffles, " +
       "counts broadcast") {
    // trigram explosion is map-local, both count tables join via broadcast,
    // and the per-doc aggregate map-side combines before its skinny shuffle
    val df = graft.pipeline.TextProfile.lmSelfScore(
      spark.read.parquet(dir), "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val badExchange = plan.linesIterator.find(l =>
      l.contains("Exchange") && l.contains("text"))
    assert(badExchange.isEmpty, s"corpus text crossed an exchange: $badExchange")
    assert(plan.contains("BroadcastHashJoin"),
      s"count tables must broadcast onto the exploded trigrams:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"per-doc sums must map-side combine before the shuffle:\n$plan")
  }

  test("sourceMirrorsSketch: the union-MinHash aggregate map-side combines " +
       "and the verify is pruned to candidate sources via broadcast") {
    val docs = spark.read.parquet(dir)
      .select(concat(lit("s"), (col("doc_id") % 4).cast("string")).as("source"),
        col("text"))
    val df = graft.pipeline.Dedup.sourceMirrorsSketch(
      docs, "source", "text", numHashes = 32, rowsPerBand = 4,
      minJaccard = 0.0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the domain signature is ONE partial-aggregated min pass: partials of
    // (src, numHashes longs) — never a per-doc signature re-aggregation
    assert(plan.contains("partial_min"),
      s"union-MinHash mins must map-side combine:\n$plan")
    // candidate-source pruning reaches the gram frame as a broadcast
    // semi-join — the quadratic verify never sees a non-candidate domain
    assert(plan.contains("LeftSemi, BuildRight") ||
      plan.contains("LeftSemi"),
      s"gram frame must be semi-join-pruned to candidate sources:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"the candidate-source prune must broadcast:\n$plan")
  }

  test("findClipsContaining: the corpus fingerprint side never shuffles — " +
       "query bands and window counts broadcast onto it") {
    import spark.implicits._
    val sr = 8000
    def pcm(f: Double): Array[Byte] = graft.codec.Codecs.encode("pcm_s16le",
      Array.tabulate(sr)(i =>
        (math.sin(2 * math.Pi * f * i / sr) * 12000).toShort))
    val rows = (0 until 6).map(i =>
      (s"c$i", pcm(300.0 + 37 * i), sr, 1000, "pcm_s16le", "t"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val q = Seq(("q0", pcm(300.0), sr, 1000, "pcm_s16le", "t"))
      .toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
    val df = graft.pipeline.AudioDedup.findClipsContaining(rows, q,
      windowMs = 200, hopMs = 200, minCoverage = 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // corpus windows meet the query through broadcast joins only; the sole
    // exchanges key on the skinny (clip, query, delta) match rows, never
    // on anything carrying corpus fingerprints pre-broadcast-join
    assert(plan.contains("BroadcastHashJoin"),
      s"query bands must broadcast onto the corpus windows:\n$plan")
    val badExchange = plan.linesIterator.find(l =>
      l.contains("Exchange") && (l.contains("bytes") || l.contains("cfp")))
    assert(badExchange.isEmpty,
      s"corpus bytes/fingerprints crossed an exchange: $badExchange")
  }
}
