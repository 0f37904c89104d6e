package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-profile operators for training-data curation: the aggregate
  * tables a quality-filter pipeline derives FROM the corpus to drive its
  * own rules (boilerplate phrase lists, contamination probes, vocabulary
  * audits). Pure declarative compositions — every step is a codegen'd
  * column expression feeding one map-side-combined aggregation. */
object TextProfile {

  /** Word n-gram document frequency: how many DISTINCT documents contain
    * each word n-gram. The standard input to boilerplate-phrase lists
    * (drop/flag grams with df over a ceiling) and train/test contamination
    * probes (join a held-out set's grams against the table). A gram
    * repeated inside one doc counts once (`count_distinct` on the doc id —
    * ONE declarative aggregate; the planner's distinct rewrite dedups
    * (gram, id) map-side before the first exchange and ships only
    * (gram, partial-count) through the second, the same two-exchange
    * physical shape the explicit distinct+groupBy formulation planned,
    * verified by `.explain` — no doc content ever travels). Documents
    * shorter than n words contribute their whole text as one (short)
    * gram, mirroring `Dedup.shingles`' convention. */
  def ngramDocFreq(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minDf: Long = 3): DataFrame = {
    require(n >= 1, s"ngram size $n")
    // per-doc array_distinct BEFORE the explode makes every (gram, id) row
    // unique by construction, so DF is a plain map-side-combined count —
    // ONE exchange carrying (gram, partial-count) rows instead of the
    // distinct-aggregate's two-exchange (dedup + count) shape; the per-doc
    // dedup runs inside the scan stage on a document-sized array (guide
    // §2.3 "aggregate before you shuffle"). Result identical: distinct
    // docs per gram either way.
    docs.select(explode(ngramsDistinct(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
  }

  /** Word n-gram array of a text column (occurrence order, duplicates
    * kept): the shared gram builder of `ngramDocFreq`, `repetitionScore`
    * and the contamination probe. */
  def ngrams(textCol: Column, n: Int): Column =
    // native codegen'd expression — the transform/sequence/slice/concat_ws
    // chain is CodegenFallback (interpreted per row); WordNgrams emits the
    // identical array in one pass (equivalence law in NativeExprOptSpec)
    graft.functions.WordNgrams.col(textCol, n)

  /** `array_distinct(ngrams(...))` fused into the same native pass —
    * first-occurrence order, identical to the two-step form. */
  def ngramsDistinct(textCol: Column, n: Int): Column =
    graft.functions.WordNgrams.col(textCol, n, distinct = true)

  /** Intra-document repetition score (the Gopher-rule family): the
    * fraction of word n-gram OCCURRENCES that are repeats of an n-gram
    * already seen in the same document — catches non-consecutive
    * copy-paste loops that a max-consecutive-run rule (H2) misses. Pure
    * per-row column expressions: no shuffle, no state, codegen'd. */
  def repetitionScore(textCol: Column, n: Int = 3): Column = {
    require(n >= 1, s"ngram size $n")
    val grams = ngrams(textCol, n)
    round((size(grams) - size(ngramsDistinct(textCol, n))).cast("double") /
      size(grams), 6)
  }

  /** Train/test contamination probe — the check every model team runs
    * before trusting an eval split: which held-out documents share word
    * n-grams with the TRAIN split, how many, and which shared gram is
    * worst (highest train document frequency, ties broken by the
    * lexicographically smallest gram — deterministic).
    *
    * Composes `hashSplit` (the leakage-safe split) with the `ngrams`
    * builder: train-side gram DF is one map-side-combined aggregate over
    * skinny (gram, id) rows; the test side joins it on the gram — no
    * document content crosses an exchange. Every test doc appears in the
    * output; zero-contamination docs carry n_contaminated = 0 and the ''
    * sentinel worst_gram (NULL-free output).
    *
    * Reference analog: the experimental evaluator's compare-against-
    * ground-truth step (`/root/reference/Backend/utils/experimental_evaluator.py`) —
    * here the "ground truth" is the train corpus and the metric is overlap. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, testFrac: Double = 0.1,
                    valFrac: Double = 0.1, minDf: Long = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = hashSplit(
      docs.select(col(idCol).as("id"), col(textCol).as("text")),
      "id", testFrac, valFrac)
    // split the corpus ONCE per side: the train side feeds the DF
    // aggregate, the test side feeds both the per-doc gram count (a pure
    // narrow expression — size(array_distinct), no explode/shuffle) and
    // the hit join; the old shape exploded the whole corpus three times
    val trainDf = sp.filter(col("split") === "train")
      .select(explode(ngramsDistinct(col("text"), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("train_df"))
      .filter(col("train_df") >= minDf)
    val test = sp.filter(col("split") === "test")
    val testGrams = test.select(col("id"),
      explode(ngramsDistinct(col("text"), n)).as("gram"))
    val nGrams = test.select(col("id"),
      size(ngramsDistinct(col("text"), n)).cast("long").as("n_grams"))
    val hits = testGrams.join(trainDf, "gram")
    val w = Window.partitionBy("id")
      .orderBy(col("train_df").desc, col("gram"))
    val worst = hits
      .withColumn("rn", row_number().over(w))
      .withColumn("n_contaminated", count(lit(1)).over(Window.partitionBy("id")))
      .filter(col("rn") === 1)
      .select(col("id"), col("n_contaminated"),
        col("gram").as("worst_gram"), col("train_df").as("worst_df"))
    nGrams.join(worst, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
          col("n_grams"), 6).as("contamination_frac"),
        coalesce(col("worst_gram"), lit("")).as("worst_gram"),
        coalesce(col("worst_df"), lit(0L)).as("worst_df"))
  }

  /** TF-IDF top terms per document — the corpus-profiling op behind
    * keyword extraction, topic tagging, and per-source vocabulary audits.
    * Classic tf·ln(N/df): term frequency from one map-side-combined
    * (id, term) aggregate, document frequency from one `count_distinct`
    * aggregate, the corpus size as a broadcast scalar — no document
    * content crosses the term join (skinny (id, term, tf) rows), and the
    * per-doc top-k window is bounded by document vocabulary. Deterministic
    * ranking: score descending, then term ascending. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, minDf: Long = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = words.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = words.groupBy("term").agg(count_distinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("tfidf"))
  }

  /** Hex cut point for a fraction — shared by `hashSplit` and
    * `stratifiedSample`: the first 8 md5 hex chars compare below `cut(f)`
    * with probability f. A fraction of exactly 1.0 would format as NINE
    * hex chars ('100000000'), which sorts BEFORE 8-char prefixes
    * lexicographically — clamped to a sentinel that sorts after every hex
    * string instead ('g' > 'f'). */
  private def cut(f: Double): String = {
    val v = math.floor(f * 4294967296.0).toLong
    if (v >= 0x100000000L) "g" else f"$v%08x"
  }

  /** Content-stable stratified downsampling — the corpus-mixing op: keep a
    * per-stratum fraction of documents (e.g. downweight web crawl, keep
    * all books), decided purely by md5(id) with the same guarantees as
    * [[hashSplit]]: identical across runs/engines/partitionings, and a
    * kept document STAYS kept when the corpus grows — seeded `sample()`
    * guarantees neither. Strata absent from `rates` use `defaultRate`.
    * Pure per-row predicate: no shuffle, no state, fully pushable. */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(f =>
      require(f >= 0 && f <= 1, s"bad rate $f"))
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    def keepFor(f: Double): Column =
      if (f >= 1.0) lit(true) else h < lit(cut(f))
    val keep = rates.toSeq.sortBy(_._1).foldRight(keepFor(defaultRate)) {
      case ((stratum, f), acc) =>
        when(col(stratumCol) === stratum, keepFor(f)).otherwise(acc)
    }
    docs.filter(keep)
  }

  /** Best-k documents per group by a score column — quality-based
    * downsampling ("keep the N best docs per domain"). Deterministic:
    * score descending, then `tieCol` ascending. The window partitions by
    * group; per-group work is bounded by group size, and Spark's
    * WindowGroupLimit pushes the rank filter below the sort at scale. */
  def topPerGroup(docs: DataFrame, groupCol: String, scoreCol: Column,
                  tieCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(scoreCol.desc, col(tieCol))
    docs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Top-k PMI bigram collocations — the corpus-statistics pass behind
    * phrase vocabularies and tokenizer merges: pointwise mutual information
    * ln(n_ab·N / (n_a·n_b)) over consecutive word pairs, with a minimum
    * pair count (PMI of rare pairs is noise). Shapes: one map-side-combined
    * unigram count (vocab-sized output), one bigram count (pair-vocab-
    * sized), two equi-joins of the ≥ minCount bigram table against the
    * unigram counts (skinny word/count rows; AQE picks broadcast vs shuffle
    * from measured sizes), TakeOrdered top-k. The corpus total N is the one
    * driver-side scalar (an aggregate of the vocab table, standard). The
    * log is taken in a single call on identically-ordered arithmetic so a
    * second engine reproduces it to the rounded digit. */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Int = 5, topK: Int = 50): DataFrame = {
    // native AlnumTokens / ConsecutivePairs kernels — the filter/split and
    // zip_with/slice HOF chains are interpreted per row (laws in
    // NativeExprOptSpec)
    val ws = graft.functions.AlnumTokens.col(col(textCol))
    val toks = docs.select(ws.as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val total = uni.agg(sum("n_w")).collect()(0).getLong(0)
    val pairs = toks.filter(size(col("ws")) >= 2)
      .select(explode(
        graft.functions.ConsecutivePairs.col(col("ws"), "w1", "w2")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bcnt = pairs.groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    bcnt
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("n_ab"),
        round(log(col("n_ab").cast("double") * total.toDouble /
          (col("n_a").cast("double") * col("n_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram")).limit(topK)
  }

  /** Keep-rate-vs-threshold calibration sweep — the curve a quality-filter
    * operator is tuned from: for each candidate threshold t over `score`
    * (a grid of `buckets` steps spanning [0, maxScore)), how many rows
    * have score ≥ t and what corpus fraction that keeps. One narrow
    * bucketing projection + one map-side-combined aggregate whose shuffle
    * carries ≤ `buckets` rows per task, then a `buckets`-row window for
    * the descending cumulative — nothing here grows with the corpus, so
    * the sweep costs one scan at any scale. Empty buckets are filled from
    * a `range(buckets)` grid so the curve is always complete. */
  def thresholdSweep(docs: DataFrame, score: Column,
                     buckets: Int, maxScore: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0 && maxScore > 0, s"bad sweep grid $buckets x $maxScore")
    val spark = docs.sparkSession
    val b = least(floor(score / maxScore * buckets), lit(buckets - 1))
      .cast("long")
    val counts = docs.select(b.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val grid = spark.range(buckets).select(col("id").as("bucket"))
    val filled = grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
    val desc = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    filled.select(col("bucket"),
      round(col("bucket") * maxScore / buckets, 6).as("threshold"),
      sum(col("n")).over(desc).as("n_kept"),
      round(sum(col("n")).over(desc).cast("double") /
        sum(col("n")).over(all), 6).as("keep_rate"))
  }

  /** Per-row weighted deterministic sampling — the importance-resampling
    * primitive (DSIR-style): keep a row with probability `rate` (clamped
    * to [0, 1]), decided purely by md5(id) against a per-row hex cut
    * formatted FROM the rate, so the draw is content-stable with the same
    * guarantees as [[hashSplit]]: identical across runs, engines and
    * partition layouts, and a kept row stays kept under corpus growth.
    * Pure per-row predicate — no shuffle, no state, fully pushable. A
    * rate ≥ 1 keeps unconditionally (the 9-hex-char '100000000' cut would
    * otherwise sort BEFORE every 8-char prefix — same trap as `cut`). */
  def weightedSample(docs: DataFrame, idCol: String, rate: Column): DataFrame = {
    val r = greatest(least(rate, lit(1.0)), lit(0.0))
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    val cutHex = lower(lpad(hex(floor(r * 4294967296.0).cast("long")), 8, "0"))
    docs.filter(r >= 1.0 || h < cutHex)
  }

  /** Deterministic, content-stable train/val/test split: the standard
    * leakage-safe way to split a corpus. The split is a pure function of
    * the id's md5 (no RNG, no state), so it is identical across runs,
    * partitionings, engines, and corpus growth — a document NEVER migrates
    * between splits when more data arrives, which is what seeded `sample()`
    * cannot guarantee. Implementation compares the first 8 hex chars of
    * md5(id) lexicographically against cut points (hex strings order the
    * same as their values), so any engine with md5 reproduces it exactly.
    * Assignment order: [0, testFrac) → test, [testFrac, testFrac+valFrac)
    * → val, rest → train. */
  def hashSplit(docs: DataFrame, idCol: String,
                testFrac: Double = 0.1, valFrac: Double = 0.1): DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac <= 1,
      s"bad split fractions test=$testFrac val=$valFrac")
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    docs.withColumn("split",
      when(h < lit(cut(testFrac)), "test")
        .when(h < lit(cut(testFrac + valFrac)), "val")
        .otherwise("train"))
  }

  /** CCNet-style per-stratum quality bucketing (Wenzek et al. 2020 §4.3:
    * each language's corpus is split into head/middle/tail by model score):
    * assigns each doc an integer bucket 0..nBuckets−1 by its score's EXACT
    * rank position within its stratum — bucket = floor(nBuckets·|{score' <
    * score}| / n_stratum), so every doc sharing a score value lands in the
    * same bucket (no id tie-break needed) and the assignment is an exact
    * integer formula a second engine reproduces bit-identically.
    *
    * Scale shape: deliberately NOT `ntile()`/`row_number()` over the
    * stratum — a per-stratum window puts an entire language's corpus in
    * ONE task. Instead: per-(stratum, score) exact counts (one map-side-
    * combined corpus aggregate), a cumulative window over that
    * aggregate table (distinct-score-sized, not corpus-sized), and an
    * AQE-sized equi-join back. Round/discretize the score upstream so the
    * distinct-score table stays bounded. */
  def rankBuckets(docs: DataFrame, stratumCol: String, score: Column,
                  nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val scored = docs.withColumn("score", score)
    val hist = scored.groupBy(col(stratumCol), col("score"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(stratumCol).orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(stratumCol)
    val buckets = hist
      .withColumn("cum_lt", sum("cnt").over(w) - col("cnt"))
      .withColumn("n_stratum", sum("cnt").over(all))
      .withColumn("bucket",
        floor(lit(nBuckets) * col("cum_lt") / col("n_stratum")).cast("int"))
      .select(col(stratumCol), col("score"), col("bucket"))
    scored.join(buckets, Seq(stratumCol, "score"))
  }

  /** One learned BPE merge per round: (round, lhs, rhs, merged, n). */
  final case class BpeMerge(round: Int, lhs: String, rhs: String,
                            merged: String, n: Long)

  /** Distributed BPE merge training (Sennrich et al. 2016 §3.2, the
    * byte-pair-encoding vocabulary induction every subword tokenizer
    * trains with): starting from the corpus word-frequency table with each
    * word split into characters, repeatedly merge the most frequent
    * adjacent symbol pair. Deterministic by construction — pair counts are
    * exact integer sums and ties break on (lhs, rhs) lexicographically —
    * so a second engine replays every round bit-identically (the DuckDB
    * oracle re-derives ALL rounds from the raw text, like the k-means
    * oracle replays both Lloyd rounds).
    *
    * Scale shape: ONE pass over the corpus builds the vocab-sized
    * (word, cnt) table (explode + map-side-combined count — the only
    * corpus-sized shuffle); each round is then one vocab-sized map-side-
    * combined pair-count aggregate, a 1-row `limit(1).collect()` (the
    * argmax pair), and a narrow literal `replace` — document text never
    * participates after the first pass. Words are symbol lists encoded as
    * a space-joined string with sentinel spaces (" a b c "), so the merge
    * is a literal string replace of " lhs rhs " → " lhsrhs "; both Spark
    * and DuckDB scan left-to-right continuing after each replacement,
    * which IS greedy left-to-right BPE merging (" a a a " → " aa a ").
    * The per-round frame is persisted and the previous round freed, so
    * lineage stays one round deep. */
  /** The corpus word-frequency table with each word pre-split into
    * sentinel-spaced characters — the persisted base every BPE round
    * re-derives its merge state from. */
  private def wcToks(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.AlnumTokens.col(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("toks",
        concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" ")))
      .select("cnt", "toks")

  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE persisted base (the vocab-sized word table, already char-split);
    // each round re-applies the accumulated merge chain as NARROW literal
    // `replace` projections over it. The old shape persisted every round's
    // frame and ran an extra count() job to materialize it before freeing
    // the parent — 2 jobs + a cache write per round; re-running ≤ `rounds`
    // cheap string replaces over the persisted vocab table is far cheaper
    // than that bookkeeping, so each round is now exactly ONE job (the
    // pair-count aggregate + argmax). Aggregates are unchanged → identical
    // merges.
    val base = wcToks(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      var toks: org.apache.spark.sql.Column = col("toks")
      merges.foreach { m =>
        toks = replace(toks, lit(s" ${m.lhs} ${m.rhs} "), lit(s" ${m.merged} "))
      }
      val cur = base.select(col("cnt"), toks.as("toks"))
      val toksArr = split(trim(col("toks")), " ")
      val best = cur
        .filter(size(toksArr) >= 2)
        .select(col("cnt"), explode(
          graft.functions.ConsecutivePairs.col(toksArr, "lhs", "rhs")).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, rr, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += BpeMerge(r, l, rr, l + rr, n)
      }
      r += 1
    }
    base.unpersist(false)
    spark.createDataset(merges.toSeq).toDF()
      .select(col("round"), col("lhs"), col("rhs"), col("merged"), col("n"))
  }

  /** Apply a learned BPE merge list ([[bpeMerges]] output, in training
    * order) to every document and count the resulting tokens — the
    * tokens-per-doc / chars-per-token table that prices a corpus in
    * tokenizer units (sequence-length budgeting, compression-ratio QA).
    * Pure codegen'd HOFs per row (split → per-word sentinel-space replace
    * chain → count): no shuffle, no UDF, no state — the merge list rides
    * into the plan as literals. Same greedy left-to-right semantics as
    * training (leftmost-continue literal replace). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame =
    // native BpeTokenCount kernel: the aggregate/transform wrapper around
    // the per-word sentinel-replace chain was interpreted per row (law in
    // NativeExprOptSpec); merge semantics (left-to-right literal replace,
    // training order) are unchanged
    docs.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars_enc"),
      graft.functions.BpeTokenCount.col(col(textCol), merges).as("n_tokens"))

  /** Temperature-scaled source mixing — the multilingual/multi-source
    * sampling recipe (Xue et al. 2021 mT5 §3.1; The Pile's per-set epoch
    * weights): draw source s with probability p_s ∝ n_s^tau (tau < 1
    * upweights small sources, tau = 1 is natural proportions), then
    * materialize a static mixed corpus of ≈ targetFrac·N docs by keeping
    * each doc of source s with rate r_s = min(1, targetFrac·N·p_s / n_s),
    * decided by the same content-stable md5 draw as [[weightedSample]].
    *
    * Scale shape: ONE map-side-combined `groupBy(source).count()` whose
    * output is source-cardinality-sized; the weight normalization runs as
    * windows over that tiny table (never the corpus); the rates broadcast-
    * join back and the keep decision is a pure per-row predicate — the
    * corpus itself never shuffles.
    *
    * Cross-engine determinism: n_s^tau for tau = 0.5 is an IEEE-exact
    * `sqrt`, but the SUM of those doubles is order-dependent, so each
    * weight is quantized to DECIMAL(28,12) first (exact, order-free sum —
    * the q_emb_dim_stats pattern) and the resulting rate is quantized to
    * 1e-9 before it is formatted into the md5 cut, so a second engine
    * reproduces every keep decision bit-identically. */
  def temperatureMix(docs: DataFrame, idCol: String, sourceCol: String,
                     tau: Double = 0.5, targetFrac: Double = 0.5): DataFrame =
    weightedSample(
      docs.join(broadcast(mixRates(docs, sourceCol, tau, targetFrac, 1.0)),
        sourceCol),
      idCol, col("mix_rate"))

  /** The per-source temperature-mix acceptance-rate table shared by
    * [[temperatureMix]] (downsample-only, cap 1.0) and [[upsampleMix]]
    * (cap = the epoch budget). One source-sized aggregate; the window
    * runs over that tiny frame, never the corpus. */
  private def mixRates(docs: DataFrame, sourceCol: String, tau: Double,
                       targetFrac: Double, maxRate: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tau > 0 && targetFrac > 0 && maxRate > 0,
      s"bad tau=$tau targetFrac=$targetFrac maxRate=$maxRate")
    val all = Window.partitionBy() // over the source-sized aggregate only
    docs.groupBy(sourceCol).agg(count(lit(1)).as("n_s"))
      .withColumn("w",
        pow(col("n_s").cast("double"), tau).cast("decimal(28,12)"))
      .withColumn("p",
        col("w").cast("double") / sum("w").over(all).cast("double"))
      .withColumn("mix_rate", least(lit(maxRate), round(
        col("p") * lit(targetFrac) * sum("n_s").over(all) / col("n_s"), 9)))
      .select(col(sourceCol), col("mix_rate"))
  }

  /** Deterministic upsampling — the half of a mixture recipe
    * [[weightedSample]] cannot express: a rate r MAY EXCEED 1, and each
    * document emits floor(r) whole copies plus one more iff its md5
    * fraction falls below frac(r) — expected copies = r exactly, the
    * extra-copy draw is the same content-stable md5 cut as every sampler
    * here (identical across runs/engines/partitionings), and the output
    * carries `copy_idx` (0-based) so (id, copy_idx) stays a key for
    * downstream shuffling/packing. Epoch semantics: r = 3.25 means every
    * doc appears in 3 epochs and a stable quarter of docs in a 4th.
    * Scale shape: a pure narrow projection + explode — no shuffle, no
    * state; the blow-up factor is exactly the mixture's epoch budget. */
  def upsample(docs: DataFrame, idCol: String, rate: Column): DataFrame = {
    val r = round(greatest(rate, lit(0.0)), 9)
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    val frac = r - floor(r)
    val cutHex = lower(lpad(hex(floor(frac * 4294967296.0).cast("long")), 8, "0"))
    docs
      .withColumn("n_copies",
        (floor(r) + when(h < cutHex, 1).otherwise(0)).cast("int"))
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0), col("n_copies") - 1)))
  }

  /** Temperature mixing WITH upsampling (the mT5/Pile recipe as actually
    * trained): per-source rates p_s·target·N/n_s from the same n_s^tau
    * law as [[temperatureMix]], but small high-quality sources get rates
    * above 1 (multiple epochs) instead of being capped — bounded by
    * `maxEpochs`, the standard repetition-harm guard (Muennighoff 2023
    * observes diminishing returns past ~4 epochs). Every doc of an
    * upsampled source appears floor(r) times plus a content-stable
    * fractional draw, via [[upsample]]. */
  def upsampleMix(docs: DataFrame, idCol: String, sourceCol: String,
                  tau: Double = 0.5, targetFrac: Double = 1.0,
                  maxEpochs: Double = 4.0): DataFrame =
    upsample(
      docs.join(
        broadcast(mixRates(docs, sourceCol, tau, targetFrac, maxEpochs)),
        sourceCol),
      idCol, col("mix_rate"))

  /** Token-budget sequence packing — the last stage before training: lay
    * the corpus out as ONE deterministic token stream (order = md5(id),
    * content-stable like every sampler here) and cut it into fixed-budget
    * shards; each document gets its global `start_tok` offset and the
    * `shard` its first token lands in (floor(start/budget) — documents may
    * straddle a boundary, the standard concat-then-split packing).
    *
    * Scale shape: a global running sum done as the classic two-level
    * distributed prefix sum — NOT one corpus-wide window (which would put
    * 10^12 rows in a single task): documents partition into 256 groups by
    * their md5's first two hex chars (a PREFIX of the order key, so group
    * order ⊂ global order); the within-group exclusive cumsum is a
    * 256-way partitioned window, the 256 group totals take one tiny
    * driver-side window, and the group offset joins back as a broadcast.
    * Token counts are the exact whitespace-split word count, so a second
    * engine reproduces every offset bit-for-bit. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0, s"bad budget $budgetTokens")
    val ordExpr = md5(col(idCol).cast("string"))
    val base = docs.select(col(idCol), ordExpr.as("__ord"),
      substring(ordExpr, 1, 2).as("__g"),
      size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tok"))
    val wIn = Window.partitionBy("__g").orderBy("__ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = base
      .withColumn("__within", coalesce(sum("n_tok").over(wIn), lit(0L)))
    val offsets = base.groupBy("__g").agg(sum("n_tok").as("__tot"))
      .withColumn("__off", coalesce(
        sum("__tot").over(Window.partitionBy().orderBy("__g")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__g", "__off")
    withIn.join(broadcast(offsets), "__g")
      .withColumn("start_tok", col("__off") + col("__within"))
      .withColumn("shard", expr(s"start_tok DIV $budgetTokens"))
      .select(col(idCol), col("n_tok"), col("start_tok"), col("shard"))
  }

  /** Duplication-aware sampling — the soft alternative to hard keeper
    * election: keep each doc with rate 1/size(cluster)^beta, where the
    * cluster is its near-dup connected component (absent → singleton,
    * rate 1). With beta = 1 every dup cluster contributes ONE expected
    * survivor but, unlike `keepersFromComponents`, which member survives
    * is an unbiased content-stable draw and large clusters retain a
    * diversity tail; beta < 1 dampens instead of fully flattening.
    *
    * Scale shape: cluster sizes are one aggregate over the components
    * table (pair-derived — orders of magnitude smaller than the corpus);
    * the size map joins back onto docs by id, which AQE plans as a
    * broadcast when the dup set is small (the common case) and a skinny
    * (id, size) shuffle otherwise; the keep decision is then the pure
    * [[weightedSample]] predicate. The 1/size^beta rate is quantized to
    * 1e-9 like [[temperatureMix]] so engines agree on every draw. */
  def dupAwareSample(docs: DataFrame, components: DataFrame, idCol: String,
                     beta: Double = 1.0): DataFrame = {
    val sizes = components.groupBy("comp").agg(count(lit(1)).as("c_size"))
    val byId = components.join(sizes, "comp")
      .select(col("id").as("__dup_id"), col("c_size"))
    val joined = docs
      .join(byId, docs(idCol) === col("__dup_id"), "left")
      .drop("__dup_id")
      .withColumn("c_size", coalesce(col("c_size"), lit(1L)))
      .withColumn("samp_rate",
        round(lit(1.0) / pow(col("c_size").cast("double"), beta), 9))
    weightedSample(joined, idCol, col("samp_rate"))
  }

  /** In-corpus n-gram LM self-scoring — the CCNet loop closed on the
    * corpus itself (Wenzek et al. 2020 §4.2 trains a KenLM on a trusted
    * split and scores everything with it; here the "trusted split" is the
    * content-stable train split of [[hashSplit]]): trains an add-k-
    * smoothed char-trigram LM from exact corpus counts and scores EVERY
    * doc with its average negative log-likelihood per trigram, nll =
    * −Σ ln p(c₃|c₁c₂) / n_tri with p = (c3+k)/(c2+k·V). Low nll = fluent
    * under the corpus's own distribution; high = outlier/garbled. Docs
    * shorter than 3 chars carry no trigram and are omitted.
    *
    * Scale shape: the trained model (c3, c2, V) is alphabet-bounded
    * (≤ |Σ|³ rows) — ONE map-side-combined count over the train split,
    * then both count tables broadcast; scoring explodes each doc's
    * trigram occurrences map-locally, joins the broadcast counts without
    * any exchange, and partial-aggregates per doc so only (id, sum, cnt)
    * rows ever shuffle. Nothing corpus-sized is ever wide.
    *
    * Cross-engine determinism: the ln argument is a ratio of exact
    * integer-derived doubles (identical in any IEEE engine — the
    * q_docs_pmi pattern); each term is rounded to 1e-6 and summed as
    * DECIMAL(18,6) (exact, order-free), and the final division is the
    * only float op after aggregation, so DuckDB reproduces the score
    * bit-identically. */
  def lmSelfScore(docs: DataFrame, idCol: String, textCol: String,
                  k: Double = 0.5): DataFrame = {
    // Trigrams travel as PACKED CODE-POINT LONGS (graft.functions
    // TrigramCodes: cp1·2⁴² | cp2·2²¹ | cp3 — bijective, so code equality
    // IS trigram equality): the corpus-sized explode emits one long per
    // occurrence instead of a 3-char string, the prefix context is
    // `shiftright(g, 21)` instead of a substring, and every join keys on
    // longs. The model is alphabet-bounded (≤ |Σ|³ rows) BY DESIGN, so it
    // is collected once and c2 / V / the per-trigram log-probs derive
    // from the collected table as LOCAL relations — the round-5 shape
    // re-exploded the train split for each of the three model subtrees,
    // and computed log((c3+k)/(c2+kV)) + round + decimal conversion PER
    // OCCURRENCE (~12M times at sf0.1); now the scoring pass only
    // hash-probes two broadcast lookup tables and coalesces. Every lp
    // value is computed by the SAME Spark expression shapes as before
    // (over the local tables), so scores are bit-identical.
    val spark = docs.sparkSession
    import spark.implicits._
    val codes = graft.functions.TrigramCodes
    val train = hashSplit(docs, idCol).filter(col("split") === "train")
    val c3Rows = train.select(explode(codes.col(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c3"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val c3 = c3Rows.toSeq.toDF("g", "c3")
    val c2 = c3.groupBy(shiftright(col("g"), 21).as("pre"))
      .agg(sum("c3").as("c2"))
    val vRow = c3.agg(
      count_distinct(col("g").bitwiseAND(lit(0x1FFFFFL))).as("v")).collect()(0)
    val v = vRow.getLong(0) // one scalar: the next-char alphabet size
    require(v > 0, "lmSelfScore: empty train split — no trigrams to train on")
    // per-trigram (lp3) and unseen-trigram-per-prefix (lp2) log-probs,
    // precomputed over the tiny local model tables; the both-unseen
    // fallback is one scalar computed by the same expression
    val lp3 = c3.withColumn("pre", shiftright(col("g"), 21))
      .join(c2, "pre")
      .select(col("g"),
        round(log((col("c3") + lit(k)) / (col("c2") + lit(k * v))), 6)
          .cast("decimal(18,6)").as("lp3"))
    val lp2 = c2.select(col("pre"),
      round(log((lit(0L) + lit(k)) / (col("c2") + lit(k * v))), 6)
        .cast("decimal(18,6)").as("lp2"))
    val lpg = Seq(1).toDF("one").select(
      round(log((lit(0L) + lit(k)) / (lit(0L) + lit(k * v))), 6)
        .cast("decimal(18,6)").as("lp")).head.getDecimal(0)
    val occ = docs.select(col(idCol),
        explode(codes.col(col(textCol))).as("g"))
      .join(broadcast(lp3), Seq("g"), "left")
      .join(broadcast(lp2), shiftright(col("g"), 21) === col("pre"), "left")
      .select(col(idCol),
        coalesce(col("lp3"), col("lp2"),
          lit(lpg).cast("decimal(18,6)")).as("lp"))
    occ.groupBy(idCol).agg(
      count(lit(1)).as("n_tri"),
      round(-sum(col("lp")).cast("double") / count(lit(1)), 6).as("nll"))
  }

  /** Model-calibration reliability table — the audit run before trusting
    * a quality classifier's scores as keep probabilities (threshold
    * sweeps and mixture recipes both consume the score AS a probability,
    * which is only sound if the model is calibrated): scores in [0, 1]
    * bucketed into `nBins`, per bin the population, mean score, observed
    * positive rate, and the |mean − observed| gap (Σ n/N·gap = ECE). A
    * calibrated model's bins sit near the diagonal; a confident-but-wrong
    * head shows top bins with frac_pos far below mean_score.
    *
    * Determinism: the score is clipped to DECIMAL(18,6) before both
    * binning and averaging, so bin membership and mean_score are exact
    * integer/decimal math — order-independent across partitions and
    * bit-replayable by a second engine (the same discipline as
    * [[lmSelfScore]]'s decimal log-probs). One map-side-combined
    * aggregate; output is nBins rows. */
  def calibrationTable(df: DataFrame, score: Column, label: Column,
                       nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins $nBins")
    import org.apache.spark.sql.types.DecimalType
    val s = score.cast(DecimalType(18, 6))
    val bin = least(greatest(floor(s * nBins), lit(0)), lit(nBins - 1))
      .cast("long")
    df.select(bin.as("bin"), s.as("s"), label.cast("int").as("y"))
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        round(sum(col("s")).cast("double") / count(lit(1)), 6)
          .as("mean_score"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"))
      .withColumn("gap", round(abs(col("mean_score") - col("frac_pos")), 6))
      .orderBy("bin")
  }

  /** Distribution-drift monitor: Population Stability Index between a
    * reference population and a current one, over a bucketed numeric
    * metric — the audit a 100 TB ingest runs per batch ("did today's
    * crawl shift the length/quality distribution?") and per filter
    * ("what did the gate do to the distribution it kept?"). PSI =
    * Σ_buckets (p_cur − p_ref)·ln(p_cur/p_ref); the standard traffic-light
    * reading is < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * `metric` is any numeric column expression evaluated against BOTH
    * frames; bucket = clamp(floor(metric/bucketWidth), 0, nBuckets−1).
    * Shares are clamped at `eps` before the log so empty buckets are
    * well-defined (the usual PSI convention). Per-bucket output (bucket,
    * n_ref, n_cur, p_ref, p_cur, psi), `sum(psi)` = the index.
    *
    * Shape: one map-side-combined count per side (each a single pass, no
    * text ever shuffles — only (bucket, count) rows), a ≤ nBuckets-row
    * full-outer join, and window totals over those same ≤ nBuckets rows.
    * 100 TB-safe by construction: everything after the two scans is
    * bucket-cardinality-sized. */
  def psiDrift(ref: DataFrame, cur: DataFrame, metric: Column,
               bucketWidth: Double, nBuckets: Int,
               eps: Double = 1e-6): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth")
    require(nBuckets >= 2, s"nBuckets $nBuckets")
    def counts(df: DataFrame, as: String): DataFrame =
      df.select(least(greatest(floor(metric / bucketWidth), lit(0)),
          lit(nBuckets - 1)).cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(as))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val joined = counts(ref, "n_ref")
      .join(counts(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val pRef = greatest(col("n_ref").cast("double") / sum("n_ref").over(w),
      lit(eps))
    val pCur = greatest(col("n_cur").cast("double") / sum("n_cur").over(w),
      lit(eps))
    joined.select(col("bucket"), col("n_ref"), col("n_cur"),
        round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi"))
  }
}
