package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineSim, HyperplaneBands, MatchCount, MinHashSig, SketchHamming}

/** Large-scale deduplication & similarity operators for training-data
  * pipelines. All shapes are the standard distributed formulations:
  *
  *  - signatures (MinHash / SimHash / hyperplane sign bits) are pure per-row
  *    column expressions — NO shuffle, no row explosion, computed inside the
  *    scan stage;
  *  - candidate generation is an LSH band-bucket equi-join, so pairwise work
  *    is bucket-local and the all-pairs blowup never materializes;
  *  - verification attaches per-doc shingle/token arrays to the (small)
  *    candidate set with plain equi-joins and computes exact overlap with a
  *    single `array_intersect` expression — one codegen'd stage, no cache.
  *
  * Recall of the banded schemes is OR-amplified: a pair is a candidate if ANY
  * band matches (P[miss] = (1−s^r)^b for MinHash; (1−(1−θ/π)^r)^b for
  * hyperplane LSH) — tune (b, r) per threshold; defaults target ≥0.999
  * recall at the documented thresholds.
  */
object Dedup {

  /** Exact dedup: one keeper per identical text (hash-groupBy shape;
    * map-side partial agg, one shuffle on the text hash). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")

  /** Decontamination against a REFERENCE corpus — the pass every training
    * pipeline runs before an eval set is trusted in the other direction:
    * remove from `docs` every document whose exact text occurs in `ref`
    * (benchmark questions, held-out eval documents, blocklists).
    *
    * Shape: anti-join on the 128-bit md5 of the text — the reference side
    * reduces to one 32-char hash per document, so an eval-set-sized `ref`
    * broadcasts (`broadcastRef = true`, default) and the 10^12-row `docs`
    * side is filtered in a single narrow stage with NO shuffle of the
    * corpus. A 128-bit hash match IS a text match for any practical corpus
    * (collision odds ~2^-128 per pair); a Bloom prefilter would add
    * nothing here — a broadcast hash set is a Bloom filter with fpp = 0
    * at the same order of memory once the keys are 16 bytes. For a `ref`
    * too large to broadcast, pass `broadcastRef = false` and the planner
    * runs a shuffle anti-join on the hash instead. */
  def decontaminate(docs: DataFrame, textCol: String,
                    ref: DataFrame, refTextCol: String,
                    broadcastRef: Boolean = true): DataFrame = {
    val refH = ref.select(md5(col(refTextCol)).as("ref_md5")).distinct()
    docs.join(if (broadcastRef) broadcast(refH) else refH,
      md5(col(textCol)) === col("ref_md5"), "left_anti")
  }

  /** Shard index of an md5 hex string: leading 16 bits of the hash, which
    * is already uniform. Computed by the SAME plain-Scala function on the
    * filter-build side and the probe side, so the two can never disagree. */
  private def bloomShardOf(md5Hex: String, shards: Int): Int =
    java.lang.Integer.parseInt(md5Hex.substring(0, 4), 16) % shards

  /** Decontamination for a reference corpus TOO LARGE to broadcast as an
    * exact hash set (cross-corpus decontamination, 10^9+-entry blocklists):
    * the Bloom-prefilter / exact-confirm two-phase, with an output
    * guaranteed IDENTICAL to [[decontaminate]].
    *
    * Why the exact path breaks first: once `ref` outgrows the broadcast
    * budget, the md5 anti-join becomes a shuffle anti-join that moves the
    * ENTIRE 10^12-row corpus. This variant never shuffles the corpus:
    *
    *  1. build `shards` Bloom filters over the ref md5s — one skinny
    *     shuffle of 32-char hashes, each shard's filter built in its own
    *     task (bounded task memory: n/shards keys), then assembled on the
    *     driver and broadcast. Bits scale with n·ln(1/fpp): 10^9 keys at
    *     fpp 1e-6 is ~3.4 GB — torrent-broadcastable where the exact
    *     16-byte-key hash set (plus set overhead) is not, and the probe
    *     costs O(1) per row either way.
    *  2. probe: a narrow filter over `docs` keeps only Bloom hits. No
    *     false negatives, so nothing contaminated escapes; expected false
    *     positives ≈ fpp·|docs| — CHOOSE `fpp ≲ budget/|docs|` (e.g.
    *     1e-6 at 10^12 rows → ~10^6 stray candidates). The distinct
    *     candidate-md5 set is the only thing shuffled out of the corpus.
    *  3. confirm: semi-join `ref` against the (small, broadcast) candidate
    *     set — ref is scanned once more but never shuffled — yielding the
    *     true contaminated-md5 set, which broadcast-anti-joins back onto
    *     `docs` in a second narrow pass.
    *
    * False positives die in step 3, so the result equals the exact
    * anti-join bit-for-bit regardless of `fpp` (gated in DedupSpec with a
    * deliberately terrible fpp=0.5 filter). Cost shape at 100 TB: two
    * narrow scans of the corpus + two scans of ref, zero wide exchange of
    * either. The probe UDF leaves whole-stage codegen for one stage — the
    * price of an O(1)-memory-per-row membership test Spark has no native
    * expression for. */
  def decontaminateBloom(docs: DataFrame, textCol: String,
                         ref: DataFrame, refTextCol: String,
                         fpp: Double = 1e-4,
                         shards: Int = 16,
                         expectedRefItems: Long = -1L): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val spark = docs.sparkSession
    import spark.implicits._
    require(shards >= 1 && shards <= 65536, s"shards out of range: $shards")
    val refH = ref.select(md5(col(refTextCol)).as("ref_md5")).distinct()
    val n = if (expectedRefItems > 0) expectedRefItems else refH.count()
    val perShard = math.max(64L, n / shards + 1)
    val built = refH.as[String]
      .groupByKey(bloomShardOf(_, shards))
      .mapGroups { (shard, it) =>
        val bf = BloomFilter.create(perShard, fpp)
        it.foreach(bf.putString)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (shard, bos.toByteArray)
      }.collect()
    val filters = new Array[BloomFilter](shards)
    built.foreach { case (s, bytes) =>
      filters(s) = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    }
    val bFilters = spark.sparkContext.broadcast(filters)
    val mightHit = udf { (m: String) =>
      m != null && {
        val f = bFilters.value(bloomShardOf(m, shards))
        f != null && f.mightContainString(m)
      }
    }
    val withMd5 = docs.withColumn("__decon_md5", md5(col(textCol)))
    val candMd5 = withMd5.filter(mightHit(col("__decon_md5")))
      .select(col("__decon_md5").as("cand_md5")).distinct()
    val confirmed = refH
      .join(broadcast(candMd5), col("ref_md5") === col("cand_md5"), "left_semi")
    withMd5
      .join(broadcast(confirmed), col("__decon_md5") === col("ref_md5"),
        "left_anti")
      .drop("__decon_md5")
  }

  /** Spread a small scan across the session's default parallelism: a
    * single-file table plans one input partition, which would serialize
    * every expensive narrow stage (signatures, fingerprints) onto one core
    * AND recompute it per plan branch — the repartition exchange is instead
    * computed once and reused by all branches. A no-op when the input
    * already has enough partitions (the 100 TB case). */
  private def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Hot-bucket guard — the standard production cap on LSH candidate
    * generation: keep only rows whose bucket key is shared by ≤ `cap` rows.
    * A bucket of k rows contributes k²/2 pairs to the downstream self-join,
    * so one pathological key (a boilerplate stop-gram, an all-identical
    * cluster, a degenerate band) otherwise emits quadratic work; with the
    * cap, candidate volume is bounded by cap·|rows| regardless of skew.
    * Exact-dup mega-clusters dropped here are the job of `exact` dedup,
    * which precedes near-dup in any production pipeline (and still surfaces
    * them). The per-key counts are computed with one map-side-combined
    * groupBy on the same key the join shuffles on — no extra wide columns
    * travel. Reference analog: bound the worst-case unit of work before the
    * expensive step (`/root/reference/Backend/utils/ai_processor.py:69-76`).
    * `cap ≤ 0` disables. Use `hotBuckets` for the dropped-key report.
    *
    * `broadcastHot`: the hot-key list numbers ≤ |rows|/cap BY CONSTRUCTION
    * (that is the point of the cap), so for production caps (2^10..2^16) it
    * broadcasts comfortably and the banded frame is never shuffled by the
    * guard. With a SMALL cap on a billion-row input that bound can still be
    * millions of keys — pass `broadcastHot = false` there to drop the hint
    * and let the planner (AQE) pick shuffle vs broadcast from the measured
    * size instead of forcing driver-side collection. */
  def capBuckets(rows: DataFrame, keys: Seq[String], cap: Int,
                 broadcastHot: Boolean = true): DataFrame =
    if (cap <= 0) rows
    else {
      // ANTI-join against the hot-key list, not a semi-join against the
      // cool keys: the hot side is the small one.
      // (Round 6 measured alternative, rejected: repartitioning by the
      // bucket keys here so the row-generation subtree sits below one
      // shared exchange removes the plan-tree duplication the static
      // broadcast planner creates at bench scale — but it regressed the
      // gram-join family 4x (containment 2.4 s -> 9.8 s at sf0.1): the
      // extra exchange/stage rounds cost more than the now-cheap
      // (nativized) duplicated subtrees, and at 100 TB the planner never
      // broadcasts corpus-sized band frames, so exchanges are shared
      // naturally there.)
      val hot = hotBuckets(rows, keys, cap).select(keys.map(col): _*)
      rows.join(if (broadcastHot) broadcast(hot) else hot, keys, "left_anti")
    }

  /** Dropped-bucket report for `capBuckets` — the over-cap keys and their
    * populations. Run it alongside a capped query to log/persist how much
    * the guard dropped (a capped run that silently reads as "covered
    * everything" is the anti-pattern; this is the counter). */
  def hotBuckets(rows: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > cap)

  /** All keys within Hamming distance ≤ `bits` of a band key of `width`
    * bits (multi-probe LSH): the key itself, its 1-bit flips, and (bits=2)
    * its 2-bit flips. Probing trades a small constant row expansion for the
    * recall of much NARROWER (more selective) buckets: covering Hamming
    * radius r by probing keeps bucket population at n/2^width instead of
    * the n/2^(width−r) that widening the match radius via shorter keys
    * would cost. */
  private[pipeline] def probeKeys(key: Column, width: Int, bits: Int): Column = {
    require(bits >= 0 && bits <= 2, s"probe bits $bits not in 0..2")
    val flips1 = (0 until width).map(j => key.bitwiseXOR(lit(1L << j)))
    val flips2 =
      if (bits < 2) Seq.empty
      else for { i <- 0 until width; j <- i + 1 until width }
        yield key.bitwiseXOR(lit((1L << i) | (1L << j)))
    array((Seq(key) ++ (if (bits >= 1) flips1 else Nil) ++ flips2): _*)
  }

  /** Explode a banded frame's `key` column to its probe set. */
  private def withProbes(banded: DataFrame, width: Int, bits: Int): DataFrame =
    if (bits <= 0) banded
    else {
      val others = banded.columns.filterNot(_ == "key").toSeq.map(col)
      banded.select(
        others :+ explode(probeKeys(col("key"), width, bits)).as("key"): _*)
    }

  /** Character k-shingles of a text column (distinct per doc). Native
    * codegen'd expression — the former
    * `array_distinct(transform(sequence(...), substring))` chain is
    * CodegenFallback (interpreted per row) and was the dominant CPU of
    * every verify-tier attach join; CharShingles produces the identical
    * first-occurrence-distinct array in one pass (equivalence law in
    * NativeExprOptSpec). */
  def shingles(textCol: Column, k: Int): Column =
    graft.functions.CharShingles.col(textCol, k)

  /** LSH band keys from a MinHash signature: `numHashes / rowsPerBand`
    * (band, band_hash) structs per row. */
  def minhashBandKeys(sig: Column, numHashes: Int, rowsPerBand: Int): Column =
    // native codegen'd kernel — the transform/slice/array_join/cast HOF
    // tree is CodegenFallback (interpreted per row, one string allocation
    // per signature element) and was the single hottest pipeline of the
    // LSH family; band hashes are bit-identical (NativeExprOptSpec law)
    graft.functions.MinHashBandKeys.col(sig, numHashes, rowsPerBand)

  /** LSH candidate pairs (id_a < id_b) from shared band buckets. The join
    * is bucket-local: keyed on (band, band_hash), so only colliding docs
    * ever meet — the all-pairs blowup never materializes. `maxBucket > 0`
    * additionally caps any single bucket's population (`capBuckets`),
    * bounding worst-case candidate volume on skewed corpora. */
  def lshCandidates(bands: DataFrame, maxBucket: Int = 0): DataFrame = {
    val capped = capBuckets(bands, Seq("band", "band_hash"), maxBucket)
    val a = capped.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = capped.select(col("band"), col("band_hash"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Cheap similarity tier between candidate generation and the exact
    * verify: attach per-doc MinHash signatures (numHashes longs ≪ the full
    * shingle arrays) and keep pairs whose matching-element fraction — an
    * unbiased Jaccard estimate — clears `minJaccard` minus a margin that
    * SCALES with the estimator's σ (= sqrt(J(1−J)/numHashes) ≤
    * 0.5/sqrt(numHashes)): margin = 4.5σ_max, so a true pair at exactly the
    * verify threshold is dropped with probability ≤ ~3e-6 at any
    * `numHashes`, while the sub-threshold bulk is pruned before any wide
    * array travels through a join. The tier is a recall/cost trade-off by
    * construction — probabilistic, bounded, and tunable via `numHashes`. */
  def sigEstimateFilter(docs: DataFrame, idCol: String, textCol: String,
                        cands: DataFrame, shingleK: Int, minJaccard: Double,
                        numHashes: Int = 80): DataFrame = {
    val minEst =
      math.max(0.0, minJaccard - 4.5 * math.sqrt(0.25 / numHashes))
    // callers pass docs already pruned to candidate ids (candidateDocs),
    // so the numHashes re-mixes run only for docs in some candidate pair
    val sig = docs.select(col(idCol).as("id"),
      MinHashSig.col(col(textCol), shingleK, numHashes).as("sig"))
    cands
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est",
        MatchCount.col(col("sig_a"), col("sig_b")).cast(DoubleType) / numHashes)
      // coalesce(cond, false) is filter-identical (a NULL condition already
      // drops the row) but stops constraint inference: the bare predicate
      // made the optimizer infer isnotnull(sig_a/sig_b) and push
      // isnotnull(minhashsig(text)) into the SCAN filters of both attach
      // frames — one extra full-corpus signature evaluation per side
      // (measured ~10 executor-seconds per near-dup query at sf0.1). The
      // same guard wraps every verify/estimate-tier filter in this file.
      .filter(coalesce(col("est") >= minEst, lit(false)))
      .select("id_a", "id_b")
  }

  /** The containment analog of `sigEstimateFilter`: prune candidate pairs
    * with the SAME cheap MinHash Jaccard estimator, translated per pair to
    * the containment threshold. A pair at containment exactly C with
    * distinct-shingle counts (n_a, n_b) has intersection I = C·min(n_a,n_b)
    * and therefore Jaccard J_req = C·min / (n_a + n_b − C·min) — so keeping
    * pairs with ĵ ≥ J_req − 4.5σ (σ ≤ 0.5/√numHashes) is the same ≤ ~3e-6
    * per-true-pair miss contract as the Jaccard tier. Selectivity is where
    * it counts at scale: the sub-threshold bulk is SYMMETRIC-size pairs
    * (n_a ≈ n_b ⇒ J_req ≈ C/(2−C) ≈ 0.82 at C = 0.9 — a tight cutoff the
    * gram-count estimate can't deliver for short docs, where its
    * 4.5·sqrt(0.25/minFp) margin collapses to zero selectivity), while
    * genuinely asymmetric small-in-big pairs get the low J_req they need
    * to survive to the exact verify. */
  def containmentEstimateFilter(docs: DataFrame, idCol: String,
                                textCol: String, cands: DataFrame,
                                shingleK: Int, minContainment: Double,
                                numHashes: Int = 128): DataFrame = {
    val margin = 4.5 * math.sqrt(0.25 / numHashes)
    // callers pass docs already pruned to candidate ids (candidateDocs)
    val sig = docs.select(col(idCol).as("id"),
      MinHashSig.col(col(textCol), shingleK, numHashes).as("sig"),
      size(shingles(col(textCol), shingleK)).cast(DoubleType).as("n"))
    val mn = least(col("n_a"), col("n_b"))
    val jreq = lit(minContainment) * mn /
      (col("n_a") + col("n_b") - lit(minContainment) * mn)
    cands
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a"),
        col("n").as("n_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b"),
        col("n").as("n_b")), "id_b")
      .withColumn("est",
        MatchCount.col(col("sig_a"), col("sig_b")).cast(DoubleType) / numHashes)
      .filter(coalesce(col("est") >= jreq - lit(margin), lit(false)))
      .select("id_a", "id_b")
  }

  /** Doc-id frame of a candidate pair set — the prune key for attaching
    * per-doc artifacts (signatures, shingle arrays) to candidates. */
  private def candIdFrame(cands: DataFrame): DataFrame =
    cands.select(explode(array(col("id_a"), col("id_b"))).as("id"))

  /** Candidate-doc prune: broadcast LEFT SEMI join of a per-doc frame
    * against the candidate pair set's ids, applied BEFORE any expensive
    * per-doc expression (signatures, shingle arrays) is computed — without
    * it each attach join evaluates those expressions for the WHOLE corpus
    * even though only candidate docs ever match (guide §2.3 "project
    * before the exchange" / §3.2 "reduce the big side before shuffling
    * it"). Call it ONCE per operator with a single shared `ids` frame: the
    * broadcast-exchange subtree is then identical at every consumer and
    * Spark's ReuseExchange evaluates the candidate generator once for the
    * prune, not once per attach branch (the nested-prune formulation
    * re-ran the generator ~4× and regressed every expensive-candidate
    * operator). No distinct on the ids: a semi join ignores duplicates,
    * and the dedup would cost an exchange of its own. */
  private def pruneToCands(docs: DataFrame, ids: DataFrame): DataFrame =
    docs.join(broadcast(ids), Seq("id"), "left_semi")

  /** Exact Jaccard verification of candidate pairs against a per-doc
    * (id, arr) set frame: two equi-joins attach the arrays to the candidate
    * set, one `array_intersect` computes |A∩B|, |A∪B| = |A|+|B|−|A∩B|.
    * Single codegen'd stage after the joins — replaces the round-1 four-join
    * exploded-shingle plan (and its cache). Callers pass a set frame
    * already pruned to candidate ids (pruneToCands), so shingle arrays are
    * built only for docs that actually reached a candidate pair. */
  def jaccardVerifyArrays(sets: DataFrame, candidates: DataFrame,
                          minJaccard: Double): DataFrame = {
    candidates
      .join(sets.select(col("id").as("id_a"), col("arr").as("arr_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("arr").as("arr_b")), "id_b")
      .withColumn("n_inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .withColumn("jaccard", col("n_inter").cast(DoubleType) /
        (size(col("arr_a")) + size(col("arr_b")) - col("n_inter")))
      .filter(coalesce(col("jaccard") >= minJaccard, lit(false)))
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash-LSH near-dup end to end: native per-row signature (`MinHashSig`
    * codegen'd expression — no shuffle, no row explosion) → band-bucket
    * candidates → single-expression Jaccard verify.
    *
    * Band sizing is selectivity-critical on self-similar corpora: with
    * baseline pair similarity J₀, a band of r rows collides on a random
    * pair with probability J₀^r — r must be large enough that candidates
    * stay sparse (r = 2 on a J₀ ≈ 0.2 corpus admits most of the quadratic
    * pair space). Default 16 bands × 5 rows: P[collide] at J₀ = 0.25 is
    * 16·0.001 ≈ 1.6%, while P[miss] at J = 0.83 (the lowest true near-dup
    * in the test corpora) is (1−0.83⁵)^16 ≈ 3e-4. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, numHashes: Int = 80, rowsPerBand: Int = 5,
                   minJaccard: Double = 0.5, maxBucket: Int = 0,
                   estHashes: Int = 128): DataFrame = {
    val base = spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")))
    val bands = base.select(col("id"),
        explode(minhashBandKeys(
          MinHashSig.col(col("txt"), shingleK, numHashes),
          numHashes, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    // estimate tier at 128 hashes (vs 80 banding hashes): the 4.5σ margin
    // shrinks with 1/√numHashes, so more hashes ⇒ a TIGHTER estimate cutoff
    // ⇒ fewer sub-threshold pairs reach the wide-array verify — the extra
    // per-row re-mixes are narrow-stage noise next to a verify join row.
    // Both tiers read candidate docs only (pruneToCands): the 128-hash
    // signatures and the shingle arrays are computed for the few docs in
    // some candidate pair, never the whole corpus.
    val cands = lshCandidates(bands, maxBucket)
    val cd = pruneToCands(base, candIdFrame(cands))
    val pruned = sigEstimateFilter(cd, "id", "txt",
      cands, shingleK, minJaccard, estHashes)
    val sets = cd.select(col("id"), shingles(col("txt"), shingleK).as("arr"))
    jaccardVerifyArrays(sets, pruned, minJaccard)
  }

  /** 64-bit SimHash per doc (native codegen'd `SimHash64` expression —
    * computed inside the scan stage, no UDF ser/de). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    spread(docs.select(col(idCol).as("id"), col(textCol).as("t")))
      .select(col("id"), graft.functions.SimHash64.col(col("t")).as("simhash"))

  /** SimHash near-dup pairs within `maxHamming`, candidate-limited by
    * band collisions over `numBands` equal slices of the 64-bit fingerprint,
    * optionally widened by multi-probe and bounded by a hot-bucket cap.
    *
    * Pigeonhole recall guarantee: a pair at Hamming ≤ H differs in ≤
    * ⌊H/numBands⌋ bits of its BEST band, so with probe coverage of radius
    * `probeBits` per band, every pair with
    * `maxHamming ≤ numBands·(probeBits+1) − 1` is structurally found
    * (4 exact bands cover ham ≤ 3; 4 bands probed to radius 2 cover
    * ham ≤ 11). Prefer WIDE bands + probes over narrow bands: 4×16-bit
    * keys give 65,536 distinct values per band (bucket population n/65,536
    * on spread-out corpora) where 8×8-bit gives 256 (population n/256 —
    * quadratic pair volume at corpus scale). `probeBits` is split across
    * the two join sides (⌈p/2⌉ + ⌊p/2⌋ meet-in-the-middle), so the row
    * expansion is 2·(width+1) rows at p=2, not C(width,2). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, numBands: Int = 4,
                   probeBits: Int = 0, maxBucket: Int = 0): DataFrame =
    hamming64Pairs(simhash(docs, idCol, textCol), "id", "simhash",
      maxHamming, numBands, probeBits, maxBucket)

  /** Banded Hamming-ball pair search over ANY 64-bit hash column — the
    * machinery behind `simhashPairs`, exposed directly so other 64-bit
    * fingerprints (e.g. the acoustic fingerprint,
    * `Heuristics.audioFingerprint`) ride the same capped multi-probe
    * banding. Same recall guarantee: every pair within
    * `numBands·(probeBits+1) − 1` Hamming is structurally found. */
  def hamming64Pairs(hashed: DataFrame, idCol: String, hashCol: String,
                     maxHamming: Int = 3, numBands: Int = 4,
                     probeBits: Int = 0, maxBucket: Int = 0): DataFrame = {
    require(64 % numBands == 0, s"numBands $numBands must divide 64")
    val width = 64 / numBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sh = hashed.select(col(idCol).as("id"), col(hashCol).as("simhash"))
    val banded = sh.select(col("id"), col("simhash"),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * width)
            .bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    val capped = capBuckets(banded, Seq("band", "key"), maxBucket)
    val a = withProbes(capped, width, (probeBits + 1) / 2)
      .select(col("band"), col("key"),
        col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = withProbes(capped, width, probeBits / 2)
      .select(col("band"), col("key"),
        col("id").as("id_b"), col("simhash").as("sh_b"))
    // hamming filter BEFORE distinct: the bucket join's output is wide open
    // on skewed corpora (many docs share a band key), but each row is just
    // two longs and bit_count is codegen'd — cut to survivors first, then
    // dedup the small remainder
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(coalesce(col("hamming") <= maxHamming, lit(false)))
      .distinct()
  }

  /** SimHash candidates verified by exact char-shingle Jaccard: the output
    * is independently checkable against the same SQL-expressible ground
    * truth as `nearDupPairs`, while candidate generation stays sub-quadratic
    * SimHash banding. With maxHamming < numBands, recall over the verified
    * radius is pigeonhole-guaranteed for pairs inside the Hamming ball. */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 7, numBands: Int = 8,
                     shingleK: Int = 5, minJaccard: Double = 0.5,
                     probeBits: Int = 0, maxBucket: Int = 0): DataFrame = {
    val cands = simhashPairs(docs, idCol, textCol, maxHamming, numBands,
        probeBits, maxBucket)
      .select("id_a", "id_b")
    // shingle arrays for candidate docs only (pruneToCands)
    val sets = pruneToCands(
        spread(docs.select(col(idCol).as("id"), col(textCol).as("txt"))),
        candIdFrame(cands))
      .select(col("id"), shingles(col("txt"), shingleK).as("arr"))
    jaccardVerifyArrays(sets, cands, minJaccard)
  }

  /** Winnowing fingerprints per doc (rolling-hash k-grams, window minima;
    * native codegen'd `Fingerprint` expression). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    spread(docs.select(col(idCol).as("id"), col(textCol).as("t")))
      .select(col("id"), graft.functions.Fingerprint.col(col("t")).as("fingerprint"))

  /** Fingerprint-bucket candidates verified by exact char-shingle Jaccard —
    * same verify contract as `nearDupPairs`, different (cheaper, coarser)
    * candidate generator. Candidates must share ≥ `minShared` fingerprints:
    * the count falls out of the gram join's groupBy for free (skinny long
    * pairs — no arrays travel), and near-dups share most window minima
    * while random same-vocabulary pairs share only a few, so the expensive
    * array verify sees orders of magnitude fewer pairs.
    *
    * `maxDocFreq > 0` drops grams shared by more than that many docs before
    * the self-join (fingerprints are distinct per doc, so a gram's bucket
    * population IS its document frequency): winnowing minima of
    * boilerplate-heavy corpora concentrate on few grams, and one stop-gram
    * shared by k docs contributes k²/2 pairs. True near-dup pairs share
    * many low-DF grams, so the `minShared` contract survives the cap. */
  def fingerprintNearDup(docs: DataFrame, idCol: String, textCol: String,
                         shingleK: Int = 5, minJaccard: Double = 0.5,
                         minShared: Int = 2, maxDocFreq: Int = 0): DataFrame = {
    val fpArr = fingerprints(docs, idCol, textCol)
    // carry each doc's fingerprint COUNT through the gram join (a constant
    // per id — it rides in the groupBy key, no extra join), so the shared
    // count can be read as a Jaccard ESTIMATE over the fingerprint sample:
    // fpJ = n_shared / |union|. Like the MinHash estimate tier, prune at
    // minJaccard − 4.5σ with σ = sqrt(0.25/|union|) — self-calibrating: a
    // pair of tiny docs (small union, noisy estimate) keeps a wide margin,
    // while average docs effectively need ~4+ shared minima instead of the
    // raw `minShared` floor. This cuts the candidate set BEFORE any
    // signature array is attached — the round-2 plan shipped 128-long
    // signatures to every ≥2-shared pair, the dominant cost of this query.
    val fp = fpArr.select(col("id"), size(col("fingerprint")).as("n_fp"),
      explode(col("fingerprint")).as("gram"))
    val fpc = capBuckets(fp, Seq("gram"), maxDocFreq)
    val a = fpc.select(col("gram"), col("id").as("id_a"), col("n_fp").as("nf_a"))
    val b = fpc.select(col("gram"), col("id").as("id_b"), col("n_fp").as("nf_b"))
    val union = col("nf_a") + col("nf_b") - col("n_shared")
    val cands = a.join(b, Seq("gram")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "nf_a", "nf_b").agg(count(lit(1)).as("n_shared"))
      .filter(coalesce(col("n_shared") >= minShared &&
        col("n_shared").cast(DoubleType) / union >=
          lit(minJaccard) - lit(4.5) * sqrt(lit(0.25) / union), lit(false)))
      .select("id_a", "id_b")
    // NO pruneToCands here, deliberately (measured): the candidate
    // generator above (gram self-join + aggregate) is the expensive half
    // of this operator, and a candidate-id prune makes the sig/sets scans
    // DEPEND on it — serializing stages that otherwise run concurrently
    // (Spark schedules independent subtrees of one job in parallel).
    // Corpus-wide sig/sets passes overlap the gram join and cost less
    // than the added critical path (1.74 s → 3.4 s when pruned, sf0.1).
    val base = spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")))
    val pruned = sigEstimateFilter(base, "id", "txt", cands, shingleK,
      minJaccard, numHashes = 128)
    val sets = base.select(col("id"), shingles(col("txt"), shingleK).as("arr"))
    jaccardVerifyArrays(sets, pruned, minJaccard)
  }

  /** Containment near-dup (MOSS-style, the winnowing index's home game):
    * detects a SMALL document duplicated inside a BIG one — quotes,
    * boilerplate inclusion, doc-in-doc concatenation — which symmetric
    * Jaccard structurally misses (J = |A|/|B| can be arbitrarily small at
    * containment 1). Candidates come from the same capped fingerprint gram
    * index as `fingerprintNearDup` (winnowing guarantees a shared
    * fingerprint for any shared substring of length ≥ w+k−1); the estimate
    * tier reads shared-count / min fingerprint count as a containment
    * estimate with the 4.5σ margin; the verify is exact shingle
    * containment |A∩B| / min(|A|, |B|). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 5, minContainment: Double = 0.9,
                       minShared: Int = 2, maxDocFreq: Int = 0): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
      .select(col("id"), size(col("fingerprint")).as("n_fp"),
        explode(col("fingerprint")).as("gram"))
    val fpc = capBuckets(fp, Seq("gram"), maxDocFreq)
    val a = fpc.select(col("gram"), col("id").as("id_a"), col("n_fp").as("nf_a"))
    val b = fpc.select(col("gram"), col("id").as("id_b"), col("n_fp").as("nf_b"))
    val minFp = least(col("nf_a"), col("nf_b"))
    val cands = a.join(b, Seq("gram")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "nf_a", "nf_b").agg(count(lit(1)).as("n_shared"))
      .filter(coalesce(col("n_shared") >= minShared &&
        col("n_shared").cast(DoubleType) / minFp >=
          lit(minContainment) - lit(4.5) * sqrt(lit(0.25) / minFp), lit(false)))
      .select("id_a", "id_b")
    // MinHash estimate tier between the gram-count estimate and the
    // shingle-array verify — the one near-dup path that lacked it until
    // round 5, and the reason short-doc-heavy corpora (where the gram-count
    // margin collapses) shipped full arrays to weakly-pruned candidates.
    // NO pruneToCands, same reasoning as fingerprintNearDup: a prune
    // serializes the sig/sets scans behind the expensive gram self-join
    // (2.4 s → 3.9 s when pruned, sf0.1); unpruned they overlap it.
    val base = spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")))
    val pruned = containmentEstimateFilter(base, "id", "txt", cands,
      shingleK, minContainment, numHashes = 128)
    val sets = base.select(col("id"), shingles(col("txt"), shingleK).as("arr"))
    pruned
      .join(sets.select(col("id").as("id_a"), col("arr").as("arr_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("arr").as("arr_b")), "id_b")
      .withColumn("n_inter", size(array_intersect(col("arr_a"), col("arr_b"))))
      .withColumn("containment", col("n_inter").cast(DoubleType) /
        least(size(col("arr_a")), size(col("arr_b"))))
      .filter(coalesce(col("containment") >= minContainment, lit(false)))
      .select("id_a", "id_b", "containment")
  }

  /** Connected components over duplicate pairs — the step that turns a
    * pair list into CLUSTERS so a keeper can be chosen per component
    * (pairs alone under-delete: a∼b, b∼c must collapse to one keeper even
    * when a∼c was never emitted).
    *
    * Algorithm: alternating large-star / small-star edge contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — converges in O(log² n) rounds on ANY graph, where the
    * round-3 min-label propagation needed O(diameter) rounds (duplicate
    * CHAINS — templated docs a∼b∼c∼… — are exactly the adversarial case).
    * Each half-step is one self-join + one map-side-combined min
    * aggregation over skinny (long, long) rows; each round is ONE
    * materializing eager checkpoint plus one trivial aggregate over the
    * checkpointed (lineage-truncated) result for the convergence checksum.
    * The checksum is computed ACTION-side — never via accumulators inside a
    * transformation, whose updates Spark replays on task retry/speculation
    * and which a reliable `checkpoint()`'s write job double-counts. Each
    * round's checkpoint blocks are explicitly unpersisted once the next
    * round is materialized, so executor storage stays O(1) rounds deep.
    * (AQE still stages each exchange inside an action as its own scheduler
    * job, as it does for any multi-exchange query.)
    *
    *  - large-star(u): connect every neighbor v > u to
    *    m = min(N(u) ∪ {u}) — long chains collapse toward small labels;
    *  - small-star(u): orient edges large→small, connect every smaller
    *    neighbor (and u) to the minimum — local stars form.
    *
    * At the fixpoint the edge set is a star per component rooted at the
    * component's MINIMUM node id (deterministic). Convergence = the
    * (count, order-independent xor-of-hashes) checksum of the edge set
    * repeating across rounds.
    *
    * Non-convergence is LOUD: exceeding `maxRounds` (default 50 ≫ the
    * O(log² n) bound for any feasible corpus) throws IllegalStateException
    * rather than silently returning partial clusters.
    *
    * Durability: `localCheckpoint` truncates lineage in executor memory —
    * fast, but non-replicated (an executor loss mid-job on a real cluster
    * is unrecoverable). For cluster runs pass `checkpointDir` to cut
    * lineage through reliable storage (HDFS/object store) instead.
    *
    * Ids must be integral (they travel as longs — 16-byte rows is the
    * design point); map string ids through a dictionary or hash first.
    * A non-integral id fails the job loudly rather than casting to null
    * and silently vanishing from the graph.
    *
    * Returns (id, comp) for every id appearing in `pairs` — including ids
    * seen only in self-pairs, which label themselves — with comp = the
    * minimum id of its cluster; deterministic.
    *
    * `smallGraphLimit > 0` enables an adaptive fast path (the AQE-style
    * size-based plan switch): when the distinct pair count is at or under
    * the limit, the edges are collected and union-found on the driver
    * (smaller id always becomes the root, so each root IS its set's
    * minimum — bit-identical output to the distributed fixpoint, asserted
    * in DedupSpec) instead of paying several fixed-overhead contraction
    * rounds. 2M pairs ≈ 32 MB on the driver. Default 0 = always
    * distributed; the headline `q_docs_components` bench keeps the
    * distributed path so its number prices the star contraction, while
    * composed funnels (CurateJob, q_docs_curate_full) opt in. */
  def components(pairs: DataFrame, maxRounds: Int = 50,
                 checkpointDir: Option[String] = None,
                 smallGraphLimit: Long = 0L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      // m = min(N(u) ∪ {u}); both branches need hashpartitioning(u), so the
      // symmetric-neighbor exchange is planned once and reused
      val mins = nbrs.groupBy("u").agg(min("v").as("mv"))
      nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mv"), col("u")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // orient large→small: d.u > d.v for every row (self-loops never enter)
      val d = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = d.groupBy("u").agg(min("v").as("m"))
      d.join(mins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(mins.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .select(col("a").as("u"), col("b").as("v"))
        .distinct()
    }

    /** Checkpoint one round's edge frame (lineage truncation). LAZY: the
      * first action over the frame — the convergence checksum below, or
      * chk0's universe count — materializes the checkpoint blocks inside
      * that same job, so each round schedules ONE job instead of two
      * (eager-materialize + checksum). Results are unchanged: the checksum
      * still reads the materialized blocks, exactly-once. */
    def checkpointFrame(e: DataFrame): DataFrame =
      if (checkpointDir.isDefined) e.checkpoint(eager = false)
      else e.localCheckpoint(eager = false)

    /** Order-independent (count, xor-of-64-bit-hashes) set checksum,
      * computed as one cheap aggregate over the ALREADY-materialized frame.
      * Action-side, so exactly-once regardless of task retries/speculation —
      * transformation-side accumulators are not (Spark only guarantees
      * exactly-once accumulator updates in actions), and with a reliable
      * `checkpoint()` they also double-count because the checkpoint-write
      * job recomputes the lineage. */
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    /** Release a checkpointed round's storage blocks once the next round is
      * materialized — without this the per-round localCheckpoint blocks
      * linger in executor storage until GC + ContextCleaner get to them. */
    def freeCheckpoint(df: DataFrame): Unit =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
      }

    // Loud integral-id contract: a non-integral id would cast to null and
    // silently vanish from the graph — fail the job instead.
    def longId(c: Column): Column = {
      val l = c.cast("long")
      when(l.isNull, raise_error(lit("components: id failed the integral " +
        "cast — map string ids through a dictionary or hash first"))
        .cast("long")).otherwise(l)
    }

    // Round 0 keeps self-pairs: this checkpoint doubles as the universe of
    // ids for the output contract ("every id appearing in pairs"), so ids
    // seen ONLY in self-pairs still get a (id, id) label. The iteration
    // itself runs on the self-loop-free view.
    val chk0 = checkpointFrame(
      pairs.select(longId(col("id_a")).as("u"), longId(col("id_b")).as("v"))
        .distinct())

    if (smallGraphLimit > 0 && chk0.count() <= smallGraphLimit) {
      // driver union-find with min-id roots: union always attaches the
      // larger root under the smaller, so find(x) is the set minimum —
      // the same (id, min-of-cluster) contract as the fixpoint star
      val es = chk0.collect()
      val parent = new java.util.HashMap[Long, java.lang.Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      es.foreach { row =>
        val u = row.getLong(0); val v = row.getLong(1)
        if (!parent.containsKey(u)) parent.put(u, u)
        if (!parent.containsKey(v)) parent.put(v, v)
        val ru = find(u); val rv = find(v)
        if (ru != rv) {
          if (ru < rv) parent.put(rv, ru) else parent.put(ru, rv)
        }
      }
      import scala.jdk.CollectionConverters._
      val labels = parent.keySet().asScala.toSeq.map(id => (id, find(id)))
      freeCheckpoint(chk0)
      return spark.createDataset(labels).toDF("id", "comp")
    }

    var edges = chk0.filter(col("u") =!= col("v"))
    var (prevCnt, prevSum) = checksum(edges)
    var round = 0
    var converged = false
    var freeable = false // round-0 edges view reads chk0 — never freed here
    while (!converged) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"components: no convergence after $maxRounds rounds " +
            s"(edge checksum still moving: n=$prevCnt) — raise maxRounds")
      val next = checkpointFrame(smallStar(largeStar(edges)))
      val (cnt, sum) = checksum(next)
      converged = cnt == prevCnt && sum == prevSum
      if (freeable) freeCheckpoint(edges)
      edges = next; freeable = true
      prevCnt = cnt; prevSum = sum
    }
    // fixpoint edge set = one star per component, rooted at the minimum id;
    // left-join the id universe back so self-pair-only ids label themselves
    val star = edges.select(col("u").as("id"), col("v").as("comp"))
      .union(edges.select(col("v").as("id"), col("v").as("comp")))
      .distinct()
    val ids = chk0.select(col("u").as("id"))
      .union(chk0.select(col("v").as("id"))).distinct()
    ids.join(star, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Keeper per duplicate cluster: the minimum id of each component plus
    * the cluster size — `exact`'s contract lifted to near-dup clusters.
    * `smallGraphLimit` forwards to [[components]]' adaptive fast path. */
  def keepers(pairs: DataFrame, smallGraphLimit: Long = 0L): DataFrame =
    keepersFromComponents(components(pairs, smallGraphLimit = smallGraphLimit))

  /** Keepers from an already-computed (id, comp) label frame — lets a job
    * that persists the component table derive keepers from it without
    * recomputing the contraction. */
  def keepersFromComponents(labels: DataFrame): DataFrame =
    labels
      .groupBy("comp")
      .agg(count(lit(1)).as("cluster_size"))
      .select(col("comp").as("keeper_id"), col("cluster_size"))

  /** Quality-aware keeper election: per duplicate cluster keep the member
    * with the HIGHEST score (ties → smallest id) instead of the structural
    * minimum id — what a production dedup actually wants ("keep the best
    * copy", e.g. the longest, least-boilerplate, or highest-classifier
    * variant), since the min-id copy is arbitrary. `labels` is a
    * [[components]] (id, comp) frame; `scores` carries (idCol, scoreCol)
    * for at least every labeled id (members without a score drop from the
    * election — inner join, loud in counts). One skinny id-keyed join
    * plus one map-side-combined `max(struct)` per cluster: the hot
    * mega-cluster partially aggregates on the mappers, same shape as
    * [[Spans.dedup]]'s election. */
  def keepersByScore(labels: DataFrame, scores: DataFrame,
                     idCol: String, scoreCol: String): DataFrame =
    labels.join(
        scores.select(col(idCol).cast("long").as("id"),
          col(scoreCol).as("s")), Seq("id"))
      .groupBy("comp")
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("s").as("score"), (-col("id")).as("neg"),
          col("id").as("kid"))).as("m"))
      .select(col("comp"), col("m.kid").as("keeper_id"),
        col("m.score").as("keeper_score"), col("cluster_size"))

  // ---- embeddings ----------------------------------------------------------

  /** Per-dimension embedding-space statistics — the drift/health profile a
    * pipeline monitors over its embedding column (a collapsed dimension, a
    * drifted mean, an exploding variance are the standard embedding-table
    * failure modes). One explode + one map-side-combined aggregate; sums
    * run in DECIMAL so they are order-independent and bit-identical
    * cross-engine (the square is taken in DOUBLE first — deterministic
    * IEEE in any engine — because decimal×decimal precision clipping
    * differs between engines at p≥28). */
  def embDimStats(emb: DataFrame, vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val x = spread(emb.select(col(vecCol).cast(ArrayType(DoubleType)).as("e")))
      .select(posexplode(col("e")))
      .select(col("pos").as("dim"), col("col").as("v"))
    x.groupBy("dim").agg(
        count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(28, 12))).as("sx"),
        sum((col("v") * col("v")).cast(DecimalType(28, 12))).as("sxx"))
      .select(col("dim"), col("n"),
        round(col("sx").cast(DoubleType) / col("n"), 6).as("mean"),
        round((col("sxx").cast(DoubleType) -
          col("sx").cast(DoubleType) * col("sx").cast(DoubleType) / col("n")) /
          (col("n") - 1), 6).as("variance"))
  }

  /** Brute-force cosine near-dup pairs (sim ≥ minSim) via broadcast self-
    * join + the native CosineSim expression. Baseline path; use the LSH
    * variant when neither side broadcasts. */
  def embNearDup(emb: DataFrame, idCol: String, vecCol: String,
                 minSim: Double = 0.95): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("sim", CosineSim.col(col("v_a"), col("v_b")))
      .filter(coalesce(col("sim") >= minSim, lit(false)))
      .select("id_a", "id_b", "sim")
  }

  private def normalizedVecs(emb: DataFrame, idCol: String, vecCol: String) =
    spread(emb.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v")))

  /** Banded random-hyperplane LSH keys: `bands` (band, key) rows per vector,
    * each key the sign pattern of that band's `rowsPerBand` hyperplanes.
    * A pair is a candidate if ANY band matches exactly (OR-amplification) —
    * fixes the round-1 single-bucket recall hole, where one straddled
    * hyperplane silently hid a near-pair. P[miss] = (1−(1−θ/π)^r)^b: at
    * sim 0.9 (θ≈25.8°) with b=16, r=3 it is ~1e-5. Coefficients are derived
    * once on the driver and shipped as literal arrays (constant-folded into
    * codegen), not recomputed per row. */
  def embLshBands(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                  bands: Int = 16, rowsPerBand: Int = 3): DataFrame = {
    val e = normalizedVecs(emb, idCol, vecCol)
    e.select(col("id"), col("v"),
        posexplode(HyperplaneBands.col(col("v"), dim, bands, rowsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")
  }

  /** Sign-sketch estimate tier for embedding candidates: a 252-bit
    * hyperplane sign sketch (4 longs — reuses `HyperplaneBands` with
    * 63-bit bands, a DIFFERENT plane range than the bucketing bands) rides
    * along as 32 bytes per vector; the Hamming distance estimates the pair
    * angle (E[ham] = 252·θ/π, σ ≈ 7.9), so pairs whose estimated angle
    * cannot plausibly clear `minSim` are dropped before any full vector
    * travels through a join. The margin is set at +3σ above the threshold
    * angle — candidates at the threshold keep ~3σ headroom. */
  /** +3σ Hamming cutoff for the 252-bit sign sketch at a cosine threshold:
    * E[ham] = 252·θ/π, σ = sqrt(252·p(1−p)). */
  private def sketchMaxHam(minSim: Double): Double = {
    val sketchBits = 4 * 63
    val theta = math.acos(math.min(1.0, math.max(-1.0, minSim)))
    val p = theta / math.Pi
    math.min(sketchBits.toDouble,
      sketchBits * p + 3.0 * math.sqrt(sketchBits * p * (1 - p)))
  }

  def embSketchFilter(e: DataFrame, cands: DataFrame, dim: Int,
                      minSim: Double): DataFrame = {
    val maxHam = sketchMaxHam(minSim)
    val sk = e.select(col("id"),
      HyperplaneBands.col(col("v"), dim, bands = 4, rowsPerBand = 63,
        seed = 0x5EEDCAFEL).as("sk"))
    cands
      .join(sk.select(col("id").as("id_a"), col("sk").as("sk_a")), "id_a")
      .join(sk.select(col("id").as("id_b"), col("sk").as("sk_b")), "id_b")
      .withColumn("ham", SketchHamming.col(col("sk_a"), col("sk_b")))
      // coalesce guard: see sigEstimateFilter — stops isnotnull(sketch)
      // constraint pushdown into the attach-frame scans
      .filter(coalesce(col("ham") <= maxHam, lit(false)))
      .select("id_a", "id_b")
  }

  /** Hyperplane band-bucket candidate pairs (the stage `embNearDupLsh`
    * prunes and verifies) — exposed so candidate VOLUME is testable: with
    * selective parameters (wide bands + probes + cap), candidates stay
    * O(matches + n), never quadratic. `probeBits` (0..2) widens recall by
    * probing sign-flipped neighbor keys — meet-in-the-middle split across
    * the join sides — instead of shortening keys (which multiplies bucket
    * population by 2^bits-removed). `maxBucket` caps any one bucket. */
  def embLshCandidates(emb: DataFrame, idCol: String, vecCol: String,
                       dim: Int, bands: Int, rowsPerBand: Int,
                       probeBits: Int = 0, maxBucket: Int = 0): DataFrame = {
    val bk = embLshBands(emb, idCol, vecCol, dim, bands, rowsPerBand)
      .select("id", "band", "key")
    val capped = capBuckets(bk, Seq("band", "key"), maxBucket)
    val a = withProbes(capped, rowsPerBand, (probeBits + 1) / 2)
      .select(col("band"), col("key"), col("id").as("id_a"))
    val b = withProbes(capped, rowsPerBand, probeBits / 2)
      .select(col("band"), col("key"), col("id").as("id_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** LSH-banded embedding near-dup: candidates from band-bucket collisions,
    * a 252-bit sign-sketch Hamming tier, and only then the exact cosine
    * verify over re-attached vectors.
    *
    * The sketch RIDES THROUGH the band join (32 bytes on each banded row)
    * instead of being attached to candidates by two extra joins afterwards:
    * the Hamming prune runs inside the join stage, before the distinct, so
    * the estimate tier costs zero additional exchanges — at any corpus
    * size the plan is: banded exchange ×2 sides → join+prune → distinct →
    * two vector-attach joins for the exact verify. */
  def embNearDupLsh(emb: DataFrame, idCol: String, vecCol: String,
                    dim: Int, minSim: Double = 0.95,
                    bands: Int = 16, rowsPerBand: Int = 3,
                    probeBits: Int = 0, maxBucket: Int = 0): DataFrame = {
    val e = normalizedVecs(emb, idCol, vecCol)
    val bk = e.select(col("id"),
        // bucketing bands and the (independent-plane) estimate sketch in
        // one pass over the vector
        HyperplaneBands.col(col("v"), dim, bands, rowsPerBand).as("keys"),
        HyperplaneBands.col(col("v"), dim, bands = 4, rowsPerBand = 63,
          seed = 0x5EEDCAFEL).as("sk"))
      .select(col("id"), col("sk"), posexplode(col("keys")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")
    val capped = capBuckets(bk, Seq("band", "key"), maxBucket)
    val a = withProbes(capped, rowsPerBand, (probeBits + 1) / 2)
      .select(col("band"), col("key"),
        col("id").as("id_a"), col("sk").as("sk_a"))
    val b = withProbes(capped, rowsPerBand, probeBits / 2)
      .select(col("band"), col("key"),
        col("id").as("id_b"), col("sk").as("sk_b"))
    val cands = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .filter(coalesce(
        SketchHamming.col(col("sk_a"), col("sk_b")) <= sketchMaxHam(minSim),
        lit(false)))
      .select("id_a", "id_b").distinct()
    cands
      .join(e.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(e.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("sim", CosineSim.col(col("v_a"), col("v_b")))
      .filter(coalesce(col("sim") >= minSim, lit(false)))
      .select("id_a", "id_b", "sim")
  }

  /** IVF (inverted-file) approximate top-k neighbors — the second ANN scale
    * path beside `knnLsh`: spherical k-means coarse centroids are fitted on
    * a deterministic hash-sample collected to the driver (the standard IVF
    * train step; the sample, not the corpus, crosses the driver), every
    * vector is assigned to its nearest cell by a native codegen'd
    * expression, and each query scores only the vectors in its `nProbe`
    * best cells. No corpus broadcast, no query×corpus cross — per-query
    * work is corpus/nCells·nProbe. */
  def knnIvf(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int = 5, nCells: Int = 16, nProbe: Int = 4,
             sampleN: Int = 2048, seed: Long = 0x1F5EEDL): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = normalizedVecs(emb, idCol, vecCol)
    // nCells ≤ 0 → the standard √n sizing from a cheap count (one cheap
    // driver action; metadata-only on parquet sources): per-query probe work
    // is then corpus/√n·nProbe at any corpus size instead of degrading
    // linearly with a fixed cell count. nProbe ≤ 0 → √nCells probes.
    val cells =
      if (nCells > 0) nCells
      else math.max(16, math.min(65536, math.ceil(math.sqrt(e.count().toDouble)).toInt))
    val probes =
      if (nProbe > 0) math.min(nProbe, cells)
      else math.max(4, math.ceil(math.sqrt(cells.toDouble)).toInt)
    // deterministic training sample: hash-filter, then the sampleN smallest
    // ids — orderBy+limit plans as TakeOrderedAndProject (per-partition
    // top-k, no global sort), so the sample is layout-independent
    val sampled = e
      .filter(pmod(xxhash64(col("id").cast("string")), lit(4)) === 0)
      .orderBy("id").limit(sampleN).collect()
      .map(_.getSeq[Double](1).toArray)
    val sample = if (sampled.nonEmpty) sampled
      else e.orderBy("id").limit(math.min(sampleN, 64)).collect()
        .map(_.getSeq[Double](1).toArray)
    val cents = graft.functions.Ivf.fit(sample, cells, iters = 10, seed = seed)
    val assigned = e.withColumn("cell",
      element_at(graft.functions.IvfTopCells.col(col("v"), cents, 1), 1))
    val qprobe = normalizedVecs(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"),
        explode(graft.functions.IvfTopCells.col(col("v"), cents, probes)).as("cell"))
    val scored = qprobe.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("sim", CosineSim.col(col("qv"), col("v")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"), col("sim"))
  }

  // ---- semantic dedup (k-means clusters → within-cluster near-dup) --------

  /** Argmin-over-centroids assignment column: for each row's vector, the id
    * of the nearest centroid by squared Euclidean distance, ties broken by
    * the smaller cluster id. Round 6: a NATIVE codegen'd expression
    * ([[graft.functions.NearestCentroid]], centroids embedded as a plan
    * reference object) — the previous zip_with/aggregate HOF chain was
    * CodegenFallback, i.e. interpreted lambda evaluation per row × centroid
    * × dimension on every assignment pass (k-means iterations, labeling,
    * PQ encode, SemDeDup). Summation order and the (d², smaller-id)
    * tie-break are preserved exactly (see CentroidKernel's contract), so
    * assignments are bit-identical. */
  private def nearestCentroid(vec: Column, cents: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid.col(vec, cents)

  /** Deterministic distributed Lloyd k-means over an embedding column —
    * the clustering half of SemDeDup-style semantic dedup (Abbas et al.
    * 2023, "SemDeDup"). Every choice is pinned so the result is a pure
    * function of the data, reproducible cross-engine and cross-run:
    *
    *  - init: the k vectors with the smallest `md5(id)` (content-stable —
    *    survives corpus growth, partition layout, and engine choice, unlike
    *    any seeded sample); cluster ids follow that md5 order;
    *  - assignment: nearest centroid by squared Euclidean, ties → smaller
    *    cluster id, computed by `nearestCentroid` in one narrow stage;
    *  - update: per-(cluster, dim) mean, summed in DECIMAL (order-
    *    independent, bit-identical across engines) and rounded once to
    *    `meanScale` decimals — the rounding re-synchronises centroids every
    *    iteration, so floating-point drift can never accumulate;
    *  - an emptied cluster keeps its previous centroid.
    *
    * Scale shape: each iteration is one map-side-combined aggregate over
    * k·dim cells; only the k×dim centroid table (KB) ever reaches the
    * driver, exactly like any production k-means. Returns the final
    * centroids indexed by cluster id. */
  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String,
                k: Int = 8, iters: Int = 2, meanScale: Int = 6): Array[Array[Double]] = {
    import org.apache.spark.sql.types.DecimalType
    val e = spread(emb.select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // TakeOrderedAndProject: per-partition top-k, no global sort
      val init = e.select(col("id"), col("v"),
          md5(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(k).collect()
      require(init.length == k, s"kmeansFit: corpus has ${init.length} < k=$k rows")
      var cents = init.map(_.getSeq[Double](1).toArray)
      for (_ <- 1 to iters) {
        val upd = e
          .select(nearestCentroid(col("v"), cents).as("cluster"),
            posexplode(col("v")))
          .groupBy("cluster", "pos")
          .agg(sum(col("col").cast(DecimalType(28, 12))).as("s"),
            count(lit(1)).as("n"))
          // the round happens HERE, in the engine, with the same SQL round
          // semantics an oracle engine applies — not in driver-side Java
          .select(col("cluster"), col("pos"),
            round(col("s").cast(DoubleType) / col("n"), meanScale).as("m"))
          .collect()
        val next = cents.map(_.clone())
        upd.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        cents = next
      }
      cents
    } finally e.unpersist(blocking = false)
  }

  /** (id, cluster) labels from `kmeansFit`'s final centroids — one narrow
    * codegen'd stage over the corpus. */
  def kmeansLabels(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, iters: Int = 2, meanScale: Int = 6): DataFrame = {
    val cents = kmeansFit(emb, idCol, vecCol, k, iters, meanScale)
    emb.select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .select(col("id"), nearestCentroid(col("v"), cents).as("cluster"))
  }

  /** SemDeDup-style semantic near-dup pairs: cluster the corpus with
    * deterministic k-means, then verify exact cosine ≥ `minSim` ONLY within
    * a cluster. The cluster key turns the quadratic all-pairs cosine into
    * k bucket-local self-joins of ~n/k rows — the published SemDeDup
    * observation that semantic duplicates co-locate under k-means, applied
    * as a join-key. `maxCluster` is the standard hot-bucket guard (a
    * degenerate cluster of c rows would emit c²/2 pairs); oversized
    * clusters are dropped loudly via the shared `capBuckets`/`hotBuckets`
    * report, and at production scale k is sized so n/k stays far under it.
    * Within-cluster-only is the operator's SEMANTICS (cross-cluster pairs
    * are out of contract), so an oracle replaying the same centroids sees
    * the identical pair set. */
  def semDedupPairs(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int = 8, iters: Int = 2, minSim: Double = 0.4,
                    maxCluster: Int = 4096): DataFrame = {
    val cents = kmeansFit(emb, idCol, vecCol, k, iters)
    val labeled = capBuckets(
      emb.select(col(idCol).as("id"),
          col(vecCol).cast(ArrayType(DoubleType)).as("v"))
        .withColumn("cluster", nearestCentroid(col("v"), cents)),
      Seq("cluster"), maxCluster)
    val a = labeled.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
    val b = labeled.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", CosineSim.col(col("v_a"), col("v_b")))
      .filter(coalesce(col("sim") >= minSim, lit(false)))
      .select("cluster", "id_a", "id_b", "sim")
  }

  // ---- product quantization (memory-bound ANN at corpus scale) -------------

  /** Product-quantization codebooks (Jégou, Douze, Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)): split
    * the `dim`-dimensional space into `m` contiguous subspaces of dim/m
    * and run the fully-pinned [[kmeansFit]] independently on each slice,
    * so the codebooks inherit its cross-engine determinism (md5-smallest
    * init — the same k ids in every subspace — DECIMAL sums, 6-dp rounded
    * means, ties → smaller code). Returns codebooks(sub)(code)(d): m
    * tables of k centroids, m·k·(dim/m) = k·dim doubles total —
    * KB-sized plan literals regardless of corpus size. */
  def pqFit(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int = 4, k: Int = 8, iters: Int = 2): Array[Array[Array[Double]]] = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    import org.apache.spark.sql.types.DecimalType
    val w = dim / m
    // FUSED per-subspace Lloyd: the m chains share their data pass.
    //  - init: md5-smallest ids do not depend on the subspace, so ONE
    //    TakeOrdered collect seeds every codebook (identical to running
    //    kmeansFit's init per slice — same ids, same order);
    //  - each iteration is ONE job emitting (sub, cluster, pos, value)
    //    rows for all m subspaces and aggregating m·k·w cells, instead of
    //    m separate jobs each re-scanning its slice (round 5 ran 3 jobs ×
    //    m subspaces serially = 12 scheduling rounds; this runs 1 + iters).
    // DECIMAL sums are order-independent and the per-slice assignment /
    // rounding expressions are unchanged, so codebooks are bit-identical
    // to the per-slice kmeansFit chain.
    val e = spread(emb.select(col(idCol).as("id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = e.select(col("id"), col("v"),
          md5(col("id").cast("string")).as("h"))
        .orderBy(col("h"), col("id")).limit(k).collect()
      require(init.length == k, s"pqFit: corpus has ${init.length} < k=$k rows")
      var books: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
        init.map(_.getSeq[Double](1).slice(s * w, (s + 1) * w).toArray)
      }
      for (_ <- 1 to iters) {
        val perSub = (0 until m).map { s =>
          struct(lit(s).as("sub"),
            nearestCentroid(slice(col("v"), s * w + 1, w), books(s))
              .as("cluster"))
        }
        val upd = e.select(col("v"), explode(array(perSub: _*)).as("sc"))
          .select(col("sc.sub").as("sub"), col("sc.cluster").as("cluster"),
            posexplode(slice(col("v"), col("sc.sub") * w + 1, lit(w))))
          .groupBy("sub", "cluster", "pos")
          .agg(sum(col("col").cast(DecimalType(28, 12))).as("s"),
            count(lit(1)).as("n"))
          .select(col("sub"), col("cluster"), col("pos"),
            round(col("s").cast(DoubleType) / col("n"), 6).as("m"))
          .collect()
        val next = books.map(_.map(_.clone()))
        upd.foreach(r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
        books = next
      }
      books
    } finally e.unpersist(blocking = false)
  }

  /** (id, sub, code) PQ code assignment: each vector compresses to m small
    * codes (m·log₂k bits — a 64-dim double vector becomes 12 bits at
    * m=4, k=8), assigned by m codebook-literal `nearestCentroid`
    * expressions in ONE narrow codegen'd projection — no shuffle, no UDF.
    * The code table (plus the KB codebooks) REPLACES the float corpus in
    * the ANN hot path. Split from [[pqFit]] so fit can run on a sample
    * while everything is encoded. */
  def pqCodesWith(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                  books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val w = dim / m
    val v = col(vecCol).cast(ArrayType(DoubleType))
    emb.select(col(idCol).as("id"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("sub"),
            nearestCentroid(slice(v, s * w + 1, w), books(s)).as("code"))): _*))
          .as("c"))
      .select(col("id"), col("c.sub").as("sub"), col("c.code").as("code"))
  }

  /** Fit + encode in one call (the small-corpus convenience path). */
  def pqCodes(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
              m: Int = 4, k: Int = 8, iters: Int = 2): DataFrame =
    pqCodesWith(emb, idCol, vecCol, dim, pqFit(emb, idCol, vecCol, dim, m, k, iters))

  /** Asymmetric-distance (ADC) top-k over PQ codes: queries keep exact
    * vectors; the corpus is scanned as (id, m codes) with the codebooks as
    * plan literals — the PQ memory shape: at 10^12 vectors the scan reads
    * a few bits per row instead of dim floats, broadcast-joined against
    * the (small) query set exactly like the exact-kNN path.
    * dist²(q, x) = Σ_sub ‖q_sub − books[sub][code_sub(x)]‖², all codegen'd
    * `element_at`/`zip_with`/`aggregate` expressions.
    *
    * Exactness contract: ADC is an approximate DISTANCE — the result is
    * the exact top-k of the quantized distance (which a replaying oracle
    * reproduces), not of the true distance (recall vs exact kNN is gated
    * in tests instead). Identical-code rows tie by construction, and
    * cross-engine float noise is pinned the same way: rank on
    * (round(dist², 4), neighbor_id). */
  def pqKnn(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
            dim: Int, m: Int = 4, k: Int = 8, iters: Int = 2,
            topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val books = pqFit(emb, idCol, vecCol, dim, m, k, iters)
    val w = dim / m
    val v = col(vecCol).cast(ArrayType(DoubleType))
    val codeArr = emb.select(col(idCol).as("neighbor_id"),
      array((0 until m).map(s =>
        nearestCentroid(slice(v, s * w + 1, w), books(s))): _*).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), v.as("qv"))
    // native ADC distance (graft.functions.AdcDist): same per-subspace
    // partial sums in the same order as the old m-HOF reduce, codegen'd
    val dist2 = graft.functions.AdcDist.col(col("qv"), col("codes"), books)
    val win = Window.partitionBy("query_id")
      .orderBy(col("dist2"), col("neighbor_id"))
    codeArr.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist2", round(dist2, 4))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "dist2")
  }

  // ---- incremental near-dup (persisted index; the daily-ingest shape) ------

  /** MinHash band-key index rows for a corpus slice: one skinny
    * (id, band, band_hash) row per band per doc — the frame a production
    * pipeline PERSISTS (e.g. one [[graft.table.SnapshotTable]] chunk per
    * ingest batch) so tomorrow's batch is matched against today's corpus
    * without re-hashing a single committed document. Cost shape: numBands
    * rows of (long, int, long) per doc — at 10^12 docs × 16 bands that is
    * three skinny columns, a rounding error next to re-reading and
    * re-shingling the corpus text every ingest, which is exactly what a
    * non-incremental [[nearDupPairs]] over (corpus ∪ batch) would do.
    * Same signature family as [[nearDupPairs]] (identical `MinHashSig` +
    * band hashing), so index-vs-batch collisions are bit-identical to the
    * collisions a full recompute would produce. */
  def nearDupIndex(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, numHashes: Int = 80,
                   rowsPerBand: Int = 5): DataFrame =
    spread(docs.select(col(idCol).as("id"), col(textCol).as("txt")))
      .select(col("id"),
        explode(minhashBandKeys(
          MinHashSig.col(col("txt"), shingleK, numHashes),
          numHashes, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.band_hash").as("band_hash"))

  /** Match a NEW ingest batch against a persisted corpus band index WITHOUT
    * re-hashing the corpus — the incremental analog of [[nearDupPairs]].
    * Returns (new_id, corpus_id, jaccard) cross pairs at J ≥ `minJaccard`;
    * ids must be globally unique across corpus and batch (they are table
    * keys). Intra-batch duplicates are a separate (batch-local, cheap)
    * [[nearDupPairs]] call over `newDocs` alone.
    *
    * Recall is IDENTICAL to a full recompute restricted to cross pairs: a
    * (new, corpus) pair collides on a band in this index join iff it
    * collides in the full run's self-join — same signatures, same band
    * keys, same OR-amplification.
    *
    * Scale shape: the index is READ, never recomputed; the batch (≪ corpus)
    * is hashed in one narrow stage; the hot-bucket cap is computed over the
    * UNION of index and batch band rows (a boilerplate band key must be
    * dropped whichever side its rows come from); and corpus TEXT is fetched
    * only for docs appearing in some candidate pair — a broadcastable
    * left-semi prune on the corpus scan, so the 10^12-row text column never
    * flows through the signature/estimate/verify stages. */
  def incrementalNearDup(newDocs: DataFrame, index: DataFrame,
                         corpus: DataFrame, idCol: String, textCol: String,
                         shingleK: Int = 5, numHashes: Int = 80,
                         rowsPerBand: Int = 5, minJaccard: Double = 0.5,
                         maxBucket: Int = 0, estHashes: Int = 128): DataFrame = {
    val newBands = nearDupIndex(newDocs, idCol, textCol, shingleK,
      numHashes, rowsPerBand)
    val tagged = index
      .select(col("id"), col("band"), col("band_hash"), lit(false).as("is_new"))
      .union(newBands.select(col("id"), col("band"), col("band_hash"),
        lit(true).as("is_new")))
    val capped = capBuckets(tagged, Seq("band", "band_hash"), maxBucket)
    val a = capped.filter(col("is_new"))
      .select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = capped.filter(!col("is_new"))
      .select(col("band"), col("band_hash"), col("id").as("id_b"))
    val cands = a.join(b, Seq("band", "band_hash"))
      .select("id_a", "id_b").distinct()
    // candidate corpus docs only: semi-join prune BEFORE any text-derived
    // column is computed (candidate id lists are small — broadcastable)
    val corpusCands = corpus
      .select(col(idCol).as("id"), col(textCol).as("txt"))
      .join(cands.select(col("id_b").as("id")).distinct(), Seq("id"), "left_semi")
    val docsForVerify = spread(
      newDocs.select(col(idCol).as("id"), col(textCol).as("txt")))
      .union(corpusCands)
    val pruned = sigEstimateFilter(docsForVerify, "id", "txt", cands,
      shingleK, minJaccard, estHashes)
    val sets = docsForVerify.select(col("id"),
      shingles(col("txt"), shingleK).as("arr"))
    jaccardVerifyArrays(sets, pruned, minJaccard)
      .select(col("id_a").as("new_id"), col("id_b").as("corpus_id"),
        col("jaccard"))
  }

  /** LSH-bucketed approximate top-k neighbors for a query subset — the scale
    * path beside the exact broadcast-the-queries kNN: each query only scores
    * vectors sharing ≥1 LSH band, so the corpus is never broadcast and never
    * crossed with the query set. Returns (query_id, rank, neighbor_id, sim);
    * queries with fewer than k candidates return fewer rows (ANN semantics). */
  def knnLsh(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             dim: Int, k: Int = 5, bands: Int = 16, rowsPerBand: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = normalizedVecs(emb, idCol, vecCol)
    val bk = embLshBands(emb, idCol, vecCol, dim, bands, rowsPerBand)
      .select("id", "band", "key")
    val qk = embLshBands(queries, idCol, vecCol, dim, bands, rowsPerBand)
      .select(col("id").as("query_id"), col("band"), col("key"))
    val cands = qk.join(bk, Seq("band", "key"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id")).distinct()
    val scored = cands
      .join(normalizedVecs(queries, idCol, vecCol)
        .select(col("id").as("query_id"), col("v").as("qv")), "query_id")
      .join(e.select(col("id").as("neighbor_id"), col("v").as("nv")), "neighbor_id")
      .withColumn("sim", CosineSim.col(col("qv"), col("nv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  // ---- source/domain-level mirror detection --------------------------------

  /** Distinct word-n-gram set per source, as skinny (src, gram) rows — the
    * feature frame both mirror tiers read. Word grams, not char shingles:
    * the char-gram UNION of a whole domain saturates toward the language's
    * gram inventory (measured ~0.7 baseline Jaccard between UNRELATED
    * sources on the test corpus at k = 5), while word n-grams keep the
    * unrelated-source baseline near zero — the feature RefinedWeb-style
    * domain-level dedup actually separates on. */
  def sourceGrams(docs: DataFrame, sourceCol: String, textCol: String,
                  n: Int = 3): DataFrame =
    docs.select(col(sourceCol).as("src"),
        explode(TextProfile.ngrams(col(textCol), n)).as("gram"))
      .distinct()

  /** Exact source-level mirror detection — "crawl A is a re-host of crawl
    * B" at the SOURCE granularity (the doc-pair near-dup family can only
    * see mirrors whose individual documents pair up; a mirror that
    * re-chunks or re-orders content pairs no docs but keeps the domain's
    * gram UNION almost intact). Jaccard over each source's distinct word
    * n-gram set: one distinct on (src, gram), per-source sizes, and a
    * gram-bucket-local self-join for intersections — only sources sharing
    * a gram ever meet, and only (src, src) pairs travel out of it.
    *
    * `maxGramSources` (capBuckets on gram) bounds the self-join on corpora
    * where a stop-gram is shared by every domain (k shared sources emit k²
    * rows for that gram); a capped gram biases every affected pair's
    * intersection DOWN by exactly its unit weight — acceptable for a
    * mirror DETECTOR (mirrors share mostly low-DF grams), but the cap is
    * off by default so the result is exact. At domain counts where even
    * the capped join is too wide, use [[sourceMirrorsSketch]]. */
  def sourceMirrors(docs: DataFrame, sourceCol: String, textCol: String,
                    n: Int = 3, minJaccard: Double = 0.5,
                    maxGramSources: Int = 0): DataFrame = {
    val sh = sourceGrams(docs, sourceCol, textCol, n)
    sourceJaccard(sh, capBuckets(sh, Seq("gram"), maxGramSources), minJaccard)
  }

  /** Shared exact-Jaccard tail: sizes from the FULL gram frame, pairwise
    * intersections from the (possibly capped / pruned) join frame.
    * (A collect_set-per-gram reformulation was measured and REJECTED:
    * ObjectHashAggregate leaves whole-stage codegen and the distinct/join
    * subtrees here run concurrently — 2.4 s → 2.7 s at sf0.1.) */
  private def sourceJaccard(full: DataFrame, joinFrame: DataFrame,
                            minJaccard: Double): DataFrame = {
    val sz = full.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = joinFrame.as("a")
      .join(joinFrame.as("b"),
        col("a.gram") === col("b.gram") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    val j = col("n_inter").cast(DoubleType) /
      (col("na") + col("nb") - col("n_inter"))
    inter
      .join(sz.select(col("src").as("src_a"), col("n").as("na")), "src_a")
      .join(sz.select(col("src").as("src_b"), col("n").as("nb")), "src_b")
      .filter(j >= minJaccard)
      .select(col("src_a"), col("src_b"), round(j, 4).as("jaccard"))
  }

  /** Per-position seeds for the union-MinHash remix (deterministic; a
    * different stream from MinHashSig's so the two sketches never alias). */
  private val unionSeeds: IndexedSeq[Long] = IndexedSeq.tabulate(512) { i =>
    graft.fixture.Prng.derive(0x5851F42DL, 0x14057B7EL, i.toLong).nextLong()
  }

  /** Scale tier of [[sourceMirrors]]: union-MinHash + LSH banding. MinHash
    * position j of a source's gram UNION is `min` over the source's grams
    * of remix_j(gram hash) — and min is distributive over union, so the
    * whole domain's signature is ONE map-side-combinable aggregate over
    * the skinny (src, gram-hash) frame: numHashes `min` columns, partials
    * of (src, numHashes longs), no per-doc signatures, no re-aggregation,
    * no gram self-join. Band keys over the assembled signature pair up
    * candidate sources ([[lshCandidates]], `maxBucket` hot guard), then
    * the exact Jaccard verify runs on the gram frame SEMI-JOINED to
    * candidate sources only — the quadratic tier never sees a
    * non-candidate domain. Gram identity is xxhash64 of the gram string
    * inside the sketch (collision odds ~2⁻⁶⁴ per gram pair); the verify
    * uses the raw gram strings, so the output matches [[sourceMirrors]]
    * restricted to candidate pairs. */
  def sourceMirrorsSketch(docs: DataFrame, sourceCol: String, textCol: String,
                          n: Int = 3, minJaccard: Double = 0.5,
                          numHashes: Int = 128, rowsPerBand: Int = 4,
                          maxBucket: Int = 0): DataFrame = {
    require(numHashes <= unionSeeds.length, s"numHashes $numHashes > 512")
    val sh = sourceGrams(docs, sourceCol, textCol, n)
    val hashed = sh.select(col("src"), xxhash64(col("gram")).as("h"))
    val mins = (0 until numHashes).map(j =>
      min(xxhash64(col("h"), lit(unionSeeds(j)))).as(s"h$j"))
    val sig = hashed.groupBy("src").agg(mins.head, mins.tail: _*)
      .select(col("src").as("id"),
        array((0 until numHashes).map(j => col(s"h$j")): _*).as("sig"))
    val bands = sig.select(col("id"),
        explode(minhashBandKeys(col("sig"), numHashes, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.band_hash").as("band_hash"))
    val cands = lshCandidates(bands, maxBucket)
    val candSrcs = cands.select(col("id_a").as("src"))
      .union(cands.select(col("id_b").as("src"))).distinct()
    // candidate sources number ≤ 2·|pairs| — broadcast the prune
    val pruned = sh.join(broadcast(candSrcs), Seq("src"), "left_semi")
    sourceJaccard(pruned, pruned, minJaccard)
      .join(cands.withColumnRenamed("id_a", "src_a")
        .withColumnRenamed("id_b", "src_b"), Seq("src_a", "src_b"), "left_semi")
  }
}
