package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicated-substring removal at token-window
  * granularity — the ExactSubstr pass of Lee et al. 2022 ("Deduplicating
  * Training Data Makes Language Models Better"): any k-token window whose
  * exact text occurs ≥ 2 times in the corpus (across documents OR repeated
  * within one) marks its tokens for removal, keeping one canonical copy.
  * This catches verbatim reuse that both document-level dedup (documents
  * globally distinct) and span/paragraph dedup (reuse straddles span
  * boundaries or is sub-span-sized) structurally miss.
  *
  * Reference analog: the cleaning pipeline's targeted artifact removal —
  * detect a repeated pattern, erase exactly the covered region, keep the
  * rest (`/root/reference/Backend/utils/image_processing.py:1223-1254`
  * emits the per-line removal mask; here the mask is per-token).
  *
  * Deviation from the paper, documented: Lee et al. operate on BPE-token
  * byte streams with a suffix array (single-machine); a distributed
  * suffix array is not Spark-shaped. The standard Spark reformulation
  * (used by several public reproductions) is fixed-k window hashing:
  * every duplicated substring of length ≥ k contains a duplicated
  * k-window, so k-window coverage ⊇ the paper's ≥k-substring coverage —
  * identical detection power at length exactly k, conservative (slightly
  * wider) above it, none below (by design, as in the paper's threshold).
  *
  * Keeper semantics (`keepOne = true`, default): for each duplicated
  * window text, the lexicographically smallest (id, pos) occurrence is
  * the canonical copy and is NOT masked; every other occurrence is. So a
  * phrase shared by 10^6 documents survives exactly once rather than
  * vanishing corpus-wide. `keepOne = false` masks every occurrence (the
  * aggressive variant some reproductions use).
  *
  * Shapes (100 TB-safe):
  *  - token and window extraction are pure per-row projections — no
  *    shuffle, no text-width rows ever shuffle;
  *  - duplicate detection shuffles ONLY (id, pos, 32-char md5) window
  *    rows; `min(struct)`+`count` per hash is map-side combined, so a
  *    boilerplate window repeated 10^9 times partially aggregates on the
  *    mappers (no hot reducer, same shape as [[Spans.dedup]]);
  *  - coverage is a per-document window function over token positions
  *    (ROWS k-1 PRECEDING running max) — sort bounded by document size;
  *  - reassembly is a per-document aggregation, bounded by document size.
  */
object ExactSubstr {

  /** (id, pos, tok) rows: single-space split, empties dropped, `pos` =
    * 1-based index in the FILTERED token sequence (so ROWS frames and
    * window starts address the same coordinate system). */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // native token kernel (SpaceTokens ≡ filter(split(t," "), _ != ""),
    // law in NativeExprOptSpec) — the filter/split HOF pair is interpreted
    docs.select(col(idCol).as("id"),
        posexplode(graft.functions.SpaceTokens.col(col(textCol))))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))

  /** Every k-token window as a skinny (id, pos, win_hash) row; `pos` is
    * the window's first token position (1-based). Documents shorter than
    * k tokens contribute no windows (and are therefore never masked).
    *
    * win_hash is `xxhash64` over the window's TOKEN ARRAY (hashing the
    * slice directly — no per-window string concat, no md5): one 8-byte
    * long per window instead of a 32-char hex string, so the detect
    * shuffle carries ~4× fewer bytes and the per-window hash is ~5×
    * cheaper to compute. Token-array equality ⇔ window-text equality
    * (tokens cannot contain the separator), so dup detection is unchanged
    * up to 64-bit collisions (~n²/2⁶⁵ expected false dup pairs — ≈0 at
    * test scale, and at 10⁹⁺ windows each collision masks one k-token
    * window: curation noise far below the LSH tiers' own documented miss
    * rates). */
  def windows(docs: DataFrame, idCol: String, textCol: String,
              k: Int): DataFrame = {
    require(k >= 2, s"window size $k must be >= 2")
    // native fused kernel: tokens + per-window seeded-chain xxhash64 in
    // one pass (WindowHashes ≡ transform(sequence, xxhash64(slice)), law
    // in NativeExprOptSpec); docs with < k tokens produce an empty array,
    // which posexplode drops — the same rows as the former size() guard
    docs.select(col(idCol).as("id"),
        posexplode(graft.functions.WindowHashes.col(col(textCol), k)))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("win_hash"))
  }

  /** Window starts slated for removal: occurrences of a duplicated
    * (count ≥ 2 corpus-wide) window text, minus — when `keepOne` — the
    * canonical min-(id, pos) occurrence of each. Output: (id, pos,
    * n_copies). */
  def dupStarts(wins: DataFrame, keepOne: Boolean = true): DataFrame = {
    val dups = wins.groupBy("win_hash")
      .agg(min(struct(col("id"), col("pos"))).as("k"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 2)
      .select(col("win_hash"), col("k.id").as("keeper_id"),
        col("k.pos").as("keeper_pos"), col("n_copies"))
    val joined = wins.join(dups, "win_hash")
    val masked =
      if (keepOne)
        joined.filter(!(col("id") === col("keeper_id") &&
          col("pos") === col("keeper_pos")))
      else joined
    masked.select("id", "pos", "n_copies")
  }

  /** Per-token removal verdicts: (id, pos, tok, covered) where `covered`
    * = 1 iff some removal-slated window start lies within the k-1
    * positions at-or-before this token (a start at s covers s..s+k-1).
    * The running-max ROWS frame is exact because `pos` indexes the
    * filtered token sequence with no gaps. */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               k: Int, keepOne: Boolean = true): DataFrame = {
    val starts = dupStarts(windows(docs, idCol, textCol, k), keepOne)
      .select(col("id"), col("pos"), lit(1).as("d"))
    val w = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(-(k - 1), Window.currentRow)
    tokens(docs, idCol, textCol)
      .join(starts, Seq("id", "pos"), "left")
      .withColumn("covered", max(coalesce(col("d"), lit(0))).over(w))
      .select("id", "pos", "tok", "covered")
  }

  /** Per-document removal mask — the reference's emitted line-mask
    * artifact at token granularity: (id, n_tokens, n_removed, mask) with
    * mask = '0'/'1' per token in order. */
  def mask(docs: DataFrame, idCol: String, textCol: String,
           k: Int, keepOne: Boolean = true): DataFrame =
    maskFromCoverage(coverage(docs, idCol, textCol, k, keepOne))

  /** [[mask]] over an already-computed (possibly persisted) [[coverage]]
    * frame — so a job emitting mask AND clean runs the detect chain once. */
  def maskFromCoverage(cov: DataFrame): DataFrame =
    cov.groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("covered").cast("long")).as("n_removed"),
        graft.functions.JoinSortedStructs.col(
          collect_list(struct(col("pos"),
            col("covered").cast("string").as("f"))), "").as("mask"))

  /** The cleaning transform: drop covered tokens, reassemble each
    * document from survivors in order. Documents whose every token was
    * covered (pure duplicated content) vanish, matching [[Spans.removeDups]]
    * semantics. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            k: Int, keepOne: Boolean = true): DataFrame =
    cleanFromCoverage(coverage(docs, idCol, textCol, k, keepOne))

  /** Corpus window-hash index for INCREMENTAL runs: one (win_hash,
    * n_occurrences) row per distinct k-window text — the persisted
    * artifact a daily ingest joins against instead of re-hashing the
    * whole corpus (commit it as snapshot-table chunks exactly like the
    * incremental MinHash band index; a day's new windows append as the
    * next chunk). Map-side combined, ~36 bytes/distinct window. */
  def windowIndex(docs: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame =
    windows(docs, idCol, textCol, k)
      .groupBy("win_hash").agg(count(lit(1)).as("n"))

  /** Incremental coverage of a NEW batch against a persisted corpus
    * [[windowIndex]]: a batch window masks its tokens iff its text exists
    * in the corpus (the corpus copy IS the canonical keeper — every batch
    * occurrence is cut) OR occurs ≥ 2 times within the batch itself
    * (intra-batch min-(id, pos) keeper election, as in [[dupStarts]]).
    * The batch never rescans corpus text: the index join ships only
    * (win_hash) against (id, pos, win_hash) rows. */
  def coverageIncremental(batch: DataFrame, idCol: String, textCol: String,
                          k: Int, index: DataFrame): DataFrame = {
    val wins = windows(batch, idCol, textCol, k)
    val idxHits = wins.join(index.select("win_hash"), Seq("win_hash"))
      .select("id", "pos")
    val starts = idxHits.union(dupStarts(wins).select("id", "pos"))
      .distinct()
      .select(col("id"), col("pos"), lit(1).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
      .rowsBetween(-(k - 1), org.apache.spark.sql.expressions.Window.currentRow)
    tokens(batch, idCol, textCol)
      .join(starts, Seq("id", "pos"), "left")
      .withColumn("covered", max(coalesce(col("d"), lit(0))).over(w))
      .select("id", "pos", "tok", "covered")
  }

  /** The incremental cleaning transform: [[coverageIncremental]] +
    * survivor reassembly — "today's batch, minus everything the corpus
    * already contains verbatim". */
  def cleanIncremental(batch: DataFrame, idCol: String, textCol: String,
                       k: Int, index: DataFrame): DataFrame =
    cleanFromCoverage(coverageIncremental(batch, idCol, textCol, k, index))

  /** [[clean]] over an already-computed [[coverage]] frame. */
  def cleanFromCoverage(cov: DataFrame): DataFrame =
    cov.filter(col("covered") === 0)
      .groupBy("id")
      .agg(graft.functions.JoinSortedStructs.col(
        collect_list(struct(col("pos"), col("tok").as("t"))), " ")
        .as("cleaned_text"))
}
