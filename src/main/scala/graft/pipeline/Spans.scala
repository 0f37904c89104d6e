package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-level (paragraph-level) exact deduplication — the standard
  * training-data pass that removes REPEATED SPANS across documents
  * (boilerplate paragraphs, licenses, navigation chrome) which
  * document-level dedup structurally misses: two documents can be globally
  * distinct while sharing a verbatim paragraph a million times over.
  *
  * This is the text analog of the reference's per-line mask lineage: its
  * cleaning pipeline emits the removed-line mask (`6_line_mask`) as a
  * first-class intermediate (`/root/reference/Backend/utils/image_processing.py:887`,
  * `:1223-1254`) so downstream steps can see WHAT was removed and where —
  * `dupMask` is that artifact per document over spans.
  *
  * Shapes (all 100 TB-safe):
  *  - span extraction is a pure per-row explode — no shuffle;
  *  - dedup shuffles ONLY (id, span_idx, 32-char md5) rows — span text
  *    never travels; the keeper choice is a map-side-combined `min(struct)`
  *    aggregation, so a boilerplate span repeated 10^9 times partially
  *    aggregates on the mappers instead of hot-spotting one reducer (the
  *    window-function formulation would sort that partition on one task);
  *  - the mask is a per-document aggregation (bounded by document size,
  *    not corpus size).
  */
object Spans {

  /** (id, span_idx, span) rows: split on a separator regex (default:
    * blank-line paragraph breaks), trim, drop empties. `span_idx` is the
    * ORIGINAL position in the split (stable even when empties drop). */
  def split(docs: DataFrame, idCol: String, textCol: String,
            sepRe: String = "\\n{2,}"): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(org.apache.spark.sql.functions.split(col(textCol), sepRe)))
      .select(col("id"), col("pos").cast("long").as("span_idx"),
        trim(col("col")).as("span"))
      .filter(length(col("span")) > 0)

  /** Fixed word-window spans for corpora WITHOUT paragraph structure
    * (transcripts, single-line docs): consecutive `chunkWords`-word
    * windows, last chunk possibly short. Same row contract as `split`. */
  def wordChunks(docs: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 10): DataFrame = {
    require(chunkWords >= 1, s"chunkWords $chunkWords")
    // native codegen'd chunk builder — the transform/sequence/slice/
    // concat_ws chain is CodegenFallback (interpreted per row); identical
    // array (equivalence law in NativeExprOptSpec)
    docs.select(col(idCol).as("id"),
        posexplode(graft.functions.WordChunkArr.col(col(textCol), chunkWords)))
      .select(col("id"), col("pos").cast("long").as("span_idx"),
        trim(col("col")).as("span"))
      .filter(length(col("span")) > 0)
  }

  /** Content-defined chunking (CDC) span extraction — the rsync/FastCDC
    * idea at word granularity: a chunk boundary falls AFTER token j iff
    * the hash of the `window`-gram ending at j satisfies the mask
    * (first md5 hex char < `boundaryHexLt`; '4' → P = 1/4, mean chunk ≈ 4
    * tokens). Because boundaries depend only on LOCAL content, an
    * insertion or deletion re-synchronizes the chunking within ~`window`
    * tokens — where [[wordChunks]]' fixed windows shift EVERY downstream
    * span and defeat span dedup entirely (gated in SpansSpec). Same
    * (id, span_idx, span) contract as [[split]]/[[wordChunks]], so it
    * composes with [[dedup]]/[[removeDups]]/[[removeBoilerplate]].
    *
    * Shape: token extraction is a per-row projection; chunk ids are one
    * per-document running sum over token positions (sort bounded by doc
    * size, the [[ExactSubstr.coverage]] budget) and reassembly is a
    * per-(id, chunk) aggregation. Only (id, pos, token, flag) rows ever
    * shuffle. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 4, boundaryHexLt: Char = '4'): DataFrame = {
    require(window >= 2, s"window $window")
    require(("0123456789abcdef").contains(boundaryHexLt),
      s"boundaryHexLt $boundaryHexLt must be a lowercase hex digit")
    // Chunk boundaries depend only on the doc's OWN tokens, so the whole
    // chunking is computable inside one per-row projection: boundary
    // positions via an array filter, chunk slices via a transform over
    // 0..|bps|, then one posexplode. The round-5 shape exploded every
    // token, ran a per-doc window (Exchange(id) + sort) for the running
    // boundary sum, and re-assembled with a groupBy(id, span_idx)
    // (second exchange) — two corpus-token exchanges for a value that
    // never needed to leave its row (guide §2.4 "remove shuffles
    // outright"). Output is identical: boundary condition, chunk ids and
    // reassembled spans are the same per-token values.
    // native codegen'd kernel (CdcChunkArr) — the former filter/sequence/
    // md5/slice/concat_ws HOF chain is CodegenFallback (interpreted per
    // row, one interpreted md5 per token); identical chunk array
    // (equivalence law in NativeExprOptSpec): boundary after token j
    // (window ≤ j ≤ |fw|−1) iff the first md5 hex char of the window
    // ending at j is < boundaryHexLt, chunks = token ranges between
    // boundaries, degenerate inputs → [""].
    docs.select(col(idCol).as("id"),
        posexplode(graft.functions.CdcChunkArr.col(col(textCol), window,
          boundaryHexLt)))
      .select(col("id"), col("pos").cast("long").as("span_idx"),
        col("col").as("span"))
  }

  /** Span-level exact dedup over a (id, span_idx, span) frame.
    *
    * Output per input span: (id, span_idx, span_hash, keeper_id,
    * keeper_span_idx, n_copies, is_dup) — keeper = the lexicographically
    * minimum (id, span_idx) holding that span's md5, deterministic. A span
    * is `is_dup` iff it is not its own keeper; dropping `is_dup` rows and
    * reassembling by (id, span_idx) is the dedup transform itself. */
  def dedup(spans: DataFrame): DataFrame = {
    val hashed = spans
      .withColumn("span_hash", md5(col("span")))
      .select("id", "span_idx", "span_hash")
    // min(struct) is map-side combined: the hot-hash reducer receives one
    // pre-aggregated row per upstream partition, not the raw copies
    val keepers = hashed.groupBy("span_hash")
      .agg(min(struct(col("id"), col("span_idx"))).as("k"),
        count(lit(1)).as("n_copies"))
      .select(col("span_hash"), col("k.id").as("keeper_id"),
        col("k.span_idx").as("keeper_span_idx"), col("n_copies"))
    hashed.join(keepers, "span_hash")
      .withColumn("is_dup",
        !(col("id") === col("keeper_id") &&
          col("span_idx") === col("keeper_span_idx")))
      .select("id", "span_idx", "span_hash", "keeper_id",
        "keeper_span_idx", "n_copies", "is_dup")
  }

  /** The cleaning transform itself: drop every duplicate span and
    * reassemble each document from its surviving spans in span order —
    * the analog of the reference pipeline's cleaned output image (its
    * line-mask step feeds removal, `image_processing.py:1223-1254`).
    * Documents whose every span was a duplicate vanish from the output
    * (pure boilerplate), matching `exact` dedup's keeper contract at span
    * granularity. Span text is re-attached to the skinny dedup verdicts
    * by an (id, span_idx) join, then reassembly is a per-document
    * aggregation — bounded by document size. */
  def removeDups(spans: DataFrame, joinWith: String = " "): DataFrame = {
    // surviving span indexes grouped per doc BEFORE the reattach, so the
    // join and the final reassembly are both keyed on id alone: span TEXT
    // crosses ONE exchange (the id-keyed join) and the groupBy(id) reuses
    // that partitioning — the (id, span_idx)-keyed join shuffled the text
    // a second time because hashpartitioning(id, span_idx) does not
    // satisfy the groupBy(id) distribution (guide §2.4 "two operations
    // keyed the same way can share one exchange"). The per-doc index set
    // is bounded by document size, like every reassembly here.
    val verdicts = dedup(spans).filter(!col("is_dup"))
      .groupBy("id").agg(collect_set(col("span_idx")).as("__keep_idx"))
    spans.join(verdicts, Seq("id"))
      .filter(array_contains(col("__keep_idx"), col("span_idx")))
      .groupBy("id")
      .agg(graft.functions.JoinSortedStructs.col(
        collect_list(struct(col("span_idx"), col("span").as("s"))), joinWith)
        .as("cleaned_text"))
  }

  /** CCNet/Dolma-style boilerplate removal: spans occurring in ≥ `minDf`
    * DISTINCT documents are boilerplate (nav chrome, licenses, cookie
    * banners) and are removed from EVERY document — including the copy
    * [[removeDups]] would have kept, which is the semantic difference:
    * dedup keeps one canonical copy of repeated content; boilerplate
    * removal judges the content itself worthless once it repeats widely
    * enough. Distinct-doc DF (not occurrence count) so a doc repeating
    * its own header does not self-promote to corpus boilerplate.
    *
    * Shape: the DF aggregate is map-side combined over (id, hash) rows;
    * verdicts stay skinny through the anti join (text re-attaches only in
    * the final (id, span_idx) join, as in [[removeDups]]). Fully-boiler
    * documents vanish. */
  def removeBoilerplate(spans: DataFrame, minDf: Long = 3,
                        joinWith: String = " "): DataFrame = {
    require(minDf >= 2, s"minDf $minDf: below 2 everything is boilerplate")
    val hashed = spans
      .withColumn("span_hash", md5(col("span")))
      .select("id", "span_idx", "span_hash")
    val boiler = hashed.groupBy("span_hash")
      .agg(count_distinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select("span_hash")
    // same id-keyed reattach as removeDups: text crosses one exchange
    val keptIdx = hashed.join(boiler, Seq("span_hash"), "left_anti")
      .groupBy("id").agg(collect_set(col("span_idx")).as("__keep_idx"))
    spans.join(keptIdx, Seq("id"))
      .filter(array_contains(col("__keep_idx"), col("span_idx")))
      .groupBy("id")
      .agg(graft.functions.JoinSortedStructs.col(
        collect_list(struct(col("span_idx"), col("span").as("s"))), joinWith)
        .as("cleaned_text"))
  }

  /** Per-document duplicate-span mask from `dedup` output — the reference's
    * emitted line mask, per doc: '0'/'1' per span in span order, plus
    * counts. A doc whose mask is all-'1' is pure boilerplate. */
  def dupMask(deduped: DataFrame): DataFrame =
    deduped.groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_spans"),
        graft.functions.JoinSortedStructs.col(
          collect_list(struct(col("span_idx"),
            when(col("is_dup"), "1").otherwise("0").as("f"))), "")
          .as("dup_mask"))
}
