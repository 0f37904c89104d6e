package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.model.ClipRow
import graft.rules.Heuristics

/** Segment-level audio deduplication — the audio analog of [[Spans]]: find
  * fixed-length windows of audio REPEATED ACROSS clips (injected jingles,
  * ad beds, ringtones, hold music, shared intros) that whole-clip
  * fingerprinting structurally misses, exactly as document-level Jaccard
  * misses a duplicated paragraph.
  *
  * Scale shape mirrors the rest of the engine: decode + per-window
  * fingerprinting is ONE narrow typed flatMap (the waveform never crosses a
  * shuffle — only (clip_id, win_idx, fp) longs travel, [[Spans]]' exact
  * contract); candidate pairs come from the same capped multi-probe Hamming
  * banding as clip-level audio dedup (`Dedup.hamming64Pairs`), so the
  * all-pairs blowup never materializes.
  *
  * Detection is alignment-sensitive at `hopMs` granularity: a shared
  * segment is found when both copies start within the same window phase —
  * `hopMs` < `windowMs` (default half-overlap) bounds the worst-case
  * misalignment at windowMs−hopMs. Reference analog: the repeated-artifact
  * (line/stamp) removal family recast to 1-D
  * (`/root/reference/Backend/utils/image_processing.py:817-871`). */
object AudioDedup {

  /** One window's acoustic fingerprint. `n_wins` rides along so per-clip
    * masks need no second count pass. */
  final case class WinFp(clip_id: String, win_idx: Int, n_wins: Int, fp: Long)

  private def typed(clips: DataFrame): Dataset[ClipRow] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
      .as[ClipRow]
  }

  /** Per-window 64-bit acoustic fingerprints: decode → fixed `windowMs`
    * windows every `hopMs` → [[Heuristics.audioFingerprint]] per window.
    * Short tails (< windowMs) are skipped — a partial window fingerprints
    * differently from the same audio inside a full window, which would
    * only add noise pairs. Near-silent windows (RMS < `minRms`) emit NO
    * row — the standard content gate of every audio-fingerprint system:
    * silence and noise-floor windows are shared by unrelated clips by
    * nature, so indexing them only manufactures meaningless "duplicates"
    * (they still count in `n_wins`, so masks stay positionally complete —
    * an ungated window reads '0'). Undecodable clips emit nothing (decode
    * errors are the filter pass's job). */
  def windowFingerprints(clips: DataFrame, windowMs: Int = 500,
                         hopMs: Int = 250,
                         minRms: Double = 0.01): Dataset[WinFp] = {
    require(windowMs > 0 && hopMs > 0 && hopMs <= windowMs,
      s"need 0 < hopMs <= windowMs, got window=$windowMs hop=$hopMs")
    val spark = clips.sparkSession
    import spark.implicits._
    typed(clips).flatMap { c =>
      Codecs.decode(c.codec, c.bytes).toOption.toSeq.flatMap { pcm =>
        val win = math.max(1, c.sr_hz * windowMs / 1000)
        val hop = math.max(1, c.sr_hz * hopMs / 1000)
        val n = if (pcm.length < win) 0 else (pcm.length - win) / hop + 1
        (0 until n).flatMap { i =>
          val seg = java.util.Arrays.copyOfRange(pcm, i * hop, i * hop + win)
          var sq = 0.0
          var j = 0
          while (j < seg.length) { sq += seg(j).toDouble * seg(j); j += 1 }
          if (math.sqrt(sq / seg.length) < minRms) None
          else Some(WinFp(c.clip_id, i, n, Heuristics.audioFingerprint(seg)))
        }
      }
    }
  }

  /** Cross-clip repeated-segment pairs over a window-fingerprint frame:
    * the capped multi-probe Hamming banding applied to (clip, window) keys,
    * same-clip matches excluded (intra-clip repetition is the H2/H7 rules'
    * business). Returns (clip_a, win_a, clip_b, win_b, hamming). */
  def segmentPairs(winFps: DataFrame, maxHamming: Int = 3,
                   numBands: Int = 4, probeBits: Int = 0,
                   maxBucket: Int = 0): DataFrame = {
    val keyed = winFps.select(
      concat_ws("#", col("clip_id"), col("win_idx")).as("wid"), col("fp"))
    Dedup.hamming64Pairs(keyed, "wid", "fp", maxHamming, numBands,
        probeBits, maxBucket)
      .select(
        substring_index(col("id_a"), "#", 1).as("clip_a"),
        substring_index(col("id_a"), "#", -1).cast("int").as("win_a"),
        substring_index(col("id_b"), "#", 1).as("clip_b"),
        substring_index(col("id_b"), "#", -1).cast("int").as("win_b"),
        col("hamming"))
      .filter(col("clip_a") =!= col("clip_b"))
  }

  /** Per-clip duplicate-window mask — the audio analog of
    * [[Spans.dupMask]]'s '0'/'1' line mask: for every clip, which of its
    * windows also occur in ANOTHER clip (per `pairs`), as
    * (clip_id, n_wins, n_dup_wins, dup_mask) with the mask in window
    * order. The practical artifact: a clip whose mask is mostly '1' is a
    * re-broadcast; a '1' prefix is a shared intro to trim. */
  def dupWindowMask(winFps: DataFrame, pairs: DataFrame): DataFrame = {
    val dupWins = pairs.select(col("clip_a").as("clip_id"),
        col("win_a").as("win_idx"))
      .union(pairs.select(col("clip_b").as("clip_id"),
        col("win_b").as("win_idx")))
      .distinct()
      .withColumn("is_dup", lit(1))
    // mask positions come from sequence(0, n_wins-1), NOT from the emitted
    // fingerprint rows: silence-gated windows have no row but still hold a
    // (necessarily '0') mask slot. A clip whose every window was gated has
    // no fingerprint rows at all and therefore no mask row.
    winFps.select("clip_id", "win_idx", "n_wins")
      .join(dupWins, Seq("clip_id", "win_idx"), "left")
      .na.fill(0, Seq("is_dup"))
      .groupBy("clip_id")
      .agg(first(col("n_wins")).as("n_wins"),
        sum(col("is_dup")).cast("int").as("n_dup_wins"),
        collect_list(when(col("is_dup") === 1, col("win_idx"))).as("dup_idx"))
      .select(col("clip_id"), col("n_wins"), col("n_dup_wins"),
        array_join(transform(sequence(lit(0), col("n_wins") - 1),
          i => when(array_contains(col("dup_idx"), i), "1").otherwise("0")),
          "").as("dup_mask"))
  }

  /** Query-by-audio-snippet: which corpus clips CONTAIN a query clip's
    * audio (the "find every clip carrying this jingle / ad bed / leaked
    * track" retrieval — the asymmetric cousin of [[segmentPairs]], and the
    * operational shape of an audio takedown: resolve the snippet to clip
    * ids here, then [[graft.table.SnapshotTable.stageDelete]] them).
    *
    * Scale shape: the corpus side is ONE windowed-fingerprint pass (the
    * [[windowFingerprints]] narrow flatMap) band-keyed exactly like
    * [[Dedup.hamming64Pairs]]; the query side is tiny by definition and is
    * BROADCAST, so the corpus never shuffles — band keys make the probe an
    * equi-join, not a scan-side Hamming loop over every query window.
    *
    * Containment evidence is ALIGNMENT, not bag-of-windows overlap: a
    * genuine embedded copy matches its query windows at one common offset
    * `delta = corpus_win − query_win`, so the score counts distinct query
    * windows matched at the BEST single delta (ties → smallest delta) and
    * `coverage = n_matched / n_query_windows` over the query's non-gated
    * windows. Shared-phase caveat as [[segmentPairs]]: detection is
    * alignment-sensitive at `hopMs` granularity. Same-id corpus rows are
    * excluded (a query drawn from the corpus should not report itself). */
  def findClipsContaining(corpus: DataFrame, queries: DataFrame,
                          windowMs: Int = 500, hopMs: Int = 250,
                          minRms: Double = 0.01, maxHamming: Int = 3,
                          numBands: Int = 4,
                          minCoverage: Double = 0.8): DataFrame =
    findInIndex(windowFingerprints(corpus, windowMs, hopMs, minRms).toDF(),
      queries, windowMs, hopMs, minRms, maxHamming, numBands, minCoverage)

  /** [[findClipsContaining]] against a PREBUILT window-fingerprint index —
    * the daily-ingest shape for audio retrieval/takedown at 10^12-clip
    * scale: the corpus decodes ONCE (the [[windowFingerprints]] pass,
    * persisted as skinny (clip_id, win_idx, n_wins, fp) rows, e.g. one
    * [[graft.table.SnapshotTable]] chunk per ingest) and every later
    * snippet query is an index scan + broadcast probe — no corpus byte is
    * ever re-read. The query side decodes live with the SAME window/hop/
    * minRms parameters the index was built with (caller contract; a
    * mismatch silently costs recall, never correctness of what IS
    * matched). */
  def findInIndex(index: DataFrame, queries: DataFrame,
                  windowMs: Int = 500, hopMs: Int = 250,
                  minRms: Double = 0.01, maxHamming: Int = 3,
                  numBands: Int = 4,
                  minCoverage: Double = 0.8): DataFrame = {
    require(64 % numBands == 0, s"numBands $numBands must divide 64")
    val width = 64 / numBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    def banded(fps: DataFrame): DataFrame = fps
      .select(col("clip_id"), col("win_idx"), col("fp"),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("fp"), b * width)
              .bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
      .select(col("clip_id"), col("win_idx"), col("fp"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cw = banded(index.select("clip_id", "win_idx", "fp"))
      .select(col("band"), col("key"), col("clip_id").as("clip_id_c"),
        col("win_idx").as("cwin"), col("fp").as("cfp"))
    val qfp = windowFingerprints(queries, windowMs, hopMs, minRms).toDF()
    val qn = qfp.groupBy(col("clip_id").as("query_id"))
      .agg(count(lit(1)).as("n_qwins"))
    val qw = banded(qfp).select(col("band"), col("key"),
      col("clip_id").as("query_id"), col("win_idx").as("qwin"),
      col("fp").as("qfp"))
    val matched = cw.join(broadcast(qw), Seq("band", "key"))
      .filter(col("clip_id_c") =!= col("query_id"))
      .filter(bit_count(col("cfp").bitwiseXOR(col("qfp"))) <= maxHamming)
      .select(col("clip_id_c"), col("query_id"), col("cwin"), col("qwin"))
      .distinct() // a pair matching on several bands counts once
    val perDelta = matched
      .withColumn("delta", col("cwin") - col("qwin"))
      .groupBy("clip_id_c", "query_id", "delta")
      .agg(count_distinct(col("qwin")).as("n_matched"))
    val best = perDelta.groupBy("clip_id_c", "query_id")
      .agg(max(struct(col("n_matched").as("m"),
        (-col("delta")).as("nd"))).as("b"))
      .select(col("clip_id_c").as("clip_id"), col("query_id"),
        col("b.m").as("n_matched"), (-col("b.nd")).cast("int").as("offset"))
    best.join(broadcast(qn), "query_id")
      .withColumn("coverage",
        round(col("n_matched").cast("double") / col("n_qwins"), 4))
      .filter(col("coverage") >= minCoverage)
      .select("clip_id", "query_id", "n_matched", "n_qwins", "coverage",
        "offset")
  }
}
