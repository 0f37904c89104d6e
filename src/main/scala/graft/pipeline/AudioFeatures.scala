package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.codec.Codecs
import graft.model.ClipRow
import graft.rules.Heuristics

/** Acoustic feature extraction — the "feature-extract" half of a multimodal
  * training pipeline: decode → framed log-mel filterbank energies (Davis &
  * Mermelstein 1980 mel scale; the standard ASR/audio-ML front end) as a
  * skinny typed table, computed REAL end to end (the in-house radix-2 FFT
  * that backs rule H7, no stubs).
  *
  * Scale shape matches the rest of the engine: ONE narrow typed flatMap
  * decodes each clip and emits (clip_id, frame_idx, fbank[nMels]) rows —
  * the waveform never crosses a shuffle, the feature table is what
  * downstream training/dedup/ANN jobs consume (floats per frame instead of
  * bytes per clip). All math is closed-form deterministic: retried tasks
  * emit bit-identical rows.
  */
object AudioFeatures {

  /** One feature frame. `n_frames` rides along (the [[AudioDedup.WinFp]]
    * convention) so per-clip rollups need no second count pass. */
  final case class FbankFrame(clip_id: String, frame_idx: Int,
                              n_frames: Int, fbank: Array[Float])

  private def hzToMel(f: Double): Double =
    2595.0 * math.log10(1.0 + f / 700.0)
  private def melToHz(m: Double): Double =
    700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank over FFT bins 0..nFft/2: `nMels` channels
    * with centers equally spaced on the mel scale between fMin and fMax,
    * each a triangle from the previous center to the next (HTK
    * convention). Returned as per-channel (binLo, weights) so application
    * is a short dot product. */
  private[graft] def melFilters(nMels: Int, nFft: Int, srHz: Int,
                                   fMin: Double): Array[(Int, Array[Double])] = {
    val fMax = srHz / 2.0
    val melPts = Array.tabulate(nMels + 2)(i =>
      hzToMel(fMin) + (hzToMel(fMax) - hzToMel(fMin)) * i / (nMels + 1))
    val binOf = melPts.map(m => melToHz(m) * nFft / srHz)
    Array.tabulate(nMels) { c =>
      val (lo, mid, hi) = (binOf(c), binOf(c + 1), binOf(c + 2))
      val b0 = math.max(0, math.ceil(lo).toInt)
      val b1 = math.min(nFft / 2, math.floor(hi).toInt)
      val w = Array.tabulate(math.max(0, b1 - b0 + 1)) { j =>
        val b = (b0 + j).toDouble
        if (b <= mid) {
          if (mid == lo) 1.0 else math.max(0.0, (b - lo) / (mid - lo))
        } else {
          if (hi == mid) 1.0 else math.max(0.0, (hi - b) / (hi - mid))
        }
      }
      (b0, w)
    }
  }

  /** Framed log-mel filterbank energies. `frameLen` must be a power of two
    * (radix-2 FFT); frames step by `hop` samples, short tails are skipped
    * (the [[AudioDedup.windowFingerprints]] convention: a partial frame
    * features differently from the same audio inside a full one). Energies
    * are `ln(E + eps)` with eps = 1e-10, so silence reads as a flat
    * ~-23 floor rather than -inf. Undecodable clips emit nothing. */
  def logMelFbank(clips: DataFrame, nMels: Int = 26, frameLen: Int = 512,
                  hop: Int = 256, fMin: Double = 20.0): Dataset[FbankFrame] = {
    require(nMels >= 2 && nMels <= 128, s"nMels $nMels out of [2, 128]")
    require(frameLen >= 64 && (frameLen & (frameLen - 1)) == 0,
      s"frameLen $frameLen must be a power of two >= 64")
    require(hop > 0 && hop <= frameLen, s"bad hop $hop for frame $frameLen")
    val eps = 1e-10
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
      .as[ClipRow]
      .flatMap { c =>
        Codecs.decode(c.codec, c.bytes).toOption.toSeq.flatMap { pcm =>
          val filters = melFilters(nMels, frameLen, c.sr_hz, fMin)
          val hann = Array.tabulate(frameLen)(i =>
            0.5 - 0.5 * math.cos(2.0 * math.Pi * i / frameLen))
          val n =
            if (pcm.length < frameLen) 0
            else (pcm.length - frameLen) / hop + 1
          val re = new Array[Double](frameLen)
          val im = new Array[Double](frameLen)
          (0 until n).map { f =>
            var i = 0
            while (i < frameLen) {
              re(i) = pcm(f * hop + i).toDouble * hann(i)
              im(i) = 0.0
              i += 1
            }
            Heuristics.fft(re, im)
            val power = Array.tabulate(frameLen / 2 + 1)(k =>
              re(k) * re(k) + im(k) * im(k))
            val fbank = filters.map { case (b0, w) =>
              var e = 0.0
              var j = 0
              while (j < w.length) { e += power(b0 + j) * w(j); j += 1 }
              math.log(e + eps).toFloat
            }
            FbankFrame(c.clip_id, f, n, fbank)
          }
        }
      }
  }

  /** SpecAugment (Park et al. 2019) over a filterbank frame table: per
    * clip, `nFreqMasks` channel bands and `nTimeMasks` frame spans are
    * forced to the eps floor — the standard ASR training augmentation,
    * as a Spark transform rather than a loader-side hack. Mask positions
    * derive from md5(clip_id, mask index) (the engine's content-stable
    * draw), so re-runs and retried tasks mask identical regions and the
    * augmented table is reproducible end to end. Pure per-row expressions
    * on the time axis would need the clip's frame count; it rides along
    * in `n_frames`, so this stays one narrow map — no shuffle. */
  def specAugment(frames: Dataset[FbankFrame], nFreqMasks: Int = 1,
                  freqMaskLen: Int = 4, nTimeMasks: Int = 1,
                  timeMaskLen: Int = 5): Dataset[FbankFrame] = {
    require(nFreqMasks >= 0 && nTimeMasks >= 0 &&
      freqMaskLen >= 1 && timeMaskLen >= 1, "bad SpecAugment params")
    val floor = math.log(1e-10).toFloat
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { fr =>
      def draw(kind: String, i: Int, bound: Int): Int = {
        if (bound <= 0) 0
        else {
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(s"${fr.clip_id}#$kind#$i".getBytes("UTF-8"))
          val v = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
            ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
          (v % bound).toInt
        }
      }
      val nMels = fr.fbank.length
      val out = fr.fbank.clone()
      (0 until nFreqMasks).foreach { i =>
        val f0 = draw("f", i, math.max(1, nMels - freqMaskLen + 1))
        var c = f0
        while (c < math.min(nMels, f0 + freqMaskLen)) { out(c) = floor; c += 1 }
      }
      val masked = (0 until nTimeMasks).exists { i =>
        val t0 = draw("t", i, math.max(1, fr.n_frames - timeMaskLen + 1))
        fr.frame_idx >= t0 && fr.frame_idx < t0 + timeMaskLen
      }
      if (masked) java.util.Arrays.fill(out, floor)
      FbankFrame(fr.clip_id, fr.frame_idx, fr.n_frames, out)
    }
  }

  /** Clip-level acoustic embedding: per-channel mean ++ per-channel std of
    * FLOOR-LIFTED filterbank energies, `max(fbank − ln(liftEps), 0)` — the
    * classic pooled-stats audio embedding (2·nMels floats per clip) with
    * the one conditioning step cosine needs. Raw log energies share a huge
    * common silence-floor component (ln 1e-10 ≈ −23 in every quiet
    * channel), which dominates cosine so badly that two unrelated clips
    * read more similar than a clip and its own µ-law re-encode (the
    * re-encode's quantization/companding noise moves a quiet channel's
    * LOG value by several units while leaving content channels
    * untouched). Lifting at liftEps = 1e-2 puts every below-noise channel
    * at exactly 0 for ANY of the table's codecs and leaves content
    * channels' geometry intact — measured on planted band-limited
    * signals: a µ-law re-encode reads 0.985 cosine (BELOW two unrelated
    * same-vocabulary clips) unlifted, 0.99 vs ≤0.28 for unrelated pairs
    * lifted.
    *
    * Scale shape: ONE map-side-combined aggregate of (sum, sumsq) per
    * channel; only ~2·nMels doubles per clip cross the shuffle. The bridge
    * from the audio payload into the embedding family: feed the output
    * straight to `Dedup.semDedupPairs` / `knnExact` / the PQ path for
    * audio semantic dedup and similarity search. */
  def clipEmbedding(frames: Dataset[FbankFrame], nMels: Int = 26,
                    liftEps: Double = 1e-2): DataFrame = {
    import org.apache.spark.sql.functions._
    require(liftEps > 0, s"liftEps $liftEps must be positive")
    val lift = math.log(liftEps)
    // loud nMels contract: element_at past the fbank length is NULL under
    // non-ANSI SQL, so a frames/nMels mismatch would silently skip
    // channels in the pooled sums and emit malformed embeddings — fail
    // the job instead
    val df = frames.toDF().withColumn("fbank",
      when(size(col("fbank")) === nMels, col("fbank"))
        .otherwise(raise_error(concat(
          lit("clipEmbedding: fbank length "),
          size(col("fbank")).cast("string"),
          lit(s" != nMels $nMels"))).cast("array<float>")))
    val sums = (0 until nMels).flatMap { c =>
      val x = greatest(
        element_at(col("fbank"), c + 1).cast("double") - lift, lit(0.0))
      Seq(sum(x).as(s"s$c"), sum(x * x).as(s"q$c"))
    } :+ count(lit(1)).cast("double").as("n")
    df.groupBy("clip_id").agg(sums.head, sums.tail: _*)
      .select(col("clip_id"),
        array((0 until nMels).map(c => (col(s"s$c") / col("n"))
            .cast("float")) ++
          (0 until nMels).map(c =>
            sqrt(greatest(col(s"q$c") / col("n") -
              (col(s"s$c") / col("n")) * (col(s"s$c") / col("n")), lit(0.0)))
              .cast("float")): _*).as("embedding"))
  }
}
