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
}
