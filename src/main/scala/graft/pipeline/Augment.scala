package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.codec.Codecs
import graft.model.ClipRow

/** Deterministic audio data augmentation — the expansion half of a training
  * -data pipeline (the reference's pipeline only cleans/filters; an ASR
  * training corpus is then AUGMENTED before packing, and at 10^12-clip scale
  * the augmentation must be a Spark transform, not a preprocessing script).
  *
  * All ops share one scale shape: decode → transform → re-encode inside a
  * single narrow typed flatMap over the clips Dataset — the waveform never
  * crosses a shuffle (same contract as the filter pipeline's decode stage),
  * the row blow-up is exactly |variants|, and every sample transform is
  * closed-form deterministic math (no RNG), so re-runs and retried tasks
  * emit bit-identical bytes. Output standardizes on pcm_s16le at the clip's
  * own rate — the canonical training format — with `aug`/`aug_idx` keeping
  * (clip_id, aug_idx) a key for downstream dedup/packing. Undecodable clips
  * emit nothing: augmentation consumes the post-filter KEPT table, where
  * decode errors have already been dropped (rule H-decode).
  */
object Augment {

  /** One augmented variant; `aug` is the human-readable recipe label. */
  final case class AugClip(
      clip_id: String,
      aug: String,
      aug_idx: Int,
      bytes: Array[Byte],
      sr_hz: Int,
      dur_ms: Int,
      codec: String,
      transcript: String)

  /** Saturating float→s16 (inverse of the decoders' s/32768 convention:
    * round(x·32768) clamped) — a pcm_s16le/µ-law/A-law/ADPCM decode
    * round-trips bit-identically through it at unit gain. */
  @inline private def f2s(x: Float): Short = {
    val v = math.round(x * 32768.0f)
    (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
  }

  private def typed(clips: DataFrame): Dataset[ClipRow] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
      .as[ClipRow]
  }

  /** Speed perturbation — the standard ASR augmentation (Ko et al. 2015,
    * "Audio augmentation for speech recognition": factors 0.9/1.0/1.1):
    * playing a clip at f× speed is a resample from rate round(sr·f) back
    * to sr (linear-interpolation kernel, [[Codecs.resampleLinear]]), so
    * duration scales by ~1/f and pitch shifts with it. Factor 1.0 is the
    * identity pass-through (kept so the output table is the full training
    * set, originals included). */
  def speedPerturb(clips: DataFrame,
                   factors: Seq[Double] = Seq(0.9, 1.0, 1.1))
      : Dataset[AugClip] = {
    require(factors.nonEmpty && factors.forall(f => f >= 0.5 && f <= 2.0),
      s"speed factors out of (0.5, 2.0): $factors")
    val spark = clips.sparkSession
    import spark.implicits._
    typed(clips).flatMap { c =>
      Codecs.decode(c.codec, c.bytes).toOption.toSeq.flatMap { pcm =>
        factors.zipWithIndex.map { case (f, i) =>
          val out =
            if (f == 1.0) pcm
            else Codecs.resampleLinear(pcm, math.round(c.sr_hz * f).toInt,
              c.sr_hz)
          AugClip(c.clip_id, f"sp$f%.2f", i,
            Codecs.encodePcmS16le(out.map(f2s)), c.sr_hz,
            math.round(out.length * 1000.0 / c.sr_hz).toInt,
            "pcm_s16le", c.transcript)
        }
      }
    }
  }

  /** Gain perturbation: each variant scales samples by 10^(dB/20) with
    * saturating s16 math (SURVEY P18's clamp discipline — hot clips clip
    * at full scale instead of wrapping). 0 dB is the identity. */
  def gainPerturb(clips: DataFrame,
                  gainsDb: Seq[Double] = Seq(-6.0, 0.0, 6.0))
      : Dataset[AugClip] = {
    require(gainsDb.nonEmpty && gainsDb.forall(g => g >= -40 && g <= 40),
      s"gains out of ±40 dB: $gainsDb")
    val spark = clips.sparkSession
    import spark.implicits._
    typed(clips).flatMap { c =>
      Codecs.decode(c.codec, c.bytes).toOption.toSeq.flatMap { pcm =>
        gainsDb.zipWithIndex.map { case (db, i) =>
          val g = math.pow(10.0, db / 20.0).toFloat
          AugClip(c.clip_id, f"g$db%+.1fdB", i,
            Codecs.encodePcmS16le(pcm.map(x => f2s(x * g))), c.sr_hz,
            c.dur_ms, "pcm_s16le", c.transcript)
        }
      }
    }
  }

  /** Loudness normalization to a target RMS level in dBFS — the align-
    * everything-to-one-level pass run before mixing corpora recorded at
    * different levels. Per clip: gain = target − rms (dB), applied with
    * the same saturating math; clips quieter than `floorDb` (silence,
    * noise floor) are passed through at unit gain — amplifying pure noise
    * to target level is the classic normalization footgun. Output carries
    * the measured input level and the applied gain for lineage. */
  def normalizeLoudness(clips: DataFrame, targetDb: Double = -20.0,
                        floorDb: Double = -60.0): DataFrame = {
    require(targetDb < 0 && floorDb < targetDb,
      s"need floorDb < targetDb < 0: floor=$floorDb target=$targetDb")
    val spark = clips.sparkSession
    import spark.implicits._
    typed(clips).flatMap { c =>
      Codecs.decode(c.codec, c.bytes).toOption.map { pcm =>
        var sumSq = 0.0
        var i = 0
        while (i < pcm.length) { sumSq += pcm(i).toDouble * pcm(i); i += 1 }
        val rms = if (pcm.length == 0) 0.0
          else math.sqrt(sumSq / pcm.length)
        val rmsDb = if (rms <= 0) Double.NegativeInfinity
          else 20.0 * math.log10(rms)
        val gainDb = if (rmsDb < floorDb) 0.0 else targetDb - rmsDb
        val g = math.pow(10.0, gainDb / 20.0).toFloat
        val out: Array[Short] =
          if (gainDb == 0.0) pcm.map(f2s) else pcm.map(x => f2s(x * g))
        (c.clip_id, Codecs.encodePcmS16le(out), c.sr_hz, c.dur_ms,
          "pcm_s16le", c.transcript,
          if (rmsDb.isNegInfinity) -999.0 else rmsDb, gainDb)
      }
    }.toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
      "rms_db_in", "gain_db")
  }

  /** One biquad notch (RBJ audio-EQ cookbook), direct form I:
    * y = (b0·x + b1·x₁ + b2·x₂ − a1·y₁ − a2·y₂)/a0 with
    * b = (1, −2cos w0, 1), a = (1+α, −2cos w0, 1−α), α = sin(w0)/(2Q).
    * Closed-form deterministic — retried tasks emit identical samples. */
  private def biquadNotch(x: Array[Double], f0: Double, fs: Int,
                          q: Double): Array[Double] = {
    val w0 = 2.0 * math.Pi * f0 / fs
    val alpha = math.sin(w0) / (2.0 * q)
    val cw = math.cos(w0)
    val a0 = 1.0 + alpha
    val b0 = 1.0 / a0
    val b1 = -2.0 * cw / a0
    val b2 = 1.0 / a0
    val a1 = -2.0 * cw / a0
    val a2 = (1.0 - alpha) / a0
    val y = new Array[Double](x.length)
    var x1 = 0.0; var x2 = 0.0; var y1 = 0.0; var y2 = 0.0
    var i = 0
    while (i < x.length) {
      val yi = b0 * x(i) + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
      y(i) = yi
      x2 = x1; x1 = x(i); y2 = y1; y1 = yi
      i += 1
    }
    y
  }

  /** Mains-hum REMOVAL — the cleaning counterpart of rule H7 (which only
    * detects and drops): a cascade of biquad notches at `freqsHz` (50 and
    * 60 Hz by default — filtering both is the standard practice when the
    * grid region is unknown; a notch at a hum-free frequency is ~identity
    * outside its ~f0/Q-wide stopband). The 1-D analog of the reference's
    * periodic line-artifact REMOVAL (`image_processing.py:817-871` erases
    * the artifact rather than discarding the page). Same narrow shape as
    * every augment op: decode → filter → re-encode in one flatMap, no
    * waveform shuffle. Output carries the before/after hum fraction
    * ([[graft.rules.Heuristics.spectralHumFrac]]) for lineage — rescued
    * clips can be re-admitted by re-running the filter on the cleaned
    * table. Frequencies at/above Nyquist are skipped. */
  def removeHum(clips: DataFrame, freqsHz: Seq[Double] = Seq(50.0, 60.0),
                q: Double = 4.0): DataFrame = {
    require(freqsHz.nonEmpty && freqsHz.forall(f => f > 0),
      s"bad notch frequencies $freqsHz")
    require(q >= 0.5 && q <= 100, s"notch Q out of (0.5, 100): $q")
    val spark = clips.sparkSession
    import spark.implicits._
    typed(clips).flatMap { c =>
      Codecs.decode(c.codec, c.bytes).toOption.map { pcm =>
        val humBefore = graft.rules.Heuristics
          .spectralHumFrac(pcm, 0, pcm.length, c.sr_hz)
        var x = Array.tabulate(pcm.length)(i => pcm(i).toDouble)
        freqsHz.filter(_ < c.sr_hz / 2.0).foreach { f0 =>
          x = biquadNotch(x, f0, c.sr_hz, q)
        }
        val outF = Array.tabulate(x.length)(i => x(i).toFloat)
        val humAfter = graft.rules.Heuristics
          .spectralHumFrac(outF, 0, outF.length, c.sr_hz)
        (c.clip_id, Codecs.encodePcmS16le(outF.map(f2s)), c.sr_hz,
          c.dur_ms, "pcm_s16le", c.transcript, humBefore, humAfter)
      }
    }.toDF("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
      "hum_frac_in", "hum_frac_out")
  }
}
