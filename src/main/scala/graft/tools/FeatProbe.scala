package graft.tools

import graft.codec.Codecs
import graft.fixture.ClipGen
import graft.model.Presets
import graft.rules.Heuristics
import graft.text.{Scrubber, TextModel}

/** Single-threaded per-row cost breakdown of the heavyweight pass: decode vs
  * resample vs feature kernel vs text scoring, across analysis-grid configs.
  * No Spark — isolates the row kernel from the scheduler. */
object FeatProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3000
    val params = ClipGen.Params(n)
    println(s"generating $n rows...")
    val rows = java.util.stream.LongStream.range(0, n).parallel()
      .mapToObj(i => ClipGen.row(i, params))
      .collect(java.util.stream.Collectors.toList[graft.model.ClipRow])
    import scala.jdk.CollectionConverters._
    val rs = rows.asScala.toVector
    val model = TextModel.default

    def timed(tag: String)(f: => Unit): Unit = {
      val reps = 3
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$tag%-42s ${best}%8.3f s  (${n / best}%8.0f rows/s)")
    }

    val decoded = rs.flatMap(r => Codecs.decode(r.codec, r.bytes).toOption.map((r, _)))
    timed("decode only") {
      var acc = 0L
      rs.foreach(r => Codecs.decode(r.codec, r.bytes).foreach(p => acc += p.length))
    }
    for (hz <- Seq(0, 8000, 16000)) {
      timed(s"resample to $hz") {
        var acc = 0L
        decoded.foreach { case (r, p) =>
          val out = if (hz > 0 && r.sr_hz != hz) Codecs.resampleLinear(p, r.sr_hz, hz) else p
          acc += out.length
        }
      }
      val cfg = Presets.default.copy(referenceHz = hz)
      timed(s"resample+features(trim) ref=$hz") {
        decoded.foreach { case (r, p) =>
          val (a, sr) = if (hz > 0 && r.sr_hz != hz)
            (Codecs.resampleLinear(p, r.sr_hz, hz), hz) else (p, r.sr_hz)
          Heuristics.audioFeatures(a, sr, cfg, trim = true)
        }
      }
    }
    timed("features only, native grid, no trim (r1-ish)") {
      decoded.foreach { case (r, p) =>
        Heuristics.audioFeatures(p, r.sr_hz, Presets.default.copy(referenceHz = 0), trim = false)
      }
    }
    // fine-grained kernel breakdown on the 8 kHz reference grid
    val cfg8 = Presets.default
    val resampled = decoded.map { case (r, p) =>
      if (cfg8.referenceHz > 0 && r.sr_hz != cfg8.referenceHz)
        (r, Codecs.resampleLinear(p, r.sr_hz, cfg8.referenceHz), cfg8.referenceHz)
      else (r, p, r.sr_hz)
    }
    timed("  hum FFT only (spectralHumFrac)") {
      var acc = 0.0
      resampled.foreach { case (_, p, hz) =>
        acc += Heuristics.spectralHumFrac(p, 0, p.length, hz)
      }
    }
    timed("  audioFingerprint only") {
      var acc = 0L
      resampled.foreach { case (_, p, _) => acc ^= Heuristics.audioFingerprint(p) }
    }
    timed("text: lid + scrub + 2 ppl") {
      rs.foreach { r =>
        val t = r.transcript
        if (t.nonEmpty) {
          val (lang, _) = model.lid(t)
          val (s, _) = Scrubber.scrub(t)
          val pl = if (model.langIndex(lang) >= 0) lang else model.langs.head
          model.pplChar(s, pl); model.pplWord(s, pl)
        }
      }
    }
  }
}
