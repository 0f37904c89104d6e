package graft.tools

import graft.fixture.{ClipGen, LangGen, Prng}
import graft.text.TextModel

/** Microbenchmark of the pure text/codec path, no Spark. */
object TimeIt {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val model = time("model build")(TextModel.build())
    val rng = new Prng(7)
    val sents = (0 until 50).map { i =>
      LangGen.byName("aa").sentence(Prng.derive(7, 1, i.toLong), 400)
    }
    time("lid x50")(sents.foreach(model.lid))
    time("pplChar x50")(sents.foreach(s => model.pplChar(s, "aa")))
    time("pplWord x50")(sents.foreach(s => model.pplWord(s, "aa")))
    val params = ClipGen.Params(100)
    time("gen 100 rows")((0L until 100L).foreach(i => ClipGen.row(i, params)))
    val r = ClipGen.row(0, params)
    println(s"sample row: codec=${r.codec} bytes=${r.bytes.length} sr=${r.sr_hz} dur=${r.dur_ms} tlen=${r.transcript.length}")
    println(s"sample lid: ${model.lid(r.transcript)} pplC=${model.pplChar(r.transcript, "aa")}")
  }
}
