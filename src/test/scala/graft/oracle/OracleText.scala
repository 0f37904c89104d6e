package graft.oracle

import graft.text.TextModel

/** Independent language-ID / perplexity scorer over the SAME broadcast
  * `TextModel` artifact — the round-2 gap closed: `Oracle.expected` used to
  * call the engine's own `lid`/`pplChar`/`pplWord`, leaving language scoring
  * the one gate segment with zero independent verification.
  *
  * Shares only the published artifact (count maps, bucket log-probs) and the
  * documented formulas (FIXTURES.md §3 / TextModel scaladoc); every code
  * path is written separately:
  *  - its own FNV-1a (re-derived from the published constants) and its own
  *    n-gram enumeration via substring — not `foreachNgramHash`;
  *  - per-LANGUAGE accumulation loops (engine: per-n-gram across languages);
  *  - char-LM lookups against the artifact's plain `Map[String, Int]` —
  *    not the engine's packed-key open-addressing `LongIntMap`, so the fast
  *    path's exactness is itself under test;
  *  - its own normalize/tokenize from the documented spec.
  *
  * Floating-point accumulation preserves the documented evaluation ORDER
  * (left-to-right over text positions), so agreement is exact (bitwise),
  * not approximate — asserted in TextSpec over every fixture class.
  */
object OracleText {

  private def normalize(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  private def tokenize(text: String): Array[String] = {
    val t = normalize(text).replaceAll("[^\\p{L}\\p{N} ]", "")
    if (t.isEmpty) Array.empty else t.split(" ").filter(_.nonEmpty)
  }

  /** FNV-1a 32-bit (published offset basis / prime), written fresh. */
  private def fnv(s: String, from: Int, until: Int): Int = {
    var h = 0x811C9DC5
    for (i <- from until until) h = (h ^ s.charAt(i)) * 0x01000193
    h
  }

  /** The documented LID feature stream: hashed char 1..3-gram buckets in
    * position order (1-gram, 2-gram, 3-gram at each position). */
  private def buckets(t: String, dim: Int): IndexedSeq[Int] =
    (0 until t.length).flatMap { i =>
      Seq(i + 1, i + 2, i + 3).filter(_ <= t.length)
        .map(end => Math.floorMod(fnv(t, i, end), dim))
    }

  /** (bestLang, softmax confidence) — same artifact, separate traversal. */
  def lid(model: TextModel, text: String): (String, Double) = {
    val t = normalize(text)
    if (t.isEmpty) return ("und", 0.0)
    val bs = buckets(t, model.hashDim)
    // per-language accumulation (engine interleaves per bucket — same
    // addition order per accumulator, so sums agree bitwise)
    val scores = model.langs.indices.map { li =>
      var s = model.lidLogPrior(li)
      bs.foreach(h => s += model.lidLogProb(li)(h))
      s
    }
    val n = math.max(1, t.length + math.max(0, t.length - 1) + math.max(0, t.length - 2))
    val best = scores.indices.maxBy(i => (scores(i), -i))
    var denom = 0.0
    scores.foreach(s => denom += math.exp((s - scores(best)) / n))
    (model.langs(best), 1.0 / denom)
  }

  /** Char-trigram PPL from the artifact's PLAIN maps (interpolated 3/2/1,
    * add-0.1 smoothing, the documented formula). */
  def pplChar(model: TextModel, text: String, lang: String): Double = {
    val li = model.langIndex(lang)
    if (li < 0) return 1e9
    val t = "^^" + normalize(text) + "$"
    if (t.length <= 3) return 1e9
    val m = model.charCounts(li)
    val total = model.charTotals(li).toDouble
    val v = model.charsetSize(li).toDouble
    def c(from: Int, until: Int): Int = m.getOrElse(t.substring(from, until), 0)
    var logSum = 0.0
    var n = 0
    for (i <- 2 until t.length) {
      val p3 = (c(i - 2, i + 1) + 0.1) / (c(i - 2, i) + 0.1 * v)
      val p2 = (c(i - 1, i + 1) + 0.1) / (c(i - 1, i) + 0.1 * v)
      val p1 = (c(i, i + 1) + 0.1) / (total + 0.1 * v)
      logSum += math.log(0.7 * p3 + 0.2 * p2 + 0.1 * p1)
      n += 1
    }
    math.exp(-logSum / n)
  }

  /** Learned quality head from the artifact's weights — independent bucket
    * stream, n-gram count, and sigmoid. Bitwise equality with the engine
    * holds because both accumulate the position-order stream. */
  def quality(model: TextModel, text: String): Double = {
    val t = normalize(text)
    if (t.isEmpty) return 0.0
    var s = 0.0
    buckets(t, model.hashDim).foreach(h => s += model.qualityW(h))
    val n = math.max(1,
      t.length + math.max(0, t.length - 1) + math.max(0, t.length - 2))
    1.0 / (1.0 + math.exp(-(model.qualityB + s / n)))
  }

  /** Word-unigram PPL with the documented length-penalized OOV mass. */
  def pplWord(model: TextModel, text: String, lang: String): Double = {
    val li = model.langIndex(lang)
    if (li < 0) return 1e9
    val words = tokenize(text)
    if (words.isEmpty) return 1e9
    val m = model.wordCounts(li)
    val total = model.wordTotals(li).toDouble
    var logSum = 0.0
    words.foreach { w =>
      val c = m.getOrElse(w, 0)
      val p =
        if (c > 0) c / total
        else (0.5 / total) * math.pow(0.5, math.min(w.length, 12))
      logSum += math.log(p)
    }
    math.exp(-logSum / words.length)
  }
}
