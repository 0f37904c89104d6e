package graft.text

import graft.fixture.LangGen

/** Broadcast-able text-model artifact: fastText-style language-ID +
  * KenLM-style char/word n-gram language models (SURVEY §2.6 O2/O7).
  *
  * - LID: linear bag-of-hashed-char-n-grams classifier (multinomial
  *   naive-Bayes parameterization — a linear model over hashed 1..3-gram
  *   counts with a softmax posterior, the fastText supervised shape).
  *   Confidence = posterior of the top language, the analog of the
  *   reference's mean word confidence (`ocr_engine.py:99-100`).
  * - PPL: per-language interpolated char trigram LM and word unigram LM;
  *   ppl = exp(−(Σ log p)/N) (`experimental_evaluator` confidence-mean shape,
  *   KenLM-style backoff via fixed-weight interpolation).
  *
  * Built deterministically on the driver from the seeded corpus
  * (LangGen.corpus, seed disjoint from fixture rows), then broadcast once —
  * the reference's lazy model singletons (`ocr_engine.py:26-70`) become
  * "load once per executor via broadcast" (SURVEY §4.2(1)).
  *
  * All arrays are primitive and the class is a plain Serializable product —
  * cheap to broadcast (~(3·2^16 + LM maps) doubles).
  */
final case class TextModel(
    langs: IndexedSeq[String],
    hashDim: Int,
    // LID: per-language log P(bucket | lang) over hashed char n-grams + log prior
    lidLogProb: Array[Array[Double]],
    lidLogPrior: Array[Double],
    // char LMs: per-language maps of n-gram -> count, orders 1..3, plus totals
    charCounts: IndexedSeq[Map[String, Int]],
    charTotals: Array[Long],
    charsetSize: Array[Int],
    // word LMs: per-language word -> count + totals
    wordCounts: IndexedSeq[Map[String, Int]],
    wordTotals: Array[Long],
    // learned quality head (reference's model-based scoring subsystem,
    // `ai_processor.py:169-331`): logistic regression over the SAME hashed
    // char 1..3-gram feature space (mean-pooled), trained deterministically
    // on natural-vs-junk fixture labels at build time
    qualityW: Array[Double],
    qualityB: Double
) extends Serializable {

  import TextModel._

  def langIndex(l: String): Int = langs.indexOf(l)

  /** (bestLang, confidence = softmax posterior of best). */
  def lid(text: String): (String, Double) = {
    val t = normalize(text)
    if (t.isEmpty) return ("und", 0.0)
    val scores = new Array[Double](langs.length)
    var k = 0
    while (k < langs.length) { scores(k) = lidLogPrior(k); k += 1 }
    foreachNgramHash(t, hashDim) { h =>
      var i = 0
      while (i < langs.length) { scores(i) += lidLogProb(i)(h); i += 1 }
    }
    // softmax with max-subtraction; normalize by feature count to keep
    // confidences in a usable range for long texts
    val n = math.max(1, ngramCount(t))
    var best = 0
    var i = 1
    while (i < scores.length) { if (scores(i) > scores(best)) best = i; i += 1 }
    var denom = 0.0
    i = 0
    while (i < scores.length) {
      denom += math.exp((scores(i) - scores(best)) / n)
      i += 1
    }
    (langs(best), 1.0 / denom)
  }

  /** Per-JVM fast lookup structures (rebuilt after broadcast deserialization;
    * the serialized artifact stays the plain maps). Keys pack 1-3 UTF-16
    * code units plus a length tag into one Long — exact, collision-free. */
  @transient private lazy val fastChar: Array[TextModel.LongIntMap] =
    charCounts.map { m =>
      val f = new TextModel.LongIntMap(m.size * 2)
      m.foreach { case (k, v) => f.put(TextModel.packKey(k, 0, k.length), v) }
      f
    }.toArray

  /** Char-trigram perplexity of `text` under language `lang`'s LM
    * (interpolated orders 3/2/1 with add-k smoothing). */
  def pplChar(text: String, lang: String): Double = {
    val li = langIndex(lang)
    if (li < 0) return 1e9
    val t = "^^" + normalize(text) + "$"
    if (t.length <= 3) return 1e9
    val counts = fastChar(li)
    val total = charTotals(li).toDouble
    val V = charsetSize(li).toDouble
    var logSum = 0.0
    var n = 0
    var i = 2
    while (i < t.length) {
      val p3 = (counts.get(TextModel.packKey(t, i - 2, i + 1)) + 0.1) /
        (counts.get(TextModel.packKey(t, i - 2, i)) + 0.1 * V)
      val p2 = (counts.get(TextModel.packKey(t, i - 1, i + 1)) + 0.1) /
        (counts.get(TextModel.packKey(t, i - 1, i)) + 0.1 * V)
      val p1 = (counts.get(TextModel.packKey(t, i, i + 1)) + 0.1) / (total + 0.1 * V)
      val p = 0.7 * p3 + 0.2 * p2 + 0.1 * p1
      logSum += math.log(p)
      n += 1
      i += 1
    }
    math.exp(-logSum / n)
  }

  /** Word-unigram perplexity under `lang`'s LM with char-length-penalized
    * OOV probability. */
  def pplWord(text: String, lang: String): Double = {
    val li = langIndex(lang)
    if (li < 0) return 1e9
    val words = tokenize(text)
    if (words.isEmpty) return 1e9
    val counts = wordCounts(li)
    val total = wordTotals(li).toDouble
    var logSum = 0.0
    words.foreach { w =>
      val c = counts.getOrElse(w, 0)
      val p =
        if (c > 0) c / total
        else (0.5 / total) * math.pow(0.5, math.min(w.length, 12))
      logSum += math.log(p)
    }
    math.exp(-logSum / words.length)
  }

  /** Per-token surprisal vector under `lang`'s word LM (SURVEY O6: the
    * reference's per-word confidence+boxes, `ocr_engine.py:382-432`).
    * Same probability model as `pplWord`, so
    * `exp(−mean(logp)) == pplWord(text, lang)` exactly. */
  def tokenSurprisals(text: String, lang: String): Array[(String, Double)] = {
    val li = langIndex(lang)
    if (li < 0) return Array.empty
    val words = tokenize(text)
    val counts = wordCounts(li)
    val total = wordTotals(li).toDouble
    words.map { w =>
      val c = counts.getOrElse(w, 0)
      val p =
        if (c > 0) c / total
        else (0.5 / total) * math.pow(0.5, math.min(w.length, 12))
      (w, math.log(p))
    }
  }

  /** Best accepted language by char PPL — used when LID is uncertain. */
  def bestPplChar(text: String, accepted: Iterable[String]): (String, Double) =
    accepted.map(l => (l, pplChar(text, l))).minBy(_._2)

  /** Learned quality score in (0, 1): σ(b + mean-pooled hashed-n-gram dot
    * product). High = natural language, low = junk (repeated-token loops,
    * symbol spam, gibberish). Complements the heuristic rules: learned
    * jointly from examples rather than thresholded per symptom. Empty text
    * scores 0. Accumulation follows the documented position-order n-gram
    * stream, so the independent oracle reproduces it bitwise. */
  def qualityScore(text: String): Double = {
    val t = normalize(text)
    if (t.isEmpty) return 0.0
    var s = 0.0
    foreachNgramHash(t, hashDim)(h => s += qualityW(h))
    val z = qualityB + s / math.max(1, ngramCount(t))
    1.0 / (1.0 + math.exp(-z))
  }
}

object TextModel {

  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val nonWordRe = java.util.regex.Pattern.compile("[^\\p{L}\\p{N} ]")

  /** Canonical text normalization shared by train + score (single spec so
    * the oracle can mirror it): lowercase, collapse whitespace. */
  def normalize(text: String): String =
    wsRe.matcher(text.toLowerCase).replaceAll(" ").trim

  def tokenize(text: String): Array[String] = {
    val t = nonWordRe.matcher(normalize(text)).replaceAll("")
    if (t.isEmpty) Array.empty else t.split(" ").filter(_.nonEmpty)
  }

  /** Pack up to 3 UTF-16 code units of s[from,until) + length tag into a
    * Long: exact key for the char-LM maps (n ≤ 3, chars are 16-bit). */
  @inline def packKey(s: CharSequence, from: Int, until: Int): Long = {
    var k = (until - from).toLong
    var i = from
    while (i < until) { k = (k << 16) | s.charAt(i); i += 1 }
    k
  }

  /** Minimal open-addressing Long→Int map (linear probing, default 0). */
  final class LongIntMap(expected: Int) extends Serializable {
    private var cap = Integer.highestOneBit(math.max(16, expected * 2) - 1) << 1
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Int](cap)
    private var used = new Array[Boolean](cap)
    private var size = 0

    private def idx(k: Long): Int = {
      var h = k * -7046029254386353131L
      h ^= h >>> 32
      (h & mask).toInt
    }

    def put(k: Long, v: Int): Unit = {
      if (size * 2 >= cap) grow()
      var i = idx(k)
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      if (!used(i)) { used(i) = true; keys(i) = k; size += 1 }
      vals(i) = v
    }

    def get(k: Long): Int = {
      var i = idx(k)
      while (used(i)) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
      }
      0
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals; val ou = used
      cap <<= 1; mask = cap - 1
      keys = new Array[Long](cap); vals = new Array[Int](cap)
      used = new Array[Boolean](cap); size = 0
      var i = 0
      while (i < ok.length) { if (ou(i)) put(ok(i), ov(i)); i += 1 }
    }
  }

  /** FNV-1a over the n-gram chars — stable, public hash. */
  @inline private def fnv1a(s: CharSequence, from: Int, until: Int): Int = {
    var h = 0x811C9DC5
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x01000193
      i += 1
    }
    h
  }

  /** Iterate hashed char 1..3-gram buckets of already-normalized text. */
  def foreachNgramHash(t: String, dim: Int)(f: Int => Unit): Unit = {
    val len = t.length
    var i = 0
    while (i < len) {
      f(Math.floorMod(fnv1a(t, i, i + 1), dim))
      if (i + 2 <= len) f(Math.floorMod(fnv1a(t, i, i + 2), dim))
      if (i + 3 <= len) f(Math.floorMod(fnv1a(t, i, i + 3), dim))
      i += 1
    }
  }

  def ngramCount(t: String): Int = {
    val n = t.length
    n + math.max(0, n - 1) + math.max(0, n - 2)
  }

  /** Deterministic build from the seeded corpus. ~2k sentences/lang. */
  def build(perLang: Int = 1500, seed: Long = 1042L): TextModel = {
    val corpus = LangGen.corpus(perLang, seed)
    val langs = LangGen.langs
    val dim = 1 << 16

    val bucketCounts = Array.fill(langs.length)(new Array[Long](dim))
    val charCounts = langs.map(_ => scala.collection.mutable.Map.empty[String, Int])
    val charTotals = new Array[Long](langs.length)
    val charsets = langs.map(_ => scala.collection.mutable.Set.empty[Char])
    val wordCounts = langs.map(_ => scala.collection.mutable.Map.empty[String, Int])
    val wordTotals = new Array[Long](langs.length)

    langs.zipWithIndex.foreach { case (lang, li) =>
      corpus(lang).foreach { sent =>
        val t = normalize(sent)
        foreachNgramHash(t, dim)(h => bucketCounts(li)(h) += 1)
        // char LM counts over padded text, orders 1..3 + contexts
        val padded = "^^" + t + "$"
        var i = 0
        while (i < padded.length) {
          charsets(li) += padded.charAt(i)
          val m = charCounts(li)
          m.updateWith(padded.substring(i, i + 1))(c => Some(c.getOrElse(0) + 1))
          if (i + 2 <= padded.length)
            m.updateWith(padded.substring(i, i + 2))(c => Some(c.getOrElse(0) + 1))
          if (i + 3 <= padded.length)
            m.updateWith(padded.substring(i, i + 3))(c => Some(c.getOrElse(0) + 1))
          charTotals(li) += 1
          i += 1
        }
        tokenize(sent).foreach { w =>
          wordCounts(li).updateWith(w)(c => Some(c.getOrElse(0) + 1))
          wordTotals(li) += 1
        }
      }
    }

    // quality head: positives = natural corpus sentences, negatives = the
    // deterministic junk classes; seed stream disjoint from the LM corpus
    val qpos = langs.flatMap(l => corpus(l).take(1200)).toIndexedSeq
    val qneg = junkCorpus(qpos.length, seed = 7042L)
    val (qw, qb) = trainQualityHead(qpos, qneg, dim)

    // NB log-probs with add-alpha over buckets
    val alpha = 0.5
    val lidLogProb = Array.tabulate(langs.length) { li =>
      val tot = bucketCounts(li).sum.toDouble
      val denom = tot + alpha * dim
      Array.tabulate(dim)(h => math.log((bucketCounts(li)(h) + alpha) / denom))
    }
    val lidLogPrior = Array.fill(langs.length)(math.log(1.0 / langs.length))

    TextModel(
      langs = langs,
      hashDim = dim,
      lidLogProb = lidLogProb,
      lidLogPrior = lidLogPrior,
      charCounts = charCounts.map(_.toMap),
      charTotals = charTotals,
      charsetSize = charsets.map(_.size).toArray,
      wordCounts = wordCounts.map(_.toMap),
      wordTotals = wordTotals,
      qualityW = qw,
      qualityB = qb
    )
  }

  /** Deterministic junk corpus for quality-head training and evaluation —
    * the degenerate classes a curation filter must reject: repeated-token
    * loops, symbol spam, uniform character gibberish, consonant mash.
    * Splitmix streams keyed by (seed, tag, i): disjoint from the fixture
    * rows and the LM corpus. */
  def junkCorpus(n: Int, seed: Long): IndexedSeq[String] =
    IndexedSeq.tabulate(n) { i =>
      val rng = graft.fixture.Prng.derive(seed, 0xBADFEEDL, i.toLong)
      (i % 4) match {
        case 0 => // repeated token loop
          val tok = Array.fill(3 + rng.nextInt(6))(
            ('a' + rng.nextInt(26)).toChar).mkString
          Array.fill(15 + rng.nextInt(40))(tok).mkString(" ")
        case 1 => // symbol spam with sparse letters
          val syms = "!@#$%^&*()_+{}|:<>?~;=[]"
          (0 until 60 + rng.nextInt(120)).map { _ =>
            val r = rng.nextDouble()
            if (r < 0.6) syms.charAt(rng.nextInt(syms.length))
            else if (r < 0.75) ' '
            else ('a' + rng.nextInt(26)).toChar
          }.mkString
        case 2 => // uniform character gibberish
          (0 until 80 + rng.nextInt(120)).map { _ =>
            if (rng.nextDouble() < 0.15) ' ' else ('a' + rng.nextInt(26)).toChar
          }.mkString
        case _ => // consonant-mash words
          val cons = "bcdfghjklmnpqrstvwxz"
          (0 until 10 + rng.nextInt(20)).map { _ =>
            Array.fill(4 + rng.nextInt(8))(
              cons.charAt(rng.nextInt(cons.length))).mkString
          }.mkString(" ")
      }
    }

  /** Deterministic logistic-regression fit: mean-pooled hashed-n-gram
    * features, fixed example interleave (pos, neg, pos, neg, …), fixed
    * epoch count and learning rate — pure double math in a fixed order, so
    * the trained weights are identical on every JVM. The feature space is
    * linearly separable for these classes; ~10 epochs saturate. */
  private def trainQualityHead(pos: IndexedSeq[String], neg: IndexedSeq[String],
                               dim: Int): (Array[Double], Double) = {
    require(pos.length == neg.length, "balanced classes required")
    def feats(s: String): Array[(Int, Double)] = {
      val t = normalize(s)
      val m = scala.collection.mutable.HashMap.empty[Int, Int]
      foreachNgramHash(t, dim)(h => m.updateWith(h)(c => Some(c.getOrElse(0) + 1)))
      val n = math.max(1, ngramCount(t)).toDouble
      m.toArray.sortBy(_._1).map { case (h, c) => (h, c / n) }
    }
    val examples = pos.zip(neg).flatMap { case (p, q) =>
      Seq((feats(p), 1.0), (feats(q), 0.0))
    }
    val w = new Array[Double](dim)
    var b = 0.0
    // mean-pooled features have unit L1 mass, so logits grow slowly — a
    // large initial step with per-epoch decay converges the oscillation.
    // The junk classes have CONCENTRATED features (few distinct grams, big
    // negative weights, measured held-out p95 score ≈ 0.001) while natural
    // text is diffuse, so an unweighted fit parks the boundary against the
    // positive class; the 4× positive class weight shifts it into the
    // negatives' wide margin and both classes clear threshold 0.5.
    var epoch = 0
    while (epoch < 60) {
      val lr = 8.0 / (1.0 + 0.15 * epoch)
      examples.foreach { case (f, y) =>
        var z = b
        f.foreach { case (h, x) => z += w(h) * x }
        val g = (1.0 / (1.0 + math.exp(-z)) - y) * (if (y > 0.5) 4.0 else 1.0)
        b -= lr * g
        f.foreach { case (h, x) => w(h) -= lr * g * x }
      }
      epoch += 1
    }
    (w, b)
  }

  /** Process-wide cached artifact (built once per JVM, then broadcast). */
  lazy val default: TextModel = build()
}
