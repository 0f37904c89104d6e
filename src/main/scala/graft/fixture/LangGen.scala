package graft.fixture

/** Three synthetic "languages" (FIXTURES.md §1): each a seeded first-order
  * Markov chain over a language-specific charset, used to build word
  * vocabularies and sample sentences. `aa`/`bb` share the latin charset with
  * different transition structure; `cc` uses an extended charset — language
  * separation is real but imperfect, like the reference's vie/eng OCR
  * language split (`ocr_engine.py:107-120`).
  */
object LangGen {

  /** `dd` is the planted wrong-language class (not in the default accepted
    * set) — the LID model knows it so "LID ≠ expected → drop" is exercised. */
  val langs: IndexedSeq[String] = IndexedSeq("aa", "bb", "cc", "dd")

  private val latin = "abcdefghijklmnopqrstuvwxyz".toCharArray
  private val extended = "αβγδεζηθικλμνξοπρστυφχψω".toCharArray
  private val cyrillic = "абвгдежзиклмнопрстуфхцчшщыэюя".toCharArray

  /** Per-language Markov chain over its charset, with deterministic
    * seeded transition weights. */
  final case class LangSpec(name: String, chars: Array[Char], chainSeed: Long,
                            vocabSize: Int, zipfS: Double)

  val specs: Map[String, LangSpec] = Map(
    "aa" -> LangSpec("aa", latin, 0xAA01L, 600, 1.05),
    "bb" -> LangSpec("bb", latin, 0xBB02L, 600, 1.05),
    "cc" -> LangSpec("cc", extended, 0xCC03L, 500, 1.05),
    "dd" -> LangSpec("dd", cyrillic, 0xDD04L, 500, 1.05)
  )

  /** Sparse transition matrix: for each char, a small set of likely
    * successors with weights (seeded, deterministic, distinct per language). */
  private def transitions(spec: LangSpec): Array[Array[Int]] = {
    val n = spec.chars.length
    val rng = new Prng(spec.chainSeed)
    Array.tabulate(n) { _ =>
      // each state gets 6 favored successors
      Array.fill(6)(rng.nextInt(n))
    }
  }

  final class Lang(val spec: LangSpec) {
    private val trans = transitions(spec)
    private val n = spec.chars.length

    private def word(rng: Prng): String = {
      val len = 2 + rng.nextInt(8)
      val sb = new StringBuilder(len)
      var state = rng.nextInt(n)
      var i = 0
      while (i < len) {
        sb.append(spec.chars(state))
        // 85% follow the chain's favored successors, 15% jump anywhere
        state = if (rng.nextDouble() < 0.85) trans(state)(rng.nextInt(6))
                else rng.nextInt(n)
        i += 1
      }
      sb.toString
    }

    /** Deterministic vocabulary (seeded from the chain seed). */
    val vocab: IndexedSeq[String] = {
      val rng = new Prng(spec.chainSeed ^ 0x7E57AB1EL)
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      while (seen.size < spec.vocabSize) seen += word(rng)
      seen.toIndexedSeq
    }

    // Zipf-ish weights over the vocab, precomputed cumulative for sampling
    private val weights: Array[Double] =
      Array.tabulate(spec.vocabSize)(i => 1.0 / math.pow(i + 1, spec.zipfS))
    private val cumWeights: Array[Double] = {
      val c = new Array[Double](spec.vocabSize)
      var acc = 0.0
      var i = 0
      while (i < spec.vocabSize) { acc += weights(i); c(i) = acc; i += 1 }
      c
    }

    private def sampleWord(rng: Prng): String = {
      val r = rng.nextDouble() * cumWeights.last
      var lo = 0; var hi = spec.vocabSize - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cumWeights(mid) < r) lo = mid + 1 else hi = mid
      }
      vocab(lo)
    }

    /** Sample a sentence of roughly `targetChars` characters. */
    def sentence(rng: Prng, targetChars: Int): String = {
      val sb = new StringBuilder(targetChars + 16)
      var first = true
      while (sb.length < targetChars) {
        if (!first) {
          if (rng.nextDouble() < 0.08) sb.append(". ") else sb.append(' ')
        }
        var w = sampleWord(rng)
        if (first || rng.nextDouble() < 0.05) w = w.capitalize
        sb.append(w)
        first = false
      }
      sb.append('.')
      sb.toString
    }
  }

  // Lang instances are moderately expensive to build; cache per JVM.
  lazy val byName: Map[String, Lang] =
    specs.map { case (k, v) => k -> new Lang(v) }

  /** Training corpus for model building: `perLang` sentences per language,
    * drawn from a seed stream disjoint from the fixture's row streams. */
  def corpus(perLang: Int, seed: Long = 1042L): Map[String, IndexedSeq[String]] =
    langs.map { l =>
      val lang = byName(l)
      l -> IndexedSeq.tabulate(perLang) { i =>
        val rng = Prng.derive(seed, l.hashCode.toLong, i.toLong)
        lang.sentence(rng, 40 + rng.nextInt(160))
      }
    }.toMap
}
