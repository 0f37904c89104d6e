package graft.functions

/** Pure text-similarity primitives: 64-bit SimHash and winnowing-style
  * rolling-hash document fingerprints. Deterministic (own integer hashes,
  * no JVM hashCode), usable from UDFs and from the test oracle. */
object TextSim {

  // precompiled patterns: String.replaceAll/split recompile the regex on
  // every call, which dominated the fingerprint/simhash kernels at
  // corpus-scan rates (these expressions run once per document per pass)
  private val wsPat = java.util.regex.Pattern.compile("\\s+")
  private val tokPat = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  /** FNV-1a 64-bit over UTF-16 code units — stable across JVMs. */
  def fnv64(s: CharSequence): Long = fnv64(s, 0, s.length)

  /** FNV-1a over `s[from, until)` — the windowed form lets k-gram hashing
    * run without a per-gram substring allocation (bit-identical to hashing
    * the copied substring: FNV consumes the same code units in order). */
  def fnv64(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** FNV-1a of `a + " " + b` computed incrementally — no concatenation. */
  private def fnv64Pair(a: String, b: String): Long = {
    var h = fnv64(a)
    h ^= ' '
    h *= 0x100000001B3L
    var i = 0
    while (i < b.length) {
      h ^= b.charAt(i)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
    z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
    z ^ (z >>> 33)
  }

  def tokenize(text: String): Array[String] =
    tokPat.split(text.toLowerCase).filter(_.nonEmpty)

  /** 64-bit SimHash over word unigrams+bigrams. Near-duplicate docs land
    * within a small Hamming distance. */
  def simhash64(text: String): Long = {
    val words = tokenize(text)
    if (words.isEmpty) return 0L
    val v = new Array[Int](64)
    def addFeature(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) v(b) += 1 else v(b) -= 1
        b += 1
      }
    }
    var i = 0
    while (i < words.length) {
      addFeature(mix64(fnv64(words(i))))
      // bigram hash rolled through the separator — same value as
      // fnv64(words(i) + " " + words(i+1)) without building the string
      if (i + 1 < words.length) addFeature(mix64(fnv64Pair(words(i), words(i + 1))))
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (v(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing fingerprint (Schleimer et al. 2003): rolling hashes of char
    * k-grams, minimum per window of w, distinct-sorted. Robust to local
    * edits; used for containment/fingerprint lookup. Window minima are
    * collected into a flat array, sorted and deduped — the same
    * ascending-distinct `take(maxLen)` set the SortedSet formulation
    * produced, without a red-black-tree insert per window. */
  def fingerprint(text: String, k: Int = 8, w: Int = 16, maxLen: Int = 64): Array[Long] = {
    val t = wsPat.matcher(text.toLowerCase).replaceAll(" ")
    if (t.length < k) return Array(mix64(fnv64(t)))
    val n = t.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = mix64(fnv64(t, i, i + k)); i += 1 }
    val nw = (n + w - 1) / w
    val mins = new Array[Long](nw)
    var start = 0
    var wi = 0
    while (start < n) {
      val end = math.min(n, start + w)
      var m = hs(start)
      var j = start + 1
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      mins(wi) = m
      wi += 1
      start += w
    }
    java.util.Arrays.sort(mins)
    val cap = math.min(nw, maxLen)
    val out = new Array[Long](cap)
    var nOut = 0
    var r = 0
    while (r < nw && nOut < cap) {
      if (r == 0 || mins(r) != mins(r - 1)) { out(nOut) = mins(r); nOut += 1 }
      r += 1
    }
    if (nOut == cap) out else java.util.Arrays.copyOf(out, nOut)
  }
}
