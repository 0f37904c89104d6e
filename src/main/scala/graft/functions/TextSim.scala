package graft.functions

/** Pure text-similarity primitives: 64-bit SimHash and winnowing-style
  * rolling-hash document fingerprints. Deterministic (own integer hashes,
  * no JVM hashCode), usable from UDFs and from the test oracle. */
object TextSim {

  /** FNV-1a 64-bit over UTF-16 code units — stable across JVMs. */
  def fnv64(s: CharSequence): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
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
    text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)

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
      if (i + 1 < words.length) addFeature(mix64(fnv64(words(i) + " " + words(i + 1))))
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
    * edits; used for containment/fingerprint lookup. */
  def fingerprint(text: String, k: Int = 8, w: Int = 16, maxLen: Int = 64): Array[Long] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ")
    if (t.length < k) return Array(mix64(fnv64(t)))
    val n = t.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = mix64(fnv64(t.subSequence(i, i + k))); i += 1 }
    val picked = scala.collection.mutable.SortedSet.empty[Long]
    var start = 0
    while (start < n) {
      val end = math.min(n, start + w)
      var m = hs(start)
      var j = start + 1
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      picked += m
      start += w
    }
    picked.take(maxLen).toArray
  }
}
