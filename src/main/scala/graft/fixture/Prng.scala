package graft.fixture

/** Splitmix64 PRNG (public algorithm, Steele et al. 2014). Pure integer
  * math ⇒ identical streams on every JVM; splittable by construction so the
  * fixture generator can derive an independent, order-free stream per row
  * (parallel generation at any partitioning yields the same table).
  */
final class Prng(seed0: Long) {
  private var state: Long = seed0

  def nextLong(): Long = {
    state += 0x9E3779B97F4A7C15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, n). */
  def nextInt(n: Int): Int = {
    require(n > 0)
    var bits = nextLong() >>> 1
    var v = bits % n
    // rejection to remove modulo bias (deterministic loop)
    while (bits - v + (n - 1) < 0) { bits = nextLong() >>> 1; v = bits % n }
    v.toInt
  }

  /** Uniform in [0, 1). */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

  /** Standard normal via Box-Muller (deterministic). */
  def nextGaussian(): Double = {
    val u1 = math.max(nextDouble(), 1e-300)
    val u2 = nextDouble()
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Weighted choice by cumulative weights. */
  def choose[T](items: IndexedSeq[T], weights: IndexedSeq[Double]): T = {
    val total = weights.sum
    var r = nextDouble() * total
    var i = 0
    while (i < items.length - 1 && r >= weights(i)) { r -= weights(i); i += 1 }
    items(i)
  }
}

object Prng {
  /** Derive an independent stream for (seed, tag, index) — splitmix over a
    * mixed key, so row k's stream is independent of generation order. */
  def derive(seed: Long, tag: Long, index: Long): Prng = {
    var z = seed ^ (tag * 0xC2B2AE3D27D4EB4FL) ^ (index * 0x165667B19E3779F9L)
    z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
    z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
    new Prng(z ^ (z >>> 33))
  }
}
