package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static MinHash kernel shared by the expression's eval and codegen paths.
  *
  * One string hash per k-shingle, then `numHashes` cheap integer re-mixes —
  * NOT numHashes string hashes per shingle, which is what the HOF
  * formulation (`transform(seq, i => array_min(transform(shingles, hash)))`)
  * costs, and interpreted at that (Catalyst higher-order functions are
  * CodegenFallback). Duplicates need no dedup: min over a multiset equals
  * min over its set.
  */
object MinHash {
  /** Per-position seeds (splitmix over the index — deterministic). */
  private val seeds: Array[Long] = Array.tabulate(512) { i =>
    graft.fixture.Prng.derive(0x3C6EF372L, 0x9E37L, i.toLong).nextLong()
  }

  /** numHashes-element signature over character k-shingles of `text`.
    * Texts shorter than k contribute their whole content as one shingle
    * (same convention as `Dedup.shingles`). */
  def signature(text: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val t = if (text == null) "" else text.toString
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = math.max(1, t.length - k + 1)
    var i = 0
    while (i < n) {
      // windowed fnv: no per-shingle substring allocation
      val base = TextSim.mix64(
        TextSim.fnv64(t, i, math.min(i + k, t.length)))
      var j = 0
      while (j < numHashes) {
        val h = TextSim.mix64(base ^ seeds(j))
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    out
  }

  /** Entry point for generated code. */
  def signatureData(text: UTF8String, k: Int, numHashes: Int): GenericArrayData =
    new GenericArrayData(signature(text, k, numHashes))
}

/** Native Catalyst expression: MinHash signature (array<long>) of a string
  * column's character k-shingle set. Fused single pass, codegen'd into the
  * enclosing stage; the hot path of MinHash-LSH dedup at corpus scale. */
case class MinHashSig(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  require(shingleK >= 1 && numHashes >= 1 && numHashes <= 512,
    s"bad MinHashSig params k=$shingleK n=$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHash.signatureData(input.asInstanceOf[UTF8String], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHash.signatureData($c, $shingleK, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def col(text: Column, shingleK: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(text), shingleK, numHashes))
}
