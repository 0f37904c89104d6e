package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass kernels for the two gram builders that were Catalyst
  * higher-order-function chains. `transform`/`sequence`/`array_distinct`
  * are CodegenFallback — interpreted per row — and the chains were
  * evaluated up to 4x per near-dup query (once per attach-join side plus
  * the size() frames): the dominant CPU of the text-dedup query family
  * (measured 8-12 executor-seconds per 32-task stage over 5k docs).
  *
  * Equivalence contracts (gated in NativeExprOptSpec):
  *  - [[CharShingles]] ≡ `array_distinct(transform(sequence(0,
  *    greatest(length(t)-k, 0)), i -> substring(t, 1+i, k)))` — code-point
  *    positions exactly like Spark's `substring`, distinct keeping first
  *    occurrence.
  *  - [[WordNgrams]] ≡ `transform(sequence(0, greatest(size(split(t," "))-n,
  *    0)), i -> concat_ws(" ", slice(split(t, " "), i+1, n)))` (plus
  *    `array_distinct` of it when `distinct = true`) — single-space split
  *    with Java's keep-all-empties limit=-1 semantics.
  */
object GramKernel {

  /** Private copy of the string's bytes: every gram below is a zero-copy
    * slice over this array, so slices can never alias a reused input row
    * buffer. */
  private def ownedBytes(t: UTF8String): Array[Byte] = {
    val n = t.numBytes
    val out = new Array[Byte](n)
    Platform.copyMemory(t.getBaseObject, t.getBaseOffset, out,
      Platform.BYTE_ARRAY_OFFSET, n)
    out
  }

  /** Byte start-offset of each code point plus the end offset — shingle i
    * of width k is then bytes [offs(i), offs(min(i+k, nChars))), identical
    * to Spark's code-point `substring(t, 1+i, k)`. */
  private def codePointOffsets(tb: Array[Byte]): Array[Int] = {
    val tmp = new Array[Int](tb.length + 1)
    var i = 0
    var n = 0
    while (i < tb.length) {
      tmp(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(tb(i))
    }
    tmp(n) = tb.length
    java.util.Arrays.copyOf(tmp, n + 1)
  }

  def charShingles(text: UTF8String, k: Int): GenericArrayData = {
    val tb = ownedBytes(if (text == null) UTF8String.EMPTY_UTF8 else text)
    val offs = codePointOffsets(tb)
    val nChars = offs.length - 1
    val count = math.max(nChars - k, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val from = offs(i)
      val until = offs(math.min(i + k, nChars))
      seen.add(UTF8String.fromBytes(tb, from, until - from))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def wordNgrams(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val tb = ownedBytes(if (text == null) UTF8String.EMPTY_UTF8 else text)
    // single-space split, limit -1: token boundaries at every 0x20 byte
    // (spaces are never part of a multi-byte UTF-8 sequence), empty tokens
    // kept — including leading/trailing, matching Java's split(" ", -1)
    var nTok = 1
    var i = 0
    while (i < tb.length) { if (tb(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < tb.length) {
      if (tb(i) == ' ') { ends(tok) = i; tok += 1; starts(tok) = i + 1 }
      i += 1
    }
    ends(tok) = tb.length
    // consecutive tokens are separated by exactly one space in the source,
    // so concat_ws(" ", tokens i..j) IS the source byte range
    // [starts(i), ends(j)] — each n-gram is a zero-copy slice
    val count = math.max(nTok - n, 0) + 1
    if (!distinct) {
      val out = new Array[AnyRef](count)
      var g = 0
      while (g < count) {
        val from = starts(g)
        val until = ends(math.min(g + n - 1, nTok - 1))
        out(g) = UTF8String.fromBytes(tb, from, until - from)
        g += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var g = 0
      while (g < count) {
        val from = starts(g)
        val until = ends(math.min(g + n - 1, nTok - 1))
        seen.add(UTF8String.fromBytes(tb, from, until - from))
        g += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Distinct character k-shingles of a string column (first-occurrence
  * order) — the native form of `Dedup.shingles`. */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle k $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GramKernel.charShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernel.charShingles($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  def col(text: Column, k: Int): Column =
    GraftBridge.column(CharShingles(GraftBridge.expression(text), k))
}

/** Word n-grams of a single-space-tokenized string column (occurrence
  * order, duplicates kept; `distinct = true` applies the array_distinct
  * semantics in the same pass) — the native form of `TextProfile.ngrams`. */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"ngram size $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    GramKernel.wordNgrams(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernel.wordNgrams($c, $n, $distinct);")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def col(text: Column, n: Int, distinct: Boolean = false): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(text), n, distinct))
}
