package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the remaining per-row HOF chains: token extraction,
  * ExactSubstr window hashing, consecutive-pair arrays, sorted-struct
  * reassembly and the BPE merge-chain token count. All equivalences are
  * pinned against the original Catalyst formulations in NativeExprOptSpec. */
object TokenKernel {

  private def ownedBytes(t: UTF8String): Array[Byte] = {
    val n = t.numBytes
    val out = new Array[Byte](n)
    Platform.copyMemory(t.getBaseObject, t.getBaseOffset, out,
      Platform.BYTE_ARRAY_OFFSET, n)
    out
  }

  /** ≡ `filter(split(t, " "), w -> w != "")` — nonempty single-space
    * tokens as zero-copy slices. */
  def spaceTokens(text: UTF8String): GenericArrayData = {
    val tb = ownedBytes(if (text == null) UTF8String.EMPTY_UTF8 else text)
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    var s = 0
    while (i <= tb.length) {
      if (i == tb.length || tb(i) == ' ') {
        if (i > s) out.add(UTF8String.fromBytes(tb, s, i - s))
        s = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ≡ `transform(sequence(1, size(ws)-(k-1)), i -> xxhash64(slice(ws, i,
    * k)))` over ws = nonempty space tokens: the seeded-chain xxhash64 an
    * array<string> hashes to (h = 42; per element h = XXH64(bytes, h)).
    * Returns null-equivalent EMPTY array when the doc has < k tokens —
    * callers guard with size(ws) >= k exactly as before. */
  def windowHashes(text: UTF8String, k: Int): GenericArrayData = {
    val tb = ownedBytes(if (text == null) UTF8String.EMPTY_UTF8 else text)
    // token byte ranges
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var s = 0
    while (i <= tb.length) {
      if (i == tb.length || tb(i) == ' ') {
        if (i > s) { starts.add(s); ends.add(i) }
        s = i + 1
      }
      i += 1
    }
    val n = starts.size
    val nWins = n - (k - 1)
    if (nWins <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Long](nWins)
    var w = 0
    while (w < nWins) {
      var h = 42L
      var j = w
      while (j < w + k) {
        h = XXH64.hashUnsafeBytes(tb, Platform.BYTE_ARRAY_OFFSET + starts.get(j),
          ends.get(j) - starts.get(j), h)
        j += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }

  /** ≡ `filter(split(lower(t), "[^a-z0-9]+"), w -> w != "")` — maximal
    * [a-z0-9] runs of the lowercased text (every char outside the class is
    * a separator, so runs ⇔ regex-split nonempty tokens). */
  def alnumTokens(text: UTF8String): GenericArrayData = {
    val low = (if (text == null) UTF8String.EMPTY_UTF8 else text).toLowerCase
    val tb = ownedBytes(low)
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    var s = -1
    while (i <= tb.length) {
      val in = i < tb.length && {
        val b = tb(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      }
      if (in) { if (s < 0) s = i }
      else if (s >= 0) { out.add(UTF8String.fromBytes(tb, s, i - s)); s = -1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ≡ `zip_with(slice(a,1,n-1), slice(a,2,n-1), (x,y) -> struct(x,y))` —
    * consecutive-element pairs of a string array. */
  def consecutivePairs(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = new GenericInternalRow(Array[Any](
        arr.getUTF8String(i), arr.getUTF8String(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ≡ `array_join(transform(array_sort(arr), s -> s.getField(f)), sep)`
    * for arr: array<struct<first: long, second: string>> — sort by
    * (first asc, second asc binary), join the string field. */
  def joinSortedStructs(arr: ArrayData, sep: UTF8String): UTF8String = {
    val n = arr.numElements()
    val keys = new Array[Long](n)
    val vals = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      keys(i) = r.getLong(0)
      vals(i) = r.getUTF8String(1)
      i += 1
    }
    // sort pairs by (key, value-binary) — array_sort's struct ordering
    val idx = (0 until n).sortBy(j => (keys(j), vals(j)))
    UTF8String.concatWs(sep, idx.map(vals): _*)
  }

  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, String)], Array[(String, String)]]()

  /** ≡ the bpeEncode per-word chain: " c h a r s " sentinel string, one
    * literal `replace` per merge in order, then token count; summed over
    * the doc's alnum tokens. */
  def bpeTokenCount(text: UTF8String, merges: Seq[(String, String)]): Long = {
    val pats = mergeCache.computeIfAbsent(merges,
      ms => ms.map { case (l, r) => (s" $l $r ", s" $l$r ") }.toArray)
    val words = alnumTokens(text)
    var total = 0L
    var wi = 0
    val nw = words.numElements()
    val sb = new java.lang.StringBuilder(64)
    while (wi < nw) {
      val w = words.getUTF8String(wi).toString
      sb.setLength(0)
      sb.append(' ')
      var ci = 0
      while (ci < w.length) { sb.append(w.charAt(ci)); sb.append(' '); ci += 1 }
      var sent = sb.toString
      var mi = 0
      while (mi < pats.length) {
        sent = sent.replace(pats(mi)._1, pats(mi)._2)
        mi += 1
      }
      // trim + split(" ") token count: tokens are single-space separated
      var cnt = 0L
      var k = 0
      var inTok = false
      while (k < sent.length) {
        val c = sent.charAt(k)
        if (c != ' ') { if (!inTok) { cnt += 1; inTok = true } }
        else inTok = false
        k += 1
      }
      total += cnt
      wi += 1
    }
    total
  }
}

case class SpaceTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TokenKernel.spaceTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenKernel.spaceTokens($c);")
  override protected def withNewChildInternal(newChild: Expression): SpaceTokens =
    copy(child = newChild)
}

object SpaceTokens {
  def col(text: Column): Column =
    GraftBridge.column(SpaceTokens(GraftBridge.expression(text)))
}

case class WindowHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2, s"window size $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TokenKernel.windowHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenKernel.windowHashes($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  def col(text: Column, k: Int): Column =
    GraftBridge.column(WindowHashes(GraftBridge.expression(text), k))
}

case class AlnumTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TokenKernel.alnumTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenKernel.alnumTokens($c);")
  override protected def withNewChildInternal(newChild: Expression): AlnumTokens =
    copy(child = newChild)
}

object AlnumTokens {
  def col(text: Column): Column =
    GraftBridge.column(AlnumTokens(GraftBridge.expression(text)))
}

case class ConsecutivePairs(child: Expression, f1: String, f2: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField(f1, StringType, nullable = true),
    StructField(f2, StringType, nullable = true))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TokenKernel.consecutivePairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenKernel.consecutivePairs($c);")
  override protected def withNewChildInternal(newChild: Expression): ConsecutivePairs =
    copy(child = newChild)
}

object ConsecutivePairs {
  def col(arr: Column, f1: String, f2: String): Column =
    GraftBridge.column(ConsecutivePairs(GraftBridge.expression(arr), f1, f2))
}

/** array_join(transform(array_sort(arr), s -> s.getField(field2)), sep)
  * for array<struct<long, string>> — the per-document reassembly of the
  * span/substr families. */
case class JoinSortedStructs(child: Expression, sep: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  private lazy val sepU = UTF8String.fromString(sep)
  override def nullSafeEval(input: Any): Any =
    TokenKernel.joinSortedStructs(input.asInstanceOf[ArrayData], sepU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sepU", sepU, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenKernel.joinSortedStructs($c, $sepRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): JoinSortedStructs =
    copy(child = newChild)
}

object JoinSortedStructs {
  def col(arr: Column, sep: String): Column =
    GraftBridge.column(JoinSortedStructs(GraftBridge.expression(arr), sep))
}

/** The bpeEncode token counter: alnum words -> sentinel char string ->
  * ordered literal merge replaces -> token count, summed per document. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TokenKernel.bpeTokenCount(input.asInstanceOf[UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("merges", merges,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenKernel.bpeTokenCount($c, (scala.collection.immutable.Seq) $mRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def col(text: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(text), merges))
}
