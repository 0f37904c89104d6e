package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the span-chunk builders (Spans.wordChunks /
  * Spans.cdcChunks): the transform/sequence/slice/concat_ws/md5 chains are
  * CodegenFallback (interpreted per row). Equivalence laws in
  * NativeExprOptSpec pin both against the original Catalyst formulations. */
object ChunkKernel {

  private def ownedBytes(t: UTF8String): Array[Byte] = {
    val n = t.numBytes
    val out = new Array[Byte](n)
    Platform.copyMemory(t.getBaseObject, t.getBaseOffset, out,
      Platform.BYTE_ARRAY_OFFSET, n)
    out
  }

  /** Fixed word-window chunks: ≡ `transform(sequence(0,
    * greatest(ceil(size(ws)/c)-1, 0)), j -> concat_ws(" ",
    * slice(ws, j*c+1, c)))` with ws = split(t, " ") keeping empties. */
  def wordChunks(text: UTF8String, c: Int): GenericArrayData = {
    val tb = ownedBytes(if (text == null) UTF8String.EMPTY_UTF8 else text)
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
    val nChunks = math.max((nTok + c - 1) / c - 1, 0) + 1
    val out = new Array[AnyRef](nChunks)
    var j = 0
    while (j < nChunks) {
      val from = j * c
      if (from >= nTok) out(j) = UTF8String.EMPTY_UTF8
      else {
        val until = ends(math.min(from + c - 1, nTok - 1))
        out(j) = UTF8String.fromBytes(tb, starts(from), until - starts(from))
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** CDC chunks: ≡ the Spans.cdcChunks boundary/assembly chain — nonempty
    * tokens fw, boundary after token j (1-based, window ≤ j ≤ |fw|−1) iff
    * the first hex char of md5(concat_ws(" ", fw[j−window+1 .. j])) is
    * `< boundaryHexLt`, chunks are the token ranges between boundaries
    * joined with " "; degenerate inputs produce [""] exactly like the
    * original (slice(fw, 1, 0) → concat_ws → ""). */
  def cdcChunks(text: UTF8String, window: Int, boundaryHexLt: Byte): GenericArrayData = {
    val tb = ownedBytes(if (text == null) UTF8String.EMPTY_UTF8 else text)
    // nonempty tokens: byte ranges
    val startsB = new java.util.ArrayList[Integer]()
    val endsB = new java.util.ArrayList[Integer]()
    var i = 0
    var s = 0
    while (i <= tb.length) {
      if (i == tb.length || tb(i) == ' ') {
        if (i > s) { startsB.add(s); endsB.add(i) }
        s = i + 1
      }
      i += 1
    }
    val nTok = startsB.size
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    i = 0
    while (i < nTok) { starts(i) = startsB.get(i); ends(i) = endsB.get(i); i += 1 }

    // boundary positions (1-based j): md5 of the window ending at token j
    val md = mdLocal.get()
    val bps = new java.util.ArrayList[Integer]()
    var j = window
    while (j <= nTok - 1) {
      md.reset()
      var w = j - window // 0-based first token of the window
      while (w < j) {
        if (w > j - window) md.update(' '.toByte)
        md.update(tb, starts(w), ends(w) - starts(w))
        w += 1
      }
      val firstByte = md.digest()(0) & 0xFF
      val hexChar = "0123456789abcdef".charAt(firstByte >> 4)
      if (hexChar < boundaryHexLt.toChar) bps.add(j)
      j += 1
    }

    // chunks: transform over 0..|bps| with start/end in 1-based token idx
    val nb = bps.size
    val out = new Array[AnyRef](nb + 1)
    var ci = 0
    while (ci <= nb) {
      val start1 = if (ci == 0) 1 else bps.get(ci - 1) + 1
      val end1 = if (ci < nb) bps.get(ci).intValue() else nTok
      if (end1 < start1 || nTok == 0) out(ci) = UTF8String.EMPTY_UTF8
      else {
        // tokens start1..end1 (1-based): nonempty tokens may be separated
        // by runs of spaces in the source, so reassemble with single spaces
        val sb = new java.io.ByteArrayOutputStream()
        var t = start1 - 1
        while (t < end1) {
          if (t > start1 - 1) sb.write(' ')
          sb.write(tb, starts(t), ends(t) - starts(t))
          t += 1
        }
        out(ci) = UTF8String.fromBytes(sb.toByteArray)
      }
      ci += 1
    }
    new GenericArrayData(out)
  }
}

/** Native fixed word-window chunk array (Spans.wordChunks' builder). */
case class WordChunkArr(child: Expression, chunkWords: Int) extends UnaryExpression {
  require(chunkWords >= 1, s"chunkWords $chunkWords")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ChunkKernel.wordChunks(input.asInstanceOf[UTF8String], chunkWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkKernel.wordChunks($c, $chunkWords);")
  override protected def withNewChildInternal(newChild: Expression): WordChunkArr =
    copy(child = newChild)
}

object WordChunkArr {
  def col(text: Column, chunkWords: Int): Column =
    GraftBridge.column(WordChunkArr(GraftBridge.expression(text), chunkWords))
}

/** Native content-defined chunk array (Spans.cdcChunks' builder). */
case class CdcChunkArr(child: Expression, window: Int, boundaryHexLt: Byte)
    extends UnaryExpression {
  require(window >= 2, s"window $window")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ChunkKernel.cdcChunks(input.asInstanceOf[UTF8String], window, boundaryHexLt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkKernel.cdcChunks($c, $window, (byte) $boundaryHexLt);")
  override protected def withNewChildInternal(newChild: Expression): CdcChunkArr =
    copy(child = newChild)
}

object CdcChunkArr {
  def col(text: Column, window: Int, boundaryHexLt: Char): Column =
    GraftBridge.column(CdcChunkArr(GraftBridge.expression(text), window,
      boundaryHexLt.toByte))
}
