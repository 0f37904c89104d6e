package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[TrigramCodes]]: every consecutive CODE-POINT trigram of a
  * string packed into one long — cp1·2⁴² | cp2·2²¹ | cp3 (code points are
  * ≤ 0x10FFFF < 2²¹, so the packing is bijective: code equality ⇔ trigram
  * equality, exactly). Replaces the HOF `transform(sequence, substr(i, 3))`
  * string-trigram explode in the LM self-scorer: one 8-byte long per
  * occurrence instead of a small string, no per-trigram allocation, and
  * downstream joins/aggregations key on longs. Code-point semantics match
  * Spark's `length`/`substr` (both count code points), so the trigram SET
  * is identical to the string formulation's. */
object TrigramCodesKernel {
  private val empty = new GenericArrayData(Array.emptyLongArray)

  def codes(text: UTF8String): GenericArrayData = {
    val t = if (text == null) "" else text.toString
    val len = t.length
    val n = t.codePointCount(0, len)
    if (n < 3) return empty
    val cps = new Array[Int](n)
    var i = 0
    var j = 0
    while (i < len) {
      val cp = t.codePointAt(i)
      cps(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    val out = new Array[Long](n - 2)
    var p = 0
    while (p < n - 2) {
      out(p) = (cps(p).toLong << 42) | (cps(p + 1).toLong << 21) | cps(p + 2).toLong
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd expression: packed code-point trigram codes
  * (array<long>) of a string column; texts shorter than 3 code points
  * yield an empty array (same convention as the string triArr). */
case class TrigramCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TrigramCodesKernel.codes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TrigramCodesKernel.codes($c);")

  override protected def withNewChildInternal(newChild: Expression): TrigramCodes =
    copy(child = newChild)
}

object TrigramCodes {
  def col(text: Column): Column =
    GraftBridge.column(TrigramCodes(GraftBridge.expression(text)))
}
