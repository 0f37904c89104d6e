package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String entry points for the `TextSim` kernels, shared by the native
  * expressions' eval and codegen paths (same shape as `MinHash`). */
object TextSimKernel {
  def simhash64(text: UTF8String): Long =
    TextSim.simhash64(if (text == null) "" else text.toString)

  def fingerprintData(text: UTF8String): GenericArrayData =
    new GenericArrayData(
      TextSim.fingerprint(if (text == null) "" else text.toString))
}

/** Native Catalyst expression: 64-bit SimHash of a string column (word
  * unigram+bigram features, `TextSim.simhash64`). Replaces the round-2
  * ScalaUDF: codegen'd into the enclosing stage — no UDF wrapper, no
  * per-row encoder round-trip. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextSimKernel.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSimKernel.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def col(text: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(text)))
}

/** Native Catalyst expression: winnowing document fingerprint (array<long>,
  * `TextSim.fingerprint` — Schleimer et al. 2003 window minima). Replaces
  * the round-2 ScalaUDF with a codegen'd call. */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextSimKernel.fingerprintData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextSimKernel.fingerprintData($c);")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

object Fingerprint {
  def col(text: Column): Column =
    GraftBridge.column(Fingerprint(GraftBridge.expression(text)))
}
