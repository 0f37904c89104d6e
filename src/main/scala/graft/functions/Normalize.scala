package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String entry point shared by eval and codegen (the
  * [[TextSimKernel]] shape). */
object NormalizeKernel {
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text // fast path: ASCII and already-composed text copies nothing
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical pre-dedup/pre-hash step (decomposed "e"+U+0301
  * and composed "é" must hash identically or every exact/near/span/window
  * dedup silently misses visually-identical duplicates). Spark has no
  * built-in for this, so per the extension preference order this is a
  * custom codegen'd `Expression` (not a Scala UDF): the JDK Normalizer
  * call inlines into whole-stage codegen with an isNormalized fast path
  * that never allocates on already-NFC (i.e. almost all) input.
  * Cross-engine oracle: DuckDB's `nfc_normalize` (both implement Unicode
  * NFC; parity gated in `q_docs_normalize`). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NormalizeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeKernel.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def col(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
