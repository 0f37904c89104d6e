package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: count of positions where two long arrays
  * hold the same value — the matching-element count of two MinHash
  * signatures (an unbiased Jaccard estimate once divided by length).
  * Replaces an interpreted `aggregate(zip_with(...))` chain on the
  * candidate-pruning hot path. */
case class MatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var m = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) m += 1
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.getLong($i) == $y.getLong($i)) $m++;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatchCount =
    copy(left = newLeft, right = newRight)
}

object MatchCount {
  def col(a: Column, b: Column): Column =
    GraftBridge.column(
      MatchCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Native Catalyst expression: total Hamming distance between two long-array
  * bit sketches (sum of popcounts of elementwise XOR). The estimate tier of
  * the hyperplane-LSH embedding paths. */
case class SketchHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var h = 0
    var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $h = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchHamming =
    copy(left = newLeft, right = newRight)
}

object SketchHamming {
  def col(a: Column, b: Column): Column =
    GraftBridge.column(
      SketchHamming(GraftBridge.expression(a), GraftBridge.expression(b)))
}
