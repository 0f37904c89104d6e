package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Kernels for the centroid-assignment / ADC-distance expressions.
  *
  * Float-arithmetic CONTRACT (these replace HOF chains whose results are
  * oracle-pinned, so summation order must be preserved exactly):
  *  - per-centroid d² accumulates dimension-by-dimension in index order
  *    starting from 0.0 — the `aggregate(zip_with(...), 0.0, +)` order;
  *  - the argmin compares with `Double.compare` (NaN greatest; d² ≥ 0 so
  *    ±0 cannot diverge) and keeps the EARLIER centroid on exact ties —
  *    the `array_min(struct(d², cid))` order;
  *  - ADC totals accumulate subspace-by-subspace, each subspace summed
  *    separately first — the `Seq(d²_s).reduce(_ + _)` association.
  */
object CentroidKernel {

  /** Index of the nearest centroid by squared Euclidean distance; ties →
    * smaller index. `flat` is k row-major centroids of `dim` doubles. */
  def nearest(vec: ArrayData, flat: Array[Double], k: Int, dim: Int): Int = {
    var best = 0
    var bestD = dist2(vec, flat, 0, dim)
    var c = 1
    while (c < k) {
      val d = dist2(vec, flat, c, dim)
      if (java.lang.Double.compare(d, bestD) < 0) { best = c; bestD = d }
      c += 1
    }
    best
  }

  private def dist2(vec: ArrayData, flat: Array[Double], c: Int, dim: Int): Double = {
    val n = math.min(dim, vec.numElements())
    val off = c * dim
    var d = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getDouble(i) - flat(off + i)
      d += x * x
      i += 1
    }
    d
  }

  /** Asymmetric (query-vs-quantized) squared distance: Σ_s ‖q_sub(s) −
    * books[s][code_s]‖², with per-subspace partial sums added in subspace
    * order. `flat` holds m·k·w doubles (subspace-major, then code, then
    * dim); `codes` is the row's m PQ codes. */
  def adcDist2(qv: ArrayData, codes: ArrayData, flat: Array[Double],
               m: Int, k: Int, w: Int): Double = {
    var total = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      val off = (s * k + code) * w
      val qoff = s * w
      var d = 0.0
      var i = 0
      while (i < w) {
        val x = qv.getDouble(qoff + i) - flat(off + i)
        d += x * x
        i += 1
      }
      total += d
      s += 1
    }
    total
  }
}

/** Native codegen'd argmin-over-centroids assignment — replaces the
  * interpreted `array_min(array(struct(aggregate(zip_with(...)))))` HOF
  * chain (Catalyst higher-order functions are CodegenFallback, so the old
  * shape paid interpreted lambda evaluation per row × centroid × dim on
  * every k-means assignment, PQ encode and SemDeDup labeling pass). */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "NearestCentroid: centroids must be non-empty and rectangular")

  @transient private lazy val dim = cents(0).length
  @transient private lazy val flat: Array[Double] = cents.flatten

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CentroidKernel.nearest(input.asInstanceOf[ArrayData], flat, cents.length, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CentroidKernel.nearest(" +
        s"$c, $ref, ${cents.length}, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def col(vec: Column, cents: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec), cents))
}

/** Native codegen'd PQ asymmetric distance (query vector vs a row's m
  * codes under literal codebooks) — replaces the per-row chain of m
  * interpreted `aggregate(zip_with(slice(...), element_at(...)))` HOFs in
  * the ADC top-k scan. */
case class AdcDist(left: Expression, right: Expression,
                   books: Array[Array[Array[Double]]])
    extends BinaryExpression {

  require(books.nonEmpty && books.forall(_.length == books(0).length),
    "AdcDist: ragged codebooks")

  @transient private lazy val m = books.length
  @transient private lazy val k = books(0).length
  @transient private lazy val w = books(0)(0).length
  @transient private lazy val flat: Array[Double] =
    books.flatten.flatten

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(qv: Any, codes: Any): Any =
    CentroidKernel.adcDist2(qv.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], flat, m, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bookFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.CentroidKernel.adcDist2(" +
        s"$q, $c, $ref, $m, $k, $w);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

object AdcDist {
  def col(qv: Column, codes: Column, books: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(AdcDist(GraftBridge.expression(qv),
      GraftBridge.expression(codes), books))
}
