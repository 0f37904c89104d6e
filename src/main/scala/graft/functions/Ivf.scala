package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** IVF (inverted-file) coarse quantizer: spherical k-means centroids fitted
  * deterministically on the driver, plus the cell-assignment kernel shared
  * by the expression's eval and codegen paths. Public-algorithm Lloyd's
  * iteration; cosine geometry (centroids L2-normalized each round) to match
  * the engine's cosine similarity ops. */
object Ivf {

  @inline private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) v else v.map(_ / n)
  }

  /** Fit `nCells` spherical k-means centroids on `sample` (seeded init from
    * the sample itself, `iters` Lloyd rounds, empty cells keep their
    * previous centroid). Deterministic in (sample order, seed). */
  def fit(sample: Array[Array[Double]], nCells: Int, iters: Int = 10,
          seed: Long = 0x1F5EEDL): Array[Array[Double]] = {
    require(sample.nonEmpty, "empty IVF training sample")
    val k = math.min(nCells, sample.length)
    val rng = new graft.fixture.Prng(seed)
    // seeded distinct-index init
    val idx = scala.collection.mutable.LinkedHashSet.empty[Int]
    while (idx.size < k) idx += rng.nextInt(sample.length)
    var cents = idx.toArray.map(i => normalize(sample(i).clone()))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(v, cents)
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) else normalize(sums(c))
      }
      it += 1
    }
    cents
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      val cent = cents(c)
      val m = math.min(v.length, cent.length)
      var d = 0
      while (d < m) { dot += v(d) * cent(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** The `nProbe` best cells for a vector, by centroid dot product,
    * descending. Entry point for generated code. */
  def topCells(v: ArrayData, cents: Array[Array[Double]],
               nProbe: Int): GenericArrayData = {
    val n = v.numElements()
    val dots = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var d = 0
      while (d < m) { dot += v.getDouble(d) * cent(d); d += 1 }
      dots(c) = dot
      c += 1
    }
    val k = math.min(nProbe, cents.length)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](cents.length)
    var r = 0
    while (r < k) {
      var best = -1
      var bd = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        if (!taken(i) && dots(i) > bd) { bd = dots(i); best = i }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: the `nProbe` nearest IVF cells (by centroid
  * dot product) of an array<double> vector. `nProbe = 1` is the assignment
  * kernel for building the inverted file; larger values are the query-side
  * multi-probe. Centroids ride along as a codegen reference object. */
case class IvfTopCells(child: Expression, centroids: Array[Array[Double]],
                       nProbe: Int) extends UnaryExpression {

  require(centroids.nonEmpty && nProbe >= 1, "bad IvfTopCells params")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Ivf.topCells(input.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Ivf.topCells($c, $ref, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfTopCells =
    copy(child = newChild)
}

object IvfTopCells {
  def col(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    GraftBridge.column(
      IvfTopCells(GraftBridge.expression(vec), centroids, nProbe))
}
