package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static random-hyperplane LSH kernel shared by eval and codegen. */
object HyperplaneLsh {
  /** Deterministic plane coefficients: plane p, dim d → centered splitmix
    * hash in [-0.5, 0.5). The default seed gives the same family at every
    * call site (bucket keys comparable across queries); pass a distinct
    * seed for an independent family (e.g. estimate sketches that must not
    * share planes with the bucketing bands). */
  def planes(dim: Int, nPlanes: Int, seed: Long = 0x1A5B3CL): Array[Array[Double]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val h = graft.fixture.Prng.derive(seed, p.toLong, d.toLong).nextLong()
        Math.floorMod(h, 1000000L) / 1000000.0 - 0.5
      }
    }

  /** Band keys: element b = the sign bits of planes [b·r, (b+1)·r) against
    * `v` packed into a long. One fused pass over all planes. */
  def bandKeys(v: ArrayData, coeffs: Array[Array[Double]],
               bands: Int, rowsPerBand: Int): GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rowsPerBand) {
        val plane = coeffs(b * rowsPerBand + r)
        val m = math.min(n, plane.length)
        var dot = 0.0
        var d = 0
        while (d < m) { dot += v.getDouble(d) * plane(d); d += 1 }
        if (dot >= 0) key |= (1L << r)
        r += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: banded random-hyperplane LSH keys
  * (array<long>, one key per band) for an array<double> embedding. Replaces
  * a bands×rowsPerBand stack of interpreted `aggregate(zip_with(...))` HOF
  * dot products with one fused codegen'd loop. */
case class HyperplaneBands(child: Expression, dim: Int, bands: Int,
                           rowsPerBand: Int, seed: Long = 0x1A5B3CL)
    extends UnaryExpression {

  require(dim >= 1 && bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 63,
    s"bad HyperplaneBands params dim=$dim b=$bands r=$rowsPerBand")

  @transient private lazy val coeffs: Array[Array[Double]] =
    HyperplaneLsh.planes(dim, bands * rowsPerBand, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HyperplaneLsh.bandKeys(input.asInstanceOf[ArrayData], coeffs, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", coeffs, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneLsh.bandKeys($c, $ref, $bands, $rowsPerBand);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {
  def col(vec: Column, dim: Int, bands: Int, rowsPerBand: Int,
          seed: Long = 0x1A5B3CL): Column =
    GraftBridge.column(
      HyperplaneBands(GraftBridge.expression(vec), dim, bands, rowsPerBand, seed))
}
