package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native LSH band keys from a MinHash signature — the former formulation
  * `transform(sequence(0, nBands-1), b -> struct(b, xxhash64(array_join(
  * transform(slice(sig, b*r+1, r), cast string), ","))))` is a
  * CodegenFallback HOF tree that stringifies every signature element and
  * allocates per band per row, measured at 27 executor-seconds for ONE
  * 5k-doc stage — the dominant cost of the MinHash-LSH family. This kernel
  * builds the identical "v1,v2,..,vr" string per band and hashes it with
  * Spark's own XXH64 at the xxhash64() default seed — band hashes are
  * bit-identical (law in NativeExprOptSpec). */
object BandKeyKernel {
  def bandKeys(sig: ArrayData, numHashes: Int, rowsPerBand: Int): GenericArrayData = {
    val nBands = numHashes / rowsPerBand
    val out = new Array[AnyRef](nBands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 21)
    var b = 0
    while (b < nBands) {
      sb.setLength(0)
      var j = 0
      while (j < rowsPerBand) {
        if (j > 0) sb.append(',')
        sb.append(sig.getLong(b * rowsPerBand + j))
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      out(b) = new GenericInternalRow(Array[Any](b, h))
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashBandKeys(child: Expression, numHashes: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
    s"bad band params numHashes=$numHashes rowsPerBand=$rowsPerBand")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("band_hash", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    BandKeyKernel.bandKeys(input.asInstanceOf[ArrayData], numHashes, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandKeyKernel.bandKeys($c, $numHashes, $rowsPerBand);")
  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashBandKeys {
  def col(sig: Column, numHashes: Int, rowsPerBand: Int): Column =
    GraftBridge.column(MinHashBandKeys(GraftBridge.expression(sig),
      numHashes, rowsPerBand))
}
