package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native vector kernels for the ANN path.
  *
  * All are value-identical to the declarative quantized forms in
  * graft.functions.VectorFns (and therefore to the DuckDB oracle SQL):
  * components are quantized floor(x*1000) to exact integers, so dot
  * products and bucket signs are bit-stable across engines.
  *
  * Why custom Expressions: interpreted higher-order functions cost ~µs
  * per element-lambda with boxing; a 64-dim dot product becomes ~100µs.
  * These loops run the same arithmetic in primitive longs at ~0.1µs per
  * element — the difference between an ANN join that scales and one
  * that is 100× off baseline. CodegenFallback is acceptable: per-row
  * work dominates the single virtual call.
  */

/** floor(x*1000) quantization of a float vector → array<long>. */
case class QuantizeVec(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(arr.getFloat(i).toDouble * 1000).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Integer dot product of two pre-quantized array<long> vectors. */
case class QDot(left: Expression, right: Expression) extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDot =
    copy(left = l, right = r)
}

/** All `tables` LSH bucket ids of a pre-quantized vector in one pass:
  * bucket_t bit j = sign of sum_d qv(d) * (((t*131 + j*37 + d*17) mod 21) - 10).
  * Identical formula to VectorFns.lshBucketFor and the oracle SQL.
  */
case class LshBucketsExpr(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val qv = input.asInstanceOf[ArrayData]
    val dims = qv.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < planes) {
        val base = t * 131 + j * 37
        var dot = 0L
        var d = 0
        while (d < dims) {
          dot += qv.getLong(d) * ((base + d * 17) % 21 - 10)
          d += 1
        }
        if (dot >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}
