package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native vector kernels for the ANN path (loops in Kernels).
  *
  * All are value-identical to the declarative quantized forms in
  * graft.functions.VectorFns (and therefore to the DuckDB oracle SQL):
  * components are quantized floor(x*1000) to exact integers, so dot
  * products and bucket signs are bit-stable across engines.
  *
  * Why custom Expressions: interpreted higher-order functions cost ~µs
  * per element-lambda with boxing; a 64-dim dot product becomes ~100µs.
  * The kernels run the same arithmetic in primitive longs, and
  * doGenCode emits static kernel calls so projections stay inside
  * whole-stage codegen.
  */

/** floor(x*1000) quantization of a float vector → array<long>. */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.quantize(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.quantize($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Integer dot product of two pre-quantized array<long> vectors. */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.qdot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDot =
    copy(left = l, right = r)
}

/** All `tables` LSH bucket ids of a pre-quantized vector in one pass:
  * bucket_t bit j = sign of sum_d qv(d) * (((t*131 + j*37 + d*17) mod 21) - 10).
  * Identical formula to VectorFns.lshBucketFor and the oracle SQL.
  */
case class LshBucketsExpr(child: Expression, tables: Int, planes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.lshBuckets(input.asInstanceOf[ArrayData], tables, planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.lshBuckets($c, $tables, $planes)")
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}
