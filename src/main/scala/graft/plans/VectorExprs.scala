package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

private[plans] object TypeChecks {
  def requireArrayOf(what: String, elem: DataType, actual: DataType*): TypeCheckResult = {
    val bad = actual.filterNot {
      case ArrayType(e, _) => e == elem
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$what requires array<${elem.catalogString}> input, got ${bad.map(_.catalogString).mkString(", ")}")
  }
}

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
  * whole-stage codegen. checkInputDataTypes makes wrong-typed SQL input
  * (e.g. array<double> into graft_quantize) a clean analysis error
  * instead of silently mis-striding the unsafe array reads.
  */

/** floor(x*1000) quantization of a float vector → array<long>. */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_quantize", FloatType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.quantize(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.quantize($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Integer dot product of two pre-quantized array<long> vectors.
  * Null on mismatched lengths — identical to the declarative
  * zip_with-based qdot, where the shorter side pads with null and the
  * null propagates through the sum (a ragged vector must surface, not
  * silently rank with a partial score).
  */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_qdot", LongType, left.dataType, right.dataType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else Kernels.qdot(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.Kernels.qdot($a, $b);
      }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDot =
    copy(left = l, right = r)
}

/** All `tables` LSH bucket ids of a pre-quantized vector in one pass:
  * bucket_t bit j = sign of sum_d qv(d) * (((t*131 + j*37 + d*17) mod 21) - 10).
  * Identical formula to VectorFns.lshBucketFor and the oracle SQL.
  */
case class LshBucketsExpr(child: Expression, tables: Int, planes: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_lsh_buckets", LongType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Kernels.lshBuckets(input.asInstanceOf[ArrayData], tables, planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.lshBuckets($c, $tables, $planes)")
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}
