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

  /** Whether a (resolved) input type can carry null elements — when it
    * can, the kernels' primitive reads are guarded by a
    * Kernels.hasNullElement pre-check that propagates null for the row
    * (matching declarative transform/zip_with null propagation); when
    * it cannot, the check is compiled out entirely.
    */
  def elemNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, cn) => cn
    case _ => true
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

/** floor(x*1000) quantization of a float vector → array<long>.
  * Null (whole row) on a null element, like the declarative transform.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_quantize", FloatType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)
  override def nullable: Boolean = child.nullable || elemNullable
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(a)) null else Kernels.quantize(a)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.Kernels.quantize($c);
        }
      """
      else s"${ev.value} = graft.plans.Kernels.quantize($c);")
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Integer dot product of two pre-quantized array<long> vectors.
  * Null on mismatched lengths — identical to the declarative
  * zip_with-based qdot, where the shorter side pads with null and the
  * null propagates through the sum (a ragged vector must surface, not
  * silently rank with a partial score). Null elements likewise
  * propagate null for the row.
  */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_qdot", LongType, left.dataType, right.dataType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  private def anyElemNullable: Boolean =
    TypeChecks.elemNullable(left.dataType) || TypeChecks.elemNullable(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() ||
        (anyElemNullable && (Kernels.hasNullElement(x) || Kernels.hasNullElement(y)))) null
    else Kernels.qdot(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nullElems =
        if (anyElemNullable)
          s" || graft.plans.Kernels.hasNullElement($a) || graft.plans.Kernels.hasNullElement($b)"
        else ""
      s"""
      if ($a.numElements() != $b.numElements()$nullElems) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.Kernels.qdot($a, $b);
      }
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDot =
    copy(left = l, right = r)
}

/** 64-bit sign code of a pre-quantized array<long> vector: bit d set
  * iff component d ≥ 0. Null (whole row) on a null element.
  */
case class SignBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_sign_bits", LongType, child.dataType)
  override def dataType: DataType = LongType
  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)
  override def nullable: Boolean = child.nullable || elemNullable
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(a)) null else Kernels.signBits(a)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.Kernels.signBits($c);
        }
      """
      else s"${ev.value} = graft.plans.Kernels.signBits($c);")
  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

/** Element-wise difference of two pre-quantized array<long> vectors —
  * the IVF-PQ residual (vector − its cell centroid). Null on mismatched
  * lengths / null elements, mirroring QDot's contract.
  */
case class VecSub(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_vsub", LongType, left.dataType, right.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  private def anyElemNullable: Boolean =
    TypeChecks.elemNullable(left.dataType) || TypeChecks.elemNullable(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() ||
        (anyElemNullable && (Kernels.hasNullElement(x) || Kernels.hasNullElement(y)))) null
    else Kernels.vsub(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nullElems =
        if (anyElemNullable)
          s" || graft.plans.Kernels.hasNullElement($a) || graft.plans.Kernels.hasNullElement($b)"
        else ""
      s"""
      if ($a.numElements() != $b.numElements()$nullElems) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.Kernels.vsub($a, $b);
      }
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSub =
    copy(left = l, right = r)
}

/** Count of positions where two equal-length array<long> columns hold
  * the same value — the MinHash signature-agreement numerator. Null on
  * mismatched lengths / null elements, mirroring QDot's contract.
  */
case class LongArrayEqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_eq_count", LongType, left.dataType, right.dataType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  private def anyElemNullable: Boolean =
    TypeChecks.elemNullable(left.dataType) || TypeChecks.elemNullable(right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() ||
        (anyElemNullable && (Kernels.hasNullElement(x) || Kernels.hasNullElement(y)))) null
    else Kernels.eqCount(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nullElems =
        if (anyElemNullable)
          s" || graft.plans.Kernels.hasNullElement($a) || graft.plans.Kernels.hasNullElement($b)"
        else ""
      s"""
      if ($a.numElements() != $b.numElements()$nullElems) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.Kernels.eqCount($a, $b);
      }
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongArrayEqCount =
    copy(left = l, right = r)
}

/** All `tables` LSH bucket ids of a pre-quantized vector in one pass:
  * bucket_t bit j = sign of sum_d qv(d) * (((t*131 + j*37 + d*17) mod 21) - 10).
  * Identical formula to VectorFns.lshBucketFor and the oracle SQL.
  */
/** IVF probe list: the `nprobe` centroid indexes nearest (exact integer
  * squared L2, index tiebreak) to a pre-quantized vector. `centroids`
  * is a literal array<array<long>> — broadcast by value inside the
  * plan, so centroid assignment is a MAP-ONLY projection: no join, no
  * shuffle, no explode against a centroid table. This is the 100 TB IVF
  * shape — assignment cost is N×k multiply-adds, embarrassingly
  * parallel, and candidates then flow through a plain equi-join on the
  * centroid id.
  */
case class IvfProbesExpr(vec: Expression, centroids: Expression, nprobe: Int)
    extends BinaryExpression {
  require(nprobe >= 1, s"graft_ivf_probes needs nprobe >= 1, got $nprobe")
  override def left: Expression = vec
  override def right: Expression = centroids
  override def checkInputDataTypes(): TypeCheckResult = {
    val v = TypeChecks.requireArrayOf("graft_ivf_probes", LongType, vec.dataType)
    if (v != TypeCheckResult.TypeCheckSuccess) v
    else centroids.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_ivf_probes requires array<array<bigint>> centroids, got ${other.catalogString}")
    }
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def elemNullable: Boolean = TypeChecks.elemNullable(vec.dataType)
  // always nullable: the kernel returns null for null/ragged centroids
  // (QDot's mis-shaped-input contract) regardless of input nullability
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any, c: Any): Any = {
    val qv = v.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(qv)) null
    else Kernels.ivfProbes(qv, c.asInstanceOf[ArrayData], nprobe)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val guard =
        if (elemNullable) s"graft.plans.Kernels.hasNullElement($v) ? null : " else ""
      s"""
      ${ev.value} = $guard graft.plans.Kernels.ivfProbes($v, $c, $nprobe);
      ${ev.isNull} = ${ev.value} == null;
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IvfProbesExpr =
    copy(vec = l, centroids = r)
}

case class LshBucketsExpr(child: Expression, tables: Int, planes: Int) extends UnaryExpression {
  require(tables >= 1, s"graft_lsh_buckets needs tables >= 1, got $tables")
  require(planes >= 1 && planes <= 63,
    s"graft_lsh_buckets needs planes in [1, 63] (bucket id is a long), got $planes")
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_lsh_buckets", LongType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)
  override def nullable: Boolean = child.nullable || elemNullable
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(a)) null
    else Kernels.lshBuckets(a, tables, planes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.Kernels.lshBuckets($c, $tables, $planes);
        }
      """
      else s"${ev.value} = graft.plans.Kernels.lshBuckets($c, $tables, $planes);")
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

/** Flat covariance/Gram sufficient statistics of one pre-quantized
  * array<long> vector (Kernels.outerMoments): the d(d+1)/2
  * upper-triangle products x_i·x_j followed by the d components — the
  * map-side emit of a distributed PCA/whitening prep pass. Input
  * element nulls propagate null for the row (same as the declarative
  * nested-transform form would).
  */
case class OuterMoments(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_outer_moments", LongType, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)
  override def nullable: Boolean = child.nullable || elemNullable
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(a)) null
    else Kernels.outerMoments(a)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.Kernels.outerMoments($c);
        }
      """
      else s"${ev.value} = graft.plans.Kernels.outerMoments($c);")
  override protected def withNewChildInternal(newChild: Expression): OuterMoments =
    copy(child = newChild)
}

/** PQ/ADC distance table (Kernels.pqDistTable): the m·k integer
  * ‖subvec − code‖² entries of one query vector against the flattened
  * codebook literal, in ONE runtime loop. Exists because the
  * declarative array(...512 unrolled d² entries...) projection
  * generated a class past janino's limits at k=64 and Spark silently
  * fell back to interpreted eval — a ~60× cliff on the exact plan the
  * two-level/PQ production settings run (VERDICT r14 item 1). The
  * codebook rides as a plan literal exactly like IvfProbesExpr's
  * centroids: DATA in the plan is fine — it was the unrolled CODE
  * that broke codegen.
  */
case class PqDistTableExpr(vec: Expression, codebook: Expression, m: Int, k: Int)
    extends BinaryExpression {
  require(m >= 1 && k >= 1, s"graft_pq_dist_table needs m, k >= 1, got m=$m k=$k")
  override def left: Expression = vec
  override def right: Expression = codebook
  override def checkInputDataTypes(): TypeCheckResult = {
    val v = TypeChecks.requireArrayOf("graft_pq_dist_table", LongType, vec.dataType)
    if (v != TypeCheckResult.TypeCheckSuccess) v
    else codebook.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_dist_table requires array<array<bigint>> codebook, got ${other.catalogString}")
    }
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private def elemNullable: Boolean = TypeChecks.elemNullable(vec.dataType)
  // always nullable: the kernel returns null for a mis-shaped codebook
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any, c: Any): Any = {
    val qv = v.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(qv)) null
    else Kernels.pqDistTable(qv, c.asInstanceOf[ArrayData], m, k)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val guard =
        if (elemNullable) s"graft.plans.Kernels.hasNullElement($v) ? null : " else ""
      s"""
      ${ev.value} = $guard graft.plans.Kernels.pqDistTable($v, $c, $m, $k);
      ${ev.isNull} = ${ev.value} == null;
    """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqDistTableExpr =
    copy(vec = l, codebook = r)
}

/** Earlier-table LSH collision test (report-once-at-min-table pair
  * emission, VectorFns.cosineCandidates): TRUE iff the two bucket
  * arrays share an equal value at any index below `tbl`. A pair
  * meeting at table t is kept only when this is FALSE — each
  * colliding pair then surfaces exactly once, replacing the
  * (id_a, id_b) dedup shuffle with a row-local primitive loop.
  * Native because it sits on the candidate-pair hot path (~256·n rows
  * at auto-sized planes): the declarative exists(arrays_zip(slice…))
  * form is interpreted and allocates two arrays per pair — measured
  * as the dominant cost of the sf10 q_cosine_bands pass (round 14).
  */
case class EarlierCollision(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val arr = TypeChecks.requireArrayOf("graft_earlier_collision", LongType,
      first.dataType, second.dataType)
    if (arr != TypeCheckResult.TypeCheckSuccess) arr
    else if (third.dataType != org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_earlier_collision requires an int table index, got ${third.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable
  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    Kernels.earlierCollision(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      t.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, t) =>
      s"${ev.value} = graft.plans.Kernels.earlierCollision($a, $b, $t);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): EarlierCollision =
    copy(first = newFirst, second = newSecond, third = newThird)
}
