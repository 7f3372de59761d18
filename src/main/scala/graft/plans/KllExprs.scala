package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile sketches (Karnin, Lang & Liberty, FOCS'16)
  * over the DataSketches library Spark itself ships for its HLL
  * functions — the QUANTILES member of the mergeable-sketch family
  * next to HLL (distinct), Misra-Gries (heavy hitters) and Count-Min
  * (frequency): per-group sketches aggregate map-side into ~kB
  * buffers, merge associatively at any rollup level, and answer any
  * quantile afterwards — the way percentiles ship at 100 TB, where an
  * exact global sort per regrouping is not an option.
  *
  * Modeled line-for-line on Spark's own HllSketchAgg/HllUnionAgg
  * TypedImperativeAggregate pair (datasketchesAggregates.scala in the
  * public Spark source): the buffer is the live heap sketch object,
  * serialized only at shuffle boundaries.
  *
  * KLL compaction is randomized (the library's documented design), so
  * sketch BYTES and estimates are not run-deterministic: the
  * oracle-checked contract of any query built on these is exact
  * integers plus rank-error-band booleans (the q_hll_rollup /
  * q_heavy_hitters pattern); per-estimate accuracy is asserted in
  * SketchSpec against exact ranks.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression]
  with ImplicitCastInputTypes {
  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "graft_kll_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  // Analysis-time type contract (Spark's HllSketchAgg pattern): an
  // implicit Cast to double is inserted for numeric args, and a
  // wrong-typed arg (binary, string) fails analysis instead of
  // ClassCastException-ing inside executors at runtime.
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, input: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union-merge of serialized KLL sketches — the rollup step: per-group
  * sketch binaries combine into one sketch without touching the raw
  * values again (HllUnionAgg's role for quantiles).
  */
case class KllUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression]
  with ImplicitCastInputTypes {
  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def prettyName: String = "graft_kll_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  // Serialized-sketch input only; non-binary args fail analysis.
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, input: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(input)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** Quantile probe of a serialized KLL sketch at a fixed rank.
  * CodegenFallback is deliberate: this evaluates on the already-
  * aggregated (groups-sized) frame, never in a per-row hot path.
  */
case class KllQuantile(child: Expression, rank: Double)
  extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  require(rank >= 0.0 && rank <= 1.0, s"rank must be in [0, 1], got $rank")

  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override protected def nullSafeEval(bytes: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank)
  }
  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(child = newChild)
}
