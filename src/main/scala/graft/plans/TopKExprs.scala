package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded mergeable TOP-K buffer: the k best (score, id) pairs under
  * the total order (score DESC, id ASC). Insertion replaces the
  * current worst only when the candidate beats it — O(k) per row with
  * k small (5–100), zero allocation on the hot path.
  */
final class TopKBuf(val k: Int) {
  val scores = new Array[Long](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def beats(s: Long, i: Long, s2: Long, i2: Long): Boolean =
    s > s2 || (s == s2 && i < i2)

  def insert(s: Long, i: Long): Unit = {
    if (n < k) { scores(n) = s; ids(n) = i; n += 1 }
    else {
      var w = 0
      var j = 1
      while (j < n) { if (beats(scores(w), ids(w), scores(j), ids(j))) w = j; j += 1 }
      if (beats(s, i, scores(w), ids(w))) { scores(w) = s; ids(w) = i }
    }
  }

  /** Entries ordered best-first — the final ranking. */
  def sorted: Array[(Long, Long)] =
    (0 until n).map(j => (scores(j), ids(j))).toArray
      .sortBy { case (s, i) => (-s, i) }
}

/** Mergeable top-k aggregation: keeps the k largest (score, id) pairs
  * per group under (score DESC, id ASC) — the 100 TB replacement for
  * `row_number().over(partitionBy(g).orderBy(score.desc, id)) <= k`
  * on an EXPANDED candidate frame. The window form must shuffle and
  * SORT every candidate row (the q_knn_hubs stage ledger measured a
  * ~10 GB sort spill on the n·√n candidate frame at sf10); this
  * aggregate reduces map-side to one ≤k-entry buffer per (task,
  * group), so the exchange moves O(groups · k) entries and nothing is
  * ever sorted but the final ≤k rows per group. Top-k selection under
  * a TOTAL order is associative, commutative and duplicate-free per
  * candidate, so the result is bit-identical to the window form for
  * ANY partial/merge schedule — asserted against the window in
  * TopKAggSpec and by the unchanged DuckDB oracles of every consumer.
  *
  * For an ASCENDING metric (nearest = smallest distance), negate the
  * score: (-d DESC, id ASC) == (d ASC, id ASC); distances are
  * non-negative so the negation never wraps.
  *
  * Output: array<struct<score, id>> ordered best-first (rank = 1 +
  * array position after posexplode).
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression]
  with ImplicitCastInputTypes {
  require(k >= 1 && k <= 4096, s"top-k k must be in [1, 4096], got $k")

  // update() reads both args as Long: a typed input contract makes a
  // wrong-typed score/id fail ANALYSIS (numeric args implicitly cast)
  // instead of throwing ClassCastException inside executors, and pins
  // the output id type to LongType explicitly — the same contract the
  // KLL surface carries (KllExprs.scala).
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def prettyName: String = "graft_topk_pairs"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buffer: TopKBuf, input: InternalRow): TopKBuf = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuf, other: TopKBuf): TopKBuf = {
    var j = 0
    while (j < other.n) { buffer.insert(other.scores(j), other.ids(j)); j += 1 }
    buffer
  }

  override def eval(buffer: TopKBuf): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var j = 0
    while (j < buffer.n) { bb.putLong(buffer.scores(j)); bb.putLong(buffer.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var j = 0
    while (j < n) { buf.insert(bb.getLong, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}
