package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MISRA-GRIES heavy-hitters summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012)
  * — the constant-memory alternative to exact token counting when the
  * distinct universe is unbounded (URLs, n-grams, user agents at
  * 100 TB). k counters per GROUP regardless of input size:
  *
  *  - every item with true frequency > n/k is guaranteed present;
  *  - every reported count undercounts its true frequency by ≤ n/k
  *    (n = group's stream length).
  *
  * Both bounds are asserted against exact counts in SketchSpec. The
  * reduce step is the classic decrement-all-on-miss; the merge step
  * sums counters and rebases by the (k+1)-th largest, which preserves
  * the error bound under ANY merge tree — exactly what Spark's
  * partial-aggregate (ObjectHashAggregate) execution needs: map-side
  * partials of k counters, one shuffle of k-entry maps per group, no
  * per-token shuffle at all. Estimates depend on merge order, so the
  * query surface is rows-only (no cross-engine oracle), like the
  * HLL++/GK sketch paths.
  */
final class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k >= 1, s"need at least one counter, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c)            => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      case None               => b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (m.size <= k) m
    else {
      // rebase by the (k+1)-th largest count: ≤ k counters survive and
      // the total decrement stays within the summed error budgets
      val d = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) => if (c > d) Some(t -> (c - d)) else None }
    }
  }

  def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (t, c) => (-c, t) }

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
