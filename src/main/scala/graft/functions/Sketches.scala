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
object Sketches {
  /** JVM twin of TextFns.tokenHash31 (first 15 hex chars of md5 as a
    * long, mod 2^31-1) — byte-identical to the column expression, so a
    * JVM-side sketch and a Spark-side probe expression index the same
    * cells. MessageDigest is not thread-safe → one per thread.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** JVM twin of TextFns.tokenHash (60-bit md5 prefix, no mod). The
    * first 15 hex chars are the first 7.5 digest bytes, i.e. the
    * big-endian 64-bit value of bytes 0-7 shifted right 4 — computed
    * directly (this sits in the per-token hot path of CountMin.reduce;
    * the hex round-trip costs ~50× the shift).
    */
  def tokenHash60(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }
  def tokenHash31(s: String): Long = tokenHash60(s) % TextFns.HashMod
}

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

/** Mergeable COUNT-MIN sketch (Cormode & Muthukrishnan 2005): a
  * depth × width counter matrix; add = +1 at (i, h_i(x)) for each of
  * the depth rows; point estimate = min over rows of the probed cell.
  * Merge is elementwise sum — associative AND commutative, so unlike
  * Misra-Gries the estimates are merge-order INDEPENDENT; they remain
  * hash-dependent, so the query surface stays rows-only like the other
  * sketch paths.
  *
  * Row hashes are the portable affine family the minhash permutations
  * use: h_i(x) = ((a_i·h61(x) + b_i) mod 2^31-1) mod width over the
  * 60-bit md5 token hash (Sketches.tokenHash31 — byte-identical to the
  * TextFns.tokenHash31 COLUMN expression, so a Spark-side probe
  * expression indexes the same cells the JVM-side build incremented;
  * asserted in SketchSpec).
  *
  * Guarantees (asserted in SketchSpec against exact counts):
  *  - est ≥ true count ALWAYS (counters only increase — one-sided);
  *  - est ≤ true + ε·n holds with probability 1−δ over hash draws
  *    (ε = e/width, δ = e^-depth); with this FIXED hash family the
  *    bound is measured on the corpus, not guaranteed.
  *
  * Scale shape: identical to MisraGries — map-side partials carry one
  * depth×width long array per group, the exchange moves kB per group,
  * the token universe never shuffles.
  */
final class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= DedupFns.NumHashes,
    s"depth must be in [1, ${DedupFns.NumHashes}] (one affine pair per row), got $depth")
  require(width >= 2, s"width must be >= 2, got $width")
  private val M = TextFns.HashMod

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(b: Array[Long], tok: String): Array[Long] = {
    val h = Sketches.tokenHash31(tok)
    var i = 0
    while (i < depth) {
      b(i * width + (((DedupFns.MinhashA(i) * h + DedupFns.MinhashB(i)) % M) % width).toInt) += 1L
      i += 1
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(m: Array[Long]): Array[Long] = m

  /** Point estimate for one key: min over rows of the probed cell —
    * the ONE place (besides the Column-side twin in q_cms_freq) that
    * knows the cell layout; streaming probes and tests go through
    * here so build and probe can never drift apart.
    */
  def estimate(counters: Array[Long], token: String): Long = {
    val h = Sketches.tokenHash31(token)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(
        i * width + (((DedupFns.MinhashA(i) * h + DedupFns.MinhashB(i)) % M) % width).toInt)
      if (c < best) best = c
      i += 1
    }
    best
  }

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
