package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stream-shaped joins re-expressed for a distributed batch/streaming
  * engine.
  */
object Joins {

  /** Windowed stream-stream inner join (reference src/join.rs:21-141
    * `inner_join_streams`): match records sharing a key whose event
    * times differ by strictly less than `windowMicros` (reference
    * src/lib.rs:39-42 `within_window`).
    *
    * Scale design: a bare `abs(tsL-tsR) < W` predicate on top of a key
    * equi-join is already hash-partitioned by key, but a hot key joins
    * across all time. We additionally bucket time into `W`-wide epochs
    * and explode the right side into its bucket ±1 — candidates are
    * then co-located by (key, bucket), bounding per-task fan-in. Each
    * qualifying pair appears exactly once (left keeps one bucket).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      windowMicros: Long
  ): DataFrame = {
    val l = left.withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bucket", floor(col("__lus") / windowMicros))
    val r = right.withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__bucket", explode(array(
        floor(col("__rus") / windowMicros) - 1,
        floor(col("__rus") / windowMicros),
        floor(col("__rus") / windowMicros) + 1)))
    l.join(
        r,
        l(leftKey) === r(rightKey) && l("__bucket") === r("__bucket") &&
          abs(l("__lus") - r("__rus")) < windowMicros,
        "inner")
      .drop("__bucket", "__lus", "__rus")
  }

  /** Stream-table enrichment join (reference src/join.rs:143-157
    * `join_stream_table`): look each stream record up against a
    * dimension snapshot. The dim is broadcast — no shuffle of the fact
    * side, the 100 TB-correct plan for small/medium dims.
    */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String, dimKey: String, joinType: String = "inner"): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), joinType)

  /** Salted equi-join for skewed keys: the fact side spreads each hot
    * key across `salt` sub-keys deterministically (positional hash of a
    * unique column), the dim side replicates each row `salt` times —
    * per-task fan-in for a hot key drops by ~`salt`×. Output rows are
    * identical to the plain join (spread+replicate pairs each fact row
    * with exactly one dim copy). AQE's skew-join handles moderate skew
    * automatically; explicit salting is for the pathological keys AQE
    * splits can't fix (one key ≫ one executor's memory).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      uniqueFactCol: String,
      salt: Int = 16
  ): DataFrame = {
    // xxhash64 salts ANY column type; a raw numeric cast would throw on
    // strings under ANSI mode (or null out and silently drop every row)
    val f = fact.withColumn("__salt", pmod(xxhash64(col(uniqueFactCol)), lit(salt.toLong)).cast("int"))
    val d = dim.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"), "inner")
      .drop("__salt")
  }

  /** As-of join: for each left record, the latest right record with
    * `rightTs <= leftTs` on the same key. Natural extension of the
    * reference's stream-table join to bitemporal lookup.
    *
    * Implemented with the union-merge trick: tag both sides, union,
    * then `last(payload, ignoreNulls)` over a per-key time-ordered
    * window — one shuffle + one sort, no per-row subquery, no range
    * cross-join. Ties on rightTs resolve to the largest `rightOrder`.
    *
    * Returns the left rows plus `rightPayload` columns (null when no
    * right record precedes).
    */
  /** RANGE-LOOKUP JOIN via bucket decomposition: enrich each fact row
    * with the range row(s) whose [lo, hi] contains its value — the
    * IP-range / tier-table / geo-band lookup shape. Spark's native
    * plan for a pure range-predicate join is BroadcastNestedLoopJoin
    * (every fact row probes every range — quadratic, and the dim may
    * not even fit broadcast at production range-table sizes).
    * Decomposing into fixed-width buckets makes it an EQUI-join:
    *
    *  - each range explodes to the buckets it covers (a range of
    *    length L costs ~L/width + 1 rows — width is the fan-out knob;
    *    set it near the median range length);
    *  - each fact row computes its bucket MAP-ONLY;
    *  - candidates meet on an equi-join on bucket, and the exact
    *    BETWEEN refine keeps only true containments (a fact row
    *    matches each containing range exactly once, because its one
    *    bucket meets a covering range exactly once).
    *
    * Overlapping ranges yield one output row per containing range
    * (lookup semantics decide policy upstream); values outside every
    * range drop (inner). Floor-division bucketing ((v − pmod(v, w))
    * div w) keeps negative values correct — truncating div would
    * split bucket −0/+0.
    */
  def bucketedRangeJoin(fact: DataFrame, valueCol: String,
      ranges: DataFrame, loCol: String, hiCol: String, width: Long): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1, got $width")
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(width))) / lit(width)).cast("long")
    val r = ranges.withColumn("__b",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    fact.withColumn("__b", bucketOf(col(valueCol)))
      .join(r, Seq("__b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__b")
  }

  /** INTERVAL-OVERLAP JOIN via grid bucketing: emit each (left, right)
    * pair whose closed intervals [lLo,lHi] and [rLo,rHi] intersect —
    * the temporal/spatial overlap shape (co-presence, reservation
    * conflicts, 1-D spatial join). Like [[bucketedRangeJoin]] this
    * avoids the BroadcastNestedLoopJoin a bare overlap predicate plans
    * to, but here BOTH sides are intervals, so both explode onto a
    * fixed-width grid and candidates meet on an equi-join on the cell.
    *
    * A pair intersecting k shared cells would naively emit k times;
    * instead of a distinct (an extra full-output shuffle) each pair is
    * emitted ONCE via the report-once rule: only in the cell containing
    * `max(lLo, rLo)` — a cell both bucket ranges provably cover exactly
    * when the intervals overlap. Per-task fan-in is bounded by cell
    * population × cell span, tunable via `width` (set near the median
    * interval length; longer intervals cost ~len/width+1 candidate
    * rows). Column names must be disjoint across the two inputs.
    */
  def intervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String, width: Long): DataFrame = {
    require(width >= 1, s"grid width must be >= 1, got $width")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both sides have: ${dup.mkString(",")}")
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(width))) / lit(width)).cast("long")
    val l = left.withColumn("__b",
      explode(sequence(bucketOf(col(lLo)), bucketOf(col(lHi)))))
    val r = right.withColumn("__b",
      explode(sequence(bucketOf(col(rLo)), bucketOf(col(rHi)))))
    l.join(r, Seq("__b"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(bucketOf(greatest(col(lLo), col(rLo))) === col("__b"))
      .drop("__b")
  }

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightOrder: String,
      rightPayload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payType = org.apache.spark.sql.types.StructType(
      right.select(rightPayload.map(col).toIndexedSeq: _*).schema.fields)
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__ord", lit(null).cast("long"))
      .withColumn("__pay", lit(null).cast(payType))
    val r = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__ord", col(rightOrder).cast("long"))
      .withColumn("__pay", struct(rightPayload.map(col).toIndexedSeq: _*))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__k"), col("__t"), col("__side"), col("__ord"), col("__pay"))).toIndexedSeq: _*)
    val unioned = l.select((leftCols.map(col) ++
      Seq(col("__k"), col("__t"), col("__side"), col("__ord"), col("__pay"))).toIndexedSeq: _*)
      .unionByName(r)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightPayload.map(c => col(s"__match.`$c`").as(c))).toIndexedSeq: _*)
  }

  /** FORWARD as-of join, optionally tolerance-bounded: for each left
    * row, the FIRST right record at-or-after leftTs for the same key
    * (>= semantics — a right row at the exact left timestamp matches),
    * nulled out when the gap exceeds `toleranceUs`. Same union-merge
    * shape as asofJoin: one shuffle on the key, one per-key sort, a
    * `first(ignoreNulls)` over the FOLLOWING frame — no range join, no
    * per-row subquery, no cross-join. Ties on rightTs resolve to the
    * smallest `rightOrder`. Timestamps may be TimestampType (compared
    * in epoch micros) or any numeric.
    *
    * Returns the left rows plus `rightPayload` columns and
    * `match_ts_us` (all null when nothing follows within tolerance).
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightOrder: String,
      rightPayload: Seq[String],
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payType = org.apache.spark.sql.types.StructType(
      right.select(rightPayload.map(col).toIndexedSeq: _*).schema.fields)
    def us(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case _: org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", us(left, leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__ord", lit(null).cast("long"))
      .withColumn("__pay", lit(null).cast(payType))
    val r = right
      .withColumn("__k", col(rightKey)).withColumn("__t", us(right, rightTs))
      .withColumn("__side", lit(1))
      .withColumn("__ord", col(rightOrder).cast("long"))
      .withColumn("__pay", struct(rightPayload.map(col).toIndexedSeq: _*))
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__k"), col("__t"), col("__side"), col("__ord"), col("__pay"))).toIndexedSeq: _*)
    val unioned = l.select((leftCols.map(col) ++
      Seq(col("__k"), col("__t"), col("__side"), col("__ord"), col("__pay"))).toIndexedSeq: _*)
      .unionByName(r)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("__match", first(col("__pay"), ignoreNulls = true).over(w))
      .withColumn("__mt", first(when(col("__side") === 1, col("__t")), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val inTol = toleranceUs match {
      case Some(tol) => col("__mt").isNotNull && col("__mt") - col("__t") <= tol
      case None      => col("__mt").isNotNull
    }
    matched
      .select((leftCols.map(col) ++
        rightPayload.map(c => when(inTol, col(s"__match.`$c`")).as(c)) :+
        when(inTol, col("__mt")).as("match_ts_us")).toIndexedSeq: _*)
  }

  /** SWEEP-LINE per-key overlap totals (round 15 — the pair-free form
    * of [[intervalOverlapJoin]] aggregation): for each key, the number
    * of OTHER-key closed intervals its own intervals intersect and the
    * total intersection length — WITHOUT generating a single pair row.
    * The grid join's candidate volume is Σ_cells |a|·|b| (measured
    * 10,000× per 100× data on the co-presence shape: the join output
    * IS the cost, no matter what aggregates it); this operator is
    * O(S log S) in the INTERVAL count:
    *
    *  - overlap COUNT per interval s: #{t : lo_t ≤ hi_s} −
    *    #{t : hi_t < lo_s} − 1 — two rank lookups, each one bucketed
    *    running sum over a (value, probe) union frame;
    *  - overlap LENGTH per interval s: ∫over [lo_s, hi_s] of
    *    (A(t) − 1) dt where A = number of active intervals — via the
    *    prefix integral F(t) = ∫A computed once over the ±1 endpoint
    *    timeline, so the per-interval answer is F(hi)−F(lo)−(hi−lo).
    *    Point intersections contribute 0 to the integral exactly as
    *    `least(hi)−greatest(lo)` does for touching pairs.
    *
    * REQUIRES each key's own intervals pairwise disjoint (true for
    * gap-sessionized sessions: consecutive sessions are ≥gap apart) —
    * that is what makes "minus itself" and the (A−1) integral exact
    * per-key arithmetic: an own-key overlap would be counted as an
    * "other" interval by both, SILENTLY inflating that key's totals.
    * The precondition is therefore CHECKED by default
    * (`checkDisjoint = true`): closed intervals, so any own-key lo ≤
    * the MAX preceding own-key hi (lo-sorted within the key — the max,
    * not lag(hi), so an overlap hiding behind a long earlier interval
    * is caught too) is a violation and fails loudly — one
    * key-partitioned window + a LIMIT-1 probe over the
    * already-checkpointed interval frame, interval-sized like
    * everything else here. Callers that guarantee disjointness
    * structurally (gap sessionization does) may pass false to skip the
    * extra pass. NULL keys are dropped up front on BOTH the event and
    * probe roles (ADVICE r15): the pair-join semantics this operator
    * replaces never count a NULL-key interval on either side, so
    * counting its endpoints in the rank sums / active-count integral
    * while excluding it as a probe would inflate every other key.
    *
    * Every running sum is the TWO-PHASE bucketed
    * form (within-`width`-bucket window + a bucket-count-sized offset
    * frame), so no global single-partition sort ever materializes;
    * exchanges are interval-sized, never pair-sized.
    */
  def sweepLineOverlapTotals(intervals: DataFrame, keyCol: String,
      loCol: String, hiCol: String, width: Long = 3600000000L,
      checkDisjoint: Boolean = true): DataFrame = {
    require(width >= 1, s"bucket width must be >= 1, got $width")
    val sess = intervals
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("__key"), col(loCol).as("__lo"), col(hiCol).as("__hi"))
      .localCheckpoint(true)
    if (checkDisjoint) {
      val wk = Window.partitionBy(col("__key")).orderBy(col("__lo"), col("__hi"))
      val bad = sess.withColumn("__ph", max(col("__hi")).over(
          wk.rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("__ph").isNotNull && col("__lo") <= col("__ph"))
        .limit(1).collect()
      require(bad.isEmpty, {
        val r = bad.head
        s"sweepLineOverlapTotals requires each key's own intervals pairwise " +
          s"disjoint, but key=${r.get(0)} has an interval [${r.get(1)}, ${r.get(2)}] " +
          s"starting at or before a previous own-key interval's end (${r.get(3)}) — " +
          "own-key overlap silently corrupts n_overlaps/overlap_us; merge or " +
          "sessionize the key's intervals first (checkDisjoint=false skips this check)"
      })
    }
    def bucketOf(c: Column): Column = ((c - pmod(c, lit(width))) / lit(width)).cast("long")

    // ---- ONE fused endpoint pass (round 17) ----------------------------
    // The two rank chains and the active-count integral all consume the
    // SAME endpoint timeline under the SAME total order: every interval
    // contributes its lo (kind 0) and hi (kind 1), ordered
    // (value, kind, key, lo) with lo-kind before hi-kind at ties. Under
    // that order, ONE bucketed window pass yields all three running
    // sums at once:
    //  - __clo = #lo endpoints at or before this row. Read at a
    //    session's HI row it is exactly the old xRank's
    //    #{lo_t ≤ hi_s} (equal-valued lo's sort before any hi — the
    //    old events-first "≤" tie rule);
    //  - __chi = #hi endpoints at or before this row. Read at a
    //    session's LO row it is exactly the old yRank's
    //    #{hi_t < lo_s} (equal-valued hi's sort after — the old
    //    probes-first "<" rule);
    //  - the active count A = __clo − __chi (each lo is +1, each hi
    //    −1 under the identical order the old integral chain used), so
    //    the F(t) = ∫A prefix integral rides the same window.
    // Tie order among same-(value, kind) rows is irrelevant to all
    // three sums (they count whole kinds, not positions within one).
    // The old form built three separate union frames, three windows,
    // three bucket-offset joins, and re-joined xRank ⋈ yRank ⋈
    // perSession on (key, lo); the fused form is one frame, one
    // window pass (plus the unavoidable second bucket pass for the F
    // offsets, which depend on the windowed increments), and ONE
    // per-session aggregate — interval-sized exchanges drop ~7 → 3 at
    // any scale, the win a 100 TB timeline keeps. Per-session reads
    // are bit-identical to the old chains (Round15OpsSpec pins the
    // operator against folding the naive pair join; the DuckDB oracle
    // IS that pair join).
    val ep = sess.select(col("__key"), col("__lo").as("__slo"),
        col("__lo").as("__v"), lit(0).as("__k"))
      .unionByName(sess.select(col("__key"), col("__lo").as("__slo"),
        col("__hi").as("__v"), lit(1).as("__k")))
      .withColumn("__b", bucketOf(col("__v")))
    val ord = Seq(col("__v"), col("__k"), col("__key"), col("__slo"))
    val wCum = Window.partitionBy(col("__b")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(col("__b")).orderBy(ord: _*)
    // bucket frame: per-bucket lo/hi totals → cross-bucket rank and
    // active-count offsets, plus the previous bucket's LAST timestamp
    // (the segment that crosses the bucket boundary)
    val isLo = when(col("__k") === 0, 1L).otherwise(0L)
    val isHi = when(col("__k") === 1, 1L).otherwise(0L)
    val btot = ep.groupBy(col("__b"))
      .agg(sum(isLo).as("__blo"), sum(isHi).as("__bhi"), max(col("__v")).as("__bmax"))
    val bw = Window.orderBy(col("__b"))
    val boff = btot
      .withColumn("__looff", coalesce(sum(col("__blo")).over(
        bw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__hioff", coalesce(sum(col("__bhi")).over(
        bw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__pmax", lag(col("__bmax"), 1).over(bw))
      .select(col("__b"), col("__looff"), col("__hioff"), col("__pmax"))
    val d = when(col("__k") === 0, 1L).otherwise(-1L)
    val rows = ep.join(broadcast(boff), Seq("__b"))
      .withColumn("__clo", sum(isLo).over(wCum) + col("__looff"))
      .withColumn("__chi", sum(isHi).over(wCum) + col("__hioff"))
      // A after this endpoint; F increment = A just BEFORE it × the
      // segment from the previous endpoint. The bucket's first row
      // crosses from the previous bucket's last point (the global
      // first row has A−d = 0, so any finite default is exact — use
      // its own v: a zero-length segment).
      .withColumn("__inc", (col("__clo") - col("__chi") - d) *
        (col("__v") - coalesce(lag(col("__v"), 1).over(wLag),
          col("__pmax"), col("__v"))))
      .withColumn("__f1", sum(col("__inc")).over(wCum))
    val foff = rows.groupBy(col("__b")).agg(sum(col("__inc")).as("__bf"))
      .withColumn("__foff", coalesce(sum(col("__bf")).over(
        bw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__foff"))

    // ---- assemble: session reads off its own two rows, then per key ----
    // x = __clo at the hi row, y = __chi at the lo row,
    // ov = F(hi) − F(lo) − (hi − lo) — the identical quantities the
    // three old chains produced, collapsed into one aggregate instead
    // of two (key, lo)-keyed joins.
    rows.join(broadcast(foff), Seq("__b"))
      .select(col("__key"), col("__slo"), col("__k"), col("__v"),
        col("__clo"), col("__chi"), (col("__f1") + col("__foff")).as("__F"))
      .groupBy(col("__key"), col("__slo"))
      .agg(
        (max(when(col("__k") === 1, col("__clo"))) -
          max(when(col("__k") === 0, col("__chi"))) - lit(1L)).as("__cnt"),
        (max(when(col("__k") === 1, col("__F"))) -
          max(when(col("__k") === 0, col("__F"))) -
          (max(when(col("__k") === 1, col("__v"))) -
           max(when(col("__k") === 0, col("__v"))))).as("__ov"))
      .groupBy(col("__key"))
      .agg(sum(col("__cnt")).as("n_overlaps"), sum(col("__ov")).as("overlap_us"))
      .filter(col("n_overlaps") > 0)
      .select(col("__key").as(keyCol), col("n_overlaps"), col("overlap_us"))
  }
}
