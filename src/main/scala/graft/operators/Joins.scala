package graft.operators

import org.apache.spark.sql.DataFrame
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
}
