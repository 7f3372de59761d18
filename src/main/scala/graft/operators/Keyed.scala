package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key operators over keyed record streams.
  *
  * The reference models a stream as `ParsedMessage { key, value }`
  * (reference src/lib.rs:19-23); here the key is simply one or more
  * columns of a DataFrame, so Catalyst plans every per-key op as a
  * single hash-shuffle on the key with map-side partial aggregation
  * where the agg is algebraic.
  */
object Keyed {

  /** Changelog compaction — latest record per key (reference
    * src/table.rs:17-45 `Table::spawn`).
    *
    * Implemented as `max_by(struct(all), struct(order))`: one shuffle,
    * partial aggregation on the map side — at 100 TB this is the right
    * plan (vs. a rank-window which needs a full sort of every
    * partition). `order` must be a deterministic total order per key
    * (pass a unique tiebreak column last).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(order.map(col).toIndexedSeq: _*)
    val others = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(keys.map(col) ++ others.map(c => col(s"__latest.`$c`").as(c)): _*)
  }

  /** Per-key ordered row number (1-based); building block for
    * chunk/skip/take/throttle (reference StreamExt combinators).
    */
  private def withRowNumber(df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.map(col).toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w))
  }

  /** Fixed-size per-key chunking (reference StreamExt::chunks): adds
    * `chunk_id` 0-based. One shuffle+sort by key.
    */
  def chunk(df: DataFrame, keys: Seq[String], order: Seq[String], n: Int): DataFrame =
    withRowNumber(df, keys, order)
      .withColumn("chunk_id", floor((col("__rn") - 1) / n).cast("long"))
      .drop("__rn")

  /** skip(n).take(m) per key in event order (reference StreamExt). */
  def skipTake(df: DataFrame, keys: Seq[String], order: Seq[String], skip: Int, take: Int): DataFrame =
    withRowNumber(df, keys, order)
      .filter(col("__rn") > skip && col("__rn") <= skip + take)
      .withColumnRenamed("__rn", "rn")

  /** Deterministic batch re-expression of throttle (reference
    * StreamExt::throttle is wall-clock rate limiting, meaningless in
    * batch): keep every nth record per key in event order.
    */
  def throttle(df: DataFrame, keys: Seq[String], order: Seq[String], every: Int): DataFrame =
    withRowNumber(df, keys, order)
      .filter((col("__rn") - 1) % every === 0)
      .withColumnRenamed("__rn", "rn")

  /** Per-key fold → algebraic aggregation (reference StreamExt::fold,
    * example/tpipe.rs:108-117). Partial-agg friendly: single shuffle.
    */
  def fold(df: DataFrame, keys: Seq[String])(aggs: Column*): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*).agg(aggs.head, aggs.tail: _*)

  /** Rank-based top-fraction flagging (the winsorize/outlier-trim
    * primitive): tags every row with its per-key rank over `order`,
    * the key's row count, and the cut position `(n * permille) div
    * 1000` — rows with `rank > cut` are the top (1000-permille)/1000
    * tail. Cutoffs are exact integer ranks, never interpolated
    * quantiles, so the flagged set is engine-portable. One shuffle +
    * per-key sort; the count rides the same sorted run.
    */
  def rankCutoff(df: DataFrame, keys: Seq[String], order: Seq[Column],
      permille: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
    val wAll = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__cut", expr(s"(__n * $permille) div 1000"))
  }

  /** Per-event session ASSIGNMENT (the row-level twin of the
    * `session_window` aggregate, reference src/window.rs:9-180 family):
    * a new session starts at a key's first event or after a gap
    * `> gapUs` in `tsUsCol` (epoch micros). Emits `session_idx`
    * (1-based per key) and `pos_in_session` (1-based within the
    * session) so downstream per-event features can key on the session
    * without re-aggregating.
    *
    * All four frames (lag, running flag-sum, running session-start rank,
    * row number) share ONE window spec → one shuffle + one sort,
    * partitioned on the (high-cardinality) key — never on a coarse
    * derivative, so no single-task skew at 100 TB. `order` must start
    * with `tsUsCol` and end with a unique tiebreak.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsUsCol: String,
      order: Seq[String], gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order.map(col).toIndexedSeq: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new", when(
        lag(col(tsUsCol), 1).over(w).isNull ||
          col(tsUsCol) - lag(col(tsUsCol), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("session_idx", sum(col("__new")).over(run))
      // rank of the session's first row, via the same sorted run: the
      // latest __rn where a session started
      .withColumn("pos_in_session",
        col("__rn") - max(when(col("__new") === 1L, col("__rn"))).over(run) + 1L)
      .drop("__new", "__rn")
  }
}
