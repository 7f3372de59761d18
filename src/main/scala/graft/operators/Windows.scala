package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Event-time windows.
  *
  * The reference aligns windows to epoch 0 by integer division of the
  * event time (reference src/window.rs:62-64, 121-127), which is exactly
  * Spark's `window()` semantics with a UTC session — so the built-in
  * (codegen'd, partial-agg) window expression is the whole
  * implementation. No custom state machine needed for batch; streaming
  * parity lives in graft.streaming.
  */
object Windows {

  /** Tumbling window (reference src/window.rs:43-93). */
  def tumbling(df: DataFrame, tsCol: String, keys: Seq[String], size: String)(aggs: Column*): DataFrame =
    finish(df.groupBy(window(col(tsCol), size) +: keys.map(col).toIndexedSeq: _*).agg(aggs.head, aggs.tail: _*))

  /** Hopping window (reference src/window.rs:95-180): each event lands
    * in size/hop windows; Spark expands via the same epoch-aligned
    * bucket enumeration.
    */
  def hopping(df: DataFrame, tsCol: String, keys: Seq[String], size: String, hop: String)(aggs: Column*): DataFrame =
    finish(df.groupBy(window(col(tsCol), size, hop) +: keys.map(col).toIndexedSeq: _*).agg(aggs.head, aggs.tail: _*))

  /** Session window with inactivity gap — natural extension of the
    * reference's window family via Spark's `session_window`.
    */
  def session(df: DataFrame, tsCol: String, keys: Seq[String], gap: String)(aggs: Column*): DataFrame = {
    val g = df.groupBy(session_window(col(tsCol), gap) +: keys.map(col).toIndexedSeq: _*).agg(aggs.head, aggs.tail: _*)
    g.withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  private def finish(g: DataFrame): DataFrame =
    g.withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Count-based sliding window of the last `n` values per key
    * (reference src/window.rs:9-41 `lag_window`): emits one row per
    * event once the buffer is full, values oldest→newest as columns
    * `v_{n-1} … v_0` (v_0 = current). Single shuffle+sort per key.
    */
  def lagWindow(df: DataFrame, keys: Seq[String], order: Seq[String], valueCol: String, n: Int): DataFrame = {
    require(n >= 2, "lag window needs n >= 2")
    val w = W.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(order.map(col).toIndexedSeq: _*)
    val withLags = (1 until n).foldLeft(df.withColumn("v_0", col(valueCol))) { (d, i) =>
      d.withColumn(s"v_$i", lag(col(valueCol), i).over(w))
    }
    withLags.filter(col(s"v_${n - 1}").isNotNull)
  }
}
