package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed event record used by the stateful streaming operators — the
  * Spark re-expression of the reference's `ParsedMessage { key, value }`
  * (reference src/lib.rs:19-23) with an explicit event time.
  */
final case class KeyedEvent(key: Long, tsUs: Long, value: Double)

/** Emitted by the stateful lag window: the last `n` values for `key`,
  * oldest→newest, emitted on each arrival once the buffer is full
  * (reference src/window.rs:9-41 `lag_window`).
  */
final case class LagWindowOut(key: Long, tsUs: Long, values: Seq[Double])

/** Changelog-compacted latest value per key (reference src/table.rs:17-45
  * `Table::spawn` — the KTable).
  */
final case class TableLatest(key: Long, tsUs: Long, value: Double)

/** Structured Streaming parity layer: the reference is a *stream*
  * processor, so every batch operator in graft.operators has a
  * streaming twin here. Batch results are the ground truth; the
  * StreamingParitySpec asserts the two agree on the same data.
  *
  * State lives in the Spark state store (the reference's KVStore,
  * src/store.rs:8-17); watermarks bound it — the streaming analogue of
  * the reference's high-water-mark eviction (src/join.rs:56-77).
  */
object StreamingOps {

  /** Watermarked tumbling window aggregation (reference src/window.rs:43-93). */
  def tumbling(stream: DataFrame, tsCol: String, keys: Seq[String], size: String,
      watermark: String)(aggs: Column*): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Watermarked hopping window aggregation (reference src/window.rs:95-180). */
  def hopping(stream: DataFrame, tsCol: String, keys: Seq[String], size: String, hop: String,
      watermark: String)(aggs: Column*): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), size, hop) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Watermarked session window with inactivity gap. */
  def session(stream: DataFrame, tsCol: String, keys: Seq[String], gap: String,
      watermark: String)(aggs: Column*): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** Changelog table — latest value per key, updated per micro-batch
    * (reference src/table.rs:17-45). Use OutputMode.Update; the sink's
    * latest row per key IS the table snapshot.
    */
  def tableLatest(stream: Dataset[KeyedEvent]): Dataset[TableLatest] = {
    implicit val outEnc = Encoders.product[TableLatest]
    stream.groupByKey(_.key)(Encoders.scalaLong)
      .mapGroupsWithState[TableLatest, TableLatest](GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[KeyedEvent], state: GroupState[TableLatest]) =>
          val incoming = events.maxBy(e => (e.tsUs, e.value))
          val best = state.getOption match {
            case Some(cur) if cur.tsUs >= incoming.tsUs => cur
            case _ => TableLatest(key, incoming.tsUs, incoming.value)
          }
          state.update(best)
          best
      }
  }

  /** Count-based per-key sliding window of the last `n` values
    * (reference src/window.rs:9-41): emits the full buffer on every
    * event once `n` values have arrived. Event-time ordering within a
    * key is the arrival order of micro-batches (the reference makes
    * the same single-stream in-order assumption); within a batch we
    * sort by event time.
    */
  def lagWindow(stream: Dataset[KeyedEvent], n: Int): Dataset[LagWindowOut] = {
    require(n >= 2, "lag window needs n >= 2")
    implicit val outEnc = Encoders.product[LagWindowOut]
    implicit val stEnc = Encoders.kryo[List[Double]]
    stream.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[List[Double], LagWindowOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: Long, events: Iterator[KeyedEvent], state: GroupState[List[Double]]) =>
          var buf = state.getOption.getOrElse(Nil) // newest first
          val out = scala.collection.mutable.ArrayBuffer.empty[LagWindowOut]
          events.toSeq.sortBy(e => (e.tsUs, e.value)).foreach { e =>
            buf = (e.value :: buf).take(n)
            if (buf.size == n) out += LagWindowOut(key, e.tsUs, buf.reverse)
          }
          state.update(buf)
          out.iterator
      }
  }

  /** Stream-stream interval inner join (reference src/join.rs:21-141):
    * same key, |tsL - tsR| < window. Watermarks on both sides bound the
    * join state exactly like the reference's high-water-mark eviction.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      window: String, watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      expr(s"""$leftKey = $rightKey AND
               $rightTs > $leftTs - INTERVAL $window AND
               $rightTs < $leftTs + INTERVAL $window"""))
  }

  /** Stream-static enrichment join (reference src/join.rs:143-157):
    * the static dim is broadcast per micro-batch; no stream state.
    */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), "inner")
}
