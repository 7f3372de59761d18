package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Sink surface — the writer half of the engine.
  *
  * The reference's sink is a Kafka producer with JSON serde (reference
  * src/lib.rs:32-37, example/shakespeare_consumer.rs); Spark
  * re-expression: `writeStream` sinks for streams, `write` for batch.
  * Kafka maps to the `kafka` sink when the connector jar is on the
  * classpath (not present in this offline container).
  */
object Sinks {

  // ---- batch ------------------------------------------------------------

  /** Partitioned parquet write — the batch table sink. At scale, pass
    * the partition columns users filter by (date, tenant) so readers
    * get partition pruning for free.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** JSON-lines write — the write side of the reference's JSON serde
    * (reference src/lib.rs:25-37); pairs with Sources.jsonLines.
    */
  def jsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Bucketed managed table — pre-shuffles data by the join/agg key at
    * write time so later equi-joins and aggregations on `bucketCols`
    * between co-bucketed tables run with NO exchange (verified in
    * BucketingSpec). At 100 TB this converts every recurring fact-fact
    * join on the bucket key from a full shuffle into a local zip of
    * bucket files — the single biggest recurring-shuffle eliminator.
    */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  // ---- streaming --------------------------------------------------------

  /** In-memory table sink (tests/interactive): query via `SELECT * FROM name`. */
  def memory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow()).start()

  /** Append stream to a parquet directory with exactly-once file commits. */
  def parquetStream(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet").option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()

  /** Arbitrary per-micro-batch logic with the batch id for idempotence —
    * the escape hatch that subsumes the reference's custom consumer loop.
    */
  def foreachBatch(df: DataFrame, mode: OutputMode = OutputMode.Update())(
      fn: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream.outputMode(mode).foreachBatch(fn)
      .trigger(Trigger.AvailableNow()).start()

  /** Console sink for debugging. */
  def console(df: DataFrame, mode: OutputMode = OutputMode.Append()): StreamingQuery =
    df.writeStream.format("console").outputMode(mode)
      .trigger(Trigger.AvailableNow()).start()
}
