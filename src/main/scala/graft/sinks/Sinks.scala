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

  /** ORC write (native in spark-sql); pairs with Sources.orc and takes
    * the same partition-pruning advice as the parquet sink.
    */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Avro write; pairs with Sources.avro. Classpath-gated like the
    * Kafka sink (see Sources.avroAvailable).
    */
  def avro(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    graft.sources.Sources.requireAvro()
    val w = df.write.mode("overwrite").format("avro")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

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

  // ---- kafka -------------------------------------------------------------
  //
  // Writer half of the reference's Kafka front door: the producer side
  // (reference example/shakespeare_loader.rs:44-53 ProduceMessage
  // {key, value}) plus the ParsedMessage JSON serde (reference
  // src/lib.rs:32-37 to_bytes). The encoders are pure
  // DataFrame→DataFrame (broker-free, tested in KafkaSerdeSpec); the
  // Kafka sink itself consumes exactly the two-column (key, value)
  // frame they produce and needs the spark-sql-kafka connector jar.

  import org.apache.spark.sql.functions.{col, struct, to_json}

  /** Encode rows into the raw Kafka producer frame: key/value as
    * strings (Spark's kafka sink serializes string or binary). The
    * reference's loader shape — key = source file, value = one word.
    */
  def toKafkaRaw(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      col(valueCol).cast("string").as("value"))

  /** Encode rows into a JSON-valued Kafka frame: `valueCols` become one
    * JSON document per row — ParsedMessage{key, value: T} with JSON
    * serde (reference src/lib.rs:32-37). Inverse of
    * Sources.fromKafkaJson (round-trip asserted in KafkaSerdeSpec).
    */
  def toKafkaJson(df: DataFrame, keyCol: String, valueCols: Seq[String]): DataFrame =
    df.select(col(keyCol).cast("string").as("key"),
      to_json(struct(valueCols.map(col): _*)).as("value"))

  /** Stream a (key, value) frame to a Kafka topic with exactly-once
    * progress via the checkpoint (the producer half of a deployed
    * topology).
    */
  def kafkaStream(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String): StreamingQuery = {
    graft.sources.Sources.requireKafka()
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** One-shot batch produce of a (key, value) frame to a topic — the
    * reference loader's bounded file→topic replay.
    */
  def kafkaBatch(df: DataFrame, bootstrap: String, topic: String): Unit = {
    graft.sources.Sources.requireKafka()
    df.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()
  }
}
