package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch and streaming readers — the engine's Source surface.
  *
  * The reference's sources are Kafka consumers plus JSON serde
  * (reference src/lib.rs:25-37, example/shakespeare_loader.rs). Spark
  * re-expression: `spark.read` / `spark.readStream` over columnar
  * formats; Kafka maps to the `kafka` streaming source when the
  * connector jar is on the classpath (not available in this offline
  * container, so it is surfaced but untested here).
  */
object Sources {

  /** Read one named parquet table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def jsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  // ---- streaming sources -------------------------------------------------

  /** Streaming parquet directory source (file-arrival stream). */
  def parquetStream(spark: SparkSession, path: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(path)

  /** Synthetic benchmark stream: monotonically increasing (timestamp, value). */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond.toString).load()

  /** Kafka topic source (requires the spark-sql-kafka connector jar). */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()
}
