package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.sinks.Sinks
import graft.sources.Sources

/** Kafka surface, tested WITHOUT a broker.
  *
  * `format("kafka")` produces/consumes a fixed public wire frame
  * (key binary, value binary, topic, partition, offset, timestamp);
  * the serde layer (Sources.fromKafkaRaw/fromKafkaJson,
  * Sinks.toKafkaRaw/toKafkaJson) is pure DataFrame→DataFrame over that
  * frame, so these specs build the frame by hand — exactly what a
  * broker would deliver — and assert the serde plus the reference's
  * shakespeare topology (example/shakespeare_loader.rs producer →
  * example/shakespeare_consumer.rs word count) end to end. The
  * broker-touching calls themselves are gated on connector presence.
  */
class KafkaSerdeSpec extends SparkSpecBase {

  test("ParsedMessage JSON serde round-trips through the Kafka wire frame") {
    import spark.implicits._
    val rows = Seq((1L, "AAPL", 101.5), (2L, "MSFT", 202.25), (3L, "AAPL", 99.0))
      .toDF("id", "symbol", "px")

    // encode: ParsedMessage{key, value} with JSON serde (reference
    // src/lib.rs:32-37 to_bytes)
    val produced = Sinks.toKafkaJson(rows, "symbol", Seq("id", "px"))
    assert(produced.columns.toSeq == Seq("key", "value"))

    // the broker: string → bytes on produce, bytes back on consume
    val wire = produced.select(
      col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))

    val valueSchema = StructType(Seq(
      StructField("id", LongType), StructField("px", DoubleType)))
    val decoded = Sources.fromKafkaJson(wire, valueSchema)
      .select(col("key"), col("value.id").as("id"), col("value.px").as("px"))
    val got = decoded.collect().map(r => (r.getLong(1), r.getString(0), r.getDouble(2))).toSet
    assert(got == Set((1L, "AAPL", 101.5), (2L, "MSFT", 202.25), (3L, "AAPL", 99.0)))
  }

  test("fromKafkaJson yields null fields for malformed JSON, not a failure") {
    import spark.implicits._
    val wire = Seq(("k1", """{"id": 7}"""), ("k2", "not json at all"))
      .toDF("key", "value")
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
    val decoded = Sources.fromKafkaJson(wire, StructType(Seq(StructField("id", LongType))))
      .select(col("key"), col("value.id").as("id"))
    val got = decoded.collect().map(r => (r.getString(0), r.isNullAt(1))).toSet
    assert(got == Set(("k1", false), ("k2", true)))
  }

  test("fromKafkaRaw passes through Kafka metadata columns when present") {
    import spark.implicits._
    val wire = Seq(("f", "word", "shakespeare", 0, 17L))
      .toDF("key", "value", "topic", "partition", "offset")
      .select(col("key").cast("binary").as("key"), col("value").cast("binary").as("value"),
        col("topic"), col("partition"), col("offset"))
    val decoded = Sources.fromKafkaRaw(wire)
    assert(decoded.columns.toSeq == Seq("key", "value", "topic", "partition", "offset"))
    val r = decoded.collect().head
    assert(r.getString(0) == "f" && r.getString(1) == "word" &&
      r.getString(2) == "shakespeare" && r.getInt(3) == 0 && r.getLong(4) == 17L)
  }

  test("shakespeare topology: produce words keyed by file, consume and count (streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // loader half (example/shakespeare_loader.rs:43-53): one message
    // per WORD, key = source filename, value = raw word bytes
    val lines = Seq(
      ("hamlet.txt", "To be, or not to be:"),
      ("hamlet.txt", "that is the question."),
      ("macbeth.txt", "Out, out, brief candle!"))
    val words = lines.toDF("file", "line")
      .select(col("file"), explode(split(col("line"), "\\s+")).as("word"))
    val produced = Sinks.toKafkaRaw(words, "file", "word")

    // the broker leg: frames arrive as a stream of (key, value) bytes
    val frames = produced.select(
      col("key").cast("binary").as("key"), col("value").cast("binary").as("value"))
      .collect().map(r => (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1))).toSeq
    val ms = MemoryStream[(Array[Byte], Array[Byte])]
    ms.addData(frames)

    // consumer half (example/shakespeare_consumer.rs:37-49): strip
    // ( ) , " . ; : ' then lowercase, count per word
    val counts = Sources.fromKafkaRaw(ms.toDF().toDF("key", "value"))
      .select(lower(regexp_replace(col("value"), """[(),"\.;:']""", "")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val q = counts.writeStream.format("memory").queryName("t_shakespeare")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("t_shakespeare").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("to" -> 2L, "be" -> 2L, "or" -> 1L, "not" -> 1L,
      "that" -> 1L, "is" -> 1L, "the" -> 1L, "question" -> 1L,
      "out" -> 2L, "brief" -> 1L, "candle!" -> 1L))
  }

  test("broker-touching calls fail fast with a clear message when the connector is absent") {
    import spark.implicits._
    if (!Sources.kafkaAvailable) {
      val e1 = intercept[IllegalStateException] {
        Sources.kafkaStream(spark, "localhost:9092", "t")
      }
      assert(e1.getMessage.contains("spark-sql-kafka"))
      val e2 = intercept[IllegalStateException] {
        Sinks.kafkaBatch(Seq(("k", "v")).toDF("key", "value"), "localhost:9092", "t")
      }
      assert(e2.getMessage.contains("spark-sql-kafka"))
    } else {
      // connector present (real cluster): the plan must at least build
      assert(Sources.kafkaStream(spark, "localhost:9092", "t").isStreaming)
    }
  }
}
