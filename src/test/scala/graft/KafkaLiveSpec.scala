package graft

import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import graft.sinks.Sinks
import graft.sources.Sources

/** OPT-IN live-broker Kafka round-trip — the one reference behavior
  * (example/shakespeare_loader.rs produce → consumer consume against a
  * real broker) that cannot run in an offline container. The serde
  * layer itself is fully broker-free-tested in KafkaSerdeSpec; this
  * spec closes the residual where an environment provides:
  *
  *  - the spark-sql-kafka connector on the classpath (submit with
  *    `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`), and
  *  - `GRAFT_KAFKA_BOOTSTRAP` pointing at a reachable broker (e.g. a
  *    testcontainers/compose-managed `localhost:9092`).
  *
  * Both gates use `assume`, so absence CANCELS the test (reported as
  * canceled, never failed) — in this offline build container neither
  * gate holds and the suite stays green.
  *
  * Hosting feasibility (probed 2026-08-14, round 11): the container
  * CANNOT host a broker. (1) No kafka artifact exists anywhere on the
  * filesystem — no broker distribution, no kafka jar under
  * /opt/spark/jars, no org.apache.kafka entry in the pre-warmed
  * coursier cache. (2) Resolution is impossible: a probe project
  * adding `"org.apache.kafka" %% "kafka" % "3.8.0"` fails under
  * COURSIER_MODE=offline with "not found" against the local cache for
  * the pom AND the ivy descriptor (zero egress, so no fetch path
  * exists). (3) The spark-sql-kafka-0-10 connector needed by the Spark
  * side is equally absent. An embedded KRaft test-jar server is
  * therefore unreachable too — it ships in the same unresolvable
  * artifacts. The spec stays the contract for environments that do
  * provide both gates.
  */
class KafkaLiveSpec extends SparkSpecBase {

  private def bootstrap: Option[String] = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  test("live broker: raw serde round-trips through a real topic (loader → consumer)") {
    assume(Sources.kafkaAvailable, "spark-sql-kafka connector not on classpath (opt-in)")
    assume(bootstrap.isDefined, "GRAFT_KAFKA_BOOTSTRAP not set (opt-in)")
    import spark.implicits._
    val bs = bootstrap.get
    val topic = s"graft_raw_${System.currentTimeMillis()}"
    val in = Seq(("hamlet", "to"), ("hamlet", "be"), ("lear", "howl")).toDF("src", "word")
    Sinks.kafkaBatch(Sinks.toKafkaRaw(in, "src", "word"), bs, topic)
    val back = Sources.fromKafkaRaw(Sources.kafkaBatch(spark, bs, topic))
      .select("key", "value").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("hamlet", "to"), ("hamlet", "be"), ("lear", "howl")),
      s"raw round-trip diverged: $back")
  }

  test("live broker: JSON serde round-trips through a real topic (ParsedMessage shape)") {
    assume(Sources.kafkaAvailable, "spark-sql-kafka connector not on classpath (opt-in)")
    assume(bootstrap.isDefined, "GRAFT_KAFKA_BOOTSTRAP not set (opt-in)")
    import spark.implicits._
    val bs = bootstrap.get
    val topic = s"graft_json_${System.currentTimeMillis()}"
    val in = Seq(("AAPL", 101L, 17.5), ("MSFT", 102L, 23.25)).toDF("sym", "seq", "px")
    Sinks.kafkaBatch(Sinks.toKafkaJson(in, "sym", Seq("seq", "px")), bs, topic)
    val schema = StructType(Seq(
      StructField("seq", LongType), StructField("px", DoubleType)))
    val back = Sources.fromKafkaJson(Sources.kafkaBatch(spark, bs, topic), schema)
      .selectExpr("key", "value.seq", "value.px").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == Set(("AAPL", 101L, 17.5), ("MSFT", 102L, 23.25)),
      s"JSON round-trip diverged: $back")
  }
}
