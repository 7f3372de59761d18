package graft

import java.nio.file.Files
import graft.sources.Sources

class SourcesSpec extends SparkSpecBase {

  test("parquet/csv/json sources round-trip through Sinks.parquet") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sources").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")

    graft.sinks.Sinks.parquet(df, s"$dir/p")
    assert(Sources.parquet(spark, s"$dir/p").count() == 2)

    df.write.option("header", "true").csv(s"$dir/c")
    val c = Sources.csv(spark, s"$dir/c")
    assert(c.count() == 2 && c.columns.toSeq == Seq("id", "name", "v"))

    graft.sinks.Sinks.jsonLines(df, s"$dir/j")
    val j = Sources.jsonLines(spark, s"$dir/j")
    assert(j.count() == 2 && j.columns.sorted.toSeq == Seq("id", "name", "v"))
  }

  test("orc source/sink round-trip preserves values, partitioning prunes, filters push down") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "name", "v")

    graft.sinks.Sinks.orc(df, s"$dir/flat")
    val back = Sources.orc(spark, s"$dir/flat")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))
    // predicate pushdown reaches the ORC scan exactly as for parquet
    val plan = back.filter(col("id") > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"), plan)

    graft.sinks.Sinks.orc(df, s"$dir/part", partitionBy = Seq("name"))
    val part = Sources.orc(spark, s"$dir/part").filter(col("name") === "a")
    assert(part.count() == 2)
    assert(part.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(name"), "partition pruning missing")
  }

  test("avro source/sink: round-trip when the connector is present, clean fail-fast when absent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "name", "v")
    if (Sources.avroAvailable) {
      val dir = Files.createTempDirectory("graft-avro").toString
      graft.sinks.Sinks.avro(df, s"$dir/flat")
      val back = Sources.avro(spark, s"$dir/flat")
      assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
        Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))
      // avro is row-oriented: no pushdown assert, but partition pruning
      // comes from the directory layout exactly as for parquet/orc
      graft.sinks.Sinks.avro(df, s"$dir/part", partitionBy = Seq("name"))
      val part = Sources.avro(spark, s"$dir/part").filter(col("name") === "a")
      assert(part.count() == 2)
      assert(part.queryExecution.executedPlan.toString
        .contains("PartitionFilters: [isnotnull(name"), "partition pruning missing")
    } else {
      // offline container: the gate must fail fast with the submit hint
      // on BOTH halves, not error deep inside a write job
      val r = intercept[IllegalStateException](Sources.avro(spark, "/tmp/nonexistent"))
      assert(r.getMessage.contains("--packages org.apache.spark:spark-avro"))
      val w = intercept[IllegalStateException](graft.sinks.Sinks.avro(df, "/tmp/nonexistent-out"))
      assert(w.getMessage.contains("--packages org.apache.spark:spark-avro"))
    }
  }

  test("table() reads a named testdata table; streaming parquet source streams it") {
    val r = Sources.table(spark, sfDir, "region")
    assert(r.count() == 5)
    // the file-arrival stream source watches a DIRECTORY
    val dir = Files.createTempDirectory("graft-stream-src").toString
    graft.sinks.Sinks.parquet(r, s"$dir/region")
    val stream = Sources.parquetStream(spark, s"$dir/region", r)
    assert(stream.isStreaming)
    val q = graft.sinks.Sinks.memory(stream, "t_src_region")
    q.processAllAvailable(); q.stop()
    assert(spark.table("t_src_region").count() == 5)
  }

  test("sessions created via GraftExtensions conf expose graft SQL functions") {
    // the cluster-wide --conf spark.sql.extensions=graft.GraftExtensions
    // path: session construction applies the injected functions to the
    // session's FunctionRegistry. The conf is STATIC (can't be set on
    // the test JVM's running context), so drive the same mechanism by
    // hand onto a fresh session's registry — both the native
    // expressions AND the heavy-hitters UDAF must resolve without any
    // register() call.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val s2 = spark.newSession()
    org.apache.spark.sql.GraftBridge.applyInjectedFunctions(
      ext, s2.sessionState.functionRegistry)
    assert(s2.sql("SELECT graft_simhash32(array('a','b'))").collect().length == 1)
    val hh = s2.sql(
      "SELECT graft_heavy_hitters(t) AS sk FROM VALUES ('x'), ('x'), ('y') AS v(t)")
      .collect()
    assert(hh.length == 1 && !hh(0).isNullAt(0))
  }
}
