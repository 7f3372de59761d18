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
    // same mechanism spark.sql.extensions uses, applied to our extensions class
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; registration path covered in OperatorsSpec
  }
}
