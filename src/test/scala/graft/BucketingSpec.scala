package graft

import org.apache.spark.sql.functions._
import graft.sinks.Sinks

/** Co-located joins via bucketing: two tables bucketed on the join key
  * must join without any Exchange — the recurring-shuffle eliminator
  * promised in SURVEY §5.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of co-bucketed tables plans with no Exchange and matches the plain join") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sfDir/orders.parquet").select("o_orderkey", "o_totalprice")
    // the in-memory catalog forgets tables between sessions but their
    // warehouse directories survive — clear both before writing
    for (tbl <- Seq("b_lineitem", "b_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Sinks.bucketed(li, "b_lineitem", Seq("l_orderkey"), 8)
    Sinks.bucketed(o, "b_orders", Seq("o_orderkey"), 8)
    val bl = spark.table("b_lineitem")
    val bo = spark.table("b_orders")
    // disable broadcast so the join would otherwise shuffle both sides
    val joined = bl.hint("merge")
      .join(bo.hint("merge"), bl("l_orderkey") === bo("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)

    val expect = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    assert(joined.count() == expect)
  }
}
