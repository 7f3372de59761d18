package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs (UTC, AQE — same tuning the engine
  * ships with, so tested plans are shipped plans).
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def sfDir = "/root/testdata/sf0.001"

  /** Schema-adaptive events table (ts normalized to TimestampType) —
    * always read events through this, never raw, so specs survive the
    * generator's nanos/micros encoding changes the same way main does.
    */
  def eventsDF: org.apache.spark.sql.DataFrame = Queries.events(spark, sfDir)
}
