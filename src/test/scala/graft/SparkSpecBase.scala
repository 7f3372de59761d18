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
    // after session startup + level set: Spark's log4j2 re-init would
    // drop an earlier-installed appender (see CodegenGuard.install)
    CodegenGuard.install()
    s
  }
  def sfDir = "/root/testdata/sf0.001"

  /** Codegen-fallback gate (VERDICT r14 item 1): a janino compile
    * failure logs one ERROR and silently drops the plan to interpreted
    * eval — correct rows, green test, ~60× production cliff. Every
    * suite on this base fails loudly instead. Suites overriding
    * afterAll must call super.
    */
  override def afterAll(): Unit = {
    val errs = CodegenGuard.drain()
    try assert(errs.isEmpty,
      s"whole-stage codegen fell back to interpreted eval during this suite " +
        s"(janino compile failure — see CodegenGuard):\n  ${errs.mkString("\n  ")}")
    finally super.afterAll()
  }

  /** Schema-adaptive events table (ts normalized to TimestampType) —
    * always read events through this, never raw, so specs survive the
    * generator's nanos/micros encoding changes the same way main does.
    */
  def eventsDF: org.apache.spark.sql.DataFrame = Queries.events(spark, sfDir)
}
