package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session-scoped memo of input row counts, keyed by the analyzed
  * CANONICALIZED plan (structural equality, so every read of the same
  * table — or the same derived frame — hits the same entry).
  *
  * Auto-sizing rules (VectorFns.autoPlanes / autoCentroidCount,
  * Relational.autoPrefixChars) need n at DataFrame-CONSTRUCTION time;
  * an uncached eager count() would bill a full input scan to every
  * plan-only path — Explain, PlanSpec's optimizedPlan, repeated query
  * construction — once per call. Same discipline as Queries.tableCount.
  * The memo lives for the JVM like Queries.countCache; the key space is
  * bounded by the distinct inputs a session sizes against.
  */
object CountMemo {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, LogicalPlan), Long]

  def of(df: DataFrame): Long =
    memo.getOrElseUpdate(
      (df.sparkSession, df.queryExecution.analyzed.canonicalized), df.count())
}
