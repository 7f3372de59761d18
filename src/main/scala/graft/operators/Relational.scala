package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream combinators that are trivially relational in Spark. */
object Relational {

  /** Merge N streams into one (reference StreamExt::merge,
    * example/tpipe.rs:108-111). Union is a no-shuffle narrow op.
    */
  def merge(streams: DataFrame*): DataFrame = streams.reduce(_ unionByName _)

  /** Split/branch a stream by predicate labels in a single scan
    * (reference fork/split): adds a `branch` label column rather than
    * materializing per-branch copies — branches filter lazily off one
    * scan.
    */
  def branch(df: DataFrame, branches: Seq[(String, Column)], otherwise: String = "other"): DataFrame = {
    val labeled = branches.foldRight(lit(otherwise)) { case ((name, pred), acc) =>
      when(pred, lit(name)).otherwise(acc)
    }
    df.withColumn("branch", labeled)
  }

  /** Deterministic top-k: full sort is avoided — Catalyst plans
    * orderBy+limit as TakeOrderedAndProject (per-partition heaps + a
    * single driver merge of k rows).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order.toIndexedSeq: _*).limit(k)
}
