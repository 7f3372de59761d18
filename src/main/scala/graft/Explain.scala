package graft

/** Dev tool: print the formatted physical plan of named queries (all
  * headline queries when no args) at SPARK_GRAFT_SF_DIR. The plan —
  * PushedFilters, ReadSchema, broadcast vs shuffle joins, whole-stage
  * codegen spans — is the design artifact that must survive a 100×
  * scale-up; PlanSpec asserts the load-bearing properties, this prints
  * them for eyeballing.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // --exec: run each query first, then print the FINAL adaptive plan —
    // the only place runtime exchange reuse (ReusedQueryStage /
    // ReusedExchange under AQE) is visible; the static plan always
    // shows both copies of a repeated subtree.
    val exec = args.contains("--exec")
    val spark = GraftSession.local("graft-explain")
    val names = args.toSeq.filterNot(_.startsWith("--")) match {
      case Nil => Bench.Headline.toSeq
      case ns  => ns
    }
    names.foreach { name =>
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (exec) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}

/** Suite-wide physical-plan audit: run EVERY registered query, then
  * grade its FINAL adaptive plan (the post-AQE one, where runtime
  * exchange reuse is visible) on the properties that decide 100 TB
  * behavior — how many times each base table is actually scanned, how
  * many real shuffles run, whether anything nested-loops or funnels
  * through a single partition, and whether repeated subtrees were
  * reused. One JSON line per query on stdout (diagnostics to stderr);
  * `scripts/plan_audit.py` summarizes and diffs against the committed
  * snapshot. PlanSpec pins individual load-bearing shapes; this is the
  * whole-suite sweep that catches a regression in a query nobody
  * thought to pin.
  */
object PlanAudit {
  import org.apache.spark.sql.execution.{FileSourceScanExec, ReusedSubqueryExec, SparkPlan}
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

  /** Count base-table scans by walking the final plan TREE, one count
    * per scan NODE — not by regexing plan text, where a truncated or
    * multi-line FileScan rendering under- or over-counts and a cached
    * InMemoryRelation hides the scan entirely. Reused exchanges /
    * subqueries (and AQE stage reuse, which wraps a ReusedExchange in a
    * fresh stage) execute their subtree ONCE, so the walk does not
    * descend into them.
    */
  private[graft] def scanTables(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => scanTables(a.finalPhysicalPlan)
    case q: QueryStageExec        => scanTables(q.plan)
    case _: ReusedExchangeExec    => Nil
    case _: ReusedSubqueryExec    => Nil
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.map(_.getName.stripSuffix(".parquet")).distinct.toSeq
    case other =>
      (other.children ++ other.subqueries).flatMap(scanTables)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-plan-audit")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        // the executed-plan toString replays the pre-reuse Initial Plan
        // below the final one — audit the final section only
        val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
        val lines = p.linesIterator.toSeq
        val scans = scanTables(df.queryExecution.executedPlan)
          .groupBy(identity).view.mapValues(_.size).toMap
        def n(pat: String): Int = lines.count(_.contains(pat))
        val json = scans.toSeq.sorted.map { case (t, c) => s""""$t":$c""" }.mkString(",")
        println(s"""{"q":"$name","scans":{$json}""" +
          s""","exch":${lines.count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))}""" +
          s""","single":${lines.count(l => l.contains("Exchange SinglePartition") && !l.contains("ReusedExchange"))}""" +
          s""","reused":${n("ReusedExchange") + n("ReusedQueryStage")}""" +
          s""","cartesian":${n("CartesianProduct") + n("BroadcastNestedLoopJoin")}""" +
          s""","sec":${(System.nanoTime() - t0) / 1e9}}""")
      } catch {
        case e: Exception => System.err.println(s"[audit] $name FAILED: ${e.getMessage}")
      } finally Queries.clearSessionMemos()
    }
    spark.stop()
  }
}
