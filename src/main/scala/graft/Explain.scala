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
    val spark = GraftSession.local("graft-explain")
    val names = if (args.nonEmpty) args.toSeq else Bench.Headline
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
