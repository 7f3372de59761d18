package graft
import org.apache.spark.sql.functions._
import graft.functions.DedupFns._
import graft.functions.TextFns._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("scratch")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $label rows=$n time=${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    val sigs = docs
      .select(col("doc_id").as("id"), tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) >= 3)
      .select(col("id"), wordNgramsFromTokens(col("__toks"), 3).as("__grams"))
      .select(col("id"), transform(col("__grams"), t => tokenHash31(t)).as("__hs"))
      .select(col("id"), minhashBandArray(col("__hs")).as("__bands"))
      .select(col("id"), posexplode(col("__bands")).as(Seq("band", "bh")))
    time("sigs.count"){ sigs.count() }
    time("sigs.agg"){ sigs.select(sum(col("bh"))).collect()(0).getLong(0) }
    val a = sigs.as("a"); val b = sigs.as("b")
    val joined = a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
    time("join raw"){ joined.count() }
    println("=== EXECUTED PLAN (join) ===")
    val p = joined.queryExecution.executedPlan.toString
    println(p.split("\n").map(_.take(140)).take(40).mkString("\n"))
    spark.stop()
  }
}
