package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the sf1 bench rehearsal:
  * replicates every sf0.1 table `factor`× with key-space shifts so the
  * result is a REFERENTIALLY-INTACT corpus ~factor× the rows — the
  * one-decade-up rehearsal VERDICT r10 asked for. This synthesizes
  * BENCH inputs only (correctness stays anchored to the driver's
  * /root/testdata parquet; nothing here feeds the oracle gate).
  *
  * Construction rules, chosen so per-query COST scales linearly unless
  * the operator itself is superlinear (which is what the rehearsal is
  * meant to expose):
  *
  *  - Replica 0 is the identity — sf0.1 is a subset of the output.
  *  - Every key column shifts by replica · 2⁴⁰ (keys at sf0.1 are
  *    < 2²⁴, so replicas can never collide), and FK columns shift with
  *    their PKs: orders.o_custkey follows customer, lineitem's
  *    orderkey/partkey/suppkey follow their parents, events.user_id
  *    keeps its per-user event multiplicity (10× users, same
  *    events-per-user — the shape AQE and the window exchanges see).
  *  - region/nation copy as-is: real dimension tables don't grow with
  *    fact volume, and the broadcast-ability the plans rely on at
  *    100 TB is exactly "dims stay small".
  *  - documents: replica r > 0 suffixes every whitespace token with a
  *    letter tag (`xr`), so WITHIN-replica near-dup/shingle structure
  *    is preserved exactly while CROSS-replica Jaccard/containment is
  *    0 and every token/simhash/minhash value differs — near-dup pair
  *    output grows exactly linearly by construction. (Naive
  *    replication would make every doc a 10-way exact dup and inflate
  *    pair outputs ~100×: a data property, not an engine cost, and it
  *    would drown the signal this rehearsal is after.)
  *  - embeddings: replica r > 0 adds a deterministic xxhash64-seeded
  *    unit-scale perturbation then re-normalizes, so vectors stay
  *    unit-norm (the quantization contract) but cross-replica cosine
  *    falls well below near-dup thresholds — cosine-pair and ANN
  *    candidate outputs also grow linearly, not quadratically.
  */
object ScaleUp {
  private val Stride = 1L << 40

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local("graft-scaleup")
    try run(spark, src, dst, factor)
    finally spark.stop()
  }

  /** Generation body, session-agnostic (ScaleUpSpec drives it on the
    * shared test session; main owns its own session lifecycle).
    */
  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    copyDims(spark, src, dst)
    replicateKeyed(spark, src, dst, factor, "customer", Seq("c_custkey"))
    replicateKeyed(spark, src, dst, factor, "supplier", Seq("s_suppkey"))
    replicateKeyed(spark, src, dst, factor, "part", Seq("p_partkey"))
    replicateKeyed(spark, src, dst, factor, "orders", Seq("o_orderkey", "o_custkey"))
    replicateKeyed(spark, src, dst, factor, "lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicateKeyed(spark, src, dst, factor, "events", Seq("event_id", "user_id"))
    replicateDocuments(spark, src, dst, factor)
    replicateEmbeddings(spark, src, dst, factor)
  }

  private def read(spark: SparkSession, dir: String, t: String): DataFrame =
    spark.read.parquet(s"$dir/$t.parquet")

  /** FACT tables repartition on write (round 17, BASELINE r17 appendix):
    * the sf0.1 source ships each table as ONE part file, and a
    * narrow-only replicate preserves that — so the sf10 rehearsal's
    * 76 MB documents.parquet was a single file whose initial scan ran
    * as ~1 task under the default 128 MB maxPartitionBytes, while the
    * production corpora these rehearsals stand in for are always
    * many-file. 32 output parts (= the session's shuffle partitions /
    * local cores) gives every scan stage real parallelism from the
    * first task. Round-robin repartition of a deterministic input is
    * itself deterministic, and no query depends on row order (every
    * window/rank carries a unique tiebreak — SURVEY §4). All sf1/sf10
    * decade readings re-baseline at the round-18 regeneration, as the
    * r17 appendix notes.
    */
  private def write(df: DataFrame, dst: String, t: String): Unit =
    df.repartition(32).write.mode("overwrite").parquet(s"$dst/$t.parquet")

  /** Dims stay single-file: real dimension tables don't grow with fact
    * volume, and a 5-row region table in 32 shards would just be noise.
    */
  private def copyDims(spark: SparkSession, src: String, dst: String): Unit =
    Seq("region", "nation").foreach(t =>
      read(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet"))

  /** The replica axis as a generated column — one scan, `factor`
    * output rows per input row, no union-of-scans (a 1000-file corpus
    * would pay the scan `factor` times otherwise).
    */
  private def withReplica(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("__r", explode(lit((0 until factor).toArray)))

  private def replicateKeyed(spark: SparkSession, src: String, dst: String,
      factor: Int, table: String, keyCols: Seq[String]): Unit = {
    val base = read(spark, src, table)
    val shifted = keyCols.foldLeft(withReplica(base, factor)) { (df, k) =>
      df.withColumn(k, col(k) + col("__r").cast("long") * Stride)
    }
    write(shifted.drop("__r"), dst, table)
  }

  private def replicateDocuments(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val base = withReplica(read(spark, src, "documents"), factor)
      .withColumn("doc_id", col("doc_id") + col("__r").cast("long") * Stride)
      .withColumn("text",
        when(col("__r") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            t => concat(t, lit("x"), col("__r"))))))
      .withColumn("n_chars", length(col("text")))
    write(base.drop("__r"), dst, "documents")
  }

  private def replicateEmbeddings(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    val base = withReplica(read(spark, src, "embeddings"), factor)
      .withColumn("vec_id", col("vec_id") + col("__r").cast("long") * Stride)
    // unit-scale deterministic noise per (vec_id, replica, dim), then
    // re-normalize — replicas land far from their source in cosine
    // space while keeping the unit-norm contract the ANN ops assume
    val noisy = base.withColumn("__v",
      when(col("__r") === 0, col("embedding")).otherwise(
        transform(col("embedding"), (x, i) =>
          x + ((pmod(xxhash64(col("vec_id"), col("__r"), i), lit(2001L)) - 1000L)
            .cast("float") / lit(1000.0f)))))
      .withColumn("__n", sqrt(aggregate(col("__v"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))))
      // replica 0 must stay BYTE-identical to the source: re-normalizing
      // it too would round-trip through double and can flip the
      // milli-quantized values the ANN kernels derive from it
      .withColumn("embedding",
        when(col("__r") === 0, col("embedding")).otherwise(
          transform(col("__v"), x => (x.cast("double") / col("__n")).cast("float"))))
    write(noisy.drop("__r", "__v", "__n"), dst, "embeddings")
  }
}
