package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over embedding columns (Array[Float]).
  *
  * Portability note (SURVEY.md §4): scores used in cross-engine-checked
  * queries are *integer* dot products over milli-quantized components
  * (floor(x*1000)) — exact and associative, so ranking is bit-stable in
  * any engine. Float cosine variants are provided for real use where an
  * oracle isn't in the loop.
  */
object VectorFns {

  /** Quantize a float vector to integer milli-units: floor(x*1000). */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, p) => s + p)

  /** Float dot product / norms / cosine for production similarity. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, p) => s + p)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k neighbors of `queries` within `corpus` by
    * quantized dot product (valid cosine proxy for unit vectors).
    * The query set is broadcast; the corpus is scanned once — the
    * correctness baseline ANN. Rank ties break on neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), qdot(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket id (8 planes → 8-bit bucket) over the
    * quantized vector. Hyperplane weights are a fixed integer formula
    * `((j*37 + d*17) mod 21) - 10` so the bucket is engine-portable.
    * Scale path for ANN: equi-join on bucket, then exact re-rank.
    */
  def lshBucket(v: Column, planes: Int = 8, dims: Int = 64): Column = {
    val qv = quantize(v)
    aggregate(
      transform(
        sequence(lit(0), lit(planes - 1)),
        j =>
          when(
            aggregate(
              zip_with(qv, sequence(lit(0), lit(dims - 1)), (x, d) => x * ((j * 37 + d * 17) % 21 - 10)),
              lit(0L), (s, p) => s + p
            ) >= 0,
            pow(lit(2.0), j).cast("long")
          ).otherwise(0L)
      ),
      lit(0L),
      (a, b) => a + b
    )
  }

  /** Bucketed ANN: only score pairs sharing an LSH bucket, then top-k
    * re-rank. Same output shape as bruteForceTopK but shuffle-bounded —
    * at 100 TB the bucket join replaces the full cross product.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"),
      lshBucket(col(vecCol)).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"),
      lshBucket(col(vecCol)).as("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), qdot(col("qv"), col("cv")).as("score"))
      .groupBy("query_id", "neighbor_id").agg(max("score").as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
