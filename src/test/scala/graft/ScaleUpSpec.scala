package graft

import org.apache.spark.sql.functions._

/** Contracts of the sf-rehearsal generator (graft.ScaleUp) — the sf1
  * bench evidence in BASELINE.md is only as good as this construction:
  * row counts scale by exactly `factor` (dims excluded), replica key
  * spaces never collide, referential integrity survives the shift,
  * document replicas stay near-dup-isolated ACROSS replicas while
  * preserving within-replica structure, and embedding replicas keep
  * the unit-norm contract the quantized-ANN kernels assume.
  */
class ScaleUpSpec extends SparkSpecBase {

  private val factor = 3
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleup").toString
    graft.ScaleUp.run(spark, sfDir, dir, factor)
    dir
  }

  test("fact tables scale by exactly factor; dims copy as-is") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val n0 = spark.read.parquet(s"$sfDir/$t.parquet").count()
      val n1 = spark.read.parquet(s"$out/$t.parquet").count()
      assert(n1 == factor * n0, s"$t: $n0 -> $n1")
    }
    for (t <- Seq("region", "nation")) {
      val n0 = spark.read.parquet(s"$sfDir/$t.parquet").count()
      assert(spark.read.parquet(s"$out/$t.parquet").count() == n0, t)
    }
  }

  test("replica key spaces are disjoint and referential integrity holds") {
    // every lineitem FK resolves after the shift (the join shape the
    // relational headline queries depend on)
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ok = spark.read.parquet(s"$out/orders.parquet").select(col("o_orderkey").as("k"))
    val dangling = li.join(ok, li("l_orderkey") === ok("k"), "left_anti").count()
    assert(dangling == 0L)
    // replica bands: each key sits in exactly one stride band < factor
    val bands = spark.read.parquet(s"$out/documents.parquet")
      .select((col("doc_id") / lit(1L << 40)).cast("long").as("r"))
      .distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(bands == (0L until factor).toSeq, bands)
  }

  test("replica 0 is the identity slice for documents") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val r0 = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("doc_id") < (1L << 40))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r0 == src)
  }

  test("replica 0 is the BIT-identity slice for embeddings") {
    // a renormalize of replica 0 would round-trip through double and
    // can flip milli-quantized values the ANN kernels derive from it —
    // so compare raw float bits, not approximate cosine
    def vecs(path: String, pred: org.apache.spark.sql.Column) =
      spark.read.parquet(path).filter(pred)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(java.lang.Float.floatToRawIntBits).toSeq)
        .toMap
    val src = vecs(s"$sfDir/embeddings.parquet", lit(true))
    val r0 = vecs(s"$out/embeddings.parquet", col("vec_id") < (1L << 40))
    assert(r0 == src)
  }

  test("document replicas share zero tokens across replicas but keep within-replica token structure") {
    val d = spark.read.parquet(s"$out/documents.parquet")
      .withColumn("r", (col("doc_id") / lit(1L << 40)).cast("long"))
      .select(col("r"), explode(functions.TextFns.tokens(col("text"))).as("tok"))
    // a token appearing in two replicas would re-couple the near-dup
    // graphs and break the linear-pair-growth argument
    val crossReplica = d.groupBy("tok").agg(countDistinct("r").as("nr"))
      .filter(col("nr") > 1).count()
    assert(crossReplica == 0L)
    // within a replica, the distinct-token count matches replica 0's
    // (the tag is a bijection on the token space)
    val perReplica = d.distinct().groupBy("r").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perReplica.values.toSet.size == 1, perReplica)
  }

  test("embedding replicas stay unit-norm and land far from their source in cosine") {
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val norms = e.select(sqrt(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))).as("n"))
      .agg(min("n").as("lo"), max("n").as("hi")).collect()(0)
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-3 && math.abs(norms.getDouble(1) - 1.0) < 1e-3)
    // replica r>0 of a vector must NOT be a near-dup of its source
    // (cosine < 0.9), or pair outputs would grow ~factor² instead of
    // linearly
    val base = e.filter(col("vec_id") < (1L << 40))
      .select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val rep = e.filter(col("vec_id") >= (1L << 40))
      .select(pmod(col("vec_id"), lit(1L << 40)).as("b_id"), col("embedding").as("rv"))
    val maxCos = rep.join(base, "b_id")
      .select(aggregate(zip_with(col("bv"), col("rv"), (a, b) =>
        a.cast("double") * b.cast("double")), lit(0.0), (acc, x) => acc + x).as("cos"))
      .agg(max("cos")).collect()(0).getDouble(0)
    assert(maxCos < 0.9, s"max source-replica cosine $maxCos")
  }
}
