package graft

/** The SQL registration surface: every graft_* function is callable
  * from pure spark.sql with sane literal ergonomics.
  */
class SqlSurfaceSpec extends SparkSpecBase {

  test("all graft_* functions are callable from SQL") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").limit(20).createOrReplaceTempView("d")
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20).createOrReplaceTempView("e")
    val toks = """filter(split(regexp_replace(lower(text), '[(),";:\'.]', ''), '\\s+'), x -> x != '')"""
    assert(spark.sql(s"SELECT graft_minhash_bands($toks) FROM d").count() == 20)
    assert(spark.sql(s"SELECT graft_simhash32($toks) FROM d").count() == 20)
    assert(spark.sql(s"SELECT graft_lang_scores($toks) FROM d").count() == 20)
    assert(spark.sql("SELECT graft_text_stats(text) FROM d").count() == 20)
    assert(spark.sql(s"SELECT graft_ngrams($toks, 3) FROM d").count() == 20)
    // char n-grams: SQL form == the sliding-substring definition, and a
    // window-simhash signature composes in pure SQL
    val cg = spark.sql(
      "SELECT graft_char_grams('abcde', 4) AS g, graft_simhash32(graft_char_grams(text, 4)) AS p FROM d")
      .collect()
    assert(cg.length == 20 && cg.head.getSeq[String](0) == Seq("abcd", "bcde"))
    assert(spark.sql("SELECT graft_char_grams('ab', 4) AS g").collect()(0).getSeq[String](0).isEmpty)
    // the pixel-block perceptual hash is SQL-callable and 32-bit
    val bhv = spark.sql("SELECT graft_blockhash32(text) AS h FROM d").collect()
    assert(bhv.length == 20 && bhv.forall { r =>
      val h = r.getLong(0); h >= 0L && h < (1L << 32)
    })
    assert(spark.sql("SELECT graft_blockhash32('') AS h").collect()(0).getLong(0) == 0L)
    assert(spark.sql(s"SELECT graft_fingerprint($toks) FROM d").count() == 20)
    // self-agreement of a signature is always the full 16
    val selfAg = spark.sql(
      s"SELECT graft_eq_count(graft_minhash_sig($toks), graft_minhash_sig($toks)) AS a FROM d")
      .collect().flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(selfAg.nonEmpty && selfAg.forall(_ == 16L))
    assert(spark.sql(
      "SELECT graft_qdot(graft_quantize(embedding), graft_quantize(embedding)) FROM e").count() == 20)
    assert(spark.sql(
      "SELECT graft_lsh_buckets(graft_quantize(embedding), 8, 4) FROM e").count() == 20)
    // int literal centroids widen implicitly to bigint
    val probes = spark.sql(
      """SELECT graft_ivf_probes(graft_quantize(array(cast(0.9 as float), cast(0.1 as float))),
                                 array(array(0, 0), array(1000, 0), array(0, 1000)), 2) AS p""")
      .collect()(0).getSeq[Long](0)
    assert(probes == Seq(1L, 0L))
    // classifier logit: default and explicit bucket counts agree
    val tl = spark.sql(
      s"SELECT graft_token_logit($toks) AS a, graft_token_logit($toks, 4096) AS b FROM d")
      .collect()
    assert(tl.length == 20 && tl.forall(r => r.getLong(0) == r.getLong(1)))
    // outer moments of a d-vector: d(d+1)/2 + d slots, diagonal first
    val om = spark.sql(
      """SELECT graft_outer_moments(graft_quantize(array(cast(1.0 as float), cast(2.0 as float)))) AS m""")
      .collect()(0).getSeq[Long](0)
    assert(om == Seq(1000L * 1000, 1000L * 2000, 2000L * 2000, 1000L, 2000L))
    // the Misra-Gries UDAF aggregates from pure SQL
    val hh = spark.sql(
      s"SELECT source, graft_heavy_hitters(tok) AS sk FROM " +
        s"(SELECT source, explode($toks) AS tok FROM d) GROUP BY source")
      .collect()
    assert(hh.nonEmpty && hh.forall(!_.isNullAt(1)))
    // DISTINCT and FILTER modifiers must survive registration: the
    // builder returns the bare AggregateFunction so the analyzer can
    // wrap it (pre-wrapping in toAggregateExpression broke both)
    val hhD = spark.sql(
      "SELECT graft_heavy_hitters(DISTINCT t) FROM VALUES ('x'),('x'),('y') AS v(t)")
      .collect()
    assert(hhD.length == 1 && hhD(0).getSeq[Any](0).length == 2)
    val hhF = spark.sql(
      "SELECT graft_heavy_hitters(t) FILTER (WHERE t <> 'y') " +
        "FROM VALUES ('x'),('x'),('y') AS v(t)")
      .collect()
    assert(hhF.length == 1 && hhF(0).getSeq[Any](0).length == 1)
    // the Count-Min UDAF: 4x256 flat matrix, each row sums to the input size
    val cms = spark.sql(
      "SELECT graft_cms(t) FROM VALUES ('x'),('x'),('y') AS v(t)").collect()
    assert(cms.length == 1)
    val sk = cms(0).getSeq[Long](0)
    assert(sk.length == 4 * 256)
    (0 until 4).foreach { i =>
      assert(sk.slice(i * 256, (i + 1) * 256).sum == 3L, s"row $i")
    }
  }

  test("wrong arity is a clean usage error, not a raw exception") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_fingerprint(array('a'), 42)").collect()
    }
    assert(e.getMessage.contains("graft_fingerprint expects (tokens)"), e.getMessage)
  }
}
