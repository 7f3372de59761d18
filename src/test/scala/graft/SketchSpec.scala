package graft

import org.apache.spark.sql.functions._

/** Sketch-path accuracy: approximate aggregates are the constant-memory
  * 100 TB alternative to exact distinct/percentile — their error vs the
  * exact answers is a tested number, not an assumption.
  */
class SketchSpec extends SparkSpecBase {

  private lazy val ev = eventsDF

  test("approx_count_distinct within 5% of exact per group; query bands all true") {
    // the oracle-checked query emits (exact, within_band); the tighter
    // 5% accuracy is measured here on the raw sketch
    val got = Queries.queries("q_approx_distinct")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
    assert(got.nonEmpty)
    got.foreach { case (t, _, ok) => assert(ok, s"$t: within_band=false") }
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (t, exactFromQuery, _) =>
      assert(exactFromQuery == truth(t), s"$t: query exact ${exactFromQuery} != ${truth(t)}")
    }
    truth.foreach { case (t, d) =>
      val a = approx(t)
      assert(math.abs(a - d).toDouble / d <= 0.05, s"$t: approx=$a exact=$d")
    }
  }

  test("Misra-Gries heavy hitters: frequent tokens present, undercount within n/k") {
    import graft.functions.TextFns
    val k = 32
    // raw sketch entries, built exactly as the query builds them
    val mg = udaf(new graft.functions.MisraGries(k))
    val out = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), explode(TextFns.tokensFast(col("text"))).as("tok"))
      .groupBy("source").agg(mg(col("tok")).as("sketch"))
      .select(col("source"), explode(col("sketch")).as("e"))
      .select(col("source"), col("e._1").as("tok"), col("e._2").as("est"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = docs
      .select(col("source"), explode(TextFns.tokensFast(col("text"))).as("tok"))
      .groupBy("source", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = exact.groupMapReduce(_._1._1)(_._2)(_ + _) // tokens per source
    // guarantee 1: every token with true freq > n/k is in the sketch
    exact.foreach { case ((src, tok), c) =>
      if (c > n(src) / k)
        assert(out.contains((src, tok)), s"frequent token ($src, $tok) freq=$c missing")
    }
    // guarantee 2: estimates never overcount and undercount by <= n/k
    out.foreach { case ((src, tok), est) =>
      val truth = exact((src, tok))
      assert(est <= truth, s"($src, $tok): est=$est > true=$truth")
      assert(truth - est <= n(src) / k, s"($src, $tok): undercount ${truth - est} > ${n(src) / k}")
    }
    assert(out.nonEmpty)
    // and the oracle-checked query's contract surface agrees with the
    // exact side computed independently here
    val q = Queries.queries("q_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    n.foreach { case (src, total) =>
      val (nTok, nOver, boundsOk) = q(src)
      assert(nTok == total, s"$src: n_tokens $nTok != $total")
      val exactOver = exact.count { case ((s2, _), c) => s2 == src && c * k > total }
      assert(nOver == exactOver, s"$src: n_over $nOver != $exactOver")
      assert(boundsOk, s"$src: bounds_ok=false")
    }
  }

  test("Count-Min estimates: JVM and column hashes agree; est >= exact; overshoot within eps*n") {
    import graft.functions.{Sketches, TextFns}
    // the probe expression indexes the cells the JVM build incremented
    // only if the two tokenHash31 implementations are byte-identical
    val toks = Seq("the", "of", "naive", "Ünïcødé", "a b", "", "query")
    val colHashes = toks.foldLeft(Map.empty[String, Long]) { (m, t) =>
      m + (t -> spark.range(1).select(TextFns.tokenHash31(lit(t))).head().getLong(0))
    }
    toks.foreach(t => assert(Sketches.tokenHash31(t) == colHashes(t), t))

    val out = Queries.queries("q_cms_freq")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = docs
      .select(col("source"), explode(TextFns.tokensFast(col("text"))).as("tok"))
      .groupBy("source", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.foreach { case ((src, tok), (n, est)) =>
      val truth = exact.getOrElse((src, tok), 0L)
      // one-sided guarantee: counters only increase
      assert(est >= truth, s"($src, $tok): est=$est < true=$truth")
      // CM bound est <= true + eps*n with eps = e/width — holds per row
      // with prob 1-1/e over hash draws; with the fixed md5-affine
      // family and depth=4 rows we assert the bound itself on this
      // corpus (measured, and with margin: typical overshoot is ~n/width)
      val eps = math.E / 256
      assert(est - truth <= (eps * n).ceil.toLong,
        s"($src, $tok): overshoot ${est - truth} > eps*n=${(eps * n).ceil}")
    }
  }

  test("sampled triangle estimate lands within 2x of the exact count") {
    // DOULION p=1/2: unbiased, variance shrinks with triangle count —
    // at sf0.001 the deterministic sample sits within ~6% of exact;
    // 2x is the regression fence (a broken estimator is off by 8x:
    // forgetting the 1/p^3 rescale, or sampling after the wedge join)
    val exact = Queries.queries("q_triangles")(spark, sfDir)
      .agg(expr("sum(n_tri) div 3")).head().getLong(0)
    val row = Queries.queries("q_triangles_approx")(spark, sfDir).head()
    val est = row.getLong(2)
    assert(est >= 0L && row.getLong(1) * 8 == est, "estimate must be count * 1/p^3")
    assert(est >= exact / 2 && est <= exact * 2,
      s"sampled estimate $est vs exact $exact is outside the 2x fence")
  }

  test("q_ppl_buckets_scale tiers disagree with ntile only on boundary tie groups") {
    import org.apache.spark.sql.expressions.Window
    // per-doc ntile tier (the exact oracle twin's assignment)
    val perDoc = Queries.queries("q_bigram_lm")(spark, sfDir)
      .select(col("doc_id"), col("lm_milli"))
      .join(spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "lang"), Seq("doc_id"))
    val w = Window.partitionBy("lang").orderBy(col("lm_milli").desc, col("doc_id"))
    val ntiled = perDoc.withColumn("nt", ntile(3).over(w).cast("long"))
    // per-doc scale tier, recovered from the scale query's (lo, hi) bounds
    val scale = Queries.queries("q_ppl_buckets_scale")(spark, sfDir)
      .select(col("lang").as("s_lang"), col("tier"), col("lo_milli"), col("hi_milli"))
    val rows = ntiled.join(scale, col("lang") === col("s_lang") &&
        col("lm_milli") >= col("lo_milli") && col("lm_milli") <= col("hi_milli"))
      .select(col("lang"), col("doc_id"), col("lm_milli"), col("nt"), col("tier"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the scale tiers' value intervals tile each language exactly:
    // every doc lands in exactly one tier
    assert(rows.length == perDoc.count(), "scale tier intervals must partition each language's range")
    val byValueGroup = rows.groupBy(r => (r._1, r._3))
    val disagree = rows.filter(r => r._4 != r._5)
    disagree.foreach { r =>
      val grp = byValueGroup((r._1, r._3))
      assert(grp.map(_._4).distinct.length >= 2,
        s"doc ${r._2} (${r._1}, lm=${r._3}) got nt=${r._4} vs scale=${r._5} " +
          "but its tie group does not straddle an ntile boundary")
    }
    // at most 2 boundaries per language can straddle, so disagreement is
    // bounded by the total size of straddling tie groups
    val straddleMass = byValueGroup.valuesIterator
      .filter(g => g.map(_._4).distinct.length >= 2).map(_.length).sum
    assert(disagree.length <= straddleMass)
  }

  test("percentile_approx values land in the right quantile band (rank-based accuracy)") {
    // the oracle-checked query emits rank-contract booleans; assert
    // them, then measure the tighter 5% band on the raw sketch values
    val flags = Queries.queries("q_quantiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> Seq(r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
    assert(flags.nonEmpty)
    flags.foreach { case (t, oks) => assert(oks.forall(identity), s"$t: rank contract violated") }
    val got = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"), array(lit(0.5), lit(0.95), lit(0.99)), lit(1000)).as("qs"))
      .select(col("event_type"), element_at(col("qs"), 1), element_at(col("qs"), 2),
        element_at(col("qs"), 3))
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val qs = Seq(0.5, 0.95, 0.99)
    got.foreach { case (t, approxes) =>
      val vals = ev.filter(col("event_type") === t).select("value")
        .collect().map(_.getDouble(0)).sorted
      qs.zip(approxes).foreach { case (q, approx) =>
        val frac = vals.count(_ <= approx).toDouble / vals.length
        assert(math.abs(frac - q) <= 0.05, f"$t p$q: approx=$approx sits at quantile $frac%.3f")
      }
    }
  }

  // ---- KLL mergeable quantiles (plans/KllExprs.scala) ----

  private def kllCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.KllSketchAgg(org.apache.spark.sql.GraftBridge.expression(c), 200)
        .toAggregateExpression())
  private def kllQuantile(c: org.apache.spark.sql.Column, r: Double): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.KllQuantile(org.apache.spark.sql.GraftBridge.expression(c), r))

  test("KLL sketch: quantile estimates sit within 3% rank error of exact, per event type") {
    val vals = ev.select(col("event_type"), col("value").cast("double").as("v"))
    val sk = vals.groupBy("event_type").agg(kllCol(col("v")).as("sk"))
      .select(col("event_type"),
        kllQuantile(col("sk"), 0.25).as("q25"),
        kllQuantile(col("sk"), 0.5).as("q50"),
        kllQuantile(col("sk"), 0.9).as("q90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byType = vals.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(sk.nonEmpty && sk.keySet == byType.keySet)
    sk.foreach { case (t, (q25, q50, q90)) =>
      val xs = byType(t); val n = xs.length.toDouble
      def rankOf(v: Double): Double = xs.count(_ <= v) / n
      // k=200 gives ~1.65% rank error at 99% confidence; 3% is the slack band
      assert(math.abs(rankOf(q25) - 0.25) <= 0.03, s"$t q25=$q25 rank=${rankOf(q25)}")
      assert(math.abs(rankOf(q50) - 0.50) <= 0.03, s"$t q50=$q50 rank=${rankOf(q50)}")
      assert(math.abs(rankOf(q90) - 0.90) <= 0.03, s"$t q90=$q90 rank=${rankOf(q90)}")
    }
  }

  test("KLL union: merged per-type sketches answer GLOBAL quantiles within 3% rank error") {
    val vals = ev.select(col("event_type"), col("value").cast("double").as("v"))
    val per = vals.groupBy("event_type").agg(kllCol(col("v")).as("sk"))
    val union = org.apache.spark.sql.GraftBridge.column(
      graft.plans.KllUnionAgg(
        org.apache.spark.sql.GraftBridge.expression(col("sk")), 200).toAggregateExpression())
    val g = per.agg(union.as("gsk"))
      .select(kllQuantile(col("gsk"), 0.5).as("q50"), kllQuantile(col("gsk"), 0.9).as("q90"))
      .collect().head
    val xs = vals.select("v").collect().map(_.getDouble(0)).sorted
    val n = xs.length.toDouble
    def rankOf(v: Double): Double = xs.count(_ <= v) / n
    assert(math.abs(rankOf(g.getDouble(0)) - 0.5) <= 0.03, s"union q50=${g.getDouble(0)}")
    assert(math.abs(rankOf(g.getDouble(1)) - 0.9) <= 0.03, s"union q90=${g.getDouble(1)}")
  }

  test("KLL SQL surface: graft_kll_agg / graft_kll_union_agg / graft_kll_quantile") {
    GraftFunctions.register(spark)
    ev.select(col("event_type"), col("value").cast("double").as("v"))
      .createOrReplaceTempView("kll_ev")
    val row = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_union_agg(sk), 0.5) AS med,
               CAST(sum(n) AS BIGINT) AS n_total
         FROM (SELECT graft_kll_agg(v) AS sk, count(*) AS n FROM kll_ev GROUP BY event_type)"""
    ).collect().head
    val xs = ev.select(col("value").cast("double")).collect().map(_.getDouble(0)).sorted
    assert(row.getLong(1) == xs.length)
    val frac = xs.count(_ <= row.getDouble(0)).toDouble / xs.length
    assert(math.abs(frac - 0.5) <= 0.03, s"sql med=${row.getDouble(0)} rank=$frac")
  }

  test("q_kll_rollup: exact counts match; both rank bands true") {
    val r = Queries.queries("q_kll_rollup")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_total") == ev.count())
    assert(row.getAs[Boolean]("med_within_band") && row.getAs[Boolean]("p90_within_band"))
  }
}
