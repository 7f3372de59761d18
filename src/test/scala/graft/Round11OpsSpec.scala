package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-11 session-2 operators, verified against
  * independent in-memory recomputations (BigInt brute force) rather
  * than just the DuckDB oracle hashes: the Q9/Q11 shapes reconcile
  * against single-pass reconstructions of the join tree, the KMV
  * sketch contract is rebuilt from the raw hash sets, the moment sums
  * are re-derived in exact BigInt, and the epoch plan's accounting
  * identities hold.
  */
class Round11OpsSpec extends SparkSpecBase {

  test("q9_profit: total profit reconciles with a BigInt brute-force over the join tree") {
    val out = Queries.queries("q9_profit")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val cost = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_type") === "STANDARD")
      .collect().map(r => r.getAs[Long]("p_partkey") ->
        (BigDecimal(r.getAs[Double]("p_retailprice")).setScale(2) * 100).toBigIntExact.get).toMap
    val supNation = {
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
        .collect().map(r => r.getAs[Number]("n_nationkey").longValue -> r.getAs[String]("n_name")).toMap
      spark.read.parquet(s"$sfDir/supplier.parquet")
        .collect().map(r => r.getAs[Long]("s_suppkey") -> n(r.getAs[Number]("s_nationkey").longValue)).toMap
    }
    val orderYear = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = scala.collection.mutable.Map.empty[(String, Long), (BigInt, Long)]
    spark.read.parquet(s"$sfDir/lineitem.parquet").collect().foreach { r =>
      cost.get(r.getAs[Long]("l_partkey")).foreach { cc =>
        val ep = (BigDecimal(r.getAs[Double]("l_extendedprice")).setScale(2) * 100).toBigIntExact.get
        val de2 = BigDecimal(r.getAs[Double]("l_discount") * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigIntExact.get
        val profit = ep * (100 - de2) / 100 - cc * BigDecimal(r.getAs[Double]("l_quantity")).toBigIntExact.get
        val key = (supNation(r.getAs[Long]("l_suppkey")), orderYear(r.getAs[Long]("l_orderkey")))
        val (p0, n0) = expected.getOrElse(key, (BigInt(0), 0L))
        expected(key) = (p0 + profit, n0 + 1)
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("nation"), r.getAs[Long]("o_year"))
      val (p, n) = expected(key)
      assert(BigInt(r.getAs[Long]("profit_cents")) == p && r.getAs[Long]("n") == n,
        s"$key: got (${r.getAs[Long]("profit_cents")}, ${r.getAs[Long]("n")}) want ($p, $n)")
    }
  }

  test("q11_stock: returns exactly the parts above the 0.1% threshold, shares exact") {
    val out = Queries.queries("q11_stock")(spark, sfDir).collect()
    val suppIn = {
      val nk = spark.read.parquet(s"$sfDir/nation.parquet")
        .filter(col("n_name") === "NATION_3").collect().map(_.getAs[Number]("n_nationkey").longValue).toSet
      spark.read.parquet(s"$sfDir/supplier.parquet")
        .collect().filter(r => nk(r.getAs[Number]("s_nationkey").longValue)).map(_.getAs[Long]("s_suppkey")).toSet
    }
    val per = scala.collection.mutable.Map.empty[Long, (BigInt, Long)]
    spark.read.parquet(s"$sfDir/lineitem.parquet").collect().foreach { r =>
      if (suppIn(r.getAs[Long]("l_suppkey"))) {
        val ep = (BigDecimal(r.getAs[Double]("l_extendedprice")).setScale(2) * 100).toBigIntExact.get
        val k = r.getAs[Long]("l_partkey")
        val (v0, n0) = per.getOrElse(k, (BigInt(0), 0L))
        per(k) = (v0 + ep, n0 + 1)
      }
    }
    val tot = per.values.map(_._1).sum
    val want = per.filter { case (_, (v, _)) => v * 1000 > tot }
    assert(out.length == want.size && want.nonEmpty)
    out.foreach { r =>
      val (v, n) = want(r.getAs[Long]("p_partkey"))
      assert(BigInt(r.getAs[Long]("value_cents")) == v && r.getAs[Long]("n_lines") == n)
      assert(BigInt(r.getAs[Long]("share_bp")) == v * 10000 / tot)
    }
  }

  test("q_kmv_overlap: contract values match sketches rebuilt from the raw hash sets") {
    val out = Queries.queries("q_kmv_overlap")(spark, sfDir).collect()
    val hs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), explode(graft.functions.TextFns.tokensFast(col("text"))).as("t"))
      .select(col("source"), graft.functions.TextFns.tokenHash(col("t")).as("h"))
      .distinct().collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("h")).sorted.take(64).toVector).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = hs(r.getAs[String]("src_a")); val b = hs(r.getAs[String]("src_b"))
      val mk = (a ++ b).distinct.sorted.take(64)
      val common = mk.toSet.intersect(a.toSet).intersect(b.toSet).size
      assert(r.getAs[Long]("kmv_a") == a.last && r.getAs[Long]("kmv_b") == b.last)
      assert(r.getAs[Long]("kmv_union") == mk.last)
      assert(r.getAs[Long]("n_common") == common.toLong)
      assert(r.getAs[Long]("est_jacc_milli") == common.toLong * 1000 / mk.size)
      // union sketch's k-th min never exceeds either side's (more small
      // values can only pull the k-th statistic down)
      assert(r.getAs[Long]("kmv_union") <= math.min(r.getAs[Long]("kmv_a"), r.getAs[Long]("kmv_b")))
    }
  }

  test("q_moments: power sums and central-moment numerators match exact BigInt recomputation") {
    val out = Queries.queries("q_moments")(spark, sfDir).collect()
    val xs = eventsDF.select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("x"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(r => BigInt(r.getLong(1)))).toMap
    assert(out.length == xs.size)
    out.foreach { r =>
      val v = xs(r.getAs[String]("event_type"))
      val n = BigInt(v.size)
      val s1 = v.sum; val s2 = v.map(x => x * x).sum
      val s3 = v.map(x => x * x * x).sum; val s4 = v.map(x => x * x * x * x).sum
      assert(BigInt(r.getAs[Long]("n")) == n)
      // the big sums cross the contract surface as canonical digit
      // strings (see qMoments scaladoc) — parse and compare exactly
      assert(BigInt(r.getAs[String]("s1")) == s1)
      assert(BigInt(r.getAs[String]("s2")) == s2)
      assert(BigInt(r.getAs[String]("s3")) == s3)
      assert(BigInt(r.getAs[String]("s4")) == s4)
      val m2 = n * s2 - s1 * s1
      val m3 = n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1
      assert(BigInt(r.getAs[String]("m2num")) == m2)
      assert(BigInt(r.getAs[String]("m3num")) == m3)
      assert(m2 >= 0, "m2num (n^2 * variance) must be nonnegative")
      assert(r.getAs[Long]("skew_sign") == m3.signum.toLong)
    }
  }

  test("q_epoch_plan: accounting identities (epoch split exact, budget sums to ~2x corpus)") {
    val out = Queries.queries("q_epoch_plan")(spark, sfDir).collect()
    assert(out.nonEmpty)
    var sumBudget = BigInt(0); var sumTok = BigInt(0)
    out.foreach { r =>
      val tok = r.getAs[Long]("tok"); val b = r.getAs[Long]("budget_tokens")
      assert(r.getAs[Long]("epochs_full") * tok + r.getAs[Long]("residual_tokens") == b)
      assert(r.getAs[Long]("w") == math.floor(math.sqrt(tok.toDouble)).toLong)
      assert(r.getAs[Long]("residual_docs_est") <= r.getAs[Long]("n_docs"))
      sumBudget += b; sumTok += tok
    }
    // each source's floor loses < tt*2/tw of a token-unit; total
    // shortfall is < n_sources * (2*tt/tw) but never negative
    assert(sumBudget <= 2 * sumTok)
    assert(2 * sumTok - sumBudget < BigInt(out.length) * (2 * sumTok / out.map(_.getAs[Long]("w")).sum + 1))
  }

  test("q_ab_lift: arm counts and effect sizes match a direct per-user recomputation") {
    val r = Queries.queries("q_ab_lift")(spark, sfDir).collect().head
    val perUser = eventsDF.select(col("user_id"), col("event_type")).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.exists(_.getAs[String]("event_type") == "purchase")).toMap
    val u0 = perUser.count(_._1 % 2 == 0); val u1 = perUser.size - u0
    val c0 = perUser.count(kv => kv._1 % 2 == 0 && kv._2)
    val c1 = perUser.count(kv => kv._1 % 2 == 1 && kv._2)
    assert(r.getAs[Long]("u0") == u0 && r.getAs[Long]("u1") == u1)
    assert(r.getAs[Long]("c0") == c0 && r.getAs[Long]("c1") == c1)
    assert(r.getAs[Long]("conv0_permille") == c0.toLong * 1000 / u0)
    assert(r.getAs[Long]("conv1_permille") == c1.toLong * 1000 / u1)
    assert(r.getAs[Long]("lift_permille") == c1.toLong * 1000 / u1 - c0.toLong * 1000 / u0)
    assert(r.getAs[Long]("odds_num") == c1.toLong * (u0 - c0))
    assert(r.getAs[Long]("odds_den") == c0.toLong * (u1 - c1))
  }
}
