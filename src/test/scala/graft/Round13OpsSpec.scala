package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

/** Round-13 regression fences for the ADVICE-class latent bugs the
  * round-12 verdict flagged as fixed-but-untested, plus the bench
  * durability contract:
  *
  *  - q_ab_lift's arm assignment must be floored-mod on BOTH engines —
  *    a remainder-signed `%` mints a third arm (-1) for negative user
  *    ids and silently reshapes both cohorts.
  *  - The exact-moments power sums (batch q_moments + the streaming
  *    twin) must stay exact PAST the int64 domain: x³ of $30M cents
  *    is ~2.7e28 ≫ 2⁶³, so any long-typed intermediate wraps silently.
  *  - Bench durable artifacts must be append-only (round 12 lost its
  *    only full sf10 sweep record to a same-name overwrite).
  *  - The KLL SQL surface must reject wrong-typed args at ANALYSIS
  *    time (and implicitly cast numerics), not ClassCastException
  *    inside executors.
  */
class Round13OpsSpec extends SparkSpecBase {

  /** A tiny events.parquet-shaped table written to a temp dir, so the
    * table-reading queries run against adversarial rows the generator
    * never produces (negative user ids, $30M values).
    */
  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r13-events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("q_ab_lift: negative user_ids land in arms {0,1} via floored mod (no third arm)") {
    // user -3 and -1 must join arm 1, user -2 arm 0: remainder-signed %
    // would put all three in arm -1 and the max-when pivot would see
    // u0/u1 cohorts missing them entirely.
    val rows = Seq[(Long, java.sql.Timestamp, Long, String, Double, String)](
      (1L, ts(10), -3L, "purchase", 1.0, "{}"),
      (2L, ts(20), -2L, "view", 1.0, "{}"),
      (3L, ts(30), -1L, "view", 1.0, "{}"),
      (4L, ts(40), 0L, "purchase", 1.0, "{}"),
      (5L, ts(50), 1L, "purchase", 1.0, "{}"),
      (6L, ts(60), 2L, "view", 1.0, "{}"))
    val dir = writeEvents(rows)
    val out = Queries.queries("q_ab_lift")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // floored-mod cohorts: arm0 = {-2, 0, 2} (conv: 0), arm1 = {-3, -1, 1} (conv: -3, 1)
    assert(r.getAs[Long]("u0") == 3L && r.getAs[Long]("c0") == 1L,
      s"arm0 cohort wrong: $r")
    assert(r.getAs[Long]("u1") == 3L && r.getAs[Long]("c1") == 2L,
      s"arm1 cohort wrong: $r")
    assert(r.getAs[Long]("conv0_permille") == 333L)
    assert(r.getAs[Long]("conv1_permille") == 666L)
    assert(r.getAs[Long]("lift_permille") == 333L)
  }

  test("q_moments: power sums stay exact past 2^63 ($10M values; x^3 = 1e27)") {
    // value $10,000,000.00 → x = 1e9 cents; x³ = 1e27 and x⁴ = 1e36
    // both exceed int64 (2⁶³ ≈ 9.2e18) — a wrapped long intermediate
    // anywhere in the pipeline diverges from this BigInt recomputation.
    // (Σx⁴ = 3e36 stays inside DECIMAL(38,0): the SUM domain, not just
    // the per-element domain, bounds the usable |cents|.)
    val big = 10000000.0
    val rows = Seq[(Long, java.sql.Timestamp, Long, String, Double, String)](
      (1L, ts(10), 1L, "pay", big, "{}"),
      (2L, ts(20), 2L, "pay", big, "{}"),
      (3L, ts(30), 3L, "pay", -big, "{}"))
    val dir = writeEvents(rows)
    val r = Queries.queries("q_moments")(spark, dir)
      .filter(col("event_type") === "pay").collect().head
    val x = BigInt(1000000000L)
    val (n, s1) = (BigInt(3), x)                       // x + x - x
    val s2 = 3 * x * x
    val s3 = x.pow(3)                                  // x³ + x³ - x³
    val s4 = 3 * x.pow(4)
    assert(r.getAs[Long]("n") == 3L)
    assert(BigInt(r.getAs[String]("s1")) == s1)
    assert(BigInt(r.getAs[String]("s2")) == s2)
    assert(BigInt(r.getAs[String]("s3")) == s3)
    assert(BigInt(r.getAs[String]("s4")) == s4)
    assert(BigInt(r.getAs[String]("m2num")) == n * s2 - s1 * s1)
    assert(BigInt(r.getAs[String]("m3num")) ==
      n * n * s3 - 3 * n * s2 * s1 + 2 * s1.pow(3))
    assert(r.getAs[Long]("skew_sign") ==
      (n * n * s3 - 3 * n * s2 * s1 + 2 * s1.pow(3)).signum.toLong)

    // Past the SUM domain ($30M × 3 rows → Σx⁴ = 2.43e38 > 10³⁸) the
    // failure must be LOUD (ANSI decimal-sum overflow), never a wrap.
    val dirBig = writeEvents(Seq[(Long, java.sql.Timestamp, Long, String, Double, String)](
      (1L, ts(10), 1L, "pay", 30000000.0, "{}"),
      (2L, ts(20), 2L, "pay", 30000000.0, "{}"),
      (3L, ts(30), 3L, "pay", 30000000.0, "{}")))
    val e = intercept[Exception] {
      Queries.queries("q_moments")(spark, dirBig).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.getMessage.contains("ARITHMETIC_OVERFLOW")),
      s"expected a loud decimal overflow, got: $e")
  }

  test("StreamingOps.moments: exact past 2^63 and micro-batch invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = 1000000000L // $10M: x³ = 1e27 ≫ 2⁶³; Σx⁴ = 5e36 inside DECIMAL(38,0)
    val vals = Seq(cents, cents, -cents, cents, -cents)
    def run(batches: Seq[Seq[Long]]): Map[String, (Long, BigInt, BigInt, BigInt, BigInt, BigInt, BigInt)] = {
      val ms = MemoryStream[Long]
      val out = StreamingOps.moments(
        ms.toDS().toDF("c").withColumn("k", lit("g")), "k", "c")
      val name = s"r13_moments_${batches.length}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect().map { r =>
        r.getAs[String]("k") -> ((r.getAs[Long]("n"),
          BigInt(r.getAs[java.math.BigDecimal]("s1").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("s2").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("s3").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("s4").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("m2num").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("m3num").toBigInteger)))
      }.toMap
    }
    val x = BigInt(cents)
    val (n, s1, s2) = (BigInt(5), x, 5 * x * x)
    val s3 = x.pow(3)
    val expected = (5L, s1, s2, s3, 5 * x.pow(4),
      n * s2 - s1 * s1, n * n * s3 - 3 * n * s2 * s1 + 2 * s1.pow(3))
    val oneBatch = run(Seq(vals))
    val split = run(Seq(vals.take(2), vals.slice(2, 4), vals.drop(4)))
    assert(oneBatch("g") == expected, s"one-batch: ${oneBatch("g")}")
    assert(split("g") == expected, "micro-batch split changed the exact state")
  }

  test("Bench.durableWrite: two consecutive writes land in two files, nothing clobbered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r13-bench").toString
    val p1 = Bench.durableWrite("bench_sfX_r99", """{"run":1}""", dir)
    val p2 = Bench.durableWrite("bench_sfX_r99", """{"run":2}""", dir)
    val p3 = Bench.durableWrite("bench_sfX_r99", """{"run":3}""", dir)
    assert(p1.isDefined && p2.isDefined && p3.isDefined)
    assert(Set(p1.get, p2.get, p3.get).size == 3, "paths must be distinct")
    def read(p: java.nio.file.Path) = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
    assert(read(p1.get) == """{"run":1}""", "first write must survive later writes")
    assert(read(p2.get) == """{"run":2}""")
    assert(read(p3.get) == """{"run":3}""")
    assert(p1.get.getFileName.toString == "bench_sfX_r99.json")
    assert(p2.get.getFileName.toString == "bench_sfX_r99_2.json")
  }

  test("RestartRehearsal: mid-tape kill + checkpoint recovery reaches output parity") {
    import graft.streaming.RestartRehearsal
    val work = java.nio.file.Files.createTempDirectory("graft-r13-restart").toString
    val tapeDir = s"$work/tape"
    val rows = RestartRehearsal.buildTape(spark, sfDir, tapeDir, nChunks = 6)
    assert(rows > 0)
    // one append-mode (per-event session assignment) and one
    // update-mode (KLL quantile monitor) op, killed after batch 1 of 6
    RestartRehearsal.ops(spark)
      .filter(o => o.name == "sessionize" || o.name == "quantiles")
      .foreach { op =>
        val name = op.name
        RestartRehearsal.runOnce(spark, tapeDir, s"$work/$name/ref_out",
          s"$work/$name/ref_ckpt", op, None)
        val rec = RestartRehearsal.runOnce(spark, tapeDir, s"$work/$name/rec_out",
          s"$work/$name/rec_ckpt", op, Some(1))
        assert(rec.effective, s"$name: the kill landed after the tape drained " +
          s"(stop_batch=${rec.stopBatch}, final_batch=${rec.finalBatch}) — parity vacuous")
        val a = RestartRehearsal.outputSignature(spark, s"$work/$name/ref_out", op.snapKey)
        val b = RestartRehearsal.outputSignature(spark, s"$work/$name/rec_out", op.snapKey)
        assert(a.nonEmpty, s"$name: empty reference output")
        assert(a == b, s"$name: recovered output diverged " +
          s"(${a.length} vs ${b.length} rows; first diff: ${a.diff(b).headOption})")
      }
  }

  test("TopKPairsAgg equals the rank-window top-k bit-for-bit (ties, small groups, any partitioning)") {
    import spark.implicits._
    import graft.functions.VectorFns
    // adversarial: heavy score ties (broken by id ASC), groups with
    // fewer than k members, and a 13-way repartition so partial/merge
    // schedules actually vary
    val rows = (1 to 5000).map { i =>
      ((i % 37).toLong, (i * 2654435761L) % 100, (i * 48271L) % 100000)
    }.distinct
    val df = rows.toDF("g", "score", "id").repartition(13)
    val viaAgg = df.groupBy("g")
      .agg(VectorFns.topKPairs(col("score"), col("id"), 5).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.score").as("score"), col("col.id").as("id"),
        (col("pos") + 1).cast("int").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWin = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(viaAgg.length == viaWin.length && viaAgg.sameElements(viaWin),
      s"agg vs window diverged; first diff: ${viaAgg.zip(viaWin).find(p => p._1 != p._2)}")
    // ascending-metric form: negated score == ORDER BY metric ASC
    val viaAggAsc = df.groupBy("g")
      .agg(VectorFns.topKPairs(-col("score"), col("id"), 3).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (-col("col.score")).as("score"), col("col.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").asc, col("id"))
    val viaWinAsc = df.withColumn("r", row_number().over(wAsc)).filter(col("r") <= 3)
      .select("g", "score", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(viaAggAsc.sameElements(viaWinAsc))
  }

  test("personalizedPageRank equals the hand-unrolled seed-gated recurrence on a toy graph") {
    import spark.implicits._
    // path 0-1-2-3 plus triangle 3-4-5; seeds = ids % 5 == 0 → {0, 5}
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
      .toDF("id_a", "id_b")
    val got = graft.operators.Relational
      .personalizedPageRank(pairs, "id_a", "id_b", col("id") % 5 === 0, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side brute force of the exact integer recurrence
    val und = Seq((0L,1L),(1L,2L),(2L,3L),(3L,4L),(4L,5L),(3L,5L))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val seeds = deg.keySet.filter(_ % 5 == 0)
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> (if (seeds(n)) 1000000L else 0L) }
    for (_ <- 1 to 3) {
      val contrib = und.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum }
      pr = deg.map { case (n, _) =>
        n -> ((if (seeds(n)) 150000L else 0L) + 850L * contrib.getOrElse(n, 0L) / 1000L) }
    }
    assert(got == pr, s"got $got\nexpected $pr")
    // seeds dominate; mass reaches non-seeds only through edges
    assert(got(0L) > got(2L) && got(5L) > got(2L))
  }

  test("KLL SQL surface: numeric args cast implicitly, wrong-typed args fail analysis") {
    GraftFunctions.register(spark)
    // INT input: ImplicitTypeCasts inserts int→double, so the agg runs
    // (pre-fix this ClassCastException'd at executor runtime).
    val med = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_agg(CAST(id AS INT)), 0.5d) AS med
        FROM range(0, 1001)""").collect().head.getDouble(0)
    assert(med >= 400.0 && med <= 600.0, s"median of 0..1000 way off: $med")
    // BINARY into the value agg: no implicit cast to double → analysis error.
    intercept[AnalysisException] {
      spark.sql("SELECT graft_kll_agg(CAST(NULL AS BINARY)) FROM range(10)").collect()
    }
    // INT into the union/probe (binary-typed): analysis error, not a
    // runtime ClassCastException.
    intercept[AnalysisException] {
      spark.sql("SELECT graft_kll_union_agg(id) FROM range(10)").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT graft_kll_quantile(id, 0.5d) FROM range(10)").collect()
    }
  }
}
