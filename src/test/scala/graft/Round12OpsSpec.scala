package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-12 operators, verified against independent
  * in-memory recomputations (BigInt / bit-twiddling brute force)
  * rather than just the DuckDB oracle hashes: the diversity fold is
  * re-derived from a Scala token-count map per doc, and the Morton
  * keys are re-interleaved bit by bit.
  */
class Round12OpsSpec extends SparkSpecBase {

  /** Mirror of TextFns.tokens / toksSql: lower, strip [(),";:'.], ws-split. */
  private def toks(text: String): Seq[String] =
    text.toLowerCase.replaceAll("""[(),";:'.]""", "").split("""\s+""").filter(_.nonEmpty).toSeq

  test("q_diversity: fold equals the brute-force count-map identities per doc") {
    val out = Queries.queries("q_diversity")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("coll_micro"), r.getAs[Long]("eff_types_milli"))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    var nonTrivial = 0
    docs.foreach { case (id, text) =>
      val tk = toks(text)
      if (tk.isEmpty) assert(!out.contains(id), s"doc $id: empty docs must be absent")
      else {
        val counts = tk.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = BigInt(tk.size)
        val ss = counts.values.map(c => BigInt(c) * c).sum
        val expected = (tk.size.toLong, counts.size.toLong,
          (ss * 1000000 / (n * n)).toLong, (n * n * 1000 / ss).toLong)
        assert(out(id) == expected, s"doc $id: got ${out(id)} want $expected")
        if (counts.size < tk.size) nonTrivial += 1
      }
    }
    assert(out.size == docs.count { case (_, t) => toks(t).nonEmpty })
    // the fold's run-length branch must actually execute somewhere
    assert(nonTrivial > 0, "corpus has no doc with a repeated token — fold untested")
  }

  test("q_diversity: bounds — types <= tokens, collision mass in (0, 1e6], eff types in [1000, 1000*types]") {
    val rows = Queries.queries("q_diversity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ty, cm, ef) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("coll_micro"), r.getAs[Long]("eff_types_milli"))
      assert(ty >= 1 && ty <= n)
      assert(cm > 0 && cm <= 1000000, s"coll_micro $cm out of range")
      assert(ef >= 1000 - 1 && ef <= 1000L * ty, s"eff_types_milli $ef vs types $ty")
    }
  }

  /** Reference bit-interleave: bit i of x lands at 2i, of y at 2i+1. */
  private def morton(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("q_zorder: buckets equal a brute-force Morton interleave of the same rows") {
    val out = Queries.queries("q_zorder")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("zbucket") ->
        (r.getAs[Long]("n"), r.getAs[Long]("min_u"), r.getAs[Long]("max_u"),
          r.getAs[Long]("min_v"), r.getAs[Long]("max_v"), r.getAs[Long]("span_sum"))).toMap
    val rows = eventsDF.select("user_id", "value").collect().map { r =>
      val ux = math.abs(r.getAs[Long]("user_id")) % 65536
      val cents = (BigDecimal(r.getAs[Double]("value")).setScale(2) * 100).toLongExact
      val vy = math.min(math.max(cents, 0L), 65535L)
      (morton(ux, vy) / 4194304, ux, vy)
    }
    val expected = rows.groupBy(_._1).map { case (b, xs) =>
      val us = xs.map(_._2); val vs = xs.map(_._3)
      b -> (xs.length.toLong, us.min, us.max, vs.min, vs.max,
        (us.max - us.min) + (vs.max - vs.min))
    }
    assert(out == expected)
  }

  private def driftTape: Seq[graft.streaming.StreamingOps.DriftIn] =
    eventsDF.select("event_type", "event_id", "value").collect()
      .map(r => graft.streaming.StreamingOps.DriftIn(
        r.getAs[String]("event_type"), r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .toSeq

  private def runDrift(batches: Seq[Seq[graft.streaming.StreamingOps.DriftIn]],
      name: String): Map[String, (Long, Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[graft.streaming.StreamingOps.DriftIn]
    val q = graft.streaming.StreamingOps.drift(ms.toDS()).toDF()
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update()).start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    // last snapshot per type = the one with the largest cumulative
    // count (a key only emits when it received events, so its
    // snapshots grow strictly batch over batch)
    spark.table(name).collect()
      .map(r => (r.getAs[String]("etype"),
        (r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Long]("tvMilli"))))
      .groupBy(_._1).map { case (k, xs) => k -> xs.maxBy(x => x._2._1 + x._2._2)._2 }
  }

  test("streaming drift: final snapshot per type equals the batch q_drift row") {
    val batch = Queries.queries("q_drift")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Long]("tv_milli"))).toMap
    val got = runDrift(Seq(driftTape), "t_drift_one")
    assert(got == batch)
    assert(got.nonEmpty && got.valuesIterator.forall { case (na, nb, tv) =>
      na > 0 && nb > 0 && tv >= 0 && tv <= 1000 })
  }

  test("streaming drift: micro-batch split invariance (3-way vs 1-way tape)") {
    val tape = driftTape
    val third = math.max(1, tape.length / 3)
    val split = tape.grouped(third).toSeq
    assert(split.length >= 3)
    assert(runDrift(split, "t_drift_split") == runDrift(Seq(tape), "t_drift_whole"))
  }

  test("streaming drift: one empty cohort reports the 1000-milli maximum") {
    import graft.streaming.StreamingOps.DriftIn
    val only = Seq(DriftIn("x", 0L, 10.0), DriftIn("x", 2L, 260.0), DriftIn("x", 4L, 510.0))
    val got = runDrift(Seq(only), "t_drift_vacuous")
    assert(got == Map("x" -> ((3L, 0L, 1000L))))
  }

  private def runQuantiles(batches: Seq[Seq[graft.streaming.KeyedEvent]],
      name: String): Map[Long, (Long, Double, Double)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[graft.streaming.KeyedEvent]
    val q = graft.streaming.StreamingOps.quantiles(ms.toDS()).toDF()
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update()).start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getAs[Long]("key"),
        (r.getAs[Long]("n"), r.getAs[Double]("q50"), r.getAs[Double]("q90"))))
      .groupBy(_._1).map { case (k, xs) => k -> xs.maxBy(_._2._1)._2 }
  }

  test("streaming quantiles: exact n per key; p50/p90 within 5% rank error; n batching-invariant") {
    val tape = eventsDF.select("user_id", "ts", "value").collect().map(r =>
      graft.streaming.KeyedEvent(r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000L, r.getAs[Double]("value"))).toSeq
    val byKey = tape.groupBy(_.key).view.mapValues(_.map(_.value).sorted).toMap
    val whole = runQuantiles(Seq(tape), "t_kll_whole")
    val split = runQuantiles(tape.grouped(math.max(1, tape.length / 4)).toSeq, "t_kll_split")
    assert(whole.keySet == byKey.keySet && split.keySet == byKey.keySet)
    // n is exact and invariant to micro-batching; estimates are
    // rank-banded (KLL compaction is randomized, so not bitwise)
    byKey.foreach { case (k, xs) =>
      assert(whole(k)._1 == xs.length && split(k)._1 == xs.length, s"key $k: n")
      val n = xs.length.toDouble
      for ((got, label) <- Seq(whole(k) -> "whole", split(k) -> "split")) {
        val r50 = xs.count(_ <= got._2) / n
        val r90 = xs.count(_ <= got._3) / n
        // small per-key streams (sf0.001: tens of events/key) quantize
        // rank in 1/n steps; 5% + one step covers the discretization
        assert(math.abs(r50 - 0.5) <= 0.05 + 1.0 / n, s"key $k $label p50 rank $r50")
        assert(math.abs(r90 - 0.9) <= 0.10 + 1.0 / n, s"key $k $label p90 rank $r90")
      }
    }
  }

  test("q_zorder: the Morton layout bounds BOTH dim spans per bucket (the data-skipping payoff)") {
    val rows = Queries.queries("q_zorder")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // top-10-bit bucket fixes 5 interleaved bits of each dim, so each
      // span is bounded by the remaining 11 bits: 2^11 - 1
      assert(r.getAs[Long]("max_u") - r.getAs[Long]("min_u") <= 2047,
        s"bucket ${r.getAs[Long]("zbucket")}: u span unbounded")
      assert(r.getAs[Long]("max_v") - r.getAs[Long]("min_v") <= 2047,
        s"bucket ${r.getAs[Long]("zbucket")}: v span unbounded")
    }
  }
}
