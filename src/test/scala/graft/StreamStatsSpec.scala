package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-5 operators, checked by properties a user
  * relies on (not just oracle hashes): each query is cross-checked
  * against an INDEPENDENT recomputation taking a different route to
  * the same answer (fold vs window frames, raw gram strings vs span
  * hashes, lead-window vs zipped-slice bigrams, brute-force range join
  * vs union-merge as-of), plus structural invariants (funnels bounded,
  * bins uniform and monotone, intervals tiling, handshake identity).
  */
class StreamStatsSpec extends SparkSpecBase {

  test("q_running_stats: final running row agrees with the per-key fold") {
    val out = Queries.queries("q_running_stats")(spark, sfDir)
    // last row per user (pos == per-user count) carries the full sum
    val last = out.groupBy("user_id")
      .agg(max("pos").as("n"), max_by(col("run_sum"), col("pos")).as("final_sum"))
    val fold = Queries.queries("q_fold_agg")(spark, sfDir)
      .select(col("user_id"), col("n").as("n2"), col("sum_value"))
    val joined = last.join(fold, "user_id")
    assert(joined.filter(col("n") =!= col("n2")).isEmpty)
    assert(joined.filter(col("final_sum") =!= col("sum_value")).isEmpty)
    // moving average stays within the per-user [min, max] value range
    val rng = eventsDF
      .groupBy("user_id")
      .agg((min("value") * 1000).as("lo"), (max("value") * 1000).as("hi"))
    val bad = out.join(rng, "user_id")
      .filter(col("mov_avg_milli") < col("lo") - 1 || col("mov_avg_milli") > col("hi") + 1)
    assert(bad.isEmpty)
  }

  test("q_ewma + q_cusum: closed/array forms equal the literal driver-side recurrences") {
    val tape = eventsDF
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.sortBy(r => (r._2, r._3)).map(_._4).toSeq }
    // EWMA: literal e0=v0, ei=(300*vi+700*e(i-1)) div 1000
    val ewma = Queries.queries("q_ewma")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((u, vs) <- tape) {
      val e = vs.tail.foldLeft(vs.head)((acc, x) => (300L * x + 700L * acc) / 1000L)
      assert(ewma(u) == ((vs.size.toLong, e)), s"user $u ewma")
    }
    // CUSUM: literal s_i = max(0, s_(i-1) + (v_i - mu)); the query's
    // prefix-sum/running-min closed form must reproduce peak AND resets
    val cusum = Queries.queries("q_cusum")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((u, vs) <- tape) {
      val mu = vs.sum / vs.size
      var s = 0L; var peak = 0L; var resets = 0L
      for (v <- vs) {
        s = math.max(0L, s + (v - mu))
        if (s > peak) peak = s
        if (s == 0L) resets += 1
      }
      assert(cusum(u) == ((vs.size.toLong, mu, peak, resets)), s"user $u cusum")
    }
    // OLS trend: literal num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)² over
    // the SAME (ts, event_id)-ordered tape with x = 0-based index
    val slope = Queries.queries("q_trend_slope")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    for ((u, vs) <- tape) {
      val n = vs.size.toLong
      val xs = vs.indices.map(_.toLong)
      val sx = xs.sum; val sy = vs.sum
      val sxy = xs.zip(vs).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val trend = if (num > 0) "up" else if (num < 0) "down" else "flat"
      assert(slope(u) == ((n, num, den, trend)), s"user $u trend")
    }
    // lag-1 autocorrelation: literal floor-mean deviations fold
    val ac = Queries.queries("q_autocorr")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    for ((u, vs) <- tape) {
      val mu = vs.sum / vs.size
      val ds = vs.map(_ - mu)
      val den = ds.map(d => d * d).sum
      val num = ds.zip(ds.tail).map { case (a, b) => a * b }.sum
      val sign = if (num > 0) "pos" else if (num < 0) "neg" else "zero"
      assert(ac(u) == ((vs.size.toLong, mu, den, num, sign)), s"user $u autocorr")
    }
  }

  test("q_span_dedup: ratios in range; counts match a raw-gram-string recomputation") {
    val out = Queries.queries("q_span_dedup")(spark, sfDir)
    assert(out.filter(col("n_dup_spans") > col("n_spans")).isEmpty)
    assert(out.filter(col("dup_milli") < 0 || col("dup_milli") > 1000).isEmpty)
    // docs with >= 8 tokens all emit a row; shorter docs never do
    val eligible = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(graft.functions.TextFns.tokens(col("text"))).as("nt"))
    assert(out.count() == eligible.filter(col("nt") >= 8).count())
    // independent recomputation over RAW gram strings (declarative
    // path, join-based df instead of count-over-partition) — also
    // proves the 60-bit span hashes are collision-free at this scale
    import org.apache.spark.sql.expressions.Window
    val gr = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        explode(graft.functions.DedupFns.wordNgrams(col("text"), 8)).as("gram"))
    val ref = gr
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ns"), count(when(col("df") >= 2, 1)).as("nd"))
    val j = out.join(ref, "doc_id")
    assert(j.filter(col("n_spans") =!= col("ns") || col("n_dup_spans") =!= col("nd")).isEmpty)
    // the corpus's near-duplicates actually exercise the signal
    assert(out.filter(col("n_dup_spans") > 0).count() > 0, "no shared spans in corpus")
  }

  test("q_term_scrub: hit accounting exact; scrub is order-preserving and complete") {
    val out = Queries.queries("q_term_scrub")(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = graft.functions.TextFns.tokens(col("text"))
    val clean = Seq("spark", "customer", "vector")
      .foldLeft(toks)((c, t) => array_remove(c, t))
    // independent recomputation straight off the text column
    val ref = docs.select(col("doc_id"),
      size(toks).cast("long").as("nt"),
      (size(toks) - size(clean)).cast("long").as("nh"),
      md5(concat_ws(" ", clean)).as("fp"))
    val j = out.join(ref, "doc_id")
    assert(j.filter(col("n_tokens") =!= col("nt") || col("n_hits") =!= col("nh") ||
      col("scrub_fp") =!= col("fp")).isEmpty)
    // the corpus actually exercises the scrub
    assert(out.agg(sum("n_hits")).head().getLong(0) > 0)
  }

  test("q_bigram_lift: counts match an independent lead-window recomputation") {
    val out = Queries.queries("q_bigram_lift")(spark, sfDir)
    assert(out.filter(col("c_xy") < 5).isEmpty)
    assert(out.filter(col("lift_milli") < 0).isEmpty)
    // recompute adjacency counts with posexplode + lead (a different
    // formation than the zipped-slice path)
    import org.apache.spark.sql.expressions.Window
    val terms = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), posexplode(graft.functions.TextFns.tokens(col("text"))))
      .toDF("doc_id", "pos", "term")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val ref = terms.withColumn("nxt", lead("term", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("term").as("x"), col("nxt").as("y"))
      .agg(count(lit(1)).as("c_ref"))
    val j = out.join(ref, Seq("x", "y"), "left")
    assert(j.filter(col("c_ref").isNull || col("c_xy") =!= col("c_ref")).isEmpty)
  }

  test("q_outliers: rank accounting exact; above-mass bounded by the cutoff") {
    val out = Queries.queries("q_outliers")(spark, sfDir)
    // n_above is exactly n - (n*95) div 100 (ranks are unique)
    assert(out.filter(col("n_above") =!= col("n") - expr("(n * 95) div 100")).isEmpty)
    // every above-cutoff value is >= the cutoff value
    assert(out.filter(col("sum_above_cents") < col("n_above") * col("cut_cents")).isEmpty)
    val totals = eventsDF
      .groupBy("event_type").agg(count(lit(1)).as("n_ref"))
    assert(out.join(totals, "event_type").filter(col("n") =!= col("n_ref")).isEmpty)
  }

  test("q_token_budget: budget respected, cut is a shuffle-order prefix per source") {
    val out = Queries.queries("q_token_budget")(spark, sfDir)
    assert(out.filter(col("cum_tokens") > 800).isEmpty)
    assert(out.filter(col("cum_tokens") < col("n_tokens")).isEmpty)
    // prefix property: every kept doc's shuffle-order rank per source
    // equals its row count up to and including it — no gaps
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ranked = out.withColumn("rk", row_number().over(w))
    val perSource = ranked.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
    assert(perSource.filter(col("n") =!= col("maxrk")).isEmpty)
    // the cut is maximal: recomputing cum over the FULL corpus, every
    // doc with cum <= budget is kept (same row set, no early stop)
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("nt"))
      .withColumn("cum", sum("nt").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val expectIds = all.filter(col("cum") <= 800).select("doc_id")
    assert(out.select("doc_id").except(expectIds).isEmpty &&
      expectIds.except(out.select("doc_id")).isEmpty)
  }

  test("q_rollup_stats: levels are consistent — details sum to subtotals sum to the grand total") {
    val out = Queries.queries("q_rollup_stats")(spark, sfDir)
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // grand total (gid=3)
    assert(out.filter(col("gid") === 3).agg(sum("n_docs")).head().getLong(0) == total)
    // per-source subtotals (gid=1) sum to the grand total
    assert(out.filter(col("gid") === 1).agg(sum("n_docs")).head().getLong(0) == total)
    // detail rows (gid=0) roll up to their source subtotal
    val detail = out.filter(col("gid") === 0)
      .groupBy("source").agg(sum("n_docs").as("d"), sum("sum_chars").as("dc"))
    val sub = out.filter(col("gid") === 1)
      .select(col("source"), col("n_docs").as("s"), col("sum_chars").as("sc"))
    assert(detail.join(sub, "source")
      .filter(col("d") =!= col("s") || col("dc") =!= col("sc")).isEmpty)
  }

  test("q_time_window_sum: trailing 30-min counts match an interval-join recomputation") {
    val out = Queries.queries("q_time_window_sum")(spark, sfDir)
    assert(out.filter(col("n_30m") < 1).isEmpty) // frame always includes self
    val ev = eventsDF
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val ref = ev.as("a")
      .join(ev.as("b"), col("a.user_id") === col("b.user_id") &&
        col("b.us").between(col("a.us") - 1800000000L, col("a.us")))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(lit(1)).as("n_ref"), sum(col("b.cents")).as("sum_ref"))
    val j = out.join(ref, "event_id")
    assert(j.filter(col("n_30m") =!= col("n_ref") ||
      col("sum_cents_30m") =!= col("sum_ref")).isEmpty)
  }

  test("q_profile: stats bounded by row count; distinct counts match per-column recomputation") {
    val out = Queries.queries("q_profile")(spark, sfDir)
    assert(out.count() == 6)
    assert(out.filter(col("n_nulls") > col("n_rows") ||
      col("n_distinct") > col("n_rows")).isEmpty)
    val ev = eventsDF
    val uid = out.filter(col("col_name") === "user_id").head()
    assert(uid.getLong(3) == ev.select("user_id").distinct().count())
    assert(uid.getLong(1) == ev.count())
  }

  test("q_stratified_sample: per-source keep rates land within the md5-bucket tolerance") {
    val out = Queries.queries("q_stratified_sample")(spark, sfDir)
    val totals = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n_total"))
    val kept = out.groupBy("source").agg(count(lit(1)).as("n_kept"))
    val rate = expr("CASE CAST(substr(source, 4, 4) AS INT) % 4 " +
      "WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 250 ELSE 100 END")
    val j = totals.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), rate.as("r"))
    // rate-1000 sources keep everything; others stay within a generous
    // binomial-ish band (small per-source counts at test scale)
    assert(j.filter(col("r") === 1000 && col("n_kept") =!= col("n_total")).isEmpty)
    assert(j.filter(col("n_kept") > col("n_total")).isEmpty)
    val off = j.filter(col("r") < 1000)
      .filter(abs(col("n_kept") * 1000 - col("n_total") * col("r")) >
        col("n_total") * 450)
    assert(off.isEmpty, off.collect().mkString(", "))
  }

  test("q_asof_forward: matches agree with a brute-force range-join recomputation") {
    val out = Queries.queries("q_asof_forward")(spark, sfDir)
    assert(out.filter(col("gap_us") < -1 || col("gap_us") > 600000000L).isEmpty)
    // brute force: min (c_us, click_id) over clicks in [ts, ts+10min]
    val ev = eventsDF
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("us").as("cus"))
    val ref = p.join(c, col("user_id") === col("cu") &&
        col("cus") >= col("us") && col("cus") - col("us") <= 600000000L, "left")
      .groupBy("purchase_id")
      .agg(min(struct(col("cus"), col("cid"))).as("m"))
      .select(col("purchase_id"),
        coalesce(col("m.cid"), lit(-1L)).as("ref_click"),
        coalesce(col("m.cus"), lit(-1L)).as("ref_cus"))
    val j = out.join(ref, "purchase_id")
    assert(j.filter(col("click_id") =!= col("ref_click")).isEmpty)
  }

  test("q_scd2: intervals tile each user's timeline with no zero-width or overlapping spans") {
    val out = Queries.queries("q_scd2")(spark, sfDir)
    assert(out.filter(col("valid_from_us") >= col("valid_to_us")).isEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from_us")
    val seq = out
      .withColumn("nxt_from", lead("valid_from_us", 1).over(w))
      .withColumn("nxt_state", lead("state", 1).over(w))
    // consecutive intervals abut exactly and never repeat a state
    assert(seq.filter(col("nxt_from").isNotNull &&
      col("valid_to_us") =!= col("nxt_from")).isEmpty)
    assert(seq.filter(col("nxt_state").isNotNull &&
      col("state") === col("nxt_state")).isEmpty)
    // the open interval carries the +inf sentinel, exactly one per user
    val opens = out.filter(col("valid_to_us") === 32503680000000000L)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(opens.filter(col("n") =!= 1).isEmpty)
  }

  test("q_pair_curation: funnel bounded; pair count equals the id-join cardinality") {
    val out = Queries.queries("q_pair_curation")(spark, sfDir)
    assert(out.filter(col("n_kept") > col("n_pairs")).isEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id")
    val expected = docs.join(embs, col("doc_id") === col("vec_id")).count()
    assert(out.agg(sum("n_pairs")).head().getLong(0) == expected)
    // both gates are live at test scale: some pairs kept, some dropped
    val t = out.agg(sum("n_pairs"), sum("n_kept")).head()
    assert(t.getLong(1) > 0 && t.getLong(1) < t.getLong(0),
      s"gates not exercised: kept ${t.getLong(1)} of ${t.getLong(0)}")
  }

  test("q_running_distinct: per-user maximum equals the exact distinct type count") {
    val out = Queries.queries("q_running_distinct")(spark, sfDir)
    assert(out.filter(col("n_types_seen") < 1).isEmpty)
    val ref = eventsDF
      .groupBy("user_id").agg(countDistinct("event_type").as("d"))
    val j = out.groupBy("user_id").agg(max("n_types_seen").as("m")).join(ref, "user_id")
    assert(j.filter(col("m") =!= col("d")).isEmpty)
  }

  test("q_first_seen: new users sum to the user base; new+returning equals daily actives") {
    val out = Queries.queries("q_first_seen")(spark, sfDir)
    val users = eventsDF
      .select(countDistinct("user_id")).head().getLong(0)
    assert(out.agg(sum("n_new")).head().getLong(0) == users)
    val act = Queries.queries("q_retention")(spark, sfDir)
      .select(col("day"), col("n_active"))
    val j = out.join(act, "day")
    assert(j.filter(col("n_new") + col("n_returning") =!= col("n_active")).isEmpty)
  }

  test("q_dedup_degree: handshake identity — degree mass equals twice the pair count") {
    val out = Queries.queries("q_dedup_degree")(spark, sfDir)
    val pairs = Queries.queries("q_dedup_simhash_pairs")(spark, sfDir).count()
    val mass = out.agg(sum(col("degree") * col("n_nodes"))).head().getLong(0)
    assert(mass == 2 * pairs, s"$mass != 2 * $pairs")
    assert(out.filter(col("degree") < 1).isEmpty)
  }

  test("q_decile_bin: bins are 0-9, near-uniform, and monotone in value") {
    val out = Queries.queries("q_decile_bin")(spark, sfDir)
    assert(out.filter(col("decile") < 0 || col("decile") > 9).isEmpty)
    // near-uniform: per (type, decile) counts differ by at most 1 from n/10
    val sizes = out.groupBy("event_type", "decile").agg(count(lit(1)).as("c"))
      .groupBy("event_type").agg(min("c").as("lo"), max("c").as("hi"),
        count(lit(1)).as("nbins"))
    assert(sizes.filter(col("nbins") =!= 10).isEmpty)
    assert(sizes.filter(col("hi") - col("lo") > 1).isEmpty)
    // monotone: a higher-valued event never lands in a lower decile
    val ev = eventsDF
      .select(col("event_id"), (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val j = out.join(ev, "event_id")
    val cross = j.as("a").join(j.as("b"),
        col("a.event_type") === col("b.event_type") &&
        col("a.cents") < col("b.cents") && col("a.decile") > col("b.decile"))
    assert(cross.isEmpty, "decile order contradicts value order")
  }

  test("q_value_histogram: bucket mass equals corpus; buckets cover the value range") {
    val out = Queries.queries("q_value_histogram")(spark, sfDir)
    val total = eventsDF.count()
    assert(out.agg(sum("n")).head().getLong(0) == total)
    assert(out.filter(col("bucket") < 0).isEmpty)
    assert(out.select(countDistinct("bucket")).head().getLong(0) >= 2,
      "histogram collapsed to one bucket — bucketing not exercised")
  }
}
