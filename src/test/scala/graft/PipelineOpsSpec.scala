package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-4 training-pipeline operators, checked by
  * properties a user relies on (not just oracle hashes): the shuffle
  * order is a true permutation identical to the naive global sort, the
  * funnel is monotone, dedup survivors partition the corpus, coverage
  * ratios stay in range.
  */
class PipelineOpsSpec extends SparkSpecBase {

  test("SparkEntry.entry is session-timezone independent (driver may run non-UTC)") {
    // the driver contract warns entry() may be called under a non-UTC
    // session; everything it touches must be tz-independent (NTZ
    // literals, explicitly-UTC event casts)
    val utcRows = SparkEntry.entry(spark).collect().map(_.toString).sorted.toSeq
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val nyRows = SparkEntry.entry(spark).collect().map(_.toString).sorted.toSeq
      assert(nyRows.nonEmpty, "entry returned no rows")
      assert(nyRows == utcRows, "entry() result depends on session time zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("q_shuffle_order: positions are an exact 0..N-1 permutation matching the naive global sort") {
    val out = Queries.queries("q_shuffle_order")(spark, sfDir)
    val n = out.count()
    // permutation: distinct positions cover exactly [0, n)
    val stats = out.agg(
      countDistinct(col("pos")).as("d"), min("pos").as("mn"), max("pos").as("mx")).head()
    assert(stats.getLong(0) == n && stats.getLong(1) == 0L && stats.getLong(2) == n - 1, stats)
    // bucketed two-phase order == naive single-task global order
    import org.apache.spark.sql.expressions.Window
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        (row_number().over(Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))) - 1)
          .cast("long").as("pos"))
    assert(out.except(naive).isEmpty && naive.except(out).isEmpty)
  }

  test("q_group_split: no near-dup pair ever crosses a split boundary; rule matches q_split_assign's") {
    val out = Queries.queries("q_group_split")(spark, sfDir)
    val pairs = graft.functions.DedupFns
      .simhashNearDupPairs(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 3)
      .select("id_a", "id_b")
    // structural no-leakage: both ends of every near-dup pair share a split
    val crossing = pairs
      .join(out.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(out.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossing == 0L, s"$crossing near-dup pairs cross splits")
    // every doc assigned exactly once, to a real split
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.count() == docs)
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0L)
  }

  test("q_weighted_sample: two-phase bucket walk equals the naive single-window answer; weights bias the pick") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFns
    val out = Queries.queries("q_weighted_sample")(spark, sfDir)
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        greatest(size(TextFns.tokensFast(col("text"))).cast("long"), lit(1L)).as("weight"))
      .withColumn("priority", expr(
        "conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) div weight"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("priority"), col("doc_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("source", "doc_id", "weight", "priority", "rank")
    assert(out.except(naive).isEmpty && naive.except(out).isEmpty)
    // weighting works: sampled docs are heavier on average than the corpus
    val sampleMean = out.agg(avg("weight")).head().getDouble(0)
    val corpusMean = naive.sparkSession.read.parquet(s"$sfDir/documents.parquet")
      .agg(avg(size(TextFns.tokensFast(col("text"))))).head().getDouble(0)
    assert(sampleMean > corpusMean, s"sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("q_dp_histogram: release = clamp(true + noise, 0); noise recomputes from the md5 bit-lengths") {
    val rows = Queries.queries("q_dp_histogram")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (et, t, nz, rel) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rel == math.max(t + nz, 0L), r)
      def z(salt: String): Long = {
        val h = graft.functions.Sketches.tokenHash60(et + salt)
        60L - java.lang.Long.toBinaryString(h).length
      }
      assert(nz == z("|a") - z("|b"), s"$et: noise $nz != recomputed ${z("|a") - z("|b")}")
    }
  }

  test("q_bpe_pairs: 20 ranked 2-char pairs with non-increasing counts that recount exactly") {
    val rows = Queries.queries("q_bpe_pairs")(spark, sfDir)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    assert(rows.map(_._3).toSeq == (1L to 20L))
    assert(rows.forall(_._1.length == 2))
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 }, rows.toSeq)
    // the top pair's count recomputes exactly from raw tokens
    import graft.functions.TextFns
    val (topPair, topCnt, _) = rows.head
    val recount = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(TextFns.tokensFast(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substr(tok, i, 2))")).as("pair"))
      .filter(col("pair") === topPair).count()
    assert(recount == topCnt, s"$topPair: $recount != $topCnt")
  }

  test("q_bloom_decontam: bloom prefilter + exact confirm equals the plain exact decontam") {
    val bloom = Queries.queries("q_bloom_decontam")(spark, sfDir)
    val exact = Queries.queries("q_decontam")(spark, sfDir)
    assert(bloom.except(exact).isEmpty && exact.except(bloom).isEmpty)
    assert(bloom.count() > 0)
  }

  test("q_dup_span_runs: run accounting is internally consistent and matches a crafted duplicate") {
    val out = Queries.queries("q_dup_span_runs")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nSpans, nDup, maxRun, maxTok) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nDup <= nSpans, r)
      assert(maxRun <= nDup, r)
      assert(if (maxRun > 0) maxTok == maxRun + 7 else maxTok == 0, r)
    }
    // a doc fully contained in another doc: every one of its windows is
    // cross-doc duplicated, so its longest run is ALL its windows and
    // the certified duplicated-substring length is its full token count
    import spark.implicits._
    val a = (1 to 40).map(i => s"w$i").mkString(" ")      // 40 tokens
    val b = a + " " + (1 to 20).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, a, "s"), (2L, b, "s")).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("spanruns").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Queries.queries("q_dup_span_runs")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L) == ((33L, 33L, 40L)), rows)  // doc1: all 33 windows dup, substring = 40 tokens
    assert(rows(2L)._2 == 33L && rows(2L)._3 == 40L, rows) // doc2's copied prefix certifies the same 40
  }

  test("q_span_scrub: dup_tokens is the EXACT brute-force union of duplicated 8-gram token spans") {
    val out = Queries.queries("q_span_scrub")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    // brute force on the driver: tokenize identically, find 8-grams seen
    // in >1 DISTINCT doc, mark every token each dup window covers, count
    // the marked set — the interval-union walk must reproduce it exactly
    import graft.functions.TextFns
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextFns.tokensFast(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toIndexedSeq).toMap
    val docsOf = scala.collection.mutable.Map.empty[Seq[String], Set[Long]]
    for ((id, toks) <- docs if toks.size >= 8; p <- 0 to toks.size - 8)
      docsOf.updateWith(toks.slice(p, p + 8)) {
        prev => Some(prev.getOrElse(Set.empty) + id)
      }
    for ((id, toks) <- docs) {
      if (toks.size < 8) assert(!out.contains(id), s"doc $id has <8 tokens but was emitted")
      else {
        val covered = scala.collection.mutable.BitSet.empty
        for (p <- 0 to toks.size - 8 if docsOf(toks.slice(p, p + 8)).size > 1)
          covered ++= (p to p + 7)
        val n = toks.size.toLong
        val dup = covered.size.toLong
        assert(out(id) == ((n, dup, (n - dup) * 1000 / n)),
          s"doc $id: got ${out(id)} want ($n, $dup, ${(n - dup) * 1000 / n})")
      }
    }
  }

  test("q_span_excise: kept size equals scrub accounting exactly; untouched docs fingerprint their full text") {
    import graft.functions.TextFns
    val scrub = Queries.queries("q_span_scrub")(spark, sfDir)
      .select(col("doc_id"), col("n_tokens").as("s_n"), col("dup_tokens"))
    val exc = Queries.queries("q_span_excise")(spark, sfDir)
    // the interval-union ACCOUNTING and the actual EXCISION must agree
    // doc by doc: kept = n - dup, same doc set
    val j = exc.join(scrub, Seq("doc_id"), "full")
    assert(j.filter(col("s_n").isNull || col("kept_tokens").isNull).isEmpty)
    assert(j.filter(col("n_tokens") =!= col("s_n")).isEmpty)
    assert(j.filter(col("kept_tokens") =!= col("s_n") - col("dup_tokens")).isEmpty)
    // docs with zero dup coverage keep their exact token stream
    val full = exc.filter(col("kept_tokens") === col("n_tokens"))
      .join(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id")
      .withColumn("__fp", md5(concat_ws(" ", TextFns.tokensFast(col("text")))))
    assert(full.count() > 0)
    assert(full.filter(col("scrub_fp") =!= col("__fp")).isEmpty)
  }

  test("q_embed_quant: int8 reconstruction error is bounded by range/255 (+1 floor slack)") {
    val rows = Queries.queries("q_embed_quant")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (vmin, vmax, maxErr, mae) = (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6))
      val rng = vmax - vmin
      assert(maxErr <= rng / 255 + 1, s"dim ${r.getLong(0)}: maxErr $maxErr vs range $rng")
      assert(mae <= maxErr, r)
    }
  }

  test("q_mix_weights: alpha=0.5 flattens the mixture toward uniform; shares sum to ~1000") {
    val rows = Queries.queries("q_mix_weights")(spark, sfDir).collect()
    assert(rows.length > 1)
    val nSrc = rows.length
    val rawSum = rows.map(_.getLong(4)).sum
    val sampSum = rows.map(_.getLong(5)).sum
    // floor-division rounding loses at most 1 milli per source
    assert(rawSum > 1000 - nSrc && rawSum <= 1000, rawSum)
    assert(sampSum > 1000 - nSrc && sampSum <= 1000, sampSum)
    // temperature flattening: above-average sources shrink, below-average grow
    // (compare against the EXACT rational mean share n/nSrc without floats)
    rows.foreach { r =>
      val (raw, samp) = (r.getLong(4), r.getLong(5))
      if (raw * nSrc > 1000 + nSrc) assert(samp <= raw + 1, r)   // big source: not boosted
      if (raw * nSrc < 1000 - nSrc) assert(samp + 1 >= raw, r)   // small source: not shrunk
    }
  }

  test("q_funnel: stage counts are monotone non-increasing") {
    val rows = Queries.queries("q_funnel")(spark, sfDir)
      .orderBy("stage").collect().map(_.getLong(1))
    assert(rows.length == 3, rows.toSeq)
    assert(rows(0) >= rows(1) && rows(1) >= rows(2), rows.toSeq)
  }

  test("q_dedup_survivors: survivors = corpus minus non-representative cluster members") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    val losers = Queries.queries("q_dedup_clusters")(spark, sfDir)
      .filter(col("id") =!= col("cluster_root")).count()
    val survivors = Queries.queries("q_dedup_survivors")(spark, sfDir)
      .agg(sum("n_docs")).head().getLong(0)
    assert(survivors == total - losers, s"$survivors != $total - $losers")
  }

  test("clearSessionMemos: Bench's between-queries sweep rebuilds dedup state identically") {
    // the sweep unpersists the memoized pair/cluster frames' checkpoint
    // blocks AND every persistent RDD — a later query must rebuild the
    // memo from scratch (never touch freed blocks) and land on the
    // identical result
    val before = Queries.queries("q_dedup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Queries.clearSessionMemos()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    val after = Queries.queries("q_dedup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, s"rebuild diverged: ${(after diff before).take(5)}")
  }

  test("q_vocab_coverage: ratios in [0,1000], token counts match q_token_count") {
    val out = Queries.queries("q_vocab_coverage")(spark, sfDir)
    assert(out.filter(col("oov_milli") < 0 || col("oov_milli") > 1000).isEmpty)
    // n_tokens agrees with the independent normalized-token counter
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("nt"))
      .filter(col("nt") > 0)
    assert(out.join(toks, "doc_id").filter(col("n_tokens") =!= col("nt")).isEmpty)
  }

  test("q_gopher_quality: keep flag equals the recomputed predicate over emitted signals") {
    val out = Queries.queries("q_gopher_quality")(spark, sfDir)
    val bad = out.filter(col("keep") =!=
      (col("n_tokens") >= 5 && col("n_tokens") <= 50000 &&
        col("mean_len_milli").between(3000, 10000) &&
        col("symbol_milli") <= 100 && col("stop_hits") >= 1).cast("long"))
    assert(bad.isEmpty)
    // the corpus exercises both branches
    val kinds = out.select(countDistinct("keep")).head().getLong(0)
    assert(kinds == 2, s"keep flag is constant ($kinds) — thresholds not exercised")
  }

  test("q_retention: retained never exceeds active; days are contiguous activity days") {
    val out = Queries.queries("q_retention")(spark, sfDir)
    assert(out.filter(col("n_retained") > col("n_active")).isEmpty)
    assert(out.filter(col("n_active") <= 0).isEmpty)
    // contiguity: every day in [min, max] has an activity row
    val r = out.agg(min(col("day")), max(col("day")), count(lit(1))).head()
    assert(r.getLong(1) - r.getLong(0) + 1 == r.getLong(2),
      s"activity days not contiguous: span ${r.getLong(1) - r.getLong(0) + 1} vs ${r.getLong(2)} rows")
  }

  test("q_lang_confusion: matrix total equals corpus size") {
    val total = Queries.queries("q_lang_confusion")(spark, sfDir)
      .agg(sum("n_docs")).head().getLong(0)
    assert(total == spark.read.parquet(s"$sfDir/documents.parquet").count())
  }

  test("q_doc_chunks: ceil(n/32) chunks per doc, 64-token bodies, shorter tail") {
    val out = Queries.queries("q_doc_chunks")(spark, sfDir).cache()
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(graft.functions.TextFns.tokensFast(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
    // chunk starts are 0, 32, … < n  →  exactly ceil(n/32) chunks, idx contiguous from 0
    val agg = out.groupBy("doc_id")
      .agg(count(lit(1)).as("chunks"), min("chunk_idx").as("mn"), max("chunk_idx").as("mx"))
      .join(toks, "doc_id")
    assert(agg.filter(col("chunks") =!= expr("(n + 31) div 32")).isEmpty)
    assert(agg.filter(col("mn") =!= 0 || col("mx") =!= col("chunks") - 1).isEmpty)
    assert(toks.join(agg, Seq("doc_id"), "left_anti").isEmpty) // every non-empty doc chunked
    // a chunk is 64 tokens unless it starts within 64 of the end
    val bad = out.join(toks, "doc_id")
      .filter(col("n_tokens") =!= least(lit(64L), col("n") - col("chunk_idx") * 32))
    assert(bad.isEmpty)
    out.unpersist()
    ()
  }

  test("q_minhash_est: pair set equals the LSH candidates; estimate is agree/16 in milli-units") {
    val est = Queries.queries("q_minhash_est")(spark, sfDir).cache()
    val cands = Queries.queries("q_dedup_minhash")(spark, sfDir)
    assert(est.select("id_a", "id_b").except(cands).isEmpty &&
      cands.except(est.select("id_a", "id_b")).isEmpty)
    // band agreement implies ≥ 2 agreeing signature positions
    assert(est.filter(col("agree") < 2 || col("agree") > 16).isEmpty)
    assert(est.filter(col("est_milli") =!= expr("(agree * 1000) div 16")).isEmpty)
    est.unpersist()
    ()
  }

  test("pageRank: uniform on regular graphs, exact hand-computed values on a path") {
    import spark.implicits._
    // triangle: every node deg 2 → 1,000,000 is an exact fixed point
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val prTri = graft.operators.Relational.pageRank(tri, "id_a", "id_b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prTri == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    // path a-b-c after ONE iteration: ends get 150000 + 850*(1e6 div 2) div 1000,
    // the middle gets 150000 + 850*(1e6 + 1e6) div 1000
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val pr1 = graft.operators.Relational.pageRank(path, "id_a", "id_b", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr1 == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L), pr1)
  }

  test("q_pagerank: node set equals the near-dup graph; everyone keeps the damping floor") {
    val pr = Queries.queries("q_pagerank")(spark, sfDir).cache()
    val pairs = Queries.queries("q_dedup_simhash_pairs")(spark, sfDir)
    val nodes = pairs.select(col("id_a").as("id")).union(pairs.select(col("id_b").as("id"))).distinct()
    assert(pr.select("id").except(nodes).isEmpty && nodes.except(pr.select("id")).isEmpty)
    assert(pr.filter(col("pr_micro") < 150000L).isEmpty)
    pr.unpersist()
    ()
  }

  test("q_chunk_dedup: counts match a recount; keeper is the smallest (doc, idx) of its group") {
    val chunks = Queries.queries("q_doc_chunks")(spark, sfDir).cache()
    val dups = Queries.queries("q_chunk_dedup")(spark, sfDir).cache()
    assert(dups.count() > 0, "corpus has no duplicate chunks — dedup path not exercised")
    assert(dups.filter(col("n") < 2).isEmpty)
    val recount = chunks.groupBy("chunk_md5").agg(count(lit(1)).as("cnt"))
    assert(dups.join(recount, "chunk_md5").filter(col("n") =!= col("cnt")).isEmpty)
    // nothing of the same fingerprint sorts below the keeper
    val smaller = dups.join(chunks,
      dups("chunk_md5") === chunks("chunk_md5") &&
        (chunks("doc_id") < dups("keeper_doc") ||
          (chunks("doc_id") === dups("keeper_doc") && chunks("chunk_idx") < dups("keeper_idx"))))
    assert(smaller.isEmpty)
    chunks.unpersist(); dups.unpersist()
    ()
  }

  test("q2_mincost: argmin agrees with an independent window recomputation") {
    import org.apache.spark.sql.expressions.Window
    val out = Queries.queries("q2_mincost")(spark, sfDir)
    val parts = spark.read.parquet(s"$sfDir/part.parquet").filter(col("p_size") <= 10)
      .select(col("p_partkey"))
    val su = spark.read.parquet(s"$sfDir/supplier.parquet")
    val naive = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint) div cast(l_quantity as bigint)")
          .as("unit_cents"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("l_partkey").orderBy(col("unit_cents"), col("l_suppkey"))))
      .filter(col("rn") === 1)
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"), col("unit_cents"))
    assert(out.except(naive).isEmpty && naive.except(out).isEmpty)
    assert(out.count() > 0)
  }

  test("q18_bigorders: every order total recomputes exactly and clears the threshold") {
    val out = Queries.queries("q18_bigorders")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("total_qty") <= 150).isEmpty)
    val re = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(out.join(re, col("o_orderkey") === col("l_orderkey"))
      .filter(col("total_qty") =!= col("q")).isEmpty)
    out.unpersist()
    ()
  }

  test("q_knn_classify: one prediction per query; majority vote recomputes from the NN list") {
    val out = Queries.queries("q_knn_classify")(spark, sfDir).cache()
    assert(out.count() == 20 && out.select(countDistinct("query_id")).head().getLong(0) == 20)
    assert(out.filter(col("votes") < 1 || col("votes") > 5).isEmpty)
    assert(out.filter(col("pred_label") < 0 || col("pred_label") > 9).isEmpty)
    // recompute the vote from the IVF neighbor list + labels
    import org.apache.spark.sql.expressions.Window
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nn = Queries.queries("q_embed_ivf")(spark, sfDir)
    val naive = nn.join(e.select(col("vec_id").as("neighbor_id"), col("label").cast("long").as("label")), "neighbor_id")
      .groupBy("query_id", "label").agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("votes").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
    assert(out.except(naive).isEmpty && naive.except(out).isEmpty)
    out.unpersist()
    ()
  }

  test("q_gap_fill: grids are contiguous per user and totals reconcile with raw events") {
    val out = Queries.queries("q_gap_fill")(spark, sfDir).cache()
    // contiguity: rows per user == span length
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("rows"), (max("h") - min("h") + 1).as("span"))
      .filter(col("rows") =!= col("span"))
    assert(bad.isEmpty)
    // zero-filled hours exist, and per-user event totals match the raw table
    assert(out.filter(col("n_events") === 0 && col("sum_cents") === 0).count() > 0)
    val totals = out.groupBy("user_id").agg(sum("n_events").as("n"))
    val raw = eventsDF.groupBy("user_id").agg(count(lit(1)).as("rn"))
    assert(totals.join(raw, "user_id").filter(col("n") =!= col("rn")).isEmpty)
    out.unpersist()
    ()
  }

  test("q_inverted_index: df sums to the doc-term incidence; rare-term postings are complete") {
    val out = Queries.queries("q_inverted_index")(spark, sfDir).cache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tk = docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFns.tokensFast(col("text")))).as("term"))
    assert(out.agg(sum("df")).head().getLong(0) == tk.count())
    // for a term with df <= 100 the fingerprint covers the FULL posting list
    val full = tk.groupBy("term")
      .agg(count(lit(1)).as("df2"),
        md5(concat_ws(",", transform(sort_array(collect_list(col("doc_id"))), _.cast("string")))).as("p2"))
      .filter(col("df2") <= 100)
    val cmp = out.join(full, "term")
    assert(cmp.count() > 0)
    assert(cmp.filter(col("posting_md5") =!= col("p2") || col("df") =!= col("df2")).isEmpty)
    out.unpersist()
    ()
  }

  test("q_bigram_lm: probabilities bounded by 1; bigram counts match token counts") {
    val out = Queries.queries("q_bigram_lm")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("lm_milli") <= 0 || col("lm_milli") > 1000).isEmpty)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(graft.functions.TextFns.tokensFast(col("text"))).cast("long").as("n"))
      .filter(col("n") >= 2)
    assert(out.join(toks, "doc_id").filter(col("n_bigrams") =!= col("n") - 1).isEmpty)
    assert(toks.join(out, Seq("doc_id"), "left_anti").isEmpty)
    out.unpersist()
    ()
  }

  test("q_class_balance: label counts partition the corpus") {
    val out = Queries.queries("q_class_balance")(spark, sfDir).collect()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(out.map(_.getAs[Long]("n")).sum == e.count())
    assert(out.length == e.select("label").distinct().count())
    assert(out.forall(r => r.getAs[Long]("mean_norm2_milli") >= 0))
  }

  test("q_kmeans_step: members partition the corpus; ≤16 centroids; shifts non-negative") {
    val out = Queries.queries("q_kmeans_step")(spark, sfDir).collect()
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.map(_.getAs[Long]("n_members")).sum == nVecs)
    assert(out.length <= 16 && out.nonEmpty)
    assert(out.forall(_.getAs[Long]("shift_l1") >= 0L))
    val cids = out.map(_.getAs[Long]("cid")).toSet
    assert(cids.forall(c => c >= 0 && c < 16))
  }

  test("q_dp_mean: release algebra exact; clipping bounds the sum; DP noise is the histogram's") {
    val out = Queries.queries("q_dp_mean")(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, cs, nz, rs, rm) = (r.getAs[Long]("n"), r.getAs[Long]("clipped_sum"),
        r.getAs[Long]("noise"), r.getAs[Long]("released_sum"), r.getAs[Long]("released_mean_cents"))
      assert(cs >= 0 && cs <= 20000L * n)
      assert(rs == math.max(cs + nz * 20000L, 0L))
      assert(rm == rs / n)
    }
    // same deterministic noise stream as q_dp_histogram (same salt)
    val hn = Queries.queries("q_dp_histogram")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("noise")).toMap
    assert(out.forall(r => hn(r.getString(0)) == r.getAs[Long]("noise")))
  }

  test("q_drift: TV in [0,1000]; cohorts partition each type; matches a driver recompute") {
    val out = Queries.queries("q_drift")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = eventsDF.select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    for ((tp, rows) <- ev.groupBy(_._1)) {
      val (a, b) = rows.partition(_._2 % 2 == 0)
      def histo(xs: Array[(String, Long, Double)]) =
        xs.groupBy(x => math.floor(x._3 / 50).toLong).view.mapValues(_.size.toLong).toMap
      val (ha, hb) = (histo(a), histo(b))
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val l1 = (ha.keySet ++ hb.keySet).toSeq
        .map(k => math.abs(ha.getOrElse(k, 0L) * nb - hb.getOrElse(k, 0L) * na)).sum
      val tv = l1 * 1000L / (2L * na * nb)
      assert(out(tp) == ((na, nb, tv)), s"type $tp")
      assert(tv >= 0 && tv <= 1000)
    }
  }

  test("q_ann_recall: per-query hits equal the library-level IVF ∩ brute intersection") {
    val out = Queries.queries("q_ann_recall")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 20 && out.values.forall { case (h, m) => h >= 0 && h <= 5 && m == h * 1000 / 5 })
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q20 = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.functions.VectorFns.bruteForceTopK(q20, e, "vec_id", "embedding", 5))
    val approx = pairs(graft.functions.VectorFns.ivfTopK(q20, e, "vec_id", "embedding", 5))
    val inter = exact.intersect(approx).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    for ((q, (h, _)) <- out) assert(h == inter.getOrElse(q, 0L), s"query $q")
  }

  test("bfsHops: exact hop distances on a path and a star; depth bound respected") {
    import spark.implicits._
    // path 1-2-3-4-5, seed {1} (pred id % 97 == 1): dists 0,1,2,3; node 5 is 4 hops away → absent
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val d = graft.operators.Relational.bfsHops(path, "id_a", "id_b",
        col("id") === 1L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), d)
    // star centered at 10 with leaves 1,2,3, seeds = {1, 2}: leaves at
    // dist 0/0/2, center at 1; min-dist semantics (not last-writer)
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("id_a", "id_b")
    val ds = graft.operators.Relational.bfsHops(star, "id_a", "id_b",
        col("id") <= 2L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ds == Map(1L -> 0L, 2L -> 0L, 10L -> 1L, 3L -> 2L), ds)
    // no seeds → empty
    assert(graft.operators.Relational.bfsHops(path, "id_a", "id_b",
      col("id") > 100L, maxHops = 3).isEmpty)
  }

  test("q_label_consistency: per-class counts bounded and consistent with the IVF majority") {
    val out = Queries.queries("q_label_consistency")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.nonEmpty)
    assert(out.values.forall { case (n, nc, cm) =>
      nc >= 0 && nc <= n && cm == nc * 1000 / n })
    // recompute the majority from the same ANN result, driver-side —
    // the query's auto-sized two-level IVF chain (k = max(64, ceil √n))
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val labels = e.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label").toLong).toMap
    val kc = math.max(64, math.ceil(math.sqrt(e.count().toDouble)).toInt)
    val nn = graft.functions.VectorFns.ivfTopK2(e, e, "vec_id", "embedding", 5,
        kCentroids = kc, nprobe = 8, coarseProbes = 4, assignProbes = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byClass = nn.groupBy(_._1).toSeq.map { case (q, rows) =>
      val votes = rows.map(x => labels(x._2)).groupBy(identity).toSeq
        .map { case (l, v) => (v.size, l) }
      val pred = votes.map { case (v, l) => (-v, l) }.min._2
      (labels(q), pred == labels(q))
    }.groupBy(_._1).map { case (l, xs) => l -> ((xs.size.toLong, xs.count(_._2).toLong)) }
    for ((l, (n, nc)) <- byClass)
      assert(out(l) == ((n, nc, nc * 1000 / n)), s"label $l")
  }

  test("q_asof_nearest: every match equals the brute-force nearest purchase; ties go backward") {
    val out = Queries.queries("q_asof_nearest")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    val ev = eventsDF.select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("event_type"))
      .filter(col("event_type").isin("click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._2)
    var checked = 0
    for ((u, rows) <- byUser) {
      val purchases = rows.filter(_._4 == "purchase").map(p => (p._3, p._1)).sorted
      for ((cid, _, t, tp) <- rows if tp == "click" && purchases.nonEmpty) {
        // brute force: minimize |Δt|; ties prefer the backward match
        // (and among equal-|Δt| backward candidates the LATEST, which
        // the running-last window picks by construction). "Backward"
        // mirrors the query's (t, event_id) frames: a purchase at the
        // exact same µs sits in the backward frame iff its event_id is
        // <= the click's — i.e. backward ⇔ (pt, pid) <= (t, cid).
        val best = purchases.map { case (pt, pid) =>
          (math.abs(pt - t), if (pt < t || (pt == t && pid <= cid)) 0 else 1, -pt)
        }.min
        val (gotU, gotT, gotNear, gotDelta, gotDir) = out(cid)
        assert(gotU == u && gotT == t, s"click $cid id/ts")
        assert(gotDelta == best._1, s"click $cid delta: got $gotDelta want ${best._1}")
        assert((gotDir == "back") == (best._2 == 0), s"click $cid direction")
        assert(math.abs(gotNear - t) == best._1, s"click $cid near ts")
        checked += 1
      }
    }
    assert(checked == out.size && checked > 0)
  }

  test("q_join_card_est: exact side recomputes; estimate is a bounded overestimate") {
    val r = Queries.queries("q_join_card_est")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    val exact = eventsDF.filter(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "click", 1)).as("na"),
        count(when(col("event_type") === "purchase", 1)).as("nb"))
      .collect().map(x => x.getLong(1) * x.getLong(2)).sum
    assert(row.getAs[Long]("exact_card") == exact)
    // and exact_card IS the true join cardinality
    val c = eventsDF.filter(col("event_type") === "click").select(col("user_id"))
    val p = eventsDF.filter(col("event_type") === "purchase").select(col("user_id"))
    assert(exact == c.join(p, "user_id").count())
    assert(row.getAs[Boolean]("over_ok") && row.getAs[Boolean]("bound_ok"))
  }

  test("q_classifier_score: kernel logit equals the declarative HOF form; keep ⇔ logit ≥ 0") {
    val out = Queries.queries("q_classifier_score")(spark, sfDir)
    // one row per tokenizable doc
    val eligible = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= 1)
    assert(out.count() == eligible.count())
    val rows = out.collect()
    assert(rows.forall { r =>
      val s = r.getAs[Long]("score_milli")
      s >= 0 && s <= 1000 &&
        (r.getAs[Boolean]("keep") == (r.getAs[Long]("logit") >= 0L)) &&
        ((s >= 500) == (r.getAs[Long]("logit") >= 0L))
    })
    // declarative twin of the native kernel: same hash, same affine
    // slot weight, via transform + aggregate — must agree on every doc
    val decl = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        aggregate(
          transform(graft.functions.TextFns.tokens(col("text")),
            t => (graft.functions.TextFns.tokenHash31(t) % 4096L * 1103515245L + 12345L) % 2001L - 1000L),
          lit(0L), (acc, w) => acc + w).as("logit2"))
    val mism = out.join(decl, "doc_id").filter(col("logit") =!= col("logit2"))
    assert(mism.isEmpty, mism.take(3).mkString(","))
  }

  test("q_gram_matrix: every (i,j) statistic equals the brute-force driver-side recompute") {
    val out = Queries.queries("q_gram_matrix")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(graft.functions.VectorFns.quantizeFast(col("embedding")).as("q"))
      .collect().map(_.getSeq[Long](0).toArray)
    val d = vecs.head.length
    assert(out.size == d * (d + 1) / 2)
    val n = vecs.length.toLong
    val sums = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    for (i <- 0 until d; j <- i until d) {
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val expect = (n, sxy, sums(i), sums(j), n * sxy - sums(i) * sums(j))
      assert(out((i.toLong, j.toLong)) == expect, s"pair ($i,$j)")
    }
  }
}
