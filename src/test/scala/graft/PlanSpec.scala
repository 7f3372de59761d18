package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape assertions (SURVEY §5): filters reach the parquet scan,
  * scans are column-pruned, dim joins broadcast, top-k never globally
  * sorts. These are the 100 TB guarantees — data results can be right
  * while the plan is a scale-killer, so the plan itself is under test.
  */
class PlanSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("q1_pricing: shipdate filter is pushed to the parquet scan and scan is pruned") {
    val p = planOf(Queries.queries("q1_pricing")(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // projection needs 7 of 11 lineitem columns; partkey/suppkey/linenumber must be pruned
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey") && !p.contains("l_linenumber"), p)
  }

  test("q_map_filter: predicate pushdown + column pruning on events") {
    val p = planOf(Queries.queries("q_map_filter")(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(event_type), IsNotNull(value), EqualTo(event_type,purchase)"), p)
    assert(!p.contains("props"), p) // untouched wide column never read
  }

  test("q3_topk: dim join broadcasts and top-k is TakeOrderedAndProject, not a global sort") {
    val p = planOf(Queries.queries("q3_topk")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q5_region: all four dims broadcast — no shuffle join against a dim") {
    val p = planOf(Queries.queries("q5_region")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    // the one fact-fact join is pinned shuffle-hash (build = filtered
    // orders): lineitem must never pay a sort here
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_fold_agg: single shuffle with map-side partial aggregation") {
    val p = planOf(Queries.queries("q_fold_agg")(spark, sfDir))
    assert(p.contains("partial_"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_table_latest: max_by partial agg, not a rank window") {
    val p = planOf(Queries.queries("q_table_latest")(spark, sfDir))
    assert(p.contains("max_by") || p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_interval_join: hash-partitioned equi-join, no nested-loop") {
    val p = planOf(Queries.queries("q_interval_join")(spark, sfDir))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_dedup_minhash: candidate generation is an equi-join, never all-pairs") {
    val p = planOf(Queries.queries("q_dedup_minhash")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_embed_lsh: bucket equi-join, never all-pairs") {
    val p = planOf(Queries.queries("q_embed_lsh")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_embed_ivf2: two-level candidates via equi-joins, fine set broadcast, never all-pairs") {
    val p = planOf(Queries.queries("q_embed_ivf2")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the fine-centroid relation must arrive as a broadcast (corpus
    // assignment + query probing both join it on the coarse cell key)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_rrf_fusion: semantic head rides the IVF index — fine set broadcast, top-k aggregate, never all-pairs") {
    val p = planOf(Queries.queries("q_rrf_fusion")(spark, sfDir))
    // the pre-r14 brute head scanned the corpus against the query
    // embedding as a BroadcastNestedLoopJoin over ALL corpus rows; the
    // IVF head meets candidates in an fcid equi-join with the fine
    // centroids broadcast and ranks via the mergeable top-k aggregate
    assert(p.contains("graft_topk_pairs"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop is the bounded 1-row scalar attach (corpus
    // stats / query-head broadcast), never a corpus×corpus pairing
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
  }

  test("q_embed_pq: the encode is MAP-ONLY — scan → project, zero exchanges") {
    val p = planOf(Queries.queries("q_embed_pq")(spark, sfDir))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_classifier_score: model inference is MAP-ONLY — scan → score, zero exchanges") {
    val p = planOf(Queries.queries("q_classifier_score")(spark, sfDir))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("q_trend_slope: row_number window and the OLS sums share ONE exchange") {
    val p = planOf(Queries.queries("q_trend_slope")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_gram_matrix: one moment exchange feeds pairs AND first-moment branches (reused)") {
    // the d(d+1)/2-slot aggregation is shuffled once; the (i,j) label
    // table and the Σx attach joins all read that same exchange — the
    // only cartesian in the plan is the 64×64 dim-pair table
    val df = Queries.queries("q_gram_matrix")(spark, sfDir)
    df.collect()
    val p = planOf(df)
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      "Exchange hashpartitioning\\(__pos".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("q_dsir_weights: the (doc_id, term) combine is shuffled once and reused by all consumers") {
    // three logical consumers (term-frequency rollup, totals, score
    // join) of ONE tokenize+combine — the executed plan must collapse
    // them onto a shared exchange (the q_gram_matrix class), so the
    // corpus is tokenized once no matter how many estimator views read
    // the bag-of-words
    val df = Queries.queries("q_dsir_weights")(spark, sfDir)
    df.collect()
    val p = planOf(df)
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
    // the only nested-loop is the 1-row totals attach
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_dp_mean: one partial-agg exchange; q_drift: bucket partials then a bounded rollup") {
    val p1 = planOf(Queries.queries("q_dp_mean")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p1).size == 1, p1)
    assert(p1.contains("partial_"), p1)
    // drift: the (type, bucket) partial agg is the only fact-sized
    // shuffle; the type-level window + rollup run over ≤ types×buckets
    val p2 = planOf(Queries.queries("q_drift")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p2).size <= 2, p2)
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
  }

  test("q_label_consistency: kNN stays a cid equi-join; label attach and majority never all-pairs") {
    val p = planOf(Queries.queries("q_label_consistency")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_autocorr: mean frame, lead frame, and final sums share ONE exchange") {
    val p = planOf(Queries.queries("q_autocorr")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_asof_nearest: both directional frames ride ONE exchange — no range join") {
    val p = planOf(Queries.queries("q_asof_nearest")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_join_card_est: the only keyed shuffle is the exact recount; sketch sides are 1 KiB global aggs") {
    // the CMS builds reduce to single-row sketches before any join; the
    // 1-row × 1-row combines may plan as nested-loop joins, but the
    // events fact itself never joins
    val p = planOf(Queries.queries("q_join_card_est")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q_dedup_prio: survivor via min_by aggregate, no window sort over members") {
    val p = planOf(Queries.queries("q_dedup_prio")(spark, sfDir))
    assert(p.contains("min_by") || p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_ivfpq: candidates via cid equi-join, never all-pairs") {
    val p = planOf(Queries.queries("q_ivfpq")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_knn_hubs: all-to-all kNN rides the cid equi-join; top-20 is TakeOrderedAndProject") {
    val p = planOf(Queries.queries("q_knn_hubs")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_asof_join: union-merge plan — one shuffle, one sort, no range join") {
    val p = planOf(Queries.queries("q_asof_join")(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_typo_pairs and q_prefix_jaccard: candidates via equi-join, never all-pairs") {
    for (q <- Seq("q_typo_pairs", "q_prefix_jaccard")) {
      val p = planOf(Queries.queries(q)(spark, sfDir))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("q_prefix_jaccard: both candidate sides ride ONE materialized prefix exchange") {
    // the indexing-prefix cut is a post-shuffle filter above the fenced
    // repartition(tok) — NOT a pushed-down predicate splitting the join
    // sides into two separately-computed (and separately-shuffled)
    // window pipelines
    val df = Queries.queries("q_prefix_jaccard")(spark, sfDir)
    df.collect()
    val f = planOf(df)
    assert(f.contains("ReusedExchange") || f.contains("ReusedQueryStage"), f)
  }

  test("q_cdc_apply: changelog compacts via max_by partial agg — no window sort anywhere") {
    val p = planOf(Queries.queries("q_cdc_apply")(spark, sfDir))
    assert(!p.contains("Window"), p)
    assert(p.contains("FullOuter") || p.contains("full_outer"), p)
  }

  test("q_sessionize: all four frames share ONE window spec — one exchange, one sort") {
    val p = planOf(Queries.queries("q_sessionize")(spark, sfDir))
    // Spark splits the dependent frames (lag/rn → flag-sum → start-rank)
    // into chained Window nodes, but they all ride the SAME partitioning
    // and sort order: exactly one exchange, exactly one sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("\\+- Sort ".r.findAllIn(p).size == 1, p)
  }

  test("q_dedup_simhash_pairs and q_dedup_embed: candidates via equi-join, never all-pairs") {
    for (q <- Seq("q_dedup_simhash_pairs", "q_dedup_embed")) {
      val p = planOf(Queries.queries(q)(spark, sfDir))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("simhash pairs: report-once-at-min-band — ONE band exchange, no pair-dedup shuffle") {
    // the raw band join would emit a hamming<=3 pair up to 4x; the
    // min-matching-band predicate makes the output duplicate-free by
    // construction, so no trailing distinct/aggregate shuffle exists:
    // the ONLY hash exchange is the (k, byte) band repartition both
    // self-join sides reuse
    val df = Queries.queries("q_dedup_simhash_pairs")(spark, sfDir)
    df.collect()
    // count inside the AQE FINAL plan only (post-collect toString also
    // replays the pre-reuse Initial Plan)
    val p = planOf(df).split("== Initial Plan ==").head
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"), p)
    // a ReusedExchange node's toString restates its target's
    // "Exchange hashpartitioning(...)" — count real Exchange nodes only
    val real = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(real == 1, p)
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
  }

  test("q_cosine_bands: report-once-at-min-table — bucket + band exchanges only, no pair-dedup shuffle") {
    val df = Queries.queries("q_cosine_bands")(spark, sfDir)
    df.collect()
    // count inside the AQE FINAL plan only (post-collect toString also
    // replays the pre-reuse Initial Plan)
    val p = planOf(df).split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the candidate self-join rides ONE bucket repartition (the other
    // side is a runtime ReusedExchange); the only other exchange is
    // the ≤12-row band rollup — the old (id_a, id_b) max-dedup moved
    // ~256·n pair rows and is gone (each pair now emits exactly once,
    // from its minimum colliding table, via a row-local bucket-array
    // predicate)
    val real = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(real == 2, s"expected 2 real hash exchanges (bucket + band), got $real:\n$p")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
  }

  test("q_embed_ivf: map-only assignment — one equi-join on cid, never all-pairs") {
    val p = planOf(Queries.queries("q_embed_ivf")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // exactly one join: the candidate cid equi-join. Centroid assignment
    // rides inside Project (literal centroids), adding no join at all.
    assert("Join".r.findAllIn(p).size == 1, p)
  }

  test("round-5 window ops: one exchange per keyed window; scrub is map-only") {
    // all three frames of the running stats share one shuffle + sort
    val p1 = planOf(Queries.queries("q_running_stats")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p1).size == 1, p1)
    // the time-range frame adds no second shuffle either
    val p2 = planOf(Queries.queries("q_time_window_sum")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p2).size == 1, p2)
    // outlier trim: both window frames + rollup ride one keyed shuffle
    val p3 = planOf(Queries.queries("q_outliers")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p3).size == 1, p3)
    // denylist scrub is a pure projection: no exchange at all
    val p4 = planOf(Queries.queries("q_term_scrub")(spark, sfDir))
    assert(!p4.contains("Exchange"), p4)
    // forward as-of and SCD2: both window passes share one key shuffle
    val p5 = planOf(Queries.queries("q_asof_forward")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p5).size == 1, p5)
    assert(!p5.contains("CartesianProduct") && !p5.contains("BroadcastNestedLoopJoin"), p5)
    val p6 = planOf(Queries.queries("q_scd2")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p6).size == 1, p6)
    // stratified sampling is map-only — the rate table is a literal
    val p7 = planOf(Queries.queries("q_stratified_sample")(spark, sfDir))
    assert(!p7.contains("Exchange"), p7)
  }

  test("fences hold: expensive signature expressions never duplicated per plan branch") {
    // Catalyst predicate substitution used to evaluate these up to 3×
    // per row per self-join side (see functions.Fence). Self-joins
    // legitimately carry 2 logical copies (runtime exchange reuse
    // dedupes them); q_ngram_jaccard carries 3 branches × 2 sides.
    val pats = Seq("tokensexpr(", "minhashbands(", "simhash32(",
      "quantizevec(", "lshbucketsexpr(", "ivfprobesexpr(", "textstats(", "langscores(")
    // self-joins legitimately carry 2 logical copies per shared
    // exchange (runtime reuse computes each once); ngram-jaccard has 3
    // reused subtrees, minhash-rescore 2 (candidates + gram arrays)
    // bigram-lift reuses ONE unigram subtree 3× (x-join, y-join, N)
    // plus the bigram branch — all four share two runtime tokenizes
    // minhash-est mirrors rescore: band candidates (2 copies, one
    // runtime exchange) + the signature table joined for both pair
    // sides (2 copies, one runtime exchange)
    // bigram-lm: instance stream + its own (x,y) aggregation share one
    // runtime exchange (2 logical copies) + the unigram branch (1)
    // q_containment mirrors minhash-rescore (candidates 2 + gram sides 2);
    // q_jaccard_bands mirrors minhash-est (band candidates 2 + sig table 2)
    // q_decontam tokenizes three DISTINCT inputs (probe grams, corpus
    // grams, survivor token count) — three sites, each evaluated once
    // bigram-lm (and the ppl-buckets pair riding its kernel) dropped to
    // the default 2: c_xy is a count window over the instance frame's
    // own (x,y) partitioning, so only the bigram + unigram tokenize
    // sites remain
    val bound = Map("q_ngram_jaccard" -> 6, "q_minhash_rescore" -> 4,
      "q_bigram_lift" -> 4, "q_minhash_est" -> 4,
      "q_containment" -> 4, "q_jaccard_bands" -> 4,
      // q_decontam: 3 distinct tokenize inputs, one being the probe
      // subtree q_bloom_decontam caches → InMemoryRelation double-render
      // makes the textual count 4
      "q_decontam" -> 4,
      // the bloom variant has the same three distinct tokenize inputs
      // (probe grams for the confirm join, corpus grams, survivor
      // token count); the filter BUILD is a separate eager job whose
      // plan is not the returned one. The probe pipeline is CACHED
      // (evaluated at most once ever), but InMemoryRelation's plan
      // string renders that one subtree twice (stored physical plan +
      // logical fragment), so the textual count is 4 for 3 runtime
      // sites
      "q_bloom_decontam" -> 4,
      // q_contamination's probe-gram subtree is plan-identical to the
      // one q_bloom_decontam caches, so CacheManager swaps in the same
      // InMemoryRelation (probe side FREE at runtime) — and the
      // double-render makes the textual count 3 for 2 runtime sites
      "q_contamination" -> 3,
      // semdedup references the fenced quantize+assign subtree three
      // times (pair join a/b sides + the member count), all riding the
      // single repartition(cid) exchange at runtime
      "q_semdedup" -> 3,
      // bm25 = two runtime tokenizes, both now genuinely reused
      // (keepAll fences + pre-materialized isnotnull): the dl
      // projection's repartition(doc_id) exchange is shared by the
      // score join and the corpus scalars (2 logical copies), and the
      // df rollup reuses the tf exchange (2 more) — 4 textual sites,
      // 2 runtime evaluations (ReusedExchange ×2 in the final plan)
      "q_bm25" -> 4,
      // rrf-fusion's lexical side IS the shared bm25Scores pipeline —
      // the same 4 textual tokenize sites / 2 runtime evaluations as
      // q_bm25 — and (round 14) its semantic side IS the two-level IVF
      // pipeline, inheriting q_embed_ivf2's 6 quantize sites (bounded
      // fine sample ×2 logical + corpus + query, collapsing to one
      // BroadcastExchange + ReusedExchange at runtime)
      "q_rrf_fusion" -> 6,
      // q_dedup_report reads each candidate join twice (pair count +
      // flagged-doc count): 2 self-join copies × 2 references
      "q_dedup_report" -> 4,
      // calibration = est pipeline (4: band candidates 2 + sig table 2)
      // + the exact-gram rescore sides (2)
      "q_jaccard_calibration" -> 6,
      // prefix-jaccard mirrors ngram-jaccard's 6: the candidate sides
      // each expand to (toks ⋈ df) = 4 logical tokenizes riding ONE
      // repartition(tok) exchange, + the 2 rescore sides riding ONE
      // repartition(id) exchange → 2 runtime tokenize evaluations
      "q_prefix_jaccard" -> 6,
      // the sliced decade-up parity twin runs the IDENTICAL pipeline
      // over the checkpointed md5 doc slice — same 6 logical sites,
      // same 2 runtime evaluations
      "q_prefix_jaccard_sliced" -> 6,
      // typo-pairs: variant join a/b sides each contain the vocab
      // tokenize + the noisy-injection tokenize (2×2 logical), all on
      // one shared variant exchange → 1 runtime evaluation per side
      // pipeline
      "q_typo_pairs" -> 4,
      // two-level IVF: the fine-centroid relation (which embeds the
      // corpus-sample quantize) is broadcast to BOTH the corpus
      // assignment and the query probing — 2 logical copies that the
      // executed plan collapses to one BroadcastExchange + one
      // ReusedExchange (verified: 1 ReusedExchange in the adaptive
      // plan) — plus the fenced corpus- and query-side quantizes
      "q_embed_ivf2" -> 6,
      // PQ encode runs ONE probe kernel per subspace (m=8) — 8 distinct
      // single-evaluation sites, not a fence break; the ADC query adds
      // the same 8-probe encode on the corpus side only (the query side
      // builds its dist table from dot kernels, no probes)
      "q_embed_pq" -> 8, "q_pq_adc" -> 8,
      // rescore adds the exact-L2 candidate fetch (query + corpus
      // quantize sites) on top of the 8-probe encode
      "q_pq_rescore" -> 8,
      // IVF-PQ: corpus cell assignment (1) + 8-subspace residual encode
      // + query cell probing (1) — 10 single-evaluation probe sites
      "q_ivfpq" -> 10,
      // excision needs the token ARRAY back at the doc row on top of
      // the gram pipeline's shared-exchange pair — 3 single-evaluation
      // tokenize sites, each fenced
      "q_span_excise" -> 3,
      // ann-recall runs BOTH retrieval pipelines (that is the query):
      // brute force quantizes query+corpus, IVF quantizes query+corpus
      // — 4 single-evaluation sites, two per pipeline
      "q_ann_recall" -> 4,
      // the operating curve is ann-recall's shape exactly: the 4 curve
      // points share ONE IVF candidate frame (probe-rank filter), so
      // the sites stay 4 — brute query+corpus, IVF query+corpus
      "q_ann_curve" -> 4,
      // gram-matrix: the single moment aggregation is referenced three
      // times (pair products + the Σxᵢ and Σxⱼ attaches) — 3 logical
      // copies riding ONE runtime exchange (ReusedExchange pinned in
      // the q_gram_matrix plan test above)
      "q_gram_matrix" -> 3,
      // DSIR: the (doc_id, term) combine is referenced three times
      // (term-frequency rollup, its totals, and the score join) — 3
      // logical copies of ONE runtime exchange (plan audit:
      // scans{documents:1}, reused=2 — the q_gram_matrix class); the
      // dedicated plan test below pins the ReusedExchange count
      "q_dsir_weights" -> 3,
      // two-level IVF (ivfTopK2): the √n-BOUNDED fine-centroid sample
      // subtree is referenced by both the corpus-assignment and the
      // query-probe side (2 logical copies of a sample whose size is
      // the centroid count, not the corpus), and the corpus / query
      // streams quantize once each — the corpus-sized subtrees stay
      // single-evaluation; only the bounded sample is duplicated
      "q_knn_hubs" -> 6,
      "q_label_consistency" -> 6).withDefaultValue(2)
    for ((name, fn) <- Queries.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, sfDir).queryExecution.optimizedPlan.toString.toLowerCase
      for (pat <- pats) {
        val cnt = p.sliding(pat.length).count(_ == pat)
        assert(cnt <= bound(name), s"$name: '$pat' appears $cnt times (> ${bound(name)}) — fence broken?")
      }
    }
  }

  test("q_pack_sequences + q_token_budget: no row-level window partitions on bare source") {
    // two-phase bucket walk: the only window allowed to partition on
    // source alone is the bucket-offsets pass, whose input is the
    // (source, bucket) totals AGGREGATE (buckets-per-source rows);
    // row-level cumulation must partition on (source, bucket)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (q <- Seq("q_pack_sequences", "q_token_budget")) {
      val lp = Queries.queries(q)(spark, sfDir).queryExecution.optimizedPlan
      val wins = lp.collect { case w: LWindow => w }
      assert(wins.nonEmpty, q)
      wins.foreach { w =>
        if (w.partitionSpec.size <= 1) {
          val aggBelow = w.child.collect { case a: Aggregate => a }
          assert(aggBelow.nonEmpty,
            s"$q: window partitioned on the bare group runs over raw rows:\n${w.treeString}")
        }
      }
      assert(wins.exists(_.partitionSpec.size >= 2),
        s"$q: missing the (group, bucket) row-level window")
    }
  }

  test("partitioned writes give readers partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = Queries.queries("q_map_filter")(spark, sfDir) // any events projection
    graft.sinks.Sinks.parquet(
      spark.read.parquet(s"$sfDir/customer.parquet"), s"$dir/cust", partitionBy = Seq("c_mktsegment"))
    val pruned = spark.read.parquet(s"$dir/cust").filter(col("c_mktsegment") === "BUILDING")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(c_mktsegment"), p)
    assert(pruned.count() ==
      spark.read.parquet(s"$sfDir/customer.parquet").filter(col("c_mktsegment") === "BUILDING").count())
  }

  test("wordcount top-100 avoids a global sort") {
    val p = planOf(Queries.queries("q_wordcount")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q2_mincost: argmin is a partial agg (no Window sort); part+supplier broadcast") {
    val p = planOf(Queries.queries("q2_mincost")(spark, sfDir))
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q18_bigorders: quantity agg is partial; customer dim broadcasts") {
    val p = planOf(Queries.queries("q18_bigorders")(spark, sfDir))
    assert(p.contains("partial_"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q6_forecast: all three predicates push to the parquet scan; agg is partial, no join") {
    val p = planOf(Queries.queries("q6_forecast")(spark, sfDir))
    // PushedFilters renders truncated; the scan's pushdown prefix plus the
    // full predicate set on the Filter node together prove the shape
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)"), p)
    assert("l_discount#\\d+ >= 0.05".r.findFirstIn(p).isDefined, p)
    assert("l_quantity#\\d+ < 24.0".r.findFirstIn(p).isDefined, p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("Join"), p)
  }

  test("q10_returns: customer+nation broadcast; top-20 is TakeOrderedAndProject") {
    val p = planOf(Queries.queries("q10_returns")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q12_priority: shipdate pushes down; conditional agg is partial; no nested loop") {
    val p = planOf(Queries.queries("q12_priority")(spark, sfDir))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q19_brackets: disjunction stays a hash-join residual — equi key extracted, no nested loop") {
    val p = planOf(Queries.queries("q19_brackets")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_interarrival: lag window and per-user agg share ONE exchange") {
    val p = planOf(Queries.queries("q_interarrival")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_containment: candidate scoring joins are equi-joins, never all-pairs") {
    val p = planOf(Queries.queries("q_containment")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_mad: both rank passes are keyed windows — no global (empty-partition) sort") {
    val p = planOf(Queries.queries("q_mad")(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(!p.contains("partitionBy=[]") && !p.contains("SinglePartition, ENSURE"), p)
  }

  test("cdcChunkDocs: content-defined chunking is map-only — zero exchanges") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = planOf(graft.functions.TextFns.cdcChunkDocs(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_ppl_buckets_scale: windows run over the bounded histogram, never the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = Queries.queries("q_ppl_buckets_scale")(spark, sfDir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "scale path must compute cuts via the histogram windows")
    // every TIER window's input subtree must contain the
    // (lang, lm_milli) histogram aggregate — i.e. tier cuts sort
    // ≤1001 rows per language, never the per-doc corpus (the
    // q_ppl_buckets ntile scale-killer). The one exception is the
    // bigram-LM kernel's c_xy COUNT window: keyed by (x, y), it rides
    // the instance frame's own exchange in place of the former
    // aggregate+self-join pair (same shuffle volume, one exchange) —
    // a keyed count, not a corpus sort.
    wins.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      if (partCols != Set("x", "y")) {
        val histBelow = w.child.collect {
          case a: Aggregate if Set("lang", "lm_milli").subsetOf(
            a.groupingExpressions.flatMap(_.references.map(_.name)).toSet) => a
        }
        assert(histBelow.nonEmpty,
          s"window over non-histogram input:\n${w.treeString}")
      }
    }
    val p = planOf(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q13_custdist: left join and per-customer count share one custkey partitioning") {
    val p = planOf(Queries.queries("q13_custdist")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the per-customer agg must not re-shuffle after the custkey join
    assert("Exchange hashpartitioning\\(c_custkey".r.findAllIn(p).size <= 1, p)
  }

  test("q16_suppliers: NOT IN plans as anti join; distinct agg is two-phase partial") {
    val p = planOf(Queries.queries("q16_suppliers")(spark, sfDir))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("partial_"), p)
  }

  test("q_winsor_mean: rank pass is a keyed window, never a global sort") {
    val p = planOf(Queries.queries("q_winsor_mean")(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(!p.contains("partitionBy=[]"), p)
  }

  test("q_source_overlap: source attachment is equi-joins, never all-pairs") {
    val p = planOf(Queries.queries("q_source_overlap")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21_blame: sole-failer check rides one orderkey exchange — no self-join, no fact broadcast") {
    val p = planOf(Queries.queries("q21_blame")(spark, sfDir))
    // per-order distinct-supplier dedup + solo-count window share the
    // fenced repartition(l_orderkey); only the supplier rollup
    // re-shuffles. The former self-anti-join read lineitem twice and
    // broadcast a fact-derived frame.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("LeftAnti") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_audio_segments: segmentation plan is map-only — zero exchanges") {
    val p = planOf(Queries.queries("q_audio_segments")(spark, sfDir))
    assert(!p.contains("Exchange"), p)
  }

  test("q_heavy_hitters_verified: recount joins BROADCAST candidates, token universe never shuffles as a join side") {
    val p = planOf(Queries.queries("q_heavy_hitters_verified")(spark, sfDir))
    // the exact-recount pass must join the exploded corpus against the
    // ≤ 32 x sources candidate list as a broadcast — a shuffled join
    // here would move the token universe and defeat the sketch's point
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_attribution: as-of attribution is the union-merge window — no range join") {
    val p = planOf(Queries.queries("q_attribution")(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_rolling_actives: events reduce to distinct (user, day) BEFORE the 7-day explode") {
    val p = planOf(Queries.queries("q_rolling_actives")(spark, sfDir))
    // the explode (Generate) must consume an aggregated (deduped) child,
    // not the raw scan: a Generate directly over the events scan would
    // fan out raw events 7x
    // plan text prints parents before children, so the dedup aggregate
    // must appear AFTER the Generate (between it and the scan); only
    // the final count aggregates sit above it. A Generate with no
    // HashAggregate below it would be fanning out raw events 7x.
    val gen = p.indexOf("Generate explode")
    assert(gen >= 0, p)
    assert(p.lastIndexOf("HashAggregate") > gen,
      s"no aggregate below the explode — Generate fans out raw events:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_curation: single token pass — one tokenize site, bounded exchanges") {
    val df = Queries.queries("q_curation")(spark, sfDir)
    // all signals (lang scores, md5 dedup key, quality) stage off ONE
    // fenced token array: a second tokensexpr site in the optimized
    // plan means a fence broke and a signal re-tokenizes per row
    val opt = df.queryExecution.optimizedPlan.toString.toLowerCase
    for (pat <- Seq("tokensexpr(", "textstats(", "langscores(")) {
      val cnt = opt.sliding(pat.length).count(_ == pat)
      assert(cnt == 1, s"'$pat' appears $cnt times (want exactly 1) — fence broken?\n$opt")
    }
    // one scan feeding two aggregation shuffles (norm_md5 keeper, then
    // per-source stats) — any extra exchange is a regression
    val p = planOf(df)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("q_global_median: refine pass ranks ONLY the median bucket — window keyed, not global") {
    val p = planOf(Queries.queries("q_global_median")(spark, sfDir))
    // the row_number over the fact rows must partition by med_bucket
    // (the broadcast-filtered single bucket), never an empty partition
    // spec over the full corpus
    assert(p.contains("windowspecdefinition(med_bucket"), p)
  }

  test("q_cosine_bands: candidates come from the LSH equi-join, never all-pairs") {
    val p = planOf(Queries.queries("q_cosine_bands")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_ttr: lexical diversity is map-only — zero exchanges") {
    val p = planOf(Queries.queries("q_ttr")(spark, sfDir))
    assert(!p.contains("Exchange"), p)
  }

  test("q_transitions: lag window is ONE keyed exchange; final agg on the tiny matrix") {
    val p = planOf(Queries.queries("q_transitions")(spark, sfDir))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert(!p.contains("partitionBy=[]"), p)
  }

  test("q_spikes: fact reduces to daily counts BEFORE the trailing frame") {
    val p = planOf(Queries.queries("q_spikes")(spark, sfDir))
    // the Window (trailing frame) must sit above an aggregate, and the
    // frame's sort partitions by event_type — never a global sort
    assert(p.contains("HashAggregate") && p.contains("Window"), p)
    assert(!p.contains("partitionBy=[]"), p)
  }

  test("q_bootstrap: replicate fan-out is map-only up to the 10-row aggregation") {
    val p = planOf(Queries.queries("q_bootstrap")(spark, sfDir))
    assert(p.contains("Generate explode"), p)
    assert(p.contains("partial_"), p) // multiplicities combine map-side
    assert(!p.contains("Join"), p)
  }

  test("q_hapax: ONE token exchange serves the df window; doc agg follows") {
    val p = planOf(Queries.queries("q_hapax")(spark, sfDir))
    assert("Exchange hashpartitioning\\(tok".r.findAllIn(p).size == 1, p)
  }

  test("q_cohorts: the whole matrix costs ONE user-keyed fact exchange") {
    val p = planOf(Queries.queries("q_cohorts")(spark, sfDir))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_gini and q_twap: rank/lead windows are keyed — never an empty partition spec") {
    for (q <- Seq("q_gini", "q_twap")) {
      val p = planOf(Queries.queries(q)(spark, sfDir))
      assert(p.contains("Window"), s"$q: $p")
      assert(!p.contains("partitionBy=[]"), s"$q: $p")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"$q: one keyed exchange\n$p")
    }
  }

  test("q_daypart: cyclic fold is one partial-agg exchange, no calendar expressions") {
    val p = planOf(Queries.queries("q_daypart")(spark, sfDir))
    assert(p.contains("partial_"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_window_topk: rank filter plans as WindowGroupLimit (pre-sort pruning)") {
    val p = planOf(Queries.queries("q_window_topk")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_doc_chunks: chunking is map-only — zero exchanges") {
    val p = planOf(Queries.queries("q_doc_chunks")(spark, sfDir))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window"), p)
  }

  test("q4_semi: EXISTS plans as a left semi join; returnflag filter pushes to the probe scan") {
    val p = planOf(Queries.queries("q4_semi")(spark, sfDir))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    // probe side needs only the join key after the filter
    assert(!p.contains("l_extendedprice") && !p.contains("l_quantity"), p)
  }

  test("q_neg_pairs: ring pairing is one keyed window — a single exchange, no join") {
    val p = planOf(Queries.queries("q_neg_pairs")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q_pii_scrub: regex redaction is map-only — zero exchanges") {
    val p = planOf(Queries.queries("q_pii_scrub")(spark, sfDir))
    assert(!p.contains("Exchange"), p)
  }

  test("q_triangles: wedge + closing joins are equi-joins, never all-pairs") {
    val p = planOf(Queries.queries("q_triangles")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_semdedup: within-cell pairs via cid equi-join, never all-pairs; one shared assignment exchange") {
    val p = planOf(Queries.queries("q_semdedup")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // candidate generation must be the cid equi-join (both self-join
    // sides sit on repartition(cid) exchanges — logical twins that
    // AQE's runtime exchange reuse collapses to one, as in the other
    // shared-exchange self-joins; see the fence test note)
    assert(p.contains("ShuffledHashJoin [cid") || p.contains("SortMergeJoin [cid"), p)
  }

  test("q_dup_ngram: map-only row-local fold — no join, no window, ZERO exchanges") {
    val p = planOf(Queries.queries("q_dup_ngram")(spark, sfDir))
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // the round-12 rewrite: the statistic is within-document, so the
    // whole query is one scan with zero shuffles (the sf10 rehearsal
    // measured the old two-exchange trigram-string shuffle at
    // 21x/decade in its second decade)
    assert(!p.contains("Exchange"), p)
  }

  test("q_ppl_buckets: tier window is keyed by lang, never a global single-partition sort") {
    val p = planOf(Queries.queries("q_ppl_buckets")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q_cdc_chunks: boundary window keyed by doc_id, fp dup check an equi-join") {
    val p = planOf(Queries.queries("q_cdc_chunks")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q_kanon: suppression join is hash-partitioned on the group key, never nested-loop") {
    val p = planOf(Queries.queries("q_kanon")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    assert(p.contains("Expand") || p.contains("distinct"), p) // two-phase distinct users
  }

  test("q_range_join: bucket decomposition kills the nested loop — hash equi-join on the bucket") {
    val p = planOf(Queries.queries("q_range_join")(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"), p)
  }

  test("q_overlap_sessions: grid cells make the overlap join an equi-join, no nested loop") {
    val p = planOf(Queries.queries("q_overlap_sessions")(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("SortMergeJoin"), p)
  }

  test("q_weighted_sample: row-level rank window partitions on (source, bucket), source-only window on survivors") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    val lp = Queries.queries("q_weighted_sample")(spark, sfDir).queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.size == 2, lp.treeString)
    wins.foreach { w =>
      if (w.partitionSpec.size <= 1) {
        // the source-only window must run over the per-bucket top-k
        // filter's survivors, never the raw rows
        val filterBelow = w.child.collect { case f: Filter => f }
        assert(filterBelow.exists(_.condition.toString.contains("__rb")),
          s"source-only window over raw rows:\n${w.treeString}")
      }
    }
    assert(wins.exists(_.partitionSpec.size >= 2), lp.treeString)
  }

  test("q_bloom_decontam: map-side might_contain prefilter feeds a NON-broadcast confirm join") {
    val p = planOf(Queries.queries("q_bloom_decontam")(spark, sfDir))
    // the codegen'd bloom probe sits in a Filter above the gram explode
    assert(p.contains("might_contain"), p)
    // the exact confirm join is the hinted shuffle-hash shape (at target
    // scale the probe gram table cannot be a broadcast hash relation)
    assert(p.contains("ShuffledHashJoin [g"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("spanIslandState builder: dup-hash flags via shared-exchange shuffle-hash join — never a hash-partition window sort") {
    // The heavy span pipeline moved into the shared builder (round-17
    // memo); its plan discipline is pinned HERE, once, on the exact
    // frame spanIslandState checkpoints — the consumer queries below
    // assert they stay island-sized instead.
    val df = graft.functions.DedupFns.spanIslandize(Queries.spanDupFlags(spark, sfDir))
    val p = planOf(df)
    // cross-doc test = sort-free shuffle-hash join against the min≠max
    // dup-hash set, both sides riding ONE repartition(__gh) exchange
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // a sort here is the thing we removed
    // exactly one Window: the per-doc run window
    assert("Window".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
    // both __gh subtrees compute once: AQE materializes the exchange
    // reuse, visible in the final adaptive plan (collect() executes
    // THIS df's plan — count() would plan a separate execution)
    df.collect()
    val f = planOf(df)
    assert(f.contains("ReusedExchange") || f.contains("ReusedQueryStage"), f)
  }

  test("q_dup_span_runs: one island-sized aggregate over the memoized span state — no corpus rescan") {
    val df = Queries.queries("q_dup_span_runs")(spark, sfDir)
    val p = planOf(df)
    // the query proper reads the checkpointed island leaf; the corpus
    // tokenize+explode+join pipeline must not reappear in its plan
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan") && !p.contains("posexplode"), p)
    assert(!p.contains("Window"), p) // the run window ran in the builder
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q_span_scrub: island clip walk over the memoized span state — no corpus rescan") {
    val df = Queries.queries("q_span_scrub")(spark, sfDir)
    val p = planOf(df)
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("FileScan") && !p.contains("posexplode"), p)
    // the interval clip window partitions on (doc_id, island IS NULL) —
    // island-sized input, never a single-partition funnel
    assert("Window".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q_copurchase: basket self-join shares one orderkey exchange; top-50 is TakeOrderedAndProject") {
    val df = Queries.queries("q_copurchase")(spark, sfDir)
    val p = planOf(df)
    assert(p.contains("TakeOrderedAndProject"), p) // never a global sort
    assert(!p.contains("CartesianProduct") &&
      !(p.contains("BroadcastNestedLoopJoin") && !p.contains("n_orders")), p)
    df.collect()
    val f = planOf(df)
    // the distinct (order, part) projection feeds both sides of the
    // pair self-join AND the support aggregate — materialized once
    assert(f.contains("ReusedExchange") || f.contains("ReusedQueryStage"), f)
  }

  test("q_span_excise: island array attaches to the doc tokenize by equi-join; grams never rebuilt") {
    val df = Queries.queries("q_span_excise")(spark, sfDir)
    val p = planOf(df)
    // the only corpus-sized work left in the query is the doc-side
    // tokenize + HOF filter; islands come from the memoized span state
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("posexplode"), p) // the gram pipeline ran in the builder
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // exactly one documents scan (the tokenize side)
    assert("FileScan".r.findAllIn(p).size <= 1, p)
  }

  test("q_sorted_dedup: neighborhood pairs via adjacent-bucket equi-join; block window, no global sort") {
    val p = planOf(Queries.queries("q_sorted_dedup")(spark, sfDir))
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p) // the sort lives inside blocks
  }

  test("q_ewma: per-key array fold — one exchange, no Window, partial aggs") {
    val p = planOf(Queries.queries("q_ewma")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p) // the recurrence folds a key-local array
    assert(p.contains("partial_"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q_cusum: one user_id exchange carries mean window, both running frames, and the rollup") {
    val p = planOf(Queries.queries("q_cusum")(spark, sfDir))
    // single hash exchange; ordered frames share one sort; the final
    // aggregate sits on the same partitioning (partial+final, no
    // re-shuffle)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("partial_"), p)
    assert("Sort \\[".r.findAllIn(p).size <= 2, p) // [user_id] + [user_id, ts, event_id]
  }

  test("q_embed_quant: dims-row stats table broadcasts back; both aggs partial") {
    val p = planOf(Queries.queries("q_embed_quant")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q_mix_weights: totals attach as a 1-row broadcast, no unpartitioned window") {
    val p = planOf(Queries.queries("q_mix_weights")(spark, sfDir))
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q11_stock / q15_topsupp: scalar-total branch rides a REUSED fact exchange — one scan") {
    // The Q11/Q15 signature shape is "per-key aggregate + a scalar
    // re-aggregation of the SAME frame". Catalyst only collapses the
    // two subtrees when they stay canonically identical — branch-local
    // column pruning (q11: partial_count dropped) or constraint
    // inference (q15: isnotnull(l_suppkey) on one side only) silently
    // doubles the fact scan. Both queries carry an explicit
    // canonicality fence; this pins that the FINAL adaptive plan scans
    // lineitem exactly once and reuses the per-key exchange.
    for (q <- Seq("q11_stock", "q15_topsupp")) {
      val df = Queries.queries(q)(spark, sfDir)
      df.collect()
      val p = planOf(df).split("== Initial Plan ==").head
      assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), s"$q: $p")
      val scans = p.linesIterator.count(_.contains("lineitem.parquet"))
      assert(scans == 1, s"$q: lineitem scanned $scans times\n$p")
    }
  }

  test("q_kmv_overlap: both sketch sides ride ONE tokenize+distinct exchange — one doc scan") {
    val df = Queries.queries("q_kmv_overlap")(spark, sfDir)
    df.collect()
    val p = planOf(df).split("== Initial Plan ==").head
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
    assert(p.linesIterator.count(_.contains("documents.parquet")) == 1, p)
  }

  test("q_overlap_counts: single-partition exchanges carry only bucket-aggregated frames") {
    // VERDICT r16 item 5: the sweep-line's cross-bucket offset frames
    // ride Window.orderBy(__b) — a SinglePartition exchange each. That
    // is bounded BY DESIGN because every one of those frames was first
    // collapsed by a groupBy(__b) to bucket-count size; nothing else
    // pinned it, so a future edit could silently funnel an
    // INTERVAL-sized relation through one task. Structural pin: every
    // SinglePartition shuffle in the plan must have a bucket(__b)-keyed
    // aggregate somewhere below it.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val df = Queries.queries("q_overlap_counts")(spark, sfDir)
    val root: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val singles = root.collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
    }
    assert(singles.nonEmpty,
      "sweep-line shape changed: expected bucket-offset single-partition windows\n" + root.treeString)
    singles.foreach { e =>
      val bucketAgg = e.child.collectFirst {
        case a: BaseAggregateExec if a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(_.toString.contains("__b")) => a
      }
      assert(bucketAgg.nonEmpty,
        "a SinglePartition exchange is NOT fed by a bucket(__b)-keyed aggregate — " +
          s"an interval-sized frame would funnel through one task:\n${e.treeString}")
    }
  }

  test("q17_smallqty / q20_excess: correlated-average shapes scan lineitem once") {
    // q17: the per-part average rides unordered windows over the rows'
    // own l_partkey exchange (no aggregate-joined-back second scan);
    // q20: the scalar-total branch reuses the per-supplier exchange
    // (pre-materialized isnotnull keeps both branches canonical)
    for (q <- Seq("q17_smallqty", "q20_excess", "q21_blame")) {
      val df = Queries.queries(q)(spark, sfDir)
      df.collect()
      val p = planOf(df).split("== Initial Plan ==").head
      assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1,
        s"$q: lineitem scanned more than once\n$p")
    }
  }
}
