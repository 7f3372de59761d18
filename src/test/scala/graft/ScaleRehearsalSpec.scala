package graft

import org.apache.spark.sql.functions._

/** Scale rehearsal — `ignore`d by default (writes a ~8x corpus under
  * /tmp and runs minutes, not part of the suite contract); flip to
  * `test` to re-run after changing a dedup/similarity candidate
  * generator.
  *
  * Method: replicate the sf0.1 documents 8x (replicas carry a unique
  * suffix token, so every doc gains 7 NEAR-copies — an adversarial
  * near-dup density) and compare wall time + output rows per query
  * vs sf0.1.
  *
  * Recorded results (round 10, after the PPJoin+ aggregate pruning):
  * {{{
  *   q_prefix_jaccard        7.3 s ->  59.1 s (8.1x)   output   256 ->   156,384 rows (611x)
  *   q_dup_span_runs         1.6 s ->   2.0 s (1.2x)
  *   q_span_scrub            1.7 s ->   2.9 s (1.7x)   (second-session run; others re-measured within noise)
  *   q_dedup_minhash         0.6 s ->   1.2 s (2.1x)
  *   q_dedup_simhash_pairs   1.2 s ->  30.3 s (26.1x)  output 311,610 -> 18,578,944 rows (59.6x)
  *   q_span_dedup            2.4 s ->   4.1 s (1.7x)
  *   q_semdedup              1.3 s ->   1.3 s (1.0x)
  *   q_dedup_exact           1.9 s ->   0.9 s (0.5x)
  *   q_kcore                 4.6 s ->  53.2 s (7.4x)   (node-space peel; 59.6x edges, so sublinear per edge —
  *                                                      the edge-space peel re-materializing W per round was 608 s)
  *   q_classifier_score      0.3 s ->   0.4 s (1.3x)   (map-only inference: fixed job latency dominates)
  *   q_gram_matrix           1.9 s ->   0.7 s (0.4x)   (d²-bounded shuffle: corpus size is invisible;
  *                                                      the sf0.1 point paid one-time plan warmup)
  * }}}
  *
  * Reading: every shape is sublinear in input except the two
  * pair-EMITTING queries, whose runtime growth is strictly below their
  * true-output growth (26.1x work for 59.6x pairs; 8.1x for 611x) —
  * i.e. the candidate generators stay output-bound even when every doc
  * has 8 near-copies (on the cloned corpus most candidates ARE true
  * pairs, so no filter can cut them — the suffixal pruning pays off on
  * the REALISTIC corpus, where the sf0.1 point dropped 10.0→7.3 s).
  * Quadratic pair OUTPUT on a heavily-cloned corpus is inherent to the
  * operator contract, not a plan defect; the linear-output alternatives
  * for that regime are q_dedup_clusters / q_dedup_survivors
  * (cluster-then-survivor).
  */
class ScaleRehearsalSpec extends SparkSpecBase {
  ignore("8x corpus scale rehearsal: dedup/similarity stay output-bound") {
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft-scale8"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    val rep = (0 until 8).map { i =>
      if (i == 0) docs
      else docs.withColumn("doc_id", col("doc_id") + lit(i * maxId))
        .withColumn("text", concat(col("text"), lit(s" replica$i")))
    }.reduce(_ unionByName _)
    rep.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVid = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until 8).map { i =>
      if (i == 0) emb else emb.withColumn("vec_id", col("vec_id") + lit(i * maxVid))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("q_prefix_jaccard", "q_dup_span_runs", "q_span_scrub", "q_dedup_minhash",
        "q_dedup_simhash_pairs", "q_span_dedup", "q_semdedup", "q_dedup_exact", "q_kcore",
        "q_classifier_score", "q_gram_matrix")) {
      val fn = Queries.queries(q)
      val t1 = time(fn(spark, src).write.mode("overwrite").format("noop").save())
      val t8 = time(fn(spark, dst).write.mode("overwrite").format("noop").save())
      info(f"$q%-24s sf0.1=$t1%6.1f s  8x=$t8%6.1f s  ratio=${t8 / t1}%5.2f")
    }
  }

  /** ANN rehearsal over an 8× embedding corpus (sf0.1 × 8 = ~40k
    * vectors, each with 7 exact twins — adversarial for candidate
    * dedup): fixed 20-query side, corpus side 8×. Expected shapes:
    * the PQ/ADC scan is corpus-LINEAR by construction (it is a scan —
    * O(m) lookups per candidate; the win is the constant, not the
    * asymptote), two-stage rescore adds only the fixed-size shortlist
    * join on top, and two-level IVF is candidate-bound (probed-cell
    * volume), i.e. sublinear vs the scan pair.
    *
    * Recorded results (round 10; warm pass first, best-of-2 per point):
    * {{{
    *   q_embed_pq (full encode)     0.3 s -> 0.3 s (0.9x)   (map-only; job fixed cost dominates)
    *   pqAdcTopK                    1.2 s -> 1.3 s (1.1x)
    *   pqAdcRescoreTopK             1.0 s -> 1.3 s (1.3x)
    *   ivfTopK2 (k=1024,cp=8,ap=2)  0.9 s -> 1.4 s (1.6x)
    *   lshTopK  (8 tables)          0.5 s -> 0.6 s (1.3x)
    * }}}
    * All ≤1.6× wall at 8× corpus (fixed job latency still dominates at
    * this absolute size) — every path is candidate- or scan-constant-
    * bound, none re-introduces an all-pairs stage.
    */
  ignore("8x embedding corpus ANN rehearsal: PQ scan linear, IVF2/LSH candidate-bound") {
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft-scale8-ann"
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVid = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until 8).map { i =>
      if (i == 0) emb else emb.withColumn("vec_id", col("vec_id") + lit(i * maxVid))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    import graft.functions.VectorFns
    val e8 = spark.read.parquet(s"$dst/embeddings.parquet")
    val q1 = emb.filter(col("vec_id") < 20)
    for ((name, run) <- Seq[(String, org.apache.spark.sql.DataFrame => Unit)](
        ("q_embed_pq(encode)", c => noop(
          c.select(col("vec_id"), VectorFns.quantizeFast(col("embedding")).as("qv"))
            .select(VectorFns.pqEncode(col("qv"),
              VectorFns.pqCodebook(c, "vec_id", "embedding")).as("codes")))),
        ("pqAdcTopK", c => noop(VectorFns.pqAdcTopK(q1, c, "vec_id", "embedding", 5))),
        ("pqAdcRescoreTopK", c => noop(
          VectorFns.pqAdcRescoreTopK(q1, c, "vec_id", "embedding", 5, shortlist = 40))),
        ("ivfTopK2", c => noop(VectorFns.ivfTopK2(q1, c, "vec_id", "embedding", 5,
          kCentroids = 1024, nprobe = 64, coarseProbes = 8, assignProbes = 2))),
        ("lshTopK", c => noop(VectorFns.lshTopK(q1, c, "vec_id", "embedding", 5))))) {
      run(emb) // warm: codegen compile + JIT must not land on a timed point
      val t1 = math.min(time(run(emb)), time(run(emb)))
      val t8 = math.min(time(run(e8)), time(run(e8)))
      info(f"$name%-22s sf0.1=$t1%6.1f s  8x=$t8%6.1f s  ratio=${t8 / t1}%5.2f")
    }
  }

  /** Triangle-density rehearsal — the superlinear graph pair. The 8×
    * near-dup corpus multiplies simhash graph EDGES ~60× (see the main
    * rehearsal), and the exact wedge walk is m^1.5-bounded, so the sf0.1
    * 8× point is ~hours — deliberately out of rehearsal budget. The
    * density ENVELOPE is instead measured on an sf0.01-based 8× corpus,
    * where the same 60×-edges regime completes in minutes: what is
    * being measured is the growth SHAPE (exact m^1.5 vs the DOULION
    * twin's p³-cut), which is scale-free.
    *
    * Recorded results (round 10, sf0.01 base → 8× replicas):
    * {{{
    *   edges (simhash pairs)  2,989 -> 196,610  (65.8x)
    *   q_triangles          2.4 s -> 4.6 s (1.92x)
    *   q_triangles_approx   1.6 s -> 1.8 s (1.12x)
    * }}}
    * Reading: 65.8× edges cost the exact walk 1.92× wall — far inside
    * the m^1.5 worst case (≈530×), because degree-ordered orientation
    * bounds wedge fan-out by √m and fixed job latency still dominates
    * at this absolute size; the sampled twin grows even flatter (1.12×)
    * with its p³ wedge-work cut (its floor is the shared pair-mining
    * pass, not the wedge join). Both stay equi-join shapes throughout —
    * no all-pairs stage appears at any density.
    */
  ignore("8x corpus triangle rehearsal: exact m^1.5 walk vs DOULION twin under 60x edge density") {
    val src = "/root/testdata/sf0.01"
    val dst = "/tmp/graft-scale8-small"
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until 8).map { i =>
      if (i == 0) docs
      else docs.withColumn("doc_id", col("doc_id") + lit(i * maxId))
        .withColumn("text", concat(col("text"), lit(s" replica$i")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val e1 = graft.functions.DedupFns
      .simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3).count()
    val e8 = graft.functions.DedupFns
      .simhashNearDupPairs(spark.read.parquet(s"$dst/documents.parquet"),
        "doc_id", "text", maxHamming = 3).count()
    info(f"edges: sf0.01=$e1%,d  8x=$e8%,d  (${e8.toDouble / e1}%.1fx)")
    for (q <- Seq("q_triangles", "q_triangles_approx")) {
      val fn = Queries.queries(q)
      val t1 = time(fn(spark, src).write.mode("overwrite").format("noop").save())
      val t8 = time(fn(spark, dst).write.mode("overwrite").format("noop").save())
      info(f"$q%-20s sf0.01=$t1%6.1f s  8x=$t8%6.1f s  ratio=${t8 / t1}%5.2f")
    }
  }
}
