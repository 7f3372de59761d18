package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Measures the LSH ANN's recall against the brute-force baseline so
  * the scale path's quality is a tested number, not an assumption.
  */
class AnnRecallSpec extends SparkSpecBase {

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-table LSH recall vs brute force is measured and bounded") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val truth = topkSet(VectorFns.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val lsh2 = topkSet(VectorFns.lshTopK(q, e, "vec_id", "embedding", 5, tables = 2))
    val lsh8 = topkSet(VectorFns.lshTopK(q, e, "vec_id", "embedding", 5, tables = 8))
    val r2 = (truth & lsh2).size.toDouble / truth.size
    val r8 = (truth & lsh8).size.toDouble / truth.size
    info(f"recall@5 (4 planes): 2 tables = $r2%.3f, 8 tables = $r8%.3f (${truth.size} truth pairs)")
    assert(r8 >= r2, s"more tables must not lose recall: $r8 < $r2")
    assert(r8 >= 0.3, s"8-table recall collapsed on random data: $r8")
  }

  test("cosineCandidates ⊇ cosineNearDupPairs: banding inputs cover every thresholded pair") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val thresholded = VectorFns.cosineNearDupPairs(e, "vec_id", "embedding", 1, 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = VectorFns.cosineCandidates(e, "vec_id", "embedding")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(thresholded.subsetOf(cands),
      s"${(thresholded -- cands).size} thresholded pairs missing from candidates")
    assert(cands.size >= thresholded.size && cands.nonEmpty)
  }

  test("IVF recall vs brute force is measured and grows with nprobe") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val truth = topkSet(VectorFns.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val p1 = topkSet(VectorFns.ivfTopK(q, e, "vec_id", "embedding", 5, kCentroids = 16, nprobe = 1))
    val p4 = topkSet(VectorFns.ivfTopK(q, e, "vec_id", "embedding", 5, kCentroids = 16, nprobe = 4))
    val r1 = (truth & p1).size.toDouble / truth.size
    val r4 = (truth & p4).size.toDouble / truth.size
    info(f"IVF recall@5 (16 centroids): nprobe=1 $r1%.3f, nprobe=4 $r4%.3f (${truth.size} truth pairs)")
    assert(r4 >= r1, s"more probes must not lose recall: $r4 < $r1")
    assert(r4 >= 0.3, s"nprobe=4 recall collapsed on random data: $r4")
  }

  test("ivfRecallCurve: each point equals an independent ivfTopK(nprobe=p) evaluation, monotone") {
    // the curve computes all points from ONE shared candidate frame
    // (probe-rank filter + per-point re-rank); this pins every point to
    // what the production retrieval path would actually serve at that
    // nprobe — the shared-frame optimization must be value-invisible
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val truth = topkSet(VectorFns.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val nQ = truth.map(_._1).size
    val curve = VectorFns.ivfRecallCurve(q, e, "vec_id", "embedding", 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(curve.keySet === Set(1L, 2L, 4L, 8L))
    Seq(1, 2, 4, 8).foreach { p =>
      val pt = topkSet(VectorFns.ivfTopK(q, e, "vec_id", "embedding", 5, kCentroids = 16, nprobe = p))
      val hits = (truth & pt).size.toLong
      val (gotHits, gotNq, gotMilli) = curve(p.toLong)
      assert(gotHits === hits, s"nprobe=$p: curve hits $gotHits != independent ivfTopK hits $hits")
      assert(gotNq === nQ.toLong)
      assert(gotMilli === hits * 1000 / (5L * nQ))
    }
    val milli = Seq(1L, 2L, 4L, 8L).map(p => curve(p)._3)
    assert(milli == milli.sorted, s"recall must be monotone in nprobe: $milli")
    info(s"IVF recall@5 curve (16 centroids), milli per nprobe 1/2/4/8: ${milli.mkString("/")}")
  }

  test("ivfTopK2 with full coarse probing is IDENTICAL to single-level ivfTopK") {
    // assignProbes = coarseProbes = k1 probes every coarse cell, so the
    // fine argmin ranges over all fine centroids and the two-level path
    // must reproduce the single-level result EXACTLY (same assignment,
    // same probes, same rescore) — the correctness anchor that lets the
    // truncated scale settings be judged purely on recall
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "score", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val k1 = math.ceil(math.sqrt(16.0)).toInt
    val one = rows(VectorFns.ivfTopK(q, e, "vec_id", "embedding", 5, kCentroids = 16, nprobe = 4))
    val two = rows(VectorFns.ivfTopK2(q, e, "vec_id", "embedding", 5, kCentroids = 16,
      nprobe = 4, coarseProbes = k1, assignProbes = k1))
    assert(two == one, s"two-level(full probing) diverged: ${(two diff one).take(5)} vs ${(one diff two).take(5)}")
  }

  test("ivfTopK2 at k>=1024 centroids: no plan literal blowup, recall measured at scale settings") {
    // the production-shape path: 1024 fine centroids would be a ~0.5MB
    // plan literal in single-level form; two-level keeps the literal at
    // k1=32 vectors and ships the fine set as a broadcast relation
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val truth = topkSet(VectorFns.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val out = VectorFns.ivfTopK2(q, e, "vec_id", "embedding", 5,
      kCentroids = 1024, nprobe = 64, coarseProbes = 8, assignProbes = 2)
    val got = topkSet(out)
    val r = (truth & got).size.toDouble / truth.size
    info(f"two-level IVF recall@5 (1024 centroids, 8/32 coarse cells probed): $r%.3f")
    assert(r >= 0.3, s"two-level recall collapsed: $r")
    // the single-level literal is the scale hazard being designed out:
    // the two-level plan must not embed a fine-centroid literal. A
    // 1024-vector literal would render as a >100k-char plan string;
    // the coarse literal (32 vectors) stays far below that.
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.length < 100000, s"plan string blew up to ${plan.length} chars — literal leak?")
  }

  test("PQ: codes valid, sample vectors encode losslessly, self-ADC distance equals qerr") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = VectorFns.pqCodebook(e, "vec_id", "embedding")
    assert(cb.length == 8 && cb.forall(_.length == 16) && cb.forall(_.forall(_.length == 8)))
    val enc = e
      .select(col("vec_id"), VectorFns.quantizeFast(col("embedding")).as("qv"))
      .select(col("vec_id"), col("qv"), VectorFns.pqEncode(col("qv"), cb).as("codes"))
      .select(col("vec_id"), col("codes"),
        VectorFns.pqError(col("qv"), col("codes"), cb).as("qerr"),
        VectorFns.pqAdcDistance(
          VectorFns.pqDistTable(col("qv"), cb), col("codes"), 8, 16).as("self_adist"))
      .collect()
    enc.foreach { r =>
      val codes = r.getSeq[Long](1)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16),
        s"invalid codes $codes for vec ${r.getLong(0)}")
      assert(r.getLong(2) >= 0, s"negative qerr for vec ${r.getLong(0)}")
      // the ADC distance of a vector to ITSELF (through its own codes)
      // is by definition its quantization error — the identity that
      // pins dist-table lookups to the encode arithmetic
      assert(r.getLong(3) == r.getLong(2),
        s"self-ADC ${r.getLong(3)} != qerr ${r.getLong(2)} for vec ${r.getLong(0)}")
    }
    // the 16 codebook-sample vectors ARE codebook entries in every
    // subspace, so they must encode with zero error
    assert(enc.count(_.getLong(2) == 0L) >= 16, "codebook sample vectors not lossless")
  }

  test("PQ/ADC recall vs exact-L2 top-5 is measured and bounded") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    // exact integer-L2 truth (ADC approximates L2, not dot, so the
    // baseline must be the L2 ranking)
    val qv = q.select(col("vec_id").as("query_id"), VectorFns.quantizeFast(col("embedding")).as("qa"))
    val cv = e.select(col("vec_id").as("neighbor_id"), VectorFns.quantizeFast(col("embedding")).as("ca"))
    val d2 = VectorFns.qdotFast(col("qa"), col("qa")) + VectorFns.qdotFast(col("ca"), col("ca")) -
      lit(2L) * VectorFns.qdotFast(col("qa"), col("ca"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    val truth = topkSet(broadcast(qv).join(cv, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5))
    // random data is PQ's hardest case (no cluster structure for the
    // codebook to exploit) — measure the recall LEVER (codes per
    // subspace) the way the LSH test measures tables: k=64 strictly
    // refines k=16 (the (md5,id) sample nests), so error drops and
    // recall must not collapse
    val adc16 = topkSet(VectorFns.pqAdcTopK(q, e, "vec_id", "embedding", 5, k = 16))
    val adc64 = topkSet(VectorFns.pqAdcTopK(q, e, "vec_id", "embedding", 5, k = 64))
    val r16 = (truth & adc16).size.toDouble / truth.size
    val r64 = (truth & adc64).size.toDouble / truth.size
    info(f"PQ/ADC recall@5 vs exact L2: 8x16 codebook $r16%.3f, 8x64 codebook $r64%.3f")
    assert(r64 >= r16, s"larger codebook lost recall: $r64 < $r16")
    // the production composition: ADC shortlists 8x candidates, exact
    // re-rank touches only the shortlist — recall recovers while the
    // corpus-sized scan stays O(m) lookups per candidate
    val rr = topkSet(VectorFns.pqAdcRescoreTopK(q, e, "vec_id", "embedding", 5, shortlist = 40))
    val rRr = (truth & rr).size.toDouble / truth.size
    info(f"PQ/ADC + exact re-rank (shortlist 40) recall@5: $rRr%.3f")
    assert(rRr >= r16, s"re-rank lost recall vs plain ADC: $rRr < $r16")
    assert(rRr >= 0.3, s"re-ranked recall collapsed: $rRr")
  }

  test("IVF-PQ recall vs exact-L2 top-5: residual parity at full probing, probe lever measured") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val qv = q.select(col("vec_id").as("query_id"), VectorFns.quantizeFast(col("embedding")).as("qa"))
    val cv = e.select(col("vec_id").as("neighbor_id"), VectorFns.quantizeFast(col("embedding")).as("ca"))
    val d2 = VectorFns.qdotFast(col("qa"), col("qa")) + VectorFns.qdotFast(col("ca"), col("ca")) -
      lit(2L) * VectorFns.qdotFast(col("qa"), col("ca"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2"), col("neighbor_id"))
    val truth = topkSet(broadcast(qv).join(cv, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5))
    // full probing (nprobe = kCells) makes the candidate set the whole
    // corpus — identical to plain ADC's — isolating the residual-coding
    // term. On UNIFORM RANDOM data residuals against random centroids
    // are as wide as the raw vectors, so IVFADC's residual advantage
    // (Jégou 2011 §IVFADC — real on clustered embeddings) measures as
    // PARITY here (0.090 vs 0.100 at 100 truth pairs = within one-pair
    // noise); the fences pin parity-within-noise, the probe lever, and
    // a collapse floor — not a superiority the data cannot show
    val full = topkSet(VectorFns.ivfPqTopK(q, e, "vec_id", "embedding", 5, nprobe = 16))
    val p4 = topkSet(VectorFns.ivfPqTopK(q, e, "vec_id", "embedding", 5, nprobe = 4))
    val plain = topkSet(VectorFns.pqAdcTopK(q, e, "vec_id", "embedding", 5))
    val rF = (truth & full).size.toDouble / truth.size
    val r4 = (truth & p4).size.toDouble / truth.size
    val rP = (truth & plain).size.toDouble / truth.size
    info(f"IVF-PQ recall@5: full probing $rF%.3f vs plain ADC $rP%.3f; nprobe=4 $r4%.3f")
    assert(rF >= rP - 0.05, s"residual coding badly lost recall at equal candidates: $rF vs $rP")
    assert(rF >= r4, s"full probing must not lose recall vs truncated: $rF < $r4")
    assert(r4 >= 0.03, s"IVF-PQ truncated recall collapsed: $r4")
  }

  test("binary sign-code Hamming ANN: recall vs dot-product truth measured and bounded") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    // Hamming on sign codes approximates ANGULAR distance — the right
    // truth is the dot-product ranking (bruteForceTopK), not L2
    val truth = topkSet(VectorFns.bruteForceTopK(q, e, "vec_id", "embedding", 5))
    val bin = topkSet(VectorFns.binaryHammingTopK(q, e, "vec_id", "embedding", 5))
    val r = (truth & bin).size.toDouble / truth.size
    info(f"binary-Hamming recall@5 (64-bit sign codes, random data): $r%.3f")
    assert(r >= 0.1, s"binary-Hamming recall collapsed: $r")
    // structural: Hamming of a vector with itself is 0, so the code is
    // consistent — checked via the self-join diagonal being excluded
    // and all distances within [0, 64]
    val hs = VectorFns.binaryHammingTopK(q, e, "vec_id", "embedding", 5)
      .select("hamming").collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h <= 64))
  }

  test("semDedupReport auto-k: cells stay O(sqrt(n)) — the bound that motivates the sqrt rule") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val k = VectorFns.autoCentroidCount(n)
    assert(k == math.ceil(math.sqrt(n.toDouble)).toInt)
    val cells = VectorFns.semDedupReport(e, "vec_id", "embedding", tauNum = 1, tauDen = 4)
      .collect()
    assert(cells.length <= k, "more cells than centroids")
    assert(cells.map(_.getLong(1)).sum == n, "every vector assigned to exactly one cell")
    val mx = cells.map(_.getLong(1)).max
    // expected cell size is n/k ≈ sqrt(n); deterministic pseudo-random
    // centroid picks keep the max within a small factor of it (measured
    // ~1.5x at sf0.001/0.1) — 4x is the regression fence
    assert(mx <= 4L * k, s"max cell $mx exceeds 4*sqrt(n)=${4L * k}: pair work no longer O(n*sqrt(n))")
  }
}
