package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.operators.Relational

/** Round-15 fences for the VERDICT r14 items:
  *
  *  - TWO-LEVEL k-means training (VectorFns.kmeansTrain2) is
  *    bit-identical to the single-level literal loop at full coarse
  *    probing — the equivalence that lets q_kmeans_train run the
  *    production (no k·d plan literal / driver collect) shape under
  *    the unchanged oracle;
  *  - LPA checkpoint-per-round discipline: the label plan stays flat
  *    at iters = 12 (bounded by the 4-round cut cadence, never nesting
  *    every prior round), and the result still matches the brute-force
  *    synchronous LPA at iters = 8 — including on STRING ids, which
  *    the old (max(cnt, −label)) tie-break could not order;
  *  - pcaPower fails loudly on a ragged corpus instead of silently
  *    building the mean outer product from inconsistent counts;
  *  - q_domain_sim fails loudly when a source centroid's norm² exceeds
  *    the unit-norm milli envelope (the cos²·1000 overflow guard).
  */
class Round15OpsSpec extends SparkSpecBase {

  // ---- two-level k-means == single-level at full probing -----------------

  test("kmeansTrain2 (full probing) is bit-identical to kmeansTrain on the sf0.001 embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    for ((k, rounds) <- Seq((16, 3), (7, 2), (4, 1))) {
      val single = canon(VectorFns.kmeansTrain(e, "vec_id", "embedding", k, rounds))
      val two = canon(VectorFns.kmeansTrain2(e, "vec_id", "embedding", k, rounds))
      assert(two === single, s"two-level != single-level at k=$k rounds=$rounds")
    }
  }

  test("kmeansTrain auto-routes past k=1024 to the relation path and stays consistent") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // above the route threshold the two entrypoints are the same loop;
    // the corpus (500 vectors) is smaller than k, exercising the
    // short-table edge through the routed path end to end
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val routed = canon(VectorFns.kmeansTrain(e, "vec_id", "embedding", 1500, 1))
    val direct = canon(VectorFns.kmeansTrain2(e, "vec_id", "embedding", 1500, 1))
    assert(routed === direct)
    assert(routed.map(_._2).sum > 0L)
  }

  test("kmeansTrain2 degrades gracefully below kCentroids and on an empty corpus") {
    import spark.implicits._
    val tiny = Seq((1L, Array.fill(64)(0.5f)), (2L, Array.fill(64)(-0.25f)))
      .toDF("vec_id", "embedding")
    val got = VectorFns.kmeansTrain2(tiny, "vec_id", "embedding", kCentroids = 16, rounds = 2)
      .collect()
    assert(got.map(_.getLong(1)).sum === 2L) // both vectors assigned
    val empty = tiny.filter(col("vec_id") < 0)
    assert(VectorFns.kmeansTrain2(empty, "vec_id", "embedding", 16, 2).collect().isEmpty)
  }

  test("kmeansTrain2 truncated probing stays a valid partition (approximate path shape)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.filter(col("embedding").isNotNull).count()
    val got = VectorFns.kmeansTrain2(e, "vec_id", "embedding",
      kCentroids = 16, rounds = 2, assignProbes = 1).collect()
    // every non-null vector lands in exactly one cluster even when only
    // one coarse cell is probed (quantize nulls screened like the exact path)
    val quantNull = e.select(VectorFns.quantizeFast(col("embedding")).as("q"))
      .filter(col("q").isNull).count()
    assert(got.map(_.getLong(1)).sum === n - quantNull)
    assert(got.map(_.getLong(2)).forall(_ >= 0L)) // inertia non-negative
  }

  // ---- LPA: flat plan at high iters + string-id tie-break ----------------

  private def bruteLpaStr(pairs: Seq[(String, String)], iters: Int): Map[String, String] = {
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[String, String] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lab = adj.map { case (v, ns) =>
        val votes = ns.groupBy(lab).view.mapValues(_.size).toSeq
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelPropagation at iters=8 matches brute force on STRING ids (order-safe tie-break)") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("x", "y"), ("x", "z"),
      ("y", "z"), ("c", "x"), ("b", "y"))
    val got = Relational.labelPropagation(pairs.toDF("id_a", "id_b"), "id_a", "id_b", iters = 8)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === bruteLpaStr(pairs, 8))
  }

  test("labelPropagation numeric result is unchanged by the checkpoint cadence (iters 3 and 8 vs brute force)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (11L, 12L), (11L, 13L),
      (12L, 13L), (3L, 11L), (2L, 12L))
    def brute(iters: Int): Map[Long, Long] = {
      val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
      for (_ <- 1 to iters) {
        lab = adj.map { case (v, ns) =>
          val votes = ns.groupBy(lab).view.mapValues(_.size).toSeq
          v -> votes.minBy { case (l, c) => (-c, l) }._1
        }
      }
      lab
    }
    for (iters <- Seq(3, 8)) {
      val got = Relational.labelPropagation(pairs.toDF("id_a", "id_b"), "id_a", "id_b", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(iters), s"iters=$iters mismatch")
    }
  }

  test("labelPropagation plan stays flat past the cut cadence (iters=12 no deeper than iters=4)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("id_a", "id_b")
    def planDepth(iters: Int): Int =
      Relational.labelPropagation(pairs, "id_a", "id_b", iters)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    val d4 = planDepth(4)   // last cut at round 4 → ≤3 uncut rounds on top
    val d12 = planDepth(12) // last cut at round 12 → same residue
    assert(d12 <= d4 + 2,
      s"iters=12 plan ($d12 nodes) nests rounds the cut discipline should have truncated (iters=4: $d4)")
  }

  // ---- q_bpe_encode vs an independent plain-Scala BPE encoder -----------

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r15_bpe").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Independent encoder: learn k merges with the brute learner
    * (Round14OpsSpec's algorithm restated), then greedily apply them
    * in merge order to every token of every document. Shares nothing
    * with the query but the declared tie-break and the h60 rendering.
    */
  private def bruteBpeEncode(docs: Seq[(Long, Seq[String])], k: Int)
      : Map[Long, (Long, Long, Long)] = {
    val vocab = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // learn
    var words: Map[String, Vector[String]] =
      vocab.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, sy) =>
        sy.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + vocab(w)
          case _            =>
        }
      }
      if (counts.nonEmpty) {
        val (x, y) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        words = words.view.mapValues { sy =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == x && sy(i + 1) == y) { merged += (x + y); i += 2 }
            else { merged += sy(i); i += 1 }
          }
          merged.result()
        }.toMap
      }
    }
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }
    docs.map { case (id, toks) =>
      val encs = toks.map(words(_))
      val seq = encs.map(_.mkString("  ")).mkString(" | ")
      id -> ((toks.size.toLong, encs.map(_.size.toLong).sum, h60(seq)))
    }.toMap
  }

  test("q_bpe_encode matches the independent brute encoder (counts + ordered fingerprint)") {
    // back-to-back merge targets ("ababab"), the Sennrich vocabulary,
    // repeated tokens (fingerprint must keep every occurrence in order)
    val texts = Seq(
      "low low low low low lower lower newest newest newest newest newest newest widest widest widest",
      "ababab abab low newest ababab",
      "aaa aa aaa low low widest")
    val dir = writeDocs(texts)
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong + 1, t.split(" ").toSeq) }
    val want = bruteBpeEncode(docs, 10)
    val got = Queries.queries("q_bpe_encode")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === want)
  }

  test("q_bpe_encode totals reconcile with the q_bpe_apply compression curve on sf0.001") {
    // Σ n_tokens over docs == round-10 total_instances (the curve's
    // corpus-length line) and Σ n_words == Σ word frequencies — the
    // encode IS the corpus the curve describes
    val enc = Queries.queries("q_bpe_encode")(spark, sfDir)
      .agg(sum(col("n_words")), sum(col("n_tokens"))).collect()(0)
    val curve = Queries.queries("q_bpe_apply")(spark, sfDir)
      .filter(col("merge_round") === 10).collect()(0)
    assert(enc.getLong(1) === curve.getLong(3),
      s"encode total subwords ${enc.getLong(1)} != apply round-10 total_instances ${curve.getLong(3)}")
  }

  // ---- q_overlap_counts == endpoint fold of the exact pair query --------

  test("sweepLineOverlapTotals matches the brute-force pair fold on adversarial interval sets") {
    import spark.implicits._
    // touching intervals (zero-length overlap still COUNTS), point
    // intervals, identical intervals across keys, equal endpoints
    // across keys, nested + chained overlaps, an isolated key, and a
    // key with two disjoint sessions both overlapping others
    val iv = Seq(
      (1L, 0L, 100L), (1L, 200L, 300L),
      (2L, 100L, 150L),            // touches key 1's first interval
      (3L, 50L, 250L),             // spans the gap, overlaps three
      (4L, 120L, 120L),            // point interval inside key 3 & 2
      (5L, 0L, 100L),              // identical to key 1's first
      (6L, 1000L, 1100L),          // isolated
      (7L, 60L, 80L), (7L, 210L, 290L))
      .toDF("user_id", "lo", "hi")
    val got = graft.operators.Joins.sweepLineOverlapTotals(iv, "user_id", "lo", "hi", width = 64L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute force: all cross-key closed-interval pairs
    val rows = iv.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield (a._1, b._1, math.min(a._3, b._3) - math.max(a._2, b._2))
    val want = pairs.flatMap { case (ua, ub, ov) => Seq((ua, ov), (ub, ov)) }
      .groupBy(_._1).view.mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    assert(got === want)
    assert(!got.contains(6L), "isolated key must not appear")
  }

  test("q_overlap_counts equals the per-user endpoint fold of q_overlap_sessions") {
    val pairs = Queries.queries("q_overlap_sessions")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = pairs.flatMap { case (a, b, n, us) => Seq((a, n, us), (b, n, us)) }
      .groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.map(_._3).sum)).toMap
    val got = Queries.queries("q_overlap_counts")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  // ---- TokenMat graduation: flag-on == flag-off, exactly -----------------

  test("TokenMat flag re-points bm25/ppl_scale/tfidf/bigram_lm with exact parity") {
    val names = Seq("q_bm25", "q_ppl_buckets_scale", "q_tfidf_topterms",
      "q_bigram_lm", "q_ppl_buckets")
    def collectAll(): Map[String, Seq[String]] =
      names.map { n =>
        val df = Queries.queries(n)(spark, sfDir)
        n -> df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      }.toMap
    val off = collectAll()
    val (table, _, nDocs) = TokenMat.materialize(spark, sfDir, "graft_tokens_sf0_001")
    try {
      spark.conf.set("spark.graft.tokenmat", "1")
      assert(Queries.tokenMatTable(spark, sfDir).isDefined,
        "flag set + table present, but tokenMatTable resolved nothing")
      assert(nDocs === spark.read.parquet(s"$sfDir/documents.parquet").count())
      val on = collectAll()
      names.foreach(n => assert(on(n) === off(n), s"$n diverged under the TokenMat flag"))
    } finally {
      spark.conf.set("spark.graft.tokenmat", "0")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    // flag off again: resolver must decline even with the table present
    assert(Queries.tokenMatTable(spark, sfDir).isEmpty)
  }

  // ---- fork: multi-consumer semantics (reference StreamExt::fork) --------

  test("fork: two concurrent consumers of one stream each observe EVERY record (multi-consumer backpressure)") {
    // the reference's fork hands every record to every consumer, each
    // progressing at its own pace; Structured Streaming's fork = two
    // writeStream queries off ONE source DataFrame. Two sinks, one of
    // them through a heavier (aggregating) plan, fed batch-by-batch:
    // BOTH must observe the complete tape — no record is consumed away
    // from the other query, no batch is skipped by the slower plan.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val src = ms.toDF().toDF("k", "v")
    val fast = src.writeStream.format("memory").queryName("r15_fork_fast")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    val slow = src.groupBy(col("k")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("r15_fork_slow")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    val tape = (1L to 500L).map(i => (i % 7, i))
    try {
      tape.grouped(100).foreach { b =>
        ms.addData(b)
        fast.processAllAvailable(); slow.processAllAvailable()
      }
    } finally { fast.stop(); slow.stop() }
    val got = spark.table("r15_fork_fast").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === tape.sorted, "fast consumer missed records")
    val agg = spark.table("r15_fork_slow").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = tape.groupBy(_._1).view.mapValues(xs => (xs.map(_._2).sum, xs.size.toLong)).toMap
    assert(agg === want, "slow consumer's aggregate diverged from the full tape")
  }

  // ---- codegen-fallback guard ---------------------------------------------

  test("CodegenGuard observes CodeGenerator ERROR events (self-test) and drain clears") {
    spark // force session creation → guard installed
    org.apache.logging.log4j.LogManager
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .error("graft-guard-selftest: injected marker")
    val errs = CodegenGuard.drain()
    assert(errs.exists(_.contains("graft-guard-selftest")),
      s"guard missed an injected CodeGenerator ERROR; drained: $errs")
    assert(CodegenGuard.drain().isEmpty, "drain must clear the buffer")
  }

  test("PQ distance table is ONE kernel call (no unrolled m·k projection) and value-exact") {
    import spark.implicits._
    // 8×64 codebook — the exact setting whose unrolled form generated a
    // class past janino's limits (VERDICT r14 item 1)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = VectorFns.pqCodebook(e, "vec_id", "embedding", m = 8, k = 64)
    val q = e.limit(4).select(col("vec_id"),
      VectorFns.quantizeFast(col("embedding")).as("qv"))
      .filter(col("qv").isNotNull)
    val dtab = q.select(col("vec_id"), VectorFns.pqDistTable(col("qv"), cb).as("dtab"))
    // the plan must carry ONE graft_pq_dist_table kernel, not 512 qdots
    val plan = dtab.queryExecution.optimizedPlan.toString
    assert(plan.contains("pqdisttable") || plan.toLowerCase.contains("pqdisttable"),
      s"expected the native PqDistTableExpr in the plan")
    // value parity vs a plain-Scala replay of the d² entries
    val got = dtab.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val qvs = q.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    qvs.foreach { case (id, qv) =>
      val want = for (mi <- cb.indices; j <- cb(mi).indices) yield {
        val sub = cb(mi)(j).length
        val sv = qv.slice(mi * sub, mi * sub + sub)
        sv.zip(cb(mi)(j)).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      assert(got(id) === want, s"dist table mismatch for vec $id")
    }
    // and the codegen guard saw no fallback while evaluating it
    assert(CodegenGuard.drain().isEmpty, "PQ dist-table plan fell back to interpreted eval")
  }

  // ---- loud-failure guards ------------------------------------------------

  test("pcaPower rejects a ragged corpus loudly") {
    import spark.implicits._
    val ragged = Seq(
      (1L, Array.fill(64)(0.5f)),
      (2L, Array.fill(32)(0.5f))) // 32-dim intruder
      .toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      VectorFns.pcaPower(ragged, "embedding", dims = 64, iters = 2)
    }
    assert(err.getMessage.contains("ragged"))
    // fixed-width corpus still works
    val fixed = Seq((1L, Array.fill(64)(0.5f)), (2L, Array.fill(64)(-0.25f)))
      .toDF("vec_id", "embedding")
    assert(VectorFns.pcaPower(fixed, "embedding", dims = 64, iters = 2).length === 64)
  }

  test("q_domain_sim rejects centroids beyond the unit-norm milli envelope loudly") {
    import spark.implicits._
    // 64 dims at 3.0 → norm² = 64·3000² = 576e6 >> 64e6: would overflow
    // cos2_milli at dot²·1000 — the guard must fire before the pairwise join
    val hot = (1L to 8L).map(i => (i, Array.fill(64)(3.0f))).toDF("vec_id", "embedding")
    val docs = (1L to 8L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "source")
    val err = intercept[IllegalArgumentException] {
      Queries.domainSimOf(hot, docs).collect()
    }
    assert(err.getMessage.contains("overflow") || err.getMessage.contains("envelope"))
  }
}
