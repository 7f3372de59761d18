package graft

import org.apache.spark.sql.functions._

/** Round-14 fences:
  *
  *  - q_bpe_merges must reproduce Sennrich et al. 2016's worked example
  *    (figure 1: vocab low×5 lower×2 newest×6 widest×3) — the tie-free
  *    prefix of the merge sequence exactly, and the full 10 rounds
  *    against an independent brute-force BPE learner that shares only
  *    the (count desc, pair asc) tie-break with the query.
  *  - The double-space `replace` merge application must equal the
  *    greedy left-to-right non-overlapping fold on adversarial symbol
  *    runs (back-to-back "a b a b" occurrences, overlapping "a a a") —
  *    the single-space join's shared-boundary bug is the regression
  *    being fenced.
  *  - TopKPairsAgg's typed input contract: numeric args implicitly
  *    cast (int score stays correct), non-numeric args fail ANALYSIS
  *    instead of ClassCastException inside executors.
  */
class Round14OpsSpec extends SparkSpecBase {

  /** A tiny documents.parquet-shaped table in a temp dir. */
  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r14-docs").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Independent brute-force BPE learner: word → symbol list (chars +
    * "</w>"), k rounds of (count pairs weighted by freq) → argmax by
    * (count desc, x asc, y asc) → greedy left-to-right non-overlapping
    * merge. Shares NOTHING with the query implementation but the
    * declared tie-break.
    */
  private def bruteBpe(vocab: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      vocab.toSeq.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sy, f) =>
        sy.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _            =>
        }
      }
      if (counts.nonEmpty) {
        val ((x, y), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((x, y, c))
        words = words.map { case (sy, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == x && sy(i + 1) == y) {
              merged += (x + y); i += 2
            } else { merged += sy(i); i += 1 }
          }
          (merged.result(), f)
        }
      }
    }
    out.toSeq
  }

  private def runMerges(dir: String): Seq[(Long, String, String, String, Long)] =
    Queries.queries("q_bpe_merges")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq

  test("q_bpe_merges reproduces Sennrich 2016's worked example (tie-free prefix exact, all 10 vs brute force)") {
    // the paper's vocabulary: {low:5, lower:2, newest:6, widest:3}
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val text = vocab.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val dir = writeDocs(Seq(text))
    val got = runMerges(dir)
    // figure 1's merge sequence is tie-free for the first five rounds:
    // (e,s):9 (es,t):9 (est,</w>):9 (l,o):7 (lo,w):7
    val expectedPrefix = Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L))
    assert(got.take(5).map(m => (m._2, m._3, m._5)) == expectedPrefix,
      s"first 5 merges diverged from Sennrich fig. 1: ${got.take(5)}")
    // the full 10 rounds (ties resolved by the declared lexicographic
    // tie-break) must equal the independent brute-force learner
    val brute = bruteBpe(vocab, 10)
    assert(got.map(m => (m._2, m._3, m._5)) == brute,
      s"query vs brute force diverged:\n  query: ${got.map(m => (m._2, m._3, m._5))}\n  brute: $brute")
    // merged column is lhs||rhs and rounds are 1..10
    got.foreach { case (r, x, y, m, _) => assert(m == x + y && r >= 1 && r <= 10) }
  }

  test("q_bpe_merges merge application: back-to-back and overlapping occurrences match the greedy fold") {
    // "ababab…" words make (a,b) the top pair with back-to-back
    // occurrences (the shared-boundary case single-space replace
    // drops); "aaa" words exercise the overlap rule (greedy merges
    // positions 1-2, leaves 3)
    val vocab = Map("ababab" -> 4L, "abab" -> 3L, "aaa" -> 2L, "ba" -> 1L)
    val text = vocab.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val dir = writeDocs(Seq(text))
    val got = runMerges(dir)
    val brute = bruteBpe(vocab, 10)
    assert(got.map(m => (m._2, m._3, m._5)) == brute,
      s"query vs brute force diverged on adversarial runs:\n  query: ${got.map(m => (m._2, m._3, m._5))}\n  brute: $brute")
    // round 1 must be (a,b) and it must count BOTH back-to-back
    // occurrences per "abab" (4·3 + 3·2 = 18) plus ba's 0 — the
    // single-space bug would still COUNT right but MERGE wrong, so
    // also pin a merged-word invariant via round 2's recount
    assert(got.head._2 == "a" && got.head._3 == "b" && got.head._5 == 18L,
      s"round-1 pair should be (a,b,18), got ${got.head}")
  }

  test("q_bpe_apply: compression curve obeys instances_r = instances_{r-1} - cnt_r against the merge table") {
    // every occurrence of the merged pair collapses 2 symbols into 1,
    // so the tokenized-corpus length must fall by EXACTLY the merge
    // count each round — a cross-op invariant tying q_bpe_apply to
    // q_bpe_merges row by row
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val text = vocab.toSeq.sortBy(_._1)
      .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
    val dir = writeDocs(Seq(text))
    val merges = runMerges(dir)
    val curve = Queries.queries("q_bpe_apply")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(curve.length == 11 && curve.head._1 == 0L)
    // round 0: 4 words; instances = Σ f·(chars+1 for </w>) = 5·4+2·6+6·7+3·7 = 95
    assert(curve.head._2 == 4L && curve.head._4 == 95L, s"round-0 stats: ${curve.head}")
    merges.foreach { case (r, _, _, _, cnt) =>
      val prev = curve(r.toInt - 1)._4
      val cur = curve(r.toInt)._4
      assert(cur == prev - cnt,
        s"round $r: instances $prev -> $cur but merge count was $cnt")
    }
    // n_words never changes; avg falls monotonically (merges only shrink)
    assert(curve.forall(_._2 == 4L))
    assert(curve.sliding(2).forall { case Array(a, b) => b._5 <= a._5 })
  }

  test("TokenMat variants are EXACTLY the original pipelines (sf0.001, all three)") {
    val (table, _, n) = TokenMat.materialize(spark, sfDir, "graft_tokens_spec")
    assert(n > 0)
    try {
      TokenMat.variants(spark, table).foreach { case (name, mkVar) =>
        val orig = Queries.queries(name)(spark, sfDir)
        val varr = mkVar()
        assert(orig.columns.sorted.sameElements(varr.columns.sorted), s"$name schema diverged")
        val cols = orig.columns.sorted.map(col)
        val a = orig.select(cols: _*).collect().map(_.toString).sorted
        val b = varr.select(cols: _*).collect().map(_.toString).sorted
        assert(a.length == b.length && a.sameElements(b),
          s"$name: materialized-token variant diverged (${a.length} vs ${b.length} rows; " +
          s"first diff: ${a.zip(b).find(p => p._1 != p._2)})")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_tokens_spec"): Unit
  }

  test("TopKPairsAgg: numeric args implicitly cast; non-numeric args fail analysis") {
    import spark.implicits._
    import graft.functions.VectorFns
    val df = Seq((1, 10, 100L), (1, 30, 300L), (1, 20, 200L), (2, 5, 50L))
      .toDF("g", "score_int", "id")
    // int score column: pre-fix this threw ClassCastException in
    // executors; the typed contract casts it to long at analysis
    val rows = df.groupBy("g")
      .agg(VectorFns.topKPairs(col("score_int"), col("id"), 2).as("t"))
      .select(col("g"), explode(col("t")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, -t._2))
    assert(rows.toSeq == Seq((1, 30L, 300L), (1, 20L, 200L), (2, 5L, 50L)))
    // a non-castable arg (array) must fail at analysis, not at runtime
    // (strings follow Spark's implicit-cast convention: cast to long,
    // ANSI failure on non-numeric content — same as sum('strcol'))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.withColumn("s", array(lit(1)))
        .groupBy("g").agg(VectorFns.topKPairs(col("s"), col("id"), 2))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }
}
