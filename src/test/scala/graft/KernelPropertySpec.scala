package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.{DedupFns, TextFns, VectorFns}

/** Property-based parity: the native kernels must equal their
  * declarative twins on ADVERSARIAL random inputs, not just the test
  * corpus — unicode, control characters, empty/whitespace-only text,
  * degenerate vectors. Each failure here is a silent oracle divergence
  * waiting to happen at scale.
  */
class KernelPropertySpec extends SparkSpecBase {

  private val weirdChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\t', '\n', '', '\f', '\r'),
    3 -> Gen.oneOf('(', ')', ',', '"', ';', ':', '\'', '.'),
    2 -> Gen.oneOf('é', 'ß', '中', '—', 'Ω'),
    1 -> Gen.oneOf('!', '@', '#', '-', '_', '/'))
  private val textGen: Gen[String] = Gen.chooseNum(0, 60)
    .flatMap(n => Gen.listOfN(n, weirdChar).map(_.mkString))

  test("MisraGries: n/k bounds hold under ARBITRARY random merge trees") {
    // the mergeability claim (Agarwal et al.) is the whole reason the
    // sketch can ride partial aggregation — so it is tested against
    // random partition splits and random merge orders, not just
    // Spark's actual merge schedule
    val k = 8
    val mg = new graft.functions.MisraGries(k)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      // zipf-ish stream: few hot tokens + a long tail
      val n = 200 + rnd.nextInt(400)
      val stream = (1 to n).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 30) "hot1" else if (r < 45) "hot2" else s"t${rnd.nextInt(200)}"
      }
      // random partitioning into 1..8 chunks, each reduced independently
      val nChunks = 1 + rnd.nextInt(8)
      val chunks = stream.grouped(math.max(1, n / nChunks)).toVector
      var summaries = chunks.map(c => c.foldLeft(mg.zero)(mg.reduce))
      // random merge tree
      while (summaries.size > 1) {
        val i = rnd.nextInt(summaries.size - 1)
        summaries = summaries.updated(i, mg.merge(summaries(i), summaries(i + 1)))
          .patch(i + 1, Nil, 1)
      }
      val sketch = mg.finish(summaries.head).toMap
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val bound = n.toLong / k
      exact.foreach { case (t, c) =>
        if (c > bound) assert(sketch.contains(t), s"trial $trial: frequent $t freq=$c missing")
      }
      sketch.foreach { case (t, est) =>
        val truth = exact(t)
        assert(est <= truth, s"trial $trial: $t overcounts $est > $truth")
        assert(truth - est <= bound, s"trial $trial: $t undercount ${truth - est} > $bound")
      }
      assert(sketch.size <= k)
    }
  }

  test("spanCoverage: island clip == brute-force window-footprint union on random flag tapes") {
    // the clip arithmetic (__pe + w) is exactly the regime where islands
    // sit 1..w-1 positions apart and their [p, p+w-1] footprints overlap
    // — random dense tapes hit every gap size; brute force marks the
    // footprint token-by-token
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val w = 2 + rnd.nextInt(7) // window widths 2..8
      val tape = for {
        doc <- 1 to 6
        n = 1 + rnd.nextInt(30) // gram positions per doc
        pos <- 0 until n
      } yield (doc.toLong, pos.toLong, if (rnd.nextInt(3) == 0) 1L else 0L)
      val got = graft.functions.DedupFns.spanCoverage(
          tape.toDF("doc_id", "pos", "__dup"), w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val expect = tape.groupBy(_._1).map { case (doc, rows) =>
        val covered = scala.collection.mutable.BitSet.empty
        rows.foreach { case (_, p, d) =>
          if (d == 1L) covered ++= (p.toInt until p.toInt + w)
        }
        doc -> ((rows.size.toLong + w - 1, covered.size.toLong))
      }
      assert(got == expect, s"trial $trial (w=$w): $got vs $expect")
    }
  }

  test("connectedComponents: star contraction == union-find on random graphs") {
    // the alternating large-star/small-star rewrite must produce the
    // same partition as a sequential union-find on ANY graph shape —
    // sparse chains, dense blobs, isolated pairs, self-loops — and
    // converge in logarithmically few rounds
    import spark.implicits._
    // 25 trials: the round-7 isStar under-test (two-level only, missing
    // the single-parent condition) failed ~2% of graphs this shape —
    // 6 trials passed it by luck, 25 would not have
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 25) {
      val nNodes = 20 + rnd.nextInt(60)
      val nEdges = 10 + rnd.nextInt(80)
      val pairs = (1 to nEdges).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }
      // union-find ground truth (path compression, min-root relabel)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expect = nodes.map { id =>
        val root = find(id)
        id -> nodes.filter(find(_) == root).min
      }.toMap

      val (labels, rounds) = graft.operators.Relational
        .connectedComponentsWithRounds(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"trial $trial: partition differs from union-find")
      assert(rounds <= 10, s"trial $trial: $rounds rounds on a ${nNodes}-node graph")
    }
  }

  test("semDedupReport: cell assignment + cosine drop == brute-force reference on random vectors") {
    // the report's three claims — (d2, cid)-ordered cell assignment,
    // the integer cosine-τ drop against ANY smaller-id cell-mate, and
    // members = dropped + kept per cell — checked against a sequential
    // O(n²) reference on random low-dim vectors (low dims make cosine
    // collisions frequent, so the drop path is actually exercised)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 10) {
      val n = 20 + rnd.nextInt(40)
      val dims = 4 + rnd.nextInt(3)
      val vecs = (0 until n).map(i => (i.toLong * 3 + 1, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
      val df = vecs.toDF("vec_id", "embedding")
      val cents = VectorFns.ivfCentroids(df, "vec_id", "embedding", 4)
      def q(v: Array[Float]): Array[Long] = v.map(x => math.floor(x.toDouble * 1000).toLong)
      def d2(a: Array[Long], c: Seq[Long]): Long =
        a.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      def dot(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (x, y) => x * y }.sum
      val qv = vecs.map { case (id, v) => id -> q(v) }.toMap
      val cid = qv.map { case (id, v) =>
        id -> cents.zipWithIndex.map { case (c, i) => (d2(v, c), i.toLong) }.min._2
      }
      val droppedRef = qv.keys.filter { b =>
        qv.keys.exists(a => a < b && cid(a) == cid(b) && {
          val d = dot(qv(a), qv(b))
          val (na, nb) = (dot(qv(a), qv(a)), dot(qv(b), qv(b)))
          d > 0 && d * d * 4 >= na * nb // τ = 1/2
        })
      }.toSet
      val expect = cid.groupBy(_._2).map { case (c, m) =>
        val members = m.keys.toSet
        val dr = members.count(droppedRef).toLong
        c -> (members.size.toLong, dr, members.size - dr)
      }
      val got = VectorFns.semDedupReport(df, "vec_id", "embedding",
          tauNum = 1, tauDen = 2, kCentroids = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == expect, s"trial $trial: report differs from sequential reference")
    }
  }

  test("throttleTime semantics: greedy emit-then-arm is split-invariant") {
    // the streaming operator's per-key state (one timestamp) must make
    // the output independent of WHERE micro-batch boundaries fall —
    // the property that lets the same code run at any trigger rate.
    // Exercised here as a pure kernel walk (the Spark operator is
    // parity-tested in StreamingParitySpec); this pins the invariant
    // on random event sets and random splits.
    def walk(events: Seq[(Long, Double)], interval: Long,
        last0: Long = Long.MinValue): (Seq[Long], Long) = {
      var last = last0
      val out = events.sortBy(identity).flatMap { case (ts, _) =>
        if (last == Long.MinValue || ts - last >= interval) { last = ts; Some(ts) }
        else None
      }
      (out, last)
    }
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(40)
      val events = (1 to n).map(_ => (rnd.nextInt(1000).toLong, rnd.nextDouble()))
        .distinct.sortBy(identity)
      val interval = 1L + rnd.nextInt(200)
      val (whole, _) = walk(events, interval)
      val cut = rnd.nextInt(events.size + 1)
      val (b1, b2) = events.splitAt(cut)
      val (o1, carry) = walk(b1, interval)
      val (o2, _) = walk(b2, interval, carry)
      assert(o1 ++ o2 == whole,
        s"trial $trial: batch split at $cut changed throttle output")
    }
  }

  test("tokens / textStats / fingerprint / simhash: native == declarative on random text") {
    import spark.implicits._
    val texts = (1 to 40).flatMap(i => textGen.sample).distinct
    val df = texts.toDF("text")
    val fast = df.select(
        TextFns.tokensFast(col("text")).as("tk"),
        TextFns.textStatsFast(col("text")).as("ts"),
        TextFns.fingerprintFast(TextFns.tokensFast(col("text"))).as("fp"),
        DedupFns.simhash32Fast(TextFns.tokensFast(col("text"))).as("sh"),
        DedupFns.wordNgramsFast(TextFns.tokensFast(col("text")), 2).as("ng"))
      .collect()
    val slow = df.select(
        TextFns.tokens(col("text")).as("tk"),
        TextFns.wsTokenCount(col("text")).cast("long").as("t"),
        TextFns.punctCount(col("text")).cast("long").as("p"),
        TextFns.bpeTokenCount(col("text")).cast("long").as("b"),
        TextFns.fingerprint(col("text")).cast("long").as("fp"),
        DedupFns.simhash32(col("text")).cast("long").as("sh"),
        DedupFns.wordNgrams(col("text"), 2).as("ng"))
      .collect()
    fast.zip(slow).zip(texts).foreach { case ((f, s), txt) =>
      assert(f.getSeq[String](0) == s.getSeq[String](0), s"tokens diverge on ${txt.map(_.toInt)}")
      assert(f.getSeq[Long](1) == Seq(s.getLong(1), s.getLong(2), s.getLong(3)),
        s"textStats diverge on ${txt.map(_.toInt)}")
      assert(f.getLong(2) == s.getLong(4), s"fingerprint diverges on ${txt.map(_.toInt)}")
      assert(f.getLong(3) == s.getLong(5), s"simhash diverges on ${txt.map(_.toInt)}")
      assert(f.getSeq[String](4) == s.getSeq[String](6), s"ngrams diverge on ${txt.map(_.toInt)}")
    }
  }

  test("quantize / qdot: native == declarative on random float vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-2.0f, 2.0f))
    val pairs = (1 to 30).flatMap(_ => (for { a <- vecGen; b <- vecGen } yield (a, b)).sample)
    val df = pairs.toDF("a", "b")
    val fast = df.select(
        VectorFns.qdotFast(VectorFns.quantizeFast(col("a")), VectorFns.quantizeFast(col("b"))))
      .collect().map(_.getLong(0))
    val slow = df.select(
        VectorFns.qdot(VectorFns.quantize(col("a")), VectorFns.quantize(col("b"))))
      .collect().map(_.getLong(0))
    assert(fast.toSeq == slow.toSeq)
  }

  test("vecSub / signBits: native == declarative on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-2.0f, 2.0f))
    val pairs = (1 to 30).flatMap(_ => (for { a <- vecGen; b <- vecGen } yield (a, b)).sample)
    val df = pairs.toDF("a", "b")
    val fast = df.select(
        VectorFns.vecSubFast(VectorFns.quantizeFast(col("a")), VectorFns.quantizeFast(col("b"))).as("d"),
        VectorFns.signBitsFast(VectorFns.quantizeFast(col("a"))).as("s"))
      .collect()
    val slow = df.collect().map { r =>
      val qa = r.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000).toLong)
      val qb = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong)
      val sub = qa.zip(qb).map { case (x, y) => x - y }
      val code = qa.zipWithIndex.map { case (x, i) => if (x >= 0) 1L << i else 0L }.sum
      (sub, code)
    }
    fast.zip(slow).foreach { case (f, (sub, code)) =>
      assert(f.getSeq[Long](0) == sub)
      assert(f.getLong(1) == code)
    }
    // Hamming identity: bit_count(sign(a) ^ sign(b)) counts exactly the
    // dims where the signs disagree — the oracle's direct-count form
    val hf = df.select(VectorFns.signBitsFast(VectorFns.quantizeFast(col("a"))).as("graft_sb_a"),
        VectorFns.signBitsFast(VectorFns.quantizeFast(col("b"))).as("graft_sb_b"))
      .select(expr("bit_count(graft_sb_a ^ graft_sb_b)").cast("long").as("hm"))
      .collect().map(_.getLong(0))
    val hs = df.collect().map { r =>
      val qa = r.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000).toLong)
      val qb = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong)
      qa.zip(qb).count { case (x, y) => (x >= 0) != (y >= 0) }.toLong
    }
    assert(hf.toSeq == hs.toSeq)
  }

  test("ivfProbes: probe list is sorted by exact distance with index tiebreak") {
    import spark.implicits._
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-1.0f, 1.0f))
    val cents: Seq[Seq[Long]] = Seq(Seq(0L, 0L, 0L, 0L), Seq(500L, 0L, 0L, 0L),
      Seq(0L, 500L, 0L, 0L), Seq(-500L, -500L, 0L, 0L))
    val vs = (1 to 30).flatMap(_ => vecGen.sample)
    val got = vs.toDF("v")
      .select(col("v"), VectorFns.ivfProbesFast(VectorFns.quantizeFast(col("v")),
        typedLit(cents), 4).as("p"))
      .collect()
    got.foreach { r =>
      val qv = r.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000).toLong)
      val probes = r.getSeq[Long](1)
      val d2 = cents.map(c => qv.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      val expected = cents.indices.sortBy(i => (d2(i), i)).map(_.toLong)
      assert(probes == expected, s"qv=$qv d2=$d2")
    }
  }
}
