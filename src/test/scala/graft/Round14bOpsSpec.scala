package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Round-14 session-2 fences: the three new operators are each checked
  * against an INDEPENDENT brute-force implementation that shares only
  * the published definition with the query code —
  *
  *  - label propagation (Raghavan 2007, synchronous, min-label ties)
  *    on a hand-built two-community graph AND on the real sf0.001
  *    near-dup pair set, including the modularity accounting
  *    (4m·e_c − d_c²);
  *  - the exponential-mechanism DP median (McSherry-Talwar 2007):
  *    bucket weights, inverse-CDF selection, and the true-median
  *    bucket, replayed in plain Scala from the collected events;
  *  - the cross-source domain-similarity matrix: centroids, dots,
  *    norms, and the sign-preserved cos²·1000, replayed in plain
  *    Scala from the collected embeddings ⋈ documents — plus the
  *    Cauchy-Schwarz bound |cos2_milli| ≤ 1000 as a structural
  *    invariant.
  */
class Round14bOpsSpec extends SparkSpecBase {

  // ---- independent LPA + modularity brute force -------------------------

  private def bruteLpa(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
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

  private def bruteCommunityStats(pairs: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long, Long, Long)] = {
    val lab = bruteLpa(pairs, iters)
    val m = pairs.size.toLong
    val deg = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nNodes = lab.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val eIn = pairs.filter { case (a, b) => lab(a) == lab(b) }
      .groupBy { case (a, _) => lab(a) }.view.mapValues(_.size.toLong).toMap
    val dSum = lab.toSeq.groupBy(_._2).view
      .mapValues(_.map { case (v, _) => deg(v) }.sum).toMap
    nNodes.map { case (c, n) =>
      val e = eIn.getOrElse(c, 0L)
      val d = dSum(c)
      c -> (n, e, d, 4L * m * e - d * d)
    }
  }

  test("labelPropagation: two triangles over a bridge keep their own communities (vs brute force)") {
    import spark.implicits._
    // triangles {1,2,3} and {11,12,13}, bridged 3-11: CC collapses all
    // six to one cluster; LPA keeps two dense communities
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (11L, 12L), (11L, 13L), (12L, 13L), (3L, 11L))
    val df = pairs.toDF("id_a", "id_b")
    val got = Relational.labelPropagation(df, "id_a", "id_b", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bruteLpa(pairs, 3)
    assert(got === want)
    // structural read: the two triangles end under different labels
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(11L) === got(12L) && got(12L) === got(13L))
    assert(got(1L) !== got(11L))
  }

  test("q_label_prop matches the brute-force LPA + modularity accounting on the sf0.001 near-dup graph") {
    val pairs = Queries.queries("q_dedup_simhash_pairs")(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "sf0.001 near-dup graph unexpectedly empty")
    val want = bruteCommunityStats(pairs, 3)
    val got = Queries.queries("q_label_prop")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === want)
    // partition sanity: community sizes add up to the node count
    assert(got.values.map(_._1).sum === pairs.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
  }

  // ---- independent exponential-mechanism brute force ---------------------

  private def md5u60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.substring(0, 15), 16)
  }

  test("q_dp_quantile replays the exponential mechanism exactly (vs plain-Scala inverse-CDF)") {
    val ev = eventsDF.select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) / 50.0).toLong))
    val want = ev.groupBy(_._1).map { case (tpe, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = counts.map(_._2).sum
      var cum = 0L
      val withDist = counts.map { case (b, nb) => cum += nb; (b, math.abs(2 * cum - n)) }
      val dmin = withDist.map(_._2).min
      val trueMed = withDist.collectFirst { case (b, d) if d == dmin => b }.get
      val wgts = withDist.map { case (b, d) =>
        (b, if (d - dmin > 55) 0L else 1L << (55 - (d - dmin)))
      }
      val thr = md5u60(tpe) % wgts.map(_._2).sum
      var cw = 0L
      val released = wgts.collectFirst { case (b, w) if { cw += w; cw > thr } => b }.get
      tpe -> ((n, trueMed, released, released * 5000 + 2500))
    }
    val got = Queries.queries("q_dp_quantile")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === want)
  }

  // ---- independent domain-similarity brute force -------------------------

  test("q_domain_sim matches the plain-Scala centroid cosine matrix and respects Cauchy-Schwarz") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1000).toLong))
      .toMap
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = emb.toSeq.flatMap { case (id, v) => src.get(id).map(_ -> v) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val cents = bySrc.map { case (s, vs) =>
      val n = vs.size.toLong
      s -> (0 until 64).map(i => floorDiv(vs.map(_(i)).sum, n))
    }
    def dot(a: Seq[Long], b: Seq[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum
    val want = (for {
      (sa, ca) <- cents.toSeq; (sb, cb) <- cents.toSeq if sa < sb
    } yield {
      val d = dot(ca, cb); val na = dot(ca, ca); val nb = dot(cb, cb)
      val c2 =
        if (na == 0 || nb == 0) 0L
        else if (d < 0) -(d * d * 1000 / (na * nb))
        else d * d * 1000 / (na * nb)
      (sa, sb) -> ((d, na, nb, c2))
    }).toMap
    val got = Queries.queries("q_domain_sim")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === want)
    // cos² ≤ 1 exactly (Cauchy-Schwarz) — the integer emission keeps it
    assert(got.values.forall { case (_, _, _, c2) => math.abs(c2) <= 1000L })
  }

  // ---- independent Lloyd-loop brute force ---------------------------------

  test("q_kmeans_train matches a plain-Scala Lloyd loop and its inertia is Lloyd-monotone") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1000).toLong))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var cents: Seq[Seq[Long]] = emb.sortBy { case (id, _) => (md5(id.toString), id.toString) }
      .take(16).map(_._2.toSeq).toSeq
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cs: Seq[Seq[Long]]): Array[(Int, Long)] = emb.map { case (_, v) =>
      (0 until 16).map(c => (d2(v, cs(c)), c)).min match { case (d, c) => (c, d) }
    }
    def inertia(cs: Seq[Seq[Long]]): Long = assign(cs).map(_._2).sum
    val inertias = scala.collection.mutable.ArrayBuffer(inertia(cents))
    for (_ <- 1 to 3) {
      val byC = emb.map(_._2).zip(assign(cents)).groupBy(_._2._1)
      cents = (0 until 16).map { c =>
        byC.get(c) match {
          case Some(vs) =>
            val n = vs.length.toLong
            (0 until 64).map(i => Math.floorDiv(vs.map(_._1(i)).sum, n))
          case None => cents(c)
        }
      }
      inertias += inertia(cents)
    }
    // Lloyd monotonicity (up to the integer-floor of the mean, which
    // at this data still strictly improves each round)
    assert(inertias.sliding(2).forall(w => w(1) <= w(0)))
    val want = assign(cents).groupBy(_._1).map { case (c, xs) =>
      c.toLong -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val got = Queries.queries("q_kmeans_train")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("kmeansTrain degrades gracefully below kCentroids and screens null vectors") {
    import spark.implicits._
    val vecs = Seq(
      1L -> Some(Seq.tabulate(64)(i => if (i == 0) 1f else 0f)),
      2L -> Some(Seq.tabulate(64)(i => if (i == 1) 1f else 0f)),
      3L -> Some(Seq.tabulate(64)(i => if (i == 2) 1f else 0f)),
      4L -> None) // null embedding must not poison init or assignment
      .toDF("vec_id", "embedding")
    val out = graft.functions.VectorFns
      .kmeansTrain(vecs, "vec_id", "embedding", kCentroids = 16, rounds = 3)
      .collect()
    // 3 non-null singleton clusters, each converged onto its vector
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).sum === 3L)
    assert(out.forall(_.getLong(2) === 0L)) // inertia 0: centroid == member
  }

  // ---- independent power-iteration brute force ----------------------------

  test("q_pca_power matches a plain-Scala power iteration + projection end to end") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1000).toLong))
    val n = emb.length.toLong
    val m = Array.tabulate(64, 64) { (i, j) =>
      Math.floorDiv(emb.map { case (_, v) => v(i) * v(j) }.sum, n)
    }
    var x = Array.fill(64)(1000L)
    for (_ <- 1 to 4) {
      val y = Array.tabulate(64)(i => (0 until 64).map(j => m(i)(j) * x(j)).sum)
      val r = y.map(math.abs).max
      if (r != 0) x = y.map(v => Math.floorDiv(v * 1000L, r))
    }
    // the rescale contract: the direction is milli-normalized in L∞
    assert(x.map(math.abs).max === 1000L)
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val projBySrc = emb.flatMap { case (id, v) =>
      src.get(id).map(_ -> (0 until 64).map(i => v(i) * x(i)).sum)
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = projBySrc.map { case (s, ps) =>
      s -> ((ps.size.toLong, ps.min, ps.max, Math.floorDiv(ps.sum, ps.size.toLong)))
    }
    val got = Queries.queries("q_pca_power")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === want)
  }
}
