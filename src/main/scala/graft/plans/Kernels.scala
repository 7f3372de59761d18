package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

import graft.functions.DedupFns

/** Primitive-loop kernels shared by the native expressions' interpreted
  * eval AND their generated code (top-level object → static forwarders,
  * so generated Java calls `graft.plans.Kernels.qdot(...)` directly).
  */
object Kernels {

  private val M = 2147483647L // 2^31 - 1
  private val aCoef: Array[Long] = DedupFns.MinhashA.toArray
  private val bCoef: Array[Long] = DedupFns.MinhashB.toArray

  /** True iff any element is SQL NULL. The kernels below read elements
    * as primitives without per-element null checks (a null would read
    * as 0/garbage), so the expression wrappers call this first on
    * containsNull inputs and propagate null for the whole row — the
    * same result the declarative transform/zip_with forms produce.
    */
  def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.floor(v.getFloat(i).toDouble * 1000).toLong; i += 1 }
    new GenericArrayData(out)
  }

  def qdot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Sign-bit binarization of a quantized vector (≤64 dims): bit d set
    * iff component d ≥ 0 — the 1-bit-per-dim embedding compression
    * whose Hamming distance approximates angular distance (Charikar
    * 2002 hyperplane rounding with axis-aligned planes). */
  def signBits(v: ArrayData): Long = {
    val n = math.min(v.numElements(), 64)
    var code = 0L
    var i = 0
    while (i < n) { if (v.getLong(i) >= 0) code |= (1L << i); i += 1 }
    code
  }

  /** Element-wise difference of two equal-length long vectors — the
    * IVF-PQ residual step (vector − its cell centroid). */
  def vsub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = a.getLong(i) - b.getLong(i); i += 1 }
    new GenericArrayData(out)
  }

  def lshBuckets(qv: ArrayData, tables: Int, planes: Int): ArrayData = {
    val dims = qv.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < planes) {
        val base = t * 131 + j * 37
        var dot = 0L
        var d = 0
        while (d < dims) { dot += qv.getLong(d) * ((base + d * 17) % 21 - 10); d += 1 }
        if (dot >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  // word → bitmask of languages whose stopword list contains it, keyed
  // by UTF8String so the kernel needs no per-token decode/alloc. Lang
  // bit i = i-th language in sorted order (matches the declarative
  // staging in Queries and the oracle SQL's sorted lang columns).
  private val langNames: Array[String] =
    graft.functions.TextFns.Stopwords.keys.toArray.sorted
  private val stopwordMask: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    langNames.zipWithIndex.foreach { case (lang, i) =>
      graft.functions.TextFns.Stopwords(lang).foreach { w =>
        val k = org.apache.spark.unsafe.types.UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  /** Per-language stopword hit counts over a token array in ONE pass —
    * counts(i) = matchCount(toks, Stopwords(sortedLangs(i))). One hash
    * lookup per token instead of langs × tokens interpreted lambda
    * calls. Null ELEMENTS are skipped, exactly like the declarative
    * matchCount (size(filter(toks, isin…)) drops nulls) — unlike the
    * hashing kernels, whose declarative twins propagate null.
    */
  def langScores(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val counts = new Array[Long](langNames.length)
    var i = 0
    while (i < n) {
      val mask = if (toks.isNullAt(i)) null else stopwordMask.get(toks.getUTF8String(i))
      if (mask != null) {
        var m = mask.intValue()
        while (m != 0) {
          val b = java.lang.Integer.numberOfTrailingZeros(m)
          counts(b) += 1
          m &= m - 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** The `nprobe` centroid indexes nearest to `qv` (ascending by
    * (squared L2 distance, index) — ties break on index, so the probe
    * order is total and engine-portable). `cents` is the nested
    * array<array<long>> of quantized centroid vectors; integer
    * arithmetic throughout, so the assignment is exact.
    * Null (QDot's ragged-input contract) when any centroid is null or
    * its dimensionality differs from qv — a mis-shaped centroid table
    * must surface, not silently rank with garbage distances.
    */
  def ivfProbes(qv: ArrayData, cents: ArrayData, nprobe: Int): ArrayData = {
    val k = cents.numElements()
    val dims = qv.numElements()
    val d2 = new Array[Long](k)
    var c = 0
    while (c < k) {
      if (cents.isNullAt(c)) return null
      val cv = cents.getArray(c)
      if (cv.numElements() != dims) return null
      var s = 0L
      var d = 0
      while (d < dims) {
        val diff = qv.getLong(d) - cv.getLong(d)
        s += diff * diff
        d += 1
      }
      d2(c) = s
      c += 1
    }
    val n = math.min(math.max(nprobe, 0), k)
    val out = new Array[Long](n)
    val taken = new Array[Boolean](k)
    var i = 0
    while (i < n) {
      var best = -1
      var bestD = Long.MaxValue
      var j = 0
      while (j < k) {
        if (!taken(j) && d2(j) < bestD) { best = j; bestD = d2(j) }
        j += 1
      }
      taken(best) = true
      out(i) = best.toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance table (round-15 codegen fix): entry mi·k+j =
    * ‖qv[mi·sub, (mi+1)·sub) − cb[mi·k+j]‖² over the FLATTENED m·k-row
    * codebook (row length sub = dims/m). One runtime loop replaces the
    * m·k-entry UNROLLED projection the declarative form expanded to —
    * at k=64 that was ~1,500 expression nodes whose generated class
    * blew past janino's limits and silently fell back to interpreted
    * eval (VERDICT r14 item 1). Value-identical to the declarative
    * d² = ‖x‖²+‖c‖²−2x·c entries (exact int64 both ways; AnnRecallSpec
    * pins self-ADC == quantization error). Null (QDot's ragged
    * contract) when the codebook shape disagrees with (m, k, dims).
    */
  def pqDistTable(qv: ArrayData, cb: ArrayData, m: Int, k: Int): ArrayData = {
    val dims = qv.numElements()
    if (m <= 0 || k <= 0 || dims % m != 0 || cb.numElements() != m * k) return null
    val sub = dims / m
    val out = new Array[Long](m * k)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < k) {
        val idx = mi * k + j
        if (cb.isNullAt(idx)) return null
        val cv = cb.getArray(idx)
        if (cv.numElements() != sub) return null
        var s = 0L
        var d = 0
        while (d < sub) {
          val diff = qv.getLong(mi * sub + d) - cv.getLong(d)
          s += diff * diff
          d += 1
        }
        out(idx) = s
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit md5-prefix hash mod 2^31-1 of the digest's first 8 bytes. */
  private def h60(d: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v >>> 4) % M
  }

  /** The portable per-token hash shared by fingerprint and simhash:
    * h60 of md5(token bytes) — ONE definition so the kernels can never
    * silently diverge from each other or from the oracle SQL's
    * `('0x' || substr(md5(t), 1, 15))::BIGINT % M`. (digest(input)
    * resets the MessageDigest itself; no separate reset needed.)
    */
  private def tokenHash(md: MessageDigest, t: org.apache.spark.unsafe.types.UTF8String): Long =
    h60(md.digest(t.getBytes))

  /** The 16 MinHash signature minima over word n-gram shingles; null
    * when the doc has fewer than n tokens (no shingle exists). Shared
    * by minhashBands (LSH bucketing) and minhashSig (signature-overlap
    * Jaccard estimation) so the two can never diverge.
    */
  private def minhashMins(toks: ArrayData, n: Int): Array[Long] = {
    val m = toks.numElements()
    if (m < n) return null
    val numHashes = DedupFns.NumHashes
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i + n <= m) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val h = h60(md.digest())
      var q = 0
      while (q < numHashes) {
        val c = (aCoef(q) * h + bCoef(q)) % M
        if (c < mins(q)) mins(q) = c
        q += 1
      }
      i += 1
    }
    mins
  }

  /** Null when the doc has fewer than n tokens (no shingle exists). */
  def minhashBands(toks: ArrayData, n: Int): ArrayData = {
    val mins = minhashMins(toks, n)
    if (mins == null) return null
    val numBands = DedupFns.NumHashes / DedupFns.BandRows
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) { bands(b) = (mins(2 * b) * 1000003L + mins(2 * b + 1)) % M; b += 1 }
    new GenericArrayData(bands)
  }

  /** The raw 16-element MinHash signature (see minhashMins). */
  def minhashSig(toks: ArrayData, n: Int): ArrayData = {
    val mins = minhashMins(toks, n)
    if (mins == null) null else new GenericArrayData(mins)
  }

  /** Number of positions where two equal-length long arrays agree —
    * the MinHash Jaccard estimator numerator (est = eqCount/numHashes).
    */
  def eqCount(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Whether two LSH bucket arrays share an equal value at any index
    * BELOW `t` — the earlier-table-collision test behind
    * report-once-at-min-table pair emission (VectorFns.cosineCandidates):
    * a pair met at table t is emitted only when no table before t also
    * matched, so every colliding pair surfaces exactly once with no
    * dedup shuffle. Primitive loop: the declarative
    * exists(arrays_zip(slice…)) form is an interpreted HOF allocating
    * two arrays per candidate pair — measured as the whole cost of the
    * sf10 q_cosine_bands pass.
    */
  def earlierCollision(a: ArrayData, b: ArrayData, t: Int): Boolean = {
    var i = 0
    val n = math.min(math.min(a.numElements(), b.numElements()), t)
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return true
      i += 1
    }
    false
  }

  /** Rolling polynomial fingerprint over the token-hash sequence in one
    * native pass: h := (h*1000003 + h60(md5(t)) mod M) mod M, h0 = 0 —
    * value-identical to TextFns.fingerprint (order-sensitive; empty
    * arrays yield 0).
    */
  def fingerprint(toks: ArrayData): Long = {
    val m = toks.numElements()
    val md = MessageDigest.getInstance("MD5")
    var h = 0L
    var i = 0
    while (i < m) {
      h = (h * 1000003L + tokenHash(md, toks.getUTF8String(i))) % M
      i += 1
    }
    h
  }

  /** Empty token arrays yield 0 (no positive votes) — same as the
    * declarative aggregate form.
    */
  def simhash32(toks: ArrayData): Long = {
    val m = toks.numElements()
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < m) {
      val h = tokenHash(md, toks.getUTF8String(i))
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  /** Hashed-bag-of-tokens linear-model logit — the "hashing trick"
    * (Weinberger et al. 2009) as used by fastText-style quality
    * classifiers (Joulin et al. 2016): every token maps to one of
    * `buckets` shared weight slots via the portable md5 token hash, and
    * the slot weight is a fixed affine function of the slot id —
    * ((b*1103515245 + 12345) mod 2001) − 1000, integer milli-units in
    * [−1000, 1000] — so any engine rebuilds the identical model with
    * zero shipped parameters. Returns the exact integer logit
    * Σ w(h(t) mod buckets) over ALL tokens (bag semantics: repeats
    * count). One pass, no allocation beyond the digest.
    */
  def tokenLogit(toks: ArrayData, buckets: Int): Long = {
    val m = toks.numElements()
    val md = MessageDigest.getInstance("MD5")
    var s = 0L
    var i = 0
    while (i < m) {
      val b = tokenHash(md, toks.getUTF8String(i)) % buckets
      s += (b * 1103515245L + 12345L) % 2001L - 1000L
      i += 1
    }
    s
  }

  /** Flat second-moment statistics of one quantized vector: the
    * d(d+1)/2 upper-triangle products x_i·x_j (row-major, j ≥ i)
    * followed by the d components themselves — every sufficient
    * statistic of the corpus covariance/Gram matrix emitted in one
    * map-side pass, so the aggregation that follows is a single
    * groupBy(pos) whose partial aggregates are bounded by
    * d(d+1)/2 + d slots per partition REGARDLESS of row count.
    * pos(i,j) = i·d − i(i−1)/2 + (j − i); component k sits at
    * T + k where T = d(d+1)/2.
    */
  def outerMoments(q: ArrayData): ArrayData = {
    val d = q.numElements()
    val out = new Array[Long](d * (d + 1) / 2 + d)
    var p = 0
    var i = 0
    while (i < d) {
      val xi = q.getLong(i)
      var j = i
      while (j < d) { out(p) = xi * q.getLong(j); p += 1; j += 1 }
      i += 1
    }
    var k = 0
    while (k < d) { out(p) = q.getLong(k); p += 1; k += 1 }
    new GenericArrayData(out)
  }
}
