package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.DedupFns

/** LSH band hashes of the MinHash signature over word n-gram shingles,
  * computed from a token array in ONE native pass.
  *
  * Semantically identical to the declarative pipeline
  * (wordNgramsFromTokens → tokenHash31 → minhashSignatureFromHashes →
  * minhashBands) and to the DuckDB oracle SQL: each shingle is hashed as
  * md5 of the space-joined tokens, its first 15 hex digits parsed as a
  * 60-bit integer mod 2^31-1, then fed through the 16 fixed affine
  * permutations; band b = (sig_2b * 1000003 + sig_2b+1) mod 2^31-1.
  * (MinHash over the shingle *multiset* equals MinHash over the set, so
  * the declarative version's array_distinct needs no counterpart.)
  *
  * Why a custom Expression: Spark's higher-order functions
  * (transform/aggregate) are interpreted — ~µs per lambda element-call
  * with boxing. At 16 hash functions × hundreds of shingles per doc
  * that is ~10ms/row (measured 87s for 5000 docs); this loop does the
  * same work in primitive longs at ~0.1ms/row. CodegenFallback is fine:
  * the per-row work dwarfs the one virtual call.
  *
  * Returns null for docs with fewer than n tokens (no shingle exists).
  */
case class MinhashBands(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {

  private val M = 2147483647L // 2^31 - 1
  private lazy val aCoef: Array[Long] = DedupFns.MinhashA.toArray
  private lazy val bCoef: Array[Long] = DedupFns.MinhashB.toArray
  private val numHashes = DedupFns.NumHashes
  private val numBands = DedupFns.NumHashes / DedupFns.BandRows

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return null
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
      val d = md.digest()
      // first 15 hex digits of the md5 == first 60 bits, as a long
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      val h = (v >>> 4) % M
      var q = 0
      while (q < numHashes) {
        val c = (aCoef(q) * h + bCoef(q)) % M
        if (c < mins(q)) mins(q) = c
        q += 1
      }
      i += 1
    }
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      bands(b) = (mins(2 * b) * 1000003L + mins(2 * b + 1)) % M
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

/** 32-bit SimHash over a token array in one native pass — value-
  * identical to DedupFns.simhash32 and the oracle SQL: each token's
  * 60-bit md5-prefix hash mod 2^31-1 votes ±1 per bit position; the
  * result sets bit j iff the vote sum is positive. Null when the doc
  * has no tokens (no votes exist).
  *
  * Same motivation as MinhashBands: the declarative form is 32
  * interpreted lambda calls per token (~ms per row); this is one loop
  * in primitive longs.
  */
case class Simhash32(child: Expression) extends UnaryExpression with CodegenFallback {

  private val M = 2147483647L

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m == 0) return null
    val votes = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      val h = (v >>> 4) % M
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}
