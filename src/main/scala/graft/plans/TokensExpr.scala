package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Normalized whitespace tokens in one native pass — value-identical to
  * TextFns.tokens (reference example/tpipe.rs:76-81 normalization):
  * lowercase, strip `( ) , " . ; : '`, split on `\s+`, drop empties.
  *
  * Equivalence notes: lowercasing uses the same UTF8String.toLowerCase
  * the built-in lower() uses; the punctuation strip removes characters
  * WITHOUT creating a token boundary (exactly like regexp_replace to
  * empty string); the split boundary set is Java regex `\s` =
  * {space, \t, \n, \x0B, \f, \r}. The built-in pipeline's only
  * interpreted piece is the empties-dropping filter() HOF (~µs per
  * token); this does the whole pass in one scan.
  */
object TokensKernel {
  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isPunct(c: Char): Boolean =
    c == '(' || c == ')' || c == ',' || c == '"' || c == ';' || c == ':' || c == '\'' || c == '.'

  def tokens(s: UTF8String): GenericArrayData = {
    val str = s.toLowerCase.toString
    val out = new ArrayBuffer[UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (isSpace(c)) {
        if (sb.length > 0) { out += UTF8String.fromString(sb.toString); sb.setLength(0) }
      } else if (!isPunct(c)) {
        sb.append(c)
      }
      i += 1
    }
    if (sb.length > 0) out += UTF8String.fromString(sb.toString)
    new GenericArrayData(out.toArray[Any])
  }
}

/** Distinct word n-grams (space-joined, first-occurrence order) over a
  * token array in one native pass — value-identical to
  * DedupFns.wordNgramsFromTokens: fewer than n tokens yields an EMPTY
  * array (not null), and array_distinct keeps first occurrences, which
  * a LinkedHashSet reproduces. The declarative form pays one
  * interpreted lambda (slice + concat_ws) per shingle.
  */
object NgramsKernel {
  def ngrams(toks: ArrayData, n: Int): GenericArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val words = new Array[String](m)
    var i = 0
    while (i < m) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i + n <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString): Unit
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

/** See NgramsKernel — array<string> of distinct space-joined n-grams. */
case class NgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_word_ngrams needs n >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(StringType, containsNull = false) ||
        child.dataType == ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams requires array<string> input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elemNullable
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (elemNullable && Kernels.hasNullElement(toks)) null
    else NgramsKernel.ngrams(toks, n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.NgramsKernel.ngrams($c, $n);
        }
      """
      else s"${ev.value} = graft.plans.NgramsKernel.ngrams($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): NgramsExpr =
    copy(child = newChild)
}

/** POSITIONAL word n-grams over a token array in one native pass: one
  * space-joined entry per window start, NOT deduplicated, array index =
  * window position. The positional complement of NgramsKernel for
  * span-run analysis (where consecutive-position structure matters);
  * value-identical to
  * `transform(sequence(0, size(toks)-n), i -> concat_ws(" ", slice(toks, i+1, n)))`
  * without the interpreted lambda per window. Fewer than n tokens
  * yields an EMPTY array.
  */
object PosNgramsKernel {
  def ngrams(toks: ArrayData, n: Int): GenericArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](m)
    var i = 0
    while (i < m) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i + n <= m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** See PosNgramsKernel — array<string> of positional n-grams. */
case class PosNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_pos_ngrams needs n >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(StringType, containsNull = false) ||
        child.dataType == ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pos_ngrams requires array<string> input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elemNullable
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (elemNullable && Kernels.hasNullElement(toks)) null
    else PosNgramsKernel.ngrams(toks, n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.PosNgramsKernel.ngrams($c, $n);
        }
      """
      else s"${ev.value} = graft.plans.PosNgramsKernel.ngrams($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): PosNgramsExpr =
    copy(child = newChild)
}

/** POSITIONAL character n-grams — every sliding substring of length n —
  * over a string in one native pass: the char-window shingle for
  * content-derived signatures. Value-identical to
  * `transform(sequence(1, length(s) - n + 1), i -> substring(s, i, n))`
  * GUARDED by length ≥ n (an unguarded `sequence(1, 0)` DESCENDS to
  * [1, 0] instead of being empty), and to DuckDB's unguarded
  * `list_transform(range(1, length(s) - n + 2), i -> substr(s, i, n))`
  * (range IS empty when stop ≤ start) — without one interpreted lambda
  * + substring per window. Fewer than n chars yields an EMPTY array.
  * "Char" is a Unicode CODE POINT — the unit the built-in
  * length/substring and DuckDB length/substr count — so the identity
  * with both declarative twins holds for supplementary-plane text too,
  * and a window can never split a surrogate pair (round 17; the
  * UTF-16-code-unit version diverged from both twins on non-BMP
  * input). The two boundary cursors advance one code point per
  * window, so the pass stays O(chars), never O(chars·n).
  */
object CharGramsKernel {
  def grams(s: UTF8String, n: Int): GenericArrayData = {
    val str = s.toString
    val m = str.codePointCount(0, str.length)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    var charLo = 0
    var charHi = str.offsetByCodePoints(0, n)
    while (i + n <= m) {
      out(i) = UTF8String.fromString(str.substring(charLo, charHi))
      if (i + n < m) {
        charLo = str.offsetByCodePoints(charLo, 1)
        charHi = str.offsetByCodePoints(charHi, 1)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** See CharGramsKernel — array<string> of positional char n-grams. */
case class CharGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_char_grams needs n >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_grams requires string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CharGramsKernel.grams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharGramsKernel.grams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharGramsExpr =
    copy(child = newChild)
}

/** 32-bit PIXEL-BLOCK perceptual hash (round 17 — the blockhash/aHash
  * family, cf. Zauner 2010 "Implementation and Benchmarking of
  * Perceptual Image Hash Functions"): the payload is laid out as 32
  * POSITION BLOCKS — code-point boundaries lo_j = ⌊j·L/32⌋, the 1-D
  * analog of pHash's pixel grid — each block's "mean intensity" is
  * md5-DERIVED (the same stub-decode derivation family as
  * Multimodal.decodePartitioned: this container has no image codec,
  * so block pixels come from the block's content hash), and bit j is
  * set iff intensity_j · 32 > Σ intensities — aHash's above-the-mean
  * thresholding rule in exact integer arithmetic (strict >, so the
  * all-blocks-equal payload hashes to 0).
  *
  * LOCALITY (the contract a perceptual hash must keep): an edit that
  * touches b blocks re-hashes only those blocks, flipping at most b
  * bits directly plus any borderline bits the mean shift crosses —
  * E[extra flips] ≈ 1 for uniform intensities (the shift is < 2³²/32
  * and each other intensity sits that close to the mean with
  * probability ~1/32). Contrast the round-16 byte-WINDOW SimHash stub,
  * whose shared-template windows clustered ~6x denser than token
  * simhash on this corpus (VERDICT r16) — position blocks vote once
  * per region, not once per shared substring, so only genuinely
  * near-identical payloads collide.
  *
  * Oracle-portable, bit for bit: intensity_j =
  * `('0x' || substr(md5(block_j), 1, 8))::BIGINT` (first 4 digest
  * bytes, big-endian unsigned) and DuckDB's substr/length count code
  * points exactly like UTF8String — block boundaries land on the same
  * characters in both engines, BMP or not. One MessageDigest per
  * thread (ThreadLocal), zero per-row allocation beyond the block
  * substrings.
  */
object BlockHash32Kernel {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val str = s.toString
    val L = str.codePointCount(0, str.length)
    val md = mdLocal.get()
    val ints = new Array[Long](32)
    var sum = 0L
    var j = 0
    var cpLo = 0
    var charLo = 0
    while (j < 32) {
      val cpHi = ((j + 1).toLong * L / 32).toInt
      val charHi = str.offsetByCodePoints(charLo, cpHi - cpLo)
      md.reset()
      val d = md.digest(str.substring(charLo, charHi)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      ints(j) = v
      sum += v
      cpLo = cpHi
      charLo = charHi
      j += 1
    }
    var sig = 0L
    j = 0
    while (j < 32) {
      if (ints(j) * 32L > sum) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** See BlockHash32Kernel — long in [0, 2³²) with bits 0..31. */
case class BlockHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_blockhash32 requires string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    BlockHash32Kernel.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BlockHash32Kernel.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): BlockHash32 =
    copy(child = newChild)
}

/** One-pass raw-text statistics, value-identical to the declarative
  * trio over the same text:
  *  [0] ws_tokens — count of maximal non-whitespace runs
  *      (= size(filter(split(text, "\\s+"), _ != ""))),
  *  [1] punct — count of non-alphanumeric non-whitespace CODE POINTS
  *      (= size(regexp_extract_all(text, "[^A-Za-z0-9\\s]"))),
  *  [2] bpe — BPE-ish piece count: maximal alpha runs contribute
  *      ceil(len/4), maximal digit runs 1, each other non-ws code
  *      point 1 (= TextFns.bpeTokenCount).
  * The whitespace set is Java regex `\s` = {space \t \n \x0B \f \r}
  * (ASCII-only, like the declarative forms); multibyte code points are
  * non-ws non-alnum. Replaces two regex scans plus an interpreted HOF
  * aggregate with one byte scan.
  */
object TextStatsKernel {
  def stats(s: UTF8String): GenericArrayData = {
    val n = s.numBytes()
    var i = 0
    var tokens = 0L
    var punct = 0L
    var bpe = 0L
    var prevWs = true
    var alphaRun = 0
    var inDigitRun = false
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) == 0) {
        val c = b.toChar
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
        val alpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        val digit = c >= '0' && c <= '9'
        if (!ws && prevWs) tokens += 1
        prevWs = ws
        if (alpha) {
          alphaRun += 1
          inDigitRun = false
        } else {
          if (alphaRun > 0) { bpe += (alphaRun + 3) / 4; alphaRun = 0 }
          if (digit) {
            if (!inDigitRun) { bpe += 1; inDigitRun = true }
          } else {
            inDigitRun = false
            if (!ws) { punct += 1; bpe += 1 }
          }
        }
        i += 1
      } else {
        // multibyte code point: non-ws, non-alphanumeric
        if (prevWs) tokens += 1
        prevWs = false
        if (alphaRun > 0) { bpe += (alphaRun + 3) / 4; alphaRun = 0 }
        inDigitRun = false
        punct += 1
        bpe += 1
        i += 1
        while (i < n && (s.getByte(i) & 0xc0) == 0x80) i += 1
      }
    }
    if (alphaRun > 0) bpe += (alphaRun + 3) / 4
    new GenericArrayData(Array(tokens, punct, bpe))
  }
}

/** See TextStatsKernel — array<long> [ws_tokens, punct, bpe]. */
case class TextStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats requires string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextStatsKernel.stats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextStatsKernel.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

case class TokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft tokens requires string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokensKernel.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokensKernel.tokens($c)")
  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}
