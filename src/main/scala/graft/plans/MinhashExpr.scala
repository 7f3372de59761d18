package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** LSH band hashes of the MinHash signature over word n-gram shingles,
  * computed from a token array in ONE native pass (Kernels.minhashBands).
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
  * that is ~10ms/row (measured 87s for 5000 docs); the kernel does the
  * same work in primitive longs at ~0.1ms/row. doGenCode emits a static
  * kernel call, so the surrounding projection stays inside whole-stage
  * codegen.
  *
  * Returns null for docs with fewer than n tokens (no shingle exists)
  * and for token arrays carrying a null element (declarative HOF null
  * propagation).
  */
case class MinhashBands(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_minhash_bands needs shingle size n >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_minhash_bands", StringType, child.dataType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(toks)) null
    else Kernels.minhashBands(toks, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val guard =
        if (elemNullable) s"graft.plans.Kernels.hasNullElement($c) ? null : " else ""
      s"""
      ${ev.value} = $guard graft.plans.Kernels.minhashBands($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

/** The raw 16-element MinHash signature over word n-gram shingles —
  * same one-pass kernel as MinhashBands but WITHOUT the band fold, for
  * consumers that need per-hash agreement (the unbiased Jaccard
  * estimator: est = |{i : sig_a[i] = sig_b[i]}| / 16). Null semantics
  * identical to MinhashBands.
  */
case class MinhashSig(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_minhash_sig needs shingle size n >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_minhash_sig", StringType, child.dataType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(toks)) null
    else Kernels.minhashSig(toks, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val guard =
        if (elemNullable) s"graft.plans.Kernels.hasNullElement($c) ? null : " else ""
      s"""
      ${ev.value} = $guard graft.plans.Kernels.minhashSig($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint over a token array in one native
  * pass (Kernels.fingerprint) — value-identical to
  * TextFns.fingerprint's declarative aggregate: each token's 60-bit
  * md5-prefix hash mod 2^31-1 folds through h := (h*1000003 + th) mod
  * 2^31-1 from h=0; empty arrays yield 0. Null-element arrays
  * propagate null (the declarative transform does the same).
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_fingerprint", StringType, child.dataType)

  override def dataType: DataType = LongType
  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)
  override def nullable: Boolean = child.nullable || elemNullable

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(toks)) null
    else Kernels.fingerprint(toks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.Kernels.fingerprint($c);
        }
      """
      else s"${ev.value} = graft.plans.Kernels.fingerprint($c);")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

/** Per-language stopword hit counts over a token array in one native
  * pass (Kernels.langScores): element i = count of tokens in the i-th
  * (sorted) language's stopword list — value-identical to the
  * declarative staging `TextFns.matchCount(toks, Stopwords(lang))` per
  * language, INCLUDING on null-element arrays (null tokens are skipped,
  * because filter(isin…) drops them — this kernel intentionally does
  * not follow the hashing kernels' null-propagation, whose declarative
  * twins behave differently). One hash lookup per token replaces
  * langs × tokens interpreted lambda calls (~25 evaluations/row
  * measured for langid).
  */
case class LangScores(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_lang_scores", StringType, child.dataType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.langScores(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.langScores($c)")

  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

/** 32-bit SimHash over a token array in one native pass
  * (Kernels.simhash32) — value-identical to DedupFns.simhash32 and the
  * oracle SQL: each token's 60-bit md5-prefix hash mod 2^31-1 votes ±1
  * per bit position; the result sets bit j iff the vote sum is
  * positive. An empty token array therefore yields 0 (no positive
  * votes), exactly like the declarative aggregate — parity holds with
  * or without a size(toks) > 0 pre-filter. Null-element arrays
  * propagate null (declarative HOF null propagation).
  */
case class Simhash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_simhash32", StringType, child.dataType)

  override def dataType: DataType = LongType
  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)
  override def nullable: Boolean = child.nullable || elemNullable

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(toks)) null
    else Kernels.simhash32(toks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.Kernels.simhash32($c);
        }
      """
      else s"${ev.value} = graft.plans.Kernels.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

/** Hashed linear-model logit over a token array in one native pass
  * (Kernels.tokenLogit) — the fastText-style hashing-trick classifier
  * score, value-identical to the declarative
  * aggregate(transform(toks, w∘h), 0, +) form and to the oracle SQL's
  * list_sum(list_transform(...)). Empty arrays yield 0; null-element
  * arrays propagate null (declarative HOF null propagation).
  */
case class TokenLogit(child: Expression, buckets: Int) extends UnaryExpression {
  // Fail fast at construction for BOTH entry points (SQL registration
  // validates separately; the Scala API previously reached eval/codegen
  // with buckets = 0 and died in `% 0`).
  require(buckets >= 1, s"graft_token_logit needs buckets >= 1, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult =
    TypeChecks.requireArrayOf("graft_token_logit", StringType, child.dataType)

  override def dataType: DataType = LongType
  private def elemNullable: Boolean = TypeChecks.elemNullable(child.dataType)
  override def nullable: Boolean = child.nullable || elemNullable

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    if (elemNullable && Kernels.hasNullElement(toks)) null
    else Kernels.tokenLogit(toks, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (elemNullable) s"""
        if (graft.plans.Kernels.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = graft.plans.Kernels.tokenLogit($c, $buckets);
        }
      """
      else s"${ev.value} = graft.plans.Kernels.tokenLogit($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): TokenLogit =
    copy(child = newChild)
}
