package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

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
