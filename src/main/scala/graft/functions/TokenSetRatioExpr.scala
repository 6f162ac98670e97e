package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the linking hot path (SURVEY.md §2.8):
  * `token_set_ratio(a, b)` as a codegen'd `BinaryExpression` instead of a
  * Scala UDF. The UDF version breaks whole-stage codegen at every
  * candidate-pair filter and pays encoder boxing per row; this expression
  * stays inside the generated code (doGenCode emits a static call) and
  * keeps the blocking-join filter in one codegen span.
  *
  * Semantics identical to [[TextFns.tokenSetRatio]] (fuzzywuzzy
  * token_set_ratio reimplementation, reference
  * eschergraph/tools/fuzzy_matcher.py:48-58).
  */
case class TokenSetRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_ratio"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextFns.tokenSetRatio(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextFns.tokenSetRatio($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSetRatio =
    copy(left = newLeft, right = newRight)
}

object TokenSetRatio {
  /** Column form for the DataFrame API. */
  def apply(a: Column, b: Column): Column =
    GraftShims.column(
      TokenSetRatio(GraftShims.expression(a), GraftShims.expression(b)))

  val functionName = "token_set_ratio"

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$functionName expects 2 arguments")
    TokenSetRatio(children.head, children(1))
  }

  val info = new ExpressionInfo(classOf[TokenSetRatio].getName, functionName)

  /** Register on a live session (tests / notebooks). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(functionName), info, builder)
}

/** SparkSessionExtensions hook:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * every graft function ([[GraftFunctions.all]] — token_set_ratio,
  * embed_text, estimate_tokens, non_alpha_ratio, doc_fingerprint)
  * available to plain SQL on every session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
