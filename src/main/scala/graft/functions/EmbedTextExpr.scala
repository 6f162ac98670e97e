package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for the deterministic feature-hash embedding
  * (SURVEY.md §2.8, stand-in for the reference's OpenAI call at
  * agents/providers/openai.py:175-203). Runs over every row of the
  * search-index build (G5), so like [[TokenSetRatio]] it avoids the UDF
  * wrapper and stays inside whole-stage codegen; the float vector is
  * returned as UnsafeArrayData (no boxing). */
case class EmbedText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "embed_text"

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(TextFns.embed(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.TextFns.embed($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): EmbedText =
    copy(child = newChild)
}

object EmbedText {
  def apply(c: Column): Column = GraftShims.column(EmbedText(GraftShims.expression(c)))
}
