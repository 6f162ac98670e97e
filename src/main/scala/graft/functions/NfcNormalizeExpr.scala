package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)`: Unicode NFC normalization — the first step of
  * corpus text cleaning (decomposed accents, compatibility variants of
  * the same visible string must hash/fingerprint identically before any
  * dedup or tokenization runs).
  *
  * A native expression, not a UDF: the static call stays inside the
  * enclosing whole-stage-codegen span and pays no encoder round-trip.
  * The fast path is `Normalizer.isNormalized` — true for all-ASCII text
  * (the overwhelming majority of a web corpus) and then the input buffer
  * is returned untouched, no allocation. DuckDB's `nfc_normalize`
  * (utf8proc) implements the same Unicode algorithm, which is what makes
  * the cleaning operator oracle-checkable. */
object NfcNormalize {
  def normalize(t: UTF8String): UTF8String = {
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.normalize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalizeFn {
  /** Column form for the DataFrame API. */
  def apply(text: Column): Column =
    GraftShims.column(NfcNormalize(GraftShims.expression(text)))

  val functionName = "nfc_normalize"

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, s"$functionName expects 1 argument")
    NfcNormalize(children.head)
  }

  val info = new ExpressionInfo(classOf[NfcNormalize].getName, functionName)
}
