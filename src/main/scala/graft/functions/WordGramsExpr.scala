package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_grams(text, n)`: array<string> of the text's space-joined word
  * n-grams under the repetition family's tokenization — lowercase, split
  * on `\s+`, drop empties — byte-identical to the composed-builtin form
  * `transform(sequence(...), i -> concat_ws(' ', slice(words, i, n)))`
  * it replaces, but ONE compiled pass per document instead of
  * per-element interpreted HOF evaluation (nested `transform`/`slice`
  * lambdas don't participate in codegen and pay boxed evaluation per
  * gram; profiling at sf0.1 put ~80% of the repetition query's wall in
  * that expression). Lowercasing goes through UTF8String.toLowerCase —
  * the exact function Spark's `lower()` uses — so non-ASCII text folds
  * identically to the SQL form. */
object WordGrams {
  private val Ws = Pattern.compile("\\s+")

  def grams(text: UTF8String, n: Int): ArrayData = {
    val ws = Ws.split(text.toLowerCase.toString).filter(_.nonEmpty)
    if (ws.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](ws.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(ws(i))
      var j = 1
      while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n-gram order must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def nullSafeEval(t: Any): Any =
    WordGrams.grams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordGrams.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGramsFn {
  /** Column form for the DataFrame API. */
  def apply(text: Column, n: Int): Column =
    GraftShims.column(WordGrams(GraftShims.expression(text), n))

  val functionName = "word_grams"

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"$functionName expects 2 arguments")
    // eval() of a foldable expression can be NULL (CAST(NULL AS INT)) or an
    // out-of-int-range long — both must surface as the same clear argument
    // error as a non-literal, not a bare NPE/NumberFormatException
    val n = children(1) match {
      case e if e.foldable && (e.dataType == IntegerType || e.dataType == LongType) =>
        e.eval() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue => l.intValue()
          case v => throw new IllegalArgumentException(
            s"$functionName n-gram order must be a non-null int-range literal, got $v")
        }
      case other => throw new IllegalArgumentException(
        s"$functionName n-gram order must be an integer literal, got $other")
    }
    WordGrams(children.head, n)
  }

  val info = new ExpressionInfo(classOf[WordGrams].getName, functionName)
}
