package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen cosine similarity over two `array<float>` columns.
  *
  * The per-row cost of the search scorer and the ANN verify joins was a
  * boxed `Seq[Float]` UDF (each call deserializes both arrays into boxed
  * scala collections before the dot product); this expression stays inside
  * whole-stage codegen and hands [[TextFns.cosine]] two primitive float
  * arrays via `ArrayData.toFloatArray` — one bulk copy, no per-element
  * boxing, no UDF ser/deser. Identical numerics: same IEEE-754 double
  * accumulation as the UDF path (SearchSpec / OpsSpec byte-compare).
  *
  * Reference role: the vector-distance of the search path
  * (eschergraph/persistence/vector_db/adapters/chromadb.py:123-149,
  * cosine space); here it scores the deterministic feature-hash embedding
  * ([[EmbedText]]). */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextFns.cosine(a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextFns.cosine($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(CosineSim(GraftShims.expression(a), GraftShims.expression(b)))
}
