package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** The engine's SQL-callable function surface: every custom scalar the
  * Column API exposes is also registered by name, so a plain-SQL user
  * (spark-sql, JDBC, a notebook) has the same vocabulary as Scala code.
  * Native-Expression functions map straight to their case classes;
  * composed-builtin functions are registered as expression-tree builders
  * (still whole-stage-codegen — registration adds no UDF layer).
  */
object GraftFunctions {

  private def composed(name: String, arity: Int)(f: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name expects $arity argument(s), got ${children.length}")
      GraftShims.toCatalyst(f(children.map(GraftShims.column)))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, name), builder)
  }

  /** (identifier, info, builder) triples for every graft SQL function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier(TokenSetRatio.functionName),
      TokenSetRatio.info, TokenSetRatio.builder),
    (FunctionIdentifier("embed_text"),
      new ExpressionInfo(classOf[EmbedText].getName, "embed_text"),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"embed_text expects 1 argument, got ${children.length}")
        EmbedText(children.head)
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"cosine_sim expects 2 arguments, got ${children.length}")
        CosineSim(children(0), children(1))
      }),
    composed("estimate_tokens", 1)(cs => TextFns.estimateTokensCol(cs.head)),
    composed("non_alpha_ratio", 1)(cs => TextFns.nonAlphaRatioCol(cs.head)),
    // whitespace-normalized lowercase md5 — the exact-dedup identity
    composed("doc_fingerprint", 1)(cs => TextFns.fingerprintCol(cs.head)),
    (FunctionIdentifier(NfcNormalizeFn.functionName),
      NfcNormalizeFn.info, NfcNormalizeFn.builder),
    (FunctionIdentifier(SpanHashes.functionName),
      SpanHashes.info, SpanHashes.builder),
    (FunctionIdentifier(WordGramsFn.functionName),
      WordGramsFn.info, WordGramsFn.builder),
    // PDF-layout bbox/crop + table→markdown (sources/PdfLayout)
    composed("bbox_from_polygon", 1)(cs =>
      graft.sources.PdfLayout.bboxFromPolygon(cs.head)),
    composed("clamp_bbox", 3)(cs =>
      graft.sources.PdfLayout.clampBbox(cs(0), cs(1), cs(2))),
    composed("crop_pixels", 1)(cs =>
      graft.sources.PdfLayout.cropPixels(cs.head)),
    composed("table_markdown", 3)(cs =>
      graft.sources.PdfLayout.tableMarkdown(cs(0), cs(1), cs(2))))

  /** Register every function on a live session (tests / notebooks). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, info, b) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, b)
  }
}
