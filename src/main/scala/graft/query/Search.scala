package graft.query

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search entry points (reference eschergraph/graph/search/quick_search.py
  * and global_search.py), as dataflow plans over the search_index table:
  *
  *   quick (local) search: level-0 rows [+ optional document filter] →
  *   embedding-cosine top-40 → deterministic rerank → keep the score-ordered
  *   prefix with relevance > 0.1 (the reference breaks at the first
  *   below-threshold result, quick_search.py:180-209);
  *
  *   global search: level-1 rows → top-15 → rerank threshold 0.
  *
  * The query embedding is computed once on the driver and folded into the
  * plan as a literal, so scoring stays a narrow map over the index scan —
  * no shuffle until the tiny top-k sort.
  */
object Search {

  private def cosineToQuery(queryVec: Array[Float]) =
    udf((v: Array[Float]) => TextFns.cosine(queryVec, v))

  private def rerankUdf(query: String) =
    udf((t: String) => TextFns.rerankScore(query, t))

  /** Shared retrieve→rerank→prefix-filter plan. */
  def retrieve(index: DataFrame, query: String, level: Int, topN: Int,
               threshold: Double, docIds: Seq[String] = Nil): DataFrame = {
    val qv = TextFns.embed(query)
    val base = index.filter(col("level") === level)
    val filtered =
      if (docIds.nonEmpty) base.filter(col("document_id").isin(docIds: _*)) else base
    val hits = filtered
      .withColumn("distance", -cosineToQuery(qv)(col("embedding")))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(topN)
      .withColumn("score", rerankUdf(query)(col("text")))
    // prefix-break at the first below-threshold score (score-ordered)
    val w = Window.orderBy(col("score").desc, col("id").asc)
    hits
      .withColumn("rn", row_number().over(w))
      .withColumn("bad_before",
        sum(when(col("score") <= threshold, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("score") > threshold && col("bad_before") === 0)
      .select(col("id"), col("text"), col("type"), col("document_id"), col("score"), col("rn"))
  }

  /** Q1 — quick/local search (top_n=40, level 0, threshold 0.1). */
  def quickSearch(index: DataFrame, query: String, docIds: Seq[String] = Nil): DataFrame =
    retrieve(index, query, level = 0, topN = 40, threshold = 0.1, docIds)

  /** Q2 — global search (top_n=15, level 1, threshold 0). */
  def globalSearch(index: DataFrame, query: String, docIds: Seq[String] = Nil): DataFrame =
    retrieve(index, query, level = 1, topN = 15, threshold = 0.0, docIds)

  case class RagAnswer(answer: String, sources: Seq[String])

  /** L9 stand-in: deterministic answer assembly from the retrieved context
    * (the reference sends the same context to an LLM). */
  def answer(index: DataFrame, query: String): RagAnswer = {
    val rows = quickSearch(index, query).collect()
    val ctx = rows.map(_.getAs[String]("text")).toSeq
    RagAnswer(
      if (ctx.isEmpty) "no relevant context found"
      else s"Based on ${ctx.size} sources: " + ctx.take(3).mkString(" | "),
      rows.map(_.getAs[String]("id")).toSeq)
  }
}
