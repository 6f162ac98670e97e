package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring over the document corpus — the keyword-search
  * companion to the embedding ANN path (Similarity.scala): a training-data
  * pipeline filters and audits corpora by keyword query ("find every
  * document mentioning X, ranked") long before embeddings exist.
  */
object Ranking {

  /** BM25 relevance score of every document against a fixed term query
    * (Robertson/Sparck-Jones weighting with the Lucene `+1`-inside-log IDF,
    * which keeps every term's contribution positive even for terms in more
    * than half the corpus).
    *
    * score(D) = sum_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
    *              * tf * (k1+1) / (tf + k1 * (1 - b + b * |D|/avgdl))
    *
    * 100 TB shape: query terms are a bounded literal set, so there is no
    * inverted index and no explode — ONE narrow projection computes
    * (doclen, tf per term) per document via codegen array filters, ONE
    * partial-agg-friendly global aggregate reduces that to a single stats
    * row (N, avgdl, df per term), and the stats row is broadcast back with
    * a 1-row cross join. The corpus itself is never shuffled. Doc lengths
    * and counts are integers, so N/avgdl/df are bit-identical regardless of
    * partitioning (integer-valued double sums are exact), and the per-doc
    * score is a deterministic left-to-right sum over the fixed term list —
    * reproducible to the last bit across cluster sizes and vs the DuckDB
    * oracle. Zero-hit documents (no query term present) are excluded by an
    * integer tf filter, never by comparing a float to zero.
    *
    * Returns (id, bm25) with bm25 rounded to 4 decimals. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.distinct == queryTerms, "duplicate query terms")
    val words = graft.functions.TextFns.tokensCol(col(textCol))
    val tfCols = queryTerms.zipWithIndex.map { case (term, i) =>
      size(filter(col("_w"), w => w === lit(term))).cast("long").as(s"_tf$i")
    }
    val per = df.select(col(idCol).as("id"), words.as("_w"))
      .select(col("id") +: size(col("_w")).cast("long").as("_len") +: tfCols: _*)
    val dfCols = queryTerms.indices.map(i =>
      sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i"))
    val statCols = Seq(
      count(lit(1)).as("_n"),
      (sum(col("_len")).cast("double") / count(lit(1))).as("_avgdl")) ++ dfCols
    val stats = per.agg(statCols.head, statCols.tail: _*)
    val termScore: Int => Column = { i =>
      val tf = col(s"_tf$i").cast("double")
      val dft = col(s"_df$i").cast("double")
      val idf = log((col("_n").cast("double") - dft + 0.5) / (dft + 0.5) + 1.0)
      // length normalization; multiplication order differs from the oracle
      // SQL only commutatively (exact in IEEE), association is identical
      val norm = lit(1.0 - b) + col("_len").cast("double") * b / col("_avgdl")
      idf * (tf * (k1 + 1.0)) / (tf + norm * k1)
    }
    val anyHit = queryTerms.indices.map(i => col(s"_tf$i")).reduce(_ + _) > 0
    per.crossJoin(broadcast(stats))
      .filter(anyHit)
      .select(col("id"),
        round(queryTerms.indices.map(termScore).reduce(_ + _), 4).as("bm25"))
  }
}
