package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-build cost / time estimator (reference tools/estimator.py:8-78 and
  * builder/building_tools.py:52-76 `display_build_info`).
  *
  * The reference sums chunk and token counts over its in-memory
  * ProcessedFile list; here the same two scalars come from ONE narrow
  * aggregation over the chunks table (column-pruned scan — no text column
  * is read), so the estimate itself costs a metadata-scale job even on a
  * 100 TB corpus. The cost / time formulas mirror the reference's numbers
  * exactly (gpt-4o: $5/M prompt + $15/M completion, 2.5 calls/token
  * heuristic, 4 s/chunk at max_workers=2; -mini: $0.15/$0.60, 2 s/chunk).
  */
object Estimator {

  case class BuildEstimate(
      numChunks: Long,
      totalTokens: Long,
      model: String,
      estimatedCostUsd: Double,
      estimatedTime: String)

  /** Reference get_cost_indication (estimator.py:8-37). */
  def costIndication(totalTokens: Long, model: String): Double = {
    val (promptPerM, completionPerM) = model match {
      case "gpt-4o" => (5.00, 15.00)
      case "gpt-4o-mini" => (0.150, 0.600)
      case other => throw new IllegalArgumentException(s"Invalid model specified: $other")
    }
    val promptCost = totalTokens / 1e6 * promptPerM
    val completionCost = totalTokens / 1e6 * completionPerM
    val buildingCost = promptCost + completionCost / 4
    val llmCallsPerToken = 2.5
    math.round(buildingCost * llmCallsPerToken * 1e4) / 1e4
  }

  /** Reference get_time_indication (estimator.py:39-78) — including its
    * max_workers=2 batching and the matcher/community delay terms. */
  def timeIndication(numChunks: Long, model: String): String = {
    val perChunk = if (model == "gpt-4o") 4L else 2L
    val maxWorkers = 2L
    var t =
      if (numChunks <= maxWorkers) perChunk
      else {
        val full = numChunks / maxWorkers * perChunk
        if (numChunks % maxWorkers > 0) full + perChunk else full
      }
    t += numChunks * perChunk // node-matcher delay
    t += numChunks * perChunk // community-building delay
    if (t > 60) {
      val minutes = math.round(t / 60.0 * 1000) / 1000.0
      s"$minutes minute${if (minutes > 1) "s" else ""}"
    } else s"$t seconds"
  }

  /** display_build_info analog: one narrow agg over the chunks table
    * (chunk count + token sum — the stats BuildPipeline already computes
    * for the documents registry). */
  def estimate(chunks: DataFrame, model: String = "gpt-4o"): BuildEstimate = {
    val row = chunks.agg(
      count(lit(1)).as("n"), coalesce(sum(col("token_num")), lit(0L)).as("tok")).head()
    val (n, tok) = (row.getLong(0), row.getLong(1))
    BuildEstimate(n, tok, model, costIndication(tok, model), timeIndication(n, model))
  }

  def render(e: BuildEstimate): String =
    f"This will parse ${e.numChunks} chunks, analyze ${e.totalTokens} tokens%n" +
      f"Using ${e.model} with an approximate cost of $$${e.estimatedCostUsd}%.2f %n" +
      f"Estimated building time is: ${e.estimatedTime}%n"
}
