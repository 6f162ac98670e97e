package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed n-gram features are under a TARGET corpus' distribution than
  * under the raw corpus' own, then resample with probability proportional
  * to the importance weight (Gumbel top-k trick).
  *
  * 100 TB shape: both bag-of-hashed-token models are ONE aggregation each
  * whose result is `buckets` rows (a constant, default 256) — the
  * log-ratio table broadcasts, so scoring is one pass over the exploded
  * token stream with a map-side-combinable per-doc sum, and selection is
  * a global top-k (TakeOrdered — per-partition heads, no full sort). No
  * stage ships anything proportional to the corpus except the one
  * narrow token scan every bag-of-words model needs.
  *
  * Everything is deterministic and oracle-replayable: tokenization is the
  * dedup family's `[^a-zA-Z0-9]+` split, feature hashing is md5-hex mod
  * buckets (portable SQL), smoothing is Laplace +1, and the resampling
  * noise is Gumbel transformed from a salted md5 of the doc id — a pure
  * function of (id, salt), stable under corpus growth like hashSplit.
  */
object Importance {

  /** Hash bucket of a token: first 8 md5 hex chars as an integer, mod
    * `buckets` — uniform, portable (DuckDB: CAST('0x'||substr AS BIGINT)). */
  private def bucketCol(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** The dedup family's tokenization, exploded to one row per token. */
  private def tokens(textCol: Column): Column =
    explode(filter(split(lower(regexp_replace(textCol,
      "[^a-zA-Z0-9]+", " ")), " "), t => t =!= ""))

  /** Exploded (id, bucket) token stream. */
  private def tokenBuckets(df: DataFrame, idCol: String, textCol: String,
                           buckets: Int): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("tok"))
      .select(col("id"), bucketCol(col("tok"), buckets).as("b"))

  /** Per-bucket ln-probability under Laplace(+1) smoothing: one
    * `buckets`-row frame (b, lp) — ln((cnt+1)/(total+buckets)). The only
    * driver-side value is the single total-count row. */
  private def logProbs(toks: DataFrame, buckets: Int): DataFrame = {
    val cnts = toks.groupBy("b").agg(count(lit(1)).as("cnt"))
    val total = cnts.agg(coalesce(sum("cnt"), lit(0L))).collect()(0).getLong(0)
    // all `buckets` rows exist even when unseen (cnt 0 → smoothed mass)
    toks.sparkSession.range(buckets).select(col("id").as("b"))
      .join(cnts, Seq("b"), "left")
      .select(col("b"),
        log(coalesce(col("cnt"), lit(0L)) + lit(1.0))
          .minus(log(lit(total.toDouble + buckets))).as("lp"))
  }

  /** Per-document importance weight: sum over token occurrences of
    * ln p_target(bucket) − ln p_raw(bucket). Documents with no tokens get
    * weight 0. Returns (id, n_tokens, weight) with weight rounded to 4
    * decimals (selection uses the unrounded value — see
    * [[importanceSample]]). */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, targetTextCol: String,
                        buckets: Int = 256): DataFrame =
    weighted(raw, idCol, textCol, target, targetTextCol, buckets)
      .select(col("id"), col("n_tokens"), round(col("w"), 4).as("weight"))

  private def weighted(raw: DataFrame, idCol: String, textCol: String,
                       target: DataFrame, targetTextCol: String,
                       buckets: Int): DataFrame = {
    val rawToks = tokenBuckets(raw, idCol, textCol, buckets)
    val targetToks = target.select(tokens(col(targetTextCol)).as("tok"))
      .select(bucketCol(col("tok"), buckets).as("b"))
    val ratio = logProbs(targetToks, buckets)
      .withColumnRenamed("lp", "lpt")
      .join(logProbs(rawToks.select("b"), buckets).withColumnRenamed("lp", "lpr"), Seq("b"))
      .select(col("b"), (col("lpt") - col("lpr")).as("lr"))
    // broadcast the buckets-row ratio table; per-doc sum is partial-agg
    val sums = rawToks.join(broadcast(ratio), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("w"))
    raw.select(col(idCol).as("id")).join(sums, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("w"), lit(0.0)).as("w"))
  }

  /** Gumbel top-k importance resampling: k documents drawn without
    * replacement with probability ∝ exp(weight), via the Gumbel-max trick
    * — top-k of (weight + g_id) where g_id = −ln(−ln(u_id)) and u_id is
    * the salted-md5 uniform of the id (deterministic; same construction
    * as [[TextAnalysis.hashSplit]], shifted to the open interval by the
    * +0.5 half-bucket). Ordering ties (exactly equal scores) break by id.
    * Returns the selected (id, n_tokens, weight, score). */
  def importanceSample(raw: DataFrame, idCol: String, textCol: String,
                       target: DataFrame, targetTextCol: String,
                       k: Int, buckets: Int = 256,
                       salt: String = "dsir-v1"): DataFrame = {
    val u = (conv(substring(md5(concat(col("id").cast("string"), lit(":" + salt))),
      1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    weighted(raw, idCol, textCol, target, targetTextCol, buckets)
      .withColumn("score", col("w") - log(-log(u)))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("n_tokens"), round(col("w"), 4).as("weight"),
        round(col("score"), 4).as("score"))
  }
}
