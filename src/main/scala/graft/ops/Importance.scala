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
  * whose result is `buckets` rows (a constant, default 256) — collected to
  * a local relation, so the target corpus is token-scanned exactly once
  * and the raw corpus exactly twice (model counts + scoring; caching the
  * corpus-token-sized (id, bucket) stream to avoid the second scan would
  * spill ~the corpus to disk — recompute is the cheaper trade at scale).
  * The log-ratio table broadcasts, scoring is one pass over the exploded
  * token stream with a map-side-combinable per-doc sum, and selection is
  * a global top-k (TakeOrdered — per-partition heads, no full sort).
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

  /** The canonical tokenization ([[graft.functions.TextFns.tokensCol]]),
    * exploded to one row per token occurrence. */
  private def tokens(textCol: Column): Column =
    explode(graft.functions.TextFns.tokensCol(textCol))

  /** Exploded (id, bucket) token stream. */
  private def tokenBuckets(df: DataFrame, idCol: String, textCol: String,
                           buckets: Int): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("tok"))
      .select(col("id"), bucketCol(col("tok"), buckets).as("b"))

  /** Per-bucket ln-probability under Laplace(+1) smoothing: one
    * `buckets`-row LOCAL frame (b, lp) — ln((cnt+1)/(total+buckets)).
    *
    * The bucket-count aggregate is at most `buckets` rows (a constant
    * knob, never corpus-proportional), so COLLECTING it is scale-safe and
    * buys one full token scan: the previous shape kept the counts
    * distributed and lazily recomputed the tokenize+md5+explode scan once
    * for the total and again for the ratio join. The ln math stays a
    * Catalyst column over the same integer counts, so the doubles are
    * bit-identical to the distributed form (and the DuckDB oracle); all
    * `buckets` rows exist even when unseen (cnt 0 → smoothed mass). */
  private def logProbs(toks: DataFrame, buckets: Int): DataFrame = {
    val seen = toks.groupBy("b").agg(count(lit(1)).as("cnt")).collect()
    val arr = new Array[Long](buckets)
    seen.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    val total = arr.sum // exact: integer counts
    toks.sparkSession
      .createDataFrame(arr.toSeq.zipWithIndex.map { case (c, b) => (b.toLong, c) })
      .toDF("b", "cnt")
      .select(col("b"),
        log(col("cnt") + lit(1.0))
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
