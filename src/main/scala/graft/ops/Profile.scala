package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling: exact per-stratum percentiles of a DISCRETE-valued
  * column (lengths, token counts, quality scores×10⁴ — the distribution
  * reports a data team reads before choosing curation thresholds).
  *
  * Spark's built-in exact `percentile` buffers every group value in
  * executor memory — O(rows per stratum), a non-starter at 100 TB — and
  * `percentile_approx` is approximate. For discrete values there is an
  * exact shape that scales: aggregate the (stratum, value) HISTOGRAM
  * first (partial-agg-friendly; its size is bounded by the value domain,
  * not the corpus), then read each percentile off the cumulative
  * histogram with linear interpolation between the two bracketing order
  * statistics — byte-identical to `quantile_cont` / Spark `percentile`
  * semantics: for p over n values, h = p·(n−1), result =
  * x_⌊h⌋ + (h−⌊h⌋)·(x_⌈h⌉ − x_⌊h⌋).
  *
  * The only window runs over the per-stratum histogram (domain-bounded,
  * thousands of rows), never over documents.
  */
object Profile {

  /** One row per stratum: n rows, mean, and one `p<pct>` column per
    * requested percentile (exact, interpolated). `ps` values must be in
    * [0, 1]; column names are `p50`-style (percent, trailing-zero-free:
    * 0.925 → `p92_5`). */
  def percentiles(df: DataFrame, strataCol: String, valueCol: String,
                  ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad percentiles: $ps")
    // NULL values are ignored, matching Spark's built-in `percentile` and
    // DuckDB's quantile_cont (a NULL histogram row would otherwise sort
    // first and shift every order statistic)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(strataCol).as("stratum"), col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy("stratum").orderBy("v")))
    // per-stratum totals as WINDOW aggregates, not a groupBy+re-join: the
    // window partitioner treats a NULL stratum key as a real partition
    // (null-safe, where a Seq-join would silently drop the NULL group),
    // and the frame reuses the cum window's hash partitioning — no second
    // shuffle, no join
    val wAll = Window.partitionBy("stratum")
    val j = cum
      .withColumn("n", sum("c").over(wAll))
      .withColumn("sv", sum(col("v") * col("c")).over(wAll))
    // per percentile: the two bracketing order statistics are min-v with
    // cumulative count past ⌊h⌋ / ⌈h⌉ (0-based index i lives at cum ≥ i+1)
    val pcols = ps.map { p =>
      val h = lit(p) * (col("n") - 1)
      val lo = min(when(col("cum") >= floor(h) + 1, col("v")))
      val hi = min(when(col("cum") >= ceil(h) + 1, col("v")))
      // exact decimal rendering: BigDecimal(p.toString) avoids the
      // double artifact where 0.29*100 = 28.999…96 (name "p29_", not "p29")
      val name = "p" + (BigDecimal(p.toString) * 100).underlying
        .stripTrailingZeros.toPlainString.replace(".", "_")
      round(lo + (min(h) - floor(min(h))) * (hi - lo), 4).as(name)
    }
    val aggs = Seq(min(col("n")).as("n_rows"),
      round(min(col("sv")) / min(col("n")), 4).as("mean")) ++ pcols
    val perStratum = j.groupBy("stratum").agg(aggs.head, aggs.tail: _*)
    // The stratum universe comes from the UNFILTERED input: a stratum
    // whose values are ALL NULL must still surface (n_rows = 0, NULL
    // mean/percentiles) — dropping it entirely would be a silent row-set
    // divergence vs engines that emit the group with NULL quantiles.
    // n_rows counts NON-NULL values (0 for the degenerate stratum),
    // consistent with the NULL-ignoring order statistics above.
    val strata = df.select(col(strataCol).as("stratum")).distinct()
    // null-SAFE join key: a NULL stratum is a legitimate group (both
    // Spark's groupBy and DuckDB's GROUP BY treat NULL keys as equal);
    // a Seq-based equi-join would never match it and silently replace
    // its computed stats with the degenerate n_rows=0 row
    strata.join(perStratum.withColumnRenamed("stratum", "_ps_stratum"),
        strata("stratum") <=> col("_ps_stratum"), "left")
      .drop("_ps_stratum")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
  }
}
