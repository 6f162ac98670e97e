package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators: gap-based sessionization and the
  * as-of (most-recent-at-or-before) join — the two temporal primitives a
  * behavioral/training-telemetry pipeline needs that plain equi-joins
  * can't express.
  */
object Events {

  /** Epoch microseconds for either TIMESTAMP or TIMESTAMP_NTZ input.
    * `unix_micros` rejects NTZ; the cast interprets NTZ wall time in the
    * session timezone, which the engine pins to UTC (core/Sessions) — the
    * same naive-as-UTC reading DuckDB's epoch_us applies. */
  private def micros(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  /** Gap-based sessions per user: consecutive events at most `gap` apart
    * (inclusive — session_window merges at diff == gap) belong to one
    * session. Uses Spark's native `session_window` aggregation — a single
    * hash aggregation whose state merges overlapping windows, so it needs
    * ONE shuffle keyed by user and supports partial aggregation; no
    * per-user sort-window pass, and the same operator is streaming-capable
    * with a watermark.
    *
    * Timestamps are reported as epoch microseconds (session_start_us =
    * first event, session_end_us = last event), never as raw timestamps —
    * timestamp columns hash differently between tz-aware and naive
    * readers. Returns (user_id, session_start_us, session_end_us,
    * n_events, sum_value). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gap: String = "30 minutes",
                 valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(userCol).as("user_id"), session_window(col(tsCol), gap))
      .agg(
        min(micros(col(tsCol))).as("session_start_us"),
        max(micros(col(tsCol))).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"))
      .select("user_id", "session_start_us", "session_end_us",
        "n_events", "sum_value")

  /** As-of join: for every LEFT event, the most recent RIGHT event of the
    * same key at-or-before its timestamp (ties on timestamp resolved to
    * the largest right `idCol`, so the relation is deterministic).
    *
    * NOT a range join (which explodes candidates) and NOT a per-key loop:
    * both sides are tagged and UNIONED, then one window pass per key in
    * (ts, side, id) order carries the last-seen right row forward
    * (`last(_, ignoreNulls)` over unbounded-preceding). One shuffle keyed
    * by the join key, work linear in rows; the window partition is
    * key-bounded, the standard skew caveat for pathological hot keys.
    *
    * Returns one row per left event:
    * (id, key, ts_us, right_id, right_ts_us, lag_us) — right columns null
    * when no right event precedes. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String, idCol: String): DataFrame = {
    val r = right.select(col(keyCol).as("key"), micros(col(tsCol)).as("ts_us"),
      lit(1).as("side"), lit(null).cast("long").as("lid"),
      col(idCol).cast("long").as("rid"))
    val l = left.select(col(keyCol).as("key"), micros(col(tsCol)).as("ts_us"),
      lit(2).as("side"), col(idCol).cast("long").as("lid"),
      lit(null).cast("long").as("rid"))
    // ordering encodes ALL the semantics, so one window pass suffices:
    // right rows sort before left rows at equal ts (side 1 < 2 — an
    // exactly-simultaneous right event IS visible, '<='), and equal-ts
    // right rows sort by rid ascending so the carry-forward's `last`
    // resolves the tie to the largest right id with no pre-dedup shuffle
    val w = Window.partitionBy("key")
      .orderBy(col("ts_us"), col("side"), col("rid"), col("lid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both carry-forwards in ONE select → they share one Window operator
    // (separate withColumns defeat CollapseWindow with a Project between)
    r.unionByName(l)
      .select(col("side"), col("lid"), col("key"), col("ts_us"),
        last(col("rid"), ignoreNulls = true).over(w).as("last_rid"),
        last(when(col("rid").isNotNull, col("ts_us")), ignoreNulls = true)
          .over(w).as("last_rts"))
      .filter(col("side") === 2)
      .select(col("lid").as("id"), col("key"), col("ts_us"),
        col("last_rid").as("right_id"), col("last_rts").as("right_ts_us"),
        (col("ts_us") - col("last_rts")).as("lag_us"))
  }
}
