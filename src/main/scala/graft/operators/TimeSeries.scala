package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series preparation over event streams: regularizing an irregular
  * event log onto a fixed-step grid (the input shape forecasting and
  * feature pipelines expect) and robust outlier flagging. Batch
  * complements of the streaming battery in [[graft.streaming.StreamOps]].
  */
object TimeSeries {

  /** Resample an event log onto a dense per-key hourly grid and
    * forward-fill gaps: every key gets one row per hour from its first
    * to its last observation; hours with no events carry the most
    * recent observed aggregate (`filled = true` marks carried rows).
    *
    * Scale shape: the hourly aggregate is one map-side-combinable
    * groupBy; the spine is GENERATED, not joined from a calendar table —
    * `sequence(min_hr, max_hr)` + explode off the per-key bounds row,
    * so spine size is output-grain and costs no extra scan. The fill is
    * `last(_, ignoreNulls)` over (key ORDER BY hour) — one shuffle by
    * key, and the window runs inside the key partition with a
    * running-last accumulator (no O(gap²) re-scan per row). Dense
    * output is bounded by keys × hours-of-span, independent of event
    * volume; a 100 TB event log with a 1-year span and 1M keys yields
    * 8.8B grid rows — partitioned by key, never collected.
    *
    * `valueAgg` must already be deterministic-rounded if it aggregates
    * floating point (the q26 parity rule: round before, not after, the
    * fill so carried copies equal their source exactly).
    */
  def resampleHourlyFill(events: DataFrame, keyCol: String, tsCol: String,
      valueAgg: Column): DataFrame = {
    // group over the source frame directly so `valueAgg` can reference
    // any of its columns
    val hourly = events
      .groupBy(col(keyCol).as("key"), date_trunc("hour", col(tsCol)).as("hr"))
      .agg(valueAgg.as("v"), count(lit(1)).as("n_events"))
    val spine = hourly.groupBy(col("key"))
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hr"))
    val w = Window.partitionBy(col("key")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("key", "hr"), "left_outer")
      .select(col("key"), col("hr"),
        last(col("v"), ignoreNulls = true).over(w).as("v"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("v").isNull.as("filled"))
  }

  /** Robust per-group outlier profile via the median absolute deviation
    * (Hampel 1974; the 1.4826 factor rescales MAD to σ under normality).
    * A point is an outlier when `|x − median| > k · 1.4826 · MAD` —
    * unlike mean/stddev z-scores, both center and spread have a 50%
    * breakdown point, so the outliers themselves cannot mask the fence.
    *
    * Two passes by construction (MAD is a median OF deviations from a
    * median): pass 1 computes per-group medians, pass 2 joins them back
    * (group-grain broadcast) and computes deviation medians + counts.
    * Exact `percentile` is the oracle-parity choice at gate scale; at
    * 100 TB swap both medians for `approx_percentile(_, 0.5, acc)` —
    * same two-pass shape, the sort-based exact aggregate becomes a
    * mergeable KLL-style sketch (the q97→q98 ANALYZE swap, pinned by
    * ScaleSpec there).
    *
    * Returns one row per group: (group, n, med, mad, n_outliers).
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val pts = df.select(col(groupCol).as("g"), col(valueCol).as("x"))
    val med = df.groupBy(col(groupCol).as("g"))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val stats = pts.join(broadcast(med), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"),
        expr("percentile(abs(x - med), 0.5)").as("mad"))
    val fence = lit(k * 1.4826)
    pts.join(broadcast(stats), "g")
      .groupBy(col("g"))
      .agg(first(col("n")).as("n"), first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(abs(col("x") - col("med")) > fence * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
