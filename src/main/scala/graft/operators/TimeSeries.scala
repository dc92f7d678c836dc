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

  /** Windowed exponentially-weighted moving average of the DAILY event
    * volume, plus a deviation alert — the trend-following feed-health
    * check complementing [[graft.operators.Expectations.volumeAnomalies]]
    * (global z-scores miss a slow ramp; EWMA tracks it and flags the
    * day that breaks from its own recent level).
    *
    * `ewma(d) = Σ_{lag=0..window-1} n(d-lag)·2^-lag / Σ 2^-lag` over the
    * days PRESENT in the window (the "adjusted" normalization, so early
    * days and gaps don't bias low). The decay is FIXED at 1/2 per day —
    * not a tuning cop-out but the t32/s10 determinism discipline:
    * `2^-lag` is an exact binary float, a daily count times `2^-lag` is
    * exact, and the ≤window-term sums stay inside 53 mantissa bits, so
    * numerator, denominator, and their quotient are bit-identical in
    * ANY engine and ANY summation order — zero float tolerance needed.
    * (An arbitrary α would put a libm `pow` ulp in every weight.)
    *
    * Scale shape: one map-combinable date-grain count, then a
    * day×window band self-join AT DAY GRAIN — bounded metadata
    * (a decade is 3.7k rows), never event-grain; the band join is the
    * intentional bounded non-equi block, same class as the q121 stats
    * cross-join.
    *
    * @return (d, n, ewma, ratio, is_alert) per day, alert when the
    *         day's volume deviates from its EWMA by more than
    *         `alertRatio` in either direction.
    */
  def ewmaDailyVolume(events: DataFrame, tsCol: String, window: Int = 14,
      alertRatio: Double = 0.5): DataFrame = {
    require(window >= 1 && window <= 50, s"window must be in [1,50]: $window")
    // the band self-join references the day-grain aggregate twice; a
    // localCheckpoint materializes it once so the EVENT-grain scan+agg
    // never runs twice (day-grain blocks are metadata-sized; freed on GC
    // or Caches.sweep, the standard operator-result contract)
    val daily = events
      .groupBy(col(tsCol).cast("date").as("d"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val hist = daily.select(col("d").as("h_d"), col("n").as("h_n"))
    daily.join(hist,
        datediff(col("d"), col("h_d")).between(0, window - 1))
      .groupBy(col("d"), col("n"))
      .agg((sum(col("h_n") * pow(lit(0.5), datediff(col("d"), col("h_d")))) /
        sum(pow(lit(0.5), datediff(col("d"), col("h_d"))))).as("_e"))
      .select(col("d"), col("n"), round(col("_e"), 4).as("ewma"),
        round(col("n") / col("_e"), 4).as("ratio"),
        (abs(col("n") / col("_e") - 1.0) > alertRatio).as("is_alert"))
  }

  /** One-sided CUSUM changepoint detection on daily volume (Page,
    * Biometrika 1954 — the sequential drift detector that catches a
    * small sustained shift long before a per-day z-score does):
    * `S_t = max(0, S_{t−1} + (x_t − k))`, alarm when `S_t > h`, with
    * the allowance `k = μ·(1 + slack)` from the series' own mean.
    *
    * EXACT, WITHOUT A SEQUENTIAL FOLD: the clipped recursion has the
    * prefix-sum closed form `S_t = P_t − min_{0≤j≤t} P_j` (P = running
    * sum of deviations, P₀ = 0 the virtual start), so two windows —
    * one cumulative sum, one inclusive running min floored at 0 —
    * compute it. Deviations ride in integer MICRO-units (`x·1e6 −
    * k_micro`; μ quantizes to micro from exact longs, the slack
    * multiply is one IEEE product of identical operands), so S is an
    * exact long in any engine and the alarm boolean is exact.
    *
    * Scale shape: corpus collapses map-side to DAY grain; both windows
    * run single-partition over the bounded day rows (the q125/q135
    * day-grain metadata contract).
    *
    * @return per day: (d, n, s_micro, alarm), ordered by day.
    */
  def cusumDailyVolume(events: DataFrame, tsCol: String,
      slack: Double = 0.1, hDays: Double = 3.0): DataFrame = {
    require(slack >= 0.0, s"slack must be >= 0, got $slack")
    require(hDays > 0.0, s"hDays must be > 0, got $hDays")
    import org.apache.spark.sql.expressions.Window
    val daily = events.select(col(tsCol).cast("date").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // μ in micro-units from exact longs; k = μ(1+slack); the alarm
    // threshold h is expressed in multiples of μ (hDays "mean days")
    val muMicro = round(lit(1e6) * sum(col("n")).over(wAll).cast("double") /
      count(lit(1)).over(wAll).cast("double"), 0).cast("long")
    val kMicro = round(muMicro.cast("double") * (1.0 + slack), 0).cast("long")
    val hMicro = round(muMicro.cast("double") * hDays, 0).cast("long")
    val dev = daily.select(col("d"), col("n"),
      (col("n") * lit(1000000L) - kMicro).as("dev"),
      hMicro.as("h_micro"))
    val wCum = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = dev.select(col("d"), col("n"), col("h_micro"),
      sum(col("dev")).over(wCum).as("prefix"))
    val runMin = least(lit(0L), min(col("prefix")).over(wCum))
    p.select(col("d"), col("n"),
        (col("prefix") - runMin).as("s_micro"),
        ((col("prefix") - runMin) > col("h_micro")).as("alarm"))
      .orderBy(col("d"))
  }

  /** [[cusumDailyVolume]] against a FROZEN reference: the monitored
    * series' allowance `k = μ_ref(1+slack)` and threshold
    * `h = μ_ref·hDays` derive from a SEPARATE reference window's mean,
    * not from the monitored series itself — the shape a streaming
    * monitor needs (the live series' own mean drifts WITH the shift
    * you're trying to catch; gate st17 feeds it windowed stream
    * counts, the [[Expectations.psiDriftSeries]] pattern).
    *
    * Same exact arithmetic as [[cusumDailyVolume]]: μ_ref quantizes to
    * integer micro-units from exact longs, deviations ride micro-units,
    * and the one-sided CUSUM uses the prefix-sum closed form
    * `S_t = P_t − min_{0≤j≤t} P_j` — two windows over bounded day
    * rows, no sequential fold. An EMPTY reference yields null scores
    * (no mean to monitor against — never an invented one).
    *
    * Scale shape: inputs are ALREADY day-grain counts (the caller's
    * aggregation did the only corpus-grain work); the reference
    * reduces to one broadcast row and both windows run single-partition
    * over bounded monitored days — the q138 metadata contract.
    *
    * @param daily    (day, n) monitored series — `dCol`/`nCol` name it.
    * @param refDaily (day, n) reference series — `refNCol` names its
    *                 count column.
    * @return per monitored day: (d, n, s_micro, alarm), day-ordered.
    */
  def cusumSeries(daily: DataFrame, dCol: Column, nCol: Column,
      refDaily: DataFrame, refNCol: Column,
      slack: Double = 0.1, hDays: Double = 3.0): DataFrame = {
    require(slack >= 0.0, s"slack must be >= 0, got $slack")
    require(hDays > 0.0, s"hDays must be > 0, got $hDays")
    val ref = refDaily.agg(
      when(count(lit(1)) > 0,
        round(lit(1e6) * sum(refNCol).cast("double") /
          count(lit(1)).cast("double"), 0).cast("long")).as("mu_micro"))
    val kMicro = round(col("mu_micro").cast("double") * (1.0 + slack), 0)
      .cast("long")
    val hMicro = round(col("mu_micro").cast("double") * hDays, 0)
      .cast("long")
    val dev = daily
      .select(dCol.as("d"), nCol.cast("long").as("n"))
      .crossJoin(broadcast(ref))
      .select(col("d"), col("n"),
        (col("n") * lit(1000000L) - kMicro).as("dev"), hMicro.as("h_micro"))
    val wCum = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = dev.select(col("d"), col("n"), col("h_micro"),
      sum(col("dev")).over(wCum).as("prefix"))
    val runMin = least(lit(0L), min(col("prefix")).over(wCum))
    p.select(col("d"), col("n"),
        (col("prefix") - runMin).as("s_micro"),
        ((col("prefix") - runMin) > col("h_micro")).as("alarm"))
      .orderBy(col("d"))
  }

  /** Sample autocorrelation function of the daily event-volume series
    * at lags 1..`maxLag` (Box & Jenkins ch. 2) — the
    * is-there-weekly-seasonality / is-drift-persistent diagnostic next
    * to [[cusumDailyVolume]] (which detects a sustained SHIFT; ACF
    * characterizes the series' memory):
    * `r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²`.
    *
    * ENGINE-EXACT: the series is re-indexed by rank over day order, and
    * both sides of `r_k` are cleared of the rational mean by
    * multiplying through by n² — `num·n² = n²·Σx_t·x_{t−k} −
    * n·S·(Σ_head + Σ_tail) + (n−k)·S²` and `den·n² = n²·Σx² − n·S²`
    * are EXACT LONGS (daily counts are integers; ANSI makes any
    * overflow at extreme magnitudes throw loudly — pre-scale the
    * series if daily volumes approach 2³¹), so `r_k` is one IEEE
    * division of identical operands, round-6 in any engine. A constant
    * series (den = 0) yields null r, never NaN.
    *
    * Scale shape: the corpus collapses MAP-SIDE to day grain; the rank
    * window, the lag self-join (rank = rank + k, an equi-join after
    * the lag explode), and both aggregates run on bounded day/lag rows
    * — the q125/q135 bounded-metadata contract. The event stream never
    * shuffles at row grain.
    *
    * @return one row per lag k: (k, n_pairs, num_n2, den_n2, r).
    */
  def acfDailyVolume(events: DataFrame, tsCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val daily = events.select(col(tsCol).cast("date").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val ranked = daily.select(col("n").as("x"),
      row_number().over(Window.orderBy(col("d"))).as("t"))
    val glob = ranked.agg(count(lit(1)).as("cnt"), sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("sxx"))
    // each day offers itself to every lag: (t + k, k, x) then equi-join
    // back on the rank — day-grain × maxLag rows, still bounded metadata
    val shifted = ranked
      .select(explode(expr(s"sequence(1, $maxLag)")).as("k"),
        col("t").as("t0"), col("x").as("xl"))
      .select(col("k"), (col("t0") + col("k")).as("t"), col("xl"))
    val perLag = ranked.join(shifted, Seq("t"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("x") * col("xl")).as("sxy"),
        sum(col("x")).as("st"), sum(col("xl")).as("sh"))
    val num = col("cnt") * col("cnt") * col("sxy") -
      col("cnt") * col("s") * (col("st") + col("sh")) +
      (col("cnt") - col("k")) * col("s") * col("s")
    val den = col("cnt") * col("cnt") * col("sxx") -
      col("cnt") * col("s") * col("s")
    perLag.crossJoin(broadcast(glob))
      .select(col("k").cast("long").as("k"), col("n_pairs"),
        num.as("num_n2"), den.as("den_n2"),
        when(den =!= 0L,
          round(num.cast("double") / den.cast("double"), 6)).as("r"))
      .orderBy(col("k"))
  }

  /** Mann–Kendall trend test (Mann 1945 / Kendall 1975) on the daily
    * event-volume series — IS the trend [[theilSenDailyTrend]]
    * estimates statistically there at all? `S = Σ_{i<j} sign(x_j−x_i)`
    * over time-ordered day pairs, variance with the tie correction
    * `Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)`, and the
    * continuity-corrected `z = (S∓1)/√Var` judged at the two-sided 5%
    * level (|z| > 1.96). The standard nonparametric is-the-feed-
    * growing check — no distribution assumed, outlier-robust like the
    * Theil–Sen slope it accompanies.
    *
    * ENGINE-EXACT: S and Var·18 are exact longs (integer counts,
    * integer tie groups; ANSI throws loudly at absurd magnitudes), so
    * z is one IEEE divide-and-sqrt chain on identical operands,
    * round-6 in any engine. Degenerate series (n < 2, or all values
    * tied → Var = 0) return null z, never NaN; S = 0 pins z = 0
    * exactly (the continuity correction moves TOWARD zero, never
    * across it).
    *
    * Scale shape: the corpus collapses MAP-SIDE to day grain; the
    * pairwise self-join (day² ≤ ~266k bounded-metadata rows — the
    * Theil–Sen contract), the tie histogram, and the 1-row assembly
    * never touch event grain.
    *
    * @return ONE row: (n, s, var18, z, significant).
    */
  def mannKendallDailyTrend(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.select(col(tsCol).cast("date").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val a = daily.select(col("d").as("da"), col("n").as("na"))
    val b = daily.select(col("d").as("db"), col("n").as("nb"))
    val s = a.join(b, col("da") < col("db"))
      .agg(coalesce(sum(signum(col("nb") - col("na")).cast("long")),
        lit(0L)).as("s"))
    val ties = daily.groupBy(col("n")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1) *
        (lit(2L) * col("t") + 5)), lit(0L)).as("tie18"))
    val cnt = daily.agg(count(lit(1)).as("n"))
    val var18 = col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
      col("tie18")
    val zNum = when(col("s") > 0, col("s") - 1)
      .when(col("s") < 0, col("s") + 1).otherwise(lit(0L))
    val z = round(zNum.cast("double") /
      sqrt(var18.cast("double") / 18.0), 6)
    cnt.crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .select(col("n"), col("s"), var18.as("var18"),
        when(col("n") >= 2 && var18 > 0, z).as("z"),
        when(col("n") >= 2 && var18 > 0, abs(z) > 1.96).as("significant"))
  }

  /** Theil–Sen robust trend of daily volume (Theil 1950 / Sen 1968 —
    * the median of all pairwise day-slopes; up to ~29% of days can be
    * wild outliers, a spike day that would drag a least-squares slope
    * barely moves this one): the robust-statistics companion to
    * [[ewmaDailyVolume]]'s trend-following and [[Expectations.volumeAnomalies]]'
    * z-scores.
    *
    * DETERMINISM: each pairwise slope stays an exact (Δn, Δdays) LONG
    * fraction; its double value divides identical operands in any
    * engine, the median is the LOWER median (rank ⌈m/2⌉ of m) under a
    * TOTAL order (value, then numerator, denominator, day pair — no
    * tie is left to the engine), and only the reported slope rounds.
    *
    * Scale shape: the corpus collapses map-side to DAY grain (the q125
    * contract — bounded metadata); the pairwise self-join and the
    * single-partition median window run on day² ≤ ~266k rows for two
    * years of days, never on event grain.
    *
    * @return ONE row: (n_pairs, slope_num, slope_den, slope) — slope in
    *         events/day, round-6; the exact fraction rides beside it.
    */
  def theilSenDailyTrend(events: DataFrame, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.select(col(tsCol).cast("date").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n"))
    val a = daily.select(col("d").as("da"), col("n").as("na"))
    val b = daily.select(col("d").as("db"), col("n").as("nb"))
    val pairs = a.join(b, col("da") < col("db"))
      .select(col("da"), col("db"), (col("nb") - col("na")).as("num"),
        datediff(col("db"), col("da")).cast("long").as("den"))
    val v = col("num").cast("double") / col("den").cast("double")
    val ranked = pairs.select(col("num"), col("den"), v.as("v"),
      row_number().over(Window.orderBy(v, col("num"), col("den"),
        col("da"), col("db"))).as("rn"),
      count(lit(1)).over(Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)).as("cnt"))
    // lower median rank ⌈m/2⌉ = ⌊(m+1)/2⌋ — Spark's `/` on longs is a
    // DOUBLE divide, so floor it back to an integer rank
    ranked.filter(col("rn") ===
        floor((col("cnt") + lit(1L)) / lit(2L)).cast("long"))
      .select(col("cnt").as("n_pairs"), col("num").as("slope_num"),
        col("den").as("slope_den"), round(col("v"), 6).as("slope"))
  }
}
