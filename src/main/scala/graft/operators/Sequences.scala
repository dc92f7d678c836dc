package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event-sequence matching — the funnel-analysis /
  * MATCH_RECOGNIZE surface: how far through an ordered step list
  * (e.g. click → view → purchase) each key's event stream progresses.
  */
object Sequences {

  /** Per-key funnel depth: the number of `steps` completed IN ORDER,
    * each at a STRICTLY later `tsCol` than the previous match (the
    * greedy first-match scan, which provably computes the same chain as
    * the correlated-min formulation `t1 = min ts of step1,
    * t2 = min ts of step2 with ts > t1, …` — the q104 oracle).
    *
    * Plan shape: events filter to the step set (the production knob that
    * bounds per-key state — irrelevant event types never enter the
    * arrays), collapse to one sorted (ts, step) array per key in a
    * single groupBy shuffle, and a codegen'd `aggregate()` fold advances
    * the depth cursor in one array pass — no per-step self-join, no
    * window over the full event stream, O(relevant events per key)
    * state. Keys with zero relevant events still report depth 0 via a
    * left join from the key projection (column-pruned second scan).
    *
    * Tie semantics: equal-`tsCol` events sort by step index, and a step
    * only matches strictly AFTER the previous match's timestamp — so two
    * steps cannot complete on one timestamp, matching the oracle's
    * `ts > prev` chain. `tsCol` must be an integral column
    * (`unix_micros(ts)`): comparing at the stored precision on both
    * engines is what keeps the strict inequalities identical.
    */
  def funnelDepth(events: DataFrame, keyCol: String, tsCol: String,
      stepCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"repeated step values are ambiguous: $steps")
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1): Column) {
      case (acc, (s, i)) => when(col(stepCol) === s, lit(i)).otherwise(acc)
    }
    val packed = events
      // filter on the RAW step column (not the derived index): Catalyst
      // pushes the In predicate to the scan (dictionary/row-group skip),
      // where `si >= 0` on the CASE projection would stay a post-scan
      // filter — the q94 derived-column lesson applied in reverse
      .filter(col(stepCol).isin(steps: _*))
      .select(col(keyCol).as("key"), col(tsCol).cast("long").as("ts"),
        stepIdx.as("si"))
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("ts"), col("si")))).as("evs"))
    val init = struct(lit(0).as("depth"), lit(Long.MinValue).as("last"))
    val folded = packed.select(col("key"),
      aggregate(col("evs"), init, (st, ev) =>
        when(ev.getField("si") === st.getField("depth") &&
          ev.getField("ts") > st.getField("last"),
          struct((st.getField("depth") + 1).as("depth"),
            ev.getField("ts").as("last")))
          .otherwise(st)).getField("depth").as("depth"))
    events.select(col(keyCol).as("key")).distinct()
      .join(folded, Seq("key"), "left_outer")
      .select(col("key").as(keyCol),
        coalesce(col("depth"), lit(0)).as("depth"))
  }

  /** First-order event-type transition matrix — the Markov-chain view
    * of user behavior (what follows what), the product-analytics staple
    * next to [[funnelDepth]] and sessionization. Per-user streams order
    * by `orderCols` (include a unique id as tie-break so the lag is
    * deterministic), adjacent pairs come from one `lead()` window, and
    * the output is (from_type, to_type, n, p) with `p` the
    * row-normalized transition probability (round-4; the normalizer is
    * an integer sum, so the ratio is engine-exact).
    *
    * Scale shape: ONE user-grain shuffle+sort for the sequence window —
    * inevitable for order semantics, the sessionize shape — then
    * everything is type²-grain (a bounded matrix); the normalizing
    * window runs over that matrix, not the event stream.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
      orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .withColumn("_to", lead(col(typeCol), 1).over(w))
      .filter(col("_to").isNotNull)
    val m = pairs.groupBy(col(typeCol).as("from_type"), col("_to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("p",
      round(col("n") / sum(col("n")).over(Window.partitionBy(col("from_type"))), 4))
  }

  /** Top-k opening event paths: each key's first `maxSteps` events (in
    * `orderCols` order — include a unique id as the final tiebreak so
    * the sequence is total) concatenated into a path string, ranked by
    * how many keys share it — the "what do users actually do first"
    * view that turns the [[transitionMatrix]]'s memoryless pairs into
    * whole observed trajectories. Keys with fewer than `maxSteps`
    * events contribute their full (shorter) path.
    *
    * Scale shape: ONE key-grain shuffle+sort for the per-key window
    * (the q27/q120 sessionize shape — unavoidable for order semantics),
    * a prefix filter that caps per-key state at `maxSteps` BEFORE the
    * path assembly, then path-grain count + TakeOrderedAndProject. The
    * path alphabet is type^maxSteps-bounded, so the final aggregate is
    * metadata-sized next to the events.
    *
    * @return (path, n_keys), top `k` by count (path string breaks ties).
    */
  def topPaths(events: DataFrame, keyCol: String, typeCol: String,
      orderCols: Seq[String], maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps >= 1 && k >= 1, s"need maxSteps/k >= 1: $maxSteps/$k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    events
      .select(col(keyCol).as("_k"), col(typeCol).as("_t"),
        row_number().over(w).as("_rn"))
      .filter(col("_rn") <= maxSteps)
      .groupBy(col("_k"))
      // collect_list is order-nondeterministic across partial merges; the
      // (rn, type) structs sort back into sequence order first
      .agg(concat_ws(" > ",
        expr("transform(array_sort(collect_list(struct(_rn, _t))), s -> s._t)"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_keys"))
      .orderBy(col("n_keys").desc, col("path"))
      .limit(k)
  }

  /** First- and last-touch conversion attribution — the standard
    * marketing-analytics credit assignment, run in-engine: each
    * conversion event credits (a) the nearest PRECEDING touch-channel
    * event and (b) the user's first touch, per user in (ts, tie)
    * order. Conversions with no preceding touch land in the explicit
    * `(none)` channel — unattributed credit is visible, never dropped
    * or reassigned.
    *
    * Determinism: both carries are `last/first(…, ignoreNulls)` over
    * the strict (ts, tieCol) order with an EXCLUSIVE upper frame bound
    * (a touch at the conversion's own timestamp attributes only if it
    * sorts strictly before it); ties break on the unique `tieCol`, so
    * an oracle replays the exact assignment. Conversion events
    * themselves are never touches (even if listed in `channels`).
    *
    * Scale shape: ONE shuffle by user (both window carries share the
    * same (user × order) window spec, so Spark plans a single sort +
    * exchange), then a channel-grain map-combined aggregate — no
    * self-joins, no per-conversion probing.
    *
    * @return one row per crediting channel (incl. "(none)"):
    *         (channel, last_touch_n, first_touch_n, value), where
    *         `value` is the round-2 sum of conversion values under
    *         LAST-touch credit.
    */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, convType: String,
      channels: Seq[String], valueCol: String): DataFrame = {
    require(channels.nonEmpty, "need at least one touch channel")
    import org.apache.spark.sql.expressions.Window
    val isTouch = col(typeCol).isin(channels: _*) &&
      col(typeCol) =!= convType
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val credited = events
      .withColumn("_last", last(when(isTouch, col(typeCol)), true).over(w))
      .withColumn("_first", first(when(isTouch, col(typeCol)), true).over(w))
      .filter(col(typeCol) === convType)
      .select(coalesce(col("_last"), lit("(none)")).as("last_ch"),
        coalesce(col("_first"), lit("(none)")).as("first_ch"),
        // sum CENTS, not doubles: a float sum is aggregation-order-
        // dependent; the integer sum is exact in any engine (q26 rule)
        round(col(valueCol) * 100).cast("long").as("_cents"))
    val lastC = credited.groupBy(col("last_ch").as("channel"))
      .agg(count(lit(1)).as("last_touch_n"),
        round(sum(col("_cents")).cast("double") / 100.0, 2).as("value"))
    val firstC = credited.groupBy(col("first_ch").as("channel"))
      .agg(count(lit(1)).as("first_touch_n"))
    // full outer: a channel can hold only first-touch or only
    // last-touch credit
    lastC.join(firstC, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("last_touch_n"), lit(0L)).as("last_touch_n"),
        coalesce(col("first_touch_n"), lit(0L)).as("first_touch_n"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .orderBy(col("channel"))
  }
}
