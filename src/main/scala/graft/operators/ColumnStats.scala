package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style per-column statistics profiles — the (rows, nulls, ndv,
  * min, max) vector a catalog or cost-based optimizer keeps per column
  * (the q97/q98 gates; [[CatalogStats]] feeds the same numbers into
  * Catalyst's CBO via `ANALYZE TABLE`).
  *
  * Two profiles, one output contract
  * `(col_name, n_rows, n_null, ndv, min_v, max_v)`:
  *
  *  - [[exactProfile]]: exact ndv via `countDistinct`. Correct at any
  *    scale but NOT count-class cost — Catalyst's
  *    RewriteDistinctAggregates expands every scanned row once per
  *    distinct aggregate (4 columns = 4× the rows) and shuffles the
  *    distinct values at corpus grain. This is the oracle/audit variant.
  *  - [[approxProfile]]: ndv via `approx_count_distinct` (HLL++, seedless
  *    and deterministic on fixed data). Every aggregate is a plain
  *    declarative one, so the plan is the one-pass shape ANALYZE needs at
  *    100 TB: map-side partials, NO Expand, one scan, one
  *    SinglePartition collapse carrying a fixed-width row per partition
  *    (ScaleSpec pins exactly that). Estimation error is bounded by
  *    `rsd` (default 1%); the q98 gate checks the estimate lands within
  *    5% of exact.
  *
  * Both unpivot the single wide aggregation row with `stack()` — ONE
  * evaluation of the aggregate; a per-column select-union would re-run
  * the whole aggregation per column.
  */
object ColumnStats {

  private def profile(
      df: DataFrame, cols: Seq[String], ndv: String => org.apache.spark.sql.Column)
      : DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        sum(col(c).isNull.cast("long")).as(s"null_$c"),
        ndv(c).as(s"ndv_$c"),
        round(min(col(c)).cast("double"), 2).as(s"min_$c"),
        round(max(col(c)).cast("double"), 2).as(s"max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', n_$c, null_$c, ndv_$c, min_$c, max_$c")
      .mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackArgs) " +
      "AS (col_name, n_rows, n_null, ndv, min_v, max_v)")
  }

  /** Exact-ndv profile — see the class doc for the Expand cost caveat. */
  def exactProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, c => countDistinct(col(c)))

  /** Approx-ndv profile: the 100 TB ANALYZE plan (no Expand, one scan). */
  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.01)
      : DataFrame =
    profile(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Gini concentration coefficient of a non-negative integer measure
    * (Gini 1912, the rank-weighted form
    * `G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)` over ascending ranks) —
    * the how-concentrated-is-the-mass diagnostic a curation pipeline
    * runs on token counts per document or source ("do 1% of docs hold
    * half the tokens?") next to [[graft.operators.TextOps.zipfFit]]'s
    * frequency-shape check. 0 = perfectly even, →1 = one row holds
    * everything.
    *
    * ENGINE-EXACT, HISTOGRAM-GRAIN: ties make the rank sum
    * order-invariant (equal values commute), so G computes from the
    * VALUE histogram — for each distinct v with count c after C prior
    * rows, `Σ i·x` gains `v·(c·C + c(c+1)/2)`, an exact long. The
    * num/den pair is exact; `gini` is ONE round-6 IEEE division. ANSI
    * throws loudly if Σ i·x approaches 2⁶³ (n·total ≲ 9e18 — bucket
    * the measure first at that scale). Negative values are rejected
    * (Gini is undefined there); an empty or all-zero input returns
    * null, never NaN.
    *
    * Scale shape: one map-combined value-grain count, a
    * single-partition cumulative window over DISTINCT values (bounded
    * when the measure is quantized — the KS caveat), one 1-row
    * assembly. Row grain never shuffles past the histogram.
    *
    * @return ONE row: (n, total, gini_num, gini_den, gini).
    */
  def gini(df: DataFrame, valueCol: org.apache.spark.sql.Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df.select(valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPrior = hist.select(col("v"), col("c"),
      coalesce(sum(col("c")).over(wCum), lit(0L)).as("cp"))
    // empty input: explicit zero counts (null sums would poison the
    // output row), gini itself null below
    val agg = withPrior.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(col("v") * col("c")), lit(0L)).as("total"),
      // block rank sum c·C + c(c+1)/2 — the half via shiftright (c(c+1)
      // is always even; a long `/` in Spark is a DOUBLE divide)
      coalesce(sum(col("v") * (col("c") * col("cp") +
        shiftright(col("c") * (col("c") + 1), 1))), lit(0L)).as("rank_mass"),
      coalesce(min(col("v")), lit(0L)).as("min_v"))
    agg.select(col("n"), col("total"),
      (lit(2L) * col("rank_mass") - (col("n") + 1) * col("total"))
        .as("gini_num"),
      (col("n") * col("total")).as("gini_den"),
      when(col("min_v") < 0, raise_error(lit(
        "gini: negative values are undefined; shift or filter first")))
        .otherwise(when(col("n") > 0 && col("total") > 0,
          round((lit(2L) * col("rank_mass") - (col("n") + 1) * col("total"))
            .cast("double") /
            (col("n") * col("total")).cast("double"), 6))).as("gini"))
  }
}
