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
}
