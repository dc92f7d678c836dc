package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the shared core of every "position in
  * a virtual concatenated stream" operator (shard packing, sequence
  * packing, global row numbering).
  *
  * A naive `sum(...).over(Window.orderBy(...))` with no partitionBy
  * collapses the whole dataset into ONE window task — the classic
  * global-window scale trap. This instead runs two levels:
  * range-partition by the order key, cumsum WITHIN each partition
  * (parallel windows), then add per-partition offsets computed by a
  * window over the partition-totals frame — which has one row per
  * partition, so its single-task window is metadata-sized at any data
  * scale. Equals the sequential cumsum over the global order exactly
  * (range partitions are order-contiguous).
  */
object Prefix {

  /** Appends `outCol` = the EXCLUSIVE prefix sum of `valCol` over the
    * global `orderCols` order (the sum of all strictly-preceding rows'
    * values; 0 for the first row). One range shuffle; `_pid`/`_cum`/
    * `_off`/`_v` are reserved working columns.
    *
    * Ties in `orderCols` get frame-order (ROWS, not RANGE) treatment:
    * tied rows receive distinct running positions in partition-internal
    * order — pass a unique tiebreaker column for run-to-run reproducible
    * assignments.
    */
  def exclusiveSum(
      df: DataFrame,
      orderCols: Seq[Column],
      valCol: Column,
      outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reserved = Seq("_pid", "_cum", "_off", "_v")
    require(!df.columns.exists(reserved.contains),
      s"Prefix.exclusiveSum reserves columns ${reserved.mkString(", ")}; " +
        "rename them first")
    val ranged = df.repartitionByRange(orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", valCol.cast("long"))
    val offsets = ranged.groupBy(col("_pid"))
      .agg(sum(col("_v")).as("_t"))
      .withColumn("_off",
        coalesce(sum(col("_t")).over(
          Window.orderBy(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    ranged
      // ROWS frame, not the default RANGE frame: RANGE treats orderCols
      // ties as peers and hands each the whole tie group's cumsum
      .withColumn("_cum",
        sum(col("_v")).over(
          Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn(outCol, col("_cum") + col("_off") - col("_v"))
      .drop("_pid", "_cum", "_off", "_v")
  }
}
