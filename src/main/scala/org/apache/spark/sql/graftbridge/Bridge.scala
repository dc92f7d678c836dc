package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor (Column
  * is ColumnNode-backed for Connect); classic sessions expose the
  * conversion via `private[sql] ExpressionUtils`. This bridge lives in the
  * sql package namespace to lift that into our library — the standard
  * pattern for Catalyst-extending libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a raw LogicalPlan (classic sessions only) —
    * the entry point for custom logical operators like graft's AsOfJoin. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The cached RDDs backing a `localCheckpoint()`ed frame (the
    * `LogicalRDD` leaves of its plan). Iterative operators use this to
    * `unpersist` superseded checkpoints — the ContextCleaner would only
    * reclaim them after a driver GC, which a large-heap JVM may not run
    * for hours, so without explicit release every iteration pins block
    * sets in executor storage for the session's lifetime. */
  def checkpointRdds(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
}
