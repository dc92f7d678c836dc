package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Shared construction plumbing for the custom merge-join operators. */
private[plans] object PlanChecks {

  /** The merge execs retain evaluated key values across iterator steps, so
    * keys must eval to immutable boxed values — UTF8String/Binary buffers
    * are reused by Spark's row readers (e.g. after a sort spill) and would
    * silently corrupt the retained candidate key. Enforced at plan
    * construction, not left as a scaladoc caveat.
    */
  def requireImmutableKeyType(l: Expression, r: Expression, what: String): Unit = {
    def ok(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
          DoubleType | BooleanType | DateType | TimestampType |
          TimestampNTZType => true
      case _ => false
    }
    require(l.dataType == r.dataType,
      s"$what join keys must have matching types, got ${l.dataType} vs ${r.dataType}")
    require(ok(l.dataType),
      s"$what join keys must be numeric/boolean/date-time (immutable boxed " +
        s"values); got ${l.dataType} — hash strings to a long first")
  }
}

private[plans] object JoinBuild {

  /** Install `strategy` idempotently, re-alias the right side so
    * self-derived inputs can't collide on attribute ids, resolve the
    * named columns, and build the DataFrame from the constructed node.
    */
  def apply(
      left: DataFrame, right: DataFrame,
      by: (String, String), time: (String, String),
      strategy: org.apache.spark.sql.execution.SparkStrategy)(
      node: (LogicalPlan, LogicalPlan, Attribute, Attribute, Attribute, Attribute)
        => LogicalPlan): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy
    }
    val r2 = right.select(right.columns.map(c => right(c).as(c)).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"no column $n in ${p.output.map(_.name)}"))
    Bridge.ofRows(spark, node(lPlan, rPlan,
      attr(lPlan, by._1), attr(rPlan, by._2),
      attr(lPlan, time._1), attr(rPlan, time._2)))
  }
}
