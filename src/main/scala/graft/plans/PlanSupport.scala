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

/** Order-preserving primitive encoding of merge-join keys.
  *
  * The merge execs compare keys once per input row; evaluating the key
  * expression interpretively returns a boxed value and compares through an
  * interpreted `Ordering` — measurable per-row cost at 100 TB row counts.
  * Instead the execs extract `[key, time]` through a codegen'd
  * `UnsafeProjection` and read the key as a primitive long whose natural
  * order equals the column's SQL sort order, so the whole merge loop is
  * box-free.
  */
private[plans] object KeyCodec {
  import org.apache.spark.sql.catalyst.InternalRow

  /** Reader from field `ord` of a projected row to an order-preserving
    * long. Only called for the fixed-width types PlanChecks admits. */
  def reader(t: DataType): (InternalRow, Int) => Long = t match {
    case ByteType                 => (r, i) => r.getByte(i).toLong
    case ShortType                => (r, i) => r.getShort(i).toLong
    case IntegerType | DateType   => (r, i) => r.getInt(i).toLong
    case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
    case BooleanType              => (r, i) => if (r.getBoolean(i)) 1L else 0L
    case FloatType                => (r, i) => sortableBits(r.getFloat(i).toDouble)
    case DoubleType               => (r, i) => sortableBits(r.getDouble(i))
    case other => throw new IllegalStateException(s"unsupported key type $other")
  }

  /** IEEE double → long whose signed order matches Spark's SQL ordering
    * (`SQLOrderingUtil`): -0.0 == 0.0, NaN greater than everything. */
  def sortableBits(d: Double): Long = {
    val n = if (d == 0.0) 0.0 else d // normalize -0.0: SQL sorts it equal
    val b = java.lang.Double.doubleToLongBits(n) // canonical NaN > +Inf
    b ^ ((b >> 63) & Long.MaxValue)
  }
}

/** Session wiring for graft's custom planner strategies.
  *
  * The idiomatic install is at session build:
  * {{{ .config("spark.sql.extensions", "graft.plans.GraftExtensions") }}}
  * For sessions built without it, [[GraftStrategies.install]] is a
  * synchronized, idempotent fallback invoked lazily by the DataFrame
  * APIs — installing ALL graft strategies in one shot so repeated join
  * construction never races a read-check-append on
  * `experimental.extraStrategies` (which is plain mutable session state).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
  }
}

object GraftStrategies {
  private val all: Seq[org.apache.spark.sql.execution.SparkStrategy] =
    Seq(AsOfJoinStrategy, IntervalJoinStrategy)

  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    // planner.strategies already folds in BOTH the extension-injected
    // strategies and extraStrategies — checking it (not just
    // extraStrategies) keeps sessions built with graft.GraftExtensions
    // from consulting every strategy twice per plan node
    val have = spark.sessionState.planner.strategies
    val missing = all.filterNot(have.contains)
    if (missing.nonEmpty) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies ++ missing
    }
  }
}

private[plans] object JoinBuild {

  /** Ensure the graft strategies are installed, re-alias the right side so
    * self-derived inputs can't collide on attribute ids, resolve the
    * named columns, and build the DataFrame from the constructed node.
    */
  def apply(
      left: DataFrame, right: DataFrame,
      by: (String, String), time: (String, String))(
      node: (LogicalPlan, LogicalPlan, Attribute, Attribute, Attribute, Attribute)
        => LogicalPlan): DataFrame = {
    val spark = left.sparkSession
    GraftStrategies.install(spark)
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
