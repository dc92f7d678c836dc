package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Native as-of join: for each left row, the single latest right row of
  * the same `by` key with `rightTime <= leftTime` (optionally within
  * `toleranceUs`). Inner semantics by default (unmatched left rows are
  * dropped); `outer = true` keeps them with an all-null right side
  * (pandas merge_asof LEFT OUTER).
  *
  * The reference has no such operator (SURVEY §2.6 absence list); the
  * union+window encoding (q32/q47) costs one union-wide shuffle + sort +
  * a running `last(ignoreNulls)` over BOTH streams interleaved. This
  * operator is the plan Spark would want at 100 TB: co-partition the two
  * sides on the key (two exchanges, each only its own columns), sort
  * within partitions, then a single forward merge scan — no interleaved
  * mega-column union, no window buffering, O(1) state per key.
  *
  * Wired Spark-first: logical [[AsOfJoin]] node → [[AsOfJoinStrategy]] →
  * [[AsOfJoinExec]], injectable via `SparkSessionExtensions` or
  * `spark.experimental.extraStrategies` (see [[AsOf.join]]).
  *
  * v1 constraints (checked at construction): time columns are LongType
  * (epoch micros — convert timestamps with `unix_micros`); the `by` keys
  * evaluate to immutable boxed values (any integral/floating/boolean
  * type — NOT strings, whose UTF8String buffers are reused).
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Expression,
    rightBy: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    outer: Boolean = false)
    extends BinaryNode {
  // left-outer semantics keep every left row; unmatched right columns are
  // null, so their attributes must be marked nullable
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoin = copy(left = l, right = r)
}

/** Planner strategy: one physical implementation, always applicable. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lb, rb, lt, rt, tol, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lb, rb, lt, rt, tol, outer) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on the `by` key and
  * sorted by (key, time); the merge keeps at most one buffered right row
  * (the current best candidate) per in-flight key.
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Expression,
    rightBy: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    outer: Boolean = false)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // exact, non-coalescible hash partitioning on BOTH sides (the same
  // guarantee streaming stateful operators use): zipPartitions alignment
  // must survive AQE — plain ClusteredDistribution would allow AQE to
  // coalesce the two shuffles into different partition ranges
  override def requiredChildDistribution: Seq[Distribution] =
    StatefulOpClusteredDistribution(Seq(leftBy), conf.numShufflePartitions) ::
      StatefulOpClusteredDistribution(Seq(rightBy), conf.numShufflePartitions) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftBy, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)) ::
      Seq(SortOrder(rightBy, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)) :: Nil

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be LongType epoch micros (use unix_micros)")
  PlanChecks.requireImmutableKeyType(leftBy, rightBy, "as-of")

  protected override def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output
    val rSchema = right.output
    val lByE = leftBy
    val rByE = rightBy
    val lTimeE = leftTime
    val rTimeE = rightTime
    val keyRead = KeyCodec.reader(leftBy.dataType)
    val tol = toleranceUs
    val outAttrs = output
    val isOuter = outer
    val rWidth = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // One fused iterator per partition — the flatMap formulation
      // allocated an Iterator per LEFT ROW (the dominant per-row cost once
      // extraction is codegen'd); here the whole merge is a single
      // hasNext/next state machine with zero per-row allocation on the
      // no-match path and one buffer copy per admitted right row.
      new Iterator[InternalRow] {
        // codegen'd [key, time] extraction — one projection call per input
        // row; the merge loop below then runs on primitive longs only (no
        // boxed eval, no interpreted Ordering)
        private val lExtract = UnsafeProjection.create(Seq(lByE, lTimeE), lSchema)
        private val rExtract = UnsafeProjection.create(Seq(rByE, rTimeE), rSchema)
        private val joined = new JoinedRow
        private val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        private val rBuf = rIt.buffered
        // tolerance as a primitive: candTime <= tL always holds, so the
        // MaxValue sentinel can't overflow the subtraction
        private val tolUs = tol.getOrElse(Long.MaxValue)

        // decoded (key, time) of the right head row, computed ONCE per
        // right row rather than re-evaluated against every left row
        private var headValid = false
        private var headKey = 0L
        private var headTime = 0L
        // rows with null key or null time never match (SQL comparison
        // semantics — a null timestamp must not unbox to epoch 0)
        private def loadHead(): Boolean = {
          while (!headValid && rBuf.hasNext) {
            val kt = rExtract(rBuf.head)
            if (kt.isNullAt(0) || kt.isNullAt(1)) rBuf.next()
            else {
              headKey = keyRead(kt, 0); headTime = kt.getLong(1); headValid = true
            }
          }
          headValid
        }

        private var candRow: InternalRow = null
        private var candTime = 0L
        private var candKey = 0L
        // next emitted row, or null when not yet computed; resultProj
        // reuses its buffer, which the SparkPlan row contract permits
        private var out: InternalRow = null

        // left-outer: unmatched left rows (including null key/time, per
        // SQL comparison semantics) join an all-null right side
        private val nullRight =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rWidth)

        private def advanceToMatch(): Unit = {
          while (out == null && lIt.hasNext) {
            val l = lIt.next()
            val kt = lExtract(l)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              val kL = keyRead(kt, 0)
              val tL = kt.getLong(1)
              // consume right rows that are "behind or at" (kL, tL)
              var advance = true
              while (advance && loadHead()) {
                if (headKey < kL) { rBuf.next(); headValid = false }
                else if (headKey == kL) {
                  if (headTime <= tL) {
                    candRow = rBuf.next().copy() // child iterators reuse rows
                    candTime = headTime
                    candKey = headKey
                    headValid = false
                  } else advance = false
                } else advance = false
              }
              if (candRow != null && candKey == kL && tL - candTime <= tolUs) {
                out = resultProj(joined(l, candRow))
              } else if (isOuter) {
                out = resultProj(joined(l, nullRight))
              }
            } else if (isOuter) {
              out = resultProj(joined(l, nullRight))
            }
          }
        }

        override def hasNext: Boolean = { advanceToMatch(); out != null }
        override def next(): InternalRow = {
          advanceToMatch()
          val r = out; out = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** DataFrame-level API. */
object AsOf {

  /** As-of join `left` to `right` on `by` equality with the latest
    * `rightTime <= leftTime` (within `toleranceUs` if set). The right side
    * is re-aliased internally so self-derived inputs can't collide on
    * attribute ids; columns must already have distinct names across the
    * two sides. `outer = true` gives pandas-merge_asof LEFT OUTER
    * semantics: unmatched left rows are kept with a null right side.
    */
  def join(
      left: DataFrame, right: DataFrame,
      by: (String, String), time: (String, String),
      toleranceUs: Option[Long] = None,
      outer: Boolean = false): DataFrame =
    JoinBuild(left, right, by, time) {
      case (lp, rp, lb, rb, lt, rt) =>
        AsOfJoin(lp, rp, lb, rb, lt, rt, toleranceUs, outer)
    }

  /** Column handle helper for tests. */
  def colOf(df: DataFrame, name: String): Column = df(name)
}
