package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Native interval join: all (left, right) pairs of the same `by` key with
  * `leftTime - windowUs <= rightTime <= leftTime` — the batch analog of a
  * watermarked stream-stream interval join (st03), and the dense-output
  * sibling of [[AsOfJoin]] (which keeps only the latest match).
  *
  * A generic theta-join plans this as key-equi join + post-filter, which
  * materializes every same-key pair before filtering — quadratic in hot
  * keys. This operator co-partitions on the key, sorts by (key, time), and
  * slides a bounded buffer of right rows over the left stream: each left
  * row emits exactly its in-window matches, and each right row enters and
  * leaves the buffer once. At 100 TB: two exchanges, no same-key blowup,
  * buffer bounded by window density.
  *
  * Same v1 constraints as [[AsOfJoin]]: LongType micro timestamps,
  * immutable-boxed key types.
  */
final case class IntervalJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Expression,
    rightBy: Expression,
    leftTime: Expression,
    rightTime: Expression,
    windowUs: Long)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): IntervalJoin = copy(left = l, right = r)
}

object IntervalJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lb, rb, lt, rt, w) =>
      IntervalJoinExec(planLater(l), planLater(r), lb, rb, lt, rt, w) :: Nil
    case _ => Nil
  }
}

final case class IntervalJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Expression,
    rightBy: Expression,
    leftTime: Expression,
    rightTime: Expression,
    windowUs: Long)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // exact, non-coalescible partitioning — see AsOfJoinExec for rationale
  override def requiredChildDistribution: Seq[Distribution] =
    StatefulOpClusteredDistribution(Seq(leftBy), conf.numShufflePartitions) ::
      StatefulOpClusteredDistribution(Seq(rightBy), conf.numShufflePartitions) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightBy, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "interval-join time columns must be LongType epoch micros")
  PlanChecks.requireImmutableKeyType(leftBy, rightBy, "interval")

  protected override def doExecute(): RDD[InternalRow] = {
    val lByB = BindReferences.bindReference(leftBy, left.output)
    val rByB = BindReferences.bindReference(rightBy, right.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftBy.dataType)
    val win = windowUs
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIt.buffered
      // buffered right rows of the current key, (time, row), time-ascending
      val window = new java.util.ArrayDeque[(Long, InternalRow)]()
      var bufKey: Any = null

      lIt.flatMap { l =>
        val kL = lByB.eval(l)
        val tL = lTimeB.eval(l).asInstanceOf[Long]
        if (kL == null) Iterator.empty // SQL equi-join semantics: drop nulls
        else {
          if (bufKey == null || keyOrd.compare(bufKey, kL) != 0) {
            window.clear() // new key: previous key's rows can never match
            bufKey = kL
          }
          // admit right rows with rt <= tL of this key; discard earlier
          // keys and null keys (never match)
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rByB.eval(r)
            if (rk == null) { rBuf.next() }
            else {
              val c = keyOrd.compare(rk, kL)
              if (c < 0) { rBuf.next() }
              else if (c == 0) {
                val rt = rTimeB.eval(r).asInstanceOf[Long]
                if (rt <= tL) { window.addLast((rt, r.copy())); rBuf.next() }
                else advance = false
              } else advance = false
            }
          }
          // evict rows older than the window start
          while (!window.isEmpty && window.peekFirst()._1 < tL - win) {
            window.removeFirst()
          }
          // lazy: Iterator.flatMap drains this before advancing `l`, and the
          // SparkPlan row contract permits reusing the projection buffer
          import scala.jdk.CollectionConverters._
          window.iterator().asScala.map { case (_, r) => resultProj(joined(l, r)) }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): IntervalJoinExec = copy(left = l, right = r)
}

/** DataFrame-level API (see [[AsOf.join]] for the shared conventions). */
object Interval {
  def join(
      left: DataFrame, right: DataFrame,
      by: (String, String), time: (String, String),
      windowUs: Long): DataFrame =
    JoinBuild(left, right, by, time, IntervalJoinStrategy) {
      case (lp, rp, lb, rb, lt, rt) => IntervalJoin(lp, rp, lb, rb, lt, rt, windowUs)
    }
}
