package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  Distribution, Partitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
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
    windowUs: Long,
    outer: Boolean = false)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): IntervalJoin = copy(left = l, right = r)
}

object IntervalJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lb, rb, lt, rt, w, outer) =>
      IntervalJoinExec(planLater(l), planLater(r), lb, rb, lt, rt, w, outer) :: Nil
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
    windowUs: Long,
    outer: Boolean = false)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true))
                    else right.output)
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
    val lSchema = left.output
    val rSchema = right.output
    val lByE = leftBy
    val rByE = rightBy
    val lTimeE = leftTime
    val rTimeE = rightTime
    val keyRead = KeyCodec.reader(leftBy.dataType)
    val win = windowUs
    val outAttrs = output
    val isOuter = outer
    val rWidth = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // One fused iterator per partition: the flatMap formulation
      // allocated an Iterator + a boxed (Long, InternalRow) tuple per
      // buffered row per left row; here the window is a primitive-long
      // ring buffer with a parallel row array, and emission indexes into
      // it directly — zero allocation per emitted pair.
      new Iterator[InternalRow] {
        // codegen'd [key, time] extraction; primitive-long merge loop —
        // see AsOfJoinExec for the rationale
        private val lExtract = UnsafeProjection.create(Seq(lByE, lTimeE), lSchema)
        private val rExtract = UnsafeProjection.create(Seq(rByE, rTimeE), rSchema)
        private val joined = new JoinedRow
        private val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        private val rBuf = rIt.buffered

        // ring buffer of right rows for the current key, time-ascending;
        // capacity tracks peak in-window density, never shrinks
        private var bufTimes = new Array[Long](16)
        private var bufRows = new Array[InternalRow](16)
        private var bufStart = 0
        private var bufLen = 0
        private var bufValid = false
        private var bufKey = 0L
        private def bufClear(): Unit = {
          java.util.Arrays.fill(bufRows.asInstanceOf[Array[AnyRef]], null)
          bufStart = 0; bufLen = 0
        }
        private def bufAdd(t: Long, r: InternalRow): Unit = {
          if (bufLen == bufTimes.length) {
            val nt = new Array[Long](bufLen * 2)
            val nr = new Array[InternalRow](bufLen * 2)
            var i = 0
            while (i < bufLen) {
              val s = (bufStart + i) % bufLen
              nt(i) = bufTimes(s); nr(i) = bufRows(s); i += 1
            }
            bufTimes = nt; bufRows = nr; bufStart = 0
          }
          val idx = (bufStart + bufLen) % bufTimes.length
          bufTimes(idx) = t; bufRows(idx) = r; bufLen += 1
        }
        private def bufDropFirst(): Unit = {
          bufRows(bufStart) = null
          bufStart = (bufStart + 1) % bufTimes.length
          bufLen -= 1
        }

        // decoded (key, time) of the right head row, computed once per
        // right row; null key/time rows never match (SQL comparison
        // semantics — a null timestamp must not unbox to epoch 0)
        private var headValid = false
        private var headKey = 0L
        private var headTime = 0L
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

        // current left row being emitted against the window (null =
        // needs a new left row) and the next window slot to emit
        private var curL: InternalRow = null
        private var emitIdx = 0
        private var out: InternalRow = null

        // left-outer: unmatched left rows (including null key/time, per
        // SQL comparison semantics) join an all-null right side
        private val nullRight =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rWidth)

        private def advance(): Unit = {
          while (out == null) {
            if (curL != null && emitIdx < bufLen) {
              out = resultProj(
                joined(curL, bufRows((bufStart + emitIdx) % bufTimes.length)))
              emitIdx += 1
            } else if (lIt.hasNext) {
              curL = null
              val l = lIt.next()
              val kt = lExtract(l)
              if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
                val kL = keyRead(kt, 0)
                val tL = kt.getLong(1)
                if (!bufValid || bufKey != kL) {
                  bufClear() // new key: previous key's rows can never match
                  bufKey = kL
                  bufValid = true
                }
                // admit right rows of this key with rt <= tL; discard
                // earlier keys
                var advanceR = true
                while (advanceR && loadHead()) {
                  if (headKey < kL) { rBuf.next(); headValid = false }
                  else if (headKey == kL) {
                    if (headTime <= tL) {
                      bufAdd(headTime, rBuf.next().copy())
                      headValid = false
                    } else advanceR = false
                  } else advanceR = false
                }
                // evict rows older than the window start
                while (bufLen > 0 && bufTimes(bufStart) < tL - win) bufDropFirst()
                // `l` stays live until its matches are drained; the child
                // only reuses the buffer on the NEXT lIt.next(), which
                // happens after emitIdx reaches bufLen
                if (bufLen > 0) { curL = l; emitIdx = 0 }
                else if (isOuter) out = resultProj(joined(l, nullRight))
              } else if (isOuter) {
                out = resultProj(joined(l, nullRight))
              }
            } else return
          }
        }

        override def hasNext: Boolean = { advance(); out != null }
        override def next(): InternalRow = {
          advance()
          val r = out; out = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): IntervalJoinExec = copy(left = l, right = r)
}

/** DataFrame-level API (see [[AsOf.join]] for the shared conventions;
  * `outer = true` keeps match-less left rows with a null right side). */
object Interval {
  def join(
      left: DataFrame, right: DataFrame,
      by: (String, String), time: (String, String),
      windowUs: Long,
      outer: Boolean = false): DataFrame =
    JoinBuild(left, right, by, time) {
      case (lp, rp, lb, rb, lt, rt) =>
        IntervalJoin(lp, rp, lb, rb, lt, rt, windowUs, outer)
    }
}
