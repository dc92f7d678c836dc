package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k best `(score, id)` pairs per
  * group — higher score wins, ties broken by smaller id — and emits them
  * best-first as `array<struct<score, id>>`.
  *
  * This is the scale-path replacement for the window-function top-k idiom
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`): a window
  * sorts and shuffles every scored row, while a partial-aggregable heap
  * reduces each map partition to ≤k rows per group before the exchange —
  * at 100 TB a |Q|×n scored cross product shrinks to |Q|×k before any
  * network movement. Same determinism contract as the window formulation
  * (round scores upstream; id tiebreak).
  */
object TopKAgg {

  private val pairOrd: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    /** Max element = WORST kept pair (lowest score, then largest id), so
      * the PriorityQueue head is the eviction candidate. */
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  case class TopKByScore(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

    require(k > 0, s"top_k_by k must be positive, got $k")

    // analysis-time validation (runs after resolution — an eager require
    // would throw on unresolved columns): update() casts eval results, so
    // reject wrong types before execution
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (score.dataType != DoubleType) {
        TypeCheckResult.TypeCheckFailure(
          s"top_k_by score must be DOUBLE, got ${score.dataType}")
      } else if (id.dataType != LongType) {
        TypeCheckResult.TypeCheckFailure(
          s"top_k_by id must be BIGINT, got ${id.dataType}")
      } else TypeCheckResult.TypeCheckSuccess
    }

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "top_k_by_score"

    override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty[(Double, Long)](pairOrd)

    private def offer(
        buf: mutable.PriorityQueue[(Double, Long)], p: (Double, Long)): Unit = {
      if (buf.size < k) buf.enqueue(p)
      else if (pairOrd.compare(p, buf.head) < 0) { buf.dequeue(); buf.enqueue(p) }
    }

    override def update(
        buf: mutable.PriorityQueue[(Double, Long)],
        input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
      }
      buf
    }

    override def merge(
        b1: mutable.PriorityQueue[(Double, Long)],
        b2: mutable.PriorityQueue[(Double, Long)])
        : mutable.PriorityQueue[(Double, Long)] = {
      b2.foreach(offer(b1, _))
      b1
    }

    override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
      val worstFirst = buf.dequeueAll // ordered by priority = worst first
      new GenericArrayData(worstFirst.reverseIterator.map { case (s, i) =>
        InternalRow(s, i)
      }.toArray[Any])
    }

    override def serialize(
        buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
      val items = buf.toArray
      val bb = java.nio.ByteBuffer.allocate(4 + 16 * items.length)
      bb.putInt(items.length)
      items.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
      bb.array()
    }

    override def deserialize(
        bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var j = 0
      while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKByScore =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): TopKByScore =
      copy(score = cs(0), id = cs(1))
  }

  /** Column surface: top-k `(score, id)` pairs per group, best-first. */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
