package graft.functions

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
  *
  * The buffer is a hand-rolled binary heap over two parallel primitive
  * arrays — `TypedImperativeAggregate.update` runs once per input row
  * outside codegen, so the buffer op must be allocation-free: a
  * `PriorityQueue[(Double, Long)]` boxed a tuple per offer and compared
  * through an interpreted Ordering, which measurably dominated the ANN
  * benchmark profiles.
  */
object TopKAgg {

  /** Bounded "keep the k best" heap on parallel primitive arrays. The heap
    * is ordered by WORSENESS (root = lowest score, then largest id), so
    * the root is the eviction candidate and `offer` is O(log k) with zero
    * allocation. */
  final class TopKHeap(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** (s1,i1) ranks strictly worse than (s2,i2). Double.compare (not
      * primitive `<`) so NaN scores order deterministically (greatest,
      * like the SQL sort order) instead of making the kept set depend on
      * arrival order. */
    @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c < 0 || (c == 0 && i1 > i2)
    }

    def offer(s: Double, i: Long): Unit = {
      if (size < k) {
        var n = size
        size += 1
        // sift up: parents must be worse-or-equal than children
        while (n > 0 && worse(s, i, scores((n - 1) >> 1), ids((n - 1) >> 1))) {
          scores(n) = scores((n - 1) >> 1); ids(n) = ids((n - 1) >> 1)
          n = (n - 1) >> 1
        }
        scores(n) = s; ids(n) = i
      } else if (worse(scores(0), ids(0), s, i)) {
        // beats the current worst: replace the root, sift the hole down
        var n = 0
        var done = false
        while (!done) {
          val l = 2 * n + 1
          if (l >= size) done = true
          else {
            var c = l // the worse of the two children
            val r = l + 1
            if (r < size && worse(scores(r), ids(r), scores(l), ids(l))) c = r
            if (worse(scores(c), ids(c), s, i)) {
              scores(n) = scores(c); ids(n) = ids(c)
              n = c
            } else done = true
          }
        }
        scores(n) = s; ids(n) = i
      }
    }
  }

  case class TopKByScore(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopKHeap] {

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

    override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

    override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
      }
      buf
    }

    override def merge(b1: TopKHeap, b2: TopKHeap): TopKHeap = {
      var j = 0
      while (j < b2.size) { b1.offer(b2.scores(j), b2.ids(j)); j += 1 }
      b1
    }

    override def eval(buf: TopKHeap): Any = {
      // once per GROUP, not per row — sorting a k-sized copy is fine
      val idx = Array.range(0, buf.size).sortWith { (a, b) =>
        val c = java.lang.Double.compare(buf.scores(a), buf.scores(b))
        c > 0 || (c == 0 && buf.ids(a) < buf.ids(b))
      }
      new GenericArrayData(idx.map { j =>
        InternalRow(buf.scores(j), buf.ids(j)): Any
      })
    }

    override def serialize(buf: TopKHeap): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
      bb.putInt(buf.size)
      var j = 0
      while (j < buf.size) {
        bb.putDouble(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKHeap = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var j = 0
      while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
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
