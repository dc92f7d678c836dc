package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter sketch surface: a mergeable aggregate that builds a
  * filter over 64-bit key hashes, and a codegen'd membership probe.
  *
  * The 100 TB use is semi-join pruning (a hand-rolled runtime filter,
  * the pattern Spark's `spark.sql.optimizer.runtime.bloomFilter.*` rules
  * apply automatically when statistics permit): build the filter over a
  * SELECTIVE dimension's keys — constant-size state, map-side partials
  * OR-merge like any native aggregate — hand it to the probe as a
  * SCALAR SUBQUERY (`df.scalar()`; evaluated once, then a codegen
  * constant — NOT a broadcast-joined column, which would re-copy the
  * sketch bytes out of the UnsafeRow per fact row), and drop
  * non-matching fact rows AT THE SCAN, before they pay the
  * shuffle for the exact join. False positives only cost wasted
  * verification work; false negatives cannot happen, so composing the
  * probe with the exact join preserves semantics bit-for-bit (that is
  * what the q92 oracle checks).
  *
  * Both sides take an ALREADY-HASHED long key (`xxhash64(col)`): the
  * build and probe columns may have different names/nullability, and
  * hashing outside the sketch keeps both expressions type-agnostic and
  * inside whole-stage codegen.
  *
  * Sketch layout (self-describing, so the probe needs no parameters):
  * int numHashes, int numWords, then numWords big-endian longs of bits.
  * The reference has no sketch surface (SURVEY §2.6 absence list); this
  * extends the pipeline sketch family (CMS q82, HLL q29/q89, MinHash).
  */
object BloomExprs {

  /** Bit positions via Kirsch–Mitzenmacher double hashing: split the
    * 64-bit key hash into two 32-bit halves h1,h2; probe i uses
    * h1 + i*h2 mod numBits. Shared by build and probe — any asymmetry
    * would manufacture false negatives. */
  @inline private[functions] def bitPos(h: Long, i: Int, numBits: Int): Int = {
    val h1 = (h >>> 32).toInt
    val h2 = h.toInt
    java.lang.Math.floorMod(h1.toLong + i.toLong * h2.toLong, numBits.toLong).toInt
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Membership probe against serialized sketch bytes. No allocation:
    * header ints and the probed words are read straight off the array.
    * Called from generated code (static forwarder), so it must stay a
    * plain (bytes, long) => boolean. */
  def mightContain(bytes: Array[Byte], h: Long): Boolean = {
    val numHashes = readInt(bytes, 0)
    val numWords = readInt(bytes, 4)
    val numBits = numWords * 64
    var i = 0
    while (i < numHashes) {
      val pos = bitPos(h, i, numBits)
      val off = 8 + (pos >>> 6) * 8 + 7 - ((pos & 63) >>> 3)
      // bit `pos&63` of the big-endian long at word pos>>>6: byte
      // (7 - bitInWord/8) from the word start, bit bitInWord%8 within it
      if ((bytes(off) & (1 << ((pos & 63) & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** `bloom_agg(hash64 BIGINT, numBits, numHashes) -> BINARY`: mergeable
    * Bloom filter over the group's key hashes. numBits rounds up to a
    * multiple of 64. Size the filter at ~10 bits/key for ~1% FPP with
    * numHashes=5..7 (FPP ≈ (1-e^{-kn/m})^k). */
  case class BloomAgg(
      child: Expression,
      numBits: Int,
      numHashes: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

    require(numBits > 0 && numHashes > 0, "bloom_agg: numBits and numHashes must be positive")
    private val numWords = (numBits + 63) / 64
    private val bits = numWords * 64

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def prettyName: String = "bloom_agg"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_agg takes a 64-bit hash (xxhash64), got ${child.dataType}")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < numHashes) {
          val pos = bitPos(h, i, bits)
          buf(pos >>> 6) |= (1L << (pos & 63))
          i += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var j = 0
      while (j < numWords) { b1(j) |= b2(j); j += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = serialize(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 8 * numWords)
      bb.putInt(numHashes).putInt(numWords)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.getInt(); bb.getInt()
      Array.fill(numWords)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomAgg =
      copy(child = cs.head)
  }

  /** `bloom_might_contain(sketch BINARY, hash64 BIGINT) -> BOOLEAN`.
    * Codegen'd — the probe runs once per FACT row (the 100 TB side), so
    * it must stay inside the scan's WholeStageCodegen span. */
  case class BloomMightContain(left: Expression, right: Expression)
      extends BinaryExpression {

    override def prettyName: String = "bloom_might_contain"
    override def dataType: DataType = BooleanType

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain takes (BINARY sketch, BIGINT hash), got " +
          s"(${left.dataType}, ${right.dataType})")

    override def nullSafeEval(sketch: Any, hash: Any): Any =
      mightContain(sketch.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (sk, h) =>
        s"${ev.value} = graft.functions.BloomExprs.mightContain($sk, $h);")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BloomMightContain = copy(left = l, right = r)
  }

  // ------------------------------------------------------- Column surface

  def bloom_agg(hash64: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(BloomAgg(Bridge.expression(hash64), numBits, numHashes)
      .toAggregateExpression())

  def bloom_might_contain(sketch: Column, hash64: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(sketch), Bridge.expression(hash64)))
}
