package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Query side of Spark's count-min sketch: the built-in
  * `count_min_sketch(col, eps, conf, seed)` aggregate produces a serialized
  * sketch, but Spark ships no SQL-level way to READ it — estimates require
  * driver code. [[CmsEstimate]] closes that gap as an expression, so
  * heavy-hitter checks stay inside the plan: build the sketch once (one
  * shuffle of W×D counters, constant size regardless of input rows),
  * broadcast the single sketch row against the probe keys, estimate
  * per key. The sketch family complement to HLL (q29) and MinHashSetAgg.
  *
  * The reference has no sketch surface (SURVEY §2.6 absence list); this is
  * part of the large-scale-pipeline extension set.
  */
object SketchExprs {

  /** One-slot sketch-deserialization cache shared by [[CmsEstimate]]'s
    * interpreted AND codegen paths (one instance per expression
    * instance, shipped to executors through the codegen references
    * array / expression serialization). Content-compared, NOT
    * reference-compared: UnsafeRow.getBinary copies into a fresh array
    * per access, so `eq` would never hit; Arrays.equals is a memcmp —
    * orders of magnitude cheaper than re-parsing the sketch per probe
    * row. NOT thread-safe across rows of different sketches in one
    * task, but a task evaluates one partition sequentially and the
    * cache is per-task after serialization. */
  final class CmsCache extends Serializable {
    @transient private var cachedBytes: Array[Byte] = _
    @transient private var cachedSketch: CountMinSketch = _
    def estimate(bytes: Array[Byte], item: Long): Long = {
      if (cachedBytes == null || !java.util.Arrays.equals(bytes, cachedBytes)) {
        cachedSketch = CountMinSketch.readFrom(bytes)
        cachedBytes = bytes
      }
      cachedSketch.estimateCount(java.lang.Long.valueOf(item))
    }
  }

  /** `cms_estimate(sketch BINARY, item BIGINT) -> BIGINT` — the sketch's
    * estimated count of `item`. Guarantees (per CMS): estimate >= true
    * count, and <= true + eps*N with probability >= confidence.
    *
    * Deserialization is cached per (identical) sketch byte array
    * ([[CmsCache]]), so probing many keys against one broadcast sketch
    * parses it once per task rather than once per row. Codegen'd like
    * the array kernels (round 18 — this was the repo's last
    * CodegenFallback; probe-side rows are few by construction, so this
    * is a consistency close-out, not a perf fix): both paths call the
    * SAME holder, so results and caching behavior are identical. */
  case class CmsEstimate(left: Expression, right: Expression)
      extends BinaryExpression {

    override def prettyName: String = "cms_estimate"
    override def dataType: DataType = LongType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      if (left.dataType != BinaryType) {
        TypeCheckResult.TypeCheckFailure(
          s"cms_estimate sketch must be BINARY, got ${left.dataType}")
      } else if (right.dataType != LongType) {
        TypeCheckResult.TypeCheckFailure(
          s"cms_estimate item must be BIGINT, got ${right.dataType}")
      } else TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val cache = new CmsCache

    override def nullSafeEval(sketchBytes: Any, item: Any): Any =
      cache.estimate(sketchBytes.asInstanceOf[Array[Byte]],
        item.asInstanceOf[Long])

    override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions
          .codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      // the holder rides the references array — a fresh one per
      // generated plan, matching the interpreted path's per-instance
      // cache lifetime
      val holder = ctx.addReferenceObj("cmsCache", new CmsCache,
        classOf[CmsCache].getName)
      nullSafeCodeGen(ctx, ev, (s, i) =>
        s"${ev.value} = $holder.estimate($s, $i);")
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
  }

  def cms_estimate(sketch: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch), Bridge.expression(item)))
}
