package graft.lineage

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Driver-side lineage capture for every successful query — the Spark
  * replacement for the reference's Hive post-exec hook
  * (`/root/reference/hivehook/.../hook/PostExecHook.scala:15-81`,
  * `ExecuteWithHookContext`): register once, receive every
  * `QueryExecution` after it finishes, extract lineage from metadata only.
  * Like the reference hook this runs single-threaded per callback on the
  * driver and never touches data, so overhead is a few plan traversals
  * (<ms) regardless of data scale.
  */
final class LineageListener extends QueryExecutionListener {

  private val buf = new ConcurrentLinkedQueue[(String, LineageReport)]()

  // per-callback extraction wall nanos, parallel to successful reports —
  // the evidence for BASELINE.md's "<50 ms per query" overhead pledge
  // (measured by LineageOverheadProbe; the callback runs on Spark's
  // listener-bus thread, so this is extraction COST, off the query's
  // critical path)
  private val overheadBuf = new ConcurrentLinkedQueue[java.lang.Long]()

  /** Wall nanos each successful extraction took, in callback order. */
  def overheadsNs: Seq[Long] = overheadBuf.asScala.map(_.longValue).toSeq

  /** Session-lifetime catalog accumulation across every observed query
    * (the reference keeps one implicit `Model` for the session and every
    * converted entity registers into it, `Model.scala:5-22`). */
  val registry = new MetadataRegistry

  def reports: Seq[(String, LineageReport)] = buf.asScala.toSeq

  /** Drain the per-query reports ONLY. The [[registry]] is
    * session-lifetime state by contract (the whole point of the reference
    * `Model` analog is to survive report draining), so periodic
    * `reports` + `clear()` consumers keep the accumulated session catalog.
    */
  def clear(): Unit = buf.clear()

  /** Full reset: reports AND the session-lifetime registry — for reusing
    * one listener across logically separate sessions (test fixtures).
    */
  def clearAll(): Unit = { buf.clear(); overheadBuf.clear(); registry.clear() }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    try {
      val t0 = System.nanoTime()
      val report = LineageExtractor.report(qe)
      buf.add(funcName -> report)
      registry.add(report)
      overheadBuf.add(System.nanoTime() - t0)
    } catch {
      case e: Throwable =>
        // lineage must never fail the query path
        System.err.println(s"[lineage] extraction failed for $funcName: ${e.getMessage}")
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}

object LineageListener {
  /** Register a fresh listener on the session and return it. */
  def install(spark: SparkSession): LineageListener = {
    val l = new LineageListener
    spark.listenerManager.register(l)
    l
  }
}
