package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.lineage.{LineageExtractor, LineageReport}

/** Streaming-side lineage (SURVEY §2.6 stretch): `QueryExecutionListener`
  * does not fire for streaming queries, so source→sink lineage is captured
  * per progress event via `StreamingQueryListener` — the streaming analog
  * of the reference's post-exec hook. Combine with
  * `LineageExtractor.fromLogical(df.queryExecution.analyzed)` on the
  * pre-start DataFrame for the full operator graph of the pipeline
  * definition.
  *
  * OpenLineage: register the pipeline definition with [[trackPlan]] before
  * starting the query, and every microbatch progress event renders a
  * RunEvent — the microbatch is the run, parented (ParentRunFacet) under
  * the pipeline-level run (`progress.runId`, one per `start()`), so an
  * OpenLineage consumer sees one job with a run per batch instead of an
  * unrelated event soup.
  */
final class StreamLineageListener extends StreamingQueryListener {

  /** (query name, source descriptions, sink description, batch id). */
  final case class StreamLineage(
      name: String, sources: Seq[String], sink: String, batchId: Long)

  private val buf = new ConcurrentLinkedQueue[StreamLineage]()
  private val events = new ConcurrentLinkedQueue[String]()
  private val plans = TrieMap.empty[String, LineageReport]

  def lineages: Seq[StreamLineage] = buf.asScala.toSeq

  /** OpenLineage RunEvents rendered so far (one JSON document each, in
    * batch order per query). */
  def openLineageEvents: Seq[String] = events.asScala.toSeq

  def clear(): Unit = { buf.clear(); events.clear(); plans.clear() }

  /** Register the PRE-START pipeline definition under the query name that
    * will be passed to `writeStream.queryName(...)`: column lineage and
    * input metadata come from the definition's ANALYZED plan (a streaming
    * plan refuses batch optimization; the per-batch incremental plans
    * rewire sources but keep the dataflow), while run identity comes from
    * the progress events.
    */
  def trackPlan(name: String, df: DataFrame): Unit =
    plans.put(name, LineageExtractor.reportStreamingDefinition(df))

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    buf.add(StreamLineage(
      name,
      p.sources.toSeq.map(_.description),
      p.sink.description,
      p.batchId))
    plans.get(name).foreach { rep =>
      // run.runId must be UUID-format (spec-strict backends like Marquez
      // reject anything else), so the per-batch run identity is a
      // DETERMINISTIC name-based UUID (RFC 4122 v3) over the stream's
      // runId + batch number; the human-readable batch linkage rides in a
      // microbatch run facet instead of the id
      val batchRunId = java.util.UUID.nameUUIDFromBytes(
        s"${p.runId}:b${p.batchId}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val batchFacet =
        s""""microbatch":{"_producer":"urn:graft:spark-lineage",""" +
          s""""_schemaURL":"https://openlineage.io/spec/2-0-2/OpenLineage.json#/$$defs/RunFacet",""" +
          s""""batchId":${p.batchId},"streamRunId":"${p.runId}"}"""
      try events.add(rep.openLineageJson(
        jobNamespace = "graft-streams",
        jobName = name,
        runId = batchRunId.toString,
        eventTime = p.timestamp,
        parent = Some((p.runId.toString, "graft-streams", name)),
        extraRunFacets = Seq(batchFacet)))
      catch {
        case ex: Throwable =>
          // lineage must never fail the stream
          System.err.println(
            s"[stream-lineage] OpenLineage render failed for $name: ${ex.getMessage}")
      }
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object StreamLineageListener {
  def install(spark: SparkSession): StreamLineageListener = {
    val l = new StreamLineageListener
    spark.streams.addListener(l)
    l
  }
}
