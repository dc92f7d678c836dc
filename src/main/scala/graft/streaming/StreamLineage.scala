package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-side lineage (SURVEY §2.6 stretch): `QueryExecutionListener`
  * does not fire for streaming queries, so source→sink lineage is captured
  * per progress event via `StreamingQueryListener` — the streaming analog
  * of the reference's post-exec hook. Combine with
  * `LineageExtractor.fromLogical(df.queryExecution.analyzed)` on the
  * pre-start DataFrame for the full operator graph of the pipeline
  * definition.
  */
final class StreamLineageListener extends StreamingQueryListener {

  /** (query name, source descriptions, sink description, batch id). */
  final case class StreamLineage(
      name: String, sources: Seq[String], sink: String, batchId: Long)

  private val buf = new ConcurrentLinkedQueue[StreamLineage]()

  def lineages: Seq[StreamLineage] = buf.asScala.toSeq

  def clear(): Unit = buf.clear()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.add(StreamLineage(
      Option(p.name).getOrElse(p.id.toString),
      p.sources.toSeq.map(_.description),
      p.sink.description,
      p.batchId))
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
