package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("streaming hourly counts equal the batch aggregation") {
    val stream = SparkEntry.queries("st01_stream_hourly")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Tables(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("stateful sessionization equals the batch window-function formulation") {
    val stream = SparkEntry.queries("st02_stream_sessions")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q27_sessionize")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("watermark + append mode emits only closed windows") {
    val agg = StreamOps.hourlyCounts(StreamOps.readEvents(spark, sf))
    val appended = StreamOps.runToMemory(spark, agg, "wm_out", OutputMode.Append())
    val complete = spark.table("st01_out")
    // append emits windows the watermark has passed; must be a subset
    val a = appended.select(col("window"), col("event_type"), col("n")).collect().map(_.toSeq).toSet
    val c = complete.select(col("window"), col("event_type"), col("n")).collect().map(_.toSeq).toSet
    assert(a.subsetOf(c))
  }

  test("streaming lineage listener captures source and sink per batch") {
    val l = graft.streaming.StreamLineageListener.install(spark)
    try {
      SparkEntry.queries("st01_stream_hourly")(spark, sf).collect()
      val deadline = System.currentTimeMillis() + 10000
      while (l.lineages.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val lin = l.lineages
      assert(lin.nonEmpty)
      assert(lin.exists(_.sources.exists(_.contains("FileStreamSource"))), lin)
      assert(lin.exists(_.sink.contains("Memory")), lin)
    } finally spark.streams.removeListener(l)
  }

  test("streaming lineage: plan definition exposes the streaming source") {
    val df = StreamOps.hourlyCounts(StreamOps.readEvents(spark, sf))
    val g = graft.lineage.LineageExtractor.fromLogical(df.queryExecution.analyzed)
    assert(g.treeString.contains("Aggregate"))
    assert(g.collect { case n => n.kind }.nonEmpty)
  }
}
