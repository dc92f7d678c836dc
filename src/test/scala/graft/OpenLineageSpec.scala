package graft

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.lineage.LineageExtractor

/** OpenLineage RunEvent export: well-formed JSON, spec-shaped structure,
  * and column lineage that round-trips through the facet.
  */
class OpenLineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def event(): JValue = {
    val df = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
    val rep = LineageExtractor.report(df.queryExecution)
    JsonMethods.parse(rep.openLineageJson(
      jobNamespace = "graft-tests", jobName = "q_priority_qty",
      runId = "00000000-0000-0000-0000-000000000001",
      eventTime = "2026-01-01T00:00:00Z"))
  }

  test("emits a spec-shaped RunEvent with schema facets on inputs") {
    val ev = event()
    assert((ev \ "eventType") == JString("COMPLETE"))
    assert((ev \ "job" \ "name") == JString("q_priority_qty"))
    assert((ev \ "run" \ "runId") ==
      JString("00000000-0000-0000-0000-000000000001"))
    val JArray(ins) = (ev \ "inputs"): @unchecked
    assert(ins.size == 2)
    val schemaFieldNames = ins.flatMap { i =>
      val JArray(fs) = (i \ "facets" \ "schema" \ "fields"): @unchecked
      fs.map(f => (f \ "name").values.toString)
    }
    assert(schemaFieldNames.contains("l_quantity"))
    assert(schemaFieldNames.contains("o_orderpriority"))
    // every facet carries the spec-required provenance pair
    ins.foreach { i =>
      assert((i \ "facets" \ "schema" \ "_producer") != JNothing)
      assert((i \ "facets" \ "schema" \ "_schemaURL") != JNothing)
    }
  }

  test("export stays parseable across a representative query sweep") {
    // quotes/backslashes/newlines in expressions, view SQL, JSON-literal
    // queries — every rendered event must stay valid JSON
    val names = Seq("q01_scan_filter_project", "q19_multijoin_agg",
      "q50_json_extract", "q51_regexp_like", "q37_string_battery",
      "q80_volume_shipping", "d11_span_dedup", "t19_chunking")
    names.filter(SparkEntry.queries.contains).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      val rep = LineageExtractor.report(df.queryExecution)
      val ev = JsonMethods.parse(rep.openLineageJson(
        "graft-tests", n, "run-1", "2026-01-01T00:00:00Z"))
      assert((ev \ "job" \ "name") == JString(n))
      val JArray(ins) = (ev \ "inputs"): @unchecked
      assert(ins.nonEmpty, s"$n exported no inputs")
    }
  }

  test("streaming microbatches emit parented RunEvents (st01 pipeline)") {
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.{StreamLineageListener, StreamOps}
    val listener = StreamLineageListener.install(spark)
    try {
      val pipeline = StreamOps.hourlyCounts(StreamOps.readEvents(spark, sf))
      listener.trackPlan("ol_st01", pipeline)
      StreamOps.runToMemory(spark, pipeline, "ol_st01", OutputMode.Complete())
      // progress events arrive on the async listener bus
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (listener.openLineageEvents.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val evs = listener.openLineageEvents
      assert(evs.nonEmpty, "no OpenLineage events for the streaming query")
      evs.foreach { s =>
        val ev = JsonMethods.parse(s) // every event parses
        assert((ev \ "job" \ "name") == JString("ol_st01"))
        assert((ev \ "schemaURL").values.toString.endsWith("RunEvent"))
        // microbatch run is parented under the pipeline-level run, its id
        // is spec-valid UUID (Marquez-class backends reject non-UUID ids),
        // and it is the DETERMINISTIC name-based UUID of parent+batch
        val runId = (ev \ "run" \ "runId").values.toString
        val parentRun =
          (ev \ "run" \ "facets" \ "parent" \ "run" \ "runId").values.toString
        val parsedRun = java.util.UUID.fromString(runId) // throws if not UUID
        assert(parsedRun.version() == 3, s"run $runId not a name-based UUID")
        val JInt(batchId) =
          (ev \ "run" \ "facets" \ "microbatch" \ "batchId"): @unchecked
        assert((ev \ "run" \ "facets" \ "microbatch" \ "streamRunId") ==
          JString(parentRun))
        val expected = java.util.UUID.nameUUIDFromBytes(
          s"$parentRun:b$batchId".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        assert(runId == expected.toString,
          s"run $runId not derived from parent $parentRun batch $batchId")
        assert((ev \ "run" \ "facets" \ "parent" \ "job" \ "name") ==
          JString("ol_st01"))
        // the definition's column lineage rides each batch event
        val fields = ev \ "outputs" \\ "columnLineage" \ "fields"
        assert(fields != JNothing, "no columnLineage facet on the batch event")
      }
    } finally {
      listener.clear()
      spark.streams.removeListener(listener)
    }
  }

  test("column lineage rides the output dataset; collect gets a synthetic sink") {
    val ev = event()
    val JArray(outs) = (ev \ "outputs"): @unchecked
    assert(outs.size == 1)
    // no write sink in the plan -> synthetic <jobName>.result dataset
    assert((outs.head \ "name") == JString("q_priority_qty.result"))
    val fields = outs.head \ "facets" \ "columnLineage" \ "fields"
    val qtyIns = (fields \ "qty" \ "inputFields").asInstanceOf[JArray].arr
    assert(qtyIns.map(f => (f \ "field").values.toString) == List("l_quantity"))
    // input refs point at the same dataset identity the inputs section uses
    val JArray(ins) = (ev \ "inputs"): @unchecked
    val inNames = ins.map(i => (i \ "name").values.toString).toSet
    qtyIns.foreach(f => assert(inNames.contains((f \ "name").values.toString)))
  }
}
