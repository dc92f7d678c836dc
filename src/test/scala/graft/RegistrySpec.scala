package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lineage._

/** Session metadata registry semantics (reference `Model`:
  * `/root/reference/core/.../metadata/Model.scala:5-22` — FQN-keyed map;
  * lastAccessTime-aware reuse `ConvertHelper.scala:58,121`; partition
  * accumulation `TableDef.scala:25-32`).
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def meta(last: Long, cols: Seq[String], parts: Seq[String] = Nil) =
    TableMeta(name = "t", path = "/data/t", columns = cols,
      format = "parquet", lastAccessTime = last, partitions = parts)

  test("newest lastAccessTime wins the scalar metadata") {
    val reg = new MetadataRegistry
    reg.add(meta(100L, Seq("a", "b")))
    reg.add(meta(50L, Seq("a"))) // stale observation arrives late
    assert(reg.size == 1)
    assert(reg.table("/data/t").get.columns == Seq("a", "b"))
    reg.add(meta(200L, Seq("a", "b", "c"))) // fresher replaces
    assert(reg.table("/data/t").get.columns == Seq("a", "b", "c"))
    assert(reg.table("/data/t").get.lastAccessTime == 200L)
  }

  test("tie (path-based -1/-1) goes to the latest observation") {
    val reg = new MetadataRegistry
    reg.add(meta(-1L, Seq("a")))
    reg.add(meta(-1L, Seq("a", "b")))
    assert(reg.table("/data/t").get.columns == Seq("a", "b"))
  }

  test("partition observations union across queries, even from stale snapshots") {
    val reg = new MetadataRegistry
    reg.add(meta(100L, Seq("a"), Seq("p=1", "p=2")))
    reg.add(meta(50L, Seq("a"), Seq("p=2", "p=3")))
    val t = reg.table("/data/t").get
    assert(t.lastAccessTime == 100L) // fresh snapshot kept
    assert(t.partitions == Seq("p=1", "p=2", "p=3")) // partitions merged
  }

  test("listener accumulates one entry per distinct table across queries") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val reg = new MetadataRegistry
    val q19 = SparkEntry.queries("q19_multijoin_agg")(spark, sf)
    reg.add(LineageExtractor.report(q19.queryExecution))
    val q2 = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "supplier"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(count(lit(1)).as("n"))
    reg.add(LineageExtractor.report(q2.queryExecution))
    val names = reg.snapshot.map(_.name).sorted
    assert(names == Seq("customer", "lineitem", "nation", "orders", "part", "supplier"))
    // the snapshot renders as one parseable JSON catalog document
    val json = reg.toJson
    assert(json.startsWith("""{"tables":["""))
    assert(json.contains(""""name":"supplier""""))
  }

  test("write targets register as sink entries") {
    val reg = new MetadataRegistry
    val report = LineageReport(
      LNode("n0", "scan", "", Nil), Map.empty,
      inputs = Seq(meta(-1L, Seq("a"))),
      outputs = Seq("/out/results"))
    reg.add(report)
    assert(reg.size == 2)
    assert(reg.table("/out/results").get.format == "sink")
  }

  // the reference keys every directory FQN as dfs:<path> vs local:<path>
  // (ConvertHelper.scala:10-19; DirectoryDef.isLocal, DirectoryDef.scala:3-8)
  test("sink entries carry a scheme-qualified identity") {
    val reg = new MetadataRegistry
    reg.add(LineageReport(
      LNode("n0", "scan", "", Nil), Map.empty, inputs = Nil,
      outputs = Seq("/out/results", "hdfs://nn:8020/warehouse/events",
        "s3a://bucket/data/docs", "spark_catalog.default.t")))
    def sink(k: String) = reg.table(k).get
    assert(sink("/out/results").scheme == "file" && sink("/out/results").isLocal)
    assert(sink("hdfs://nn:8020/warehouse/events").scheme == "hdfs")
    assert(!sink("hdfs://nn:8020/warehouse/events").isLocal)
    assert(sink("s3a://bucket/data/docs").scheme == "s3a")
    assert(sink("spark_catalog.default.t").scheme == "") // catalog-named
    // the scheme rides the session-catalog JSON document
    assert(reg.toJson.contains(""""scheme":"hdfs""""))
    assert(reg.toJson.contains(""""scheme":"s3a""""))
  }

  test("openLineage output namespace keeps the store identity of URI sinks") {
    val rep = LineageReport(
      LNode("n0", "scan", "", Nil), Map.empty, inputs = Nil,
      outputs = Seq("s3a://bucket/data/docs", "/tmp/local.parquet"))
    val ev = rep.openLineageJson("graft", "j", "r-1", "2026-01-01T00:00:00Z")
    assert(ev.contains(
      """{"namespace":"s3a://bucket","name":"/data/docs""""))
    assert(ev.contains(
      """{"namespace":"file","name":"/tmp/local.parquet""""))
  }
}
