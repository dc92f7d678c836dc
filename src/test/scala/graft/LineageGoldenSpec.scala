package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lineage._

/** Golden renderings + lineage through UDFs and SQL text (SURVEY §5
  * rebuild strategy items 2 and 4).
  */
class LineageGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("golden: q1-analog logical lineage tree rendering is stable") {
    import spark.implicits._
    val df = Tables(spark, sf, "lineitem")
      .filter($"l_quantity" > 40)
      .select($"l_orderkey", $"l_extendedprice")
    val got = LineageExtractor.fromLogical(df.queryExecution.optimizedPlan).treeString
    val expected =
      """Project [0] l_orderkey, l_extendedprice
        |  Filter [0.0] ((l_quantity IS NOT NULL) AND (l_quantity > 40.0D))
        |    Scan [0.0.0] lineitem [l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate]
        |""".stripMargin
    assert(got == expected)
  }

  test("layout-build write report maps the layout's columns (lx16 twin)") {
    // round-16 verdict #5: a persisted-layout build is a write command,
    // whose plan `output` is empty — the extractor must chase column
    // lineage through the command's QUERY child or the report carries
    // inputs/outputs but no column mapping. Pins the listener-observed
    // LSH build: every bucket-row column maps back to the corpus.
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 100)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_lx16_spec").toString + "/layout"
    val listener = LineageListener.install(spark)
    try {
      graft.operators.Dedup.lshIndexWrite(docs, "doc_id", "text", tmp,
        k = 8, bands = 2, nParts = 8)
      val deadline = System.currentTimeMillis() + 15000
      while (!listener.reports.exists(
          _._2.outputs.exists(_.contains("graft_lx16_spec"))) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val rep = listener.reports
        .filter(_._2.outputs.exists(_.contains("graft_lx16_spec")))
        .map(_._2).headOption
        .getOrElse(fail("listener observed no layout-build write"))
      // output directory entity (DirectoryDef analog) with its scheme
      assert(rep.outputs.exists(o =>
        o.startsWith("file:") && o.endsWith("/buckets")), rep.outputs)
      val sink = listener.registry.snapshot.filter(_.format == "sink")
        .find(_.name == "buckets")
        .getOrElse(fail("registry holds no buckets sink entity"))
      assert(sink.scheme == "file" && sink.isLocal)
      // attribute lineage INTO the layout's columns
      assert(rep.columnLineage("id") == Set(ColumnRef("documents", "doc_id")))
      for (c <- Seq("band", "bucket", "shh", "part"))
        assert(rep.columnLineage(c) == Set(ColumnRef("documents", "text")),
          s"column $c")
      assert(rep.inputs.map(_.name) == Seq("documents"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("multi-output layout build: one report per sink, per-output " +
      "attribution (lx17 twin)") {
    // round-17 verdict #4: one builder call, THREE sinks. The listener
    // must report every output entity separately, and each report's
    // inputs/columns must be ITS OWN — in particular termdf/ rolls up
    // from the already-written postings parquet, so its input is the
    // intermediate `postings` file entity, NOT `documents`.
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 100)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_lx17_spec").toString + "/index"
    val listener = LineageListener.install(spark)
    try {
      graft.operators.Retrieval.bm25IndexWrite(docs, "doc_id", "text", tmp,
        nBuckets = 4)
      val deadline = System.currentTimeMillis() + 15000
      def seen = listener.reports
        .filter(_._2.outputs.exists(_.contains("graft_lx17_spec")))
      while (seen.flatMap(_._2.outputs).distinct.size < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val bySink = seen.map(_._2).map { rep =>
        rep.outputs.head.stripSuffix("/").split('/').last -> rep
      }.toMap
      assert(bySink.keySet == Set("postings", "termdf", "stats"), bySink.keys)
      // per-output inputs: the read-back roll-up traces to the
      // intermediate file entity, the two corpus passes to documents
      assert(bySink("postings").inputs.map(_.name) == Seq("documents"))
      assert(bySink("stats").inputs.map(_.name) == Seq("documents"))
      assert(bySink("termdf").inputs.map(_.name) == Seq("postings"))
      // per-output column lineage stays separated (no blur across sinks)
      assert(bySink("postings").columnLineage("doc_id") ==
        Set(ColumnRef("documents", "doc_id")))
      assert(bySink("postings").columnLineage("term") ==
        Set(ColumnRef("documents", "text")))
      assert(bySink("termdf").columnLineage("term") ==
        Set(ColumnRef("postings", "term")))
      assert(bySink("termdf").columnLineage("bucket") ==
        Set(ColumnRef("postings", "bucket")))
      assert(bySink("stats").columnLineage("avgdl") ==
        Set(ColumnRef("documents", "text")))
    } finally spark.listenerManager.unregister(listener)
  }

  test("lineage flows through a Scala UDF generically (SURVEY §2.6)") {
    import spark.implicits._
    val double_it = udf((x: Double) => x * 2)
    val df = Tables(spark, sf, "part")
      .select($"p_partkey", double_it($"p_retailprice").as("px2"))
    val l = LineageExtractor.columnLineage(df.queryExecution.optimizedPlan)
    assert(l("px2") == Set(ColumnRef("part", "p_retailprice")))
  }

  test("lineage of SQL-text queries (parser entry point)") {
    Tables.registerAll(spark, sf)
    val df = spark.sql(
      """SELECT n_name, round(sum(c_acctbal), 2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
    val l = LineageExtractor.columnLineage(df.queryExecution.optimizedPlan)
    assert(l("bal") == Set(ColumnRef("customer", "c_acctbal")))
    assert(l("n_name") == Set(ColumnRef("nation", "n_name")))
  }

  test("lineage through SQL CTE and correlated subquery") {
    Tables.registerAll(spark, sf)
    val df = spark.sql(
      """WITH big AS (SELECT o_custkey, o_totalprice FROM orders
        |             WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders))
        |SELECT o_custkey, round(sum(o_totalprice), 2) AS t FROM big GROUP BY o_custkey""".stripMargin)
    val l = LineageExtractor.columnLineage(df.queryExecution.optimizedPlan)
    assert(l("t") == Set(ColumnRef("orders", "o_totalprice")))
    assert(l("o_custkey") == Set(ColumnRef("orders", "o_custkey")))
  }

  test("column lineage JSON round-trips through a stable rendering") {
    import spark.implicits._
    val df = Tables(spark, sf, "region").select($"r_name")
    val rep = LineageExtractor.report(df.queryExecution)
    assert(rep.columnLineageJson ==
      """{"r_name":[{"table":"region","column":"r_name"}]}""")
  }
}
