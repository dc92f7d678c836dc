package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lineage._

class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def lin(df: org.apache.spark.sql.DataFrame): Map[String, Set[ColumnRef]] =
    LineageExtractor.columnLineage(df.queryExecution.optimizedPlan)

  test("q1-analog: scan-project-filter column lineage (FIXTURES §3)") {
    import spark.implicits._
    val df = Tables(spark, sf, "lineitem")
      .filter($"l_quantity" > 40)
      .select($"l_orderkey", $"l_extendedprice")
    assert(lin(df) == Map(
      "l_orderkey" -> Set(ColumnRef("lineitem", "l_orderkey")),
      "l_extendedprice" -> Set(ColumnRef("lineitem", "l_extendedprice"))))
  }

  test("q27-analog: multi-join + avg lineage resolves each avg to one lineitem column") {
    val df = SparkEntry.queries("q19_multijoin_agg")(spark, sf)
    val l = lin(df)
    assert(l("avg_qty") == Set(ColumnRef("lineitem", "l_quantity")))
    assert(l("avg_price") == Set(ColumnRef("lineitem", "l_extendedprice")))
    assert(l("avg_disc") == Set(ColumnRef("lineitem", "l_discount")))
    assert(l("avg_tax") == Set(ColumnRef("lineitem", "l_tax")))
    assert(l("p_brand") == Set(ColumnRef("part", "p_brand")))
    assert(l("n_name") == Set(ColumnRef("nation", "n_name")))
  }

  test("derived expression lineage: sum(x*(1-y)) references both source columns") {
    import spark.implicits._
    val df = Tables(spark, sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
    assert(lin(df)("rev") == Set(
      ColumnRef("lineitem", "l_extendedprice"), ColumnRef("lineitem", "l_discount")))
  }

  test("join of two relations sharing column names (reference SchemaMapping @todo case)") {
    // The reference's join fallback guesses parent by column-name uniqueness
    // (/root/reference/hivehook/.../qinfo/SchemaMapping.scala:116-122);
    // ExprId chasing must distinguish same-named columns of different tables.
    val tmp = java.nio.file.Files.createTempDirectory("linj").toString
    spark.range(5).select(col("id").as("k"), col("id").cast("string").as("v"))
      .write.mode("overwrite").parquet(s"$tmp/ta.parquet")
    spark.range(5).select(col("id").as("k"), col("id").cast("string").as("v"))
      .write.mode("overwrite").parquet(s"$tmp/tb.parquet")
    val a = spark.read.parquet(s"$tmp/ta.parquet")
    val b = spark.read.parquet(s"$tmp/tb.parquet")
    val j = a.join(b, a("k") === b("k")).select(a("v").as("va"), b("v").as("vb"))
    val l = lin(j)
    assert(l("va") == Set(ColumnRef("ta", "v")))
    assert(l("vb") == Set(ColumnRef("tb", "v")))
  }

  test("union lineage is positional (SURVEY §3.5)") {
    import spark.implicits._
    val u = Tables(spark, sf, "customer").select($"c_name".as("name"))
      .union(Tables(spark, sf, "supplier").select($"s_name".as("name")))
    assert(lin(u)("name") == Set(
      ColumnRef("customer", "c_name"), ColumnRef("supplier", "s_name")))
  }

  test("generate/explode lineage maps generator output to its input") {
    import spark.implicits._
    val df = Tables(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("token"), $"doc_id")
    val l = lin(df)
    assert(l("token") == Set(ColumnRef("documents", "text")))
    assert(l("doc_id") == Set(ColumnRef("documents", "doc_id")))
  }

  test("window function lineage includes partition/order references") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal")
    val df = Tables(spark, sf, "customer")
      .select($"c_custkey", row_number().over(w).as("rn"))
    val l = lin(df)
    assert(l("rn") == Set(
      ColumnRef("customer", "c_nationkey"), ColumnRef("customer", "c_acctbal")))
  }

  test("rollup (Expand) lineage: group keys keep their source, aggs theirs") {
    import spark.implicits._
    val df = Tables(spark, sf, "customer")
      .rollup($"c_mktsegment", $"c_nationkey")
      .agg(sum($"c_acctbal").as("bal"))
    val l = lin(df)
    assert(l("bal") == Set(ColumnRef("customer", "c_acctbal")))
    assert(l("c_mktsegment") == Set(ColumnRef("customer", "c_mktsegment")))
  }

  test("scalar-subquery lineage flows from the subquery's inputs") {
    import spark.implicits._
    val p = Tables(spark, sf, "part")
    val th = p.agg(avg($"p_retailprice").as("a"))
    val df = p.crossJoin(broadcast(th)).filter($"p_retailprice" > $"a")
      .select($"p_partkey", $"a")
    assert(lin(df)("a") == Set(ColumnRef("part", "p_retailprice")))
  }

  test("shared scans merge into a DAG node; transformUp rewrites it once") {
    import spark.implicits._
    val l1 = Tables(spark, sf, "nation").select($"n_nationkey", $"n_name")
    val l2 = Tables(spark, sf, "nation").select($"n_nationkey", $"n_name")
    val j = l1.join(l2.withColumnRenamed("n_name", "n2"), Seq("n_nationkey"))
    val g = LineageExtractor.fromLogical(j.queryExecution.optimizedPlan)
    val scanIds = g.collect { case n if n.kind == "Scan" => n.id }
    assert(scanIds.distinct.size == 1, s"expected one merged scan, got $scanIds")
    // the rendering marks the revisited shared subtree with "..."
    assert(g.treeString.contains("..."))
    var hits = 0
    g.transformUp { case n if n.kind == "Scan" => hits += 1; n.copy(detail = "X") }
    assert(hits == 1, "shared scan must be rewritten exactly once (memoized transformUp)")
  }

  test("physical lineage: pushed filters surfaced, partial aggs and exchanges removable") {
    val df = SparkEntry.queries("q19_multijoin_agg")(spark, sf)
    df.collect() // force AQE final plan
    val g = LineageExtractor.fromPhysical(df.queryExecution.executedPlan)
    val scans = g.collect { case n if n.kind == "Scan" => n.detail }
    assert(scans.nonEmpty)
    assert(scans.exists(_.contains("pushed=[")), s"no pushed filters in $scans")
    assert(g.collect { case n if n.kind.contains("Join") => n }.nonEmpty)
    val simplified = g.transformUp(LineageExtractor.Rules.removePartialAggregates)
      .transformUp(LineageExtractor.Rules.removeExchanges)
    assert(simplified.collect { case n if n.detail.contains("mode=Partial") => n }.isEmpty)
    assert(simplified.collect { case n if n.kind.endsWith("Exchange") => n }.isEmpty)
  }

  test("listener captures reports with inputs, graph and column lineage") {
    val listener = LineageListener.install(spark)
    try {
      SparkEntry.queries("q03_join_inner_agg")(spark, sf).collect()
      val deadline = System.currentTimeMillis() + 10000
      while (listener.reports.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val (_, rep) = listener.reports.head
      assert(rep.inputs.map(_.name).toSet == Set("customer", "orders", "lineitem"))
      assert(rep.columnLineage("revenue").contains(ColumnRef("lineitem", "l_extendedprice")))
      assert(rep.graph.collect { case n if n.kind == "Scan" => n }.size == 3)
      assert(rep.columnLineageJson.contains("\"revenue\""))
      assert(rep.graph.toJson.contains("\"edges\""))
    } finally spark.listenerManager.unregister(listener)
  }

  test("write-side lineage captures the output path") {
    val tmp = java.nio.file.Files.createTempDirectory("linw").toString
    val listener = LineageListener.install(spark)
    try {
      Tables(spark, sf, "region").write.mode("overwrite").parquet(s"$tmp/out.parquet")
      val deadline = System.currentTimeMillis() + 10000
      while (listener.reports.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val reps = listener.reports
      assert(reps.exists(_._2.outputs.exists(_.contains("out.parquet"))),
        s"no output captured: ${reps.map(_._2.outputs)}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("write-side lineage captures saveAsTable outputs") {
    val listener = LineageListener.install(spark)
    try {
      spark.sql("DROP TABLE IF EXISTS lin_out_tbl")
      val d = new java.io.File("/tmp/graft_warehouse/lin_out_tbl")
      if (d.exists()) { def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }; rm(d) }
      Tables(spark, sf, "region").write.mode("overwrite").saveAsTable("lin_out_tbl")
      val deadline = System.currentTimeMillis() + 10000
      while (!listener.reports.exists(_._2.outputs.nonEmpty) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(listener.reports.exists(_._2.outputs.exists(_.contains("lin_out_tbl"))),
        s"outputs: ${listener.reports.map(_._2.outputs)}")
    } finally spark.listenerManager.unregister(listener)
  }

  // reference TableDef carries the storage descriptor
  // (inputFormat/outputFormat/compressed, TableDef.scala:3-33); the Spark
  // analog: data-source tables record writer options (compression codec)
  // in the catalog's storage properties, and every path-backed entity
  // carries its filesystem scheme (DirectoryDef.isLocal discriminator)
  test("catalog inputs carry their storage descriptor and scheme") {
    spark.sql("DROP TABLE IF EXISTS lin_store_tbl")
    val d = new java.io.File("/tmp/graft_warehouse/lin_store_tbl")
    if (d.exists()) { def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }; rm(d) }
    Tables(spark, sf, "region").write.mode("overwrite")
      .option("compression", "snappy").saveAsTable("lin_store_tbl")
    val df = spark.table("lin_store_tbl").groupBy("r_name").count()
    val rep = LineageExtractor.report(df.queryExecution)
    val m = rep.inputs.find(_.name == "lin_store_tbl").get
    assert(m.storageProperties.get("compression").contains("snappy"),
      s"storage props: ${m.storageProperties}")
    assert(m.scheme == "file" && m.isLocal) // local warehouse dir
    // data-source tables have no Hive-format classes — documented None
    assert(m.inputFormat.isEmpty && m.outputFormat.isEmpty && !m.compressed)
    assert(rep.inputsJson.contains(""""storageProperties""""))
    assert(rep.inputsJson.contains(""""scheme":"file""""))
  }

  test("lineage invariant: every output column's sources are scanned columns") {
    // property-style sweep over the whole query corpus
    SparkEntry.registry.foreach { q =>
      val df = q.fn(spark, sf)
      val plan = df.queryExecution.optimizedPlan
      // scanned columns must see through cached fragments exactly like
      // the extractor does (an operator-persisted fragment substitutes
      // InMemoryRelation into the optimized plan)
      def scannedCols(
          p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
          : Set[ColumnRef] = p.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          val name = r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              val p = h.location.rootPaths.head.toString
              val base = p.stripSuffix("/").split('/').last
              if (base.contains('.')) base.substring(0, base.lastIndexOf('.')) else base
            case _ => "?"
          }
          r.output.map(a => ColumnRef(name, a.name)).toSet
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          scannedCols(m.cacheBuilder.logicalPlan)
      }.flatten.toSet
      val inputCols: Set[ColumnRef] = scannedCols(plan)
      val l = LineageExtractor.columnLineage(plan)
      l.foreach { case (out, srcs) =>
        // constrain only refs that claim parquet-table origin; generic
        // leaves (inline data, ranges, memory-sink reads of streaming
        // results) are legitimate non-file sources
        val external = srcs.filter(s => Tables.names.contains(s.table))
        assert(external.subsetOf(inputCols),
          s"${q.name}/$out: ${external -- inputCols} not among scanned columns")
      }
    }
  }

  test("lineage pierces the custom native as-of join node") {
    // the AsOfJoin logical node is graft's own plan class — the extractor
    // must traverse it like any binary node and chase ExprIds through it
    val df = SparkEntry.queries("q74_asof_native")(spark, sf)
    val rep = LineageExtractor.report(df.queryExecution)
    assert(rep.inputs.map(_.name) == Seq("events"))
    assert(rep.columnLineage("p_us") == Set(ColumnRef("events", "ts")))
    assert(rep.columnLineage("c_us") == Set(ColumnRef("events", "ts")))
    assert(rep.columnLineage("user_id") == Set(ColumnRef("events", "user_id")))
  }

  test("lineage sees through a cached fragment to the relations that " +
      "built it") {
    import spark.implicits._
    // cache a projection of the base table, then query THROUGH the cache:
    // the optimizer substitutes InMemoryRelation for the fragment, but
    // the report must still name the base table and resolve columns to it
    val frag = graft.Tables(spark, sf, "orders")
      .select($"o_custkey", $"o_totalprice")
    frag.persist().count()
    try {
      val q = frag.groupBy($"o_custkey")
        .agg(sum($"o_totalprice").as("total"))
      // precondition: the cache actually substituted into this plan
      assert(q.queryExecution.optimizedPlan.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }.nonEmpty, "expected the cached fragment in the optimized plan")
      val rep = LineageExtractor.report(q.queryExecution)
      assert(rep.inputs.map(_.name).contains("orders"),
        s"cached inputs lost: ${rep.inputs.map(_.name)}")
      assert(rep.columnLineage("total") ==
        Set(ColumnRef("orders", "o_totalprice")), rep.columnLineage.toString)
      // the graph renders the cache explicitly with the building plan
      // underneath — served-from-memory is visible, not hidden
      assert(rep.graph.treeString.contains("CachedRelation"))
    } finally {
      frag.unpersist()
      graft.Caches.sweep(spark)
    }
  }

  test("stitchMicrobatchReport: opaque LogicalRDD refs bridge through " +
      "the definition; real refs and non-empty inputs pass untouched") {
    // round 19 (r18 verdict #5): the foreachBatch bridge — unit-level
    // semantics; st21 gates the end-to-end streaming composition.
    val stub = LNode("0", "stub", "", Nil)
    val defn = LineageReport(
      graph = stub,
      columnLineage = Map(
        "value" -> Set(ColumnRef("StreamingRelation", "value")),
        "event_id" -> Set(ColumnRef("StreamingRelation", "event_id"))),
      inputs = Seq(TableMeta("FileSource[/p]", "", Seq("value"), "streaming")),
      outputs = Nil)
    val batch = LineageReport(
      graph = stub,
      columnLineage = Map(
        // opaque microbatch ref: must bridge to the definition's ref
        "sum_v" -> Set(ColumnRef("LogicalRDD", "value")),
        // a column the definition does not know stays as-is (fail open)
        "extra" -> Set(ColumnRef("LogicalRDD", "synthesized")),
        // a REAL table ref (e.g. a merge target read inside the batch)
        // must never be rewritten
        "merged" -> Set(ColumnRef("target_tbl", "v2"))),
      inputs = Nil,
      outputs = Seq("file:/tmp/out"))
    val stitched = LineageExtractor.stitchMicrobatchReport(batch, defn)
    assert(stitched.columnLineage("sum_v") ==
      Set(ColumnRef("StreamingRelation", "value")))
    assert(stitched.columnLineage("extra") ==
      Set(ColumnRef("LogicalRDD", "synthesized")))
    assert(stitched.columnLineage("merged") ==
      Set(ColumnRef("target_tbl", "v2")))
    assert(stitched.inputs.map(_.name) == Seq("FileSource[/p]"))
    assert(stitched.outputs == Seq("file:/tmp/out"))
    // a batch report that already carries inputs keeps them
    val withInputs = batch.copy(
      inputs = Seq(TableMeta("warm", "", Nil, "parquet")))
    assert(LineageExtractor.stitchMicrobatchReport(withInputs, defn)
      .inputs.map(_.name) == Seq("warm"))
  }
}
