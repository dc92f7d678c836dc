package graft.queries

import graft.{Q, Tables}
import graft.lineage.LineageExtractor
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The lineage analyzer exposed through the correctness gate: each query
  * runs the extractor on a known plan and returns its column/table lineage
  * as rows; the oracle pins the expected lineage as constant SQL. This is
  * the reference's core capability (SURVEY §0) behind the same
  * `queries()`/`oracleSql` contract as the exec surface.
  */
object LineageQueries {

  private def lineageDf(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = LineageExtractor.columnLineage(df.queryExecution.optimizedPlan)
      .toSeq.flatMap { case (out, refs) =>
        refs.toSeq.map(r => (out, r.table, r.column))
      }
    s.createDataFrame(rows).toDF("out_col", "src_table", "src_col")
      .orderBy("out_col", "src_table", "src_col")
  }

  def all: Seq[Q] = Seq(
    // reference q1 scenario: bare projection+filter over one table
    Q("lx01_lineage_scan_project",
      (s, dir) => {
        import s.implicits._
        val df = Tables(s, dir, "lineitem")
          .filter($"l_quantity" > 40)
          .select($"l_orderkey", $"l_extendedprice")
        lineageDf(s, df)
      },
      Some("""SELECT * FROM (VALUES
             |  ('l_extendedprice', 'lineitem', 'l_extendedprice'),
             |  ('l_orderkey', 'lineitem', 'l_orderkey'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin)),

    // reference q27 scenario: lineage through 4 joins + group-by + 4 avgs
    Q("lx02_lineage_multijoin",
      (s, dir) => {
        val df = CoreQueries.all.find(_.name == "q19_multijoin_agg").get.fn(s, dir)
        lineageDf(s, df)
      },
      Some("""SELECT * FROM (VALUES
             |  ('avg_disc', 'lineitem', 'l_discount'),
             |  ('avg_price', 'lineitem', 'l_extendedprice'),
             |  ('avg_qty', 'lineitem', 'l_quantity'),
             |  ('avg_tax', 'lineitem', 'l_tax'),
             |  ('n_name', 'nation', 'n_name'),
             |  ('p_brand', 'part', 'p_brand'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin)),

    // derived-expression + union lineage: positional union, compound exprs
    Q("lx03_lineage_union_expr",
      (s, dir) => {
        import s.implicits._
        val a = Tables(s, dir, "lineitem")
          .select(($"l_extendedprice" * (lit(1) - $"l_discount")).as("amount"))
        val b = Tables(s, dir, "orders").select($"o_totalprice".as("amount"))
        lineageDf(s, a.union(b))
      },
      Some("""SELECT * FROM (VALUES
             |  ('amount', 'lineitem', 'l_discount'),
             |  ('amount', 'lineitem', 'l_extendedprice'),
             |  ('amount', 'orders', 'o_totalprice'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin)),

    // input-entity lineage: which relations did the query read
    // (reference inputs/outputs conversion, PostExecHook.scala:42-61)
    Q("lx04_lineage_inputs",
      (s, dir) => {
        val df = CoreQueries.all.find(_.name == "q19_multijoin_agg").get.fn(s, dir)
        val inputs = LineageExtractor.report(df.queryExecution).inputs
        s.createDataFrame(inputs.map(m => (m.name, m.columns.size)))
          .toDF("table_name", "n_cols")
          .orderBy("table_name")
      },
      Some("""SELECT * FROM (VALUES
             |  ('customer', 5), ('lineitem', 11), ('nation', 3),
             |  ('orders', 6), ('part', 6))
             |  AS t(table_name, n_cols)
             |ORDER BY table_name""".stripMargin)),

    // lineage of a streaming pipeline DEFINITION (pre-start plan): the
    // windowed aggregation's outputs resolve to the streaming source cols
    Q("lx05_lineage_streaming",
      (s, dir) => {
        val agg = graft.streaming.StreamOps.hourlyCounts(
          graft.streaming.StreamOps.readEvents(s, dir))
        val rows = LineageExtractor
          .columnLineage(agg.queryExecution.analyzed)
          .toSeq.flatMap { case (out, refs) =>
            refs.toSeq.map(r => (out, r.column))
          }
        s.createDataFrame(rows).toDF("out_col", "src_col")
          .orderBy("out_col", "src_col")
      },
      // (count(1) has no column references, so `n` emits no lineage rows)
      Some("""SELECT * FROM (VALUES
             |  ('event_type', 'event_type'),
             |  ('sum_v', 'value'),
             |  ('window', 'ts'))
             |  AS t(out_col, src_col)
             |ORDER BY out_col, src_col""".stripMargin)),

    // lineage pierces a two-level temp-view chain (views inline in the
    // optimized plan, so derived columns resolve to base-table columns —
    // the reference resolves through Hive views the same way)
    Q("lx06_lineage_views",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lx6_base")
        s.sql("""SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net
                |FROM lx6_base WHERE l_quantity > 10""".stripMargin)
          .createOrReplaceTempView("lx6_v1")
        val df = s.sql(
          "SELECT l_orderkey, sum(net) AS total FROM lx6_v1 GROUP BY l_orderkey")
        lineageDf(s, df)
      },
      Some("""SELECT * FROM (VALUES
             |  ('l_orderkey', 'lineitem', 'l_orderkey'),
             |  ('total', 'lineitem', 'l_discount'),
             |  ('total', 'lineitem', 'l_extendedprice'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin)),

    // partition-level input entities (reference PartitionDef inputs,
    // ConvertHelper.scala:82-91): a pruned read of a partitioned layout
    // reports exactly the partitions the scan touches, as first-class
    // entries on the input's TableMeta
    Q("lx08_lineage_partitions",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_lx8").toString
        Tables(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .select($"event_id", $"user_id", $"event_type", $"value", $"us")
          .write.mode("overwrite").partitionBy("event_type")
          .parquet(s"$tmp/events_by_type")
        val df = s.read.parquet(s"$tmp/events_by_type")
          .filter($"event_type".isin("click", "purchase"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"))
        val report = LineageExtractor.report(df.queryExecution)
        val rows = report.inputs.flatMap(m => m.partitions.map(p => (m.name, p)))
        s.createDataFrame(rows).toDF("table_name", "partition")
          .orderBy("table_name", "partition")
      },
      Some("""SELECT * FROM (VALUES
             |  ('events_by_type', 'event_type=click'),
             |  ('events_by_type', 'event_type=purchase'))
             |  AS t(table_name, partition)
             |ORDER BY table_name, partition""".stripMargin)),

    // view inputs carry their ORIGINAL SQL in the report (reference
    // TableDef.viewOriginalText/viewExpandedText, TableDef.scala:3-33):
    // the optimizer inlines views away, so the report resolves them from
    // the analyzed plan's View nodes
    Q("lx09_lineage_view_meta",
      (s, dir) => {
        Tables(s, dir, "lineitem").createOrReplaceTempView("lx9_base")
        s.sql("DROP VIEW IF EXISTS lx9_v")
        s.sql("CREATE TEMPORARY VIEW lx9_v AS " +
          "SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net " +
          "FROM lx9_base WHERE l_quantity > 10")
        val df = s.sql(
          "SELECT l_orderkey, sum(net) AS total FROM lx9_v GROUP BY l_orderkey")
        val report = LineageExtractor.report(df.queryExecution)
        val rows = report.inputs
          .filter(m => m.name == "lineitem" || m.format.endsWith("view"))
          .map(m => (m.name, m.format.endsWith("view"),
            m.viewOriginalText.getOrElse("")))
        s.createDataFrame(rows).toDF("input_name", "is_view", "view_sql")
          .orderBy("input_name")
      },
      // lx9_base is a dataset-API temp view: a real view input, but only
      // SQL-defined views carry original text
      Some("""SELECT * FROM (VALUES
             |  ('lineitem', false, ''),
             |  ('lx9_base', true, ''),
             |  ('lx9_v', true,
             |   'SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net FROM lx9_base WHERE l_quantity > 10'))
             |  AS t(input_name, is_view, view_sql)
             |ORDER BY input_name""".stripMargin)),

    // database-grain metadata on the report (reference DbDef,
    // DbDef.scala:4-12: name/owner/description/params per database;
    // Spark's CatalogDatabase carries no owner, so the snapshot is
    // name/description/location/properties): a catalog-managed input
    // surfaces its database's catalog entry
    Q("lx10_lineage_database_meta",
      (s, dir) => {
        import s.implicits._
        Extra3Queries.freshTable(s, "graft_lx10_region")
        Tables(s, dir, "region")
          .write.mode("overwrite").saveAsTable("graft_lx10_region")
        val df = s.table("graft_lx10_region")
          .groupBy($"r_name").agg(count(lit(1)).as("n"))
        val report = LineageExtractor.report(df.queryExecution)
        // "default location" = the session's configured warehouse root
        // (whatever it is — Sessions points it at per-process scratch),
        // not the literal ./spark-warehouse name
        val wh = s.conf.get("spark.sql.warehouse.dir")
          .replaceFirst("^file:/*", "/").stripSuffix("/")
        val rows = report.databases.map { d =>
          // owner is the creating OS user — environment-specific, so the
          // gate pins its presence, not its value
          (d.name, d.owner.nonEmpty, d.description,
            d.locationUri.replaceFirst("^file:/*", "/").stripSuffix("/") == wh,
            d.params.size.toLong)
        }
        s.createDataFrame(rows)
          .toDF("db_name", "has_owner", "description", "default_location",
            "n_params")
          .orderBy("db_name")
      },
      Some("""SELECT * FROM (VALUES
             |  ('default', true, 'default database', true, CAST(0 AS BIGINT)))
             |  AS t(db_name, has_owner, description, default_location, n_params)
             |ORDER BY db_name""".stripMargin)),

    // session-lifetime metadata registry (reference Model.scala:5-22 —
    // one FQN-keyed Def map per session, every converted entity registers
    // into it; lastAccessTime-aware reuse, ConvertHelper.scala:58,121):
    // two queries over OVERLAPPING tables leave exactly one registry entry
    // per distinct table, carrying the freshest catalog snapshot
    Q("lx11_metadata_registry",
      (s, dir) => {
        import s.implicits._
        val reg = new graft.lineage.MetadataRegistry
        val q19 = CoreQueries.all.find(_.name == "q19_multijoin_agg").get.fn(s, dir)
        reg.add(LineageExtractor.report(q19.queryExecution))
        // overlaps q19 on lineitem, adds supplier
        val q2 = Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_name").agg(count(lit(1)).as("n"))
        reg.add(LineageExtractor.report(q2.queryExecution))
        s.createDataFrame(reg.snapshot.map(m => (m.name, m.columns.size)))
          .toDF("table_name", "n_cols")
          .orderBy("table_name")
      },
      // q19's five inputs (lx04) + supplier; lineitem seen by both queries
      // appears ONCE — six rows total proves the keyed merge
      Some("""SELECT * FROM (VALUES
             |  ('customer', 5), ('lineitem', 11), ('nation', 3),
             |  ('orders', 6), ('part', 6), ('supplier', 4))
             |  AS t(table_name, n_cols)
             |ORDER BY table_name""".stripMargin)),

    // RDD-backed sources keep their storage identity in lineage: the
    // connector-free avro read enters the plan as a LogicalRDD leaf
    // (no LogicalRelation), and the provenance registry resolves it —
    // preserving the reference's every-input-has-an-entity invariant
    // (PostExecHook.scala:43-50) for the one path-less read path
    Q("lx12_lineage_rdd_source",
      (s, dir) => {
        import s.implicits._
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val fixture =
          graft.Scratch.dir(s"graft_avro_lx12_$key") + "/nation.avro"
        if (!new java.io.File(fixture).exists())
          graft.sources.AvroSource.writeAvroFixture(
            Tables(s, dir, "nation"), fixture)
        val df = graft.sources.AvroSource.readAvro(s, fixture)
          .groupBy($"n_regionkey").agg(count(lit(1)).as("n"))
        val rep = LineageExtractor.report(df.queryExecution)
        val rows = rep.inputs.map(m =>
          (m.name, m.format, m.path.nonEmpty, m.columns.size))
        s.createDataFrame(rows)
          .toDF("input_name", "format", "has_path", "n_cols")
          .orderBy("input_name")
      },
      Some("""SELECT * FROM (VALUES ('nation', 'avro', true, 3))
             |  AS t(input_name, format, has_path, n_cols)
             |ORDER BY input_name""".stripMargin)),

    // expression rewrite into source terms (reference SchemaMapping.map):
    // each derived output column's defining expression, inlined down to
    // base-table columns and rendered as SQL
    Q("lx07_lineage_rewrite",
      (s, dir) => {
        import org.apache.spark.sql.catalyst.expressions.Alias
        import org.apache.spark.sql.catalyst.plans.logical.Project
        import s.implicits._
        val base = Tables(s, dir, "lineitem")
          .select($"l_orderkey",
            ($"l_extendedprice" * (lit(1) - $"l_discount")).as("net"))
        val df = base.select($"l_orderkey", ($"net" * lit(1.1)).as("gross"))
        val plan = df.queryExecution.analyzed
        val rows = plan.asInstanceOf[Project].projectList.collect {
          case al: Alias =>
            (al.name,
              LineageExtractor.rewriteToSourceSql(al.child, plan).replace("`", ""))
        }
        s.createDataFrame(rows).toDF("out_col", "src_sql").orderBy("out_col")
      },
      Some("""SELECT * FROM (VALUES
             |  ('gross',
             |   '((lineitem.l_extendedprice * (CAST(1 AS DOUBLE) - lineitem.l_discount)) * 1.1D)'))
             |  AS t(out_col, src_sql)
             |ORDER BY out_col""".stripMargin)),

    // sink entries carry their filesystem scheme — the reference keys
    // every directory FQN as dfs:<path> vs local:<path>
    // (ConvertHelper.scala:10-19; DirectoryDef.isLocal,
    // DirectoryDef.scala:3-8). A real listener-observed local write tags
    // `file`; cluster-store targets (hdfs/s3a — no DFS in the harness, so
    // registered from a report's output URIs, the same path a cluster
    // listener callback takes) keep their store scheme, isLocal=false
    Q("lx13_lineage_sink_scheme",
      (s, dir) => {
        import graft.lineage._
        val reg = new MetadataRegistry
        val tmp = graft.Scratch.dir("graft_lx13_sink")
        val listener = LineageListener.install(s)
        try {
          Tables(s, dir, "region").write.mode("overwrite")
            .parquet(s"$tmp/sink_scheme.parquet")
          val deadline = System.currentTimeMillis() + 15000
          while (!listener.reports.exists(_._2.outputs.exists(_.contains("graft_lx13"))) &&
            System.currentTimeMillis() < deadline) Thread.sleep(50)
          listener.reports
            .filter(_._2.outputs.exists(_.contains("graft_lx13")))
            .foreach(r => reg.add(r._2))
        } finally s.listenerManager.unregister(listener)
        reg.add(LineageReport(
          LNode("n0", "Scan", "", Nil), Map.empty, inputs = Nil,
          outputs = Seq("hdfs://nn:8020/warehouse/events",
            "s3a://bucket/data/docs")))
        val rows = reg.snapshot.filter(_.format == "sink")
          .map(m => (m.name, m.scheme, m.isLocal))
        s.createDataFrame(rows).toDF("sink_name", "scheme", "is_local")
          .orderBy("sink_name")
      },
      Some("""SELECT * FROM (VALUES
             |  ('docs', 's3a', false),
             |  ('events', 'hdfs', false),
             |  ('sink_scheme.parquet', 'file', true))
             |  AS t(sink_name, scheme, is_local)
             |ORDER BY sink_name""".stripMargin)),

    // lineage through a CACHED mid-plan fragment: CacheManager
    // substitutes InMemoryRelation for the persisted projection, but the
    // query still ANSWERS FROM the relations that built the cache — the
    // report must keep naming the base table (as inputs AND per-column),
    // not report a memory segment as the source. The extractor walks the
    // cacheBuilder's logical plan and maps the re-keyed cache outputs
    // positionally (Extract.scala InMemoryRelation cases).
    Q("lx14_lineage_cached_fragment",
      (s, dir) => {
        import s.implicits._
        val frag = Tables(s, dir, "orders")
          .select($"o_custkey", $"o_totalprice")
        frag.persist().count()
        try {
          val q = frag.groupBy($"o_custkey")
            .agg(sum($"o_totalprice").as("total"))
          // the gate must FAIL (not vacuously pass) if the cache did not
          // substitute — an uncached plan would test nothing
          require(q.queryExecution.optimizedPlan.collect {
            case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
          }.nonEmpty, "cached fragment did not substitute into the plan")
          val rep = LineageExtractor.report(q.queryExecution)
          val colRows = rep.columnLineage.toSeq.flatMap { case (out, refs) =>
            refs.toSeq.map(r => (out, r.table, r.column))
          }
          val inRows = rep.inputs.map(m => ("_input", m.name, ""))
          s.createDataFrame(colRows ++ inRows)
            .toDF("out_col", "src_table", "src_col")
            .orderBy("out_col", "src_table", "src_col")
        } finally frag.unpersist()
      },
      Some("""SELECT * FROM (VALUES
             |  ('_input', 'orders', ''),
             |  ('o_custkey', 'orders', 'o_custkey'),
             |  ('total', 'orders', 'o_totalprice'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin)),

    // lineage through a CUSTOM logical plan (the native as-of join —
    // graft's own LogicalPlan node, not a Catalyst builtin): the
    // extractor's attribute chase must pierce operator nodes it has no
    // special case for, resolving the join's outputs back to the base
    // table's columns on BOTH sides. Pins in CORRECTNESS what
    // LineageSpec asserts in-process (the q74 asof report).
    Q("lx15_lineage_custom_plan",
      (s, dir) => {
        val df = CoreQueries.all.find(_.name == "q74_asof_native")
          .getOrElse(Core2Queries.all.find(_.name == "q74_asof_native").get)
          .fn(s, dir)
        val rep = LineageExtractor.report(df.queryExecution)
        val colRows = rep.columnLineage.toSeq.flatMap { case (out, refs) =>
          refs.toSeq.map(r => (out, r.table, r.column))
        }
        val inRows = rep.inputs.map(m => ("_input", m.name, ""))
        s.createDataFrame(colRows ++ inRows)
          .toDF("out_col", "src_table", "src_col")
          .orderBy("out_col", "src_table", "src_col")
      },
      Some("""SELECT * FROM (VALUES
             |  ('_input', 'events', ''),
             |  ('c_us', 'events', 'ts'),
             |  ('event_id', 'events', 'event_id'),
             |  ('p_us', 'events', 'ts'),
             |  ('user_id', 'events', 'user_id'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin)),

    // lineage for a PERSISTED-LAYOUT BUILD (round-16 verdict #5): the 14
    // layout builders write parquet through df.write like any sink, but
    // no gate pinned that a BUILD's report carries (a) the output
    // directory entity with its scheme (the reference DirectoryDef,
    // DirectoryDef.scala:3-8) and (b) attribute lineage INTO the
    // layout's own columns — a write command's `output` is empty, so the
    // chase must route through the command's query child
    // (Extract.report). Built here: the LSH layout — its bucket rows'
    // sketch/band/bucket/partition columns all derive from the corpus
    // text, the id column from the corpus id; a report that lost the
    // command-query routing would return NO column rows and fail the
    // gate loudly (the require).
    Q("lx16_lineage_layout_build",
      (s, dir) => {
        import graft.lineage._
        val docs = Tables(s, dir, "documents").filter(col("doc_id") < 100)
        val tmp = graft.Scratch.dir("graft_lx16_layout")
        // fresh build EVERY call: the layout is ident-keyed, so a repeat
        // run in the same scratch (bench reps, full-suite sweeps) would
        // ident-hit, skip the write, and starve the listener — the gate
        // pins the WRITE's lineage, so the write must happen
        val tmpPath = new org.apache.hadoop.fs.Path(tmp)
        val fs = tmpPath.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
        val listener = LineageListener.install(s)
        val reports = try {
          graft.operators.Dedup.lshIndexWrite(docs, "doc_id", "text", tmp,
            k = 8, bands = 2, nParts = 8)
          val deadline = System.currentTimeMillis() + 15000
          while (!listener.reports.exists(
              _._2.outputs.exists(_.contains("graft_lx16"))) &&
            System.currentTimeMillis() < deadline) Thread.sleep(50)
          listener.reports
            .filter(_._2.outputs.exists(_.contains("graft_lx16")))
        } finally s.listenerManager.unregister(listener)
        require(reports.nonEmpty, "listener observed no layout-build write")
        val rep = reports.head._2
        require(rep.columnLineage.nonEmpty,
          "layout-build report carried no column lineage")
        // directory entity: register the observed report, read back the
        // sink's (name, scheme, isLocal) — the DirectoryDef analog
        val reg = new MetadataRegistry
        reg.add(rep)
        val sinkRows = reg.snapshot.filter(_.format == "sink")
          .map(m => ("_sink", m.name, m.scheme + "/" + m.isLocal))
        val colRows = rep.columnLineage.toSeq.flatMap { case (out, refs) =>
          refs.toSeq.map(r => (out, r.table, r.column))
        }
        val inRows = rep.inputs.map(m => ("_input", m.name, ""))
        s.createDataFrame(colRows ++ inRows ++ sinkRows)
          .toDF("out_col", "src_table", "src_col")
          .orderBy("out_col", "src_table", "src_col")
      },
      Some("""SELECT * FROM (VALUES
             |  ('_input', 'documents', ''),
             |  ('_sink', 'buckets', 'file/true'),
             |  ('band', 'documents', 'text'),
             |  ('bucket', 'documents', 'text'),
             |  ('id', 'documents', 'doc_id'),
             |  ('part', 'documents', 'text'),
             |  ('shh', 'documents', 'text'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin)),

    // lineage for a MULTI-OUTPUT layout build (round-17 verdict #4):
    // lx16 pins a single-sink build, but nothing proved per-output
    // attribution when ONE builder call writes SEVERAL sinks. The BM25
    // index build writes THREE datasets (postings/, termdf/, stats/),
    // and the interesting edge is that termdf/ rolls up from the
    // ALREADY-WRITTEN postings parquet (a read-back), so its report's
    // input must be the intermediate `postings` file entity — NOT
    // `documents` — while postings/ and stats/ trace to the corpus.
    // Three write commands → three listener reports, each with its own
    // output entity, inputs, and column lineage; rows are keyed
    // `<sink>/<out_col>` so the gate fails loudly if any sink's report
    // is missing or its columns blur into another's.
    Q("lx17_lineage_multi_output_build",
      (s, dir) => {
        import graft.lineage._
        val docs = Tables(s, dir, "documents").filter(col("doc_id") < 100)
        val tmp = graft.Scratch.dir("graft_lx17_bm25")
        // fresh build EVERY call (the lx16 rule): the layout is
        // ident-keyed, so a repeat run would ident-hit, skip all three
        // writes, and starve the listener
        val tmpPath = new org.apache.hadoop.fs.Path(tmp)
        val fs = tmpPath.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
        val listener = LineageListener.install(s)
        val reports = try {
          graft.operators.Retrieval.bm25IndexWrite(docs, "doc_id", "text",
            tmp, nBuckets = 4)
          def seen = listener.reports
            .filter(_._2.outputs.exists(_.contains("graft_lx17")))
          val deadline = System.currentTimeMillis() + 15000
          while (seen.flatMap(_._2.outputs).distinct.size < 3 &&
            System.currentTimeMillis() < deadline) Thread.sleep(50)
          seen
        } finally s.listenerManager.unregister(listener)
        val sinkNames = reports.flatMap(_._2.outputs).distinct
          .map(_.stripSuffix("/").split('/').last).sorted
        require(sinkNames == Seq("postings", "stats", "termdf"),
          s"expected the 3 layout sinks, listener observed: $sinkNames")
        val rows = reports.flatMap { case (_, rep) =>
          val sink = rep.outputs.find(_.contains("graft_lx17")).get
            .stripSuffix("/").split('/').last
          val colRows = rep.columnLineage.toSeq.flatMap { case (out, refs) =>
            refs.toSeq.map(r => (s"$sink/$out", r.table, r.column))
          }
          val inRows = rep.inputs.map(m => (s"_input/$sink", m.name, ""))
          colRows ++ inRows
        }.distinct
        s.createDataFrame(rows)
          .toDF("out_col", "src_table", "src_col")
          .orderBy("out_col", "src_table", "src_col")
      },
      Some("""SELECT * FROM (VALUES
             |  ('_input/postings', 'documents', ''),
             |  ('_input/stats', 'documents', ''),
             |  ('_input/termdf', 'postings', ''),
             |  ('postings/bucket', 'documents', 'text'),
             |  ('postings/dl', 'documents', 'text'),
             |  ('postings/doc_id', 'documents', 'doc_id'),
             |  ('postings/term', 'documents', 'text'),
             |  ('stats/avgdl', 'documents', 'text'),
             |  ('stats/sumdl', 'documents', 'text'),
             |  ('termdf/bucket', 'postings', 'bucket'),
             |  ('termdf/term', 'postings', 'term'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin))
  )
}
