package graft.lineage

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec}
import org.apache.spark.sql.execution.command.DataWritingCommandExec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InsertIntoHadoopFsRelationCommand, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.QueryExecution

/** QueryExecution → lineage. The Spark-native replacement for the whole
  * reference pipeline (SURVEY §3): Hive's hook + GraphWalker + graph
  * stitching vanish because a Spark plan is already one tree, and the
  * string-keyed `SchemaMapping` heuristics
  * (`/root/reference/hivehook/.../qinfo/SchemaMapping.scala:74-135`,
  * incl. the author-flagged join fallback at `:116-122`) are replaced by
  * chasing Catalyst's globally-unique `ExprId`s.
  */
object LineageExtractor {

  // ---------------------------------------------------------------- naming

  /** Best-effort relation name: catalog table if present, else the last
    * path segment without extension (reference keys entities by storage
    * location for the same reason, `PostExecHook.scala:43-50`).
    */
  private def relationName(path: String): String = {
    val base = path.stripSuffix("/").split('/').lastOption.getOrElse(path)
    val noExt = if (base.contains('.')) base.substring(0, base.lastIndexOf('.')) else base
    noExt
  }

  private def tableMeta(r: LogicalRelation): TableMeta = {
    val (path, fmt) = r.relation match {
      case h: HadoopFsRelation =>
        (h.location.rootPaths.headOption.map(_.toString).getOrElse("<unknown>"),
          h.fileFormat.toString)
      case other => (other.toString, other.getClass.getSimpleName)
    }
    val name = r.catalogTable.map(_.identifier.table).getOrElse(relationName(path))
    // catalog-managed inputs surface their ownership/timestamps (reference
    // TableDef.owner/createTime/lastAccessTime) and storage descriptor
    // (TableDef.inputFormat/outputFormat/compressed, TableDef.scala:3-33 —
    // Hive-format classes when the catalog records them, writer options
    // like `compression` via the storage properties); path-based reads
    // have none, but every path-backed entity gets its filesystem scheme
    val storage = r.catalogTable.map(_.storage)
    TableMeta(name, path, r.output.map(_.name), fmt,
      owner = r.catalogTable.map(_.owner).getOrElse(""),
      createTime = r.catalogTable.map(_.createTime).getOrElse(-1L),
      lastAccessTime = r.catalogTable.map(_.lastAccessTime).getOrElse(-1L),
      scheme = TableMeta.schemeOf(path),
      inputFormat = storage.flatMap(_.inputFormat),
      outputFormat = storage.flatMap(_.outputFormat),
      compressed = storage.exists(_.compressed),
      storageProperties = storage.map(_.properties).getOrElse(Map.empty))
  }

  /** A view input: identity + the original and analyzer-expanded SQL
    * (reference `TableDef.viewOriginalText`/`viewExpandedText`,
    * `TableDef.scala:3-33`). */
  private def viewMeta(v: View): TableMeta =
    TableMeta(
      name = v.desc.identifier.table,
      path = v.desc.identifier.unquotedString,
      columns = v.desc.schema.fieldNames.toSeq,
      format = if (v.isTempView) "temp_view" else "view",
      owner = v.desc.owner,
      createTime = v.desc.createTime,
      lastAccessTime = v.desc.lastAccessTime,
      viewOriginalText = v.desc.viewOriginalText.orElse(v.desc.viewText),
      viewExpandedText = v.desc.viewText)

  private def tableMeta(r: DataSourceV2Relation): TableMeta =
    TableMeta(r.table.name(), r.table.name(), r.output.map(_.name), "v2")

  // --------------------------------------------------- column lineage (§3.5)

  /** Bottom-up `Map[ExprId → Set[ColumnRef]]`. At leaves, seed from relation
    * output; `Project`/`Aggregate`/`Window`/`Generate` map each produced
    * `NamedExpression` to the union of its references' lineage; `Union` and
    * `Expand` are the genuinely positional cases; everything else passes
    * attributes through unchanged (same ExprId — that is the whole trick).
    */
  def attributeLineage(plan: LogicalPlan): Map[ExprId, Set[ColumnRef]] = {
    val memo = mutable.Map.empty[ExprId, Set[ColumnRef]]

    def refLineage(e: Expression): Set[ColumnRef] = {
      val direct = e.references.iterator
        .flatMap(a => memo.getOrElse(a.exprId, Set.empty[ColumnRef])).toSet
      // expressions may embed subquery plans (scalar/IN/EXISTS): their
      // output lineage contributes too
      val sub = e.collect { case s: SubqueryExpression =>
        walk(s.plan)
        s.plan.output.flatMap(a => memo.getOrElse(a.exprId, Set.empty[ColumnRef]))
      }.flatten.toSet
      direct ++ sub
    }

    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case r: LogicalRelation =>
          val t = tableMeta(r).name
          r.output.foreach(a => memo(a.exprId) = Set(ColumnRef(t, a.name)))
        case r: DataSourceV2Relation =>
          val t = tableMeta(r).name
          r.output.foreach(a => memo(a.exprId) = Set(ColumnRef(t, a.name)))
        case l: LocalRelation =>
          l.output.foreach(a => memo(a.exprId) = Set(ColumnRef("<inline>", a.name)))
        case r: Range =>
          r.output.foreach(a => memo(a.exprId) = Set(ColumnRef("<range>", a.name)))
        case Project(list, _) =>
          list.foreach(ne => memo(ne.exprId) = refLineage(ne))
        case a: Aggregate =>
          a.aggregateExpressions.foreach(ne => memo(ne.exprId) = refLineage(ne))
        case w: Window =>
          w.windowExpressions.foreach(ne => memo(ne.exprId) = refLineage(ne))
        case g: Generate =>
          val src = refLineage(g.generator)
          g.generatorOutput.foreach(a => memo(a.exprId) = src)
        case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          // cached fragment: walk the plan that BUILT the cache, then map
          // its outputs to the substituted fragment's attribute ids
          // POSITIONALLY (CacheManager re-keys the cached outputs to the
          // current query's expected attributes on substitution)
          val cached = imr.cacheBuilder.logicalPlan
          walk(cached)
          imr.output.zip(cached.output).foreach { case (o, c) =>
            memo(o.exprId) = memo.getOrElse(c.exprId, Set.empty[ColumnRef])
          }
        case e: Expand =>
          // cube/rollup/grouping-sets/distinct-agg: output i is the
          // positional union over all projections' i-th expression
          e.output.zipWithIndex.foreach { case (a, i) =>
            val srcs = e.projections.iterator.map(_(i)).flatMap(refLineage).toSet
            memo(a.exprId) = memo.getOrElse(a.exprId, Set.empty) ++ srcs
          }
        case u: Union =>
          // the one genuinely positional operator in Spark (SURVEY §3.5)
          u.output.zipWithIndex.foreach { case (a, i) =>
            memo(a.exprId) = u.children.iterator
              .flatMap(c => memo.getOrElse(c.output(i).exprId, Set.empty[ColumnRef]))
              .toSet
          }
        case f: Filter =>
          refLineage(f.condition): Unit // force subquery walks inside conditions
        case leaf: LeafNode =>
          // streaming relations, catalog leaves etc.: seed generically by
          // node name so lineage chains terminate at the source columns
          leaf.output.foreach(a =>
            memo.getOrElseUpdate(a.exprId, Set(ColumnRef(leaf.nodeName, a.name))))
        case _ => () // Join/Sort/Limit/Distinct/...: ExprIds flow through
      }
    }
    walk(plan)
    memo.toMap
  }

  /** Final-output column lineage keyed by user-facing column name. */
  def columnLineage(plan: LogicalPlan): Map[String, Set[ColumnRef]] = {
    val attr = attributeLineage(plan)
    plan.output.map(a => a.name -> attr.getOrElse(a.exprId, Set.empty[ColumnRef])).toMap
  }

  // ----------------------------------------------------- graph construction

  private def exprsDetail(es: Seq[Expression]): String =
    es.map(_.sql).mkString(", ") match {
      case s if s.length > 160 => s.take(157) + "..."
      case s => s
    }

  /** Logical plan → lineage DAG. Structural ids; identical leaf scans are
    * merged so the graph is a true DAG (reference shares scan nodes via its
    * id memo, `OperatorGraphBuilder.scala:89-92`; Spark trees duplicate
    * them — SURVEY §3.4a).
    */
  def fromLogical(plan: LogicalPlan): LNode = {
    val scanMemo = mutable.Map.empty[String, LNode]

    def build(p: LogicalPlan, id: String): LNode = {
      val kids = p.children.zipWithIndex.map { case (c, i) => build(c, s"$id.$i") }
      def n(kind: String, detail: String) = LNode(id, kind, detail, kids)
      p match {
        case r: LogicalRelation =>
          val m = tableMeta(r)
          val key = s"${m.name}|${m.columns.mkString(",")}"
          scanMemo.getOrElseUpdate(key,
            LNode(id, "Scan", s"${m.name} [${m.columns.mkString(", ")}]", Nil))
        case r: DataSourceV2Relation =>
          val m = tableMeta(r)
          scanMemo.getOrElseUpdate(s"v2|${m.name}",
            LNode(id, "Scan", s"${m.name} [${m.columns.mkString(", ")}]", Nil))
        case l: LocalRelation => n("InlineData", s"[${l.output.map(_.name).mkString(", ")}]")
        case Project(list, _) => n("Project", exprsDetail(list))
        case f: Filter => n("Filter", f.condition.sql)
        case j: Join =>
          val cond = j.condition.map(_.sql).getOrElse("true")
          n("Join", s"${j.joinType.sql} on $cond")
        case a: Aggregate =>
          n("Aggregate", s"keys=[${exprsDetail(a.groupingExpressions)}] " +
            s"aggs=[${exprsDetail(a.aggregateExpressions)}]")
        case w: Window => n("Window", exprsDetail(w.windowExpressions))
        case g: Generate => n("Generate", g.generator.sql)
        case e: Expand => n("Expand", s"${e.projections.size} projections")
        case u: Union => n("Union", "")
        case s: Sort => n("Sort", exprsDetail(s.order))
        case _: GlobalLimit | _: LocalLimit => n("Limit", "")
        case d: Distinct => n("Distinct", "")
        case i: InsertIntoHadoopFsRelationCommand =>
          n("WriteFile", i.outputPath.toString)
        case aj: graft.plans.AsOfJoin =>
          val tol = aj.toleranceUs.map(t => s" tol=${t}us").getOrElse("")
          n("AsOfJoin",
            s"by ${aj.leftBy.sql}=${aj.rightBy.sql} " +
              s"at ${aj.rightTime.sql}<=${aj.leftTime.sql}$tol")
        case ij: graft.plans.IntervalJoin =>
          n("IntervalJoin",
            s"by ${ij.leftBy.sql}=${ij.rightBy.sql} window=${ij.windowUs}us")
        // a cached fragment (CacheManager's withCachedData substitution):
        // lineage must SEE THROUGH the cache to the plan that built it —
        // the sources a query answers from do not change because the
        // bytes were served from memory
        case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          LNode(id, "CachedRelation",
            s"[${imr.output.map(_.name).mkString(", ")}]",
            Seq(build(imr.cacheBuilder.logicalPlan, s"$id.0")))
        case other => n(other.nodeName, "")
      }
    }
    build(plan, "0")
  }

  /** Physical plan → lineage DAG, AQE-aware. Unwraps
    * `AdaptiveSparkPlanExec`/`QueryStageExec` to the final plan — the Spark
    * analog of the reference walking only `done()` tasks of a
    * ConditionalTask (`TaskInfo.scala:38,64`, SURVEY §2.4) — and strips
    * codegen wrappers. Scan nodes surface pushed filters + read schema
    * (reference TableScan `filterExpr`/`neededColumns`,
    * `OperatorInfo.scala:67-74`).
    */
  def fromPhysical(plan: SparkPlan): LNode = {
    val scanMemo = mutable.Map.empty[String, LNode]

    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case r: ReusedExchangeExec => unwrap(r.child)
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case other => other
    }

    def build(p0: SparkPlan, id: String): LNode = {
      val p = unwrap(p0)
      val kids = p.children.zipWithIndex.map { case (c, i) => build(c, s"$id.$i") }
      def n(kind: String, detail: String) = LNode(id, kind, detail, kids)
      p match {
        case s: FileSourceScanExec =>
          val name = s.tableIdentifier.map(_.table)
            .getOrElse(relationName(s.relation.location.rootPaths.headOption
              .map(_.toString).getOrElse("<unknown>")))
          val pushed = s.metadata.getOrElse("PushedFilters", "[]")
          val schema = s.metadata.getOrElse("ReadSchema", "")
          // partition pruning predicates are a separate channel from the
          // pushed data filters (reference prints scan filterExpr +
          // neededColumns per node, OperatorInfo.scala:67-74)
          val parts =
            if (s.partitionFilters.isEmpty) ""
            else s" partFilters=[${exprsDetail(s.partitionFilters)}]"
          scanMemo.getOrElseUpdate(s"$name|$pushed|$schema|$parts",
            LNode(id, "Scan", s"$name pushed=$pushed read=$schema$parts", Nil))
        case agg: BaseAggregateExec =>
          val modes = agg.aggregateExpressions.map(_.mode).distinct.mkString(",")
          val m = if (agg.aggregateExpressions.isEmpty) "Keys" else modes
          val fns =
            if (agg.aggregateExpressions.isEmpty) ""
            else s" aggs=[${exprsDetail(agg.aggregateExpressions.map(_.aggregateFunction))}]"
          n("Aggregate", s"mode=$m keys=[${exprsDetail(agg.groupingExpressions)}]$fns")
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          n("Exchange", e.outputPartitioning.toString.take(120))
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          n("BroadcastExchange", b.mode.getClass.getSimpleName)
        case j: org.apache.spark.sql.execution.joins.HashJoin =>
          val extra = j.condition.map(c => s" cond ${c.sql}").getOrElse("")
          n(j.nodeName, s"${j.joinType.sql} build=${j.buildSide} keys " +
            s"${exprsDetail(j.leftKeys)} = ${exprsDetail(j.rightKeys)}$extra")
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          val keys =
            if (j.leftKeys.isEmpty) ""
            else s"keys ${exprsDetail(j.leftKeys)} = ${exprsDetail(j.rightKeys)}"
          val cond = j.condition.map(c =>
            (if (keys.isEmpty) "on " else " cond ") + c.sql).getOrElse("")
          n(j.nodeName, s"${j.joinType.sql} $keys$cond")
        case aj: graft.plans.AsOfJoinExec =>
          val tol = aj.toleranceUs.map(t => s" tol=${t}us").getOrElse("")
          n("AsOfJoin", s"by ${aj.leftBy.sql}=${aj.rightBy.sql} " +
            s"at ${aj.rightTime.sql}<=${aj.leftTime.sql}$tol")
        case ij: graft.plans.IntervalJoinExec =>
          n("IntervalJoin", s"by ${ij.leftBy.sql}=${ij.rightBy.sql} " +
            s"window=${ij.windowUs}us")
        case s: SortExec => n("Sort", exprsDetail(s.sortOrder))
        case t: TakeOrderedAndProjectExec =>
          n("TakeOrderedAndProject",
            s"limit=${t.limit} order=[${exprsDetail(t.sortOrder)}]")
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          n("Window", exprsDetail(w.windowExpression))
        case g: GenerateExec => n("Generate", g.generator.sql)
        case f: FilterExec => n("Filter", f.condition.sql)
        case pr: ProjectExec => n("Project", exprsDetail(pr.projectList))
        case w: DataWritingCommandExec => n("WriteFile", w.cmd.nodeName)
        case other => n(other.nodeName, "")
      }
    }
    build(plan, "0")
  }

  // ------------------------------------------- expression rewrite (§2.7 #7)

  /** Rewrite an expression tree into source-column terms: every attribute
    * that resolves to exactly one source column is renamed
    * `table.column` (reference `SchemaMapping.map`,
    * `/root/reference/hivehook/.../qinfo/SchemaMapping.scala:32-70`, which
    * rewrites Hive `ExprNodeDesc` trees the same way — recursively,
    * preserving function calls and types untouched).
    */
  def rewriteToSource(e: Expression, plan: LogicalPlan): Expression = {
    val attr = attributeLineage(plan)
    // defining expressions of every alias in the plan, so derived columns
    // inline recursively (qty_net -> price * (1 - discount) -> source terms)
    val defs = mutable.Map.empty[ExprId, Expression]
    plan.foreach {
      case p: Project =>
        p.projectList.foreach {
          case al @ Alias(child, _) => defs(al.exprId) = child
          case _ => ()
        }
      case a: Aggregate =>
        a.aggregateExpressions.foreach {
          case al @ Alias(child, _) => defs(al.exprId) = child
          case _ => ()
        }
      case w: Window =>
        w.windowExpressions.foreach {
          case al @ Alias(child, _) => defs(al.exprId) = child
          case _ => ()
        }
      case _ => ()
    }
    def go(expr: Expression, depth: Int): Expression = expr.transform {
      case a: AttributeReference if defs.contains(a.exprId) && depth < 20 =>
        go(defs(a.exprId), depth + 1)
      case a: AttributeReference =>
        attr.get(a.exprId) match {
          case Some(refs) if refs.size == 1 =>
            val r = refs.head
            a.withName(s"${r.table}.${r.column}")
          case _ => a
        }
    }
    go(e, 0)
  }

  /** Convenience: the rewritten expression rendered as SQL. */
  def rewriteToSourceSql(e: Expression, plan: LogicalPlan): String =
    rewriteToSource(e, plan).sql

  // ------------------------------------------- partition-level lineage

  /** Partition-level input lineage: for each parquet scan of a partitioned
    * relation, the partition directories that survive pruning (reference
    * analog: `PartitionDef` inputs resolved per scan,
    * `OperatorInfo.scala:76-95`). Table-scans of unpartitioned data map to
    * an empty list. Metadata-only (file-index listing, no data read).
    */
  def partitionLineage(plan: SparkPlan): Map[String, Seq[String]] = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case r: ReusedExchangeExec => unwrap(r.child)
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case other => other
    }
    val out = mutable.LinkedHashMap.empty[String, Seq[String]]
    def walk(p0: SparkPlan): Unit = {
      val p = unwrap(p0)
      p match {
        case s: FileSourceScanExec =>
          val name = s.tableIdentifier.map(_.table).getOrElse(
            relationName(s.relation.location.rootPaths.headOption
              .map(_.toString).getOrElse("<unknown>")))
          val partSchema = s.relation.partitionSchema
          val parts =
            if (partSchema.isEmpty) Seq.empty[String]
            else s.relation.location.listFiles(s.partitionFilters, Nil).map { pd =>
              partSchema.fields.zipWithIndex.map { case (f, i) =>
                s"${f.name}=${pd.values.get(i, f.dataType)}"
              }.mkString("/")
            }
          out(name) = parts
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(plan)
    out.toMap
  }

  // ------------------------------------------------------------- full report

  /** Inputs/outputs + graph + column lineage for one execution (the
    * reference's whole `PostExecHook.run`, `PostExecHook.scala:17-81`).
    */
  def report(qe: QueryExecution): LineageReport = {
    val plan = qe.optimizedPlan
    val inputs = mutable.LinkedHashMap.empty[String, TableMeta]
    def collectInputs(p: LogicalPlan): Unit = p.foreach {
      case r: LogicalRelation => val m = tableMeta(r); inputs.getOrElseUpdate(m.name, m)
      case r: DataSourceV2Relation => val m = tableMeta(r); inputs.getOrElseUpdate(m.name, m)
      // RDD-backed sources (e.g. the connector-free avro read) carry no
      // relation identity — resolve through the provenance registry so
      // every input the query read still appears in the report
      case r: LogicalRDD =>
        graft.sources.RddLineage.resolve(r.rdd).foreach { s =>
          inputs.getOrElseUpdate(s.name,
            TableMeta(s.name, s.path, r.output.map(_.name), s.format))
        }
      // a cached fragment: the query still ANSWERS FROM the relations
      // that built the cache — recurse into the cached logical plan so
      // caching a hot table never makes its lineage vanish
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        collectInputs(imr.cacheBuilder.logicalPlan)
      case _ => ()
    }
    collectInputs(plan)
    // views are inlined away by the optimizer — their identity + SQL text
    // live only in the ANALYZED plan's View nodes (the reference records
    // view inputs with original+expanded SQL the same way)
    qe.analyzed.foreach {
      case v: View => val m = viewMeta(v); inputs.getOrElseUpdate(m.name, m)
      case _ => ()
    }
    // partition-level input entities: attach the post-pruning partition
    // list of each partitioned scan to its TableMeta (metadata listing
    // only — planning the physical scan reads no data)
    val partsByName =
      try partitionLineage(qe.executedPlan)
      catch {
        // a plan that cannot be physically planned (pure command, etc.)
        // degrades to table-grain inputs; fatal errors must propagate
        case scala.util.control.NonFatal(_) => Map.empty[String, Seq[String]]
      }
    partsByName.foreach { case (name, parts) =>
      if (parts.nonEmpty) {
        inputs.updateWith(name)(_.map(_.copy(partitions = parts.sorted)))
      }
    }
    val outputs = plan.collect {
      case i: InsertIntoHadoopFsRelationCommand => i.outputPath.toString
      case c: org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand =>
        c.table.identifier.unquotedString
      case a: AppendData =>
        a.table match {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
            r.table.name()
          case other => other.nodeName
        }
      case o: OverwriteByExpression =>
        o.table match {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
            r.table.name()
          case other => other.nodeName
        }
    }
    // database-grain snapshot for every database a catalog-managed input
    // or view lives in (reference DbDef, DbDef.scala:4-12) — resolved
    // through the session catalog, deduped, stable order
    val dbNames = mutable.LinkedHashSet.empty[String]
    plan.foreach {
      case r: LogicalRelation =>
        r.catalogTable.flatMap(_.identifier.database).foreach(dbNames += _)
      case r: DataSourceV2Relation =>
        r.identifier.foreach(_.namespace().lastOption.foreach(dbNames += _))
      case _ => ()
    }
    qe.analyzed.foreach {
      case v: View => v.desc.identifier.database.foreach(dbNames += _)
      case _ => ()
    }
    val catalog = qe.sparkSession.sessionState.catalog
    val databases = dbNames.toSeq.filter(catalog.databaseExists).map { n =>
      val d = catalog.getDatabaseMetadata(n)
      DbMeta(d.name, d.properties.getOrElse("owner", ""), d.description,
        d.locationUri.toString, d.properties - "owner")
    }
    // a write command's own `output` is empty — the WRITTEN columns live
    // in its query child, so attribute lineage for a sink (including
    // every persisted-layout build: LSH buckets, IVFADC codes, BM25
    // postings, ...) must chase from there or the report carries inputs
    // and outputs but no column mapping (round-16 verdict #5; the
    // reference maps FileSinkOperator schemas the same way,
    // SchemaMapping.scala:74-135). Other commands keep the plan itself.
    val lineagePlan = plan match {
      case i: InsertIntoHadoopFsRelationCommand => i.query
      case c: org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand =>
        c.query
      case a: AppendData => a.query
      case o: OverwriteByExpression => o.query
      case other => other
    }
    LineageReport(
      graph = fromLogical(plan),
      columnLineage = columnLineage(lineagePlan),
      inputs = inputs.values.toSeq,
      outputs = outputs,
      databases = databases)
  }

  /** Streaming-safe report over a PRE-START pipeline definition: a
    * streaming plan refuses batch optimization/physical planning (no sink
    * yet), so everything derives from the ANALYZED plan — the same
    * treatment the lx05 gate gives streaming column lineage. Streaming
    * sources appear as `StreamingRelation*` leaves (not LogicalRelation),
    * captured here by node name with their source description and output
    * schema.
    */
  def reportStreamingDefinition(df: org.apache.spark.sql.DataFrame): LineageReport = {
    val analyzed = df.queryExecution.analyzed
    val inputs = mutable.LinkedHashMap.empty[String, TableMeta]
    analyzed.foreach {
      case r: LogicalRelation =>
        val m = tableMeta(r); inputs.getOrElseUpdate(m.name, m)
      case r: DataSourceV2Relation =>
        val m = tableMeta(r); inputs.getOrElseUpdate(m.name, m)
      case v: View =>
        val m = viewMeta(v); inputs.getOrElseUpdate(m.name, m)
      case l: LeafNode if l.nodeName.startsWith("StreamingRelation") =>
        // StreamingRelation.toString is the source description
        // (e.g. FileSource[/data/events]); stable enough to key on
        val desc = l.toString.takeWhile(_ != '\n')
        inputs.getOrElseUpdate(desc,
          TableMeta(desc, "", l.output.map(_.name), "streaming"))
      case _ => ()
    }
    LineageReport(
      graph = fromLogical(analyzed),
      columnLineage = columnLineage(analyzed),
      inputs = inputs.values.toSeq,
      outputs = Nil)
  }

  /** Bridge a `foreachBatch` MICRO-BATCH write report back to the
    * stream's DEFINITION (round 19, r18 verdict #5): inside
    * `foreachBatch` the batch DataFrame is backed by the runner's
    * materialized `LogicalRDD`, so the per-sink reports the listener
    * captures attribute columns to an opaque `LogicalRDD` leaf and
    * carry no inputs — per-OUTPUT attribution is right (one report per
    * sink, each with its own column lineage) but the SOURCE layer is
    * cut. The stream definition knows that layer
    * ([[reportStreamingDefinition]]): this stitches each opaque batch
    * ref through the definition's column lineage by column name (the
    * runner preserves the definition's output schema on the batch) and
    * substitutes the definition's inputs when the batch report has
    * none. Non-opaque refs (a sink report that ALSO read a warm batch
    * table, e.g. a merge target) pass through untouched.
    */
  def stitchMicrobatchReport(batch: LineageReport,
      definition: LineageReport): LineageReport = {
    val defCols = definition.columnLineage
    val stitched = batch.columnLineage.map { case (out, refs) =>
      out -> refs.flatMap { r =>
        if (r.table == "LogicalRDD") defCols.getOrElse(r.column, Set(r))
        else Set(r)
      }
    }
    batch.copy(columnLineage = stitched,
      inputs = if (batch.inputs.isEmpty) definition.inputs
        else batch.inputs)
  }

  /** Lineage-graph simplification rules (reference §4.2): same shape as
    * `RemoveOperatorsRule` — match a parent, splice out matching children,
    * preserving the single-input assumption
    * (`/root/reference/hivehook/.../transform/rules/RemoveOperatorsRule.scala:11-34`).
    */
  object Rules {
    /** Remove partial-mode aggregates from a physical lineage graph
      * (reference `RemoveMapSideGroupByRule`, `RemoveOperatorsRule.scala:56-68`).
      */
    val removePartialAggregates: PartialFunction[LNode, LNode] = {
      case n if n.children.exists(c => c.kind == "Aggregate" && c.detail.contains("mode=Partial")) =>
        n.copy(children = n.children.map { c =>
          if (c.kind == "Aggregate" && c.detail.contains("mode=Partial")) {
            require(c.children.size == 1, s"partial aggregate with ${c.children.size} children")
            c.children.head
          } else c
        })
    }

    /** Remove Exchange bookkeeping nodes so only logical dataflow remains
      * (reference strips intermediate scans/sinks similarly;
      * `RemoveOperatorsRule.scala:45-54`).
      */
    val removeExchanges: PartialFunction[LNode, LNode] = {
      case n if n.children.exists(c => c.kind == "Exchange" || c.kind == "BroadcastExchange") =>
        n.copy(children = n.children.map { c =>
          if (c.kind == "Exchange" || c.kind == "BroadcastExchange") {
            require(c.children.size == 1, s"exchange with ${c.children.size} children")
            c.children.head
          } else c
        })
    }
  }
}
