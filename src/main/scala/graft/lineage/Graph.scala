package graft.lineage

import scala.collection.mutable

/** A source column reference: the terminal of every lineage chain.
  * Reference analog: `Column(tabAlias, name)` in
  * `/root/reference/hivehook/src/main/scala/org/sparklinedata/hive/hook/qinfo/SchemaMapping.scala:5-9`.
  */
final case class ColumnRef(table: String, column: String) {
  override def toString: String = s"$table.$column"
}

/** Catalog snapshot of one input relation (reference analog: `TableDef`,
  * `/root/reference/core/src/main/scala/org/sparklinedata/hive/metadata/TableDef.scala:3-33`,
  * which carries owner, create/lastAccess time and the view's
  * original+expanded SQL; `PartitionDef`s are resolved per scan,
  * `ConvertHelper.scala:82-91`).
  *
  * @param owner       catalog owner ("" when the relation is path-based)
  * @param createTime  epoch millis, -1 when unknown
  * @param lastAccessTime epoch millis, -1 when unknown
  * @param viewOriginalText the SQL the user wrote, for view inputs
  * @param viewExpandedText the analyzer-expanded SQL, for view inputs
  * @param partitions  partition directories this query actually reads
  *                    (post-pruning), `part=val[/part2=val2]` form; empty
  *                    for unpartitioned inputs
  * @param scheme      filesystem scheme of the entity's storage ("file",
  *                    "hdfs", "s3a", …; "" when unknown or catalog-named) —
  *                    the reference keys every directory FQN as
  *                    `dfs:<path>` vs `local:<path>`
  *                    (`ConvertHelper.scala:10-19`, `DirectoryDef.isLocal`,
  *                    `DirectoryDef.scala:3-8`); a lineage consumer at
  *                    scale wants "wrote to s3://…" vs "file://…"
  *                    first-class
  * @param inputFormat  Hive-style storage-descriptor input class, when the
  *                     catalog records one (reference `TableDef.inputFormat`,
  *                     `TableDef.scala:3-33`); data-source tables (`USING
  *                     parquet`) record the provider in `format` instead
  * @param outputFormat Hive-style storage-descriptor output class
  * @param compressed   the catalog's storage-descriptor compressed flag
  *                     (reference `TableDef.compressed`); data-source
  *                     compression codecs ride [[storageProperties]]
  * @param storageProperties the catalog's storage properties (e.g. the
  *                     `compression` option a writer set) — what answers
  *                     "is this table zstd parquet" for lineage consumers
  */
final case class TableMeta(
    name: String,
    path: String,
    columns: Seq[String],
    format: String,
    owner: String = "",
    createTime: Long = -1L,
    lastAccessTime: Long = -1L,
    viewOriginalText: Option[String] = None,
    viewExpandedText: Option[String] = None,
    partitions: Seq[String] = Nil,
    scheme: String = "",
    inputFormat: Option[String] = None,
    outputFormat: Option[String] = None,
    compressed: Boolean = false,
    storageProperties: Map[String, String] = Map.empty) {

  /** The reference's `DirectoryDef.isLocal` discriminator: a local-fs
    * entity vs a distributed/remote store. */
  def isLocal: Boolean = scheme == "file"
}

object TableMeta {
  /** Scheme of a write-target string: URI-form targets keep their scheme
    * (`hdfs://nn/path` → "hdfs"; also Hadoop's single-slash `file:/path`
    * rendering), bare absolute paths are local-fs ("file" — what a
    * schemeless Hadoop path resolves to on the driver), catalog-named
    * targets (`db.table`) have no filesystem scheme.
    */
  def schemeOf(target: String): String =
    if (target.startsWith("/")) "file"
    else scala.util.Try(Option(new java.net.URI(target).getScheme))
      .toOption.flatten.getOrElse("")
}

/** Database-grain catalog snapshot for the databases the query's
  * catalog-managed inputs live in (reference analog: `DbDef`,
  * `/root/reference/core/src/main/scala/org/sparklinedata/hive/metadata/DbDef.scala:4-12`,
  * which carries name/owner/description/params per database). Spark's
  * `CatalogDatabase` has no owner field but records the creating user
  * under the `owner` property — surfaced here as a first-class field,
  * with `params` holding the remaining properties.
  */
final case class DbMeta(
    name: String,
    owner: String,
    description: String,
    locationUri: String,
    params: Map[String, String])

/** Immutable lineage-graph node. The reference hand-rolls a Catalyst-style
  * TreeNode with DAG-aware memoized transformUp
  * (`/root/reference/hivehook/src/main/scala/org/sparklinedata/hive/lineage/GraphNode.scala:37-87`);
  * here the same semantics are ~60 lines because nodes are plain case
  * classes: a query lineage graph is a DAG (one scan feeding two joins), so
  * both traversal and rewriting are memoized per node `id` — a shared
  * subtree is visited/rewritten once and stays shared afterwards.
  *
  * `id` is a stable structural id assigned at build time (Spark plan nodes
  * have no Hive-style operatorId; see SURVEY §3.3) so golden renderings are
  * deterministic. DAG-merged scans keep the id of their first occurrence.
  */
final case class LNode(
    id: String,
    kind: String,
    detail: String,
    children: Seq[LNode]) {

  /** Pre/post-order DFS; `pre` fires on revisits, children+post are skipped
    * on revisit (reference `Node.traverse`,
    * `/root/reference/hivehook/.../hook/Node.scala:23-31`).
    */
  def traverse(pre: LNode => Unit, post: LNode => Unit = _ => ()): Unit = {
    val visited = mutable.Set.empty[String]
    def go(n: LNode): Unit = {
      pre(n)
      if (visited.add(n.id)) {
        n.children.foreach(go)
        post(n)
      }
    }
    go(this)
  }

  /** Per-node collection: a shared subtree contributes once regardless of
    * how many edges reach it, consistent with `size` (traverse's `pre`
    * fires per edge; dedupe here so counting queries aren't inflated).
    */
  def collect[T](pf: PartialFunction[LNode, T]): Seq[T] = {
    val out = mutable.ArrayBuffer.empty[T]
    val seen = mutable.Set.empty[String]
    traverse(n => if (seen.add(n.id) && pf.isDefinedAt(n)) out += pf(n))
    out.toSeq
  }

  def find(p: LNode => Boolean): Option[LNode] = collect { case n if p(n) => n }.headOption

  /** Bottom-up rewrite, memoized per node id so shared subtrees rewrite
    * once and remain shared (reference `GraphNode.transformUp`,
    * `GraphNode.scala:37-87`). The rule sees a node whose children are
    * already rewritten.
    */
  def transformUp(rule: PartialFunction[LNode, LNode]): LNode = {
    val memo = mutable.Map.empty[String, LNode]
    def go(n: LNode): LNode = memo.getOrElseUpdate(n.id, {
      val withNewChildren = {
        val kids = n.children.map(go)
        if (kids == n.children) n else n.copy(children = kids)
      }
      rule.applyOrElse(withNewChildren, identity[LNode])
    })
    go(this)
  }

  /** Number of distinct nodes in the DAG. */
  def size: Int = { var c = 0; traverse(_ => (), _ => c += 1); c }

  /** Indented, cycle-safe rendering; a revisited shared subtree prints as
    * `...` (reference `Node.printNode`, `Node.scala:67-97`).
    */
  def treeString: String = {
    val sb = new StringBuilder
    val visited = mutable.Set.empty[String]
    def go(n: LNode, depth: Int): Unit = {
      val pad = "  " * depth
      if (!visited.add(n.id)) {
        sb.append(s"$pad${n.kind} [${n.id}] ...\n")
      } else {
        val d = if (n.detail.isEmpty) "" else s" ${n.detail}"
        sb.append(s"$pad${n.kind} [${n.id}]$d\n")
        n.children.foreach(go(_, depth + 1))
      }
    }
    go(this, 0)
    sb.result()
  }

  /** JSON rendering (nodes + edges, DAG-safe). */
  def toJson: String = {
    import LNode.esc
    val nodes = mutable.LinkedHashMap.empty[String, LNode]
    traverse(n => if (!nodes.contains(n.id)) nodes(n.id) = n)
    val nodeJson = nodes.values.map { n =>
      s"""{"id":"${esc(n.id)}","kind":"${esc(n.kind)}","detail":"${esc(n.detail)}"}"""
    }.mkString("[", ",", "]")
    val edges = mutable.ArrayBuffer.empty[(String, String)]
    traverse(n => n.children.foreach(c => edges += ((n.id, c.id))))
    val edgeJson = edges.distinct.map { case (a, b) =>
      s"""{"from":"${esc(a)}","to":"${esc(b)}"}"""
    }.mkString("[", ",", "]")
    s"""{"nodes":$nodeJson,"edges":$edgeJson}"""
  }
}

object LNode {
  /** The one JSON-string escaper for every rendering in this package. */
  private[lineage] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}

/** The full lineage result for one executed query (reference output:
  * plan tree + lineage graph + schema mappings,
  * `/root/reference/hivehook/.../hook/PostExecHook.scala:73-79`).
  *
  * @param columnLineage final output column name → set of source columns
  * @param inputs        input relations (tables/paths) the query read
  * @param outputs       output sinks (paths/tables) the query wrote, if any
  */
final case class LineageReport(
    graph: LNode,
    columnLineage: Map[String, Set[ColumnRef]],
    inputs: Seq[TableMeta],
    outputs: Seq[String],
    databases: Seq[DbMeta] = Nil) {

  def columnLineageJson: String = {
    val entries = columnLineage.toSeq.sortBy(_._1).map { case (col, refs) =>
      val rs = refs.toSeq.sortBy(r => (r.table, r.column))
        .map(r => s"""{"table":"${r.table}","column":"${r.column}"}""")
        .mkString("[", ",", "]")
      s""""$col":$rs"""
    }
    entries.mkString("{", ",", "}")
  }

  /** Input entities with their catalog snapshot — what a consumer reads to
    * answer "who owns this input / which partitions did we touch / what
    * was the view's SQL" (the reference's `TableDef`/`PartitionDef`
    * payload). */
  def inputsJson: String =
    inputs.map(LineageReport.tableMetaJson).mkString("[", ",", "]")

  /** OpenLineage RunEvent rendering (public spec:
    * https://openlineage.io/spec — RunEvent, SchemaDatasetFacet on inputs,
    * ColumnLineageDatasetFacet on outputs), so the report plugs into any
    * OpenLineage consumer (Marquez, Atlan, DataHub) without an adapter.
    *
    * `runId`/`eventTime` come from the caller so renderings stay
    * deterministic and golden-testable. A query with no file/table sink
    * (collect-terminated) gets a synthetic output dataset
    * `<jobName>.result` so its column mapping still exports.
    *
    * `parent` (ParentRunFacet: parent runId, job namespace, job name)
    * links a child run to the run that spawned it — the streaming listener
    * uses it to parent each microbatch run under the pipeline-level run.
    *
    * Column-lineage caveat: the facet maps the PLAN's output columns, and
    * a plan with several sinks attaches the same merged facet to each
    * output dataset (Spark gives no per-sink column split at this level);
    * single-sink plans — the overwhelmingly common case — are exact.
    */
  def openLineageJson(
      jobNamespace: String,
      jobName: String,
      runId: String,
      eventTime: String,
      eventType: String = "COMPLETE",
      parent: Option[(String, String, String)] = None,
      extraRunFacets: Seq[String] = Nil): String = {
    import LNode.esc
    val producer = "urn:graft:spark-lineage"
    val specUrl = "https://openlineage.io/spec/2-0-2/OpenLineage.json"
    // dataset identity per the OL naming convention: catalog-managed
    // relations live in the session catalog's namespace, path-based
    // relations in the `file` namespace under their location
    def dsId(m: TableMeta): (String, String) =
      if (m.owner.nonEmpty || m.path.isEmpty) ("spark_catalog", m.name)
      else ("file", m.path)
    val inputsJ = inputs.map { m =>
      val (ns, nm) = dsId(m)
      val fields = m.columns.map(c => s"""{"name":"${esc(c)}"}""")
        .mkString("[", ",", "]")
      s"""{"namespace":"${esc(ns)}","name":"${esc(nm)}","facets":{""" +
        s""""schema":{"_producer":"$producer","_schemaURL":"$specUrl#/$$defs/SchemaDatasetFacet","fields":$fields}}}"""
    }.mkString("[", ",", "]")
    val colLineageFacet = {
      val fields = columnLineage.toSeq.sortBy(_._1).map { case (out, refs) =>
        val ins = refs.toSeq.sortBy(r => (r.table, r.column)).map { r =>
          val (ns, nm) = inputs.find(_.name == r.table).map(dsId)
            .getOrElse(("spark_catalog", r.table))
          s"""{"namespace":"${esc(ns)}","name":"${esc(nm)}","field":"${esc(r.column)}"}"""
        }.mkString("[", ",", "]")
        s""""${esc(out)}":{"inputFields":$ins}"""
      }.mkString("{", ",", "}")
      s""""columnLineage":{"_producer":"$producer","_schemaURL":"$specUrl#/$$defs/ColumnLineageDatasetFacet","fields":$fields}"""
    }
    val outNames = if (outputs.nonEmpty) outputs else Seq(s"$jobName.result")
    // output identity per the OL naming convention: URI-form sinks keep
    // their store identity (`s3a://bucket` namespace, path name) — the
    // dfs-vs-local discriminator the reference carries on every directory
    // FQN (ConvertHelper.scala:10-19); bare paths are driver-local `file`
    val outputsJ = outNames.map { o =>
      val sch = TableMeta.schemeOf(o)
      val (ns, nm) =
        if (sch.isEmpty) ("spark_catalog", o)
        else {
          val u = scala.util.Try(new java.net.URI(o)).toOption
          val auth = u.flatMap(x => Option(x.getAuthority)).getOrElse("")
          val path = u.flatMap(x => Option(x.getPath)).filter(_.nonEmpty).getOrElse(o)
          if (auth.isEmpty && sch == "file") ("file", path)
          else (s"$sch://$auth", path)
        }
      s"""{"namespace":"${esc(ns)}","name":"${esc(nm)}","facets":{$colLineageFacet}}"""
    }.mkString("[", ",", "]")
    // run facets: the spec-standard parent facet plus any caller-supplied
    // pre-rendered `"name":{...}` fragments (e.g. the streaming listener's
    // microbatch facet — the batch NUMBER rides here because run.runId
    // must be UUID-format for spec-strict consumers)
    val parentFacet = parent.map { case (pRunId, pNs, pJob) =>
      s""""parent":{""" +
        s""""_producer":"$producer","_schemaURL":"$specUrl#/$$defs/ParentRunFacet",""" +
        s""""run":{"runId":"${esc(pRunId)}"},""" +
        s""""job":{"namespace":"${esc(pNs)}","name":"${esc(pJob)}"}}"""
    }
    val runFacets = parentFacet.toSeq ++ extraRunFacets
    val runJ =
      if (runFacets.isEmpty) s""""run":{"runId":"${esc(runId)}"}"""
      else s""""run":{"runId":"${esc(runId)}","facets":${runFacets.mkString("{", ",", "}")}}"""
    s"""{"eventType":"${esc(eventType)}","eventTime":"${esc(eventTime)}",""" +
      runJ + "," +
      s""""job":{"namespace":"${esc(jobNamespace)}","name":"${esc(jobName)}"},""" +
      s""""inputs":$inputsJ,"outputs":$outputsJ,""" +
      s""""producer":"$producer","schemaURL":"$specUrl#/$$defs/RunEvent"}"""
  }

  /** Database entities of the catalog-managed inputs (the reference's
    * `DbDef` payload). */
  def databasesJson: String =
    databases.map(LineageReport.dbMetaJson).mkString("[", ",", "]")
}

object LineageReport {
  /** One table entry's catalog snapshot as JSON — shared by the per-query
    * report and the session [[MetadataRegistry]]. */
  private[lineage] def tableMetaJson(m: TableMeta): String = {
    import LNode.esc
    val base = Seq(
      s""""name":"${esc(m.name)}"""",
      s""""path":"${esc(m.path)}"""",
      s""""format":"${esc(m.format)}"""",
      s""""columns":${m.columns.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")}""")
    val cat = Seq(
      if (m.owner.nonEmpty) Some(s""""owner":"${esc(m.owner)}"""") else None,
      if (m.createTime >= 0) Some(s""""createTime":${m.createTime}""") else None,
      if (m.lastAccessTime >= 0) Some(s""""lastAccessTime":${m.lastAccessTime}""") else None,
      m.viewOriginalText.map(t => s""""viewOriginalText":"${esc(t)}""""),
      m.viewExpandedText.map(t => s""""viewExpandedText":"${esc(t)}""""),
      if (m.scheme.nonEmpty) Some(s""""scheme":"${esc(m.scheme)}"""") else None,
      m.inputFormat.map(f => s""""inputFormat":"${esc(f)}""""),
      m.outputFormat.map(f => s""""outputFormat":"${esc(f)}""""),
      if (m.compressed) Some(""""compressed":true""") else None,
      if (m.storageProperties.nonEmpty)
        Some(s""""storageProperties":${
          m.storageProperties.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
            .mkString("{", ",", "}")}""")
      else None,
      if (m.partitions.nonEmpty)
        Some(s""""partitions":${m.partitions.map(p => "\"" + esc(p) + "\"").mkString("[", ",", "]")}""")
      else None).flatten
    (base ++ cat).mkString("{", ",", "}")
  }

  private[lineage] def dbMetaJson(d: DbMeta): String = {
    import LNode.esc
    val params = d.params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    s"""{"name":"${esc(d.name)}","owner":"${esc(d.owner)}",""" +
      s""""description":"${esc(d.description)}",""" +
      s""""locationUri":"${esc(d.locationUri)}","params":$params}"""
  }
}
