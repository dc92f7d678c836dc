package graft.lineage

import scala.collection.mutable

/** Session-lifetime metadata registry: accumulates the catalog snapshots
  * of every relation a session's queries touch, so a lineage consumer
  * watching a workload can ask "what tables has this session read or
  * written, with their freshest metadata" without replaying the reports.
  *
  * Reference analog: the session `Model` — a mutable FQN-keyed `Def` map
  * that every converted entity registers into
  * (`/root/reference/core/src/main/scala/org/sparklinedata/hive/metadata/Model.scala:5-22`),
  * with `lastAccessTime`-aware reuse: an incoming snapshot replaces the
  * registered one unless the registered one is strictly fresher
  * (`/root/reference/hivehook/.../ConvertHelper.scala:58,121`). Partition
  * observations accumulate on the table entry across queries, mirroring
  * `TableDef.add(PartitionDef)`'s copy-and-reregister
  * (`TableDef.scala:25-32`).
  *
  * Thread-safe: `QueryExecutionListener` callbacks arrive on the listener
  * bus thread while readers snapshot from the caller's thread.
  */
final class MetadataRegistry {

  // LinkedHashMap: snapshot order = first-seen order, deterministic for
  // golden tests regardless of key hashing
  private val tables = mutable.LinkedHashMap.empty[String, TableMeta]
  private val dbs = mutable.LinkedHashMap.empty[String, DbMeta]

  /** Registry key — the FQN analog. Path-based relations key by location
    * (two temp views over one parquet dir are the same table); catalog
    * relations and views key by name.
    */
  private def key(m: TableMeta): String = if (m.path.nonEmpty) m.path else m.name

  /** Merge one observation: newest `lastAccessTime` wins the scalar
    * metadata (ties, including the -1/-1 of path-based relations, go to
    * the latest observation — the freshest look at the catalog);
    * partition observations always union, because each query reports only
    * the partitions it actually pruned down to.
    */
  def add(m: TableMeta): Unit = synchronized {
    val k = key(m)
    tables.get(k) match {
      case Some(prev) if prev.lastAccessTime > m.lastAccessTime =>
        tables(k) = prev.copy(
          partitions = (prev.partitions ++ m.partitions).distinct)
      case prev =>
        tables(k) = m.copy(
          partitions =
            (prev.map(_.partitions).getOrElse(Nil) ++ m.partitions).distinct)
    }
  }

  /** Fold a whole query report in: inputs, write targets, databases. */
  def add(report: LineageReport): Unit = synchronized {
    report.inputs.foreach(add)
    // a write target observed only as a path still gets an entry, so the
    // session catalog answers "what did this workload produce" — tagged
    // with its filesystem scheme, the reference's dfs:/local: FQN
    // discriminator (ConvertHelper.scala:10-19, DirectoryDef.isLocal)
    report.outputs.foreach { o =>
      if (!tables.contains(o))
        tables(o) = TableMeta(name = o.split('/').last, path = o,
          columns = Nil, format = "sink", scheme = TableMeta.schemeOf(o))
    }
    report.databases.foreach(d => dbs(d.name) = d)
  }

  def table(k: String): Option[TableMeta] = synchronized(tables.get(k))

  /** First-seen-ordered snapshot of every table entry. */
  def snapshot: Seq[TableMeta] = synchronized(tables.values.toSeq)

  def databases: Seq[DbMeta] = synchronized(dbs.values.toSeq)

  def size: Int = synchronized(tables.size)

  def clear(): Unit = synchronized { tables.clear(); dbs.clear() }

  /** Session catalog snapshot as one JSON document (name-sorted), the
    * machine-readable sibling of the reference's `Model.toString`. */
  def toJson: String = synchronized {
    val ts = tables.values.toSeq.sortBy(m => (m.name, m.path))
      .map(LineageReport.tableMetaJson).mkString("[", ",", "]")
    val ds = dbs.values.toSeq.sortBy(_.name)
      .map(LineageReport.dbMetaJson).mkString("[", ",", "]")
    s"""{"tables":$ts,"databases":$ds}"""
  }
}
