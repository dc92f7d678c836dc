package graft.sources

import scala.collection.concurrent.TrieMap

/** Lineage identity for RDD-backed sources: a `LogicalRDD` leaf carries
  * no catalog/path identity, so sources that enter the plan as RDDs
  * (e.g. [[AvroSource.readAvro]]) register their provenance here keyed
  * by RDD id, and the lineage extractor resolves the leaf back to a
  * named input. This preserves the reference's invariant that EVERY
  * input the query read appears in the report with its storage identity
  * (the reference keys entities by location, `PostExecHook.scala:43-50`)
  * even for the one read path that bypasses `LogicalRelation`.
  *
  * Entries are tiny (id → name/path/format) and per-JVM; `clear` exists
  * for tests. Unregistered RDD leaves simply stay anonymous, as before.
  */
object RddLineage {

  final case class RddSource(name: String, path: String, format: String)

  private val sources = TrieMap.empty[Int, RddSource]

  def register(rddId: Int, name: String, path: String, format: String): Unit =
    sources.put(rddId, RddSource(name, path, format))

  def lookup(rddId: Int): Option[RddSource] = sources.get(rddId)

  /** Resolve an RDD to a registered source by walking its dependency
    * chain: the plan's `LogicalRDD` holds a DERIVED RDD (row encoding
    * maps over the registered one), so identity lives on an ancestor.
    * Driver-side metadata walk — touches no data.
    */
  def resolve(rdd: org.apache.spark.rdd.RDD[_]): Option[RddSource] = {
    val seen = scala.collection.mutable.Set.empty[Int]
    var frontier: List[org.apache.spark.rdd.RDD[_]] = List(rdd)
    while (frontier.nonEmpty) {
      val h = frontier.head
      frontier = frontier.tail
      if (seen.add(h.id)) {
        sources.get(h.id) match {
          case Some(s) => return Some(s)
          case None => frontier = h.dependencies.map(_.rdd).toList ::: frontier
        }
      }
    }
    None
  }

  def clear(): Unit = sources.clear()
}
