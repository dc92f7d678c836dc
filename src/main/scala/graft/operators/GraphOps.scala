package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics beyond the connected components in [[Dedup]]:
  * PageRank (Page, Brin, Motwani & Winograd 1999) as iterative DataFrame
  * jobs — the page-quality signal large-scale crawl-corpus pipelines
  * (Common Crawl-style) feed into document quality scoring alongside the
  * per-document heuristics in [[TextOps]].
  */
object GraphOps {

  /** PageRank over a directed edge list, `iterations` synchronous
    * Jacobi sweeps from the uniform vector:
    * `pr'(v) = (1-d)/N + d * Σ_{u→v} pr(u) / outdeg(u)`.
    *
    * Scale shape: each iteration is ONE join of the edge set against the
    * node-grain rank table plus one groupBy(dst) shuffle — the classic
    * edge-partitioned sparse matvec; rank state never exceeds node
    * grain, and the edge/degree sides are computed once and reused.
    * `N` is a driver scalar (one count job), same bounded-metadata
    * contract as the m07 manifest.
    *
    * Simplifications, shared by the q103 oracle so both engines compute
    * the same fixed point trajectory: nodes with no OUT-edges leak their
    * rank mass (no dangling redistribution — symmetrize the edge set if
    * that matters, as q103's bipartite gate does), and nodes with no
    * IN-edges hold the teleport floor `(1-d)/N`.
    *
    * Iteration count is a parameter, not a convergence test: production
    * crawl ranking runs a fixed sweep budget (convergence deltas cost an
    * extra action per sweep); for long sweeps checkpoint every ~10
    * iterations to cap lineage growth (the 3-sweep gate doesn't need
    * it).
    *
    * CACHING CONTRACT: persists the edge set and node list (read every
    * sweep) and returns a LAZY rank table that reads both — the caller
    * owns release via `spark.catalog.clearCache()` after the action
    * (same contract as the other persisting operators).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"need >=1 iteration, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contrib = e.join(pr, col("src") === col("id"))
        .join(deg, "src")
        .select(col("dst").as("id"), (col("pr") / col("deg")).as("c"))
      val agg = contrib.groupBy(col("id"))
        .agg((lit(teleport) + lit(damping) * sum(col("c"))).as("pr_new"))
      // nodes with no in-edges keep the teleport floor
      pr = nodes.join(agg, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("pr_new"), lit(teleport)).as("pr"))
    }
    pr
  }
}
