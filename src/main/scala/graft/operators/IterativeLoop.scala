package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import org.apache.spark.sql.graftbridge.Bridge

/** The ONE caching contract for iterative DataFrame loops (pageRank,
  * personalizedPageRank, labelPropagation, bfsDistances,
  * connectedComponents, bpeTrain). Four invariants, each tied to a
  * measured failure mode:
  *
  *  1. Every round is MATERIALIZED (persist+count, or localCheckpoint on
  *     the cadence) — a lazy loop builds an iterations-deep plan whose
  *     every sweep replans and recomputes inside one giant job (58s vs
  *     ~3s for 3 PageRank sweeps over a ~1.2M-edge graph, round 8).
  *  2. The SUPERSEDED round is released as soon as its successor is
  *     solid — block storage stays O(1) in the iteration count.
  *     Release order matters: unpersisting first would force the
  *     successor to recompute through the freed predecessor.
  *  3. Lineage is truncated via localCheckpoint every `checkpointEvery`
  *     rounds — analysis/replanning cost stays O(1) per round on long
  *     budgets (persist alone does NOT cut lineage).
  *  4. On exit the result is a SELF-CONTAINED localCheckpoint and every
  *     loop-held block is released — callers never inherit state they
  *     cannot free. Round 9's one weak bench row was exactly this leak:
  *     connectedComponents left its final-round + self-loop checkpoints
  *     referenced by the returned plan, `spark.catalog.clearCache()`
  *     cannot see RDD-level checkpoint blocks, and consecutive runs
  *     degraded monotonically (d06 2.5s→9.0s, d07 10.9s→24.8s,
  *     recovering only after the frames were GC'd).
  *
  * The returned frame's own blocks are localCheckpoint state: freed when
  * the frame is garbage collected, or deterministically by
  * [[graft.Caches.sweep]] between independent queries. localCheckpoint
  * (vs reliable checkpoint) trades executor-loss recoverability for
  * no-DFS-write cost — the right trade for loops that can restart from
  * their fixed budget; on a real cluster with flaky executors, pass the
  * frames through `spark.sparkContext.setCheckpointDir` checkpoints
  * instead (same contract, one constructor flag away if ever needed).
  *
  * Not thread-safe; one instance per loop invocation.
  *
  * @param checkpointEvery truncate lineage every N rounds. The default
  *        is 1 (every round): measured on 12-iteration loops, cadence 10
  *        was 4x SLOWER end-to-end (14.8s vs 3.8s pageRank, 13.0s vs
  *        2.9s PPR) — persist writes the same blocks as localCheckpoint
  *        but does NOT cut lineage, so per-round analysis and
  *        CacheManager plan-matching cost grows with the uncut window,
  *        while the block-write cost is identical. Cadence 1 is also
  *        REQUIRED whenever the round expression references its
  *        predecessor more than once (the connected-components star
  *        alternation, LPA's vote+carry-forward): an uncut plan DOUBLES
  *        per round there. Raise the cadence only to keep a persist
  *        lineage chain recomputable across executor loss.
  */
final class IterativeLoop(
    checkpointEvery: Int = 1,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK) {
  require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")

  private def notifyHook(next: DataFrame): Unit =
    IterativeLoop.planHook.foreach(_(round, next))

  // (frame, isCheckpoint): persisted frames release via unpersist (they
  // live in CacheManager), checkpointed frames via their backing RDDs
  // (CacheManager never sees them — the round-9 lesson)
  private var state: Option[(DataFrame, Boolean)] = None
  private val pins = scala.collection.mutable.ListBuffer.empty[(DataFrame, Boolean)]
  private var round = 0
  private var closed = false

  private def release(df: DataFrame, isCkpt: Boolean): Unit =
    if (isCkpt) Bridge.checkpointRdds(df).foreach(_.unpersist(blocking = false))
    else df.unpersist(blocking = false)

  private def releaseAll(): Unit = {
    state.foreach { case (df, c) => release(df, c) }
    state = None
    pins.foreach { case (df, c) => release(df, c) }
    pins.clear()
    closed = true
  }

  /** Persist + materialize a loop-lifetime input (edge cache, degree
    * table) now; released at finish/abort. Returns the cached frame —
    * derive lazy views from it freely. */
  def pin(df: DataFrame): DataFrame = {
    val c = df.persist(level)
    pins += ((c, false))
    c
  }

  /** Track an already-localCheckpointed loop input for release at
    * finish/abort (for inputs that must be checkpoints because the loop
    * result must not re-read their upstream). */
  def pinCheckpoint(df: DataFrame): DataFrame = { pins += ((df, true)); df }

  /** Release ONE pinned frame early (by reference) — for staging pins a
    * derived pin supersedes (an edge cache recached at fewer partitions:
    * the raw copy must not double block storage for the loop's
    * lifetime). The caller must have MATERIALIZED the successor first,
    * or it will recompute through the freed parent. No-op for frames
    * this loop never pinned. */
  def releasePin(df: DataFrame): Unit = {
    val i = pins.indexWhere(_._1 eq df)
    if (i >= 0) { val (d, c) = pins.remove(i); release(d, c) }
  }

  /** Materialize the next round's state, release its predecessor, and
    * truncate lineage on the cadence (or when `forceCheckpoint`, for
    * final rounds whose state becomes the loop result via [[handoff]]). */
  def advance(next: DataFrame, forceCheckpoint: Boolean = false): DataFrame =
    advanceCounted(next, forceCheckpoint)._1

  /** [[advance]] + the new state's row count (convergence tests, traces).
    * The count IS the materializing action on BOTH paths — the
    * checkpoint is taken LAZILY (`eager = false` marks the RDD) and the
    * count runs DIRECTLY on the checkpoint RDD ([[rddCount]]): one
    * runJob that computes the partitions, writes the blocks, truncates
    * lineage and returns the row count. A Dataset-level `.count()` here
    * costs a second job — it plans partial-agg → single-partition
    * exchange → final-agg, and under AQE the final aggregate is its own
    * job on every round of every loop (round 20; the RDD count is the
    * same number by construction — one InternalRow per output row). */
  def advanceCounted(
      next: DataFrame, forceCheckpoint: Boolean = false): (DataFrame, Long) = {
    require(!closed, "IterativeLoop already finished/aborted")
    round += 1
    notifyHook(next)
    val ckpt = forceCheckpoint || round % checkpointEvery == 0
    val (cur, n) =
      if (ckpt) { val c = next.localCheckpoint(eager = false); (c, rddCount(c)) }
      else { val c = next.persist(level); (c, c.count()) }
    state.foreach { case (df, wasCkpt) => release(df, wasCkpt) }
    state = Some((cur, ckpt))
    (cur, n)
  }

  /** Count a lazily-localCheckpointed frame by running its backing RDD:
    * materializes the blocks and counts in ONE job. Falls back to the
    * Dataset count if the plan is not the expected bare LogicalRDD. */
  private def rddCount(c: DataFrame): Long =
    Bridge.checkpointRdds(c) match {
      case Seq(rdd) => rdd.count()
      case _ => c.count()
    }

  /** [[advance]] + the exact long SUM of `sumCol` over the new state
    * (None on an empty/all-null column), fused so the 1-row aggregate
    * IS the materializing action — the normalization total a
    * per-sweep-normalized loop (HITS) needs costs ZERO extra jobs
    * instead of a separate driver round-trip per sweep: the lazy
    * checkpoint's blocks are written by the aggregate's own job. */
  def advanceSummed(next: DataFrame, sumCol: String,
      forceCheckpoint: Boolean = false): (DataFrame, Option[Long]) = {
    require(!closed, "IterativeLoop already finished/aborted")
    round += 1
    notifyHook(next)
    val ckpt = forceCheckpoint || round % checkpointEvery == 0
    val cur =
      if (ckpt) next.localCheckpoint(eager = false) else next.persist(level)
    val row = cur.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.col(sumCol))).head()
    val total = if (row.isNullAt(0)) None else Some(row.getLong(0))
    state.foreach { case (df, wasCkpt) => release(df, wasCkpt) }
    state = Some((cur, ckpt))
    (cur, total)
  }

  /** Materialize + count a frame the loop must RETAIN past later rounds
    * (BFS layers: every hop's frontier survives to the final union).
    * Released at finish/abort, never by [[advance]]. ALWAYS a
    * localCheckpoint, never a persist: retained frames are referenced
    * by every later round's plan (BFS's visited anti-join unions ALL
    * prior layers), so an uncut retained plan makes round r's logical
    * plan contain the sum of all earlier rounds' plans — size DOUBLES
    * per round (a 10-hop BFS probe OOMed the driver in AQE's
    * explainString before this was a checkpoint). */
  def keep(df: DataFrame): (DataFrame, Long) = {
    require(!closed, "IterativeLoop already finished/aborted")
    // lazy checkpoint + RDD-level count: one job materializes and
    // counts (the advanceCounted discipline); registered for release
    // BEFORE counting so an abort on a failed count still frees
    // whatever partially materialized
    val c = df.localCheckpoint(eager = false)
    pins += ((c, true))
    (c, rddCount(c))
  }

  /** Materialize `result` as a self-contained localCheckpoint, release
    * every loop-held block, return it. For results DERIVED from the final
    * state (label extraction, layer union) — the derivation runs once,
    * over cached blocks. */
  def finish(result: DataFrame): DataFrame = {
    require(!closed, "IterativeLoop already finished/aborted")
    val out = result.localCheckpoint(eager = true)
    releaseAll()
    out
  }

  /** When the final round's state IS the result: transfer ownership of
    * its checkpoint (zero copy — the caller must have passed
    * `forceCheckpoint = true` on the last [[advance]]) and release
    * everything else. */
  def handoff(): DataFrame = {
    require(!closed, "IterativeLoop already finished/aborted")
    val (df, isCkpt) = state.getOrElse(
      throw new IllegalStateException("handoff before any advance"))
    require(isCkpt, "handoff requires the final advance to forceCheckpoint")
    state = None // ownership moves to the caller; do not release
    releaseAll()
    df
  }

  /** Release everything without producing a result (error paths,
    * driver-side-result loops like bpeTrain). Idempotent. */
  def abort(): Unit = if (!closed) releaseAll()
}

object IterativeLoop {
  /** Diagnostics-only observation point: when set, called with
    * `(round, next)` as each round is materialized — the ONLY way to
    * see a sweep-body plan, because `.explain` on the loop RESULT shows
    * a bare localCheckpoint scan (the sweeps are consumed inside the
    * loop) and the per-round action is an RDD-level count that no
    * QueryExecutionListener observes. Used by [[graft.SweepPlanDump]]
    * for the plans/ optimization evidence; never set in query paths,
    * and a hook must not mutate or execute the frame it is handed. */
  @volatile var planHook: Option[(Int, DataFrame) => Unit] = None
}
