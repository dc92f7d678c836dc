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
    * extra action per sweep).
    *
    * EACH SWEEP IS MATERIALIZED and its predecessor released
    * ([[IterativeLoop]]): leaving the whole loop lazy builds one
    * iterations-deep plan whose every sweep replans and recomputes
    * inside a single giant job — measured 58s for 3 sweeps over a
    * ~1.2M-edge graph vs ~3s materialized. Lineage is truncated via
    * `localCheckpoint` every `checkpointEvery` sweeps (default EVERY
    * sweep — see the IterativeLoop cadence measurement) AND on the
    * final sweep, so analysis cost stays O(1) per sweep on long budgets
    * and the RETURNED table is a self-contained materialized relation
    * (LogicalRDD) rather than an iterations-deep nest of cached plans
    * (localCheckpoint trades executor-loss recoverability for
    * no-DFS-write cost — the right trade for a rank loop that can
    * restart from the sweep budget).
    *
    * CACHING CONTRACT ([[IterativeLoop]]): every operator-held block —
    * edge cache, fused node/degree table, intermediate sweeps — is
    * released before return; the returned table is a self-contained
    * localCheckpoint whose blocks are freed when the DataFrame is
    * garbage collected (or by `graft.Caches.sweep`).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      checkpointEvery: Int = 1,
      broadcastNodesBelow: Long = 2_000_000L): DataFrame = {
    require(iterations >= 1, s"need >=1 iteration, got $iterations")
    val loop = new IterativeLoop(checkpointEvery)
    val e0 = loop.pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val e = compactPinned(loop, e0, e0.count())
    // node list and out-degree FUSED into one table via endpoint explode
    // — one shuffle and one action build the edge cache, the node set,
    // and the degree table together (separate distinct + groupBy passes
    // cost an extra corpus-grain shuffle and an extra job each)
    val nodeDeg = loop.pin(e.select(explode(array(
        struct(col("src").as("id"), lit(1L).as("o")),
        struct(col("dst").as("id"), lit(0L).as("o")))).as("x"))
      .select(col("x.id").as("id"), col("x.o").as("o"))
      .groupBy(col("id")).agg(sum(col("o")).cast("double").as("deg")))
    val n = nodeDeg.count().toDouble
    // stats-driven build-side choice, decided ONCE from the node count
    // we already paid for: rank/degree state is node-grain, so when it
    // fits executor memory (~30 MB at the default bound) every sweep's
    // edge joins go map-side — the edge set never shuffles, only the
    // node-grain contribution aggregate does. A 1e9-node crawl graph
    // exceeds the bound and takes the shuffle-join path; AQE cannot make
    // this call by itself on the checkpoint-truncated mid-loop plans.
    def bc(df: DataFrame): DataFrame =
      if (n <= broadcastNodesBelow) broadcast(df) else df
    val teleport = (1.0 - damping) / n
    // SWEEP STATE CARRIES THE DEGREE (round 20): the old shape built
    // THREE broadcast exchanges per sweep — the rank table, the
    // loop-invariant degree view (rebuilt every sweep: broadcasts are
    // per-job, never reused across the loop's actions), and the
    // aggregate for a node-grain left_outer teleport-floor join. With
    // (id, deg, pr) as the state, the contribution join needs ONE
    // broadcast, and the floor join is gone entirely: every node seeds
    // the SAME aggregate with an exact-zero contribution row, so
    // no-in-edge nodes come out at teleport + d·0.0 = teleport exactly
    // (adding 0.0 to a finite positive double sum is the identity, so
    // in-edge sums are unchanged too) and the aggregate's output IS
    // node-grain state. Per sweep: one broadcast, one exchange, zero
    // joins after the contribution probe — measured 6 -> 4 driver jobs
    // per sweep at bench scale; at 100 TB the deleted node-grain
    // broadcast + join per sweep is the bigger term. The zero rows add
    // n rows to the exchange's input, but partial aggregation merges
    // them into the per-partition buffers map-side.
    var state = nodeDeg.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contrib = e.join(bc(state), col("src") === col("id"))
        .select(col("dst").as("id"),
          lit(null).cast("double").as("deg"),
          (col("pr") / col("deg")).as("c"))
      val seedZero = state.select(col("id"), col("deg"),
        lit(0.0).as("c"))
      val next = contrib.union(seedZero)
        .groupBy(col("id"))
        .agg(max(col("deg")).as("deg"),
          (lit(teleport) + lit(damping) * sum(col("c"))).as("pr"))
      state = loop.advance(next, forceCheckpoint = i == iterations)
    }
    loop.handoff().select(col("id"), col("pr"))
  }

  /** Weighted PageRank — [[pageRank]] over a weighted edge list, the
    * crawl/trade-graph variant where link multiplicity matters:
    * `pr'(v) = (1−d)/N + d·Σ_{u→v} pr(u)·w(u,v)/s(u)` with the
    * out-STRENGTH `s(u) = Σ_out w` replacing out-degree. Shares
    * [[pageRank]]'s stated float semantics (dangling nodes leak,
    * no-in-edge nodes hold the teleport floor, fixed sweep budget,
    * callers order on the ROUNDED rank) and its [[IterativeLoop]]
    * caching contract. Non-positive weights are rejected up front —
    * a zero-strength node would divide by zero, and negative "weights"
    * are a different algorithm.
    *
    * Scale shape: identical to [[pageRank]] — the node/strength table
    * is fused from one endpoint explode, each sweep is one edge-vs-rank
    * join plus one dst-grain aggregate, rank state never exceeds node
    * grain, stats-driven broadcast under `broadcastNodesBelow`.
    */
  def weightedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int, damping: Double = 0.85,
      checkpointEvery: Int = 1,
      broadcastNodesBelow: Long = 2_000_000L): DataFrame = {
    require(iterations >= 1, s"need >=1 iteration, got $iterations")
    val loop = new IterativeLoop(checkpointEvery)
    val eP = loop.pin(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("w"))
      .withColumn("w", when(col("w") > 0, col("w")).otherwise(
        raise_error(lit("weightedPageRank: weights must be > 0")))))
    val e = compactPinned(loop, eP, eP.count())
    val nodeStr = loop.pin(e.select(explode(array(
        struct(col("src").as("id"), col("w").as("s")),
        struct(col("dst").as("id"), lit(0.0).as("s")))).as("x"))
      .select(col("x.id").as("id"), col("x.s").as("s"))
      .groupBy(col("id")).agg(sum(col("s")).as("strength")))
    val n = nodeStr.count().toDouble
    def bc(df: DataFrame): DataFrame =
      if (n <= broadcastNodesBelow) broadcast(df) else df
    val teleport = (1.0 - damping) / n
    // sweep state carries the loop-invariant strength and every node
    // seeds the aggregate with an exact-zero contribution — the
    // pageRank sweep-slimming shape (round 20): one broadcast, one
    // exchange, zero node-grain joins per sweep.
    var state = nodeStr.withColumn("pr", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contrib = e.join(bc(state), col("src") === col("id"))
        .select(col("dst").as("id"),
          lit(null).cast("double").as("strength"),
          (col("pr") * col("w") / col("strength")).as("c"))
      val seedZero = state.select(col("id"), col("strength"),
        lit(0.0).as("c"))
      val next = contrib.union(seedZero)
        .groupBy(col("id"))
        .agg(max(col("strength")).as("strength"),
          (lit(teleport) + lit(damping) * sum(col("c"))).as("pr"))
      state = loop.advance(next, forceCheckpoint = i == iterations)
    }
    loop.handoff().select(col("id"), col("pr"))
  }

  /** Personalized PageRank (the random-walk-with-restart variant of
    * [[pageRank]]): restart mass returns to a SEED set instead of the
    * uniform vector, so scores measure proximity to the seeds — the
    * seed-expansion primitive (find pages "like these trusted ones",
    * grow a curated domain list, rank candidates around flagged nodes;
    * the local-community use from Andersen/Chung/Lang FOCS'06).
    *
    * `pr'(v) = (1−d)·r(v) + d·Σ_{u→v} pr(u)/outdeg(u)`, with
    * `r(v) = 1/|S|` for seeds and 0 elsewhere; `pr₀ = r`. Seeds outside
    * the graph's node set are ignored (their restart mass is
    * renormalized over the seeds actually present). Shares [[pageRank]]'s
    * stated simplification — dangling nodes leak their mass — and its
    * scale shape: node-grain state, one edge-vs-rank join plus one
    * dst-grain aggregate per sweep, stats-driven broadcast of the rank
    * side below `broadcastNodesBelow`, every sweep materialized and its
    * predecessor released, final sweep localCheckpointed. Unlike
    * [[pageRank]] the rank vector is SPARSE early on (only the seeds'
    * out-neighborhoods are nonzero) — rows stay node-grain here for
    * plan-shape parity with the oracle; a push-style frontier variant
    * (omit zero rows, the [[bfsDistances]] shape) is the further
    * optimization when |S| ≪ |V| and sweeps are few.
    *
    * CACHING CONTRACT ([[IterativeLoop]]): same as [[pageRank]] — every
    * operator-held block released before return, self-contained
    * localCheckpoint result, lineage truncated every `checkpointEvery`
    * sweeps so long iteration budgets keep O(1) analysis cost per sweep.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, idCol: String, iterations: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = 1,
      broadcastNodesBelow: Long = 2_000_000L): DataFrame = {
    require(iterations >= 1, s"need >=1 iteration, got $iterations")
    val loop = new IterativeLoop(checkpointEvery)
    val e0 = loop.pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val e = compactPinned(loop, e0, e0.count())
    // fused (id, deg, r) node table: out-degree from the endpoint
    // explode (the pageRank fusion), restart flag from a broadcast
    // semi-ish left join against the (tiny, deduped) seed set
    val seedSet = seeds.select(col(idCol).cast("long").as("_sid")).distinct()
    val nodeDeg = loop.pin(e.select(explode(array(
        struct(col("src").as("id"), lit(1L).as("o")),
        struct(col("dst").as("id"), lit(0L).as("o")))).as("x"))
      .select(col("x.id").as("id"), col("x.o").as("o"))
      .groupBy(col("id")).agg(sum(col("o")).cast("double").as("deg"))
      .join(broadcast(seedSet), col("id") === col("_sid"), "left_outer")
      .withColumn("_isSeed", col("_sid").isNotNull).drop("_sid"))
    val n = nodeDeg.count().toDouble
    val k = nodeDeg.filter(col("_isSeed")).count().toDouble
    if (k == 0) { // release the pinned caches before surfacing the error
      loop.abort()
      throw new IllegalArgumentException("no seed is present in the graph")
    }
    def bc(df: DataFrame): DataFrame =
      if (n <= broadcastNodesBelow) broadcast(df) else df
    // sweep state carries the loop-invariant node columns (deg, r) and
    // every node seeds the aggregate with an exact-zero contribution —
    // the pageRank sweep-slimming shape (round 20): one broadcast, one
    // exchange, zero node-grain joins per sweep. (1−d)·r + d·(sum+0.0)
    // is bit-identical to the old coalesce-floor join for every node.
    var state = nodeDeg.select(col("id"), col("deg"),
      when(col("_isSeed"), lit(1.0 / k)).otherwise(lit(0.0)).as("r"))
      .withColumn("pr", col("r"))
    for (i <- 1 to iterations) {
      val contrib = e.join(bc(state), col("src") === col("id"))
        .select(col("dst").as("id"),
          lit(null).cast("double").as("deg"),
          lit(null).cast("double").as("r"),
          (col("pr") / col("deg")).as("c"))
      val seedZero = state.select(col("id"), col("deg"), col("r"),
        lit(0.0).as("c"))
      val next = contrib.union(seedZero)
        .groupBy(col("id"))
        .agg(max(col("deg")).as("deg"), max(col("r")).as("r"),
          (lit(1.0 - damping) * max(col("r")) +
            lit(damping) * sum(col("c"))).as("pr"))
      state = loop.advance(next, forceCheckpoint = i == iterations)
    }
    loop.handoff().select(col("id"), col("pr"))
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected edge list (self-loops and duplicate/reversed edges are
    * canonicalized away first).
    *
    * Algorithm: the degree-ordered wedge join (Cohen 2009; Suri &
    * Vassilvitskii WWW'11 "Counting triangles and the curse of the last
    * reducer"). Every edge is oriented from its lower-ranked endpoint to
    * its higher-ranked one under the total order (degree, id); wedges
    * are enumerated by self-joining the oriented list on the apex and
    * closed against the oriented list itself. Orienting by DEGREE is
    * the load-balancing step: a node's oriented out-degree is O(√m)
    * regardless of its real degree, so a celebrity node with 10M
    * neighbors contributes O(m) wedges, not O(10M²) — without it the
    * apex self-join on a skewed graph melts the one reducer holding the
    * hub ("the curse of the last reducer").
    *
    * Scale shape: degrees are one groupBy over the edge list; the rank
    * attach is two node-grain joins; the wedge enumeration is one
    * self-join on the apex and the closing check one equi-join on the
    * (lo, hi) pair — all shuffle-partitioned equi-joins, never a cross
    * product. Intermediate wedge volume is Σ outdeg² ≤ O(m^1.5), the
    * known optimum for exact listing. Per-node counts come from
    * exploding each triangle's three corners (3 rows per triangle)
    * into ONE final groupBy.
    *
    * Returns (id, deg, tri, lcc) for every node of degree ≥ 1, where
    * `lcc = 2·tri / (deg·(deg−1))` and nodes of degree 1 get lcc 0.0.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    // canonical undirected edge set: u < v, deduped, no self-loops
    val canon = raw.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = canon.select(col("u").as("id"))
      .union(canon.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient each edge lower rank -> higher rank under (deg, id); the
    // rank is packed into one long (deg << 32 | id-dense is overkill —
    // a struct compare keeps it readable and Catalyst-native)
    val du = deg.select(col("id").as("u"), struct(col("deg"), col("id")).as("ru"))
    val dv = deg.select(col("id").as("v"), struct(col("deg"), col("id")).as("rv"))
    val oriented = canon.join(du, "u").join(dv, "v")
      .select(
        when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("lo"),
        when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("hi"),
        when(col("ru") < col("rv"), col("rv")).otherwise(col("ru")).as("rhi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges at apex a: two oriented edges (a,b) (a,c) with rank(b) < rank(c);
    // the closing undirected edge {b,c} is then oriented exactly (b,c)
    val e1 = oriented.select(col("lo").as("a"), col("hi").as("b"), col("rhi").as("rb"))
    val e2 = oriented.select(col("lo").as("a"), col("hi").as("c"), col("rhi").as("rc"))
    val wedges = e1.join(e2, "a").filter(col("rb") < col("rc"))
    val tris = wedges.join(
        oriented.select(col("lo").as("b"), col("hi").as("c")), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
    val triCount = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("tri"))
    deg.join(triCount, Seq("id"), "left_outer")
      .select(col("id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("tri"), lit(0L)) /
            (col("deg") * (col("deg") - lit(1)))).as("lcc"))
  }

  /** Common-neighbor / Adamic–Adar link prediction (Liben-Nowell &
    * Kleinberg CIKM 2003; Adamic & Adar 2003): score every NON-adjacent
    * node pair that shares at least one neighbor by
    * `CN(u,v) = |Γ(u)∩Γ(v)|` and
    * `AA(u,v) = Σ_{z∈Γ(u)∩Γ(v)} 1/ln(deg(z))` — rare shared neighbors
    * count more than hubs. The who-will-trade-next / which-docs-will-
    * link primitive next to [[triangles]] (which scores edges that
    * exist; this scores edges that don't, yet).
    *
    * ENGINE-EXACT: each center's `1/ln(deg)` quantizes to integer
    * MICRO-units (round-6 micro-nat ln first — the shared libm
    * discipline — then one IEEE divide of identical operands, rounded
    * half away from zero), so `aa_micro` is an order-free integer sum
    * and the ranking is an exact integer sort in any engine. `deg ≥ 2`
    * for any wedge center (it has two distinct neighbors), so
    * `ln(deg) ≥ ln 2 > 0` — no division guard needed.
    *
    * `maxDegree` caps which nodes may act as the SHARED neighbor z: a
    * hub's wedge fanout is deg² while its AA contribution is the
    * smallest possible (1/ln(deg) → 0), so production AA always caps
    * (the approximation is explicit, never silent — excluded centers
    * contribute to neither CN nor AA, and the oracle applies the same
    * cap). At the default 1000, one skewed key costs ≤ 10⁶ wedge rows.
    *
    * Scale shape: canonical undirected edges (one distinct), one
    * node-grain degree aggregate, then ONE self-equi-join keyed by the
    * center z (per-key fanout ≤ maxDegree², the documented knob) into
    * a (u,v)-grain map-combined aggregate, and one anti-join against
    * the edge set to drop already-adjacent pairs. Nothing quadratic in
    * the GRAPH — only in the capped per-center degree.
    *
    * @return (u, v, cn, aa_micro, aa) per candidate pair, u < v;
    *         callers top-k on the exact integer `aa_micro`.
    */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Long = 1000L): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    val canon = canonUndirected(edges, srcCol, dstCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = coreDegrees(canon).withColumnRenamed("core_deg", "deg")
    // micro-quantized 1/ln(deg) per eligible center
    val lnq = round(log(col("deg").cast("double")) * 1e6)
      .cast("long").cast("double") / 1e6
    val centers = deg.filter(col("deg") >= 2 && col("deg") <= maxDegree)
      .select(col("id").as("z"), round(lit(1e6) / lnq).cast("long").as("inv"))
    val adj = canon.select(col("u").as("z"), col("v").as("n"))
      .union(canon.select(col("v").as("z"), col("u").as("n")))
      .join(centers, Seq("z"))
    val wedges = adj.select(col("z"), col("n").as("wu"), col("inv"))
      .join(adj.select(col("z"), col("n").as("wv")), Seq("z"))
      .filter(col("wu") < col("wv"))
    val pairs = wedges.groupBy(col("wu").as("u"), col("wv").as("v"))
      .agg(count(lit(1)).as("cn"), sum(col("inv")).as("aa_micro"))
    // canon stays persisted for the three consumers (adj twice, the
    // anti-join); Caches.sweep releases it, the triangles contract
    pairs.join(canon, Seq("u", "v"), "left_anti")
      .select(col("u"), col("v"), col("cn"), col("aa_micro"),
        round(col("aa_micro").cast("double") / 1e6, 6).as("aa"))
  }

  /** Graph diameter LOWER BOUND by the classic double BFS sweep
    * (Magnien, Latapy & Habib 2009; exact on trees, and in practice
    * tight on real-world graphs — the iFUB family builds on exactly
    * this): BFS from a deterministic start (the smallest node id),
    * take the farthest node reached (ties to the smallest id), BFS
    * again from there — the second eccentricity is a certified lower
    * bound on the undirected diameter, at the cost of exactly TWO BFS
    * runs where the exact diameter needs |V|. The "how wide is this
    * crawl graph" diagnostic next to [[bfsDistances]].
    *
    * HONEST under the hop budget: each sweep's `converged` flag is
    * true only when its eccentricity came in strictly under `maxHops`
    * (a sweep that touched the budget may have been truncated, so the
    * bound could be an UNDER-estimate — the flags say so rather than
    * hiding it). Unreachable components are invisible to a sweep by
    * construction (a bound from one component; that is what "lower
    * bound" means). Edges canonicalize undirected first. All integer
    * hop math — engine-exact trivially.
    *
    * Scale shape: two [[bfsDistances]] runs (per hop: one frontier
    * equi-join + distinct + anti-join, frontier broadcast below its
    * bound) plus THREE bounded driver actions (min-id start, the 1-row
    * farthest argmax, the 1-row eccentricity max — the BPE-argmax
    * bounded-driver contract).
    *
    * @return ONE row: (start, ecc_start, start_converged, far,
    *         ecc_far, far_converged, diameter_lb); EMPTY on an
    *         edgeless graph.
    */
  def diameterLowerBound(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 16): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val spark = edges.sparkSession
    val canon = canonUndirected(edges, srcCol, dstCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persist + compact once so BOTH sweeps inherit the few-partition
    // cache (the compactPinned rationale) instead of re-deriving sym
    // from canon and recaching per sweep; released IN-FUNCTION before
    // every return (the diameterBounds/distanceDistribution cleanup
    // discipline — ADVICE r15: leaving the release to an external
    // Caches.sweep accumulated persisted edge copies across repeated
    // library calls). Safe because every returned value below is a
    // driver-collected literal — nothing lazy still reads the caches.
    val sym = compactPersisted(canon.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")))
    def release(): Unit = { sym.unpersist(); canon.unpersist() }
    val schema = "start long, ecc_start long, start_converged boolean, " +
      "far long, ecc_far long, far_converged boolean, diameter_lb long"
    val startRow = canon.agg(min(col("u")).as("s")).collect()(0)
    if (startRow.isNullAt(0)) {
      release()
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    }
    val start = startRow.getLong(0)
    def sweep(from: Long): (Long, Long) = {
      val d = bfsDistances(sym, "src", "dst",
        spark.range(from, from + 1).select(col("id")), "id", maxHops)
      // farthest node, ties to the smallest id — one 1-row action
      val top = d.orderBy(col("dist").desc, col("id")).limit(1).collect()(0)
      (top.getLong(0), top.getLong(1))
    }
    val (far, eccStart) = sweep(start)
    val (_, eccFar) = sweep(far)
    release()
    spark.range(1).select(lit(start).as("start"),
      lit(eccStart).as("ecc_start"),
      lit(eccStart < maxHops).as("start_converged"),
      lit(far).as("far"), lit(eccFar).as("ecc_far"),
      lit(eccFar < maxHops).as("far_converged"),
      lit(eccFar).as("diameter_lb"))
  }

  /** Graph diameter BRACKET by iFUB (iterative Fringe Upper Bound —
    * Crescenzi, Grossi, Habib, Lanzi & Marino, TCS 2013), closing the
    * [[diameterLowerBound]] bracket from above: BFS from a hub root r,
    * then sweep the BFS tree's fringes top-down — after ALL nodes at
    * depth ≥ i have had their eccentricity measured, every remaining
    * node sits at depth ≤ i−1 and no path through the root can exceed
    * 2(i−1), so `ub = 2(i−1)` while `lb` carries the max eccentricity
    * seen; the loop stops when they meet, CERTIFYING the exact diameter
    * of the root's component. On real-world (small-world) graphs the
    * bracket closes within a few fringe levels — the paper's point —
    * where the exact diameter naively needs |V| BFS runs.
    *
    * Root choice: the MAX-DEGREE node (ties to the smallest id) — the
    * iFUB-hd variant; hubs have small eccentricity, and a small
    * `ecc(r)` is both a tight initial `ub = 2·ecc(r)` and few levels.
    * `far` is the farthest node of r's BFS tree (ties to the smallest
    * id); its eccentricity — the double-sweep lower bound — is NOT a
    * separate BFS: `far` sits in the DEEPEST fringe (depth `ecc(r)`),
    * so the first fringe sweep measures `ecc(far)` as one of its
    * per-landmark maxima and `lb` absorbs it with the rest of the
    * level (the round-14 verdict's duplicated-sweep fix — the old
    * dedicated far-BFS re-ran exactly what the first level expansion
    * computes). Only a run truncated BEFORE that first sweep pays a
    * fallback far-BFS to honor the `ecc_far` output column — and only
    * when the `maxSweeps` budget still has room for it: `n_sweeps`
    * NEVER exceeds `maxSweeps` (the budget is total), so a run whose
    * budget is already spent reports `ecc_far` NULL instead of
    * over-spending one sweep to measure it.
    *
    * HONEST under its budgets, the q146 discipline: `converged` is
    * true exactly when the bracket CLOSED (lb == ub) with a COMPLETE
    * root sweep — lb is always a certified lower bound (observed
    * distances are genuine), and ub only ever holds certified values
    * (the initial 2·ecc(root), valid iff the root BFS finished under
    * `maxHops`, plus complete-sweep updates — a hop-truncated sweep
    * keeps the pre-sweep ub rather than claiming the under-measured
    * 2(i−1)), so a closed bracket is a certificate even when a fringe
    * exceeded `fringeCap` (fringe node ids collect to the driver as
    * landmark seeds — the bounded-driver contract needs a cap) or the
    * `maxSweeps` budget ran out. A run stopped with lb < ub returns
    * the valid bracket held at stop time with `diameter` null.
    * Disconnected graphs:
    * the bracket is for the ROOT'S component (a BFS cannot see other
    * components — q146's "that is what lower bound means" stance).
    * All hop math is integer — engine-exact trivially.
    *
    * Scale shape: 1 + Σ|fringe| BFS sweeps (the root BFS, then the
    * fringes — the double sweep's second BFS rides the first fringe
    * level), but each LEVEL runs as ONE [[landmarkDistances]] frontier
    * expansion ((landmark, id)-grain state, ≤ fringeCap× the
    * single-source cost) — per hop one equi-join + distinct +
    * anti-join, frontier broadcast below bound; plus TWO bounded
    * driver actions per level (fringe ids ≤ fringeCap, then ONE 1-row
    * read of the level's max eccentricity + far's own).
    *
    * @return ONE row: (root, ecc_root, far, ecc_far, lb, ub, n_sweeps,
    *         n_levels, converged, diameter) — diameter null unless
    *         converged; EMPTY frame on an edgeless graph.
    */
  def diameterBounds(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 32, maxSweeps: Int = 4096,
      fringeCap: Int = 4096): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    require(maxSweeps >= 3, s"maxSweeps must be >= 3, got $maxSweeps")
    require(fringeCap >= 1, s"fringeCap must be >= 1, got $fringeCap")
    val spark = edges.sparkSession
    val canon = canonUndirected(edges, srcCol, dstCol)
    // compact ONCE here so the root BFS and every fringe-level landmark
    // expansion inherit the few-partition cache instead of each paying
    // its own recache (the compactPinned rationale; inner loops see ≤
    // compactParts partitions and skip)
    val sym = compactPersisted(canon.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")))
    val schema = "root long, ecc_root long, far long, ecc_far long, " +
      "lb long, ub long, n_sweeps long, n_levels long, " +
      "converged boolean, diameter long"
    def emptyResult = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
    // hub root: max degree, ties to the smallest id — one 1-row action
    val rootRow = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src")).limit(1).collect()
    if (rootRow.isEmpty) { sym.unpersist(); return emptyResult }
    val root = rootRow(0).getLong(0)
    // root BFS: the level structure every fringe sweep keys off
    val dRoot = bfsDistances(sym, "src", "dst",
        spark.range(root, root + 1).select(col("id")), "id", maxHops)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val farRow = dRoot.orderBy(col("dist").desc, col("id")).limit(1).collect()(0)
    val (far, eccRoot) = (farRow.getLong(0), farRow.getLong(1))
    // ecc(far) is measured by the FIRST fringe sweep (far is in the
    // deepest fringe by construction) — never a dedicated BFS unless
    // the run truncates before that sweep (fallback below)
    var eccFar = -1L
    var truncated = eccRoot >= maxHops
    var lb = eccRoot
    var ub = 2 * eccRoot
    var sweeps = 1L
    var levels = 0L
    var i = eccRoot
    while (lb < ub && i >= 1 && !truncated) {
      val fringeRows = dRoot.filter(col("dist") === i)
        .select(col("id")).limit(fringeCap + 1).collect()
      if (fringeRows.length > fringeCap ||
          sweeps + fringeRows.length > maxSweeps) {
        truncated = true // budget exceeded: keep the bracket, say so
      } else {
        val fringe = fringeRows.map(_.getLong(0)).toSeq
        // one multi-source expansion measures every fringe node's
        // eccentricity simultaneously — level cost ≈ one BFS, not |F_i|
        val eccPer = landmarkDistances(sym, "src", "dst", fringe, maxHops)
          .groupBy(col("landmark")).agg(max(col("dist")).as("ec"))
        // ONE 1-row action reads both loop scalars: the level's max
        // eccentricity AND (deepest level only) far's own — the
        // double-sweep bound rides the expansion it would duplicate
        val top = eccPer.agg(max(col("ec")).as("b"),
          max(when(col("landmark") === lit(far), col("ec"))).as("ef"))
          .collect()(0)
        val eccTop = top.getLong(0)
        if (i == eccRoot) eccFar = top.getLong(1)
        sweeps += fringe.length
        levels += 1
        // observed distances are genuine distances, so lb may always
        // absorb them; the ub step is certified ONLY by a complete
        // sweep — a hop-truncated one under-measures the fringe's max
        // eccentricity, and 2(i-1) would then be an INVALID upper
        // bound (the diameter can exceed it through the truncated
        // tail), so the pre-sweep bracket is kept and announced
        lb = math.max(lb, eccTop)
        if (eccTop >= maxHops) truncated = true
        else {
          ub = if (lb >= 2 * (i - 1)) lb else 2 * (i - 1)
          i -= 1
        }
      }
    }
    if (eccFar < 0 && sweeps < maxSweeps) {
      // truncated before the deepest fringe swept: pay the dedicated
      // far-BFS only on this rare path so ecc_far stays a MEASURED
      // value (root-truncated runs, over-cap deepest fringes) — and
      // only while the sweep budget has room for it (ADVICE r15: the
      // unguarded fallback could report n_sweeps > maxSweeps, breaking
      // the docstring's total-budget contract); with the budget
      // exhausted, ecc_far stays NULL below rather than over-spending
      eccFar = bfsDistances(sym, "src", "dst",
          spark.range(far, far + 1).select(col("id")), "id", maxHops)
        .agg(max(col("dist"))).collect()(0).getLong(0)
      sweeps += 1
      lb = math.max(lb, eccFar)
      if (eccFar >= maxHops) truncated = true
    }
    sym.unpersist()
    dRoot.unpersist()
    // Certification rule: lb is ALWAYS a valid lower bound (every
    // observed distance is genuine), and ub only ever holds CERTIFIED
    // values — the initial 2·ecc(root) (valid iff the root BFS
    // finished under maxHops) and complete-sweep updates. So a CLOSED
    // bracket certifies whenever the root sweep was complete,
    // REGARDLESS of fringe-cap/budget truncation: a star whose one
    // fringe exceeds fringeCap still certifies from the seed
    // eccentricities alone (lb = ecc_far = 2 = ub), and a
    // hop-truncated fringe sweep whose genuine distances already meet
    // ub closes the bracket too (the r15 self-review fix — the old
    // !truncated guard threw away certificates both bounds had earned).
    val converged = lb == ub && eccRoot < maxHops
    spark.range(1).select(lit(root).as("root"),
      lit(eccRoot).as("ecc_root"), lit(far).as("far"),
      // ecc_far is NULL only when the sweep budget ran out before far's
      // eccentricity was ever measured (fallback skipped above)
      (if (eccFar >= 0) lit(eccFar) else lit(null).cast("long"))
        .as("ecc_far"), lit(lb).as("lb"), lit(ub).as("ub"),
      lit(sweeps).as("n_sweeps"), lit(levels).as("n_levels"),
      lit(converged).as("converged"),
      (if (converged) lit(lb) else lit(null).cast("long")).as("diameter"))
  }

  /** Pairwise hop-distance DISTRIBUTION with effective-diameter flags —
    * the neighborhood-function family (Palmer, Gibbons & Faloutsos' ANF
    * quantity; the "how far apart is this graph, typically" diagnostic
    * that complements [[diameterLowerBound]]'s worst case): for every
    * ordered pair (u, v), u ≠ v, reachable within `maxHops` on the
    * symmetrized graph, bucket d(u, v) and emit one row per distance
    * with the count, the running cumulative, and the cumulative SHARE
    * in exact integer micro-units — `eff_90` marks the effective
    * diameter (the smallest distance covering ≥ 90% of reachable
    * pairs, the standard ANF/HyperANF readout).
    *
    * Exact vs sampled: `sampleEvery = 1` measures ALL sources — the
    * exact distribution (what the gate pins against a full recursive
    * SQL replay). At scale exactness is |V| BFS runs; the standard
    * estimator (Eppstein & Wang 2004) samples sources — here the
    * DETERMINISTIC sample `id % sampleEvery == 0` (engine-replayable,
    * no RNG), whose distribution is exact over the sampled source
    * rows, an unbiased estimate of the full one for id-independent
    * structure. The landmark list rides the driver (the fringeCap
    * bounded-driver contract): `maxLandmarks` caps it loudly — sample
    * harder rather than silently truncate.
    *
    * ENGINE-EXACT: hop math is integer; the cumulative share is
    * `(cum·1e6) div total` — exact long integer division in both
    * engines (envelope: cum·1e6 must fit a long, i.e. < ~9.2e12
    * sampled pairs; ANSI throws loudly past it).
    *
    * Scale shape: ONE [[landmarkDistances]] expansion over the sample
    * (k× the single-source cost, driver fast path under its bounds —
    * q161's gate raises `driverFrontierBelow` explicitly since its
    * pair-state is small even where |landmarks|·|edges| is not), a
    * (landmark, id)-grain distance aggregate into ≤ maxHops dist-grain
    * rows, and windows over those rows only.
    *
    * @return (dist, n_pairs, cum_pairs, total_pairs, cum_share_micro,
    *         eff_90) ordered by dist; EMPTY on an edgeless graph.
    */
  def distanceDistribution(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int, sampleEvery: Int = 1, maxLandmarks: Int = 65536,
      driverFrontierBelow: Long = 1_000_000L): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    require(sampleEvery >= 1, s"sampleEvery must be >= 1, got $sampleEvery")
    require(maxLandmarks >= 1, s"maxLandmarks must be >= 1, got $maxLandmarks")
    val spark = edges.sparkSession
    val canon = canonUndirected(edges, srcCol, dstCol)
    // persist + compact once: the sample collect and the landmark
    // expansion's pin both read sym — unpersisted they would each
    // re-derive the whole canonicalize+symmetrize chain from source
    val sym = compactPersisted(canon.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")))
    val schema = "dist long, n_pairs long, cum_pairs long, " +
      "total_pairs long, cum_share_micro long, eff_90 boolean"
    val lmRows = sym.select(col("src").as("id")).distinct()
      .filter(pmod(col("id"), lit(sampleEvery.toLong)) === 0)
      .orderBy(col("id")).limit(maxLandmarks + 1).collect()
    require(lmRows.length <= maxLandmarks,
      s"source sample exceeds maxLandmarks=$maxLandmarks — raise " +
        "sampleEvery (the bounded-driver contract: the sample list " +
        "rides the driver)")
    if (lmRows.isEmpty) {
      sym.unpersist()
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    }
    val landmarks = lmRows.map(_.getLong(0)).toSeq
    val dists = landmarkDistances(sym, "src", "dst", landmarks, maxHops,
      driverFrontierBelow = driverFrontierBelow)
    // the expansion result is self-contained (driver LocalRelation or
    // checkpoint) — sym's blocks are no longer referenced
    sym.unpersist()
    val dd = dists.filter(col("dist") > 0)
      .groupBy(col("dist")).agg(count(lit(1)).as("n_pairs"))
    import org.apache.spark.sql.expressions.Window
    val byDist = Window.orderBy(col("dist"))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dd.select(col("dist"), col("n_pairs"),
        sum(col("n_pairs")).over(byDist).as("cum_pairs"),
        sum(col("n_pairs")).over(all).as("total_pairs"))
      .withColumn("_prev", lag(col("cum_pairs"), 1).over(byDist))
      .select(col("dist"), col("n_pairs"), col("cum_pairs"),
        col("total_pairs"),
        expr("(cum_pairs * 1000000L) div total_pairs").as("cum_share_micro"),
        (expr("(cum_pairs * 1000000L) div total_pairs") >= 900000L &&
          coalesce(expr("(_prev * 1000000L) div total_pairs") < 900000L,
            lit(true))).as("eff_90"))
      .orderBy(col("dist"))
  }

  /** Newman modularity of a given partition (Newman & Girvan 2004,
    * eq. 5): `Q = Σ_c [ e_c/m − (d_c/2m)² ]` over an undirected graph —
    * how much denser are the communities than a degree-preserving
    * random rewiring? The partition-QUALITY meter the engine's
    * community producers ([[labelPropagation]], [[connectedComponents]])
    * feed: LPA gives you labels, modularity tells you whether they mean
    * anything.
    *
    * ENGINE-EXACT: clearing denominators by 4m² gives
    * `Q·4m² = Σ_c (4m·e_c − d_c²)` — every term an exact long (ANSI
    * throws loudly past ~1.5e9 edges in one community's degree mass;
    * shard or sample first at that scale), so `q` is ONE round-6 IEEE
    * division of identical operands in any engine.
    *
    * Edges with an endpoint missing from `labels` are EXCLUDED from the
    * scored graph and COUNTED in `n_dropped` — the approximation is
    * explicit, never silent. Degrees are computed on the kept subgraph,
    * so the identity Σ_c d_c = 2m holds exactly and the all-in-one
    * partition scores exactly 0.
    *
    * Scale shape: canonical undirected edges (one distinct), two
    * label-keyed equi-joins (labels at node grain — broadcastable when
    * the community map is small), then everything runs at COMMUNITY
    * grain: one (label)-count for e_c, one for d_c, a 1-row final
    * aggregate. No pair enumeration anywhere.
    *
    * @param labels (id, label) node-grain partition assignment.
    * @return ONE row: (m, n_dropped, n_communities, q_num, q_den, q);
    *         q null when the kept graph is empty.
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val canon = canonUndirected(edges, srcCol, dstCol)
    val lab = labels.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("lab"))
    val joined = canon
      .join(lab.select(col("id").as("u"), col("lab").as("lu")), Seq("u"), "left")
      .join(lab.select(col("id").as("v"), col("lab").as("lv")), Seq("v"), "left")
      .localCheckpoint(true)
    val kept = joined.filter(col("lu").isNotNull && col("lv").isNotNull)
    val dropped = joined.filter(col("lu").isNull || col("lv").isNull)
      .agg(count(lit(1)).as("n_dropped"))
    // community grain: intra-edge count and total degree mass
    val intra = kept.filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("c")).agg(count(lit(1)).as("e_c"))
    val degMass = kept
      .select(explode(array(col("lu"), col("lv"))).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("d_c"))
    val m1 = kept.agg(count(lit(1)).as("m"))
    val perC = degMass.join(intra, Seq("c"), "left")
      .select(col("c"), col("d_c"), coalesce(col("e_c"), lit(0L)).as("e_c"))
      .crossJoin(broadcast(m1))
    val summed = perC.agg(
      count(lit(1)).as("n_communities"),
      sum(lit(4L) * col("m") * col("e_c") - col("d_c") * col("d_c"))
        .as("q_num"))
    m1.crossJoin(broadcast(dropped)).crossJoin(broadcast(summed))
      .select(col("m"), col("n_dropped"),
        coalesce(col("n_communities"), lit(0L)).as("n_communities"),
        coalesce(col("q_num"), lit(0L)).as("q_num"),
        (lit(4L) * col("m") * col("m")).as("q_den"),
        when(col("m") > 0, round(coalesce(col("q_num"), lit(0L))
            .cast("double") /
          (lit(4L) * col("m") * col("m")).cast("double"), 6)).as("q"))
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007) over
    * a directed edge list, `sweeps` fixed rounds: every node starts
    * labeled with its own id; each round a node adopts the label held by
    * the PLURALITY of its in-neighbors, ties broken toward the smallest
    * label, and a node with no in-edges keeps its current label. The
    * crawl-pipeline use: cheap community detection over link graphs
    * (mirror clusters, template farms) where connected components are
    * too coarse — CC merges everything reachable, LPA splits a component
    * along its dense cores.
    *
    * Determinism: synchronous updates + the (count DESC, label ASC)
    * vote order make every round a pure function of the previous one —
    * no random node order (the paper's asynchronous variant), so a SQL
    * oracle can replay the exact trajectory. On bipartite graphs
    * synchronous LPA can oscillate between two label sets; a fixed sweep
    * budget samples a deterministic point of that trajectory, which is
    * what the gate pins.
    *
    * Scale shape: each sweep is ONE edge-against-labels equi-join plus
    * ONE (dst,label)-grain count aggregate plus ONE node-grain argmax
    * aggregate — the argmax rides `max(struct(cnt, -label))`, a partial-
    * aggregating hash agg, NOT a per-node sort window (no
    * row_number-over-skewed-partition hotspot when a hub node collects
    * millions of votes). Label state never exceeds node grain. Each
    * sweep is materialized and its predecessor released (the pageRank
    * iterative-replanning lesson); the final sweep is localCheckpointed
    * so the returned table is self-contained.
    *
    * CACHING CONTRACT ([[IterativeLoop]]): the edge/label caches are
    * operator-held and released before return; the returned table is a
    * self-contained localCheckpoint (blocks freed when it is GC'd or by
    * `graft.Caches.sweep`).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      sweeps: Int,
      broadcastLabelsBelow: Long = 2_000_000L): DataFrame = {
    require(sweeps >= 1, s"need >=1 sweep, got $sweeps")
    // checkpointEvery = 1, NOT the pageRank cadence: each sweep
    // references `lab` TWICE (the vote join and the keep-current
    // carry-forward), so an uncut logical plan DOUBLES per sweep —
    // 2^k subtree copies by sweep k (a 12-sweep run OOMed the driver
    // just STRINGIFYING the plan). Single-reference loops (pageRank,
    // PPR) grow linearly and can afford persist between checkpoints;
    // double-reference loops cannot.
    val loop = new IterativeLoop(checkpointEvery = 1)
    val e0 = loop.pin(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")))
    val e = compactPinned(loop, e0, e0.count())
    val nodes = loop.pin(
      e.select(explode(array(col("src"), col("dst"))).as("id")).distinct())
    val n = nodes.count()
    def bc(df: DataFrame): DataFrame =
      if (n <= broadcastLabelsBelow) broadcast(df) else df
    var lab = nodes.withColumn("label", col("id"))
    for (i <- 1 to sweeps) {
      val votes = e.join(bc(lab.select(col("id").as("src"), col("label"))), "src")
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
      // plurality with min-label tie-break as ONE agg via the
      // bounded-heap aggregate (TopKAgg k=1 — highest count, ties to
      // the lowest label; cnt is exact in double far below 2^53). The
      // former max(struct(cnt, -label)) had an immutable struct buffer,
      // which forces SortAggregate — a sort of the (node, label) vote
      // grain every sweep (the round-16 IVF-family finding)
      val winner = votes.groupBy(col("dst"))
        .agg(graft.functions.TopKAgg.top_k_by(
          col("cnt").cast("double"), col("label"), 1).as("w"))
        .select(col("dst").as("id"),
          element_at(col("w.id"), 1).as("label_new"))
      val next = lab.join(bc(winner), Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("label_new"), col("label")).as("label"))
      lab = loop.advance(next, forceCheckpoint = i == sweeps)
    }
    loop.handoff()
  }

  /** Recache a pinned SMALL edge set at [[compactParts]] partitions:
    * hop-dominated loops relaunch tasks over the edge cache EVERY hop,
    * so its partition count is a per-hop fixed cost — a 24k-edge sf0.1
    * graph at the session's 32 shuffle partitions measured 4.98s for a
    * 9-hop sweep vs 2.70s recached at 4 (q146's shape). The compact
    * copy is materialized and the RAW pin released immediately (in that
    * order — the repartition reads the raw cache), so edge blocks are
    * never held twice for the loop's lifetime. Above the bound, or
    * already compact, the layout is untouched — at scale this is a
    * no-op. */
  private val compactEdgesBelow = 1_000_000L
  private val compactParts = 4
  private def compactPinned(loop: IterativeLoop, e0: DataFrame,
      n: Long): DataFrame =
    if (n <= compactEdgesBelow && e0.rdd.getNumPartitions > compactParts) {
      val c = loop.pin(e0.repartition(compactParts))
      c.count()
      loop.releasePin(e0)
      c
    } else e0

  /** [[compactPinned]] for NON-loop frames (the diameter operators'
    * symmetrized edge sets, q161's sample source): persist `raw`,
    * recache at [[compactParts]] when small, release the raw copy —
    * the caller owns (and must eventually unpersist) the returned
    * frame. */
  private def compactPersisted(raw: DataFrame): DataFrame = {
    val p = raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (p.count() <= compactEdgesBelow &&
        p.rdd.getNumPartitions > compactParts) {
      val c = p.repartition(compactParts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      p.unpersist()
      c
    } else p
  }

  /** Multi-source BFS hop distances over a directed edge list (the
    * Pregel frontier-expansion shape): every node reachable from any
    * source within `maxHops` gets its MINIMUM hop count (sources at 0).
    * The crawl-pipeline use: seed-distance features (how far a page
    * sits from trusted seeds — TrustRank-style) and bounded
    * neighborhood extraction around flagged nodes.
    *
    * Scale shape: each hop joins the FRONTIER (newly reached nodes
    * only, never the whole visited set) against the edge list — one
    * node-grain equi-join + distinct + anti-join per hop, so total work
    * is O(edges touched by expansion), the BFS optimum. Early exit on
    * an empty frontier. Each hop's frontier is materialized and the
    * superseded one released (the pageRank iterative-plan lesson);
    * `visited` is rebuilt as a union of ≤maxHops node-grain frontiers
    * (broadcast into the anti-join below the bound), localCheckpointed
    * on exit so the returned table is self-contained.
    *
    * TWO EXECUTION PATHS, one semantics (spec-pinned equal): a graph at
    * or under `driverFrontierBelow` edges — PROVIDED the distinct
    * source set also fits the same bound — runs the hop loop with
    * DRIVER-RESIDENT frontier/visited sets (node-grain longs — the
    * bounded-driver contract; the edges stay cached on the cluster and
    * each hop is one InSet-filtered job), because at that size the
    * distributed loop's per-hop fixed costs (checkpoint job, broadcast
    * builds, exchange) dominate by ~10×. Above either bound — the
    * 100 TB regime, or a huge seed set over a small graph — the
    * distributed frontier loop runs unchanged.
    *
    * CACHING CONTRACT ([[IterativeLoop]]): edge set + every hop's
    * frontier persist during the loop (frontiers are `keep`s, not
    * `advance`s — each layer survives to the final union); all
    * operator-held blocks are released before return (the returned
    * table is localCheckpoint state, freed on GC or `Caches.sweep`).
    */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, idCol: String, maxHops: Int,
      broadcastFrontierBelow: Long = 2_000_000L,
      driverFrontierBelow: Long = 1_000_000L): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val loop = new IterativeLoop()
    val e0 = loop.pin(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")))
    val nE = e0.count()
    // SMALL-GRAPH fast path: a ≤driverFrontierBelow-edge graph's BFS is
    // dominated by per-hop FIXED costs in the distributed loop (a
    // checkpoint job + two broadcast builds + a distinct exchange per
    // hop — ~0.3s/hop regardless of data; q146's 24k-edge sf0.1 sweep
    // measured 4.98s for 9 hops). Here the frontier and visited sets
    // ride the DRIVER (node-grain longs, bounded by the node count of a
    // ≤1M-edge graph — the iFUB fringeCap bounded-driver contract) and
    // each hop is ONE job over the cached compacted edge partitions: an
    // InSet frontier filter + distinct + collect of the new layer. The
    // EDGES never leave the cluster; semantics are identical (the spec
    // pins both paths equal on the same graphs) and above the bound the
    // distributed frontier loop below runs unchanged — at 100 TB this
    // branch never fires.
    val e = compactPinned(loop, e0, nE)
    if (nE <= driverFrontierBelow) {
      val spark = edges.sparkSession
      import spark.implicits._
      // the SEED set must fit the same driver bound: collect one row
      // past it and fall back to the distributed loop when exceeded —
      // a huge source table over a small graph must not OOM the driver
      // (the edge bound alone says nothing about |sources|)
      val lim = (math.min(driverFrontierBelow, Int.MaxValue - 2L) + 1L).toInt
      val srcRows = sources.select(col(idCol).cast("long").as("id"))
        .distinct().limit(lim).collect()
      if (srcRows.length <= driverFrontierBelow) {
        try {
          var frontier = srcRows.map(_.getLong(0))
          val visited = scala.collection.mutable.HashSet.empty[Long]
          visited ++= frontier
          val layers = scala.collection.mutable.ListBuffer.empty[(Long, Array[Long])]
          layers += ((0L, frontier))
          var hop = 1
          while (hop <= maxHops && frontier.nonEmpty) {
            val next = e.filter(col("src").isInCollection(frontier.toSeq))
              .select(col("dst")).distinct()
              .collect().map(_.getLong(0)).filterNot(visited)
            visited ++= next
            if (next.nonEmpty) layers += ((hop.toLong, next))
            frontier = next
            hop += 1
          }
          return spark.createDataset(
            layers.toSeq.flatMap { case (d, ids) => ids.map(id => (id, d)) })
            .toDF("id", "dist")
        } finally loop.abort()
      }
    }
    var (frontier, frontierSize) = loop.keep(
      sources.select(col(idCol).cast("long").as("id")).distinct())
    var layers = List(frontier.withColumn("dist", lit(0L)))
    var visitedSize = frontierSize
    var hop = 1
    while (hop <= maxHops && frontierSize > 0) {
      // stats-driven build side from the count the materialization just
      // paid for: a below-bound frontier broadcasts into the edge join
      // (the edge set never shuffles — the textbook BFS-on-MapReduce
      // move); a huge frontier falls back to the shuffle join. The
      // visited anti-join gets the same treatment from the layer counts
      // already paid for: a below-bound visited set broadcasts, so the
      // expansion's only exchange is the distinct — on hop-dominated
      // small-world graphs the per-hop fixed cost is the whole game
      // (the q146/q157 bench rows), and one stage per hop is the floor
      val f = frontier.withColumnRenamed("id", "src")
      val visited = layers.map(_.select(col("id"))).reduce(_ union _)
      val (next, nextSize) = loop.keep(e.join(
          if (frontierSize <= broadcastFrontierBelow) broadcast(f) else f,
          "src")
        .select(col("dst").as("id")).distinct()
        // min-dist semantics: a node joins the BFS tree at its FIRST
        // frontier appearance; later paths must not re-add it
        .join(
          if (visitedSize <= broadcastFrontierBelow) broadcast(visited)
          else visited,
          Seq("id"), "left_anti"))
      frontierSize = nextSize
      visitedSize += nextSize
      if (frontierSize > 0) layers ::= next.withColumn("dist", lit(hop.toLong))
      frontier = next
      hop += 1
    }
    loop.finish(layers.reduce(_ union _))
  }

  /** Per-landmark BFS hop distances (the landmark/sketch-based
    * shortest-path estimation scheme of Potamias, Bonchi, Castillo &
    * Gionis CIKM 2009): one frontier expansion computes, for EVERY
    * landmark simultaneously, the exact hop distance from that landmark
    * to each node it reaches within `maxHops`. The per-node distance
    * vector is the graph embedding large-graph systems precompute so a
    * pairwise distance query becomes `min_l d(l,u) + d(l,v)` — an upper
    * bound that is exact whenever a shortest u–v path passes a landmark
    * (see [[landmarkUpperBound]]); on a symmetrized edge set the bound
    * direction is well-defined.
    *
    * [[bfsDistances]] generalized by a landmark key: state and layers
    * are (landmark, id) grain, so the frontier is at most k× the
    * single-source one and every hop remains one equi-join + distinct +
    * anti-join — work stays O(k · edges touched). Every landmark emits
    * its own (l, l, 0) seed row whether or not it appears in the edge
    * set (the oracle-visible convention). Same [[IterativeLoop]]
    * caching contract as [[bfsDistances]] — and the same TWO-PATH rule:
    * when BOTH the edge count and the (landmark, id) pair-state bound
    * `|landmarks|·|edges|` sit at or under `driverFrontierBelow`, the
    * per-landmark frontiers ride the driver and each hop is ONE job
    * collecting the union frontier's adjacency (edge rows touched this
    * hop — bounded by the pair-state bound), with every landmark's
    * advance computed driver-side from the shared adjacency map; above
    * it, the distributed (landmark, id)-grain loop runs unchanged
    * (spec-pinned equal).
    *
    * @return (landmark, id, dist) — one row per landmark × node
    *         reached within `maxHops`.
    */
  def landmarkDistances(edges: DataFrame, srcCol: String, dstCol: String,
      landmarks: Seq[Long], maxHops: Int,
      broadcastFrontierBelow: Long = 2_000_000L,
      driverFrontierBelow: Long = 1_000_000L): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    require(landmarks.nonEmpty, "need at least one landmark")
    require(landmarks.distinct.size == landmarks.size,
      s"duplicate landmarks: $landmarks")
    val spark = edges.sparkSession
    import spark.implicits._
    val loop = new IterativeLoop()
    val e0 = loop.pin(edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")))
    val nE = e0.count()
    val e = compactPinned(loop, e0, nE)
    if (nE <= driverFrontierBelow &&
        landmarks.size.toLong * nE <= driverFrontierBelow) {
      try {
        var frontiers: Map[Long, Array[Long]] =
          landmarks.map(l => l -> Array(l)).toMap
        val visited = scala.collection.mutable.Map(
          landmarks.map(l => l -> scala.collection.mutable.HashSet(l)): _*)
        val rows = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
        landmarks.foreach(l => rows += ((l, l, 0L)))
        var hop = 1
        while (hop <= maxHops && frontiers.valuesIterator.exists(_.nonEmpty)) {
          // ONE job: the union frontier's out-adjacency; each landmark
          // then advances driver-side off the shared map (HashSet.add
          // dedups within-hop multi-paths AND marks visited)
          val unionIds = frontiers.valuesIterator.flatten.toArray.distinct
          val adj = e.filter(col("src").isInCollection(
              scala.collection.immutable.ArraySeq.unsafeWrapArray(unionIds)))
            .select(col("src"), col("dst")).collect()
            .groupBy(_.getLong(0))
            .map { case (s, rs) => s -> rs.map(_.getLong(1)) }
          frontiers = frontiers.map { case (l, f) =>
            val vis = visited(l)
            val next = f.iterator
              .flatMap(id => adj.getOrElse(id, Array.empty[Long]))
              .filter(vis.add).toArray
            next.foreach(id => rows += ((l, id, hop.toLong)))
            l -> next
          }
          hop += 1
        }
        return spark.createDataset(rows.toSeq)
          .toDF("landmark", "id", "dist")
      } finally loop.abort()
    }
    var (frontier, frontierSize) = loop.keep(
      spark.createDataset(landmarks).toDF("landmark")
        .select(col("landmark"), col("landmark").as("id")))
    var layers = List(frontier.withColumn("dist", lit(0L)))
    var visitedSize = frontierSize
    var hop = 1
    while (hop <= maxHops && frontierSize > 0) {
      val f = frontier.withColumnRenamed("id", "src")
      val visited = layers.map(_.select(col("landmark"), col("id")))
        .reduce(_ union _)
      val (next, nextSize) = loop.keep(e.join(
          if (frontierSize <= broadcastFrontierBelow) broadcast(f) else f,
          "src")
        .select(col("landmark"), col("dst").as("id")).distinct()
        // first appearance per (landmark, id) wins — min-dist semantics;
        // a below-bound visited set broadcasts (the bfsDistances rule)
        .join(
          if (visitedSize <= broadcastFrontierBelow) broadcast(visited)
          else visited,
          Seq("landmark", "id"), "left_anti"))
      frontierSize = nextSize
      visitedSize += nextSize
      if (frontierSize > 0) layers ::= next.withColumn("dist", lit(hop.toLong))
      frontier = next
      hop += 1
    }
    loop.finish(layers.reduce(_ union _))
  }

  /** The [[landmarkDistances]] serving side: for each (src, dst) row of
    * `pairs`, the landmark upper bound `min_l d(l, src) + d(l, dst)`
    * over landmarks that reach BOTH endpoints (null when none does —
    * reported as unknown, never invented). Two joins against the
    * precomputed node-grain distance table + one pair-grain min — the
    * pairs side drives the cost, the graph is never re-traversed. */
  def landmarkUpperBound(dists: DataFrame, pairs: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val du = dists.select(col("landmark"), col("id").as("_u"),
      col("dist").as("_du"))
    val dv = dists.select(col("landmark"), col("id").as("_v"),
      col("dist").as("_dv"))
    pairs.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .join(du, col("src") === col("_u"), "left")
      .join(dv, du("landmark") === dv("landmark") &&
        col("dst") === col("_v"), "left")
      .groupBy(col("src"), col("dst"))
      .agg(min(col("_du") + col("_dv")).as("dist_ub"))
  }

  /** Outcome of [[shortestPathsRun]]: node-grain (id, dist), whether
    * relaxation reached a fixed point within the sweep budget, and the
    * sweeps spent. After k sweeps `dist` is EXACTLY the shortest
    * distance among paths of ≤ k edges (the Bellman-Ford invariant) —
    * so a capped run is hop-bounded-exact, never approximately wrong. */
  final case class ShortestPathsRun(dists: DataFrame, converged: Boolean,
      sweeps: Int)

  /** [[shortestPathsRun]] without the accounting; logs a warning when
    * the budget ran out (distances are then the ≤`maxSweeps`-edge
    * optima — see [[ShortestPathsRun]]). */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Long, maxSweeps: Int): DataFrame = {
    val run = shortestPathsRun(edges, srcCol, dstCol, weightCol, source,
      maxSweeps)
    if (!run.converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"shortestPaths hit maxSweeps=$maxSweeps before the fixed point — " +
          s"distances are exact over ≤$maxSweeps-edge paths only")
    run.dists
  }

  /** Single-source shortest paths over NONNEGATIVE integer edge weights
    * by synchronous Bellman-Ford relaxation (the min-plus counterpart
    * of [[pageRank]]'s sparse matvec; Dijkstra's priority queue does
    * not distribute — frontier-parallel relaxation is the standard
    * cluster formulation, cf. delta-stepping, Meyer & Sanders 2003).
    * Each sweep relaxes out-edges of the FRONTIER (nodes whose distance
    * improved last sweep — only they can improve a neighbor), merges
    * with a full-outer min, and counts improvements; the fixed point is
    * certified by a zero-improvement sweep.
    *
    * Weights are validated nonnegative up front (one aggregate over the
    * pinned edge cache — a negative weight silently breaks the
    * invariant, so it throws instead). Distance sums ride ANSI longs:
    * overflow throws rather than wraps.
    *
    * Scale shape ([[IterativeLoop]]): per sweep ONE frontier⋈edges
    * equi-join + one dst-grain min + one node-grain full-outer merge —
    * state never exceeds node grain, the improvement count rides one
    * cached-block aggregate, block storage is O(1) in sweeps.
    */
  def shortestPathsRun(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Long, maxSweeps: Int): ShortestPathsRun = {
    require(maxSweeps >= 1, s"maxSweeps must be >= 1, got $maxSweeps")
    val spark = edges.sparkSession
    import spark.implicits._
    val loop = new IterativeLoop()
    try {
      val eP = loop.pin(edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w")))
      val e = compactPinned(loop, eP, eP.count())
      val minW = e.agg(min(col("w"))).head()
      if (!minW.isNullAt(0)) require(minW.getLong(0) >= 0L,
        s"shortestPaths requires nonnegative weights, found ${minW.getLong(0)}")
      var state = loop.advance(
        Seq((source, 0L, 1L)).toDF("id", "dist", "chg"))
      var sweeps = 0
      var changed = 1L
      while (changed > 0 && sweeps < maxSweeps) {
        val frontier = state.filter(col("chg") === 1L)
          .select(col("id").as("src"), col("dist"))
        val cand = e.join(frontier, Seq("src"))
          .select(col("dst").as("id"), (col("dist") + col("w")).as("nd"))
          .groupBy(col("id")).agg(min(col("nd")).as("nd"))
        state = loop.advance(state.select(col("id"), col("dist"))
          .join(cand, Seq("id"), "full_outer")
          .select(col("id"),
            least(coalesce(col("dist"), col("nd")),
              coalesce(col("nd"), col("dist"))).as("dist"),
            (coalesce(col("nd"), lit(Long.MaxValue)) <
              coalesce(col("dist"), lit(Long.MaxValue)))
              .cast("long").as("chg")))
        changed = state.agg(coalesce(sum(col("chg")), lit(0L)))
          .head().getLong(0)
        sweeps += 1
      }
      ShortestPathsRun(loop.finish(state.select(col("id"), col("dist"))),
        changed == 0L, sweeps)
    } catch { case t: Throwable => loop.abort(); throw t }
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * Batagelj-Zaversnik bulk variant): repeatedly drop every node whose
    * degree in the CURRENT subgraph is below `k` until the subgraph is
    * stable — what survives is the maximal subgraph with minimum degree
    * ≥ k. The crawl/graph-cleaning use: the 2-core strips pendant
    * chains (scraper tails, orphan redirects), higher cores isolate the
    * densely-linked hubs that dominate mirror/template farms; the k-core
    * is also the standard preprocessing cut before expensive community
    * detection (LPA's quality rises once the tree fringe is gone).
    *
    * Edges are canonicalized UNDIRECTED first (u<v, deduped, self-loops
    * dropped — a self-loop must not let an otherwise-isolated node
    * count itself toward k). Peeling is BULK: each round removes ALL
    * sub-k nodes at once, which can cascade (removing a leaf may push
    * its neighbor under k) — hence the loop. `maxRounds` bounds the
    * rounds; stability is detected as an unchanged edge COUNT (edges
    * only ever shrink, and an unshrunk round proves every remaining
    * node already has degree ≥ k), using the count the materialization
    * already paid for. An early exit skips only no-op rounds, so a
    * fixed-round SQL replay of ≥ the converged round count reproduces
    * the result exactly.
    *
    * Scale shape ([[IterativeLoop]]): per round ONE endpoint-explode
    * degree aggregate (map-combined) + two semi-joins of the edge set
    * against the ≥k node set — all node-/edge-grain equi-joins, and the
    * working set shrinks monotonically (the CC contraction property).
    * Result is a self-contained checkpoint of (id, core_deg) — each
    * surviving node with its degree inside the core.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 10): DataFrame = {
    val run = kCoreRun(edges, srcCol, dstCol, k, maxRounds)
    if (!run.converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"kCore(k=$k) hit maxRounds=$maxRounds before the peel stabilized — " +
          "the result is a SUPERSET of the true k-core (peeling removes " +
          "nodes monotonically). Raise maxRounds or use kCoreRun to act on " +
          "the convergence signal.")
    run.nodes
  }

  /** HITS hubs & authorities (Kleinberg 1999) on a DIRECTED edge set:
    * `iterations` mutual-reinforcement sweeps —
    * `auth_t(v) = Σ_{u→v} hub_{t-1}(u)`, `hub_t(u) = Σ_{u→v} auth_t(v)`
    * — each vector L1-NORMALIZED PER SWEEP in integer nano-units (the
    * q127/s10 quantized-trajectory discipline): scores ride as longs
    * summing to ~1e9, each raw sweep sum is an exact long in any
    * aggregation order, its global total is an exact long, and the
    * normalization `round(raw·1e9/total)` is one IEEE multiply-divide
    * of identical operands — so every sweep's vector is bit-identical
    * in any engine at ANY sweep budget, and magnitudes can never
    * overflow (the former `iterations ≤ 30` unnormalized-growth cap is
    * gone, not widened). The link-graph quality signal complementing
    * [[pageRank]]: hubs are directories/link farms, authorities the
    * pages worth keeping — the crawl-corpus curation pair.
    *
    * Scale shape ([[IterativeLoop]]): the sweep state is SPARSE — a
    * node absent from the hub (resp. auth) table has score 0 and
    * contributes nothing to any sum, so sweeps are one edge⋈hub join +
    * dst-grain map-combined sum, then one edge⋈auth join + src-grain
    * sum, with no full-node join anywhere in the loop (halves per-sweep
    * join work vs the dense encoding; measured 4.4s → the dense
    * nodes-join variant on the sf0.1 trade graph). Each normalization
    * total rides the sweep's OWN materializing aggregate
    * ([[IterativeLoop.advanceSummed]]) — zero extra driver actions, so
    * the loop keeps [[pageRank]]'s one-action-per-materialization
    * cadence and the norm is a lazy literal-scaled map over the cached
    * raw blocks. Zeros materialize once, in the final output's node
    * left-joins.
    * Block storage is O(1) in the sweep budget: intermediate vectors
    * ride the advance chain (released as soon as the following one is
    * solid); only the LAST TWO sweeps' auths are `keep`-checkpointed —
    * the final one for the output, its predecessor for [[hitsRun]]'s
    * delta readout.
    *
    * @return (id, auth, hub) for every node incident to an edge, each
    *         column summing to 1 (nodes without in-/out-edges score 0).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame =
    // computeDelta = false: hits() callers ignore the delta, so the
    // extra node-grain job (and the second kept auth) would be waste
    hitsImpl(edges, srcCol, dstCol, iterations, computeDelta = false).scores

  /** Outcome of a [[hitsRun]] sweep budget: the normalized (id, auth,
    * hub) scores, the L1 distance between the last two sweeps'
    * NORMALIZED authority vectors (the convergence signal a pipeline
    * thresholds to decide whether the budget sufficed — the
    * [[KCoreRun]] honesty contract applied to HITS; NaN when
    * `iterations == 1`, where no predecessor exists), and the sweeps
    * spent. */
  final case class HitsRun(scores: DataFrame, delta: Double, sweeps: Int)

  /** [[hits]] with the full convergence contract (see [[HitsRun]]).
    * Same sparse nano-normalized sweep loop and scale shape as
    * [[hits]]'s scaladoc; the delta costs one extra node-grain
    * full-outer join + aggregate at the end, over already-materialized
    * vectors, and is itself an exact integer sum (both vectors are
    * nano longs) with one terminal divide. */
  def hitsRun(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): HitsRun =
    hitsImpl(edges, srcCol, dstCol, iterations, computeDelta = true)

  private def hitsImpl(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, computeDelta: Boolean): HitsRun = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val loop = new IterativeLoop()
    // L1-normalize a materialized (id, c) long vector into nano units:
    // total = exact long (order-free), round(c·1e9/total) = identical
    // IEEE ops on identical operands in any engine. The total arrives
    // from [[IterativeLoop.advanceSummed]] — the sweep's OWN
    // materializing aggregate, so normalization costs ZERO extra
    // driver actions (it used to be a separate 1-row agg per vector:
    // 2·iterations stage barriers, the round-14 verdict's one perf
    // complaint) — and is inlined as a LITERAL, so the norm stays a
    // pure map and the sweep join keeps the raw vector's statistics
    // — a crossJoin(broadcast(agg)) wrapper here inflated AQE's size
    // estimate and flipped the edge⋈vector join from broadcast to a
    // per-sweep shuffle of the edge set (measured 2.5s → 6.8s on q124)
    def normNano(vec: DataFrame, c: String, total: Option[Long]): DataFrame =
      total match {
        case None => vec // empty vector: nothing to normalize
        case Some(t) => vec.select(col("id"),
          round(col(c).cast("double") * lit(1e9) /
            lit(t.toDouble)).cast("long").as(c))
      }
    try {
      val eP = loop.pin(edges
        .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
        .distinct())
      val e = compactPinned(loop, eP, eP.count())
      val nodes = loop.pin(e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct())
      // sparse normalized start: the out-edge nodes split one L1 unit
      // (round(1e9/|H|) nano each — |H| is an exact count via one
      // driver action, inlined as a literal for the same stats reason
      // as normNano)
      val (h0, nH) = loop.advanceCounted(
        e.select(col("src").as("id")).distinct())
      var hub: DataFrame =
        if (nH == 0) h0.select(col("id"), lit(0L).as("hub"))
        else h0.select(col("id"),
          round(lit(1e9) / lit(nH.toDouble)).cast("long").as("hub"))
      var auth: DataFrame = null
      var prevAuth: DataFrame = null
      for (it <- 1 to iterations) {
        // raw sweep: exact long sums of nano scores (≤ ~1e9 + slop
        // total, so no overflow at any sweep count or graph size).
        // Only the RAW vectors materialize (2 per sweep, the pre-
        // normalization cadence) — and each materialization IS the
        // normalization-total aggregate (advanceSummed), so a sweep
        // pays exactly its two join-aggregate jobs, matching
        // pageRank's one-action-per-materialization cadence; each
        // normNano stays a LAZY wrapper over the cached raw blocks —
        // measured: eager norm materialization cost ~1.6x (q124 3.5s
        // → 5.6s at sf0.1)
        val (aRaw, aTot) = loop.advanceSummed(
          e.join(hub.select(col("id").as("src"), col("hub")), "src")
            .groupBy(col("dst")).agg(sum(col("hub")).as("auth"))
            .select(col("dst").as("id"), col("auth")), "auth")
        // normalized vectors ride the advance chain through their raw
        // parents (freed when the next raw is solid); the final
        // survives for the output, and (delta mode only) its
        // predecessor for the delta readout
        val aPlan = normNano(aRaw, "auth", aTot)
        val retain = it == iterations ||
          (computeDelta && it == iterations - 1)
        auth = if (retain) loop.keep(aPlan)._1 else aPlan
        if (it == iterations - 1 && retain) prevAuth = auth
        val (hRaw, hTot) = loop.advanceSummed(
          e.join(auth.select(col("id").as("dst"), col("auth")), "dst")
            .groupBy(col("src")).agg(sum(col("auth")).as("hub"))
            .select(col("src").as("id"), col("hub")), "hub")
        hub = normNano(hRaw, "hub", hTot)
      }
      // Σ|a_k − a_{k-1}| over the two kept NANO vectors: an exact
      // integer sum, one terminal divide — before finish releases them
      val delta =
        if (prevAuth == null) Double.NaN
        else {
          val cur = auth.select(col("id"), col("auth").as("_a"))
          val prv = prevAuth.select(col("id"), col("auth").as("_p"))
          cur.join(prv, Seq("id"), "full_outer")
            .agg(sum(abs(coalesce(col("_a"), lit(0L)) -
              coalesce(col("_p"), lit(0L)))).as("_d"))
            .head().getLong(0) / 1e9
        }
      // output in [0,1]: divide each nano vector by its OWN exact total
      // (~1e9 ± rounding slop), so the columns sum to exactly 1
      val totals = broadcast(auth.agg(sum(col("auth")).as("_at"))
        .crossJoin(hub.agg(sum(col("hub")).as("_ht"))))
      val scores = loop.finish(nodes
        .join(auth, Seq("id"), "left_outer")
        .join(hub, Seq("id"), "left_outer")
        .crossJoin(totals)
        .select(col("id"),
          (coalesce(col("auth"), lit(0L)).cast("double") /
            col("_at").cast("double")).as("auth"),
          (coalesce(col("hub"), lit(0L)).cast("double") /
            col("_ht").cast("double")).as("hub")))
      HitsRun(scores, delta, iterations)
    } catch { case t: Throwable => loop.abort(); throw t }
  }

  /** Outcome of a [[kCoreRun]] peel: the surviving (id, core_deg) table,
    * whether the peel reached a fixed point, and the rounds it used —
    * the honest contract a pipeline needs to decide whether a
    * round-capped result (a superset of the true core) is acceptable or
    * the budget must rise. */
  final case class KCoreRun(nodes: DataFrame, converged: Boolean, rounds: Int)

  /** Canonical undirected edge set: casts, self-loop drop, (u<v) dedup —
    * shared by the k-core surfaces. */
  private def canonUndirected(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()

  private def coreDegrees(e: DataFrame): DataFrame =
    e.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("core_deg"))

  /** One bulk-peel round: keep only edges whose BOTH endpoints have
    * degree ≥ k in the current subgraph. */
  private def peelOnce(cur: DataFrame, k: Int): DataFrame = {
    val keep = coreDegrees(cur).filter(col("core_deg") >= k).select(col("id"))
    cur
      .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
      .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
      .select(col("u"), col("v")) // restore column order after join keys
  }

  /** [[kCore]] with the full convergence contract (see [[KCoreRun]]).
    * Same peel loop and scale shape as [[kCore]]'s scaladoc. */
  def kCoreRun(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 10): KCoreRun = {
    require(k >= 1, s"k must be >= 1, got $k")
    val loop = new IterativeLoop()
    try {
      var (cur, n) = loop.advanceCounted(canonUndirected(edges, srcCol, dstCol))
      var stable = n == 0L
      var round = 0
      while (!stable && round < maxRounds) {
        val (m, nm) = loop.advanceCounted(peelOnce(cur, k))
        stable = nm == n || nm == 0L
        cur = m; n = nm
        round += 1
      }
      KCoreRun(loop.finish(coreDegrees(cur)), stable, round)
    } catch { case e: Throwable => loop.abort(); throw e }
  }

  /** Outcome of a [[corenessRun]] ladder: the (id, coreness) labels,
    * the peel thresholds actually visited (`rungs` — with rung skipping
    * this is the number of DISTINCT degree levels in the core spectrum,
    * not `kMax`), and the total bulk-peel rounds across all rungs. */
  final case class CorenessRun(labels: DataFrame, rungs: Int,
      peelRounds: Int)

  /** Coreness decomposition: per-node core numbers — with `kMax = 0`
    * (uncapped) `coreness(v) = max k with v in the k-core`, the full
    * Batagelj-Zaversnik decomposition to the graph's degeneracy; with
    * `kMax ≥ 1` the bounded form `min(kMax, ·)` — the form a graph
    * pipeline actually wants (one pass labels every node; ranking crawl
    * hubs, fringe-stripping thresholds, and community-detection
    * pre-cuts all read the same table instead of re-peeling per k).
    *
    * Algorithm: incremental bulk peeling staged by k. Peel the graph to
    * its 2-core; nodes dropped on the way have coreness 1. Continue
    * FROM the 2-core (never from scratch — the k-core is inside the
    * (k-1)-core) up the ladder, with RUNG SKIPPING: after the k-peel's
    * fixed point every survivor has core-degree ≥ the surviving minimum
    * degree m (≥ k), so the graph already IS its own k'-core for every
    * k' ≤ m and the next threshold jumps straight to m+1 — a graph
    * whose degree spectrum is sparse (a clique hanging off a sparse
    * web) pays one rung per DISTINCT core level instead of one per
    * integer, and empty rungs cost nothing (previously a full
    * confirm-peel round each). Every node incident to at least one
    * canonical edge is labeled (isolated nodes never enter the edge
    * list and have no core).
    *
    * Unlike the round-capped [[kCore]], each per-k peel here runs to its
    * FIXED POINT (`maxRoundsPerK` is a runaway bound, not a silent cap:
    * exceeding it THROWS rather than mislabel) — correctness of the
    * labels requires exact cores. Scale shape: the working edge set
    * shrinks monotonically across the whole k ladder; per round the
    * same one degree aggregate + two semi-joins as [[kCore]], plus one
    * edge-grain min-degree aggregate per RUNG (over checkpointed
    * blocks) to compute the skip; the dropped-node layers are
    * node-grain checkpoints retained to the final union
    * ([[IterativeLoop.keep]], the BFS-layer pattern).
    *
    * @return (id, coreness) — one row per non-isolated node.
    */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      kMax: Int, maxRoundsPerK: Int = 50): DataFrame =
    corenessRun(edges, srcCol, dstCol, kMax, maxRoundsPerK).labels

  /** [[coreness]] with the run accounting (see [[CorenessRun]]). */
  def corenessRun(edges: DataFrame, srcCol: String, dstCol: String,
      kMax: Int, maxRoundsPerK: Int = 50): CorenessRun = {
    require(kMax >= 0, s"kMax must be >= 0 (0 = uncapped), got $kMax")
    val loop = new IterativeLoop()
    try {
      def nodesOf(e: DataFrame): DataFrame =
        e.select(explode(array(col("u"), col("v"))).as("id")).distinct()
      var (cur, n) = loop.advanceCounted(canonUndirected(edges, srcCol, dstCol))
      // the 1-core = every node with an edge (canonical edges have no
      // self-loops, so every listed endpoint has true degree >= 1)
      var (remaining, _) = loop.keep(nodesOf(cur))
      var layers = List.empty[DataFrame]
      var k = 2
      var rungs = 0
      var peelRounds = 0
      while ((kMax == 0 || k <= kMax) && n > 0) {
        var stable = false
        var round = 0
        while (!stable && round < maxRoundsPerK) {
          val (m, nm) = loop.advanceCounted(peelOnce(cur, k))
          stable = nm == n || nm == 0L
          cur = m; n = nm
          round += 1
        }
        if (!stable) throw new IllegalStateException(
          s"coreness: the k=$k peel did not reach a fixed point within " +
            s"maxRoundsPerK=$maxRoundsPerK rounds — raise the bound " +
            "(labels from a capped peel would be wrong, not approximate)")
        rungs += 1
        peelRounds += round
        val (coreNodes, _) = loop.keep(nodesOf(cur))
        layers ::= remaining.join(coreNodes, Seq("id"), "left_anti")
          .withColumn("coreness", lit((k - 1).toLong))
        remaining = coreNodes
        // rung skip: survivors all have core-degree >= the surviving
        // minimum m >= k, so the graph is its own k'-core for every
        // k' <= m — the next peel that can remove anything is m+1.
        // The jump costs one edge-grain min aggregate; it can save at
        // most (kMax - k) confirm-peels, so on a SHALLOW capped ladder
        // (fewer than 3 rungs left) the probe costs about what it could
        // save and is skipped — measured: q122's dense kMax=4 ladder
        // paid ~1s for probes that never jumped
        val mayJump = kMax == 0 || kMax - k >= 3
        k =
          if (n == 0 || !mayJump) k + 1
          else {
            val minDeg = coreDegrees(cur)
              .agg(min(col("core_deg")).as("_m")).head().getLong(0)
            math.max(k + 1, (math.min(minDeg, Int.MaxValue - 1L) + 1L).toInt)
          }
      }
      // survivors past the cap: the loop only exits with n > 0 in capped
      // mode, and then the last completed (or skipped-past) level is
      // >= kMax, so every survivor's coreness clamps to kMax exactly
      val capLabel = if (kMax > 0) kMax.toLong else (k - 1).toLong
      val capped = remaining.withColumn("coreness", lit(capLabel))
      CorenessRun(loop.finish(layers.foldLeft(capped)(_ unionByName _)),
        rungs, peelRounds)
    } catch { case e: Throwable => loop.abort(); throw e }
  }

  /** Outcome of an [[sccRun]]: (id, scc_id) labels for every node
    * incident to a non-loop edge, whether every node got labeled within
    * the round budget (the [[KCoreRun]] honesty contract), and the
    * outer FW-BW rounds spent. `scc_id` is the MAX member id of the
    * component (the coloring root — see [[sccRun]]). */
  final case class SccRun(labels: DataFrame, converged: Boolean,
      rounds: Int)

  /** Strongly connected components of a DIRECTED edge set — [[sccRun]]
    * without the accounting; logs a warning when the round budget ran
    * out (unlabeled nodes are then ABSENT from the result, never
    * mislabeled). */
  def scc(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30, localTailEdges: Long = 50000L): DataFrame = {
    val run = sccRun(edges, srcCol, dstCol, maxRounds, localTailEdges)
    if (!run.converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"scc hit maxRounds=$maxRounds with nodes still unlabeled — " +
          "those nodes are omitted from the result. Raise maxRounds or " +
          "use sccRun to act on the convergence signal.")
    run.labels
  }

  /** Strongly connected components by iterative forward-coloring +
    * backward confirmation (the distributed coloring algorithm, Orzan
    * 2004 / the FW-BW family — Tarjan's stack walk does not
    * distribute). Per outer round, over the still-unlabeled subgraph:
    *
    *  1. FORWARD: every node starts colored with its own id; colors
    *     propagate along edge direction (`color(v) ← max(color(v),
    *     max_{u→v} color(u))`) to a fixed point, after which
    *     `color(v)` = the max id that can reach v. A root (`color(r) =
    *     r`) is the max id of its SCC: no higher id reaches it, and
    *     everything it reaches mutually with shares its color.
    *  2. BACKWARD: from the roots, walk edges BACKWARD but only within
    *     one color (`v` joins when some edge v→w has w marked and
    *     color(v) = color(w)) to a fixed point. Marked nodes are
    *     exactly the roots' SCCs (v marked ⟺ color(v) = r ∧ v reaches
    *     r ⟺ r ↔ v; same-color pruning is lossless because every node
    *     on a v→r path is itself reached by r and reaches r, so it has
    *     color r too).
    *  3. Labeled nodes leave; edges touching them drop; repeat.
    *
    * Every round removes at least the max-id node's SCC (the global max
    * is always a root), and typically MANY components — all roots
    * resolve per round. The adversarial case is a chain with ids
    * decreasing along edges (one SCC per round) — hence the honest
    * `maxRounds` + converged contract instead of a silent cap.
    *
    * Scale shape ([[IterativeLoop]], nested): the canonical edge set is
    * pinned ONCE; each outer round pins its remaining-subgraph edge
    * view and runs the two inner fixed points as node-grain advance
    * chains — each sweep is one edge⋈state join + one dst- (resp.
    * src-) grain aggregate/distinct, the PageRank sparse-matvec shape;
    * state never exceeds node grain, block storage is O(1) in sweep
    * count, and each round's label layer leaves the loop as a
    * self-contained checkpoint. Convergence tests ride the advance
    * counts plus one cached-block aggregate per forward sweep.
    *
    * HYBRID BASE CASE (the structure of the published parallel SCC
    * methods — Hong, Oguntebi & Olukotun PPoPP 2013, Slota, Rajamanickam
    * & Madduri IPDPS 2014: FW-BW peels the giant components in
    * parallel, a SEQUENTIAL solver finishes the small-component tail,
    * because that tail is where coloring's round count explodes — the
    * decreasing-id chain pays one distributed round per SCC): once the
    * remaining subgraph has at most `localTailEdges` edges, its edge
    * list is collected (a size-gated, bounded driver grain — the BPE
    * argmax / d×d Gram contract) and finished with one iterative-stack
    * Tarjan pass; remaining nodes ISOLATED in the subgraph label
    * themselves (id, id) distributively, so the collect is bounded by
    * the edge cap alone, never by the node count. Labels are the max
    * member id either way — the base case changes round count, never
    * output. `rounds` counts DISTRIBUTED rounds only; pass
    * `localTailEdges = 0` to force pure FW-BW (the spec path).
    */
  def sccRun(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30, localTailEdges: Long = 50000L): SccRun = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(localTailEdges >= 0,
      s"localTailEdges must be >= 0 (0 = pure FW-BW), got $localTailEdges")
    val outer = new IterativeLoop()
    try {
      val e0 = outer.pin(edges
        .select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
      var (rem, nRem) = outer.advanceCounted(
        e0.select(explode(array(col("src"), col("dst"))).as("id")).distinct())
      var layers = List.empty[DataFrame]
      var rounds = 0
      var solvedLocally = false
      while (nRem > 0 && !solvedLocally && rounds < maxRounds) {
        val eRview = e0
          .join(rem.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(rem.select(col("id").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
        if (localTailEdges > 0 && eRview.count() <= localTailEdges) {
          // sequential base case: Tarjan over the ≤cap edge list, plus
          // distributive (id, id) labels for subgraph-isolated nodes
          val spark = edges.sparkSession
          import spark.implicits._
          val pairs = eRview.as[(Long, Long)].collect()
          val endpoints = pairs.iterator
            .flatMap(p => Iterator(p._1, p._2)).toSet
          val iso = rem
            .join(broadcast(spark.createDataset(endpoints.toSeq).toDF("id")),
              Seq("id"), "left_anti")
            .select(col("id"), col("id").as("scc_id"))
          val local = spark.createDataset(tarjanMaxLabels(pairs))
            .toDF("id", "scc_id")
          layers ::= outer.pinCheckpoint(
            iso.unionByName(local).localCheckpoint(eager = true))
          nRem = 0
          solvedLocally = true
        } else {
          val inner = new IterativeLoop()
          val layer =
            try {
              val eR = inner.pin(eRview)
              // 1. forward max-color propagation to fixed point
              var colors = inner.advance(
                rem.select(col("id"), col("id").as("color")))
              var changed = 1L
              while (changed > 0) {
                val cand = eR
                  .join(colors.select(col("id").as("src"),
                    col("color").as("cs")), Seq("src"))
                  .groupBy(col("dst")).agg(max(col("cs")).as("cin"))
                  .withColumnRenamed("dst", "id")
                colors = inner.advance(colors
                  .join(cand, Seq("id"), "left")
                  .select(col("id"),
                    greatest(col("color"),
                      coalesce(col("cin"), col("color"))).as("color"),
                    (coalesce(col("cin"), lit(Long.MinValue)) > col("color"))
                      .cast("long").as("chg")))
                changed = colors.agg(coalesce(sum(col("chg")), lit(0L)))
                  .head().getLong(0)
              }
              val (colorsK, _) =
                inner.keep(colors.select(col("id"), col("color")))
              // 2. backward same-color confirmation from the roots
              var (marked, nM) = inner.advanceCounted(
                colorsK.filter(col("id") === col("color")))
              var grown = true
              while (grown) {
                val cand = eR
                  .join(marked.select(col("id").as("dst"),
                    col("color").as("mc")), Seq("dst"))
                  .select(col("src").as("id"), col("mc").as("color"))
                  .distinct()
                  .join(colorsK, Seq("id", "color"), "left_semi")
                val (m2, n2) = inner.advanceCounted(
                  marked.unionByName(cand).distinct())
                grown = n2 > nM
                marked = m2; nM = n2
              }
              inner.finish(marked.select(col("id"), col("color").as("scc_id")))
            } catch { case t: Throwable => inner.abort(); throw t }
          outer.pinCheckpoint(layer)
          layers ::= layer
          val (rem2, n2) = outer.advanceCounted(
            rem.join(layer, Seq("id"), "left_anti").select(col("id")))
          rem = rem2; nRem = n2
          rounds += 1
        }
      }
      val labels = layers match {
        case Nil => rem.select(col("id"), col("id").as("scc_id")).limit(0)
        case ls => ls.reduce(_ unionByName _)
      }
      SccRun(outer.finish(labels), nRem == 0, rounds)
    } catch { case e: Throwable => outer.abort(); throw e }
  }

  /** Sequential Tarjan (1972) over a collected edge list — the
    * [[sccRun]] base case. Explicit-stack DFS (no recursion: the cap
    * admits ~50k-edge chains, far past JVM stack depth), one pass,
    * O(V+E). Returns (node, max member id of its SCC) for every edge
    * endpoint; labels are traversal-order-independent because only the
    * component PARTITION feeds the max. */
  private def tarjanMaxLabels(
      pairs: Array[(Long, Long)]): Seq[(Long, Long)] = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    val nodes = mutable.LinkedHashSet.empty[Long]
    pairs.foreach { case (s, d) =>
      nodes += s; nodes += d
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
    }
    val index = mutable.HashMap.empty[Long, Int]
    val low = mutable.HashMap.empty[Long, Int]
    val onStack = mutable.HashSet.empty[Long]
    val stack = mutable.ArrayBuffer.empty[Long]
    val work = mutable.ArrayBuffer.empty[(Long, Iterator[Long])]
    var counter = 0
    val out = mutable.ArrayBuffer.empty[(Long, Long)]
    val emptyIt = Iterator.empty[Long]
    def push(v: Long): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      stack += v; onStack += v
      work += ((v, adj.get(v).map(_.iterator).getOrElse(emptyIt)))
    }
    for (root <- nodes if !index.contains(root)) {
      push(root)
      while (work.nonEmpty) {
        val (v, it) = work.last
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) push(w)
          else if (onStack(w)) low(v) = math.min(low(v), index(w))
        } else {
          work.remove(work.size - 1)
          if (work.nonEmpty) {
            val p = work.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = mutable.ArrayBuffer.empty[Long]
            var w = 0L
            while ({ w = stack.remove(stack.size - 1); onStack -= w
              comp += w; w != v }) ()
            val mx = comp.max
            comp.foreach(c => out += ((c, mx)))
          }
        }
      }
    }
    out.toSeq
  }
}
