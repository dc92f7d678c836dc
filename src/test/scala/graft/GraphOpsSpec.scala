package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** PageRank semantics on tiny graphs with hand-computable fixed points
  * (q103 pins the full trade-graph trajectory against DuckDB).
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val got = GraphOps.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Double)].collect().toMap
    spark.catalog.clearCache()
    got
  }

  test("a symmetric pair sits at the uniform fixed point") {
    // pr = 0.075 + 0.85 * (0.5 / 1) = 0.5 every sweep
    val pr = ranks(Seq((1L, 2L), (2L, 1L)), iters = 3)
    assert(pr(1L) == 0.5 && pr(2L) == 0.5)
  }

  test("a symmetric star concentrates rank on the hub, mass conserved") {
    val star = (1L to 4L).flatMap(s => Seq((0L, s), (s, 0L)))
    val pr = ranks(star, iters = 5)
    assert((1L to 4L).forall(s => pr(0L) > pr(s)),
      s"hub must outrank spokes: $pr")
    // symmetric graph has no dangling nodes → total mass stays 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass leaked: $pr")
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    val got = GraphOps.triangles(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, d, t, c) => id -> (d, t, c) }.toMap
    spark.catalog.clearCache()
    got
  }

  test("K4: every node has 3 triangles and clustering 1.0") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val r = tri(k4)
    assert((1L to 4L).forall(n => r(n) == ((3L, 3L, 1.0))), r.toString)
  }

  test("triangle with a pendant: corner lcc 1/3, pendant lcc 0") {
    val r = tri(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)))
    assert(r(1L) == ((3L, 1L, 2.0 * 1 / (3 * 2))))
    assert(r(2L) == ((2L, 1L, 1.0)) && r(3L) == ((2L, 1L, 1.0)))
    assert(r(4L) == ((1L, 0L, 0.0)))
  }

  test("reversed duplicates and self-loops canonicalize away") {
    // same triangle stated redundantly in both directions + a self-loop
    val r = tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 1L)))
    assert(r(1L) == ((2L, 1L, 1.0)) && r(2L) == ((2L, 1L, 1.0)) &&
      r(3L) == ((2L, 1L, 1.0)))
  }

  test("a square (4-cycle) has zero triangles everywhere") {
    val r = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(r.values.forall { case (d, t, c) => d == 2L && t == 0L && c == 0.0 })
  }

  test("a node with no in-edges holds the teleport floor") {
    // 1 -> 2 only: N=2. The floor is (1.0-0.85)/2 in the operator's own
    // IEEE arithmetic — NOT the decimal 0.075: (1.0-0.85) is
    // 0.15000000000000002 in binary64. The q103 oracle writes 0.15/N
    // directly; its round(,7) absorbs this last-bit gap — asserting the
    // exact doubles here is what documents that gap exists.
    val floor = (1.0 - 0.85) / 2
    val pr = ranks(Seq((1L, 2L)), iters = 1)
    assert(pr(1L) == floor)
    assert(pr(2L) == floor + 0.85 * 0.5) // in-mass from pr0(1)=0.5, deg 1
  }

  private def dists(edges: Seq[(Long, Long)], srcs: Seq[Long],
      hops: Int): Map[Long, Long] =
    GraphOps.bfsDistances(edges.toDF("src", "dst"), "src", "dst",
        srcs.toDF("id"), "id", hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfs: chain distances, hop bound, unreachable nodes absent") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
    assert(dists(chain, Seq(1L), hops = 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))  // 5 beyond hops, 9/10 unreachable
    assert(dists(chain, Seq(1L), hops = 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L),
      "early exit on an exhausted frontier must still return all layers")
  }

  test("bfs: the driver-frontier fast path and the distributed loop agree " +
      "on every graph shape") {
    // the small-graph path keeps frontier/visited on the driver; above
    // driverFrontierBelow the distributed frontier loop runs — force
    // each with the bound and pin identical (id, dist) sets
    def both(edges: Seq[(Long, Long)], srcs: Seq[Long], hops: Int) = {
      def run(driverBelow: Long) = GraphOps.bfsDistances(
          edges.toDF("src", "dst"), "src", "dst", srcs.toDF("id"), "id",
          hops, driverFrontierBelow = driverBelow)
        .as[(Long, Long)].collect().toSet
      val (fast, dist) = (run(Long.MaxValue), run(0L))
      assert(fast == dist, s"paths diverged: fast=$fast dist=$dist")
      Caches.sweep(spark)
      fast
    }
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
    both(chain, Seq(1L), hops = 3)
    both(chain, Seq(1L), hops = 10)
    both(chain, Seq(1L, 9L), hops = 10) // multi-source
    both(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)), Seq(3L), hops = 5) // cycle
    both(chain, Seq(42L), hops = 3) // source absent from the edge set
    both(chain, Seq(1L), hops = 0)  // zero hops: sources only
  }

  private def lpa(edges: Seq[(Long, Long)], sweeps: Int): Map[Long, Long] = {
    val got = GraphOps.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst", sweeps)
      .as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    got
  }

  test("lpa: disjoint symmetric triangles each unify on their min id") {
    def sym(ns: Seq[Long]) = for {
      a <- ns; b <- ns if a != b
    } yield (a, b)
    val r = lpa(sym(Seq(1L, 2L, 3L)) ++ sym(Seq(10L, 11L, 12L)), sweeps = 3)
    assert(Seq(1L, 2L, 3L).forall(r(_) == 1L), r.toString)
    assert(Seq(10L, 11L, 12L).forall(r(_) == 10L), r.toString)
  }

  test("lpa: tie between neighbor labels breaks toward the smaller") {
    // symmetrized path 5 - 1 - 9: node 1's in-votes {5, 9} tie at 1 each
    val r = lpa(Seq((5L, 1L), (1L, 5L), (9L, 1L), (1L, 9L)), sweeps = 1)
    assert(r == Map(1L -> 5L, 5L -> 1L, 9L -> 1L))
  }

  test("lpa: plurality beats the min label; no-in-edge nodes keep theirs") {
    // sweep 1: 8 adopts 9 (its only in-vote); t's votes {8,9,5} → min 5;
    // 9 and 5 have no in-edges and keep their own labels.
    // sweep 2: t's votes are the NEW labels {9, 9, 5} → plurality 9.
    val e = Seq((9L, 8L), (8L, 100L), (9L, 100L), (5L, 100L))
    assert(lpa(e, sweeps = 1)(100L) == 5L)
    assert(lpa(e, sweeps = 2)(100L) == 9L)
  }

  test("bfs: min distance wins on a diamond; multi-source takes the nearer seed") {
    // 1->2, 1->3, 2->4, 3->4 (4 reachable two ways at dist 2), 4->5
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    assert(dists(diamond, Seq(1L), hops = 3) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    // seeding 1 AND 4: everything downstream of 4 re-anchors at 0
    assert(dists(diamond, Seq(1L, 4L), hops = 3) ==
      Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("kCore: pure path fully peels; triangle survives with pendant gone") {
    import spark.implicits._
    // path 1-2-3-4: every 2-core peel removes the two endpoints — the
    // cascade empties the graph
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(GraphOps.kCore(path, "src", "dst", k = 2).isEmpty)
    spark.catalog.clearCache()
    // triangle {1,2,3} + pendant chain 3-4-5: chain peels link by link
    // (two cascade rounds), triangle is exactly the 2-core
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = GraphOps.kCore(g, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    spark.catalog.clearCache()
    // maxRounds caps the cascade mid-peel: one bulk round removes only
    // node 5 (degree 1), leaving 3-4 still present
    val capped = GraphOps.kCore(g, "src", "dst", k = 2, maxRounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L), capped.toString)
    spark.catalog.clearCache()
  }

  test("kCoreRun: convergence signal distinguishes fixed point from round cap") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    // 1-round budget: the pendant cascade is mid-flight — the signal
    // says so, and the round-capped result is a SUPERSET of the core
    val capped = GraphOps.kCoreRun(g, "src", "dst", k = 2, maxRounds = 1)
    assert(!capped.converged && capped.rounds == 1, s"$capped")
    val cappedIds = capped.nodes.select("id").as[Long].collect().toSet
    spark.catalog.clearCache()
    val full = GraphOps.kCoreRun(g, "src", "dst", k = 2)
    assert(full.converged && full.rounds >= 2, s"$full")
    val coreIds = full.nodes.select("id").as[Long].collect().toSet
    assert(coreIds == Set(1L, 2L, 3L))
    assert(coreIds.subsetOf(cappedIds),
      s"peeling is monotone: capped $cappedIds must contain core $coreIds")
    spark.catalog.clearCache()
  }

  test("coreness: path=1, cycle=2, clique=3, kMax caps, runaway bound throws") {
    import spark.implicits._
    // path (coreness 1), 4-cycle (2), K4 (3), K6 (true coreness 5,
    // capped to kMax=4 — the cap is part of the contract)
    val path = Seq((10L, 11L), (11L, 12L))
    val cyc = Seq((20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L))
    val k4 = for { i <- 30 until 34; j <- (i + 1) until 34 }
      yield (i.toLong, j.toLong)
    val k6 = for { i <- 40 until 46; j <- (i + 1) until 46 }
      yield (i.toLong, j.toLong)
    val g = (path ++ cyc ++ k4 ++ k6).toDF("src", "dst")
    val got = GraphOps.coreness(g, "src", "dst", kMax = 4)
      .as[(Long, Long)].collect().toMap
    val exp = Map(10L -> 1L, 11L -> 1L, 12L -> 1L) ++
      (20L to 23L).map(_ -> 2L) ++
      (30L to 33L).map(_ -> 3L) ++
      (40L to 45L).map(_ -> 4L)
    assert(got == exp, got.toString)
    spark.catalog.clearCache()
    // the per-k bound is a runaway guard, NOT a silent cap: a long path
    // needs several bulk rounds to peel, and a 1-round budget must
    // throw instead of handing back wrong labels
    val long = (0L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      GraphOps.coreness(long, "src", "dst", kMax = 2, maxRoundsPerK = 1)
    }
    assert(e.getMessage.contains("fixed point"), e.getMessage)
    spark.catalog.clearCache()
  }

  test("hits: hand-computed two-sweep fixed values, pure hubs and authorities") {
    import spark.implicits._
    // 1→3, 2→3, 3→5: nodes 1,2 are pure hubs (no in-edges → auth 0),
    // 5 a pure authority. Nano trace: h0 = 333333333 each (1e9/3);
    // a1r = {3: 666666666, 5: 333333333}, A1 = 999999999 → a1 =
    // {3: 666666667, 5: 333333333} (2/3 and 1/3 of 1e9, rounded);
    // h1 = {1: 400000000, 2: 400000000, 3: 200000000} (H1r =
    // 1666666667); a2r = {3: 800000000, 5: 200000000}, A2 = 1e9 exact
    // → a2 = {3: 8e8, 5: 2e8}; h2 = {1: 444444444, 2: 444444444,
    // 3: 111111111} (H2r = 1.8e9). Output: auth = a2/1e9 = {0.8, 0.2};
    // hub totals 999999999 → 444444444/999999999 = 4/9 EXACTLY (real
    // ratio is exactly 4/9, so the correctly-rounded double equals
    // 4.0/9), 1/9 likewise — exact equality, no tolerance.
    val g = Seq((1L, 3L), (2L, 3L), (3L, 5L)).toDF("src", "dst")
    val got = GraphOps.hits(g, "src", "dst", iterations = 2)
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, h) => id -> ((a, h)) }.toMap
    assert(got == Map(
      1L -> ((0.0, 4.0 / 9)), 2L -> ((0.0, 4.0 / 9)),
      3L -> ((4.0 / 5, 1.0 / 9)), 5L -> ((1.0 / 5, 0.0))), got.toString)
    Caches.sweep(spark)
    // no operator-held blocks survive the loop
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("hitsRun: delta pins the last-two-sweep L1 change; NaN at one sweep; " +
      "50 normalized sweeps reach the fixed point") {
    import spark.implicits._
    val g = Seq((1L, 3L), (2L, 3L), (3L, 5L)).toDF("src", "dst")
    // nano a1 = {3: 666666667, 5: 333333333}; a2 = {3: 8e8, 5: 2e8}
    // delta = (133333333 + 133333333) / 1e9 — an exact integer sum
    val run = GraphOps.hitsRun(g, "src", "dst", iterations = 2)
    assert(run.sweeps == 2)
    assert(run.delta == 266666666L / 1e9, run.delta.toString)
    // one sweep has no predecessor vector: delta is NaN by contract
    assert(GraphOps.hitsRun(g, "src", "dst", iterations = 1).delta.isNaN)
    // per-sweep normalization retired the old iterations<=30 overflow
    // cap: 50 sweeps run fine and land ON the QUANTIZED fixed point
    // (auth mass halves toward node 3 each sweep until node 5 pins at
    // exactly 1 nano — round(0.5) keeps it alive — a self-consistent
    // state: a = {3: 999999999, 5: 1}, h = {1: 5e8, 2: 5e8, 3: 1},
    // hub total 1000000001; delta exactly 0 once consecutive sweeps
    // repeat it)
    val long = GraphOps.hitsRun(g, "src", "dst", iterations = 50)
    assert(long.sweeps == 50 && long.delta == 0.0, long.delta.toString)
    val scores = long.scores.as[(Long, Double, Double)].collect()
      .map { case (id, a, h) => id -> ((a, h)) }.toMap
    assert(scores == Map(
      1L -> ((0.0, 500000000L / 1000000001L.toDouble)),
      2L -> ((0.0, 500000000L / 1000000001L.toDouble)),
      3L -> ((999999999L / 1e9, 1L / 1000000001L.toDouble)),
      5L -> ((1L / 1e9, 0.0))), scores.toString)
    Caches.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("corenessRun: uncapped (kMax=0) with rung skipping over a sparse degree spectrum") {
    import spark.implicits._
    // K8 clique + 5-node path: core levels are {1, 7}. Rung skipping
    // visits k=2 (path collapses, clique survives with min core-degree
    // 7) then jumps straight to k=8 (clique dies): 2 rungs, where a
    // +1 ladder would confirm-peel 6 empty rungs (k=3..8)
    val clique = (for { i <- 0 until 8; j <- (i + 1) until 8 }
      yield (100L + i, 100L + j)).toDF("src", "dst")
    val path = (0L until 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val run = GraphOps.corenessRun(
      clique.unionByName(path), "src", "dst", kMax = 0)
    val got = run.labels.as[(Long, Long)].collect().toMap
    val want = (0L to 4L).map(_ -> 1L).toMap ++
      (100L until 108L).map(_ -> 7L).toMap
    assert(got == want, got.toString)
    assert(run.rungs == 2, s"expected rungs 2 (k=2 then k=8): ${run.rungs}")
    // capped at a level the skip jumps over: survivors clamp to kMax
    val capped = GraphOps.coreness(
        clique.unionByName(path), "src", "dst", kMax = 4)
      .as[(Long, Long)].collect().toMap
    assert(capped == (0L to 4L).map(_ -> 1L).toMap ++
      (100L until 108L).map(_ -> 4L).toMap, capped.toString)
    Caches.sweep(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("kCore: duplicate/reversed edges and self-loops canonicalize away") {
    import spark.implicits._
    // the self-loop on 4 must NOT count toward 4's degree (else the
    // pendant 4 with loop would fake degree 3 and survive the 2-core)
    val g = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 4L))
      .toDF("src", "dst")
    val core = GraphOps.kCore(g, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
    spark.catalog.clearCache()
  }

  test("scc: cycles group, bridges separate, scc_id is the max member") {
    // 2-cycle {1,2} -> 3-cycle {3,4,5} -> singleton 6; plus an isolated
    // 2-cycle {10,11} and a self-loop on 7 feeding 6 (self-loop drops,
    // 7 stays a singleton)
    val edges = Seq(
      (1L, 2L), (2L, 1L),
      (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 3L),
      (5L, 6L),
      (10L, 11L), (11L, 10L),
      (7L, 7L), (7L, 6L)).toDF("src", "dst")
    val expect = Map(1L -> 2L, 2L -> 2L, 3L -> 5L, 4L -> 5L, 5L -> 5L,
      6L -> 6L, 7L -> 7L, 10L -> 11L, 11L -> 11L)
    // pure distributed FW-BW
    val run = GraphOps.sccRun(edges, "src", "dst", localTailEdges = 0)
    val got = run.labels.as[(Long, Long)].collect().toMap
    assert(got == expect, got.toString)
    assert(run.converged, "budget sufficed but converged=false")
    // zero-residue contract: only the result's own checkpoint survives
    val own = org.apache.spark.sql.graftbridge.Bridge
      .checkpointRdds(run.labels).map(_.id).toSet
    val held = spark.sparkContext.getPersistentRDDs.keySet.toSet -- own
    assert(held.isEmpty, s"sccRun held non-result blocks: $held")
    spark.catalog.clearCache()
    Caches.sweep(spark)
    // hybrid base case (default cap): same labels, zero distributed
    // rounds — the whole graph fits the sequential tail
    val hybrid = GraphOps.sccRun(edges, "src", "dst")
    assert(hybrid.labels.as[(Long, Long)].collect().toMap == expect)
    assert(hybrid.converged && hybrid.rounds == 0, s"${hybrid.rounds}")
    Caches.sweep(spark)
  }

  test("sccRun: decreasing-id chain needs one round per SCC; cap is honest") {
    // ids decrease along edges: forward coloring floods everything with
    // the source's id, so only ONE root resolves per round — the
    // adversarial case the converged flag exists for
    val chain = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    val full = GraphOps.sccRun(chain, "src", "dst", localTailEdges = 0)
    assert(full.converged && full.rounds == 4, s"${full.rounds}")
    assert(full.labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    val capped = GraphOps.sccRun(chain, "src", "dst", maxRounds = 2,
      localTailEdges = 0)
    assert(!capped.converged && capped.rounds == 2)
    // capped run labels only the resolved SCCs (4, then 3) — the
    // unlabeled remainder is ABSENT, never mislabeled
    assert(capped.labels.as[(Long, Long)].collect().toMap ==
      Map(4L -> 4L, 3L -> 3L))
    // the hybrid base case dissolves the adversary: the chain fits the
    // sequential tail, so it converges in ZERO distributed rounds even
    // under the round cap that starves pure FW-BW
    val hybrid = GraphOps.sccRun(chain, "src", "dst", maxRounds = 2)
    assert(hybrid.converged && hybrid.rounds == 0)
    assert(hybrid.labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    intercept[IllegalArgumentException] {
      GraphOps.sccRun(chain, "src", "dst", maxRounds = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.sccRun(chain, "src", "dst", localTailEdges = -1)
    }
    Caches.sweep(spark)
  }

  test("landmarkDistances: per-landmark hops, absent landmark seeds itself, bound serves") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val d = GraphOps.landmarkDistances(chain, "src", "dst",
      Seq(1L, 3L, 99L), maxHops = 3)
    val got = d.as[(Long, Long, Long)].collect().toSet
    // directed: 1 reaches 2,3,4; 3 reaches 4; 99 is absent but still
    // seeds its own (l, l, 0) row
    assert(got == Set(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L),
      (3L, 3L, 0L), (3L, 4L, 1L),
      (99L, 99L, 0L)), got.toString)
    Caches.sweep(spark)
    // maxHops=0: seeds only
    val seeds = GraphOps.landmarkDistances(chain, "src", "dst",
      Seq(2L), maxHops = 0).as[(Long, Long, Long)].collect().toSet
    assert(seeds == Set((2L, 2L, 0L)))
    Caches.sweep(spark)
    // serving: symmetric path 1-2-3, landmark 2 sits ON the shortest
    // 1..3 path, so the upper bound is exact; unreachable pairs null
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val sd = GraphOps.landmarkDistances(sym, "src", "dst", Seq(2L), 3)
    val pairs = Seq((1L, 3L), (1L, 9L)).toDF("u", "v")
    val ubm = GraphOps.landmarkUpperBound(sd, pairs, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(ubm == Map((1L, 3L) -> Some(2L), (1L, 9L) -> None), ubm.toString)
    intercept[IllegalArgumentException] {
      GraphOps.landmarkDistances(chain, "src", "dst", Seq(1L, 1L), 1)
    }
    intercept[IllegalArgumentException] {
      GraphOps.landmarkDistances(chain, "src", "dst", Seq.empty, 1)
    }
    Caches.sweep(spark)
  }

  test("distanceDistribution: exact path-graph pairs, deterministic sample, " +
      "eff_90 flag, empty graph") {
    import spark.implicits._
    def dist(edges: Seq[(Long, Long)], every: Int = 1,
        driverBelow: Long = 1_000_000L) =
      GraphOps.distanceDistribution(edges.toDF("src", "dst"), "src", "dst",
          maxHops = 8, sampleEvery = every,
          driverFrontierBelow = driverBelow)
        .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // sym path 0-1-2-3: 6 pairs at d=1, 4 at d=2, 2 at d=3; micro
    // shares 500000 / 833333 / 1000000; eff_90 fires exactly where the
    // cumulative first crosses 90%
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val exact = Seq(
      (1L, 6L, 6L, 12L, 500000L, false),
      (2L, 4L, 10L, 12L, 833333L, false),
      (3L, 2L, 12L, 12L, 1000000L, true))
    assert(dist(path) == exact)
    // the distributed landmark loop produces the identical distribution
    assert(dist(path, driverBelow = 0L) == exact)
    // deterministic id%2 source sample {0, 2}: rows (0,·) and (2,·)
    assert(dist(path, every = 2) == Seq(
      (1L, 3L, 3L, 6L, 500000L, false),
      (2L, 2L, 5L, 6L, 833333L, false),
      (3L, 1L, 6L, 6L, 1000000L, true)))
    // self-loop-only graph: empty
    assert(dist(Seq((5L, 5L))).isEmpty)
    Caches.sweep(spark)
  }

  test("landmarkDistances: driver and distributed paths agree on every shape") {
    import spark.implicits._
    def both(edges: Seq[(Long, Long)], lms: Seq[Long], hops: Int) = {
      def run(driverBelow: Long) = GraphOps.landmarkDistances(
          edges.toDF("src", "dst"), "src", "dst", lms, hops,
          driverFrontierBelow = driverBelow)
        .as[(Long, Long, Long)].collect().toSet
      val (fast, dist) = (run(Long.MaxValue), run(0L))
      assert(fast == dist, s"paths diverged: fast=$fast dist=$dist")
      Caches.sweep(spark)
      fast
    }
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    both(chain, Seq(1L, 3L, 99L), hops = 3) // absent landmark self-seeds
    both(chain, Seq(2L), hops = 0)          // seeds only
    both(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)),
      Seq(1L, 2L, 3L), hops = 5)            // cycle, all nodes landmarks
    both(chain ++ Seq((1L, 3L)), Seq(1L), hops = 4) // same-hop multi-path dedup
  }

  test("shortestPaths: hop-bounded exactness, convergence certificate, guards") {
    import spark.implicits._
    // direct 1→3 costs 10; the 2-edge detour 1→2→3 costs 2
    val g = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val one = GraphOps.shortestPathsRun(g, "src", "dst", "w", 1L, 1)
    assert(!one.converged && one.sweeps == 1)
    // after 1 sweep: exact over ≤1-edge paths — the detour is invisible
    assert(one.dists.as[(Long, Long)].collect().toMap ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    Caches.sweep(spark)
    val full = GraphOps.shortestPathsRun(g, "src", "dst", "w", 1L, 5)
    // sweep 3 certifies the fixed point; the budget is not exhausted
    assert(full.converged && full.sweeps == 3, s"${full.sweeps}")
    assert(full.dists.as[(Long, Long)].collect().toMap ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    Caches.sweep(spark)
    // zero weights relax; unreachable nodes are ABSENT, not infinite
    val z = Seq((1L, 2L, 0L), (5L, 6L, 1L)).toDF("src", "dst", "w")
    val zr = GraphOps.shortestPathsRun(z, "src", "dst", "w", 1L, 3)
    assert(zr.converged)
    assert(zr.dists.as[(Long, Long)].collect().toMap ==
      Map(1L -> 0L, 2L -> 0L))
    Caches.sweep(spark)
    val e = intercept[IllegalArgumentException] {
      GraphOps.shortestPathsRun(
        Seq((1L, 2L, -1L)).toDF("src", "dst", "w"), "src", "dst", "w", 1L, 2)
    }
    assert(e.getMessage.contains("nonnegative"))
    intercept[IllegalArgumentException] {
      GraphOps.shortestPathsRun(g, "src", "dst", "w", 1L, 0)
    }
    Caches.sweep(spark)
  }

  test("sccRun hybrid: distributed rounds peel, the base case takes the tail") {
    // 3 edges > localTailEdges=1 forces round 1 distributed: it labels
    // the 2-cycle {4,5} (root 5) but NOT the polluted singleton 1
    // (color 5 reaches it, it reaches nothing back). Round 2's
    // remaining subgraph {1} has ZERO edges ≤ 1, so the base case
    // finishes — and node 1 takes the ISOLATED (id, id) path, since it
    // is no edge's endpoint
    val edges = Seq((5L, 4L), (4L, 5L), (5L, 1L)).toDF("src", "dst")
    val run = GraphOps.sccRun(edges, "src", "dst", localTailEdges = 1)
    assert(run.converged && run.rounds == 1, s"${run.rounds}")
    assert(run.labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 4L -> 5L, 5L -> 5L))
    // mixed tail WITH edges: chain (3→2→1) after round 1 peels {4}
    val chain4 = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    val mixed = GraphOps.sccRun(chain4, "src", "dst", localTailEdges = 2)
    assert(mixed.converged && mixed.rounds == 1, s"${mixed.rounds}")
    assert(mixed.labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    Caches.sweep(spark)
  }

  test("linkPrediction: hand AA on path/square, adjacency excluded, " +
      "degree cap, canonicalization") {
    def lp(edges: Seq[(Long, Long)], cap: Long = 1000L) = {
      val got = GraphOps.linkPrediction(
          edges.toDF("src", "dst"), "src", "dst", cap)
        .as[(Long, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      Caches.sweep(spark)
      got
    }
    // micro-quantized 1/ln(deg), the operator's exact arithmetic
    def inv(deg: Long): Long =
      math.round(1e6 / (math.round(math.log(deg.toDouble) * 1e6) / 1e6))
    // path 1-2-3: (1,3) share center 2 (deg 2); nothing else scores
    assert(lp(Seq((1L, 2L), (2L, 3L))) ==
      Map((1L, 3L) -> ((1L, inv(2)))))
    // square: two opposite pairs, each via TWO deg-2 centers
    val sq = lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(sq == Map((1L, 3L) -> ((2L, 2 * inv(2))),
      (2L, 4L) -> ((2L, 2 * inv(2)))), sq.toString)
    // triangle: every sharing pair is already adjacent -> empty
    assert(lp(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
    // star on 4 leaves: cap 3 excludes the deg-4 hub entirely; cap 4
    // admits it and every leaf pair scores 1/ln(4)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(lp(star, cap = 3L).isEmpty)
    val s4 = lp(star, cap = 4L)
    assert(s4.size == 6 && s4.values.forall(_ == ((1L, inv(4)))), s4.toString)
    // duplicate / reversed edges and self-loops canonicalize away
    assert(lp(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))) ==
      Map((1L, 3L) -> ((1L, inv(2)))))
  }

  test("modularity: two triangles + bridge, all-one scores 0, singletons " +
      "negative, unlabeled edges counted") {
    def mod(edges: Seq[(Long, Long)], labs: Seq[(Long, Long)]) = {
      val got = GraphOps.modularity(edges.toDF("src", "dst"), "src", "dst",
          labs.toDF("id", "lab"), "id", "lab")
        .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
      Caches.sweep(spark)
      got
    }
    // triangles {1,2,3} and {4,5,6} joined by the bridge 3-4: m=7,
    // e_c=3 and d_c=7 per triangle -> Q·4m² = 2·(84−49) = 70, Q=70/196
    val tt = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val truePart = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 1L, 5L -> 1L, 6L -> 1L)
    assert(mod(tt, truePart) ==
      ((7L, 0L, 2L, 70L, 196L, Some(0.357143))))
    // the all-in-one partition scores EXACTLY 0 (Σd_c = 2m identity)
    assert(mod(tt, (1L to 6L).map(_ -> 0L)) ==
      ((7L, 0L, 1L, 0L, 196L, Some(0.0))))
    // singletons: no intra edges, Q = −Σdeg²/4m² < 0; degrees are
    // 2,2,3,3,2,2 -> Σd² = 4·4 + 2·9 = 34
    val single = mod(tt, (1L to 6L).map(i => i -> i))
    assert(single._4 == -34L && single._6.get < 0, single.toString)
    // an unlabeled endpoint drops its edges from the scored graph,
    // explicitly counted: node 4 missing -> bridge + 2 triangle edges
    val partial = mod(tt, Seq(1L -> 0L, 2L -> 0L, 3L -> 0L,
      5L -> 1L, 6L -> 1L))
    assert(partial._1 == 4L && partial._2 == 3L, partial.toString)
  }

  test("weightedPageRank: uniform weights match pageRank, weight pull, " +
      "positive-weight guard") {
    def wpr(edges: Seq[(Long, Long, Double)], iters: Int) = {
      val got = GraphOps.weightedPageRank(
          edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
        .as[(Long, Double)].collect().toMap
      Caches.sweep(spark)
      got
    }
    // uniform weights reduce exactly to the unweighted fixed point: a
    // symmetric pair sits at 0.5 every sweep (the pageRank spec's case)
    val pair = wpr(Seq((1L, 2L, 7.0), (2L, 1L, 7.0)), iters = 3)
    assert(pair == Map(1L -> 0.5, 2L -> 0.5), pair.toString)
    // node 0 splits mass 3:1 between 1 and 2: after one sweep from the
    // uniform start, pr(1) = 0.05 + 0.85·(1/3)·(3/4), pr(2) same with 1/4
    val star = wpr(Seq((0L, 1L, 3.0), (0L, 2L, 1.0),
      (1L, 0L, 1.0), (2L, 0L, 1.0)), iters = 1)
    assert(math.abs(star(1L) - (0.05 + 0.85 / 3.0 * 0.75)) < 1e-12,
      star.toString)
    assert(math.abs(star(2L) - (0.05 + 0.85 / 3.0 * 0.25)) < 1e-12)
    assert(star(1L) > star(2L))
    val e = intercept[Exception] {
      wpr(Seq((1L, 2L, 0.0), (2L, 1L, 1.0)), iters = 1)
    }
    assert(e.getMessage.contains("weights must be > 0"), e.getMessage)
  }

  test("diameterLowerBound: exact on a path, honest on a truncating " +
      "budget, empty graph empty") {
    def dia(edges: Seq[(Long, Long)], hops: Int = 16) = {
      val got = GraphOps.diameterLowerBound(
          edges.toDF("src", "dst"), "src", "dst", hops)
        .as[(Long, Long, Boolean, Long, Long, Boolean, Long)]
        .collect().toSeq
      Caches.sweep(spark)
      got
    }
    // path 1-2-3-4-5: start=1, farthest=5 at 4 hops; the return sweep
    // certifies the exact diameter 4 (double sweep is exact on trees)
    assert(dia(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ==
      Seq((1L, 4L, true, 5L, 4L, true, 4L)))
    // lollipop: start in the clique, far end of the tail; exact too
    val lolli = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(dia(lolli) == Seq((1L, 3L, true, 5L, 3L, true, 3L)))
    // a 2-hop budget on the 4-diameter path: the bound truncates and
    // BOTH flags say so (ecc == maxHops, could have gone further)
    assert(dia(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), hops = 2) ==
      Seq((1L, 2L, false, 3L, 2L, false, 2L)))
    // edgeless graph: EMPTY result, never a fabricated row
    assert(dia(Seq((7L, 7L))).isEmpty)
    intercept[IllegalArgumentException] {
      GraphOps.diameterLowerBound(
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0)
    }
  }

  test("diameterBounds: iFUB certifies exact diameters, truncates honestly") {
    def dia(edges: Seq[(Long, Long)], hops: Int = 32, sweeps: Int = 4096,
        cap: Int = 4096) = {
      val got = GraphOps.diameterBounds(
          edges.toDF("src", "dst"), "src", "dst", hops, sweeps, cap)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Boolean,
          Option[Long])]
        .collect().toSeq
      Caches.sweep(spark)
      got
    }
    // path 0-1-2-3-4: root = max degree tie -> 1 (deg 2), ecc 3, far=4
    // -> lb=3, ub=6; level 3 = {4}, ecc 4 (this IS the far sweep —
    // ecc_far reads off the deepest fringe, no dedicated BFS) -> lb=4
    // >= 2*(3-1) -> CLOSED after one level: diameter 4, sweeps 1+1,
    // levels 1
    assert(dia(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))) ==
      Seq((1L, 3L, 4L, 4L, 4L, 4L, 2L, 1L, true, Some(4L))))
    // star 0-{1..5}: root = hub 0, ecc 1, far=1 -> lb=1 < ub=2, so the
    // ONE fringe level {1..5} sweeps (5 landmarks, one expansion),
    // measuring ecc_far=2 with it: lb=2 == ub -> diameter 2, sweeps
    // 1+5, levels 1 — the deepest-fringe ride of the double sweep
    // trades the star's pathological fringe for the saved far-BFS
    assert(dia(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L))) ==
      Seq((0L, 1L, 1L, 2L, 2L, 2L, 6L, 1L, true, Some(2L))))
    // same star with fringeCap=3: the one fringe (5 leaves) exceeds the
    // cap so no fringe sweep runs — the fallback far-BFS measures
    // ecc_far=2, closing the bracket (lb=2 == ub=2) from the seed
    // eccentricities alone; a closed bracket with a complete root
    // sweep IS a certificate, cap truncation notwithstanding (the r15
    // self-review fix — the old !truncated guard returned null here)
    assert(dia(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)),
        cap = 3) ==
      Seq((0L, 1L, 1L, 2L, 2L, 2L, 2L, 0L, true, Some(2L))))
    // 6-cycle 0..5: root 0 (all deg 2, tie -> min id), ecc 3, far=3 ->
    // lb=3, ub=6; level 3 = {3} ecc 3 (= ecc_far) -> ub=4; level 2 =
    // {2,4} ecc 3 -> lb=3 >= 2*(2-1) -> diameter 3, sweeps 1+1+2=4
    val c6 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L))
    assert(dia(c6) == Seq((0L, 3L, 3L, 3L, 3L, 3L, 4L, 2L, true, Some(3L))))
    // the same cycle under maxSweeps=3: level 3 fits (2 sweeps used),
    // level 2 would need 4 > 3 -> STOP with the bracket held at that
    // point (lb=3, ub=4), converged=false, diameter null — announced,
    // never silently wrong (ecc_far already measured by level 3)
    assert(dia(c6, sweeps = 3) ==
      Seq((0L, 3L, 3L, 3L, 3L, 4L, 2L, 1L, false, None)))
    // fringeCap=1 on the cycle: level 2 has 2 nodes > cap -> same stop
    assert(dia(c6, cap = 1) ==
      Seq((0L, 3L, 3L, 3L, 3L, 4L, 2L, 1L, false, None)))
    // a hop budget that truncates the root BFS poisons everything: the
    // flags say so and no diameter is claimed
    val path = dia(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)), hops = 2)
    assert(path.size == 1 && !path.head._9 && path.head._10.isEmpty, path)
    // fringe-sweep truncation keeps the PRE-SWEEP ub: this graph's far
    // node (3, min id at depth 2) has ecc 2 while its level-mate 9 has
    // ecc 3 = the true diameter — the double sweep UNDERestimates. At
    // hops=3 both seed sweeps finish (ecc 2 < 3) but the level-2 fringe
    // sweep observes 3 == maxHops: lb absorbs the genuine distance, ub
    // must STAY at the certified pre-sweep 4 (the buggy 2(i-1) update
    // would claim an uncertified ub), diameter stays null
    val g2 = Seq((0L, 1L), (0L, 2L), (0L, 4L), (1L, 3L), (2L, 3L),
      (4L, 3L), (2L, 9L))
    assert(dia(g2, hops = 3) ==
      Seq((0L, 2L, 3L, 2L, 3L, 4L, 3L, 1L, false, None)))
    // same graph with hop room: the fringe sweep completes, lb=3 meets
    // 2(i-1)=2 -> certified diameter 3 — iFUB certifying what the
    // double sweep alone (lb0 = 2) could not
    assert(dia(g2) == Seq((0L, 2L, 3L, 2L, 3L, 3L, 3L, 1L, true, Some(3L))))
    // edgeless graph: EMPTY result
    assert(dia(Seq((7L, 7L))).isEmpty)
    intercept[IllegalArgumentException] {
      GraphOps.diameterBounds(
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0)
    }
  }
}
