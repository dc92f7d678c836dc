package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Perf probe for the native as-of / interval joins: measures the regime
  * where the custom execs beat the DataFrame encodings they replace, on a
  * deterministic synthetic dataset with a HOT KEY and a WIDE right payload
  * — the shape where the encodings' costs explode and sf0.1 events (small,
  * uniform keys, 1-column payload) can't show the difference.
  *
  *  - As-of: the union+window encoding (q32/q47 shape) needs one
  *    `last(..., ignoreNulls)` window aggregate PER RIGHT PAYLOAD COLUMN
  *    over the interleaved union of both sides; the native exec carries
  *    the whole right row through one merge scan. Probe: 8 payload cols.
  *  - Interval: the equi-join + time-filter encoding materializes every
  *    same-key pair before filtering — quadratic in the hot key; the
  *    native exec's sliding buffer admits and evicts each right row once.
  *
  * Each variant runs twice (JIT/codegen warm) and reports the best; both
  * variants' row counts are asserted equal so the comparison is honest.
  * `sbt "runMain graft.PerfProbe [outFile]"` → PERF_PROBE.md.
  */
object PerfProbe {

  /** Deterministic pseudo-random spread of `n` rows: ~half land on hot
    * key 0, the rest on 997 uniform keys; times scatter over `spanUs`. */
  private def side(
      spark: SparkSession, n: Long, spanUs: Long, idOffset: Long): DataFrame =
    spark.range(n).select(
      (col("id") + idOffset).as("rid"),
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 997L).as("key"),
      (((col("id") * 7919L) + (col("id") * col("id")) % 104729L) % spanUs)
        .as("t"))

  private def time2(label: String)(build: => DataFrame): (String, Double, Long) = {
    var best = Double.MaxValue
    var rows = 0L
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = build
      rows = df.count()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      // internally-persisting pipelines (the BM25 variants) must not hand
      // rep 2 a CacheManager hit — the min would measure a cache lookup,
      // not the plan (same per-rep discipline as Bench.scala); sweep also
      // frees localCheckpoint blocks the iterative operators return
      Caches.sweep(df.sparkSession)
    }
    (label, best, rows)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/PERF_PROBE.md")
    val spark = Sessions.get()
    import spark.implicits._

    // ---- as-of: 2M x 2M, hot key with ~1M rows per side, 8-col payload
    val spanUs = 3600L * 1000000L
    val nAsof = 2000000L
    val pSide = side(spark, nAsof, spanUs, 0L)
      .select($"rid".as("p_id"), $"key", $"t".as("p_us"))
    val payloads = (1 to 8).map(i => ($"rid" * i).as(s"pay$i"))
    val cSide = side(spark, nAsof, spanUs, nAsof)
      .select(Seq($"rid".as("c_id"), $"key".as("c_key"), $"t".as("c_us")) ++
        payloads: _*)

    val payNames = (1 to 8).map(i => s"pay$i")
    val asofNative = time2("asof_native") {
      graft.plans.AsOf.join(pSide, cSide, ("key", "c_key"), ("p_us", "c_us"))
        .select(Seq($"p_id", $"c_id", $"c_us") ++ payNames.map(col): _*)
    }
    val asofWindow = time2("asof_window_encoding") {
      // q32/q47 shape generalized to the full payload: interleave both
      // sides, one running last() PER carried right column
      val u = pSide.select(Seq($"p_id".as("rid"), $"key", $"p_us".as("t"),
          lit(1).as("kind"), lit(null).cast("long").as("c_id")) ++
          payNames.map(n => lit(null).cast("long").as(n)): _*)
        .unionByName(cSide.select(Seq($"c_id".as("rid"), $"c_key".as("key"),
          $"c_us".as("t"), lit(0).as("kind"), $"c_id") ++
          payNames.map(col): _*), allowMissingColumns = false)
      val w = Window.partitionBy($"key").orderBy($"t", $"kind", $"rid")
        .rowsBetween(Window.unboundedPreceding, 0)
      val carried = Seq("c_us2" -> $"t", "m_cid" -> $"c_id") ++
        payNames.map(n => s"m_$n" -> col(n))
      val withCarried = carried.foldLeft(u) { case (df, (alias, c)) =>
        df.withColumn(alias, last(when($"kind" === 0, c), ignoreNulls = true).over(w))
      }
      withCarried
        .filter($"kind" === 1 && $"c_us2".isNotNull)
        .select(Seq($"rid".as("p_id"), $"m_cid".as("c_id"),
          $"c_us2".as("c_us")) ++ payNames.map(n => col(s"m_$n").as(n)): _*)
    }

    // ---- interval: 400k x 400k, hot key ~200k per side -> the equi-join
    //      encoding enumerates ~4e10 hot-key pair candidates before the
    //      time filter (even broadcast-parallelized that work is
    //      quadratic); the native buffer admits and evicts each right row
    //      once and only materializes in-window pairs
    val nInt = 400000L
    val winUs = spanUs / 500L // ~window density 100 on the hot key
    val pInt = side(spark, nInt, spanUs, 0L)
      .select($"rid".as("p_id"), $"key", $"t".as("p_us"))
    val cInt = side(spark, nInt, spanUs, nInt)
      .select($"rid".as("c_id"), $"key".as("c_key"), $"t".as("c_us"))

    val intNative = time2("interval_native") {
      graft.plans.Interval.join(pInt, cInt, ("key", "c_key"), ("p_us", "c_us"),
        windowUs = winUs)
        .select($"p_id", $"c_id")
    }
    val intTheta = time2("interval_theta_encoding") {
      pInt.join(cInt, $"key" === $"c_key" &&
        $"c_us" >= $"p_us" - winUs && $"c_us" <= $"p_us")
        .select($"p_id", $"c_id")
    }

    // ---- connected components at graph scale: 100 cliques of 50 (the
    //      near-dup cluster shape LSH emits, ~k²/2 edges each) + 20
    //      chains of 1000 (the contraction worst case) -> the edge-
    //      contraction rounds must shrink the working set monotonically
    //      and converge in O(log n) rounds
    val cliqueEdges = spark.range(100).select($"id".as("c"))
      .crossJoin(spark.range(50).select($"id".as("i")))
      .crossJoin(spark.range(50).select($"id".as("j")))
      .filter($"i" < $"j")
      .select(($"c" * 50 + $"i").as("id_a"), ($"c" * 50 + $"j").as("id_b"))
    val chainBase = 1000000L
    val chainEdges = spark.range(20).select($"id".as("c"))
      .crossJoin(spark.range(999).select($"id".as("i")))
      .select(($"c" * 1000 + $"i" + chainBase).as("id_a"),
        ($"c" * 1000 + $"i" + 1 + chainBase).as("id_b"))
    val t0 = System.nanoTime()
    val (labels, trace) = graft.operators.Dedup.connectedComponentsStats(
      cliqueEdges.unionByName(chainEdges), maxIter = 25)
    val nComponents = labels.select("label").distinct().count()
    val ccSec = (System.nanoTime() - t0) / 1e9
    require(nComponents == 120, s"expected 120 components, got $nComponents")
    Caches.sweep(spark)

    // ---- graph-wave probes (round-10 directive): LPA per-sweep cost
    //      and BFS frontier expansion, broadcast vs forced-shuffle
    //      frontier joins, on the SAME 142k-edge clique+chain graph as
    //      the CC probe. Edges are directed low->high (cliques) and
    //      head->tail (chains).
    val graphEdges = cliqueEdges.unionByName(chainEdges)
      .select($"id_a".as("src"), $"id_b".as("dst"))
    val lpa3 = time2("lpa_3_sweeps")(
      graft.operators.GraphOps.labelPropagation(graphEdges, "src", "dst", 3))
    val lpa6 = time2("lpa_6_sweeps")(
      graft.operators.GraphOps.labelPropagation(graphEdges, "src", "dst", 6))
    require(lpa3._3 == lpa6._3,
      s"LPA node count mismatch: ${lpa3._3} vs ${lpa6._3}")
    // seeds: the 20 chain heads (frontier 20/hop — the long-tail shape)
    // + the 100 clique roots (hop-1 burst of 4,900 nodes)
    val bfsSeeds = spark.range(20).select(($"id" * 1000 + chainBase).as("id"))
      .unionByName(spark.range(100).select(($"id" * 50).as("id")))
    // driverFrontierBelow = 0 forces the DISTRIBUTED frontier loop —
    // this probe measures the broadcast-vs-shuffle frontier JOIN, which
    // the 142k-edge graph's small-graph driver fast path would
    // otherwise bypass entirely (both variants would time identical
    // driver-side code and a distributed-join regression would hide)
    def runBfs(bound: Long) = graft.operators.GraphOps.bfsDistances(
      graphEdges, "src", "dst", bfsSeeds, "id", maxHops = 10,
      broadcastFrontierBelow = bound, driverFrontierBelow = 0L)
    val bfsBroadcast = time2("bfs_10hops_broadcast_frontier")(runBfs(2000000L))
    val bfsShuffle = time2("bfs_10hops_shuffle_frontier")(runBfs(0L))
    require(bfsBroadcast._3 == bfsShuffle._3,
      s"BFS reach mismatch: ${bfsBroadcast._3} vs ${bfsShuffle._3}")

    // ---- BM25 known-query scoring: the map-side design (per-doc tf from
    //      the token array, df/N/avgdl in one global agg, heap top-k —
    //      zero corpus-width shuffles) vs routing the same query through
    //      a full posting-list index build (the only alternative when no
    //      persisted index exists): explode 40M tokens, (term, doc)
    //      aggregation, then score. Same result set asserted.
    val vocabArr = array((1 to 1000).map(i => lit(s"w$i")): _*)
    val probeDocs = spark.range(200000L).select($"id",
      concat_ws(" ", transform(sequence(lit(1), lit(200)),
        i => element_at(vocabArr,
          (pmod(xxhash64($"id" * 1000L + i.cast("long")), lit(1000)) + 1)
            .cast("int")))).as("text"))
    val probeTerms = Seq("w1", "w2", "w3")
    def bmMapSideTopK(): DataFrame =
      graft.operators.Retrieval.bm25TopK(probeDocs, "id", "text",
        probeTerms, k = 10)
    def bmIndexRouteTopK(): DataFrame = {
      val (postings, doclens, termdf, stats) =
        graft.operators.Retrieval.bm25Index(probeDocs, "id", "text")
      postings.filter($"term".isin(probeTerms: _*))
        .join(broadcast(termdf.filter($"term".isin(probeTerms: _*))), "term")
        .join(doclens, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("w",
          log(lit(1.0) + ($"n" - $"df" + 0.5) / ($"df" + 0.5)) *
            ($"tf" * 2.2) /
            ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / $"avgdl")))
        .groupBy($"doc_id").agg(round(sum($"w"), 4).as("score"))
        .orderBy($"score".desc, $"doc_id").limit(10)
        .select($"doc_id", $"score")
    }
    val bmMapSide = time2("bm25_mapside_scoring")(bmMapSideTopK())
    val bmViaIndex = time2("bm25_via_index_build")(bmIndexRouteTopK())
    // same retrieved set (ids, not scores: the index route's groupBy sums
    // term weights in partial-agg order, which can flip a 4th decimal)
    val bmIdsA = bmMapSideTopK().collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    val bmIdsB = bmIndexRouteTopK().collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    // boundary-insensitive: the index route's 4th decimal can flip from
    // partial-agg summation order, which may swap the rank-10/rank-11
    // docs — an equality assert would fail spuriously on a tie at the
    // retrieval boundary. 9-of-10 overlap still catches a real scoring
    // divergence (any formula/df bug shifts far more than one rank).
    require(bmIdsA.intersect(bmIdsB).size >= 9,
      s"BM25 variants disagree beyond the rank-boundary tolerance: " +
        s"${bmIdsA.diff(bmIdsB)} vs ${bmIdsB.diff(bmIdsA)}")

    // ---- SCD2 merge: broadcast-only plan vs the naive full-outer join.
    // 5M-row current dimension with a 5-column payload, 50k-row batch
    // (~49.5k changed existing keys, ~500 brand-new). Spark cannot
    // broadcast a full-outer equi-join, so the naive encoding shuffles
    // all 5M dimension rows (payload and all) on the key; the 3-join
    // design (left-outer + semi + anti, all building on the batch side)
    // keeps every byte of the dimension map-side.
    val dimN = 5000000L
    // parquet-backed dimension (written once, OUTSIDE the timed region):
    // both variants read the same files, the way a real warehouse merge
    // does — and the broadcast design's semi-join pass gets to show its
    // column pruning (it reads only the key column). An in-memory range
    // source with a dedup shuffle inside it would hand the full-outer
    // variant a reusable exchange and bill the broadcast variant twice
    // for the source — a rigged comparison in the naive plan's favor.
    val scdPath = Scratch.dir("perfprobe_scd_dim")
    spark.range(dimN).select($"id".as("k"),
      ($"id" % 1000).cast("string").as("v"),
      concat(lit("p1-"), $"id" % 7).as("p1"),
      concat(lit("p2-"), $"id" % 11).as("p2"),
      concat(lit("p3-"), $"id" % 13).as("p3"),
      concat(lit("p4-"), $"id" % 17).as("p4"),
      lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
      lit(true).as("is_current"))
      .write.mode("overwrite").parquet(scdPath)
    def scdDim = spark.read.parquet(scdPath)
    val scdBatch = spark.range(50000L).select(
      // 90% hit existing keys (100*id stays inside the dim keyspace),
      // 10% land past it → guaranteed brand-new
      when($"id" % 10 === 9, $"id" + 20000000L)
        .otherwise($"id" * 100L).as("k"),
      lit("changed").as("v"),
      lit("p1-x").as("p1"), lit("p2-x").as("p2"),
      lit("p3-x").as("p3"), lit("p4-x").as("p4"))
    def scdNaiveFullOuter(): DataFrame = {
      val attrs = Seq("v", "p1", "p2", "p3", "p4")
      val cur = scdDim.filter($"is_current")
      val upd = scdBatch.select($"k".as("_ukey") +:
        attrs.map(c => col(c).as(s"_u_$c")): _*)
      val j = cur.join(upd, $"k" === $"_ukey", "full_outer")
      val changed = $"_ukey".isNotNull && ($"k".isNull ||
        !(struct(attrs.map(col): _*) <=>
          struct(attrs.map(c => col(s"_u_$c")): _*)))
      val outCols = ("k" +: attrs) ++ Seq("valid_from", "valid_to", "is_current")
      def rs(src: String => org.apache.spark.sql.Column,
          from: org.apache.spark.sql.Column, to: org.apache.spark.sql.Column,
          currentFlag: org.apache.spark.sql.Column) =
        struct(outCols.map {
          case "valid_from" => from.cast("long").as("valid_from")
          case "valid_to" => to.cast("long").as("valid_to")
          case "is_current" => currentFlag.as("is_current")
          case c => src(c).as(c)
        }: _*)
      val keep = rs(col, $"valid_from", $"valid_to", lit(true))
      val closed = rs(col, $"valid_from", lit(100L), lit(false))
      val opened = rs(
        c => if (c == "k") coalesce($"k", $"_ukey") else col(s"_u_$c"),
        lit(100L), lit(null), lit(true))
      j.select(explode(
        when(!changed, array(keep))
          .otherwise(when($"k".isNull, array(opened))
            .otherwise(array(closed, opened)))).as("_r"))
        .select($"_r.*")
    }
    val scdBroadcast = time2("scd2_broadcast_3join")(
      graft.operators.Mutations.scd2Merge(scdDim, scdBatch, "k", 100L))
    val scdNaive = time2("scd2_naive_full_outer")(scdNaiveFullOuter())
    require(scdBroadcast._3 == scdNaive._3,
      s"scd2 row mismatch: broadcast ${scdBroadcast._3} vs naive ${scdNaive._3}")

    // ---- deletion-vector crossover (round-11 directive): merge-on-read
    //      overhead as a function of the deleted fraction, against the
    //      one-time vacuum rewrite — the measured threshold behind
    //      Layout.deleteFraction's "trigger vacuum mechanically" advice.
    //      5M-row base (8 files, 2 payload cols); per fraction: MoR
    //      aggregate read (broadcast path), the same read through the
    //      over-budget fallback (shuffled anti-join — the degraded mode's
    //      honest price), vacuum cost, and the post-vacuum plain read.
    val dvN = 5000000L
    val dvStats = Seq(0.0001, 0.001, 0.01, 0.1).map { frac =>
      val dvPath = Scratch.dir(s"perfprobe_dv_${(frac * 10000).toInt}")
      spark.range(dvN).select($"id",
        ($"id" % 97).as("a"), concat(lit("pay-"), $"id" % 1013).as("b"))
        .repartition(8).write.mode("overwrite").parquet(dvPath)
      graft.operators.Layout.deleteWhere(spark, dvPath,
        pmod(xxhash64($"id"), lit(1000000L)) < (frac * 1000000L).toLong)
      val vecBytes = graft.operators.Layout.deleteVectorBytes(spark, dvPath)
      val mor = time2(s"dv_mor_$frac")(
        graft.operators.Layout.readWithDeletes(spark, dvPath)
          .groupBy($"a").count())
      val fb = {
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try time2(s"dv_fallback_$frac")(
          graft.operators.Layout.readWithDeletes(spark, dvPath,
            broadcastBytesMax = 0L).groupBy($"a").count())
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
      val tv0 = System.nanoTime()
      graft.operators.Layout.vacuum(spark, dvPath)
      val vacSec = (System.nanoTime() - tv0) / 1e9
      Caches.sweep(spark)
      val plain = time2(s"dv_plain_$frac")(
        spark.read.parquet(dvPath).groupBy($"a").count())
      (frac, vecBytes, mor._2, fb._2, vacSec, plain._2)
    }

    val results = Seq(asofNative, asofWindow, intNative, intTheta,
      bmMapSide, bmViaIndex, scdBroadcast, scdNaive,
      lpa3, lpa6, bfsBroadcast, bfsShuffle)
    require(asofNative._3 == asofWindow._3,
      s"as-of row mismatch: native ${asofNative._3} vs window ${asofWindow._3}")
    require(intNative._3 == intTheta._3,
      s"interval row mismatch: native ${intNative._3} vs theta ${intTheta._3}")

    val sb = new StringBuilder
    sb.append("# PERF_PROBE — native as-of / interval joins vs their encodings\n\n")
    sb.append(s"Generated by `graft.PerfProbe` (local[${
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}], best of 2 runs each,\n")
    sb.append("row counts asserted equal between variants).\n\n")
    sb.append("Dataset: deterministic synthetic; ~50% of rows on one hot key,\n")
    sb.append("rest uniform over 997 keys. As-of: 2M x 2M rows, 8 right payload\n")
    sb.append("columns. Interval: 400k x 400k rows, window = span/500 (~400\n")
    sb.append("in-window rows on the hot key; ~4e10 same-key pair candidates\n")
    sb.append("for the equi-join encoding vs ~8e7 in-window pairs).\n\n")
    sb.append("| variant | best sec | output rows |\n|---|---|---|\n")
    results.foreach { case (l, s, r) =>
      sb.append(f"| $l | $s%.2f | $r |\n")
    }
    sb.append(f"""
      |Connected components (142,480 input edges: 100 50-cliques + 20
      |1000-chains, 120 true components): converged in ${trace.size} rounds,
      |$ccSec%.1fs. Per-round edge counts: ${trace.distinct.mkString(" -> ")}
      |(x${trace.size}). The zero-shuffle local-contraction pre-pass runs
      |a union-find inside each input partition, so any component that
      |fits a partition (every clique and chain here) collapses to its
      |n-1 star edges (24,880 = one edge per non-root node) BEFORE the
      |first exchange — the star loop starts at that floor and spends its
      |rounds verifying the fixpoint / stitching components that SPAN
      |partitions. Label propagation would re-join all 142k edges every
      |round; without pre-contraction the star loop took ~11
      |pointer-doubling rounds on this graph (16.0s round 5; 8.8s with
      |window-min stars alone).
      |
      |Label propagation on the same graph: 3 sweeps ${lpa3._2}%.2fs,
      |6 sweeps ${lpa6._2}%.2fs -> marginal per-sweep cost
      |${(lpa6._2 - lpa3._2) / 3}%.2fs (each sweep = one edge-vs-labels
      |broadcast join + one (dst,label) count agg + one node-grain
      |hash-agg argmax, state localCheckpointed per sweep — the
      |IterativeLoop contract, so cost per sweep is FLAT in the sweep
      |budget; an uncut LPA plan would DOUBLE per sweep because each
      |sweep references the label state twice).
      |
      |BFS 10 hops from 120 seeds (hop-1 burst 4,900 clique nodes, then
      |20 chain nodes/hop): broadcast frontier ${bfsBroadcast._2}%.2fs vs
      |forced shuffle-join frontier ${bfsShuffle._2}%.2fs. At 142k edges
      |the broadcast path is NOT ahead (run-to-run it lands 0.9x-1.5x of
      |the shuffle path): each hop pays a blocking driver-side broadcast
      |construction, while shuffling 142k rows is nearly free — fixed
      |per-hop overhead dominates at probe scale. Read the STRUCTURE,
      |not the ratio: under the 2M-node bound the frontier
      |broadcasts into the edge join and the edge set never shuffles
      |(per-hop cost = one map-side join + the visited anti-join, O(hops)
      |map passes over edge splits); past the bound every hop re-exchanges
      |the edge set, which at crawl scale (billions of edges) is the
      |whole-graph-shuffle-per-hop regime. The fallback exists because a
      |100M-node frontier cannot broadcast; the probe demonstrates both
      |paths produce the identical reach set (asserted).
      |
      |As-of speedup native/window: ${asofWindow._2 / asofNative._2}%.2fx.
      |Interval speedup native/theta: ${intTheta._2 / intNative._2}%.2fx.
      |
      |BM25 known-query scoring (200k docs x 200 tokens, 3 query terms):
      |map-side design ${bmMapSide._2}%.2fs vs full index-build route
      |${bmViaIndex._2}%.2fs (${bmViaIndex._2 / bmMapSide._2}%.2fx;
      |run-to-run this ratio wanders ~0.9-2x on this synthetic — both
      |routes are a few seconds and JVM-noise-sensitive, so read the
      |STRUCTURE, not the decimals). The structural difference: the
      |map-side path computes per-doc tf from the token array and
      |collapses df/N/avgdl into ONE global aggregation (a broadcast
      |row), so the 40M exploded tokens and their (term, doc) shuffle
      |never exist — the right shape when the query set is known at scan
      |time. The index route pays that explode+shuffle ONCE to persist
      |postings (`bm25IndexWrite`), after which every query reads only
      |its terms' buckets (t23's ScaleSpec pin) — the right shape for a
      |serving workload, where per-query cost must not include a corpus
      |scan of any kind.
      |
      |SCD2 merge (5M-row current dimension, 6 payload columns, 50k-row
      |batch): broadcast 3-join design ${scdBroadcast._2}%.2fs vs naive
      |full-outer ${scdNaive._2}%.2fs
      |(${scdNaive._2 / scdBroadcast._2}%.2fx). Spark cannot broadcast a
      |full-outer equi-join, so the naive merge shuffles every dimension
      |row (payload included) on the key per batch; the 3-join plan
      |(left-outer keep/close/reopen + semi matched-keys + anti new-keys,
      |all building on the batch) keeps the dimension entirely map-side —
      |ScaleSpec pins the zero-shuffle plan. At 100 TB the gap is the
      |difference between "re-shuffle the warehouse nightly" and "stream
      |it through".
      |
      |Why the gap grows with scale: the window encoding pays one
      |`last(ignoreNulls)` running aggregate per carried right column over
      |the union of BOTH sides (hot-key partition sorted in one task); the
      |equi-join encoding materializes every same-key pair (quadratic in the
      |hot key) before the time filter drops them. The native execs shuffle
      |each side once on the key, sort within partitions, and stream a
      |forward merge with O(1)/O(window) state — per-row cost independent of
      |payload width and key skew beyond the sort itself.
      |""".stripMargin)
    sb.append(
      """
        |## Deletion-vector crossover (merge-on-read vs vacuum)
        |
        |5M-row base table (8 files, 2 payload columns); per deleted
        |fraction: the aggregate read through the live view (broadcast
        |anti-join), the same read through the over-budget FALLBACK
        |(shuffled anti-join — what readWithDeletes degrades to past its
        |broadcast byte budget), the one-time vacuum rewrite, and the
        |post-vacuum plain read. Best of 2 except vacuum (it mutates).
        |
        || deleted | vector bytes | MoR read s | fallback read s | vacuum s | plain read s |
        ||---|---|---|---|---|---|
        |""".stripMargin)
    dvStats.foreach { case (frac, bytes, mor, fb, vac, plain) =>
      sb.append(f"| ${frac * 100}%.2f%% | $bytes | $mor%.2f | $fb%.2f | $vac%.2f | $plain%.2f |\n")
    }
    val dvWorst = dvStats.last
    sb.append(f"""
      |Read the table as the maintenance policy: MoR overhead per read =
      |(MoR - plain); vacuum amortizes after vacuum_s / overhead reads.
      |At the measured worst point (${dvWorst._1 * 100}%.1f%% deleted) the
      |overhead is ${dvWorst._3 - dvWorst._6}%.2fs/read against a
      |${dvWorst._5}%.2fs rewrite — and the overhead is dominated by the
      |anti-join probe, which scales with the VECTOR, not the base, so at
      |100 TB the policy threshold is the vector's broadcast budget (32 MB
      |on-disk default ~= low-1e7 pairs), not read latency: deleteFraction
      |is the trigger, vacuum the reset. The fallback column prices the
      |degraded mode: one extra exchange of the base — tolerable as a
      |safety net, wrong as a steady state.
      |""".stripMargin)
    // a full regeneration must not drop the OTHER probes' measured
    // sections — carry everything from the first sibling marker onward
    // verbatim (LineageOverheadProbe sits before the scale section and
    // each probe replaces only its own section in place)
    val siblingMarkers = Seq("\n## Lineage listener overhead",
      "\n## Scale probe: sf0.1 → sf1")
    val prior =
      try java.nio.file.Files.readString(java.nio.file.Paths.get(out))
      catch { case _: java.io.IOException => "" }
    val keepFrom = siblingMarkers.map(prior.indexOf).filter(_ >= 0)
    val carried = if (keepFrom.isEmpty) "" else prior.substring(keepFrom.min)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out), sb.toString + carried)
    results.foreach { case (l, s, r) => println(f"[probe] $l%-28s $s%8.2fs  $r rows") }
    println(s"wrote $out")
    spark.stop()
  }
}
