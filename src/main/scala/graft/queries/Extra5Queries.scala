package graft.queries

import graft.{Q, Tables}
import graft.operators.{Dedup, GraphOps, Mutations}
import org.apache.spark.sql.functions._

/** Round-9 second wave: the temporal read side of the mutation stack
  * (SCD2 time travel), incremental JOIN-view maintenance, and
  * sorted-neighborhood entity resolution.
  */
object Extra5Queries {

  /** Unrolled SQL replay of `rounds` bulk-peel rounds at threshold `k`
    * over edge CTE `input`, emitting CTEs `{pfx}d1..{pfx}e{rounds}` —
    * the q118 oracle pattern, parameterized for the coreness ladder.
    * Extra rounds past the true fixed point are no-ops, so any `rounds`
    * ≥ the converged round count replays the engine exactly. */
  private def peelChainSql(k: Int, input: String, pfx: String,
      rounds: Int): String =
    (1 to rounds).map { r =>
      val prev = if (r == 1) input else s"${pfx}e${r - 1}"
      s"""${pfx}d$r AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
         |    SELECT u AS id FROM $prev UNION ALL SELECT v AS id FROM $prev) GROUP BY id),
         |${pfx}k$r AS (SELECT id FROM ${pfx}d$r WHERE dg >= $k),
         |${pfx}e$r AS MATERIALIZED (SELECT u, v FROM $prev
         |  WHERE u IN (SELECT id FROM ${pfx}k$r) AND v IN (SELECT id FROM ${pfx}k$r))""".stripMargin
    }.mkString(",\n")

  def all: Seq[Q] = Seq(

    // ---- SCD2 time travel: two scd2Merge batches build a 3-epoch
    //      history (ts=100 changes %10==3 keys and inserts %50==7 clones;
    //      ts=200 re-changes %20==3 keys and the clones), then asOf(150)
    //      reconstructs the mid-epoch state — historical CLOSED rows
    //      (valid_to=200 > 150) must surface, the ts=200 openings must
    //      not, and rows closed at 100 must not. The oracle states the
    //      expected epoch directly instead of replaying merge mechanics:
    //      %10==3 keys at their +100 version (valid_from 100), clones at
    //      their original balances (valid_from 100), everyone else
    //      untouched (valid_from 0). ----
    Q("q114_time_travel",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val dim0 = cust
          .withColumn("valid_from", lit(0L))
          .withColumn("valid_to", lit(null).cast("long"))
          .withColumn("is_current", lit(true))
        // clone-key offset far above any plausible SF's key range
        // (TPC-H custkey = 150k*SF; 1e9 collides only past SF ~6600 —
        // the old +1e6 collided at SF >= ~7, dataset-fragile)
        val clones = cust.filter($"c_custkey" % 50 === 7)
          .withColumn("c_custkey", $"c_custkey" + 1000000000L)
        val b1 = cust.filter($"c_custkey" % 10 === 3)
          .withColumn("c_acctbal", round($"c_acctbal" + 100, 2))
          .unionByName(clones)
        val dim1 = Mutations.scd2Merge(dim0, b1, "c_custkey", ts = 100L)
        val b2 = cust.filter($"c_custkey" % 20 === 3)
          .withColumn("c_acctbal", round($"c_acctbal" + 200, 2))
          .unionByName(clones
            .withColumn("c_acctbal", round($"c_acctbal" + 500, 2)))
        val dim2 = Mutations.scd2Merge(dim1, b2, "c_custkey", ts = 200L)
        Mutations.asOf(dim2, 150L)
          .select($"c_custkey", $"c_acctbal", $"valid_from")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, round(c_acctbal + 100, 2) AS c_acctbal,
             |  CAST(100 AS BIGINT) AS valid_from
             |FROM customer WHERE c_custkey % 10 = 3
             |UNION ALL
             |SELECT c_custkey, c_acctbal, CAST(0 AS BIGINT)
             |FROM customer WHERE c_custkey % 10 <> 3
             |UNION ALL
             |SELECT c_custkey + 1000000000, c_acctbal, CAST(100 AS BIGINT)
             |FROM customer WHERE c_custkey % 50 = 7
             |ORDER BY c_custkey""".stripMargin)),

    // ---- incremental JOIN-view maintenance: the orders⋈lineitem view is
    //      maintained as old-view ∪ joinViewDelta (both bases split at a
    //      late cutoff so the deltas are genuinely batch-sized — ~4% of
    //      rows), then aggregated. The oracle joins the FULL tables,
    //      oblivious to the split — exactly the IVM invariant
    //      (V ∪ ΔV ≡ recompute); any double-counted or dropped delta
    //      term breaks the count/sum. ----
    Q("q115_join_ivm",
      (s, dir) => {
        import s.implicits._
        val cut = lit("2001-06-01").cast("timestamp")
        val orders = Tables(s, dir, "orders")
          .select($"o_orderkey", $"o_orderpriority", $"o_orderdate")
        val li = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_extendedprice", $"l_shipdate")
        val (aOld, dA) = (orders.filter($"o_orderdate" < cut),
          orders.filter($"o_orderdate" >= cut))
        val (bOld, dB) = (li.filter($"l_shipdate" < cut),
          li.filter($"l_shipdate" >= cut))
        val oldView = aOld.join(bOld, $"o_orderkey" === $"l_orderkey")
        val refreshed = oldView.unionByName(
          Mutations.joinViewDelta(aOld, dA, bOld, dB,
            "o_orderkey", "l_orderkey"))
        refreshed.groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum($"l_extendedprice"), 2).as("rev"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  round(sum(l_extendedprice), 2) AS rev
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- sorted-neighborhood entity resolution over a deterministically
    //      dirtied record set: part names with two variant classes
    //      (capitalized first letter for %3==0 keys, a " co" suffix for
    //      %5==0) resolve back to their base-name entities via sort on
    //      lower(name), window-4 candidates, jw>=0.92 matching, and
    //      transitive closure. The threshold sits between the variant
    //      band (capitalization 0.9259+, suffix 0.95+) and the closest
    //      cross-name pairs (~0.91); "Small ring" ↔ "small ring co" is
    //      0.8641 — BELOW threshold — and links only through the base
    //      record, which is the transitive-closure behavior the gate
    //      pins. Oracle replays the identical pipeline: row_number sort
    //      rank, windowed self-join, DuckDB's jaro_winkler_similarity
    //      (bit-parity with StringSim, the q93 contract), recursive-CTE
    //      min-label closure. ----
    Q("d15_entity_resolution",
      (s, dir) => {
        import s.implicits._
        val recs = Tables(s, dir, "part")
          .select($"p_partkey".as("rid"),
            when($"p_partkey" % 3 === 0,
              concat(upper(substring($"p_name", 1, 1)),
                substring($"p_name", 2, 1000)))
              .otherwise($"p_name").as("nm0"))
          .select($"rid",
            when($"rid" % 5 === 0, concat($"nm0", lit(" co")))
              .otherwise($"nm0").as("nm"))
        Dedup.sortedNeighborhoodEr(recs, "rid", "nm",
            lower(col("nm")), window = 4, threshold = 0.92)
          .groupBy($"entity").agg(count(lit(1)).as("n_records"))
          .filter($"n_records" >= 2)
          .orderBy($"n_records".desc, $"entity")
          .limit(20)
      },
      Some("""WITH RECURSIVE recs AS (
             |  SELECT rid, CASE WHEN rid % 5 = 0 THEN base || ' co'
             |    ELSE base END AS nm
             |  FROM (
             |    SELECT p_partkey AS rid,
             |      CASE WHEN p_partkey % 3 = 0 THEN
             |        upper(substring(p_name, 1, 1)) || substring(p_name, 2)
             |      ELSE p_name END AS base
             |    FROM part)
             |), ranked AS (
             |  SELECT rid, nm,
             |    row_number() OVER (ORDER BY lower(nm), rid) - 1 AS rn
             |  FROM recs
             |), edges AS (
             |  SELECT a.rid AS ra, b.rid AS rb
             |  FROM ranked a JOIN ranked b
             |    ON b.rn > a.rn AND b.rn <= a.rn + 4
             |  WHERE round(jaro_winkler_similarity(a.nm, b.nm), 4) >= 0.92
             |), sym AS (
             |  SELECT ra AS u, rb AS v FROM edges
             |  UNION SELECT rb, ra FROM edges
             |), nodes AS (SELECT DISTINCT u AS id FROM sym),
             |reach(id, r) AS (
             |  SELECT id, id FROM nodes
             |  UNION
             |  SELECT s.v, r.r FROM reach r JOIN sym s ON s.u = r.id
             |), lab AS (SELECT id, min(r) AS entity FROM reach GROUP BY id),
             |allrec AS (
             |  SELECT rec.rid, coalesce(l.entity, rec.rid) AS entity
             |  FROM recs rec LEFT JOIN lab l ON rec.rid = l.id
             |)
             |SELECT entity, count(*) AS n_records FROM allrec
             |GROUP BY entity HAVING count(*) >= 2
             |ORDER BY n_records DESC, entity LIMIT 20""".stripMargin)),

    // ---- personalized PageRank (random walk with restart to customer
    //      seeds 1-5) over q103's symmetrized trade graph, 3 sweeps:
    //      proximity-to-seeds scores for seed-expansion-style corpus
    //      curation. Same dangling-leak simplification as q103, shared
    //      by the oracle, which unrolls the sweeps as CTEs (the
    //      q113/q112 pattern). Top 20 by rounded score. ----
    Q("q116_ppr",
      (s, dir) => {
        import s.implicits._
        val pairs = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("a"),
            ($"l_suppkey" + 1000000L).cast("long").as("b")).distinct()
        val edges = pairs.select(explode(array(
            struct($"a".as("src"), $"b".as("dst")),
            struct($"b".as("src"), $"a".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst"))
        val seeds = edges.select($"src".as("id")).filter($"id" <= 5)
        GraphOps.personalizedPageRank(edges, "src", "dst", seeds, "id",
            iterations = 3)
          .select($"id".as("node_id"), round($"pr", 7).as("ppr"))
          .orderBy($"ppr".desc, $"node_id").limit(20)
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |), edges AS (
             |  SELECT a AS src, b AS dst FROM pairs
             |  UNION ALL
             |  SELECT b AS src, a AS dst FROM pairs
             |), nodes AS (SELECT DISTINCT src AS id FROM edges),
             |deg AS (
             |  SELECT src, CAST(count(*) AS DOUBLE) AS deg
             |  FROM edges GROUP BY src
             |), seeds AS (SELECT id FROM nodes WHERE id <= 5),
             |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM seeds),
             |r AS (
             |  SELECT n.id,
             |    CASE WHEN s.id IS NOT NULL THEN 1.0 / (SELECT k FROM kk)
             |      ELSE 0.0 END AS rv
             |  FROM nodes n LEFT JOIN seeds s ON n.id = s.id
             |), p0 AS (SELECT id, rv AS pr FROM r),
             |p1 AS (
             |  SELECT r.id, 0.15 * r.rv + 0.85 * coalesce(s.m, 0) AS pr
             |  FROM r LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS m
             |    FROM edges e JOIN p0 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON r.id = s.id
             |), p2 AS (
             |  SELECT r.id, 0.15 * r.rv + 0.85 * coalesce(s.m, 0) AS pr
             |  FROM r LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS m
             |    FROM edges e JOIN p1 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON r.id = s.id
             |), p3 AS (
             |  SELECT r.id, 0.15 * r.rv + 0.85 * coalesce(s.m, 0) AS pr
             |  FROM r LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr / d.deg) AS m
             |    FROM edges e JOIN p2 p ON e.src = p.id
             |      JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON r.id = s.id
             |)
             |SELECT id AS node_id, round(pr, 7) AS ppr FROM p3
             |ORDER BY ppr DESC, node_id LIMIT 20""".stripMargin)),

    // ---- Retention cohort analysis (the product-analytics staple next
    //      to q27 sessionize / q104 funnel): users cohorted by first-
    //      event DAY, per (cohort, day-offset) distinct-active counts and
    //      the retention fraction. Integer-exact except the final ratio
    //      (long/long -> double, rounded — deterministic). Scale shape:
    //      one user-grain first-event aggregate, one user-keyed join
    //      (both map-combined / shuffle-on-user), one (cohort, offset)
    //      count-distinct — no windows, no driver state; cohort table is
    //      date-grain (bounded) so the final join broadcasts. ----
    Q("q117_retention_cohorts",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
          .select($"user_id", to_date($"ts").as("d"))
        val first = ev.groupBy($"user_id").agg(min($"d").as("cohort_day"))
        val act = ev.join(first, "user_id")
          .select($"user_id", $"cohort_day",
            datediff($"d", $"cohort_day").as("day_offset"))
          .distinct()
        val sizes = first.groupBy($"cohort_day")
          .agg(count(lit(1)).as("cohort_size"))
        act.groupBy($"cohort_day", $"day_offset")
          .agg(countDistinct($"user_id").as("active_users"))
          .join(broadcast(sizes), "cohort_day")
          .select($"cohort_day", $"day_offset", $"active_users",
            $"cohort_size",
            round($"active_users" / $"cohort_size", 4).as("retention"))
          .orderBy($"cohort_day", $"day_offset")
      },
      Some("""WITH f AS (
             |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
             |  FROM events GROUP BY user_id),
             |a AS (
             |  SELECT DISTINCT e.user_id, f.cohort_day,
             |    CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT) AS day_offset
             |  FROM events e JOIN f USING (user_id)),
             |s AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
             |      FROM f GROUP BY cohort_day)
             |SELECT a.cohort_day, a.day_offset,
             |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users,
             |  s.cohort_size,
             |  round(CAST(count(DISTINCT a.user_id) AS DOUBLE) / s.cohort_size, 4) AS retention
             |FROM a JOIN s USING (cohort_day)
             |GROUP BY a.cohort_day, a.day_offset, s.cohort_size
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // ---- k-core decomposition (q118): 2-core of the high-quantity
    //      trade graph with a synthetic 5-edge pendant chain grafted on
    //      (the chain peels ONE link per round — a real cascade, ~6
    //      bulk-peel rounds at both SFs, where the raw trade graph
    //      would converge in one). maxRounds = oracle unroll = 8; the
    //      operator's early exit only skips no-op rounds, so the
    //      fixed-8-round SQL replay is exact. Oracle CTEs are
    //      MATERIALIZED — each peel references its predecessor three
    //      times, and an inlined chain re-evaluates 3^8 times ----
    Q("q118_kcore",
      (s, dir) => {
        import s.implicits._
        val trade = Tables(s, dir, "lineitem")
          .filter($"l_quantity" >= 48)
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("a"),
            ($"l_suppkey" + 1000000L).cast("long").as("b"))
        val chain = s.range(4)
          .select(($"id" + 9000000L).as("a"), ($"id" + 9000001L).as("b"))
          .unionByName(Seq((1L, 9000000L)).toDF("a", "b"))
        graft.operators.GraphOps.kCore(
            trade.unionByName(chain), "a", "b", k = 2, maxRounds = 8)
          .orderBy($"id")
      },
      Some("""WITH raw AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 48
             |  UNION
             |  SELECT 9000000 + i AS a, 9000001 + i AS b FROM (SELECT unnest(range(0, 4)) AS i)
             |  UNION
             |  SELECT 1 AS a, 9000000 AS b),
             |e0 AS MATERIALIZED (
             |  SELECT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b),
             |d1 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e0 UNION ALL SELECT v AS id FROM e0) GROUP BY id),
             |k1 AS (SELECT id FROM d1 WHERE dg >= 2),
             |e1 AS MATERIALIZED (SELECT u, v FROM e0
             |  WHERE u IN (SELECT id FROM k1) AND v IN (SELECT id FROM k1)),d2 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e1 UNION ALL SELECT v AS id FROM e1) GROUP BY id),
             |k2 AS (SELECT id FROM d2 WHERE dg >= 2),
             |e2 AS MATERIALIZED (SELECT u, v FROM e1
             |  WHERE u IN (SELECT id FROM k2) AND v IN (SELECT id FROM k2)),d3 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e2 UNION ALL SELECT v AS id FROM e2) GROUP BY id),
             |k3 AS (SELECT id FROM d3 WHERE dg >= 2),
             |e3 AS MATERIALIZED (SELECT u, v FROM e2
             |  WHERE u IN (SELECT id FROM k3) AND v IN (SELECT id FROM k3)),d4 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e3 UNION ALL SELECT v AS id FROM e3) GROUP BY id),
             |k4 AS (SELECT id FROM d4 WHERE dg >= 2),
             |e4 AS MATERIALIZED (SELECT u, v FROM e3
             |  WHERE u IN (SELECT id FROM k4) AND v IN (SELECT id FROM k4)),d5 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e4 UNION ALL SELECT v AS id FROM e4) GROUP BY id),
             |k5 AS (SELECT id FROM d5 WHERE dg >= 2),
             |e5 AS MATERIALIZED (SELECT u, v FROM e4
             |  WHERE u IN (SELECT id FROM k5) AND v IN (SELECT id FROM k5)),d6 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e5 UNION ALL SELECT v AS id FROM e5) GROUP BY id),
             |k6 AS (SELECT id FROM d6 WHERE dg >= 2),
             |e6 AS MATERIALIZED (SELECT u, v FROM e5
             |  WHERE u IN (SELECT id FROM k6) AND v IN (SELECT id FROM k6)),d7 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e6 UNION ALL SELECT v AS id FROM e6) GROUP BY id),
             |k7 AS (SELECT id FROM d7 WHERE dg >= 2),
             |e7 AS MATERIALIZED (SELECT u, v FROM e6
             |  WHERE u IN (SELECT id FROM k7) AND v IN (SELECT id FROM k7)),d8 AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
             |    SELECT u AS id FROM e7 UNION ALL SELECT v AS id FROM e7) GROUP BY id),
             |k8 AS (SELECT id FROM d8 WHERE dg >= 2),
             |e8 AS MATERIALIZED (SELECT u, v FROM e7
             |  WHERE u IN (SELECT id FROM k8) AND v IN (SELECT id FROM k8))
             |SELECT id, CAST(count(*) AS BIGINT) AS core_deg FROM (
             |  SELECT u AS id FROM e8 UNION ALL SELECT v AS id FROM e8) GROUP BY id
             |ORDER BY id""".stripMargin)),

    // ---- Deletion vectors / merge-on-read (q119): delete-by-predicate
    //      records (file, row_index) pairs in an underscore-prefixed
    //      sidecar, data files stay immutable; the live view anti-joins
    //      the (broadcast, metadata-sized) vector. Two OVERLAPPING
    //      delete batches accumulate (the second records only new hits),
    //      then the gate aggregates the live view. The oracle never sees
    //      files or positions — it filters the raw table by the combined
    //      predicate, which is exactly the merge-on-read invariant
    //      (live view ≡ predicate-filtered table). The layout rebuilds
    //      fresh each run (overwrite clears prior vectors), so the gate
    //      is deterministic across reruns. ----
    Q("q119_deletion_vectors",
      (s, dir) => {
        import s.implicits._
        val path = graft.Scratch.dir("graft_dv_orders")
        Tables(s, dir, "orders").repartition(4)
          .write.mode("overwrite").parquet(path)
        graft.operators.Layout.deleteWhere(s, path,
          col("o_orderstatus") === "F" && col("o_totalprice") > 150000)
        graft.operators.Layout.deleteWhere(s, path,
          col("o_orderpriority") === "1-URGENT")
        graft.operators.Layout.readWithDeletes(s, path)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"),
            round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders
             |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000)
             |  AND NOT o_orderpriority = '1-URGENT'
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- Event-type transition matrix (q120): the Markov-chain view of
    //      user behavior (what follows what), completing the sequence
    //      family next to q27 sessionize / q104 funnel / q117 retention.
    //      Per-user event streams ordered (ts, event_id) — the id
    //      tie-break makes the lag deterministic — pair via lead(), then
    //      one (from,to)-grain count and a row-probability normalized by
    //      the from-state total. Integer-exact except the final ratio.
    //      Scale shape: ONE user-grain shuffle+sort for the sequence
    //      window (the q27 shape, inevitable for order semantics), then
    //      everything is type²-grain (bounded matrix). ----
    Q("q120_event_transitions",
      (s, dir) => {
        import s.implicits._
        graft.operators.Sequences.transitionMatrix(
            Tables(s, dir, "events")
              .select($"user_id", $"event_type", $"ts", $"event_id"),
            "user_id", "event_type", Seq("ts", "event_id"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH pr AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |m AS (
             |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             |  FROM pr WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
             |SELECT from_type, to_type, n,
             |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
             |FROM m ORDER BY from_type, to_type""".stripMargin)),

    // ---- Daily-volume anomaly detection (q121): per-day event counts
    //      z-scored against the corpus's own volume distribution — the
    //      feed-health check that catches a silent upstream halving or a
    //      replay doubling before any content check fires. z-scores are
    //      engine-exact: mean/sigma derive from INTEGER moments
    //      (k, sum n, sum n^2), so every float op sees identical
    //      operands in both engines ----
    Q("q121_volume_anomalies",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.volumeAnomalies(
            Tables(s, dir, "events"), "ts")
          .orderBy($"d")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |st AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS s,
             |    CAST(sum(n * n) AS BIGINT) AS s2
             |  FROM daily)
             |SELECT d, n,
             |  CASE WHEN CAST(s2 AS DOUBLE)/k - (CAST(s AS DOUBLE)/k)*(CAST(s AS DOUBLE)/k) > 0
             |    THEN round((n - CAST(s AS DOUBLE)/k)
             |      / sqrt(CAST(s2 AS DOUBLE)/k - (CAST(s AS DOUBLE)/k)*(CAST(s AS DOUBLE)/k)), 4)
             |  END AS z,
             |  coalesce(abs(CASE WHEN CAST(s2 AS DOUBLE)/k - (CAST(s AS DOUBLE)/k)*(CAST(s AS DOUBLE)/k) > 0
             |    THEN round((n - CAST(s AS DOUBLE)/k)
             |      / sqrt(CAST(s2 AS DOUBLE)/k - (CAST(s AS DOUBLE)/k)*(CAST(s AS DOUBLE)/k)), 4)
             |  END) > 2.0, false) AS is_anomaly
             |FROM daily, st ORDER BY d""".stripMargin)),

    // ---- Coreness decomposition capped at kMax=4 (q122): per-node core
    //      numbers by incremental bulk peeling (2-core, then 3-core FROM
    //      the 2-core, ...), the all-k-at-once form of q118's single-k
    //      membership. The graph = q118's trade graph plus three planted
    //      structures with KNOWN coreness — a 5-path (coreness 1), a
    //      5-cycle (coreness 2), a K4 (coreness 3) — so the gate pins
    //      every label tier including the kMax cap on the natural dense
    //      part. The engine peels each k to its FIXED POINT (capped peel
    //      throws, never mislabels); the oracle replays 10 unrolled
    //      rounds per k — any count ≥ the converged rounds reproduces
    //      the fixed point exactly, extra rounds are no-ops. ----
    Q("q122_coreness",
      (s, dir) => {
        import s.implicits._
        val trade = Tables(s, dir, "lineitem")
          .filter($"l_quantity" >= 48)
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("a"),
            ($"l_suppkey" + 1000000L).cast("long").as("b"))
        val path5 = s.range(4)
          .select(($"id" + 9000000L).as("a"), ($"id" + 9000001L).as("b"))
        val cyc5 = s.range(5)
          .select(($"id" + 9100000L).as("a"),
            (($"id" + 1) % 5 + 9100000L).as("b"))
        val k4 = (for { i <- 0 until 4; j <- (i + 1) until 4 }
          yield (9200000L + i, 9200000L + j)).toDF("a", "b")
        GraphOps.coreness(
            trade.unionByName(path5).unionByName(cyc5).unionByName(k4),
            "a", "b", kMax = 4)
          .orderBy($"id")
      },
      Some(s"""WITH raw AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 48
             |  UNION
             |  SELECT 9000000 + i AS a, 9000001 + i AS b
             |  FROM (SELECT unnest(range(0, 4)) AS i)
             |  UNION
             |  SELECT 9100000 + i AS a, 9100000 + (i + 1) % 5 AS b
             |  FROM (SELECT unnest(range(0, 5)) AS i)
             |  UNION
             |  SELECT 9200000 + t1.i AS a, 9200000 + t2.j AS b
             |  FROM (SELECT unnest(range(0, 4)) AS i) t1,
             |       (SELECT unnest(range(0, 4)) AS j) t2
             |  WHERE t1.i < t2.j),
             |e0 AS MATERIALIZED (
             |  SELECT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b),
             |${peelChainSql(2, "e0", "p2", 10)},
             |${peelChainSql(3, "p2e10", "p3", 10)},
             |${peelChainSql(4, "p3e10", "p4", 10)},
             |n1 AS (SELECT DISTINCT id FROM (
             |  SELECT u AS id FROM e0 UNION ALL SELECT v AS id FROM e0)),
             |n2 AS (SELECT DISTINCT id FROM (
             |  SELECT u AS id FROM p2e10 UNION ALL SELECT v AS id FROM p2e10)),
             |n3 AS (SELECT DISTINCT id FROM (
             |  SELECT u AS id FROM p3e10 UNION ALL SELECT v AS id FROM p3e10)),
             |n4 AS (SELECT DISTINCT id FROM (
             |  SELECT u AS id FROM p4e10 UNION ALL SELECT v AS id FROM p4e10))
             |SELECT id, CAST(1 AS BIGINT) AS coreness FROM n1
             |  WHERE id NOT IN (SELECT id FROM n2)
             |UNION ALL SELECT id, CAST(2 AS BIGINT) FROM n2
             |  WHERE id NOT IN (SELECT id FROM n3)
             |UNION ALL SELECT id, CAST(3 AS BIGINT) FROM n3
             |  WHERE id NOT IN (SELECT id FROM n4)
             |UNION ALL SELECT id, CAST(4 AS BIGINT) FROM n4
             |-- fixed-point self-check: the unrolled 10-round peel chains
             |-- are only a faithful replay if each reached its fixed point
             |-- (round 10 == round 9); a deeper-converging future scale
             |-- factor emits this poison row and the gate fails LOUDLY on
             |-- the oracle side instead of silently diverging
             |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
             |  WHERE (SELECT count(*) FROM p2e10) <> (SELECT count(*) FROM p2e9)
             |     OR (SELECT count(*) FROM p3e10) <> (SELECT count(*) FROM p3e9)
             |     OR (SELECT count(*) FROM p4e10) <> (SELECT count(*) FROM p4e9)
             |ORDER BY id""".stripMargin))
  )
}
