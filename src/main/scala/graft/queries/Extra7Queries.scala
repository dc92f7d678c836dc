package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-13 third wave: information-theoretic column association,
  * link prediction, autocorrelation, and partition-quality metrics.
  */
object Extra7Queries {

  def all: Seq[Q] = Seq(

    // ---- Mutual information + NMI (q140): does order status tell
    //      you anything about order priority? The effect-size
    //      companion to q139's chi-square from the information side.
    //      Only PRESENT cells score (absent cells contribute exactly
    //      0 — no grid), shares are quotients of exact longs, ln
    //      quantizes to micro-nats BEFORE the product, contributions
    //      to nano-nats before the order-free sum; entropies ride the
    //      same chain over the margins, NMI is one sqrt + divide of
    //      the quantized values. ----
    Q("q140_mutual_information",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.mutualInformation(
          Tables(s, dir, "orders"), $"o_orderstatus", $"o_orderpriority")
      },
      Some("""WITH cells AS (
             |  SELECT o_orderstatus AS x, o_orderpriority AS y,
             |    count(*) AS o
             |  FROM orders
             |  WHERE o_orderstatus IS NOT NULL
             |    AND o_orderpriority IS NOT NULL
             |  GROUP BY 1, 2),
             |xm AS (SELECT x, sum(o) AS xm FROM cells GROUP BY 1),
             |ym AS (SELECT y, sum(o) AS ym FROM cells GROUP BY 1),
             |t AS (SELECT sum(o) AS n FROM cells),
             |mi AS (
             |  SELECT sum(CAST(round(
             |      CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
             |      * (CAST(CAST(round(ln(
             |          (CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
             |          / (CAST(xm AS DOUBLE) * CAST(ym AS DOUBLE))) * 1e6)
             |          AS BIGINT) AS DOUBLE) / 1e6)
             |      * 1e9) AS BIGINT)) AS mi_nano
             |  FROM cells JOIN xm USING (x) JOIN ym USING (y), t),
             |hx AS (
             |  SELECT count(*) AS n_x,
             |    sum(CAST(round(
             |      -(CAST(xm AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(CAST(round(ln(
             |          CAST(xm AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
             |          AS BIGINT) AS DOUBLE) / 1e6)
             |      * 1e9) AS BIGINT)) AS hx_nano
             |  FROM xm, t),
             |hy AS (
             |  SELECT count(*) AS n_y,
             |    sum(CAST(round(
             |      -(CAST(ym AS DOUBLE) / CAST(n AS DOUBLE))
             |      * (CAST(CAST(round(ln(
             |          CAST(ym AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
             |          AS BIGINT) AS DOUBLE) / 1e6)
             |      * 1e9) AS BIGINT)) AS hy_nano
             |  FROM ym, t)
             |SELECT CAST(t.n AS BIGINT) AS n,
             |  CAST(hx.n_x AS BIGINT) AS n_x, CAST(hy.n_y AS BIGINT) AS n_y,
             |  CAST(mi.mi_nano AS BIGINT) AS mi_nano,
             |  round(CAST(mi.mi_nano AS DOUBLE) / 1e9, 6) AS mi,
             |  CAST(hx.hx_nano AS BIGINT) AS hx_nano,
             |  CAST(hy.hy_nano AS BIGINT) AS hy_nano,
             |  CASE WHEN hx.hx_nano > 0 AND hy.hy_nano > 0 THEN
             |    round((CAST(mi.mi_nano AS DOUBLE) / 1e9)
             |      / sqrt((CAST(hx.hx_nano AS DOUBLE) / 1e9)
             |           * (CAST(hy.hy_nano AS DOUBLE) / 1e9)), 6)
             |  END AS nmi
             |FROM t, mi, hx, hy""".stripMargin)),

    // ---- Adamic-Adar link prediction (q141): which customer/supplier
    //      pairs in the high-quantity trade graph are NOT yet adjacent
    //      but share neighbors? Top-20 by the exact integer micro-AA
    //      (1/ln(deg) quantizes round-6-ln-then-micro per center, so
    //      the ranking is an integer sort in both engines); cn rides
    //      the same pair-grain aggregate. maxDegree=1000 is above
    //      every degree at any test SF (the cap is exercised in the
    //      spec, not the gate). ----
    Q("q141_link_prediction",
      (s, dir) => {
        import s.implicits._
        val edges = Tables(s, dir, "lineitem")
          .filter($"l_quantity" >= 49)
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        graft.operators.GraphOps.linkPrediction(edges, "src", "dst")
          .orderBy($"aa_micro".desc, $"u", $"v").limit(20)
      },
      Some("""WITH raw AS (
             |  SELECT DISTINCT
             |    least(o_custkey, l_suppkey + 1000000) AS u,
             |    greatest(o_custkey, l_suppkey + 1000000) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 49 AND o_custkey <> l_suppkey + 1000000),
             |deg AS (
             |  SELECT id, count(*) AS deg FROM (
             |    SELECT u AS id FROM raw UNION ALL SELECT v FROM raw)
             |  GROUP BY 1),
             |ctr AS (
             |  SELECT id AS z, CAST(round(1e6
             |      / (CAST(CAST(round(ln(CAST(deg AS DOUBLE)) * 1e6)
             |          AS BIGINT) AS DOUBLE) / 1e6)) AS BIGINT) AS inv
             |  FROM deg WHERE deg BETWEEN 2 AND 1000),
             |adj AS (
             |  SELECT z, n, inv FROM (
             |    SELECT u AS z, v AS n FROM raw
             |    UNION ALL SELECT v AS z, u AS n FROM raw) a
             |  JOIN ctr USING (z)),
             |p AS (
             |  SELECT a1.n AS u, a2.n AS v, count(*) AS cn,
             |    sum(a1.inv) AS aa_micro
             |  FROM adj a1 JOIN adj a2 ON a1.z = a2.z AND a1.n < a2.n
             |  GROUP BY 1, 2),
             |np AS (
             |  SELECT p.* FROM p LEFT JOIN raw
             |    ON p.u = raw.u AND p.v = raw.v
             |  WHERE raw.u IS NULL)
             |SELECT u, v, CAST(cn AS BIGINT) AS cn,
             |  CAST(aa_micro AS BIGINT) AS aa_micro,
             |  round(CAST(aa_micro AS DOUBLE) / 1e6, 6) AS aa
             |FROM np ORDER BY aa_micro DESC, u, v LIMIT 20""".stripMargin)),

    // ---- Daily-volume autocorrelation (q142): ACF at lags 1..7 of
    //      the event feed — the seasonality/memory diagnostic next to
    //      q138's CUSUM. Both sides of r_k clear the rational mean by
    //      multiplying through by n², so num/den are EXACT LONGS and
    //      r_k is one round-6 IEEE division in either engine. ----
    Q("q142_acf",
      (s, dir) => {
        graft.operators.TimeSeries.acfDailyVolume(
          Tables(s, dir, "events"), "ts", maxLag = 7)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, count(*) AS x
             |  FROM events GROUP BY 1),
             |ranked AS (
             |  SELECT x, row_number() OVER (ORDER BY d) AS t FROM daily),
             |g AS (
             |  SELECT count(*) AS cnt, sum(x) AS s, sum(x * x) AS sxx
             |  FROM ranked),
             |lags AS (SELECT unnest(range(1, 8)) AS k),
             |p AS (
             |  SELECT k, count(*) AS n_pairs, sum(cur.x * prev.x) AS sxy,
             |    sum(cur.x) AS st, sum(prev.x) AS sh
             |  FROM lags, ranked cur
             |  JOIN ranked prev ON cur.t = prev.t + k
             |  GROUP BY k)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n_pairs AS BIGINT) AS n_pairs,
             |  CAST(cnt * cnt * sxy - cnt * s * (st + sh)
             |    + (cnt - k) * s * s AS BIGINT) AS num_n2,
             |  CAST(cnt * cnt * sxx - cnt * s * s AS BIGINT) AS den_n2,
             |  CASE WHEN cnt * cnt * sxx - cnt * s * s <> 0 THEN
             |    round(CAST(cnt * cnt * sxy - cnt * s * (st + sh)
             |        + (cnt - k) * s * s AS DOUBLE)
             |      / CAST(cnt * cnt * sxx - cnt * s * s AS DOUBLE), 6)
             |  END AS r
             |FROM p, g ORDER BY k""".stripMargin)),

    // ---- Newman modularity of a partition (q143): the quality meter
    //      for community labels, scored on the high-quantity trade
    //      graph under (a) a hash partition into 5 buckets and (b) the
    //      all-in-one partition — which must score EXACTLY 0 (the
    //      degree identity Σd_c = 2m makes 4m·e − (2m)² vanish), a
    //      self-checking row. Q·4m² is an exact long; q is one round-6
    //      division. ----
    Q("q143_modularity",
      (s, dir) => {
        import s.implicits._
        val edges = Tables(s, dir, "lineitem")
          .filter($"l_quantity" >= 49)
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        val nodes = edges.select($"src".as("id"))
          .union(edges.select($"dst".as("id"))).distinct()
        def score(tag: String, labs: org.apache.spark.sql.DataFrame) =
          graft.operators.GraphOps.modularity(
              edges, "src", "dst", labs, "id", "lab")
            .select(lit(tag).as("part"), col("m"), col("n_dropped"),
              col("n_communities"), col("q_num"), col("q_den"), col("q"))
        score("hash5", nodes.select($"id", pmod($"id", lit(5L)).as("lab")))
          .unionByName(
            score("all_one", nodes.select($"id", lit(0L).as("lab"))))
          .orderBy($"part")
      },
      Some("""WITH raw AS (
             |  SELECT DISTINCT
             |    least(o_custkey, l_suppkey + 1000000) AS u,
             |    greatest(o_custkey, l_suppkey + 1000000) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 49 AND o_custkey <> l_suppkey + 1000000),
             |lbl AS (
             |  SELECT u AS lu, v AS lv, u % 5 AS cu, v % 5 AS cv FROM raw),
             |m AS (SELECT count(*) AS m FROM raw),
             |h_intra AS (
             |  SELECT cu AS c, count(*) AS e_c FROM lbl
             |  WHERE cu = cv GROUP BY 1),
             |h_deg AS (
             |  SELECT c, count(*) AS d_c FROM (
             |    SELECT cu AS c FROM lbl UNION ALL SELECT cv FROM lbl)
             |  GROUP BY 1),
             |h AS (
             |  SELECT count(*) AS n_communities,
             |    sum(4 * m.m * coalesce(e_c, 0) - d_c * d_c) AS q_num
             |  FROM h_deg LEFT JOIN h_intra USING (c), m),
             |rows_out AS (
             |  SELECT 'all_one' AS part, m.m, 0 AS n_dropped,
             |    1 AS n_communities, 0 AS q_num, 4 * m.m * m.m AS q_den,
             |    CASE WHEN m.m > 0 THEN 0.0 END AS q
             |  FROM m
             |  UNION ALL
             |  SELECT 'hash5', m.m, 0, h.n_communities, h.q_num,
             |    4 * m.m * m.m,
             |    CASE WHEN m.m > 0 THEN round(CAST(h.q_num AS DOUBLE)
             |      / CAST(4 * m.m * m.m AS DOUBLE), 6) END
             |  FROM m, h)
             |SELECT part, CAST(m AS BIGINT) AS m,
             |  CAST(n_dropped AS BIGINT) AS n_dropped,
             |  CAST(n_communities AS BIGINT) AS n_communities,
             |  CAST(q_num AS BIGINT) AS q_num, CAST(q_den AS BIGINT) AS q_den,
             |  q
             |FROM rows_out ORDER BY part""".stripMargin)),

    // ---- Spearman rank correlation (q144): do daily event volume and
    //      daily user breadth move together? Doubled midranks (the
    //      q132 machinery) make all five moments exact longs; the two
    //      denominator sqrts are taken SEPARATELY (their long product
    //      would overflow) — each IEEE correctly-rounded on identical
    //      operands, so round-6 rho is engine-exact. Day grain keeps
    //      n bounded at any corpus size. ----
    Q("q144_spearman",
      (s, dir) => {
        import s.implicits._
        val daily = Tables(s, dir, "events")
          .groupBy(to_date($"ts").as("d"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct($"user_id").as("n_users"))
        graft.operators.Learn.spearman(daily, $"n_events", $"n_users")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, count(*) AS x,
             |    count(DISTINCT user_id) AS y
             |  FROM events GROUP BY 1),
             |rx AS (
             |  SELECT x, 2 * (sum(cnt) OVER (ORDER BY x
             |      ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS dr_x
             |  FROM (SELECT x, count(*) AS cnt FROM daily GROUP BY 1)),
             |ry AS (
             |  SELECT y, 2 * (sum(cnt) OVER (ORDER BY y
             |      ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS dr_y
             |  FROM (SELECT y, count(*) AS cnt FROM daily GROUP BY 1)),
             |j AS (
             |  SELECT dr_x, dr_y FROM daily
             |  JOIN rx USING (x) JOIN ry USING (y)),
             |m AS (
             |  SELECT count(*) AS n, sum(dr_x) AS sx, sum(dr_y) AS sy,
             |    sum(dr_x * dr_y) AS sxy, sum(dr_x * dr_x) AS sxx,
             |    sum(dr_y * dr_y) AS syy
             |  FROM j)
             |SELECT CAST(n AS BIGINT) AS n,
             |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
             |  CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
             |  CAST(n * syy - sy * sy AS BIGINT) AS den_y,
             |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
             |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             |        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             |  END AS rho
             |FROM m""".stripMargin)),

    // ---- Benford first-digit test (q145): do order totals follow the
    //      log distribution organic magnitudes follow? Digits extract
    //      from integer cents' decimal string (no log10-at-boundary
    //      hazard), Benford shares quantize to micro-units, (O−E)²/E
    //      to nano-units before the order-free sum; all nine digits
    //      always score. ----
    Q("q145_benford",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.benfordTest(
          Tables(s, dir, "orders"), $"o_totalprice")
      },
      Some("""WITH cents AS (
             |  SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 100)
             |    AS BIGINT) AS cents
             |  FROM orders),
             |digits AS (
             |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
             |    AS d, count(*) AS o
             |  FROM cents WHERE cents >= 1 GROUP BY 1),
             |grid AS (
             |  SELECT g.d, coalesce(digits.o, 0) AS o
             |  FROM (SELECT unnest(range(1, 10)) AS d) g
             |  LEFT JOIN digits USING (d)),
             |t AS (SELECT sum(o) AS n FROM grid),
             |scored AS (
             |  SELECT d, o,
             |    CAST(round(log10(CAST(d + 1 AS DOUBLE)
             |      / CAST(d AS DOUBLE)) * 1e6) AS BIGINT) AS p_micro,
             |    CASE WHEN n > 0 THEN CAST(round(
             |      (CAST(o AS DOUBLE) - CAST(n AS DOUBLE)
             |        * (CAST(CAST(round(log10(CAST(d + 1 AS DOUBLE)
             |            / CAST(d AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)
             |          / 1e6))
             |      * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE)
             |        * (CAST(CAST(round(log10(CAST(d + 1 AS DOUBLE)
             |            / CAST(d AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)
             |          / 1e6))
             |      / (CAST(n AS DOUBLE)
             |        * (CAST(CAST(round(log10(CAST(d + 1 AS DOUBLE)
             |            / CAST(d AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)
             |          / 1e6))
             |      * 1e9) AS BIGINT) END AS contrib_nano,
             |    n
             |  FROM grid, t)
             |SELECT d, CAST(o AS BIGINT) AS o, p_micro, contrib_nano,
             |  CASE WHEN n > 0 THEN
             |    CAST(sum(contrib_nano) OVER () AS BIGINT) END AS chi2_nano,
             |  CASE WHEN n > 0 THEN
             |    CAST(sum(contrib_nano) OVER () AS DOUBLE) / 1e9 > 15.507
             |  END AS significant
             |FROM scored ORDER BY d""".stripMargin)),

    // ---- Double-sweep diameter lower bound (q146): BFS from the
    //      smallest node, BFS again from the farthest node reached —
    //      a certified lower bound on the undirected diameter at the
    //      cost of two BFS runs (exact diameter needs |V|). Integer
    //      hop math; convergence flags say whether the hop budget
    //      could have truncated the bound. ----
    Q("q146_diameter",
      (s, dir) => {
        import s.implicits._
        val edges = Tables(s, dir, "lineitem")
          .filter($"l_quantity" >= 49)
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        graft.operators.GraphOps.diameterLowerBound(
          edges, "src", "dst", maxHops = 16)
      },
      Some("""WITH RECURSIVE raw AS (
             |  SELECT DISTINCT
             |    least(o_custkey, l_suppkey + 1000000) AS u,
             |    greatest(o_custkey, l_suppkey + 1000000) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 49 AND o_custkey <> l_suppkey + 1000000),
             |e AS (SELECT u AS src, v AS dst FROM raw
             |  UNION SELECT v, u FROM raw),
             |s0 AS (SELECT min(u) AS start FROM raw),
             |w1(id, d) AS (
             |  SELECT start, CAST(0 AS BIGINT) FROM s0
             |  UNION
             |  SELECT e.dst, w.d + 1 FROM w1 w JOIN e ON e.src = w.id
             |  WHERE w.d < 16),
             |d1 AS (SELECT id, min(d) AS dist FROM w1 GROUP BY id),
             |far AS (
             |  SELECT id AS far, dist AS ecc_start FROM d1
             |  ORDER BY dist DESC, id LIMIT 1),
             |w2(id, d) AS (
             |  SELECT far, CAST(0 AS BIGINT) FROM far
             |  UNION
             |  SELECT e.dst, w.d + 1 FROM w2 w JOIN e ON e.src = w.id
             |  WHERE w.d < 16),
             |d2 AS (SELECT max(md) AS ecc_far FROM (
             |  SELECT id, min(d) AS md FROM w2 GROUP BY id))
             |SELECT CAST(s0.start AS BIGINT) AS start,
             |  CAST(far.ecc_start AS BIGINT) AS ecc_start,
             |  far.ecc_start < 16 AS start_converged,
             |  CAST(far.far AS BIGINT) AS far,
             |  CAST(d2.ecc_far AS BIGINT) AS ecc_far,
             |  d2.ecc_far < 16 AS far_converged,
             |  CAST(d2.ecc_far AS BIGINT) AS diameter_lb
             |FROM s0, far, d2""".stripMargin)),

    // ---- iFUB diameter bracket (q157): closes q146's bound from
    //      above — hub-rooted BFS, then fringe levels sweep top-down
    //      (each level ONE multi-source landmark expansion); when
    //      lb meets 2(i-1) the EXACT diameter of the root's component
    //      is certified. The double-sweep seed rides the FIRST fringe
    //      level (far sits in the deepest fringe — no dedicated far
    //      BFS). The oracle replays the whole run: root choice, the
    //      root sweep, per-level fringe eccentricities (ecc_far read
    //      off the deepest level), and the monotone stop rule, all in
    //      integer hop math. The
    //      graph is q146's bipartite cust-supp shape, filtered to stay
    //      all-pairs-replayable in DuckDB. ----
    Q("q157_diameter_ifub",
      (s, dir) => {
        import s.implicits._
        val edges = Tables(s, dir, "lineitem")
          .filter($"l_quantity" >= 50)
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders")
              .filter($"o_custkey" < 500)
              .select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        graft.operators.GraphOps.diameterBounds(
          edges, "src", "dst", maxHops = 32)
      },
      Some("""WITH RECURSIVE raw AS (
             |  SELECT DISTINCT
             |    least(o_custkey, l_suppkey + 1000000) AS u,
             |    greatest(o_custkey, l_suppkey + 1000000) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 50 AND o_custkey < 500
             |    AND o_custkey <> l_suppkey + 1000000),
             |e AS (SELECT u AS src, v AS dst FROM raw
             |  UNION SELECT v, u FROM raw),
             |deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
             |r0 AS (SELECT src AS root FROM deg ORDER BY dg DESC, src LIMIT 1),
             |wr(id, d) AS (
             |  SELECT root, CAST(0 AS BIGINT) FROM r0
             |  UNION
             |  SELECT e.dst, w.d + 1 FROM wr w JOIN e ON e.src = w.id
             |  WHERE w.d < 32),
             |dr AS (SELECT id, min(d) AS dist FROM wr GROUP BY id),
             |farq AS (SELECT id AS far, dist AS er FROM dr
             |  ORDER BY dist DESC, id LIMIT 1),
             |wall(s, id, d) AS (
             |  SELECT id, id, CAST(0 AS BIGINT) FROM dr
             |  UNION
             |  SELECT w.s, e.dst, w.d + 1 FROM wall w JOIN e ON e.src = w.id
             |  WHERE w.d < 32),
             |ecc AS (SELECT s, max(md) AS ec FROM (
             |  SELECT s, id, min(d) AS md FROM wall GROUP BY s, id)
             |  GROUP BY s),
             |base AS (
             |  SELECT farq.er, farq.far, ecc.ec AS eccf,
             |    greatest(farq.er, ecc.ec) AS lb0
             |  FROM farq JOIN ecc ON ecc.s = farq.far),
             |lvl AS (
             |  SELECT dr.dist AS i, max(ecc.ec) AS b, count(*) AS f
             |  FROM dr JOIN ecc ON ecc.s = dr.id
             |  WHERE dr.dist >= 1 GROUP BY dr.dist),
             |sim AS (
             |  SELECT i, max(b) OVER (ORDER BY i DESC) AS btop,
             |    sum(f) OVER (ORDER BY i DESC) AS fcum
             |  FROM lvl),
             |fin AS (
             |  SELECT base.*,
             |    (SELECT max(sim.i) FROM sim
             |     WHERE greatest(base.lb0, sim.btop) >= 2 * (sim.i - 1)) AS st
             |  FROM base),
             |res AS (
             |  SELECT fin.er, fin.far, fin.eccf,
             |    greatest(fin.lb0,
             |      (SELECT btop FROM sim WHERE i = fin.st)) AS dia,
             |    1 + (SELECT fcum FROM sim WHERE i = fin.st) AS nsw,
             |    fin.er - fin.st + 1 AS nlv
             |  FROM fin)
             |SELECT CAST(r0.root AS BIGINT) AS root,
             |  CAST(res.er AS BIGINT) AS ecc_root,
             |  CAST(res.far AS BIGINT) AS far,
             |  CAST(res.eccf AS BIGINT) AS ecc_far,
             |  CAST(res.dia AS BIGINT) AS lb, CAST(res.dia AS BIGINT) AS ub,
             |  CAST(res.nsw AS BIGINT) AS n_sweeps,
             |  CAST(res.nlv AS BIGINT) AS n_levels,
             |  true AS converged, CAST(res.dia AS BIGINT) AS diameter
             |FROM r0, res""".stripMargin)),

    // ---- Distance distribution + effective diameter (q161): the
    //      neighborhood-function readout (ANF family) over q157's
    //      all-pairs-replayable graph — one row per hop distance with
    //      exact pair counts, cumulative micro-shares (integer `div`,
    //      engine-exact), and the eff_90 effective-diameter flag.
    //      sampleEvery=1 = the EXACT distribution (the oracle replays
    //      every source's BFS recursively); the sampled estimator is
    //      the documented scale path. driverFrontierBelow raised
    //      explicitly: the graph's pair-state (nodes²) is small even
    //      though |landmarks|·|edges| crosses the default bound. ----
    Q("q161_distance_distribution",
      (s, dir) => {
        import s.implicits._
        val edges = Tables(s, dir, "lineitem")
          .filter($"l_quantity" >= 50)
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders")
              .filter($"o_custkey" < 500)
              .select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        graft.operators.GraphOps.distanceDistribution(
          edges, "src", "dst", maxHops = 32,
          driverFrontierBelow = 8_000_000L)
      },
      Some("""WITH RECURSIVE raw AS (
             |  SELECT DISTINCT
             |    least(o_custkey, l_suppkey + 1000000) AS u,
             |    greatest(o_custkey, l_suppkey + 1000000) AS v
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 50 AND o_custkey < 500
             |    AND o_custkey <> l_suppkey + 1000000),
             |e AS (SELECT u AS src, v AS dst FROM raw
             |  UNION SELECT v, u FROM raw),
             |nodes AS (SELECT DISTINCT src AS id FROM e),
             |w(s, id, d) AS (
             |  SELECT id, id, CAST(0 AS BIGINT) FROM nodes
             |  UNION
             |  SELECT w.s, e.dst, w.d + 1 FROM w JOIN e ON e.src = w.id
             |  WHERE w.d < 32),
             |dmin AS (SELECT s, id, min(d) AS dist FROM w GROUP BY s, id),
             |dd AS (SELECT dist, count(*) AS n_pairs FROM dmin
             |  WHERE dist > 0 GROUP BY dist),
             |c0 AS (SELECT dist, CAST(n_pairs AS BIGINT) AS n_pairs,
             |  CAST(sum(n_pairs) OVER (ORDER BY dist) AS BIGINT) AS cum_pairs,
             |  CAST(sum(n_pairs) OVER () AS BIGINT) AS total_pairs
             |  FROM dd),
             |c AS (SELECT c0.*,
             |  lag(cum_pairs) OVER (ORDER BY dist) AS prev_cum
             |  FROM c0)
             |SELECT CAST(dist AS BIGINT) AS dist, n_pairs, cum_pairs,
             |  total_pairs,
             |  (cum_pairs * 1000000) // total_pairs AS cum_share_micro,
             |  (cum_pairs * 1000000) // total_pairs >= 900000
             |    AND coalesce((prev_cum * 1000000) // total_pairs < 900000,
             |      true) AS eff_90
             |FROM c ORDER BY dist""".stripMargin)),

    // ---- Welch's t-test (q158): the MEANS member of the significance
    //      toolkit (q136 tests rates, q137 distributions, q139
    //      association) — unequal-variance t with Welch–Satterthwaite
    //      df over integer cents, from exact (n, Σv, Σv²) moments
    //      (Σv² as DECIMAL(38,0)/HUGEINT); the float chain is fixed-
    //      order IEEE on identical operands, round-6 t / round-4 df
    //      in both engines. ----
    Q("q158_welch_ttest",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.welchTTest(
          Tables(s, dir, "orders"),
          $"o_orderkey" % 2,
          round($"o_totalprice" * 100).cast("long"))
      },
      Some("""WITH v AS (
             |  SELECT o_orderkey % 2 AS grp,
             |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100)
             |      AS BIGINT) AS v
             |  FROM orders),
             |c AS (
             |  SELECT grp, count(*) AS n, sum(v) AS s1,
             |    sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2
             |  FROM v GROUP BY grp),
             |p AS (
             |  SELECT a.grp AS grp_1, a.n AS n_1, a.s1 AS s11, a.s2 AS s21,
             |    b.grp AS grp_2, b.n AS n_2, b.s1 AS s12, b.s2 AS s22
             |  FROM c a JOIN c b ON a.grp < b.grp),
             |m AS (
             |  SELECT grp_1, n_1, grp_2, n_2,
             |    CAST(s21 * CAST(n_1 AS HUGEINT) - CAST(s11 AS HUGEINT)
             |        * CAST(s11 AS HUGEINT) AS DOUBLE)
             |      / CAST(n_1 AS DOUBLE) / (CAST(n_1 AS DOUBLE) - 1.0)
             |      / CAST(n_1 AS DOUBLE) AS qa,
             |    CAST(s22 * CAST(n_2 AS HUGEINT) - CAST(s12 AS HUGEINT)
             |        * CAST(s12 AS HUGEINT) AS DOUBLE)
             |      / CAST(n_2 AS DOUBLE) / (CAST(n_2 AS DOUBLE) - 1.0)
             |      / CAST(n_2 AS DOUBLE) AS qb,
             |    CAST(s11 AS DOUBLE) / CAST(n_1 AS DOUBLE)
             |      - CAST(s12 AS DOUBLE) / CAST(n_2 AS DOUBLE) AS md
             |  FROM p)
             |SELECT CAST(grp_1 AS BIGINT) AS grp_1, n_1,
             |  CAST(grp_2 AS BIGINT) AS grp_2, n_2,
             |  round(md / sqrt(qa + qb), 6) AS t,
             |  round((qa + qb) * (qa + qb)
             |    / (qa * qa / (CAST(n_1 AS DOUBLE) - 1.0)
             |      + qb * qb / (CAST(n_2 AS DOUBLE) - 1.0)), 4) AS df_w,
             |  abs(round(md / sqrt(qa + qb), 6)) > 1.96 AS significant
             |FROM m""".stripMargin)),

    // ---- Retention half-life (q160): q117's cohort curves reduced to
    //      the ONE number a growth review asks for — fit ln(retention)
    //      against day-offset (exponential-decay model) and report the
    //      half-life in days. RIGHT-CENSORING-AWARE pooling: offset o
    //      only pools cohorts whose observation window covers o
    //      (cohort_day + o <= max_day) — naive pooling would let late
    //      cohorts' missing tails read as churn. Quantized round-6
    //      micro-ln retention + integer moments (the zipfFit/t55
    //      discipline); ln 2 as a shared literal so half-life is one
    //      IEEE divide of identical operands. ----
    Q("q160_retention_halflife",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
          .select($"user_id", to_date($"ts").as("d"))
        val first = ev.groupBy($"user_id").agg(min($"d").as("cohort_day"))
        val act = ev.join(first, "user_id")
          .select($"user_id", $"cohort_day",
            datediff($"d", $"cohort_day").cast("long").as("o"))
          .distinct()
        val maxDay = ev.agg(max($"d").as("max_day"))
        val sizes = first.groupBy($"cohort_day")
          .agg(count(lit(1)).as("sz"))
        val perOff = act.filter($"o" >= 1).groupBy($"cohort_day", $"o")
          .agg(countDistinct($"user_id").as("a"))
        // eligible (cohort, offset) grid — date-grain bounded metadata
        val grid = sizes.crossJoin(broadcast(maxDay))
          .withColumn("span", datediff($"max_day", $"cohort_day").cast("long"))
          .filter($"span" >= 1)
          .select($"cohort_day", $"sz",
            explode(sequence(lit(1L), $"span")).as("o"))
        val pooled = grid.join(perOff, Seq("cohort_day", "o"), "left_outer")
          .groupBy($"o")
          .agg(sum(coalesce($"a", lit(0L))).as("num"), sum($"sz").as("den"))
          .filter($"num" > 0)
        val pts = pooled.select($"o",
          round(log($"num".cast("double") / $"den".cast("double")) * 1e6)
            .cast("long").as("yq"))
        val m = pts.agg(count(lit(1)).as("k"),
          sum($"o").as("sx"), sum($"yq").as("sy"),
          sum($"o" * $"yq").as("sxy"), sum($"o" * $"o").as("sxx"))
        val kd = $"k".cast("double")
        val slopeMicro = (kd * $"sxy".cast("double") -
          $"sx".cast("double") * $"sy".cast("double")) /
          (kd * $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double"))
        m.select($"k".as("n_points"),
          round(slopeMicro / 1e6, 6).as("slope"),
          when(slopeMicro < 0.0,
            round(lit(0.6931471805599453) / (slopeMicro / -1e6), 4))
            .as("half_life_days"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
             |f AS (SELECT user_id, min(d) AS cohort_day FROM ev
             |  GROUP BY user_id),
             |act AS (
             |  SELECT DISTINCT ev.user_id, f.cohort_day,
             |    CAST(date_diff('day', f.cohort_day, ev.d) AS BIGINT) AS o
             |  FROM ev JOIN f USING (user_id)),
             |mx AS (SELECT max(d) AS max_day FROM ev),
             |sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS sz
             |  FROM f GROUP BY cohort_day),
             |po AS (
             |  SELECT cohort_day, o, CAST(count(DISTINCT user_id) AS BIGINT) AS a
             |  FROM act WHERE o >= 1 GROUP BY cohort_day, o),
             |grid AS (
             |  SELECT sz.cohort_day, sz.sz,
             |    unnest(generate_series(CAST(1 AS BIGINT),
             |      CAST(date_diff('day', sz.cohort_day, mx.max_day) AS BIGINT)))
             |      AS o
             |  FROM sz, mx
             |  WHERE date_diff('day', sz.cohort_day, mx.max_day) >= 1),
             |pooled AS (
             |  SELECT grid.o, CAST(sum(coalesce(po.a, 0)) AS BIGINT) AS num,
             |    CAST(sum(grid.sz) AS BIGINT) AS den
             |  FROM grid LEFT JOIN po
             |    ON grid.cohort_day = po.cohort_day AND grid.o = po.o
             |  GROUP BY grid.o HAVING sum(coalesce(po.a, 0)) > 0),
             |pts AS (
             |  SELECT o, CAST(round(ln(CAST(num AS DOUBLE)
             |    / CAST(den AS DOUBLE)) * 1e6) AS BIGINT) AS yq
             |  FROM pooled),
             |m AS (
             |  SELECT count(*) AS k, sum(o) AS sx, sum(yq) AS sy,
             |    sum(o * yq) AS sxy, sum(o * o) AS sxx
             |  FROM pts)
             |SELECT k AS n_points,
             |  round(((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 1e6, 6)
             |    AS slope,
             |  CASE WHEN ((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) < 0.0 THEN
             |    round(0.6931471805599453
             |      / (((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |      / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / -1e6), 4)
             |  END AS half_life_days
             |FROM m""".stripMargin)),

    // ---- Mann–Kendall trend test (q147): is the daily event volume's
    //      trend (whose slope q135's Theil–Sen estimates) there at
    //      all? S and the tie-corrected Var·18 are exact longs over
    //      the bounded day-pair grain; the continuity-corrected z is
    //      one IEEE divide-and-sqrt chain, round-6 both engines. ----
    Q("q147_mann_kendall",
      (s, dir) => {
        graft.operators.TimeSeries.mannKendallDailyTrend(
          Tables(s, dir, "events"), "ts")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, count(*) AS n
             |  FROM events GROUP BY 1),
             |sv AS (
             |  SELECT coalesce(sum(CASE WHEN b.n > a.n THEN 1
             |      WHEN b.n < a.n THEN -1 ELSE 0 END), 0) AS s
             |  FROM daily a JOIN daily b ON a.d < b.d),
             |ties AS (
             |  SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie18
             |  FROM (SELECT count(*) AS t FROM daily GROUP BY n)),
             |c AS (SELECT count(*) AS n FROM daily),
             |v AS (
             |  SELECT c.n, sv.s,
             |    c.n * (c.n - 1) * (2 * c.n + 5) - ties.tie18 AS var18
             |  FROM c, sv, ties)
             |SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
             |  CAST(var18 AS BIGINT) AS var18,
             |  CASE WHEN n >= 2 AND var18 > 0 THEN
             |    round(CAST(CASE WHEN s > 0 THEN s - 1
             |        WHEN s < 0 THEN s + 1 ELSE 0 END AS DOUBLE)
             |      / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) END AS z,
             |  CASE WHEN n >= 2 AND var18 > 0 THEN
             |    abs(round(CAST(CASE WHEN s > 0 THEN s - 1
             |        WHEN s < 0 THEN s + 1 ELSE 0 END AS DOUBLE)
             |      / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6)) > 1.96
             |  END AS significant
             |FROM v""".stripMargin)),

    // ---- Gini token concentration (q148): do a few documents hold
    //      most of the corpus's token mass? Rank-weighted Gini over
    //      per-doc token counts, computed at the VALUE-HISTOGRAM grain
    //      (ties commute, so the rank sum needs no per-row sort);
    //      num/den exact longs, gini one round-6 division. ----
    Q("q148_gini",
      (s, dir) => {
        import s.implicits._
        val toks = Tables(s, dir, "documents")
          .select(size(filter(split($"text", " "), t => t =!= ""))
            .cast("long").as("n_tokens"))
        graft.operators.ColumnStats.gini(toks, col("n_tokens"))
      },
      Some("""WITH toks AS (
             |  SELECT CAST(len(list_filter(string_split(text, ' '),
             |    x -> x <> '')) AS BIGINT) AS v
             |  FROM documents),
             |hist AS (SELECT v, count(*) AS c FROM toks GROUP BY 1),
             |cum AS (
             |  SELECT v, c, coalesce(sum(c) OVER (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    AS cp
             |  FROM hist),
             |agg AS (
             |  SELECT sum(c) AS n, sum(v * c) AS total,
             |    sum(v * (c * cp + (c * (c + 1)) // 2)) AS rank_mass
             |  FROM cum)
             |SELECT CAST(n AS BIGINT) AS n, CAST(total AS BIGINT) AS total,
             |  CAST(2 * rank_mass - (n + 1) * total AS BIGINT) AS gini_num,
             |  CAST(n * total AS BIGINT) AS gini_den,
             |  CASE WHEN n > 0 AND total > 0 THEN
             |    round(CAST(2 * rank_mass - (n + 1) * total AS DOUBLE)
             |      / CAST(n * total AS DOUBLE), 6) END AS gini
             |FROM agg""".stripMargin)),

    // ---- first/last-touch attribution (q149): every purchase credits
    //      its nearest preceding touch (view/click/signup — error is
    //      deliberately NOT a channel) and the user's first touch;
    //      purchases with no preceding touch land in the explicit
    //      '(none)' channel. Credit values sum as exact cents. ----
    Q("q149_attribution",
      (s, dir) => {
        graft.operators.Sequences.touchAttribution(
          Tables(s, dir, "events"), "user_id", "ts", "event_id",
          "event_type", convType = "purchase",
          channels = Seq("view", "click", "signup"), valueCol = "value")
      },
      Some("""WITH c AS (
             |  SELECT event_type, value,
             |    last_value(CASE WHEN event_type IN ('view','click','signup')
             |        THEN event_type END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS last_ch,
             |    first_value(CASE WHEN event_type IN ('view','click','signup')
             |        THEN event_type END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS first_ch
             |  FROM events),
             |p AS (
             |  SELECT coalesce(last_ch, '(none)') AS lc,
             |    coalesce(first_ch, '(none)') AS fc,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM c WHERE event_type = 'purchase'),
             |lt AS (
             |  SELECT lc AS channel, count(*) AS last_touch_n,
             |    round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS value
             |  FROM p GROUP BY 1),
             |ft AS (
             |  SELECT fc AS channel, count(*) AS first_touch_n
             |  FROM p GROUP BY 1)
             |SELECT channel,
             |  CAST(coalesce(last_touch_n, 0) AS BIGINT) AS last_touch_n,
             |  CAST(coalesce(first_touch_n, 0) AS BIGINT) AS first_touch_n,
             |  coalesce(value, 0.0) AS value
             |FROM lt FULL OUTER JOIN ft USING (channel)
             |ORDER BY channel""".stripMargin)),

    // ---- functional-dependency audit (q150): do the claimed
    //      dependencies hold? Order determines customer (PK) and
    //      nation determines region hold; nation does NOT determine
    //      market segment and an order does NOT determine its supplier
    //      — exact violation counts per candidate. ----
    Q("q150_fd_check",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.fdCheck(Tables(s, dir, "orders"),
            Seq(("orders: o_orderkey -> o_custkey",
              "o_orderkey", "o_custkey")))
          .unionByName(graft.operators.Expectations.fdCheck(
            Tables(s, dir, "customer"),
            Seq(("customer: c_nationkey -> c_mktsegment",
              "c_nationkey", "c_mktsegment"))))
          .unionByName(graft.operators.Expectations.fdCheck(
            Tables(s, dir, "lineitem"),
            Seq(("lineitem: l_orderkey -> l_suppkey",
              "l_orderkey", "l_suppkey"))))
          .unionByName(graft.operators.Expectations.fdCheck(
            Tables(s, dir, "nation"),
            Seq(("nation: n_nationkey -> n_regionkey",
              "n_nationkey", "n_regionkey"))))
          .orderBy($"fd")
      },
      Some("""WITH a AS (
             |  SELECT 'orders: o_orderkey -> o_custkey' AS fd,
             |    count(*) AS n_lhs,
             |    sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_violating
             |  FROM (SELECT count(DISTINCT o_custkey) AS nd
             |        FROM orders GROUP BY o_orderkey)),
             |b AS (
             |  SELECT 'customer: c_nationkey -> c_mktsegment' AS fd,
             |    count(*) AS n_lhs,
             |    sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_violating
             |  FROM (SELECT count(DISTINCT c_mktsegment) AS nd
             |        FROM customer GROUP BY c_nationkey)),
             |c AS (
             |  SELECT 'lineitem: l_orderkey -> l_suppkey' AS fd,
             |    count(*) AS n_lhs,
             |    sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_violating
             |  FROM (SELECT count(DISTINCT l_suppkey) AS nd
             |        FROM lineitem GROUP BY l_orderkey)),
             |d AS (
             |  SELECT 'nation: n_nationkey -> n_regionkey' AS fd,
             |    count(*) AS n_lhs,
             |    sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_violating
             |  FROM (SELECT count(DISTINCT n_regionkey) AS nd
             |        FROM nation GROUP BY n_nationkey)),
             |u AS (SELECT * FROM a UNION ALL SELECT * FROM b
             |  UNION ALL SELECT * FROM c UNION ALL SELECT * FROM d)
             |SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs,
             |  CAST(n_violating AS BIGINT) AS n_violating,
             |  n_violating = 0 AS holds
             |FROM u ORDER BY fd""".stripMargin)),

    // ---- weighted PageRank (q151): link multiplicity matters — the
    //      symmetrized trade graph with deterministic integer weights
    //      (the q134 construction), 3 sweeps, out-STRENGTH replacing
    //      out-degree. Top-20 on the ROUNDED rank (the q103 float
    //      contract: ln/÷ are not ulp-identical cross-engine; at 7
    //      decimals both agree). ----
    Q("q151_weighted_pagerank",
      (s, dir) => {
        import s.implicits._
        val pairs = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("a"),
            ($"l_suppkey" + 1000000L).cast("long").as("b")).distinct()
        val edges = pairs.select(explode(array(
            struct($"a".as("src"), $"b".as("dst")),
            struct($"b".as("src"), $"a".as("dst")))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst"))
          .withColumn("w", (lit(1L) + pmod($"src" + $"dst", lit(3L)))
            .cast("double"))
        graft.operators.GraphOps.weightedPageRank(
            edges, "src", "dst", "w", iterations = 3)
          .select($"id".as("node_id"), round($"pr", 7).as("pr"))
          .orderBy($"pr".desc, $"node_id").limit(20)
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS a,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS b
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |), edges AS (
             |  SELECT src, dst, CAST(1 + (src + dst) % 3 AS DOUBLE) AS w
             |  FROM (SELECT a AS src, b AS dst FROM pairs
             |        UNION ALL SELECT b, a FROM pairs)
             |), nodes AS (
             |  SELECT DISTINCT src AS id FROM edges
             |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
             |st AS (
             |  SELECT src, sum(w) AS s FROM edges GROUP BY src
             |), pr0 AS (
             |  SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM nodes
             |), pr1 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.sm,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr * e.w / st.s) AS sm
             |    FROM edges e JOIN pr0 p ON e.src = p.id
             |      JOIN st ON e.src = st.src
             |    GROUP BY e.dst) s ON nd.id = s.id
             |), pr2 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.sm,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr * e.w / st.s) AS sm
             |    FROM edges e JOIN pr1 p ON e.src = p.id
             |      JOIN st ON e.src = st.src
             |    GROUP BY e.dst) s ON nd.id = s.id
             |), pr3 AS (
             |  SELECT nd.id, coalesce(
             |    0.15 / (SELECT n FROM nn) + 0.85 * s.sm,
             |    0.15 / (SELECT n FROM nn)) AS pr
             |  FROM nodes nd LEFT JOIN (
             |    SELECT e.dst AS id, sum(p.pr * e.w / st.s) AS sm
             |    FROM edges e JOIN pr2 p ON e.src = p.id
             |      JOIN st ON e.src = st.src
             |    GROUP BY e.dst) s ON nd.id = s.id)
             |SELECT id AS node_id, round(pr, 7) AS pr FROM pr3
             |ORDER BY pr DESC, node_id LIMIT 20""".stripMargin)),

    // ---- replica reconciliation (q153): month-partition checksums of
    //      two lineitem replicas — B perturbs one March row per order
    //      (mismatch) and drops November entirely (only_a); every other
    //      month must match. Checksums are order-free split-half sums
    //      of the portable 63-bit row hash, so any row order /
    //      partitioning / engine agrees; row grain never moves. ----
    Q("q153_replica_diff",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity",
            month($"l_shipdate").cast("long").as("m"))
        val a = li
        val b = li.filter($"m" =!= 11)
          .withColumn("l_quantity",
            when($"m" === 3, $"l_quantity" + 1).otherwise($"l_quantity"))
        // UNRESOLVED columns: the same key expression must re-resolve
        // against EACH replica (a frame-bound df("col") would drag
        // replica A's attribute ids into B's plan)
        val key = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        graft.operators.Layout.replicaDiff(a, b, col("m"), key)
          .orderBy($"part")
      },
      Some("""WITH a AS (
             |  SELECT month(l_shipdate) AS part,
             |    concat_ws('|', l_orderkey, l_linenumber, l_quantity) AS k
             |  FROM lineitem),
             |b AS (
             |  SELECT month(l_shipdate) AS part,
             |    concat_ws('|', l_orderkey, l_linenumber,
             |      CASE WHEN month(l_shipdate) = 3 THEN l_quantity + 1
             |           ELSE l_quantity END) AS k
             |  FROM lineitem WHERE month(l_shipdate) <> 11),
             |ca AS (
             |  SELECT part, count(*) AS n_a,
             |    sum(((((('0x' || substr(md5(k), 1, 8))::BIGINT
             |      & 2147483647) << 32)
             |      | ('0x' || substr(md5(k), 9, 8))::BIGINT))
             |      & 4294967295) AS lo_a,
             |    sum(((((('0x' || substr(md5(k), 1, 8))::BIGINT
             |      & 2147483647) << 32)
             |      | ('0x' || substr(md5(k), 9, 8))::BIGINT)) >> 32) AS hi_a
             |  FROM a GROUP BY part),
             |cb AS (
             |  SELECT part, count(*) AS n_b,
             |    sum(((((('0x' || substr(md5(k), 1, 8))::BIGINT
             |      & 2147483647) << 32)
             |      | ('0x' || substr(md5(k), 9, 8))::BIGINT))
             |      & 4294967295) AS lo_b,
             |    sum(((((('0x' || substr(md5(k), 1, 8))::BIGINT
             |      & 2147483647) << 32)
             |      | ('0x' || substr(md5(k), 9, 8))::BIGINT)) >> 32) AS hi_b
             |  FROM b GROUP BY part)
             |SELECT coalesce(ca.part, cb.part) AS part,
             |  CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
             |  CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
             |  CASE WHEN n_a IS NULL THEN 'only_b'
             |       WHEN n_b IS NULL THEN 'only_a'
             |       WHEN n_a = n_b AND lo_a = lo_b AND hi_a = hi_b
             |         THEN 'match'
             |       ELSE 'mismatch' END AS status
             |FROM ca FULL OUTER JOIN cb ON ca.part = cb.part
             |ORDER BY part""".stripMargin)),

    // ---- join-key skew diagnosis (q154): should the lineitem⋈part
    //      join salt? Top-10 heaviest part keys + the exact summary
    //      statistics (max/mean ratio in integer micro-units) — the
    //      measurement that decides between plain join, AQE split, and
    //      the q68 salted join. ----
    Q("q154_skew_report",
      (s, dir) => {
        import s.implicits._
        graft.operators.SkewOps.skewReport(
            Tables(s, dir, "lineitem"), $"l_partkey", k = 10)
          .orderBy($"n".desc, $"key")
      },
      Some("""WITH c AS (
             |  SELECT CAST(l_partkey AS VARCHAR) AS key, count(*) AS n
             |  FROM lineitem GROUP BY 1),
             |t AS (
             |  SELECT count(*) AS n_keys, sum(n) AS total, max(n) AS mx
             |  FROM c),
             |top AS (
             |  SELECT key, n,
             |    CAST(round(CAST(n AS DOUBLE) * 1e6
             |      / CAST(total AS DOUBLE)) AS BIGINT) AS share_micro,
             |    CAST(NULL AS BIGINT) AS skew_ratio_micro
             |  FROM c, t ORDER BY n DESC, key LIMIT 10),
             |summary AS (
             |  SELECT '(total)' AS key, CAST(total AS BIGINT) AS n,
             |    CAST(1000000 AS BIGINT) AS share_micro,
             |    CAST(round(CAST(mx AS DOUBLE) * 1e6
             |      * CAST(n_keys AS DOUBLE) / CAST(total AS DOUBLE))
             |      AS BIGINT) AS skew_ratio_micro
             |  FROM t)
             |SELECT * FROM (
             |  SELECT * FROM top UNION ALL SELECT * FROM summary)
             |ORDER BY n DESC, key""".stripMargin)),

    // ---- Kruskal-Wallis H (q156): is the daily event volume
    //      distributed the same across weekdays? The k-group rank
    //      ANOVA completing the significance family (z-test 2 rates,
    //      KS 2 CDFs, AUC 2 classes). Doubled midranks keep rank sums
    //      exact; per-group R2^2/n_g quantizes micro before the
    //      order-free sum; dof-6 5% critical value 12.592. Day grain
    //      keeps N bounded at any corpus size. ----
    Q("q156_kruskal_wallis",
      (s, dir) => {
        import s.implicits._
        val daily = Tables(s, dir, "events")
          .groupBy(to_date($"ts").as("d"))
          .agg(count(lit(1)).as("v"))
          .select(weekday($"d").cast("string").as("g"), $"v")
        graft.operators.Expectations.kruskalWallis(
          daily, $"g", $"v", critValue = 12.592)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, count(*) AS v
             |  FROM events GROUP BY 1),
             |gvr AS (
             |  SELECT CAST(isodow(d) - 1 AS VARCHAR) AS g, v FROM daily),
             |gv AS (SELECT g, v, count(*) AS c FROM gvr GROUP BY 1, 2),
             |byv AS (SELECT v, sum(c) AS t FROM gv GROUP BY 1),
             |rk AS (
             |  SELECT v, t,
             |    2 * coalesce(sum(t) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      + t + 1 AS dr
             |  FROM byv),
             |ties AS (SELECT sum(t * t * t - t) AS tie_sum FROM rk),
             |perg AS (
             |  SELECT g, sum(c) AS n_g, sum(c * dr) AS r2
             |  FROM gv JOIN rk USING (v) GROUP BY g),
             |agg AS (
             |  SELECT count(*) AS k, sum(n_g) AS n,
             |    sum(CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
             |      / CAST(n_g AS DOUBLE) * 1e6) AS BIGINT)) AS s_micro
             |  FROM perg),
             |f AS (
             |  SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             |    12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             |      * (CAST(s_micro AS DOUBLE) / 1e6 / 4.0)
             |      - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
             |    CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
             |      - CAST(n AS DOUBLE) AS n3n,
             |    CAST(tie_sum AS DOUBLE) AS ts
             |  FROM agg, ties)
             |SELECT n, k,
             |  CASE WHEN k >= 2 THEN round(h, 6) END AS h,
             |  CASE WHEN k >= 2 AND n3n - ts > 0 THEN
             |    round(h * n3n / (n3n - ts), 6) END AS h_tie,
             |  CASE WHEN k >= 2 AND n3n - ts > 0 THEN
             |    h * n3n / (n3n - ts) > 12.592 END AS significant
             |FROM f""".stripMargin))
  )
}
