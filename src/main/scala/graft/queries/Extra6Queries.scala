package graft.queries

import graft.{Q, Tables}
import graft.operators.{GraphOps, Mutations, Sequences, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-11 second wave: the generic three-clause MERGE, HITS
  * hubs/authorities, EWMA feed-health tracking, and opening-path mining.
  */
object Extra6Queries {

  def all: Seq[Q] = Seq(

    // ---- Generic MERGE INTO (q123): one batch carrying all three
    //      clauses against the customer table — accumulate-updates
    //      (WHEN MATCHED UPDATE SET bal = bal + delta; the segment
    //      column shows the default replace-from-batch), marker deletes
    //      (WHEN MATCHED AND cond DELETE), inserts (WHEN NOT MATCHED),
    //      and ghost deletes for keys that don't exist (standard MERGE
    //      no-op). The oracle restates the post-merge table directly
    //      with CASE/filter/union — merge mechanics never leak into it.
    //      Broadcast-3-join plan: the customer side never shuffles. ----
    Q("q123_merge_into",
      (s, dir) => {
        import s.implicits._
        val cust = Tables(s, dir, "customer")
        val updates = cust.filter($"c_custkey" % 10 === 1)
          .withColumn("c_acctbal", lit(1000.0))
          .withColumn("c_mktsegment", lit("UPGRADED"))
        val deletes = cust.filter($"c_custkey" % 10 === 4)
          .withColumn("c_name", lit("DELETE"))
        val inserts = cust.filter($"c_custkey" % 7 === 3)
          .withColumn("c_custkey", $"c_custkey" + 1000000L)
          .withColumn("c_name", lit("new"))
          .withColumn("c_acctbal", lit(50.0))
          .withColumn("c_mktsegment", lit("NEWSEG"))
        val ghostDeletes = cust.filter($"c_custkey" % 11 === 5)
          .withColumn("c_custkey", $"c_custkey" + 2000000L)
          .withColumn("c_name", lit("DELETE"))
        val batch = updates.unionByName(deletes)
          .unionByName(inserts).unionByName(ghostDeletes)
        Mutations.mergeInto(cust, batch, "c_custkey",
            deleteWhen = col("_b_c_name") === "DELETE",
            updateSet = Map("c_acctbal" ->
              round(col("c_acctbal") + col("_b_c_acctbal"), 2)))
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"), round(sum($"c_acctbal"), 2).as("total"))
          .orderBy($"c_mktsegment")
      },
      Some("""WITH merged AS (
             |  SELECT CASE WHEN c_custkey % 10 = 1 THEN 'UPGRADED'
             |           ELSE c_mktsegment END AS seg,
             |    CASE WHEN c_custkey % 10 = 1 THEN round(c_acctbal + 1000.0, 2)
             |         ELSE c_acctbal END AS bal
             |  FROM customer WHERE c_custkey % 10 <> 4
             |  UNION ALL
             |  SELECT 'NEWSEG' AS seg, 50.0 AS bal
             |  FROM customer WHERE c_custkey % 7 = 3)
             |SELECT seg AS c_mktsegment, count(*) AS n,
             |  round(sum(bal), 2) AS total
             |FROM merged GROUP BY seg ORDER BY seg""".stripMargin)),

    // ---- HITS hubs & authorities (q124): 2 mutual-reinforcement
    //      sweeps over the DIRECTED customer→supplier trade graph
    //      (GraphOps.hits on IterativeLoop; every sweep L1-normalized
    //      in integer NANO-units — raw sums and totals are exact
    //      longs, the quantization one IEEE multiply-divide of
    //      identical operands, so the trajectory is bit-identical in
    //      both engines at any sweep count). Customers are pure hubs
    //      (no in-edges → auth 0), suppliers pure authorities — the
    //      gate ranks authorities. The oracle replays the nano sweeps
    //      as CTEs; ordering is on the ROUNDED score so the cut is
    //      stable. ----
    Q("q124_hits",
      (s, dir) => {
        import s.implicits._
        val edges = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        GraphOps.hits(edges, "src", "dst", iterations = 2)
          .select($"id".as("node_id"),
            round($"auth", 7).as("auth"), round($"hub", 7).as("hub"))
          .orderBy($"auth".desc, $"node_id").limit(20)
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |nodes AS (
             |  SELECT DISTINCT id FROM (
             |    SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
             |h0 AS (
             |  SELECT src AS id, CAST(round(1e9 /
             |    (SELECT CAST(count(DISTINCT src) AS DOUBLE) FROM e))
             |    AS BIGINT) AS hub
             |  FROM (SELECT DISTINCT src FROM e)),
             |a1r AS (SELECT e.dst AS id, sum(h0.hub) AS r
             |  FROM e JOIN h0 ON e.src = h0.id GROUP BY e.dst),
             |a1 AS (SELECT id, CAST(round(CAST(r AS DOUBLE) * 1e9 /
             |    (SELECT CAST(sum(r) AS DOUBLE) FROM a1r)) AS BIGINT) AS auth
             |  FROM a1r),
             |h1r AS (SELECT e.src AS id, sum(a1.auth) AS r
             |  FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src),
             |h1 AS (SELECT id, CAST(round(CAST(r AS DOUBLE) * 1e9 /
             |    (SELECT CAST(sum(r) AS DOUBLE) FROM h1r)) AS BIGINT) AS hub
             |  FROM h1r),
             |a2r AS (SELECT e.dst AS id, sum(h1.hub) AS r
             |  FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst),
             |a2 AS (SELECT id, CAST(round(CAST(r AS DOUBLE) * 1e9 /
             |    (SELECT CAST(sum(r) AS DOUBLE) FROM a2r)) AS BIGINT) AS auth
             |  FROM a2r),
             |h2r AS (SELECT e.src AS id, sum(a2.auth) AS r
             |  FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src),
             |h2 AS (SELECT id, CAST(round(CAST(r AS DOUBLE) * 1e9 /
             |    (SELECT CAST(sum(r) AS DOUBLE) FROM h2r)) AS BIGINT) AS hub
             |  FROM h2r),
             |at AS (SELECT sum(auth) AS t FROM a2),
             |ht AS (SELECT sum(hub) AS t FROM h2)
             |SELECT n.id AS node_id,
             |  round(CAST(coalesce(a2.auth, 0) AS DOUBLE)
             |    / CAST(at.t AS DOUBLE), 7) AS auth,
             |  round(CAST(coalesce(h2.hub, 0) AS DOUBLE)
             |    / CAST(ht.t AS DOUBLE), 7) AS hub
             |FROM nodes n
             |LEFT JOIN a2 ON n.id = a2.id
             |LEFT JOIN h2 ON n.id = h2.id, at, ht
             |ORDER BY auth DESC, node_id LIMIT 20""".stripMargin)),

    // ---- EWMA daily-volume tracking (q125): trend-following feed
    //      health next to q121's global z-scores (a slow ramp moves the
    //      EWMA with it; a step break alerts). Decay fixed at 1/2 per
    //      day: 2^-lag weights, count·2^-lag products, and the
    //      ≤window-term sums are all EXACT binary floats, so both
    //      engines compute bit-identical ewma/ratio with zero float
    //      tolerance (the t32/s10 discipline — an arbitrary alpha would
    //      put a libm pow ulp in every weight). Day-grain band
    //      self-join: bounded metadata, never event-grain. ----
    Q("q125_ewma_volume",
      (s, dir) => {
        import s.implicits._
        TimeSeries.ewmaDailyVolume(Tables(s, dir, "events"), "ts",
            window = 14, alertRatio = 0.25)
          .orderBy($"d")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |j AS (
             |  SELECT a.d, a.n,
             |    sum(b.n * pow(0.5, date_diff('day', b.d, a.d)))
             |      / sum(pow(0.5, date_diff('day', b.d, a.d))) AS e
             |  FROM daily a JOIN daily b
             |    ON date_diff('day', b.d, a.d) BETWEEN 0 AND 13
             |  GROUP BY a.d, a.n)
             |SELECT d, n, round(e, 4) AS ewma, round(n / e, 4) AS ratio,
             |  abs(n / e - 1.0) > 0.25 AS is_alert
             |FROM j ORDER BY d""".stripMargin)),

    // ---- Opening-path mining (q126): each user's first 5 events (ts,
    //      event_id order — total, so the path is deterministic) as a
    //      path string, top-15 by user count — whole trajectories next
    //      to q120's memoryless transition pairs. One user-grain
    //      window + path-grain count. ----
    Q("q126_top_paths",
      (s, dir) => {
        import s.implicits._
        Sequences.topPaths(Tables(s, dir, "events"),
          "user_id", "event_type", Seq("ts", "event_id"),
          maxSteps = 5, k = 15)
      },
      Some("""WITH r AS (
             |  SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn
             |  FROM events),
             |p AS (
             |  SELECT user_id,
             |    string_agg(event_type, ' > ' ORDER BY rn) AS path
             |  FROM r WHERE rn <= 5 GROUP BY user_id)
             |SELECT path, CAST(count(*) AS BIGINT) AS n_keys
             |FROM p GROUP BY path
             |ORDER BY n_keys DESC, path LIMIT 15""".stripMargin)),

    // ---- Distributed logistic-regression training (q127): the
    //      fastText/CCNet-style binary classifier a pipeline trains to
    //      gate its own corpus, trained IN the engine — 2 full-batch GD
    //      epochs (each ONE map-combined gradient aggregate over the
    //      corpus, Learn.logisticTrain), predicting lang='en' from
    //      exact-double features (n_chars/1000, n_tokens/100). Weights
    //      quantize round-6 per epoch so the trajectory is engine-exact
    //      (epoch 1 is exp-free: w=0 makes sigma exactly 0.5; epoch 2's
    //      lone exp drifts ulps that the quantization grid erases);
    //      prediction is z > 0 — no libm, boundary-exact. The oracle
    //      unrolls both epochs and re-derives the confusion counts and
    //      final weights. ----
    Q("q127_logreg_train",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
          .select($"lang",
            when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
            ($"n_chars" / lit(1000.0)).as("x1"),
            (size(graft.operators.TextOps.tokens($"text")) / lit(100.0)).as("x2"))
        val w = graft.operators.Learn.logisticTrain(
          docs, $"y", Seq($"x1", $"x2"), epochs = 2, lr = 1.0)
        val (_, pred) = graft.operators.Learn.score(w, Seq($"x1", $"x2"))
        docs.groupBy($"lang", pred.as("pred"))
          .agg(count(lit(1)).as("n"))
          .select($"lang", $"pred", $"n",
            lit(w(0)).as("w0"), lit(w(1)).as("w1"), lit(w(2)).as("w2"))
          .orderBy($"lang", $"pred")
      },
      Some("""WITH f AS (
             |  SELECT lang, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             |    n_chars / 1000.0 AS x1,
             |    len(list_filter(string_split(text, ' '), t -> t <> '')) / 100.0 AS x2
             |  FROM documents),
             |g1 AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y - 0.5) AS g0,
             |  sum((y - 0.5) * x1) AS g1, sum((y - 0.5) * x2) AS g2 FROM f),
             |w1 AS (SELECT round(1.0 * g0 / n, 6) AS w0,
             |  round(1.0 * g1 / n, 6) AS w1, round(1.0 * g2 / n, 6) AS w2 FROM g1),
             |p2 AS (SELECT f.lang, f.y, f.x1, f.x2,
             |  1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2))) AS p FROM f, w1),
             |g2 AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y - p) AS g0,
             |  sum((y - p) * x1) AS g1, sum((y - p) * x2) AS g2 FROM p2),
             |wf AS (SELECT round(w1.w0 + 1.0 * g2.g0 / g2.n, 6) AS w0,
             |  round(w1.w1 + 1.0 * g2.g1 / g2.n, 6) AS w1,
             |  round(w1.w2 + 1.0 * g2.g2 / g2.n, 6) AS w2 FROM w1, g2)
             |SELECT f.lang, (w0 + w1 * x1 + w2 * x2) > 0 AS pred,
             |  CAST(count(*) AS BIGINT) AS n, w0, w1, w2
             |FROM f, wf GROUP BY f.lang, pred, w0, w1, w2
             |ORDER BY lang, pred""".stripMargin)),

    // ---- exact edit-distance join via PassJoin segment blocking
    //      (q128): the STRONG-blocking fuzzy join the sf1 scale probe
    //      demanded (q84's length-band-only blocking grows
    //      ~quadratically; see PERF_PROBE.md). The oracle is the
    //      brute-force all-pairs levenshtein — so the hash match
    //      verifies the blocking loses NOTHING, not just that the
    //      verify filter is right. ----
    Q("q128_edit_distance_join",
      (s, dir) => {
        import s.implicits._
        // corpus: each document's 24-char LEAD (the crawl-pipeline
        // title/lead-dedup shape) — mostly-distinct strings with sparse
        // near pairs, where blocking matters; supplier/customer/part
        // names are template pools whose pair structure is degenerate
        // (all-match or exact-duplicate groups)
        graft.operators.Dedup.editDistanceJoin(
            Tables(s, dir, "documents")
              .select($"doc_id", substring($"text", 1, 24).as("lead")),
            "doc_id", "lead", maxDist = 2)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH d AS (SELECT doc_id, substring(text, 1, 24) AS lead
             |  FROM documents)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(levenshtein(a.lead, b.lead) AS BIGINT) AS dist
             |FROM d a JOIN d b ON a.doc_id < b.doc_id
             |WHERE levenshtein(a.lead, b.lead) <= 2
             |ORDER BY id_a, id_b""".stripMargin)),

    // ---- Strongly connected components (q129): FW-BW coloring over a
    //      deterministic functional digraph on the customer key space
    //      (two arithmetic out-edges per residue node — functional
    //      graphs are cycle-rich, so multi-node SCCs exist at every SF).
    //      scc_id = max member id (the coloring root). The oracle
    //      computes ground truth from first principles: a recursive-CTE
    //      transitive closure, mutual-reachability pairs, and max() per
    //      node — no step of the iterative algorithm leaks into it. ----
    Q("q129_scc",
      (s, dir) => {
        import s.implicits._
        val nodes = Tables(s, dir, "customer")
          .select(($"c_custkey" % 120).cast("long").as("id")).distinct()
        val edges = nodes.select(explode(array(
            struct($"id".as("src"), (($"id" * 3 + 7) % 120).as("dst")),
            struct($"id".as("src"), (($"id" * $"id" + 1) % 120).as("dst"))))
            .as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst"))
        GraphOps.scc(edges, "src", "dst").orderBy($"id")
      },
      Some("""WITH RECURSIVE nodes AS (
             |  SELECT DISTINCT c_custkey % 120 AS id FROM customer),
             |e0 AS (
             |  SELECT id AS src, (id * 3 + 7) % 120 AS dst FROM nodes
             |  UNION
             |  SELECT id, (id * id + 1) % 120 FROM nodes),
             |e AS (SELECT src, dst FROM e0 WHERE src <> dst),
             |vs AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
             |reach AS (
             |  SELECT src, dst FROM e
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
             |mutual AS (
             |  SELECT r1.src AS a, r1.dst AS b
             |  FROM reach r1 JOIN reach r2 ON r1.src = r2.dst AND r1.dst = r2.src)
             |SELECT CAST(v.id AS BIGINT) AS id,
             |  CAST(greatest(v.id, coalesce(max(m.b), v.id)) AS BIGINT) AS scc_id
             |FROM vs v LEFT JOIN mutual m ON m.a = v.id
             |GROUP BY v.id ORDER BY id""".stripMargin)),

    // ---- PSI drift monitor (q130): population-stability index of the
    //      order-value distribution, early period vs late period, over
    //      fixed 50k-wide buckets. Shares are double quotients of exact
    //      longs, the log ratio quantizes round-6 BEFORE the product,
    //      each bucket's contribution quantizes to nano-units before
    //      the integer total — order-free cross-engine. One-sided
    //      buckets are flagged, not epsilon-invented. ----
    Q("q130_psi_drift",
      (s, dir) => {
        import s.implicits._
        val o = Tables(s, dir, "orders")
        val cut = lit("1998-01-01").cast("timestamp")
        graft.operators.Expectations.psiDrift(
          o.filter($"o_orderdate" < cut),
          o.filter($"o_orderdate" >= cut),
          floor($"o_totalprice" / 50000))
      },
      Some("""WITH cp AS (
             |  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
             |    count(*) AS n_p
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
             |  GROUP BY 1),
             |cq AS (
             |  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
             |    count(*) AS n_q
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
             |  GROUP BY 1),
             |j AS (
             |  SELECT coalesce(cp.bucket, cq.bucket) AS bucket,
             |    coalesce(n_p, 0) AS n_p, coalesce(n_q, 0) AS n_q
             |  FROM cp FULL OUTER JOIN cq ON cp.bucket = cq.bucket),
             |t AS (SELECT sum(n_p) AS tp, sum(n_q) AS tq FROM j),
             |r AS (
             |  SELECT bucket, CAST(n_p AS BIGINT) AS n_p,
             |    CAST(n_q AS BIGINT) AS n_q,
             |    (n_p = 0 OR n_q = 0) AS one_sided,
             |    CASE WHEN n_p > 0 AND n_q > 0 THEN
             |      CAST(round((CAST(n_p AS DOUBLE) / CAST(tp AS DOUBLE)
             |                  - CAST(n_q AS DOUBLE) / CAST(tq AS DOUBLE))
             |        * (CAST(CAST(round(ln((CAST(n_p AS DOUBLE) / CAST(tp AS DOUBLE))
             |              / (CAST(n_q AS DOUBLE) / CAST(tq AS DOUBLE))) * 1e6)
             |            AS BIGINT) AS DOUBLE) / 1e6)
             |        * 1e9) AS BIGINT)
             |    ELSE 0 END AS contrib_nano
             |  FROM j, t)
             |SELECT bucket, n_p, n_q, one_sided, contrib_nano,
             |  CAST(sum(contrib_nano) OVER () AS BIGINT) AS psi_nano
             |FROM r ORDER BY bucket""".stripMargin)),

    // ---- Ridge regression by exact normal equations (q131): price ~
    //      quantity + discount on lineitem, lambda 0.01, grid 1000.
    //      Moments are INTEGER sums of lattice products (order-free any
    //      engine), the solve is Cramer over doubles converted from
    //      those exact integers with a PINNED evaluation order, weights
    //      round-6 — then the fit is SERVED: one map pass buckets yhat
    //      (identical literal operands -> identical doubles -> identical
    //      floor in both engines). ----
    Q("q131_ridge_regression",
      (s, dir) => {
        import s.implicits._
        val li = Tables(s, dir, "lineitem").select(
          ($"l_extendedprice" / 10000.0).as("y"),
          $"l_quantity".cast("double").as("x1"),
          $"l_discount".cast("double").as("x2"))
        val w = graft.operators.Learn.ridgeTrain(
          li, $"y", Seq($"x1", $"x2"), lambda = 0.01)
        li.select((lit(w(0)) + lit(w(1)) * $"x1" + lit(w(2)) * $"x2")
            .as("yhat"))
          .groupBy(floor($"yhat" * 100).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .select($"bucket", $"n",
            lit(w(0)).as("w0"), lit(w(1)).as("w1"), lit(w(2)).as("w2"))
          .orderBy($"bucket")
      },
      Some("""WITH f AS (
             |  SELECT l_extendedprice / 10000.0 AS y,
             |    CAST(l_quantity AS DOUBLE) AS x1,
             |    CAST(l_discount AS DOUBLE) AS x2
             |  FROM lineitem),
             |q AS (
             |  SELECT CAST(1000 AS BIGINT) AS x0,
             |    CAST(round(x1 * 1000, 0) AS BIGINT) AS xq1,
             |    CAST(round(x2 * 1000, 0) AS BIGINT) AS xq2,
             |    CAST(round(y * 1000, 0) AS BIGINT) AS yq
             |  FROM f),
             |mo AS (
             |  SELECT CAST(sum(x0 * x0) AS BIGINT) AS s00,
             |    CAST(sum(x0 * xq1) AS BIGINT) AS s01,
             |    CAST(sum(x0 * xq2) AS BIGINT) AS s02,
             |    CAST(sum(xq1 * xq1) AS BIGINT) + 10000 AS s11,
             |    CAST(sum(xq1 * xq2) AS BIGINT) AS s12,
             |    CAST(sum(xq2 * xq2) AS BIGINT) + 10000 AS s22,
             |    CAST(sum(x0 * yq) AS BIGINT) AS t0,
             |    CAST(sum(xq1 * yq) AS BIGINT) AS t1,
             |    CAST(sum(xq2 * yq) AS BIGINT) AS t2
             |  FROM q),
             |dets AS (
             |  SELECT
             |    CAST(s00 AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
             |      - CAST(s01 AS DOUBLE) * (CAST(s01 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s02 AS DOUBLE))
             |      + CAST(s02 AS DOUBLE) * (CAST(s01 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s02 AS DOUBLE)) AS d,
             |    CAST(t0 AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
             |      - CAST(s01 AS DOUBLE) * (CAST(t1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(t2 AS DOUBLE))
             |      + CAST(s02 AS DOUBLE) * (CAST(t1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(t2 AS DOUBLE)) AS d0,
             |    CAST(s00 AS DOUBLE) * (CAST(t1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(t2 AS DOUBLE) * CAST(s12 AS DOUBLE))
             |      - CAST(t0 AS DOUBLE) * (CAST(s01 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s02 AS DOUBLE))
             |      + CAST(s02 AS DOUBLE) * (CAST(s01 AS DOUBLE) * CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(s02 AS DOUBLE)) AS d1,
             |    CAST(s00 AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(t2 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(t1 AS DOUBLE))
             |      - CAST(s01 AS DOUBLE) * (CAST(s01 AS DOUBLE) * CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(s02 AS DOUBLE))
             |      + CAST(t0 AS DOUBLE) * (CAST(s01 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s02 AS DOUBLE)) AS d2
             |  FROM mo),
             |w AS (
             |  SELECT round(d0 / d, 6) AS w0, round(d1 / d, 6) AS w1,
             |    round(d2 / d, 6) AS w2
             |  FROM dets)
             |SELECT CAST(floor((w0 + w1 * x1 + w2 * x2) * 100) AS BIGINT) AS bucket,
             |  CAST(count(*) AS BIGINT) AS n, w0, w1, w2
             |FROM f, w GROUP BY 1, w0, w1, w2 ORDER BY bucket""".stripMargin)),

    // ---- ROC-AUC by the rank-sum identity (q132): how well does raw
    //      document length separate English from non-English? Midrank
    //      tie handling (integer n_chars scores tie heavily), the
    //      doubled-rank sum keeps everything in exact longs, and the
    //      only float op is the final 1-row division, round-6 from
    //      identical integer operands. ----
    Q("q132_auc_roc",
      (s, dir) => {
        import s.implicits._
        graft.operators.Learn.aucRoc(Tables(s, dir, "documents"),
          ($"lang" === "en").cast("long"), $"n_chars")
      },
      Some("""WITH g AS (
             |  SELECT n_chars AS s, count(*) AS c,
             |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p
             |  FROM documents GROUP BY 1),
             |r AS (
             |  SELECT s, c, p,
             |    coalesce(sum(c) OVER (ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
             |  FROM g),
             |a AS (
             |  SELECT sum(p) AS np, sum(c) - sum(p) AS nn,
             |    sum(p * (2 * r + c + 1)) AS rank2
             |  FROM r)
             |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
             |  CASE WHEN np > 0 AND nn > 0 THEN
             |    round(CAST(rank2 - np * (np + 1) AS DOUBLE)
             |      / (2.0 * np * nn), 6)
             |  END AS auc
             |FROM a""".stripMargin)),

    // ---- Landmark BFS distance vectors (q133): per-landmark exact hop
    //      distances over the SYMMETRIZED customer↔supplier trade
    //      graph, 3 landmarks, 3 hops — the precomputed embedding that
    //      turns a pairwise distance query into min_l d(l,u)+d(l,v)
    //      (Potamias et al. CIKM 2009). One frontier expansion carries
    //      all landmarks at (landmark, id) grain. The oracle walks the
    //      same graph with a recursive CTE and takes min(d) — BFS from
    //      first principles, no frontier mechanics shared. ----
    Q("q133_landmark_distances",
      (s, dir) => {
        import s.implicits._
        val e0 = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        val edges = e0.unionByName(
          e0.select($"dst".as("src"), $"src".as("dst")))
        GraphOps.landmarkDistances(edges, "src", "dst",
            Seq(1L, 2L, 3L), maxHops = 3)
          .orderBy($"landmark", $"id")
      },
      Some("""WITH RECURSIVE e0 AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |e AS (SELECT src, dst FROM e0
             |  UNION SELECT dst, src FROM e0),
             |walk(l, id, d) AS (
             |  SELECT CAST(l AS BIGINT), CAST(l AS BIGINT), 0
             |  FROM (VALUES (1), (2), (3)) t(l)
             |  UNION
             |  SELECT w.l, e.dst, w.d + 1
             |  FROM walk w JOIN e ON e.src = w.id WHERE w.d < 3)
             |SELECT l AS landmark, id, CAST(min(d) AS BIGINT) AS dist
             |FROM walk GROUP BY l, id ORDER BY landmark, id""".stripMargin)),

    // ---- Weighted single-source shortest paths (q134): frontier-based
    //      Bellman-Ford min-plus sweeps (Dijkstra's queue does not
    //      distribute) over the symmetrized trade graph with small
    //      deterministic integer weights (1 + (src+dst) mod 3). The
    //      4-sweep budget is hop-bounded-EXACT by the Bellman-Ford
    //      invariant — distances are the ≤4-edge optima, which is
    //      precisely what the oracle's hop-capped recursive walk
    //      computes; integer min-plus is exact in both engines. ----
    Q("q134_shortest_paths",
      (s, dir) => {
        import s.implicits._
        val e0 = Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey")
          .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .select($"o_custkey".cast("long").as("src"),
            ($"l_suppkey" + 1000000L).cast("long").as("dst"))
        val edges = e0.unionByName(
            e0.select($"dst".as("src"), $"src".as("dst")))
          .withColumn("w", lit(1L) + pmod($"src" + $"dst", lit(3L)))
        GraphOps.shortestPaths(edges, "src", "dst", "w",
            source = 1L, maxSweeps = 4)
          .orderBy($"id")
      },
      Some("""WITH RECURSIVE e0 AS (
             |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
             |    CAST(l_suppkey + 1000000 AS BIGINT) AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |es AS (SELECT src, dst FROM e0
             |  UNION SELECT dst, src FROM e0),
             |e AS (SELECT src, dst, 1 + (src + dst) % 3 AS w FROM es),
             |walk(id, d, h) AS (
             |  SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), 0
             |  UNION
             |  SELECT e.dst, wk.d + e.w, wk.h + 1
             |  FROM walk wk JOIN e ON e.src = wk.id WHERE wk.h < 4)
             |SELECT id, CAST(min(d) AS BIGINT) AS dist
             |FROM walk GROUP BY id ORDER BY id""".stripMargin)),

    // ---- Theil–Sen robust daily trend (q135): the median pairwise
    //      day-slope of event volume (Theil 1950 / Sen 1968) — ~29% of
    //      days can be wild outliers without moving it, unlike a
    //      least-squares slope. Slopes stay exact (Δn, Δdays) long
    //      fractions; the LOWER median is taken under a TOTAL order
    //      (value, num, den, day pair), so no tie is engine-decided;
    //      only the reported slope rounds. ----
    Q("q135_theil_sen",
      (s, dir) => TimeSeries.theilSenDailyTrend(
        Tables(s, dir, "events"), "ts"),
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, count(*) AS n
             |  FROM events GROUP BY 1),
             |p AS (
             |  SELECT a.d AS da, b.d AS db, b.n - a.n AS num,
             |    CAST(date_diff('day', a.d, b.d) AS BIGINT) AS den
             |  FROM daily a JOIN daily b ON a.d < b.d),
             |o AS (
             |  SELECT num, den,
             |    CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS v,
             |    row_number() OVER (ORDER BY
             |      CAST(num AS DOUBLE) / CAST(den AS DOUBLE),
             |      num, den, da, db) AS rn,
             |    count(*) OVER () AS cnt
             |  FROM p)
             |SELECT CAST(cnt AS BIGINT) AS n_pairs,
             |  CAST(num AS BIGINT) AS slope_num,
             |  CAST(den AS BIGINT) AS slope_den, round(v, 6) AS slope
             |FROM o WHERE rn = (cnt + 1) // 2""".stripMargin)),

    // ---- Pooled two-proportion z-test (q136): purchase conversion,
    //      even vs odd user cohorts — the A/B significance check run
    //      in-engine. All float inputs are exact long counts; divide
    //      and sqrt are IEEE correctly-rounded on identical operands,
    //      so round-6 z is engine-exact; group 1 = the lower cohort
    //      key pins the sign. ----
    Q("q136_ab_test",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.twoProportionZ(
          Tables(s, dir, "events"),
          pmod($"user_id", lit(2L)), $"event_type" === "purchase")
      },
      Some("""WITH c AS (
             |  SELECT user_id % 2 AS grp, count(*) AS n,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
             |  FROM events GROUP BY 1)
             |SELECT a.grp AS grp_1, CAST(a.n AS BIGINT) AS n_1,
             |  CAST(a.x AS BIGINT) AS x_1,
             |  b.grp AS grp_2, CAST(b.n AS BIGINT) AS n_2,
             |  CAST(b.x AS BIGINT) AS x_2,
             |  round((CAST(a.x AS DOUBLE) / CAST(a.n AS DOUBLE)
             |         - CAST(b.x AS DOUBLE) / CAST(b.n AS DOUBLE))
             |    / sqrt((CAST(a.x + b.x AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
             |      * (1.0 - CAST(a.x + b.x AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
             |      * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))),
             |    6) AS z,
             |  abs(round((CAST(a.x AS DOUBLE) / CAST(a.n AS DOUBLE)
             |         - CAST(b.x AS DOUBLE) / CAST(b.n AS DOUBLE))
             |    / sqrt((CAST(a.x + b.x AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
             |      * (1.0 - CAST(a.x + b.x AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))
             |      * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))),
             |    6)) > 1.96 AS significant
             |FROM c a JOIN c b ON a.grp < b.grp""".stripMargin)),

    // ---- Two-sample Kolmogorov–Smirnov (q137): did the order-value
    //      distribution shift early→late? The nonparametric companion
    //      to q130's bucketed PSI (no bucket-width choice; sensitive
    //      anywhere on the CDF). D·n₁·n₂ = max|c₁·n₂ − c₂·n₁| is an
    //      exact long carried beside the round-6 D; the 5% decision
    //      compares the raw D against Smirnov's asymptotic critical
    //      value — one IEEE sqrt of identical operands. ----
    Q("q137_ks_test",
      (s, dir) => {
        import s.implicits._
        val o = Tables(s, dir, "orders")
        val cut = lit("1998-01-01").cast("timestamp")
        graft.operators.Expectations.ksTest(
          o.filter($"o_orderdate" < cut),
          o.filter($"o_orderdate" >= cut),
          floor($"o_totalprice"))
      },
      Some("""WITH a AS (
             |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
             |b AS (
             |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
             |ca AS (SELECT v, count(*) AS np FROM a GROUP BY 1),
             |cb AS (SELECT v, count(*) AS nq FROM b GROUP BY 1),
             |g AS (
             |  SELECT coalesce(ca.v, cb.v) AS v,
             |    coalesce(np, 0) AS np, coalesce(nq, 0) AS nq
             |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
             |c AS (
             |  SELECT sum(np) OVER (ORDER BY v) AS cp,
             |    sum(nq) OVER (ORDER BY v) AS cq,
             |    sum(np) OVER () AS n_p, sum(nq) OVER () AS n_q
             |  FROM g),
             |agg AS (
             |  SELECT n_p, n_q, max(abs(cp * n_q - cq * n_p)) AS d_num
             |  FROM c GROUP BY n_p, n_q)
             |SELECT CAST(n_p AS BIGINT) AS n_p, CAST(n_q AS BIGINT) AS n_q,
             |  CAST(d_num AS BIGINT) AS d_num,
             |  CASE WHEN n_p > 0 AND n_q > 0 THEN
             |    round(CAST(d_num AS DOUBLE)
             |      / (CAST(n_p AS DOUBLE) * CAST(n_q AS DOUBLE)), 6)
             |  END AS d,
             |  CASE WHEN n_p > 0 AND n_q > 0 THEN
             |    CAST(d_num AS DOUBLE)
             |      / (CAST(n_p AS DOUBLE) * CAST(n_q AS DOUBLE))
             |    > 1.358 * sqrt(CAST(n_p + n_q AS DOUBLE)
             |      / (CAST(n_p AS DOUBLE) * CAST(n_q AS DOUBLE)))
             |  END AS significant
             |FROM agg""".stripMargin)),

    // ---- CUSUM drift detector (q138): Page's one-sided cumulative-sum
    //      chart on daily volume — catches a small SUSTAINED shift that
    //      q121's per-day z-scores miss. Computed EXACTLY via the
    //      prefix-sum closed form S_t = P_t − min_{0≤j≤t} P_j (two
    //      windows, no sequential fold); deviations ride integer
    //      micro-units so S and the alarm are engine-exact. ----
    Q("q138_cusum",
      (s, dir) => TimeSeries.cusumDailyVolume(
        Tables(s, dir, "events"), "ts", slack = 0.1, hDays = 0.5),
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS d, count(*) AS n
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT d, n,
             |    CAST(round(1e6 * CAST(sum(n) OVER () AS DOUBLE)
             |      / CAST(count(*) OVER () AS DOUBLE), 0) AS BIGINT) AS mu
             |  FROM daily),
             |dv AS (
             |  SELECT d, n,
             |    n * 1000000 - CAST(round(CAST(mu AS DOUBLE) * 1.1, 0)
             |      AS BIGINT) AS dev,
             |    CAST(round(CAST(mu AS DOUBLE) * 0.5, 0) AS BIGINT) AS h
             |  FROM m),
             |p AS (
             |  SELECT d, n, h, sum(dev) OVER (ORDER BY d) AS prefix
             |  FROM dv),
             |s AS (
             |  SELECT d, n, h, prefix,
             |    least(0, min(prefix) OVER (ORDER BY d)) AS rm
             |  FROM p)
             |SELECT d, CAST(n AS BIGINT) AS n,
             |  CAST(prefix - rm AS BIGINT) AS s_micro,
             |  (prefix - rm) > h AS alarm
             |FROM s ORDER BY d""".stripMargin)),

    // ---- Chi-square independence + Cramér's V (q139): is event type
    //      associated with the user cohort? The FULL r×c grid is
    //      scored (absent combos still contribute E — dropping them
    //      understates χ²); each cell quantizes to nano-units before
    //      the order-free integer sum (the q130 discipline); V rides
    //      one IEEE sqrt of the quantized χ². ----
    Q("q139_chi2_independence",
      (s, dir) => {
        import s.implicits._
        graft.operators.Expectations.chiSquareIndependence(
          Tables(s, dir, "events"),
          $"event_type", pmod($"user_id", lit(3L)))
      },
      Some("""WITH cells AS (
             |  SELECT event_type AS r, user_id % 3 AS c, count(*) AS o
             |  FROM events GROUP BY 1, 2),
             |rmg AS (SELECT r, sum(o) AS rm FROM cells GROUP BY 1),
             |cmg AS (SELECT c, sum(o) AS cm FROM cells GROUP BY 1),
             |t AS (
             |  SELECT (SELECT count(*) FROM rmg) AS nr,
             |    (SELECT count(*) FROM cmg) AS nc,
             |    (SELECT sum(o) FROM cells) AS n),
             |grid AS (
             |  SELECT rmg.r, cmg.c, rmg.rm, cmg.cm,
             |    coalesce(cells.o, 0) AS o
             |  FROM rmg CROSS JOIN cmg
             |  LEFT JOIN cells ON cells.r = rmg.r AND cells.c = cmg.c),
             |contrib AS (
             |  SELECT CAST(round((CAST(o AS DOUBLE) - e)
             |      * (CAST(o AS DOUBLE) - e) / e * 1e9, 0) AS BIGINT) AS cn
             |  FROM (SELECT o,
             |      CAST(rm * cm AS DOUBLE) / CAST(n AS DOUBLE) AS e
             |    FROM grid, t)),
             |a AS (SELECT sum(cn) AS chi2_nano FROM contrib)
             |SELECT CAST(t.n AS BIGINT) AS n, CAST(t.nr AS BIGINT) AS n_rows,
             |  CAST(t.nc AS BIGINT) AS n_cols,
             |  CAST((t.nr - 1) * (t.nc - 1) AS BIGINT) AS dof,
             |  CASE WHEN (t.nr - 1) * (t.nc - 1) > 0 THEN
             |    CAST(a.chi2_nano AS BIGINT) END AS chi2_nano,
             |  CASE WHEN (t.nr - 1) * (t.nc - 1) > 0 THEN
             |    round(CAST(a.chi2_nano AS DOUBLE) / 1e9, 6) END AS chi2,
             |  CASE WHEN (t.nr - 1) * (t.nc - 1) > 0 THEN
             |    round(sqrt(CAST(a.chi2_nano AS DOUBLE) / 1e9
             |      / (CAST(t.n AS DOUBLE)
             |        * CAST(least(t.nr - 1, t.nc - 1) AS DOUBLE))), 6)
             |  END AS cramers_v
             |FROM t, a""".stripMargin))
  )
}
