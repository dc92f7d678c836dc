package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second core wave: the remaining distinctive TPC-H query shapes
  * (Q13/Q15/Q17/Q18/Q21/Q22 analogs), recursive CTEs, native
  * session windows, and the long tail of window functions.
  *
  * Same determinism contract as [[CoreQueries]]: total ORDER BY, rounded
  * doubles, BIGINT-cast computed ints, no raw timestamp outputs.
  */
object Core2Queries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def all: Seq[Q] = Seq(

    // ---- recursive CTE (Spark 4 UnionLoop): drive the iteration from SQL
    //      text, join each step against dimension + fact tables. Scale: the
    //      recursion itself is 25 driver-side micro-batches over a
    //      broadcastable frontier; the per-step join is the usual
    //      broadcast-dim pattern. ----
    Q("q57_recursive_cte",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""WITH RECURSIVE seq(k) AS (
                |  SELECT 0
                |  UNION ALL
                |  SELECT k + 1 FROM seq WHERE k < 24)
                |SELECT k, n_name, count(c_custkey) AS n_cust
                |FROM seq JOIN nation ON n_nationkey = k
                |LEFT JOIN customer ON c_nationkey = n_nationkey
                |GROUP BY k, n_name ORDER BY k""".stripMargin)
      },
      Some("""WITH RECURSIVE seq(k) AS (
             |  SELECT 0
             |  UNION ALL
             |  SELECT k + 1 FROM seq WHERE k < 24)
             |SELECT k, n_name, count(c_custkey) AS n_cust
             |FROM seq JOIN nation ON n_nationkey = k
             |LEFT JOIN customer ON c_nationkey = n_nationkey
             |GROUP BY k, n_name ORDER BY k""".stripMargin)),

    // ---- TPC-H Q13 shape: customer order-count distribution (left outer
    //      join preserving empty customers + two-level aggregation).
    //      Scale: both aggs shuffle on their group key; the first is the
    //      join key itself so AQE coalesces into one exchange. ----
    Q("q58_count_distribution",
      (s, dir) => {
        import s.implicits._
        val per = t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
        per.groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ---- TPC-H Q17 shape: small-quantity orders for one brand vs the
    //      per-part average (correlated agg subquery → per-part pre-agg +
    //      join; the brand filter prunes the part side to a broadcast). ----
    Q("q59_small_qty_revenue",
      (s, dir) => {
        import s.implicits._
        val l = t(s, dir, "lineitem")
        val p = t(s, dir, "part").filter($"p_brand" === "Brand#1")
          .select($"p_partkey")
        val avgQty = l.groupBy($"l_partkey".as("a_partkey"))
          .agg((avg($"l_quantity") * 0.2).as("qty_thresh"))
        l.join(broadcast(p), $"l_partkey" === $"p_partkey")
          .join(avgQty, $"l_partkey" === $"a_partkey")
          .filter($"l_quantity" < $"qty_thresh")
          .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
             |  count(*) AS n
             |FROM lineitem l JOIN part p ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#1'
             |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
             |                    FROM lineitem l2
             |                    WHERE l2.l_partkey = l.l_partkey)""".stripMargin)),

    // ---- TPC-H Q21 shape: EXISTS → left-semi, NOT EXISTS → left-anti on
    //      the same fact table. Scale: all three lineitem legs shuffle on
    //      l_orderkey, so Catalyst colocates them in one exchange tree. ----
    Q("q60_waiting_supplier",
      (s, dir) => {
        import s.implicits._
        val l1 = t(s, dir, "lineitem").alias("l1")
        val l2 = t(s, dir, "lineitem").alias("l2")
        val l3 = t(s, dir, "lineitem").alias("l3")
        val o = t(s, dir, "orders").filter($"o_orderstatus" === "F")
        val sup = t(s, dir, "supplier")
        l1.join(o, col("l1.l_orderkey") === $"o_orderkey")
          .join(l2,
            col("l2.l_orderkey") === col("l1.l_orderkey") &&
              col("l2.l_suppkey") =!= col("l1.l_suppkey"),
            "left_semi")
          .join(l3,
            col("l3.l_orderkey") === col("l1.l_orderkey") &&
              col("l3.l_suppkey") =!= col("l1.l_suppkey") &&
              col("l3.l_shipdate") > col("l1.l_shipdate"),
            "left_anti")
          .join(sup, col("l1.l_suppkey") === $"s_suppkey")
          .groupBy($"s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy($"numwait".desc, $"s_name")
          .limit(20)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM lineitem l1
             |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > l1.l_shipdate)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // ---- TPC-H Q22 shape: customers above the positive-balance average
    //      with no recent orders (scalar subquery + anti join; the average
    //      is one broadcast scalar). "Country code" analog: last two digits
    //      of the customer name. ----
    Q("q61_cntrycode",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val avgBal = c.filter($"c_acctbal" > 0)
          .agg(avg($"c_acctbal").as("ab"))
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
          .select($"o_custkey")
        c.crossJoin(broadcast(avgBal))
          .filter($"c_acctbal" > $"ab")
          .join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .withColumn("code", expr("right(c_name, 2)"))
          .groupBy($"code")
          .agg(count(lit(1)).as("numcust"), round(sum($"c_acctbal"), 2).as("totacctbal"))
          .orderBy($"code")
      },
      Some("""SELECT right(c_name, 2) AS code, count(*) AS numcust,
             |  round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer c
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
             |                   WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '2001-01-01')
             |GROUP BY code ORDER BY code""".stripMargin)),

    // ---- TPC-H Q15 shape: supplier(s) with the maximum revenue (agg →
    //      scalar-max subquery → equality join back). Rounding happens
    //      before the max compare on both sides so partial-agg order can't
    //      flip the winner. ----
    Q("q62_max_revenue_supplier",
      (s, dir) => {
        import s.implicits._
        val rev = t(s, dir, "lineitem")
          .groupBy($"l_suppkey")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
            .as("total_rev"))
        val mx = rev.agg(max($"total_rev").as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter($"total_rev" === $"mx")
          .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name", $"total_rev")
          .orderBy($"s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
             |  FROM lineitem GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, total_rev
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    // ---- TPC-H Q18 shape: large-volume orders via IN over a grouped
    //      HAVING (semi join against an aggregate). ----
    Q("q63_big_orders",
      (s, dir) => {
        import s.implicits._
        val l = t(s, dir, "lineitem")
        val big = l.groupBy($"l_orderkey".as("b_orderkey"))
          .agg(sum($"l_quantity").as("sum_qty"))
          .filter($"sum_qty" > 300)
        t(s, dir, "orders")
          .join(big, $"o_orderkey" === $"b_orderkey")
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .select($"c_name", $"o_orderkey",
            round($"o_totalprice", 2).as("price"),
            round($"sum_qty", 2).as("total_qty"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT c_name, o_orderkey, round(o_totalprice, 2) AS price,
             |  round(sum_qty, 2) AS total_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(l_quantity) > 300) b ON o_orderkey = b.l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- native session windows (gap-merge operator, batch mode). Spark
    //      merges two event windows when next_ts - prev_ts < gap (window
    //      end is exclusive), compared at microsecond precision — the
    //      oracle replicates exactly that rule. Scale: one shuffle on
    //      user_id; the merge itself is the dedicated SessionWindow
    //      physical operator, not a generic sort+scan. ----
    Q("q64_session_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id",
            unix_micros($"session_window.start").as("start_us"),
            // window end = last event + gap: subtract it back out so the
            // oracle doesn't depend on the gap constant twice
            (unix_micros($"session_window.end") - 1800L * 1000000L).as("last_us"),
            $"n_events")
          .orderBy($"user_id", $"start_us")
      },
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) AS us,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, us,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
             |  FROM g)
             |SELECT user_id, min(us) AS start_us, max(us) AS last_us,
             |  count(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, start_us""".stripMargin)),

    // ---- window-function long tail: percent_rank / cume_dist /
    //      dense_rank / lead-with-default / nth_value ----
    Q("q65_window_battery",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderstatus")
          .orderBy($"o_totalprice", $"o_orderkey")
        val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus",
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"),
            dense_rank().over(w).cast("long").as("dr"),
            round(lead($"o_totalprice", 1, -1.0).over(w), 2).as("next_price"),
            round(coalesce(nth_value($"o_totalprice", 3).over(wRows), lit(-1.0)), 2)
              .as("third_price"))
          .orderBy($"o_orderstatus", $"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  round(percent_rank() OVER w, 6) AS pr,
             |  round(cume_dist() OVER w, 6) AS cd,
             |  dense_rank() OVER w AS dr,
             |  round(lead(o_totalprice, 1, -1.0) OVER w, 2) AS next_price,
             |  round(coalesce(nth_value(o_totalprice, 3) OVER (
             |    PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0), 2)
             |    AS third_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderstatus, o_orderkey""".stripMargin)),

    // ---- native as-of join: custom LogicalPlan → Strategy → sort-merge
    //      SparkPlan (graft.plans.AsOfJoin). Same semantics/oracle as the
    //      union+window q32, but the plan is two per-side exchanges + one
    //      forward merge scan ----
    Q("q74_asof_native",
      (s, dir) => {
        import s.implicits._
        import graft.plans.AsOf
        val e = t(s, dir, "events")
          .filter($"event_type".isin("click", "purchase"))
        val p = e.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
        val c = e.filter($"event_type" === "click")
          .select($"user_id".as("c_user"), unix_micros($"ts").as("c_us"))
        AsOf.join(p, c, ("user_id", "c_user"), ("p_us", "c_us"))
          .select($"event_id", $"user_id", $"p_us", $"c_us")
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY event_id""".stripMargin)),

    // ---- native as-of with tolerance (merge scan + post-filter inside
    //      the operator, not a separate Filter over a wider join) ----
    Q("q75_asof_native_tolerance",
      (s, dir) => {
        import s.implicits._
        import graft.plans.AsOf
        val e = t(s, dir, "events")
          .filter($"event_type".isin("click", "purchase"))
          .filter($"user_id" < 500)
        val p = e.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
        val c = e.filter($"event_type" === "click")
          .select($"user_id".as("c_user"), unix_micros($"ts").as("c_us"))
        AsOf.join(p, c, ("user_id", "c_user"), ("p_us", "c_us"),
            toleranceUs = Some(3600L * 1000000L))
          .select($"event_id", $"user_id", $"p_us", $"c_us")
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
             |           WHERE event_type = 'purchase' AND user_id < 500),
             |     c AS (SELECT user_id, ts FROM events
             |           WHERE event_type = 'click' AND user_id < 500)
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |WHERE epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
             |ORDER BY event_id""".stripMargin)),

    // ---- native LEFT OUTER as-of (pandas merge_asof default): every
    //      purchase kept, unmatched ones carry a null click time ----
    Q("q90_asof_native_outer",
      (s, dir) => {
        import s.implicits._
        import graft.plans.AsOf
        val e = t(s, dir, "events")
          .filter($"event_type".isin("click", "purchase"))
        val p = e.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
        val c = e.filter($"event_type" === "click")
          .select($"user_id".as("c_user"), unix_micros($"ts").as("c_us"))
        AsOf.join(p, c, ("user_id", "c_user"), ("p_us", "c_us"), outer = true)
          .select($"event_id", $"user_id", $"p_us", $"c_us")
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY event_id""".stripMargin)),

    // ---- native LEFT OUTER interval join: purchases with NO click in
    //      the preceding hour still appear, with a null click side ----
    Q("q91_interval_native_outer",
      (s, dir) => {
        import s.implicits._
        import graft.plans.Interval
        val e = t(s, dir, "events")
        val p = e.filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id", unix_micros($"ts").as("p_us"))
        val c = e.filter($"event_type" === "click")
          .select($"event_id".as("c_id"), $"user_id".as("c_user"),
            unix_micros($"ts").as("c_us"))
        Interval.join(p, c, ("user_id", "c_user"), ("p_us", "c_us"),
            windowUs = 3600L * 1000000L, outer = true)
          .select($"p_id", $"c_id", $"p_us", $"c_us")
          .orderBy($"p_id", $"c_id")
      },
      Some("""SELECT p.event_id AS p_id, c.event_id AS c_id,
             |  epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
             |ORDER BY p_id, c_id NULLS FIRST""".stripMargin)),

    // ---- native sliding windows in batch (window(ts, 2h, 1h)): each
    //      event lands in two overlapping windows; the oracle is the
    //      equivalent two-shifted-truncations union ----
    Q("q76_sliding_window",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_v"))
          .select(date_format($"window.start", "yyyy-MM-dd HH").as("ws"),
            $"event_type", $"n", $"sum_v")
          .orderBy($"ws", $"event_type")
      },
      Some("""WITH w AS (
             |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS ws,
             |    event_type, value FROM events
             |  UNION ALL
             |  SELECT strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR,
             |      '%Y-%m-%d %H'), event_type, value FROM events)
             |SELECT ws, event_type, count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM w GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin)),

    // ---- posexplode_outer: generator null semantics — rows with empty
    //      arrays survive with null (pos, token), unlike plain explode ----
    Q("q77_posexplode_outer",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents").filter($"doc_id" < 20)
          .select($"doc_id",
            when($"n_chars" > 900, split($"text", " "))
              .otherwise(array().cast("array<string>")).as("toks"))
          .select($"doc_id", posexplode_outer($"toks"))
          .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("token"))
          .orderBy($"doc_id", $"pos")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CASE WHEN n_chars > 900 THEN string_split(text, ' ')
             |         ELSE [] END AS toks
             |  FROM documents WHERE doc_id < 20),
             |e AS (
             |  SELECT doc_id, unnest(toks) AS token,
             |    generate_subscripts(toks, 1) - 1 AS pos
             |  FROM d)
             |SELECT d.doc_id, e.pos, e.token
             |FROM d LEFT JOIN e ON d.doc_id = e.doc_id
             |ORDER BY d.doc_id, e.pos""".stripMargin)),

    // ---- TPC-H Q7 shape: volume shipping between two nation groups,
    //      year extraction in the join output, dual broadcast dims ----
    Q("q80_volume_shipping",
      (s, dir) => {
        import s.implicits._
        val nations = Seq("NATION_11", "NATION_18", "NATION_19", "NATION_20")
        val n1 = t(s, dir, "nation").select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
          .filter($"supp_nation".isin(nations: _*))
        val n2 = t(s, dir, "nation").select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
          .filter($"cust_nation".isin(nations: _*))
        // join-order matters: Catalyst doesn't reorder joins without CBO
        // stats, so the nation predicate must reach supplier/customer
        // BEFORE lineitem/orders are touched — the fact-side shuffles then
        // carry only qualifying rows (~16%) instead of filtering after the
        // full chain. Only the 25-row nation dims get a broadcast HINT;
        // supplier/customer scale with SF, so their join strategy is left
        // to AQE (at bench SF the filtered dims broadcast at runtime; at
        // 100 TB they'd rightly shuffle).
        val sup = t(s, dir, "supplier").join(broadcast(n1), $"s_nationkey" === $"sk")
          .select($"s_suppkey", $"supp_nation")
        val cust = t(s, dir, "customer").join(broadcast(n2), $"c_nationkey" === $"ck")
          .select($"c_custkey", $"cust_nation")
        t(s, dir, "lineitem")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .filter($"supp_nation" =!= $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation",
            year($"l_shipdate").cast("long").as("l_year"))
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  year(l_shipdate) AS l_year,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE n1.n_name IN ('NATION_11', 'NATION_18', 'NATION_19', 'NATION_20')
             |  AND n2.n_name IN ('NATION_11', 'NATION_18', 'NATION_19', 'NATION_20')
             |  AND n1.n_name <> n2.n_name
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // ---- TPC-H Q11 shape: group value vs a fraction of the global total
    //      (grouped HAVING against a broadcast scalar subquery) ----
    Q("q81_important_stock",
      (s, dir) => {
        import s.implicits._
        val l = t(s, dir, "lineitem")
        val total = l.agg(sum($"l_extendedprice" * $"l_quantity").as("grand"))
        l.groupBy($"l_partkey")
          .agg(sum($"l_extendedprice" * $"l_quantity").as("value"))
          .crossJoin(broadcast(total))
          .filter($"value" > $"grand" * 0.0005)
          .select($"l_partkey", round($"value", 2).as("value"))
          .orderBy($"l_partkey")
      },
      Some("""SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
             |FROM lineitem GROUP BY l_partkey
             |HAVING sum(l_extendedprice * l_quantity) >
             |  (SELECT sum(l_extendedprice * l_quantity) * 0.0005 FROM lineitem)
             |ORDER BY l_partkey""".stripMargin)),

    // ---- native interval join (graft.plans.IntervalJoin): all same-user
    //      clicks in the hour before each purchase via a sliding buffer —
    //      the batch analog of the st03 stream-stream join, without the
    //      equi-join-then-filter same-key blowup ----
    Q("q78_interval_native",
      (s, dir) => {
        import s.implicits._
        import graft.plans.Interval
        val e = t(s, dir, "events")
        val p = e.filter($"event_type" === "purchase")
          .select($"event_id".as("p_id"), $"user_id", unix_micros($"ts").as("p_us"))
        val c = e.filter($"event_type" === "click")
          .select($"event_id".as("c_id"), $"user_id".as("c_user"),
            unix_micros($"ts").as("c_us"))
        Interval.join(p, c, ("user_id", "c_user"), ("p_us", "c_us"),
            windowUs = 3600L * 1000000L)
          .select($"p_id", $"c_id", $"p_us", $"c_us")
          .orderBy($"p_id", $"c_id")
      },
      Some("""SELECT p.event_id AS p_id, c.event_id AS c_id,
             |  epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
             |ORDER BY p_id, c_id""".stripMargin))
  )
}
