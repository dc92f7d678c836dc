package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational exec surface (SURVEY.md §2): scan/filter/project, all
  * join types (incl. null-safe `<=>`), aggregation, sorts/top-k, set ops,
  * windows, rollup/cube/grouping-sets, subqueries, generate/explode,
  * pivot, range join, as-of join.
  *
  * Determinism contract with the DuckDB oracle:
  *  - every query ends in a total ORDER BY (unique tiebreak column);
  *  - double aggregates are `round(…, k)` on BOTH sides so partial-agg
  *    summation order can't flip the hash;
  *  - computed integer columns are cast to LONG (DuckDB returns BIGINT for
  *    year()/length()/row_number() etc.);
  *  - no raw timestamp outputs (epoch micros / formatted strings instead).
  *
  * Scale notes are inline per query; the general rules: dims (region,
  * nation) are always broadcast; fact-fact joins shuffle on their join key
  * and rely on AQE for skew; windows partition by high-cardinality keys.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  def all: Seq[Q] = Seq(
    // ---- scan / filter / project (reference q1 scenario,
    //      /root/reference/hivehook/.../OperatorInfo.scala:60-119) ----
    Q("q01_scan_filter_project",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_quantity" > 45)
          .select($"l_orderkey", $"l_linenumber", round($"l_extendedprice", 2).as("price"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
             |FROM lineitem WHERE l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- groupBy/agg, TPC-H Q1 shape (reference GroupBy,
    //      OperatorInfo.scala:211-223; map-side partials are Spark's
    //      partial HashAggregate — free) ----
    Q("q02_agg_pricing",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_quantity" > 0)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS n
             |FROM lineitem WHERE l_quantity > 0
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- inner join chain + agg (shuffle join on fact keys; customer side
    //      is dim-small at test SF but scales: join keys co-partition) ----
    Q("q03_join_inner_agg",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy($"c_mktsegment")
          .agg(
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
            countDistinct($"o_orderkey").as("n_orders"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(DISTINCT o_orderkey) AS n_orders
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ---- left outer join (Hive JoinCondDesc type 1,
    //      OperatorInfo.scala:137-145) ----
    Q("q04_join_left_outer",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy($"c_custkey")
          .agg(
            count($"o_orderkey").as("n_orders"),
            round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |  round(coalesce(sum(o_totalprice), 0), 2) AS total
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // ---- right outer join (type 2) ----
    Q("q05_join_right_outer",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
          .groupBy($"c_custkey")
          .agg(round(coalesce(max($"o_totalprice"), lit(0.0)), 2).as("max_price"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, round(coalesce(max(o_totalprice), 0), 2) AS max_price
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // ---- full outer join (type 3) with genuinely unmatched sides ----
    Q("q06_join_full_outer",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").filter($"c_acctbal" > 5000)
          .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
        val sup = t(s, dir, "supplier").filter($"s_acctbal" > 5000)
          .groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
        c.join(sup, c("c_nationkey") === sup("s_nationkey"), "full_outer")
          .select(
            coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
            coalesce($"n_cust", lit(0L)).as("n_cust"),
            coalesce($"n_supp", lit(0L)).as("n_supp"))
          .orderBy($"nationkey")
      },
      Some("""WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer
             |            WHERE c_acctbal > 5000 GROUP BY c_nationkey),
             |     s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
             |            WHERE s_acctbal > 5000 GROUP BY s_nationkey)
             |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
             |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
             |FROM c FULL JOIN s ON c_nationkey = s_nationkey
             |ORDER BY nationkey""".stripMargin)),

    // ---- left semi join (type 5) ----
    Q("q07_join_semi",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter($"o_totalprice" > 100000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- left anti join (NOT EXISTS; beyond reference surface) ----
    Q("q08_join_anti",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter($"o_totalprice" > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- null-safe equality join `<=>` (reference renders nullSafe as
    //      `<=>`, OperatorInfo.scala:147) ----
    Q("q09_join_nullsafe",
      (s, dir) => {
        import s.implicits._
        val l = t(s, dir, "lineitem")
        val a = l.groupBy(nullif($"l_returnflag", lit("N")).as("flag_a"))
          .agg(count(lit(1)).as("n_all"))
        val b = l.filter($"l_quantity" > 25)
          .groupBy(nullif($"l_returnflag", lit("N")).as("flag_b"))
          .agg(count(lit(1)).as("n_big"))
        a.join(b, a("flag_a") <=> b("flag_b"))
          .select($"flag_a".as("flag"), $"n_all", $"n_big")
          .orderBy($"flag".asc_nulls_first)
      },
      Some("""WITH a AS (SELECT nullif(l_returnflag, 'N') AS flag, count(*) AS n_all
             |            FROM lineitem GROUP BY 1),
             |     b AS (SELECT nullif(l_returnflag, 'N') AS flag, count(*) AS n_big
             |            FROM lineitem WHERE l_quantity > 25 GROUP BY 1)
             |SELECT a.flag AS flag, n_all, n_big
             |FROM a JOIN b ON a.flag IS NOT DISTINCT FROM b.flag
             |ORDER BY flag NULLS FIRST""".stripMargin)),

    // ---- top-k: orderBy+limit → TakeOrderedAndProject (no full sort at
    //      scale: per-partition heap then driver merge of k·P rows) ----
    Q("q10_topk",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(10)
          .select($"o_orderkey", round($"o_totalprice", 2).as("price"))
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- union all ----
    Q("q11_union_all",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").groupBy($"c_nationkey".as("k"))
          .agg(count(lit(1)).as("n")).select(lit("customer").as("side"), $"k", $"n")
        val sup = t(s, dir, "supplier").groupBy($"s_nationkey".as("k"))
          .agg(count(lit(1)).as("n")).select(lit("supplier").as("side"), $"k", $"n")
        c.unionAll(sup).orderBy($"side", $"k")
      },
      Some("""SELECT 'customer' AS side, c_nationkey AS k, count(*) AS n
             |FROM customer GROUP BY c_nationkey
             |UNION ALL
             |SELECT 'supplier' AS side, s_nationkey AS k, count(*) AS n
             |FROM supplier GROUP BY s_nationkey
             |ORDER BY side, k""".stripMargin)),

    // ---- intersect (distinct semantics in both engines) ----
    Q("q12_intersect",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
          .intersect(t(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
          .orderBy($"nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // ---- except ----
    Q("q13_except",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").select($"c_custkey".as("custkey"))
          .except(t(s, dir, "orders").filter($"o_totalprice" > 400000)
            .select($"o_custkey".as("custkey")))
          .orderBy($"custkey")
      },
      Some("""SELECT c_custkey AS custkey FROM customer
             |EXCEPT
             |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
             |ORDER BY custkey""".stripMargin)),

    // ---- distinct aggregation (absent in reference, §2.6) ----
    Q("q14_distinct_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_partkey").as("nd_part"),
            countDistinct($"l_suppkey").as("nd_supp"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
             |  count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- window: rank within group, top-3 per segment ----
    Q("q15_window_rank",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val j = c.join(o, c("c_custkey") === o("o_custkey"))
          .select($"c_mktsegment".as("seg"), $"o_orderkey", $"o_totalprice")
        val w = Window.partitionBy($"seg").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        j.withColumn("rn", row_number().over(w).cast("long"))
          .filter($"rn" <= 3)
          .select($"seg", $"o_orderkey", round($"o_totalprice", 2).as("price"), $"rn")
          .orderBy($"seg", $"rn")
      },
      Some("""SELECT seg, o_orderkey, round(o_totalprice, 2) AS price, rn FROM (
             |  SELECT c_mktsegment AS seg, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM customer JOIN orders ON c_custkey = o_custkey)
             |WHERE rn <= 3 ORDER BY seg, rn""".stripMargin)),

    // ---- window: running sum + lag over per-customer order history ----
    Q("q16_window_running",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("running",
            round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
          .withColumn("prev_price", round(lag($"o_totalprice", 1).over(w), 2))
          .select($"o_custkey", $"o_orderkey", $"running", $"prev_price")
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
             |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- rollup ----
    Q("q17_rollup",
      (s, dir) => {
        import s.implicits._
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        val c = t(s, dir, "customer")
        // region+nation are tiny dims: broadcast both (at any scale).
        val j = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        j.rollup($"r_name", $"n_name")
          .agg(count(lit(1)).as("n"), round(sum($"c_acctbal"), 2).as("acct"))
          .select(
            coalesce($"r_name", lit("ALL")).as("region"),
            coalesce($"n_name", lit("ALL")).as("nation"),
            $"n", $"acct")
          .orderBy($"region", $"nation")
      },
      Some("""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
             |  count(*) AS n, round(sum(c_acctbal), 2) AS acct
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP (r_name, n_name)
             |ORDER BY region, nation""".stripMargin)),

    // ---- cube ----
    Q("q18_cube",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .cube($"c_mktsegment", $"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .select(
            coalesce($"c_mktsegment", lit("ALL")).as("seg"),
            coalesce($"o_orderstatus", lit("ALL")).as("status"),
            $"n", $"total")
          .orderBy($"seg", $"status")
      },
      Some("""SELECT coalesce(c_mktsegment, 'ALL') AS seg,
             |  coalesce(o_orderstatus, 'ALL') AS status,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY CUBE (c_mktsegment, o_orderstatus)
             |ORDER BY seg, status""".stripMargin)),

    // ---- reference q27 analog (FIXTURES.md §3): 4 joins + filtered dims +
    //      4× avg + group + order + limit. nation broadcast (tiny always);
    //      part/customer left to AQE (dim at test SF, fact-sized at 100 TB).
    Q("q19_multijoin_agg",
      (s, dir) => {
        import s.implicits._
        val l = t(s, dir, "lineitem")
        val o = t(s, dir, "orders").filter($"o_orderstatus" === "F")
        val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val n = t(s, dir, "nation")
        val p = t(s, dir, "part")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(p, l("l_partkey") === p("p_partkey"))
          .groupBy($"p_brand", $"n_name")
          .agg(
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"),
            round(avg($"l_discount"), 6).as("avg_disc"),
            round(avg($"l_tax"), 6).as("avg_tax"))
          .orderBy($"p_brand", $"n_name")
          .limit(100)
      },
      Some("""SELECT p_brand, n_name,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  round(avg(l_tax), 6) AS avg_tax
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN part ON l_partkey = p_partkey
             |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'F'
             |GROUP BY p_brand, n_name ORDER BY p_brand, n_name LIMIT 100""".stripMargin)),

    // ---- scalar function surface: string/math/case/in ----
    Q("q20_scalar_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select(
            $"p_partkey",
            upper(substring($"p_name", 1, 8)).as("name8"),
            length($"p_name").cast("long").as("name_len"),
            concat($"p_brand", lit("#"), $"p_type").as("brand_type"),
            round(abs($"p_retailprice" - 1000.0), 2).as("diff"),
            round(sqrt($"p_size"), 4).as("sqrt_size"),
            when($"p_size" < 10, "S").when($"p_size" < 30, "M").otherwise("L").as("size_class"),
            $"p_size".isin(1, 5, 10).as("is_special"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, upper(substr(p_name, 1, 8)) AS name8,
             |  length(p_name) AS name_len,
             |  concat(p_brand, '#', p_type) AS brand_type,
             |  round(abs(p_retailprice - 1000.0), 2) AS diff,
             |  round(sqrt(p_size), 4) AS sqrt_size,
             |  CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_class,
             |  p_size IN (1, 5, 10) AS is_special
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- date/time functions + monthly agg ----
    Q("q21_date_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy(date_format($"o_orderdate", "yyyy-MM").as("ym"))
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"ym")
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY 1 ORDER BY ym""".stripMargin)),

    // ---- having ----
    Q("q22_having",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .filter($"n" >= 5)
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 5
             |ORDER BY o_custkey""".stripMargin)),

    // ---- scalar subquery (uncorrelated; broadcast single-row at scale) ----
    Q("q23_scalar_subquery",
      (s, dir) => {
        import s.implicits._
        val p = t(s, dir, "part")
        val threshold = p.agg(avg($"p_retailprice").as("a"))
        p.crossJoin(broadcast(threshold))
          .filter($"p_retailprice" > $"a" * 1.005)
          .select($"p_partkey", round($"p_retailprice", 2).as("price"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, round(p_retailprice, 2) AS price FROM part
             |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part) * 1.005
             |ORDER BY p_partkey""".stripMargin)),

    // ---- IN subquery (→ left semi on a filtered broadcast dim) ----
    Q("q24_in_subquery",
      (s, dir) => {
        import s.implicits._
        val sup = t(s, dir, "supplier")
        val n = t(s, dir, "nation").filter($"n_regionkey" === 1).select($"n_nationkey")
        sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"), "left_semi")
          .select($"s_suppkey", $"s_name")
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
             |ORDER BY s_suppkey""".stripMargin)),

    // ---- generate/explode (lineage `Generate` case, SURVEY §3.5) ----
    Q("q25_explode_tokens",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .select(explode(split($"text", " ")).as("token"))
          .filter($"token" =!= "")
          .groupBy($"token")
          .agg(count(lit(1)).as("n"))
          .orderBy($"token")
      },
      Some("""SELECT token, count(*) AS n FROM (
             |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |WHERE token <> '' GROUP BY token ORDER BY token""".stripMargin)),

    // ---- events hourly rollup (time bucketing) ----
    Q("q26_events_hourly",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(
            date_format($"ts", "yyyy-MM-dd HH").as("hr"),
            $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_v"))
          .orderBy($"hr", $"event_type")
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d %H') AS hr, event_type,
             |  count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    // ---- sessionization via gap detection (lag + conditional + running
    //      sum + re-agg). Scales: one shuffle on user_id, windows stay
    //      within partitions. ----
    Q("q27_sessionize",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        t(s, dir, "events")
          .withColumn("sec", unix_timestamp($"ts"))
          .withColumn("prev_sec", lag($"sec", 1).over(w))
          .withColumn("new_sess",
            when($"prev_sec".isNull || $"sec" - $"prev_sec" > 1800, 1L).otherwise(0L))
          .withColumn("session_id",
            sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"), min($"sec").as("start_sec"), max($"sec").as("end_sec"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, ts, sec,
             |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, sec,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(sec) AS start_sec, max(sec) AS end_sec
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // ---- grouping sets ----
    Q("q28_grouping_sets",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .groupingSets(
            Seq(Seq($"c_mktsegment"), Seq($"o_orderstatus"), Seq()),
            $"c_mktsegment", $"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .select(
            coalesce($"c_mktsegment", lit("ALL")).as("seg"),
            coalesce($"o_orderstatus", lit("ALL")).as("status"),
            $"n", $"total")
          .orderBy($"seg", $"status")
      },
      Some("""SELECT coalesce(c_mktsegment, 'ALL') AS seg,
             |  coalesce(o_orderstatus, 'ALL') AS status,
             |  count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
             |ORDER BY seg, status""".stripMargin)),

    // ---- approx distinct (HLL sketch; no exact oracle possible →
    //      rows-only check by design) ----
    // HLL sketches differ across engines, so the gate checks the estimate
    // against the exact count with a 5% bound — deterministic on fixed
    // data (Spark's HLL++ is seedless), and a real oracle instead of
    // rows-only
    Q("q29_approx_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey", 0.01).as("approx"),
            countDistinct($"l_partkey").as("exact_n"))
          .select($"l_returnflag", $"exact_n",
            (abs($"approx" - $"exact_n") <= $"exact_n" * 0.05).as("within_5pct"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_n,
             |  true AS within_5pct
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- pivot (conditional aggregation) ----
    Q("q30_pivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(count(lit(1)))
          .select(
            $"l_returnflag",
            coalesce($"F", lit(0L)).as("n_f"),
            coalesce($"O", lit(0L)).as("n_o"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_f,
             |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- range (band) join: non-equi condition against a tiny inline dim
    //      → BroadcastNestedLoopJoin; at scale the dim stays tiny so this
    //      is a map-side-only operation. ----
    Q("q31_range_join",
      (s, dir) => {
        import s.implicits._
        val bands = s.createDataFrame(Seq(
          ("low", 0.0, 50000.0),
          ("mid", 50000.0, 150000.0),
          ("high", 150000.0, 1e18))).toDF("band", "lo", "hi")
        val o = t(s, dir, "orders")
        o.join(broadcast(bands), o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
          .groupBy($"band")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"band")
      },
      Some("""SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN (VALUES ('low', 0.0, 50000.0),
             |                         ('mid', 50000.0, 150000.0),
             |                         ('high', 150000.0, 1e18)) AS b(band, lo, hi)
             |  ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY band ORDER BY band""".stripMargin)),

    // ---- as-of join, composed scalably: union both sides tagged, one
    //      window pass carries the latest click forward (no per-key loop,
    //      no range explosion; single shuffle on user_id). Oracle uses
    //      DuckDB's native ASOF JOIN. ----
    Q("q32_asof_join",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "events")
          .filter($"event_type".isin("click", "purchase"))
          .select($"event_id", $"user_id", $"ts", $"event_type")
          .withColumn("kind", when($"event_type" === "click", 0).otherwise(1))
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        e.withColumn("click_ts",
            last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(w))
          .filter($"kind" === 1 && $"click_ts".isNotNull)
          .select(
            $"event_id", $"user_id",
            unix_micros($"ts").as("p_us"),
            unix_micros($"click_ts").as("c_us"))
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY event_id""".stripMargin))
  )
}
