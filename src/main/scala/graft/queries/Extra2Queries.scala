package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third coverage wave: as-of join with tolerance, RANGE window frames,
  * unpivot/melt, semi-structured JSON extraction.
  */
object Extra2Queries {

  def all: Seq[Q] = Seq(

    // ---- as-of join with a time tolerance (pandas merge_asof semantics:
    //      latest click ≤ purchase ts AND within 1 hour) ----
    Q("q47_asof_tolerance",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "events")
          .filter($"event_type".isin("click", "purchase"))
          .select($"event_id", $"user_id", $"ts", $"event_type")
          .withColumn("kind", when($"event_type" === "click", 0).otherwise(1))
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        e.withColumn("click_ts",
            last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(w))
          .filter($"kind" === 1 && $"click_ts".isNotNull)
          .select($"event_id", $"user_id",
            unix_micros($"ts").as("p_us"), unix_micros($"click_ts").as("c_us"))
          .filter($"p_us" - $"c_us" <= 3600L * 1000000L)
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |WHERE epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
             |ORDER BY event_id""".stripMargin)),

    // ---- RANGE window frame (value-based, not row-based) ----
    Q("q48_range_frame",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice")
          .rangeBetween(-50000L, Window.currentRow)
        Tables(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_totalprice",
            count(lit(1)).over(w).as("n_within_50k"))
          .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("price"),
            $"n_within_50k")
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
             |    RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_within_50k
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- unpivot/melt (wide → long) ----
    Q("q49_unpivot",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .select($"l_returnflag", $"l_quantity", $"l_discount", $"l_tax")
          .unpivot(
            Array($"l_returnflag"),
            Array($"l_quantity", $"l_discount", $"l_tax"),
            "measure", "value")
          .groupBy($"l_returnflag", $"measure")
          .agg(round(sum($"value"), 2).as("total"))
          .orderBy($"l_returnflag", $"measure")
      },
      Some("""SELECT l_returnflag, measure, round(sum(value), 2) AS total FROM (
             |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
             |  UNION ALL
             |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
             |  UNION ALL
             |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
             |GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure""".stripMargin)),

    // ---- semi-structured: JSON field extraction from events.props ----
    Q("q50_json_extract",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"), max($"k").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- regexp + LIKE pattern surface (RE2-safe syntax only) ----
    Q("q51_regexp_like",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "part")
          .select(
            $"p_partkey",
            regexp_count($"p_type", lit("[aeiou]")).cast("long").as("n_vowels"),
            regexp_extract($"p_name", "b[a-z]+", 0).as("first_b_word"),
            $"p_type".like("%BRASS%").as("is_brass"),
            $"p_name".startsWith("al").as("starts_al"),
            $"p_name".endsWith("d").as("ends_d"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  len(regexp_extract_all(p_type, '[aeiou]')) AS n_vowels,
             |  coalesce(regexp_extract(p_name, 'b[a-z]+'), '') AS first_b_word,
             |  p_type LIKE '%BRASS%' AS is_brass,
             |  p_name LIKE 'al%' AS starts_al,
             |  p_name LIKE '%d' AS ends_d
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- TPC-H Q4 shape: correlated EXISTS with inequality + interval ----
    Q("q52_exists_interval",
      (s, dir) => {
        import s.implicits._
        val o = Tables(s, dir, "orders")
        val l = Tables(s, dir, "lineitem")
          .filter($"l_quantity" > 0).select($"l_orderkey", $"l_shipdate")
        o.join(l,
            o("o_orderkey") === l("l_orderkey") &&
              l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 80 DAYS"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 0
             |                AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- TPC-H Q22 shape: scalar subquery + anti join + aggregation ----
    Q("q53_rich_no_orders",
      (s, dir) => {
        import s.implicits._
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        val avgBal = c.filter($"c_acctbal" > 0)
          .agg(avg($"c_acctbal").as("a"))
        val rich = c.crossJoin(broadcast(avgBal)).filter($"c_acctbal" > $"a")
        rich.join(o.filter($"o_totalprice" > 400000),
            rich("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n"), round(sum($"c_acctbal"), 2).as("bal"))
          .orderBy($"c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS bal
             |FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ---- grouping() markers distinguish rollup total rows from data
    //      rows whose key happens to collide with the sentinel ----
    Q("q54_grouping_marker",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .rollup($"c_mktsegment")
          .agg(count(lit(1)).as("n"),
            grouping($"c_mktsegment").cast("long").as("is_total"))
          .select(
            coalesce($"c_mktsegment", lit("TOTAL")).as("seg"),
            $"is_total", $"n")
          .orderBy($"is_total", $"seg")
      },
      Some("""SELECT coalesce(c_mktsegment, 'TOTAL') AS seg,
             |  CAST(grouping(c_mktsegment) AS BIGINT) AS is_total, count(*) AS n
             |FROM customer GROUP BY ROLLUP (c_mktsegment)
             |ORDER BY is_total, seg""".stripMargin)),

    // ---- null-semantics battery: count(col) vs count(*), sum over
    //      all-null groups, null-safe comparisons, coalesce chains ----
    Q("q55_null_semantics",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .withColumn("maybe", when($"o_totalprice" > 250000, $"o_totalprice"))
          .groupBy($"o_orderstatus")
          .agg(
            count(lit(1)).as("n_rows"),
            count($"maybe").as("n_nonnull"),
            round(coalesce(sum($"maybe"), lit(0.0)), 2).as("sum_maybe"),
            round(coalesce(avg($"maybe"), lit(-1.0)), 4).as("avg_maybe"),
            sum(when($"maybe".isNull, 1L).otherwise(0L)).as("n_null"),
            count(when($"maybe" <=> lit(null), 1)).as("n_nullsafe_eq"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  count(*) AS n_rows,
             |  count(maybe) AS n_nonnull,
             |  round(coalesce(sum(maybe), 0), 2) AS sum_maybe,
             |  round(coalesce(avg(maybe), -1), 4) AS avg_maybe,
             |  CAST(sum(CASE WHEN maybe IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  count(CASE WHEN maybe IS NOT DISTINCT FROM NULL THEN 1 END) AS n_nullsafe_eq
             |FROM (SELECT o_orderstatus,
             |        CASE WHEN o_totalprice > 250000 THEN o_totalprice END AS maybe
             |      FROM orders)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- decimal arithmetic: exact fixed-point aggregation internally,
    //      cast to double only for the cross-engine compare ----
    Q("q56_decimal_agg",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .select($"l_returnflag",
            $"l_extendedprice".cast("decimal(18,2)").as("price_d"),
            $"l_discount".cast("decimal(18,4)").as("disc_d"))
          .groupBy($"l_returnflag")
          .agg(
            round(sum($"price_d").cast("double"), 2).as("sum_price"),
            round(sum($"price_d" * (lit(1).cast("decimal(18,4)") - $"disc_d"))
              .cast("double"), 2).as("sum_net"),
            round(avg($"disc_d").cast("double"), 6).as("avg_disc"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_net,
             |  round(CAST(avg(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 6) AS avg_disc
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- higher-order array functions (codegen'd HOFs, no UDFs):
    //      sort / slice / transform / filter / aggregate over per-group
    //      collected arrays ----
    Q("q66_array_hof",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(array_sort(collect_list(round($"l_extendedprice", 2))).as("arr"))
          .select($"l_orderkey",
            size($"arr").cast("long").as("n"),
            round(try_element_at($"arr", lit(1)), 2).as("lo"),
            round(try_element_at($"arr", lit(3)), 2).as("third"),
            round(aggregate($"arr", lit(0.0), (acc, x) => acc + x), 2).as("total"),
            size(filter($"arr", x => x > 30000)).cast("long").as("n_big"),
            round(try_element_at(transform($"arr", x => x + 100.0), lit(1)), 2)
              .as("lo_boosted"))
          .orderBy($"l_orderkey")
      },
      Some("""WITH g AS (
             |  SELECT l_orderkey, list_sort(list(round(l_extendedprice, 2))) AS arr
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT l_orderkey, len(arr) AS n,
             |  round(arr[1], 2) AS lo,
             |  round(arr[3], 2) AS third,
             |  round(list_sum(arr), 2) AS total,
             |  len(list_filter(arr, x -> x > 30000)) AS n_big,
             |  round(arr[1] + 100.0, 2) AS lo_boosted
             |FROM g ORDER BY l_orderkey""".stripMargin)),

    // ---- catalog-table source: CTAS into the session catalog, read back
    //      through `spark.table` (metastore-resolved relation; the same
    //      lineage path as Hive tables in the reference) ----
    Q("q67_catalog_table",
      (s, dir) => {
        import s.implicits._
        Extra3Queries.freshTable(s, "graft_cat_orders")
        Tables(s, dir, "orders").filter($"o_totalprice" > 200000)
          .write.mode("overwrite").saveAsTable("graft_cat_orders")
        s.table("graft_cat_orders")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_totalprice > 200000
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
  )
}
