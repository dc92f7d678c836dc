package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of exec-surface coverage: write-side round trip,
  * percentiles/statistics, array aggregation, extended string/conditional/
  * bitwise scalar functions, ntile/first/last/nth windows, posexplode.
  */
object ExtraQueries {

  def all: Seq[Q] = Seq(

    // ---- write-side: df.write → read back → aggregate (InsertInto path;
    //      write lineage captured by the listener) ----
    Q("q33_write_roundtrip",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files.createTempDirectory("graft_wrt").toString
        Tables(s, dir, "orders").filter($"o_totalprice" > 300000)
          .write.mode("overwrite").parquet(s"$tmp/big_orders.parquet")
        s.read.parquet(s"$tmp/big_orders.parquet")
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_totalprice > 300000
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- interpolated percentiles (exact, not sketch) ----
    Q("q34_percentiles",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
            round(expr("percentile(l_quantity, 0.9)"), 4).as("p90"),
            round(expr("percentile(l_extendedprice, 0.99)"), 2).as("price_p99"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
             |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
             |  round(quantile_cont(l_extendedprice, 0.99), 2) AS price_p99
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- statistical aggregates ----
    Q("q35_stats",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(stddev_samp($"l_extendedprice"), 2).as("sd_price"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(corr($"l_quantity", $"l_extendedprice"), 6).as("qty_price_corr"),
            round(min($"l_extendedprice"), 2).as("min_price"),
            round(max($"l_extendedprice"), 2).as("max_price"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
             |  round(min(l_extendedprice), 2) AS min_price,
             |  round(max(l_extendedprice), 2) AS max_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- array aggregation (order-insensitive via sort, compared as text) ----
    Q("q36_array_agg",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .groupBy($"c_nationkey")
          .agg(concat_ws(",", array_sort(collect_set($"c_mktsegment"))).as("segments"))
          .orderBy($"c_nationkey")
      },
      Some("""SELECT c_nationkey,
             |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
             |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ---- extended string functions ----
    Q("q37_string_funcs",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "part")
          .select(
            $"p_partkey",
            replace($"p_name", lit("a"), lit("@")).as("repl"),
            lpad($"p_brand", 12, "*").as("pad_brand"),
            reverse($"p_type").as("rev_type"),
            repeat(substring($"p_brand", 1, 2), 3).as("rep2"),
            translate($"p_type", "aeiou", "AEIOU").as("vowels_up"),
            instr($"p_name", "o").cast("long").as("first_o"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  replace(p_name, 'a', '@') AS repl,
             |  lpad(p_brand, 12, '*') AS pad_brand,
             |  reverse(p_type) AS rev_type,
             |  repeat(substr(p_brand, 1, 2), 3) AS rep2,
             |  translate(p_type, 'aeiou', 'AEIOU') AS vowels_up,
             |  strpos(p_name, 'o') AS first_o
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- conditional functions ----
    Q("q38_conditional",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .select(
            $"o_orderkey",
            coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status2"),
            greatest($"o_totalprice", lit(100000.0)).cast("double").as("floor_price"),
            least($"o_custkey", $"o_orderkey").as("min_key"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
             |  greatest(o_totalprice, 100000.0) AS floor_price,
             |  least(o_custkey, o_orderkey) AS min_key
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- bitwise operators ----
    Q("q39_bitwise",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "orders")
          .select(
            $"o_orderkey",
            ($"o_orderkey".bitwiseAND(255L)).as("b_and"),
            ($"o_orderkey".bitwiseOR(4096L)).as("b_or"),
            ($"o_orderkey".bitwiseXOR(1234L)).as("b_xor"),
            shiftleft($"o_orderkey", 2).as("b_shl"),
            shiftright($"o_orderkey", 3).as("b_shr"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  o_orderkey & 255 AS b_and,
             |  o_orderkey | 4096 AS b_or,
             |  xor(o_orderkey, 1234) AS b_xor,
             |  o_orderkey << 2 AS b_shl,
             |  o_orderkey >> 3 AS b_shr
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- ntile over a scale-safe partitioning (per month, not global) ----
    Q("q40_ntile",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy(date_format($"o_orderdate", "yyyy-MM"))
          .orderBy($"o_totalprice", $"o_orderkey")
        Tables(s, dir, "orders")
          .select(
            $"o_orderkey",
            date_format($"o_orderdate", "yyyy-MM").as("ym"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS ym,
             |  ntile(4) OVER (PARTITION BY strftime(o_orderdate, '%Y-%m')
             |                 ORDER BY o_totalprice, o_orderkey) AS quartile
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- first_value / last_value / nth_value with explicit frames ----
    Q("q41_first_last",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, dir, "orders")
          .select(
            $"o_custkey", $"o_orderkey",
            first($"o_orderkey").over(full).as("first_key"),
            last($"o_orderkey").over(full).as("last_key"),
            nth_value($"o_orderkey", 2).over(full).as("second_key"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  first_value(o_orderkey) OVER w AS first_key,
             |  last_value(o_orderkey) OVER w AS last_key,
             |  nth_value(o_orderkey, 2) OVER w AS second_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- posexplode (generator with position) ----
    Q("q42_posexplode",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents").filter($"doc_id" < 50)
          .select($"doc_id", posexplode(split($"text", " ")))
          .select($"doc_id", $"pos".cast("long").as("pos"), $"col".as("token"))
          .filter($"token" =!= "")
          .orderBy($"doc_id", $"pos")
      },
      Some("""SELECT doc_id, pos, token FROM (
             |  SELECT doc_id,
             |    unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
             |    unnest(string_split(text, ' ')) AS token
             |  FROM documents WHERE doc_id < 50)
             |WHERE token <> '' ORDER BY doc_id, pos""".stripMargin))
  )
}
