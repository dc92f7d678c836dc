package graft.queries

import graft.{Q, Tables}

/** SQL front-end surface: the same engine driven through `spark.sql` over
  * registered temp views (the reference consumed parsed+executed HiveQL;
  * this is the Spark analog of that entry point — parser → analyzer →
  * same Catalyst pipeline, same lineage extraction).
  */
object SqlQueries {

  private def sql(s: org.apache.spark.sql.SparkSession, dir: String, text: String) = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  def all: Seq[Q] = Seq(

    // TPC-H Q5 shape: 5-way join through region, SQL text end-to-end
    Q("sq01_sql_region_revenue",
      (s, dir) => sql(s, dir,
        """SELECT n_name,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          |  count(*) AS n
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |GROUP BY n_name ORDER BY n_name""".stripMargin),
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS n
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // correlated subquery in SQL (TPC-H Q17 shape: per-part average)
    Q("sq02_sql_correlated",
      (s, dir) => sql(s, dir,
        """SELECT l.l_partkey AS partkey,
          |  round(sum(l.l_extendedprice), 2) AS total
          |FROM lineitem l
          |WHERE l.l_quantity > (
          |  SELECT avg(l2.l_quantity) * 1.6 FROM lineitem l2
          |  WHERE l2.l_partkey = l.l_partkey)
          |GROUP BY l.l_partkey
          |HAVING count(*) >= 2
          |ORDER BY partkey""".stripMargin),
      Some("""SELECT l.l_partkey AS partkey,
             |  round(sum(l.l_extendedprice), 2) AS total
             |FROM lineitem l
             |WHERE l.l_quantity > (
             |  SELECT avg(l2.l_quantity) * 1.6 FROM lineitem l2
             |  WHERE l2.l_partkey = l.l_partkey)
             |GROUP BY l.l_partkey
             |HAVING count(*) >= 2
             |ORDER BY partkey""".stripMargin)),

    // CTE + window in SQL text
    Q("sq03_sql_cte_window",
      (s, dir) => sql(s, dir,
        """WITH monthly AS (
          |  SELECT o_custkey, date_format(o_orderdate, 'yyyy-MM') AS ym,
          |    round(sum(o_totalprice), 2) AS m_total
          |  FROM orders GROUP BY o_custkey, date_format(o_orderdate, 'yyyy-MM'))
          |SELECT o_custkey, ym, m_total,
          |  round(sum(m_total) OVER (PARTITION BY o_custkey ORDER BY ym
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
          |FROM monthly ORDER BY o_custkey, ym""".stripMargin),
      Some("""WITH monthly AS (
             |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS ym,
             |    round(sum(o_totalprice), 2) AS m_total
             |  FROM orders GROUP BY o_custkey, strftime(o_orderdate, '%Y-%m'))
             |SELECT o_custkey, ym, m_total,
             |  round(sum(m_total) OVER (PARTITION BY o_custkey ORDER BY ym
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
             |FROM monthly ORDER BY o_custkey, ym""".stripMargin)),

    // LATERAL correlated subquery in FROM (Spark 4 + DuckDB both speak
    // it): per-customer top-2 orders — the dependent-join surface
    Q("sq04_sql_lateral",
      (s, dir) => sql(s, dir,
        """SELECT c.c_custkey, t.o_orderkey, t.price
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey, round(o_totalprice, 2) AS price
          |  FROM orders WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |WHERE c.c_custkey < 20
          |ORDER BY c.c_custkey, t.price DESC, t.o_orderkey""".stripMargin),
      Some("""SELECT c.c_custkey, t.o_orderkey, t.price
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey, round(o_totalprice, 2) AS price
             |  FROM orders WHERE o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |WHERE c.c_custkey < 20
             |ORDER BY c.c_custkey, t.price DESC, t.o_orderkey""".stripMargin)),

    // GROUP BY ALL (modern shorthand both engines support): grouping keys
    // inferred from the non-aggregate select items
    Q("sq05_sql_group_by_all",
      (s, dir) => sql(s, dir,
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |  round(sum(l_quantity), 2) AS qty
          |FROM lineitem GROUP BY ALL
          |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  round(sum(l_quantity), 2) AS qty
             |FROM lineitem GROUP BY ALL
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q21 shape on the columns this corpus has: correlated EXISTS
    // (another supplier shares the order) + correlated NOT EXISTS (none
    // of the others returned their line) — the double-semijoin surface;
    // Catalyst plans EXISTS as LeftSemi and NOT EXISTS as LeftAnti
    Q("sq06_sql_exists",
      (s, dir) => sql(s, dir,
        """SELECT s.s_name, count(*) AS numwait
          |FROM supplier s
          |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
          |JOIN orders o ON o.o_orderkey = l1.l_orderkey
          |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND EXISTS (
          |    SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_returnflag = 'R')
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin),
      Some("""SELECT s.s_name, count(*) AS numwait
             |FROM supplier s
             |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
             |JOIN orders o ON o.o_orderkey = l1.l_orderkey
             |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
             |  AND EXISTS (
             |    SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM lineitem l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey
             |      AND l3.l_returnflag = 'R')
             |GROUP BY s.s_name
             |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // TPC-H Q22 shape: uncorrelated scalar subquery threshold + NOT
    // EXISTS anti-join against orders — customers with above-average
    // balance and no urgent order, rolled up by segment (every customer
    // in this corpus has SOME order, so the anti-join narrows to the
    // urgent-priority subset to keep the gate non-vacuous)
    Q("sq07_sql_antijoin_scalar",
      (s, dir) => sql(s, dir,
        """SELECT c_mktsegment AS seg, count(*) AS numcust,
          |  round(sum(c_acctbal), 2) AS totacctbal
          |FROM customer c
          |WHERE c_acctbal > (
          |    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          |      AND o.o_orderpriority = '1-URGENT')
          |GROUP BY c_mktsegment
          |ORDER BY seg""".stripMargin),
      Some("""SELECT c_mktsegment AS seg, count(*) AS numcust,
             |  round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer c
             |WHERE c_acctbal > (
             |    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |      AND o.o_orderpriority = '1-URGENT')
             |GROUP BY c_mktsegment
             |ORDER BY seg""".stripMargin))
  )
}
