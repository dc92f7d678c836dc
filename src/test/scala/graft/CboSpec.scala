package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Catalyst CBO fed by the engine's own ANALYZE profile
  * (operators.CatalogStats): with column stats in the session catalog
  * and `spark.sql.cbo.*` on, (1) filter estimates become row-accurate,
  * (2) CostBasedJoinReorder rewrites a badly-written multi-join so the
  * filtered dimension joins first, (3) a join that raw file sizes say
  * must sort-merge becomes a broadcast join because the FILTERED side is
  * estimated small. This is the stats-driven answer to q80's hand-placed
  * filters — at 100 TB you ANALYZE once (one scan, approx ndv) and every
  * subsequent multi-join plans itself.
  *
  * All assertions are on the pre-AQE plans (`optimizedPlan`/`sparkPlan`):
  * AQE can rescue a bad initial plan at runtime per-stage, but only after
  * materializing the stage — the initial plan is what CBO owns.
  */
class CboSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private val tables = Seq("nation", "customer", "orders", "lineitem")

  override def beforeAll(): Unit = {
    import graft.operators.CatalogStats
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
      // LOCATION makes these EXTERNAL: drop touches metadata only, the
      // read-only fixture files are never at risk
      CatalogStats.registerParquet(spark, s"cbo_$t", s"$sf/$t.parquet")
    }
    CatalogStats.analyze(spark, "cbo_nation", Seq("n_nationkey", "n_name"))
    CatalogStats.analyze(spark, "cbo_customer",
      Seq("c_custkey", "c_nationkey", "c_acctbal"))
    CatalogStats.analyze(spark, "cbo_orders",
      Seq("o_orderkey", "o_custkey", "o_totalprice"))
    CatalogStats.analyze(spark, "cbo_lineitem",
      Seq("l_orderkey", "l_quantity", "l_extendedprice"))
  }

  override def afterAll(): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS cbo_$t"))

  /** Run `body` with CBO (and join reorder) toggled, restoring the
    * session's defaults after — the shared TestSpark session must not
    * leak CBO into other suites' plan assertions.
    */
  private def withCbo[T](on: Boolean)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try { keys.foreach(k => spark.conf.set(k, on.toString)); body }
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def leafTables(p: LogicalPlan): Seq[String] =
    p.collectLeaves().collect {
      case r: LogicalRelation => r.catalogTable.map(_.identifier.table).getOrElse("?")
    }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
    here ++ p.children.flatMap(c => collectAll(c)(pf))
  }

  test("analyze injects rowCount + ndv the optimizer can see") {
    val stats = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier("cbo_customer"))
      .stats.getOrElse(fail("no stats on cbo_customer"))
    assert(stats.rowCount.contains(BigInt(150)))
    val ndv = stats.colStats("c_nationkey").distinctCount.get
    assert(ndv >= 24 && ndv <= 26, s"ndv estimate off: $ndv") // exact 25, rsd 1%
    // and they flow into plan estimates: equality filter on a 25-ndv
    // column over 150 rows estimates 150/25 = 6 rows under CBO
    withCbo(on = true) {
      val est = spark.table("cbo_customer")
        .filter(org.apache.spark.sql.functions.col("c_nationkey") === 1)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.contains(BigInt(6)), s"filter estimate: $est")
    }
  }

  test("stats flip a sort-merge join to broadcast via filter selectivity") {
    // threshold between the FILTERED estimate (~6 rows, a few hundred
    // bytes) and the raw customer file (6946 bytes): without CBO the
    // filter passes the child's sizeInBytes through untouched -> SMJ;
    // with CBO + stats the filtered side is tiny -> BHJ
    def q(): DataFrame = spark.table("cbo_orders")
      .join(spark.table("cbo_customer")
          .filter(org.apache.spark.sql.functions.col("c_nationkey") === 1),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
      val off = withCbo(on = false)(q().queryExecution.sparkPlan)
      assert(collectAll(off) { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected SMJ without stats:\n$off")
      val on = withCbo(on = true)(q().queryExecution.sparkPlan)
      assert(collectAll(on) { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"expected BHJ with stats:\n$on")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("join reorder moves the filtered dimension ahead of the fact table") {
    // written worst-first: the 6000-row fact joins everything before the
    // 1-row filtered nation constrains anything
    def q(): DataFrame = spark.sql(
      """SELECT n_name, sum(l_extendedprice) AS rev
        |FROM cbo_lineitem
        |JOIN cbo_orders   ON l_orderkey = o_orderkey
        |JOIN cbo_customer ON o_custkey = c_custkey
        |JOIN cbo_nation   ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |GROUP BY n_name""".stripMargin)
    val off = withCbo(on = false)(leafTables(q().queryExecution.optimizedPlan))
    assert(off == Seq("cbo_lineitem", "cbo_orders", "cbo_customer", "cbo_nation"),
      s"written order expected without CBO, got $off")
    val on = withCbo(on = true)(leafTables(q().queryExecution.optimizedPlan))
    assert(on != off, "CostBasedJoinReorder left the written order in place")
    assert(on.indexOf("cbo_nation") < on.indexOf("cbo_lineitem"),
      s"filtered nation should join before the fact table, got $on")
    // same rows either way — reorder is cost-only
    withCbo(on = true) {
      val rows = q().collect()
      assert(rows.length == 1 && rows(0).getString(0) == "NATION_7")
    }
  }
}
