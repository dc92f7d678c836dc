package graft

import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lineage.LineageExtractor

/** Expression rewrite into source terms + partition-level input lineage
  * (reference SchemaMapping.map and PartitionDef inputs).
  */
class LineageRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("filter condition rewrites into source-column terms through aliases") {
    import spark.implicits._
    // alias chain: qty -> q2, then filter on q2; the rewritten condition
    // must speak in lineitem.l_quantity terms
    val df = Tables(spark, sf, "lineitem")
      .select($"l_quantity".as("qty"), $"l_orderkey")
      .select($"qty".as("q2"), $"l_orderkey")
      .filter($"q2" > 40)
    val plan = df.queryExecution.analyzed
    val cond = plan.collectFirst { case f: LFilter => f.condition }.get
    val sql = LineageExtractor.rewriteToSourceSql(cond, plan)
    assert(sql.contains("lineitem.l_quantity"), sql)
  }

  test("aggregate expression rewrites compound expressions to source terms") {
    import spark.implicits._
    val df = Tables(spark, sf, "lineitem")
      .select(($"l_extendedprice" * (lit(1) - $"l_discount")).as("net"))
      .filter($"net" > 1000)
    val plan = df.queryExecution.analyzed
    val cond = plan.collectFirst { case f: LFilter => f.condition }.get
    val sql = LineageExtractor.rewriteToSourceSql(cond, plan)
    assert(sql.contains("lineitem.l_extendedprice") && sql.contains("lineitem.l_discount"), sql)
  }

  test("partition-level lineage reports only surviving partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_plin").toString
    Tables(spark, sf, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(s"$tmp/orders_bystatus")
    val df = spark.read.parquet(s"$tmp/orders_bystatus")
      .filter(col("o_orderstatus") === "F")
      .agg(count(lit(1)))
    df.collect()
    val parts = LineageExtractor.partitionLineage(df.queryExecution.executedPlan)
    assert(parts.keySet == Set("orders_bystatus"))
    assert(parts("orders_bystatus") == Seq("o_orderstatus=F"), parts)
    // unpartitioned scans report an empty partition list
    val df2 = Tables(spark, sf, "region").agg(count(lit(1)))
    df2.collect()
    val parts2 = LineageExtractor.partitionLineage(df2.queryExecution.executedPlan)
    assert(parts2 == Map("region" -> Seq()))
  }

  test("report surfaces catalog owner/timestamps and pruned partitions") {
    import spark.implicits._
    graft.queries.Extra3Queries.freshTable(spark, "graft_meta_nation")
    Tables(spark, sf, "nation").write.mode("overwrite")
      .saveAsTable("graft_meta_nation")
    val df = spark.table("graft_meta_nation").filter($"n_regionkey" === 1)
    val rep = LineageExtractor.report(df.queryExecution)
    val m = rep.inputs.find(_.name == "graft_meta_nation").get
    // catalog-managed: creation timestamp captured (owner flows through
    // the same CatalogTable path but the in-memory catalog leaves it "")
    assert(m.createTime > 0L, m)
    assert(rep.inputsJson.contains("\"createTime\""), rep.inputsJson)

    // partitioned read: the report's input entity lists ONLY the pruned
    // partitions, as first-class entries (not just the table grain)
    val tmp = java.nio.file.Files.createTempDirectory("graft_meta_part").toString
    Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(s"$tmp/orders_bystatus")
    val pruned = spark.read.parquet(s"$tmp/orders_bystatus")
      .filter($"o_orderstatus" === "F")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val prep = LineageExtractor.report(pruned.queryExecution)
    val pm = prep.inputs.find(_.name == "orders_bystatus").get
    assert(pm.partitions == Seq("o_orderstatus=F"), pm)
    assert(prep.inputsJson.contains("\"partitions\":[\"o_orderstatus=F\"]"),
      prep.inputsJson)
  }
}
