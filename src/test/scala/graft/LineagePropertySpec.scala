package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.lineage.{ColumnRef, LineageExtractor}

/** Property tests (SURVEY §5 item 3): random plan shapes over the fixture
  * schema ⇒ lineage invariants hold. Uses raw scalacheck generators with
  * deterministic seeds (the scalatest bridge artifact isn't in the offline
  * cache).
  */
class LineagePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val liCols = Seq("l_orderkey", "l_partkey", "l_quantity",
    "l_extendedprice", "l_discount", "l_returnflag")

  private sealed trait Step
  private case class Proj(cols: Seq[String]) extends Step
  private case class Filt(col: String, thr: Double) extends Step
  private case class Agg(key: String, valCol: String) extends Step
  private case class Win(key: String, valCol: String) extends Step

  private val genStep: Gen[Step] = Gen.oneOf(
    Gen.someOf(liCols).suchThat(_.nonEmpty).map(c => Proj(c.toSeq)),
    for { c <- Gen.oneOf("l_quantity", "l_extendedprice"); t <- Gen.choose(0.0, 50.0) }
      yield Filt(c, t),
    for { k <- Gen.oneOf("l_returnflag", "l_partkey"); v <- Gen.oneOf("l_quantity", "l_discount") }
      yield Agg(k, v),
    for { k <- Gen.oneOf("l_returnflag", "l_orderkey"); v <- Gen.oneOf("l_quantity", "l_extendedprice") }
      yield Win(k, v))

  private def apply(df: DataFrame, s: Step): DataFrame = s match {
    case Proj(cs) =>
      val avail = cs.filter(df.columns.contains)
      if (avail.isEmpty) df else df.select(avail.map(col): _*)
    case Filt(c, t) =>
      if (df.columns.contains(c)) df.filter(col(c) > t) else df
    case Agg(k, v) =>
      if (df.columns.contains(k) && df.columns.contains(v))
        df.groupBy(col(k)).agg(sum(col(v)).as(s"sum_$v"), count(lit(1)).as("cnt"))
      else df
    case Win(k, v) =>
      if (df.columns.contains(k) && df.columns.contains(v))
        df.withColumn("w_rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col(k)).orderBy(col(v))))
      else df
  }

  test("random plans: every output column's lineage ⊆ lineitem columns, " +
    "and data-derived outputs have non-empty lineage") {
    val allRefs = (liCols ++ Seq("l_suppkey", "l_linenumber", "l_tax",
      "l_linestatus", "l_shipdate")).map(c => ColumnRef("lineitem", c)).toSet
    val gen = Gen.listOfN(4, genStep)
    (0 until 25).foreach { i =>
      val steps = gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      val df = steps.foldLeft(
        Tables(spark, sf, "lineitem"))((d, s) => apply(d, s))
      val lin = LineageExtractor.columnLineage(df.queryExecution.optimizedPlan)
      lin.foreach { case (out, refs) =>
        assert(refs.subsetOf(allRefs), s"$out -> $refs leaks outside lineitem")
        if (out != "cnt" && out != "w_rank")
          assert(refs.nonEmpty, s"$out has empty lineage in plan:\n${df.queryExecution.optimizedPlan}")
      }
      // w_rank lineage must include its window partition/order columns
      if (df.columns.contains("w_rank")) assert(lin("w_rank").nonEmpty)
    }: Unit
  }

  test("lineage is invariant under AQE on/off") {
    val df = SparkEntry.queries("q19_multijoin_agg")(spark, sf)
    val on = LineageExtractor.columnLineage(df.queryExecution.optimizedPlan)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df2 = SparkEntry.queries("q19_multijoin_agg")(spark, sf)
      val off = LineageExtractor.columnLineage(df2.queryExecution.optimizedPlan)
      assert(on == off)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
