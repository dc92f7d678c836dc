package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewOps

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("salted join produces exactly the plain-join result") {
    val l = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("t"))
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(l, o, "l_orderkey", "o_orderkey", 8)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("t"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salting spreads a pathological single-key distribution") {
    import spark.implicits._
    // every row shares one key — the worst case a shuffle can meet
    val skewed = spark.range(10000).select(lit(1L).as("k"), $"id".as("v"))
    val dim = Seq((1L, "only")).toDF("dk", "name")
    val joined = SkewOps.saltedJoin(skewed, dim, "k", "dk", 16)
    assert(joined.count() == 10000)
    // the salted key-space actually uses multiple salt values
    val salts = skewed.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(16)))
      .select(countDistinct(col("__salt"))).collect().head.getLong(0)
    assert(salts > 8, s"expected spread over salt values, got $salts")
  }
}
