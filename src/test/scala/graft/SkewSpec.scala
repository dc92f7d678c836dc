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

  test("skewReport: hot key surfaces, exact shares and ratio, null key " +
      "labeled, uniform ratio 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def report(keys: Seq[Option[Long]], k: Int = 10) = graft.operators
      .SkewOps.skewReport(keys.toDF("k"), col("k"), k)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // key 7 holds 8 of 10 rows across 3 keys: share 800000 micro,
    // ratio = max·n_keys/total = 8·3/10 = 2.4
    val hot = report(Seq.fill(8)(Some(7L)) ++ Seq(Some(1L), None))
    assert(hot("7") == ((8L, 800000L, None)), hot.toString)
    assert(hot("(null)") == ((1L, 100000L, None)), hot.toString)
    assert(hot("(total)") == ((10L, 1000000L, Some(2400000L))), hot.toString)
    // a perfectly uniform key space reports ratio exactly 1
    val flat = report((1L to 4L).flatMap(i => Seq.fill(5)(Some(i))))
    assert(flat("(total)")._3 == Some(1000000L), flat.toString)
    // k caps the hot list but never the summary
    val capped = report(Seq.fill(8)(Some(7L)) ++ Seq(Some(1L), Some(2L)),
      k = 1)
    assert(capped.size == 2 && capped.contains("7") &&
      capped.contains("(total)"), capped.toString)
  }
}
