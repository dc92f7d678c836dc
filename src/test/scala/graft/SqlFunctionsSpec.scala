package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom expressions are callable from SQL text after registration") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, TestSpark.sf)
    val row = spark.sql(
      """SELECT
        |  sorted_jaccard(shingle_hashes(text, 3), shingle_hashes(text, 3)) AS self_j,
        |  sorted_containment(slice(shingle_hashes(text, 3), 1, 5),
        |                     shingle_hashes(text, 3)) AS subset_c,
        |  simhash64(transform(split(text, ' '), t -> xxhash64(t))) AS sig,
        |  size(minhash_sig(shingle_hashes(text, 3), 32)) AS k
        |FROM documents LIMIT 1""".stripMargin).collect().head
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 1.0) // a sorted subarray is a contained set
    assert(row.getLong(2) != 0L)
    assert(row.getInt(3) == 32)
  }

  test("minhash_set_agg works in SQL group-by") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, TestSpark.sf)
    val rows = spark.sql(
      """SELECT lang, size(minhash_set_agg(source, 16)) AS k
        |FROM documents GROUP BY lang""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) == 16))
  }

  test("top_k_by works in SQL group-by") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, TestSpark.sf)
    val rows = spark.sql(
      """SELECT o_orderstatus, top_k_by(o_totalprice, o_orderkey, 3) AS tk
        |FROM orders GROUP BY o_orderstatus""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tk = r.getSeq[org.apache.spark.sql.Row](1)
      assert(tk.size == 3)
      // best-first: scores non-increasing
      assert(tk.map(_.getDouble(0)).sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("cms_estimate reads count_min_sketch output within its error bound") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, TestSpark.sf)
    val rows = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(o_custkey, 0.001d, 0.99d, 7) AS s,
        |                   count(*) AS n
        |            FROM orders),
        |     truth AS (SELECT o_custkey, count(*) AS cnt
        |               FROM orders GROUP BY o_custkey)
        |SELECT t.cnt, cms_estimate(sk.s, t.o_custkey) AS est, sk.n
        |FROM truth t CROSS JOIN sk""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, est, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(est >= cnt && est <= cnt + math.ceil(n * 0.001).toLong, r)
    }
  }

  test("cms_estimate codegen and interpreted paths agree") {
    // round 18: CmsEstimate dropped its CodegenFallback (the repo's
    // last) — pin that the generated path returns exactly what direct
    // expression eval (the interpreted path) and the sketch library
    // itself return, sharing one CmsCache contract.
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, lit}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    import graft.functions.SketchExprs
    val skBytes = Tables(spark, TestSpark.sf, "orders")
      .agg(expr("count_min_sketch(o_custkey, 0.001d, 0.99d, 7)"))
      .head().getAs[Array[Byte]](0)
    val keys = (1L to 50L).toSeq
    val interp = keys.map(k => SketchExprs.CmsEstimate(
      Literal(skBytes, BinaryType), Literal(k)).eval(null).asInstanceOf[Long])
    val lib = {
      val sk = org.apache.spark.util.sketch.CountMinSketch.readFrom(skBytes)
      keys.map(k => sk.estimateCount(java.lang.Long.valueOf(k)))
    }
    val gen = keys.toDF("k")
      .select(SketchExprs.cms_estimate(lit(skBytes), $"k"))
      .collect().map(_.getLong(0)).toSeq
    assert(gen == interp && gen == lib)
  }
}
