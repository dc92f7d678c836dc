package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomExprs

/** Bloom sketch guarantees: zero false negatives, OR-mergeability
  * (map-side partials must compose exactly), a bounded false-positive
  * rate at the advertised sizing, and the q92 pruning claim (the probe
  * passes a small superset of the true matches). */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def buildBloom(keys: Seq[Long], bits: Int, hashes: Int): Array[Byte] = {
    import spark.implicits._
    keys.toDF("k")
      .agg(BloomExprs.bloom_agg(xxhash64($"k"), bits, hashes).as("bf"))
      .collect().head.getAs[Array[Byte]]("bf")
  }

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val keys = (0L until 5000L).map(_ * 7919L)
    val bf = buildBloom(keys, 1 << 16, 5)
    val misses = keys.toDF("k")
      .select(BloomExprs.bloom_might_contain(lit(bf),
        xxhash64($"k")).as("hit"))
      .filter(!$"hit").count()
    assert(misses == 0L)
  }

  test("false-positive rate at ~13 bits/key stays under 1%") {
    import spark.implicits._
    val inserted = (0L until 5000L).map(_ * 7919L)
    val bf = buildBloom(inserted, 1 << 16, 5)
    // probe a disjoint key range
    val probes = 20000
    val fp = (0 until probes).map(i => 1000000000L + i).toDF("k")
      .select(BloomExprs.bloom_might_contain(lit(bf),
        xxhash64($"k")).as("hit"))
      .filter($"hit").count()
    assert(fp.toDouble / probes < 0.01, s"FPP ${fp.toDouble / probes}")
  }

  test("merge is exact union: bloom(A ++ B) == bloom(A) OR bloom(B)") {
    import spark.implicits._
    val a = (0L until 1000L).map(_ * 3L)
    val b = (0L until 1000L).map(_ * 5L + 1L)
    val whole = buildBloom(a ++ b, 1 << 12, 4)
    val pa = buildBloom(a, 1 << 12, 4)
    val pb = buildBloom(b, 1 << 12, 4)
    // header (numHashes, numWords) identical, then bitwise OR of words
    val ored = pa.clone()
    (8 until ored.length).foreach(i => ored(i) = (pa(i) | pb(i)).toByte)
    assert(java.util.Arrays.equals(whole, ored))
  }

  test("q92 shape: bloom pre-filter passes a small superset of true matches") {
    import spark.implicits._
    val hot = Tables(spark, sf, "orders").filter($"o_totalprice" > 400000)
    val bf = hot.agg(
      BloomExprs.bloom_agg(xxhash64($"o_orderkey"), 1 << 20, 5).as("bf"))
      .scalar()
    val li = Tables(spark, sf, "lineitem").select($"l_orderkey")
    val total = li.count()
    val pruned = li
      .filter(BloomExprs.bloom_might_contain(bf, xxhash64($"l_orderkey")))
      .count()
    val exact = li.join(hot.select($"o_orderkey"),
      $"l_orderkey" === $"o_orderkey", "left_semi").count()
    // superset of the truth, but far below the unpruned scan: the whole
    // point is dropping fact rows before the join shuffle
    assert(pruned >= exact, s"false negatives: $pruned < $exact")
    assert(pruned <= exact + math.max(64L, total / 50),
      s"pruning too weak: $pruned vs exact $exact of $total")
    assert(pruned < total / 2, s"no pruning: $pruned of $total")
  }

  test("bloom_might_contain stays inside whole-stage codegen") {
    import spark.implicits._
    val bf = buildBloom(Seq(1L, 2L, 3L), 1 << 10, 3)
    val df = spark.range(100).toDF("k")
      .filter(BloomExprs.bloom_might_contain(lit(bf), xxhash64($"k")))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage; the Filter carrying the probe must be inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter bloom_might_contain") && l.trim.startsWith("+- *(")), plan)
    df.count() // and it executes
  }

  test("SQL registration: bloom_agg / bloom_might_contain callable from SQL") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      """WITH bf AS (
        |  SELECT bloom_agg(xxhash64(o_orderkey), 1048576, 5) AS b
        |  FROM orders WHERE o_totalprice > 400000)
        |SELECT count(*) AS n FROM lineitem, bf
        |WHERE bloom_might_contain(b, xxhash64(l_orderkey))""".stripMargin)
      .collect().head.getLong(0)
    assert(n > 0)
  }
}
