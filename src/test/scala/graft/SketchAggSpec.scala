package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExprs

/** MinHashSetAgg accuracy + lineage overhead budget. */
class SketchAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("MinHashSetAgg estimates group Jaccard within 0.15 of exact") {
    import spark.implicits._
    val tok = Tables(spark, sf, "documents")
      .select($"lang", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "").distinct()
    // sketch per language (k=256 → se ≈ 0.03)
    val sk = tok.groupBy($"lang")
      .agg(HashExprs.minhash_set_agg($"token", 256).as("sig"))
    val est = sk.select($"lang".as("lang_a"), $"sig".as("sig_a"))
      .crossJoin(sk.select($"lang".as("lang_b"), $"sig".as("sig_b")))
      .filter($"lang_a" < $"lang_b")
      .select($"lang_a", $"lang_b",
        HashExprs.minhash_est_jaccard($"sig_a", $"sig_b").as("est"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    // exact ground truth
    val exact = SparkEntry.queries("q46_group_jaccard")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getDouble(2))).toMap
    assert(exact.nonEmpty && est.keySet == exact.keySet)
    exact.foreach { case (pair, j) =>
      assert(math.abs(est(pair) - j) <= 0.15,
        s"$pair: est ${est(pair)} vs exact $j")
    }
  }

  test("MinHashSetAgg of identical sets yields identical signatures") {
    import spark.implicits._
    val a = Seq("x", "y", "z").toDF("v")
      .agg(HashExprs.minhash_set_agg($"v", 64)).collect().head.getSeq[Long](0)
    val b = Seq("z", "x", "y", "x").toDF("v") // order/multiplicity-insensitive
      .agg(HashExprs.minhash_set_agg($"v", 64)).collect().head.getSeq[Long](0)
    assert(a == b)
  }

  test("lineage extraction stays under the 50ms/query budget (BASELINE.md)") {
    val df = SparkEntry.queries("q19_multijoin_agg")(spark, sf)
    val qe = df.queryExecution
    graft.lineage.LineageExtractor.report(qe) // warm up
    val t0 = System.nanoTime()
    val rep = graft.lineage.LineageExtractor.report(qe)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(rep.columnLineage.nonEmpty)
    assert(ms < 50.0, f"lineage extraction took $ms%.1f ms")
  }
}
