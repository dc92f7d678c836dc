package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}

/** Property tests for the span/chunk operators: random token counts and
  * window/stride parameters ⇒ structural invariants hold. Raw scalacheck
  * generators with deterministic seeds (no scalatest bridge offline).
  */
class SpanChunkPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def doc(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")

  private val genCase: Gen[(Int, Int, Int)] = for {
    n <- Gen.choose(0, 300)
    c <- Gen.choose(1, 80)
    s <- Gen.choose(1, 80).map(math.min(_, 80)).suchThat(_ >= 1)
  } yield (n, c, math.min(s, c)) // stride <= chunkSize (operator contract)

  test("chunk: full coverage, correct count, bounded lengths (random cases)") {
    import spark.implicits._
    val params = Gen.listOfN(40, genCase)
      .apply(Gen.Parameters.default, Seed(7L)).get
    params.foreach { case (n, c, s) =>
      val out = TextOps.chunk(
          Seq((1L, doc(n))).toDF("doc_id", "text"), "doc_id", "text", c, s)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val expected =
        if (n == 0) 0 else if (n <= c) 1 else 1 + ((n - c) + s - 1) / s
      assert(out.length == expected, s"n=$n c=$c s=$s -> ${out.length}")
      out.zipWithIndex.foreach { case ((id, start, len), i) =>
        assert(id == i)
        assert(start == i.toLong * s + 1)
        assert(len >= 1 && len <= c)
      }
      if (n > 0) {
        // the last chunk ends exactly at the last token; consecutive
        // chunks leave no gap
        assert(out.last._2 + out.last._3 - 1 == n, s"n=$n c=$c s=$s")
        out.sliding(2).foreach {
          case Array(a, b) => assert(b._2 <= a._2 + a._3)
          case _ => ()
        }
      }
    }
  }

  test("spanDupStats: segment counts and self-consistency (random sizes)") {
    import spark.implicits._
    val ns = Gen.listOfN(20, Gen.choose(0, 200))
      .apply(Gen.Parameters.default, Seed(11L)).get
    val w = 20
    val df = ns.zipWithIndex
      .map { case (n, i) => (i.toLong, doc(n)) }.toDF("doc_id", "text")
    val out = Dedup.spanDupStats(df, "doc_id", "text", w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    // docs below one window are absent; others have floor(n/w) segments
    val expected = ns.zipWithIndex.collect {
      case (n, i) if n >= w => (i.toLong, (n / w).toLong)
    }
    assert(out.map(r => (r._1, r._2)) == expected)
    out.foreach { case (_, nSeg, dup, frac) =>
      assert(dup >= 0 && dup <= nSeg)
      assert(math.abs(frac - dup.toDouble / nSeg) < 1e-6)
    }
    // all docs here are distinct token streams EXCEPT doc pairs whose
    // windows coincide: w0..w19 prefixes repeat across docs of length
    // >= 20, so the first window of every qualifying doc IS duplicated
    // when two or more such docs exist
    if (expected.size >= 2) assert(out.forall(_._3 >= 1))
  }
}
