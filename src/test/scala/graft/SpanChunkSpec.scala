package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextOps}

/** Edge-case semantics of the duplicated-span statistics (d11) and
  * sliding-window chunking (t19) operators on crafted inputs; the gate
  * queries check corpus-scale parity vs DuckDB.
  */
class SpanChunkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def words(n: Int, tag: String = "w"): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("spanDupStats: shared window counts as duplicated in BOTH docs") {
    val shared = words(20, "s")
    val d = docs(
      1L -> (shared + " " + words(20, "a")), // windows: shared, a
      2L -> (shared + " " + words(20, "b")), // windows: shared, b
      3L -> words(20, "c"))                  // unique single window
    val out = Dedup.spanDupStats(d, "doc_id", "text", window = 20)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 0L)))
    assert(out.head.getDouble(3) == 0.5)
  }

  test("spanDupStats: docs under one window are excluded; tails dropped") {
    val d = docs(1L -> words(19), 2L -> words(39, "x"))
    val out = Dedup.spanDupStats(d, "doc_id", "text", window = 20).collect()
    // doc 1 has no full window; doc 2's trailing 19 tokens are not a segment
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)))
  }

  test("spanDupStats: within-doc repeat is NOT cross-doc duplication") {
    val rep = words(20, "r")
    val out = Dedup.spanDupStats(docs(1L -> (rep + " " + rep)),
      "doc_id", "text", window = 20).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 0L)))
  }

  test("spanScrub: removes shared windows everywhere, keeps tails") {
    val shared = words(20, "s")
    val d = docs(
      1L -> (shared + " " + words(20, "a") + " tail1 tail2"),
      2L -> (shared + " " + words(20, "b")),
      3L -> words(5, "t"))
    val out = Dedup.spanScrub(d, "doc_id", "text", window = 20)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(
        (1L, 1L, words(20, "a") + " tail1 tail2"), // shared gone, tail kept
        (2L, 1L, words(20, "b")),
        (3L, 0L, words(5, "t")))) // sub-window doc passes through
  }

  test("spanScrub: fully-duplicated doc with no tail yields null text") {
    val shared = words(20, "s")
    val out = Dedup.spanScrub(docs(1L -> shared, 2L -> shared),
      "doc_id", "text", window = 20).orderBy("doc_id").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 1L)
      assert(r.isNullAt(2))
    }
  }

  test("spanScrub: within-doc repeats survive (cross-doc only)") {
    val rep = words(20, "r")
    val out = Dedup.spanScrub(docs(1L -> (rep + " " + rep)),
      "doc_id", "text", window = 20).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 0L, rep + " " + rep)))
  }

  test("chunk: boundary counts and final-chunk coverage") {
    val d = docs(1L -> words(64), 2L -> words(65), 3L -> words(112),
      4L -> words(113), 5L -> "", 6L -> words(1))
    val out = TextOps.chunk(d, "doc_id", "text", chunkSize = 64, stride = 48)
    val byDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
        max(col("tok_start") + col("chunk_len") - 1).as("last_tok"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // n <= 64 -> 1 chunk; 65 -> 2; 112 = 64+48 -> 2; 113 -> 3; empty -> none
    assert(byDoc.toSeq == Seq((1L, 1L, 64L), (2L, 2L, 65L), (3L, 2L, 112L),
      (4L, 3L, 113L), (6L, 1L, 1L)))
  }

  test("chunk: consecutive windows overlap by chunkSize - stride tokens") {
    val out = TextOps.chunk(docs(1L -> words(200)), "doc_id", "text", 64, 48)
      .orderBy("chunk_id").collect()
    val starts = out.map(_.getLong(2))
    assert(starts.toSeq == Seq(1L, 49L, 97L, 145L))
    // every token covered: next start <= previous end + 1
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) <= a.getLong(2) + a.getLong(3))
    case _ => ()
    }
  }
}
