package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sequences

/** Funnel-matching edge semantics (q104 pins the full events-table run
  * against the correlated-min oracle).
  */
class SequencesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("click", "view", "purchase")

  private def depths(rows: Seq[(Long, Long, String)]): Map[Long, Int] =
    Sequences.funnelDepth(rows.toDF("user_id", "us", "event_type"),
      "user_id", "us", "event_type", steps)
      .as[(Long, Int)].collect().toMap

  test("a step on the SAME timestamp as the previous match does not count") {
    val d = depths(Seq(
      (1L, 100L, "click"), (1L, 100L, "view"), // view ties click: rejected
      (1L, 200L, "view"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 200L, "click"))) // view before click: no chain
    assert(d(1L) == 3)
    assert(d(2L) == 1) // click matched, no view strictly after it
  }

  test("keys with no relevant events still report depth 0") {
    val d = depths(Seq((1L, 100L, "click"), (3L, 100L, "other")))
    assert(d == Map(1L -> 1, 3L -> 0))
  }

  test("greedy first-match picks the earliest viable chain") {
    // a LATER click would allow view@150 to match, but the chain is
    // anchored at the FIRST click (min-ts semantics, same as the oracle)
    val d = depths(Seq(
      (1L, 100L, "click"), (1L, 150L, "view"), (1L, 200L, "click")))
    assert(d(1L) == 2)
  }
}
