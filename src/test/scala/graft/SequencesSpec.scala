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

  test("transitionMatrix: counts adjacent pairs per user, rows sum to 1") {
    // user 1: a->b->a->b (a->b x2, b->a x1); user 2: a->a (a->a x1)
    val ev = Seq(
      (1L, 10L, 100L, "a"), (1L, 11L, 200L, "b"),
      (1L, 12L, 300L, "a"), (1L, 13L, 400L, "b"),
      (2L, 20L, 100L, "a"), (2L, 21L, 200L, "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sequences.transitionMatrix(ev, "user_id", "event_type",
        Seq("ts", "event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", "b")) == ((2L, 0.6667)))
    assert(got(("a", "a")) == ((1L, 0.3333)))
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got.size == 3)
    // same-ts events order by the id tie-break: (ts 100, id 1) then
    // (ts 100, id 2) -> exactly one x->y pair, deterministically
    val tie = Seq((5L, 1L, 100L, "x"), (5L, 2L, 100L, "y"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val t = Sequences.transitionMatrix(tie, "user_id", "event_type",
        Seq("ts", "event_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(t == Seq(("x", "y")))
  }

  test("topPaths: prefix cap, short sequences, count-then-path ordering") {
    // users 1,2 share the opening a>b; user 3 has only one event; user 4
    // has 3 events but maxSteps=2 caps the path at a>c; a same-ts pair
    // for user 2 orders by event_id (a before b)
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "z"),
      (2L, 4L, 10L, "a"), (2L, 5L, 10L, "b"), // tie on ts -> id order
      (3L, 6L, 10L, "solo"),
      (4L, 7L, 10L, "a"), (4L, 8L, 20L, "c"), (4L, 9L, 30L, "d")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = Sequences.topPaths(ev, "user_id", "event_type",
        Seq("ts", "event_id"), maxSteps = 2, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("a > b", 2L),   // users 1 and 2 (user 1 capped at 2 steps)
      ("a > c", 1L),   // user 4 capped
      ("solo", 1L)),   // shorter-than-cap path kept
      got.toString)
  }

  test("touchAttribution: last vs first credit, non-channel skipped, " +
      "(none) bucket, exclusive same-ts frame, exact cents") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      // user 1: view -> click -> two purchases; the intervening
      // purchase is never a touch, so BOTH credit last=click first=view
      (1L, "2024-01-01 10:00:00", 10L, "view", 0.0),
      (1L, "2024-01-01 10:01:00", 11L, "click", 0.0),
      (1L, "2024-01-01 10:02:00", 12L, "purchase", 10.0),
      (1L, "2024-01-01 10:03:00", 13L, "purchase", 5.5),
      // user 2: purchase with no preceding anything -> (none)
      (2L, "2024-01-01 11:00:00", 20L, "purchase", 2.0),
      // user 3: error is NOT a channel; signup takes both credits
      (3L, "2024-01-01 12:00:00", 30L, "signup", 0.0),
      (3L, "2024-01-01 12:01:00", 31L, "error", 0.0),
      (3L, "2024-01-01 12:02:00", 32L, "purchase", 1.0),
      // user 4: view shares the purchase's TIMESTAMP but sorts after it
      // on the tie column -> the exclusive frame leaves it unattributed
      (4L, "2024-01-01 13:00:00", 40L, "purchase", 7.0),
      (4L, "2024-01-01 13:00:00", 41L, "view", 0.0))
      .toDF("user_id", "tss", "event_id", "event_type", "value")
      .select($"user_id", $"tss".cast("timestamp").as("ts"), $"event_id",
        $"event_type", $"value")
    val got = Sequences.touchAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("view", "click", "signup"), "value")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("(none)", 2L, 2L, 9.0),
      ("click", 2L, 0L, 15.5),
      ("signup", 1L, 1L, 1.0),
      ("view", 0L, 2L, 0.0)), got.toString)
    intercept[IllegalArgumentException] {
      Sequences.touchAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq.empty, "value")
    }
  }
}
