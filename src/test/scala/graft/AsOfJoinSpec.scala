package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("tiny: latest right <= left time per key, inner semantics, tolerance") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, "c1"), (1L, 100L, "c2"), (1L, 150L, "c3"),
      (3L, 10L, "c4"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.join(l, r, ("k", "rk"), ("t", "rt"))
      .select($"tag", $"rtag").collect().map(x => (x.getString(0), x.getString(1)))
    // p1@100: c2@100 (<= inclusive, latest). p2@200: c3@150. p3: no key-2 row.
    assert(got.toSet == Set(("p1", "c2"), ("p2", "c3")))

    val tol = AsOf.join(l, r, ("k", "rk"), ("t", "rt"), toleranceUs = Some(30L))
      .select($"tag", $"rtag").collect().map(x => (x.getString(0), x.getString(1)))
    // p2@200 vs c3@150 is 50 > 30 → dropped
    assert(tol.toSet == Set(("p1", "c2")))
  }

  test("left-outer as-of keeps unmatched (and null-key/time) left rows") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(100L), "p1"), (Some(2L), Some(50L), "p2"),
      (None, Some(10L), "pNullKey"), (Some(1L), None, "pNullTime"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, "c1"), (3L, 10L, "c4")).toDF("rk", "rt", "rtag")
    val got = AsOf.join(l, r, ("k", "rk"), ("t", "rt"), outer = true)
      .select($"tag", $"rtag").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    // every left row survives; only p1 has a match; null key/time rows
    // never match (SQL comparison semantics) but are still kept
    assert(got == Set(("p1", Some("c1")), ("p2", None),
      ("pNullKey", None), ("pNullTime", None)))
    // inner mode on the same data keeps only the match
    val inner = AsOf.join(l, r, ("k", "rk"), ("t", "rt"))
      .select($"tag").collect().map(_.getString(0)).toSet
    assert(inner == Set("p1"))
  }

  test("left-outer interval join emits null-right for window-less left rows") {
    import spark.implicits._
    import graft.plans.Interval
    val l = Seq((1L, 100L, "p1"), (1L, 500L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, "c1"), (1L, 95L, "c2")).toDF("rk", "rt", "rtag")
    val got = Interval.join(l, r, ("k", "rk"), ("t", "rt"),
        windowUs = 50L, outer = true)
      .select($"tag", $"rtag").collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    // p1@100 window [50,100]: c1, c2. p2@500 window [450,500]: none.
    // p3 key 2: none. Both still appear under outer.
    assert(got == Set(("p1", Some("c1")), ("p1", Some("c2")),
      ("p2", None), ("p3", None)))
  }

  test("matches the union+window formulation on the events table") {
    import spark.implicits._
    val e = Tables(spark, sf, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"ts", $"event_type")
    // native
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
        unix_micros($"ts").as("p_us"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), unix_micros($"ts").as("c_us"))
    val native = AsOf.join(p, c, ("p_user", "c_user"), ("p_us", "c_us"))
      .select($"p_id", $"p_us", $"c_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // union+window reference formulation (q32)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ref = e.withColumn("kind", when($"event_type" === "click", 0).otherwise(1))
      .withColumn("click_ts", last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"kind" === 1 && $"click_ts".isNotNull)
      .select($"event_id", unix_micros($"ts"), unix_micros($"click_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == ref)
  }

  test("lineage flows through the custom node to source columns") {
    import spark.implicits._
    import graft.lineage.LineageExtractor
    val e = Tables(spark, sf, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), unix_micros($"ts").as("c_us"))
    val df = AsOf.join(p, c, ("user_id", "c_user"), ("p_us", "c_us"))
    val lin = LineageExtractor.columnLineage(df.queryExecution.analyzed)
    assert(lin("c_us").map(_.column) == Set("ts"))
    assert(lin("event_id").map(_.column) == Set("event_id"))
    val tree = LineageExtractor.fromLogical(df.queryExecution.analyzed).treeString
    assert(tree.contains("AsOfJoin"), tree)
  }

  test("interval join: window bounds inclusive, buffer resets across keys") {
    import spark.implicits._
    import graft.plans.Interval
    val l = Seq((1L, 1000L, "p1"), (1L, 1500L, "p2"), (2L, 1000L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 400L, "c1"), (1L, 500L, "c2"), (1L, 1000L, "c3"),
      (1L, 1400L, "c4"), (2L, 999L, "c5"))
      .toDF("rk", "rt", "rtag")
    val got = Interval.join(l, r, ("k", "rk"), ("t", "rt"), windowUs = 500L)
      .select($"tag", $"rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    // p1@1000 win [500,1000]: c2, c3. p2@1500 win [1000,1500]: c3, c4.
    // p3 key 2 @1000 win [500,1000]: c5 only (key-1 rows must not leak).
    assert(got == Set(("p1", "c2"), ("p1", "c3"),
      ("p2", "c3"), ("p2", "c4"), ("p3", "c5")))
  }

  test("interval join matches the equi-join + filter formulation on events") {
    import spark.implicits._
    import graft.plans.Interval
    val e = Tables(spark, sf, "events")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", unix_micros($"ts").as("p_us"))
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"),
        unix_micros($"ts").as("c_us"))
    val native = Interval.join(p, c, ("user_id", "c_user"), ("p_us", "c_us"),
        windowUs = 3600L * 1000000L)
      .select($"p_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ref = p.join(c, $"user_id" === $"c_user" &&
        $"c_us" >= $"p_us" - 3600L * 1000000L && $"c_us" <= $"p_us")
      .select($"p_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == ref && native.nonEmpty)
  }

  test("null keys and null times never match (SQL comparison semantics)") {
    import spark.implicits._
    import graft.plans.Interval
    // a null timestamp must NOT behave like epoch 0 on either side
    val l = Seq((Option(1L), Option(100L), "p1"), (Option(1L), None, "pNullT"),
      (Option.empty[Long], Option(100L), "pNullK")).toDF("k", "t", "tag")
    val r = Seq((Option(1L), Option(90L), "c1"), (Option(1L), None, "cNullT"),
      (Option.empty[Long], Option(80L), "cNullK")).toDF("rk", "rt", "rtag")
    val asOf = AsOf.join(l, r, ("k", "rk"), ("t", "rt"))
      .select($"tag", $"rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(asOf == Set(("p1", "c1")))
    val interval = Interval.join(l, r, ("k", "rk"), ("t", "rt"), windowUs = 50L)
      .select($"tag", $"rtag").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(interval == Set(("p1", "c1")))
  }

  test("string keys are rejected at construction (mutable UTF8String)") {
    import spark.implicits._
    import graft.plans.Interval
    val l = Seq(("a", 100L)).toDF("k", "t")
    val r = Seq(("a", 90L)).toDF("rk", "rt")
    val e1 = intercept[Exception] {
      AsOf.join(l, r, ("k", "rk"), ("t", "rt")).collect()
    }
    assert(e1.getMessage.contains("hash strings to a long"), e1.getMessage)
    val e2 = intercept[Exception] {
      Interval.join(l, r, ("k", "rk"), ("t", "rt"), windowUs = 10L).collect()
    }
    assert(e2.getMessage.contains("hash strings to a long"), e2.getMessage)
  }

  test("lineage renders the interval-join logical node with its window") {
    import spark.implicits._
    import graft.plans.Interval
    import graft.lineage.LineageExtractor
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 90L)).toDF("rk", "rt")
    val df = Interval.join(l, r, ("k", "rk"), ("t", "rt"), windowUs = 50L)
    val tree = LineageExtractor.fromLogical(df.queryExecution.analyzed).treeString
    assert(tree.contains("IntervalJoin") && tree.contains("window=50us"), tree)
  }

  test("physical plan is the custom exec over two sorted exchanges") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 90L)).toDF("rk", "rt")
    val df = AsOf.join(l, r, ("k", "rk"), ("t", "rt"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoinExec") || phys.contains("AsOfJoin"), phys)
  }
}
