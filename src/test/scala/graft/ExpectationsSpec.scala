package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Expectations

/** Data-quality audit semantics (gate q107 pins the lineitem/orders
  * audit against DuckDB; this spec pins null handling, the fused-pass
  * uniqueness count, orphan counting, and the one-distinct-group guard).
  */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("audit counts violations per check with nulls as violations") {
    val df = Seq(
      (Some(1.0), Some("A")), (Some(9.0), Some("X")),
      (None, Some("N")), (Some(2.0), None))
      .toDF("v", "f")
    val got = rows(Expectations.audit(df, Seq(
      Expectations.inRange("range", "v", 0.0, 5.0),
      Expectations.inSet("set", "f", Seq("A", "N")),
      Expectations.notNull("nn", "v"))))
    assert(got("range") == ((2L, 4L))) // 9.0 out of range, null
    assert(got("set") == ((2L, 4L)))   // "X", null
    assert(got("nn") == ((1L, 4L)))
  }

  test("uniqueness rides the same pass and counts surplus rows") {
    val df = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val got = rows(Expectations.audit(df, Nil, Seq(("uniq", "k"))))
    assert(got("uniq") == ((2L, 5L))) // 5 rows, 3 distinct
  }

  test("audit rejects a second exact unique column") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Expectations.audit(df, Nil, Seq(("ua", "a"), ("ub", "b")))
    }
    assert(e.getMessage.contains("unique column"))
  }

  test("fkOrphans counts unmatched children once despite parent dups") {
    val child = Seq(1L, 2L, 2L, 9L).toDF("ck")
    val parent = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("pk", "attr")
    val got = rows(Expectations.fkOrphans("fk", child, "ck", parent, "pk"))
    // parent key 1 appears twice but must not multiply child rows
    assert(got("fk") == ((1L, 4L)))
  }
}
