package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, StringSim}

/** Jaro-Winkler: known values, DuckDB-compatible edge semantics, and
  * SQL-registration; corpus-scale value parity is the q93 gate.
  */
class StringSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jw(a: String, b: String): Double =
    StringSim.jaroWinklerEval(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("textbook values") {
    // classic worked examples (Winkler 1990 and common test vectors)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
  }

  test("edge semantics match DuckDB: empties similar to nothing") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0) // no matches at all
  }

  test("prefix boost applies only above the 0.7 jaro threshold") {
    // transposed tail keeps a common prefix: boosted
    val boosted = jw("prefixab", "prefixba")
    // raw jaro for the same pair
    val l = 8.0
    val m = 8.0; val t = 1.0
    val jaro = (m / l + m / l + (m - t) / m) / 3.0
    assert(math.abs(boosted - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("column API and SQL registration agree with direct eval") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
    val viaCol = df.select(StringSim.jaro_winkler($"a", $"b")).collect().head.getDouble(0)
    df.createOrReplaceTempView("jwt")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jwt")
      .collect().head.getDouble(0)
    assert(viaCol == jw("MARTHA", "MARHTA"))
    assert(viaSql == viaCol)
  }

  test("nfc_normalize: composes combining sequences, passes composed text through") {
    import spark.implicits._
    val composed = "caf\u00e9"
    val df = Seq(
      (1L, "cafe\u0301"),            // e + combining acute -> e-acute
      (2L, composed),                 // already composed - identical out
      (3L, "Zu\u0308rich ascii"),    // combining diaeresis mid-string
      (4L, "plain ascii")).toDF("id", "s")
    val got = df.select($"id", StringSim.nfc_normalize($"s").as("n"),
        length(StringSim.nfc_normalize($"s")).as("l"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(got(1L) == ((composed, 4)))
    assert(got(2L) == ((composed, 4)))
    assert(got(3L) == (("Z\u00fcrich ascii", 12)))
    assert(got(4L) == (("plain ascii", 11)))
    // interpreted eval agrees with the codegen'd path
    assert(StringSim.nfcEval(
      org.apache.spark.unsafe.types.UTF8String.fromString("cafe\u0301"))
      .toString == composed)
    // null-safe
    assert(Seq(Tuple1[String](null)).toDF("s")
      .select(StringSim.nfc_normalize($"s")).collect().head.isNullAt(0))
  }
}
