package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("8").appName("graft-test")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has a unique name and runs non-empty at sf0.001") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    SparkEntry.registry.foreach { q =>
      val n = q.fn(spark, TestSpark.sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("bench and plan-audit headline names all resolve to registered queries") {
    // Bench filters headline through the registry, so a typo'd name is
    // SILENTLY dropped from the driver's numbers — guard statically
    val known = SparkEntry.queries.keySet
    val missing = (Bench.headline ++ PlanAudit.headline).filterNot(known)
    assert(missing.isEmpty, s"unknown headline entries: ${missing.mkString(", ")}")
  }

  test("bench floor parser: same-sf full names, -1 skipped, junk is empty") {
    val art = """{"metric":"total","value":9.9,"unit":"sec","reps":2,""" +
      """"queries":{"q01_scan_filter_project":0.55,"m09_binary_simhash_index":1.27,""" +
      """"q99_broken":-1},"errors":{},"flaky":{},"load":[0.5,0.7],""" +
      """"sf":"/root/testdata/sf0.1"}"""
    // matching sf: full-name floors, failed (-1) rows excluded
    assert(Bench.parseFloor(art, "/root/testdata/sf0.1") ==
      Map("q01_scan_filter_project" -> 0.55,
        "m09_binary_simhash_index" -> 1.27))
    // a floor from another scale factor is meaningless: empty
    assert(Bench.parseFloor(art, "/root/testdata/sf0.01").isEmpty)
    // malformed/truncated artifacts degrade to no floor, never a throw
    assert(Bench.parseFloor("""{"queries":""", "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parseFloor("", "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parseFloor(
      """{"sf":"/root/testdata/sf0.1","noqueries":1}""",
      "/root/testdata/sf0.1").isEmpty)
    // an artifact that stamped itself load_warn (ran under contention)
    // must never serve as a floor — its rows carry the machine's mood
    val loaded = art.replace(""","sf":""", ""","load_warn":true,"sf":""")
    assert(Bench.parseFloor(loaded, "/root/testdata/sf0.1").isEmpty)
    // ANCHORED guards (ADVICE r15): JSON-escaped content inside an
    // errors string still contains the raw searched substrings — the
    // guards must read the top-level tail, not the whole text.
    // (a) an error message embedding \"load_warn\":true must NOT
    //     disqualify an artifact whose own tail is clean
    val errEmbed = art.replace(""""errors":{}""",
      """"errors":{"q50":"plan said \"load_warn\":true somewhere"}""")
    assert(Bench.parseFloor(errEmbed, "/root/testdata/sf0.1").nonEmpty)
    // (b) an error message embedding the TARGET sf must not make an
    //     other-sf artifact pass the same-sf guard
    val sfEmbed = art
      .replace(""""errors":{}""",
        """"errors":{"q50":"read \"sf\":\"/root/testdata/sf0.1\" oops"}""")
      .replace(""""sf":"/root/testdata/sf0.1"}""",
        """"sf":"/root/testdata/sf1"}""")
    assert(Bench.parseFloor(sfEmbed, "/root/testdata/sf0.1").isEmpty)
    // (c) a pre-r14 artifact with no load evidence at all: contention
    //     unknowable, refused
    val noLoad = art.replace(""","load":[0.5,0.7]""", "")
    assert(Bench.parseFloor(noLoad, "/root/testdata/sf0.1").isEmpty)
  }

  test("monotone artifact rule: a noisier refresh never wins") {
    val sf = "/root/testdata/sf0.1"
    // 3-gate artifact, total 9.9s, l1 floor p10 1.5
    def art(l1: String, extra: String = "", total: String = "9.9") =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":2,""" +
        """"queries":{"q01_a":0.55,"q02_b":1.27,"q03_c":2.0},""" +
        s""""r1":[550,1270,2000],"r2":[560,1280,2010],""" +
        s""""ts1":[1,2,3],"ts2":[4,5,6],"l1":[$l1],"l2":[$l1],""" +
        s""""errors":{},"flaky":{},"load":[0.5,0.7]$extra,"sf":"$sf"}"""
    val settled = art("1.5,2.0,2.5")
    // same gates/sf, new run SLOWER (total 12.0 > 9.9): keep settled.
    // The decision statistic is the TOTAL, not the load floor — round
    // 17 measured a lower-p10 run totaling 31s slower (guest loadavg
    // cannot see host-level steal; the totals it inflates can)
    assert(Bench.keepExistingArtifact(settled, sf, 3, 12.0, 1.0,
      newWarn = false).isDefined)
    // equal total also keeps the settled run (no-gain churn)
    assert(Bench.keepExistingArtifact(settled, sf, 3, 9.9, 1.0,
      newWarn = false).isDefined)
    // strictly faster refresh wins, even with a higher load floor
    assert(Bench.keepExistingArtifact(settled, sf, 3, 8.0, 9.9,
      newWarn = false).isEmpty)
    // a load_warn-stamped NEW run never replaces a settled artifact,
    // even when (meaninglessly) faster
    assert(Bench.keepExistingArtifact(settled, sf, 3, 1.0, 1.0,
      newWarn = true).isDefined)
    // different gate count / different sf = a different measurement,
    // not a refresh: never blocked
    assert(Bench.keepExistingArtifact(settled, sf, 4, 99.0, 9.9,
      newWarn = false).isEmpty)
    assert(Bench.keepExistingArtifact(settled, "/root/testdata/sf0.01", 3,
      99.0, 9.9, newWarn = false).isEmpty)
    // an existing artifact that itself ran contended is disqualified as
    // a floor — any clean run replaces it, even a slower one
    val warned = art("2.6,2.7,2.8", extra = ""","load_warn":true""")
    assert(Bench.keepExistingArtifact(warned, sf, 3, 99.0, 9.9,
      newWarn = false).isEmpty)
    // a warn PAIR degrades monotonically by the same total rule: a
    // slower warn run never replaces a faster one, a faster one may
    assert(Bench.keepExistingArtifact(warned, sf, 3, 99.0, 9.9,
      newWarn = true).isDefined)
    assert(Bench.keepExistingArtifact(warned, sf, 3, 5.0, 9.9,
      newWarn = true).isEmpty)
    // junk / truncated / total-less existing files never block
    assert(Bench.keepExistingArtifact("", sf, 3, 1.0, 1.0,
      newWarn = false).isEmpty)
    assert(Bench.keepExistingArtifact("""{"queries":""", sf, 3, 1.0, 1.0,
      newWarn = false).isEmpty)
    // ---- fatal-error arbitration (ADVICE r17): totals sum only the
    // gates that SUCCEEDED, so error status must arbitrate like warn —
    // a deflated errored total must neither displace a clean artifact
    // nor entrench itself against clean refreshes.
    val errored = settled.replace(""""errors":{}""",
      """"errors":{"q03_c":"OOM: heap"}""")
    // (1) a new run with fatal errors NEVER overwrites a clean settled
    //     artifact, even with a (deflated) lower total
    assert(Bench.keepExistingArtifact(settled, sf, 3, 1.0, 1.0,
      newWarn = false, newErr = true).isDefined)
    // (2) an existing artifact carrying fatal errors is replaced by ANY
    //     clean run, even an honestly-slower one (its own total is
    //     deflated — it must not block clean refreshes forever)
    assert(Bench.keepExistingArtifact(errored, sf, 3, 99.0, 9.9,
      newWarn = false).isEmpty)
    // (3) an errored PAIR degrades monotonically by the same total rule
    assert(Bench.keepExistingArtifact(errored, sf, 3, 12.0, 1.0,
      newWarn = false, newErr = true).isDefined)
    assert(Bench.keepExistingArtifact(errored, sf, 3, 5.0, 9.9,
      newWarn = false, newErr = true).isEmpty)
    // (4) warn and error are the same defect class: a warn-stamped
    //     artifact vs an errored new run is a defective pair → total rule
    assert(Bench.keepExistingArtifact(warned, sf, 3, 12.0, 1.0,
      newWarn = false, newErr = true).isDefined)
    assert(Bench.keepExistingArtifact(warned, sf, 3, 5.0, 9.9,
      newWarn = false, newErr = true).isEmpty)
    // an errors string embedding "l1":[ must not shadow the real column:
    // the parse takes the FIRST occurrence, which precedes errors (the
    // artifact is errored, so pair it with an errored new run to keep
    // the comparison on the total path)
    val errEmbed = settled.replace(""""errors":{}""",
      """"errors":{"q50":"saw \"l1\":[9.9] in a log"}""")
    assert(Bench.keepExistingArtifact(errEmbed, sf, 3, 12.0, 1.0,
      newWarn = false, newErr = true).isDefined)
    // and an escaped "errors":{} spelled INSIDE an error string cannot
    // read as clean: the probe takes the FIRST (real, top-level) key
    val errNested = settled.replace(""""errors":{}""",
      """"errors":{"q50":"log said \"errors\":{} upstream"}""")
    assert(Bench.keepExistingArtifact(errNested, sf, 3, 99.0, 9.9,
      newWarn = false).isEmpty)
  }

  test("oracle column names match spark output column names") {
    // The driver sorts columns by name before hashing — a name mismatch
    // fails the gate even with identical values. Cheap static guard: every
    // oracled query's Spark schema fields appear in its SQL text.
    SparkEntry.registry.filter(_.oracle.isDefined).foreach { q =>
      val cols = q.fn(spark, TestSpark.sf).schema.fieldNames
      val sql = q.oracle.get.toLowerCase
      cols.foreach { c =>
        assert(sql.contains(c.toLowerCase),
          s"${q.name}: output column '$c' not mentioned in oracle SQL")
      }
    }
  }

  test("q02 aggregate values are exact at sf0.001") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q02_agg_pricing")(spark, TestSpark.sf)
    val row = df.filter(col("l_returnflag") === "A").collect().head
    val n = row.getAs[Long]("n")
    assert(n > 0)
    // avg consistency: sum_qty / n ≈ avg_qty
    val sumQty = row.getAs[Double]("sum_qty")
    val avgQty = row.getAs[Double]("avg_qty")
    assert(math.abs(sumQty / n - avgQty) < 1e-2)
  }

  test("q32 as-of join semantics: click_ts <= purchase_ts") {
    val df = SparkEntry.queries("q32_asof_join")(spark, TestSpark.sf)
    val bad = df.filter(df("c_us") > df("p_us")).count()
    assert(bad == 0)
  }
}
