package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Hand-computable fixtures for the time-series operators (q109/q110 pin
  * the full events-table profiles against DuckDB).
  */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resampleHourlyFill densifies gaps and carries the last value") {
    // key A observes 10:00 (v=1.0) and 13:00 (v=7.0): hours 11 and 12
    // must appear, filled, carrying 1.0
    val ev = Seq(
      ("A", "2024-01-01 10:15:00", 1.0),
      ("A", "2024-01-01 13:40:00", 7.0),
      ("B", "2024-01-01 09:05:00", 2.0)
    ).toDF("k", "ts_s", "value").withColumn("ts", $"ts_s".cast("timestamp"))
    val out = TimeSeries.resampleHourlyFill(ev, "k", "ts", sum($"value"))
      .orderBy($"key", $"hr")
      .select($"key", date_format($"hr", "HH").as("h"), $"v", $"n_events", $"filled")
      .as[(String, String, Double, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      ("A", "10", 1.0, 1L, false),
      ("A", "11", 1.0, 0L, true),
      ("A", "12", 1.0, 0L, true),
      ("A", "13", 7.0, 1L, false),
      ("B", "09", 2.0, 1L, false)))
  }

  test("single-observation key yields exactly one unfilled row") {
    val ev = Seq(("X", "2024-06-01 00:30:00", 4.0))
      .toDF("k", "ts_s", "value").withColumn("ts", $"ts_s".cast("timestamp"))
    val out = TimeSeries.resampleHourlyFill(ev, "k", "ts", sum($"value")).collect()
    assert(out.length == 1 && !out.head.getAs[Boolean]("filled"))
  }

  test("madOutliers: Hampel fence flags the far point, not the bulk") {
    // med=3, deviations {2,1,0,1,97} -> mad=1, fence=3*1.4826 -> only 100
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)).toDF("grp", "v")
    val r = TimeSeries.madOutliers(df, "grp", "v").collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("med") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("madOutliers: a constant group has mad 0 and every point inside") {
    val df = Seq(5.0, 5.0, 5.0).map(("c", _)).toDF("grp", "v")
    val r = TimeSeries.madOutliers(df, "grp", "v").collect().head
    assert(r.getAs[Double]("mad") == 0.0)
    // |x - med| = 0 is NOT > 0 -> no outliers even with a zero fence
    assert(r.getAs[Long]("n_outliers") == 0L)
  }

  test("ewmaDailyVolume: halving weights, gap-adjusted normalization, alerts") {
    import org.apache.spark.sql.functions._
    // day 1: 4 events, day 2: 8, day 4: 2 (day 3 missing). window=2:
    //   d1: ewma = 4 (only itself)
    //   d2: (8 + 0.5*4) / 1.5 = 6.6667
    //   d4: day 3 absent and day 2 out of window -> ewma = 2 (itself)
    // every weight is 2^-lag, so values are EXACT — equality, no eps
    def day(d: Int, n: Int) = (1 to n).map(_ => s"2024-03-0$d 12:00:00")
    val events = (day(1, 4) ++ day(2, 8) ++ day(4, 2))
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    val got = TimeSeries.ewmaDailyVolume(events, "ts",
        window = 2, alertRatio = 0.15)
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 4L, 4.0, 1.0, false),
      // 8/6.6667 = 1.2 -> ratio above the 0.15 band -> alert
      ("2024-03-02", 8L, 6.6667, 1.2, true),
      ("2024-03-04", 2L, 2.0, 1.0, false)), got.mkString(","))
  }

  test("cusum: prefix-sum closed form matches the hand recursion; alarms fire") {
    import spark.implicits._
    def days(ns: Int*) = ns.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(_ => f"2024-03-${i + 1}%02d 12:00:00")
    }.toDF("s").select(col("s").cast("timestamp").as("ts"))
    // counts 10,10,100,100: mu=55, k=60.5e6 micro; dev -50.5, -50.5,
    // +39.5, +39.5 (e6); prefix -50.5, -101, -61.5, -22; inclusive
    // runmin -50.5, -101, -101, -101 -> S = 0, 0, 39.5e6, 79e6 —
    // exactly max(0, S+dev) unrolled by hand
    val got = TimeSeries.cusumDailyVolume(days(10, 10, 100, 100), "ts",
        slack = 0.1, hDays = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // h = 0.5·mu = 27.5e6: both step days alarm
    assert(got.toSeq == Seq(
      (10L, 0L, false), (10L, 0L, false),
      (100L, 39500000L, true), (100L, 79000000L, true)), got.mkString(","))
    // a generous threshold silences the alarm, values unchanged
    val quiet = TimeSeries.cusumDailyVolume(days(10, 10, 100, 100), "ts",
        slack = 0.1, hDays = 3.0)
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(quiet.map(_._1).toSeq == got.map(_._2).toSeq)
    assert(quiet.forall(!_._2))
    intercept[IllegalArgumentException] {
      TimeSeries.cusumDailyVolume(days(1), "ts", slack = -0.1)
    }
  }

  test("theilSen: hand medians odd and even, outlier day barely moves the slope") {
    import spark.implicits._
    def days(ns: Int*) = ns.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(_ => f"2024-03-${i + 1}%02d 12:00:00")
    }.toDF("s").select(col("s").cast("timestamp").as("ts"))
    // counts 1,3,4 -> slopes 2/1, 3/2, 1/1 -> lower median (m=3, rn=2)
    // is the exact fraction 3/2
    val odd = TimeSeries.theilSenDailyTrend(days(1, 3, 4), "ts")
      .as[(Long, Long, Long, Double)].collect().head
    assert(odd == ((3L, 3L, 2L, 1.5)), odd.toString)
    // counts 1,2,4,8 -> 6 slopes {1, 1.5, 2, 7/3, 3, 4}; lower median
    // (m=6, rn=3) is 2/1
    val even = TimeSeries.theilSenDailyTrend(days(1, 2, 4, 8), "ts")
      .as[(Long, Long, Long, Double)].collect().head
    assert(even == ((6L, 2L, 1L, 2.0)), even.toString)
    // linear growth 10/day with one wild spike day: the median stays on
    // the clean trend (least squares would be dragged far off)
    val robust = TimeSeries.theilSenDailyTrend(
      days(10, 20, 30, 40, 1000), "ts")
      .as[(Long, Long, Long, Double)].collect().head
    assert(robust._4 == 10.0, robust.toString)
  }

  test("cusumSeries: frozen reference mean, alarms on the shifted series, " +
      "empty reference null") {
    import spark.implicits._
    def series(ns: (String, Long)*) = ns.toDF("d", "n")
    // reference mean 10 (days 10, 10); monitored 10, 25, 25:
    // slack 0 -> k = 10e6; dev = 0, +15e6, +15e6; prefix 0, 15, 30 (e6);
    // runmin 0 -> S = 0, 15e6, 30e6; h = 1 mean-day = 10e6: day 2 and 3
    // alarm — exactly the hand recursion max(0, S+dev)
    val ref = series("r1" -> 10L, "r2" -> 10L)
    val mon = series("m1" -> 10L, "m2" -> 25L, "m3" -> 25L)
    val got = TimeSeries.cusumSeries(mon, col("d"), col("n"),
        ref, col("n"), slack = 0.0, hDays = 1.0)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("m1", 10L, 0L, false),
      ("m2", 25L, 15000000L, true), ("m3", 25L, 30000000L, true)),
      got.toString)
    // a quiet monitored series never accumulates (S floors at 0)
    val quiet = TimeSeries.cusumSeries(series("m1" -> 9L, "m2" -> 8L),
        col("d"), col("n"), ref, col("n"), slack = 0.0, hDays = 1.0)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(quiet.forall(r => r._3 == 0L && !r._4), quiet.toString)
    // an empty reference has no mean: null scores, never an invented one
    val none = TimeSeries.cusumSeries(mon, col("d"), col("n"),
        ref.limit(0), col("n"), slack = 0.0, hDays = 1.0)
      .as[(String, Long, Option[Long], Option[Boolean])].collect().toSeq
    assert(none.forall(r => r._3.isEmpty && r._4.isEmpty), none.toString)
  }

  test("mannKendall: hand S with ties, all-tied null, strong trend " +
      "flagged, continuity correction") {
    import spark.implicits._
    def days(ns: Int*) = ns.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(_ => f"2024-03-${i + 1}%02d 12:00:00")
    }.toDF("s").select(col("s").cast("timestamp").as("ts"))
    def run(df: org.apache.spark.sql.DataFrame) = TimeSeries
      .mannKendallDailyTrend(df, "ts")
      .as[(Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    def z6(num: Long, var18: Long): Double =
      BigDecimal(num.toDouble / math.sqrt(var18.toDouble / 18.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1,2,2,3: S = 5 (one tied pair contributes 0); tie group t=2
    // subtracts 2·1·9 = 18 from n(n−1)(2n+5) = 156 -> var18 = 138;
    // continuity-corrected z = (5−1)/√(138/18)
    val tied = run(days(1, 2, 2, 3))
    assert(tied == ((4L, 5L, 138L, Some(z6(4, 138)), Some(false))),
      tied.toString)
    // 10 strictly increasing days: S = 45, var18 = 2250,
    // z = 44/√125 = 3.93548 -> significant
    val strong = run(days(1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
    assert(strong == ((10L, 45L, 2250L, Some(z6(44, 2250)), Some(true))),
      strong.toString)
    assert(strong._4 == Some(3.93548))
    // all days tied: Var = 0 -> null, never NaN
    val flat = run(days(5, 5, 5))
    assert(flat._2 == 0L && flat._3 == 0L && flat._4.isEmpty &&
      flat._5.isEmpty, flat.toString)
    // a single day has no pairs
    assert(run(days(7))._4.isEmpty)
  }

  test("acf: hand lags on an alternating series, constant null, " +
      "short-series lags drop, guard") {
    import spark.implicits._
    def days(ns: Int*) = ns.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(_ => f"2024-03-${i + 1}%02d 12:00:00")
    }.toDF("s").select(col("s").cast("timestamp").as("ts"))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    // x = 1,3,1,3,1,3: n=6, S=12, Sxx=30 -> den·n² = 36·30 − 6·144 = 216
    // k=1: sxy=15, st=11, sh=9 -> num = 540 − 1440 + 720 = −180
    // k=2: sxy=20, st=sh=8   -> num = 720 − 1152 + 576 = 144
    val got = run(TimeSeries.acfDailyVolume(days(1, 3, 1, 3, 1, 3), "ts",
      maxLag = 2))
    assert(got == Seq(
      (1L, 5L, -180L, 216L, Some(-0.833333)),
      (2L, 4L, 144L, 216L, Some(0.666667))), got.toString)
    // constant series: den = 0, r null at every lag
    val flat = run(TimeSeries.acfDailyVolume(days(5, 5, 5), "ts", maxLag = 2))
    assert(flat.forall(r => r._4 == 0L && r._5.isEmpty), flat.toString)
    // lags past the series length have no pairs and drop out
    val short = run(TimeSeries.acfDailyVolume(days(1, 2, 3), "ts", maxLag = 5))
    assert(short.map(_._1) == Seq(1L, 2L), short.toString)
    intercept[IllegalArgumentException] {
      TimeSeries.acfDailyVolume(days(1), "ts", maxLag = 0)
    }
  }
}
