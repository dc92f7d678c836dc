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

  test("volumeAnomalies: spike day flagged, uniform feed yields null z") {
    import spark.implicits._
    def day(d: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + i, f"2024-02-$d%02d 12:00:0${i % 10}"))
    // 4 quiet days + one 5x spike: the single outlier among k=5 points
    // is CAPPED at z = sqrt(k-1) = 2.0 — exactly the threshold, not
    // past it (the classic bounded-z property; a tiny window cannot
    // produce extreme z no matter how wild the spike)
    val ev = (day(1, 10, 0) ++ day(2, 10, 100) ++ day(3, 10, 200) ++
        day(4, 10, 300) ++ day(5, 50, 400))
      .toDF("event_id", "tss")
      .select($"event_id", $"tss".cast("timestamp").as("ts"))
    val got = Expectations.volumeAnomalies(ev, "ts")
      .collect().map(r => (r.getDate(0).toString,
        (r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2),
          r.getBoolean(3)))).toMap
    // mean 18, var (4*64 + 1024)/5 = 256, sigma 16: quiet z = -0.5,
    // spike z = 2.0 — NOT flagged at the strict > 2.0 threshold
    assert(got("2024-02-05") == ((50L, 2.0, false)), got.toString)
    assert(got("2024-02-01") == ((10L, -0.5, false)))
    // 9 quiet days + one 10x spike: z = 3.0, flagged — and ONLY it
    val ev2 = ((1 to 9).flatMap(d => day(d, 10, d * 100L)) ++
        day(10, 100, 1000))
      .toDF("event_id", "tss")
      .select($"event_id", $"tss".cast("timestamp").as("ts"))
    val flagged = Expectations.volumeAnomalies(ev2, "ts")
      .filter($"is_anomaly").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(2))).toSeq
    assert(flagged == Seq(("2024-02-10", 3.0)), flagged.toString)
    // uniform feed: sigma = 0 -> z null everywhere, nothing flagged
    val flat = Expectations.volumeAnomalies(
      (day(1, 10, 0) ++ day(2, 10, 100)).toDF("event_id", "tss")
        .select($"event_id", $"tss".cast("timestamp").as("ts")), "ts")
      .collect()
    assert(flat.forall(r => r.isNullAt(2) && !r.getBoolean(3)))
  }

  test("psiDrift: hand-computed contributions, one-sided flags, identity = 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val p = Seq(1L, 1L, 1L, 2L).toDF("v")
    val q = Seq(1L, 2L, 2L, 2L, 3L).toDF("v")
    val got = Expectations.psiDrift(p, q, col("v"))
      .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    def contrib(np: Long, tp: Long, nq: Long, tq: Long): Long = {
      val ps = np.toDouble / tp.toDouble
      val qs = nq.toDouble / tq.toDouble
      val lnq = math.round(math.log(ps / qs) * 1e6).toDouble / 1e6
      math.round((ps - qs) * lnq * 1e9)
    }
    val c1 = contrib(3, 4, 1, 5) // bucket 1: p-share .75 vs q-share .2
    val c2 = contrib(1, 4, 3, 5) // bucket 2: .25 vs .6
    val tot = c1 + c2            // bucket 3 is one-sided: contributes 0
    assert(got == Seq(
      (1L, 3L, 1L, false, c1, tot),
      (2L, 1L, 3L, false, c2, tot),
      (3L, 0L, 1L, true, 0L, tot)), got.toString)
    // both contributions are positive (divergence in either direction)
    assert(c1 > 0 && c2 > 0)
    // identical snapshots: every contribution and the total are exactly 0
    val same = Expectations.psiDrift(p, p, col("v"))
      .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    assert(same.forall(r => r._5 == 0L && r._6 == 0L && !r._4), same.toString)
  }

  test("twoProportionZ: hand z with pinned sign, degenerate null, group-count guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // cohort 0: 1/4 convert; cohort 1: 3/4 convert
    val df = Seq((0L, true), (0L, false), (0L, false), (0L, false),
      (1L, true), (1L, true), (1L, true), (1L, false)).toDF("g", "ok")
    val got = Expectations.twoProportionZ(df, col("g"), col("ok"))
      .as[(Long, Long, Long, Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    val z = BigDecimal((0.25 - 0.75) /
        math.sqrt(0.5 * 0.5 * (1.0 / 4 + 1.0 / 4)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((0L, 4L, 1L, 1L, 4L, 3L, Some(z), Some(false))),
      got.toString)
    assert(z == -1.414214)
    // zero conversions anywhere: zero pooled variance -> null, not NaN
    val none = Expectations.twoProportionZ(
        df.withColumn("ok", lit(false)), col("g"), col("ok"))
      .as[(Long, Long, Long, Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    assert(none._7.isEmpty && none._8.isEmpty, none.toString)
    val e = intercept[IllegalArgumentException] {
      Expectations.twoProportionZ(df.withColumn("g", col("g") % 1),
        col("g"), col("ok"))
    }
    assert(e.getMessage.contains("exactly 2 non-null groups"))
  }

  test("ksTest: integer D on hand CDFs, identical samples give 0, empty side null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // p = {1,2,3,4}, q = {3,4,5,6}: CDF gap peaks at v=2 (cp=2, cq=0)
    // -> d_num = |2·4 − 0·4| = 8, D = 0.5
    val p = Seq(1L, 2L, 3L, 4L).toDF("v")
    val q = Seq(3L, 4L, 5L, 6L).toDF("v")
    val got = Expectations.ksTest(p, q, col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Boolean])].collect().head
    assert(got._1 == 4L && got._2 == 4L && got._3 == 8L &&
      got._4 == Some(0.5), got.toString)
    // critical value at n=4,4: 1.358·√(8/16) ≈ 0.96 > 0.5 -> not sig.
    assert(got._5 == Some(false), got.toString)
    // identical samples: D exactly 0
    val same = Expectations.ksTest(p, p, col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Boolean])].collect().head
    assert(same._3 == 0L && same._4 == Some(0.0) && same._5 == Some(false))
    // an empty side has no CDF: null, never NaN
    val none = Expectations.ksTest(p, p.limit(0), col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Boolean])].collect().head
    assert(none._2 == 0L && none._4.isEmpty && none._5.isEmpty, none.toString)
  }

  test("chiSquare: hand 2x2, absent combos still charged, degenerate null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def rows(spec: (String, Long, Int)*) = spec.flatMap { case (r, c, k) =>
      Seq.fill(k)((r, c))
    }.toDF("r", "c")
    // balanced 2x2 with a ±5 swing off E=15 everywhere:
    // chi2 = 4·25/15 = 6.666667, V = sqrt(chi2/60)
    val df = rows(("a", 0L, 10), ("a", 1L, 20), ("b", 0L, 20), ("b", 1L, 10))
    val got = Expectations.chiSquareIndependence(df, col("r"), col("c"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Double], Option[Double])]
      .collect().head
    val cellNano = math.round((10.0 - 15.0) * (10.0 - 15.0) / 15.0 * 1e9)
    val expectV = BigDecimal(math.sqrt(4 * cellNano / 1e9 / 60.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((60L, 2L, 2L, 1L, Some(4 * cellNano),
      Some(6.666667), Some(expectV))), got.toString)
    // an absent (b, 1) combo still contributes its E: the grid is
    // generated from the margins, not from present cells
    val sparse = rows(("a", 0L, 2), ("a", 1L, 1), ("b", 0L, 1))
    val s2 = Expectations.chiSquareIndependence(sparse, col("r"), col("c"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Double], Option[Double])]
      .collect().head
    def nano(o: Double, e: Double): Long =
      math.round((o - e) * (o - e) / e * 1e9)
    val expect = nano(2, 3.0 * 3 / 4) + nano(1, 3.0 * 1 / 4) +
      nano(1, 1.0 * 3 / 4) + nano(0, 1.0 * 1 / 4)
    assert(s2._5 == Some(expect), s2.toString)
    // one column level: dof 0, null statistics
    val degen = rows(("a", 0L, 3), ("b", 0L, 2))
    val d2 = Expectations.chiSquareIndependence(degen, col("r"), col("c"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Double], Option[Double])]
      .collect().head
    assert(d2._4 == 0L && d2._5.isEmpty && d2._6.isEmpty && d2._7.isEmpty)
  }

  test("null handling: chi2/ks/psi/twoProportionZ ignore null keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // chiSquare: null levels in either column are excluded up front, so
    // the statistic over a null-polluted frame equals the clean frame's
    val clean = Seq(("a", Some(0L)), ("a", Some(1L)), ("a", Some(1L)),
      ("b", Some(0L)), ("b", Some(0L)), ("b", Some(1L))).toDF("r", "c")
    val dirty = clean.union(Seq((null: String, Some(0L)), ("a", None),
      (null: String, None)).toDF("r", "c"))
    val want = Expectations.chiSquareIndependence(clean, col("r"), col("c"))
      .collect().toSeq
    val got = Expectations.chiSquareIndependence(dirty, col("r"), col("c"))
      .collect().toSeq
    assert(got == want, s"$got vs $want")
    // ksTest: null values never enter either CDF
    val p = Seq(Some(1L), Some(2L), None).toDF("v")
    val q = Seq(Some(1L), Some(2L), None, None).toDF("v")
    val ks = Expectations.ksTest(p, q, col("v"))
      .as[(Long, Long, Long, Option[Double], Option[Boolean])].collect().head
    assert(ks._1 == 2L && ks._2 == 2L && ks._3 == 0L && ks._4 == Some(0.0))
    // psiDrift: null buckets are dropped, not split into two one-sided rows
    val psi = Expectations.psiDrift(p, q, col("v"))
      .as[(Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    assert(psi == Seq((1L, 1L, 1L, false, 0L, 0L),
      (2L, 1L, 1L, false, 0L, 0L)), psi.toString)
    // twoProportionZ: a null group key is rejected by the 2-group guard
    // instead of silently dropping out of the self-pair
    val nullGrp = Seq((Some(0L), true), (Some(0L), false),
      (None: Option[Long], true), (None: Option[Long], false)).toDF("g", "ok")
    val e = intercept[IllegalArgumentException] {
      Expectations.twoProportionZ(nullGrp, col("g"), col("ok"))
    }
    assert(e.getMessage.contains("exactly 2 non-null groups"))
  }

  test("welchTTest: hand t and df, degenerate nulls, null keys excluded, guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A = {1,2,3} (var 1), B = {2,4,6,8} (var 20/3):
    // qa = 1/3, qb = 5/3, t = (2-5)/sqrt(2), df = 4/(1/18 + 25/27)
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 4L), (1L, 6L), (1L, 8L)).toDF("g", "v")
    val got = Expectations.welchTTest(df, col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Boolean])].collect().head
    // replicate the exact float chain (moments -> variances -> t, df)
    val qa = (14.0 - 6.0 * 6.0 / 3.0) / (3.0 - 1.0) / 3.0
    val qb = (120.0 - 20.0 * 20.0 / 4.0) / (4.0 - 1.0) / 4.0
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t = r((6.0 / 3.0 - 20.0 / 4.0) / math.sqrt(qa + qb), 6)
    val dfW = r((qa + qb) * (qa + qb) /
      (qa * qa / (3.0 - 1.0) + qb * qb / (4.0 - 1.0)), 4)
    assert(got == ((0L, 3L, 1L, 4L, Some(t), Some(dfW), Some(true))),
      got.toString)
    assert(t == -2.12132 && dfW == 4.0755, s"$t $dfW")
    // null group keys and null values are excluded, not miscounted
    val dirty = df.union(Seq((0L, 9L)).toDF("g", "v")
        .select(lit(null).cast("long").as("g"), col("v")))
      .union(Seq((0L, 9L)).toDF("g", "v")
        .select(col("g"), lit(null).cast("long").as("v")))
    val d2 = Expectations.welchTTest(dirty, col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Boolean])].collect().head
    assert(d2 == got, s"$d2 vs $got")
    // a single-member group has no sample variance: null stats, not NaN
    val small = Seq((0L, 5L), (1L, 2L), (1L, 4L)).toDF("g", "v")
    val s2 = Expectations.welchTTest(small, col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Boolean])].collect().head
    assert(s2._5.isEmpty && s2._6.isEmpty && s2._7.isEmpty, s2.toString)
    // two zero-variance groups: no t either
    val flat = Seq((0L, 5L), (0L, 5L), (1L, 7L), (1L, 7L)).toDF("g", "v")
    val f2 = Expectations.welchTTest(flat, col("g"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Boolean])].collect().head
    assert(f2._5.isEmpty && f2._6.isEmpty && f2._7.isEmpty, f2.toString)
    val e = intercept[IllegalArgumentException] {
      Expectations.welchTTest(df.withColumn("g", col("g") % 1),
        col("g"), col("v"))
    }
    assert(e.getMessage.contains("exactly 2 non-null groups"))
  }

  test("mutualInformation: independence 0, perfect dependence ln2/NMI 1, " +
      "degenerate null, nulls excluded") {
    import org.apache.spark.sql.functions._
    def rows(spec: (String, Long, Int)*) = spec.flatMap { case (x, y, k) =>
      Seq.fill(k)((x, y))
    }.toDF("x", "y")
    def one(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Long, Long, Double, Long, Long, Option[Double])]
      .collect().head
    // independent 2x2: every ratio is exactly 1, MI exactly 0, NMI 0
    val ind = rows(("a", 0L, 10), ("a", 1L, 10), ("b", 0L, 10), ("b", 1L, 10))
    val gi = one(Expectations.mutualInformation(ind, col("x"), col("y")))
    assert(gi._4 == 0L && gi._5 == 0.0 && gi._8 == Some(0.0), gi.toString)
    // perfectly dependent 2x2: MI = H(X) = H(Y) = ln 2 (quantized), NMI 1
    val dep = rows(("a", 0L, 10), ("b", 1L, 10))
    val gd = one(Expectations.mutualInformation(dep, col("x"), col("y")))
    val ln2q = math.round(math.log(2.0) * 1e6) / 1e6 // 0.693147
    val cell = math.round(0.5 * ln2q * 1e9)          // one cell's nano-nats
    assert(gd == ((20L, 2L, 2L, 2 * cell, 0.693147, 2 * cell, 2 * cell,
      Some(1.0))), gd.toString)
    // single-level X: MI 0, H(X) 0 -> NMI null, never NaN
    val degen = rows(("a", 0L, 5), ("a", 1L, 5))
    val gg = one(Expectations.mutualInformation(degen, col("x"), col("y")))
    assert(gg._4 == 0L && gg._6 == 0L && gg._8.isEmpty, gg.toString)
    // null categories are excluded up front: n counts only complete rows
    val withNull = Seq((Some("a"), Some(0L)), (Some("b"), Some(1L)),
      (None, Some(0L)), (Some("a"), None)).toDF("x", "y")
    val gn = one(Expectations.mutualInformation(withNull, col("x"), col("y")))
    assert(gn._1 == 2L, gn.toString)
  }

  test("kruskalWallis: hand H tie-free and tied, all-tied null, " +
      "single-group null, significance") {
    import org.apache.spark.sql.functions._
    def run(rows: Seq[(String, Long)], crit: Double = 12.592) =
      Expectations.kruskalWallis(rows.toDF("g", "v"), col("g"), col("v"),
          crit)
        .as[(Long, Long, Option[Double], Option[Double], Option[Boolean])]
        .collect().head
    // a={1,2}, b={3,4}: H = 12/20·(9/2+49/2) − 15 = 2.4; no ties
    val plain = run(Seq("a" -> 1L, "a" -> 2L, "b" -> 3L, "b" -> 4L))
    assert(plain == ((4L, 2L, Some(2.4), Some(2.4), Some(false))),
      plain.toString)
    // a={1,1}, b={2}: midranks make H = 1.5; C = 1 − 6/24 -> H' = 2.0
    val tied = run(Seq("a" -> 1L, "a" -> 1L, "b" -> 2L))
    assert(tied == ((3L, 2L, Some(1.5), Some(2.0), Some(false))),
      tied.toString)
    // every value identical: C = 0 -> corrected stat null, never NaN
    val flat = run(Seq("a" -> 5L, "a" -> 5L, "b" -> 5L))
    assert(flat._3 == Some(0.0) && flat._4.isEmpty && flat._5.isEmpty,
      flat.toString)
    // one group: nothing to compare
    assert(run(Seq("a" -> 1L, "a" -> 2L))._3.isEmpty)
    // a tiny critical value flips significance on the same data
    assert(run(Seq("a" -> 1L, "a" -> 2L, "b" -> 3L, "b" -> 4L),
      crit = 1.0)._5 == Some(true))
  }

  test("fdCheck: holding and violated FDs, null rhs invisible, null lhs " +
      "groups, guard") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")),   // 1 -> {a}: holds
      (Some(2L), Some("a")), (Some(2L), Some("b")),   // 2 -> {a,b}: bad
      (Some(3L), Some("c")), (Some(3L), None),        // null rhs invisible
      (None, Some("d")), (None, Some("d")))           // null lhs one group
      .toDF("k", "v")
    val got = Expectations.fdCheck(df, Seq(("k->v", "k", "v")))
      .as[(String, Long, Long, Boolean)].collect().head
    assert(got == (("k->v", 4L, 1L, false)), got.toString)
    // a true dependency holds with zero violations
    val ok = Expectations.fdCheck(df.filter(col("k") =!= 2L),
        Seq(("k->v", "k", "v")))
      .as[(String, Long, Long, Boolean)].collect().head
    assert(ok == (("k->v", 2L, 0L, true)), ok.toString)
    intercept[IllegalArgumentException] {
      Expectations.fdCheck(df, Seq.empty)
    }
  }

  test("gini: uniform 0, maximal (n-1)/n, tie invariance, zero/empty " +
      "null, negative rejected") {
    import org.apache.spark.sql.functions._
    def run(vals: Seq[Long]) = graft.operators.ColumnStats
      .gini(vals.toDF("v"), col("v"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    // perfectly even mass: G exactly 0
    assert(run(Seq(5L, 5L, 5L, 5L)) == ((4L, 20L, 0L, 80L, Some(0.0))))
    // one row holds everything: G = (n-1)/n = 0.75
    assert(run(Seq(0L, 0L, 0L, 12L)) == ((4L, 12L, 36L, 48L, Some(0.75))))
    // ties commute: histogram-grain rank mass equals the sorted per-row
    // sum (1+4+6+12 = 23) -> num 6, den 32
    assert(run(Seq(1L, 2L, 2L, 3L)) == ((4L, 8L, 6L, 32L, Some(0.1875))))
    // all-zero mass and empty input have no concentration to measure
    assert(run(Seq(0L, 0L))._5.isEmpty)
    assert(run(Seq.empty[Long])._5.isEmpty)
    // negative measures are undefined — loud, not silently wrong
    val e = intercept[Exception] { run(Seq(-1L, 5L)) }
    assert(e.getMessage.contains("negative"), e.getMessage)
  }

  test("benford: digit extraction from cents, absent digits charged, " +
      "empty null, fabricated feed flagged") {
    import org.apache.spark.sql.functions._
    def run(vals: Seq[Double]) = Expectations
      .benfordTest(vals.toDF("v"), col("v"))
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Boolean])]
      .collect().toSeq
    def pMicro(d: Int): Long = math.round(math.log10((d + 1.0) / d) * 1e6)
    def nano(o: Long, n: Long, d: Int): Long = {
      val e = n.toDouble * (pMicro(d).toDouble / 1e6)
      math.round((o - e) * (o - e) / e * 1e9)
    }
    // digit = first char of integer CENTS: 123.45->1, 0.05->5, 950->9;
    // 0.004 rounds to 0 cents and is excluded with the negative
    val got = run(Seq(123.45, 0.05, 950.0, 0.004, -8.0))
    assert(got.map(r => r._1 -> r._2).toMap ==
      (1L to 9L).map(d => d -> (if (Set(1L, 5L, 9L)(d)) 1L else 0L)).toMap,
      got.toString)
    // all nine digits present; absent digits still charge their E
    val expected = (1 to 9).map(d =>
      nano(if (Set(1, 5, 9)(d)) 1L else 0L, 3L, d)).sum
    assert(got.head._5 == Some(expected), s"${got.head._5} vs $expected")
    // no scoreable value: 9 rows, null statistics
    val empty = run(Seq(-1.0, 0.0))
    assert(empty.size == 9 && empty.forall(r =>
      r._2 == 0L && r._5.isEmpty && r._6.isEmpty), empty.toString)
    // a fabricated all-9s feed flunks at dof-8/5%
    val fake = run(Seq.fill(100)(900.0))
    assert(fake.forall(_._6 == Some(true)), fake.toString)
    // an exactly-Benford-shaped small sample is NOT flagged
    val shape = (1 to 9).flatMap(d =>
      Seq.fill(math.round(math.log10((d + 1.0) / d) * 100).toInt)(
        d * 100.0))
    val ok = run(shape)
    assert(ok.forall(_._6 == Some(false)), ok.toString)
  }

  test("psiDriftSeries: per-group PSI vs one reference, proportional group = 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ref histogram {1:1, 2:3}; day A drifts {1:3, 2:1}; day B is ref
    // scaled 2x {1:2, 2:6} -> identical shares, PSI exactly 0; day C
    // has a ref-absent bucket 9 (one-sided) next to a matched bucket
    val counts = Seq(
      ("a", 1L, 3L), ("a", 2L, 1L),
      ("b", 1L, 2L), ("b", 2L, 6L),
      ("c", 1L, 4L), ("c", 9L, 4L)).toDF("g", "b", "n")
    val ref = Seq((1L, 1L), (2L, 3L)).toDF("b", "n")
    val got = Expectations.psiDriftSeries(counts, col("g"), col("b"),
        col("n"), ref, col("b"), col("n"))
      .orderBy(col("grp"))
      .as[(String, Long, Long, Long)].collect().toSeq
    def contrib(np: Long, tp: Long, nq: Long, tq: Long): Long = {
      val ps = np.toDouble / tp.toDouble
      val qs = nq.toDouble / tq.toDouble
      val lnq = math.round(math.log(ps / qs) * 1e6).toDouble / 1e6
      math.round((ps - qs) * lnq * 1e9)
    }
    val psiA = contrib(3, 4, 1, 4) + contrib(1, 4, 3, 4)
    // day C: matched bucket 1 carries ALL the group's share (4/8 vs
    // 1/4); buckets 2 (ref-only) and 9 (cur-only) are one-sided
    val psiC = contrib(4, 8, 1, 4)
    assert(got == Seq(
      ("a", 2L, 0L, psiA),
      ("b", 2L, 0L, 0L),
      ("c", 3L, 2L, psiC)), got.toString)
    assert(psiA > 0L)
  }
}
