package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphOps, Mutations}

/** Property tests for the mutation/graph operators against brute-force
  * Scala reference implementations on random small inputs — the same
  * raw-scalacheck + deterministic-seed setup as LineagePropertySpec
  * (the scalatest bridge artifact isn't in the offline cache). The
  * DuckDB gates prove one corpus-sized instance each; these prove the
  * SEMANTICS across many adversarial shapes (empty batches, all-delete
  * batches, disconnected graphs, nested cliques).
  */
class OperatorPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- mergeInto vs the clause-by-clause reference semantics ----

  private case class Rowv(k: Long, tag: String, v: Double)

  private val genTarget: Gen[List[Rowv]] = for {
    keys <- Gen.someOf(0L to 20L)
    rows <- Gen.sequence[List[Rowv], Rowv](keys.toList.map(k => for {
      tag <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 100).map(_.toDouble)
    } yield Rowv(k, tag, v)))
  } yield rows

  private val genBatch: Gen[List[Rowv]] = for {
    keys <- Gen.someOf(0L to 30L)
    rows <- Gen.sequence[List[Rowv], Rowv](keys.toList.map(k => for {
      tag <- Gen.oneOf("DEL", "x", "y") // DEL = delete marker
      v <- Gen.choose(0, 100).map(_.toDouble)
    } yield Rowv(k, tag, v)))
  } yield rows

  test("mergeInto equals the clause-by-clause reference on random cases") {
    import spark.implicits._
    for (seed <- 1L to 25L) {
      val target = sample(genTarget, seed)
      val batch = sample(genBatch, seed + 1000)
      val tMap = target.map(r => r.k -> r).toMap
      val bMap = batch.map(r => r.k -> r).toMap
      val expected: Set[(Long, String, Double)] =
        (tMap.flatMap { case (k, t) =>
          bMap.get(k) match {
            case Some(b) if b.tag == "DEL" => None // matched delete
            case Some(b) => Some((k, b.tag, t.v + b.v)) // update: v accumulates
            case None => Some((k, t.tag, t.v)) // untouched
          }
        } ++ bMap.collect { // inserts; unmatched DEL is a no-op
          case (k, b) if !tMap.contains(k) && b.tag != "DEL" => (k, b.tag, b.v)
        }).toSet
      val got = Mutations.mergeInto(
          target.map(r => (r.k, r.tag, r.v)).toDF("k", "tag", "v"),
          batch.map(r => (r.k, r.tag, r.v)).toDF("k", "tag", "v"), "k",
          deleteWhen = col("_b_tag") === "DEL",
          updateSet = Map("v" -> (col("v") + col("_b_v")),
            "tag" -> col("_b_tag")))
        .as[(Long, String, Double)].collect().toSet
      assert(got == expected,
        s"seed=$seed target=$target batch=$batch:\n got $got\n exp $expected")
    }
  }

  // ---- coreness vs brute-force peeling ----

  private def corenessRef(edges: Set[(Long, Long)], kMax: Int): Map[Long, Long] = {
    def canon(e: Set[(Long, Long)]) = e.collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }
    def nodesOf(e: Set[(Long, Long)]) = e.flatMap(p => Set(p._1, p._2))
    var cur = canon(edges)
    var result = nodesOf(cur).map(_ -> 1L).toMap
    for (k <- 2 to kMax) {
      var changed = true
      while (changed) {
        val deg = cur.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (n, l) => n -> l.size }
        val keep = deg.filter(_._2 >= k).keySet
        val next = cur.filter(p => keep(p._1) && keep(p._2))
        changed = next.size != cur.size
        cur = next
      }
      result ++= nodesOf(cur).map(_ -> k.toLong).toMap // survivors upgrade
    }
    result
  }

  // ---- topPaths vs a direct per-key reference ----

  private val genEvents: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(5, 40)
    rows <- Gen.sequence[List[(Long, Long, String)], (Long, Long, String)](
      (1 to n).toList.map(_ => for {
        u <- Gen.choose(1L, 5L)
        ts <- Gen.choose(1L, 5L) // deliberate ts collisions -> id tiebreak
        t <- Gen.oneOf("a", "b", "c")
      } yield (u, ts, t)))
  } yield rows.zipWithIndex.map { case ((u, ts, t), i) =>
    (u, ts, 1000L + i, t) // unique event ids
  }

  test("topPaths equals the per-key sort/take/concat reference on random cases") {
    import spark.implicits._
    for (seed <- 1L to 15L) {
      val events = sample(genEvents, seed * 13)
      val maxSteps = 1 + (seed % 4).toInt
      val expected = events.groupBy(_._1).values
        .map(_.sortBy(e => (e._2, e._3)).take(maxSteps).map(_._4)
          .mkString(" > "))
        .groupBy(identity).map { case (p, l) => (p, l.size.toLong) }
        .toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
      val got = graft.operators.Sequences.topPaths(
          events.toDF("user_id", "ts", "event_id", "event_type"),
          "user_id", "event_type", Seq("ts", "event_id"),
          maxSteps = maxSteps, k = 10)
        .as[(String, Long)].collect().toSeq
      assert(got == expected,
        s"seed=$seed maxSteps=$maxSteps events=$events:\n got $got\n exp $expected")
    }
  }

  // ---- ewmaDailyVolume vs a direct per-day reference (exact dyadic
  //      weights mean the reference's sum order cannot matter) ----

  test("ewmaDailyVolume equals the per-day reference on random gapped series") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val dayCounts = sample(for {
        days <- Gen.someOf(1 to 15)
        cs <- Gen.sequence[List[Int], Int](
          days.toList.map(_ => Gen.choose(1, 30)))
      } yield days.toList.zip(cs), seed * 31).filter(_._2 > 0)
      if (dayCounts.nonEmpty) {
        val window = 1 + (seed % 5).toInt
        val events = dayCounts.flatMap { case (day, n) =>
          Seq.fill(n)(f"2024-01-$day%02d 06:00:00")
        }.toDF("s").select(col("s").cast("timestamp").as("ts"))
        val cMap = dayCounts.toMap
        val expected = dayCounts.map { case (day, n) =>
          val terms = (0 until window).flatMap(lag =>
            cMap.get(day - lag).map(h => (h, lag)))
          val num = terms.map { case (h, lag) => h * math.pow(0.5, lag) }.sum
          val den = terms.map { case (_, lag) => math.pow(0.5, lag) }.sum
          val e = num / den
          (f"2024-01-$day%02d",
            math.rint(e * 10000) / 10000, math.rint(n / e * 10000) / 10000)
        }.sortBy(_._1)
        val got = graft.operators.TimeSeries
          .ewmaDailyVolume(events, "ts", window = window, alertRatio = 0.5)
          .orderBy(col("d")).collect()
          .map(r => (r.getDate(0).toString, r.getDouble(2), r.getDouble(3)))
          .toSeq
        assert(got == expected,
          s"seed=$seed window=$window counts=$dayCounts:\n got $got\n exp $expected")
        Caches.sweep(spark)
      }
    }
  }

  private val genGraph: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(2, 10)
    density <- Gen.choose(1, 4)
    edges <- Gen.listOfN(n * density,
      Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
  } yield edges.toSet

  test("coreness equals brute-force peeling on random graphs") {
    import spark.implicits._
    for (seed <- 1L to 6L) {
      val edges = sample(genGraph, seed * 7)
      val clean = edges.filter { case (a, b) => a != b }
      if (clean.nonEmpty) {
        val expected = corenessRef(edges, kMax = 3)
        val got = GraphOps.coreness(
            clean.toSeq.toDF("src", "dst"), "src", "dst", kMax = 3)
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"seed=$seed edges=$clean:\n got $got\n exp $expected")
        Caches.sweep(spark)
      }
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  // ---- editDistanceJoin vs brute-force all-pairs levenshtein ----

  private def editDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("editDistanceJoin equals brute force (small alphabet, short/empty strings)") {
    import spark.implicits._
    import graft.operators.Dedup
    // 3-letter alphabet, lengths 0..12: dense near-pairs, heavy
    // insert/delete shifts, and strings below the segment floor
    // (len < d+1 = 3, incl. empty) — the short-path guarantee and the
    // ±d probe-shift bound are the parts a happy corpus never tests
    val genStr = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    for (seed <- 1L to 4L) {
      val strs = sample(Gen.listOfN(30, genStr), seed * 13).zipWithIndex
        .map { case (s, i) => (i.toLong, s) }
      val got = Dedup.editDistanceJoin(
          strs.toDF("rid", "nm"), "rid", "nm", maxDist = 2)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        d = editDist(sa, sb) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      assert(got == want,
        s"seed=$seed\n false pos: ${got.diff(want)}\n MISSED: ${want.diff(got)}")
      spark.catalog.clearCache()
    }
  }
}
