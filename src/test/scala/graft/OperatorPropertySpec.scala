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
}
