package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, GraphOps, IterativeLoop, TextOps}

/** The [[graft.operators.IterativeLoop]] caching contract, pinned as a
  * regression gate for the round-9 leak: connectedComponents left its
  * final-round + self-loop localCheckpoint blocks referenced by a lazy
  * result plan, `catalog.clearCache()` could not free them (CacheManager
  * never sees RDD-level checkpoint blocks), and four consecutive CC
  * bench reps degraded monotonically. Every iterative operator must now
  * return a SELF-CONTAINED checkpoint and hold ZERO other blocks.
  */
class IterativeLoopSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Persistent RDD ids currently registered with the context —
    * includes localCheckpoint block sets, which is the whole point. */
  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Run `op`, assert it holds no blocks beyond its (released) result,
    * and hand the result back for semantic checks. The result must stay
    * usable BEFORE the sweep (self-contained checkpoint), and the sweep
    * must return the context to the pre-call block census. */
  private def assertSelfContained[A](op: => (DataFrame, A)): (DataFrame, A) = {
    Caches.sweep(spark)
    val before = persistentIds
    val (out, extra) = op
    // the ONLY surviving blocks may be the result's own checkpoint RDDs
    val own = org.apache.spark.sql.graftbridge.Bridge.checkpointRdds(out)
      .map(_.id).toSet
    val leaked = persistentIds -- before -- own
    assert(leaked.isEmpty,
      s"operator left ${leaked.size} non-result persistent RDDs: $leaked")
    // result is readable without any of the loop's inputs
    assert(out.count() >= 0)
    (out, extra)
  }

  private val ccEdges =
    Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 7L)).toDF("id_a", "id_b")

  test("connectedComponents returns a self-contained checkpoint, zero loop blocks") {
    val (labels, _) = assertSelfContained {
      (Dedup.connectedComponents(ccEdges), ())
    }
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
    Caches.sweep(spark)
    assert(persistentIds.isEmpty, "sweep must free the result's blocks too")
  }

  test("consecutive connectedComponents runs hold no residue (the d06/d07 bench shape)") {
    Caches.sweep(spark)
    val census = persistentIds
    (1 to 3).foreach { _ =>
      Dedup.connectedComponents(ccEdges).count()
      Caches.sweep(spark) // what Bench/Verify now do between reps
      assert(persistentIds == census, "rep left persistent RDDs behind")
    }
  }

  test("pageRank / personalizedPageRank / labelPropagation / bfsDistances release all loop blocks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    assertSelfContained((GraphOps.pageRank(edges, "src", "dst", 12), ()))
    assertSelfContained(
      (GraphOps.personalizedPageRank(edges, "src", "dst", seeds, "id", 12), ()))
    assertSelfContained((GraphOps.labelPropagation(edges, "src", "dst", 12), ()))
    assertSelfContained(
      (GraphOps.bfsDistances(edges, "src", "dst", seeds, "id", 3), ()))
    assertSelfContained((GraphOps.kCore(edges, "src", "dst", k = 2), ()))
  }

  test("bpeTrain releases every per-iteration histogram checkpoint") {
    Caches.sweep(spark)
    val before = persistentIds
    val docs = Seq("aaab aaab ab", "aaab ab ab").toDF("text")
    val merges = TextOps.bpeTrain(docs, "text", nMerges = 4, minCount = 1L)
    assert(merges.count() >= 1)
    // merge table is driver-side rows: NOTHING may survive the call
    assert(persistentIds == before,
      s"bpeTrain leaked: ${persistentIds -- before}")
  }

  test("advanceSummed: the sum rides the materializing action, None on empty, " +
      "blocks release like advance") {
    Caches.sweep(spark)
    val loop = new IterativeLoop()
    val (s1, t1) = loop.advanceSummed(
      spark.range(5).select(col("id").as("v")), "v")
    assert(t1.contains(10L)) // 0+1+2+3+4
    assert(s1.count() == 5L) // state is materialized and readable
    // empty next state: None, not a throw and not Some(0)
    val (s2, t2) = loop.advanceSummed(s1.filter(col("v") < 0L), "v")
    assert(t2.isEmpty && s2.count() == 0L)
    loop.abort()
    assert(persistentIds.isEmpty, "advanceSummed state must release on abort")
  }

  test("abort releases pinned and advanced state; handoff transfers only the result") {
    Caches.sweep(spark)
    val loop = new IterativeLoop(checkpointEvery = 2)
    loop.pin(Seq(1, 2, 3).toDF("x"))
    val s1 = loop.advance(Seq(4).toDF("x"))           // round 1: persist
    val (s2, n2) = loop.advanceCounted(s1.select((col("x") + 1).as("x"))) // round 2: checkpoint
    assert(n2 == 1L)
    val out = loop.handoff()
    assert(out.as[Int].collect().sameElements(Array(5)))
    // only the handed-off checkpoint may remain
    val own = org.apache.spark.sql.graftbridge.Bridge.checkpointRdds(out)
      .map(_.id).toSet
    assert((persistentIds -- own).isEmpty, s"held: ${persistentIds -- own}")
    Caches.sweep(spark)
    assert(persistentIds.isEmpty)

    val loop2 = new IterativeLoop()
    loop2.pin(Seq(1).toDF("x"))
    loop2.advance(Seq(2).toDF("x"))
    loop2.abort()
    assert(persistentIds.isEmpty, "abort must release everything")
    loop2.abort() // idempotent
    intercept[IllegalArgumentException](loop2.advance(Seq(3).toDF("x")))
  }
}
