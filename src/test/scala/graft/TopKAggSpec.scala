package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("keeps the k best, higher score first, ties to the smaller id") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 3.0, 3L), ("a", 2.0, 4L),
      ("b", 5.0, 9L))
      .toDF("g", "s", "id")
    val got = df.groupBy($"g")
      .agg(TopKAgg.top_k_by($"s", $"id", 2).as("tk"))
      .select($"g", $"tk.score".as("ss"), $"tk.id".as("ids"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getSeq[Long](2))).toMap
    assert(got("a") == (Seq(3.0, 3.0), Seq(2L, 3L)))
    assert(got("b") == (Seq(5.0), Seq(9L))) // k larger than group: all rows
  }

  test("heap agrees with sort on random streams (insert and evict paths)") {
    val rnd = new scala.util.Random(7)
    for (k <- Seq(1, 2, 5, 16); n <- Seq(0, 1, 5, 500)) {
      val pairs = Array.fill(n)((rnd.nextInt(50).toDouble, rnd.nextLong() % 1000))
      val heap = new TopKAgg.TopKHeap(k)
      pairs.foreach { case (s, i) => heap.offer(s, i) }
      val got = (0 until heap.size)
        .map(j => (heap.scores(j), heap.ids(j)))
        .sortBy { case (s, i) => (-s, i) }
      val want = pairs.toSeq.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(got == want, s"k=$k n=$n")
    }
  }

  test("k=1 heap is EXACTLY max(struct(score, -id)) — the round-16 argmax swap") {
    // ivfAssign / pqTrain / labelPropagation / d05 replaced their
    // declarative struct-max argmax (SortAggregate-forcing) with
    // top_k_by(k=1); this property pins the swap's semantic claim on
    // random data with engineered ties, duplicate ids, and NaN scores
    // (both orderings treat NaN as greatest — SQL sort semantics).
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(4000) { i =>
      val g = rnd.nextInt(40).toLong
      // coarse scores force ties; occasional NaN exercises the
      // deterministic-NaN contract
      val s = if (rnd.nextInt(50) == 0) Double.NaN
        else rnd.nextInt(6).toDouble / 2.0
      (g, s, rnd.nextInt(200).toLong)
    }
    val df = rows.toDF("g", "s", "id").repartition(7)
    val viaHeap = df.groupBy($"g")
      .agg(TopKAgg.top_k_by($"s", $"id", 1).as("tk"))
      .select($"g", element_at($"tk.score", 1).as("s"),
        element_at($"tk.id", 1).as("id"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val viaStruct = df.groupBy($"g")
      .agg(max(struct($"s", (-$"id").as("neg"))).as("m"))
      .select($"g", $"m.s", (-$"m.neg").as("id"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(viaHeap.keySet == viaStruct.keySet)
    viaHeap.foreach { case (g, (hs, hi)) =>
      val (ss, si) = viaStruct(g)
      // compare via Double.compare so NaN == NaN
      assert(java.lang.Double.compare(hs, ss) == 0 && hi == si,
        s"group $g: heap=($hs,$hi) struct=($ss,$si)")
    }
    Caches.sweep(spark)
  }

  test("null scores/ids are skipped; partial merge across partitions agrees") {
    import spark.implicits._
    val rows = (1L to 1000L).map(i => ("g", i.toDouble % 97, i)) :+
      (("g", Double.box(null.asInstanceOf[Double]).doubleValue, 0L))
    val df = rows.toDF("g", "s", "id")
      .withColumn("s", when($"id" === 0L, lit(null)).otherwise($"s"))
      .repartition(13) // force non-trivial partial/merge paths
    val got = df.groupBy($"g")
      .agg(TopKAgg.top_k_by($"s", $"id", 3).as("tk"))
      .select(posexplode($"tk"))
      .select($"col.score", $"col.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    // score = id % 97 → best score 96 at ids 96, 193, 290 (smallest first)
    assert(got.toSeq == Seq((96.0, 96L), (96.0, 193L), (96.0, 290L)))
  }
}
