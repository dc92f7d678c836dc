package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mutations

/** CDC snapshot diff + SCD Type-2 merge semantics (gates q99/q100 pin the
  * single-batch output against DuckDB; this spec pins what the oracle
  * can't — multi-batch history chaining, no-op idempotence, schema
  * guards).
  */
class MutationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dim0 = Seq(
    // key, attr, valid_from, valid_to, is_current
    (1L, "a", 0L, Option.empty[Long], true),
    (2L, "b", 0L, Option.empty[Long], true))
    .toDF("k", "v", "valid_from", "valid_to", "is_current")

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val neu = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val got = Mutations.snapshotDiff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "update"), (3L, "delete"), (4L, "insert")))
  }

  test("snapshotDiff is null-safe on attribute values") {
    val old = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("k", "v")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "v")
    val got = Mutations.snapshotDiff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "update"))) // null==null is NOT a change
  }

  test("asOf reconstructs each epoch of a chained history") {
    val b1 = Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
    val b2 = Seq((1L, "a3")).toDF("k", "v")
    val hist = Mutations.scd2Merge(
      Mutations.scd2Merge(dim0, b1, "k", ts = 10L), b2, "k", ts = 20L)
    def state(t: Long): Set[(Long, String)] =
      Mutations.asOf(hist, t).select($"k", $"v")
        .as[(Long, String)].collect().toSet
    assert(state(5L) == Set((1L, "a"), (2L, "b"))) // before any merge
    // boundary: at exactly ts=10 the NEW version is live (half-open)
    assert(state(10L) == Set((1L, "a2"), (2L, "b"), (3L, "c")))
    assert(state(15L) == Set((1L, "a2"), (2L, "b"), (3L, "c")))
    assert(state(25L) == Set((1L, "a3"), (2L, "b"), (3L, "c")))
  }

  test("joinViewDelta equals full-recompute minus the old view") {
    val aOld = Seq((1L, "x"), (2L, "y")).toDF("ak", "av")
    val dA = Seq((3L, "z")).toDF("ak", "av")
    val bOld = Seq((1L, 10.0), (3L, 30.0)).toDF("bk", "bv")
    val dB = Seq((2L, 20.0), (3L, 31.0)).toDF("bk", "bv")
    val delta = Mutations.joinViewDelta(aOld, dA, bOld, dB, "ak", "bk")
      .as[(Long, String, Long, Double)].collect().toSet
    // ΔV: dA⋈(B∪dB) = (3,z,3,30.0),(3,z,3,31.0); A⋈dB = (2,y,2,20.0)
    assert(delta == Set(
      (3L, "z", 3L, 30.0), (3L, "z", 3L, 31.0), (2L, "y", 2L, 20.0)))
    val full = aOld.unionByName(dA)
      .join(bOld.unionByName(dB), $"ak" === $"bk")
      .as[(Long, String, Long, Double)].collect().toSet
    val oldView = aOld.join(bOld, $"ak" === $"bk")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(oldView ++ delta == full)
    assert(oldView.intersect(delta).isEmpty) // no double-counted rows
  }

  test("scd2Merge chains history across batches") {
    val b1 = Seq((1L, "a2"), (3L, "c")).toDF("k", "v") // change k1, open k3
    val after1 = Mutations.scd2Merge(dim0, b1, "k", ts = 10L)
    val b2 = Seq((1L, "a3")).toDF("k", "v") // change k1 again
    val after2 = Mutations.scd2Merge(after1, b2, "k", ts = 20L)
    val rows = after2.select($"k", $"v", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(rows == Set(
      (1L, "a", 0L, Some(10L), false), // closed by batch 1
      (1L, "a2", 10L, Some(20L), false), // closed by batch 2
      (1L, "a3", 20L, None, true), // current after batch 2
      (2L, "b", 0L, None, true), // never touched
      (3L, "c", 10L, None, true))) // opened by batch 1
    // exactly one current row per key, valid ranges abut
    val curPerKey = after2.filter($"is_current").groupBy($"k").count()
      .as[(Long, Long)].collect().toMap
    assert(curPerKey.values.forall(_ == 1L))
  }

  test("scd2Merge no-op batch leaves the dimension identical") {
    val noop = Seq((1L, "a")).toDF("k", "v") // same attrs as current
    val after = Mutations.scd2Merge(dim0, noop, "k", ts = 10L)
    val rows = after.select($"k", $"v", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(rows == Set(
      (1L, "a", 0L, None, true),
      (2L, "b", 0L, None, true)))
  }

  test("scd1Upsert overwrites matched keys, inserts new, passes the rest") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val batch = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val got = Mutations.scd1Upsert(dim, batch, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("scd1Upsert rejects mismatched schemas") {
    val e = intercept[IllegalArgumentException] {
      Mutations.scd1Upsert(Seq((1L, "a")).toDF("k", "v"),
        Seq((1L, "a", 2)).toDF("k", "v", "w"), "k")
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("scd2Merge rejects a batch whose columns don't match key+attrs") {
    val bad = Seq((1L, "a", 7)).toDF("k", "v", "extra")
    val e = intercept[IllegalArgumentException] {
      Mutations.scd2Merge(dim0, bad, "k", ts = 10L)
    }
    assert(e.getMessage.contains("key+attrs"))
  }

  test("snapshotDiff rejects mismatched snapshot schemas") {
    val e = intercept[IllegalArgumentException] {
      Mutations.snapshotDiff(Seq((1L, "a")).toDF("k", "v"),
        Seq((1L, "a", 2)).toDF("k", "v", "w"), Seq("k"))
    }
    assert(e.getMessage.contains("schemas differ"))
  }

  test("refreshAggView merges new, touched, and untouched view keys") {
    val base = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v")
    val batch = Seq(("a", -2.0), ("c", 7.0)).toDF("k", "v") // no "b" rows
    val got = Mutations.refreshAggView(
        Mutations.aggView(base, Seq("k"), "v"), batch, Seq("k"), "v")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("a") == ((3L, 2.0, -2.0, 3.0))) // count+sum add, min from batch
    assert(got("b") == ((1L, 5.0, 5.0, 5.0)))  // untouched key passes through
    assert(got("c") == ((1L, 7.0, 7.0, 7.0)))  // key born in the batch
  }

  test("deletion vectors: overlapping batches dedup, reads merge, vacuum folds") {
    import spark.implicits._
    import graft.operators.Layout
    val path = graft.Scratch.dir("spec_dv")
    (1L to 100L).map(i => (i, i % 10)).toDF("id", "grp")
      .repartition(3).write.mode("overwrite").parquet(path)
    // batch 1: ids 1..50 -> 50 new deletes
    assert(Layout.deleteWhere(spark, path, col("id") <= 50) == 50L)
    // batch 2 OVERLAPS (ids 41..60): only 10 are new
    assert(Layout.deleteWhere(spark, path, col("id").between(41, 60)) == 10L)
    // re-issuing a covered predicate deletes nothing (idempotent)
    assert(Layout.deleteWhere(spark, path, col("id") <= 60) == 0L)
    val live = Layout.readWithDeletes(spark, path)
    assert(live.count() == 40L)
    assert(live.agg(min($"id")).head().getLong(0) == 61L)
    // vacuum: live view identical, vectors gone, base read = live read
    assert(Layout.vacuum(spark, path) == 40L)
    assert(Layout.deletes(spark, path).isEmpty)
    assert(spark.read.parquet(path).count() == 40L)
    assert(Layout.readWithDeletes(spark, path).agg(min($"id"))
      .head().getLong(0) == 61L)
    // deletes keep working on the vacuumed layout (fresh row indexes)
    assert(Layout.deleteWhere(spark, path, col("id") > 90) == 10L)
    assert(Layout.readWithDeletes(spark, path).count() == 30L)
  }

  test("mergeInto: update/accumulate, delete, insert, ghost-delete no-op") {
    import graft.operators.Mutations
    val target = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "tag", "v")
    val batch = Seq(
      (2L, "B", 5.0),        // matched update: v accumulates, tag replaces
      (3L, "DEL", 0.0),      // matched delete
      (9L, "new", 99.0),     // not matched: insert
      (8L, "DEL", 0.0)       // not matched delete: no-op
    ).toDF("k", "tag", "v")
    val got = Mutations.mergeInto(target, batch, "k",
        deleteWhen = col("_b_tag") === "DEL",
        updateSet = Map("v" -> (col("v") + col("_b_v"))))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, "a", 10.0),   // untouched
      (2L, "B", 25.0),   // v = 20 + 5 accumulated, tag replaced from batch
      (4L, "d", 40.0),   // untouched
      (9L, "new", 99.0)  // inserted as-is
    ), got.toString)
    // full-row replace is the default when updateSet is empty
    val replaced = Mutations.mergeInto(target, batch, "k",
        deleteWhen = col("_b_tag") === "DEL")
      .as[(Long, String, Double)].collect().toSet
    assert(replaced.contains((2L, "B", 5.0)), replaced.toString)
    // guard rails: schema mismatch and key rewrite are caller bugs
    intercept[IllegalArgumentException] {
      Mutations.mergeInto(target, batch.drop("v"), "k")
    }
    intercept[IllegalArgumentException] {
      Mutations.mergeInto(target, batch, "k",
        updateSet = Map("k" -> lit(0L)))
    }
  }

  test("deletion vectors: over-budget vector degrades to a shuffled anti-join, same rows") {
    import spark.implicits._
    import graft.operators.Layout
    val path = graft.Scratch.dir("spec_dv_fallback")
    (1L to 100L).map(i => (i, i % 7)).toDF("id", "grp")
      .repartition(3).write.mode("overwrite").parquet(path)
    assert(Layout.deleteWhere(spark, path, col("id") % 2 === 0) == 50L)
    assert(Layout.deleteVectorBytes(spark, path) > 0L)
    assert(math.abs(Layout.deleteFraction(spark, path) - 0.5) < 1e-12)
    val viaBroadcast = Layout.readWithDeletes(spark, path)
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    // force the degraded mode: zero broadcast budget, and no AQE
    // auto-broadcast rescue — the honest fallback must carry alone
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val live = Layout.readWithDeletes(spark, path, broadcastBytesMax = 0L)
      assert(live.orderBy($"id").as[(Long, Long)].collect().toSeq
        == viaBroadcast, "fallback path changed the live view")
      live.collect()
      val plan = live.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-budget vector must not be broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"),
        s"expected a shuffled anti-join in the degraded mode:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mergeInto: over-cap batch degrades to a shuffled merge, same rows") {
    val target = (1L to 500L).map(i => (i, s"t$i", i.toDouble))
      .toDF("k", "tag", "v")
    val batch = Seq(
      (2L, "B", 5.0), (3L, "DEL", 0.0), (900L, "new", 9.0)
    ).toDF("k", "tag", "v")
    val viaBroadcast = Mutations.mergeInto(target, batch, "k",
        deleteWhen = col("_b_tag") === "DEL")
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    // force the degraded mode: zero byte budget withholds every hint, and
    // no AQE auto-broadcast rescue — the shuffled merge must carry alone
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Mutations.mergeInto(target, batch, "k",
        deleteWhen = col("_b_tag") === "DEL", broadcastBytesMax = 0L)
      assert(merged.orderBy($"k").as[(Long, String, Double)].collect().toSeq
        == viaBroadcast, "fallback path changed the merge result")
      merged.collect()
      val plan = merged.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-cap batch must not be broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"expected shuffled joins in the degraded mode:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("scd2Merge: over-cap batch degrades to a shuffled merge, same rows") {
    val b1 = Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
    val viaBroadcast = Mutations.scd2Merge(dim0, b1, "k", ts = 10L)
      .orderBy($"k", $"valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Mutations.scd2Merge(dim0, b1, "k", ts = 10L,
        broadcastBytesMax = 0L)
      assert(merged.orderBy($"k", $"valid_from")
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
        == viaBroadcast, "fallback path changed the scd2 history")
      merged.collect()
      val plan = merged.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!plan.contains("BroadcastHashJoin"),
        s"over-cap batch must not be broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mergeInto: validateKeys rejects a duplicate-key batch") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val dupBatch = Seq((2L, "x"), (2L, "y")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Mutations.mergeInto(target, dupBatch, "k", validateKeys = true)
    }
    assert(e.getMessage.contains("duplicate"))
    // a unique-key batch passes the check and merges normally
    val ok = Mutations.mergeInto(target, Seq((2L, "x")).toDF("k", "v"), "k",
      validateKeys = true).as[(Long, String)].collect().toSet
    assert(ok == Set((1L, "a"), (2L, "x")))
  }

  test("vacuum rebuilds the skip manifest over the rewritten files") {
    import spark.implicits._
    import graft.operators.Layout
    val path = graft.Scratch.dir("spec_dv_manifest")
    Layout.writeWithManifest(
      (1L to 1000L).map(i => (i, i % 13)).toDF("id", "grp"), "id", 4, path)
    assert(Layout.deleteWhere(spark, path, col("id") <= 200) == 200L)
    assert(math.abs(Layout.deleteFraction(spark, path) - 0.2) < 1e-12)
    assert(Layout.vacuum(spark, path) == 800L)
    // the manifest must describe the POST-vacuum files: every referenced
    // file exists, and it records its clustering column
    val man = Layout.manifest(spark, path).collect()
    assert(man.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    man.foreach { r =>
      val f = new org.apache.hadoop.fs.Path(
        r.getString(r.fieldIndex("file")))
      assert(fs.exists(f), s"manifest references a vacuumed-away file: $f")
      assert(r.getString(r.fieldIndex("range_col")) == "id")
    }
    // manifest-routed reads stay correct across the rewrite: the deleted
    // range is gone, a live range is complete
    assert(Layout.prunedRead(spark, path, "id", lit(100L), lit(250L))
      .count() == 50L) // 201..250 survive
    assert(Layout.prunedRead(spark, path, "id", lit(900L), lit(950L))
      .count() == 51L)
  }

  test("replicaDiff: order-free match, same-count content mismatch, " +
      "one-sided partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq(("p1", "k1"), ("p1", "k2"), ("p2", "k3"))
      .toDF("part", "k")
    // p1 holds the same multiset in a DIFFERENT order -> match; p2 has
    // the same row COUNT but different content -> the checksum, not the
    // count, catches it; p3 exists only in B
    val b = Seq(("p1", "k2"), ("p1", "k1"), ("p2", "kX"), ("p3", "k9"))
      .toDF("part", "k")
    val got = graft.operators.Layout.replicaDiff(a, b, col("part"), col("k"))
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "p1" -> ((2L, 2L, "match")),
      "p2" -> ((1L, 1L, "mismatch")),
      "p3" -> ((0L, 1L, "only_b"))), got.toString)
    // the reverse direction flags only_a symmetrically
    val rev = graft.operators.Layout.replicaDiff(b, a, col("part"), col("k"))
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(rev("p3") == "only_a", rev.toString)
  }

}
