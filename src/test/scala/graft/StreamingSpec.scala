package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("streaming hourly counts equal the batch aggregation") {
    val stream = SparkEntry.queries("st01_stream_hourly")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Tables(spark, sf, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("stateful sessionization equals the batch window-function formulation") {
    val stream = SparkEntry.queries("st02_stream_sessions")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q27_sessionize")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
  }

  test("watermark + append mode emits only closed windows") {
    val agg = StreamOps.hourlyCounts(StreamOps.readEvents(spark, sf))
    val appended = StreamOps.runToMemory(spark, agg, "wm_out", OutputMode.Append())
    val complete = spark.table("st01_out")
    // append emits windows the watermark has passed; must be a subset
    val a = appended.select(col("window"), col("event_type"), col("n")).collect().map(_.toSeq).toSet
    val c = complete.select(col("window"), col("event_type"), col("n")).collect().map(_.toSeq).toSet
    assert(a.subsetOf(c))
  }

  test("streaming lineage listener captures source and sink per batch") {
    val l = graft.streaming.StreamLineageListener.install(spark)
    try {
      SparkEntry.queries("st01_stream_hourly")(spark, sf).collect()
      val deadline = System.currentTimeMillis() + 10000
      while (l.lineages.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val lin = l.lineages
      assert(lin.nonEmpty)
      assert(lin.exists(_.sources.exists(_.contains("FileStreamSource"))), lin)
      assert(lin.exists(_.sink.contains("Memory")), lin)
    } finally spark.streams.removeListener(l)
  }

  test("streaming lineage: plan definition exposes the streaming source") {
    val df = StreamOps.hourlyCounts(StreamOps.readEvents(spark, sf))
    val g = graft.lineage.LineageExtractor.fromLogical(df.queryExecution.analyzed)
    assert(g.treeString.contains("Aggregate"))
    assert(g.collect { case n => n.kind }.nonEmpty)
  }

  test("latest snapshot emits a key only when its latest value changes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (user_id, micros, event_id, value)
    val ms = MemoryStream[(Long, Long, Long, Double)]
    val events = ms.toDF()
      .select($"_1".as("user_id"), timestamp_micros($"_2").as("ts"),
        $"_3".as("event_id"), $"_4".as("value"))
    val q = StreamOps.latestSnapshot(events).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("latest_inc_test").start()
    try {
      ms.addData((1L, 1000L, 1L, 10.0), (2L, 1000L, 2L, 5.0))
      q.processAllAvailable()
      val batch1 = spark.table("latest_inc_test").collect()
      assert(batch1.length == 2)
      // user 1: NEWER event (must re-emit); user 2: LATE event older than
      // the stored row (must be absorbed silently)
      ms.addData((1L, 2000L, 3L, 20.0), (2L, 500L, 4L, 9.0))
      q.processAllAvailable()
      val rows = spark.table("latest_inc_test")
        .select($"user_id", $"event_id", $"value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length == 3, rows.mkString(", "))
      // the cumulative update log ends at the correct snapshot
      assert(rows.contains((1L, 3L, 20.0)))
      assert(rows.count(_._1 == 2L) == 1 && rows.contains((2L, 2L, 5.0)))
    } finally q.stop()
  }

  test("transformWithState MapState accumulates across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, String)]
    val events = ms.toDF()
      .select($"_1".as("user_id"), $"_2".as("event_type"))
    val q = StreamOps.typeCounts(events).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("tws_counts_test").start()
    try {
      ms.addData((1L, "click"), (1L, "click"), (2L, "view"))
      q.processAllAvailable()
      // batch 2: the click count must CONTINUE from the stored state,
      // and user 1's full profile (click + view) re-emits
      ms.addData((1L, "click"), (1L, "view"))
      q.processAllAvailable()
      val last = spark.table("tws_counts_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(last.contains((1L, "click", 3L)), last.mkString(", "))
      assert(last.contains((1L, "view", 1L)))
      assert(last.contains((2L, "view", 1L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming near-dedup checks new docs against prior-batch state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, String)]
    val docs = ms.toDF().select($"_1".as("doc_id"), $"_2".as("text"))
    val q = StreamOps.nearDupBucketMins(docs).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("st11_state_test").start()
    try {
      ms.addData((10L, "alpha beta gamma delta epsilon"),
        (20L, "entirely different vocabulary in every position"))
      q.processAllAvailable()
      // batch 2 arrives AFTER batch 1 committed: doc 30 (identical text
      // to doc 10) must hit doc 10's bucket state, not rescan anything
      ms.addData((30L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      val rows = spark.table("st11_state_test").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val byDoc = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      assert(byDoc(10L) == 10L) // first owner of its buckets
      assert(byDoc(30L) == 10L, s"doc 30 not deduped against batch-1 state: $byDoc")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming near-dedup wide-band config still links identical docs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, String)]
    val docs = ms.toDF().select($"_1".as("doc_id"), $"_2".as("text"))
    // 2x31-bit bands: the corpus-scale configuration (sparser buckets,
    // weaker pigeonhole) — identical text has identical signatures, so
    // both bands must still link the pair
    val q = StreamOps.nearDupBucketMins(docs, bandBits = 31, nBands = 2).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("st11_wide_test").start()
    try {
      ms.addData((5L, "lorem ipsum dolor sit amet"),
        (6L, "lorem ipsum dolor sit amet"))
      q.processAllAvailable()
      val byDoc = spark.table("st11_wide_test").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      assert(byDoc(5L) == 5L && byDoc(6L) == 5L, byDoc.toString)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming as-of matches lefts against right history from prior batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // (user_id, us, is_right, event_id) fed pre-tagged through one stream
    val ms = MemoryStream[(Long, Long, Boolean, Long)]
    val left = ms.toDF()
      .filter(!$"_3")
      .select($"_4".as("event_id"), $"_1".as("user_id"), $"_2".as("us"))
    val right = ms.toDF()
      .filter($"_3")
      .select($"_1".as("user_id"), $"_2".as("us"))
    val q = StreamOps.streamAsof(left, right).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_inc_test").start()
    try {
      // batch 1: rights only — nothing emits yet
      ms.addData((1L, 100L, true, -1L), (1L, 300L, true, -1L), (2L, 50L, true, -1L))
      q.processAllAvailable()
      assert(spark.table("asof_inc_test").count() == 0)
      // batch 2: lefts must match the PRIOR batch's history (including a
      // tie at us=300 → >= contract), plus an in-batch newer right that
      // must win over the stored 100/300 for the later left
      ms.addData((1L, 300L, false, 10L), (1L, 500L, true, -1L),
        (1L, 600L, false, 11L), (2L, 40L, false, 12L))
      q.processAllAvailable()
      val rows = spark.table("asof_inc_test")
        .select($"event_id", $"user_id", $"p_us", $"c_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSet == Set(
        (10L, 1L, 300L, 300L), // tie matches (>=)
        (11L, 1L, 600L, 500L)), // in-batch right beats stored history
        rows.mkString(", "))
      // user 2's left at 40 predates its only right (50): inner-dropped
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("change capture carries last-value state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Long, Long, String)]
    val src = ms.toDF().select($"_1".as("user_id"), $"_2".as("event_id"),
      $"_3".as("us"), $"_4".as("v"))
    val q = StreamOps.changeCapture(src).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("cdc_test").start()
    try {
      // batch 1: insert, suppressed redelivery, update — in ts order
      ms.addData((1L, 10L, 100L, "a"), (1L, 11L, 200L, "a"),
        (1L, 12L, 300L, "b"))
      q.processAllAvailable()
      // batch 2: "b" redelivered (suppressed ACROSS batches — the state
      // carry), then a real change
      ms.addData((1L, 13L, 400L, "b"), (1L, 14L, 500L, "a"))
      q.processAllAvailable()
      val got = spark.table("cdc_test").collect()
        .map(r => (r.getLong(1), r.getString(2))).toSet
      assert(got == Set((10L, "insert"), (12L, "update"), (14L, "update")),
        got.mkString(", "))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("as-of right history evicts under a state TTL") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val saved = Seq("spark.sql.streaming.stateStore.providerClass",
      "spark.sql.shuffle.partitions").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime time mode schedules TTL-eviction no-data batches;
    // keep their fixed cost tiny (2 state stores, not 8)
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val ms = MemoryStream[(Long, Long, Boolean, Long)]
    val left = ms.toDF()
      .filter(!$"_3")
      .select($"_4".as("event_id"), $"_1".as("user_id"), $"_2".as("us"))
    val right = ms.toDF()
      .filter($"_3")
      .select($"_1".as("user_id"), $"_2".as("us"))
    // TTL 2s; every positive match rides INSIDE its batch (rights sort
    // before lefts), so contention can only make the eviction sleep
    // LONGER — never flaky toward a false failure. processAllAvailable is
    // useless under processing-time no-data batches (the query never
    // quiesces); completion is detected by polling for each batch's
    // sentinel match instead.
    val ttl = org.apache.spark.sql.streaming.TTLConfig(
      java.time.Duration.ofSeconds(2))
    val q = StreamOps.streamAsof(left, right, ttl).toDF()
      .writeStream.outputMode("append").format("memory")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .queryName("asof_ttl_test").start()
    def awaitRows(want: Set[(Long, Long)], deadlineSec: Int = 90): Set[(Long, Long)] = {
      val until = System.nanoTime() + deadlineSec * 1e9.toLong
      var got = Set.empty[(Long, Long)]
      while (!want.subsetOf(got) && System.nanoTime() < until) {
        Thread.sleep(100)
        got = spark.table("asof_ttl_test").select($"event_id", $"c_us")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      got
    }
    try {
      // batch 1: right @1000 then left @1500 in the same batch — matches
      ms.addData((1L, 1000L, true, -1L), (1L, 1500L, false, 10L))
      assert(awaitRows(Set((10L, 1000L))) == Set((10L, 1000L)))
      // batch 2, past the TTL: user 1's @1000 right has EVICTED — the
      // left that would have matched it goes unmatched (inner semantics:
      // dropped). User 2's in-batch pair is the batch-completion sentinel.
      Thread.sleep(3000)
      ms.addData((1L, 2000L, false, 11L),
        (2L, 100L, true, -1L), (2L, 200L, false, 20L))
      val after = awaitRows(Set((20L, 100L)))
      assert(after.contains((20L, 100L)), s"batch 2 never completed: $after")
      assert(!after.exists(_._1 == 11L),
        s"expected the TTL to evict user 1's right history, got $after")
    } finally {
      q.stop()
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
  }

  test("streaming funnel carries (depth, last-ts) state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Long, String)]
    val src = ms.toDF().select($"_1".as("user_id"), $"_2".as("us"),
      $"_3".as("event_type"))
    val q = StreamOps.streamFunnel(src, Seq("click", "view", "purchase")).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_test").start()
    // Update-mode sink accumulates one row per (key, batch); depth is
    // monotone, so max(depth) is the latest funnel position
    def depths(): Map[Long, Int] =
      spark.table("funnel_test").groupBy($"user_id")
        .agg(max($"depth").as("d")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    try {
      // batch 1: user 1 reaches depth 1; user 2's view has no click yet
      ms.addData((1L, 100L, "click"), (1L, 100L, "view"), // same-ts: rejected
        (2L, 100L, "view"))
      q.processAllAvailable()
      assert(depths() == Map(1L -> 1, 2L -> 0))
      // batch 2: user 1 continues from carried state (depth 1, last=100);
      // user 2's LATE click (us=50) matches from last=MinValue, but the
      // batch-1 view is gone — the O(1)-state trade: no retro-extension
      ms.addData((1L, 200L, "view"), (1L, 300L, "purchase"),
        (2L, 50L, "click"))
      q.processAllAvailable()
      assert(depths() == Map(1L -> 3, 2L -> 1))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("latest-wins upsert sink is commutative across batch splits") {
    import spark.implicits._
    // the same 9 rows split 3 ways vs 2 ways vs single-batch: the final
    // keyed table must be identical — the order-commutativity contract
    // that makes foreachBatch+mergeInto an exactly-once-effect sink
    val rows = Seq(
      (1L, 10L, 100L, "a", 1.0), (1L, 30L, 101L, "b", 2.0),
      (1L, 20L, 102L, "c", 3.0), // key 1 latest = us 30 -> "b"
      (2L, 5L, 103L, "x", 4.0), (2L, 5L, 104L, "y", 5.0),
      // key 2 same-us tie -> event_id 104 wins
      (3L, 9L, 105L, "z", 6.0),
      (3L, 9L, 106L, "z2", 7.0), (3L, 8L, 107L, "w", 8.0),
      (4L, 1L, 108L, "solo", 9.0))
    def run(splitBy: Int): Set[(Long, String, Double)] = {
      val tmp = graft.Scratch.dir(s"upsert_spec_$splitBy")
      val df = rows.toDF("user_id", "us", "event_id", "event_type", "value")
      for (i <- 0 until splitBy)
        df.filter($"event_id" % splitBy === i).coalesce(1)
          .write.mode(if (i == 0) "overwrite" else "append").parquet(tmp)
      val src = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp)
      val got = StreamOps.runLatestUpsert(spark, src, "user_id",
          Seq("us", "event_id"))
        .select($"user_id", $"event_type", $"value")
        .as[(Long, String, Double)].collect().toSet
      Caches.sweep(spark)
      got
    }
    val expected = Set(
      (1L, "b", 2.0), (2L, "y", 5.0), (3L, "z2", 7.0), (4L, "solo", 9.0))
    assert(run(3) == expected)
    assert(run(2) == expected)
    assert(run(1) == expected)
    // no operator-held blocks survive the handoff
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
