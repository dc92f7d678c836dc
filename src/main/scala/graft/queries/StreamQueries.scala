package graft.queries

import graft.{Q, Tables}
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming queries run to completion against the finite
  * events file source, oracle-checked against the batch-equivalent SQL —
  * streaming and batch must agree on a replayed input.
  */
object StreamQueries {

  /** DuckDB fragment for distinct word-3-gram shingles — PipelineQueries'
    * single definition, shared so t54 and st20's oracles can never
    * drift apart on tokenization. */
  private val shinglesSqlStream = PipelineQueries.shinglesSql

  def all: Seq[Q] = Seq(

    Q("st01_stream_hourly",
      (s, dir) => {
        val res = StreamOps.runToMemory(
          s, StreamOps.hourlyCounts(StreamOps.readEvents(s, dir)),
          "st01_out", OutputMode.Complete())
        res.select(
            date_format(col("window.start"), "yyyy-MM-dd HH").as("hr"),
            col("event_type"), col("n"), col("sum_v"))
          .orderBy(col("hr"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)),

    Q("st02_stream_sessions",
      (s, dir) => {
        val sess = StreamOps.sessionize(StreamOps.readEvents(s, dir))
        StreamOps.runToMemory(s, sess.toDF(), "st02_out", OutputMode.Update())
          .orderBy(col("user_id"), col("session_id"))
      },
      // same ground truth as the batch window-function sessionization
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
             |  FROM events),
             |g AS (
             |  SELECT user_id, event_id, ts, sec,
             |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, sec,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(sec) AS start_sec, max(sec) AS end_sec
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // stream-stream inner join: purchases matched to same-user clicks in
    // the preceding hour (watermarks bound the join state at scale; on a
    // single-batch replay the result equals the batch join exactly)
    Q("st03_stream_join",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        // bounded user block: constant state-store volume across SFs (the
        // unbounded path is the same code; watermarks bound state growth)
        val ev = StreamOps.readEvents(s, dir).filter(col("user_id") < 500)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "2 hours")
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "2 hours")
        val joined = p.join(c,
          p("user_id") === c("c_user") &&
            c("c_ts") >= p("p_ts") - expr("INTERVAL 1 HOUR") &&
            c("c_ts") <= p("p_ts"))
        StreamOps.runToMemory(s, joined, "st03_out", OutputMode.Append())
          .select(col("p_id"), col("c_id"),
            unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
          .orderBy(col("p_id"), col("c_id"))
      },
      Some("""SELECT p.event_id AS p_id, c.event_id AS c_id,
             |  epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 500) p
             |JOIN (SELECT * FROM events WHERE event_type = 'click' AND user_id < 500) c
             |  ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
             |ORDER BY p_id, c_id""".stripMargin)),

    // LEFT OUTER stream-stream interval join: matched pairs emit like
    // st03; an UNMATCHED purchase emits its null-padded row only once the
    // global watermark (min over both streams' max-ts − delay) passes its
    // timestamp, proving no future click can still join — purchases
    // younger than the final watermark stay in state and never emit.
    // That watermark-eviction rule IS the gated semantics: the oracle
    // reproduces it as p.ts < least(max p.ts, max c.ts) − 2h.
    Q("st07_stream_join_outer",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        val ev = StreamOps.readEvents(s, dir).filter(col("user_id") < 500)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "2 hours")
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "2 hours")
        val joined = p.join(c,
          p("user_id") === c("c_user") &&
            c("c_ts") >= p("p_ts") - expr("INTERVAL 1 HOUR") &&
            c("c_ts") <= p("p_ts"),
          "left_outer")
        StreamOps.runToMemory(s, joined, "st07_out", OutputMode.Append())
          .select(col("p_id"), col("c_id"),
            unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
          .orderBy(asc_nulls_first("p_id"), asc_nulls_first("c_id"))
      },
      Some("""WITH p AS (SELECT * FROM events
             |           WHERE event_type = 'purchase' AND user_id < 500),
             |     c AS (SELECT * FROM events
             |           WHERE event_type = 'click' AND user_id < 500),
             |     wm AS (SELECT least((SELECT max(ts) FROM p),
             |                         (SELECT max(ts) FROM c))
             |                   - INTERVAL 2 HOUR AS w)
             |SELECT p.event_id AS p_id, c.event_id AS c_id,
             |  epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM p JOIN c ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
             |UNION ALL
             |SELECT p.event_id, NULL, epoch_us(p.ts), NULL
             |FROM p
             |WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
             |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
             |  AND p.ts < (SELECT w FROM wm)
             |ORDER BY p_id NULLS FIRST, c_id NULLS FIRST""".stripMargin)),

    // streaming dedup: distinct (user_id, event_type) keys with
    // watermark-evicted state, then a batch rollup of the deduped keys
    Q("st04_stream_dedup",
      (s, dir) => {
        val keys = StreamOps.dedupKeys(StreamOps.readEvents(s, dir),
          Seq("user_id", "event_type"))
        StreamOps.runToMemory(s, keys, "st04_out", OutputMode.Append())
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n_users
             |FROM (SELECT DISTINCT user_id, event_type FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // stream-static join: stateless per-batch enrichment against a batch
    // dimension (broadcast per micro-batch — no state store, unlike
    // stream-stream joins; the canonical lookup-table pattern)
    Q("st05_stream_static_join",
      (s, dir) => {
        val dim = Tables(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
        val ev = StreamOps.readEvents(s, dir)
          .withColumn("nk", col("user_id") % 25)
          .join(broadcast(dim), Seq("nk"))
        val agg = StreamOps.runToMemory(s, ev, "st05_out", OutputMode.Append())
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
          .orderBy(col("n_name"))
        agg
      },
      Some("""SELECT n_name, count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events JOIN nation ON n_nationkey = user_id % 25
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // foreachBatch sink: per-micro-batch parquet append (the arbitrary
    // sink path), then a batch rollup over what landed on disk
    Q("st06_foreach_batch",
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_feb").toString
        val ev = StreamOps.readEvents(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        StreamOps.runForeachBatchToParquet(s, ev, s"$tmp/out")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // streaming sketch aggregation: per-(day, type) approximate distinct
    // users maintained in stream state (HLL++ registers merge
    // order-insensitively, so the streamed estimate is deterministic);
    // gated q29-style — the estimate must land within 5% of the exact
    // batch distinct over the replayed input
    Q("st08_stream_approx_distinct",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        val agg = StreamOps.readEvents(s, dir)
          .withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"))
        val res = StreamOps.runToMemory(s, agg, "st08_out", OutputMode.Complete())
          .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("approx"))
        val exact = graft.Tables(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_n"))
        res.join(exact, Seq("day", "event_type"))
          .select(col("day"), col("event_type"), col("exact_n"),
            (abs(col("approx") - col("exact_n")) <= col("exact_n") * 0.05)
              .as("within_5pct"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |  event_type, count(DISTINCT user_id) AS exact_n,
             |  true AS within_5pct
             |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // ---- CDC-style latest-value snapshot: one state row per entity,
    //      Update-mode emits only changed keys (StreamOps.latestSnapshot).
    //      Single-batch file replay ⇒ the emitted set IS the batch argmax
    //      per user, which the oracle computes with a window ----
    Q("st09_stream_latest",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        import s.implicits._
        val snap = StreamOps.latestSnapshot(StreamOps.readEvents(s, dir))
        StreamOps.runToMemory(s, snap.toDF(), "st09_out", OutputMode.Update())
          .select($"user_id", $"event_id", $"value")
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, event_id, value FROM (
             |  SELECT user_id, event_id, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- Spark 4 transformWithState: per-user MapState[type -> count]
    //      profile, RocksDB state store (the only provider the operator
    //      supports); single-batch replay => state equals the batch
    //      group-count exactly ----
    Q("st10_stream_type_counts",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        import s.implicits._
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val counted = StreamOps.typeCounts(
            StreamOps.readEvents(s, dir).filter($"user_id" < 300))
          StreamOps.runToMemory(s, counted.toDF(), "st10_out", OutputMode.Update())
            .orderBy($"user_id", $"event_type")
        } finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      Some("""SELECT user_id, event_type, count(*) AS n
             |FROM events WHERE user_id < 300
             |GROUP BY user_id, event_type
             |ORDER BY user_id, event_type""".stripMargin)),

    // ---- streaming near-dedup: incremental-ingest shape of the batch
    //      SimHash pipeline. Per-band-bucket minimum doc id kept in
    //      transformWithState ValueState (RocksDB), so each arriving doc
    //      checks against ALL prior ingest without rescanning it; a doc
    //      is a candidate near-dup iff any of its four 16-bit signature
    //      chunks was already claimed by a smaller id. Single-file
    //      AvailableNow replay => state minima equal the global bucket
    //      minima, which is what the oracle computes ----
    Q("st11_stream_near_dedup",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        import s.implicits._
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          // fanout-aware parallelism (the st20 rationale): the batch
          // arrives as one parquet split, and the per-doc simhash
          // (tokenize + per-token hash + bit majority) is the heavy
          // map — one doc-grain exchange spreads it across the cores
          val mins = StreamOps.nearDupBucketMins(
            StreamOps.readDocuments(s, dir)
              .repartition(s.sparkContext.defaultParallelism))
          StreamOps.runToMemory(s, mins.toDF(), "st11_out", OutputMode.Update())
            .groupBy($"doc_id")
            .agg(min($"min_id").as("mnb"))
            .select($"doc_id", ($"mnb" < $"doc_id").as("is_dup"),
              least($"mnb", $"doc_id").as("canonical"))
            .orderBy($"doc_id")
        } finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      // the d03-oracle portable signature, banded into 16-bit chunks,
      // bucket minima joined back per doc
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents
             |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
             |t AS (
             |  SELECT doc_id,
             |    (('0x' || substr(md5(unnest(toks)), 1, 8))::BIGINT & 2147483647)
             |      * 4294967296
             |      + ('0x' || substr(md5(unnest(toks)), 9, 8))::BIGINT AS h,
             |    len(toks) AS n
             |  FROM d),
             |bits AS (
             |  SELECT doc_id, b,
             |    CASE WHEN 2 * sum((h >> b) & 1) > any_value(n) THEN 1::BIGINT
             |         ELSE 0::BIGINT END AS bit
             |  FROM t CROSS JOIN (SELECT unnest(range(0, 63)) AS b)
             |  GROUP BY doc_id, b),
             |sig AS (
             |  SELECT doc_id, CAST(sum(bit << b) AS BIGINT) AS sig
             |  FROM bits GROUP BY doc_id),
             |ch AS (
             |  SELECT doc_id, i * 65536 + ((sig >> (16 * i)) & 65535) AS bk
             |  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
             |bm AS (SELECT bk, min(doc_id) AS mn FROM ch GROUP BY bk),
             |pd AS (SELECT ch.doc_id, min(bm.mn) AS mnb
             |       FROM ch JOIN bm USING (bk) GROUP BY ch.doc_id)
             |SELECT doc_id, mnb < doc_id AS is_dup,
             |  least(mnb, doc_id) AS canonical
             |FROM pd ORDER BY doc_id""".stripMargin)),

    // ---- streaming as-of: each purchase enriched with the latest click
    //      at-or-before it, per user — the incremental shape of the
    //      native batch as-of (q74, same oracle). Right-side history is
    //      an append-only ListState[Long] per user; single-file replay
    //      processes rows in timestamp order, so the state-driven match
    //      equals DuckDB's batch ASOF JOIN exactly ----
    Q("st12_stream_asof",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        import s.implicits._
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val ev = StreamOps.readEvents(s, dir)
          val p = ev.filter($"event_type" === "purchase")
            .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
          val c = ev.filter($"event_type" === "click")
            .select($"user_id", unix_micros($"ts").as("us"))
          val joined = StreamOps.streamAsof(p, c)
          StreamOps.runToMemory(s, joined.toDF(), "st12_out", OutputMode.Append())
            .select($"event_id", $"user_id", $"p_us", $"c_us")
            .orderBy($"event_id")
        } finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us
             |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY event_id""".stripMargin)),

    // ---- streaming CDC: the incremental shape of the batch snapshot
    //      diff (q99) — per-key last-value state (O(1) per key), first
    //      value emits insert, a differing value update, redeliveries of
    //      the current value are SUPPRESSED (Debezium-style compaction).
    //      Single-batch replay in (ts, event_id) order == the oracle's
    //      lag() window ----
    Q("st13_stream_cdc",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        import s.implicits._
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val src = StreamOps.readEvents(s, dir)
            .filter($"user_id" < 200)
            .select($"user_id", $"event_id",
              unix_micros($"ts").as("us"), $"event_type".as("v"))
          val ch = StreamOps.changeCapture(src)
          StreamOps.runToMemory(s, ch.toDF(), "st13_out", OutputMode.Append())
            .orderBy($"event_id")
        } finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      Some("""SELECT user_id, event_id,
             |  CASE WHEN prev IS NULL THEN 'insert' ELSE 'update' END AS change_type
             |FROM (
             |  SELECT user_id, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events WHERE user_id < 200)
             |WHERE prev IS NULL OR prev <> event_type
             |ORDER BY event_id""".stripMargin)),

    // ---- streaming funnel: the incremental shape of the batch q104 —
    //      per-user (depth, last-match-ts) ValueState advanced by the
    //      same greedy first-match rule, O(1) state per key. Single-file
    //      replay processes each key's rows in ts order, so the final
    //      Update-mode emission equals the batch correlated-min chain
    //      over users that have at least one step event ----
    Q("st14_stream_funnel",
      (s, dir) => {
        import org.apache.spark.sql.streaming.OutputMode
        import s.implicits._
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val ev = StreamOps.readEvents(s, dir)
            .select($"user_id", unix_micros($"ts").as("us"), $"event_type")
          val f = StreamOps.streamFunnel(ev, Seq("click", "view", "purchase"))
          StreamOps.runToMemory(s, f.toDF(), "st14_out", OutputMode.Update())
            .orderBy($"user_id")
        } finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      Some("""WITH t1 AS (
             |  SELECT user_id, min(epoch_us(ts)) AS ts1
             |  FROM events WHERE event_type = 'click' GROUP BY user_id
             |), t2 AS (
             |  SELECT e.user_id, min(epoch_us(e.ts)) AS ts2
             |  FROM events e JOIN t1 ON e.user_id = t1.user_id
             |    AND epoch_us(e.ts) > t1.ts1
             |  WHERE e.event_type = 'view' GROUP BY e.user_id
             |), t3 AS (
             |  SELECT e.user_id, min(epoch_us(e.ts)) AS ts3
             |  FROM events e JOIN t2 ON e.user_id = t2.user_id
             |    AND epoch_us(e.ts) > t2.ts2
             |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
             |)
             |SELECT u.user_id,
             |  CASE WHEN ts3 IS NOT NULL THEN 3
             |       WHEN ts2 IS NOT NULL THEN 2
             |       WHEN ts1 IS NOT NULL THEN 1
             |       ELSE 0 END AS depth
             |FROM (SELECT DISTINCT user_id FROM events
             |      WHERE event_type IN ('click', 'view', 'purchase')) u
             |LEFT JOIN t1 ON u.user_id = t1.user_id
             |LEFT JOIN t2 ON u.user_id = t2.user_id
             |LEFT JOIN t3 ON u.user_id = t3.user_id
             |ORDER BY u.user_id""".stripMargin)),

    // ---- streaming upsert sink (st15): the CDC-APPLY half of st13 —
    //      foreachBatch + the engine's own mergeInto maintain a keyed
    //      latest-wins table across THREE real micro-batches (the events
    //      are split into three files, maxFilesPerTrigger=1). Latest-wins
    //      keys on the (us, event_id) version vector, so the merge is
    //      ORDER-COMMUTATIVE across batch boundaries — the final table is
    //      the global per-user argmax no matter how the source chopped
    //      the stream, which is exactly why the oracle can state it as
    //      one window over the batch table. ----
    Q("st15_stream_upsert",
      (s, dir) => {
        import s.implicits._
        val tmp = graft.Scratch.dir("st15_split")
        val ev = Tables(s, dir, "events")
          .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
            $"event_type", $"value")
        for (i <- 0 until 3)
          ev.filter($"event_id" % 3 === i).coalesce(1)
            .write.mode(if (i == 0) "overwrite" else "append").parquet(tmp)
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp)
        StreamOps.runLatestUpsert(s, src, "user_id", Seq("us", "event_id"))
          .select($"user_id", $"event_type".as("last_type"),
            round($"value", 2).as("v"))
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, event_type AS last_type, round(value, 2) AS v
             |FROM (
             |  SELECT user_id, event_type, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- streaming drift monitor (st16): the serving half of q130's
    //      PSI — the monitored stream's daily value-histogram scores
    //      against a FROZEN first-fortnight reference, one integer
    //      nano-PSI row per day (Expectations.psiDriftSeries). The
    //      stream side does the only corpus-grain work (a windowed
    //      bucket count); the drift math is (day × bucket)-grain
    //      metadata. Replayed input ⇒ batch-equal, which is exactly
    //      what the oracle states. ----
    Q("st16_stream_drift",
      (s, dir) => {
        import s.implicits._
        val cut = lit("2024-01-15").cast("timestamp")
        val counts = StreamOps.readEvents(s, dir)
          .filter($"ts" >= cut)
          .groupBy(window($"ts", "1 day"),
            floor($"value" / 50).as("bucket"))
          .agg(count(lit(1)).as("n"))
        val cur = StreamOps.runToMemory(s, counts, "st16_out",
            OutputMode.Complete())
          .select(date_format($"window.start", "yyyy-MM-dd").as("day"),
            $"bucket", $"n")
        val ref = Tables(s, dir, "events").filter($"ts" < cut)
          .groupBy(floor($"value" / 50).as("bucket"))
          .agg(count(lit(1)).as("n"))
        graft.operators.Expectations.psiDriftSeries(cur,
            col("day"), col("bucket"), col("n"),
            ref, col("bucket"), col("n"))
          .orderBy($"grp")
      },
      Some("""WITH cur AS (
             |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS grp,
             |    CAST(floor(value / 50) AS BIGINT) AS bucket,
             |    count(*) AS n_cur
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-15'
             |  GROUP BY 1, 2),
             |ref AS (
             |  SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
             |    count(*) AS n_ref
             |  FROM events WHERE ts < TIMESTAMP '2024-01-15'
             |  GROUP BY 1),
             |refall AS (
             |  SELECT g.grp, r.bucket, r.n_ref
             |  FROM (SELECT DISTINCT grp FROM cur) g, ref r),
             |j AS (
             |  SELECT coalesce(ra.grp, c.grp) AS grp,
             |    coalesce(ra.bucket, c.bucket) AS bucket,
             |    coalesce(c.n_cur, 0) AS n_cur, coalesce(ra.n_ref, 0) AS n_ref
             |  FROM refall ra FULL OUTER JOIN cur c
             |    ON ra.grp = c.grp AND ra.bucket = c.bucket),
             |t AS (
             |  SELECT grp, n_cur, n_ref,
             |    sum(n_cur) OVER (PARTITION BY grp) AS tc,
             |    sum(n_ref) OVER (PARTITION BY grp) AS tr
             |  FROM j),
             |r2 AS (
             |  SELECT grp, (n_cur = 0 OR n_ref = 0) AS os,
             |    CASE WHEN n_cur > 0 AND n_ref > 0 THEN
             |      CAST(round((CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE)
             |                  - CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE))
             |        * (CAST(CAST(round(ln((CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE))
             |              / (CAST(n_ref AS DOUBLE) / CAST(tr AS DOUBLE))) * 1e6)
             |            AS BIGINT) AS DOUBLE) / 1e6)
             |        * 1e9) AS BIGINT)
             |    ELSE 0 END AS contrib
             |  FROM t)
             |SELECT grp, CAST(count(*) AS BIGINT) AS n_buckets,
             |  CAST(sum(CASE WHEN os THEN 1 ELSE 0 END) AS BIGINT) AS n_one_sided,
             |  CAST(sum(contrib) AS BIGINT) AS psi_nano
             |FROM r2 GROUP BY grp ORDER BY grp""".stripMargin)),

    // ---- streaming CUSUM monitor (st17): the serving half of q138 —
    //      the monitored stream's daily volume runs Page's one-sided
    //      CUSUM against a FROZEN first-fortnight reference mean
    //      (TimeSeries.cusumSeries; the live series' own mean drifts
    //      WITH the shift you're trying to catch, so the allowance must
    //      come from a calibration window). The stream side does the
    //      only corpus-grain work (a windowed count); the chart is
    //      day-grain metadata via the exact prefix-sum closed form.
    //      Replayed input ⇒ batch-equal, which the oracle states. ----
    Q("st17_stream_cusum",
      (s, dir) => {
        import s.implicits._
        val cut = lit("2024-01-15").cast("timestamp")
        val counts = StreamOps.readEvents(s, dir)
          .filter($"ts" >= cut)
          .groupBy(window($"ts", "1 day"))
          .agg(count(lit(1)).as("n"))
        val cur = StreamOps.runToMemory(s, counts, "st17_out",
            OutputMode.Complete())
          .select(date_format($"window.start", "yyyy-MM-dd").as("day"), $"n")
        val ref = Tables(s, dir, "events").filter($"ts" < cut)
          .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.cusumSeries(cur,
          col("day"), col("n"), ref, col("n"),
          slack = 0.0, hDays = 1.0)
      },
      Some("""WITH ref AS (
             |  SELECT date_trunc('day', ts) AS d, count(*) AS n
             |  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY 1),
             |mu AS (
             |  SELECT CAST(round(1e6 * CAST(sum(n) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS mu FROM ref),
             |cur AS (
             |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
             |    count(*) AS n
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY 1),
             |dev AS (
             |  SELECT d, n,
             |    n * 1000000 - CAST(round(CAST(mu AS DOUBLE) * 1.0, 0)
             |      AS BIGINT) AS dev,
             |    CAST(round(CAST(mu AS DOUBLE) * 1.0, 0) AS BIGINT) AS h
             |  FROM cur, mu),
             |p AS (
             |  SELECT d, n, h, sum(dev) OVER (ORDER BY d
             |    ROWS UNBOUNDED PRECEDING) AS prefix FROM dev),
             |r AS (
             |  SELECT d, n, h, prefix,
             |    least(CAST(0 AS BIGINT), min(prefix) OVER (ORDER BY d
             |      ROWS UNBOUNDED PRECEDING)) AS runmin
             |  FROM p)
             |SELECT d, CAST(n AS BIGINT) AS n,
             |  CAST(prefix - runmin AS BIGINT) AS s_micro,
             |  (prefix - runmin) > h AS alarm
             |FROM r ORDER BY d""".stripMargin)),

    // ---- streaming per-window heavy hitters (st18): top-3 event
    //      types per day maintained by the windowed stream count, the
    //      rank applied over the bounded (day × type) state — the
    //      "what dominated each window" monitor next to st10's raw
    //      type counts. Rank is an integer row_number under a total
    //      order; replayed input ⇒ batch-equal. ----
    Q("st18_stream_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val counts = StreamOps.readEvents(s, dir)
          .groupBy(window($"ts", "1 day"), $"event_type")
          .agg(count(lit(1)).as("n"))
        StreamOps.runToMemory(s, counts, "st18_out", OutputMode.Complete())
          .select(date_format($"window.start", "yyyy-MM-dd").as("day"),
            $"event_type", $"n")
          .withColumn("rnk", row_number().over(Window.partitionBy($"day")
            .orderBy($"n".desc, $"event_type")).cast("long"))
          .filter($"rnk" <= 3)
          .orderBy($"day", $"rnk")
      },
      Some("""WITH c AS (
             |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (
             |  SELECT day, event_type, n,
             |    row_number() OVER (PARTITION BY day
             |      ORDER BY n DESC, event_type) AS rnk
             |  FROM c)
             |SELECT day, event_type, CAST(n AS BIGINT) AS n,
             |  CAST(rnk AS BIGINT) AS rnk
             |FROM r WHERE rnk <= 3 ORDER BY day, rnk""".stripMargin)),

    // ---- streaming n-gram novelty (st20): t54's memorization-risk
    //      fraction computed ON INGEST — the documents stream explodes
    //      to gram grain, stream-static left-joins the CORPUS's
    //      distinct gram set (the static side is the persisted
    //      reference a production stream would broadcast), and the
    //      per-doc coverage aggregates in Complete mode. Replayed
    //      input ⇒ batch-equal: the oracle is t54's, minus gram-less
    //      docs (a stream aggregate only emits keys it saw). ----
    Q("st20_stream_novelty",
      (s, dir) => {
        import s.implicits._
        import graft.operators.TextOps
        // fanout-aware parallelism (the ivfAssignVariant rationale, in
        // a microbatch): the batch's file splits can be far fewer than
        // the cores (one parquet split here), and the n-gram explode
        // multiplies per-row work by the shingle count — without the
        // repartition the WHOLE shingle+join fanout ran in a single
        // 2.2s task (round-20 stage profile). One doc-grain exchange
        // of the batch's text unlocks the fanout's parallelism; the
        // fanout factor (hundreds of grams per doc) dwarfs the one
        // extra copy of the text at any scale.
        val para = s.sparkContext.defaultParallelism
        val stream = StreamOps.readDocuments(s, dir).filter($"doc_id" >= 400)
          .repartition(para)
        val refGrams = Tables(s, dir, "documents").filter($"doc_id" < 400)
          .select(explode(TextOps.shingles($"text", 3)).as("g")).distinct()
        val grams = stream.select($"doc_id",
          explode(TextOps.shingles($"text", 3)).as("g"))
        val scored = grams
          .join(refGrams.withColumn("hit", lit(1L)), Seq("g"), "left_outer")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce($"hit", lit(0L))).as("n_known"))
        // the stateful aggregate's state is doc-grain (two longs per
        // doc) while the batch work is corpus-grain text: partitions
        // here buy fanout parallelism, not state-store cost (the
        // runToMemory default prices the state-heavy gates, which this
        // one is not) — derived from the session's core count, never a
        // constant
        StreamOps.runToMemory(s, scored, "st20_out", OutputMode.Complete(),
          shufflePartitions = para)
          .select($"doc_id", $"n_grams", $"n_known",
            round(lit(1.0) - $"n_known".cast("double")
              / $"n_grams".cast("double"), 4).as("novelty"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH refg AS (
             |  SELECT DISTINCT unnest($shinglesSqlStream) AS g
             |  FROM documents WHERE doc_id < 400),
             |dg AS (
             |  SELECT doc_id, unnest($shinglesSqlStream) AS g
             |  FROM documents WHERE doc_id >= 400)
             |SELECT dg.doc_id, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN refg.g IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_known,
             |  round(1.0 - CAST(sum(CASE WHEN refg.g IS NOT NULL
             |      THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 4) AS novelty
             |FROM dg LEFT JOIN refg ON dg.g = refg.g
             |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin)),

    // ---- streaming MICROBATCH lineage (st19): a RUNNING stream's
    //      per-microbatch OpenLineage RunEvents must parent correctly
    //      under the pipeline-level run and carry the DEFINITION's
    //      column lineage. The gate replays every captured event from
    //      a fresh definition report with the same identities
    //      (deterministic v3 batch runId over streamRunId:bN, parent
    //      facet, microbatch facet, eventTime) and requires EXACT
    //      string equality — parenting, run-id determinism, and the
    //      column-lineage facet all pinned at once. Complements lx05
    //      (pre-start definition lineage): this is the lineage the
    //      listener emits while the stream RUNS. ----
    Q("st19_stream_microbatch_lineage",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.streaming.Trigger
        val listener = graft.streaming.StreamLineageListener.install(s)
        val key = "spark.sql.shuffle.partitions"
        val prev = s.conf.get(key)
        try {
          s.conf.set(key, math.min(4, prev.toInt))
          val agg = StreamOps.hourlyCounts(StreamOps.readEvents(s, dir)).toDF()
          listener.trackPlan("st19_out", agg)
          // inline runToMemory: the query HANDLE is needed for the
          // pipeline-level runId every batch must parent under
          val q = agg.writeStream.outputMode(OutputMode.Complete())
            .format("memory").queryName("st19_out")
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          val streamRun = q.runId.toString
          // progress events arrive on the listener bus asynchronously
          // and PER MICROBATCH: stopping at the first match would
          // snapshot before later batches' events land (a regression in
          // batch 2+ would then pass on listener-bus timing). The run
          // is TERMINATED (AvailableNow), so the exact per-batch event
          // count is known from the query handle — recentProgress is
          // appended synchronously inside the stream thread, complete
          // once awaitTermination returns — and the listener renders
          // exactly ONE RunEvent per progress for a tracked plan: wait
          // for that exact count, deadline-bounded. (This replaced a
          // 2-second count-stability quiet period that idled every
          // invocation AFTER the last event had landed — round 19 —
          // and is strictly stronger: it waits for ALL batches'
          // events, not for a heuristic silence window.)
          def matching() = listener.openLineageEvents
            .count(_.contains("\"name\":\"st19_out\""))
          val expected = math.max(1, q.recentProgress.length)
          val deadline = System.currentTimeMillis() + 15000
          while (matching() < expected &&
            System.currentTimeMillis() < deadline) Thread.sleep(20)
          val evs = listener.openLineageEvents
            .filter(_.contains("\"name\":\"st19_out\""))
          val defRep = graft.lineage.LineageExtractor
            .reportStreamingDefinition(agg)
          val tsRe = "\"eventTime\":\"([^\"]+)\"".r
          val bidRe = "\"batchId\":(\\d+)".r
          val replayed = evs.nonEmpty && evs.forall { ev =>
            val ts = tsRe.findFirstMatchIn(ev).map(_.group(1)).getOrElse("")
            val bid = bidRe.findFirstMatchIn(ev).map(_.group(1)).getOrElse("-1")
            val runId = java.util.UUID.nameUUIDFromBytes(
              s"$streamRun:b$bid".getBytes(
                java.nio.charset.StandardCharsets.UTF_8)).toString
            val batchFacet =
              s""""microbatch":{"_producer":"urn:graft:spark-lineage",""" +
                s""""_schemaURL":"https://openlineage.io/spec/2-0-2/OpenLineage.json#/$$defs/RunFacet",""" +
                s""""batchId":$bid,"streamRunId":"$streamRun"}"""
            ev == defRep.openLineageJson(
              jobNamespace = "graft-streams", jobName = "st19_out",
              runId = runId, eventTime = ts,
              parent = Some((streamRun, "graft-streams", "st19_out")),
              extraRunFacets = Seq(batchFacet))
          }
          Seq(("microbatch_events_captured", evs.nonEmpty),
            ("microbatch_replays_definition_under_parent", replayed))
            .toDF("chk", "ok").orderBy($"chk")
        } finally {
          s.conf.set(key, prev)
          s.streams.removeListener(listener)
        }
      },
      Some("""SELECT * FROM (VALUES
             |  ('microbatch_events_captured', true),
             |  ('microbatch_replays_definition_under_parent', true))
             |  AS t(chk, ok)
             |ORDER BY chk""".stripMargin)),

    // ---- foreachBatch MULTI-SINK lineage (st21, round 19, r18 verdict
    //      #5): lx17 pins per-output attribution for a batch builder
    //      writing 3 sinks; st19 pins microbatch lineage for ONE
    //      memory sink. This closes the remaining corner: a RUNNING
    //      stream whose foreachBatch writes TWO parquet sinks per
    //      micro-batch. The QueryExecutionListener sees one write
    //      command per sink — each report must carry its OWN output
    //      entity and column lineage — but the batch DataFrame is the
    //      runner's materialized LogicalRDD, so the source layer is
    //      opaque at batch level; stitchMicrobatchReport bridges each
    //      ref through the stream DEFINITION's column lineage (out col
    //      → batch col → streaming source col) and substitutes the
    //      definition's FileSource input — the OpenLineage
    //      parent-facet composition, gated row-exact. ----
    Q("st21_foreach_batch_multi_sink_lineage",
      (s, dir) => {
        import graft.lineage._
        import org.apache.spark.sql.streaming.Trigger
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_st21").toString
        val ev = StreamOps.readEvents(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val listener = LineageListener.install(s)
        val reports = try {
          val q = ev.writeStream
            .foreachBatch {
              (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
               _: Long) =>
                batch.filter(col("event_type") === "purchase")
                  .select(col("event_id"), col("user_id"), col("value"))
                  .write.mode("append").parquet(s"$tmp/purchases")
                batch.groupBy(col("event_type"))
                  .agg(count(lit(1)).as("n"),
                    round(sum(col("value")), 2).as("sum_v"))
                  .write.mode("append").parquet(s"$tmp/by_type")
                ()
            }
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          def seen = listener.reports
            .filter(_._2.outputs.exists(_.contains("graft_st21")))
          val deadline = System.currentTimeMillis() + 15000
          while (seen.flatMap(_._2.outputs).distinct.size < 2 &&
            System.currentTimeMillis() < deadline) Thread.sleep(50)
          seen
        } finally s.listenerManager.unregister(listener)
        val sinkNames = reports.flatMap(_._2.outputs).distinct
          .map(_.stripSuffix("/").split('/').last).sorted
        require(sinkNames == Seq("by_type", "purchases"),
          s"expected 2 foreachBatch sinks, listener observed: $sinkNames")
        val defRep = LineageExtractor.reportStreamingDefinition(ev)
        val rows = reports.flatMap { case (_, rep) =>
          val stitched = LineageExtractor.stitchMicrobatchReport(rep, defRep)
          val sink = stitched.outputs.find(_.contains("graft_st21")).get
            .stripSuffix("/").split('/').last
          val colRows = stitched.columnLineage.toSeq.flatMap {
            case (out, refs) => refs.toSeq.map(r =>
              (s"$sink/$out", r.table, r.column))
          }
          // the stitched input is the stream's FileSource entity; its
          // name embeds the (sf-dependent) path, so pin kind + format
          val inRows = stitched.inputs.map(m =>
            (s"_input/$sink", m.name.takeWhile(_ != '['), m.format))
          colRows ++ inRows
        }.distinct
        s.createDataFrame(rows)
          .toDF("out_col", "src_table", "src_col")
          .orderBy("out_col", "src_table", "src_col")
      },
      // n = count(1) carries no column refs (the lx05 rule)
      Some("""SELECT * FROM (VALUES
             |  ('_input/by_type', 'FileSource', 'streaming'),
             |  ('_input/purchases', 'FileSource', 'streaming'),
             |  ('by_type/event_type', 'StreamingRelation', 'event_type'),
             |  ('by_type/sum_v', 'StreamingRelation', 'value'),
             |  ('purchases/event_id', 'StreamingRelation', 'event_id'),
             |  ('purchases/user_id', 'StreamingRelation', 'user_id'),
             |  ('purchases/value', 'StreamingRelation', 'value'))
             |  AS t(out_col, src_table, src_col)
             |ORDER BY out_col, src_table, src_col""".stripMargin))
  )
}
