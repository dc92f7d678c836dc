package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table: file-source
  * reads, watermarked window aggregation, and custom sessionization state
  * via `flatMapGroupsWithState` (SURVEY §2.6: absent from the reference —
  * engine-surface stretch scope).
  *
  * Scale design: state is keyed by `user_id`, so the state store shards
  * with the shuffle partitioning; watermarks bound state size (events
  * older than the watermark are finalized and dropped). The same code
  * runs against a Kafka source by swapping `readStream.parquet` for
  * `readStream.format("kafka")`.
  */
object StreamOps {

  /** events schema as stored, with the ts slot filled in from the actual
    * file (file streams require an explicit schema, and the generator has
    * shipped ts as TIMESTAMP(NANOS)-as-long AND as timestamp[us]/NTZ
    * across testdata generations — declaring the wrong one silently
    * corrupts every event-time by 1000×). */
  def eventsRawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Streaming read of the events parquet, normalized to session-zone
    * TimestampType exactly like the batch path (Tables.normalizeEventTs).
    * The stored ts type is probed with one driver-side batch footer read —
    * metadata-only, no data scan — then the stream declares that type and
    * converts: legacy nanos-long → `div 1000` → micros; TIMESTAMP_NTZ →
    * cast (session TZ is UTC, so values are unchanged). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val storedTs = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val raw = spark.readStream.schema(eventsRawSchema(storedTs))
      // file streams require a directory source; select just the events
      // file(s) from the scale-factor dir
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    storedTs match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — testdata schema " +
        "drifted again; align with Tables.normalizeEventTs")
    }
  }

  /** Watermarked sliding-window aggregation. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))

  final case class Ev(event_id: Long, sec: Long, user_id: Long)
  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long, start_sec: Long, end_sec: Long)
  final case class SessState(nSessions: Long)

  final case class EvType(user_id: Long, event_type: String)
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-user per-type running counts on Spark 4's `transformWithState`
    * (the arbitrary-state successor of `flatMapGroupsWithState`): a
    * `MapState[event_type, count]` per user updated row-by-row, the key's
    * full state re-emitted each batch (Update mode) — the incremental
    * per-entity profile shape (feature stores, abuse counters). State
    * lives in the RocksDB state-store provider (the only provider the
    * operator supports — callers set the provider conf before starting);
    * keyed by user it shards with the shuffle, and a non-NONE `ttl`
    * bounds unbounded key spaces at production scale (a user idle past
    * the TTL evicts; its counts restart — the profile/state trade).
    */
  class TypeCountProcessor(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvType, TypeCount] {
    import org.apache.spark.sql.streaming.{MapState, TimeMode, TimerValues}
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[EvType],
        tv: TimerValues): Iterator[TypeCount] = {
      rows.foreach { e =>
        val cur =
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L
        counts.updateValue(e.event_type, cur + 1L)
      }
      counts.iterator().map { case (t, n) => TypeCount(key, t, n) }
    }
  }

  /** See [[TypeCountProcessor]]. */
  def typeCounts(events: DataFrame,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[TypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type")).as[EvType]
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor(ttl),
        timeModeFor(ttl), OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[TypeCount]])
  }

  /** State TTL is evaluated against processing time, so any non-NONE TTL
    * requires `TimeMode.ProcessingTime()`; the gates run `TimeMode.None()`
    * (no TTL bookkeeping columns in the state rows at all).
    */
  private def timeModeFor(ttl: org.apache.spark.sql.streaming.TTLConfig)
      : org.apache.spark.sql.streaming.TimeMode =
    if (ttl == org.apache.spark.sql.streaming.TTLConfig.NONE)
      org.apache.spark.sql.streaming.TimeMode.None()
    else org.apache.spark.sql.streaming.TimeMode.ProcessingTime()

  /** documents schema as stored (file streams require an explicit schema). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming read of the documents parquet. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  final case class DocBucket(bucket_key: Long, doc_id: Long)
  final case class BucketMin(doc_id: Long, min_id: Long)

  /** Per-bucket minimum doc id across every batch seen so far: one
    * `ValueState[Long]` per SimHash band bucket. The state is the whole
    * dedup index — a long per OCCUPIED bucket, sharded by the bucket-key
    * shuffle; arriving docs read/update only the buckets they land in.
    */
  class BucketMinProcessor(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, DocBucket, BucketMin] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, ValueState}
    @transient private var minId: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      minId = getHandle.getValueState[Long]("min_id",
        org.apache.spark.sql.Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[DocBucket],
        tv: TimerValues): Iterator[BucketMin] = {
      // the batch min must be known before any row is emitted, so the
      // group's doc ids are buffered — as a primitive long array, not
      // the case-class objects (a boilerplate-heavy batch can drop
      // millions of docs into one bucket; 8 bytes/doc buys headroom the
      // object form would burn 5-10x of)
      val ids = new scala.collection.mutable.ArrayBuilder.ofLong
      var mn = if (minId.exists()) minId.get() else Long.MaxValue
      rows.foreach { r =>
        ids += r.doc_id
        if (r.doc_id < mn) mn = r.doc_id
      }
      minId.update(mn)
      val m = mn
      ids.result().iterator.map(id => BucketMin(id, m))
    }
  }

  /** Streaming near-dedup candidates: the incremental-ingest shape of the
    * batch MinHash/SimHash pipelines (d02/d03) — every arriving document
    * is checked against ALL previously ingested documents without
    * rescanning them, because the only state the operator keeps is the
    * minimum doc id per SimHash band bucket ([[BucketMinProcessor]]).
    *
    * Banding: the portable 63-bit-md5 SimHash signature (same
    * construction the d03/d08 oracles replicate in SQL) split into
    * `nBands` chunks of `bandBits` bits; hamming <= nBands-1 near-dups
    * share a chunk by pigeonhole. Emits one (doc_id, bucket min id) row
    * per chunk; a doc is a CANDIDATE near-dup iff any of its buckets has
    * min id < doc_id, and `least(min_id, doc_id)` is its canonical — the
    * caller reduces with a per-doc min (the st11 gate's post-sink
    * aggregate) and, in production, verifies candidates with an exact
    * hamming/Jaccard check downstream (same contract as the batch
    * banding).
    *
    * SIZE THE BANDS TO THE CORPUS: a band is useful only while its 2^
    * bandBits bucket space is sparse — once ingest approaches that
    * scale, every bucket is owned by some earlier doc and everything
    * flags as a candidate. The 4×16-bit default matches the
    * SQL-replicable gate at test scale; billions of docs want 2×31-bit
    * bands here (weaker pigeonhole, verified downstream) or a longer
    * signature upstream. State is bounded by nBands·2^bandBits either
    * way — the index never grows with corpus size, unlike a
    * stream-stream self-join whose state holds every prior document.
    */
  def nearDupBucketMins(
      docs: DataFrame, bandBits: Int = 16, nBands: Int = 4,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[BucketMin] = {
    // 64, not 63: the portable signature's bit 63 is always 0 (the token
    // hash is 63-bit), so the top band of a 4x16 split carries one
    // constant bit — harmless, it only makes that band's pigeonhole a
    // fraction weaker
    require(bandBits >= 1 && nBands >= 1 && bandBits * nBands <= 64,
      s"need bandBits*nBands <= 64, got $bandBits x $nBands")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = graft.operators.TextOps.tokens(col("text"))
    val sig = graft.functions.HashExprs.simhash64(
      transform(toks, t => graft.operators.Dedup.portableTokenHash63(t)))
    val mask = (1L << bandBits) - 1L
    val chunks = docs
      .filter(size(toks) > 0)
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"), explode(array((0 until nBands).map { i =>
        // band index in the bits ABOVE the widest chunk space keeps
        // keys collision-free across bands
        lit(i.toLong << bandBits) +
          shiftright(col("sig"), bandBits * i).bitwiseAND(lit(mask))
      }: _*)).as("bucket_key"))
      .select(col("bucket_key"), col("doc_id"))
    chunks.as[DocBucket]
      .groupByKey(_.bucket_key)
      .transformWithState(new BucketMinProcessor(ttl),
        timeModeFor(ttl), OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[BucketMin]])
  }

  final case class AsofEv(user_id: Long, us: Long, is_right: Boolean, event_id: Long)
  final case class AsofMatch(event_id: Long, user_id: Long, p_us: Long, c_us: Long)

  /** Streaming as-of join: each left row matches the LATEST right row
    * with the same key and timestamp at-or-before its own — the
    * incremental shape of the native batch as-of ([[graft.plans.AsOf]]),
    * for "enrich each trade with the prevailing quote" pipelines where
    * the right side is a slowly-updating reference stream.
    *
    * State per key is the right-side timestamp history in a RocksDB
    * `ListState[Long]`: a batch APPENDS its right rows (no rewrite) and
    * reads the history once per touched key, so per-batch cost is
    * O(history read + batch log-inserts), never a stream-stream join
    * whose state retains full rows of BOTH sides. Within a batch rows
    * process in timestamp order (rights before lefts on ties, matching
    * the >= contract); a late LEFT row still matches exactly (history is
    * complete), a late RIGHT row matches only future lefts.
    *
    * The right history grows with reference-stream volume per key; a
    * non-NONE `ttl` bounds it: list ENTRIES older than the TTL (by
    * processing time of their append) evict, so a key's state holds only
    * the TTL window of right rows. A left arriving after every right in
    * its key's window expired goes unmatched — the state/completeness
    * trade, chosen per deployment (StreamingSpec proves the eviction).
    */
  class StreamAsofProcessor(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, AsofEv, AsofMatch] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues}
    @transient private var rights: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      rights = getHandle.getListState[Long]("rights",
        org.apache.spark.sql.Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[AsofEv],
        tv: TimerValues): Iterator[AsofMatch] = {
      // history as a sorted primitive array (appended per-batch in event
      // order, so cross-batch late rights are the only disorder — sort
      // is O(n) on nearly-sorted input with java.util.Arrays.sort's
      // TimSort-for-objects... primitives use dual-pivot; still cheap)
      val hist0 = {
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        rights.get().foreach(b += _)
        b.result()
      }
      java.util.Arrays.sort(hist0)
      // rights first on timestamp ties: the as-of contract is >=
      val batch = rows.toArray
      scala.util.Sorting.stableSort(batch,
        (a: AsofEv, b: AsofEv) =>
          a.us < b.us || (a.us == b.us && a.is_right && !b.is_right))
      var hist = java.util.Arrays.copyOf(hist0, hist0.length + batch.count(_.is_right))
      var n = hist0.length
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
      val newRights = new scala.collection.mutable.ArrayBuilder.ofLong
      batch.foreach { e =>
        if (e.is_right) {
          // insert keeping sorted: find insertion point from the end
          // (in-order arrivals append in O(1))
          var i = n
          while (i > 0 && hist(i - 1) > e.us) { hist(i) = hist(i - 1); i -= 1 }
          hist(i) = e.us
          n += 1
          newRights += e.us
        } else {
          // greatest right ts <= e.us via binary search over hist[0, n)
          var lo = 0; var hi = n
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (hist(mid) <= e.us) lo = mid + 1 else hi = mid
          }
          if (lo > 0) out += AsofMatch(e.event_id, key, e.us, hist(lo - 1))
        }
      }
      val nr = newRights.result()
      if (nr.nonEmpty) rights.appendList(nr)
      out.iterator
    }
  }

  /** See [[StreamAsofProcessor]]. `left` needs (event_id, user_id, us);
    * `right` needs (user_id, us). Inner semantics: unmatched lefts drop.
    */
  def streamAsof(left: DataFrame, right: DataFrame,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[AsofMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    val tagged = left
      .select(col("user_id"), col("us"), lit(false).as("is_right"), col("event_id"))
      .unionByName(right.select(col("user_id"), col("us"),
        lit(true).as("is_right"), lit(-1L).as("event_id")))
      .as[AsofEv]
    tagged.groupByKey(_.user_id)
      .transformWithState(new StreamAsofProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[AsofMatch]])
  }

  case class CdcEv(user_id: Long, event_id: Long, us: Long, v: String)
  case class CdcChange(user_id: Long, event_id: Long, change_type: String)

  /** Streaming change-data capture: the incremental shape of the batch
    * [[graft.operators.Mutations.snapshotDiff]]. Each key's arriving
    * values compare against the last RETAINED value (a `ValueState`
    * string, O(1) per key — never a prior-rows rescan): the first value
    * for a key emits `insert`, a differing value emits `update`, an
    * equal value is SUPPRESSED — Debezium-style redelivery compaction,
    * so downstream consumers (an incremental dedup or index maintenance
    * job) see each logical change exactly once. Deletes need a
    * tombstone value in the stream, which flows through as an ordinary
    * change.
    *
    * Within a batch a key's rows process in (us, event_id) order — the
    * total order the oracle's `lag()` window replays. A non-NONE `ttl`
    * evicts idle keys' last-value state; a key resuming after eviction
    * re-reports `insert` (at-least-once change semantics under bounded
    * state — the CDC version of the st12 trade).
    */
  class ChangeCaptureProcessor(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, CdcEv, CdcChange] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, ValueState}
    @transient private var last: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[String]("last",
        org.apache.spark.sql.Encoders.STRING, ttl)

    override def handleInputRows(key: Long, rows: Iterator[CdcEv],
        tv: TimerValues): Iterator[CdcChange] = {
      val batch = rows.toArray
      scala.util.Sorting.stableSort(batch,
        (a: CdcEv, b: CdcEv) =>
          a.us < b.us || (a.us == b.us && a.event_id < b.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[CdcChange]
      var prev = if (last.exists()) Option(last.get()) else None
      batch.foreach { e =>
        prev match {
          case None =>
            out += CdcChange(key, e.event_id, "insert"); prev = Some(e.v)
          case Some(p) if p != e.v =>
            out += CdcChange(key, e.event_id, "update"); prev = Some(e.v)
          case _ => () // redelivery of the current value: suppressed
        }
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** See [[ChangeCaptureProcessor]]. `events` needs
    * (user_id, event_id, us, v). */
  def changeCapture(events: DataFrame,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[CdcChange] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"), col("us"), col("v"))
      .as[CdcEv]
      .groupByKey(_.user_id)
      .transformWithState(new ChangeCaptureProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[CdcChange]])
  }

  case class FunnelEv(user_id: Long, us: Long, si: Int)
  case class FunnelSt(depth: Int, last: Long)
  case class FunnelDepth(user_id: Long, depth: Int)

  /** Streaming funnel matching: the incremental shape of the batch
    * [[graft.operators.Sequences.funnelDepth]] (q104). Per-key state is a
    * single (depth, last-match-ts) pair — O(1) per key regardless of
    * event volume, against the batch fold's O(events-per-key) array —
    * advanced by the same greedy first-match rule: a row extends the
    * funnel iff its step index equals the current depth and its
    * timestamp is strictly later than the previous match. Each batch
    * re-emits the key's depth (Update mode), so the sink always holds
    * the latest funnel position per key.
    *
    * Equals the batch fold exactly when each key's events arrive in
    * timestamp order ACROSS batches (within a batch the processor sorts,
    * so single-file replay is always exact). An event arriving after a
    * later-timestamped event has already matched cannot retro-extend the
    * chain — the cursor only moves forward. That is the O(1)-state
    * trade, the funnel analog of st13's last-value-only CDC state; a
    * non-NONE `ttl` additionally restarts idle keys' funnels from depth
    * 0 on resume (at-least-once depth regression under bounded state).
    */
  class FunnelProcessor(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FunnelEv, FunnelDepth] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, ValueState}
    @transient private var st: ValueState[FunnelSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelSt]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelSt], ttl)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEv],
        tv: TimerValues): Iterator[FunnelDepth] = {
      val batch = rows.toArray
      // (us, si) order: equal-timestamp rows try the lower step first,
      // and the strict `us > last` guard still rejects a same-timestamp
      // second step — identical tie semantics to the batch sort_array
      scala.util.Sorting.stableSort(batch,
        (a: FunnelEv, b: FunnelEv) =>
          a.us < b.us || (a.us == b.us && a.si < b.si))
      var s = if (st.exists()) st.get() else FunnelSt(0, Long.MinValue)
      batch.foreach { e =>
        if (e.si == s.depth && e.us > s.last) s = FunnelSt(s.depth + 1, e.us)
      }
      st.update(s)
      Iterator.single(FunnelDepth(key, s.depth))
    }
  }

  /** See [[FunnelProcessor]]. `events` needs (user_id, us, event_type);
    * rows outside the step set are dropped BEFORE the stateful shuffle
    * (the same per-key state bound as the batch operator — irrelevant
    * event types never reach the state store). */
  def streamFunnel(events: DataFrame, steps: Seq[String],
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE): Dataset[FunnelDepth] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1): org.apache.spark.sql.Column) {
      case (acc, (v, i)) => when(col("event_type") === v, lit(i)).otherwise(acc)
    }
    events.filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("us"), stepIdx.as("si"))
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(ttl),
        timeModeFor(ttl), OutputMode.Update(),
        implicitly[org.apache.spark.sql.Encoder[FunnelDepth]])
  }

  /** Stateful sessionization: gap > `gapSec` starts a new session. Emits
    * every session of the batch (single-batch file input ⇒ complete,
    * deterministic output identical to the batch window-function
    * formulation in q27_sessionize).
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val evs = events
      .select(col("event_id"), unix_timestamp(col("ts")).as("sec"), col("user_id"))
      .as[Ev]

    def fn(userId: Long, it: Iterator[Ev], state: GroupState[SessState])
        : Iterator[SessionOut] = {
      val evsSorted = it.toSeq.sortBy(e => (e.sec, e.event_id))
      if (evsSorted.isEmpty) Iterator.empty
      else {
        val base = state.getOption.map(_.nSessions).getOrElse(0L)
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var sid = base
        var n = 0L
        var start = 0L
        var last = Long.MinValue
        evsSorted.foreach { e =>
          if (last == Long.MinValue || e.sec - last > gapSec) {
            if (n > 0) out += SessionOut(userId, sid, n, start, last)
            sid += 1; n = 0; start = e.sec
          }
          n += 1; last = e.sec
        }
        if (n > 0) out += SessionOut(userId, sid, n, start, last)
        state.update(SessState(sid))
        out.iterator
      }
    }

    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming exact dedup on a key subset: watermarked state eviction via
    * `dropDuplicatesWithinWatermark` (keys older than the watermark are
    * dropped from the state store — bounded state at 100 TB, unlike plain
    * `dropDuplicates`, whose state grows without bound). Only the key
    * columns are emitted: the first-arrival payload of a duplicate key
    * depends on scheduling order, the key set does not.
    *
    * NOTE: equals a batch DISTINCT only when every recurrence of a key
    * falls within the watermark horizon of its first arrival (true for the
    * single-file single-batch replay the gate runs); beyond the horizon a
    * key is re-emitted by design — that is the state/exactness trade.
    */
  def dedupKeys(events: DataFrame, keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      .select(keys.map(col): _*)

  final case class Latest(user_id: Long, us: Long, event_id: Long, value: Double)

  /** CDC-style latest-value snapshot: per key, keep the event with the
    * greatest (ts, event_id) and emit it only when it CHANGES — the
    * streaming materialization of "current state of every entity" that an
    * upsert sink (Delta/HBase/keyed parquet) consumes downstream.
    *
    * State is exactly one row per key (bounded by entity cardinality, not
    * stream length), and Update mode emits only changed keys per batch —
    * at 100 TB/day of events over ~1e9 entities this is the shape that
    * works: no rescan, no window over history. Late events older than the
    * stored row are absorbed without emission (the tiebreak makes
    * concurrent-equal timestamps deterministic).
    */
  def latestSnapshot(events: DataFrame): Dataset[Latest] = {
    val spark = events.sparkSession
    import spark.implicits._
    val evs = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[Latest]

    def fn(uid: Long, it: Iterator[Latest], state: GroupState[Latest])
        : Iterator[Latest] = {
      val prev = state.getOption
      val mx = (prev.iterator ++ it).maxBy(e => (e.us, e.event_id))
      if (prev.contains(mx)) Iterator.empty
      else { state.update(mx); Iterator.single(mx) }
    }

    evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Run a stream through a `foreachBatch` sink that appends each
    * micro-batch to a parquet directory — the arbitrary-sink escape hatch
    * (upserts, JDBC, multi-table writes) exercised with a file target;
    * returns the materialized output.
    *
    * `outPath` must be fresh per run: append mode plus no checkpoint means
    * a rerun (or a production batch retry) double-writes — a durable
    * deployment passes `checkpointLocation` and makes the batch write
    * idempotent (e.g. overwrite-by-batch-id partitions). */
  def runForeachBatchToParquet(
      spark: SparkSession, df: DataFrame, outPath: String): DataFrame = {
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(outPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outPath)
  }

  /** Streaming upsert sink (the CDC-apply half of st13's change
    * detection): maintain a keyed LATEST-WINS table across micro-batches
    * via `foreachBatch` + [[graft.operators.Mutations.mergeInto]] — the
    * pattern every lakehouse streaming ingest runs (Delta/Iceberg
    * `foreachBatch { merge }`), here against the engine's own MERGE.
    *
    * Latest-wins is engineered ORDER-COMMUTATIVE: each batch first
    * reduces to one row per key (argmax of the `verCols` version vector
    * — unique per key by contract, so payload columns never decide),
    * then merges with an update set that keeps whichever side's version
    * is newer. The final table therefore equals the global per-key
    * argmax REGARDLESS of how the source chopped rows into micro-batches
    * — replay, reordering, and batch-boundary placement cannot change
    * the result (the exactly-once-effect property idempotent sinks need;
    * a naive "batch overwrites" upsert is wrong under reordering).
    *
    * Driver/state discipline: the evolving target rides an
    * [[graft.operators.IterativeLoop]] — each batch's merged state is
    * materialized (localCheckpoint) and its predecessor released, so
    * plan depth and block storage stay O(1) in the batch count; the
    * returned table is a self-contained handoff. Scale shape per batch:
    * the batch-side reduce is batch-grain; the merge is the mergeInto
    * broadcast-3-join (the target never shuffles).
    *
    * @param verCols version columns, lexicographically compared; must be
    *        unique per key across the whole stream (e.g. event time +
    *        a unique event id).
    * @return the final keyed table after the stream drains.
    */
  def runLatestUpsert(spark: SparkSession, stream: DataFrame, keyCol: String,
      verCols: Seq[String]): DataFrame = {
    require(verCols.nonEmpty, "verCols must be non-empty")
    val loop = new graft.operators.IterativeLoop()
    var target: Option[DataFrame] = None
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          val others = batch.columns.filterNot(_ == keyCol).toSeq
          // batch-local argmax of the version vector (others ride along
          // in the struct but can never decide: verCols are unique)
          val reduced = batch.groupBy(col(keyCol))
            .agg(max(struct(
              (verCols ++ others.filterNot(verCols.contains)).map(col): _*))
              .as("_m"))
            .select(col(keyCol) +: others.map(c => col(s"_m.$c").as(c)): _*)
          val merged = target match {
            case None => reduced
            case Some(t) =>
              val batchNewer = struct(verCols.map(c => col(s"_b_$c")): _*) >
                struct(verCols.map(col): _*)
              graft.operators.Mutations.mergeInto(t, reduced, keyCol,
                updateSet = others.map(c =>
                  c -> when(batchNewer, col(s"_b_$c")).otherwise(col(c))).toMap)
          }
          target = Some(loop.advance(merged, forceCheckpoint = true))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      target match {
        case Some(_) => loop.handoff()
        case None => loop.abort(); stream.sparkSession.emptyDataFrame
      }
    } catch { case t: Throwable => loop.abort(); throw t }
  }

  /** Run a streaming DataFrame to completion against finite file input via
    * a memory sink; returns the materialized result table.
    *
    * Stateful operators allocate one state store per shuffle partition,
    * each with per-batch snapshot/maintenance cost; replaying a bounded
    * file source on one node wants few, fat partitions (a production
    * cluster sizes this to sustained throughput instead — it is a
    * deployment knob, not a semantics change). Restored after the run.
    */
  def runToMemory(
      spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode, shufflePartitions: Int = 4,
      stateProvider: Option[String] = None): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    val prevProv = spark.conf.getOption(provKey)
    // state-store instances (and their per-batch commits) scale with the
    // stateful operator's shuffle partition count; 4 is plenty for the
    // replay volumes here and halves the fixed per-batch cost vs 8 — a
    // real cluster sizes this to state volume, not core count. The two
    // production knobs past that point — MORE state partitions and the
    // RocksDB provider — are parameters so the ScaleProbe state-ladder
    // knob matrix can PRICE them instead of prescribing them unmeasured
    // (round-17 verdict #3); gates keep the defaults. The requested
    // count is set VERBATIM: clamping to the session's partition count
    // (a CPU-derived value) would silently run a "32 parts" matrix row
    // at fewer partitions on a narrow host and mislabel the measured
    // price (ADVICE r18).
    spark.conf.set(key, shufflePartitions)
    stateProvider.foreach(spark.conf.set(provKey, _))
    try {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set(key, prev)
      if (stateProvider.isDefined) prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
    spark.table(name)
  }

  /** [[runToMemory]] against the no-op sink: returns only the sink's
    * total output-row count (summed over the run's progress events)
    * instead of materializing the result table. Exists for probes that
    * push STATE past the heap deliberately (the ScaleProbe crossover
    * rung): a memory sink would buffer every output row on-heap and
    * confound the state-store memory wall with sink memory, so the
    * variant under test must not pay a sink that scales with output. */
  def runToNoop(
      spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode, shufflePartitions: Int = 4,
      stateProvider: Option[String] = None): Long = {
    val key = "spark.sql.shuffle.partitions"
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(key, shufflePartitions)
    stateProvider.foreach(spark.conf.set(provKey, _))
    try {
      val q = df.writeStream
        .outputMode(mode)
        .format("noop")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.map(p => Option(p.sink).map(_.numOutputRows)
        .getOrElse(0L)).sum
    } finally {
      spark.conf.set(key, prev)
      if (stateProvider.isDefined) prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
