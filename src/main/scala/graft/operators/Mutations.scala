package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot mutation operators: CDC-style diff between two snapshots of a
  * keyed table, and SCD Type-2 merge (dimension-history maintenance) —
  * what an incremental corpus or warehouse pipeline runs when a source
  * re-delivers a full snapshot and history must be preserved.
  *
  * Scale notes (100 TB): both operators are ONE key-grain shuffle — the
  * information-theoretic minimum for exact keyed comparison. Attribute
  * comparison is null-safe struct equality (`<=>`), fully codegen'd — no
  * UDFs, no row hashing (a hash would save no shuffle here and adds
  * collision risk). `scd2Merge` never joins the history: closed rows pass
  * through on a filter, only CURRENT rows meet the batch, and a small
  * batch broadcasts so the dimension does not shuffle at all.
  *
  * The batch broadcast is SIZE-GATED everywhere ([[maybeBroadcast]], the
  * [[Layout.readWithDeletes]] discipline applied to the whole merge
  * family): while Catalyst's size estimate for the batch stays under
  * `broadcastBytesMax` the hint applies and the target never shuffles;
  * past the cap the hint is withheld and the planner falls back to a
  * shuffled merge — one exchange of the target, the honest degraded mode
  * for a backfill or late-arriving-day batch — instead of the driver/
  * executor OOM cliff an unconditional hint would force.
  */
object Mutations {

  /** Default size-estimate cap under which a merge batch is
    * broadcast-hinted. Plan-stat bytes are in-memory row estimates
    * (wider than parquet-compressed on-disk bytes), so 64 MB here is the
    * same order of broadcast as [[Layout.DefaultDeleteBroadcastBytes]]'s
    * 32 MB on-disk cap — inside executor headroom with margin, far above
    * any trigger-bounded CDC micro-batch. */
  val DefaultBatchBroadcastBytes: Long = 64L << 20

  /** Catalyst's size estimate for `df` (optimized-plan statistics — a
    * driver-side computation, no job). File-backed frames estimate from
    * file bytes; in-memory relations from exact row sizes. */
  def planBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Broadcast `df` only while [[planBytes]] fits `bytesMax` — the shared
    * size gate of the merge family (and the DataFrame sibling of
    * [[Layout.readWithDeletes]]'s on-disk gate). Above the cap the frame
    * returns unhinted: the join shuffles (AQE may still broadcast at
    * runtime if actual stats allow), which degrades the plan instead of
    * the process. */
  def maybeBroadcast(df: DataFrame,
      bytesMax: Long = DefaultBatchBroadcastBytes): DataFrame =
    if (planBytes(df) <= BigInt(bytesMax)) broadcast(df) else df

  private def attrStruct(df: DataFrame, keys: Seq[String], as: String): DataFrame = {
    val attrs = df.columns.filterNot(keys.contains).sorted
    df.select(keys.map(col) :+ struct(attrs.map(col): _*).as(as): _*)
  }

  /** Classify every key that CHANGED between two snapshots as
    * insert / update / delete (unchanged keys are dropped — at scale the
    * diff is small and the unchanged bulk must not be materialized).
    * Returns `keys :+ change_type`, one row per changed key.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      s"snapshot schemas differ: ${oldSnap.columns.sorted.mkString(",")} vs " +
        newSnap.columns.sorted.mkString(","))
    val o = attrStruct(oldSnap, keys, "_old")
    val n = attrStruct(newSnap, keys, "_new")
    // full-outer on the key: absence on either side IS the signal, so the
    // struct's nullness discriminates insert/delete from update
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .when(!(col("_old") <=> col("_new")), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }

  /** SCD Type-1 upsert (MERGE INTO … WHEN MATCHED UPDATE, WHEN NOT
    * MATCHED INSERT): the batch's version of every key it carries wins;
    * untouched keys pass through. No history — the overwrite-in-place
    * sibling of [[scd2Merge]].
    *
    * Plan: one size-gated broadcast anti-join (dimension vs the small
    * batch's keys) plus the batch union'd on top — the dimension never
    * shuffles while the batch fits [[maybeBroadcast]]'s cap (an
    * over-cap batch degrades to a shuffled anti-join), and unlike a
    * full-outer MERGE encoding no wide row comparison happens at all
    * (type-1 does not care whether attrs changed).
    */
  def scd1Upsert(dim: DataFrame, updates: DataFrame, key: String,
      broadcastBytesMax: Long = DefaultBatchBroadcastBytes): DataFrame = {
    require(dim.columns.sorted.sameElements(updates.columns.sorted),
      s"dimension/batch schemas differ: ${dim.columns.sorted.mkString(",")} vs " +
        updates.columns.sorted.mkString(","))
    val keys = maybeBroadcast(updates.select(col(key).as("_ukey")),
      broadcastBytesMax)
    dim.join(keys, dim(key) === keys("_ukey"), "left_anti")
      .unionByName(updates.select(dim.columns.map(col): _*))
  }

  /** Generic three-clause MERGE (the full MERGE INTO surface every table
    * format exposes): against a keyed `target`,
    *
    *  - a `batch` row matching a target key with `deleteWhen` true
    *    REMOVES the row (WHEN MATCHED AND cond THEN DELETE);
    *  - a matching row otherwise UPDATES it — by default the batch row
    *    replaces the target row wholesale; `updateSet` overrides
    *    per-column with expressions over BOTH sides (WHEN MATCHED THEN
    *    UPDATE SET c = expr) — target columns under their own names,
    *    batch columns prefixed `_b_` (e.g. accumulate:
    *    `Map("value" -> col("value") + col("_b_value"))`);
    *  - a non-matching batch row with `deleteWhen` false INSERTS as-is
    *    (WHEN NOT MATCHED THEN INSERT); a non-matching delete is a no-op
    *    (standard MERGE semantics).
    *
    * `deleteWhen` classifies BATCH rows, so it references batch columns
    * only (`_b_` prefix) — it must resolve on the insert branch too,
    * where no target row exists. Batch keys MUST be unique (standard
    * MERGE semantics — SQL MERGE raises on a duplicate match). This
    * implementation does not deduplicate: a key appearing k times in the
    * batch joins each matching target row k times, so a matched target
    * row is EMITTED k times (and a delete/insert classification applies
    * per copy) — silent row multiplication, not an arbitrary pick. Pass
    * `validateKeys = true` to pay one key-grain count on the batch and
    * fail loudly instead; callers that reduce the batch to one row per
    * key first (e.g. [[graft.streaming.StreamOps]]'s latest-wins
    * pre-reduce) skip the check.
    *
    * Plan (the [[scd2Merge]] discipline — the batch is small by
    * construction, so every join builds on it and the huge target NEVER
    * shuffles): (1) target LEFT OUTER broadcast(batch) keeps/updates/
    * drops rows map-side; (2) matched keys come from a key-column-pruned
    * broadcast semi-join (result ≤ |batch| → itself broadcast);
    * (3) batch ANTI broadcast(matched) emits the inserts, also
    * map-side. Two target scans (one key-only) buy zero target
    * shuffles. All three hints ride ONE size gate on the batch's
    * estimate ([[maybeBroadcast]] — `matched` is a key-pruned subset of
    * the batch, so the batch fitting implies it fits): an over-cap
    * batch (a backfill, a late-arriving day) degrades every join to its
    * shuffled form instead of forcing a broadcast OOM.
    */
  def mergeInto(target: DataFrame, batch: DataFrame, key: String,
      deleteWhen: Column = lit(false),
      updateSet: Map[String, Column] = Map.empty,
      broadcastBytesMax: Long = DefaultBatchBroadcastBytes,
      validateKeys: Boolean = false): DataFrame = {
    require(target.columns.sorted.sameElements(batch.columns.sorted),
      s"target/batch schemas differ: ${target.columns.sorted.mkString(",")} vs " +
        batch.columns.sorted.mkString(","))
    require(!updateSet.contains(key), "updateSet must not rewrite the key")
    if (validateKeys) {
      val dup = batch.groupBy(col(key)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"mergeInto: batch carries duplicate key ${dup.head.get(0)} " +
          s"(x${dup.head.getLong(1)}) — duplicate batch keys multiply " +
          "matched target rows; reduce the batch to one row per key first")
    }
    val cols = target.columns.toSeq
    val bKey = s"_b_$key"
    val bProj = batch.select(cols.map(c => col(c).as(s"_b_$c")): _*)
    // one gate decides all three hints: matched ⊆ batch keys, so the
    // batch fitting the cap implies matched does too
    val bFits = planBytes(bProj) <= BigInt(broadcastBytesMax)
    val b = if (bFits) broadcast(bProj) else bProj
    val joined = target.join(b, col(key) === col(bKey), "left_outer")
    // matched deletes drop; null-safe so an unmatched row (all _b_ null,
    // deleteWhen evaluating to null) can never be swept away
    val fromTarget = joined
      .filter(!(col(bKey).isNotNull && coalesce(deleteWhen, lit(false))))
      .select(cols.map { c =>
        if (c == key) col(c)
        else when(col(bKey).isNull, col(c))
          .otherwise(updateSet.getOrElse(c, col(s"_b_$c"))).as(c)
      }: _*)
    val matchedPlan =
      target.join(b.select(col(bKey)), col(key) === col(bKey), "left_semi")
        .select(col(key).as("_mkey"))
    val matched = if (bFits) broadcast(matchedPlan) else matchedPlan
    val inserts = batch
      .join(matched, batch(key) === matched("_mkey"), "left_anti")
      .select(cols.map(c => col(c).as(s"_b_$c")): _*) // expose _b_ names to deleteWhen
      .filter(!coalesce(deleteWhen, lit(false)))
      .select(cols.map(c => col(s"_b_$c").as(c)): _*)
    fromTarget.unionByName(inserts)
  }

  /** Partition-scoped MERGE INTO a partitioned parquet table: the
    * copy-on-write upsert at the core of lakehouse table maintenance.
    * Rows of `batch` overwrite same-key rows and append new keys — but
    * only the PARTITIONS the batch touches are read or rewritten:
    *   1. the batch's distinct partition values (batch-grain, collected
    *      to the driver — bounded by the partition count the batch
    *      spans, same bounded-metadata contract as the m07 manifest)
    *      prune the table scan;
    *   2. [[scd1Upsert]] merges inside the affected partitions
    *      (broadcast anti-join — the affected slice never shuffles);
    *   3. a dynamic-mode partition overwrite replaces exactly the
    *      affected partitions; every other partition's files are
    *      untouched bytes (q87's gate asserts this property for the
    *      overwrite mechanism, `ScaleSpec` asserts it for this merge).
    *
    * Constraint (shared with every partition-pruned merge, including
    * Delta/Iceberg guidance): an update must not move a key across
    * partitions — the partition column is part of the key's identity.
    * A batch row whose partition value differs from the stored row's
    * would leave the stale copy in the old partition, so callers
    * partition on immutable columns.
    */
  def mergeWrite(tablePath: String, batch: DataFrame, key: String,
      partitionCol: String): Unit = {
    val spark = batch.sparkSession
    val touched = batch.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).toSeq
    val affected = spark.read.parquet(tablePath)
      .filter(col(partitionCol).isInCollection(touched))
    // Spark (rightly) refuses a write whose plan still reads the target
    // path; localCheckpoint MATERIALIZES the merged slice (affected
    // partitions only — not the table) before the overwrite touches any
    // file. A production lakehouse replaces this with a transaction log;
    // plain parquet has no MVCC, so materialize-then-swap is the
    // copy-on-write contract.
    scd1Upsert(affected, batch.select(affected.columns.map(col): _*), key)
      .localCheckpoint()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(tablePath)
  }

  /** SCD Type-2 merge of an update batch into a dimension-history table.
    *
    * `dim` carries `key, attrs…, valid_from, valid_to, is_current`
    * (`valid_to` null on current rows); `updates` carries `key, attrs…`,
    * all effective at batch time `ts`. Semantics per Kimball's type-2
    * slowly-changing dimension:
    *   - history rows (`is_current = false`) pass through untouched — and
    *     un-joined: at scale the closed history dwarfs the current set
    *     and must not pay the shuffle;
    *   - a current row with no update, or an update equal to its attrs,
    *     stays current;
    *   - a current row whose update differs CLOSES (`valid_to = ts`,
    *     `is_current = false`) and the update opens the new current row
    *     (`valid_from = ts`);
    *   - an update for an unseen key opens its first current row.
    * Deletes are out of scope (type-2 sources retract via tombstone
    * attribute values, which flow through as ordinary changes).
    *
    * The outer join emits 1 or 2 output rows per matched key via a
    * map-side array-explode; brand-new keys arrive through a broadcast
    * anti-join (see the inline plan note — everything builds on the
    * batch side, the dimension never shuffles).
    */
  def scd2Merge(dim: DataFrame, updates: DataFrame, key: String,
      ts: Long,
      broadcastBytesMax: Long = DefaultBatchBroadcastBytes): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "is_current")
    val attrs = dim.columns.filterNot(c => c == key || meta.contains(c)).sorted
    require(updates.columns.sorted.sameElements((attrs :+ key).sorted),
      s"update batch must carry exactly key+attrs; got ${updates.columns.sorted.mkString(",")}")
    val outCols = (key +: attrs) ++ meta
    def rowStruct(src: String => Column, from: Column, to: Column,
        current: Column): Column =
      struct(outCols.map {
        case "valid_from" => from.cast("long").as("valid_from")
        case "valid_to" => to.cast("long").as("valid_to")
        case "is_current" => current.as("is_current")
        case c => src(c).as(c)
      }: _*)

    val history = dim.filter(!col("is_current")).select(outCols.map(col): _*)
    val cur = dim.filter(col("is_current"))
    // The batch side is small by construction, so every join builds on it
    // and the (huge) current set NEVER shuffles. A single full-outer join
    // would be one pass, but Spark cannot broadcast a full-outer equi-join
    // — the hint would silently drop and the whole dimension would pay a
    // key shuffle. Instead: (1) current LEFT OUTER broadcast(batch) emits
    // keep/close/reopen rows map-side; (2) the keys the batch matched are
    // themselves ≤|batch| — a broadcast semi-join collects them from a
    // key-column-pruned second scan; (3) batch ANTI broadcast(matched)
    // opens the brand-new keys, also map-side. Two scans of the current
    // set (one key-only, column-pruned) buy zero dimension shuffles.
    // Both hints ride one size gate on the batch (the mergeInto
    // discipline): an over-cap backfill batch shuffles instead of OOMing.
    val updProj = updates.select(col(key).as("_ukey") +:
      attrs.map(c => col(c).as(s"_u_$c")): _*)
    val uFits = planBytes(updProj) <= BigInt(broadcastBytesMax)
    val upd = if (uFits) broadcast(updProj) else updProj
    val joined = cur.join(upd, col(key) === col("_ukey"), "left_outer")
    val changed = col("_ukey").isNotNull &&
      !(struct(attrs.map(col): _*) <=>
        struct(attrs.map(c => col(s"_u_$c")): _*))
    val keep = rowStruct(col, col("valid_from"), col("valid_to"), lit(true))
    val closed = rowStruct(col, col("valid_from"), lit(ts), lit(false))
    val opened = rowStruct(
      c => if (c == key) col(key) else col(s"_u_$c"),
      lit(ts), lit(null), lit(true))
    val fromCur = joined.select(explode(
      when(changed, array(closed, opened)) // close + reopen
        .otherwise(array(keep))).as("_r")) // no update / unchanged
      .select(col("_r.*"))
    val matchedPlan = cur.join(upd, col(key) === col("_ukey"), "left_semi")
      .select(col(key).as("_mkey"))
    val matched = if (uFits) broadcast(matchedPlan) else matchedPlan
    val openedNew = updates
      .join(matched, updates(key) === matched("_mkey"), "left_anti")
      .select(outCols.map {
        case "valid_from" => lit(ts).cast("long").as("valid_from")
        case "valid_to" => lit(null).cast("long").as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case c => col(c).as(c)
      }: _*)
    history.unionByName(fromCur).unionByName(openedNew)
  }

  /** Point-in-time reconstruction (time travel) over an SCD Type-2
    * history table as produced by [[scd2Merge]]: the dimension state AS
    * OF instant `t` is every version row whose validity interval covers
    * `t` under the half-open contract `[valid_from, valid_to)` (open
    * `valid_to` = null = ∞). Exactly one row per key that existed at
    * `t`; keys first inserted after `t` produce nothing.
    *
    * Scale shape: a pure map-side filter — no shuffle, no join, and both
    * predicates push to the parquet scan when the history is stored
    * (partition or z-order the history by `valid_from` and min/max
    * skipping prunes whole files of closed old versions; q88/q111 are
    * that layout story). This read path is the reason [[scd2Merge]]
    * keeps interval columns instead of only an `is_current` flag.
    */
  def asOf(dim: DataFrame, t: Long): DataFrame =
    dim.filter(col("valid_from") <= t &&
      (col("valid_to").isNull || col("valid_to") > t))

  /** Incremental view maintenance for a two-table equi-JOIN view over
    * APPEND-ONLY bases: the delta rows to append to a materialized
    * `V = A ⋈ B` when batches `dA` / `dB` arrive. Standard delta
    * algebra — `(A∪dA) ⋈ (B∪dB) = V ∪ dA⋈(B∪dB) ∪ A⋈dB` — factored so
    * each base is scanned at most once and NEITHER base ever shuffles:
    * both join terms build their hash side from a broadcast delta
    * (batches are small by construction; the bases are the 100 TB side).
    * The base-vs-base term is exactly `V`, already materialized — the
    * whole point of IVM is never recomputing it. Append-only for the
    * same reason as [[refreshAggView]]: deletes/updates need a
    * retractable encoding and take the CDC route.
    */
  def joinViewDelta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
      dB: DataFrame, aKey: String, bKey: String,
      broadcastBytesMax: Long = DefaultBatchBroadcastBytes): DataFrame = {
    // dataset-qualified key refs: with unqualified col(aKey)===col(bKey)
    // the common IVM case — both bases keyed by the SAME column name —
    // either fails to resolve or silently resolves both sides to one
    // dataset (an equality-on-itself cross join). Qualifying per term
    // keeps any key naming correct. Delta hints are size-gated like
    // every merge-family batch (an over-cap delta shuffles its term).
    val b = bOld.unionByName(dB)
    maybeBroadcast(dA, broadcastBytesMax).join(b, dA(aKey) === b(bKey))
      .unionByName(aOld.join(maybeBroadcast(dB, broadcastBytesMax),
        aOld(aKey) === dB(bKey)))
  }

  /** A grouped aggregate view over `valueCol` at the `keys` grain — the
    * materialized shape [[refreshAggView]] maintains. All four aggregates
    * are decomposable (count/sum add, min/max combine), which is exactly
    * what makes the view incrementally maintainable; `total` stays
    * UNROUNDED in the view so successive refreshes never compound a
    * rounding step — presentation rounds once, at read time. */
  def aggView(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"), sum(col(valueCol)).as("total"),
      min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  /** Incremental view maintenance for an APPEND-ONLY base: fold a new
    * batch into an [[aggView]] without rescanning the base table. The
    * batch aggregates at the view grain first (map-side partials — the
    * shuffled delta is group-grain, not row-grain), then a single
    * key-grain full-outer merge combines it with the old view:
    * counts/sums add, min/max take `least`/`greatest` (both skip the
    * null side of an unmatched key). Refresh cost is O(batch + touched
    * groups) — the 100 TB base never rejoins the plan; the view itself
    * is grain-sized, and bucketing it by `keys` co-locates the merge.
    * Non-retractable aggregates are exactly why this needs append-only:
    * deletes/updates take the CDC route (st13) into a retractable
    * encoding (e.g. q89's mergeable sketches or count-weighted sums).
    *
    * Note the full-outer merge SHUFFLES both sides by design (Spark
    * cannot broadcast a full-outer equi-join — the scd2Merge lesson);
    * at view grain that is the correct, small exchange. */
  def refreshAggView(view: DataFrame, batch: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    val delta = aggView(batch, keys, valueCol)
      .select(keys.map(col) ++ Seq(col("n").as("_dn"),
        col("total").as("_dtotal"), col("mn").as("_dmn"),
        col("mx").as("_dmx")): _*)
    view.join(delta, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0.0)) +
          coalesce(col("_dtotal"), lit(0.0))).as("total"),
        least(col("mn"), col("_dmn")).as("mn"),
        greatest(col("mx"), col("_dmx")).as("mx")): _*)
  }

}
