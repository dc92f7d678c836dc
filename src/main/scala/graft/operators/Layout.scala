package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: multi-dimensional clustering for scan
  * pruning. Parquet keeps min/max statistics per row group; Spark's
  * pushed filters skip row groups whose stats exclude the predicate. A
  * single-dimension sort gives perfect pruning on that dimension and
  * none on any other; interleaving the bits of two dimensions (Morton /
  * Z-order — the public technique behind Delta/Iceberg OPTIMIZE ZORDER)
  * makes files cover small rectangles in (a, b) space, so a box
  * predicate on EITHER or BOTH dimensions skips most files. At 100 TB
  * the difference is reading a few row groups vs a full dimension slice.
  */
object Layout {

  /** Cluster a layout write by its partition column before
    * `partitionBy` (optimization guide §6, hash distribution before the
    * write): a `partitionBy(p)` write emits one file per
    * (task, partition value) pair, so at cluster scale an upstream
    * exchange of T tasks writes T·|p| tiny files — 1e5 tasks × 4096
    * cells is 4e8 files for codes that pack into ~one file per cell.
    * Clustering by `p` first bounds output at one file per partition
    * value per holding task (hash partitioning puts each value's rows
    * in exactly one task, so in practice: one file per value).
    *
    * Conf-gated OFF by default (`spark.graft.layout.clusterWrites`):
    * at local bench scale AQE already coalesces the feeding exchanges
    * to 1-2 tasks, file counts are already minimal, and the added
    * exchange is pure cost — measured as the only visible effect in a
    * local A/B (round 20) — so the knob belongs to the cluster
    * profile, not the local default. Row CONTENT is identical either
    * way; only file layout moves (LayoutWriteSpec pins bit-identical
    * serving results and the one-file-per-partition-value invariant).
    */
  def clusterForWrite(df: DataFrame, partCol: String): DataFrame =
    if (df.sparkSession.conf
          .getOption("spark.graft.layout.clusterWrites")
          .exists(_.toBoolean))
      df.repartition(col(partCol))
    else df

  /** Morton z-value of two non-negative int columns: interleaves the low
    * `bits` bits of each (a in even positions, b in odd) — the 2-dim
    * case of [[zValueN]], sharing its bit-budget guard.
    *
    * The inputs MUST occupy comparable bit-widths: if one dimension's
    * domain uses far more bits than the other's, its high bits dominate
    * every coarse z-range split and the curve degenerates into a
    * single-dimension sort (measured: an 11-bit vs 4-bit pair gave ZERO
    * pruning on the narrow dimension). [[zorderWrite]] range-normalizes
    * both dimensions first for exactly this reason. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** N-dimensional Morton z-value: bit `i` of dimension `j` lands at
    * position `i*n + j` (round-robin interleave; `zValue(a,b)` ==
    * `zValueN(Seq(a,b))`). Same comparable-bit-width caveat as
    * [[zValue]] — normalize dimensions first. Total bits (`bits * n`)
    * must fit a long. */
  def zValueN(dims: Seq[Column], bits: Int = 16): Column = {
    val n = dims.size
    require(n >= 2 && bits * n <= 63, s"zValueN: $n dims x $bits bits")
    (for { i <- 0 until bits; (d, j) <- dims.zipWithIndex } yield
      shiftright(d, i).bitwiseAND(1).cast("long") * (1L << (i * n + j))
    ).reduce(_.bitwiseOR(_))
  }

  private val NormBits = 8

  /** Write `df` z-ordered on (aCol, bCol): each dimension is min/max
    * scaled to an equal 8-bit width (the published construction —
    * without it the wider domain's high bits dominate and the curve
    * degenerates to a single-dim sort), the scaled values interleave
    * into a 16-bit z-value, and the frame is range-partitioned by it
    * into `files` output files, sorted within each — so every file owns
    * a compact z-range = a small rectangle of (a, b) space, giving tight
    * per-row-group min/max on BOTH columns. The min/max pre-pass is one
    * cheap agg over the two columns; the write was scanning everything
    * anyway. */
  /** Min/max of both clustering dimensions, as computed (and returned)
    * by [[zorderWrite]] so callers probing the layout reuse the ranges
    * instead of re-scanning for them. */
  final case class ZRanges(aMin: Double, aMax: Double, bMin: Double, bMax: Double)

  def zorderWrite(
      df: DataFrame, aCol: String, bCol: String, files: Int,
      path: String): ZRanges = {
    val r = df.agg(
      min(col(aCol)).cast("double"), max(col(aCol)).cast("double"),
      min(col(bCol)).cast("double"), max(col(bCol)).cast("double")).first()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input (or an all-null dimension): nothing to order — write
      // the frame as-is rather than NPE on the missing range
      df.write.mode("overwrite").parquet(path)
      return ZRanges(0, 0, 0, 0)
    }
    val top = (1 << NormBits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else ((c.cast("double") - lo) * top / (hi - lo)).cast("long")
    df.withColumn("__z", zValue(
        norm(col(aCol), r.getDouble(0), r.getDouble(1)),
        norm(col(bCol), r.getDouble(2), r.getDouble(3)), NormBits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    ZRanges(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** Per-partition outcome of a [[compact]] run. `filesAfter` is re-listed
    * from disk post-write, so the report states what actually happened. */
  final case class CompactStat(
      partition: String, filesBefore: Long, filesAfter: Long,
      bytes: Long, compacted: Boolean)

  /** Small-file compaction of a `partitionBy(partitionCol)` parquet table
    * — the lakehouse OPTIMIZE (bin-packing) analog, completing the
    * maintenance family of q87 (dynamic partition overwrite) and q102
    * (partition-scoped merge). Streaming ingest and per-batch merges
    * leave partitions holding many files far below the scan-efficient
    * size; at 100 TB the file-count explosion dominates driver planning
    * time and per-file open cost, so compaction — not re-ingest — is the
    * standing maintenance job.
    *
    * Planning is metadata-only: one driver-side listing of partition
    * directories and their file sizes (the same metadata-sized driver
    * work every OPTIMIZE planner does — never row data). A partition
    * needs compaction when its file count exceeds the size-optimal
    * `ceil(bytes / targetBytes)`. Only NEEDING partitions are read and
    * restated — via the same materialize-then-dynamic-overwrite contract
    * as [[Mutations.mergeWrite]] (plain parquet has no MVCC); untouched
    * partitions' files are never opened, never rewritten.
    *
    * File-count control without skew: rows get a deterministic slot
    * `xxhash64(row) % k_p` (k_p = the partition's optimal count) and one
    * `repartition(sum k_p, partitionCol, slot)` clusters them; a (ptn,
    * slot) group never splits across tasks, so each compacted partition
    * lands in at most k_p files regardless of how many partitions ride
    * the same job.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      partitionCol: String, targetBytes: Long): Seq[CompactStat] = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(p: Path) = fs.listStatus(p).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val prefix = s"$partitionCol="
    val parts = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map { d =>
        val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(d.getPath.getName.stripPrefix(prefix))
        val fls = dataFiles(d.getPath)
        (d.getPath, value, fls.length.toLong, fls.map(_.getLen).sum)
      }
    val planned = parts.map { case (p, value, nFiles, bytes) =>
      val optimal = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      (p, value, nFiles, bytes, optimal, nFiles > optimal)
    }
    val needing = planned.filter(_._6)
    if (needing.nonEmpty) {
      val slotOf = needing.map { case (_, v, _, _, k, _) => v -> k }.toMap
      val touched = slotOf.keys.toSeq
      val kExpr = slotOf.foldLeft(lit(1L)) { case (acc, (v, k)) =>
        when(col(partitionCol) === v, lit(k)).otherwise(acc)
      }
      val data = spark.read.parquet(tablePath)
        .filter(col(partitionCol).isInCollection(touched))
      val rowHash = xxhash64(struct(data.columns.map(col): _*))
      data
        .withColumn("__slot", pmod(rowHash, kExpr))
        .repartition(slotOf.values.sum.toInt, col(partitionCol), col("__slot"))
        .drop("__slot")
        .localCheckpoint()
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol).parquet(tablePath)
    }
    planned.map { case (p, value, nFiles, bytes, _, needed) =>
      CompactStat(value, nFiles,
        if (needed) dataFiles(p).length.toLong else nFiles, bytes, needed)
    }.toSeq.sortBy(_.partition)
  }

  // ---------------------------------------------------------------------
  // File-level data skipping (min/max manifest) — the Delta/Iceberg
  // "file statistics" idea for plain parquet directories. Parquet's own
  // row-group stats prune only AFTER a file is opened; at 100 TB the
  // win is never OPENING (or listing into the scan) the 99% of files a
  // selective range predicate excludes. A manifest — one row per file
  // with the clustering column's min/max — turns a range query into a
  // metadata lookup followed by a scan of only the overlapping files.
  // ---------------------------------------------------------------------

  private val ManifestDir = "_graft_manifest"

  /** Write `df` range-clustered on `rangeCol` into `files` files at
    * `path`, then build the file-level min/max manifest beside the data
    * (`path/_graft_manifest` — the underscore prefix keeps it invisible
    * to plain `read.parquet(path)` scans, like `_SUCCESS`).
    *
    * The clustering write is `repartitionByRange` + in-file sort, so
    * each file owns a tight, near-disjoint range of `rangeCol` — the
    * precondition for skipping to bite (a manifest over randomly
    * scattered data matches every file). The manifest pass is one
    * column-pruned scan of the fresh layout grouped by
    * `_metadata.file_path` — map-side combinable, file-grain output,
    * the same amortized-ANALYZE contract as [[zorderWrite]]'s range
    * pre-pass. Manifest commits LAST: a crash between data and manifest
    * leaves a readable un-manifested layout, never a stale manifest.
    */
  def writeWithManifest(df: DataFrame, rangeCol: String, files: Int,
      path: String): Unit = {
    df.repartitionByRange(files, col(rangeCol))
      .sortWithinPartitions(col(rangeCol))
      .write.mode("overwrite").parquet(path)
    buildManifest(df.sparkSession, path, rangeCol)
  }

  /** (Re)build the min/max manifest over the CURRENT data files of
    * `path`. The manifest records its own clustering column
    * (`range_col`) so maintenance jobs that restate data files —
    * [[vacuum]] — can rebuild it without being told the column. */
  private def buildManifest(spark: org.apache.spark.sql.SparkSession,
      path: String, rangeCol: String): Unit =
    spark.read.parquet(path)
      .select(col(rangeCol).as("v"), col("_metadata.file_path").as("file"))
      .groupBy(col("file"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n_rows"))
      .withColumn("range_col", lit(rangeCol))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$ManifestDir")

  /** The manifest as a DataFrame: (file, lo, hi, n_rows) per data file. */
  def manifest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$ManifestDir")

  /** Data files whose [lo, hi] overlaps the query range — the skip
    * decision. Collected to the driver: the manifest is file-grain
    * metadata (like the m07 shard manifest and every OPTIMIZE planner's
    * file listing), never row data.
    */
  def prunedFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      lo: Column, hi: Column): Seq[String] =
    manifest(spark, path)
      .filter(col("hi") >= lo && col("lo") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Range query through the manifest: list-filter files driver-side,
    * scan ONLY the overlapping ones, and re-apply the row-level
    * predicate (file stats are necessary, not sufficient). Falls back
    * to an empty frame with the layout's schema when nothing overlaps —
    * zero files opened.
    */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      rangeCol: String, lo: Column, hi: Column): DataFrame = {
    val keep = prunedFiles(spark, path, lo, hi)
    if (keep.isEmpty)
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(keep: _*).filter(col(rangeCol).between(lo, hi))
  }

  private val DeleteDir = "_graft_deletes"

  /** The accumulated positional deletes of a layout as (`_file`,
    * `_pos`) — empty (with the right schema) before the first delete.
    * The underscore-prefixed subdirectory is invisible to plain
    * `read.parquet(path)` scans, like `_SUCCESS` and the skip
    * manifest. */
  def deletes(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val p = new Path(s"$path/$DeleteDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else spark.range(0).select(
      lit("").as("_file"), lit(0L).as("_pos")).filter(lit(false))
  }

  /** Delete-by-predicate WITHOUT rewriting data files — the Iceberg-v2
    * positional-delete / Delta deletion-vector shape: rows matching
    * `cond` in the CURRENT live view are recorded as (file, row-index)
    * pairs appended under the layout's delete directory; data files are
    * immutable. This is the merge-on-read half of the mutation stack
    * (the copy-on-write half is [[Mutations.scd2Merge]]-style rewrite):
    * a delete touching 0.1% of rows costs a scan plus a tiny metadata
    * append, not a rewrite of every hit file.
    *
    * Already-deleted rows are excluded (an overlapping second batch
    * records only the NEW hits, and the returned count reflects that),
    * so delete batches are idempotent and the vector never accumulates
    * duplicates. Positions come from `_metadata.row_index` — stable for
    * immutable parquet files by construction.
    *
    * @return number of newly deleted rows. */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, path: String,
      cond: Column): Long = {
    val hit = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("_file"),
        col("_metadata.row_index").as("_pos"), col("*"))
      .filter(cond)
      .select(col("_file"), col("_pos"))
      .join(deletes(spark, path), Seq("_file", "_pos"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = hit.count()
      if (n > 0)
        hit.write.mode("append").parquet(s"$path/$DeleteDir")
      n
    } finally hit.unpersist(false)
  }

  /** Default on-disk byte cap under which the delete vector is
    * broadcast-hinted in [[readWithDeletes]]. Parquet-compressed (file,
    * pos) pairs expand roughly 3–5× as broadcast rows, so 32 MB on disk
    * is a ~100–150 MB broadcast — safely inside executor headroom while
    * far above any healthy vector (a table whose vector approaches this
    * is past the [[vacuum]] crossover; see PERF_PROBE.md). */
  val DefaultDeleteBroadcastBytes: Long = 32L << 20

  /** On-disk bytes of the accumulated delete vector — a driver-side
    * file listing, no job. 0 when no deletes exist. */
  def deleteVectorBytes(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    val p = new Path(s"$path/$DeleteDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
  }

  /** Fraction of the base table's rows currently deleted — the signal a
    * maintenance pipeline thresholds to trigger [[vacuum]] mechanically
    * (PERF_PROBE.md measures where merge-on-read overhead crosses the
    * one-time rewrite). Two count jobs, both metadata-light: the delete
    * vector is tiny and a parquet count reads no columns. */
  def deleteFraction(spark: org.apache.spark.sql.SparkSession,
      path: String): Double = {
    val baseRows = spark.read.parquet(path).count()
    if (baseRows == 0L) 0.0
    else deletes(spark, path).count().toDouble / baseRows
  }

  /** The live view: base files minus the accumulated positional
    * deletes. The relational anti-join on (file, pos) is the portable
    * engine-level encoding of a reader-applied per-file delete bitmap.
    * The broadcast decision is SIZE-GATED, not assumed: while the
    * vector's on-disk bytes stay under `broadcastBytesMax` it is
    * broadcast-hinted — the base never shuffles and the plan is one
    * scan + map-side anti filter. Past the cap the hint is withheld and
    * the planner falls back to a shuffled anti-join (one exchange of
    * the base — the honest degraded mode; AQE may still broadcast at
    * runtime if actual stats allow), instead of the hard driver OOM an
    * unconditional hint would force once vectors reach 1e8+ pairs at
    * 100 TB. Pipelines should watch [[deleteFraction]] and [[vacuum]]
    * well before that point. */
  def readWithDeletes(spark: org.apache.spark.sql.SparkSession,
      path: String,
      broadcastBytesMax: Long = DefaultDeleteBroadcastBytes): DataFrame = {
    val base = spark.read.parquet(path)
    val dels = deletes(spark, path)
    val delSide =
      if (deleteVectorBytes(spark, path) <= broadcastBytesMax) broadcast(dels)
      else dels
    base.select(col("_metadata.file_path").as("_file"),
        col("_metadata.row_index").as("_pos"), col("*"))
      .join(delSide, Seq("_file", "_pos"), "left_anti")
      .drop("_file", "_pos")
  }

  /** Fold accumulated deletes into a data rewrite: materialize the live
    * view into fresh files and drop the vectors — run when
    * [[deleteFraction]] makes merge-on-read reads pay more than one
    * rewrite (every table format's REWRITE DATA FILES / PURGE step;
    * PERF_PROBE.md measures the crossover). Staged write-then-swap: the
    * live view lands under an underscore-prefixed temp dir (invisible
    * to readers of `path`), then old data files drop, new files rename
    * in, and ONLY THEN does the delete directory go — the vectors
    * reference the old file names, so against the renamed files they
    * are inert, and a crash anywhere in the swap never leaves a state
    * where stale vectors mis-filter new data. A crash before the swap
    * leaves the old layout + vectors fully intact.
    *
    * A skip manifest ([[writeWithManifest]]) would otherwise survive
    * pointing at the deleted pre-vacuum files and silently exclude
    * every rewritten file from manifest-routed reads — so vacuum
    * REBUILDS it over the new files (the manifest records its own
    * clustering column), or drops it when written by an older layout
    * that didn't record the column (readers then fail loudly on the
    * missing manifest rather than silently reading nothing). */
  def vacuum(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val live = readWithDeletes(spark, path)
    val tmp = new Path(s"$path/_graft_vacuum_tmp")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    live.write.mode("overwrite").parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    val root = new Path(path)
    val manifestPath = new Path(s"$path/$ManifestDir")
    // the manifest's clustering column, read BEFORE the swap touches
    // anything (None = no manifest, or a pre-range_col manifest)
    val manifestCol: Option[String] =
      if (!fs.exists(manifestPath)) None
      else {
        val m = spark.read.parquet(manifestPath.toString)
        if (!m.columns.contains("range_col")) None
        else m.select(col("range_col")).limit(1).collect()
          .headOption.map(_.getString(0))
      }
    fs.listStatus(root).foreach { f =>
      val nm = f.getPath.getName
      if (!nm.startsWith("_") && !nm.startsWith(".")) fs.delete(f.getPath, false)
    }
    fs.listStatus(tmp).foreach { f =>
      val nm = f.getPath.getName
      if (!nm.startsWith("_") && !nm.startsWith("."))
        fs.rename(f.getPath, new Path(root, nm))
    }
    fs.delete(new Path(s"$path/$DeleteDir"), true)
    manifestCol match {
      case Some(rc) => buildManifest(spark, path, rc)
      case None => if (fs.exists(manifestPath)) fs.delete(manifestPath, true)
    }
    fs.delete(tmp, true)
    n
  }

  /** Order-free partition checksums for replica reconciliation — the
    * anti-entropy primitive behind cross-region table sync and
    * backup-integrity audits: each partition reduces to
    * `(n, lo, hi)` where lo/hi are the SPLIT-HALF sums of every row's
    * portable 63-bit md5 hash (`lo = Σ (h & 0xFFFFFFFF)`,
    * `hi = Σ (h >> 32)` — each bounded by n·2³², so exact longs with
    * no wrap up to ~2³¹ rows per partition where a raw Σh would
    * overflow immediately; sums are ORDER-FREE, so any row order,
    * partitioning, or engine produces the identical checksum). Two
    * replicas whose (n, lo, hi) agree per partition hold the same
    * multiset of row keys with overwhelming probability; one changed
    * row flips the checksum.
    *
    * `rowKey` is the caller's deterministic string rendering of the
    * row (concat the content-bearing fields in a FIXED order with an
    * unambiguous separator) — nulls and float formatting are the
    * caller's contract, kept out of this primitive on purpose.
    *
    * Scale shape: ONE map-combined partition-grain aggregate per
    * replica — count-class cost; the diff below joins the two
    * checksum tables at partition grain, never row grain.
    */
  def partitionChecksum(df: DataFrame, partCol: Column,
      rowKey: Column): DataFrame = {
    val h = graft.operators.Dedup.portableTokenHash63(rowKey)
    df.select(partCol.as("part"), h.as("h"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n"),
        sum(col("h").bitwiseAND(lit(0xFFFFFFFFL))).as("lo"),
        sum(shiftright(col("h"), 32)).as("hi"))
  }

  /** Partition-grain diff of two replicas via [[partitionChecksum]]:
    * one row per partition present in either replica, with
    * `status ∈ {match, mismatch, only_a, only_b}` — the repair
    * worklist (re-ship exactly the mismatching partitions, nothing
    * else). Row grain never moves; only the two bounded checksum
    * tables join. */
  def replicaDiff(a: DataFrame, b: DataFrame, partCol: Column,
      rowKey: Column): DataFrame = {
    val ca = partitionChecksum(a, partCol, rowKey)
      .withColumnRenamed("n", "n_a").withColumnRenamed("lo", "lo_a")
      .withColumnRenamed("hi", "hi_a")
    val cb = partitionChecksum(b, partCol, rowKey)
      .withColumnRenamed("n", "n_b").withColumnRenamed("lo", "lo_b")
      .withColumnRenamed("hi", "hi_b")
    ca.join(cb, Seq("part"), "full_outer")
      .select(col("part"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        when(col("n_a").isNull, "only_b")
          .when(col("n_b").isNull, "only_a")
          .when(col("n_a") === col("n_b") && col("lo_a") === col("lo_b") &&
            col("hi_a") === col("hi_b"), "match")
          .otherwise("mismatch").as("status"))
  }
}
