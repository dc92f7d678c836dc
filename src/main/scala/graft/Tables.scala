package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table accessors for the driver-generated star schema
  * (see /root/repo/TESTDATA.md). All engine queries read through here so
  * scan options stay in one place.
  *
  * Scale note: reads are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan (verify via `PushedFilters`/`ReadSchema` in
  * explain output), so the same code works on a 100 TB partitioned lake by
  * swapping the directory for a partitioned root.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize `events.ts` to session-zone TimestampType whatever the
    * generator stored, so every downstream `unix_micros($"ts")` /
    * watermark / window sees one type. Stored variants seen across
    * testdata generations:
    *  - parquet TIMESTAMP(NANOS): unreadable as a timestamp; Sessions sets
    *    spark.sql.legacy.parquet.nanosAsLong=true so it arrives as a
    *    nanos-since-epoch LONG → exact integer `div 1000` (not `/` — a
    *    double round-trip loses precision above 2^53 ns), floor-to-micros
    *    matching DuckDB's own nanos→micros truncation;
    *  - parquet timestamp[us] without timezone → TIMESTAMP_NTZ: cast to
    *    TimestampType. Session TZ is UTC (Sessions.builder), so the
    *    wall-clock reinterpretation shifts nothing and `unix_micros`
    *    equals DuckDB's `epoch_us` on the same file;
    *  - tz-aware timestamp[us] → already TimestampType: pass through.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — testdata schema " +
        "drifted again; teach Tables.normalizeEventTs the new variant " +
        "(see TablesSchemaSpec, the drift tripwire)")
    }
  }

  /** Content identity of a source parquet file, for keying build-once
    * derived layouts (bucketed tables, IVF cells, BM25 postings): file
    * length + md5 over the parquet footer (per-block row counts, byte
    * sizes, column min/max statistics). NOT mtime — a byte-identical
    * regeneration keeps its key (no spurious rebuild), while any content
    * change (rows, stats, block layout) re-keys and forces exactly one
    * rebuild. The footer is KBs and read driver-side with no data scan,
    * so the check stays metadata-cheap at 100 TB.
    */
  def contentIdent(path: String): String = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val footer = try {
      reader.getFooter.getBlocks.asScala.map { b =>
        s"${b.getRowCount}:${b.getTotalByteSize}:" +
          b.getColumns.asScala.map(c => String.valueOf(c.getStatistics))
            .mkString("|")
      }.mkString(";")
    } finally reader.close()
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(footer.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$path:${java.nio.file.Files.size(java.nio.file.Paths.get(path))}:$md5"
  }

  /** 16-hex digest of [[contentIdent]], for embedding in layout dir names
    * (md5-wide: a 32-bit hash could collide two corpus identities onto
    * one layout path). */
  def contentKey(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(contentIdent(path).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  /** Register every table in `dir` as a temp view (for spark.sql corpora). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      if (new java.io.File(s"$dir/$n.parquet").exists())
        apply(spark, dir, n).createOrReplaceTempView(n)
    }
}

/** One engine query: Spark implementation + optional DuckDB oracle SQL.
  * Column names (aliases) MUST match between `fn`'s output and `oracle` —
  * the driver sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
