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
