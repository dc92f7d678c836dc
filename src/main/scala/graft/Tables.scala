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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark cannot read as a
    // timestamp. Sessions set spark.sql.legacy.parquet.nanosAsLong=true (see
    // Sessions.configure) so it arrives as nanos-since-epoch LONG; convert to
    // a proper timestamp with exact integer division (`div`, not `/` — a
    // double round-trip would lose precision above 2^53 ns). Floor-to-micros
    // matches DuckDB's own nanos→micros truncation, keeping oracle parity.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
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
