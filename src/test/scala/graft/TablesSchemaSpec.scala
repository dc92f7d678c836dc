package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** SCHEMA-DRIFT TRIPWIRE. The testdata generator has already shipped
  * `events.ts` two different ways (parquet TIMESTAMP(NANOS)-as-long in
  * rounds 1–7, `timestamp[us]`/NTZ from round 8), and the round-8 drift
  * surfaced as 28 scattered failures across the gate harness, the bench,
  * and sbt test. This spec exists so the NEXT drift is one loud failure
  * that names the actual stored type and the file that changed.
  *
  * If a test here fails: read the `info(...)` line for the stored type,
  * then teach `Tables.normalizeEventTs` AND `StreamOps.readEvents` the
  * new variant (both must stay in lockstep — batch and streaming read the
  * same file).
  */
class TablesSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def storedTs: DataType =
    spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType

  test("events.ts stored type is a variant Tables knows how to normalize") {
    val t = storedTs
    info(s"stored events.ts parquet type (as Spark sees it): $t")
    assert(Seq(LongType, TimestampNTZType, TimestampType).contains(t),
      s"TESTDATA SCHEMA DRIFT: events.ts is now $t — update " +
        "Tables.normalizeEventTs and StreamOps.readEvents together")
  }

  test("batch path normalizes ts to session-zone TimestampType") {
    assert(Tables(spark, sf, "events").schema("ts").dataType == TimestampType)
  }

  test("streaming path declares the stored type and normalizes to TimestampType") {
    assert(StreamOps.readEvents(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("normalized event times land in the generator's era, not 1970") {
    // The round-8 regression mode: micros read as nanos shrink every
    // event-time 1000x into January 1970. Any unit confusion (ns/us/ms/s)
    // moves the minimum outside a sane band, so pin the band.
    val r = Tables(spark, sf, "events")
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .collect().head
    val (lo, hi) = (r.getAs[Int]("lo"), r.getAs[Int]("hi"))
    info(s"event-time year range after normalization: $lo..$hi")
    assert(lo >= 2000 && hi <= 2100,
      s"normalized events.ts spans $lo..$hi — unit conversion is wrong " +
        "(1970 = too-small epochs, far-future = too-large)")
  }

  test("streaming and batch paths agree on normalized event times") {
    val stream = StreamOps.runToMemory(spark,
      StreamOps.readEvents(spark, sf)
        .agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"),
          count(lit(1)).as("n")),
      "ts_drift_probe", org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().head
    val batch = Tables(spark, sf, "events")
      .agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"),
        count(lit(1)).as("n"))
      .collect().head
    assert(stream.toSeq == batch.toSeq,
      s"stream $stream != batch $batch — StreamOps.readEvents and " +
        "Tables.normalizeEventTs disagree on the ts conversion")
  }
}
