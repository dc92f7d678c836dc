package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction so Verify / Bench / tests agree on the
  * configs that affect correctness and scale behavior.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // custom SQL functions + planner strategies (as-of / interval
      // joins), installed the idiomatic way; JoinBuild keeps a
      // synchronized fallback for foreign sessions without this config
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // testdata events.ts is parquet TIMESTAMP(NANOS) — surface as long,
      // Tables converts to micros timestamp (see Tables.apply).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
