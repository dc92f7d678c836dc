package graft

/** Dump the AQE-final `.explain("formatted")` plan of named queries to
  * per-query text files — the `plans/r19/<query>_{before,after}.txt`
  * optimization-round evidence (the PlanAudit capture, but one file per
  * query so before/after diffs stay reviewable).
  *
  * `runMain graft.ExplainDump <sfDir> <outDir> <suffix> <name>[,name...]`
  * writes `<outDir>/<name>_<suffix>.txt` per query. The query is
  * EXECUTED first (collect) so the dumped plan is the AQE-final one —
  * an initial `isFinalPlan=false` dump would hide the coalesced reads
  * and runtime join rewrites the claims are about.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainDump <sfDir> <outDir> <suffix> <name>[,name...]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.get()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // force the AQE-final plan (the PlanAudit discipline)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      // cache isolation between dumps (the Bench/PlanAudit rule)
      Caches.sweep(spark)
    }
    println(s"wrote ${names.size} plans to $outDir")
    spark.stop()
  }
}
