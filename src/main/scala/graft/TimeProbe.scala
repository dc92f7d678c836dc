package graft

/** Ad-hoc single-query timing probe: `runMain graft.TimeProbe <sfDir>
  * <name> [reps]` — warm run + reps with [[Caches.sweep]] between, so
  * a query family can be timed in isolation from suite load. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setJobDescription(s"timeprobe: $name warm")
    SparkEntry.queries(name)(spark, dir).collect()
    Caches.sweep(spark)
    for (r <- 1 to reps) {
      spark.sparkContext.setJobDescription(s"timeprobe: $name rep$r")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).collect()
      println(f"[timeprobe] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Caches.sweep(spark)
    }
    spark.stop()
  }
}
