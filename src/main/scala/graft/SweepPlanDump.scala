package graft

import graft.operators.IterativeLoop

/** Dump the AQE-final `.explain("formatted")` plan of an ITERATIVE
  * query's steady-state sweep body — the evidence `ExplainDump` cannot
  * produce for loop queries, whose returned frame is a bare
  * localCheckpoint scan (the sweep plans are consumed inside the loop,
  * and the per-round action is an RDD count no QueryExecutionListener
  * sees). Uses [[IterativeLoop.planHook]] to capture each round's
  * pre-materialization frame, executes the query normally (so the
  * captured frame's QueryExecution reaches its AQE-final state), then
  * writes the requested round's plan.
  *
  * `runMain graft.SweepPlanDump <sfDir> <outDir> <suffix> <name> [round]`
  * writes `<outDir>/<name>_sweep<round>_<suffix>.txt`. Round defaults
  * to 2 — the first round whose INPUT state is already a checkpoint,
  * i.e. the shape every remaining sweep repeats.
  */
object SweepPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: SweepPlanDump <sfDir> <outDir> <suffix> <name> [round]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val name = args(3)
    val wantRound = if (args.length > 4) args(4).toInt else 2
    java.nio.file.Files.createDirectories(outDir)
    val spark = Sessions.get()
    val captured =
      scala.collection.mutable.Map.empty[Int, org.apache.spark.sql.DataFrame]
    IterativeLoop.planHook = Some((round, next) => {
      // keep only the requested round (holding every round's frame
      // keeps plan references alive for no reason)
      if (round == wantRound) captured(round) = next
    })
    try {
      SparkEntry.queries(name)(spark, sfDir).collect()
      val df = captured.getOrElse(wantRound, sys.error(
        s"$name never reached loop round $wantRound — pass a smaller round"))
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_sweep${wantRound}_$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"wrote ${name} round-$wantRound sweep plan to $outDir")
    } finally {
      IterativeLoop.planHook = None
      Caches.sweep(spark)
      spark.stop()
    }
  }
}
