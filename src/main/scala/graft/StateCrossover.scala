package graft

/** The state-knob CROSSOVER probe (round-19): runs the state ladder one
  * rung past the knob matrix — thr=1500 admits the table's FULL key
  * space (user ids are 0..1499 per replica), 300x the gate's state and
  * 3x the matrix's 100x rung, which is where the ladder's key axis tops
  * out — under the two contenders the matrix priced, in a JVM whose
  * heap the caller bounds via SPARK_DRIVER_MEM (the rest of the wall).
  * The r18 matrix showed the knobs cost a premium at the 100x rung
  * (32 parts 1.59x, RocksDB 3.04x) and CLAIMED they pay only past the
  * memory wall; this probe demonstrates the wall: with a bounded heap,
  * memory/4-parts must degrade or OOM where RocksDB/32-parts (state in
  * native memory + disk) completes under the SAME bound.
  *
  * Design notes:
  *  - Output goes to the NO-OP sink ([[graft.streaming.StreamOps.runToNoop]]):
  *    a memory sink buffers every output row on-heap and would confound
  *    the state-store wall with sink memory.
  *  - RocksDB/32 runs FIRST and results are flushed to the TSV after
  *    every variant, so a hard OOM on the memory row cannot erase the
  *    completed row (local mode shares the executor JVM; an Error may
  *    surface as a caught SparkException or kill the process outright —
  *    both outcomes are recorded, the latter by the missing row).
  *  - One rep per variant: the claim is completion-vs-wall and a coarse
  *    price, not a floor; reps stay the knob matrix's job.
  *
  * Args: srcDir (sf0.1), outDir (scale-probe work dir), tag (labels the
  * heap configuration, e.g. "8g"/"2g"), thr (default 1500). Appends rows
  * to `<outDir>/crossover_<tag>.tsv`:
  * `tag  heapMB  thr  variant  rows  sec  status`.
  * [[ScaleProbe]] folds any crossover TSVs it finds into PERF_PROBE.md.
  */
object StateCrossover {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/target/scaleprobe/sf1")
    val tag = args.lift(2).getOrElse("default")
    val thr = args.lift(3).map(_.toLong).getOrElse(1500L)
    val spark = Sessions.get()
    val dir = ScaleProbe.ensureState100x(spark, srcDir, outDir)
    val heapMb = Runtime.getRuntime.maxMemory() / (1024L * 1024L)
    val out = java.nio.file.Paths.get(s"$outDir/crossover_$tag.tsv")
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val variants = Seq(
      ("32 parts, rocksdb", 32, Some(rocks)),
      ("4 parts, memory", 4, None))
    val rows = new scala.collection.mutable.ArrayBuffer[String]
    variants.foreach { case (label, parts, prov) =>
      val line = try {
        val (n, sec) = ScaleProbe.stateLadderRung(spark, dir, thr, parts,
          prov, s"xover_${tag}_" + label.replaceAll("[^a-z0-9]+", "_"),
          reps = 1, noopSink = true)
        f"$tag\t$heapMb\t$thr\t$label\t$n\t$sec%.2f\tok"
      } catch { case t: Throwable =>
        val cause = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .toSeq.lastOption.getOrElse(t)
        s"$tag\t$heapMb\t$thr\t$label\t-1\t-1\t" +
          (cause.getClass.getSimpleName + ": " +
            Option(cause.getMessage).getOrElse("").replaceAll("\\s+", " ")
              .take(140))
      }
      rows += line
      java.nio.file.Files.writeString(out, rows.mkString("", "\n", "\n"))
      println(s"[crossover] $line")
    }
    spark.stop()
  }
}
