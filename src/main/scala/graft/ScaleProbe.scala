package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One REAL scale point above sf0.1 (round-12 directive): build an sf1
  * dataset (10x sf0.1) and measure the most expensive query families at
  * both scale factors, so the documented scale shapes become measured
  * ratios instead of extrapolations. Appends a `## Scale probe` section
  * to PERF_PROBE.md. `sbt "runMain graft.ScaleProbe [srcDir] [outDir]
  * [probeFile]"`.
  *
  * sf1 construction — 10 KEY-DISJOINT replicas of sf0.1, because the
  * driver's generator is not available and a faithful scale probe needs
  * the per-key densities, join fanouts, and degree distributions of the
  * real testdata, which replication preserves exactly:
  *  - fact/entity keys shift by `replica * 10_000_000` (disjoint from
  *    every sf0.1 key range and from the +1e6 node offsets the graph
  *    gates add), so orders/lineitem fanout, graph degree distributions,
  *    and group cardinalities per key are IDENTICAL to sf0.1 — volume
  *    scales 10x, shape scales the way a 10x corpus does;
  *  - `region`/`nation` copy verbatim (dimensions do not scale with the
  *    fact — the TPC discipline);
  *  - `documents` replicas salt every TOKEN with the replica id
  *    (disjoint vocabularies): within-replica near-dup structure is
  *    identical to sf0.1 while replicas never near-match each other —
  *    without the salt every document would sit in a fake 10-clone
  *    cluster and the dedup probe would measure an artifact. Vocabulary
  *    grows 10x, the new-domains-bring-new-vocab growth model;
  *  - `embeddings` replicas add a deterministic per-(vector, dim)
  *    jitter of up to ±0.1 so no vector has exact clones (ANN/SemDeDup
  *    would otherwise degenerate to distance-0 pairs);
  *  - `events` shifts ids but keeps the time span: 10x event volume
  *    over the same window, the realistic traffic-growth model (windows
  *    per key stay put, rows per window grow).
  *
  * Build-if-absent under a content-keyed `_graft_ident` (the t23/s04
  * layout discipline) so re-runs and same-session probes reuse files.
  */
object ScaleProbe {

  private val Replicas = 10
  private val KeyOff = 10000000L

  /** Write the sf1 tables under `outDir` if no completed build with a
    * matching ident exists. */
  def buildSf1(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val ident = s"graft-scale-v2 replicas=$Replicas " +
      s"src=${Tables.contentKey(s"$srcDir/lineitem.parquet")}-" +
      Tables.contentKey(s"$srcDir/documents.parquet")
    val identPath = new org.apache.hadoop.fs.Path(path, "_graft_ident")
    val identMatches = fs.exists(identPath) && {
      val in = fs.open(identPath)
      try new String(in.readAllBytes(), "UTF-8") == ident
      finally in.close()
    }
    if (identMatches) return
    if (fs.exists(path)) fs.delete(path, true)

    // each table lands as ONE FILE named `<name>.parquet`, exactly the
    // testdata layout — the file-stream reader's pathGlobFilter and the
    // footer-based contentKey both address single files, so a directory
    // layout would silently stream zero rows (measured: st07 read
    // nothing from a directory-per-table sf1)
    def writeSingle(df: DataFrame, name: String): Unit = {
      val tmp = s"$outDir/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val tmpPath = new org.apache.hadoop.fs.Path(tmp)
      val part = fs.listStatus(tmpPath).map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$outDir/$name.parquet"))
      fs.delete(tmpPath, true)
    }
    def replicate(name: String)(tf: (DataFrame, Int) => DataFrame): Unit = {
      val src = Tables(spark, srcDir, name)
      writeSingle((0 until Replicas).map(r => tf(src, r))
        .reduce(_ unionByName _), name)
    }
    def off(r: Int): Long = r.toLong * KeyOff

    // dimensions that do not scale with the fact: verbatim copy
    Seq("region", "nation").foreach { n =>
      writeSingle(Tables(spark, srcDir, n), n)
    }
    replicate("customer")((df, r) => df
      .withColumn("c_custkey", col("c_custkey") + off(r)))
    replicate("supplier")((df, r) => df
      .withColumn("s_suppkey", col("s_suppkey") + off(r)))
    replicate("part")((df, r) => df
      .withColumn("p_partkey", col("p_partkey") + off(r)))
    replicate("orders")((df, r) => df
      .withColumn("o_orderkey", col("o_orderkey") + off(r))
      .withColumn("o_custkey", col("o_custkey") + off(r)))
    replicate("lineitem")((df, r) => df
      .withColumn("l_orderkey", col("l_orderkey") + off(r))
      .withColumn("l_partkey", col("l_partkey") + off(r))
      .withColumn("l_suppkey", col("l_suppkey") + off(r)))
    replicate("events")((df, r) => df
      .withColumn("event_id", col("event_id") + off(r))
      .withColumn("user_id", col("user_id") + off(r)))
    replicate("documents")((df, r) =>
      (if (r == 0) df
       else df.withColumn("text", array_join(
         transform(split(col("text"), " "),
           x => when(x === "", x).otherwise(concat(x, lit(s"~$r")))), " ")))
        .withColumn("doc_id", col("doc_id") + off(r))
        .withColumn("n_chars", length(col("text"))))
    replicate("embeddings")((df, r) =>
      (if (r == 0) df
       else df.withColumn("embedding",
         expr(s"""transform(embedding, (x, i) -> cast(x +
                 |  (pmod(xxhash64(vec_id * 131 + i + $r), 201) - 100)
                 |    / 1000.0 as float))""".stripMargin)))
        .withColumn("vec_id", col("vec_id") + off(r)))

    val out = fs.create(identPath, true)
    try out.write(ident.getBytes("UTF-8")) finally out.close()
  }

  /** The measured families (the round-11 verdict's list, extended round
    * 14 with the round-13/14 heavies): the most expensive full-suite
    * rows, one per scale-sensitive family. */
  private[graft] val probeQueries = Seq(
    "d06_dedup_clusters", "d07_dedup_canonical", // LSH + CC
    "q103_pagerank", "q122_coreness", "q124_hits", // iterative graph
    "t32_unigram_train", // histogram-grain EM
    "q84_fuzzy_match", // bounded ingest batch vs master (re-scoped r16)
    "q128_edit_distance_join", // PassJoin segment-blocked edit join
    "d17_lsh_index", // persisted-LSH ingest probe (build-once layout)
    "q98_column_stats_approx", // exact+approx ANALYZE
    "sq09_tpcds_q27", // five-way star + rollup
    "st07_stream_join_outer", // streaming state-store outer join
    // round-13/14 heavies (round-13 verdict #7):
    "m08_binary_near_dup", // ingest near-dup vs the persisted layout (r15)
    "m09_binary_simhash_index", // the build-once serving counterpart
    "q146_diameter", // double-sweep BFS
    "q157_diameter_ifub", // iFUB fringe sweeps (landmark expansions)
    "q151_weighted_pagerank", // weighted iterative graph
    "t48_textrank", // pageRank over the word graph
    "t52_lm_index", // persisted bigram-LM bucket-pruned serving
    "s12_pq_adc", // PQ train + encode + map-only ADC serving
    // round-15 verdict #3/#5: the three r15 gates that shipped without
    // a scale row, plus the new recall gate
    "s17_ivf_adc", // composed IVFADC serving (cells + ADC codes)
    "s18_ivf_adc_layout", // persisted IVFADC probe (build-once layout)
    "s19_ivf_adc_recall", // recall contract: 3 brute-force evals + serving
    // round 18: the composed-dials recall contract, the layout-served
    // rerank (build-once layout), and the engine-exact trained cells
    "s20_ivf_adc_rerank_recall", "s21_ivf_adc_rerank_layout",
    "s22_ivf_trained_cells_exact", "s23_ivf_trained_vs_modulo_recall",
    "s24_ivf_adc_append",
    // round 19: trained-coarse ADC layout + its recall contract
    "s25_ivf_adc_trained_layout", "s26_ivf_adc_trained_recall",
    "s27_ivf_adc_trained_append",
    "q161_distance_distribution") // exact ANF readout (driver-path gate)

  /** PROBE-ONLY measurements — shapes the gates deliberately exclude,
    * timed here so their scale story is measured, not asserted:
    *  - the retired q84 whole-corpus length-band SELF-join (weak
    *    blocking: block sizes grow with the table, candidates ~n² —
    *    kept as the documented anti-pattern counterexample to q128's
    *    PassJoin; round-15 verdict re-scoped the GATE to the bounded
    *    ingest shape and sent this here);
    *  - q161's graph through the DISTRIBUTED landmark loop
    *    (`driverFrontierBelow = 0`) on a REPLICA-SPANNING, hence
    *    genuinely growing, graph with the sampled estimator
    *    (`sampleEvery = 8`) — the gate's graph is replica-0-pinned and
    *    rides the driver path, so this row is the distributed
    *    machinery's measured-scale evidence (round-15 verdict #3);
    *  - st07's join with a REPLICA-SPANNING predicate
    *    (`user_id % 10_000_000 < 500` selects the same 500-user slice
    *    of EVERY replica), so sf1 streaming STATE is genuinely 10x —
    *    the gate's `user_id < 500` stays inside replica 0 and measures
    *    pushdown, not state (round-15 verdict #4). */
  private[graft] val probeOnly: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "x_q84_lengthband_selfjoin" -> ((s: SparkSession, dir: String) => {
      val sup = Tables(s, dir, "supplier")
      val a = sup.select(col("s_suppkey").as("id_a"),
        col("s_name").as("name_a"), length(col("s_name")).as("la"))
      val b = sup.select(col("s_suppkey").as("id_b"),
        col("s_name").as("name_b"), length(col("s_name")).as("lb"))
      a.withColumn("lb", explode(sequence(col("la") - 2, col("la") + 2)))
        .join(b, Seq("lb"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 2)
        .select(col("id_a"), col("id_b"), col("dist"))
    }),
    "x_s17_modulo_cells" -> ((s: SparkSession, dir: String) => {
      // the RETIRED s17 gate fixture (round-17 re-scope, verdict #3):
      // centEvery FIXED at 25 ⇒ the cell count grows with the corpus,
      // so inline assignment is |corpus|·|cells| = quadratic — kept
      // here as the measured anti-pattern counterexample (the
      // x_q84_lengthband precedent). The gate now runs the production
      // pinned-cell-count rule (centEvery = max(25, n/240) — ~240
      // cells at every SF, assignment one linear broadcast pass),
      // with its DuckDB oracle computing the same expression.
      val emb = Tables(s, dir, "embeddings")
      val model = graft.operators.Similarity.pqTrain(
        emb, "vec_id", "embedding", m = 4, k = 4, iters = 1)
      val query = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      graft.operators.Similarity.ivfAdcTopK(emb, "vec_id", "embedding",
        model, query, kNN = 10, nProbe = 2, centEvery = 25)
    }),
    "x_q161_distributed_growing" -> ((s: SparkSession, dir: String) => {
      val edges = Tables(s, dir, "lineitem")
        .filter(col("l_quantity") >= 50)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables(s, dir, "orders")
            .filter(pmod(col("o_custkey"), lit(10000000L)) < 500)
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey") + 1000000L).cast("long").as("dst"))
      graft.operators.GraphOps.distanceDistribution(
        edges, "src", "dst", maxHops = 32, sampleEvery = 8,
        driverFrontierBelow = 0L)
    }),
    "x_st07_state_10x" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.StreamOps
      val ev = StreamOps.readEvents(s, dir)
        .filter(pmod(col("user_id"), lit(10000000L)) < 500)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val joined = p.join(c,
        p("user_id") === c("c_user") &&
          c("c_ts") >= p("p_ts") - expr("INTERVAL 1 HOUR") &&
          c("c_ts") <= p("p_ts"),
        "left_outer")
      StreamOps.runToMemory(s, joined, "x_st07_state_out",
        OutputMode.Append())
    }))

  /** Best-of-2 wall seconds (single rep past 60s — the second rep buys
    * JIT-noise reduction, not correctness, and a minute-long query is
    * far past noise), plus rows. Build-once layout queries
    * ([[Bench.layoutBuilders]]) get one UNTIMED pre-run first — the
    * Bench warm-up discipline — so the serving rows measure serving:
    * without it, a layout whose build alone passes the 60s single-rep
    * bar reports its one-time build cost as if it were the steady
    * state (m09's sf1 build over the full 10x corpus did exactly
    * that). */
  /** Streaming STATE ladder (round-16 verdict #4): x_st07_state_10x
    * proved a 10x state step is absorbed invisibly at probe sizes; this
    * block measures where state-store cost BECOMES visible and its
    * slope from there. Design isolates state from scan: one 100-replica
    * events table (10M rows, built once under ident) is scanned IN FULL
    * by every rung, while the replica-spanning predicate
    * `user_id % 10M < thr` admits 1x / 10x / 100x of the gate's state
    * (thr 5 / 50 / 500 — the same per-replica user slice at every
    * rung, so per-key window density is constant and only the KEY COUNT
    * scales). AvailableNow over the single file is one microbatch, so
    * the interval join's peak state is exactly the admitted rows.
    * @return (thr, outRows, bestSec) per rung. */
  private def stateLadder(spark: SparkSession, srcDir: String,
      outDir: String): Seq[(Long, Long, Double)] = {
    val dir = ensureState100x(spark, srcDir, outDir)
    Seq(5L, 50L, 500L).map { thr =>
      val (n, best) = stateLadderRung(spark, dir, thr, 4, None, "base")
      (thr, n, best)
    }
  }

  /** Build (or ident-hit) the 100-replica events table the state ladder
    * and the crossover rung scan; returns its directory. Shared with
    * [[StateCrossover]], which runs in its OWN forked JVM so a
    * deliberately heap-bounded run can hit the memory wall without
    * taking the probe session down. */
  private[graft] def ensureState100x(spark: SparkSession, srcDir: String,
      outDir: String): String = {
    val dir = s"$outDir/state100x"
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val ident = "graft-state100x-v1 reps=100 src=" +
      Tables.contentKey(s"$srcDir/events.parquet")
    val identPath = new org.apache.hadoop.fs.Path(path, "_graft_ident")
    val identMatches = fs.exists(identPath) && {
      val in = fs.open(identPath)
      try new String(in.readAllBytes(), "UTF-8") == ident
      finally in.close()
    }
    if (!identMatches) {
      if (fs.exists(path)) fs.delete(path, true)
      val src = Tables(spark, srcDir, "events")
      val tmp = s"$dir/_tmp_events"
      (0 until 100).map { r =>
        src.withColumn("event_id", col("event_id") + lit(r * 10000000L))
          .withColumn("user_id", col("user_id") + lit(r * 10000000L))
      }.reduce(_ unionByName _)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      val out = fs.create(identPath, true)
      try out.write(ident.getBytes("UTF-8")) finally out.close()
    }
    dir
  }

  /** One ladder rung: full scan of the 100-replica events table, the
    * replica-spanning predicate admitting `thr`-scaled state into the
    * interval join, run under the given shuffle-partition count and
    * state-store provider (the two production state knobs). Best of 2
    * cold-cache reps. */
  private[graft] def stateLadderRung(spark: SparkSession, dir: String,
      thr: Long, parts: Int, provider: Option[String], tag: String,
      reps: Int = 2, noopSink: Boolean = false): (Long, Double) = {
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamOps
    var best = Double.MaxValue
    var n = 0L
    for (_ <- 1 to reps) {
      Caches.sweep(spark)
      val t0 = System.nanoTime()
      val ev = StreamOps.readEvents(spark, dir)
        .filter(pmod(col("user_id"), lit(10000000L)) < thr)
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val cl = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val joined = pu.join(cl,
        pu("user_id") === cl("c_user") &&
          cl("c_ts") >= pu("p_ts") - expr("INTERVAL 1 HOUR") &&
          cl("c_ts") <= pu("p_ts"),
        "left_outer")
      n = if (noopSink)
        StreamOps.runToNoop(spark, joined,
          s"x_state_ladder_${thr}_$tag", OutputMode.Append(),
          shufflePartitions = parts, stateProvider = provider)
      else StreamOps.runToMemory(spark, joined,
        s"x_state_ladder_${thr}_$tag", OutputMode.Append(),
        shufflePartitions = parts, stateProvider = provider).count()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    Caches.sweep(spark)
    println(f"[scale] state ladder thr=$thr%-4d parts=$parts%-2d " +
      f"${provider.map(_ => "rocksdb").getOrElse("memory")}%-7s " +
      f"$best%6.2fs ($n rows)")
    (n, best)
  }

  /** Knob matrix at the state ladder's 100x rung (round-17 verdict #3):
    * the ladder's reading prescribes "raise shuffle partitions and move
    * to RocksDB" past the visible point — this prices both levers on
    * the SAME 100x-state scan so the prescription is measured, not
    * prose. Returns (label, rows, bestSec); the 4-partition
    * memory-provider row is the ladder's own 100x rung re-run in-matrix
    * so all four variants share one session and day. */
  private def stateKnobMatrix(spark: SparkSession,
      outDir: String): Seq[(String, Long, Double)] = {
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    Seq(
      ("4 parts, memory", 4, None),
      ("32 parts, memory", 32, None),
      ("4 parts, rocksdb", 4, Some(rocks)),
      ("32 parts, rocksdb", 32, Some(rocks))
    ).map { case (label, parts, prov) =>
      val (n, best) = stateLadderRung(spark, s"$outDir/state100x", 500L,
        parts, prov, label.replaceAll("[^a-z0-9]+", "_"))
      (label, n, best)
    }
  }

  private def timeFn(spark: SparkSession,
      fn: (SparkSession, String) => DataFrame, dir: String,
      preBuild: Boolean): (Double, Long, Int) = {
    if (preBuild) {
      // NonFatal only: a fatal JVM error (OOM, LinkageError) must
      // propagate — swallowing it would let the timed rep run in a
      // corrupted session and report a misleading failure
      try fn(spark, dir).count()
      catch { case scala.util.control.NonFatal(_) => () } // timed rep reports it
      finally Caches.sweep(spark)
    }
    var best = Double.MaxValue
    var rows = 0L
    var repsRun = 0
    var continue = true
    for (_ <- 1 to 2 if continue) {
      Caches.sweep(spark)
      val t0 = System.nanoTime()
      rows = fn(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      repsRun += 1
      best = math.min(best, t)
      if (t > 60.0) continue = false
    }
    Caches.sweep(spark)
    (best, rows, repsRun)
  }

  private def time(spark: SparkSession, name: String, dir: String): (Double, Long, Int) =
    timeFn(spark, SparkEntry.queries(name), dir,
      preBuild = Bench.layoutBuilders.contains(name))

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/root/repo/target/scaleprobe/sf1")
    val probeFile = args.lift(2).getOrElse("/root/repo/PERF_PROBE.md")
    val spark = Sessions.get()
    val tBuild0 = System.nanoTime()
    buildSf1(spark, srcDir, outDir)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9

    val rows = (probeQueries.map(n => (n, false)) ++
        probeOnly.map { case (n, _) => (n, true) }).map { case (name, isProbe) =>
      def run(dir: String) =
        if (isProbe) timeFn(spark, probeOnly.toMap.apply(name), dir,
          preBuild = false)
        else time(spark, name, dir)
      val (s01, r01, _) = run(srcDir)
      val (s1, r1, reps1) = run(outDir)
      println(f"[scale] $name%-28s sf0.1 $s01%6.2fs ($r01 rows)  " +
        f"sf1 $s1%7.2fs ($r1 rows, $reps1 reps)  ratio ${s1 / s01}%5.2fx")
      (name, s01, r01, s1, r1, s1 / s01)
    }

    // s19's recall floor as MEASURED EVIDENCE across SFs (round-16
    // verdict #6): the gate asserts per-query recall@10 >= 0.2 at the
    // gated SF; this block runs the SAME fraction-pinned config
    // (m=8 k=16, nProbe = max(4, cells/6), centEvery=25) at every SF so
    // the floor's margin at the bench and probe scales is a measured
    // curve in the artifact, not a comment.
    val recallDirs = (if (new java.io.File("/root/testdata/sf0.01")
        .isDirectory) Seq("sf0.01" -> "/root/testdata/sf0.01") else Nil) ++
      Seq("sf0.1" -> srcDir, "sf1" -> outDir)
    val recallRows = recallDirs.map { case (sf, dir) =>
      val emb = Tables(spark, dir, "embeddings")
      val model = graft.operators.Similarity.pqTrain(
        emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
      val nCells = emb.filter(col("vec_id") % 25 === 0).count()
      val recalls = graft.operators.Similarity.ivfAdcRecallAtK(
          emb, Seq(0L, 1L, 2L), k = 10,
          nProbe = math.max(4L, nCells / 6).toInt, centEvery = 25,
          model, recallFloor = 0.2)
        .orderBy(col("q_id")).select(col("recall"))
        .collect().map(_.getDouble(0)).toSeq
      // the s20 config: BOTH production dials composed — 2x probe
      // fraction (cells/3) + exact rerank of the ADC top-100 (round-17
      // verdict #1; rerank ALONE at the s19 fraction is ceiling-capped
      // at 0.2 by cell pruning for query 2 at sf0.1 — measured, see the
      // s20 gate comment) — the margin the lever stack buys, measured
      // at every SF on the same day/session as the s19 row
      val reranked = graft.operators.Similarity.ivfAdcRecallAtK(
          emb, Seq(0L, 1L, 2L), k = 10,
          nProbe = math.max(8L, nCells / 3).toInt, centEvery = 25,
          model, recallFloor = 0.4, rerankCandidates = 100)
        .orderBy(col("q_id")).select(col("recall"))
        .collect().map(_.getDouble(0)).toSeq
      Caches.sweep(spark)
      println(f"[scale] s19 recall@10 $sf%-7s ${recalls.mkString(", ")}" +
        f"  | s20 reranked ${reranked.mkString(", ")}")
      (sf, recalls, reranked)
    }

    val ladder = stateLadder(spark, srcDir, outDir)
    val knobs = stateKnobMatrix(spark, outDir)

    val sb = new StringBuilder
    sb.append("\n## Scale probe: sf0.1 → sf1 (measured, not extrapolated)\n\n")
    sb.append(s"Generated by `graft.ScaleProbe`: sf1 = 10 key-disjoint\n")
    sb.append("replicas of sf0.1 (per-key densities, join fanouts, degree\n")
    sb.append("distributions preserved; document replicas carry disjoint\n")
    sb.append("salted vocabularies so near-dup structure scales honestly;\n")
    sb.append(f"embeddings jittered against fake distance-0 clones). Build\n")
    sb.append(f"${buildSec}%.0fs (skipped on ident hit); best of 2 reps\n")
    sb.append("(single rep past 60s), cold caches per rep; build-once\n")
    sb.append("layout queries pre-build UNTIMED per scale factor (the\n")
    sb.append("Bench warm-up rule) so serving rows measure serving.\n")
    sb.append("Rows prefixed `x_` are PROBE-ONLY shapes (not gates) —\n")
    sb.append("see their dedicated reading notes below.\n\n")
    sb.append("| query | sf0.1 s | rows | sf1 s | rows | ratio |\n")
    sb.append("|---|---|---|---|---|---|\n")
    rows.foreach { case (n, s01, r01, s1, r1, ratio) =>
      sb.append(f"| $n | $s01%.2f | $r01 | $s1%.2f | $r1 | $ratio%.2fx |\n")
    }
    sb.append("\n### s19 recall@10 vs SF (fraction-pinned nProbe, measured)\n\n")
    sb.append("The gate's 0.2 floor, priced at every scale with the gate's\n")
    sb.append("own config (m=8 k=16, nProbe = max(4, cells/6), centEvery=25,\n")
    sb.append("query ids 0/1/2). On the ORGANIC corpus (sf0.01 -> sf0.1), ADC\n")
    sb.append("distractor mass grows with the corpus at a fixed code budget\n")
    sb.append("and recall declines — the honest fixed-budget behavior; the\n")
    sb.append("floor sits at the largest ORGANIC operating point, so a config\n")
    sb.append("change that degrades the stack fails the gate before the\n")
    sb.append("margin is gone. The sf1 row saturating at 1.0 is a REPLICA\n")
    sb.append("ARTIFACT, read accordingly: sf1 embeddings are 10 jittered\n")
    sb.append("(+/-0.1) key-disjoint copies, so each query's TRUE quantized-L2\n")
    sb.append("top-10 becomes its own clone cluster — which shares the\n")
    sb.append("query's probed cells and outranks every distractor through\n")
    sb.append("ADC despite code distortion. It measures that the stack\n")
    sb.append("finds strong true neighbors perfectly when they exist; the\n")
    sb.append("distractor-regime claim rests on the organic rows.\n")
    sb.append("The s20 columns are the SAME stack with BOTH production\n")
    sb.append("recall dials composed (round-18): probe fraction doubled to\n")
    sb.append("cells/3 AND exact rerank of the ADC top-100 (one <=100-row\n")
    sb.append("broadcast-semi-join pass — shortlist-bounded, corpus-free),\n")
    sb.append("gated at >= 0.4 per query. Measured decomposition (s20 gate\n")
    sb.append("comment): rerank alone at the s19 fraction is ceiling-capped\n")
    sb.append("at 0.2 by CELL PRUNING for query 2 at sf0.1, and the deeper\n")
    sb.append("probe alone stays ~0.3 under code distortion — only the\n")
    sb.append("composition clears the floor, the FAISS tuning recipe\n")
    sb.append("(nprobe up to the cell-recall ceiling, refine under it).\n\n")
    sb.append("| sf | s19 per-query recall@10 | min | >= 0.2 " +
      "| s20 reranked per-query | min | >= 0.4 |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    recallRows.foreach { case (sf, rs, rr) =>
      sb.append(f"| $sf | ${rs.mkString(", ")} | ${rs.min}%.2f | ${
        if (rs.min >= 0.2) "yes" else "NO"} | ${rr.mkString(", ")} | ${
        rr.min}%.2f | ${if (rr.min >= 0.4) "yes" else "NO"} |\n")
    }
    sb.append("\n### Streaming state ladder: 1x / 10x / 100x state, constant scan\n\n")
    sb.append("x_st07_state_10x bounded a 10x state step (invisible at probe\n")
    sb.append("sizes); this ladder measures where state-store cost becomes\n")
    sb.append("VISIBLE and its slope. Every rung scans the SAME 100-replica\n")
    sb.append("events table (10M rows, one microbatch) in full — only the\n")
    sb.append("replica-spanning predicate changes, so wall differences are\n")
    sb.append("state cost, not scan cost. Per-key window density is constant\n")
    sb.append("(the same per-replica user slice at every rung); only the key\n")
    sb.append("count scales. Peak state = the admitted rows (single batch:\n")
    sb.append("the watermark advances only at batch end).\n\n")
    sb.append("| thr (users) | state scale | out rows | best s |\n")
    sb.append("|---|---|---|---|\n")
    val scaleNames = Seq("1x (gate-sized)", "10x", "100x")
    ladder.zip(scaleNames).foreach { case ((thr, n, sec), nm) =>
      sb.append(f"| $thr (${thr * 100}) | $nm | $n | $sec%.2f |\n")
    }
    (ladder.headOption, ladder.lastOption) match {
      case (Some((_, n1, s1)), Some((_, n100, s100))) if n100 > n1 =>
        // the VISIBLE point: first rung whose wall exceeds the 1x rung
        // by >20% (beyond best-of-2 run noise on an identical scan)
        val visible = ladder.zip(scaleNames)
          .find { case ((_, _, sec), _) => sec > s1 * 1.2 }
        sb.append(f"\nMeasured reading: the 100x rung costs ${s100 / s1}%.2fx the\n")
        sb.append("1x rung on an identical scan. ")
        visible match {
          case Some((_, nm)) =>
            sb.append(f"State-store cost becomes VISIBLE (>1.2x the 1x\n")
            sb.append(f"rung) at the $nm rung; the growth slope from the 1x rung is\n")
            sb.append(f"${(s100 - s1) / (n100 - n1) * 1e6}%.1f us per state/output row (join buffering +\n")
            sb.append("eviction + emit, amortized over the 100x step). On a cluster\n")
            sb.append("the signal at that point is to raise the stateful operator's\n")
            sb.append("shuffle partitions (runToMemory pins 4 here) and move the\n")
            sb.append("state store to RocksDB — the knobs exist precisely because\n")
            sb.append("this term eventually wins.\n")
          case None =>
            sb.append(f"Even 100x state stays within 20%% of the 1x wall —\n")
            sb.append(f"the marginal cost, ${(s100 - s1) / (n100 - n1) * 1e6}%.1f us per state/output row, is\n")
            sb.append("still below the microbatch's fixed cost at these absolute\n")
            sb.append("sizes; the slope is the number to extrapolate, and it says\n")
            sb.append("state wins roughly another 1-2 orders of magnitude out,\n")
            sb.append("where the shuffle-partition and RocksDB knobs take over.\n")
        }
      case _ => ()
    }
    sb.append("\n### State knobs priced at the 100x rung (round-18)\n\n")
    sb.append("The ladder's reading names two production levers past the\n")
    sb.append("visible point — raise the stateful operator's shuffle\n")
    sb.append("partitions (the gates pin 4) and move the state store to\n")
    sb.append("RocksDB. This matrix runs the SAME 100x-state scan (thr=500,\n")
    sb.append("identical plan and rows) under all four combinations, same\n")
    sb.append("session and day, best of 2 cold-cache reps — so the\n")
    sb.append("prescription is a measured price, not prose.\n\n")
    sb.append("| variant | out rows | best s | vs 4/memory |\n")
    sb.append("|---|---|---|---|\n")
    val knobBase = knobs.headOption.map(_._3).getOrElse(1.0)
    knobs.foreach { case (label, n, sec) =>
      sb.append(f"| $label | $n | $sec%.2f | ${sec / knobBase}%.2fx |\n")
    }
    (knobs.find(_._1 == "32 parts, memory"),
        knobs.find(_._1 == "4 parts, rocksdb")) match {
      case (Some((_, _, p32)), Some((_, _, rdb))) =>
        sb.append(f"\nMeasured reading: at THIS absolute state size, 32\n")
        sb.append(f"partitions costs ${p32 / knobBase}%.2fx the 4-partition wall and\n")
        sb.append(f"RocksDB costs ${rdb / knobBase}%.2fx — both knobs price the\n")
        sb.append("per-instance fixed cost they add (8x more state-store\n")
        sb.append("commits; JNI + disk persistence vs an in-heap map). They\n")
        sb.append("pay off only past the memory wall: more partitions when\n")
        sb.append("per-partition state outgrows an executor's heap share\n")
        sb.append("(parallelizing eviction/commit), RocksDB when TOTAL state\n")
        sb.append("outgrows the heap (spilling it off-heap at the measured\n")
        sb.append("premium instead of OOM). The slope to extrapolate stays\n")
        sb.append("the ladder's us/state-row; these rows bound what buying\n")
        sb.append("headroom costs when that slope's term dominates.\n")
        // the knob INTERACTION, when measured: once on RocksDB, more
        // partitions parallelize the JNI/commit cost that a few big
        // stores serialize — the combination to reach for at scale
        (knobs.find(_._1 == "32 parts, rocksdb").map(_._3), Some(rdb)) match {
          case (Some(r32), Some(r4)) if r32 < r4 =>
            sb.append(f"Note the interaction: RocksDB at 32 partitions\n")
            sb.append(f"(${r32 / knobBase}%.2fx) beats RocksDB at 4 (${r4 / knobBase}%.2fx) —\n")
            sb.append("once the provider's per-commit cost dominates, MORE\n")
            sb.append("partitions parallelize it, so the two levers are pulled\n")
            sb.append("TOGETHER at scale, not independently.\n")
          case _ => ()
        }
      case _ => ()
    }
    // Crossover rung (round-19 verdict #6): fold in any TSVs a
    // separately-forked StateCrossover JVM left behind — those runs
    // bound their own heap via SPARK_DRIVER_MEM, which this session
    // cannot change for itself, and may legitimately have DIED on the
    // memory-provider row (the missing/failed row IS the measurement).
    val xoverFiles = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("crossover_") &&
        f.getName.endsWith(".tsv")).sortBy(_.getName)
    if (xoverFiles.nonEmpty) {
      sb.append("\n### The memory wall, demonstrated (round-19 crossover rung)\n\n")
      sb.append("The matrix above prices the knobs at a state size the heap\n")
      sb.append("absorbs; this rung pushes to the ladder's key-axis ceiling\n")
      sb.append("(thr=1500 admits the table's FULL key space — 300x the\n")
      sb.append("gate's state, 3x the matrix rung) in SEPARATE JVMs whose\n")
      sb.append("heap is bounded via SPARK_DRIVER_MEM, no-op sink so output\n")
      sb.append("cannot confound state memory, single rep (the claim is\n")
      sb.append("completion vs the wall, not a floor). A failed or missing\n")
      sb.append("memory-provider row is the wall being hit; RocksDB keeps\n")
      sb.append("state in native memory + disk and must survive the same\n")
      sb.append("heap bound.\n\n")
      sb.append("| heap | thr | variant | out rows | s | status |\n")
      sb.append("|---|---|---|---|---|---|\n")
      val xrows = xoverFiles.flatMap(f =>
        scala.io.Source.fromFile(f).getLines().map(_.split("\t", -1))
          .filter(_.length >= 7).toSeq)
      xrows.foreach { c =>
        sb.append(s"| ${c(1)} MB | ${c(2)} | ${c(3)} | ${c(4)} " +
          s"| ${c(5)} | ${c(6)} |\n")
      }
      // the crossover, when the runs demonstrate it: a heap where the
      // memory provider failed while rocksdb completed
      val crossed = xrows.groupBy(_(1)).toSeq.sortBy(_._1.toLong).find {
        case (_, rs) =>
          rs.exists(c => c(3).contains("memory") && c(6) != "ok") &&
            rs.exists(c => c(3).contains("rocksdb") && c(6) == "ok")
      }
      crossed.foreach { case (heap, rs) =>
        val rocksSec = rs.find(c => c(3).contains("rocksdb")).map(_(5))
          .getOrElse("?")
        sb.append(f"\nMeasured reading: at a $heap MB heap the memory\n")
        sb.append(f"provider hits the wall (the failed row above) while\n")
        sb.append(f"RocksDB/32-parts completes the identical scan in\n")
        sb.append(f"$rocksSec s under the SAME bound — the knob premium the\n")
        sb.append("matrix prices is the cost of surviving past this point,\n")
        sb.append("and the crossover heap bounds where TOTAL state outgrows\n")
        sb.append("the executor's share at this state size.\n")
      }
    }
    sb.append(
      """
        |Reading the ratios against the documented scale shapes:
        |
        |- **Linear families** (one corpus/edge-grain pass per unit of
        |  work): PageRank/coreness/HITS sweeps, the star rollup, the
        |  ANALYZE profile, and the streaming join all predict ~10x
        |  work at 10x data — but at these absolute sizes (0.5-3s at
        |  sf0.1) a large share of each duration is fixed per-job cost
        |  (planning, task launch, exchange setup), so measured ratios
        |  LAND BELOW 10x; the data-proportional component is the part
        |  that grows.
        |- **LSH + CC (d06/d07)**: banded buckets are per-replica
        |  (salted vocabularies), so bucket sizes match sf0.1 and pair
        |  generation scales ~10x; CC rounds stay at the sf0.1 depth
        |  (components never span replicas — and log(50k) ≈ log(5k)
        |  within a round anyway), so the ratio tracks volume, not
        |  depth.
        |- **t32 unigram EM** runs on the token HISTOGRAM: the salted
        |  corpus grows the vocabulary 10x, so EM iterations scale with
        |  vocab — the by-design behavior for vocabulary growth; a 10x
        |  corpus with FIXED vocabulary would hold EM cost flat after
        |  the histogram scan.
        |- **q84 fuzzy match now measures the bounded INGEST shape**
        |  (re-scoped round 16 per the round-15 verdict — the m08
        |  precedent): a fixed 40-name dirty batch, broadcast with its
        |  ±2 exploded length keys, matched against the growing master
        |  table — one master scan, candidates = |master| x (batch rows
        |  in band), LINEAR in the corpus with a constant batch factor.
        |  The ratio should sit near the linear families' and the
        |  output grows only with the batch's true digit-neighbor
        |  density.
        |- **x_q84_lengthband_selfjoin is the retired gate kept as the
        |  measured anti-pattern** (probe-only): whole-corpus
        |  length-band SELF-join — block sizes grow linearly with the
        |  table (supplier names are one length class), so in-block
        |  candidate work grows ~100x at 10x rows and the wall clock
        |  tracks it (85.7x measured when this was the gate). The
        |  documented limit of weak blocking keys: at real scale the
        |  blocking must strengthen (PassJoin segments — q128; d14's
        |  prefix filter) or the probe side must bound (the q84 gate)
        |  BEFORE the table grows, not after.
        |- **q128 is the strong-blocking counter-design to the
        |  x_q84 anti-pattern**:
        |  PassJoin segment blocking (position-anchored verbatim
        |  windows) keeps candidate volume tracking true near-pair
        |  density instead of block size. Note the honest corpus shape:
        |  cross-replica document leads differ only in the single-char
        |  salt digits of their first tokens (≤ 2 substitutions), so
        |  sf1's TRUE pair count grows ~100x — and the wall clock still
        |  grows an order of magnitude slower than the length-band
        |  self-join's on the same data. (A rare-q-gram prefix-filter
        |  variant was measured
        |  first and REJECTED: on this low-entropy token-soup corpus
        |  individual grams are common everywhere and its sf1 run cost
        |  ~19x PassJoin's — selectivity needs position anchoring, not
        |  rarity alone.)
        |- **d17 measures the probe-side linearity claim**: the gate's
        |  indexed corpus is FIXED across SFs (doc_id < 400 selects
        |  replica 0 only, by the key-offset construction) while its
        |  probe batch grows ~11x at sf1 — and the cost tracks the
        |  batch, slightly sublinearly. Corpus-side independence is the
        |  other half of the claim and is pinned structurally: the
        |  probe plan reads only the batch's touched bucket partitions
        |  (the ScaleSpec partition-pruning pin), so a 10x corpus adds
        |  bucket rows only where the batch actually collides.
        |- **st07's flat ratio is a pushdown story, not a state story**:
        |  its predicate (`user_id < 500`) selects only replica 0 of
        |  the key-offset sf1 events, so the streaming join's STATE is
        |  identical at both SFs and the sf1 run measures scanning 10x
        |  file bytes through the pushed filter — flat is the correct
        |  outcome for a filter that reaches the scan.
        |- **x_st07_state_10x IS the state story** (probe-only, the
        |  round-15 directive): the same outer interval join with the
        |  REPLICA-SPANNING predicate `user_id % 10_000_000 < 500` —
        |  the identical 500-user slice of every replica — so sf1
        |  carries genuinely 10x join state (10x keys, same per-key
        |  window density) and emits 10x rows (the row counts in the
        |  table are the direct evidence). The modulo predicate
        |  deliberately does NOT push to parquet — every replica's
        |  bytes reach the join. Measured reading: at these absolute
        |  sizes the wall stays microbatch-fixed-cost-bound (the ratio
        |  lands near the gate's), i.e. the state store absorbs a
        |  10x-keys/10x-output step without becoming the bottleneck —
        |  the volume response shows in rows, not yet in seconds.
        |- **m08 and m09 both measure the SERVING shape now** (the
        |  round-14 directive: m08's whole-corpus re-hash — 109.8s at
        |  sf1, barely under pairwise — is gone from the gate): m09 is
        |  the pure batch-vs-corpus probe; m08 is the full ingest
        |  report (within-batch banding + the same probe) against the
        |  SHARED persisted layout, pre-built untimed and ident-keyed.
        |  Both rows' timed cost is hashing the FIXED 400-payload
        |  ingest batch + reading only its touched bucket partitions —
        |  near-flat as the corpus grows 10x. The retired pairwise
        |  sweep stays available as binarySimhashPairs (the one-off
        |  backfill tool, spec-covered in PipelineOpsSpec) and its
        |  scale story stays documented: linear in total payload bytes
        |  plus superlinear true near-dup mass (the token salt leaves
        |  most intra-word 4-byte grams intact, so replicas stay
        |  within hamming ≤ 3 — banding absorbs it, verify stays
        |  per-candidate). Two earlier mis-measurements are part of
        |  the record: the ORIGINAL m09 split (growing batch vs fixed
        |  corpus) measured 109.5s at sf1, so the gates serve the
        |  fixed-batch direction (d17 keeps batch-growth covered); and
        |  before the untimed pre-build rule, the sf1 row reported the
        |  one-time 10x-corpus BUILD (~107s) as steady state.
        |- **q146 (double sweep) grows mildly (its graph spans
        |  replicas)**: both SFs sit under the r15 small-graph bound
        |  (24k → 240k edges ≤ 1M), so both ride the driver-frontier
        |  path — the ratio measures the per-hop adjacency jobs
        |  touching 10x cached edge rows, and the convergence flags
        |  stay true, so the bound is still certified, just cheap.
        |  Above the bound the distributed frontier loop takes over
        |  (spec-pinned equal) and the cost model shifts to
        |  O(edges touched) per hop.
        |- **q157 (iFUB) is pushdown-flat BY CONSTRUCTION**: its gate
        |  graph filters `o_custkey < 500`, which the key-offset sf1
        |  keeps inside replica 0 — identical graph at both SFs, flat
        |  wall clock, and the all-pairs-replayable DuckDB oracle stays
        |  feasible; its root sweep and fringe expansions ride the same
        |  driver-frontier path as q146 at this size. The
        |  scale-sensitive distributed machinery is what q103/q151/t48
        |  measure under growth.
        |- **q151/t48 mirror q103**: weighted sweeps and the word-graph
        |  PageRank both track the pageRank family's ~3-5x (fixed
        |  per-sweep costs amortizing over 10x edges).
        |- **t52 serving stays near-flat**: the bigram-LM layout is
        |  built from a FIXED training slice; scoring reads only the
        |  probe batch's touched bucket partitions — the build-once
        |  contract measured.
        |- **s12 (PQ ADC) tracks volume**: train on the fixed head,
        |  encode + ADC are map-only over 10x vectors — ~4x measured
        |  (fixed costs amortizing), no exchange anywhere (ScaleSpec
        |  pins zero).
        |- **s17 (IVFADC inline) — the round-16 performance story, in
        |  full**: the first measured sf1 run came in at 27-82s
        |  (44x), and chasing it found TWO structural defects in the
        |  IVF/PQ family, both fixed this round. (1) `max(struct(cos,
        |  -id)) + first(emb)` aggregates have IMMUTABLE buffer types,
        |  so Spark planned a SortAggregate — a full sort of the
        |  n·|cells| scored cross-join rows with the embedding payload
        |  carried through (19.7s measured for that stage alone);
        |  assignment and pqTrain's Lloyd argmin now ride the
        |  bounded-heap TypedImperativeAggregate (TopKAgg k=1 —
        |  ObjectHashAggregate, identical argmax/argmin + tiebreak
        |  semantics, every gate hash-identical) with the payload
        |  carried through the same aggregate via first() (round-17:
        |  the id-join re-attach was measured against the carry and
        |  retired — see PERF_PROBE "ivfAssign carry vs id-join"). (2) A MB-scale corpus file
        |  arrives as 1-2 parquet splits, and the |cells|-way fanout
        |  multiplied n·|cells| cosine evaluations onto one thread —
        |  ivfAssign/pqTrain now repartition up to the session
        |  parallelism ONLY when the scan is narrower than the core
        |  count (no-op at 100 TB partition counts). Post-fix: s17
        |  ~4.4s and s03 1.6s at sf1 (from 27s/24s).
        |- **s17's gate now RUNS the production cell-count rule**
        |  (round-17 re-scope, verdict #3): centEvery = max(25, n/240)
        |  pins the cell count at ~240 (the FAISS √n-to-constant
        |  guidance) so inline assignment stays ONE linear broadcast
        |  pass at every SF, and the DuckDB oracle computes the same
        |  greatest(25, count/240) expression — gate and replay stay
        |  locked. At sf0.1 and below the rule floors at centEvery=25,
        |  so bench numbers are unchanged.
        |- **x_s17_modulo_cells is the RETIRED fixture kept as the
        |  measured anti-pattern** (probe-only, the x_q84 precedent):
        |  centEvery fixed at 25 ⇒ cells = corpus/25 grow with the
        |  corpus, making inline assignment O(n·|cells|) = O(n²/25) —
        |  cheap at probe SFs once parallel, quadratic in principle.
        |  The sibling production answer is s18: assignment paid once
        |  in the persisted layout, serving reads only probed code
        |  partitions.
        |- **s18 (persisted IVFADC) serves from the layout**: codes
        |  partitioned by cell + centroids + codebook pre-build
        |  untimed per SF; the timed probe ranks the centroid table
        |  and scans only the probed cells' CODE partitions. The code
        |  read stays ~constant with the corpus (the modulo
        |  construction pins the average CELL SIZE at ~centEvery, so
        |  2 probed cells hold ~50 codes at every SF); the part that
        |  grows 10x is the centroid table itself (cells = corpus/25)
        |  — still kB-scale here, and pinned too once the cell COUNT
        |  is pinned (the rule the s17 gate now runs). Sub-second
        |  to ~2s absolute; the build-once contract on the quantized
        |  path, with the growth term named.
        |- **s19 (IVFADC recall) is three brute-force evals plus
        |  serving, dominated by its in-gate pqTrain** (m=8, k=16 —
        |  one Lloyd step over the corpus, re-run per call by the
        |  gate's construction): the exact side is one linear map pass
        |  per eval query into a TakeOrdered, the approx side is s17's
        |  serving slice (its three identical assignment subtrees
        |  dedupe through exchange reuse). The RESULT is the contract
        |  (per-query recall >= 0.2 gated at sf0.01 by hash); the row
        |  is here so the eval's own cost stays measured — and
        |  honestly: recall at a FIXED code budget declines as the
        |  corpus adds ADC distractors (0.3-0.5 at sf0.01, 0.2-0.3 at
        |  sf0.1, fraction-pinned nProbe), which is why the floor sits
        |  at the bench-scale operating point.
        |- **q161's gate rides the bounded driver path flat BY
        |  CONSTRUCTION** (its `o_custkey < 500` graph is replica-0
        |  pinned, like q157, and its pair-state is small — the gate
        |  raises `driverFrontierBelow` explicitly); the distributed
        |  machinery's growth evidence is the next row.
        |- **x_q161_distributed_growing forces the DISTRIBUTED landmark
        |  loop** (`driverFrontierBelow = 0`, probe-only) on a
        |  replica-spanning graph (`o_custkey % 10_000_000 < 500`) with
        |  the sampled estimator (`sampleEvery = 8`): at sf1 the graph
        |  has 10x nodes and 10x landmarks, so (landmark, node) pair
        |  state grows ~100x. Measured reading: the ratio stays
        |  near-flat — at these graph sizes the distributed loop is
        |  per-hop FIXED-cost bound (checkpoint + broadcast builds +
        |  one distinct exchange per hop, ~0.3s/hop; the very costs the
        |  driver path exists to skip), and a 100x pair-state step from
        |  a few hundred thousand rows is invisible next to them. The
        |  row's value is the measured per-hop price of the loop that
        |  RUNS at 100 TB; production additionally keeps the landmark
        |  count FIXED as the graph grows (raise sampleEvery), keeping
        |  state linear in nodes.
        |""".stripMargin)

    // replace any previous scale-probe section, keep the rest of the file
    val marker = "\n## Scale probe: sf0.1 → sf1"
    val existing =
      try java.nio.file.Files.readString(java.nio.file.Paths.get(probeFile))
      catch { case _: java.io.IOException => "" }
    val base = existing.indexOf(marker) match {
      case -1 => existing
      case i => existing.substring(0, i)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(probeFile), base + sb.toString)
    println(s"wrote $probeFile")
    spark.stop()
  }
}
