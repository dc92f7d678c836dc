package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the 100 TB design rules: partition
  * pruning reaches the scan, bucketed joins avoid shuffles, filters push
  * into parquet.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    case q: QueryStageExec => finalPlan(q.plan)
    case other => other
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val self = finalPlan(p)
    val here = if (pf.isDefinedAt(self)) Seq(pf(self)) else Nil
    here ++ self.children.flatMap(c => collectAll(c)(pf))
  }

  test("partitioned write + read prunes partitions at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables(spark, sf, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus")
      .parquet(s"$tmp/orders_part")
    val df = spark.read.parquet(s"$tmp/orders_part")
      .filter(col("o_orderstatus") === "F")
      .agg(count(lit(1)))
    df.collect()
    val scans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "partition filter must prune at the scan, not post-filter")
    // only the matching partition directory is read
    assert(scans.head.relation.location.listFiles(
      scans.head.partitionFilters, Nil).forall(
      _.files.forall(_.getPath.toString.contains("o_orderstatus=F"))))
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but their managed
    // locations persist — clear them or CTAS refuses to reuse the path
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }
    }
    Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables(spark, sf, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    // disable broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      j.collect()
      val exchanges = collectAll(j.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      // the join itself must be shuffle-free (bucket co-location); the only
      // allowed exchange is the final single-partition aggregation
      val joinInputExchanges = exchanges.filterNot(
        _.outputPartitioning.numPartitions <= 8)
      assert(exchanges.size <= 1,
        s"expected at most the post-agg exchange, got ${exchanges.size}")
      assert(joinInputExchanges.size <= 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("predicate pushdown reaches every parquet scan in the corpus") {
    import spark.implicits._
    val df = Tables(spark, sf, "lineitem").filter($"l_quantity" > 45)
      .select($"l_orderkey")
    df.collect()
    val scans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    val meta = scans.head.metadata
    assert(meta("PushedFilters").contains("GreaterThan(l_quantity,45"))
    assert(meta("ReadSchema").contains("l_orderkey") &&
      !meta("ReadSchema").contains("l_comment"))
  }

  test("d02 reads the corpus through ONE cached signature stage") {
    // regression guard for the round-3 defect: the signature subtree was
    // re-planned per branch, scanning + re-shingling documents 3x. With
    // materializeOnce, every branch must read the cache — no documents
    // file scan may appear in the executed plan (the single build scan
    // lives inside the cached relation, not the query tree).
    val df = SparkEntry.queries("d02_minhash_lsh")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def docScans(p: SparkPlan): Int = collectAll(p) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }.size
    assert(docScans(plan) == 0,
      "documents scanned directly in the query tree (cache bypassed)")
    // walk the cache hierarchy (pair cache -> signature cache): each
    // cached relation builds once, and exactly ONE of them may contain
    // the raw documents scan
    val seen = scala.collection.mutable.Set.empty[SparkPlan]
    def caches(p: SparkPlan): Seq[SparkPlan] = collectAll(p) {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        m.relation.cachedPlan
    }
    def walk(p: SparkPlan): Unit = caches(p).foreach { cp =>
      if (seen.add(cp)) walk(cp)
    }
    walk(plan)
    assert(seen.nonEmpty, "no cached relation found in the d02 plan")
    val rawScanningCaches = seen.toSeq.map(docScans).count(_ > 0)
    assert(rawScanningCaches == 1,
      s"expected exactly one cache to own the documents scan, got $rawScanningCaches")
    assert(seen.toSeq.map(docScans).sum == 1,
      "the corpus must be scanned exactly once across the cache hierarchy")
  }

  test("t21 DSIR scores the corpus through ONE cached bigram stream") {
    // same single-scan discipline as d02: histograms + scoring must read
    // the persisted (doc, bucket) stream, never the documents file
    val df = SparkEntry.queries("t21_dsir_selection")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    def docScans(p: SparkPlan): Int = collectAll(p) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }.size
    assert(docScans(plan) == 0,
      "documents scanned directly in the t21 query tree (cache bypassed)")
    val caches = collectAll(plan) {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        m.relation.cachedPlan
    }.distinct
    assert(caches.nonEmpty, "no cached relation in the t21 plan")
    assert(caches.map(docScans).sum == 1,
      "the corpus must be scanned exactly once, inside the bigram-stream cache")
    spark.catalog.clearCache()
  }

  test("s04 probes the IVF layout with dynamic partition pruning") {
    val df = SparkEntry.queries("s04_ann_ivf_layout")(spark, sf)
    df.collect()
    val layoutScans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("ivf_layout")) => s
    }
    assert(layoutScans.nonEmpty, "no layout scan found")
    assert(layoutScans.exists(_.metadata.get("PartitionFilters")
        .exists(_.contains("dynamicpruning"))),
      layoutScans.map(_.metadata.getOrElse("PartitionFilters", "?")).mkString("; "))
    // the serving path never rescans the corpus: centroids come from the
    // layout's _centroids table, so the only embeddings.parquet scan left
    // is the query batch itself (vec_id < 10, pushed to the scan)
    val embScans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location")
            .exists(_.contains("embeddings.parquet")) => s
    }
    assert(embScans.size == 1,
      s"expected only the query-batch embeddings scan, got ${embScans.size}")
    assert(embScans.head.metadata.get("PushedFilters")
        .exists(_.contains("LessThan(vec_id,10)")),
      embScans.head.metadata.getOrElse("PushedFilters", "?"))
  }

  test("s09 layout-fed hard negatives prune to the probed cells, corpus-free") {
    // same serving contract as s04, for the mining path: the layout scan
    // is dynamically pruned to the probed cells and the only
    // embeddings.parquet scan is the query batch itself
    val df = SparkEntry.queries("s09_hard_negatives_layout")(spark, sf)
    df.collect()
    val layoutScans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("ivf_layout")) => s
    }
    assert(layoutScans.nonEmpty, "no layout scan found")
    assert(layoutScans.exists(_.metadata.get("PartitionFilters")
        .exists(_.contains("dynamicpruning"))),
      layoutScans.map(_.metadata.getOrElse("PartitionFilters", "?")).mkString("; "))
    val embScans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location")
            .exists(_.contains("embeddings.parquet")) => s
    }
    assert(embScans.size == 1,
      s"expected only the query-batch embeddings scan, got ${embScans.size}")
  }

  test("z-order layout prunes row groups on BOTH dimensions") {
    import spark.implicits._
    val li = Tables(spark, sf, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice")
    val total = li.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft_z_spec").toString
    operators.Layout.zorderWrite(li, "l_partkey", "l_suppkey", 32, s"$tmp/z")
    // single-dimension baseline: perfectly sorted by partkey
    li.withColumn("__k", $"l_partkey")
      .repartitionByRange(32, $"__k").sortWithinPartitions($"__k").drop("__k")
      .write.mode("overwrite").parquet(s"$tmp/p")
    def scanned(path: String, cond: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(cond)
      assert(df.collect().nonEmpty, "probe box matched no rows — bad bounds")
      collectAll(df.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value
      }.sum
    }
    // ~10% box per dimension, derived from the data's actual ranges (key
    // domains scale with SF)
    val (pMax, sMax) = li.agg(max($"l_partkey"), max($"l_suppkey"))
      .as[(Long, Long)].first()
    val suppBox = $"l_suppkey".between(sMax * 4 / 10, sMax * 5 / 10)
    val zSupp = scanned(s"$tmp/z", suppBox)
    val pSupp = scanned(s"$tmp/p", suppBox)
    // the partkey-sorted layout cannot prune a suppkey predicate (every
    // file spans the full suppkey range); the z-layout must skip most
    // row groups for the same predicate
    assert(pSupp >= (total * 0.95).toLong, s"baseline unexpectedly pruned: $pSupp")
    assert(zSupp <= (total * 0.7).toLong,
      s"z-layout read $zSupp of $total rows for a ~10% suppkey box")
    // and it still prunes the OTHER dimension too
    val zPart = scanned(s"$tmp/z", $"l_partkey".between(pMax * 4 / 10, pMax * 5 / 10))
    assert(zPart <= (total * 0.7).toLong,
      s"z-layout read $zPart of $total rows for a ~10% partkey box")
  }

  test("zValueN generalizes zValue and orders locally") {
    import spark.implicits._
    val df = Seq((5L, 9L, 3L)).toDF("a", "b", "c")
    val r = df.select(
      operators.Layout.zValue($"a", $"b", 8).as("z2"),
      operators.Layout.zValueN(Seq($"a", $"b"), 8).as("zn2"),
      operators.Layout.zValueN(Seq($"a", $"b", $"c"), 8).as("zn3")).first()
    assert(r.getLong(0) == r.getLong(1), "2-dim zValueN must equal zValue")
    // hand-computed 3-dim interleave of (101, 1001, 011):
    // bit positions j + 3i for dim j
    val expected = (0 until 8).map { i =>
      (((5L >> i) & 1L) << (3 * i)) | (((9L >> i) & 1L) << (3 * i + 1)) |
        (((3L >> i) & 1L) << (3 * i + 2))
    }.reduce(_ | _)
    assert(r.getLong(2) == expected)
  }

  test("dynamic partition overwrite leaves untouched partitions' files alone") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpo_spec").toString
    val path = s"$tmp/t"
    val base = Tables(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    base.write.mode("overwrite").partitionBy("event_type").parquet(path)
    def files(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/event_type=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val purchaseBefore = files("purchase")
    val clickBefore = files("click")
    base.filter($"event_type" === "click" && $"value" > 50)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(path)
    assert(files("purchase") == purchaseBefore,
      "purchase partition was rewritten by a click-only overwrite")
    assert(files("click") != clickBefore, "click partition was not restated")
  }

  test("d11 span stats scan the corpus exactly once (no self-join)") {
    // the naive encoding joins the segment stage against its own dup
    // aggregate — two evaluations of tokenize+md5 over the corpus. The
    // window-over-fp shape must keep it to ONE documents scan.
    val df = graft.operators.Dedup.spanDupStats(
      Tables(spark, sf, "documents"), "doc_id", "text", window = 20)
    df.collect()
    val scans = collectAll(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }
    assert(scans.size == 1, s"expected 1 documents scan, got ${scans.size}")
  }

  test("t19 chunking is map-only: zero exchanges") {
    val df = graft.operators.TextOps.chunk(
      Tables(spark, sf, "documents"), "doc_id", "text", 64, 48)
    df.collect()
    val shuffles = collectAll(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"chunking must not shuffle, found ${shuffles.size} exchanges")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q10_topk")(spark, sf)
    df.collect()
    val kinds = collectAll(df.queryExecution.executedPlan) { case p => p.nodeName }
    assert(kinds.exists(_.contains("TakeOrderedAndProject")), kinds.mkString(","))
    assert(!kinds.exists(_ == "SortExec"), "global sort found for a limit query")
  }

  test("approx column-stats profile: one scan, no Expand, SinglePartition collapse only") {
    // q97's exact-ndv profile pays RewriteDistinctAggregates' Expand (4x
    // the scanned rows) + a corpus-grain distinct shuffle — the honest
    // exact cost. The ANALYZE plan for 100 TB is approxProfile, and this
    // pin is its contract: declarative aggregates only, so the plan must
    // be one lineitem scan, ZERO Expand nodes, and no exchange other than
    // the final SinglePartition collapse of fixed-width partial rows.
    val df = operators.ColumnStats.approxProfile(
      Tables(spark, sf, "lineitem"),
      Seq("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val expands = collectAll(plan) {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.isEmpty,
      s"approx profile must not Expand, found ${expands.size}")
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
    val wide = collectAll(plan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning !=
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(wide.isEmpty,
      s"only the SinglePartition collapse is allowed, found: ${wide.mkString(";")}")
  }

  test("data-quality audit fuses all row checks into one scan") {
    // N row-level checks are conditional-sum aggregates, so the audit
    // must be the ANALYZE shape: one scan, zero Expand, no exchange
    // beyond the SinglePartition collapse of one fixed-width row.
    val li = Tables(spark, sf, "lineitem")
    val df = operators.Expectations.audit(li, Seq(
      operators.Expectations.inRange("r", "l_discount", 0.0, 0.08),
      operators.Expectations.inSet("s", "l_returnflag", Seq("A", "N")),
      operators.Expectations.notNull("n", "l_shipdate")))
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectAll(plan) {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty,
      "row-check audit must not Expand")
    assert(collectAll(plan) { case s: FileSourceScanExec => s }.size == 1)
    val wide = collectAll(plan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning !=
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(wide.isEmpty, s"row checks must collapse directly: $wide")
  }

  test("audit with uniqueness stays Expand-free at one extra key-grain exchange") {
    // A SINGLE exact distinct group plans via planAggregateWithOneDistinct:
    // partial-agg to distinct-key grain map-side, ONE hash exchange on the
    // key (the information floor for an exact uniqueness count — never
    // row-grain), then the SinglePartition finish. A second distinct group
    // would fall into RewriteDistinctAggregates' row-multiplying Expand,
    // which is exactly what audit's require() guards against.
    val li = Tables(spark, sf, "lineitem")
    val df = operators.Expectations.audit(li,
      Seq(operators.Expectations.notNull("n", "l_shipdate")),
      unique = Seq(("u", "l_orderkey")))
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectAll(plan) {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty,
      "one distinct group must not Expand")
    assert(collectAll(plan) { case s: FileSourceScanExec => s }.size == 1)
    assert(collectAll(plan) { case e: ShuffleExchangeExec => e }.size <= 2,
      "expected only the key-grain partial collapse + the final gather")
  }

  test("t23 BM25 index serving scans only the query terms' buckets, corpus-free") {
    val df = SparkEntry.queries("t23_bm25_index")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val docScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }
    assert(docScans.isEmpty, "index serving must never scan the corpus")
    val postingScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("postings")) => s
    }
    assert(postingScans.nonEmpty, "no postings scan found")
    val ps = postingScans.head
    assert(ps.partitionFilters.nonEmpty,
      "bucket pruning must reach the postings scan")
    // the files actually selected all live under the probed buckets —
    // computed with the same hash expression the build/serve paths use
    import spark.implicits._
    val probed = Seq("hash", "join", "vector").toDF("term")
      .select(pmod(xxhash64(col("term")), lit(64L)).as("b"))
      .distinct().as[Long].collect().toSet
    assert(ps.relation.location.listFiles(ps.partitionFilters, Nil).forall(
      _.files.forall(f =>
        probed.exists(b => f.getPath.toString.contains(s"bucket=$b/")))),
      s"postings scan read outside the probed buckets $probed")
    // and the top-k stays a TakeOrderedAndProject over candidate rows
    val kinds = collectAll(plan) { case p => p.nodeName }
    assert(kinds.exists(_.contains("TakeOrderedAndProject")), kinds.mkString(","))
  }

  test("BM25 scoring plans: no corpus-width shuffles, top-k bounded") {
    // the known-query scoring path must be corpus-scan → map-side score →
    // TakeOrderedAndProject. The only permitted exchange is the stats
    // aggregation's SinglePartition collapse, which carries ONE
    // fixed-width partial row per input partition — corpus-width hash or
    // range repartitions mean the posting-list shuffle leaked back in
    for (name <- Seq("t22_bm25", "p02_rag_retrieval", "t43_ql_dirichlet",
        "t45_bm25f")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val wide = collectAll(plan) {
        case e: ShuffleExchangeExec
            if e.outputPartitioning !=
              org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
      }
      assert(wide.isEmpty,
        s"$name must not shuffle corpus-width rows, found: ${wide.mkString(";")}")
      val kinds = collectAll(plan) { case p => p.nodeName }
      assert(kinds.exists(_.contains("TakeOrderedAndProject")),
        s"$name top-k: ${kinds.mkString(",")}")
      spark.catalog.clearCache() // scoring persists its unit projection
    }
  }

  test("scd2 merge never shuffles the dimension: broadcast joins only") {
    // the batch side is small by construction; every join must build on
    // it (left-outer keep/close/reopen, semi matched-keys, anti new-keys)
    // — a single ShuffleExchange means the full-outer fallback crept back
    // and the 100 TB dimension would pay a key shuffle per batch
    val cust = Tables(spark, sf, "customer")
    val dim = cust
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val batch = cust.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2))
    val df = graft.operators.Mutations.scd2Merge(dim, batch, "c_custkey", 100L)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val shuffles = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"scd2Merge must be shuffle-free, found ${shuffles.size}")
    val bhj = collectAll(plan) {
      case p if p.nodeName.contains("BroadcastHashJoin") => p.nodeName
    }
    assert(bhj.size >= 3, s"expected 3 broadcast joins, got: $bhj")
  }

  test("mergeInto never shuffles the target: broadcast joins only") {
    // same discipline as scd2Merge: the batch builds every join, the
    // target's wide pass and key-pruned pass both stay map-side
    val cust = Tables(spark, sf, "customer")
    val batch = cust.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_acctbal", lit(10.0))
    val df = graft.operators.Mutations.mergeInto(cust, batch, "c_custkey",
      deleteWhen = col("_b_c_name") === "DELETE",
      updateSet = Map("c_acctbal" ->
        round(col("c_acctbal") + col("_b_c_acctbal"), 2)))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val shuffles = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"mergeInto must be shuffle-free, found ${shuffles.size}")
    val bhj = collectAll(plan) {
      case p if p.nodeName.contains("BroadcastHashJoin") => p.nodeName
    }
    assert(bhj.size >= 3, s"expected 3 broadcast joins, got: $bhj")
  }

  test("partition-scoped merge rewrites only the partitions the batch touches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mrg_spec").toString
    val path = s"$tmp/t"
    val base = Tables(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    base.write.mode("overwrite").partitionBy("event_type").parquet(path)
    def files(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/event_type=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val purchaseBefore = files("purchase")
    val clickBefore = files("click")
    val batch = base.filter($"event_type" === "click" && $"event_id" % 10 === 3)
      .withColumn("value", round($"value" + 1000, 2))
    graft.operators.Mutations.mergeWrite(path, batch, "event_id", "event_type")
    assert(files("purchase") == purchaseBefore,
      "purchase partition was rewritten by a click-only merge")
    assert(files("click") != clickBefore, "click partition was not restated")
    // merged state: updated rows present, untouched clicks intact
    val back = spark.read.parquet(path)
    assert(back.count() == base.count()) // pure update, no inserts
    val updated = back.filter($"event_type" === "click" && $"event_id" % 10 === 3)
      .agg(min($"value")).collect()(0).getDouble(0)
    assert(updated >= 1000.0, s"expected updated click values >= 1000, min=$updated")
  }

  test("snapshot diff is one key shuffle per side, no nested-loop fallback") {
    val cust = Tables(spark, sf, "customer")
    val neu = cust.withColumn("c_acctbal",
      when(col("c_custkey") % 10 === 3, round(col("c_acctbal") + 100, 2))
        .otherwise(col("c_acctbal")))
    val df = graft.operators.Mutations.snapshotDiff(cust, neu, Seq("c_custkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val kinds = collectAll(plan) { case p => p.nodeName }
    assert(!kinds.exists(_.contains("BroadcastNestedLoop")),
      s"diff fell back to nested-loop: ${kinds.mkString(",")}")
    val shuffles = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2,
      s"diff must shuffle each snapshot once on the key, got ${shuffles.size}")
  }

  test("funnel fold pushes the step filter to the scan, folds in one pass") {
    import spark.implicits._
    val ev = Tables(spark, sf, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_type")
    val df = graft.operators.Sequences.funnelDepth(
      ev, "user_id", "us", "event_type",
      steps = Seq("click", "view", "purchase"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the step set is the per-key state bound: it must reach the parquet
    // scan as an In predicate (dictionary/row-group skip at 100 TB), not
    // ride the derived step-index projection as a post-scan filter
    val evScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("events")) => s
    }
    assert(evScans.exists(_.metadata.getOrElse("PushedFilters", "")
        .contains("In(event_type")),
      evScans.map(_.metadata.getOrElse("PushedFilters", "?")).mkString(" | "))
    // the zero-event-key projection must be column-pruned to the key
    assert(evScans.exists { s =>
      val rs = s.metadata.getOrElse("ReadSchema", "")
      rs.contains("user_id") && !rs.contains("event_type")
    }, "key projection scan is not column-pruned")
    // no per-step self-joins: one fold agg pair + one distinct-key agg
    // pair = at most 3 exchanges (fold, keys, final sort)
    val shuffles = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 3,
      s"funnel must be one fold shuffle + key distinct + sort, got ${shuffles.size}")
  }

  test("compaction restates only fragmented partitions, to their optimal count") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    val path = s"$tmp/events_part"
    val base = Tables(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
    base.repartition(1)
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    // fragment ONLY the click partition with an 8-file append batch
    base.filter($"event_type" === "click").repartition(8)
      .write.mode("append").partitionBy("event_type").parquet(path)
    def listing(part: String): Set[(String, Long)] = {
      val d = new java.io.File(s"$path/event_type=$part")
      d.listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val purchaseBefore = listing("purchase")
    val nBefore = spark.read.parquet(path).count()
    val stats = graft.operators.Layout.compact(
      spark, path, "event_type", targetBytes = 512L * 1024 * 1024)
    val byPart = stats.map(s => s.partition -> s).toMap
    // click (9 files, optimal 1) compacted; single-file partitions SKIPPED
    assert(byPart("click").compacted && byPart("click").filesAfter == 1,
      byPart("click").toString)
    assert(byPart.values.filterNot(_.partition == "click").forall(!_.compacted))
    assert(listing("purchase") == purchaseBefore,
      "an already-compact partition was rewritten")
    assert(listing("click").size == 1)
    // content preserved exactly
    assert(spark.read.parquet(path).count() == nBefore)
  }

  test("skipping manifest: range query opens only overlapping files") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_skip").toString
    val li = Tables(spark, sf, "lineitem")
      .select($"l_shipdate", $"l_returnflag", $"l_quantity")
    graft.operators.Layout.writeWithManifest(li, "l_shipdate", files = 8, tmp)
    val man = graft.operators.Layout.manifest(spark, tmp).collect()
    assert(man.length == 8, s"expected 8 manifest rows, got ${man.length}")
    val (lo, hi) = (lit("1996-01-01").cast("timestamp"),
      lit("1996-12-31").cast("timestamp"))
    val keep = graft.operators.Layout.prunedFiles(spark, tmp, lo, hi)
    // ~1 year of a ~7-year span over 8 range-clustered files: the
    // manifest must exclude most of them
    assert(keep.nonEmpty && keep.size <= 3,
      s"pruning too weak: ${keep.size} of ${man.length} files kept")
    val pruned = graft.operators.Layout.prunedRead(spark, tmp, "l_shipdate", lo, hi)
    // the scan's input files are exactly the manifest's survivors
    pruned.collect()
    val scanned = collectAll(pruned.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s.inputRDDs().length // force planning
    }
    val scanFiles = collectAll(pruned.queryExecution.executedPlan) {
      case s: FileSourceScanExec =>
        s.relation.location.listFiles(Nil, Nil).flatMap(_.files)
          .map(_.getPath.toString).toSet
    }.head
    assert(scanned.nonEmpty)
    assert(scanFiles == keep.toSet,
      s"scan listed ${scanFiles.size} files, manifest kept ${keep.size}")
    // and the answer matches the unskipped full-scan filter exactly
    val expect = li.filter($"l_shipdate".between(lo, hi))
      .orderBy($"l_shipdate", $"l_returnflag", $"l_quantity").collect().toSeq
    val got = pruned
      .orderBy($"l_shipdate", $"l_returnflag", $"l_quantity").collect().toSeq
    assert(got == expect)
    // a range beyond the data opens ZERO files
    val none = graft.operators.Layout.prunedFiles(spark, tmp,
      lit("2050-01-01").cast("timestamp"), lit("2051-01-01").cast("timestamp"))
    assert(none.isEmpty)
  }

  test("triangle counting plans as equi-joins only — no cross products") {
    import spark.implicits._
    val edges = Tables(spark, sf, "lineitem").limit(2000)
      .select($"l_orderkey".as("src"), $"l_partkey".as("dst"))
    val out = graft.operators.GraphOps.triangles(edges, "src", "dst")
    out.collect()
    val bad = collectAll(out.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j.nodeName
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j.nodeName
    }
    assert(bad.isEmpty, s"non-equi join in triangle plan: $bad")
    spark.catalog.clearCache()
  }

  test("linkPrediction plans as equi-joins only and serves top-k without " +
      "a global sort") {
    val df = SparkEntry.queries("q141_link_prediction")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the wedge enumeration is the z-keyed self-equi-join; anything
    // nested-loop means the candidate generation fell through and the
    // 100 TB graph would enumerate n² pairs
    val bad = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j.nodeName
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j.nodeName
    }
    assert(bad.isEmpty, s"non-equi join in linkPrediction plan: $bad")
    // top-20 rides TakeOrderedAndProject, never a full pair-grain sort
    val topk = collectAll(plan) {
      case t if t.nodeName.contains("TakeOrderedAndProject") => t }
    assert(topk.nonEmpty, "expected TakeOrderedAndProject for the top-k")
    Caches.sweep(spark)
  }

  test("modularity serves from the labeled-edge checkpoint at community " +
      "grain: no pair enumeration, no row-grain exchange") {
    val df = SparkEntry.queries("q143_modularity")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val bad = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j.nodeName
    }
    assert(bad.isEmpty, s"pair enumeration leaked into modularity: $bad")
    // everything after the labeled-edge checkpoint is community grain:
    // exchanges only above aggregates or single-partition
    val leaks = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(leaks.isEmpty, s"row-grain exchange leaked: ${leaks.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("editDistanceJoin plans as equi-joins only — no cross products") {
    import spark.implicits._
    // candidate generation must be the segment-key equi-join plus the
    // short-string length-key equi-join — a CartesianProduct or
    // nested-loop join means the blocking fell through and the 100 TB
    // self-join would enumerate n² pairs
    val docs = Tables(spark, sf, "documents")
      .select($"doc_id", substring($"text", 1, 24).as("lead"))
    val out = graft.operators.Dedup.editDistanceJoin(docs, "doc_id", "lead",
      maxDist = 2)
    out.collect()
    val bad = collectAll(out.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j.nodeName
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j.nodeName
    }
    assert(bad.isEmpty, s"non-equi join in editDistanceJoin plan: $bad")
    spark.catalog.clearCache()
  }

  test("d17 probes the LSH layout reading only touched bucket partitions") {
    val df = SparkEntry.queries("d17_lsh_index")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val bucketScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("graft_lsh_idx")) => s
    }
    assert(bucketScans.nonEmpty, "no LSH layout scan in the probe plan")
    assert(bucketScans.forall(_.partitionFilters.nonEmpty),
      "buckets scan must prune to the probe batch's touched partitions")
    // the stored corpus never re-reads from documents: at most the probe
    // batch itself scans the table (possibly inside its cached relation)
    val docScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }
    assert(docScans.size <= 1,
      s"corpus re-scanned: ${docScans.size} documents scans in probe plan")
    spark.catalog.clearCache()
  }

  test("m09 probes the binary-SimHash layout reading only touched bucket " +
      "partitions; corpus payloads never re-hashed") {
    val df = SparkEntry.queries("m09_binary_simhash_index")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val bucketScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("graft_binsimhash_idx")) => s
    }
    assert(bucketScans.nonEmpty, "no signature layout scan in the probe plan")
    assert(bucketScans.forall(_.partitionFilters.nonEmpty),
      "buckets scan must prune to the probe batch's touched partitions")
    // the corpus payloads hash ONCE at build: the probe plan reads
    // documents at most once (the batch side), never the corpus slice
    val docScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }
    assert(docScans.size <= 1,
      s"corpus re-scanned: ${docScans.size} documents scans in probe plan")
    spark.catalog.clearCache()
  }

  test("m11 probes the dHash layout reading only touched bucket " +
      "partitions; corpus payloads never re-hashed") {
    val df = SparkEntry.queries("m11_binary_dhash_index")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val bucketScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("graft_bindhash_idx")) => s
    }
    assert(bucketScans.nonEmpty, "no dHash layout scan in the probe plan")
    assert(bucketScans.forall(_.partitionFilters.nonEmpty),
      "buckets scan must prune to the probe batch's touched partitions")
    val docScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }
    assert(docScans.size <= 1,
      s"corpus re-scanned: ${docScans.size} documents scans in probe plan")
    spark.catalog.clearCache()
  }

  test("t52 scores from the LM layout reading only touched bucket " +
      "partitions; corpus never re-scanned") {
    val df = SparkEntry.queries("t52_lm_index")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val layoutScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("graft_lm_idx")) => s
    }
    assert(layoutScans.nonEmpty, "no LM layout scan in the probe plan")
    // bigrams/heads scans carry the touched-bucket partition filters;
    // the unpartitioned 1-row stats read is exempt
    val partitioned = layoutScans.filterNot(
      _.metadata.get("Location").exists(_.contains("stats")))
    assert(partitioned.nonEmpty &&
      partitioned.forall(_.partitionFilters.nonEmpty),
      "layout scans must prune to the probe batch's touched buckets")
    val docScans = collectAll(plan) {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("documents")) => s
    }
    assert(docScans.size <= 1,
      s"corpus re-scanned: ${docScans.size} documents scans in probe plan")
    Caches.sweep(spark)
  }

  test("pageRank returns a materialized rank table: plan depth constant in sweeps") {
    // Round-8 regression mode: the lazy loop built one iterations-deep
    // plan (237 physical nodes for 3 sweeps) that replanned and
    // recomputed every sweep inside a single job — 58s where 2s is
    // right. With per-sweep materialization the returned table reads the
    // LAST sweep's cache, so its executed plan must not grow with the
    // sweep budget.
    import spark.implicits._
    val edges = (1L to 60L).map(i => (i, i % 12 + 1)).toDF("src", "dst")
    def planNodes(iters: Int): Int = {
      val pr = graft.operators.GraphOps.pageRank(edges, "src", "dst", iters)
      val n = collectAll(pr.queryExecution.executedPlan) { case p => p }.size
      spark.catalog.clearCache()
      n
    }
    val (shallow, deep) = (planNodes(2), planNodes(7))
    assert(shallow == deep,
      s"pageRank plan grows with iterations: $shallow nodes at 2 sweeps, " +
        s"$deep at 7 — per-sweep materialization broke")
  }

  test("labelPropagation: constant plan depth, argmax as hash agg not sort window") {
    import spark.implicits._
    val edges = (1L to 60L).map(i => (i, i % 12 + 1)).toDF("src", "dst")
    def planOf(sweeps: Int) = {
      val lab = graft.operators.GraphOps.labelPropagation(
        edges, "src", "dst", sweeps)
      val p = lab.queryExecution.executedPlan
      spark.catalog.clearCache()
      p
    }
    // same iterative-materialization contract as pageRank: the returned
    // table is self-contained, not a sweeps-deep nest
    val (shallow, deep) = (
      collectAll(planOf(2)) { case p => p }.size,
      collectAll(planOf(6)) { case p => p }.size)
    assert(shallow == deep,
      s"LPA plan grows with sweeps: $shallow nodes at 2, $deep at 6")
    // the plurality argmax must be a partial-aggregating hash agg — a
    // row_number window over (dst) would hotspot on hub nodes; assert no
    // Window operator anywhere in one sweep's plan
    val lab = graft.operators.GraphOps.labelPropagation(edges, "src", "dst", 1)
    // the checkpointed result hides the sweep plan, so re-state one
    // sweep's argmax shape directly on a vote table
    val votes = edges.groupBy($"dst", $"src".as("label"))
      .agg(count(lit(1)).as("cnt"))
    val winner = votes.groupBy($"dst")
      .agg(max(struct($"cnt", (-$"label").as("nl"))).as("w"))
      .select($"dst", (-$"w.nl").as("label"))
    winner.collect()
    val windows = collectAll(winner.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.nodeName
    }
    assert(windows.isEmpty, s"LPA argmax planned a sort window: $windows")
    assert(lab.count() == 12 + 48) // sanity: every node labeled
    spark.catalog.clearCache()
  }

  test("winnowing is map-only: zero exchanges, one corpus scan") {
    import spark.implicits._
    val out = graft.operators.TextOps.winnow(
      Tables(spark, sf, "documents"), "doc_id", "text", k = 8, w = 4)
    out.collect()
    val exchanges = collectAll(out.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e.nodeName
    }
    assert(exchanges.isEmpty,
      s"winnow must be per-row array algebra, found shuffles: $exchanges")
    val scans = collectAll(out.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s.nodeName
    }
    assert(scans.size == 1, s"expected one corpus scan, got ${scans.size}")
  }

  test("deletion-vector read: vector broadcasts, base never exchanges") {
    import spark.implicits._
    val path = graft.Scratch.dir("scalespec_dv")
    Tables(spark, sf, "orders").repartition(3)
      .write.mode("overwrite").parquet(path)
    graft.operators.Layout.deleteWhere(spark, path,
      col("o_orderpriority") === "1-URGENT")
    val live = graft.operators.Layout.readWithDeletes(spark, path)
    live.collect()
    val plan = live.queryExecution.executedPlan
    // the anti-join must be a broadcast hash join (metadata-sized
    // vector), never a shuffled join of the base
    val bhj = collectAll(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.joinType.toString
    }
    assert(bhj.exists(_.contains("LeftAnti")),
      s"expected broadcast LeftAnti, got $bhj in\n$plan")
    val exchanges = collectAll(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.nodeName
    }
    assert(exchanges.isEmpty,
      s"merge-on-read scan must not shuffle the base: $exchanges")
    Caches.sweep(spark)
  }

  test("wordpiece segments at histogram grain: one scan, one word exchange") {
    val docs = Tables(spark, sf, "documents")
    val df = graft.operators.TextOps.wordpieceSegment(docs, "text",
      Seq("a", "b", "##a", "##b", "ab"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"corpus must scan once: ${scans.size}")
    // the only exchange is the word-grain count; the vocabulary rides
    // as a map literal, never as a join side
    val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.size == 1, s"expected 1 word-grain exchange: " +
      s"${exchanges.map(_.nodeName)}")
    val joins = collectAll(plan) {
      case j if j.nodeName.contains("Join") => j.nodeName
    }
    assert(joins.isEmpty, s"vocab must not join: $joins")
    Caches.sweep(spark)
  }

  test("filter funnel: one corpus scan, exchanges bounded by the rule count") {
    val df = SparkEntry.queries("t44_filter_funnel")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"corpus must scan once: ${scans.size}")
    // stage-count exchange + the ≤(rules+1)-row window/join tail; the
    // corpus itself never shuffles, so every exchange is group-grain
    val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.size <= 4,
      s"funnel exchanges exploded: ${exchanges.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("PQ ADC serving is map-only: zero exchanges, codebook as literals") {
    val emb = Tables(spark, sf, "embeddings")
    val model = graft.operators.Similarity.pqTrain(
      emb, "vec_id", "embedding", m = 4, k = 4, iters = 1)
    val query = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val df = graft.operators.Similarity.pqTopKAdc(
      emb, "vec_id", "embedding", model, query, kNN = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"ADC must be map + TakeOrdered, found: ${exchanges.map(_.nodeName)}")
    val joins = collectAll(plan) {
      case j if j.nodeName.contains("Join") => j.nodeName
    }
    assert(joins.isEmpty, s"codebook must not join: $joins")
    val kinds = collectAll(plan) { case p => p.nodeName }
    assert(kinds.exists(_.contains("TakeOrderedAndProject")),
      s"top-k must be TakeOrdered: ${kinds.mkString(",")}")
    Caches.sweep(spark)
  }

  test("psi drift: snapshots reduce map-side, all exchanges bucket-grain") {
    val df = SparkEntry.queries("q130_psi_drift")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // one scan per snapshot side; each collapses to bucket grain via a
    // map-combined count BEFORE any join — the row-grain frames never
    // shuffle, so every exchange carries ≤bucket-count rows (partial
    // HashAggregate under each ShuffleExchange) or a 1-row totals /
    // window collapse
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 2, s"one scan per snapshot: ${scans.size}")
    val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.forall(e =>
      e.outputPartitioning ==
        org.apache.spark.sql.catalyst.plans.physical.SinglePartition ||
        collectAll(e.child) {
          case a if a.nodeName.contains("HashAggregate") => a }.nonEmpty),
      s"row-grain exchange leaked: ${exchanges.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("ridge serving is map-side: one scan, bucket-grain exchanges only") {
    val df = SparkEntry.queries("q131_ridge_regression")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the returned frame is the SERVING pass (training ran eagerly as
    // ONE map-combined moment aggregate): one corpus scan, yhat as a
    // literal-weight map expression, then a ≤bucket-count-grain agg
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"serving must scan once: ${scans.size}")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("auc reduces map-side to score grain before the rank window") {
    val df = SparkEntry.queries("q132_auc_roc")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"corpus must scan once: ${scans.size}")
    // label grain never leaves the map side: every exchange sits above
    // a partial aggregate (score-grain counts) or is the 1-partition
    // window/final collapse over score-grain rows
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("shortest-path state leaves as a self-contained checkpoint") {
    import spark.implicits._
    val g = Seq((1L, 2L, 1L), (2L, 3L, 2L)).toDF("src", "dst", "w")
    val d = graft.operators.GraphOps.shortestPaths(
      g, "src", "dst", "w", 1L, 3)
    val bad = collectAll(d.queryExecution.executedPlan) {
      case p if p.nodeName.contains("Join") ||
        p.isInstanceOf[ShuffleExchangeExec] => p.nodeName
    }
    assert(bad.isEmpty, s"result must be one checkpoint scan, found: $bad")
    Caches.sweep(spark)
  }

  test("landmark distances leave as self-contained checkpoints") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val d = graft.operators.GraphOps.landmarkDistances(
      edges, "src", "dst", Seq(1L), maxHops = 2)
    val plan = d.queryExecution.executedPlan
    val bad = collectAll(plan) {
      case p if p.nodeName.contains("Join") ||
        p.isInstanceOf[ShuffleExchangeExec] => p.nodeName
    }
    assert(bad.isEmpty,
      s"result must be a union of layer checkpoints, found: $bad")
    Caches.sweep(spark)
  }

  test("quantile calibration: one scan, exchanges above aggregates only") {
    val df = SparkEntry.queries("t46_quantile_normalize")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"corpus must scan once: ${scans.size}")
    // the corpus collapses map-side to (group, score) grain; the window
    // rides a group-keyed exchange of those grains (parallel across
    // groups — no single-partition sort anywhere)
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    val single = collectAll(plan) {
      case e: ShuffleExchangeExec if e.outputPartitioning ==
        org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(single.isEmpty,
      s"group-partitioned windows must not collapse to one partition")
    Caches.sweep(spark)
  }

  test("pq rerank: shortlist broadcasts into a semi-join, zero shuffles") {
    val df = SparkEntry.queries("s14_pq_rerank")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"both stages must be map + TakeOrdered + broadcast semi-join: " +
        s"${exchanges.map(_.nodeName)}")
    val semi = collectAll(plan) {
      case p if p.nodeName.contains("BroadcastHashJoin") => p.nodeName
    }
    assert(semi.nonEmpty, "candidate fetch must be a broadcast semi-join")
    val kinds = collectAll(plan) { case p => p.nodeName }
    assert(kinds.exists(_.contains("TakeOrderedAndProject")),
      kinds.mkString(","))
    Caches.sweep(spark)
  }

  test("theil-sen: events collapse to day grain before the pairwise join") {
    val df = SparkEntry.queries("q135_theil_sen")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"events must scan once: ${scans.size}")
    // the only exchanges are the day-grain count partials and the
    // single-partition median window over day²-bounded pair rows; the
    // event grain never shuffles and never reaches the join
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("two-proportion z serves from the group-grain checkpoint alone") {
    val df = SparkEntry.queries("q136_ab_test")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the ONE corpus pass happened inside the operator (checkpointed
    // 2-row counts); the returned plan must not re-scan or shuffle
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.isEmpty, s"result must not re-scan the corpus: $scans")
    val exchanges = collectAll(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"2-row pairing must not shuffle: ${exchanges.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("ks test reduces map-side to value grain before the CDF window") {
    val df = SparkEntry.queries("q137_ks_test")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 2, s"one scan per sample side: ${scans.size}")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("curation pipeline: corpus joins broadcast, exchanges above aggregates") {
    val df = SparkEntry.queries("p04_curation_pipeline")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the calibration and rate tables are bounded by construction and
    // must BROADCAST into the row-grain corpus — a sort-merge join here
    // means the 100 TB corpus shuffles for a dimension cut
    val smj = collectAll(plan) {
      case p if p.nodeName.contains("SortMergeJoin") => p.nodeName
    }
    assert(smj.isEmpty, s"corpus-side join must broadcast: $smj")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("ir metrics consume the run file, never the corpus") {
    val df = SparkEntry.queries("t47_ir_metrics")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // two scans build the run/qrel inputs (gate construction); the
    // metric math itself joins (query, doc)-grain rows — run-file
    // grain, orders of magnitude below corpus grain — and must never
    // produce a cartesian
    // 3 = run construction + the qrel frame's two uses (n_rel grain and
    // the hit join) — in production runs/qrels are materialized run
    // files, so these scans are run-file reads, not corpus reads
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size <= 3, s"scan fan-out grew: ${scans.size}")
    val cart = collectAll(plan) {
      case p if p.nodeName.contains("Cartesian") ||
        p.nodeName.contains("BroadcastNestedLoop") => p.nodeName
    }
    assert(cart.isEmpty, s"metric joins must be equi-joins: $cart")
    Caches.sweep(spark)
  }

  test("cusum collapses to day grain: one scan, aggregate-or-single exchanges") {
    val df = SparkEntry.queries("q138_cusum")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"events must scan once: ${scans.size}")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("mutual information serves from the cell checkpoint: no corpus " +
      "re-scan, no row-grain exchange") {
    val df = SparkEntry.queries("q140_mutual_information")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the one corpus pass happened into the operator's cell-grain
    // checkpoint; joint term, margins, and entropies derive from it
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.isEmpty, s"served plan must not re-scan the corpus: $scans")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("acf collapses to day grain: one scan, aggregate-or-single exchanges") {
    val df = SparkEntry.queries("q142_acf")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"events must scan once: ${scans.size}")
    // the rank window, lag self-join, and both aggregates run on
    // bounded day×lag rows — no exchange below an aggregate except the
    // single-partition window
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("spearman serves from the pair checkpoint: no corpus re-scan, " +
      "no row-grain exchange") {
    val df = SparkEntry.queries("q144_spearman")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the day-grain collapse happened into the operator's checkpoint;
    // rank tables and the moment aggregate derive from it alone
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.isEmpty, s"served plan must not re-scan the corpus: $scans")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("benford collapses map-side to the 9-digit grain") {
    val df = SparkEntry.queries("q145_benford")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"orders must scan once: ${scans.size}")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("chi-square reduces map-side to cell grain before the grid join") {
    val df = SparkEntry.queries("q139_chi2_independence")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the one corpus pass happened into the operator's cell-grain
    // checkpoint; the served plan derives margins/grid from it alone
    val scans = collectAll(plan) { case s: FileSourceScanExec => s }
    assert(scans.isEmpty, s"served plan must not re-scan the corpus: $scans")
    val bad = collectAll(plan) {
      case e: ShuffleExchangeExec if collectAll(e.child) {
        case a if a.nodeName.contains("HashAggregate") => a }.isEmpty &&
        e.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => e
    }
    assert(bad.isEmpty, s"row-grain exchange leaked: ${bad.map(_.nodeName)}")
    Caches.sweep(spark)
  }

  test("argmax paths hash-aggregate: no SortAggregate in IVF/d05/LPA plans") {
    // the round-16 finding, pinned: struct-/array-buffered aggregates
    // (max(struct(...)), first(<array>)) are immutable buffer types and
    // force SortAggregate — a full sort of every scored row with the
    // payload carried through (19.7s measured at sf1 for ivfAssign's
    // stage alone vs 0.7s hashed). The argmax surfaces now ride the
    // bounded-heap TypedImperativeAggregate (ObjectHashAggregate); this
    // pin fails if a refactor reintroduces a sort-forcing aggregate
    // anywhere in these plans.
    for (name <- Seq("s03_ann_ivf", "s17_ivf_adc", "d05_embedding_nn",
        "q113_label_propagation", "d17_lsh_index",
        // round 18: the new rerank/trained paths share the same argmin
        // machinery and must stay on the hash path (s22's TRAINING
        // pass hides behind localCheckpoint and is pinned separately
        // below — ADVICE r18; its gate plan here is the checkpoint
        // scan, still a legitimate no-SortAggregate surface)
        "s20_ivf_adc_rerank_recall", "s21_ivf_adc_rerank_layout",
        "s23_ivf_trained_vs_modulo_recall",
        // round 19: trained-coarse ADC layout serving + recall, and the
        // trained layout's frozen-geometry append cycle
        "s25_ivf_adc_trained_layout", "s26_ivf_adc_trained_recall",
        "s27_ivf_adc_trained_append")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val sorts = collectAll(df.queryExecution.executedPlan) {
        case p if p.nodeName.contains("SortAggregate") => p.nodeName
      }
      assert(sorts.isEmpty, s"$name planned SortAggregate: $sorts")
      Caches.sweep(spark)
    }
  }

  test("s22 training pass: the PRE-checkpoint Lloyd assignment rides " +
      "ObjectHashAggregate, no SortAggregate, one corpus scan") {
    // ADVICE r18: ivfCentroidsTrainedExact runs its Lloyd iteration
    // eagerly behind localCheckpoint(true), so the GATE's executed plan
    // is only the checkpoint scan + posexplode — pinning no-SortAgg
    // there was vacuous. This pins the assignment plan ITSELF via the
    // package-private hook (same vq projection + modulo seeds the
    // trainer starts from): the argmin must be the bounded-heap
    // ObjectHashAggregate (a declarative-only formulation would fall
    // to SortAggregate — the round-16 19.7s-vs-0.7s trap), and the
    // corpus must be scanned exactly once (the first(vq) carry, not a
    // re-attach join).
    import graft.operators.Similarity
    val emb = Tables(spark, sf, "embeddings")
    val df = Similarity.trainedExactFirstAssignment(emb, centEvery = 25)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val sorts = collectAll(plan) {
      case p if p.nodeName.contains("SortAggregate") => p.nodeName
    }
    assert(sorts.isEmpty, s"training assignment planned SortAggregate: $sorts")
    val objHash = collectAll(plan) {
      case p if p.nodeName.contains("ObjectHashAggregate") => p.nodeName
    }
    assert(objHash.nonEmpty, "argmin must ride ObjectHashAggregate")
    val scans = collectAll(plan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 2,
      s"expected corpus scan + broadcast seed scan, got ${scans.size}")
    Caches.sweep(spark)
  }

  test("ivfAssign carry: one fewer corpus scan, no n-grain re-attach join") {
    // round-17 pin (verdict #2): the argmax payload rides first(n_emb)
    // through the ObjectHashAggregate instead of a second corpus scan +
    // n-grain id join. Measured (PERF_PROBE "ivfAssign carry vs
    // id-join"): within noise at probe sizes, but the join variant's
    // extra scan and both-sides shuffle grow with the corpus — and its
    // probe-scale broadcast re-attach regime ceases to exist at
    // production n. This pin keeps the structure from regressing.
    import graft.operators.Similarity
    val emb = Tables(spark, sf, "embeddings")
    val cent = Similarity.ivfCentroids(emb, 25, "vec_id", "embedding")
    def audit(carry: Boolean): (Int, Int) = {
      val df = Similarity.ivfAssignVariant(
        emb, cent, "vec_id", "embedding", carryEmb = carry)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val scans = collectAll(plan) { case s: FileSourceScanExec => s }.size
      // the broadcast crossJoin against the centroid subset is expected;
      // the n-grain equi-join on n_id is what the carry removes
      val reattach = collectAll(plan) {
        case p if p.nodeName.contains("Join") &&
          !p.nodeName.contains("NestedLoop") => p.nodeName
      }.size
      (scans, reattach)
    }
    val (carryScans, carryJoins) = audit(carry = true)
    val (joinScans, joinJoins) = audit(carry = false)
    // both variants scan the corpus for src + the centroid subset; the
    // join variant adds a THIRD scan for the re-attach
    assert(carryScans == joinScans - 1,
      s"carry=$carryScans join=$joinScans scans")
    assert(carryJoins == 0, s"carry plan kept a re-attach join")
    assert(joinJoins >= 1, "join variant lost its join? pin is stale")
    Caches.sweep(spark)
  }

  test("scc labels leave as self-contained checkpoints: no joins, no exchanges") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val labels = graft.operators.GraphOps.scc(edges, "src", "dst")
    val plan = labels.queryExecution.executedPlan
    val bad = collectAll(plan) {
      case p if p.nodeName.contains("Join") ||
        p.isInstanceOf[ShuffleExchangeExec] => p.nodeName
    }
    assert(bad.isEmpty,
      s"scc result must be a union of checkpoint scans, found: $bad")
    Caches.sweep(spark)
  }
}
