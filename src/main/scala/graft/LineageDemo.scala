package graft

import graft.lineage.{LineageExtractor, LineageListener}

/** Usage example + manual smoke for the lineage analyzer:
  * `sbt "runMain graft.LineageDemo [sfDir]"` — installs the listener, runs
  * a query, prints the lineage graph, column lineage and the physical
  * (AQE-final) graph with pushed-down filters.
  */
object LineageDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.get()
    val listener = LineageListener.install(spark)

    val df = SparkEntry.queries("q19_multijoin_agg")(spark, sfDir)
    df.collect()

    val deadline = System.currentTimeMillis() + 10000
    while (listener.reports.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)

    listener.reports.headOption match {
      case Some((fn, rep)) =>
        println(s"=== listener captured '$fn' ===")
        println(s"inputs:  ${rep.inputs.map(m => s"${m.name}(${m.columns.size} cols)").mkString(", ")}")
        println(s"outputs: ${if (rep.outputs.isEmpty) "<none - read query>" else rep.outputs.mkString(", ")}")
        println("--- logical lineage graph ---")
        println(rep.graph.treeString)
        println("--- column lineage ---")
        rep.columnLineage.toSeq.sortBy(_._1).foreach { case (c, refs) =>
          println(s"  $c <- ${refs.toSeq.sortBy(_.toString).mkString(", ")}")
        }
      case None => println("!!! listener captured nothing")
    }

    println("--- physical lineage graph (AQE-final, simplified) ---")
    val phys = LineageExtractor.fromPhysical(df.queryExecution.executedPlan)
      .transformUp(LineageExtractor.Rules.removePartialAggregates)
      .transformUp(LineageExtractor.Rules.removeExchanges)
    println(phys.treeString)

    // expression rewrite into source terms (reference SchemaMapping.map)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import org.apache.spark.sql.functions.lit
    val aliased = Tables(spark, sfDir, "lineitem")
      .select((org.apache.spark.sql.functions.col("l_extendedprice")
        * (lit(1) - org.apache.spark.sql.functions.col("l_discount"))).as("net"))
      .filter(org.apache.spark.sql.functions.col("net") > 1000)
    val aPlan = aliased.queryExecution.analyzed
    val cond = aPlan.collectFirst { case f: LFilter => f.condition }.get
    println("--- filter condition rewritten to source terms ---")
    println(s"  original:  ${cond.sql}")
    println(s"  rewritten: ${LineageExtractor.rewriteToSourceSql(cond, aPlan)}")

    // partition-level lineage over a partitioned copy of orders
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo").toString
    Tables(spark, sfDir, "orders").write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(s"$tmp/orders_bystatus")
    val pq = spark.read.parquet(s"$tmp/orders_bystatus")
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "F")
      .agg(org.apache.spark.sql.functions.count(lit(1)))
    pq.collect()
    println("--- partition-level input lineage (pruned) ---")
    println(s"  ${LineageExtractor.partitionLineage(pq.queryExecution.executedPlan)}")

    // OpenLineage interchange: the same report as a RunEvent any
    // OpenLineage consumer ingests
    listener.reports.headOption.foreach { case (_, rep) =>
      println("--- OpenLineage RunEvent ---")
      println(rep.openLineageJson("graft-demo", "q19_multijoin_agg",
        runId = java.util.UUID.randomUUID().toString,
        eventTime = java.time.Instant.now().toString))
    }

    // shared-scan DAG demo: self-join renders the second visit as "..."
    import org.apache.spark.sql.functions.col
    val n1 = Tables(spark, sfDir, "nation").select(col("n_nationkey"), col("n_name"))
    val n2 = Tables(spark, sfDir, "nation").select(col("n_nationkey"), col("n_name"))
    val selfJoin = n1.join(n2.withColumnRenamed("n_name", "n2"), Seq("n_nationkey"))
    println("--- shared-scan DAG (self-join; revisit rendered as ...) ---")
    println(LineageExtractor.fromLogical(selfJoin.queryExecution.optimizedPlan).treeString)

    // session metadata registry: run a second query over overlapping
    // tables, then snapshot what the session has touched (reference
    // Model semantics — one entry per table, freshest metadata). Wait on
    // the REPORT count, not registry size — earlier demo queries already
    // populated the registry, so a size threshold would be vacuous
    val reportsBefore = listener.reports.size
    SparkEntry.queries("q03_join_inner_agg")(spark, sfDir).collect()
    val regDeadline = System.currentTimeMillis() + 10000
    while (listener.reports.size <= reportsBefore &&
        System.currentTimeMillis() < regDeadline)
      Thread.sleep(50)
    println("--- session metadata registry (accumulated across queries) ---")
    println(s"  tables: ${listener.registry.snapshot.map(_.name).sorted.mkString(", ")}")
    println(s"  json:   ${listener.registry.toJson.take(200)}...")

    // streaming OpenLineage: every microbatch renders a RunEvent
    // parented under the pipeline-level run
    val sl = graft.streaming.StreamLineageListener.install(spark)
    val pipeline = graft.streaming.StreamOps.hourlyCounts(
      graft.streaming.StreamOps.readEvents(spark, sfDir))
    sl.trackPlan("demo_stream", pipeline)
    graft.streaming.StreamOps.runToMemory(spark, pipeline, "demo_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val slDeadline = System.currentTimeMillis() + 10000
    while (sl.openLineageEvents.isEmpty && System.currentTimeMillis() < slDeadline)
      Thread.sleep(50)
    println("--- streaming OpenLineage RunEvent (per microbatch, parented) ---")
    sl.openLineageEvents.headOption.foreach(e => println(e.take(400) + "..."))

    spark.stop()
  }
}
