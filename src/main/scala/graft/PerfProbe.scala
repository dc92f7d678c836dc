package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the dedup hot path (not part of the gate).
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PerfProbe"`.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime
      val r = f
      println(f"[probe] $n%-28s ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    import graft.functions.HashExprs
    import graft.operators.Dedup
    val docs = Tables(spark, dir, "documents")
    time("docs count")(docs.count())
    val sh = docs.select(col("doc_id").as("id"),
      HashExprs.shingle_hashes(col("text"), 3).as("shh"))
      .filter(size(col("shh")) > 0)
    time("shingle arrays")(sh.count())
    time("signatures k=128")(
      sh.withColumn("sig", HashExprs.minhash_sig(col("shh"), 128)).count())
    time("lsh b=16 r=8")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 16, 0.8).count())
    time("lsh b=32 r=4")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 32, 0.8).count())
    time("lsh b=32 r=4 (warm)")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 32, 0.8).count())
    time("lsh b=16 r=8 (warm)")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 128, 16, 0.8).count())

    // connected-components contraction probe, two adversarial shapes:
    //  - chain-heavy (worst case for DIAMETER): edge count stays ~n, the
    //    win is O(log n) rounds instead of O(n) propagation rounds;
    //  - clique-heavy (the near-dup shape LSH actually emits, worst case
    //    for VOLUME): k²/2 pair edges collapse to k-1 star edges in the
    //    first round, so per-round shuffle volume plummets — the point of
    //    star contraction over label propagation, which re-joins the FULL
    //    edge set every round.
    import spark.implicits._
    val chains = (0 until 64).flatMap { c =>
      val base = c * 10000L
      (0L until 999L).map(i => (base + i + 1, base + i)) // 64 chains × 1000
    }
    val cliques = (0 until 32).flatMap { c =>
      val base = 10000000L + c * 1000L
      for (i <- 0L until 40L; j <- 0L until i) yield (base + i, base + j)
    }
    val (_, chainTrace) = time("cc chains 64×1000")(
      Dedup.connectedComponentsStats(
        chains.toDF("id_a", "id_b").repartition(32), maxIter = 25))
    println(s"[probe] cc chain rounds=${chainTrace.size} " +
      s"edges/round=${chainTrace.mkString(", ")}")
    val (labels, cliqueTrace) = time("cc cliques 32×40")(
      Dedup.connectedComponentsStats(
        cliques.toDF("id_a", "id_b").repartition(32), maxIter = 25))
    println(s"[probe] cc clique rounds=${cliqueTrace.size} " +
      s"edges/round=${cliqueTrace.mkString(", ")} (input=${cliques.size})")
    println(s"[probe] cc components=${labels.select(col("label")).distinct().count()}" +
      s" nodes=${labels.count()}")
    spark.stop()
  }
}
