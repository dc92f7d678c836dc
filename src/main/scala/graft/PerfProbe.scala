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
    spark.stop()
  }
}
