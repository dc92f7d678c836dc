package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - `bruteForceTopK` is the exact baseline: broadcast the (small) query
  *    set against the corpus — one map-side pass over the corpus, a
  *    per-query top-k window; no corpus shuffle. Exact, O(|Q|·n·d).
  *  - `srpTopK` is the scale path: sign-random-projection LSH buckets
  *    (deterministic hyperplanes from a fixed seed). Corpus is bucketed
  *    once (could be written bucketed-by-signature for reuse); queries
  *    probe only their own bucket — at 100 TB this turns a full scan per
  *    query into a bucket-sized scan, trading recall for cost.
  *
  * All vector math uses codegen'd higher-order functions (`zip_with` +
  * `aggregate`) in double precision — no UDFs, no driver collection.
  */
object Similarity {

  /** Cosine similarity between two array<float>/array<double> columns,
    * accumulated in double in element order (custom Catalyst expression —
    * one JVM loop per row instead of three interpreted HOF passes). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.HashExprs.cosine_sim(a, b)

  /** Per-query top-k of scored pairs via the bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]): each map partition reduces to ≤k rows
    * per query BEFORE the exchange — a window row_number() would shuffle
    * and sort every scored pair. Emits (q_id, n_id, cos, rn). */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.top_k_by(col("cos"), col("n_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), col("col.id").as("n_id"), col("col.score").as("cos"),
        (col("pos") + 1).cast("long").as("rn"))

  /** Exact top-k neighbors for each query vector. Ranking uses the rounded
    * cosine plus id tiebreak so results are deterministic across engines. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("n_id"), col(embCol).as("n_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(cosine(col("q_emb"), col("n_emb")), 5))
    topKPerQuery(scored, k)
  }

  /** Deterministic random hyperplanes: `nBits` × `dim`, components from
    * a seeded PRNG (public SRP-LSH construction). */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** SRP signature: bit i = sign(v · h_i). Expressed as a literal-array
    * dot product — constant-folded planes, codegen'd row math. */
  def srpSignature(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      val dot = aggregate(zip_with(emb, planeCol, (x, y) => x.cast("double") * y),
        lit(0.0), (s, x) => s + x)
      when(dot > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Bucketed ANN: queries probe only their own SRP bucket; candidates are
    * ranked by exact cosine. Approximate — recall depends on nBits. */
  def srpTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int, dim: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val c = corpus.select(col(idCol).as("n_id"), col(embCol).as("n_emb"),
      srpSignature(col(embCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"),
      srpSignature(col(embCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(cosine(col("q_emb"), col("n_emb")), 5))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    * around a deterministic centroid subset (every `centEvery`-th vector —
    * a seedless stand-in for k-means, keeping the oracle SQL-expressible),
    * then answer each query from its `nProbe` nearest cells only.
    *
    * Scale shape: centroids are tiny and broadcast twice (assignment +
    * probe); the corpus is scanned once for assignment (the n×|cent|
    * expansion is map-local until the one shuffle on `n_id`); the probe
    * join touches only `nProbe/|cent|` of the corpus per query. At 100 TB
    * the assignment would be written out partitioned by cell so repeated
    * query batches skip it entirely (partition pruning on `c_id`).
    *
    * All ranking uses round(cos, 5) + id tiebreaks — deterministic across
    * engines, exact-match verifiable against the same construction in SQL.
    */
  /** Deterministic centroid subset (every `centEvery`-th vector). */
  private def ivfCentroids(
      corpus: DataFrame, centEvery: Int, idCol: String, embCol: String): DataFrame =
    corpus.filter(col(idCol) % centEvery === 0)
      .select(col(idCol).as("c_id"), col(embCol).as("c_emb"))

  /** Cell assignment: argmax via max(struct(cos, -c_id)) — partial-aggs
    * map-side, so only n rows (not n×|cent|) reach the exchange. */
  private def ivfAssign(
      corpus: DataFrame, cent: DataFrame,
      idCol: String, embCol: String): DataFrame =
    corpus
      .select(col(idCol).as("n_id"), col(embCol).as("n_emb"))
      .crossJoin(broadcast(cent))
      .withColumn("ccos", round(cosine(col("n_emb"), col("c_emb")), 5))
      .groupBy(col("n_id"))
      .agg(max(struct(col("ccos"), (-col("c_id")).as("neg"))).as("m"),
        first(col("n_emb")).as("n_emb"))
      .select(col("n_id"), col("n_emb"), (-col("m.neg")).as("c_id"))

  /** Per-query probe cells: the `nProbe` nearest centroids. */
  private def ivfProbe(
      queries: DataFrame, cent: DataFrame, nProbe: Int,
      idCol: String, embCol: String): DataFrame =
    queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(cent))
      .withColumn("ccos", round(cosine(col("q_emb"), col("c_emb")), 5))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.top_k_by(col("ccos"), col("c_id"), nProbe)
        .as("tk"), first(col("q_emb")).as("q_emb"))
      .select(col("q_id"), col("q_emb"), explode(col("tk.id")).as("c_id"))

  /** Rank the probed cells' members by exact cosine per query. */
  private def ivfRank(
      assign: DataFrame, probe: DataFrame, k: Int): DataFrame =
    assign.join(broadcast(probe), Seq("c_id"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(cosine(col("q_emb"), col("n_emb")), 5))
      .transform(topKPerQuery(_, k))

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, nProbe: Int,
      centEvery: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cent = ivfCentroids(corpus, centEvery, idCol, embCol)
    ivfRank(ivfAssign(corpus, cent, idCol, embCol),
      ivfProbe(queries, cent, nProbe, idCol, embCol), k)
  }

  /** IVF with a PERSISTED layout: the cell assignment is written once,
    * partitioned by cell id, and each query batch probes the layout with
    * a broadcast join on `c_id` — so the scan touches only the probed
    * cells' partitions (dynamic partition pruning; at 100 TB this is the
    * serving path: assignment cost is paid once, every subsequent batch
    * reads `nProbe/|cells|` of the corpus). Shares every ranking stage
    * with [[ivfTopK]], so the outputs are identical by construction.
    */
  def ivfTopKFromLayout(
      corpus: DataFrame, queries: DataFrame, k: Int, nProbe: Int,
      centEvery: Int, layoutDir: String,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val cent = ivfCentroids(corpus, centEvery, idCol, embCol)
    ivfAssign(corpus, cent, idCol, embCol)
      .write.mode("overwrite").partitionBy("c_id").parquet(layoutDir)
    val layout = spark.read.parquet(layoutDir)
    ivfRank(layout, ivfProbe(queries, cent, nProbe, idCol, embCol), k)
  }
}
