package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture construction for training corpora: temperature-scaled
  * sampling (the public XLM-R / mC4 recipe: sample domain `d` with
  * p_d ∝ n_d^alpha, alpha < 1 upweighting low-resource domains), realized
  * as a DETERMINISTIC per-document keep decision so reruns and engines
  * agree row-for-row.
  *
  * Scale shape: the domain histogram is one tiny aggregate; per-domain
  * rates broadcast back; the keep decision is a per-row md5-derived
  * uniform draw — one corpus pass, no shuffle of the documents
  * themselves. At 100 TB the decision column feeds a filter before the
  * write, so dropped docs never move.
  */
object Mixing {

  /** Deterministic uniform draw in [0, 1) with 1e-6 granularity from the
    * document id — md5-based so any engine reproduces it bit-for-bit. */
  def uniformDraw(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")
      % 1000000L) / lit(1000000.0)

  /** Temperature-scaled domain sampling.
    *
    * Per domain d: p_d = n_d^alpha / Σ n^alpha; the per-doc keep rate is
    * `targetFrac · n_tot · p_d / n_d`, capped at 1 (a domain can't be
    * sampled above its size without replacement) and rounded to 6
    * decimals to pin cross-engine float agreement at the draw's own
    * granularity.
    *
    * @return one row per input doc: (idCol, domainCol, rate, keep)
    */
  def temperatureSample(
      docs: DataFrame, domainCol: String, idCol: String,
      alpha: Double, targetFrac: Double): DataFrame = {
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_d"))
    val tot = counts.agg(sum(col("n_d")).as("n_tot"),
      sum(pow(col("n_d"), alpha)).as("z"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("rate",
        round(least(lit(1.0),
          lit(targetFrac) * col("n_tot") * (pow(col("n_d"), alpha) / col("z"))
            / col("n_d")), 6))
      .select(col(domainCol), col("rate"))
    docs.select(col(idCol), col(domainCol))
      .join(broadcast(rates), Seq(domainCol))
      .withColumn("keep", uniformDraw(col(idCol)) < col("rate"))
      .select(col(idCol), col(domainCol), col("rate"), col("keep"))
  }

  /** Exact-k per-stratum deterministic sample: every stratum keeps its
    * `k` lowest-hash rows (ties by id) — the balanced-eval-set /
    * per-domain-probe primitive next to [[temperatureSample]]'s
    * rate-based mixing. Rate sampling cannot promise exact counts
    * (binomial spread); hash-ranking can, stays reproducible in any
    * engine (the [[uniformDraw]] md5 construction), and adding data
    * only changes a stratum's sample where a new row out-ranks an old
    * one. Strata with fewer than `k` rows keep everything.
    *
    * Scale shape: ONE stratum-grain shuffle for the rank window — the
    * per-stratum sort is the information-theoretic cost of exact-k; at
    * 100 TB prefer `k`-heap semantics per stratum (this IS what Spark's
    * window TopK executes after the partition sort).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(uniformDraw(col(idCol)).asc, col(idCol).asc)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k).drop("_rk")
  }

  /** DSIR-style importance weighting (the public method of Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every document by how target-like its hashed
    * n-gram distribution is — the importance weight
    * log p_target(x)/p_raw(x) under bag-of-hashed-bigrams unigram models
    * with add-one smoothing over `buckets` feature buckets. Selection =
    * top-k by weight (the paper adds Gumbel noise for sampled selection;
    * [[uniformDraw]] composes for that — the deterministic top-k keeps
    * the gate engine-verifiable).
    *
    * Scale shape: ONE corpus scan builds the (doc, bucket) bigram stream
    * (persisted — the raw histogram, the target histogram, and the
    * scoring pass all read it; caller releases via `clearCache`, same
    * contract as the bigram-LM model); both histograms are `buckets`-row
    * aggregates with map-side partials; the per-bucket log-ratio table is
    * broadcast back onto the stream, and the only corpus-grain shuffle is
    * the per-doc weight aggregation. The bucket hash is the portable
    * md5 construction, bit-reproducible in any engine.
    *
    * @param isTarget per-row predicate marking the target-domain sample
    * @return one row per doc with >= 1 bigram: (idCol, dsir_w), weight
    *         rounded to 4 decimals
    */
  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    // the ONE tokenizer every oracle-parity pipeline shares — an inline
    // variant here could silently diverge DSIR buckets from the gates
    val toks = TextOps.tokens(col(textCol))
    val bucket = pmod(
      conv(substring(md5(concat_ws(" ", col("bg.h"), col("bg.t"))), 1, 8),
        16, 10).cast("long"),
      lit(buckets.toLong))
    val stream = docs
      .select(col(idCol), toks.as("toks"), isTarget.as("is_t"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), col("is_t"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("h"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("t"))).as("bg"))
      .select(col(idCol), col("is_t"), bucket.as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = stream.groupBy(col("bucket")).agg(count(lit(1)).as("c_r"))
    val tgt = stream.filter(col("is_t"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c_t"))
    // smoothed log-ratio per bucket seen in the raw corpus (the scoring
    // stream IS the raw corpus, so unseen buckets cannot be probed)
    val ratio = raw.join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(
        raw.agg(sum(col("c_r")).as("n_r")).crossJoin(
          tgt.agg(sum(col("c_t")).as("n_t")))))
      .select(col("bucket"),
        (log2((col("c_t") + 1.0) / (col("n_t") + buckets.toLong))
          - log2((col("c_r") + 1.0) / (col("n_r") + buckets.toLong))).as("lw"))
    stream.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(round(sum(col("lw")), 4).as("dsir_w"))
  }
}
