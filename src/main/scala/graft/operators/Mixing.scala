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
}
