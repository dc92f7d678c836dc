package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of the small linear models a data pipeline
  * actually trains IN the pipeline: the fastText/CCNet-style binary
  * quality & domain classifiers that gate what enters a training corpus.
  * Full-batch logistic regression by gradient descent — each epoch is
  * ONE map-combined aggregate over the corpus (the gradient is a sum of
  * per-row terms), weights live on the driver (d+1 doubles — bounded
  * metadata, the BPE-argmax contract).
  *
  * ENGINE-EXACT TRAINING (the s10/t32 discipline): weights quantize to
  * `round(·, 6)` after every epoch, so each epoch's z = w·x is computed
  * from identical operands in any engine; the lone libm step (exp in the
  * sigmoid) can drift by an ulp per row, but the gradient SUM's total
  * drift (~1e-13 over 1e5 rows) is orders of magnitude below the 1e-6
  * weight grid, so the quantized weight trajectory is bit-identical
  * everywhere. Classification needs NO libm at all: σ(z) > 0.5 ⟺ z > 0,
  * and z is exact — predictions are engine-exact even at the boundary.
  *
  * Feature discipline: pass features that are exact binary doubles of
  * corpus values (integer counts, integer/constant divisions) so z is
  * reproducible; an upstream standardization
  * ([[Similarity.standardizeDims]]) composes when scales differ wildly.
  */
object Learn {

  /** One full-batch GD epoch's weight update, computed from the
    * (Σ(y−p), Σ(y−p)·x_j, n) aggregate row. HALF_UP quantization — the
    * same tie rule as Spark's and DuckDB's round(). */
  private def step(w: Array[Double], grads: Array[Double], n: Long,
      lr: Double): Array[Double] =
    Array.tabulate(w.length)(j =>
      BigDecimal(w(j) + lr * grads(j) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Train binary logistic regression (label in {0,1}) with `epochs`
    * full-batch GD steps at rate `lr` from the zero vector; an implicit
    * intercept feature 1 is prepended. Returns the quantized weights
    * (intercept first) — feed [[score]].
    */
  def logisticTrain(df: DataFrame, label: Column, features: Seq[Column],
      epochs: Int, lr: Double): Array[Double] = {
    require(epochs >= 1 && features.nonEmpty, "need epochs >= 1, features")
    val xs = lit(1.0) +: features.map(_.cast("double"))
    val y = label.cast("double")
    var w = Array.fill(xs.length)(0.0)
    for (_ <- 1 to epochs) {
      val z = xs.zip(w).map { case (x, wj) => x * wj }.reduce(_ + _)
      val resid = y - lit(1.0) / (lit(1.0) + exp(-z))
      val aggs = count(lit(1)).as("n") +:
        xs.zipWithIndex.map { case (x, j) => sum(resid * x).as(s"g$j") }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      // n == 0 would NPE on the null gradient sums and divide by zero —
      // fail with the contract error, not an opaque NPE
      require(row.getLong(0) > 0L,
        "logisticTrain: input DataFrame has no rows — nothing to fit")
      w = step(w, Array.tabulate(xs.length)(j => row.getDouble(j + 1)),
        row.getLong(0), lr)
    }
    w
  }

  /** Linear score z = w·(1, features...) and the exact boundary-free
    * prediction σ(z) > 0.5 ⟺ z > 0. */
  def score(weights: Array[Double], features: Seq[Column]): (Column, Column) = {
    require(weights.length == features.length + 1,
      s"got ${weights.length} weights for ${features.length} features + intercept")
    val z = (lit(1.0) +: features.map(_.cast("double"))).zip(weights)
      .map { case (x, wj) => x * lit(wj) }.reduce(_ + _)
    (z, z > 0.0)
  }
}
