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

  /** First-row cofactor determinant with a PINNED evaluation order
    * (term0 − term1 + term2 …, left to right) — the same expression an
    * oracle writes out longhand, so identical integer-valued operands
    * give bit-identical IEEE doubles in any engine. */
  private def detPinned(a: Vector[Vector[Double]]): Double =
    if (a.size == 1) a(0)(0)
    else a.indices.foldLeft(0.0) { (acc, j) =>
      val minor = a.tail.map(r => r.indices.filterNot(_ == j).map(r).toVector)
      val term = a(0)(j) * detPinned(minor)
      if (j % 2 == 0) acc + term else acc - term
    }

  /** Ridge (L2-regularized) linear regression by the closed-form normal
    * equations (Hoerl & Kennard 1970; OLS at `lambda = 0`):
    * `(XᵀX + λI')w = Xᵀy` with an implicit intercept prepended and the
    * intercept row of I' zeroed (the standard no-penalty-on-intercept
    * convention). Returns the weights, intercept first.
    *
    * ENGINE-EXACT (a stricter discipline than [[logisticTrain]]'s,
    * because the solve AMPLIFIES moment error by the system's condition
    * number, so "float drift below the weight grid" no longer holds):
    *  - features and target quantize to the 1/`grid` lattice and the
    *    moment matrix accumulates as INTEGER sums of lattice products —
    *    summation-order-free, exact in any engine;
    *  - the solve is Cramer's rule over doubles CONVERTED FROM those
    *    exact integers (every moment ≤ 2⁵³ by the overflow guard, so
    *    the conversion is exact) with [[detPinned]]'s fixed evaluation
    *    order — IEEE arithmetic on identical operands in an identical
    *    order is bit-identical across engines;
    *  - weights quantize to round-6 HALF_UP, the [[step]] grid.
    *
    * Overflow is GUARDED, not assumed: the one aggregate also returns
    * each quantized column's max |value|, and the fit throws unless
    * `maxAbs² · n` leaves 8× headroom under `Long.MaxValue` — raise
    * the data's scale down or the grid down, never wrap silently (the
    * zipfFit contract). A zero determinant (features collinear on the
    * lattice) throws rather than returning garbage.
    *
    * Scale shape: ONE map-combined corpus aggregate of
    * `(m(m+1)/2 + 2m + 2)` fixed-width values (the d×d Gram contract —
    * the moment row is bounded metadata, `m ≤ 9`); the corpus never
    * shuffles. The driver solve is O(m!) cofactor expansion — trivial
    * at the enforced `m = features + 1 ≤ 9`, and the pinned order is
    * exactly what makes it oracle-replicable.
    */
  def ridgeTrain(df: DataFrame, target: Column, features: Seq[Column],
      lambda: Double = 0.0, grid: Long = 1000L): Array[Double] = {
    require(features.nonEmpty && features.size <= 8,
      s"need 1..8 features, got ${features.size}")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    require(grid >= 1L, s"grid must be >= 1, got $grid")
    val m = features.size + 1
    // xq(0) is the intercept: exactly `grid` lattice units (= 1.0)
    val xq: Seq[Column] = lit(grid) +:
      features.map(f => round(f.cast("double") * grid, 0).cast("long"))
    val yq = round(target.cast("double") * grid, 0).cast("long")
    val cols = xq :+ yq
    val anyNull = cols.map(_.isNull.cast("long")).reduce(_ + _)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        (for (i <- 0 until m; j <- i until m)
          yield sum(xq(i) * xq(j)).as(s"s_${i}_$j")) ++
        (0 until m).map(i => sum(xq(i) * yq).as(s"t_$i")) ++
        cols.indices.map(i => max(abs(cols(i))).as(s"mx_$i")) :+
        sum(anyNull).as("nulls")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    require(n > 0L, "ridgeTrain: input DataFrame has no rows — nothing to fit")
    // a null feature/target would VANISH from its moment sums while the
    // row still counts elsewhere — silently skewed fit; refuse instead
    require(row.getLong(row.length - 1) == 0L,
      "ridgeTrain: null feature/target values — filter or impute upstream")
    val nGram = m * (m + 1) / 2
    val mx = (0 until (m + 1)).map(i => row.getLong(1 + nGram + m + i)).max
    // mx ≤ 3e9 first so mx·mx cannot itself wrap (a wrapped negative
    // would satisfy any ≤ bound and defeat the guard)
    require(mx <= 3_000_000_000L &&
      mx * mx <= Long.MaxValue / 8 / math.max(n, 1L),
      s"ridgeTrain: quantized magnitude $mx with $n rows risks Long " +
        "overflow in the moment sums — rescale the data or lower grid")
    val gram = Array.ofDim[Long](m, m)
    var k = 1
    for (i <- 0 until m; j <- i until m) {
      gram(i)(j) = row.getLong(k); gram(j)(i) = row.getLong(k); k += 1
    }
    val lamq = Math.round(lambda * grid * grid)
    for (j <- 1 until m) gram(j)(j) += lamq
    val t = (0 until m).map(i => row.getLong(1 + nGram + i))
    val a = Vector.tabulate(m, m)((i, j) => gram(i)(j).toDouble)
    val d0 = detPinned(a)
    require(d0 != 0.0, "ridgeTrain: singular normal equations — features " +
      "are collinear at the quantization grid (drop one or raise grid)")
    Array.tabulate(m) { j =>
      val aj = Vector.tabulate(m, m)((r, c) =>
        if (c == j) t(r).toDouble else gram(r)(c).toDouble)
      BigDecimal(detPinned(aj) / d0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Area under the ROC curve via the rank-sum (Mann–Whitney U)
    * identity with midrank tie handling — the standard evaluation of a
    * pipeline's quality/domain classifier:
    * `AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N)`.
    *
    * INTEGER-EXACT: per distinct score (ascending), the tied group's
    * positives each take the midrank `r + (c+1)/2` (r = rows strictly
    * below, c = group size); doubling clears the half — the aggregate
    * accumulates `Σ p·(2r + c + 1)` as an exact long, and the only
    * float op is the final one-row division, round-6 from identical
    * integer operands in any engine.
    *
    * Scale shape: one map-combined score-grain count, one window over
    * the score-grain rows for the running offset (a single-partition
    * sort of DISTINCT scores — quantize a continuous score upstream,
    * e.g. `round(s, 4)`, to keep that grain bounded; label grain never
    * leaves the map side), one ≤score-count-row aggregate. The corpus
    * shuffles once, at score grain.
    *
    * @return one row: (n_pos, n_neg, auc).
    */
  def aucRoc(df: DataFrame, label: Column, scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = df
      .select(scoreCol.as("s"), label.cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val withRank = byScore.withColumn("r",
      coalesce(sum(col("c")).over(
        Window.orderBy(col("s")).rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
    val agg = withRank.agg(
      sum(col("p")).as("n_pos"),
      (sum(col("c")) - sum(col("p"))).as("n_neg"),
      sum(col("p") * (lit(2L) * col("r") + col("c") + lit(1L)))
        .as("rank2"))
    agg.select(col("n_pos"), col("n_neg"),
      // one-sided label sets have no ROC — null, not NaN/Inf
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round((col("rank2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Multi-class classification report — the per-class
    * precision/recall/F1 table (plus accuracy and macro-F1) every
    * model evaluation prints, in-engine: the multi-class companion to
    * [[aucRoc]] (binary ranking) that closes the train→score→evaluate
    * loop around [[logisticTrain]] and the heuristic classifiers
    * (gate q155 grades the t03 language identifier against gold
    * labels).
    *
    * ENGINE-EXACT: every cell of the confusion matrix is an exact
    * long; per class, `F1 = 2tp/(2tp+fp+fn)` EXACTLY (no P·R float
    * chain), carried as round-micro integer `f1_micro` so the macro
    * average is an order-free integer sum over classes; precision/
    * recall/accuracy are single round-6 divisions. Classes that never
    * appear as a prediction (or never as a label) still report —
    * undefined precision/recall stay null, never NaN, and a null F1
    * counts as 0 toward macro-F1 (the scikit-learn convention). Null
    * labels/predictions are excluded up front.
    *
    * The `(overall)` summary row reuses the class schema, documented:
    * tp = correct rows, fp = fn = errors, precision = recall =
    * accuracy, f1 = MACRO-F1.
    *
    * Scale shape: ONE map-combined (label, pred)-grain count
    * (checkpointed — margins, diagonal, and totals all derive from
    * it); everything downstream runs at class grain.
    *
    * @return one row per class + "(overall)": (cls, tp, fp, fn,
    *         precision, recall, f1).
    */
  def classificationReport(df: DataFrame, labelCol: Column,
      predCol: Column): DataFrame = {
    val cells = df
      .select(labelCol.cast("string").as("l"), predCol.cast("string").as("p"))
      .filter(col("l").isNotNull && col("p").isNotNull)
      .groupBy(col("l"), col("p")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val classes = cells.select(col("l").as("cls"))
      .union(cells.select(col("p").as("cls"))).distinct()
    val rowN = cells.groupBy(col("l").as("cls")).agg(sum(col("n")).as("row_n"))
    val colN = cells.groupBy(col("p").as("cls")).agg(sum(col("n")).as("col_n"))
    val diag = cells.filter(col("l") === col("p"))
      .select(col("l").as("cls"), col("n").as("tp0"))
    val per = classes
      .join(rowN, Seq("cls"), "left").join(colN, Seq("cls"), "left")
      .join(diag, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp0"), lit(0L)).as("tp"),
        (coalesce(col("col_n"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
          .as("fp"),
        (coalesce(col("row_n"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
          .as("fn"))
    val f1Micro = when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
      round(lit(2e6) * col("tp").cast("double") /
        (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
        .cast("long"))
    val perOut = per.select(col("cls"), col("tp"), col("fp"), col("fn"),
      when(col("tp") + col("fp") > 0, round(col("tp").cast("double") /
        (col("tp") + col("fp")).cast("double"), 6)).as("precision"),
      when(col("tp") + col("fn") > 0, round(col("tp").cast("double") /
        (col("tp") + col("fn")).cast("double"), 6)).as("recall"),
      when(f1Micro.isNotNull,
        round(f1Micro.cast("double") / 1e6, 6)).as("f1"))
    val macroAgg = per
      .agg(count(lit(1)).as("k"),
        sum(coalesce(f1Micro, lit(0L))).as("f1_sum"))
    val totals = cells.agg(sum(col("n")).as("nn"),
      sum(when(col("l") === col("p"), col("n")).otherwise(0L)).as("ok"))
    val overall = totals.crossJoin(broadcast(macroAgg))
      .select(lit("(overall)").as("cls"), col("ok").as("tp"),
        (col("nn") - col("ok")).as("fp"), (col("nn") - col("ok")).as("fn"),
        round(col("ok").cast("double") / col("nn").cast("double"), 6)
          .as("precision"),
        round(col("ok").cast("double") / col("nn").cast("double"), 6)
          .as("recall"),
        round(col("f1_sum").cast("double") /
          (col("k").cast("double") * 1e6), 6).as("f1"))
    perOut.unionByName(overall)
  }

  /** Spearman rank correlation with midrank ties (Spearman 1904; the
    * tie-correct form is Pearson over midranks) — the monotone-
    * association meter next to [[aucRoc]] (same doubled-midrank
    * machinery; AUC asks "does the score separate two classes",
    * Spearman asks "do two series move together").
    *
    * ENGINE-EXACT: both columns' DOUBLED midranks
    * (`2r = 2·cum_before + cnt + 1` per distinct value — integers even
    * at ties; the global ×2 cancels in ρ) join back to the row pairs,
    * and all five moments are exact long sums. The numerator
    * `n·Σdxdy − Σdx·Σdy` and each denominator factor `n·Σd² − (Σd)²`
    * stay exact longs (≲4n⁴ — ANSI throws loudly past n ≈ 38k rows;
    * COLLAPSE GRAIN FIRST, the gate feeds day-grain series), and the
    * two sqrt factors are taken SEPARATELY (their long product would
    * overflow at n ≈ 165) — each an IEEE correctly-rounded sqrt of
    * identical operands, so the round-6 ρ is engine-exact. Inputs cast
    * to long (quantize continuous values upstream — the aucRoc
    * caveat). A constant column has no ranking: null, never NaN.
    *
    * Scale shape: one pass into the checkpointed (x, y) pair grain;
    * each rank table is a value-grain count + a single-partition
    * window over DISTINCT values (bounded because the caller collapsed
    * grain), broadcast back; one 5-moment aggregate. Nothing here
    * touches the pre-collapse corpus.
    *
    * @return ONE row: (n, num, den_x, den_y, rho).
    */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .localCheckpoint(true)
    def ranks(c: String): DataFrame = {
      val cnt = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val before = coalesce(sum(col("cnt")).over(
        Window.orderBy(col(c)).rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L))
      cnt.select(col(c),
        (lit(2L) * before + col("cnt") + lit(1L)).as("dr_" + c))
    }
    val joined = base
      .join(broadcast(ranks("x")), Seq("x"))
      .join(broadcast(ranks("y")), Seq("y"))
    val m = joined.agg(count(lit(1)).as("n"),
      sum(col("dr_x")).as("sx"), sum(col("dr_y")).as("sy"),
      sum(col("dr_x") * col("dr_y")).as("sxy"),
      sum(col("dr_x") * col("dr_x")).as("sxx"),
      sum(col("dr_y") * col("dr_y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    m.select(col("n"), num.as("num"), denX.as("den_x"), denY.as("den_y"),
      when(denX > 0 && denY > 0,
        round(num.cast("double") /
          (sqrt(denX.cast("double")) * sqrt(denY.cast("double"))), 6))
        .as("rho"))
  }
}
