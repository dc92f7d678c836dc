package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing — the Deequ / dbt-test /
  * Great-Expectations surface a training-data pipeline runs before it
  * trusts a delivery: null checks, accepted ranges/sets, key
  * uniqueness, referential integrity, each reported as a
  * (check, violations, total) row a gate can assert on.
  *
  * Scale design: every row-level check is a conditional-sum aggregate,
  * so N checks over a table fuse into ONE aggregate pass — one scan,
  * map-side partials, a SinglePartition exchange carrying a single
  * fixed-width row (the same no-Expand shape as
  * [[ColumnStats.approxProfile]]; ScaleSpec pins it). Uniqueness rides
  * the same pass as `count(*) - count(DISTINCT key)`: a SINGLE distinct
  * group plans as a two-phase aggregate with no Expand, which is why
  * [[audit]] accepts at most one unique column per call (more would
  * trigger RewriteDistinctAggregates' row-multiplying Expand — the q97
  * lesson; run extra keys as separate calls, or swap in
  * `approx_count_distinct` when an estimate suffices). Referential
  * integrity ([[fkOrphans]]) cannot ride a single-table scan: it is a
  * key-grain left join against the parent's distinct keys — the
  * information-theoretic floor for an exact containment check — with
  * the violation count folded into the same pass as the total, so the
  * child is still scanned once.
  */
object Expectations {

  /** A row-level expectation: `bad` marks a violating row. Null inputs
    * count as violations for range/set checks (an unexpectedly-null
    * value is not "in range") — mirror the predicate's null handling in
    * any oracle SQL. */
  final case class RowCheck(name: String, bad: Column)

  def notNull(name: String, c: String): RowCheck =
    RowCheck(name, col(c).isNull)

  def inRange(name: String, c: String, lo: Double, hi: Double): RowCheck =
    RowCheck(name, !(col(c) >= lo && col(c) <= hi) || col(c).isNull)

  def inSet(name: String, c: String, vals: Seq[String]): RowCheck =
    RowCheck(name, !col(c).isin(vals: _*) || col(c).isNull)

  /** Run all checks in one aggregate pass over `df`; one output row per
    * check: (chk, violations, total). */
  def audit(df: DataFrame, checks: Seq[RowCheck],
      unique: Seq[(String, String)] = Nil): DataFrame = {
    require(checks.nonEmpty || unique.nonEmpty, "need at least one check")
    require(unique.size <= 1,
      "one unique column per audit call (a second exact distinct group " +
        "would Expand the scan; split calls or use approx_count_distinct)")
    val aggs =
      checks.map(c => sum(when(c.bad, 1L).otherwise(0L)).as(c.name)) ++
        unique.map { case (n, c) =>
          (count(lit(1)) - countDistinct(col(c))).as(n) }
    val wide = df.agg(count(lit(1)).as("_total"), aggs: _*)
    val names = checks.map(_.name) ++ unique.map(_._1)
    val stackArgs = names.map(n => s"'$n', `$n`").mkString(", ")
    wide.selectExpr(
      s"stack(${names.size}, $stackArgs) AS (chk, violations)",
      "_total AS total")
  }

  /** Referential integrity: child rows whose `childKey` has no match in
    * `parent.parentKey`, as one (chk, violations, total) row. One child
    * scan: the orphan marker and the total ride the same post-join
    * aggregate. Parent keys are `distinct()` first so a non-key parent
    * column cannot multiply child rows (for a true PK the distinct
    * collapses map-side); broadcast-sized parents broadcast under AQE. */
  def fkOrphans(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("_hit", lit(1))
    child.select(col(childKey))
      .join(pk, Seq(childKey), "left_outer")
      .agg(sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("violations"),
        count(lit(1)).as("total"))
      .select(lit(name).as("chk"), col("violations"), col("total"))
  }

  /** Daily-volume anomaly detection — the pipeline-health staple next to
    * [[audit]]: per-day event counts scored against the corpus's own
    * volume distribution, z = (n − μ)/σ, flagged past `zThreshold`. A
    * feed that silently halves (upstream outage) or doubles (replay,
    * scraper loop) shows up as |z| spikes long before any content-level
    * check fires.
    *
    * ENGINE-EXACT z-scores: μ and σ derive from the INTEGER moments
    * (k, Σn, Σn²) — integer sums are bit-exact in any aggregation
    * order, and every float op downstream (two divides, one sqrt) sees
    * identical operands in any engine, so the round-4 scores gate with
    * zero tolerance. σ is the population form √(Σn²/k − μ²).
    *
    * Scale shape: one day-grain count aggregate (map-combined over the
    * event stream), one 3-number global aggregate, then map-only
    * scoring against the broadcast stats row — count-class cost at any
    * volume.
    *
    * @return (d, n, z, is_anomaly) per day, z null when σ = 0 (a
    *         perfectly uniform feed has no anomalies to rank).
    */
  def volumeAnomalies(events: DataFrame, tsCol: String,
      zThreshold: Double = 2.0): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.agg(count(lit(1)).as("k"), sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("s2"))
    daily.crossJoin(broadcast(stats))
      .withColumn("_mu", col("s") / col("k"))
      .withColumn("_var", col("s2") / col("k") - col("_mu") * col("_mu"))
      .withColumn("z",
        when(col("_var") > 0,
          round((col("n") - col("_mu")) / sqrt(col("_var")), 4)))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select(col("d"), col("n"), col("z"), col("is_anomaly"))
  }

  /** Population-stability-index drift between two snapshots of one
    * distribution (the standard model/data-monitoring drift score;
    * PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over shared buckets, with the
    * usual reading: <0.1 stable, 0.1–0.25 shifting, >0.25 drifted) —
    * the delivery-over-delivery check a training-data pipeline runs on
    * feature and length distributions before mixing a new crawl in.
    *
    * Buckets one side lacks are NOT epsilon-smoothed into the sum (an
    * arbitrary epsilon would dominate the score): they surface as
    * `one_sided` rows with a zero contribution, so the monitor can
    * alert on new/vanished buckets separately — both facts are
    * reported, neither is invented.
    *
    * DETERMINISM (the t32 discipline): shares are double quotients of
    * exact longs (identical operands in any engine), the log ratio
    * quantizes to round-6 BEFORE the product, and each bucket's
    * contribution quantizes to integer nano-units before the total —
    * so the PSI sum is exact integer arithmetic, order-free.
    *
    * Scale shape: one bucket-grain map-combined count per side, one
    * full-outer join of the two (≤bucket-count-row) count tables, one
    * broadcast totals row, and a window over the bucket rows for the
    * total — the snapshots themselves never shuffle at row grain.
    *
    * @param bucketOf maps a row to its bucket id (applied to BOTH
    *                 frames; must be deterministic).
    * @return one row per bucket: (bucket, n_p, n_q, one_sided,
    *         contrib_nano, psi_nano) — psi_nano repeats the integer
    *         nano-PSI total on every row.
    */
  def psiDrift(p: DataFrame, q: DataFrame, bucketOf: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def cnt(df: DataFrame, out: String): DataFrame =
      df.select(bucketOf.cast("long").as("bucket"))
        // null buckets would never match across the full-outer join —
        // each side's null row would enter the shares separately
        .where(col("bucket").isNotNull)
        .groupBy(col("bucket")).agg(count(lit(1)).as(out))
    val joined = cnt(p, "n_p").join(cnt(q, "n_q"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_p"), lit(0L)).as("n_p"),
        coalesce(col("n_q"), lit(0L)).as("n_q"))
    val totals = joined.agg(sum(col("n_p")).as("tot_p"),
      sum(col("n_q")).as("tot_q"))
    val withTot = joined.crossJoin(broadcast(totals))
    val pShare = col("n_p").cast("double") / col("tot_p").cast("double")
    val qShare = col("n_q").cast("double") / col("tot_q").cast("double")
    val rows = withTot.select(col("bucket"), col("n_p"), col("n_q"),
      (col("n_p") === 0 || col("n_q") === 0).as("one_sided"),
      when(col("n_p") > 0 && col("n_q") > 0, contribNano(pShare, qShare))
        .otherwise(lit(0L)).as("contrib_nano"))
    rows.withColumn("psi_nano", sum(col("contrib_nano")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .orderBy(col("bucket"))
  }

  /** Pearson chi-square test of independence over a two-way
    * contingency table (Pearson 1900) — are two categorical columns
    * associated? — with Cramér's V as the normalized effect size. The
    * third member of the engine's significance toolkit next to
    * [[twoProportionZ]] (two rates) and [[ksTest]] (two continuous
    * distributions).
    *
    * The FULL r×c grid is scored: combinations absent from the data
    * (O = 0 but both margins positive) still contribute E — dropping
    * them understates χ², so the grid is generated, not inferred from
    * present cells. Each cell's `(O−E)²/E` computes from exact longs
    * (margins ≤ n ≤ 2⁵³ convert exactly; E is one IEEE division) and
    * quantizes to integer NANO-units before the order-free sum — the
    * psiDrift discipline. `cramers_v = √(χ²/(n·min(r−1, c−1)))` rides
    * one IEEE sqrt of the already-quantized χ². Degenerate tables
    * (a single row or column level — dof 0) return null statistics.
    *
    * Scale shape: ONE map-combined (row, col)-grain count; the grid
    * cross join, margin windows, and the final sum all run on the
    * bounded r×c cell grain. The corpus never shuffles at row grain.
    *
    * @return ONE row: (n, n_rows, n_cols, dof, chi2_nano, chi2,
    *         cramers_v).
    */
  def chiSquareIndependence(df: DataFrame, rowCol: Column,
      colCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE corpus pass into the bounded r×c cell grain; margins and the
    // grid all derive from this checkpoint, never from a re-scan.
    // Null levels are excluded up front (the mutualInformation
    // contract): the grid join is null-rejecting, so a null level
    // would inflate the margins while its observed count fell to 0,
    // corrupting chi2, dof, and Cramér's V.
    val cells = df.select(rowCol.as("r"), colCol.as("c"))
      .where(col("r").isNotNull && col("c").isNotNull)
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rows = cells.groupBy(col("r")).agg(sum(col("o")).as("rm"))
    val cols = cells.groupBy(col("c")).agg(sum(col("o")).as("cm"))
    val grid = rows.crossJoin(broadcast(cols))
      .join(cells, Seq("r", "c"), "left")
      .select(col("r"), col("c"), col("rm"), col("cm"),
        coalesce(col("o"), lit(0L)).as("o"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val n = sum(col("o")).over(wAll)
    val e = (col("rm") * col("cm")).cast("double") / n.cast("double")
    val contrib = round((col("o").cast("double") - e) *
      (col("o").cast("double") - e) / e * 1e9, 0).cast("long")
    val scored = grid.select(col("r"), col("c"), contrib.as("cn"),
      n.as("n"),
      size(collect_set(col("r")).over(wAll)).cast("long").as("n_rows"),
      size(collect_set(col("c")).over(wAll)).cast("long").as("n_cols"))
    val agg = scored.groupBy(col("n"), col("n_rows"), col("n_cols"))
      .agg(sum(col("cn")).as("chi2_nano"))
    val dof = (col("n_rows") - 1) * (col("n_cols") - 1)
    val chi2 = col("chi2_nano").cast("double") / 1e9
    agg.select(col("n"), col("n_rows"), col("n_cols"), dof.as("dof"),
      when(dof > 0, col("chi2_nano")).as("chi2_nano"),
      when(dof > 0, round(chi2, 6)).as("chi2"),
      when(dof > 0, round(sqrt(chi2 / (col("n").cast("double") *
        least(col("n_rows") - 1, col("n_cols") - 1).cast("double"))), 6))
        .as("cramers_v"))
  }

  /** Two-sample Kolmogorov–Smirnov test — the nonparametric
    * did-the-distribution-shift check next to [[psiDrift]]'s bucketed
    * score (KS needs no bucketing choice and is sensitive anywhere on
    * the CDF): `D = max_v |F₁(v) − F₂(v)|` over the merged value set.
    *
    * INTEGER-EXACT: `D·n₁·n₂ = max_v |c₁(v)·n₂ − c₂(v)·n₁|` is an
    * exact long (c_i = cumulative counts), carried as `d_num` beside
    * the round-6 `d`; the 5% decision compares against Smirnov's
    * asymptotic critical value `1.358·√((n₁+n₂)/(n₁n₂))` — one sqrt of
    * identical operands, IEEE correctly-rounded, so the boolean is
    * engine-exact too.
    *
    * Scale shape: one value-grain map-combined count per side, a
    * full-outer merge of the two count tables, one single-partition
    * cumulative window over DISTINCT values (quantize a continuous
    * value upstream to bound that grain — the [[Learn.aucRoc]] caveat),
    * one max. Row grain never shuffles.
    *
    * @return ONE row: (n_p, n_q, d_num, d, significant).
    */
  def ksTest(p: DataFrame, q: DataFrame, valueOf: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def cnt(df: DataFrame, out: String): DataFrame =
      df.select(valueOf.cast("long").as("v"))
        // a null value has no place on a CDF, and the full-outer merge
        // would keep each side's null row separate, skewing D
        .where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as(out))
    val g = cnt(p, "np").join(cnt(q, "nq"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("np"), lit(0L)).as("np"),
        coalesce(col("nq"), lit(0L)).as("nq"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val c = g.select(
      sum(col("np")).over(wCum).as("cp"), sum(col("nq")).over(wCum).as("cq"),
      sum(col("np")).over(wAll).as("n_p"), sum(col("nq")).over(wAll).as("n_q"))
    val agg = c.groupBy(col("n_p"), col("n_q"))
      .agg(max(abs(col("cp") * col("n_q") - col("cq") * col("n_p")))
        .as("d_num"))
    val d = col("d_num").cast("double") /
      (col("n_p").cast("double") * col("n_q").cast("double"))
    val crit = lit(1.358) * sqrt(
      (col("n_p") + col("n_q")).cast("double") /
        (col("n_p").cast("double") * col("n_q").cast("double")))
    agg.select(col("n_p"), col("n_q"), col("d_num"),
      // empty sides have no CDF — null, not NaN
      when(col("n_p") > 0 && col("n_q") > 0, round(d, 6)).as("d"),
      when(col("n_p") > 0 && col("n_q") > 0, d > crit).as("significant"))
  }

  /** Pooled two-proportion z-test (the standard A/B significance check
    * a pipeline runs on conversion/quality rates between cohorts):
    * `z = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂))` with the pooled
    * `p̂ = (x₁+x₂)/(n₁+n₂)`. Group 1 is the LOWER group key, so the
    * sign convention is pinned. Every input to the float chain is an
    * exact long count; division and sqrt are IEEE correctly-rounded on
    * identical operands, so round-6 z is engine-exact. Degenerate
    * pools (p̂ ∈ {0, 1} — zero variance) return null z, not NaN.
    *
    * Scale shape: ONE map-combined group-grain aggregate (2 rows), a
    * 2-row driver-free self-pair — the corpus never shuffles at row
    * grain. Throws unless exactly two groups are present.
    *
    * @return ONE row: (grp_1, n_1, x_1, grp_2, n_2, x_2, z,
    *         significant) — significant at |z| > 1.96 (two-sided 5%),
    *         null when z is null.
    */
  def twoProportionZ(df: DataFrame, groupCol: Column,
      successCol: Column): DataFrame = {
    // one corpus pass into a group-grain checkpoint (bounded metadata)
    // so the cardinality check and the self-pair share it
    val counts = df.select(groupCol.as("grp"),
        successCol.cast("boolean").cast("long").as("s"))
      // a null group key would pass the 2-group require but vanish from
      // the `grp_1 < grp_2` self-pair (null < x is null), silently
      // returning an empty frame — reject it up front instead
      .where(col("grp").isNotNull)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("x"))
      .localCheckpoint(true)
    val g = counts.count()
    require(g == 2, s"twoProportionZ needs exactly 2 non-null groups, got $g")
    val a = counts.select(col("grp").as("grp_1"), col("n").as("n_1"),
      col("x").as("x_1"))
    val b = counts.select(col("grp").as("grp_2"), col("n").as("n_2"),
      col("x").as("x_2"))
    val paired = a.join(b, col("grp_1") < col("grp_2"))
    val p1 = col("x_1").cast("double") / col("n_1").cast("double")
    val p2 = col("x_2").cast("double") / col("n_2").cast("double")
    val pPool = (col("x_1") + col("x_2")).cast("double") /
      (col("n_1") + col("n_2")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_1").cast("double") +
        lit(1.0) / col("n_2").cast("double")))
    val z = when(pPool > 0.0 && pPool < 1.0, round((p1 - p2) / se, 6))
    paired.select(col("grp_1"), col("n_1"), col("x_1"),
      col("grp_2"), col("n_2"), col("x_2"), z.as("z"),
      when(z.isNotNull, abs(z) > 1.96).as("significant"))
  }

  /** Welch's unequal-variance t-test on MEANS (Welch, Biometrika 1947)
    * — the significance check for "did the average change" where
    * [[twoProportionZ]] answers it for rates:
    * `t = (m₁ − m₂)/√(s₁²/n₁ + s₂²/n₂)` with the Welch–Satterthwaite
    * effective degrees of freedom. The A/B staple for quality scores,
    * latencies, and document lengths between cohorts.
    *
    * ENGINE-EXACT inputs: `valueCol` must be INTEGER-VALUED (quantize a
    * continuous metric upstream — the ksTest caveat); per group the
    * test needs only (n, Σv, Σv²), where n and Σv are exact longs and
    * Σv² rides as DECIMAL(38,0) (exact in any aggregation order; a
    * long Σv² would overflow past ~3e18), and the variance NUMERATOR
    * `n·Σv² − (Σv)²` is formed in decimal too — exact, so the
    * mean-vs-variance cancellation a double-first subtraction suffers
    * cannot occur. Every float downstream (means, the divides, t, df)
    * is a fixed chain of IEEE ops on identical operands in any engine;
    * t rounds to 6, df to 4.
    * Null group keys and null values are excluded up front (the
    * chi-square lesson). Degenerate inputs return null statistics: a
    * group with n < 2 has no sample variance; two zero-variance groups
    * have no t.
    *
    * `significant` uses the NORMAL approximation (|t| > 1.96, two-sided
    * 5%) — exact t-quantiles need the incomplete beta; at the corpus
    * sizes this engine targets df is large and the approximation is the
    * standard one. df rides the output so a caller with a t-table can
    * re-decide.
    *
    * Scale shape: ONE map-combined group-grain aggregate (2 rows), a
    * 2-row driver-free self-pair — the twoProportionZ shape; the corpus
    * never shuffles at row grain. Throws unless exactly two non-null
    * groups are present.
    *
    * @return ONE row: (grp_1, n_1, grp_2, n_2, t, df_w, significant) —
    *         group 1 is the LOWER group key (pinned sign convention).
    */
  def welchTTest(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val counts = df.select(groupCol.as("grp"), valueCol.cast("long").as("v"))
      .where(col("grp").isNotNull && col("v").isNotNull)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v").cast("decimal(38,0)") * col("v").cast("decimal(38,0)"))
          .as("s2"))
      .localCheckpoint(true)
    val g = counts.count()
    require(g == 2, s"welchTTest needs exactly 2 non-null groups, got $g")
    val a = counts.select(col("grp").as("grp_1"), col("n").as("n_1"),
      col("s1").as("s1_1"), col("s2").as("s2_1"))
    val b = counts.select(col("grp").as("grp_2"), col("n").as("n_2"),
      col("s1").as("s1_2"), col("s2").as("s2_2"))
    val paired = a.join(b, col("grp_1") < col("grp_2"))
    def mean(s1: Column, n: Column) = s1.cast("double") / n.cast("double")
    // sample variance from the exact moments, numerator IN DECIMAL:
    // (n·Σv² − (Σv)²) is exact in DECIMAL(38,0) before the ONE cast to
    // double, so a large mean with a small variance cannot cancel
    // catastrophically (casting Σv² to double first loses the low bits
    // the subtraction needs). Envelope: n·Σv² and (Σv)² must fit 38
    // digits — |Σv| < 1e19 always holds (long), n·Σv² < 1e38 allows
    // ~1e18 rows of 1e10-magnitude values; ANSI throws loudly past it.
    // Guarded internally (null below n=2) because ANSI mode raises on
    // the n−1=0 divide even while evaluating a CaseWhen CONDITION
    def sVar(s1: Column, s2: Column, n: Column) =
      when(n >= 2,
        (s2 * n.cast("decimal(38,0)") -
          s1.cast("decimal(38,0)") * s1.cast("decimal(38,0)")).cast("double") /
          n.cast("double") / (n.cast("double") - lit(1.0)))
    val va = sVar(col("s1_1"), col("s2_1"), col("n_1"))
    val vb = sVar(col("s1_2"), col("s2_2"), col("n_2"))
    val qa = va / col("n_1").cast("double")
    val qb = vb / col("n_2").cast("double")
    val tOk = col("n_1") >= 2 && col("n_2") >= 2 && (qa + qb) > 0.0
    val t = when(tOk,
      round((mean(col("s1_1"), col("n_1")) - mean(col("s1_2"), col("n_2"))) /
        sqrt(qa + qb), 6))
    val dfDen = qa * qa / (col("n_1").cast("double") - lit(1.0)) +
      qb * qb / (col("n_2").cast("double") - lit(1.0))
    val dfW = when(tOk && dfDen > 0.0,
      round((qa + qb) * (qa + qb) / dfDen, 4))
    paired.select(col("grp_1"), col("n_1"), col("grp_2"), col("n_2"),
      t.as("t"), dfW.as("df_w"),
      when(t.isNotNull, abs(t) > 1.96).as("significant"))
  }

  /** One bucket's nano-PSI contribution from the two shares — the
    * round-6-ln-before-product integer-nano quantization shared by
    * [[psiDrift]] and [[psiDriftSeries]]. */
  private def contribNano(pShare: Column, qShare: Column): Column = {
    val lnq = round(log(pShare / qShare) * 1e6).cast("long")
    round((pShare - qShare) * (lnq.cast("double") / 1e6) * 1e9).cast("long")
  }

  /** [[psiDrift]] as a SERIES against one fixed reference: each group of
    * `counts` (a monitoring window — a day, a delivery, a micro-batch
    * watermark) scores its bucket histogram against the same reference
    * histogram, yielding one PSI row per group — the shape a streaming
    * drift monitor emits (gate st16 feeds it windowed stream counts).
    * Same quantization discipline and same no-epsilon-invention stance
    * as [[psiDrift]]: one-sided buckets are counted and excluded, never
    * smoothed.
    *
    * Scale shape: inputs are ALREADY bucket-grain counts (the caller's
    * aggregation did the only corpus-grain work); the reference is
    * broadcast against the distinct group list, the full-outer join and
    * both totals ride group-partitioned windows — everything here is
    * (group × bucket)-grain metadata.
    *
    * @param counts (group, bucket, n) frame — `groupCol`/`bucketCol`/
    *               `nCol` name its columns.
    * @param ref    (bucket, n) reference histogram — `refBucketCol`/
    *               `refNCol` name its columns.
    * @return one row per group: (grp, n_buckets, n_one_sided, psi_nano).
    */
  def psiDriftSeries(counts: DataFrame, groupCol: Column, bucketCol: Column,
      nCol: Column, ref: DataFrame, refBucketCol: Column,
      refNCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cur = counts.select(groupCol.as("grp"),
      bucketCol.cast("long").as("bucket"), nCol.cast("long").as("n_cur"))
    val refN = ref.select(refBucketCol.cast("long").as("bucket"),
      refNCol.cast("long").as("n_ref"))
    val refAll = cur.select(col("grp")).distinct()
      .crossJoin(broadcast(refN))
    val joined = refAll.join(cur, Seq("grp", "bucket"), "full_outer")
      .select(col("grp"), col("bucket"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
    val w = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withTot = joined
      .withColumn("tot_cur", sum(col("n_cur")).over(w))
      .withColumn("tot_ref", sum(col("n_ref")).over(w))
    val pShare = col("n_cur").cast("double") / col("tot_cur").cast("double")
    val qShare = col("n_ref").cast("double") / col("tot_ref").cast("double")
    withTot.select(col("grp"),
        (col("n_cur") === 0 || col("n_ref") === 0).as("one_sided"),
        when(col("n_cur") > 0 && col("n_ref") > 0,
          contribNano(pShare, qShare)).otherwise(lit(0L)).as("contrib"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("one_sided").cast("long")).as("n_one_sided"),
        sum(col("contrib")).as("psi_nano"))
  }

  /** Kruskal–Wallis H test (Kruskal & Wallis JASA 1952) — the K-GROUP
    * member of the rank toolkit: do k samples come from the same
    * distribution? ([[twoProportionZ]] compares two rates, [[ksTest]]
    * two CDFs, [[Learn.aucRoc]] ranks two classes; this is the k-way
    * rank ANOVA.) `H = 12/(N(N+1))·Σ R_i²/n_i − 3(N+1)` over midranks,
    * with the tie correction `H' = H / (1 − Σ(t³−t)/(N³−N))`.
    *
    * EXACTNESS DISCIPLINE: doubled midranks (the aucRoc machinery)
    * keep every rank sum `R2_i` an exact long; each group's
    * `R2_i²/n_i` is ONE IEEE division of exact longs quantized to
    * integer micro-units before the order-free sum; the tie sum
    * `Σ(t³−t)` and `N³−N` are exact longs, so the corrected H is a
    * short chain of IEEE ops on identical operands — round-6 in any
    * engine. R2_i² stays exact below ~2³¹ ROWS — collapse grain first
    * (the spearman contract; the gate feeds bounded day-grain data).
    * The 5% decision compares H' against the caller's chi-square
    * critical value for dof = k−1 (dof is data-dependent, so the
    * caller owns the quantile). Degenerate inputs (k < 2, or every
    * value tied → C = 0) return null statistics, never NaN.
    *
    * Scale shape: one (group, value)-grain map-combined count, one
    * single-partition window over DISTINCT values for the midranks
    * (quantize continuous values upstream — the ksTest caveat), then
    * group-grain and 1-row aggregates.
    *
    * @return ONE row: (n, k, h, h_tie, significant).
    */
  def kruskalWallis(df: DataFrame, groupCol: Column, valueCol: Column,
      critValue: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gv = df.select(groupCol.cast("string").as("g"),
        valueCol.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val byV = gv.groupBy(col("v")).agg(sum(col("c")).as("t"))
    val ranked = byV.select(col("v"), col("t"),
      (lit(2L) * coalesce(sum(col("t")).over(
        Window.orderBy(col("v")).rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)) +
        col("t") + 1L).as("dr"))
    val ties = ranked.agg(sum(col("t") * col("t") * col("t") - col("t"))
      .as("tie_sum"))
    val perG = gv.join(ranked.select(col("v"), col("dr")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_g"), sum(col("c") * col("dr")).as("r2"))
    // each group's R2²/n_g: one IEEE divide of exact longs, quantized
    // to micro-units before the order-free sum
    val termMicro = round(col("r2").cast("double") * col("r2").cast("double")
      / col("n_g").cast("double") * 1e6).cast("long")
    val agg = perG.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
      sum(termMicro).as("s_micro"))
    val n = col("n").cast("double")
    // doubled ranks: R_i = R2_i/2 -> Σ R_i²/n_i = (Σ R2²/n)/4
    val h = lit(12.0) / (n * (n + 1.0)) *
      (col("s_micro").cast("double") / 1e6 / 4.0) - lit(3.0) * (n + 1.0)
    val denom = (n * n * n - n) - col("tie_sum").cast("double")
    val hTie = h * (n * n * n - n) / denom
    agg.crossJoin(broadcast(ties))
      .select(col("n"), col("k"),
        when(col("k") >= 2, round(h, 6)).as("h"),
        when(col("k") >= 2 && denom > 0, round(hTie, 6)).as("h_tie"),
        when(col("k") >= 2 && denom > 0, hTie > critValue)
          .as("significant"))
  }

  /** Functional-dependency check (the profiling primitive behind
    * normalization audits and key discovery, cf. Papenbrock et al.
    * VLDB 2015's FD-discovery survey): does `lhs → rhs` hold — is
    * every lhs value associated with at most ONE distinct rhs value?
    * The single-pair building block a discovery loop calls per
    * candidate; run it on claimed keys and denormalized copies before
    * trusting a delivery ("order determines customer", "nation
    * determines region").
    *
    * Semantics: NULL rhs values are invisible to the distinct count
    * (standard `count(DISTINCT …)` in both engines), so a group with
    * rhs {null, 'a'} does NOT violate; null LHS values form a group
    * like any other. Violation counting is exact (a group violates iff
    * it holds ≥ 2 distinct non-null rhs values).
    *
    * Scale shape: per FD one lhs-grain map-combined distinct-count
    * aggregate plus a 1-row rollup — the minimum for an exact check;
    * each FD shuffles on its own key (inherent: different keys), and
    * the result is FD-grain metadata.
    *
    * @param fds (name, lhsCol, rhsCol) candidates over `df`.
    * @return one row per FD: (fd, n_lhs, n_violating, holds).
    */
  def fdCheck(df: DataFrame, fds: Seq[(String, String, String)])
      : DataFrame = {
    require(fds.nonEmpty, "need at least one FD candidate")
    fds.map { case (name, lhs, rhs) =>
      df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("nd"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          (col("n_violating") === 0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Benford first-significant-digit test (Newcomb 1881 / Benford 1938;
    * Nigrini's forensic-accounting staple) — does a positive amount
    * column follow the log distribution `P(d) = log₁₀(1 + 1/d)`
    * organically-generated magnitudes follow? Fabricated, clipped, or
    * unit-mangled feeds flunk it; the data-forensics member of the
    * significance toolkit (chi-square GOODNESS-OF-FIT against a FIXED
    * distribution, where [[chiSquareIndependence]] tests two observed
    * columns against each other).
    *
    * ENGINE-EXACT digit extraction: values score on their integer
    * CENTS (`round(x·100)` as a long), and the first digit is the
    * first character of the integer's decimal string — identical in
    * any engine, no log10-at-a-power-boundary hazard. Positive values
    * under half a cent round to 0 and are excluded with the
    * non-positives. Each Benford share quantizes to round-6
    * micro-units BEFORE the expectation product; every `(O−E)²/E`
    * quantizes to integer nano-units before the order-free sum (the
    * [[chiSquareIndependence]] discipline). ALL NINE digits are always
    * scored — an absent digit still contributes its full E. The 5%
    * decision compares against the dof-8 critical value 15.507.
    *
    * Scale shape: ONE map-combined corpus pass to the 9-row digit
    * grain; the grid generation, expectation math, and total all run
    * on those 9 rows.
    *
    * @return 9 rows: (d, o, p_micro, contrib_nano, chi2_nano,
    *         significant); statistics null when no value scored.
    */
  def benfordTest(df: DataFrame, valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digits = df
      .select(round(valueCol.cast("double") * 100).cast("long").as("cents"))
      .filter(col("cents") >= 1L)
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("long").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("o"))
    val grid = df.sparkSession.range(1, 10).select(col("id").as("d"))
      .join(digits, Seq("d"), "left")
      .select(col("d"), coalesce(col("o"), lit(0L)).as("o"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val n = sum(col("o")).over(wAll)
    val pMicro = round(log10((col("d") + 1).cast("double") /
      col("d").cast("double")) * 1e6).cast("long")
    val e = n.cast("double") * (pMicro.cast("double") / 1e6)
    val contrib = round((col("o").cast("double") - e) *
      (col("o").cast("double") - e) / e * 1e9).cast("long")
    val scored = grid.select(col("d"), col("o"), n.as("n"),
      pMicro.as("p_micro"),
      when(n > 0, contrib).as("contrib_nano"))
    scored.select(col("d"), col("o"), col("p_micro"), col("contrib_nano"),
        when(col("n") > 0,
          sum(col("contrib_nano")).over(wAll)).as("chi2_nano"),
        when(col("n") > 0, sum(col("contrib_nano")).over(wAll)
          .cast("double") / 1e9 > 15.507).as("significant"))
      .orderBy(col("d"))
  }

  /** Mutual information between two categorical columns, with the
    * normalized variant — the effect-size companion to
    * [[chiSquareIndependence]] from the information-theoretic side
    * (Cover & Thomas ch. 2): `I(X;Y) = Σ_{x,y} p(x,y)·ln(p(x,y) /
    * (p(x)p(y)))` in nats, and `NMI = I / √(H(X)·H(Y))` (the geometric
    * normalization of Strehl & Ghosh JMLR 2002). A feature-selection /
    * redundancy check a curation pipeline runs between metadata
    * columns — "does source tell me anything about language?" — where
    * chi-square only answers "are they dependent at all".
    *
    * Unlike chi-square, ABSENT cells contribute exactly 0
    * (lim p→0 of p·ln p = 0), so only present cells are scored — no
    * grid generation. ENGINE-EXACT: every share is a quotient of exact
    * longs (≤2⁵³ converts exactly; products of two such doubles are one
    * IEEE multiply on identical operands), the lone libm `ln` quantizes
    * to round-6 micro-nats BEFORE the product, and each contribution
    * quantizes to integer nano-nats before the order-free sum — the
    * [[psiDrift]] discipline. Entropies ride the identical chain over
    * the margin tables. MI contributions can be NEGATIVE per cell
    * (ratio < 1); both engines round half away from zero. Null
    * categories are excluded up front (margins join by equality; a
    * null level would silently drop from the joint term but not the
    * margins, skewing the score — exclusion is the honest contract).
    * A single-level column yields MI = 0 and H = 0 → `nmi` null, never
    * NaN.
    *
    * Scale shape: ONE map-combined corpus pass to the bounded (x, y)
    * cell grain (checkpointed — margins and the joint term derive from
    * it, never from a re-scan); margins broadcast back into the cell
    * table; every aggregate downstream runs on cell/margin grain. The
    * corpus never shuffles at row grain.
    *
    * @return ONE row: (n, n_x, n_y, mi_nano, mi, hx_nano, hy_nano,
    *         nmi).
    */
  def mutualInformation(df: DataFrame, xCol: Column,
      yCol: Column): DataFrame = {
    val cells = df.filter(xCol.isNotNull && yCol.isNotNull)
      .select(xCol.as("x"), yCol.as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val xm = cells.groupBy(col("x")).agg(sum(col("o")).as("m"))
    val ym = cells.groupBy(col("y")).agg(sum(col("o")).as("m"))
    val tot = cells.agg(sum(col("o")).as("n"))

    // round-6 micro-nat ln, the shared quantization step
    def lnq(ratio: Column): Column =
      round(log(ratio) * 1e6).cast("long").cast("double") / 1e6

    val joint = cells
      .join(broadcast(xm.withColumnRenamed("m", "xm")), Seq("x"))
      .join(broadcast(ym.withColumnRenamed("m", "ym")), Seq("y"))
      .crossJoin(broadcast(tot))
    val pxy = col("o").cast("double") / col("n").cast("double")
    val ratio = (col("o").cast("double") * col("n").cast("double")) /
      (col("xm").cast("double") * col("ym").cast("double"))
    val mi = joint.agg(
      sum(round(pxy * lnq(ratio) * 1e9).cast("long")).as("mi_nano"))

    def entropy(m: DataFrame, cnt: String, out: String): DataFrame = {
      val share = col("m").cast("double") / col("n").cast("double")
      m.crossJoin(broadcast(tot)).agg(
        count(lit(1)).as(cnt),
        sum(round(-share * lnq(share) * 1e9).cast("long")).as(out))
    }
    val hx = entropy(xm, "n_x", "hx_nano")
    val hy = entropy(ym, "n_y", "hy_nano")

    val nmi = round((col("mi_nano").cast("double") / 1e9) /
      sqrt((col("hx_nano").cast("double") / 1e9) *
        (col("hy_nano").cast("double") / 1e9)), 6)
    tot.crossJoin(mi).crossJoin(hx).crossJoin(hy)
      .select(col("n"), col("n_x"), col("n_y"), col("mi_nano"),
        round(col("mi_nano").cast("double") / 1e9, 6).as("mi"),
        col("hx_nano"), col("hy_nano"),
        when(col("hx_nano") > 0 && col("hy_nano") > 0, nmi).as("nmi"))
  }
}
