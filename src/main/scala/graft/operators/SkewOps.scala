package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins at 100 TB scale.
  *
  * AQE's skew-join split handles most cases automatically; explicit
  * salting remains the tool when one join key dominates so heavily that a
  * single logical key exceeds an executor (e.g., the null/"unknown" key of
  * a fact table, or a boilerplate document fingerprint).
  *
  * `saltedJoin` spreads each hot key of the large side over `salt`
  * sub-keys deterministically (hash of the whole row modulo salt — no
  * `rand()`, so recomputation under task retry is stable), and replicates
  * the small side once per sub-key. Results are identical to the plain
  * join; the shuffle partitioning changes from |keys| to |keys|·salt.
  */
object SkewOps {

  /** Inner equi-join of `large` (skewed) with `small`, salted `salt` ways.
    * `largeKey`/`smallKey` name the join columns. The small side is
    * replicated `salt`× — keep it broadcast-small or dim-sized.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      salt: Int): DataFrame = {
    // deterministic per-row salt: hash over all large-side columns
    val saltCol: Column = pmod(
      xxhash64(large.columns.map(col).toSeq: _*), lit(salt))
    val l = large.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i)): _*)))
    l.join(s, l(largeKey) === s(smallKey) && l("__salt") === s("__salt"))
      .drop("__salt")
  }

  /** Join-key skew diagnosis — the measurement that DECIDES between the
    * plain join, AQE's runtime split, and [[saltedJoin]]: one row per
    * top-`k` heaviest key plus one `(total)` summary row carrying the
    * exact skew statistics. `skew_ratio_micro = max/mean` in integer
    * micro-units (both operands exact longs — `max·1e6·n / total` via
    * one IEEE divide of identical operands, rounded); a ratio near
    * `n_keys` means one key holds everything. The summary row answers
    * "should I salt" and the per-key rows answer "by how much and whom"
    * (the hot-key list feeds a targeted salt or a hint).
    *
    * Scale shape: ONE key-grain map-combined count (the shuffle the
    * join itself would pay anyway), a 1-row exact aggregate, and a
    * TakeOrderedAndProject top-k — count-class cost, never row grain
    * past the key count.
    *
    * @return k+1 rows: (key, n, share_micro, skew_ratio_micro) — the
    *         summary row has key "(total)" and n = row count; per-key
    *         rows carry their own share and null ratio.
    */
  def skewReport(df: DataFrame, keyCol: Column, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.select(keyCol.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tot = counts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total"),
      max(col("n")).as("mx"))
    val top = counts.crossJoin(broadcast(tot))
      .select(coalesce(col("key"), lit("(null)")).as("key"), col("n"),
        round(col("n").cast("double") * 1e6 / col("total").cast("double"))
          .cast("long").as("share_micro"),
        lit(null).cast("long").as("skew_ratio_micro"))
      .orderBy(col("n").desc, col("key")).limit(k)
    val summary = tot.select(lit("(total)").as("key"),
      col("total").as("n"), lit(1000000L).as("share_micro"),
      round(col("mx").cast("double") * 1e6 *
        col("n_keys").cast("double") / col("total").cast("double"))
        .cast("long").as("skew_ratio_micro"))
    top.unionByName(summary)
  }
}
