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
}
