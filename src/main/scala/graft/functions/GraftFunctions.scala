package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the custom expressions, so `spark.sql` text can
  * call them directly (`SELECT simhash64(...), sorted_jaccard(...) ...`).
  *
  * Two entry points:
  *  - `GraftFunctions.register(spark)` — runtime registration on an
  *    existing session;
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — config-time
  *    injection for sessions built elsewhere (spark-submit, notebooks).
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> { es => HashExprs.SimHash64(es.head) },
    "minhash_sig" -> { es =>
      HashExprs.MinHashSig(es.head, es(1).eval().asInstanceOf[Number].intValue()) },
    "shingle_hashes" -> { es =>
      HashExprs.ShingleHashes(es.head, es(1).eval().asInstanceOf[Number].intValue()) },
    "sorted_jaccard" -> { es => HashExprs.SortedJaccard(es.head, es(1)) },
    "sorted_containment" -> { es => HashExprs.SortedContainment(es.head, es(1)) },
    "cms_estimate" -> { es => SketchExprs.CmsEstimate(es.head, es(1)) },
    "cosine_sim" -> { es => HashExprs.CosineSim(es.head, es(1)) },
    "minhash_set_agg" -> { es =>
      HashExprs.MinHashSetAgg(es.head, es(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression() },
    "top_k_by" -> { es =>
      require(es(2).foldable, "top_k_by k must be a literal")
      TopKAgg.TopKByScore(es.head, es(1),
          es(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression() },
    "bloom_agg" -> { es =>
      require(es(1).foldable && es(2).foldable,
        "bloom_agg numBits and numHashes must be literals")
      BloomExprs.BloomAgg(es.head,
          es(1).eval().asInstanceOf[Number].intValue(),
          es(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression() },
    "bloom_might_contain" -> { es =>
      BloomExprs.BloomMightContain(es.head, es(1)) },
    "jaro_winkler" -> { es => StringSim.JaroWinkler(es.head, es(1)) })

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `spark.sql.extensions` hook. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.HashExprs", name),
        builder))
    }
}
