package graft

/** Benchmark main: runs the headline query set against
  * SPARK_GRAFT_SF_DIR, prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},
  *  "errors":{...},"sf":...}.
  *
  * The headline set (~40 queries) spans every operator family; the full
  * registered suite runs with SPARK_GRAFT_BENCH_ALL=1. Two reasons for a
  * curated subset: per-query numbers should measure plans (not 120×
  * fixed per-query session costs), and the output line must stay short
  * enough that log-tail capture keeps the whole JSON intact.
  *
  * Failures are NEVER silent: a failed query reports -1 in "queries" and
  * its exception under "errors".
  */
object Bench {

  /** One representative per operator family, biased toward the queries
    * that move real data volume at scale. */
  private val headline: Seq[String] = Seq(
    // scan/filter/agg/join core
    "q01_scan_filter_project", "q02_agg_pricing", "q03_join_inner_agg",
    "q06_join_full_outer", "q10_topk", "q14_distinct_agg",
    "q16_window_running", "q19_multijoin_agg", "q26_events_hourly",
    "q27_sessionize", "q31_range_join", "q47_asof_tolerance",
    "q64_session_window", "q68_salted_join", "q73_bucketed_join",
    "q74_asof_native", "q75_asof_native_tolerance", "q78_interval_native",
    "q80_volume_shipping", "q81_important_stock",
    // dedup / similarity / text pipeline
    "d01_dedup_exact", "d02_minhash_lsh", "d03_simhash_pairs",
    "d04_ngram_jaccard", "d05_embedding_nn", "d06_dedup_clusters",
    "d07_dedup_canonical", "d08_simhash_portable",
    "s01_ann_bruteforce", "s02_ann_srp_lsh", "s03_ann_ivf",
    "t01_token_count", "t06_tfidf", "t12_stratified_sample",
    // SQL replay + streaming
    "sq01_sql_region_revenue", "sq02_sql_correlated", "sq03_sql_cte_window",
    "st01_stream_hourly", "st03_stream_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.get()
    val all = SparkEntry.queries
    val names =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")) all.keys.toSeq.sorted
      else headline.filter(all.contains)
    // Warm the JVM/codegen once on the smallest SF so per-query numbers
    // measure the plan, not first-call classloading.
    try all(names.head)(spark, sfDir).count()
    catch { case _: Throwable => () }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val err =
        try { all(name)(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(80)}")
        }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (err.isEmpty) sec else -1.0, err.map(name -> _))
    }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // full JSON-string escaping: Spark exception messages embed plan
    // fragments with tabs/newlines — any raw control char would make the
    // one output line unparseable exactly when a failure must be reported
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errs = results.flatMap(_._3).map { case (k, m) =>
      "\"" + k + "\":\"" + jesc(m) + "\""
    }.mkString("{", ",", "}")
    val total = fmt(results.collect { case (_, v, _) if v >= 0 => v }.sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
