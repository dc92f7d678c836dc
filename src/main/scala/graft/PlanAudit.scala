package graft

/** Regenerates EXPLAINS.md: the AQE-final formatted plans of headline
  * queries at the benchmark scale factor, as evidence that pushdown,
  * pruning, broadcast choices and codegen spans are what the 100 TB
  * design intends. `sbt "runMain graft.PlanAudit [sfDir] [outFile]"`.
  */
object PlanAudit {
  private[graft] val headline = Seq(
    "q01_scan_filter_project", "q02_agg_pricing", "q19_multijoin_agg",
    "q10_topk", "q27_sessionize", "q32_asof_join",
    "d02_minhash_lsh", "d03_simhash_pairs", "s01_ann_bruteforce",
    "s04_ann_ivf_layout", "d05_embedding_nn",
    "q52_exists_interval", "t06_tfidf",
    "q57_recursive_cte", "q60_waiting_supplier", "q64_session_window",
    "s03_ann_ivf", "d06_dedup_clusters",
    // round 10: the one r9 perf-weak row — post-IterativeLoop the CC
    // labels enter this plan as a self-contained LogicalRDD, so the
    // docs join + canonical window read it once, never re-deriving the
    // star-contraction tail
    "d07_dedup_canonical",
    "q74_asof_native", "q78_interval_native",
    "q82_cms_heavy_hitters", "q84_fuzzy_match", "d09_decontaminate",
    "m05_pack_by_size", "m06_sequence_layout", "t13_bigram_lm",
    "s05_semantic_dedup", "t15_domain_mixing",
    "q88_zorder_layout", "q89_hll_sketch_merge",
    "q92_bloom_prune", "t17_quality_quantile_gate", "t18_priority_sample",
    "q80_volume_shipping", "q93_jaro_winkler", "q94_variant_json",
    "d11_span_dedup", "d12_span_scrub", "t19_chunking",
    "t20_perplexity_buckets", "t21_dsir_selection",
    "t22_bm25", "p02_rag_retrieval", "s07_hard_negatives",
    "d13_containment",
    // round 8: persisted-index serving, approx ANALYZE profile,
    // layout-fed mining, CDC diff + SCD2 merge (broadcast-only plan)
    "t23_bm25_index", "q98_column_stats_approx", "s09_hard_negatives_layout",
    "q99_snapshot_diff", "q100_scd2_merge",
    // round-8 second wave: list-grain rank fusion; the 3 unrolled
    // PageRank sweeps (edge join + groupBy(dst) each, cached edge set);
    // funnel fold (step-filtered single groupBy, exchange-reusing
    // key left join)
    "p03_hybrid_rrf", "q103_pagerank", "q104_funnel",
    // incremental view maintenance: batch aggregated to view grain
    // map-side first, then ONE view-grain full-outer merge exchange —
    // the base table appears only under the v0 build, never the refresh
    "q106_incremental_view",
    // exact prefix-filter similarity join: df agg + doc-grain window +
    // prefix equi-join + sorted-merge verify — no cartesian anywhere
    "d14_prefix_jaccard",
    // PMI phrase mining: one cached corpus scan, pair/token-grain
    // map-combined counts, broadcast totals, TakeOrderedAndProject
    "t25_pmi_phrases",
    // round 10: unigram-LM tokenizer training — the result must be a
    // self-contained LogicalRDD (IterativeLoop), constant in EM budget;
    // k-core (iterative peel, LogicalRDD result); deletion-vector
    // merge-on-read (broadcast LeftAnti, zero base exchanges)
    "t32_unigram_train", "q118_kcore", "q119_deletion_vectors",
    // round 11: coreness ladder (self-contained checkpoint result —
    // plan must be one cached-relation scan + sort regardless of the k
    // ladder), literal TPC-DS Q27 (five-way star + ROLLUP: all dims
    // broadcast, one fact-grain aggregate), RM3 (single-job feedback
    // model: the window pair rides one sort over the term-grain model)
    "q122_coreness", "sq09_tpcds_q27", "t34_rm3_expansion",
    // generic MERGE: the broadcast-3-join evidence (target never
    // shuffles; wide left-outer + key-pruned semi + anti on the batch)
    "q123_merge_into",
    // round 12: BPE apply from the stored merge layout — the plan must
    // be histogram-grain (one token explode + word groupBy + the fold
    // projection chain; the vocabulary-sized merges file never joins)
    "t40_bpe_apply",
    // round-12 drift watch: st10/st11 were the only full-suite rows
    // >1.3x vs r10 (streaming state-store queries, per-microbatch
    // overhead) — pin their final-batch plans so next round's diff is
    // structural, not inferential
    "st10_stream_type_counts", "st11_stream_near_dedup",
    // PassJoin edit-distance join: candidates must be the segment-key
    // equi-join + the short-string length-key equi-join (no cartesian,
    // no nested-loop — the ScaleSpec pin, visible here as evidence)
    "q128_edit_distance_join",
    // persisted-LSH ingest probe: the buckets scan must carry partition
    // filters (touched parts only) and the corpus must never re-scan
    "d17_lsh_index",
    // round 13: QL-Dirichlet must keep the bm25TopK shape (one cached
    // projection scan + broadcast stats row + TakeOrderedAndProject);
    // the filter funnel is one map pass + a rules-bounded agg/window;
    // WordPiece is histogram-grain (token count + per-word fold, no
    // vocab join); PQ-ADC is a pure map over codes (codebook literals)
    // + TakeOrdered; MMR's corpus-grain work is the one relevance
    // TakeOrdered (pool rounds are bounded 1-row argmaxes); SCC labels
    // leave as a self-contained checkpoint union scan
    "t42_wordpiece", "t43_ql_dirichlet", "t44_filter_funnel",
    "s12_pq_adc", "s13_mmr_select", "q129_scc",
    // BM25F must keep the one-scan/broadcast-stats/TakeOrdered BM25
    // shape with per-field widths folded into the same projection; PSI
    // reduces each snapshot map-side to bucket grain before the
    // full-outer join (no row-grain exchange)
    "t45_bm25f", "q130_psi_drift",
    // ridge trains as ONE moment aggregate and serves map-side with
    // literal weights; AUC reduces to score grain before its window
    "q131_ridge_regression", "q132_auc_roc",
    // landmark BFS labels leave join- and exchange-free: checkpoint
    // unions on the distributed path, a LocalRelation on the r15
    // small-graph driver path (the gate's sf0.1 graph sits under the
    // bound); quantile calibration is grain-collapse +
    // group-partitioned window
    "q133_landmark_distances", "t46_quantile_normalize",
    // Bellman-Ford state leaves as one checkpoint scan
    "q134_shortest_paths",
    // streaming drift monitor: the drift math is (day × bucket)-grain
    // metadata riding group-partitioned windows over the memory-sink
    // counts — the only corpus-grain work happened in the stream agg
    "st16_stream_drift",
    // two-stage PQ serving: ADC TakeOrdered shortlist broadcast into a
    // semi-join, exact re-rank map-side — zero shuffles end to end
    "s14_pq_rerank",
    // Theil-Sen collapses to day grain before its pairwise join;
    // the A/B z-test serves from a 2-row group-grain checkpoint
    "q135_theil_sen", "q136_ab_test",
    // KS reduces both sides map-side to value grain before the window
    "q137_ks_test",
    // curation pipeline: bounded calibration/rate tables broadcast into
    // the corpus; no sort-merge join anywhere
    "p04_curation_pipeline",
    // IR metrics: run-file-grain equi-joins, corpus untouched
    "t47_ir_metrics",
    // CUSUM: day-grain collapse + two windows, no sequential fold
    "q138_cusum",
    // chi-square: cell-grain grid, margins as windows, one corpus pass
    "q139_chi2_independence",
    // mutual information: served from the cell-grain checkpoint,
    // margins/entropies broadcast, no corpus re-scan
    "q140_mutual_information",
    // link prediction: z-keyed wedge self-equi-join, capped fanout,
    // TakeOrdered top-k
    "q141_link_prediction",
    // ACF: day-grain collapse, rank window + lag-explode equi-join
    "q142_acf",
    // modularity: community-grain aggregates off the labeled-edge
    // checkpoint, no pair enumeration
    "q143_modularity",
    // streaming CUSUM: reference mean broadcast as one row, day-grain
    // prefix windows over the memory-sink counts
    "st17_stream_cusum",
    // spearman: day-grain collapse into the pair checkpoint, rank
    // tables broadcast, one 5-moment aggregate
    "q144_spearman",
    // TextRank: one corpus scan to vocab-pair grain, pageRank node-grain
    // sweeps, vocab-grain word join-back
    "t48_textrank",
    // Benford: one map-combined pass to 9 digit rows, grid + windows
    // on that grain only
    "q145_benford",
    // Mann-Kendall: day-grain collapse, bounded pairwise join, 1-row z
    "q147_mann_kendall",
    // Gini: value-histogram grain, one cumulative window, 1-row output
    "q148_gini",
    // binary near-dup at ingest (r15 serving shape): the BATCH hashes
    // once into signature grain — within-batch banded bucket join +
    // hamming verify, unioned with the partition-pruned probe of the
    // persisted corpus layout (the m09 scan discipline)
    "m08_binary_near_dup",
    // ROUGE: (pair, gram)-grain counts, one in-key full-outer merge,
    // pair-grain aggregate
    "t49_rouge",
    // MMD: one posexplode pass to dim-grain conditional sums, d-row fold
    "s15_embedding_mmd",
    // attribution: one user-grain window shuffle, channel-grain agg
    "q149_attribution",
    // LLR collocations: cached token pass, pair-grain counts, margin
    // aggregates off the pair table, TakeOrdered top-k
    "t51_llr_collocations",
    // weighted PageRank: the pageRank sweep shape with strength joins
    "q151_weighted_pagerank",
    // LM layout serving: probe reads only touched bucket partitions
    "t52_lm_index",
    // skew report: key-grain count + 1-row stats + TakeOrdered top-k
    "q154_skew_report",
    // classification report: cell-grain checkpoint, class-grain joins
    "q155_classification_report",
    // Kruskal-Wallis: value-grain midrank window, group-grain terms
    "q156_kruskal_wallis",
    // burstiness: (term, doc)-grain count, term-grain moments, TakeOrdered
    "t53_burstiness",
    // round 14: binary-SimHash serving — the buckets scan must carry
    // partition filters (touched parts only) and hash only the probe
    // batch's payloads (the d17 discipline over binary signatures);
    // m11 is the dHash instantiation of the same generic index
    "m09_binary_simhash_index", "m11_binary_dhash_index",
    // dHash: one map pass (63 fixed hex-pair compares) to signature
    // grain, then the shared banded bucket join + hamming verify
    "m10_binary_dhash",
    // Welch t: one group-grain moment aggregate, a 2-row self-pair
    "q158_welch_ttest",
    // ANN recall eval: brute force over the sampled queries only
    // (broadcast queries, TakeOrdered heap), IVF as in serving, the
    // comparison a join of two bounded top-k sets.
    // (lx gates are intentionally absent: they are driver-side graph
    // walks with LocalRelation results — nothing scan-shaped to pin.)
    "s16_ann_recall",
    // round 15 (the r14 verdict's missing pins): the diameter family's
    // RETURNED plans are 1-row literal selects (the loop's per-hop
    // frontier shape is bfsDistances'/landmarkDistances' audited one;
    // the pin here evidences exactly that — no scan, no join, no
    // exchange survives into the result)
    "q146_diameter", "q157_diameter_ifub",
    // HLL intersection: three sketch rows off ONE localCheckpointed
    // 2-row sketch table (the events scan must appear zero times here)
    "q159_hll_intersection",
    // retention half-life: cohort-grain regression — the events scan
    // feeds date-grain metadata; everything after the distinct is
    // (cohort, offset)-grain with a broadcast max-day row
    "q160_retention_halflife",
    // n-gram novelty: gram-grain left-semi against the reference corpus
    // (no all-pairs, batch side drives), doc-grain aggregate
    "t54_ngram_novelty",
    // Heaps' law: bucket-grain moments (the token pass collapses to
    // per-bucket (x, y) before any join), 1-row fit
    "t55_heaps_law",
    // IVFADC: probed cell ids broadcast-semi-join into the assignment,
    // ADC a pure map over the pruned members' codes (codebook + LUT as
    // literals), TakeOrderedAndProject — nothing corpus-wide shuffles
    "s17_ivf_adc",
    // persisted IVFADC: the codes scan must carry c_id partition
    // filters (probed cells only) and the plan must hold NO corpus
    // parquet scan, no codebook training, no join — a pruned read +
    // literal-LUT map + TakeOrderedAndProject
    "s18_ivf_adc_layout",
    // distance distribution: dist-grain windows over ≤maxHops rows on
    // top of the landmark expansion's (landmark, id) distances — the
    // result plan must carry no corpus-grain shuffle
    "q161_distance_distribution",
    // IVFADC recall: the exact side must be per-eval-query map passes
    // ending in TakeOrderedAndProject (query as literal array, corpus
    // never shuffles), the approx side s17's serving plan; the union is
    // 3 bounded branches
    "s19_ivf_adc_recall",
    // IVFADC + rerank recall (round 18): same exact side; the approx
    // side adds ONE broadcast left-semi (the <=100-row ADC shortlist
    // into the quantized corpus projection) + TakeOrderedAndProject —
    // the rerank must never shuffle the corpus or re-derive assignment
    "s20_ivf_adc_rerank_recall",
    // layout-served rerank (round 18): stage 1 must be s18's
    // partition-pruned codes scan (PartitionFilters on c_id); stage 2
    // one broadcast left-semi into the corpus scan — the float fetch is
    // the ONLY corpus touch and it is shortlist-bounded
    "s21_ivf_adc_rerank_layout",
    // engine-exact trained cells (round 18): one corpus pass through
    // the broadcast-centroid crossJoin into the ObjectHashAggregate
    // argmin (no SortAggregate anywhere), then a (cell, dim)-grain
    // map-combined update — the corpus itself must never shuffle
    "s22_ivf_trained_cells_exact",
    // trained-vs-modulo recall contract (round 18): six serving
    // branches + three exact sides, every argmin on the hash path,
    // probes and shortlists broadcast — no corpus-grain exchange
    "s23_ivf_trained_vs_modulo_recall",
    // ADC layout append (round 18): the PROBE after the maintenance
    // cycle — partition-pruned codes scan over base+appended cells,
    // literal-LUT ADC map, one TakeOrderedAndProject; the appended
    // batch's encode never reads existing codes
    "s24_ivf_adc_append",
    // trained-coarse ADC layout (round 19): the served probe plan must
    // be BYTE-IDENTICAL in shape to s21's — partition-pruned codes
    // scan + shortlist-bounded float fetch; where the centroids came
    // from (Lloyd vs modulo) must be invisible to the serving tier
    "s25_ivf_adc_trained_layout",
    // trained-stack recall contract (round 19): the s20 eval harness
    // on trained cells — same hash-path argmins, broadcast probes
    "s26_ivf_adc_trained_recall",
    // trained layout + frozen-geometry append (round 19): the
    // post-append probe plan must stay s24's — partition-pruned codes
    // scan over base+appended cells, literal-LUT ADC projection, one
    // TakeOrderedAndProject; trained cells change WHERE codes live,
    // never the serving plan shape
    "s27_ivf_adc_trained_append")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/EXPLAINS.md")
    val spark = Sessions.get()
    val sb = new StringBuilder
    sb.append("# EXPLAINS — AQE-final physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanAudit` at `$sfDir`. Things to check\n")
    sb.append("per plan: `PushedFilters`/`ReadSchema` on scans (pushdown +\n")
    sb.append("pruning), broadcast vs shuffle join choices, partial/final\n")
    sb.append("aggregate pairs, `WholeStageCodegen` spans, no cartesian\n")
    sb.append("products except the intentional bounded blocks.\n")
    headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // force AQE final plan
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
      // cache isolation between audited queries (same reason as Bench):
      // a leaked block would silently change the NEXT plan's InMemory
      // substitutions and misreport its steady-state shape
      Caches.sweep(spark)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
