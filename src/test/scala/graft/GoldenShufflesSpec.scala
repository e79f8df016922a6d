package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Golden shuffle-exchange counts — the plan-shape regression guard
  * VERDICT r6 item 2 asked for: PlanInvariantsSpec excludes the
  * catastrophic shapes (cartesian products, unpartitioned windows),
  * but nothing stopped a refactor from silently ADDING an exchange to
  * a query that still returns the right rows. Every graded query's
  * static-plan ShuffleExchangeExec count is pinned here against the
  * value audited in PLANS.md.
  *
  * Counted on `executedPlan` (exchanges are inserted by the
  * EnsureRequirements PREPARATION rule — `sparkPlan` has none) with
  * AQE scoped OFF (the adaptive wrapper hides children from
  * collect()). Exchange reuse has already run, so a self-join's
  * shared shuffle counts once — the number is "distinct shuffles this
  * plan pays", which is exactly the regression currency.
  *
  * To update DELIBERATELY after a plan change:
  * `sbt "Test / runMain graft.tools.ShuffleAudit"` regenerates the
  * block; paste it here and note the why in PLANS.md.
  */
class GoldenShufflesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val golden: Map[String, Int] = Map(
    "ab_test_metrics" -> 2,
    "agg_approx_distinct" -> 2,
    "agg_argminmax" -> 2,
    "agg_bitmap_distinct" -> 3,
    "agg_bool_countif" -> 2,
    "agg_corr_explicit" -> 2,
    "agg_collect_sorted" -> 2,
    "agg_count_distinct" -> 3,
    "agg_cube" -> 2,
    "agg_gini_impurity" -> 3,
    "agg_grouping_id" -> 2,
    "agg_grouping_sets" -> 2,
    "agg_histogram_bucketed" -> 3,
    "agg_mode_deterministic" -> 3,
    "agg_quantiles_exact" -> 2,
    "agg_regression_explicit" -> 2,
    "agg_rollup" -> 2,
    "agg_skew_kurtosis" -> 2,
    "agg_stats_explicit" -> 2,
    "agg_string_concat" -> 2,
    // r11c: histogram-bisect formulation — bucket agg + tiny bucket
    // windows + in-bucket sliver window + sort (PLANS.md)
    "agg_weighted_median" -> 4,
    "agg_zscore_outliers" -> 2,
    "ann_ivf_label" -> 2,
    "anomaly_mad" -> 4,
    "attribution_linear" -> 2,
    "basket_assoc_rules" -> 4,
    "bm25_topdocs" -> 1,
    // r7: row-local distinct gram build removed the corpus-pair
    // .distinct() exchange (PLANS.md r7)
    "boilerplate_ngram" -> 3,
    "cdc_apply_orders" -> 3,
    "chunk_sliding_windows" -> 2,
    "contamination_ngram" -> 5,
    // r11: persisted marginal table — the second broadcast build
    // reads the cache instead of re-aggregating (PLANS.md r11)
    "cooccur_pmi" -> 3,
    // r12c: two key-histogram aggs + full-outer SMJ (exchange-free,
    // both sides pre-partitioned on the join key) + one-row roll-up
    "join_cardinality_probe" -> 3,
    // r12c: persisted edge build (3) + 3 LPA rounds x (src,lbl) agg
    // + per-src argmax agg (broadcast label joins are exchange-free)
    "graph_label_propagation" -> 9,
    "graph_k_core" -> 8,
    "hash_feature_collisions" -> 2,
    "report_topn_other" -> 3,
    "agg_corr_matrix" -> 1,
    "audience_overlap_jaccard" -> 5,
    "dq_freshness_sla" -> 3,
    "sample_poisson_bootstrap" -> 2,
    "report_aging_buckets" -> 3,
    "report_concentration" -> 2,
    "cohort_revenue_ltv" -> 5,
    "events_dau_stickiness" -> 6,
    "text_term_entropy" -> 2,
    "join_time_band_bucketed" -> 2,
    "events_burst_detection" -> 3,
    "events_interarrival_stats" -> 3,
    "events_growth_accounting" -> 5,
    "join_null_aware_in" -> 4,
    "report_abc_class" -> 3,
    "sketch_countmin_freq" -> 2,
    "sketch_bloom_fpr" -> 7,
    "ts_cusum_alarm" -> 4,
    "kmeans_update_round" -> 5,
    "sim_hard_negatives" -> 2,
    "q17_small_qty_revenue" -> 3,
    "sketch_hll_linear" -> 4,
    "funnel_time_to_convert" -> 4,
    "stream_late_drop_audit" -> 2,
    "drift_unigram_jsd" -> 5,
    "dedup_url_canonical" -> 3,
    "report_ytd_running" -> 3,
    "multimodal_image_tiles" -> 1,
    "sketch_cms_join_forecast" -> 7,
    "report_value_migration" -> 6,
    "agg_gini_value" -> 3,
    "report_xyz_variability" -> 4,
    "attribution_time_decay" -> 6,
    "events_hourly_heatmap" -> 2,
    "harmonize_fx_convert" -> 2,
    "split_by_user_leakfree" -> 3,
    "sketch_hll_registers" -> 4,
    "ts_order_gap_survival" -> 3,
    "dq_order_lineitem_dates" -> 2,
    "agg_multi_distinct" -> 3,
    "stream_tumbling_distinct" -> 3,
    "corpus_length_log2" -> 2,
    "q7_volume_shipping" -> 4,
    "q8_market_share" -> 4,
    "sketch_kmv_distinct" -> 3,
    "eval_ann_recall" -> 6,
    "layout_zorder_skipping" -> 3,
    "curation_threshold_sweep" -> 3,
    "stats_ks_test" -> 5,
    "stats_mannwhitney_u" -> 5,
    "stats_spearman_corr" -> 11,
    "win_rolling_slope" -> 3,
    "vocab_coverage_curve" -> 1,
    "dq_benford_digits" -> 2,
    "index_inverted_postings" -> 2,
    "ts_seasonal_naive_error" -> 3,
    "pareto_frontier_parts" -> 3,
    "profile_key_skew" -> 2,
    "corpus_zipf" -> 1,
    "curation_funnel" -> 5,
    "dedup_band_tuning" -> 6,
    "dedup_cluster_cc" -> 2,
    "dedup_cluster_star" -> 5,
    "dedup_containment" -> 3,
    "dedup_exact_docs" -> 2,
    "dedup_minhash_lsh" -> 2,
    "dedup_near_embedding" -> 2,
    "dedup_near_jaccard" -> 2,
    "dedup_prefix_cluster" -> 2,
    "dedup_segment_level" -> 4,
    "dedup_simhash" -> 4,
    "dedup_source_priority" -> 2,
    "dq_rule_check" -> 6,
    "drift_embedding_centroid" -> 6,
    "drift_value_histogram" -> 4,
    "embed_cosine_histogram" -> 3,
    "embed_norm_audit" -> 2,
    "embed_quantize_int8" -> 2,
    "entity_match_fuzzy" -> 3,
    "event_transition_matrix" -> 4,
    "eval_langid_confusion" -> 8,
    "evolution_delete_cascade" -> 4,
    "filter_above_group_avg" -> 2,
    "filter_compound" -> 1,
    "fn_array" -> 1,
    "fn_bitwise" -> 1,
    "fn_conditional" -> 3,
    "fn_date" -> 1,
    "fn_higher_order" -> 1,
    "fn_map_json" -> 1,
    "fn_math" -> 1,
    "fn_string" -> 1,
    "fn_string_distance" -> 1,
    "fn_struct" -> 1,
    "fn_try_safe" -> 1,
    "fn_url_parse" -> 1,
    "funnel_steps" -> 4,
    "graph_degree_stats" -> 7,
    // r11c: fully declarative loop — distinct pairs (1), deg agg (1),
    // each iteration is broadcast-join (no exchange) + dst agg whose
    // exchange reuses across iterations, plus the presentation sort
    "graph_pagerank" -> 4,
    "embed_top_component" -> 7,
    "graph_bfs_levels" -> 3,
    "graph_jaccard_neighbors" -> 2,
    "graph_triangle_count" -> 7,
    "harmonize_cube" -> 2,
    "harmonize_provenance" -> 3,
    "harmonize_crosswalk" -> 3,
    "harmonize_unmappable" -> 2,
    "join_anti" -> 1,
    "join_asof_event" -> 2,
    "join_asof_forward" -> 2,
    "join_asof_nearest" -> 2,
    "join_asof_tolerance" -> 2,
    "join_broadcast_dim" -> 1,
    "join_bloom_prefilter" -> 2,
    "join_bucketed_colo" -> 2,
    "join_cross_small" -> 1,
    // r8: group-agg + presentation sort; dim broadcast and the DPP
    // subquery reuse it, so pruning adds no exchange (PLANS.md r8)
    "join_dpp_partitioned" -> 2,
    "join_full_outer" -> 3,
    "join_exists_flag" -> 4,
    "join_inner_equi" -> 1,
    "join_interval_overlap" -> 3,
    "join_left_outer" -> 1,
    "join_nullsafe_eq" -> 1,
    "join_scd2_pointintime" -> 3,
    "join_semi" -> 1,
    "join_skew_salted" -> 4,
    "join_snowflake_5way" -> 2,
    "join_star_3way" -> 2,
    "join_theta_range" -> 1,
    "kmeans_assign" -> 5,
    "knn_holdout_eval" -> 4,
    "knn_per_label" -> 3,
    "lateral_topn_orders" -> 2,
    "merge_upsert_customers" -> 4,
    "minhash_est_audit" -> 2,
    "mix_domain_weighted" -> 1,
    "mix_temperature_resample" -> 4,
    "mix_upsample_epochs" -> 5,
    "order_rfm_segments" -> 3,
    "multimodal_binary_meta" -> 1,
    "multimodal_chunk_audio" -> 1,
    "multimodal_enrich" -> 2,
    "multimodal_frame_sample" -> 1,
    "pack_sequences" -> 2,
    "pattern_consecutive" -> 2,
    "path_trigram_top" -> 2,
    "pivot_event_types" -> 3,
    "pivot_multi_agg" -> 3,
    "profile_documents" -> 2,
    "profile_orders" -> 2,
    "project_arithmetic" -> 1,
    "q10_returned_items" -> 1,
    "q14_promo_revenue" -> 2,
    "q16_supplier_variety" -> 2,
    "q18_large_volume" -> 2,
    "q3_shipping_priority" -> 1,
    "q13_customer_distribution" -> 3,
    "q15_top_supplier" -> 4,
    "q19_discounted_revenue" -> 1,
    "q22_no_order_customers" -> 4,
    "q6_revenue_delta" -> 1,
    "q4_order_priority" -> 2,
    "q5_local_supplier" -> 2,
    "q1_pricing_summary" -> 2,
    "reconcile_orders_items" -> 4,
    "retention_cohorts" -> 3,
    "rolling_7d_value" -> 3,
    // r11c: lang-count agg + its single-row class-count agg +
    // lang window + presentation sort + the window's rn filter
    // join staying sort-side; quota side is broadcast (PLANS.md)
    "sample_class_balance" -> 5,
    "sample_hash_docs" -> 1,
    "sample_stratified_docs" -> 2,
    "sample_token_budget" -> 2,
    "sample_weighted_pps" -> 2,
    "shard_token_balanced" -> 2,
    "stats_chi_square" -> 4,
    "tokenizer_bpe_pairs" -> 3,
    "sample_systematic" -> 2,
    "scan_parquet_project" -> 1,
    "scd2_event_state" -> 2,
    "session_conversion" -> 2,
    "sessionize_events" -> 2,
    "set_except" -> 2,
    "set_except_all" -> 2,
    "set_intersect" -> 2,
    "set_intersect_all" -> 2,
    "set_union_all" -> 1,
    "set_union_distinct" -> 2,
    "sim_lsh_bucketed" -> 0,
    "sim_search_topk" -> 0,
    "snapshot_diff_orders" -> 3,
    "sort_multikey" -> 1,
    "source_binary_files" -> 1,
    "source_csv_roundtrip" -> 1,
    "source_csv_quoted" -> 1,
    "source_json_props" -> 1,
    "source_json_roundtrip" -> 2,
    "source_orc_roundtrip" -> 2,
    "source_partitioned_prune" -> 2,
    "source_schema_merge" -> 2,
    "source_sorted_ranges" -> 2,
    "source_text_lines" -> 1,
    "split_train_holdout" -> 2,
    "stream_custom_sessions" -> 2,
    "stream_dedup_keyed" -> 2,
    "stream_interval_join" -> 2,
    "stream_rate_alert" -> 3,
    "stream_session_windows" -> 2,
    "stream_sliding_windows" -> 2,
    "stream_topk_windowed" -> 3,
    "stream_tumbling_counts" -> 2,
    "text_char_stats" -> 4,
    "text_fingerprint" -> 2,
    "text_lang_profile" -> 3,
    "text_ngram_novelty" -> 3,
    "text_langid" -> 7,
    "text_ngram_logprob" -> 4,
    "text_pii_scrub" -> 2,
    "text_quality" -> 1,
    "text_readability" -> 1,
    "text_repetition" -> 4,
    "text_tfidf_topterms" -> 4,
    "text_token_count" -> 1,
    "text_token_tf" -> 1,
    "timeseries_gapfill" -> 3,
    "topk_global" -> 0,
    "topk_per_group" -> 2,
    "ts_autocorr_daily" -> 3,
    "ts_ohlc_daily" -> 2,
    "udaf_weighted_avg" -> 2,
    "udf_slugify" -> 1,
    "udtf_bigrams" -> 2,
    "unpivot_melt" -> 1,
    "vocab_oov_rate" -> 3,
    "win_distribution" -> 2,
    "win_ewma_dyadic" -> 2,
    "win_fill_locf" -> 3,
    "win_interpolate_linear" -> 3,
    "win_first_last" -> 2,
    "win_lag_lead" -> 2,
    "win_max_drawdown" -> 2,
    "win_pct_change" -> 2,
    "win_range_numeric" -> 2,
    "win_rank_dense_row" -> 2,
    "win_ratio_to_report" -> 2,
    "win_rolling_median" -> 2,
    "win_running_distinct" -> 3,
    "win_running_sum" -> 2,
    "win_session_running" -> 2,
    "win_sliding_avg" -> 2,
    "win_streaks_daily" -> 3)

  test("every graded query is pinned") {
    val keys = SparkEntry.queries.keySet
    assert(golden.keySet == keys,
      s"golden map out of sync: missing=${(keys -- golden.keySet).toSeq.sorted} " +
        s"stale=${(golden.keySet -- keys).toSeq.sorted}")
  }

  test("no graded query plans more shuffle exchanges than its audited count") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // The audited counts are COLD-cache plans (the harness drivers
    // clearCache between queries); a suite that ran a persisting key
    // earlier in this shared session would otherwise leave an
    // InMemoryRelation that substitutes into the counted plan and
    // changes its exchange count (suite-order-dependent flakiness).
    spark.catalog.clearCache()
    try {
      val drifted = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val n = fn(spark, sf).queryExecution.executedPlan.collect {
          case _: ShuffleExchangeExec => 1
        }.sum
        if (n != golden(name)) Some(s"$name: $n shuffles (audited ${golden(name)})")
        else None
      }
      assert(drifted.isEmpty,
        "shuffle-count drift (run graft.tools.ShuffleAudit and update " +
          "deliberately if intended):\n  " + drifted.mkString("\n  "))
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
