package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the headline queries into a reviewable
  * markdown artifact (docs/EXPLAINS.md) — the plan-shape evidence behind
  * the scale claims: pushdown reaching scans, broadcast joins, exchange
  * counts, codegen stage coverage.
  *
  * Usage: sbt 'runMain graft.Explain [sfDir] [outFile]'
  */
object Explain {
  private[graft] val headline = Seq(
    "r1_pricing_summary", "r2_filter_project", "r10_star_join",
    "r7_dedup_latest", "r14_window_analytics", "e7_dim_customers",
    "e9_fact_sales", "t2_minhash_signature", "t3_lsh_dup_pairs",
    "t5_simhash", "t6_dedup_clusters", "v1_cosine_topk", "v2_neardup_pairs",
    "v4_ivf_topk", "r28_asof_join", "s1_sessionize",
    "r32_upsert", "r36_cdc_merge_delete",
    "r35_approx_quantile", "t13_gopher_quality", "t16_chunking",
    "t17_simhash_neardup", "t18_sequence_packing", "t19_top_ngrams",
    "v5_label_centroids", "m1_multimodal_meta", "m4_frame_sample",
    "r37_bloom_prune_join", "t20_minhash_sql", "r38_range_join",
    "t22_simhash64_neardup", "r21_approx_distinct", "v6_ivf_neardup",
    "v7_cosine_topk_sql", "v8_semdedup", "t23_span_dedup",
    "r39_surrogate_key_scalable", "v9_sq8_topk", "t24_source_mix",
    "r40_window_frames", "t25_decontaminate", "v10_bitpack_topk",
    "r41_grouping_sets", "t26_rarity_quality", "t27_tfidf_keyword",
    "s3_attribution_join", "t28_cms_heavy_hitters", "t29_bigram_lm",
    "r43_regional_volume", "r46_shipping_priority", "r47_full_outer_recon",
    "t30_lm_doc_score", "t31_keyword_search", "v11_pq_topk",
    "r48_notin_nullaware", "m5_phash_neardup", "s4_stream_enrich",
    "r49_gap_fill", "t32_overlap_matrix", "r50_large_orders",
    "r51_window_percentiles", "v12_filtered_topk", "r52_funnel",
    "t33_cluster_profile", "r53_cohort_retention", "r54_incremental_agg",
    "r55_column_profile", "t34_mix_rebalance", "t35_quality_buckets",
    "m6_scene_cuts", "t36_textrank", "r56_ab_metrics", "r57_dod_growth",
    "t37_minhash_accuracy",
    "v13_knn_graph", "g1_knn_pagerank", "g2_triangle_count",
    "t38_train_split", "t39_fuzzy_join", "t40_bpe_pairs",
    "m7_shard_manifest", "h1_partitioned_prune",
    "r58_nation_trade", "d1_dq_audit", "t41_priority_sample",
    "d2_dq_quarantine", "h2_zonemap_skipping", "r59_markov_transitions",
    "t42_vocab_stats", "t43_ngram_novelty", "v14_knn_label",
    "v15_mips_topk", "r60_snapshot_diff", "t44_leakfree_split",
    "r61_order_count_distribution", "r62_copurchase_pairs",
    "t45_stratified_topk", "m8_modality_agreement", "s5_sessionize_native",
    "r63_shipping_delay", "r64_promo_share", "t46_verified_neardup",
    "s6_trending_events", "v16_radius_search", "d3_dq_drift",
    "r65_cumulative_users", "r66_exact_corr", "t47_vocab_overlap",
    "v17_centroid_separation", "t48_incremental_dedup_index",
    "v18_kmeans_convergence", "v19_pca_power", "t49_bpe_train",
    "h3_zorder_skipping", "r67_sole_blame_suppliers",
    "v20_matryoshka_agreement", "v21_hybrid_rrf",
    "t50_repetition_filters", "d4_dq_recommend", "r68_dominant_suppliers",
    "r69_idle_rich_customers", "r70_small_quantity_revenue",
    "r71_cheapest_supplier", "v22_pq_trained", "v23_incremental_ivf_index",
    "d5_dq_referential", "r72_top_revenue_supplier",
    "r73_disjunctive_revenue", "t51_cluster_representatives",
    "r74_market_share", "r75_nation_profit", "r76_top_return_customers",
    "r77_priority_exists", "r78_supplier_part_classes",
    "r79_big_spenders", "r80_forecast_revenue", "v24_ivfpq_topk",
    "t52_boilerplate_strip", "h4_dynamic_partition_prune",
    "g3_label_propagation", "h5_bucketed_join", "v25_ivfpq_rerank",
    "t53_bpe_encode", "h6_schema_evolution", "h7_merge_on_read",
    "h8_partition_spec_evolution", "h9_dynamic_partition_overwrite",
    "t54_trigram_langid", "v26_kmeanspar_init", "b1_binary_ingest",
    "d6_dq_volume_anomaly", "r82_pivot_daily", "r83_unpivot_daily",
    "g4_kcore", "r84_rolling_distinct_users", "r85_rank_family",
    "r86_json_roundtrip", "t55_domain_affinity", "r87_date_functions",
    "c2_zstd_roundtrip", "m9_blob_recordize", "v27_kmeanspar_reduce",
    "d7_dq_metrics_repository", "v28_sq4_topk", "h10_string_zonemap",
    "t56_quality_classifier", "v29_ivfpq_residual", "g5_cc_star_contraction",
    "h11_bloom_skipping", "v30_mmr_rerank", "h12_unified_table_read",
    "t57_dup_intervals", "r88_change_feed_read", "g6_weighted_sssp",
    "t58_pii_scrub", "t59_lm_continuation", "v31_ivfpq_adc_lut",
    "r89_cdf_incremental_agg", "t60_sequence_packing", "h13_sql_source_read",
    "h14_sql_mor_read", "r90_cdf_key_churn", "r91_cdf_topk_maintenance",
    "r92_cdf_topk_slack_maintenance", "r93_cdf_distinct_maintenance",
    "r94_cdf_squash", "r95_cdf_schema_evolution",
    "t61_cdf_dedup_index_maintenance", "r96_cdf_checkpoint_read",
    "r97_cdf_column_rename", "r98_mor_derived_feed",
    "h16_sql_time_travel",
    // h19's frame is a union of per-version time-travel reads driven by
    // the TVF's version list; h21's is the SQL changes view (the
    // checkpoint-anchored feed union). h20 is absent like h15/h17/h18:
    // its returned frame is a post-maintenance table read-back.
    "h19_sql_history", "h21_sql_changes")
  // r45_range_join_rule is deliberately absent: its gate query returns a
  // localCheckpoint (materialized while the rule's conf is armed), so its
  // explain is just the checkpoint scan — the rewrite's plan shape is
  // asserted in ExtensionsSpec instead. s7–s11 are absent for the same
  // structural reason: their frames are read back from a streaming SINK,
  // so the batch explain is a parquet scan — the streaming plan shape is
  // pinned by StreamingSpec and the incremental-batch-count require in
  // StreamExec. s12 (foreachBatch CDC merge), s21 (snapshot-table
  // read-back after the exactly-once replay) and p1/p2 (checkpointed
  // pipelines) likewise return table/checkpoint read-backs; v23 IS
  // listed because its returned frame is the real index-search plan
  // (the fit/commit side effects run at construction).

  /** Queries whose PHYSICAL plan depends on in-process cache state:
    * every consumer of the two memoized, `persist()`-ed PAIR frames
    * (t3's text LSH pairs: t6/t44/m8; v6's cell-blocked vector pairs:
    * v6/v8/m8) explains as either the full derivation lineage or a
    * collapsed in-memory scan depending on what an earlier consumer in
    * the same session already did — not a stable fingerprint. They stay
    * in EXPLAINS.md for human review (with that caveat) but are
    * excluded from the machine-checked fingerprint artifact; their
    * plan-shape guarantees are asserted semantically in
    * PlanSpec/ShuffleBudgetSpec instead. (`preparedEmbeddings` is also
    * persisted, but its consumers fingerprint stably — the frame is
    * built by the first vector query in EVERY session, so its plan
    * state never varies by ordering.)
    */
  private[graft] val cacheDependentPlans: Set[String] =
    Set("v6_ivf_neardup", "v8_semdedup", "t6_dedup_clusters",
      "t44_leakfree_split", "m8_modality_agreement",
      // consumes the persisted lshPairsFor frame like t6
      "t51_cluster_representatives")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "docs/EXPLAINS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      // same extension wiring as Verify/Bench — h13/h14 plan through the
      // graft SQL source and the MoR marker rewrite
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    val sb = new StringBuilder
    sb.append("# Physical plans (explain formatted)\n\n")
    sb.append(s"Generated against `$sfDir` by `graft.Explain`. The evidence for the\n")
    sb.append("scale design: `PushedFilters`/`ReadSchema` at the scans, `BroadcastHashJoin`\n")
    sb.append("for dimension joins, bounded `Exchange` counts, `WholeStageCodegen` spans.\n")
    val fps = scala.collection.mutable.ArrayBuffer.empty[(String, graft.plans.PlanFingerprint.Fp)]
    headline.foreach { name =>
      qs.get(name).foreach { fn =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        sb.append(s"\n## $name\n\n```\n$plan```\n")
        if (!cacheDependentPlans(name))
          fps += (name -> graft.plans.PlanFingerprint.ofQuery(spark,
            () => fn(spark, sfDir)))
      }
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), sb.toString)
    // the machine-checkable core of the same evidence: operator multiset
    // + exchange counts per query, gated by PlanSpec against silent
    // exchange growth (regenerate HERE to review a legitimate change)
    val fpOut = Paths.get(out).resolveSibling("PLAN_FINGERPRINTS.json")
    Files.writeString(fpOut, graft.plans.PlanFingerprint.toJson(fps.toSeq, sfDir))
    println(s"[explain] wrote $out (${headline.size} plans) + $fpOut")
    spark.stop()
  }
}
