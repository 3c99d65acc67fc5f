package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All implemented operators, one QueryDef each (SURVEY.md §2). */
  def allQueries: Seq[QueryDef] =
    operators.Relational.all ++
      operators.EventsOps.all ++
      operators.TextOps.all ++
      operators.DedupOps.all ++
      operators.SimilarityOps.all ++
      operators.MultimodalOps.all ++
      operators.PipelineOps.all

  /** Flagship: the SURVEY §7 minimum end-to-end slice. q01 computed by
    * Catalyst, served by our HTTP server as a chunked Arrow IPC stream,
    * read back through our `arrows` source. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val q01 = allQueries.head.fn(spark, sfDir)
    val server = new graft.server.ArrowHttpServer(spark)
    server.register("q01", q01)
    server.start()
    try {
      val served = spark.read.format("arrows")
        .option("url", s"${server.baseUrl}/q/q01").load()
      // materialize while the server is alive; result is small (agg)
      val rows = served.collect().toIndexedSeq
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), served.schema)
    } finally server.stop()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset used by Bench (representative, heaviest paths). */
  def benchQueries: Seq[String] = {
    val preferred = Seq(
      "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier_volume",
      "q07_window_topn_per_group", "q12_events_hourly", "q16_order_count_distribution",
      "q19_sessionization", "q21_asof_join", "q31_asof_native", "q38_interval_join",
      // d10 (label × LSH-cell blocking, corpus-derived cell count) is
      // the headline near-dup path; d06 (label-only blocking) is its
      // exactness reference — quadratic per block by construction
      // (measured 40× work on 10× data at sf1), so it stays in the
      // oracle gate but NOT in the timed set.
      "q39_retention_cohorts", "q40_latest_compaction", "q43_approx_quantiles",
      "q46_interval_native", "q47_session_native", "q48_price_deciles",
      "q50_basket_pairs", "q51_revenue_growth", "q52_bucketed_join",
      "q53_salted_join", "q54_scd2_history", "q55_sliding_velocity",
      "q56_returned_items", "q57_cheapest_supplier", "q58_market_share",
      "q59_priority_shipping", "q60_promo_revenue", "q61_large_orders",
      "q62_trade_volume", "q63_order_priority", "q64_customer_distribution",
      "q65_small_qty_revenue", "q66_part_value_share",
      "q67_disjunctive_revenue", "q68_idle_customers", "q69_top_supplier",
      "q70_product_profit", "q71_part_supplier_variety", "q72_partial_agg_merge",
      "q73_dominant_suppliers",
      // d04/d19/t03/t07/t12/t17: the cells the r11 unbenched sweep caught
      // (d04 at 106 s) and repaired — standing bench members so a
      // regression in any of them can't hide again (r11 verdict #1)
      "d03_minhash_lsh_pairs", "d04_ngram_jaccard", "d05_simhash",
      "d09_simhash_band_pairs", "d19_source_similarity",
      "d10_embedding_neardup_lsh", "d08_substring_dedup",
      "d11_decontaminate", "d13_containment_complete", "d15_incremental_dedup",
      "d16_semantic_dedup", "d17_line_dedup", "d21_contamination_report",
      "d23_prefix_dedup", "d24_soft_dedup_weights", "d25_threshold_sweep",
      "d26_dup_trend", "d27_cross_source_lines", "d28_cluster_keeper",
      "d29_normalized_dedup", "d30_sample_dedup_rate", "d31_embedding_coverage",
      "d32_quality_dup_profile", "d33_lsh_calibration", "d34_minhash_estimator_error",
      "d35_simhash_band_calibration",
      "s01_knn_bruteforce", "s02_ann_lsh", "s04_ivf_search", "s08_recall_eval",
      "s09_pq_search", "s11_ivfpq_search", "s13_cascade_rerank",
      "s14_embedding_health", "s16_binary_hamming", "s17_mips_lsh",
      "s18_knn_classify", "s19_kmeans_step", "s20_embedding_covariance",
      "s21_similarity_histogram", "s22_ivf_balance", "s23_knn_graph",
      "s24_ann_hubness", "s25_kmeans_churn", "s26_matryoshka_recall",
      "s27_centroid_drift", "s28_nprobe_recall", "s29_quant_distortion",
      "s30_cluster_quality", "s31_quantization_sheet", "s32_ivf_split_advisor",
      "t02_quality_score", "t03_language_id", "t07_repetition_ratio",
      "t09_word_rarity", "t11_dsir_weights", "t12_gopher_rules",
      "t14_doc_freq", "t16_bigram_lm", "t17_lexical_diversity",
      "t18_keyword_tfidf", "t19_gram_novelty", "t21_head_coverage",
      "t22_readability", "t23_zipf_curve", "t24_heavy_hitters",
      "t25_quality_bands", "t26_char_classes", "t27_dup_gram_profile",
      "t28_footer_boilerplate", "t29_unique_gram_mass", "t30_footer_strip_effect",
      "t31_tokenizer_fertility",
      "p01_curated_corpus", "p02_token_packing",
      "p04_domain_mixture", "p06_curation_funnel", "p07_doc_chunks",
      "p09_shuffle_shards", "p11_quality_curriculum", "p12_temporal_split",
      "p13_priority_sample", "p14_token_budget", "p15_pack_efficiency",
      "p16_shard_manifest", "p17_shard_skew", "p18_shard_mixture",
      "p19_resume_manifest", "p20_epoch_decorrelation", "p21_crossmodal_coverage",
      "p22_subshard_packing", "p23_dedup_aware_packing", "p24_post_dedup_mixture",
      "p25_shard_dedup_leakage", "p26_stratified_split",
      "t32_word_entropy", "s33_centroid_margin",
      "m11_pair_gate", "m12_audio_gate", "m13_video_length_gate",
      "m14_aspect_buckets", "m15_scene_cuts", "m16_channel_norm",
      "m17_corrupt_audit", "m18_image_band_neardup", "m19_audio_band_neardup",
      "m20_caption_asset_audit", "m21_orphan_assets", "m22_caption_image_swap",
      "m24_video_band_neardup",
      "m23_caption_transfer")
    val have = queries.keySet
    val picked = preferred.filter(have)
    if (picked.nonEmpty) picked else queries.keys.toSeq.sorted.take(6)
  }
}
