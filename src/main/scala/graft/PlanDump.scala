package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes `PLANS.md`: the formatted physical plan of each headline query —
  * reviewable evidence that pushdown/pruning/broadcast/partial-agg shapes
  * hold (the machine-checked versions live in PlanQualitySpec).
  *
  * Usage: sbt "runMain graft.PlanDump [sfDir] [outFile]"
  */
object PlanDump {
  private val Headline = Seq(
    "q01_pricing_summary", "q04_annual_metrics", "q05_window_lag",
    "q07_rank_within_year", "q35_jaccard_pairs", "q36_minhash_lsh",
    "q37_cosine_topk", "q40_ann_lsh", "q41_simhash", "q42_asof_join",
    "q44_sessionize", "q54_fct_indicators", "q55_rpt_annual_summary",
    "q59_forecast_ols", "q62_token_shards", "q63_multimodal", "q64_ann_ivf",
    "q68_stratified_sample", "q69_metric_rollup", "q71_image_decode",
    "q78_unigram_lm", "q83_bloom_decontaminate", "q84_chunk_windows",
    "q88_bm25_topk", "q89_cms_heavy_hitters", "q90_pagerank",
    "q91_snapshot_dedup", "q92_tfidf_keywords", "q93_histogram_quantiles",
    "q95_epoch_shuffle", "q96_temperature_mix", "q97_kmeans",
    "q98_semantic_dedup", "q100_dataset_card",
    "q38_embedding_neardup", "q104_media_features", "q105_metric_query",
    "q106_salted_skew_join", "q107_pii_redaction", "q108_containment_pairs",
    "q109_quality_retention", "q110_corpus_build", "q111_bpe_pair_counts",
    "q112_drift_psi", "q113_pmi_collocations", "q114_table_profile",
    "q115_normalize_text", "q117_random_projection", "q118_knn_graph",
    "q119_covariance", "q120_langid_eval", "q121_pca_projection",
    "q122_zipf_fit", "q123_triangle_count", "q127_image_neardup",
    "q128_exact_substr", "q129_quality_classifier", "q130_bpe_tokenize",
    "q131_classifier_eval", "q132_image_dup_clusters",
    "q133_incremental_substr", "q134_bpe_fit_apply",
    "q135_audio_neardup", "q136_profile_kmv", "q137_audio_dup_clusters",
    "q138_hard_negatives", "q139_ann_ivf_indexed", "q140_sequence_packing",
    "q141_ann_index_append", "q142_hybrid_rrf", "q143_best_copy_dedup",
    "q144_bpe_fit_delta", "q145_lsh_index_incremental",
    "q146_ann_index_rebuild", "q148_importance_resample",
    "q150_lang_mixing", "q152_minhash_accuracy",
    "q153_truncation_recall", "q155_source_dup_matrix",
    "q167_substr_remediate", "q169_chunk_dedup",
    "q170_neardup_decontam", "q172_chunk_dedup_incremental",
    "q175_kneser_ney_lm", "q177_product_quantize", "q178_pq_adc_topk",
    "q179_ivfpq_topk", "q181_windowed_psi", "q182_curation_waterfall",
    "q184_coreset_sample", "q185_pq_rerank",
    "q195_source_cap", "q197_ivf_list_drift",
    "q198_source_cap_incremental", "q199_planned_lsh_mining",
    "q200_boilerplate_scrub", "q201_ks_drift", "q203_repeat_spacing",
    "q204_boilerplate_incremental", "q205_scrub_then_dedup",
    "q206_winnow_overlap", "q207_dedup_weights", "q208_source_ks",
    "q210_bpe_fit_batched", "q211_char_entropy", "q213_snm_simhash",
    "q214_snm_recall", "q215_snm_incremental",
    "q216_multiprobe_lsh", "q217_multiprobe_recall", "q218_zorder_layout", "q221_multiprobe_plan",
    "q219_dup_cluster_spectrum", "q220_zorder_incremental", "q222_source_quantile_norm",
    "q67_dedup_clusters",
    // the rewritten canonical-attach family (round 13: groupBy+join-back,
    // window-free — the dumps are the reviewable half of the
    // PlanQualitySpec gate)
    "q31_fingerprint", "q34_dedup_exact",
    // round-13 third wave: CDC chunking, leakage-safe split, k-anonymity
    "q225_cdc_chunk_dedup", "q227_cdc_incremental",
    "q224_leakage_safe_split", "q228_k_anonymity_sweep",
    // round-13 fourth wave: budget/manifest planners, richness + FDR
    // statistics, entropy rate, shuffle-skew audit
    "q229_epoch_budget_alloc", "q230_shard_manifest", "q231_chao1_unseen",
    "q232_drift_fdr", "q233_entropy_rate", "q234_resume_manifest",
    "q235_shuffle_skew_plan", "q236_source_novelty", "q237_dedup_roi",
    "q238_decontam_report", "q239_reshard_churn",
    // round-14 wave: planner/audit operators, reshaping, privacy ladder,
    // retrieval evaluation, infra hashing
    "q240_cross_source_dup", "q241_epoch_yield", "q242_bloom_semijoin",
    "q243_doremi_weights", "q244_lsh_band_tuning",
    "q245_learnability_filter", "q246_davies_bouldin",
    "q247_threshold_sweep", "q248_ann_ndcg", "q249_l_diversity_sweep",
    "q250_rank_biased_overlap", "q251_packing_capacity_sweep",
    "q252_embedding_drift", "q253_pivot_matrix", "q254_unpivot_measures",
    "q255_index_staleness", "q256_waterfall_by_source",
    "q257_poisson_bootstrap", "q258_weighted_sample",
    "q259_t_closeness_sweep", "q260_consistent_hashing", "q261_cube",
    "q262_mmr_rerank")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out   = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` on $sfDir. Machine-checked plan\n")
    sb.append("assertions are in `PlanQualitySpec`; this file is the human-readable dump.\n")
    // The shipped q35/q36/q41 eagerly checkpoint their pair mining, which
    // collapses the plan to an ExistingRDD scan — useless as documentation
    // AND it runs the mining just to print. Dump the SAME shipped builders
    // with materialize=false (TextQueries.{jaccard,minhash,simhash}Query),
    // so the dumped shape can't drift from the shipped query.
    val planOnly: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "q35_jaccard_pairs" -> { (s, dir) =>
        graft.queries.TextQueries.jaccardQuery(s, dir, materialize = false) },
      "q36_minhash_lsh" -> { (s, dir) =>
        graft.queries.TextQueries.minhashQuery(s, dir, materialize = false) },
      "q41_simhash" -> { (s, dir) =>
        graft.queries.TextQueries.simhashQuery(s, dir, materialize = false) },
      "q127_image_neardup" -> { (s, dir) =>
        graft.queries.TextQueries.dhashPairsPlan(s, dir) },
      "q135_audio_neardup" -> { (s, dir) =>
        graft.queries.TextQueries.audioPairsPlan(s, dir) })
    Headline.foreach { name =>
      val df = planOnly.getOrElse(name, SparkEntry.queries(name))(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
