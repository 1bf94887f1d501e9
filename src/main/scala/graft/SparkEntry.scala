package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Relational, TextOracles, TextQueries, VectorOracles, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the TESTDATA.md parquet tables, with an equivalent DuckDB oracle SQL
  * (same output column names — the driver's compare sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema join + exact-sum aggregation (SURVEY §2.3 J1/J2, §2.4). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator cluster from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> Relational.q01PricingSummary _,
    "q02_revenue_by_nation"  -> Relational.q02RevenueByNation _,
    "q03_anti_join"          -> Relational.q03CustomersWithoutOrders _,
    "q04_semi_join"          -> Relational.q04OrdersWithBigLineitem _,
    "q05_first_per_group"    -> Relational.q05LatestOrderPerCustomer _,
    "q06_dense_id"           -> Relational.q06DenseIdCustomers _,
    "q07_event_span"         -> Relational.q07EventSpanPerUser _,
    "q08_conditional_agg"    -> Relational.q08EventTypeStats _,
    "q09_safe_cast"          -> Relational.q09SafeCastProps _,
    "q10_case_mapping"       -> Relational.q10CaseMapping _,
    "q11_topn"               -> Relational.q11TopUsersByEvents _,
    "q12_percentiles"        -> Relational.q12QuantityPercentiles _,
    "q13_distinct"           -> Relational.q13DistinctOrderDims _,
    "q14_staged_mapping"     -> Relational.q14StagedMapping _,
    "q15_orphan_report"      -> Relational.q15OrphanReport _,
    "q16_numeric_split"      -> Relational.q16NumericSplit _,
    "q17_two_hop"            -> Relational.q17TwoHopTraversal _,
    "q18_date_arith"         -> Relational.q18DateArithmetic _,
    "q19_string_funcs"       -> Relational.q19StringFuncs _,
    "q42_pagination"         -> Relational.q42Pagination _,
    "q43_rollup"             -> Relational.q43Rollup _,
    "q44_distinct_counts"    -> Relational.q44DistinctCounts _,
    // training-data text pipeline (documents table)
    "q20_exact_dup_stats"    -> TextQueries.qExactDupStats _,
    "q21_exact_dedup"        -> TextQueries.qExactDedup _,
    "q22_token_counts"       -> TextQueries.qTokenCounts _,
    "q23_quality_score"      -> TextQueries.qQualityScore _,
    "q24_lang_id"            -> TextQueries.qLangId _,
    "q25_fingerprint"        -> TextQueries.qFingerprint _,
    "q26_minhash_sig"        -> TextQueries.qMinhashSig _,
    "q27_lsh_candidates"     -> TextQueries.qLshCandidates _,
    "q28_neardup_verified"   -> TextQueries.qNearDupVerified _,
    "q29_simhash"            -> TextQueries.qSimhash _,
    "q30_jaccard_window"     -> TextQueries.qNgramJaccardWindow _,
    "q45_repetition"         -> TextQueries.qRepetition _,
    "q56_simhash_pairs"      -> TextQueries.qSimhashPairs _,
    "q57_dup_clusters"       -> TextQueries.qDupClusters _,
    "q58_tfidf_terms"        -> TextQueries.qTfIdfTerms _,
    "q59_bloom_semi"         -> Relational.q59BloomPrunedSemi _,
    "q61_chunks"             -> TextQueries.qChunks _,
    "q62_grouping_sets"      -> Relational.q62GroupingSets _,
    "q63_salted_join"        -> Relational.q63SaltedJoin _,
    "q64_incremental_append" -> TextQueries.qIncrementalAppend _,
    "q66_pack_sequences"     -> TextQueries.qPackSequences _,
    "q67_debounce"           -> Relational.q67Debounce _,
    "q68_boilerplate"        -> TextQueries.qBoilerplatePassages _,
    "q69_heavy_hitters"      -> TextQueries.qHeavyHitters _,
    "q70_bigram_topk"        -> TextQueries.qBigramTopK _,
    "q71_postings"           -> TextQueries.qPostings _,
    "q72_normalize"          -> TextQueries.qNormalize _,
    "q73_redact"             -> TextQueries.qRedact _,
    "q74_histogram"          -> Relational.q74Histogram _,
    "q75_sliding_window"     -> ((s: SparkSession, d: String) =>
      graft.streaming.EventStreams.slidingRollup(graft.core.Tables.events(s, d))),
    "q76_trailing_window"    -> Relational.q76TrailingWindow _,
    "q77_full_outer"         -> Relational.q77FullOuter _,
    "q78_pivot"              -> Relational.q78Pivot _,
    "q79_unpivot"            -> Relational.q79Unpivot _,
    "q80_rank_funcs"         -> Relational.q80RankFuncs _,
    "q81_moments"            -> Relational.q81Moments _,
    "q82_string_agg"         -> Relational.q82StringAgg _,
    "q83_json"               -> Relational.q83Json _,
    "q84_cross"              -> Relational.q84Cross _,
    "q85_arg_extremes"       -> Relational.q85ArgExtremes _,
    "q86_gap_fill"           -> Relational.q86GapFill _,
    "q87_scd2"               -> Relational.q87Scd2 _,
    "q88_zero_fill"          -> Relational.q88ZeroFill _,
    "q89_union_distinct"     -> Relational.q89UnionDistinct _,
    "q90_outliers"           -> Relational.q90Outliers _,
    "q93_extract_all"        -> Relational.q93ExtractAll _,
    "q91_winsorize"          -> Relational.q91Winsorize _,
    "q92_split"              -> Relational.q92Split _,
    "q46_window_analytics"   -> Relational.q46WindowAnalytics _,
    "q47_set_ops"            -> Relational.q47SetOps _,
    "q48_asof_join"          -> Relational.q48AsofJoin _,
    "q49_cube"               -> Relational.q49Cube _,
    "q52_interval_merge"     -> Relational.q52IntervalMerge _,
    "q53_range_join"         -> Relational.q53RangeJoin _,
    "q54_stratified_sample"  -> TextQueries.qStratifiedSample _,
    "q94_weighted_sample"    -> TextQueries.qWeightedSample _,
    "q95_rebalance_mix"      -> TextQueries.qRebalanceMix _,
    "q96_decontaminate"      -> TextQueries.qDecontaminate _,
    "q97_ancestor_rollup"    -> Relational.q97AncestorRollup _,
    "q98_unigram_quality"    -> TextQueries.qUnigramQuality _,
    "q101_bigram_quality"    -> TextQueries.qBigramQuality _,
    "q102_pq_rerank"         -> VectorQueries.qPqRerank _,
    "q103_pack_manifest"     -> TextQueries.qPackManifest _,
    "q99_upsample_mix"       -> TextQueries.qUpsampleMix _,
    "q100_strip_markup"      -> TextQueries.qStripMarkup _,
    // streaming-shaped transforms, batch-parity forms (events table)
    "q40_hourly_rollup"      -> ((s: SparkSession, d: String) =>
      graft.streaming.EventStreams.hourlyRollup(graft.core.Tables.events(s, d))),
    "q41_sessionize"         -> ((s: SparkSession, d: String) =>
      graft.streaming.EventStreams.sessionizeBatch(graft.core.Tables.events(s, d))),
    // multimodal binary-column plumbing (documents as payload stand-in)
    "q50_media_features"     -> ((s: SparkSession, d: String) => {
      val media = graft.multimodal.Multimodal.mediaFromDocuments(
        graft.core.Tables.documents(s, d))
      val f = graft.multimodal.Multimodal.extractFeatures(media).toDF()
      f.select(col("media_id") +: col("kind") +: col("n_bytes") +:
        (0 until graft.multimodal.Multimodal.FeatureDims)
          .map(i => col("features")(i).as(s"f$i")): _*)
    }),
    "q51_frame_sample"       -> ((s: SparkSession, d: String) =>
      graft.multimodal.Multimodal.sampleFrames(
        graft.multimodal.Multimodal.mediaFromDocuments(
          graft.core.Tables.documents(s, d)), 100)
        .groupBy(col("kind"))
        .agg(countDistinct(col("media_id")).as("n_media"),
          count(lit(1)).as("n_frames"),
          max(col("frame_idx")).as("max_frame_idx"))),
    // similarity search (embeddings table)
    "q31_ann_bruteforce"     -> VectorQueries.qAnnBruteforce _,
    "q32_srp_buckets"        -> VectorQueries.qSrpBuckets _,
    "q33_embed_neardup"      -> VectorQueries.qEmbedNearDup _,
    "q34_label_centroids"    -> VectorQueries.qLabelCentroids _,
    "q55_ivf_full_probe"     -> VectorQueries.qIvfFullProbe _,
    "q60_kmeans_round"       -> VectorQueries.qKmeansRound _,
    "q65_pq_adc"             -> VectorQueries.qPqAdc _,
    "q104_semdedup"          -> VectorQueries.qSemDedup _,
    "q105_repeated_spans"    -> TextQueries.qRepeatedSpans _,
    "q106_dsir_weights"      -> TextQueries.qDsirWeights _,
    "q107_bm25"              -> TextQueries.qBm25 _,
    "q108_shuffle_shard"     -> TextQueries.qShuffleShard _,
    "q109_token_budget"      -> TextQueries.qTokenBudget _,
    "q110_nb_langid"         -> TextQueries.qNbLangId _,
    "q111_dup_source_matrix" -> TextQueries.qDupSourceMatrix _,
    "q112_pmi_bigrams"       -> TextQueries.qPmiBigrams _,
    "q113_int8_quant"        -> VectorQueries.qInt8Quant _,
    "q114_centroid_outliers" -> VectorQueries.qCentroidOutliers _,
    "q115_curriculum"        -> TextQueries.qCurriculum _,
    "q116_source_cap"        -> TextQueries.qSourceCap _,
    "q117_vocab_coverage"    -> TextQueries.qVocabCoverage _,
    "q118_lang_confusion"    -> TextQueries.qLangConfusion _,
    "q119_funnel"            -> Relational.q119Funnel _,
    "q120_retention"         -> Relational.q120Retention _,
    "q121_length_buckets"    -> TextQueries.qLengthBuckets _,
    "q122_cluster_reps"      -> TextQueries.qClusterReps _,
    "q123_winnow_fp"         -> TextQueries.qWinnowFp _,
    "q124_winnow_overlap"    -> TextQueries.qWinnowOverlap _,
    "q125_split_leakage"     -> TextQueries.qSplitLeakage _,
    "q126_robust_stats"      -> TextQueries.qRobustStats _,
    "q127_consistent_shard"  -> TextQueries.qConsistentShard _,
    "q128_kmv_distinct"      -> TextQueries.qKmvDistinct _,
    "q129_temperature_mix"   -> TextQueries.qTemperatureMix _,
    "q130_hard_negatives"    -> VectorQueries.qHardNegatives _,
    "q131_containment"       -> TextQueries.qContainment _,
    "q132_prefix_dedup"      -> TextQueries.qPrefixDedup _,
    "q133_quality_cdf"       -> TextQueries.qQualityCdf _,
    // spec-gated (BpeSpec): iterative trainer, no single-query SQL form
    "q134_bpe_merges"        -> TextQueries.qBpeMerges _,
    "q135_k_anonymity"       -> Relational.q135KAnonymity _,
    "q136_filter_rules"      -> TextQueries.qFilterRules _,
    // spec-gated (BpeSpec): encode depends on the trained merge list
    "q137_bpe_encode"        -> TextQueries.qBpeEncode _,
    "q138_snapshot_diff"     -> TextQueries.qSnapshotDiff _,
    "q139_diff_summary"      -> TextQueries.qDiffSummary _,
    "q140_coverage_gaps"     -> Relational.q140CoverageGaps _,
    "q141_dup_triangles"     -> TextQueries.qDupTriangles _,
    "q142_mips_topk"         -> VectorQueries.qMipsTopK _,
    "q143_phrase_search"     -> TextQueries.qPhraseSearch _,
    "q144_contamination_frac" -> TextQueries.qContaminationFrac _,
    "q145_negative_pairs"    -> TextQueries.qNegativePairs _,
    "q146_dist_drift"        -> TextQueries.qDistDrift _,
    "q147_incremental_rollup" -> Relational.q147IncrementalRollup _,
    "q148_grouped_split"     -> TextQueries.qGroupedSplit _,
    "q149_zorder_key"        -> Relational.q149ZorderKey _,
    "q150_fuzzy_names"       -> Relational.q150FuzzyNames _,
    "q151_skyline"           -> Relational.q151Skyline _,
    "q152_join_delta"        -> Relational.q152JoinDelta _,
    "q153_interpolate"       -> Relational.q153Interpolate _,
    "q154_bitmap_distinct"   -> Relational.q154BitmapDistinct _,
    "q155_equidepth_hist"    -> Relational.q155EquidepthHist _,
    "q156_decayed_sum"       -> Relational.q156DecayedSum _,
    // spec-gated (HllSketchSpec): DataSketches estimates have no DuckDB
    // twin — gated on error-vs-exact and the union merge law instead
    "q157_hll_rollup"        -> Relational.q157HllRollup _,
    // evaluation + graph + exact-similarity batch (round 5)
    "q158_auc"               -> TextQueries.qAuc _,
    "q159_calibration"       -> TextQueries.qCalibration _,
    "q160_transitions"       -> Relational.q160Transitions _,
    "q161_pagerank"          -> TextQueries.qPageRank _,
    "q162_setsim_join"       -> TextQueries.qSetSimJoin _,
    "q163_sorted_blocks"     -> TextQueries.qSortedBlocks _,
    "q164_skipgrams"         -> TextQueries.qSkipgrams _,
    "q165_welch_ab"          -> Relational.q165WelchAb _,
    "q166_kappa"             -> TextQueries.qKappa _,
    "q167_ndcg"              -> TextQueries.qNdcg _,
    "q168_er_scores"         -> TextQueries.qErScores _,
    "q169_rbo"               -> TextQueries.qRbo _,
    "q170_quantile_norm"     -> TextQueries.qQuantileNorm _,
    "q171_l_diversity"       -> Relational.q171LDiversity _,
    "q172_survival"          -> Relational.q172Survival _,
    "q173_top_paths"         -> Relational.q173TopPaths _,
    "q174_table_digest"      -> Relational.q174TableDigest _,
    "q175_cusum_peak"        -> Relational.q175CusumPeak _,
    "q176_benford"           -> Relational.q176Benford _,
    "q177_gini"              -> Relational.q177Gini _,
    "q178_basket_rules"      -> Relational.q178BasketRules _,
    // spec-gated (EvalSpec PAV-vs-quadratic-reference): sequential
    // pooling has no tractable SQL twin — rows-only check
    "q179_isotonic"          -> TextQueries.qIsotonic _,
    "q180_trend"             -> Relational.q180Trend _,
    "q181_wasserstein"       -> Relational.q181Wasserstein _,
    "q182_correlation"       -> Relational.q182Correlation _,
    "q183_autocorr"          -> Relational.q183Autocorr _,
    "q184_ewma"              -> Relational.q184Ewma _,
    "q185_twap"              -> Relational.q185Twap _,
    "q186_ols_trend"         -> Relational.q186Ols _,
    "q187_dow_profile"       -> Relational.q187DowProfile _,
    "q188_jaro_names"        -> Relational.q188JaroNames _,
    "q189_count_min"         -> Relational.q189CountMin _,
    "q190_rrf_fusion"        -> Relational.q190Rrf _,
    "q191_seq_pairs"         -> Relational.q191SeqPairs _,
    "q192_dow_anomalies"     -> Relational.q192DowAnomalies _,
    "q193_theil_sen"         -> Relational.q193TheilSen _,
    "q194_entropy"           -> Relational.q194Entropy _,
    "q195_seq_loglik"        -> Relational.q195SeqLogLik _,
    "q196_dp_counts"         -> Relational.q196DpCounts _,
    "q197_mmr_rerank"        -> VectorQueries.qMmrRerank _,
    "q198_zipf_fit"          -> TextQueries.qZipfFit _,
    "q199_neyman_alloc"      -> TextQueries.qNeymanAlloc _,
    "q200_clustering_coeff"  -> TextQueries.qClusteringCoeff _,
    "q201_auto_range_join"   -> Relational.q201AutoRangeJoin _,
    "q202_pr_curve"          -> TextQueries.qPrCurve _,
    "q203_weighted_median"   -> Relational.q203WeightedMedian _,
    "q204_topn_other"        -> TextQueries.qTopNWithOther _,
    "q205_mutual_info"       -> Relational.q205MutualInfo _,
    "q206_bootstrap_ci"      -> Relational.q206BootstrapCI _,
    "q207_audience_overlap"  -> Relational.q207AudienceOverlap _,
    "q208_attribution"       -> Relational.q208Attribution _,
    "q209_bounded_funnel"    -> Relational.q209BoundedFunnel _,
    "q210_auto_fuzzy_join"   -> Relational.q210AutoFuzzyJoin _,
    "q211_ks_test"           -> Relational.q211Ks _,
    "q212_chi_square"        -> Relational.q212ChiSquare _,
    "q213_spearman"          -> Relational.q213Spearman _,
    "q214_cramers_v"         -> Relational.q214CramersV _,
    "q215_mann_whitney"      -> Relational.q215MannWhitney _,
    "q216_bh_fdr"            -> Relational.q216BhFdr _,
    "q217_anova_f"           -> Relational.q217AnovaF _,
    "q218_log_rank"          -> Relational.q218LogRank _,
    "q219_matryoshka"        -> VectorQueries.qMatryoshka _,
    "q220_pca_project"       -> VectorQueries.qPcaProject _,
    "q221_two_proportion"    -> Relational.q221TwoProportion _,
    "q222_cmh"               -> Relational.q222Cmh _,
    "q223_jsd"               -> Relational.q223Jsd _,
    "q224_kendall_tau"       -> Relational.q224KendallTau _,
    "q225_chi_residuals"     -> Relational.q225ChiResiduals _,
    "q226_mde"               -> Relational.q226Mde _,
    "q227_sprt"              -> Relational.q227Sprt _,
    "q228_holt"              -> Relational.q228Holt _,
    "q229_mase"              -> Relational.q229Mase _,
    "q230_conformal"         -> Relational.q230Conformal _,
    "q231_profile"           -> Relational.q231Profile _,
    "q232_target_encoding"   -> Relational.q232TargetEncoding _,
    "q233_neg_sampling"      -> Relational.q233NegSampling _,
    "q234_qini"              -> Relational.q234Qini _,
    "q235_embed_cov"         -> VectorQueries.qEmbedCov _,
    "q236_novelty_curve"     -> TextQueries.qNoveltyCurve _,
    "q237_wilcoxon"          -> Relational.q237Wilcoxon _,
    "q238_cohens_d"          -> Relational.q238CohensD _,
    "q239_mh_odds"           -> Relational.q239MhOdds _,
    "q240_mcnemar"           -> Relational.q240McNemar _,
    "q241_ivm_aggstate"      -> Relational.q241IvmAggState _,
    "q242_golden_record"     -> TextQueries.qGoldenRecord _,
    "q243_zone_prune"        -> Relational.q243ZonePrune _,
    "q244_cliffs_delta"      -> Relational.q244CliffsDelta _,
    "q245_seasonal_decomp"   -> Relational.q245SeasonalDecomp _,
    "q246_mutual_neighbors"  -> VectorQueries.qMutualNeighbors _,
    "q247_attribution"       -> Relational.q247Attribution _,
    "q248_monthly_accrual"   -> Relational.q248MonthlyAccrual _,
    "q249_cohort_ltv"        -> Relational.q249CohortLtv _,
    "q250_eb_shrink"         -> Relational.q250EbShrink _,
    "q251_rolling_active"    -> Relational.q251RollingActive _,
    "q252_cms_join_size"     -> Relational.q252CmsJoinSize _,
    "q253_expectations"      -> Relational.q253Expectations _,
    "q255_matched_att"       -> Relational.q255MatchedAtt _,
    "q256_did"               -> Relational.q256Did _,
    "q257_cuped"             -> Relational.q257Cuped _,
    "q258_nelson_aalen"      -> Relational.q258NelsonAalen _,
    "q259_rfm"               -> Relational.q259Rfm _,
    "q260_abc"               -> Relational.q260Abc _,
    "q261_session_metrics"   -> Relational.q261SessionMetrics _,
    "q262_bounded_funnel"    -> Relational.q262ConstrainedFunnel _,
    "q263_banded_srp_neardup" -> VectorQueries.qBandedSrpNearDup _,
    "q264_paragraph_dedup"   -> TextQueries.qParagraphDedup _,
    "q265_paragraph_dedup_hashed" -> TextQueries.qParagraphDedupHashed _,
    "q266_quality_trainer"   -> TextQueries.qQualityTrainer _,
    "q267_quality_scores"    -> TextQueries.qQualityScores _,
    "q268_margin_mining"     -> VectorQueries.qMarginMining _,
    "q269_excise_spans"      -> TextQueries.qExciseSpans _,
  )

  /** Resource-bounded QUERY twins for the above-driver-scale (sf1)
    * board ONLY — [[graft.Verify]] merges these over [[queries]] when
    * `GRAFT_SCALE_OVERRIDES=1` (each key must also appear in
    * [[oracleSqlScaleOverrides]] so both engines compute the same folded
    * shape).
    *
    * q150: the pair list is the operator surface, but the sf1 part dim
    * repeats a constant-64-name pool, so the output is dup² id-pairs —
    * WRITER-bound, not compute-bound (the reason it was board-excluded
    * since r8). The twin folds the pairs to one row per left id
    * (count + int64-safe id/dist checksums): the full pair stream still
    * flows through the operator, only the verifiable projection is
    * bounded. */
  def queriesScaleOverrides
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    "q150_fuzzy_names" -> ((s: SparkSession, dir: String) =>
      Relational.q150FuzzyNames(s, dir)
        .groupBy(col("id_a"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("id_b")).as("sum_b"),
          max(col("id_b")).as("max_b"),
          sum(col("dist").cast("long")).as("sum_dist"))),
    // q56: SimHash pair emission is output-bound at fixed radius — true
    // near-pair mass grows ~quadratically with corpus density (r13
    // verdict #4). The 100× policy: the full pair stream still flows
    // through the pigeonhole-blocked operator, folded per lesser id
    // into count + int64-safe checksums before any materialization
    // (partial aggregation keeps the fold map-side-combinable).
    "q56_simhash_pairs" -> ((s: SparkSession, dir: String) =>
      TextQueries.qSimhashPairs(s, dir)
        .groupBy(col("doc_a"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("doc_b")).as("sum_b"),
          max(col("doc_b")).as("max_b"),
          sum(col("hamming").cast("long")).as("sum_hamming"))),
  )

  /** Resource-bounded oracle twins for the above-driver-scale (sf1)
    * board ONLY — [[graft.Verify]] merges these over [[oracleSql]] when
    * `GRAFT_SCALE_OVERRIDES=1`. Kept OUT of the default map on
    * purpose: an override either mirrors the engine's own algorithm
    * (weakening oracle independence) or folds the output shape, in
    * exchange for fitting the checker's resources at 10× the gate
    * scale — so the driver scales keep the naive, assumption-free,
    * full-shape forms.
    *
    * q201: floor-div 3-band equi-join twin of
    * [[graft.plans.ProximityJoinRewrite]] — a |ta−tb| ≤ W pair always
    * lands within one band of width W, each qualifying pair exactly
    * once (the two bands are fixed per pair and the exploded values
    * distinct); the naive theta join's quadratic intermediate blew
    * DuckDB's 54 GB RAM at sf1.
    *
    * q150: per-left-id fold of the pair list (see
    * [[queriesScaleOverrides]]) — the dup² pair stream is aggregated
    * in-engine on both sides instead of materialized. */
  def oracleSqlScaleOverrides: Map[String, String] = Map(
    // fully ANALYTIC fold — the oracle never materializes the dup² pair
    // stream the engine's fold aggregates over (~550M pairs at sf1:
    // 64-name dim → 312M same-name + 24 qualifying cross-name pairs ×
    // 3125² ids; the naive per-row form spilled DuckDB past this box's
    // disk). Levenshtein runs on the 64² DISTINCT name pairs; per-id
    // partner counts/sums come from per-name cumulative sums probed
    // with an ASOF join (partners of a in name j = ids(j) greater than
    // a = suffix of j's sorted id list): for each directed qualifying
    // (name(a), j) — diagonal included once — cnt = n_j − rank_≤a,
    // sum = tot_j − cumsum_≤a, max partner = max(j) (> a whenever
    // cnt > 0), dist constant per name pair. Independent of the
    // engine's join-then-aggregate shape.
    "q150_fuzzy_names" ->
      """WITH names AS (SELECT DISTINCT p_name AS nm FROM part),
        |kn AS (SELECT nm, string_split(nm, ' ')[-1] AS blk FROM names),
        |np AS (SELECT a.nm AS name_a, b.nm AS name_b,
        |         levenshtein(a.nm, b.nm) AS dist
        |       FROM kn a JOIN kn b ON a.blk = b.blk
        |       WHERE levenshtein(a.nm, b.nm) <= 2),
        |ids AS (SELECT p_partkey AS id, p_name AS nm FROM part),
        |cum AS (SELECT nm, id,
        |          ROW_NUMBER() OVER (PARTITION BY nm ORDER BY id) AS rn,
        |          SUM(id) OVER (PARTITION BY nm ORDER BY id) AS cs
        |        FROM ids),
        |tot AS (SELECT nm, COUNT(*) AS n, SUM(id) AS s, MAX(id) AS mx
        |        FROM ids GROUP BY nm),
        |probe AS (SELECT i.id AS id_a, np.name_b AS nm, np.dist
        |          FROM ids i JOIN np ON i.nm = np.name_a),
        |x AS (SELECT p.id_a, p.dist, t.n, t.s, t.mx,
        |        COALESCE(c.rn, 0) AS rn_le,
        |        COALESCE(c.cs, 0) AS cs_le
        |      FROM probe p
        |      JOIN tot t ON t.nm = p.nm
        |      ASOF LEFT JOIN cum c ON c.nm = p.nm AND c.id <= p.id_a)
        |SELECT id_a,
        |  CAST(SUM(n - rn_le) AS BIGINT) AS n_pairs,
        |  CAST(SUM(s - cs_le) AS BIGINT) AS sum_b,
        |  MAX(CASE WHEN n - rn_le > 0 THEN mx END) AS max_b,
        |  CAST(SUM((n - rn_le) * dist) AS BIGINT) AS sum_dist
        |FROM x GROUP BY id_a
        |HAVING SUM(n - rn_le) > 0""".stripMargin,
    "q201_auto_range_join" ->
      """WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS t,
        |    epoch_us(ts) // 300000000 AS band FROM events),
        |x AS (SELECT event_id, event_type, t,
        |    unnest([band - 1, band, band + 1]) AS band FROM e)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS n_pairs
        |FROM e a JOIN x b USING (band)
        |WHERE abs(a.t - b.t) <= 300000000 AND a.event_id < b.event_id
        |GROUP BY 1, 2""".stripMargin,
  ) ++ TextOracles.scaleOracles

  /** DuckDB-dialect oracle for each query (same column names/aliases). */
  def oracleSql: Map[String, String] =
    TextOracles.oracles ++ VectorOracles.oracles ++ Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey  = o_orderkey
        |JOIN customer ON o_custkey   = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q03_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')""".stripMargin,

    "q04_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""".stripMargin,

    "q05_first_per_group" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
        |  FROM orders) t WHERE rn = 1""".stripMargin,

    "q06_dense_id" ->
      """SELECT c_custkey, c_name,
        |       row_number() OVER (ORDER BY c_custkey) AS person_id
        |FROM customer""".stripMargin,

    "q07_event_span" ->
      """SELECT user_id, MIN(start_ts) AS period_start,
        |       MAX(COALESCE(end_ts, start_ts)) AS period_end
        |FROM (SELECT user_id, ts AS start_ts, ts AS end_ts FROM events
        |      WHERE event_type = 'purchase'
        |      UNION ALL
        |      SELECT user_id, ts, ts FROM events WHERE event_type = 'error') t
        |GROUP BY user_id""".stripMargin,

    "q08_conditional_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  COUNT(CASE WHEN value IS NULL THEN 1 END) AS n_null_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q09_safe_cast" ->
      """SELECT event_id,
        |  CASE WHEN regexp_matches(k_str, '^[-]?[0-9]+$')
        |       THEN CAST(k_str AS INTEGER) END AS k_int,
        |  regexp_matches(k_str, '^[0-9]+(\.[0-9]+)?$') AS k_is_numeric,
        |  CASE WHEN regexp_matches(date_str, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
        |       THEN CAST(substr(date_str, 1, 10) AS DATE) END AS event_date,
        |  CASE WHEN event_type IN ('signup','purchase','click')
        |       THEN event_type END AS event_type_enum
        |FROM (SELECT event_id, event_type,
        |             regexp_extract(props, '[0-9]+', 0) AS k_str,
        |             strftime(ts, '%Y-%m-%d') AS date_str FROM events) t""".stripMargin,

    "q10_case_mapping" ->
      """SELECT type_concept_id, COUNT(*) AS n FROM (
        |  SELECT CASE event_type WHEN 'purchase' THEN 9201
        |                         WHEN 'signup' THEN 9202
        |                         WHEN 'click' THEN 9203
        |                         ELSE 0 END AS type_concept_id
        |  FROM events) t GROUP BY type_concept_id""".stripMargin,

    "q11_topn" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id ASC LIMIT 10""".stripMargin,

    "q12_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(MIN(l_quantity), 4) AS q_min,
        |  ROUND(quantile_cont(l_quantity, 0.10), 4) AS q_p10,
        |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS q_p25,
        |  ROUND(quantile_cont(l_quantity, 0.50), 4) AS q_median,
        |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS q_p75,
        |  ROUND(quantile_cont(l_quantity, 0.90), 4) AS q_p90,
        |  ROUND(MAX(l_quantity), 4) AS q_max
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q13_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q14_staged_mapping" ->
      """SELECT event_type, mapped_concept_id, COUNT(*) AS n FROM (
        |  SELECT e.event_type,
        |         CAST(COALESCE(s1.concept_id, s2.concept_id, 0) AS BIGINT) AS mapped_concept_id
        |  FROM events e
        |  LEFT JOIN (VALUES ('purchase', 100), ('refund', 101)) s1(event_type, concept_id)
        |         ON e.event_type = s1.event_type
        |  LEFT JOIN (VALUES ('signup', 200), ('error', 201)) s2(event_type, concept_id)
        |         ON e.event_type = s2.event_type) t
        |GROUP BY event_type, mapped_concept_id""".stripMargin,

    "q15_orphan_report" ->
      """SELECT 'lineitem_orphans' AS check_name,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS orphan_count
        |UNION ALL
        |SELECT 'orders_orphans',
        |  (SELECT COUNT(*) FROM orders
        |   WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))""".stripMargin,

    "q16_numeric_split" ->
      """SELECT branch, COUNT(*) AS n FROM (
        |  SELECT CASE WHEN regexp_matches(payload, '^[-]?[0-9]+([.][0-9]+)?([eE][-+]?[0-9]+)?$')
        |              THEN 'measurement' ELSE 'observation' END AS branch
        |  FROM (SELECT CASE WHEN event_type = 'purchase' THEN CAST(value AS VARCHAR)
        |                    ELSE 'code-' || event_type END AS payload FROM events) p
        |  WHERE payload IS NOT NULL) t
        |GROUP BY branch""".stripMargin,

    "q18_date_arith" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
        |  CAST(o_orderdate AS DATE) + INTERVAL 12 MONTH - INTERVAL 1 DAY AS coverage_end,
        |  CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS order_day
        |FROM orders""".stripMargin,

    "q19_string_funcs" ->
      """SELECT p_partkey, p_brand || ': ' || p_type AS brand_type,
        |  substr(p_name, 1, 12) AS name_trunc,
        |  ROUND(p_retailprice * 1.1, 2) AS marked_up,
        |  contains(lower(p_type), 'brass') AS is_brass
        |FROM part""".stripMargin,

    "q42_pagination" ->
      """SELECT o_orderkey, o_custkey, row_pos FROM (
        |  SELECT o_orderkey, o_custkey,
        |    row_number() OVER (ORDER BY o_orderkey) AS row_pos
        |  FROM orders) t
        |WHERE row_pos > 100 AND row_pos <= 150""".stripMargin,

    "q43_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,

    "q44_distinct_counts" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        |FROM lineitem""".stripMargin,

    "q46_window_analytics" ->
      """SELECT event_id, user_id, ts, value,
        |  CAST(row_number() OVER w AS INTEGER) AS seq,
        |  CAST(rank() OVER (PARTITION BY user_id
        |       ORDER BY value DESC, event_id) AS INTEGER) AS value_rank,
        |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS micros_since_prev,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q47_set_ops" ->
      """SELECT 'purchase_and_error' AS set_op, COUNT(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'error') a
        |UNION ALL
        |SELECT 'purchase_not_error', COUNT(*) FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error') b""".stripMargin,

    // the two window stages MUST sort identically, so the ORDER BY
    // carries a unique (orderkey, linenumber) tiebreak: with duplicate
    // (s, e) rows and a non-total order, DuckDB's x and y stages may
    // place the tied rows differently, pairing one row's new-island
    // flag with the other's prefix position — at sf0.1 that assigned a
    // duplicate to the WRONG era and produced overlapping output eras.
    // (Spark computes both windows in ONE operator over one sort, so
    // any tie order is self-consistent and the island assignment of
    // exact duplicates is order-insensitive.)
    "q52_interval_merge" ->
      """WITH iv AS (SELECT l_suppkey, l_orderkey AS ok,
        |              l_linenumber AS ln, l_shipdate AS s,
        |              l_shipdate + INTERVAL 7 DAY AS e FROM lineitem),
        |x AS (SELECT l_suppkey, ok, ln, s, e,
        |        MAX(e) OVER (PARTITION BY l_suppkey ORDER BY s, e, ok, ln
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |      FROM iv),
        |y AS (SELECT l_suppkey, s, e,
        |        SUM(CASE WHEN pme IS NOT NULL AND pme >= s THEN 0 ELSE 1 END)
        |          OVER (PARTITION BY l_suppkey ORDER BY s, e, ok, ln
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |      FROM x)
        |SELECT l_suppkey, MIN(s) AS era_start, MAX(e) AS era_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_merged
        |FROM y GROUP BY l_suppkey, island""".stripMargin,

    "q53_range_join" ->
      """SELECT e.event_id AS err_id, e.user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_clicks
        |FROM events e JOIN events c
        |  ON c.user_id = e.user_id AND c.event_type = 'click'
        | AND c.ts >= e.ts - INTERVAL 7200 SECOND
        | AND c.ts <= e.ts + INTERVAL 7200 SECOND
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id""".stripMargin,

    "q67_debounce" ->
      """WITH w AS (SELECT event_id, user_id, event_type, ts,
        |  lag(ts) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events)
        |SELECT event_id, user_id, event_type, ts FROM w
        |WHERE prev_ts IS NULL
        |   OR (epoch_us(ts) // 1000000)
        |      - (epoch_us(prev_ts) // 1000000) > 60""".stripMargin,

    "q63_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q62_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())""".stripMargin,

    // ordered funnel: stage-wise first-event chain with strict ts
    // ordering between stages, per-stage converted counts + rates
    "q119_funnel" ->
      """WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
        |       JOIN t1 ON t1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
        |       JOIN t2 ON t2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
        |       GROUP BY 1),
        |n AS (SELECT (SELECT COUNT(*) FROM t1) AS n1,
        |        (SELECT COUNT(*) FROM t2) AS n2,
        |        (SELECT COUNT(*) FROM t3) AS n3)
        |SELECT 1 AS stage, 'signup' AS step, CAST(n1 AS BIGINT) AS n_users,
        |  ROUND(CAST(n1 AS DOUBLE) / n1, 6) AS conv_rate FROM n
        |UNION ALL SELECT 2, 'click', CAST(n2 AS BIGINT),
        |  ROUND(CAST(n2 AS DOUBLE) / n1, 6) FROM n
        |UNION ALL SELECT 3, 'purchase', CAST(n3 AS BIGINT),
        |  ROUND(CAST(n3 AS DOUBLE) / n1, 6) FROM n""".stripMargin,

    // retention cohorts: epoch-week cohort (sec div 604800, calendar-
    // free), distinct active users per (cohort, offset), rate vs base
    "q120_retention" ->
      """WITH ev AS (SELECT user_id,
        |              CAST(CAST(floor(epoch(ts)) AS BIGINT) // 604800
        |                AS INT) AS wk
        |            FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cw FROM ev GROUP BY 1),
        |act AS (SELECT DISTINCT ev.user_id, f.cw, ev.wk - f.cw AS off
        |        FROM ev JOIN f ON f.user_id = ev.user_id),
        |cells AS (SELECT cw, off, CAST(COUNT(*) AS BIGINT) AS n_users
        |          FROM act GROUP BY 1, 2),
        |b AS (SELECT cw, n_users AS base FROM cells WHERE off = 0)
        |SELECT c.cw AS cohort_week, c.off AS week_offset, c.n_users,
        |  ROUND(CAST(c.n_users AS DOUBLE) / b.base, 6) AS retention
        |FROM cells c JOIN b ON b.cw = c.cw""".stripMargin,

    "q59_bloom_semi" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,

    "q48_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |s AS (SELECT event_id AS signup_event_id, user_id, ts FROM events
        |      WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id, s.signup_event_id, s.ts AS asof_ts
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin,

    "q49_cube" ->
      """SELECT COALESCE(event_type, 'ALL') AS event_type,
        |  COALESCE(CAST(day AS VARCHAR), 'ALL') AS day,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM (SELECT event_type, dayofweek(ts) + 1 AS day, value
        |      FROM events) t -- DuckDB dayofweek is 0-based; Spark's is 1-based
        |GROUP BY CUBE (event_type, day)""".stripMargin,

    "q50_media_features" -> {
      val fcols = (0 until graft.multimodal.Multimodal.FeatureDims)
        .map(d => s"CAST(len(list_filter(bs, x -> x = $d)) AS BIGINT) AS f$d")
        .mkString(",\n  ")
      s"""SELECT doc_id AS media_id,
         |  (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  $fcols
         |FROM (SELECT doc_id, text,
         |        list_transform(list_filter(string_split(text, ''),
         |          c -> c <> ''), c -> ascii(c) % 8) AS bs
         |      FROM documents) t""".stripMargin
    },

    "q51_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  greatest(1, length(text) // 100) AS nf
        |FROM documents)
        |SELECT kind, COUNT(DISTINCT media_id) AS n_media,
        |  CAST(SUM(nf) AS BIGINT) AS n_frames,
        |  CAST(MAX(nf) - 1 AS BIGINT) AS max_frame_idx
        |FROM m GROUP BY kind""".stripMargin,

    "q40_hourly_rollup" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type""".stripMargin,

    // each event lies in exactly the 4 slide-aligned 1h windows starting
    // at bucket(ts) - {0,1,2,3}·15min — no containment filter needed
    "q75_sliding_window" ->
      """WITH w AS (SELECT event_type, value,
        |    time_bucket(INTERVAL 15 MINUTE, ts)
        |      - k.i * INTERVAL 15 MINUTE AS window_start
        |  FROM events, LATERAL (SELECT unnest([0,1,2,3]) AS i) k)
        |SELECT window_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY window_start, event_type""".stripMargin,

    "q76_trailing_window" ->
      """SELECT event_id, user_id, ts,
        |  COUNT(*) OVER w AS n_trailing,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS sum_trailing
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q77_full_outer" ->
      """WITH p AS (SELECT user_id, COUNT(*) AS n_purchases FROM events
        |           WHERE event_type = 'purchase' GROUP BY user_id),
        |e AS (SELECT user_id, COUNT(*) AS n_errors FROM events
        |      WHERE event_type = 'error' GROUP BY user_id)
        |SELECT COALESCE(p.user_id, e.user_id) AS user_id,
        |  COALESCE(p.n_purchases, 0) AS n_purchases,
        |  COALESCE(e.n_errors, 0) AS n_errors
        |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id""".stripMargin,

    "q78_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "q79_unpivot" ->
      """SELECT measure, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax FROM lineitem) t
        |GROUP BY measure""".stripMargin,

    "q80_rank_funcs" ->
      """SELECT event_id, user_id,
        |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
        |  ROUND(cume_dist() OVER w, 6) AS cume,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY value ASC, event_id ASC)""".stripMargin,

    "q81_moments" ->
      """WITH m AS (SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))
        |           * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS ss
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  ROUND(s / n, 6) AS mean,
        |  ROUND((ss - s * s / n) / n, 6) AS variance,
        |  ROUND(sqrt((ss - s * s / n) / n), 6) AS stddev
        |FROM m""".stripMargin,

    "q82_string_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
        |    AS statuses,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q89_union_distinct" ->
      """SELECT COUNT(*) AS n_union_users FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  UNION
        |  SELECT user_id FROM events WHERE event_type = 'error') u""".stripMargin,

    "q93_extract_all" ->
      """SELECT event_type, COUNT(*) AS n_matches,
        |  CAST(SUM(CAST(num AS BIGINT)) AS BIGINT) AS sum_nums,
        |  COUNT(DISTINCT num) AS n_distinct
        |FROM (SELECT event_type,
        |        unnest(regexp_extract_all(props, '[0-9]+')) AS num
        |      FROM events) t
        |GROUP BY event_type""".stripMargin,

    "q90_outliers" ->
      """WITH st AS (SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))
        |           * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS ss
        |  FROM events GROUP BY event_type),
        |m AS (SELECT event_type, s / n AS mean,
        |        sqrt((ss - s * s / n) / n) AS std FROM st)
        |SELECT e.event_type, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN abs(e.value - m.mean) / m.std > 3 THEN 1 END)
        |    AS n_outliers,
        |  ROUND(MAX(abs(e.value - m.mean) / m.std), 6) AS max_abs_z
        |FROM events e JOIN m ON e.event_type = m.event_type
        |GROUP BY e.event_type""".stripMargin,

    "q91_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
        |    quantile_cont(l_quantity, 0.05) AS p05,
        |    quantile_cont(l_quantity, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  COUNT(CASE WHEN l.l_quantity < b.p05 THEN 1 END) AS n_lo,
        |  COUNT(CASE WHEN l.l_quantity > b.p95 THEN 1 END) AS n_hi,
        |  CAST(SUM(CAST(least(greatest(l.l_quantity, b.p05), b.p95)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS winsorized_sum
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY l.l_returnflag""".stripMargin,

    "q86_gap_fill" ->
      """WITH obs AS (SELECT user_id, date_trunc('hour', ts) AS hour,
        |    max(struct_pack(ts := ts, event_id := event_id,
        |                    value := value)).value AS obs_value
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id, hour),
        |sp AS (SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM (SELECT user_id, min(date_trunc('hour', ts)) AS h0,
        |          max(date_trunc('hour', ts)) AS h1
        |        FROM events WHERE value IS NOT NULL
        |        GROUP BY user_id) b)
        |SELECT sp.user_id, sp.hour,
        |  last_value(obs.obs_value IGNORE NULLS) OVER (
        |    PARTITION BY sp.user_id ORDER BY sp.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  obs.obs_value IS NOT NULL AS is_observed
        |FROM sp LEFT JOIN obs
        |  ON sp.user_id = obs.user_id AND sp.hour = obs.hour""".stripMargin,

    // rn = 1 keeps a leading NULL-state run (IS DISTINCT FROM alone would
    // drop it: NULL is not distinct from the lag's NULL) — matches
    // TimeSeries.scd2History exactly
    "q87_scd2" ->
      """WITH x AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |c AS (SELECT user_id, event_type, ts, event_id FROM x
        |      WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to
        |FROM c""".stripMargin,

    "q88_zero_fill" ->
      """WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
        |t AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('day', ts) AS day, event_type,
        |        COUNT(*) AS cnt
        |      FROM events GROUP BY day, event_type)
        |SELECT d.day, t.event_type, COALESCE(c.cnt, 0) AS n
        |FROM d CROSS JOIN t
        |LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type""".stripMargin,

    "q84_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus
        |                        FROM orders) s""".stripMargin,

    "q85_arg_extremes" ->
      """SELECT event_type,
        |  min(struct_pack(value := value, event_id := event_id)).value
        |    AS lo_value,
        |  min(struct_pack(value := value, event_id := event_id)).event_id
        |    AS lo_event,
        |  max(struct_pack(value := value, event_id := event_id)).value
        |    AS hi_value,
        |  max(struct_pack(value := value, event_id := event_id)).event_id
        |    AS hi_event
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type""".stripMargin,

    "q83_json" ->
      """SELECT event_type,
        |  COUNT(k) AS n_with_k,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type""".stripMargin,

    "q41_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, ts,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |        FROM events) t),
        |s AS (SELECT user_id, ts,
        |        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |      FROM g)
        |SELECT user_id, session_idx, MIN(ts) AS session_start,
        |  MAX(ts) AS session_end, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, session_idx""".stripMargin,

    "q17_two_hop" ->
      """SELECT r_name, COUNT(DISTINCT n_nationkey) AS n_nations,
        |       COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q97_ancestor_rollup" ->
      """SELECT r_regionkey + 1000 AS ancestor_concept_id,
        |  r_name AS ancestor_concept_name,
        |  COUNT(*) AS record_count,
        |  COUNT(DISTINCT c_custkey) AS person_count
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    // incremental maintenance must equal the full recompute exactly —
    // the oracle IS the full recompute (q40's SQL)
    "q147_incremental_rollup" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY window_start, event_type""".stripMargin,

    // integer-microsecond gap arithmetic on both sides
    "q140_coverage_gaps" ->
      """WITH w AS (SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id
        |                  ORDER BY ts ASC, event_id ASC) AS prev
        |  FROM events)
        |SELECT user_id, prev AS gap_start, ts AS gap_end,
        |  (epoch_us(ts) - epoch_us(prev)) // 1000000 AS gap_s
        |FROM w
        |WHERE prev IS NOT NULL
        |  AND epoch_us(ts) - epoch_us(prev) > 21600000000""".stripMargin,

    // equivalence-class-size histogram over the QI projection; NULL
    // value-buckets form their own class in both engines
    "q135_k_anonymity" ->
      """WITH qi AS (SELECT event_type, date_trunc('day', ts) AS day,
        |              CAST(floor(value / 100) AS BIGINT) AS vbucket
        |            FROM events),
        |c AS (SELECT event_type, day, vbucket, COUNT(*) AS n
        |      FROM qi GROUP BY 1, 2, 3)
        |SELECT LEAST(n, 10) AS class_size, COUNT(*) AS n_classes,
        |  CAST(SUM(n) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1""".stripMargin,

    // Morton interleave, unrolled per bit — the oracle recomputes the
    // native zorder2 expression with plain shift/mask arithmetic
    "q149_zorder_key" -> {
      val z = (0 until 16).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH k AS (SELECT l_orderkey, l_partkey, l_linenumber,
         |  CAST(l_orderkey % 65536 AS BIGINT) AS x,
         |  CAST(l_partkey % 65536 AS BIGINT) AS y FROM lineitem)
         |SELECT l_orderkey, l_partkey, l_linenumber,
         |  CAST($z AS BIGINT) AS zval,
         |  CAST(($z) >> 24 AS BIGINT) AS zbucket
         |FROM k""".stripMargin
    },

    // blocking contract: pairs share the name's last token; the length
    // band adds no further restriction at maxDist<=band (lev<=2 bounds
    // the length gap), so the oracle needs only the token block
    "q150_fuzzy_names" ->
      """WITH k AS (SELECT p_partkey, p_name,
        |             string_split(p_name, ' ')[-1] AS blk FROM part)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM k a JOIN k b
        |  ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    // O(n²) dominance formulation — the semantic ground truth the
    // sort-scan skyline must reproduce exactly, ties included
    "q151_skyline" ->
      """SELECT p_partkey, p_type, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part s
        |  WHERE s.p_type = p.p_type
        |    AND s.p_retailprice <= p.p_retailprice
        |    AND s.p_size >= p.p_size
        |    AND (s.p_retailprice < p.p_retailprice
        |         OR s.p_size > p.p_size))""".stripMargin,

    // delta-join correctness is DEFINED as full-minus-base; the oracle
    // computes exactly that (decimal sums subtract exactly)
    "q152_join_delta" ->
      """WITH j AS (SELECT o_orderpriority, o_orderdate, l_shipdate,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS r
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |f AS (SELECT o_orderpriority, COUNT(*) AS n, SUM(r) AS rev
        |      FROM j GROUP BY 1),
        |b AS (SELECT o_orderpriority, COUNT(*) AS n, SUM(r) AS rev
        |      FROM j WHERE o_orderdate < TIMESTAMP '2000-01-01'
        |        AND l_shipdate < TIMESTAMP '2000-06-01' GROUP BY 1)
        |SELECT f.o_orderpriority, f.n - COALESCE(b.n, 0) AS n_new,
        |  CAST(f.rev - COALESCE(b.rev, 0) AS DOUBLE) AS rev_new
        |FROM f LEFT JOIN b USING (o_orderpriority)
        |WHERE f.n - COALESCE(b.n, 0) > 0""".stripMargin,

    // same spine + two IGNORE NULLS direction passes + identical
    // interpolation arithmetic (integer hour indices, double ratio)
    "q153_interpolate" ->
      """WITH obs AS (SELECT user_id, date_trunc('hour', ts) AS hour,
        |    max(struct_pack(ts := ts, event_id := event_id,
        |                    value := value)).value AS obs_value
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id, hour),
        |sp AS (SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM (SELECT user_id, min(date_trunc('hour', ts)) AS h0,
        |          max(date_trunc('hour', ts)) AS h1
        |        FROM events WHERE value IS NOT NULL
        |        GROUP BY user_id) b),
        |g AS (SELECT sp.user_id, sp.hour, obs.obs_value,
        |    epoch_us(sp.hour) // 3600000000 AS h,
        |    last_value(obs.obs_value IGNORE NULLS) OVER (
        |      PARTITION BY sp.user_id ORDER BY sp.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN obs.obs_value IS NOT NULL
        |        THEN epoch_us(sp.hour) // 3600000000 END IGNORE NULLS)
        |      OVER (PARTITION BY sp.user_id ORDER BY sp.hour
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    first_value(obs.obs_value IGNORE NULLS) OVER (
        |      PARTITION BY sp.user_id ORDER BY sp.hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN obs.obs_value IS NOT NULL
        |        THEN epoch_us(sp.hour) // 3600000000 END IGNORE NULLS)
        |      OVER (PARTITION BY sp.user_id ORDER BY sp.hour
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM sp LEFT JOIN obs
        |    ON sp.user_id = obs.user_id AND sp.hour = obs.hour)
        |SELECT user_id, hour,
        |  CASE WHEN obs_value IS NOT NULL THEN obs_value
        |    ELSE pv + (nv - pv) * (CAST(h - ph AS DOUBLE) /
        |                           CAST(nh - ph AS DOUBLE)) END AS value,
        |  obs_value IS NOT NULL AS is_observed
        |FROM g""".stripMargin,

    // semantic ground truth, not a bitmap re-implementation (DuckDB's
    // checked signed shift rejects 1 << 63): the bitmap path must equal
    // plain COUNT(DISTINCT) exactly, per bucket and overall
    "q154_bitmap_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id // 64) AS n_buckets,
        |  COUNT(DISTINCT user_id) AS distinct_keys
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY event_type""".stripMargin,

    // global row_number + the explicit NTILE assignment formula (the
    // Spark side derives the same rank without a global window)
    "q155_equidepth_hist" -> {
      val n = "(SELECT COUNT(*) FROM lineitem)"
      s"""WITH r AS (SELECT l_extendedprice,
         |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
         |                       l_linenumber) AS rk,
         |    $n AS n FROM lineitem),
         |t AS (SELECT l_extendedprice,
         |    CASE WHEN rk <= (n // 8 + 1) * (n % 8)
         |      THEN (rk + n // 8) // (n // 8 + 1)
         |      ELSE n % 8 + (rk - (n // 8 + 1) * (n % 8) + n // 8 - 1)
         |             // GREATEST(n // 8, 1) END AS bucket
         |  FROM r)
         |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
         |  MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
         |FROM t GROUP BY bucket""".stripMargin
    },

    // whole-week exponents: weight = 0.5^k is an exact binary double in
    // both engines; per-term decimal cast makes sums order-independent
    "q156_decayed_sum" ->
      """WITH m AS (SELECT MAX(ts) AS ref FROM events),
        |w AS (SELECT event_type, value,
        |    power(0.5, CAST((epoch_us(ref) - epoch_us(ts))
        |                    // 604800000000 AS INTEGER)) AS wt
        |  FROM events, m WHERE value IS NOT NULL)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(wt AS DECIMAL(28,10))) AS DOUBLE) AS decayed_n,
        |  CAST(SUM(CAST(value * wt AS DECIMAL(28,10))) AS DOUBLE)
        |    AS decayed_sum
        |FROM w GROUP BY event_type""".stripMargin,

    // deterministic relational HLL: registers, harmonic sum, and the
    // linear-counting branch replayed in the SAME integer/literal
    // arithmetic as Sketches.hllRelational — the rho CASE text and the
    // α·m²·2^50 numerator literal are the identical Scala constants
    "q157_hll_rollup" -> {
      import graft.ops.Sketches.{HllM, HllP, HllScale, HllNumerator,
        HllLog2Scale, hllRhoSql, hllMixSql, hllLnListSql}
      s"""WITH h0 AS (SELECT event_type,
         |    ${TextOracles.H("CAST(user_id AS VARCHAR)")} AS h0
         |  FROM events WHERE user_id IS NOT NULL),
         |h AS (SELECT event_type, ${hllMixSql("h0")} AS h FROM h0),
         |rr AS (SELECT event_type, h & ${HllM - 1} AS b,
         |    MAX(${hllRhoSql(s"(h >> $HllP)")}) AS m
         |  FROM h GROUP BY event_type, b),
         |regs AS (SELECT event_type, b, m FROM rr
         |  UNION ALL
         |  SELECT '__all__' AS event_type, b, MAX(m) AS m
         |  FROM rr GROUP BY b),
         |st AS (SELECT event_type,
         |    CAST($HllM - COUNT(*) AS BIGINT) AS n_zero,
         |    CAST(SUM(CAST(1 AS BIGINT) << ($HllLog2Scale - m))
         |         + ($HllM - COUNT(*)) * CAST($HllScale AS BIGINT)
         |      AS BIGINT) AS harm_scaled
         |  FROM regs GROUP BY event_type)
         |SELECT event_type, n_zero, harm_scaled,
         |  CASE WHEN $HllNumerator / CAST(harm_scaled AS DOUBLE)
         |            <= ${2.5 * HllM} AND n_zero > 0
         |       THEN ROUND(${HllM.toDouble} *
         |              ($hllLnListSql)[n_zero], 6)
         |       ELSE ROUND($HllNumerator / CAST(harm_scaled AS DOUBLE), 6)
         |  END AS est_distinct
         |FROM st""".stripMargin
    },

    "q160_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_state
        |  FROM events),
        |c AS (SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM s WHERE to_state IS NOT NULL
        |      GROUP BY from_state, to_state)
        |SELECT from_state, to_state, n,
        |  ROUND(CAST(n AS DOUBLE) /
        |        SUM(n) OVER (PARTITION BY from_state), 6) AS prob
        |FROM c""".stripMargin,

    // arm assignment = the q92 split-hash convention (seed 13); all
    // accumulation decimal-exact, float ops only in the final readout
    "q165_welch_ab" -> {
      val hv = graft.queries.TextOracles.H("CAST(user_id AS VARCHAR) || '#13'")
      s"""WITH e AS (SELECT event_type, value,
         |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS arm
         |  FROM events WHERE value IS NOT NULL),
         |a AS (SELECT event_type,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    COUNT(*) FILTER (arm = 1) AS n1,
         |    SUM(CAST(value AS DECIMAL(18,4))) FILTER (arm = 0) AS s0,
         |    SUM(CAST(value AS DECIMAL(18,4))) FILTER (arm = 1) AS s1,
         |    SUM(CAST(CAST(value AS DECIMAL(18,4))
         |             * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
         |      FILTER (arm = 0) AS q0,
         |    SUM(CAST(CAST(value AS DECIMAL(18,4))
         |             * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
         |      FILTER (arm = 1) AS q1
         |  FROM e GROUP BY event_type),
         |d AS (SELECT event_type, n0, n1,
         |    CAST(s0 AS DOUBLE) / n0 AS m0, CAST(s1 AS DOUBLE) / n1 AS m1,
         |    (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
         |       / n0) / (n0 - 1) / n0 AS se0,
         |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
         |       / n1) / (n1 - 1) / n1 AS se1
         |  FROM a)
         |SELECT event_type, n0, n1,
         |  ROUND(m0, 6) AS mean0, ROUND(m1, 6) AS mean1,
         |  ROUND(m0 - m1, 6) AS mean_diff,
         |  ROUND((m0 - m1) / sqrt(se0 + se1), 4) AS t_stat,
         |  ROUND(power(se0 + se1, 2) /
         |        (power(se0, 2) / (n0 - 1) + power(se1, 2) / (n1 - 1)), 2)
         |    AS welch_df
         |FROM d""".stripMargin
    },

    "q171_l_diversity" ->
      """WITH cells AS (SELECT date_trunc('day', ts) AS day,
        |    CAST(FLOOR(value / 100) AS BIGINT) AS vbucket,
        |    event_type, COUNT(*) AS c
        |  FROM events GROUP BY day, vbucket, event_type),
        |cls AS (SELECT day, vbucket,
        |    CAST(SUM(c) AS BIGINT) AS n,
        |    COUNT(*) AS distinct_l,
        |    SUM(CAST(c * ROUND(ln(CAST(c AS DOUBLE)), 9)
        |        AS DECIMAL(28,9))) AS clc
        |  FROM cells GROUP BY day, vbucket)
        |SELECT day, vbucket, n, distinct_l,
        |  ROUND(exp(ROUND(ln(CAST(n AS DOUBLE)), 9)
        |            - CAST(clc AS DOUBLE) / n), 6) AS entropy_l
        |FROM cls""".stripMargin,

    "q172_survival" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT MAX(us) AS frontier FROM ev),
        |spans AS (SELECT
        |    (MAX(us) - MIN(us)) // 86400000000 AS duration,
        |    CASE WHEN MAX(us) > (SELECT frontier FROM f)
        |                        - 86400000000 THEN 0
        |         ELSE 1 END AS event
        |  FROM ev GROUP BY user_id),
        |byt AS (SELECT duration AS t, CAST(SUM(event) AS BIGINT) AS d,
        |    COUNT(*) AS all_at_t
        |  FROM spans GROUP BY duration),
        |risk AS (SELECT t, d, SUM(all_at_t) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM byt),
        |terms AS (SELECT t, d, n_risk,
        |    CASE WHEN d = n_risk THEN NULL
        |         ELSE CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
        |              AS DECIMAL(18,9)) END AS lnterm,
        |    MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS zero,
        |    SUM(CASE WHEN d = n_risk THEN NULL
        |         ELSE CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
        |              AS DECIMAL(18,9)) END)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS lnsum
        |  FROM risk WHERE d > 0)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
        |  CASE WHEN zero = 1 THEN 0.0
        |       ELSE ROUND(exp(CAST(lnsum AS DOUBLE)), 6) END AS survival
        |FROM terms""".stripMargin,

    "q173_top_paths" ->
      """WITH p AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM events GROUP BY user_id, day)
        |SELECT path, COUNT(*) AS n FROM p GROUP BY path
        |ORDER BY n DESC, path ASC LIMIT 10""".stripMargin,

    "q174_table_digest" -> {
      val canon = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority").map(c =>
        s"COALESCE(CAST(length(CAST($c AS VARCHAR)) AS VARCHAR), 'n') " +
          s"|| '#' || COALESCE(CAST($c AS VARCHAR), '')")
        .mkString(" || ")
      s"""SELECT COUNT(*) AS n_rows,
         |  CAST(SUM(${graft.queries.TextOracles.H(canon)})
         |       % 1000000007 AS BIGINT) AS digest
         |FROM orders""".stripMargin
    },

    "q175_cusum_peak" ->
      """WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    COUNT(*) AS c
        |  FROM events GROUP BY event_type, day),
        |k AS (SELECT event_type, COUNT(*) AS k, SUM(c) AS tot
        |      FROM c GROUP BY event_type),
        |s AS (SELECT c.event_type, c.day, k.k, k.tot,
        |    SUM(c.c * k.k) OVER (PARTITION BY c.event_type ORDER BY c.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - k.tot * row_number() OVER (PARTITION BY c.event_type
        |                                 ORDER BY c.day) AS s
        |  FROM c JOIN k USING (event_type)),
        |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(s) DESC, day ASC) AS rn FROM s)
        |SELECT event_type, day AS peak_step,
        |  CAST(s AS BIGINT) AS cusum_scaled,
        |  ROUND(CAST(abs(s) AS DOUBLE) / CAST(k * tot AS DOUBLE), 6)
        |    AS peak_norm
        |FROM p WHERE rn = 1""".stripMargin,

    "q176_benford" -> {
      val ladder = (-4 to 9).map(e =>
        s"WHEN v >= 1e$e AND v < 1e${e + 1} " +
          s"THEN CAST(FLOOR(v / 1e$e) AS INTEGER)").mkString("\n      ")
      val expected = (1 to 9).map(d =>
        s"WHEN digit = $d THEN " +
          BigDecimal(math.log10(1.0 + 1.0 / d))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .mkString("\n      ")
      s"""WITH v AS (SELECT l_extendedprice AS v FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
         |d AS (SELECT CASE
         |      $ladder
         |      END AS digit FROM v),
         |g AS (SELECT digit, COUNT(*) AS n FROM d
         |      WHERE digit IS NOT NULL GROUP BY digit),
         |t AS (SELECT SUM(n) AS tot FROM g)
         |SELECT digit, n,
         |  ROUND(CAST(n AS DOUBLE) / (SELECT tot FROM t), 6) AS frac,
         |  CAST(CASE
         |      $expected
         |      END AS DOUBLE) AS benford_p
         |FROM g""".stripMargin
    },

    "q177_gini" ->
      """WITH s AS (SELECT source, COUNT(*) AS s FROM documents
        |           GROUP BY source),
        |r AS (SELECT s, source,
        |        row_number() OVER (ORDER BY s ASC, source ASC) AS i
        |      FROM s)
        |SELECT COUNT(*) AS k, CAST(SUM(s) AS BIGINT) AS total,
        |  ROUND(2.0 * CAST(SUM(i * s) AS DOUBLE)
        |          / CAST(COUNT(*) * SUM(s) AS DOUBLE)
        |        - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
        |FROM r""".stripMargin,

    "q178_basket_rules" ->
      """WITH b AS (SELECT DISTINCT user_id AS bk, event_type AS it
        |           FROM events),
        |nb AS (SELECT COUNT(DISTINCT bk) AS n FROM b),
        |m AS (SELECT it, COUNT(*) AS m FROM b GROUP BY it),
        |j AS (SELECT a.it AS antecedent, c.it AS consequent,
        |        COUNT(*) AS n_joint
        |      FROM b a JOIN b c ON a.bk = c.bk AND a.it <> c.it
        |      GROUP BY a.it, c.it)
        |SELECT j.antecedent, j.consequent,
        |  CAST(j.n_joint AS BIGINT) AS n_joint,
        |  ROUND(CAST(j.n_joint AS DOUBLE) / (SELECT n FROM nb), 6)
        |    AS support,
        |  ROUND(CAST(j.n_joint AS DOUBLE) / ma.m, 6) AS confidence,
        |  ROUND(CAST(j.n_joint AS DOUBLE) * (SELECT n FROM nb)
        |        / (ma.m * mc.m), 6) AS lift
        |FROM j
        |JOIN m ma ON ma.it = j.antecedent
        |JOIN m mc ON mc.it = j.consequent""".stripMargin,

    "q180_trend" ->
      """WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    COUNT(*) AS c
        |  FROM events GROUP BY event_type, day),
        |n AS (SELECT event_type, COUNT(*) AS n_steps FROM c
        |      GROUP BY event_type),
        |p AS (SELECT a.event_type,
        |        CAST(SUM(SIGN(b.c - a.c)) AS BIGINT) AS s
        |      FROM c a JOIN c b ON a.event_type = b.event_type
        |                       AND a.day < b.day
        |      GROUP BY a.event_type)
        |SELECT p.event_type, n.n_steps, p.s,
        |  CASE WHEN p.s > 0 THEN 'rising' WHEN p.s < 0 THEN 'falling'
        |       ELSE 'flat' END AS direction
        |FROM p JOIN n USING (event_type)""".stripMargin,

    "q181_wasserstein" ->
      """WITH m AS (SELECT n_chars AS v,
        |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS ib
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |t AS (SELECT CAST(SUM(ia) AS BIGINT) AS na,
        |        CAST(SUM(ib) AS BIGINT) AS nb FROM m),
        |bv AS (SELECT v, SUM(ia) AS ca, SUM(ib) AS cb FROM m GROUP BY v),
        |cw AS (SELECT v,
        |    SUM(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    SUM(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    lead(v) OVER (ORDER BY v) - v AS gap
        |  FROM bv),
        |terms AS (SELECT
        |    CAST(ROUND(abs(CAST(cuma AS DOUBLE) / (SELECT na FROM t)
        |               - CAST(cumb AS DOUBLE) / (SELECT nb FROM t)), 9)
        |      AS DECIMAL(18,9)) * CAST(gap AS DECIMAL(18,0)) AS term
        |  FROM cw WHERE gap IS NOT NULL)
        |SELECT (SELECT na FROM t) AS n_a, (SELECT nb FROM t) AS n_b,
        |  CAST(ROUND(SUM(term), 6) AS DOUBLE) AS emd
        |FROM terms""".stripMargin,

    "q182_correlation" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS bk, event_type AS sr,
        |    COUNT(*) AS c
        |  FROM events GROUP BY bk, sr),
        |dense AS (SELECT b.bk, s.sr, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT bk FROM c) b
        |  CROSS JOIN (SELECT DISTINCT sr FROM c) s
        |  LEFT JOIN c ON c.bk = b.bk AND c.sr = s.sr),
        |m AS (SELECT a.sr AS series_a, b.sr AS series_b,
        |    COUNT(*) AS n,
        |    SUM(a.c) AS sx, SUM(b.c) AS sy, SUM(a.c * b.c) AS sxy,
        |    SUM(a.c * a.c) AS sxx, SUM(b.c * b.c) AS syy
        |  FROM dense a JOIN dense b ON a.bk = b.bk AND a.sr < b.sr
        |  GROUP BY a.sr, b.sr)
        |SELECT series_a, series_b, CAST(n AS BIGINT) AS n,
        |  CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)) > 0
        |       THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |  END AS corr
        |FROM m""".stripMargin,

    "q183_autocorr" ->
      """WITH c AS (SELECT date_trunc('day', ts) AS bk, event_type AS sr,
        |    COUNT(*) AS c
        |  FROM events GROUP BY bk, sr),
        |dense AS (SELECT b.bk, s.sr, COALESCE(c.c, 0) AS x
        |  FROM (SELECT DISTINCT bk FROM c) b
        |  CROSS JOIN (SELECT DISTINCT sr FROM c) s
        |  LEFT JOIN c ON c.bk = b.bk AND c.sr = s.sr),
        |p AS (SELECT sr, x,
        |    lead(x) OVER (PARTITION BY sr ORDER BY bk) AS y
        |  FROM dense),
        |m AS (SELECT sr AS series, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM p WHERE y IS NOT NULL GROUP BY sr)
        |SELECT series, CAST(n AS BIGINT) AS n,
        |  CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)) > 0
        |       THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |  END AS autocorr
        |FROM m""".stripMargin,

    "q184_ewma" -> {
      // the weight literals are generated by the SAME function the Spark
      // plan consumes (TimeSeries.ewmaWeights) — decimal-exact parity by
      // construction, zero float pow on either engine
      val ws = graft.ops.TimeSeries.ewmaWeights(BigDecimal("0.25"), 16)
      val baseCase = ws.zipWithIndex
        .map { case ((b, _), i) => s"WHEN ${i + 1} THEN $b" }.mkString(" ")
      val lastCase = ws.zipWithIndex
        .map { case ((_, l), i) => s"WHEN ${i + 1} THEN $l" }.mkString(" ")
      s"""WITH r AS (SELECT user_id, value,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |                       ORDER BY ts DESC, event_id DESC) AS j,
         |    COUNT(*) OVER (PARTITION BY user_id) AS n
         |  FROM events),
         |t AS (SELECT user_id, n,
         |    CAST(value AS DECIMAL(14,4)) *
         |      (CASE WHEN j = LEAST(n, 16)
         |            THEN CASE j $lastCase END
         |            ELSE CASE j $baseCase END END) AS term
         |  FROM r WHERE j <= 16)
         |SELECT user_id, CAST(MIN(n) AS BIGINT) AS n_events,
         |  ROUND(CAST(SUM(term) AS DOUBLE), 6) AS ewma
         |FROM t GROUP BY user_id""".stripMargin
    },

    "q185_twap" ->
      """WITH r AS (SELECT user_id,
        |    CAST(value AS DECIMAL(14,4)) AS v,
        |    CAST(lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) - epoch_us(ts)
        |      AS DECIMAL(18,0)) AS dur
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_segments,
        |  CASE WHEN SUM(dur) > 0
        |       THEN ROUND(CAST(SUM(v * dur) AS DOUBLE)
        |                  / CAST(SUM(dur) AS DOUBLE), 6) END AS twap
        |FROM r WHERE dur IS NOT NULL GROUP BY user_id""".stripMargin,

    "q186_ols_trend" ->
      """WITH p AS (SELECT event_type,
        |    -- DECIMAL(19): DuckDB stores DECIMAL(18) in int64 and its
        |    -- multiply overflows BEFORE widening; width 19 forces the
        |    -- int128 path. Same VALUES as Spark's (18,0) x.
        |    CAST(epoch_us(ts) // 1000000 AS DECIMAL(19,0)) AS x,
        |    CAST(value AS DECIMAL(14,4)) AS y
        |  FROM events),
        |a AS (SELECT event_type, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM p GROUP BY event_type)
        |SELECT event_type, n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |       THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * 86400.0, 6) END AS slope,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |       THEN ROUND((CAST(sy AS DOUBLE)
        |           - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |             * CAST(sx AS DOUBLE))
        |         / CAST(n AS DOUBLE), 6) END AS intercept,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |        AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |       THEN ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS r2
        |FROM a""".stripMargin,

    "q187_dow_profile" ->
      """WITH g AS (SELECT event_type, dayofweek(ts) AS dow,
        |    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(14,4))) AS sv
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |    SUM(n) OVER (PARTITION BY event_type) AS tn,
        |    SUM(sv) OVER (PARTITION BY event_type) AS tv
        |  FROM g)
        |SELECT event_type, CAST(dow AS INTEGER) AS dow, n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS share,
        |  ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_value,
        |  ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(tv AS DOUBLE) / CAST(tn AS DOUBLE), 6)
        |    AS dev_from_mean
        |FROM w""".stripMargin,

    "q188_jaro_names" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  ROUND(jaro_winkler_similarity(a.name, b.name), 6) AS sim
        |FROM n a JOIN n b
        |  ON left(a.name, 1) = left(b.name, 1) AND a.name < b.name
        |WHERE ROUND(jaro_winkler_similarity(a.name, b.name), 6)
        |      >= 0.8""".stripMargin,

    "q189_count_min" -> {
      def h(e: String) = graft.queries.TextOracles.H(e)
      val bkt = h("CAST(user_id AS VARCHAR) || '#cms' || CAST(j AS VARCHAR)") +
        " * 2654435761 % 1000000007 % 64"
      s"""WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |sk AS (SELECT j, $bkt AS bucket, COUNT(*) AS cnt
         |  FROM events CROSS JOIN js GROUP BY 1, 2),
         |ex AS (SELECT user_id AS key, COUNT(*) AS n_exact
         |  FROM events GROUP BY 1),
         |pr AS (SELECT ex.key, ex.n_exact, MIN(sk.cnt) AS n_est
         |  FROM ex CROSS JOIN js
         |  JOIN sk ON sk.j = js.j
         |         AND sk.bucket =
         |  ${h("CAST(ex.key AS VARCHAR) || '#cms' || CAST(js.j AS VARCHAR)")}
         |    * 2654435761 % 1000000007 % 64
         |  GROUP BY 1, 2)
         |SELECT key, n_exact, n_est, n_est - n_exact AS overcount
         |FROM pr""".stripMargin
    },

    "q190_rrf_fusion" ->
      """WITH rev AS (SELECT o_custkey AS c_custkey,
        |    SUM(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(18,4))) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1),
        |ra AS (SELECT c_custkey, CAST(ROW_NUMBER() OVER
        |    (ORDER BY rev DESC, c_custkey ASC) AS INTEGER) AS rank_a
        |  FROM rev QUALIFY rank_a <= 100),
        |cnt AS (SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |rb AS (SELECT c_custkey, CAST(ROW_NUMBER() OVER
        |    (ORDER BY n_orders DESC, c_custkey ASC) AS INTEGER) AS rank_b
        |  FROM cnt QUALIFY rank_b <= 100)
        |SELECT COALESCE(ra.c_custkey, rb.c_custkey) AS c_custkey,
        |  rank_a, rank_b,
        |  ROUND(COALESCE(1.0 / (60 + rank_a), 0.0)
        |        + COALESCE(1.0 / (60 + rank_b), 0.0), 9) AS rrf
        |FROM ra FULL OUTER JOIN rb ON ra.c_custkey = rb.c_custkey""".stripMargin,

    "q191_seq_pairs" ->
      """WITH s AS (SELECT user_id, event_type,
        |    MIN(ts) AS first_ts, MAX(ts) AS last_ts
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS item_a, b.event_type AS item_b,
        |  COUNT(*) AS n_both,
        |  COUNT(CASE WHEN a.first_ts < b.last_ts THEN 1 END) AS n_ordered
        |FROM s a JOIN s b ON a.user_id = b.user_id
        |  AND a.event_type <> b.event_type
        |GROUP BY 1, 2""".stripMargin,

    "q192_dow_anomalies" ->
      """WITH r AS (SELECT event_type, dayofweek(ts) AS dow,
        |    event_id, value FROM events),
        |m AS (SELECT event_type, dow, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(14,4))) AS sv
        |  FROM r GROUP BY 1, 2),
        |j AS (SELECT r.event_type, r.dow, r.event_id, r.value,
        |    CAST(m.sv AS DOUBLE) / CAST(m.n AS DOUBLE) AS mean
        |  FROM r JOIN m ON r.event_type = m.event_type
        |              AND r.dow = m.dow),
        |k AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY abs(value - mean) DESC, event_id ASC) AS INTEGER)
        |    AS rank FROM j)
        |SELECT event_type, CAST(dow AS INTEGER) AS dow, event_id, value,
        |  ROUND(mean, 6) AS expected,
        |  ROUND(value - mean, 6) AS residual, rank
        |FROM k WHERE rank <= 5""".stripMargin,

    "q193_theil_sen" ->
      """WITH s AS (SELECT event_type,
        |    epoch_us(date_trunc('day', ts)) // 86400000000 AS x,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sl
        |  FROM s a JOIN s b ON a.event_type = b.event_type
        |                   AND a.x < b.x),
        |r AS (SELECT event_type, sl,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY sl ASC) AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS np
        |  FROM p)
        |SELECT event_type, np AS n_pairs, ROUND(sl, 6) AS ts_slope
        |FROM r WHERE rk = (np - 1) // 2 + 1""".stripMargin,

    "q194_entropy" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT user_id, SUM(c) AS n_events, COUNT(*) AS n_items,
        |    CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)),
        |      9) AS DECIMAL(18,9))) AS DOUBLE) AS clnc
        |  FROM c GROUP BY 1)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events, n_items,
        |  ROUND(ln(CAST(n_events AS DOUBLE))
        |        - clnc / CAST(n_events AS DOUBLE), 6) AS entropy,
        |  CASE WHEN n_items > 1
        |       THEN ROUND((ln(CAST(n_events AS DOUBLE))
        |                   - clnc / CAST(n_events AS DOUBLE))
        |         / ln(CAST(n_items AS DOUBLE)), 6) END AS norm_entropy
        |FROM g""".stripMargin,

    "q195_seq_loglik" ->
      """WITH p AS (SELECT user_id, event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_state
        |  FROM events),
        |t AS (SELECT from_state, to_state, COUNT(*) AS n
        |  FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT from_state, to_state,
        |    ROUND(CAST(n AS DOUBLE)
        |          / SUM(n) OVER (PARTITION BY from_state), 6) AS prob
        |  FROM t),
        |j AS (SELECT p.user_id, m.prob
        |  FROM p JOIN m ON p.from_state = m.from_state
        |             AND p.to_state = m.to_state),
        |g AS (SELECT user_id, COUNT(*) AS n_trans,
        |    COUNT(CASE WHEN prob <= 0 THEN 1 END) AS nzero,
        |    CAST(SUM(CAST(ROUND(ln(CASE WHEN prob > 0 THEN prob
        |                             ELSE 1 END), 9)
        |      AS DECIMAL(18,9))) AS DOUBLE) AS lls
        |  FROM j GROUP BY 1)
        |SELECT user_id, n_trans,
        |  CASE WHEN nzero = 0
        |    THEN ROUND(lls / CAST(n_trans AS DOUBLE), 6) END AS avg_ll,
        |  CASE WHEN nzero = 0
        |    THEN ROUND(exp(-(lls / CAST(n_trans AS DOUBLE))), 6)
        |  END AS perplexity
        |FROM g""".stripMargin,

    "q196_dp_counts" -> {
      def h(e: String) = graft.queries.TextOracles.H(e)
      s"""WITH g AS (SELECT event_type, COUNT(*) AS n_true
         |  FROM events GROUP BY 1),
         |u AS (SELECT event_type, n_true,
         |    (CAST(${h("event_type || '#99'")}
         |        * 2654435761 % 1000000007 % 1000000 AS DOUBLE)
         |     + 0.5) / 1000000.0 - 0.5 AS uu
         |  FROM g)
         |SELECT event_type, n_true,
         |  ROUND(CAST(n_true AS DOUBLE)
         |    + (-2.0) * sign(uu) * ln(1.0 - 2.0 * abs(uu)), 6) AS n_noisy
         |FROM u""".stripMargin
    },

    "q199_neyman_alloc" ->
      """WITH m AS (SELECT source AS stratum, COUNT(*) AS n_rows,
        |    SUM(CAST(n_chars AS DECIMAL(19,4))) AS s,
        |    SUM(CAST(n_chars AS DECIMAL(19,4))
        |        * CAST(n_chars AS DECIMAL(19,4))) AS s2
        |  FROM documents GROUP BY 1),
        |sd AS (SELECT stratum, n_rows,
        |    sqrt(CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
        |         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |      / CAST(n_rows AS DOUBLE) AS sdv
        |  FROM m),
        |w AS (SELECT stratum, n_rows, sdv,
        |    CAST(ROUND(CAST(n_rows AS DOUBLE) * sdv, 6)
        |      AS DECIMAL(24,6)) AS nsd
        |  FROM sd),
        |t AS (SELECT *, SUM(nsd) OVER () AS tot FROM w)
        |SELECT stratum, n_rows, ROUND(sdv, 6) AS sd,
        |  CAST(FLOOR(10000.0 * CAST(nsd AS DOUBLE)
        |             / CAST(tot AS DOUBLE)) AS BIGINT) AS alloc,
        |  ROUND(10000.0 * CAST(nsd AS DOUBLE) / CAST(tot AS DOUBLE)
        |        / CAST(n_rows AS DOUBLE), 6) AS frac
        |FROM t""".stripMargin,

    // the naive theta-join form on purpose: at the driver scales
    // (sf0.01/sf0.1) it fits DuckDB's RAM easily, and it shares NO
    // algorithmic assumption with the engine's ProximityJoinRewrite —
    // so a bug in the band rewrite itself is catchable here. The sf1
    // board (where the quadratic intermediate blew 54 GB) swaps in the
    // band-twin override from [[oracleSqlScaleOverrides]].
    "q201_auto_range_join" ->
      """SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
        | AND a.event_id < b.event_id
        |GROUP BY 1, 2""".stripMargin,

    "q203_weighted_median" ->
      """WITH r AS (SELECT event_type, value, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS w
        |  FROM events),
        |f AS (SELECT * FROM r WHERE w > 0),
        |c AS (SELECT event_type, value,
        |    SUM(w) OVER (PARTITION BY event_type
        |                 ORDER BY value, event_id) AS cw,
        |    SUM(w) OVER (PARTITION BY event_type) AS tw
        |  FROM f)
        |SELECT event_type, CAST(MAX(tw) AS BIGINT) AS total_w,
        |  MIN(value) AS w_median
        |FROM c WHERE cw * 2 >= tw GROUP BY 1""".stripMargin,

    "q205_mutual_info" ->
      """WITH j AS (SELECT event_type AS x, dayofweek(ts) AS y,
        |    COUNT(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT nxy,
        |    SUM(nxy) OVER (PARTITION BY x) AS nx,
        |    SUM(nxy) OVER (PARTITION BY y) AS ny,
        |    SUM(nxy) OVER () AS n
        |  FROM j),
        |t AS (SELECT CAST(ROUND(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
        |    * ln(CAST(n AS DOUBLE) * CAST(nxy AS DOUBLE)
        |         / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 9)
        |    AS DECIMAL(18,9)) AS term
        |  FROM w)
        |SELECT COUNT(*) AS n_cells,
        |  CAST(ROUND(SUM(term), 6) AS DOUBLE) AS mi
        |FROM t""".stripMargin,

    "q206_bootstrap_ci" -> {
      def h(e: String) = graft.queries.TextOracles.H(e)
      val cdf = graft.ops.Stats.BootstrapCdf
      s"""WITH r AS (SELECT event_type, event_id,
         |    CAST(value AS DECIMAL(14,4)) AS v FROM events),
         |e AS (SELECT r.*, b FROM r
         |      CROSS JOIN (SELECT unnest(range(0, 32)) AS b)),
         |h AS (SELECT event_type, b, v,
         |    ${h("CAST(event_id AS VARCHAR) || '#bs' || " +
               "CAST(b AS VARCHAR) || '#7'")}
         |      * 2654435761 % 1000000007 % 1000000 AS hv
         |  FROM e),
         |wt AS (SELECT event_type, b, v,
         |    CASE WHEN hv < ${cdf(0)} THEN 0
         |         WHEN hv < ${cdf(1)} THEN 1
         |         WHEN hv < ${cdf(2)} THEN 2
         |         WHEN hv < ${cdf(3)} THEN 3
         |         WHEN hv < ${cdf(4)} THEN 4
         |         ELSE 5 END AS w
         |  FROM h),
         |g AS (SELECT event_type, b, SUM(w * v) AS ws, SUM(w) AS wn
         |  FROM wt GROUP BY 1, 2),
         |m AS (SELECT event_type, b,
         |    CAST(ws AS DOUBLE) / CAST(wn AS DOUBLE) AS mean
         |  FROM g WHERE wn > 0),
         |rk AS (SELECT event_type, b, mean,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |                       ORDER BY mean ASC, b ASC) AS rk,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nb
         |  FROM m),
         |ci AS (SELECT event_type,
         |    CAST(MAX(nb) AS BIGINT) AS n_replicates,
         |    MAX(CASE WHEN rk = 2 THEN mean END) AS lo,
         |    MAX(CASE WHEN rk = nb - 1 THEN mean END) AS hi
         |  FROM rk GROUP BY 1),
         |f AS (SELECT event_type, COUNT(*) AS n_rows, SUM(v) AS s
         |  FROM r GROUP BY 1)
         |SELECT f.event_type, f.n_rows,
         |  ROUND(CAST(f.s AS DOUBLE) / CAST(f.n_rows AS DOUBLE), 6)
         |    AS mean,
         |  ci.n_replicates, ROUND(ci.lo, 6) AS ci_lo,
         |  ROUND(ci.hi, 6) AS ci_hi
         |FROM f JOIN ci ON ci.event_type = f.event_type""".stripMargin
    },

    "q207_audience_overlap" ->
      """WITH d AS (SELECT DISTINCT event_type AS i, user_id AS k
        |  FROM events),
        |s AS (SELECT i, COUNT(*) AS n FROM d GROUP BY 1),
        |c AS (SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_common
        |      FROM d a JOIN d b ON a.k = b.k AND a.i < b.i
        |      GROUP BY 1, 2)
        |SELECT c.item_a, c.item_b, sa.n AS n_a, sb.n AS n_b, c.n_common,
        |  ROUND(CAST(c.n_common AS DOUBLE)
        |    / CAST(sa.n + sb.n - c.n_common AS DOUBLE), 6) AS jaccard
        |FROM c JOIN s sa ON sa.i = c.item_a
        |       JOIN s sb ON sb.i = c.item_b""".stripMargin,

    "q208_attribution" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, event_type FROM events
        |      WHERE event_type IN ('click', 'view')),
        |a AS (SELECT p.event_id, p.value, p.ts, t.ts AS asof_ts,
        |        t.event_type AS touch
        |      FROM p ASOF LEFT JOIN t
        |        ON p.user_id = t.user_id AND p.ts >= t.ts),
        |c AS (SELECT CASE WHEN asof_ts IS NOT NULL
        |        AND epoch_us(ts) - epoch_us(asof_ts) <= 86400000000
        |        THEN touch ELSE 'direct' END AS channel, value
        |      FROM a),
        |g AS (SELECT channel, COUNT(*) AS n_purchases,
        |    ROUND(CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE), 4)
        |      AS revenue
        |  FROM c GROUP BY 1)
        |SELECT channel, n_purchases, revenue,
        |  ROUND(CAST(n_purchases AS DOUBLE)
        |    / CAST(SUM(n_purchases) OVER () AS DOUBLE), 6) AS share
        |FROM g""".stripMargin,

    "q209_bounded_funnel" ->
      """WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
        |       JOIN t1 ON t1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.ts1
        |         AND epoch_us(e.ts) - epoch_us(t1.ts1) <= 86400000000
        |       GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
        |       JOIN t2 ON t2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
        |         AND epoch_us(e.ts) - epoch_us(t2.ts2) <= 86400000000
        |       GROUP BY 1),
        |n AS (SELECT (SELECT COUNT(*) FROM t1) AS n1,
        |        (SELECT COUNT(*) FROM t2) AS n2,
        |        (SELECT COUNT(*) FROM t3) AS n3)
        |SELECT 1 AS stage, 'signup' AS step,
        |  CAST(n1 AS BIGINT) AS n_users,
        |  ROUND(CAST(n1 AS DOUBLE) / n1, 6) AS rate FROM n
        |UNION ALL SELECT 2, 'click_24h', CAST(n2 AS BIGINT),
        |  ROUND(CAST(n2 AS DOUBLE) / n1, 6) FROM n
        |UNION ALL SELECT 3, 'purchase_24h', CAST(n3 AS BIGINT),
        |  ROUND(CAST(n3 AS DOUBLE) / n1, 6) FROM n""".stripMargin,

    "q210_auto_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM n a JOIN n b
        |  ON levenshtein(a.p_name, b.p_name) <= 2
        | AND a.p_name < b.p_name""".stripMargin,

    "q211_ks_test" ->
      """WITH m AS (SELECT value AS v,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('click', 'error')),
        |t AS (SELECT CAST(SUM(ia) AS BIGINT) AS na,
        |        CAST(SUM(ib) AS BIGINT) AS nb FROM m),
        |bv AS (SELECT v, SUM(ia) AS ca, SUM(ib) AS cb FROM m GROUP BY v),
        |cw AS (SELECT v,
        |    SUM(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    SUM(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM bv)
        |SELECT (SELECT na FROM t) AS n_a, (SELECT nb FROM t) AS n_b,
        |  ROUND(MAX(abs(CAST(cuma AS DOUBLE) / (SELECT na FROM t)
        |                - CAST(cumb AS DOUBLE) / (SELECT nb FROM t))), 6)
        |    AS ks
        |FROM cw""".stripMargin,

    "q212_chi_square" ->
      """WITH j AS (SELECT event_type AS x, dayofweek(ts) AS y,
        |    COUNT(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
        |my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
        |n AS (SELECT SUM(nxy) AS n FROM j),
        |dense AS (SELECT mx.x, my.y, mx.nx, my.ny,
        |    COALESCE(j.nxy, 0) AS o,
        |    CAST(mx.nx AS DOUBLE) * CAST(my.ny AS DOUBLE)
        |      / CAST((SELECT n FROM n) AS DOUBLE) AS e
        |  FROM mx CROSS JOIN my
        |  LEFT JOIN j ON j.x = mx.x AND j.y = my.y),
        |t AS (SELECT CAST(ROUND((CAST(o AS DOUBLE) - e)
        |    * (CAST(o AS DOUBLE) - e) / e, 9) AS DECIMAL(18,9)) AS term,
        |    x, y
        |  FROM dense)
        |SELECT COUNT(*) AS n_cells,
        |  (COUNT(DISTINCT x) - 1) * (COUNT(DISTINCT y) - 1) AS dof,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 6) AS chi2
        |FROM t""".stripMargin,

    "q213_spearman" ->
      """WITH r AS (SELECT l_returnflag AS g,
        |    2 * rank() OVER (PARTITION BY l_returnflag
        |                     ORDER BY l_quantity)
        |      + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |      - 1 AS rx,
        |    2 * rank() OVER (PARTITION BY l_returnflag
        |                     ORDER BY l_extendedprice)
        |      + COUNT(*) OVER (PARTITION BY l_returnflag,
        |                       l_extendedprice) - 1 AS ry
        |  FROM lineitem),
        |m AS (SELECT g, COUNT(*) AS n,
        |    SUM(CAST(rx AS HUGEINT)) AS sx,
        |    SUM(CAST(ry AS HUGEINT)) AS sy,
        |    SUM(CAST(rx * ry AS HUGEINT)) AS sxy,
        |    SUM(CAST(rx * rx AS HUGEINT)) AS sxx,
        |    SUM(CAST(ry * ry AS HUGEINT)) AS syy
        |  FROM r GROUP BY g)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        |       THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |  END AS rho
        |FROM m""".stripMargin,

    "q214_cramers_v" ->
      """WITH j AS (SELECT event_type AS x, hour(ts) AS y,
        |    COUNT(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
        |my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
        |n AS (SELECT SUM(nxy) AS n FROM j),
        |dense AS (SELECT mx.x, my.y, COALESCE(j.nxy, 0) AS o,
        |    CAST(mx.nx AS DOUBLE) * CAST(my.ny AS DOUBLE)
        |      / CAST((SELECT n FROM n) AS DOUBLE) AS e
        |  FROM mx CROSS JOIN my
        |  LEFT JOIN j ON j.x = mx.x AND j.y = my.y),
        |t AS (SELECT CAST(ROUND((CAST(o AS DOUBLE) - e)
        |    * (CAST(o AS DOUBLE) - e) / e, 9) AS DECIMAL(18,9)) AS term,
        |    x, y
        |  FROM dense)
        |SELECT CAST((SELECT n FROM n) AS BIGINT) AS n,
        |  COUNT(DISTINCT x) AS r, COUNT(DISTINCT y) AS c,
        |  ROUND(CAST(SUM(term) AS DOUBLE), 6) AS chi2,
        |  ROUND(sqrt(CAST(SUM(term) AS DOUBLE)
        |    / CAST((SELECT n FROM n)
        |        * (LEAST(COUNT(DISTINCT x), COUNT(DISTINCT y)) - 1)
        |      AS DOUBLE)), 6) AS v
        |FROM t""".stripMargin,

    "q215_mann_whitney" -> mannWhitneyOracle(
      strata = "event_type", srcCols = "event_type"),

    "q216_bh_fdr" -> {
      val tests = mannWhitneyOracle(strata = "event_type, hr",
        srcCols = "event_type, CAST(hour(ts) AS INTEGER) AS hr")
      s"""WITH tests AS ($tests),
         |b AS (SELECT event_type, hr, p_two,
         |    CAST(row_number() OVER (ORDER BY p_two ASC, event_type ASC,
         |      hr ASC) AS INTEGER) AS i,
         |    COUNT(*) OVER () AS m
         |  FROM tests WHERE p_two IS NOT NULL),
         |f AS (SELECT event_type, hr, p_two, i, m,
         |    p_two * m / i AS q FROM b)
         |SELECT event_type, hr, p_two, i AS rank, m,
         |  ROUND(q, 6) AS q,
         |  ROUND(LEAST(1.0, MIN(q) OVER (ORDER BY p_two DESC,
         |    event_type DESC, hr DESC ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW)), 6) AS p_adj
         |FROM f""".stripMargin
    },

    "q217_anova_f" ->
      """WITH g AS (SELECT event_type, COUNT(*) AS ng,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sg,
        |    SUM(CAST(CAST(value AS DECIMAL(18,4))
        |             * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
        |      AS qg
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |t AS (SELECT COUNT(*) AS k, SUM(ng) AS n, SUM(sg) AS s,
        |    SUM(qg) AS q,
        |    SUM(CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng,
        |      9) AS DECIMAL(28,9))) AS b
        |  FROM g),
        |d AS (SELECT k, n,
        |    CAST(b AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
        |      AS ssb,
        |    CAST(q AS DOUBLE) - CAST(b AS DOUBLE) AS ssw
        |  FROM t)
        |SELECT k, CAST(n AS BIGINT) AS n,
        |  CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
        |  ROUND((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f,
        |  ROUND(ssb / (ssb + ssw), 6) AS eta_sq
        |FROM d""".stripMargin,

    "q218_log_rank" -> {
      val hu = graft.queries.TextOracles.H(
        "CAST(user_id AS VARCHAR) || '#13'")
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |fr AS (SELECT MAX(us) AS frontier FROM ev),
         |spans AS (SELECT user_id,
         |    (MAX(us) - MIN(us)) // 86400000000 AS duration,
         |    CASE WHEN MAX(us) > (SELECT frontier FROM fr)
         |                        - 86400000000 THEN 0 ELSE 1 END AS event
         |  FROM ev GROUP BY user_id),
         |sp AS (SELECT duration, event,
         |    CASE WHEN ($hu * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS arm
         |  FROM spans),
         |byt AS (SELECT duration AS t,
         |    CAST(SUM(CASE WHEN arm = 0 THEN event ELSE 0 END) AS BIGINT)
         |      AS d0,
         |    CAST(SUM(CASE WHEN arm = 1 THEN event ELSE 0 END) AS BIGINT)
         |      AS d1,
         |    COUNT(*) FILTER (arm = 0) AS c0,
         |    COUNT(*) FILTER (arm = 1) AS c1
         |  FROM sp GROUP BY duration),
         |risk AS (SELECT t, d0, d1,
         |    SUM(c0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS n0,
         |    SUM(c1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS n1
         |  FROM byt),
         |terms AS (SELECT d0,
         |    CAST(ROUND((CAST(d0 AS DOUBLE) + CAST(d1 AS DOUBLE))
         |      * CAST(n0 AS DOUBLE) / (CAST(n0 AS DOUBLE)
         |        + CAST(n1 AS DOUBLE)), 9) AS DECIMAL(28,9)) AS e0,
         |    CAST(CASE WHEN n0 + n1 > 1 THEN
         |      ROUND(((CAST(d0 AS DOUBLE) + CAST(d1 AS DOUBLE))
         |          * CAST(n0 AS DOUBLE) / (CAST(n0 AS DOUBLE)
         |            + CAST(n1 AS DOUBLE)))
         |        * (CAST(n1 AS DOUBLE) / (CAST(n0 AS DOUBLE)
         |            + CAST(n1 AS DOUBLE)))
         |        * (((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
         |            - (CAST(d0 AS DOUBLE) + CAST(d1 AS DOUBLE)))
         |           / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) - 1.0)),
         |        9) ELSE 0.0 END AS DECIMAL(28,9)) AS v
         |  FROM risk WHERE d0 + d1 > 0)
         |SELECT COUNT(*) AS n_times, CAST(SUM(d0) AS BIGINT) AS o0,
         |  CAST(ROUND(SUM(e0), 6) AS DOUBLE) AS e0,
         |  ROUND((CAST(SUM(d0) AS DOUBLE) - CAST(SUM(e0) AS DOUBLE))
         |    * (CAST(SUM(d0) AS DOUBLE) - CAST(SUM(e0) AS DOUBLE))
         |    / CAST(SUM(v) AS DOUBLE), 6) AS chi2
         |FROM terms""".stripMargin
    },

    "q221_two_proportion" ->
      s"""WITH src AS ($convCte),
         |m AS (SELECT event_type,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS s0,
         |    COUNT(*) FILTER (arm = 1) AS n1,
         |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS s1
         |  FROM src GROUP BY event_type),
         |d AS (SELECT event_type, n0, s0, n1, s1,
         |    CAST(s0 AS DOUBLE) / n0 AS p0v,
         |    CAST(s1 AS DOUBLE) / n1 AS p1v,
         |    (CAST(s0 AS DOUBLE) + CAST(s1 AS DOUBLE))
         |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) AS pp
         |  FROM m),
         |zc AS (SELECT event_type, n0, s0, n1, s1, p0v, p1v,
         |    CASE WHEN n0 > 0 AND n1 > 0 AND s0 + s1 > 0
         |              AND s0 + s1 < n0 + n1
         |         THEN (p0v - p1v) / sqrt((pp * (1.0 - pp))
         |                * (1.0 / n0 + 1.0 / n1)) END AS zr
         |  FROM d),
         |pc AS (SELECT event_type, n0, s0, n1, s1, p0v, p1v, zr,
         |    abs(zr) / sqrt(2.0) AS x,
         |    1.0 / (1.0 + 0.3275911 * (abs(zr) / sqrt(2.0))) AS t
         |  FROM zc)
         |SELECT event_type, n0, s0, n1, s1,
         |  ROUND(p0v, 6) AS p0, ROUND(p1v, 6) AS p1,
         |  ROUND(zr, 4) AS z,
         |  ROUND(((((1.061405429 * t - 1.453152027) * t + 1.421413741)
         |    * t - 0.284496736) * t + 0.254829592) * t * exp(-(x * x)),
         |    6) AS p_two
         |FROM pc""".stripMargin,

    "q222_cmh" ->
      s"""WITH src AS ($convCte),
         |st AS (SELECT CAST(hour(ts) AS INTEGER) AS hr,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS a,
         |    COUNT(*) FILTER (arm = 1) AS n1,
         |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS c
         |  FROM src GROUP BY hr),
         |tm AS (SELECT a,
         |    CAST(ROUND(CAST(n0 AS DOUBLE)
         |      * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
         |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)), 9)
         |      AS DECIMAL(28,9)) AS ee,
         |    CAST(CASE WHEN n0 + n1 > 1 THEN
         |      ROUND((((CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
         |          * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE)))
         |        * ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
         |           - (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))))
         |        / (((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
         |            * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
         |           * ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) - 1.0)),
         |        9) ELSE 0.0 END AS DECIMAL(28,9)) AS v
         |  FROM st)
         |SELECT COUNT(*) AS n_strata, CAST(SUM(a) AS BIGINT) AS o,
         |  CAST(ROUND(SUM(ee), 6) AS DOUBLE) AS e,
         |  ROUND((CAST(SUM(a) AS DOUBLE) - CAST(SUM(ee) AS DOUBLE))
         |    * (CAST(SUM(a) AS DOUBLE) - CAST(SUM(ee) AS DOUBLE))
         |    / CAST(SUM(v) AS DOUBLE), 6) AS chi2
         |FROM tm""".stripMargin,

    "q223_jsd" -> {
      val hv = graft.queries.TextOracles.H(
        "CAST(user_id AS VARCHAR) || '#13'")
      s"""WITH e AS (SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
         |    event_type,
         |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS arm
         |  FROM events),
         |cells AS (SELECT dow, event_type,
         |    COUNT(*) FILTER (arm = 0) AS c0,
         |    COUNT(*) FILTER (arm = 1) AS c1
         |  FROM e GROUP BY dow, event_type),
         |tot AS (SELECT *,
         |    SUM(c0) OVER (PARTITION BY dow) AS t0,
         |    SUM(c1) OVER (PARTITION BY dow) AS t1
         |  FROM cells),
         |terms AS (SELECT dow, t0, t1,
         |    CAST(CASE WHEN c0 > 0 THEN ROUND(0.5
         |        * (CAST(c0 AS DOUBLE) / t0)
         |        * ln((CAST(c0 AS DOUBLE) / t0)
         |             / ((CAST(c0 AS DOUBLE) / t0
         |                 + CAST(c1 AS DOUBLE) / t1) / 2.0)), 9)
         |      ELSE 0.0 END AS DECIMAL(28,9)) AS tp,
         |    CAST(CASE WHEN c1 > 0 THEN ROUND(0.5
         |        * (CAST(c1 AS DOUBLE) / t1)
         |        * ln((CAST(c1 AS DOUBLE) / t1)
         |             / ((CAST(c0 AS DOUBLE) / t0
         |                 + CAST(c1 AS DOUBLE) / t1) / 2.0)), 9)
         |      ELSE 0.0 END AS DECIMAL(28,9)) AS tq
         |  FROM tot),
         |agg AS (SELECT dow, COUNT(*) AS k,
         |    CAST(MAX(t0) AS BIGINT) AS n0, CAST(MAX(t1) AS BIGINT) AS n1,
         |    SUM(tp) AS sp, SUM(tq) AS sq
         |  FROM terms GROUP BY dow)
         |SELECT dow, k, n0, n1,
         |  CASE WHEN n0 > 0 AND n1 > 0
         |       THEN CAST(ROUND(sp + sq, 6) AS DOUBLE) END AS jsd,
         |  CASE WHEN n0 > 0 AND n1 > 0
         |       THEN ROUND(sqrt(CAST(ROUND(sp + sq, 6) AS DOUBLE)), 6)
         |    END AS js_dist
         |FROM agg""".stripMargin
    },

    "q224_kendall_tau" ->
      """WITH series AS (SELECT date_trunc('hour', ts) AS h,
        |    COUNT(*) FILTER (event_type = 'click') AS x,
        |    COUNT(*) FILTER (event_type = 'purchase') AS y
        |  FROM events GROUP BY h),
        |pr AS (SELECT
        |    sign(CAST(a.x AS DOUBLE) - CAST(b.x AS DOUBLE)) AS sx,
        |    sign(CAST(a.y AS DOUBLE) - CAST(b.y AS DOUBLE)) AS sy
        |  FROM series a JOIN series b ON a.h < b.h),
        |agg AS (SELECT COUNT(*) AS pairs,
        |    COUNT(*) FILTER (sx * sy > 0) AS concordant,
        |    COUNT(*) FILTER (sx * sy < 0) AS discordant,
        |    COUNT(*) FILTER (sx = 0) AS tx,
        |    COUNT(*) FILTER (sy = 0) AS ty
        |  FROM pr)
        |SELECT pairs, concordant, discordant,
        |  CASE WHEN pairs > tx AND pairs > ty THEN
        |    ROUND((CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
        |      / sqrt(CAST(pairs - tx AS DOUBLE)
        |             * CAST(pairs - ty AS DOUBLE)), 6) END AS tau_b
        |FROM agg""".stripMargin,

    "q225_chi_residuals" ->
      """WITH j AS (SELECT event_type AS x,
        |    CAST(dayofweek(ts) AS INTEGER) AS y, COUNT(*) AS nxy
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT x, SUM(nxy) AS nx FROM j GROUP BY 1),
        |my AS (SELECT y, SUM(nxy) AS ny FROM j GROUP BY 1),
        |nn AS (SELECT SUM(nxy) AS n FROM j),
        |dense AS (SELECT mx.x, my.y, COALESCE(j.nxy, 0) AS o, nx, ny
        |  FROM mx CROSS JOIN my
        |  LEFT JOIN j ON j.x = mx.x AND j.y = my.y)
        |SELECT x, y, CAST(o AS BIGINT) AS o,
        |  ROUND(CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
        |    / CAST((SELECT n FROM nn) AS DOUBLE), 6) AS e,
        |  ROUND((CAST(o AS DOUBLE)
        |      - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
        |        / CAST((SELECT n FROM nn) AS DOUBLE))
        |    / sqrt(((CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
        |        / CAST((SELECT n FROM nn) AS DOUBLE))
        |      * (1.0 - CAST(nx AS DOUBLE)
        |         / CAST((SELECT n FROM nn) AS DOUBLE)))
        |      * (1.0 - CAST(ny AS DOUBLE)
        |         / CAST((SELECT n FROM nn) AS DOUBLE))), 4) AS resid
        |FROM dense""".stripMargin,

    "q226_mde" ->
      s"""WITH src AS ($convCte),
         |m AS (SELECT event_type, COUNT(*) AS n,
         |    CAST(SUM(conv) AS BIGINT) AS s
         |  FROM src GROUP BY event_type),
         |d AS (SELECT event_type, n, s,
         |    CAST(s AS DOUBLE) / n AS p,
         |    CAST(n AS DOUBLE) / 2.0 AS half
         |  FROM m)
         |SELECT event_type, n, s, ROUND(p, 6) AS p_pool,
         |  CASE WHEN s > 0 AND s < n THEN
         |    ROUND(2.801585 * sqrt((p * (1.0 - p))
         |      * (1.0 / half + 1.0 / half)), 6) END AS mde
         |FROM d""".stripMargin,

    "q227_sprt" ->
      s"""WITH src AS ($convCte),
         |w AS (SELECT event_type, ts, event_id,
         |    SUM(CASE WHEN conv = 1 THEN CAST(0.405465108 AS DECIMAL(28,9))
         |        ELSE CAST(-0.133531393 AS DECIMAL(28,9)) END)
         |      OVER (PARTITION BY event_type ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS llr,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY ts, event_id) AS i
         |  FROM src),
         |c AS (SELECT event_type, i, ts, llr,
         |    row_number() OVER (PARTITION BY event_type ORDER BY i ASC)
         |      AS rn
         |  FROM w
         |  WHERE llr >= CAST(2.944438979 AS DECIMAL(28,9))
         |     OR llr <= CAST(-2.944438979 AS DECIMAL(28,9))),
         |t AS (SELECT event_type, COUNT(*) AS n FROM src
         |      GROUP BY event_type)
         |SELECT t.event_type, t.n, COALESCE(f.i, t.n) AS n_seen,
         |  f.ts AS decided_at,
         |  CASE WHEN f.llr >= CAST(2.944438979 AS DECIMAL(28,9))
         |       THEN 'h1'
         |       WHEN f.llr IS NOT NULL THEN 'h0' END AS decision
         |FROM t LEFT JOIN (SELECT * FROM c WHERE rn = 1) f
         |  USING (event_type)""".stripMargin,

    // Holt fold: ARRAY accumulator on purpose — DuckDB 1.0's
    // list_reduce writes STRUCT accumulator fields in place, so a
    // struct form lets the trend expression read the freshly-written
    // level (verified divergence); the array form evaluates both
    // elements before constructing. Same recursion as
    // TimeSeries.holtLinear, decimal-exact.
    "q228_holt" ->
      """WITH s AS (SELECT user_id,
        |    list(CAST(CAST(value AS DECIMAL(14,4)) AS DECIMAL(18,9))
        |         ORDER BY ts, event_id) AS xs
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |f AS (SELECT user_id, len(xs) AS n,
        |  CASE WHEN len(xs) = 1
        |    THEN [xs[1], CAST(0 AS DECIMAL(18,9))]
        |    ELSE list_reduce(
        |      list_prepend([CAST(xs[2] AS DECIMAL(18,9)),
        |                    CAST(xs[2] - xs[1] AS DECIMAL(18,9))],
        |        list_transform(xs[3:],
        |          x -> [x, CAST(NULL AS DECIMAL(18,9))])),
        |      (acc, x) -> [
        |        CAST(ROUND(CAST(0.3 AS DECIMAL(2,1)) * x[1]
        |          + CAST(0.7 AS DECIMAL(2,1)) * (acc[1] + acc[2]), 9)
        |          AS DECIMAL(18,9)),
        |        CAST(ROUND(CAST(0.1 AS DECIMAL(2,1))
        |            * (CAST(ROUND(CAST(0.3 AS DECIMAL(2,1)) * x[1]
        |                + CAST(0.7 AS DECIMAL(2,1)) * (acc[1] + acc[2]),
        |                9) AS DECIMAL(18,9)) - acc[1])
        |          + CAST(0.9 AS DECIMAL(2,1)) * acc[2], 9)
        |          AS DECIMAL(18,9))])
        |  END AS st
        |  FROM s)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(ROUND(st[1], 6) AS DOUBLE) AS level,
        |  CAST(ROUND(st[2], 6) AS DOUBLE) AS trend,
        |  CAST(ROUND(st[1] + 7 * st[2], 6) AS DOUBLE) AS forecast
        |FROM f""".stripMargin,

    "q229_mase" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      / COUNT(*) AS m
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY event_type, day),
        |lagged AS (SELECT event_type, m,
        |    lag(m, 1) OVER (PARTITION BY event_type ORDER BY day) AS p1,
        |    lag(m, 7) OVER (PARTITION BY event_type ORDER BY day) AS p7
        |  FROM daily),
        |e AS (SELECT event_type,
        |    CAST(ROUND(abs(m - p1), 9) AS DECIMAL(28,9)) AS e1,
        |    CAST(ROUND(abs(m - p7), 9) AS DECIMAL(28,9)) AS e7
        |  FROM lagged WHERE p1 IS NOT NULL AND p7 IS NOT NULL)
        |SELECT event_type, COUNT(*) AS n_days,
        |  ROUND(CAST(SUM(e1) AS DOUBLE) / COUNT(*), 6) AS mae_naive,
        |  ROUND(CAST(SUM(e7) AS DOUBLE) / COUNT(*), 6) AS mae_seasonal,
        |  ROUND((CAST(SUM(e7) AS DOUBLE) / COUNT(*))
        |        / (CAST(SUM(e1) AS DOUBLE) / COUNT(*)), 6) AS mase
        |FROM e GROUP BY event_type""".stripMargin,

    "q230_conformal" -> {
      val he = graft.queries.TextOracles.H(
        "CAST(event_id AS VARCHAR) || '#21'")
      s"""WITH src AS (SELECT event_type,
         |    CAST(hour(ts) AS INTEGER) AS bin, value AS v,
         |    CASE WHEN ($he * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS split
         |  FROM events WHERE value IS NOT NULL),
         |model AS (SELECT event_type, bin,
         |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
         |      AS mean
         |  FROM src WHERE split = 0 GROUP BY event_type, bin),
         |cal AS (SELECT s.event_type,
         |    abs(CAST(s.v AS DOUBLE) - m.mean) AS r
         |  FROM src s JOIN model m
         |    ON s.event_type = m.event_type AND s.bin = m.bin
         |  WHERE s.split = 1),
         |rk AS (SELECT event_type, r,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n,
         |    row_number() OVER (PARTITION BY event_type ORDER BY r)
         |      AS rk
         |  FROM cal)
         |SELECT event_type, CAST(n AS BIGINT) AS n_cal,
         |  CAST(LEAST(ceil((n + 1) * 0.9), n) AS BIGINT) AS k,
         |  ROUND(r, 6) AS width
         |FROM rk
         |WHERE rk = CAST(LEAST(ceil((n + 1) * 0.9), n) AS BIGINT)"""
        .stripMargin
    },

    "q231_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority").map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_value,
         |  CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"),

    "q232_target_encoding" -> {
      val hk = graft.queries.TextOracles.H(
        "CAST(o_orderkey AS VARCHAR) || '#31'")
      s"""WITH src AS (SELECT o_orderpriority,
         |    ($hk * 2654435761 % 1000000007) % 1000000 % 5 AS fold,
         |    CAST(o_totalprice AS DECIMAL(18,4)) AS t
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |bf AS (SELECT o_orderpriority, fold, COUNT(*) AS nf,
         |    SUM(t) AS sf
         |  FROM src GROUP BY o_orderpriority, fold),
         |bc AS (SELECT o_orderpriority, CAST(SUM(nf) AS BIGINT) AS nc,
         |    SUM(sf) AS sc
         |  FROM bf GROUP BY o_orderpriority),
         |p AS (SELECT CAST(SUM(t) AS DOUBLE) / COUNT(*) AS prior
         |      FROM src)
         |SELECT bf.o_orderpriority, CAST(fold AS BIGINT) AS fold,
         |  CAST(nc - nf AS BIGINT) AS n_oof,
         |  ROUND((CAST(sc AS DOUBLE) - CAST(sf AS DOUBLE)
         |      + 20.0 * (SELECT prior FROM p))
         |    / (CAST(nc AS DOUBLE) - CAST(nf AS DOUBLE) + 20.0), 6)
         |    AS encoded
         |FROM bf JOIN bc USING (o_orderpriority)""".stripMargin
    },

    "q233_neg_sampling" ->
      """WITH c AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem
        |           GROUP BY l_partkey),
        |w AS (SELECT l_partkey, n,
        |    CAST(ROUND(sqrt(CAST(n AS DOUBLE) * sqrt(CAST(n AS DOUBLE))),
        |      9) AS DECIMAL(28,9)) AS wt
        |  FROM c),
        |s AS (SELECT l_partkey, n, wt,
        |    SUM(wt) OVER (ORDER BY n DESC, l_partkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(wt) OVER () AS tot
        |  FROM w)
        |SELECT l_partkey, n,
        |  ROUND(CAST(wt AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS prob,
        |  ROUND(CAST(cum - wt AS DOUBLE) / CAST(tot AS DOUBLE), 9)
        |    AS lo,
        |  ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS hi
        |FROM s""".stripMargin,

    "q234_qini" ->
      s"""WITH src AS ($convCte),
         |b AS (SELECT event_type, arm, conv,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY value DESC, event_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nr
         |  FROM src),
         |per AS (SELECT event_type,
         |    CAST((rn - 1) * 10 // nr AS INTEGER) AS decile,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS s0,
         |    COUNT(*) FILTER (arm = 1) AS n1,
         |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS s1
         |  FROM b GROUP BY event_type, decile),
         |c AS (SELECT *,
         |    SUM(n0) OVER (PARTITION BY event_type ORDER BY decile)
         |      AS cn0,
         |    SUM(s0) OVER (PARTITION BY event_type ORDER BY decile)
         |      AS cs0,
         |    SUM(n1) OVER (PARTITION BY event_type ORDER BY decile)
         |      AS cn1,
         |    SUM(s1) OVER (PARTITION BY event_type ORDER BY decile)
         |      AS cs1
         |  FROM per)
         |SELECT event_type, decile, n0, n1,
         |  CASE WHEN n0 > 0 AND n1 > 0 THEN
         |    ROUND(CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1, 6)
         |      + 0.0
         |  END AS uplift,
         |  CASE WHEN cn1 > 0 THEN
         |    ROUND(CAST(cs0 AS DOUBLE)
         |      - CAST(cs1 AS DOUBLE) * (CAST(cn0 AS DOUBLE) / cn1), 6)
         |      + 0.0
         |  END AS qini
         |FROM c""".stripMargin,

    "q237_wilcoxon" ->
      """WITH halves AS (SELECT event_type, user_id,
        |    SUM(CAST(value AS DECIMAL(18,4)))
        |      FILTER (dayofmonth(ts) <= 15) AS s1,
        |    COUNT(*) FILTER (dayofmonth(ts) <= 15) AS c1,
        |    SUM(CAST(value AS DECIMAL(18,4)))
        |      FILTER (dayofmonth(ts) > 15) AS s2,
        |    COUNT(*) FILTER (dayofmonth(ts) > 15) AS c2
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY event_type, user_id),
        |pairs AS (SELECT event_type,
        |    CAST(s1 AS DOUBLE) / c1 AS m1,
        |    CAST(s2 AS DOUBLE) / c2 AS m2
        |  FROM halves WHERE c1 > 0 AND c2 > 0),
        |diffs AS (SELECT event_type, m2 - m1 AS dd,
        |    abs(m2 - m1) AS ad
        |  FROM pairs WHERE m2 - m1 <> 0),
        |r AS (SELECT event_type, dd,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY ad)
        |      + COUNT(*) OVER (PARTITION BY event_type, ad) - 1 AS r2,
        |    COUNT(*) OVER (PARTITION BY event_type, ad) AS tc
        |  FROM diffs),
        |m AS (SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(CASE WHEN dd > 0 THEN r2 ELSE 0 END AS HUGEINT))
        |      AS wpd,
        |    SUM(CAST(tc * tc - 1 AS HUGEINT)) AS ties
        |  FROM r GROUP BY event_type),
        |s AS (SELECT event_type, n,
        |    CAST(wpd AS DOUBLE) / 2.0 AS wp,
        |    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0 AS mu,
        |    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |      * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
        |      - CAST(ties AS DOUBLE) / 48.0 AS vr
        |  FROM m),
        |z AS (SELECT event_type, n, wp,
        |    CASE WHEN vr > 0 THEN (wp - mu) / sqrt(vr) END AS zr
        |  FROM s),
        |p AS (SELECT event_type, n, wp, zr,
        |    abs(zr) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(zr) / sqrt(2.0))) AS t
        |  FROM z)
        |SELECT event_type, n, wp AS w_plus, ROUND(zr, 4) AS z,
        |  ROUND(((((1.061405429 * t - 1.453152027) * t + 1.421413741)
        |    * t - 0.284496736) * t + 0.254829592) * t * exp(-(x * x)),
        |    6) AS p_two
        |FROM p""".stripMargin,

    "q238_cohens_d" -> {
      val hv = graft.queries.TextOracles.H(
        "CAST(user_id AS VARCHAR) || '#13'")
      s"""WITH e AS (SELECT event_type, value,
         |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS arm
         |  FROM events WHERE value IS NOT NULL),
         |a AS (SELECT event_type,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    SUM(CAST(value AS DECIMAL(18,4))) FILTER (arm = 0) AS s0,
         |    SUM(CAST(CAST(value AS DECIMAL(18,4))
         |             * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
         |      FILTER (arm = 0) AS q0,
         |    COUNT(*) FILTER (arm = 1) AS n1,
         |    SUM(CAST(value AS DECIMAL(18,4))) FILTER (arm = 1) AS s1,
         |    SUM(CAST(CAST(value AS DECIMAL(18,4))
         |             * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
         |      FILTER (arm = 1) AS q1
         |  FROM e GROUP BY event_type),
         |d AS (SELECT event_type, n0, n1,
         |    sqrt(((CAST(q0 AS DOUBLE)
         |        - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0)
         |      + (CAST(q1 AS DOUBLE)
         |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1))
         |      / (n0 + n1 - 2)) AS sp,
         |    CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1 AS md
         |  FROM a)
         |SELECT event_type, n0, n1,
         |  CASE WHEN n0 > 1 AND n1 > 1
         |       THEN ROUND(md / sp, 4) END AS cohen_d,
         |  CASE WHEN n0 > 1 AND n1 > 1
         |       THEN ROUND(md / sp * (1.0 - 3.0 / (4.0 * (n0 + n1)
         |         - 9.0)), 4) END AS hedges_g
         |FROM d""".stripMargin
    },

    "q239_mh_odds" ->
      s"""WITH src AS ($convCte),
         |st AS (SELECT CAST(hour(ts) AS INTEGER) AS hr,
         |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS a,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS c,
         |    COUNT(*) FILTER (arm = 1) AS n1
         |  FROM src GROUP BY hr),
         |tm AS (SELECT
         |    CAST(ROUND(CAST(a AS DOUBLE) * CAST(n1 - c AS DOUBLE)
         |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)), 9)
         |      AS DECIMAL(28,9)) AS num,
         |    CAST(ROUND(CAST(n0 - a AS DOUBLE) * CAST(c AS DOUBLE)
         |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)), 9)
         |      AS DECIMAL(28,9)) AS den
         |  FROM st)
         |SELECT COUNT(*) AS n_strata,
         |  CAST(ROUND(SUM(num), 6) AS DOUBLE) AS num,
         |  CAST(ROUND(SUM(den), 6) AS DOUBLE) AS den,
         |  CASE WHEN SUM(den) > 0 THEN
         |    ROUND(CAST(SUM(num) AS DOUBLE) / CAST(SUM(den) AS DOUBLE),
         |      4) END AS or_mh
         |FROM tm""".stripMargin,

    "q240_mcnemar" ->
      """WITH e AS (SELECT event_type, user_id, ts,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS conv
        |  FROM events WHERE value IS NOT NULL),
        |pr AS (SELECT event_type, user_id,
        |    MAX(CASE WHEN dayofmonth(ts) <= 15 THEN conv END) AS bf,
        |    MAX(CASE WHEN dayofmonth(ts) > 15 THEN conv END) AS af
        |  FROM e GROUP BY event_type, user_id),
        |q AS (SELECT event_type, bf, af FROM pr
        |  WHERE bf IS NOT NULL AND af IS NOT NULL),
        |m AS (SELECT event_type, COUNT(*) AS n_pairs,
        |    COUNT(*) FILTER (bf = 0 AND af = 1) AS b,
        |    COUNT(*) FILTER (bf = 1 AND af = 0) AS c
        |  FROM q GROUP BY event_type),
        |s AS (SELECT event_type, n_pairs, b, c,
        |    CAST(GREATEST(abs(b - c) - 1, 0) AS DOUBLE)
        |      * CAST(GREATEST(abs(b - c) - 1, 0) AS DOUBLE)
        |      / CAST(b + c AS DOUBLE) AS chi
        |  FROM m),
        |p AS (SELECT event_type, n_pairs, b, c, chi,
        |    sqrt(chi / 2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * sqrt(chi / 2.0)) AS t
        |  FROM s)
        |SELECT event_type, n_pairs, b, c,
        |  CASE WHEN b + c > 0 THEN ROUND(chi, 4) END AS chi2,
        |  CASE WHEN b + c > 0 THEN
        |    ROUND(((((1.061405429 * t - 1.453152027) * t + 1.421413741)
        |      * t - 0.284496736) * t + 0.254829592) * t * exp(-(x * x)),
        |      6) END AS p_two
        |FROM p""".stripMargin,

    // direct recompute of what the maintained state must equal:
    // days 1-2 retracted, days 20+ inserted on top of the day<20 state
    "q241_ivm_aggstate" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events
        |WHERE value IS NOT NULL AND dayofmonth(ts) >= 3
        |GROUP BY event_type""".stripMargin,

    "q243_zone_prune" ->
      """WITH z AS (
        |  SELECT 'hash_by_user' AS layout, user_id % 32 AS shard,
        |    MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        |  FROM events GROUP BY layout, shard
        |  UNION ALL
        |  SELECT 'clustered_by_day' AS layout, dayofmonth(ts) - 1 AS shard,
        |    MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        |  FROM events GROUP BY layout, shard)
        |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_shards,
        |  CAST(COUNT(*) FILTER (hi < 1704844800000000
        |    OR lo > 1705103999999999) AS BIGINT) AS pruned,
        |  ROUND(CAST(COUNT(*) FILTER (hi < 1704844800000000
        |      OR lo > 1705103999999999) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS pruned_frac
        |FROM z GROUP BY layout""".stripMargin,

    "q244_cliffs_delta" -> {
      val hv = graft.queries.TextOracles.H(
        "CAST(user_id AS VARCHAR) || '#13'")
      s"""WITH e AS (SELECT event_type, value,
         |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS arm
         |  FROM events WHERE value IS NOT NULL),
         |r AS (SELECT event_type, arm,
         |    2 * rank() OVER (PARTITION BY event_type ORDER BY value)
         |      + COUNT(*) OVER (PARTITION BY event_type, value) - 1 AS r2
         |  FROM e),
         |m AS (SELECT event_type,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    COUNT(*) FILTER (arm = 1) AS n1,
         |    SUM(CAST(r2 AS HUGEINT)) FILTER (arm = 0) AS r0d
         |  FROM r GROUP BY event_type),
         |s AS (SELECT event_type, n0, n1,
         |    (CAST(r0d AS DOUBLE) - CAST(n0 AS DOUBLE)
         |      * (CAST(n0 AS DOUBLE) + 1.0)) / 2.0 AS u0
         |  FROM m),
         |d AS (SELECT event_type, n0, n1,
         |    2.0 * u0 / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) - 1.0
         |      AS dd
         |  FROM s)
         |SELECT event_type, n0, n1,
         |  CASE WHEN n0 > 0 AND n1 > 0
         |       THEN ROUND(dd, 4) + 0.0 END AS delta,
         |  CASE WHEN n0 > 0 AND n1 > 0 THEN
         |    CASE WHEN abs(ROUND(dd, 4)) < 0.147 THEN 'negligible'
         |         WHEN abs(ROUND(dd, 4)) < 0.33 THEN 'small'
         |         WHEN abs(ROUND(dd, 4)) < 0.474 THEN 'medium'
         |         ELSE 'large' END END AS magnitude
         |FROM d""".stripMargin
    },

    "q245_seasonal_decomp" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |      AS y
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY event_type, day),
        |tr AS (SELECT event_type, day, n, y,
        |    CASE WHEN COUNT(*) OVER w7 = 7 THEN
        |      CAST(SUM(CAST(ROUND(y, 9) AS DECIMAL(28,9))) OVER w7
        |        AS DOUBLE) / 7.0 END AS trend
        |  FROM daily
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dv AS (SELECT *, dayofweek(day) AS dow, y - trend AS dev
        |       FROM tr),
        |se AS (SELECT event_type, dow,
        |    CAST(SUM(CAST(ROUND(dev, 9) AS DECIMAL(28,9))) AS DOUBLE)
        |      / COUNT(*) AS seasonal
        |  FROM dv WHERE dev IS NOT NULL GROUP BY event_type, dow)
        |SELECT d.event_type, d.day, d.n, ROUND(d.y, 6) AS y,
        |  ROUND(d.trend, 6) + 0.0 AS trend,
        |  ROUND(s.seasonal, 6) + 0.0 AS seasonal,
        |  ROUND(d.y - d.trend - s.seasonal, 6) + 0.0 AS resid
        |FROM dv d LEFT JOIN se s
        |  ON d.event_type = s.event_type AND d.dow = s.dow""".stripMargin,

    "q247_attribution" ->
      """WITH t AS (SELECT user_id, ts, event_id, event_type AS channel
        |  FROM events WHERE event_type IN ('view', 'click')),
        |c AS (SELECT user_id, ts AS cts, event_id AS conv_id
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT c.user_id, c.conv_id, t.event_id AS touch_id,
        |    t.channel, t.ts AS tts
        |  FROM c JOIN t ON c.user_id = t.user_id
        |  WHERE t.ts <= c.cts AND t.ts >= c.cts - INTERVAL 86400 SECOND),
        |cr AS (SELECT channel, COUNT(*) OVER w AS n_touches,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, conv_id
        |      ORDER BY tts ASC, touch_id ASC) = 1 THEN 1 ELSE 0 END AS cf,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, conv_id
        |      ORDER BY tts DESC, touch_id DESC) = 1 THEN 1 ELSE 0 END AS cl
        |  FROM p WINDOW w AS (PARTITION BY user_id, conv_id))
        |SELECT channel, CAST(SUM(cf) AS BIGINT) AS first_touch,
        |  CAST(SUM(cl) AS BIGINT) AS last_touch,
        |  CAST(ROUND(SUM(CAST(ROUND(1.0 / n_touches, 9)
        |    AS DECIMAL(18,9))), 6) AS DOUBLE) AS linear_touch,
        |  COUNT(*) AS n_attributed
        |FROM cr GROUP BY channel""".stripMargin,

    "q248_monthly_accrual" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE)
        |      + CAST(o_orderkey % 45 AS INTEGER) AS e,
        |    CAST(o_totalprice AS DOUBLE) AS v
        |  FROM orders),
        |m AS (SELECT o_orderkey, v, s, e,
        |    date_diff('day', s, e) + 1 AS span,
        |    unnest(generate_series(date_trunc('month', s),
        |      date_trunc('month', e), INTERVAL 1 MONTH)) AS mo
        |  FROM o),
        |a AS (SELECT CAST(mo AS DATE) AS month,
        |    CAST(ROUND(v * (CAST(date_diff('day',
        |        GREATEST(s, CAST(mo AS DATE)),
        |        LEAST(e, last_day(CAST(mo AS DATE)))) + 1 AS DOUBLE)
        |      / CAST(span AS DOUBLE)), 9) AS DECIMAL(18,9)) AS alloc
        |  FROM m)
        |SELECT month, COUNT(*) AS n_slices,
        |  CAST(ROUND(SUM(alloc), 6) AS DOUBLE) AS accrued
        |FROM a GROUP BY month""".stripMargin,

    "q249_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, event_type, value,
        |    CAST(CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS INT)
        |      AS wk
        |  FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cw FROM ev GROUP BY 1),
        |cells AS (SELECT f.cw, ev.wk - f.cw AS off,
        |    SUM(CASE WHEN ev.event_type = 'purchase'
        |             THEN CAST(ev.value AS DECIMAL(18,4)) END) AS rev
        |  FROM ev JOIN f ON f.user_id = ev.user_id
        |  GROUP BY 1, 2),
        |b AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS base FROM f
        |      GROUP BY 1),
        |c AS (SELECT cw, off,
        |    SUM(COALESCE(rev, CAST(0 AS DECIMAL(18,4)))) OVER (
        |      PARTITION BY cw ORDER BY off
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cells)
        |SELECT c.cw AS cohort_week, c.off AS week_offset,
        |  b.base AS cohort_users,
        |  CAST(ROUND(c.cum, 6) AS DOUBLE) AS cum_revenue,
        |  ROUND(CAST(c.cum AS DOUBLE) / b.base, 6) AS ltv_per_user
        |FROM c JOIN b ON b.cw = c.cw""".stripMargin,

    "q250_eb_shrink" ->
      s"""WITH e AS (SELECT event_type, user_id,
         |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS conv
         |  FROM events WHERE value IS NOT NULL),
         |u AS (SELECT event_type, user_id, COUNT(*) AS n,
         |    CAST(SUM(conv) AS BIGINT) AS x
         |  FROM e GROUP BY event_type, user_id),
         |ur AS (SELECT *, CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS r
         |       FROM u),
         |pr AS (SELECT event_type, COUNT(*) AS uu,
         |    SUM(CAST(ROUND(r, 9) AS DECIMAL(28,9))) AS sr,
         |    SUM(CAST(ROUND(r * r, 9) AS DECIMAL(28,9))) AS sr2
         |  FROM ur GROUP BY event_type),
         |pk AS (SELECT event_type, uu,
         |    CAST(sr AS DOUBLE) / CAST(uu AS DOUBLE) AS mu,
         |    (CAST(sr2 AS DOUBLE) - CAST(uu AS DOUBLE)
         |      * (CAST(sr AS DOUBLE) / CAST(uu AS DOUBLE))
         |      * (CAST(sr AS DOUBLE) / CAST(uu AS DOUBLE)))
         |      / (CAST(uu AS DOUBLE) - 1.0) AS vr
         |  FROM pr),
         |pp AS (SELECT event_type,
         |    CASE WHEN uu > 1 AND vr > 0 THEN mu END AS mu,
         |    CASE WHEN uu > 1 AND vr > 0 THEN
         |      GREATEST(mu * (1.0 - mu) / vr - 1.0, 0.0) END AS k
         |  FROM pk)
         |SELECT ur.event_type, ur.user_id, ur.n, ur.x,
         |  ROUND(ur.r, 6) AS raw_rate,
         |  ROUND(pp.k, 4) AS prior_k,
         |  ROUND(COALESCE((CAST(ur.x AS DOUBLE) + pp.k * pp.mu)
         |    / (CAST(ur.n AS DOUBLE) + pp.k), ur.r), 6) AS shrunk_rate
         |FROM ur JOIN pp ON ur.event_type = pp.event_type""".stripMargin,

    "q251_rolling_active" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du
        |        GROUP BY 1),
        |r AS (SELECT du.day + o AS day, du.user_id
        |  FROM du CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS o)
        |    os),
        |w AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |      FROM r GROUP BY 1)
        |SELECT d.day, d.dau, w.wau,
        |  ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        |FROM dau d JOIN w ON d.day = w.day""".stripMargin,

    "q252_cms_join_size" -> {
      def h(e: String) = graft.queries.TextOracles.H(e)
      def bkt(key: String) =
        h(s"CAST($key AS VARCHAR) || '#cms' || CAST(j AS VARCHAR)") +
          " * 2654435761 % 1000000007 % 8192"
      s"""WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |sa AS (SELECT j, ${bkt("user_id")} AS bucket, COUNT(*) AS ca
         |  FROM events CROSS JOIN js GROUP BY 1, 2),
         |sb AS (SELECT j, ${bkt("o_custkey")} AS bucket, COUNT(*) AS cb
         |  FROM orders CROSS JOIN js GROUP BY 1, 2),
         |ip AS (SELECT sa.j, SUM(sa.ca * sb.cb) AS ip
         |  FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
         |  GROUP BY 1),
         |est AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(MIN(ip) AS BIGINT) AS est FROM ip),
         |ex AS (SELECT CAST(SUM(e.n * o.n) AS BIGINT) AS exact
         |  FROM (SELECT user_id AS k, COUNT(*) AS n FROM events
         |        GROUP BY 1) e
         |  JOIN (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
         |        GROUP BY 1) o ON e.k = o.k)
         |SELECT est.n_rows, est.est, ex.exact, est.est - ex.exact
         |  AS overcount
         |FROM est, ex""".stripMargin
    },

    "q253_expectations" ->
      """WITH w AS (SELECT COUNT(*) AS n,
        |    COUNT(*) FILTER (o_custkey IS NULL) AS v_nn,
        |    COUNT(*) FILTER (o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0 OR o_totalprice > 480000)) AS v_rng,
        |    COUNT(*) FILTER (o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F', 'P')) AS v_acc,
        |    COUNT(*) FILTER (o_orderpriority IS NOT NULL AND NOT
        |      regexp_matches(o_orderpriority, '^[1-5]-')) AS v_rx,
        |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_uq
        |  FROM orders),
        |fk AS (SELECT COUNT(*) AS n, COUNT(*) FILTER (
        |    l_orderkey IS NOT NULL AND l_orderkey NOT IN
        |      (SELECT o_orderkey FROM orders)) AS v
        |  FROM lineitem),
        |rows_ AS (
        |  SELECT 'not_null' AS check_, 'o_custkey' AS col_,
        |    n, v_nn AS v, 0.0 AS maxf FROM w
        |  UNION ALL SELECT 'in_range', 'o_totalprice', n, v_rng, 0.05
        |    FROM w
        |  UNION ALL SELECT 'accepted_values', 'o_orderstatus', n,
        |    v_acc, 0.0 FROM w
        |  UNION ALL SELECT 'matches', 'o_orderpriority', n, v_rx, 0.0
        |    FROM w
        |  UNION ALL SELECT 'unique', 'o_orderkey', n, v_uq, 0.0 FROM w
        |  UNION ALL SELECT 'fk_covered', 'l_orderkey->o_orderkey', n,
        |    v, 0.0 FROM fk)
        |SELECT check_ AS "check", col_ AS "column",
        |  CAST(n AS BIGINT) AS n_rows,
        |  CAST(v AS BIGINT) AS n_violations,
        |  ROUND(CAST(v AS DOUBLE) / n, 6) AS viol_frac,
        |  CAST(v AS DOUBLE) / n <= maxf AS pass
        |FROM rows_""".stripMargin,
    // sort-merge nearest-neighbor mirror: the nearest control is the
    // closest control at-or-below or at-or-above in x-order; controls
    // deduped to min id per exact x (only that row can win the
    // (gap, id) argmin); the two sides compared lexicographically
    "q255_matched_att" ->
      s"""WITH src AS ($convCte),
         |pts AS (SELECT event_type, arm, event_id AS id,
         |    CAST(value AS DOUBLE) AS x, CAST(conv AS DOUBLE) AS y
         |  FROM src),
         |cd AS (SELECT event_type, x, id AS cid, y AS cy,
         |    row_number() OVER (PARTITION BY event_type, x
         |      ORDER BY id ASC) AS rn
         |  FROM pts WHERE arm = 0),
         |u AS (SELECT event_type, x, 0 AS tag,
         |    CAST(NULL AS BIGINT) AS id, CAST(NULL AS DOUBLE) AS ty,
         |    cid, cy
         |  FROM cd WHERE rn = 1
         |  UNION ALL
         |  SELECT event_type, x, 1, id, y, NULL, NULL
         |  FROM pts WHERE arm = 1),
         |s AS (SELECT *,
         |    last_value(CASE WHEN tag = 0 THEN
         |        struct_pack(cx := x, cid := cid, cy := cy) END
         |      IGNORE NULLS) OVER (PARTITION BY event_type
         |      ORDER BY x ASC, tag ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prv,
         |    last_value(CASE WHEN tag = 0 THEN
         |        struct_pack(cx := x, cid := cid, cy := cy) END
         |      IGNORE NULLS) OVER (PARTITION BY event_type
         |      ORDER BY x DESC, tag ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nxt
         |  FROM u),
         |t AS (SELECT event_type, id AS treated_id, ty,
         |    ROUND(abs(x - (prv).cx), 9) AS gp, (prv).cid AS pid,
         |    (prv).cy AS pcy,
         |    ROUND(abs(x - (nxt).cx), 9) AS gn, (nxt).cid AS nid,
         |    (nxt).cy AS ncy
         |  FROM s WHERE tag = 1),
         |m AS (SELECT event_type, treated_id, ty,
         |    CASE WHEN gn IS NOT NULL AND gn <= 1.0
         |          AND (gp IS NULL OR gp > 1.0 OR gn < gp
         |               OR (gn = gp AND nid < pid))
         |         THEN gn ELSE gp END AS gap,
         |    CASE WHEN gn IS NOT NULL AND gn <= 1.0
         |          AND (gp IS NULL OR gp > 1.0 OR gn < gp
         |               OR (gn = gp AND nid < pid))
         |         THEN ncy ELSE pcy END AS cy
         |  FROM t
         |  WHERE (gp IS NOT NULL AND gp <= 1.0)
         |     OR (gn IS NOT NULL AND gn <= 1.0))
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_matched,
         |  ROUND(CAST(SUM(CAST(gap AS DECIMAL(28,9))) AS DOUBLE)
         |    / COUNT(*), 6) AS mean_gap,
         |  ROUND(CAST(SUM(CAST(ROUND(ty - cy, 9) AS DECIMAL(28,9)))
         |    AS DOUBLE) / COUNT(*), 6) AS att
         |FROM m GROUP BY event_type""".stripMargin,

    "q256_did" -> {
      val hv = graft.queries.TextOracles.H(
        "CAST(user_id AS VARCHAR) || '#13'")
      def cell(a: Int, p: Int, s: String) =
        s"""COUNT(*) FILTER (arm = $a AND period = $p) AS n$s,
           |    SUM(CAST(value AS DECIMAL(18,4)))
           |      FILTER (arm = $a AND period = $p) AS s$s,
           |    SUM(CAST(CAST(value AS DECIMAL(18,4))
           |             * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8)))
           |      FILTER (arm = $a AND period = $p) AS q$s""".stripMargin
      def vn(s: String) =
        s"(CAST(q$s AS DOUBLE) - CAST(s$s AS DOUBLE) * CAST(s$s AS DOUBLE)" +
          s" / n$s) / (n$s - 1) / n$s"
      s"""WITH e AS (SELECT event_type, value,
         |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS arm,
         |    CASE WHEN dayofmonth(ts) > 15 THEN 1 ELSE 0 END AS period
         |  FROM events WHERE value IS NOT NULL),
         |a AS (SELECT event_type,
         |    ${cell(1, 0, "t0")},
         |    ${cell(1, 1, "t1")},
         |    ${cell(0, 0, "c0")},
         |    ${cell(0, 1, "c1")}
         |  FROM e GROUP BY event_type),
         |d AS (SELECT event_type, nt0, nt1, nc0, nc1,
         |    (CAST(st1 AS DOUBLE) / nt1 - CAST(st0 AS DOUBLE) / nt0)
         |      - (CAST(sc1 AS DOUBLE) / nc1 - CAST(sc0 AS DOUBLE) / nc0)
         |      AS did,
         |    sqrt(${vn("t1")} + ${vn("t0")} + ${vn("c1")} + ${vn("c0")})
         |      AS se,
         |    nt0 > 1 AND nt1 > 1 AND nc0 > 1 AND nc1 > 1 AS ok
         |  FROM a)
         |SELECT event_type, nt0, nt1, nc0, nc1,
         |  CASE WHEN ok THEN ROUND(did, 6) + 0.0 END AS did,
         |  CASE WHEN ok THEN ROUND(se, 6) END AS se,
         |  CASE WHEN ok THEN ROUND(did / se, 4) + 0.0 END AS z
         |FROM d""".stripMargin
    },

    "q257_cuped" -> {
      val hv = graft.queries.TextOracles.H(
        "CAST(user_id AS VARCHAR) || '#13'")
      def d9(e: String) = s"SUM(CAST(ROUND($e, 9) AS DECIMAL(28,9)))"
      s"""WITH halves AS (SELECT event_type, user_id,
         |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
         |         THEN 0 ELSE 1 END AS arm,
         |    SUM(CAST(value AS DECIMAL(18,4)))
         |      FILTER (dayofmonth(ts) <= 15) AS s1,
         |    COUNT(*) FILTER (dayofmonth(ts) <= 15) AS c1,
         |    SUM(CAST(value AS DECIMAL(18,4)))
         |      FILTER (dayofmonth(ts) > 15) AS s2,
         |    COUNT(*) FILTER (dayofmonth(ts) > 15) AS c2
         |  FROM events WHERE value IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |u AS (SELECT event_type, arm,
         |    CAST(s1 AS DOUBLE) / c1 AS x, CAST(s2 AS DOUBLE) / c2 AS y
         |  FROM halves WHERE c1 > 0 AND c2 > 0),
         |a AS (SELECT event_type,
         |    COUNT(*) FILTER (arm = 0) AS n0,
         |    COUNT(*) FILTER (arm = 1) AS n1,
         |    ${d9("x")} FILTER (arm = 0) AS sx0,
         |    ${d9("y")} FILTER (arm = 0) AS sy0,
         |    ${d9("x")} FILTER (arm = 1) AS sx1,
         |    ${d9("y")} FILTER (arm = 1) AS sy1,
         |    ${d9("x")} AS sx, ${d9("y")} AS sy,
         |    ${d9("x * y")} AS sxy, ${d9("x * x")} AS sxx,
         |    ${d9("y * y")} AS syy
         |  FROM u GROUP BY 1),
         |d AS (SELECT event_type, n0, n1,
         |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
         |      / CAST(n0 + n1 AS DOUBLE) AS cxx,
         |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
         |      / CAST(n0 + n1 AS DOUBLE) AS cyy,
         |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
         |      / CAST(n0 + n1 AS DOUBLE) AS cxy,
         |    CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0 AS dr,
         |    CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0 AS dx
         |  FROM a)
         |SELECT event_type, n0, n1,
         |  CASE WHEN n0 > 0 AND n1 > 0 AND cxx > 0 AND cyy > 0
         |       THEN ROUND(cxy / cxx, 6) + 0.0 END AS theta,
         |  CASE WHEN n0 > 0 AND n1 > 0
         |       THEN ROUND(dr, 6) + 0.0 END AS diff_raw,
         |  CASE WHEN n0 > 0 AND n1 > 0 AND cxx > 0 AND cyy > 0
         |       THEN ROUND(dr - (cxy / cxx) * dx, 6) + 0.0
         |       END AS diff_cuped,
         |  CASE WHEN n0 > 0 AND n1 > 0 AND cxx > 0 AND cyy > 0
         |       THEN ROUND((cyy - cxy * cxy / cxx) / cyy, 6) + 0.0
         |       END AS var_ratio
         |FROM d""".stripMargin
    },
    "q258_nelson_aalen" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT MAX(us) AS frontier FROM ev),
        |spans AS (SELECT
        |    (MAX(us) - MIN(us)) // 86400000000 AS duration,
        |    CASE WHEN MAX(us) > (SELECT frontier FROM f)
        |                        - 86400000000 THEN 0
        |         ELSE 1 END AS event
        |  FROM ev GROUP BY user_id),
        |byt AS (SELECT duration AS t, CAST(SUM(event) AS BIGINT) AS d,
        |    COUNT(*) AS all_at_t
        |  FROM spans GROUP BY duration),
        |risk AS (SELECT t, d, SUM(all_at_t) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM byt),
        |terms AS (SELECT t, d, n_risk,
        |    SUM(CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 9)
        |        AS DECIMAL(18,9)))
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND CURRENT ROW) AS ch
        |  FROM risk WHERE d > 0)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
        |  CAST(ROUND(ch, 6) AS DOUBLE) AS cum_hazard,
        |  ROUND(exp(-CAST(ch AS DOUBLE)), 6) AS survival
        |FROM terms""".stripMargin,

    "q259_rfm" ->
      """WITH tx AS (SELECT user_id, ts, value FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL),
        |k AS (SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS frequency,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS m
        |  FROM tx GROUP BY 1),
        |fr AS (SELECT MAX(ts) AS frontier FROM tx),
        |b AS (SELECT user_id,
        |    date_diff('day', CAST(last_ts AS DATE),
        |      CAST((SELECT frontier FROM fr) AS DATE)) AS recency_days,
        |    frequency,
        |    CAST(ROUND(m, 4) AS DOUBLE) AS monetary
        |  FROM k),
        |sc AS (SELECT *,
        |    ntile(5) OVER (ORDER BY recency_days DESC, user_id ASC)
        |      AS r_score,
        |    ntile(5) OVER (ORDER BY frequency ASC, user_id ASC)
        |      AS f_score,
        |    ntile(5) OVER (ORDER BY monetary ASC, user_id ASC)
        |      AS m_score
        |  FROM b)
        |SELECT user_id, CAST(recency_days AS INTEGER) AS recency_days,
        |  frequency, monetary,
        |  CAST(r_score AS INTEGER) AS r_score,
        |  CAST(f_score AS INTEGER) AS f_score,
        |  CAST(m_score AS INTEGER) AS m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |    || CAST(m_score AS VARCHAR) AS rfm
        |FROM sc""".stripMargin,

    "q260_abc" ->
      """WITH items AS (SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS v
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT l_partkey, v,
        |    SUM(v) OVER (ORDER BY v DESC, l_partkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    (SELECT SUM(v) FROM items) AS tot
        |  FROM items)
        |SELECT l_partkey, CAST(ROUND(v, 4) AS DOUBLE) AS value,
        |  ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |    AS cum_share,
        |  CASE WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |            <= 0.8 THEN 'A'
        |       WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |            <= 0.95 THEN 'B'
        |       ELSE 'C' END AS abc
        |FROM c""".stripMargin,
    "q261_session_metrics" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, ts,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |        FROM events) t),
        |s AS (SELECT user_id, ts,
        |        CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |      FROM g),
        |sess AS (SELECT CAST(MIN(ts) AS DATE) AS day, COUNT(*) AS ne,
        |    (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur
        |  FROM s GROUP BY user_id, session_idx)
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  ROUND(CAST(COUNT(*) FILTER (ne = 1) AS DOUBLE) / COUNT(*), 6)
        |    AS bounce_rate,
        |  ROUND(CAST(SUM(CAST(ne AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_events,
        |  ROUND(CAST(SUM(CAST(dur AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_dur_sec,
        |  ROUND(quantile_cont(dur, 0.5), 4) AS median_dur_sec
        |FROM sess GROUP BY day""".stripMargin,

    "q262_bounded_funnel" ->
      """WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.ts1
        |    AND epoch_us(e.ts) <= epoch_us(t1.ts1) + 3600000000
        |  GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
        |    AND epoch_us(e.ts) <= epoch_us(t2.ts2) + 3600000000
        |  GROUP BY 1),
        |n1 AS (SELECT COUNT(*) AS n_users FROM t1),
        |st AS (
        |  SELECT 1 AS stage, 'signup' AS step, n_users FROM n1
        |  UNION ALL SELECT 2, 'click', COUNT(*) FROM t2
        |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM t3)
        |SELECT stage, step, CAST(st.n_users AS BIGINT) AS n_users,
        |  ROUND(CAST(st.n_users AS DOUBLE) / n1.n_users, 6) AS conv_rate
        |FROM st, n1""".stripMargin,
  )

  /** Shared q221/q222 source CTE body: NULL-value rows out, arm from
    * the q165 hash split, conversion = value > 50. */
  private def convCte: String = {
    val hv = graft.queries.TextOracles.H("CAST(user_id AS VARCHAR) || '#13'")
    s"""SELECT event_type, ts, event_id, value,
       |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS conv,
       |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
       |         THEN 0 ELSE 1 END AS arm
       |  FROM events WHERE value IS NOT NULL""".stripMargin
  }

  /** Shared Mann–Whitney oracle chain (q215/q216): `srcCols` projects
    * the stratum columns out of `events` (may alias expressions),
    * `strata` names them for GROUP BY / PARTITION BY. Mirrors
    * [[graft.ops.Eval.mannWhitneyU]] operation-for-operation, including
    * the Abramowitz–Stegun erfc polynomial for the p-value. */
  private def mannWhitneyOracle(strata: String, srcCols: String): String = {
    val hv = graft.queries.TextOracles.H("CAST(user_id AS VARCHAR) || '#13'")
    s"""WITH e AS (SELECT $srcCols, value,
       |    CASE WHEN ($hv * 2654435761 % 1000000007) % 1000000 < 500000
       |         THEN 0 ELSE 1 END AS arm
       |  FROM events WHERE value IS NOT NULL),
       |r AS (SELECT $strata, arm,
       |    2 * rank() OVER (PARTITION BY $strata ORDER BY value)
       |      + COUNT(*) OVER (PARTITION BY $strata, value) - 1 AS r2,
       |    COUNT(*) OVER (PARTITION BY $strata, value) AS tc
       |  FROM e),
       |m AS (SELECT $strata,
       |    COUNT(*) FILTER (arm = 0) AS n0,
       |    COUNT(*) FILTER (arm = 1) AS n1,
       |    SUM(CAST(r2 AS HUGEINT)) FILTER (arm = 0) AS r0d,
       |    SUM(CAST(tc * tc - 1 AS HUGEINT)) AS ties
       |  FROM r GROUP BY $strata),
       |s AS (SELECT $strata, n0, n1,
       |    (CAST(r0d AS DOUBLE) - CAST(n0 AS DOUBLE)
       |      * (CAST(n0 AS DOUBLE) + 1.0)) / 2.0 AS u,
       |    CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0 AS mu,
       |    CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0
       |      * ((CAST(n0 + n1 AS DOUBLE) + 1.0) - CAST(ties AS DOUBLE)
       |         / (CAST(n0 + n1 AS DOUBLE)
       |            * (CAST(n0 + n1 AS DOUBLE) - 1.0))) AS vr
       |  FROM m),
       |z AS (SELECT $strata, n0, n1, u,
       |    CASE WHEN n0 > 0 AND n1 > 0 AND vr > 0
       |         THEN (u - mu) / sqrt(vr) END AS zr
       |  FROM s),
       |p AS (SELECT $strata, n0, n1, u, zr,
       |    abs(zr) / sqrt(2.0) AS x,
       |    1.0 / (1.0 + 0.3275911 * (abs(zr) / sqrt(2.0))) AS t
       |  FROM z)
       |SELECT $strata, n0, n1, u, ROUND(zr, 4) AS z,
       |  ROUND(((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
       |    - 0.284496736) * t + 0.254829592) * t * exp(-(x * x)), 6)
       |    AS p_two
       |FROM p""".stripMargin
  }
}
