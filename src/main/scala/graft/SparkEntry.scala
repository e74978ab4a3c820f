package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.rel.{RelQueries, TimeSeries}
import graft.sim.Similarity
import graft.text.TextOps
import graft.vec.VectorOps

/** Driver contract — see SURVEY.md §7 + BASELINE.md.
  *
  * Every key in [[queries]] is one operator row from SURVEY.md §2; keys
  * present in [[oracleSql]] are hash-compared against DuckDB by the
  * driver (same parquet tables, sf0.01). Keys absent from oracleSql are
  * non-SQL-expressible ops (hash-seeded LSH/minhash, heuristic lang-id)
  * checked by ScalaTest properties instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: 3-way fact/dim join + DECIMAL aggregation, the
    * composition of q_join_inner/q_join_broadcast/q_agg_groupby. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date"))
      .groupBy(col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.B relational core
    "q_scan_project" -> (RelQueries.scanProject _),
    "q_filter" -> (RelQueries.filterQ _),
    "q_join_inner" -> (RelQueries.joinInner _),
    "q_join_broadcast" -> (RelQueries.joinBroadcast _),
    "q_join_left" -> (RelQueries.joinLeft _),
    "q_join_semi" -> (RelQueries.joinSemi _),
    "q_join_anti" -> (RelQueries.joinAnti _),
    "q_join_range" -> (RelQueries.joinRange _),
    "q_join_bucketed" -> (RelQueries.joinBucketed _),
    "q_join_asof" -> (RelQueries.joinAsOf _),
    "q_agg_groupby" -> (RelQueries.aggGroupBy _),
    "q_agg_distinct" -> (RelQueries.aggDistinct _),
    "q_agg_rollup" -> (RelQueries.aggRollup _),
    "q_agg_cube" -> (RelQueries.aggCube _),
    "q_agg_grouping_sets" -> (RelQueries.aggGroupingSets _),
    "q_window_rank" -> (RelQueries.windowRank _),
    "q_window_frame" -> (RelQueries.windowFrame _),
    "q_topk_per_group" -> (RelQueries.topkPerGroup _),
    "q_sort_limit" -> (RelQueries.sortLimit _),
    "q_union_all" -> (RelQueries.unionAll _),
    "q_intersect" -> (RelQueries.intersectQ _),
    "q_except" -> (RelQueries.exceptQ _),
    "q_string_funcs" -> (RelQueries.stringFuncs _),
    "q_date_funcs" -> (RelQueries.dateFuncs _),
    "q_math_funcs" -> (RelQueries.mathFuncs _),
    "q_json_funcs" -> (RelQueries.jsonFuncs _),
    "q_regex_funcs" -> (RelQueries.regexFuncs _),
    "q_conditional_funcs" -> (RelQueries.conditionalFuncs _),
    "q_array_funcs" -> (RelQueries.arrayFuncs _),
    "q_subquery_scalar" -> (RelQueries.subqueryScalar _),
    "q_pivot" -> (RelQueries.pivotQ _),
    "q_unpivot" -> (RelQueries.unpivotQ _),
    "q_percentile" -> (RelQueries.percentileQ _),
    "q_window_tumbling" -> (RelQueries.windowTumbling _),
    "q_window_sliding" -> (RelQueries.windowSliding _),
    "q_window_session" -> (RelQueries.windowSession _),
    // streaming engine under the oracle gate (r11): the same windows
    // executed by Structured Streaming (file source → AvailableNow →
    // memory sink), oracled by the IDENTICAL SQL as the batch twins
    "q_stream_tumbling" -> (graft.stream.StreamQueries.qStreamTumbling _),
    "q_stream_sliding" -> (graft.stream.StreamQueries.qStreamSliding _),
    "q_stream_session" -> (graft.stream.StreamQueries.qStreamSession _),
    // r12: the append/watermark path — two chronological microbatches,
    // windows emitted only once the watermark closes them (oracle = the
    // batch SQL restricted to closed windows); and stream-static
    // incremental dedup under the batch twin's oracle verbatim
    "q_stream_append" -> (graft.stream.StreamQueries.qStreamAppend _),
    // r15: the second append+watermark shape — overlapping sliding
    // windows closing in stride order as the watermark passes each end
    "q_stream_append_sliding" -> (graft.stream.StreamQueries.qStreamAppendSliding _),
    "q_stream_dedup_incremental" -> (graft.stream.StreamQueries.qStreamDedupIncremental _),
    // r15: the ONLINE near-dup ingest gate — row-local MinHash band
    // keys on the stream side vs a static corpus band table, exact
    // Jaccard verify before emission
    "q_stream_dedup_neardup" -> (graft.stream.StreamQueries.qStreamDedupNearDup _),
    "q_stream_join" -> (graft.stream.StreamQueries.qStreamJoin _),
    "q_stream_join_outer" -> (graft.stream.StreamQueries.qStreamJoinOuter _),
    "q_dedup_latest" -> (RelQueries.dedupLatest _),
    // r12: the CDC family's other two shapes — SCD2 validity intervals
    // (what compaction throws away) and rolling z-score anomaly flags
    "q_scd2_history" -> (RelQueries.scd2History _),
    "q_anomaly_zscore" -> (RelQueries.anomalyZscore _),
    "q_join_skew_salted" -> (graft.plans.SkewJoin.qJoinSkewSalted _),
    "q_bloom_join" -> (graft.plans.BloomFilter.qBloomJoin _),
    // r12: JSONL + CSV ingest round-trips (multi-format ETL entry point)
    "q_ingest_jsonl" -> (graft.sources.Sources.qIngestJsonl _),
    "q_ingest_csv" -> (graft.sources.Sources.qIngestCsv _),
    // r12: ORC round-trip — the second columnar/pushdown storage path
    "q_ingest_orc" -> (graft.sources.Sources.qIngestOrc _),
    // r12: blocked edit-distance linkage (entity resolution)
    "q_join_fuzzy" -> (RelQueries.joinFuzzy _),
    // r12: keyless interval-overlap join via bin-explode + equi-join +
    // exact-overlap postfilter (the recipe that avoids the nested loop)
    "q_join_interval" -> (RelQueries.joinInterval _),
    // r12: degree-ordered triangle counting over the part co-order
    // graph (the last-reducer-proof wedge recipe)
    "q_triangle_count" -> (graft.graph.Triangles.qTriangleCount _),
    "q_label_propagation" -> (graft.graph.LabelProp.qLabelPropagation _),
    "q_hll_merge" -> (RelQueries.hllMerge _),
    "q_rolling_median" -> (RelQueries.rollingMedian _),
    "q_feature_hashing" -> (text.Relevance.qFeatureHashing _),
    // r12: golden-record election over the fuzzy-linkage graph (CC
    // clusters + most-supported-variant rule — entity resolution's
    // canonicalization step)
    "q_survivorship" -> (RelQueries.survivorship _),
    // r12: second iterative graph primitive next to the CC family —
    // fixed-iteration damped PageRank over the order↔part incidence
    "q_pagerank" -> (graft.graph.PageRank.qPageRank _),
    "q_zorder_layout" -> (graft.plans.ZOrder.qZorderLayout _),
    // r12: small-file compaction planner (the OPTIMIZE bin-packing
    // step — sorted cumulative first-fit over the file manifest)
    "q_compaction_plan" -> (graft.plans.Compaction.qCompactionPlan _),
    // r12: min/max file-skipping audit — the same rows in arrival vs
    // value-clustered layouts, classified skipped/full/partial (the
    // measured ROI of clustering)
    "q_manifest_prune" -> (graft.plans.Pruning.qManifestPrune _),
    "q_histogram" -> (RelQueries.histogramQ _),
    "q_profile" -> (RelQueries.profileQ _),
    "q_join_null_safe" -> (RelQueries.joinNullSafe _),
    "q_arg_minmax" -> (RelQueries.argMinMax _),
    "q_window_range" -> (RelQueries.windowRange _),
    "q_stats_moments" -> (RelQueries.statsMoments _),
    "q_window_ntile" -> (RelQueries.windowNtile _),
    "q_join_full" -> (RelQueries.joinFull _),
    "q_agg_collect" -> (RelQueries.aggCollect _),
    "q_agg_multi_distinct" -> (RelQueries.aggMultiDistinct _),
    "q_subquery_exists" -> (RelQueries.subqueryExists _),
    "q_gap_fill" -> (TimeSeries.gapFill _),
    "q_funnel" -> (TimeSeries.funnel _),
    "q_cohort" -> (TimeSeries.cohort _),
    // r12 close-out wave 2: sessionization / transition matrix /
    // experiment readout / Pareto frontier
    "q_sessionize" -> (TimeSeries.sessionize _),
    "q_markov_transitions" -> (TimeSeries.markovTransitions _),
    "q_ab_test" -> (TimeSeries.abTest _),
    "q_skyline" -> (RelQueries.skyline _),
    "q_scd2_join" -> (RelQueries.scd2Join _),
    "q_mad" -> (RelQueries.mad _),
    "q_islands" -> (TimeSeries.islands _),
    "q_time_to_convert" -> (TimeSeries.timeToConvert _),
    "q_retention_curve" -> (TimeSeries.retentionCurve _),
    "q_cusum" -> (TimeSeries.cusum _),
    "q_cooccur_lift" -> (RelQueries.cooccurLift _),
    "q_attribution" -> (TimeSeries.attribution _),
    "q_trend_per_user" -> (TimeSeries.trendPerUser _),
    "q_funnel_paths" -> (TimeSeries.funnelPaths _),
    "q_k_anonymity" -> (RelQueries.kAnonymity _),
    "q_rfm" -> (RelQueries.rfm _),
    "q_dq_audit" -> (RelQueries.dqAudit _),
    "q_target_encoding" -> (RelQueries.targetEncoding _),
    "q_heavy_hitters" -> (TextOps.heavyHitters _),
    "q_corr_matrix" -> (RelQueries.corrMatrix _),
    "q_seasonal_profile" -> (TimeSeries.seasonalProfile _),
    "q_calibration" -> (VectorOps.qCalibration _),
    "q_partition_audit" -> (graft.plans.Pruning.qPartitionAudit _),
    "q_ema_smoothing" -> (TimeSeries.emaSmoothing _),
    "q_benford" -> (RelQueries.benford _),
    "q_bootstrap_se" -> (text.Sampling.qBootstrapSe _),
    "q_psi" -> (TextOps.qPsi _),
    "q_mutual_info" -> (RelQueries.mutualInfo _),
    "q_dp_counts" -> (RelQueries.dpCounts _),
    "q_gains_curve" -> (VectorOps.qGainsCurve _),
    "q_vocab_growth" -> (TextOps.qVocabGrowth _),
    "q_graph_jaccard" -> (RelQueries.graphJaccard _),
    "q_stream_sessionize" -> (stream.StreamQueries.qStreamSessionize _),
    "q_stream_counters" -> (stream.StreamQueries.qStreamCounters _),
    "q_lateness_audit" -> (TimeSeries.latenessAudit _),
    "q_source_concentration" -> (TextOps.qSourceConcentration _),
    "q_robust_scale" -> (VectorOps.qRobustScale _),
    "q_leakage_corr" -> (VectorOps.qLeakageCorr _),
    "q_twap" -> (TimeSeries.twap _),
    "q_user_entropy" -> (TimeSeries.userEntropy _),
    "q_trending" -> (RelQueries.trending _),
    "q_embedding_norm_audit" -> (VectorOps.qEmbeddingNormAudit _),
    "q_cuped" -> (TimeSeries.cuped _),
    "q_confusion_matrix" -> (VectorOps.qConfusionMatrix _),
    "q_winsorized_mean" -> (RelQueries.winsorizedMean _),
    "q_kfold" -> (text.Sampling.qKfold _),
    "q_anomaly_seasonal" -> (TimeSeries.anomalySeasonal _),
    "q_growth_accounting" -> (TimeSeries.growthAccounting _),
    "q_mde" -> (TimeSeries.mde _),
    "q_path_conversion" -> (TimeSeries.pathConversion _),
    "q_auc_exact" -> (VectorOps.qAucExact _),
    "q_ks_test" -> (TextOps.qKsTest _),
    "q_gini" -> (TimeSeries.gini _),
    "q_survival_km" -> (TimeSeries.survivalKm _),
    "q_acf" -> (TimeSeries.acf _),
    "q_srm_check" -> (TimeSeries.srmCheck _),
    "q_did" -> (TimeSeries.did _),
    "q_theil_index" -> (TimeSeries.theilIndex _),
    "q_kcore" -> (graft.graph.KCore.qKCore _),
    "q_2hop_recs" -> (graft.graph.LinkPred.qTwoHopRecs _),
    "q_degree_powerlaw" -> (graft.graph.GraphStats.qDegreePowerlaw _),
    "q_fano_dispersion" -> (TimeSeries.fanoDispersion _),
    "q_weighted_median" -> (RelQueries.weightedMedian _),
    // r12 wave P: classical statistical inference, all from one-pass
    // map-side-combinable power sums / domain-bounded histograms
    "q_welch_ttest" -> (TimeSeries.welchTtest _),
    "q_chi2_independence" -> (TimeSeries.chi2Independence _),
    "q_ols_regression" -> (TimeSeries.olsRegression _),
    "q_decision_stump" -> (TimeSeries.decisionStump _),
    // r12 wave Q: one-pass trained text classifier, WOE/IV feature
    // scoring, and the integer-exact hubs/authorities power method
    "q_naive_bayes" -> (text.Relevance.qNaiveBayes _),
    "q_woe_iv" -> (RelQueries.woeIv _),
    "q_hits" -> (graft.graph.Hits.qHits _),
    // r12 wave R: multivariate closed-form fit, causal NN matching
    // (float-free), and the centroid silhouette clustering audit
    "q_ols_multi" -> (TimeSeries.olsMulti _),
    "q_nn_match" -> (TimeSeries.nnMatch _),
    "q_silhouette" -> (Similarity.qSilhouette _),
    "q_lloyd_round" -> (Similarity.qLloydRound _),
    "q_pq_lloyd_round" -> (Similarity.qPqLloydRound _),
    "q_propensity_strata" -> (TimeSeries.propensityStrata _),
    // r12 wave T: grid model selection in one scan, the PCA power
    // step, and integer-exact cross-source quantile normalization
    "q_ridge_grid" -> (TimeSeries.ridgeGrid _),
    "q_pca_power" -> (Similarity.qPcaPower _),
    "q_quantile_normalize" -> (TextOps.qQuantileNormalize _),
    // r12 wave U: BFS hop layers, conformal intervals, and the
    // LSH-vs-exact dedup audit
    "q_bfs_layers" -> (graft.graph.Bfs.qBfsLayers _),
    "q_conformal_interval" -> (TimeSeries.conformalInterval _),
    "q_dedup_eval" -> (TextOps.qDedupEval _),
    // §2.A reference (dist-keras) operator surface
    "q_minmax_scale" -> (VectorOps.qMinMaxScale _),
    "q_onehot" -> (VectorOps.qOneHot _),
    "q_argmax" -> (VectorOps.qArgMax _),
    "q_vector_assemble" -> (VectorOps.qVectorAssemble _),
    "q_linear_predict" -> (VectorOps.qLinearPredict _),
    "q_linear_predict_int8" -> (VectorOps.qLinearPredictInt8 _),
    "q_stream_scored" -> (graft.stream.StreamQueries.qStreamScored _),
    "q_mlp_predict" -> (VectorOps.qMlpPredict _),
    "q_mlp2_predict" -> (VectorOps.qMlp2Predict _),
    "q_softmax_predict" -> (VectorOps.qSoftmaxPredict _),
    "q_conv_predict" -> (VectorOps.qConvPredict _),
    "q_conv_softmax_predict" -> (VectorOps.qConvSoftmaxPredict _),
    "q_sgd_step" -> (VectorOps.qSgdStep _),
    "q_softmax_sgd_step" -> (VectorOps.qSoftmaxSgdStep _),
    "q_multiclass_metrics" -> (VectorOps.qMulticlassMetrics _),
    "q_cross_entropy" -> (VectorOps.qCrossEntropy _),
    "q_topk_accuracy" -> (VectorOps.qTopkAccuracy _),
    "q_roc_curve" -> (VectorOps.qRocCurve _),
    "q_lift_curve" -> (VectorOps.qLiftCurve _),
    "q_accuracy" -> (VectorOps.qAccuracy _),
    "q_eval_metrics" -> (VectorOps.qEvalMetrics _),
    "q_string_index" -> (VectorOps.qStringIndex _),
    "q_bucketize" -> (VectorOps.qBucketize _),
    "q_vec_avg_by_label" -> (VectorOps.qVecAvgByLabel _),
    "q_reshape" -> (VectorOps.qReshape _),
    "q_dense_vec" -> (VectorOps.qDenseVec _),
    // §2.C LLM-pipeline operators
    "q_dedup_exact" -> (TextOps.qDedupExact _),
    "q_text_tokens" -> (TextOps.qTextTokens _),
    "q_text_stats" -> (TextOps.qTextStats _),
    "q_token_count" -> (TextOps.qTokenCount _),
    "q_quality_score" -> (TextOps.qQualityScore _),
    "q_fingerprint" -> (TextOps.qFingerprint _),
    "q_dedup_ngram" -> (TextOps.qDedupNgram _),
    // r12: asymmetric containment (excerpt ⊂ original, Jaccard-blind)
    "q_dedup_containment" -> (TextOps.qDedupContainment _),
    "q_sample_hash" -> (text.Sampling.qSampleHash _),
    "q_split_assign" -> (text.Sampling.qSplitAssign _),
    "q_stratified_sample" -> (text.Sampling.qStratifiedSample _),
    "q_shuffle_order" -> (text.Sampling.qShuffleOrder _),
    // r12: per-source hard cap in hash order — the balancing step
    // before domain mixing (absolute row budget, not a rate)
    "q_domain_cap" -> (text.Sampling.qDomainCap _),
    // r12: weighted sampling without replacement (DLT priority sample —
    // the selection step that consumes a quality/importance weight)
    "q_sample_weighted" -> (text.Sampling.qSampleWeighted _),
    "q_domain_mix" -> (text.Sampling.qDomainMix _),
    "q_domain_mix_temp" -> (text.Sampling.qDomainMixTemperature _),
    "q_dedup_url" -> (TextOps.qDedupUrl _),
    "q_dedup_paragraph" -> (TextOps.qDedupParagraph _),
    "q_dedup_cluster" -> ((s: SparkSession, d: String) => TextOps.qDedupCluster(s, d)),
    "q_decontaminate" -> (TextOps.qDecontaminate _),
    "q_quality_repetition" -> (TextOps.qQualityRepetition _),
    "q_pack_chunks" -> (TextOps.qPackChunks _),
    "q_dedup_incremental" -> (TextOps.qDedupIncremental _),
    // r12: snapshot-to-snapshot change manifest (digest full-outer join)
    "q_snapshot_diff" -> (TextOps.qSnapshotDiff _),
    // r12: MERGE-INTO apply — consumes the changeset the snapshot diff
    // ships (delete + upsert onto a base snapshot; CDC loop closed)
    "q_cdc_merge" -> (TextOps.qCdcMerge _),
    // r12: incremental view maintenance — per-source aggregates
    // refreshed from the churn deltas alone (oracle = direct recompute,
    // so hash parity proves the maintenance algebra)
    "q_agg_incremental" -> (TextOps.qAggIncremental _),
    // r12: exact-dup content straddling train/val/test (leakage audit)
    "q_split_leakage" -> (TextOps.qSplitLeakage _),
    // r12: corpus-wide repeated-ngram mining (boilerplate blocklist
    // builder — aggregation direction of the shingle machinery)
    "q_boilerplate_ngrams" -> (TextOps.qBoilerplateNgrams _),
    "q_soft_dedup" -> (TextOps.qSoftDedup _),
    "q_zipf_fit" -> (TextOps.qZipfFit _),
    "q_npmi_collocations" -> (TextOps.qNpmiCollocations _),
    "q_readability" -> (TextOps.qReadability _),
    // r12: canonical text form via the custom codegen NFC expression
    // (composed ≡ decomposed before any digest-based operator)
    "q_text_normalize" -> (TextOps.qTextNormalize _),
    "q_llm_pipeline" -> (TextOps.qLlmPipeline _),
    "q_llm_pipeline_v2" -> (TextOps.qLlmPipelineV2 _),
    // r15: v2's stage chain with the cluster-dedup edges from the
    // CAPPED SimHash band join — the scale-safe near-dup operator
    // composed into the pipeline users actually copy
    "q_llm_pipeline_v3" -> (TextOps.qLlmPipelineV3 _),
    "q_filter_domains" -> (TextOps.qFilterDomains _),
    "q_token_fertility" -> (TextOps.qTokenFertility _),
    "q_scrub_pii" -> (TextOps.qScrubPii _),
    "q_dedup_substring" -> (TextOps.qDedupSubstring _),
    "q_quality_unigram" -> (TextOps.qQualityUnigram _),
    "q_quality_tails" -> (TextOps.qQualityTails _),
    // r12: per-source adaptive tail cuts (grouped percentile)
    "q_quality_tails_by_source" -> (TextOps.qQualityTailsBySource _),
    // r11: bigram LM (one step past unigram) + RAG-style chunking +
    // DSIR-lite hashed-n-gram importance weighting
    "q_quality_bigram" -> (TextOps.qQualityBigram _),
    "q_chunk_overlap" -> (TextOps.qChunkOverlap _),
    "q_dsir_weights" -> (TextOps.qDsirWeights _),
    // r12: per-source KL drift over the DSIR bucket space + one BPE
    // training iteration (merge-pair counting over the distinct vocab)
    "q_domain_shift" -> (TextOps.qDomainShift _),
    "q_bpe_merge" -> (TextOps.qBpeMerge _),
    "q_quality_gopher" -> (TextOps.qQualityGopher _),
    "q_quality_entropy" -> (TextOps.qQualityEntropy _),
    "q_token_bpe" -> (TextOps.qTokenBpe _),
    "q_frame_sample" -> (graft.mm.Multimodal.qFrameSample _),
    "q_media_scan" -> (graft.mm.Multimodal.qMediaScan _),
    "q_media_gif" -> (graft.mm.Multimodal.qMediaGif _),
    "q_media_gif_decode" -> (graft.mm.Multimodal.qMediaGifDecode _),
    "q_media_jpeg" -> (graft.mm.Multimodal.qMediaJpeg _),
    "q_media_jpeg_decode" -> (graft.mm.Multimodal.qMediaJpegDecode _),
    "q_media_adpcm_decode" -> (graft.mm.Multimodal.qMediaAdpcmDecode _),
    "q_media_video_sample" -> (graft.mm.Multimodal.qMediaVideoSample _),
    "q_media_profile" -> (graft.mm.Multimodal.qMediaProfile _),
    "q_media_resize" -> (graft.mm.Multimodal.qMediaResize _),
    "q_tfidf" -> (text.Relevance.qTfidf _),
    "q_bm25_search" -> (text.Relevance.qBm25Search _),
    // r12: reciprocal-rank fusion — the hybrid-retrieval primitive RAG
    // serving runs (BM25 list ⊕ VSM list over the candidate union)
    "q_rank_fusion" -> (text.Relevance.qRankFusion _),
    "q_cosine_topk" -> (Similarity.qCosineTopK _),
    // r12: kNN label-noise audit (majority-vote disagreement flags)
    "q_knn_label_noise" -> (Similarity.qKnnLabelNoise _),
    "q_dedup_embedding" -> (Similarity.qDedupEmbedding _),
    // int8 embedding compression + serving-shape ANN over the codes (r11)
    "q_embedding_quantize" -> (Similarity.qEmbeddingQuantize _),
    // r12: sign random projection — the JL dim-reduction rung of the
    // ANN ladder (project before LSH/IVF at 100 TB)
    "q_random_projection" -> (Similarity.qRandomProjection _),
    "q_ann_topk_int8" -> (Similarity.qAnnTopKInt8 _),
    // PQ ANN: 8x4-bit codes per vector, ADC lookup-table scoring (r11)
    "q_pq_topk" -> (Similarity.qPqTopK _),
    // composed ANN serving key (r12): IVF coarse pruning feeding PQ ADC
    // rescoring — scored candidates come ONLY from probed lists
    "q_ivf_pq_topk" -> (Similarity.qIvfPqTopK _),
    // md5/generated-SQL-mirror oracled (engine-portable hashing)
    "q_dedup_minhash" -> (TextOps.qDedupMinhash _),
    "q_dedup_cluster_banded" -> (TextOps.qDedupClusterBanded _),
    "q_dedup_cluster_star" -> (TextOps.qDedupClusterStar _),
    "q_dedup_embedding_lsh" -> (Similarity.qDedupEmbeddingLsh _),
    "q_dedup_embedding_cluster" -> (Similarity.qDedupEmbeddingCluster _),
    "q_lang_id" -> (TextOps.qLangId _),
    "q_ann_topk" -> (Similarity.qAnnTopK _),
    "q_dedup_simhash" -> (TextOps.qDedupSimhash _),
    "q_dedup_simhash_banded" -> (TextOps.qDedupSimhashBanded _),
    // capped form (r14): hot (band, bits) buckets star-expand against
    // their min-id rep — the production path at adversarial dup density
    // where the uncapped band join is output-bound (~10^4x pairs at the
    // x100 rehearsal's planted piles)
    "q_dedup_simhash_capped" -> (TextOps.qDedupSimhashCapped _),
    // r15: the capped family completed — MinHash band buckets get the
    // same hot-bucket star expansion as SimHash/embedding LSH
    "q_dedup_minhash_capped" -> (TextOps.qDedupMinhashCapped _),
    // oracled non-adaptive cores of the two adaptive keys below
    // (round-9 verdict asks #6/#7): fixed plane count / fixed seeds
    "q_dedup_embedding_lsh_capped_fixed" -> (Similarity.qDedupEmbeddingLshCappedFixed _),
    // one refinement ROUND of the adaptive capped-LSH loop (r13 verdict
    // ask #6: the q_lloyd_round pattern for the hot-bucket trainer)
    "q_lsh_refine_round" -> (Similarity.qLshRefineRound _),
    "q_ivf_topk_fixed" -> (Similarity.qIvfTopKFixed _),
    // oracled since r15 (the last three rows-only keys — no_oracle is
    // extinct): the adaptive capped-LSH mirror unrolls the refinement
    // loop with formula-computed planes and the integer autoPlanes
    // count (Similarity.cappedLshMirrorSql); IVF seeds by a
    // multiplicative hash and re-centers via the decimal device; the
    // trained-PQ codebook's two Lloyd rounds unroll the
    // q_pq_lloyd_round CTE chain.
    "q_dedup_embedding_lsh_capped" -> (Similarity.qDedupEmbeddingLshCapped _),
    "q_ivf_topk" -> (Similarity.qIvfTopK _),
    "q_pq_topk_trained" -> (Similarity.qPqTopKTrained _),
    // oracled since round 11: output = exact distinct (DuckDB recomputes)
    // + an int flag pinning |approx − exact| ≤ 5% — the HLL property is
    // now part of the hashed result instead of a private spec check
    "q_approx_distinct" -> (RelQueries.approxDistinct _),
    // r12: approximate percentile by the same exact+bound-flag device —
    // the GK sketch's rank-error contract pinned against the exact
    // quantiles DuckDB recomputes
    "q_approx_percentile" -> (RelQueries.approxPercentile _),
  )

  /** DuckDB-side literal for the q_linear_predict demo weights. */
  private val wLit: String =
    VectorOps.demoWeights.mkString("[", ", ", "]")

  /** The 64-element sequential dot-product fold both engines share. */
  private def dotSql(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1,65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)),'sum')"

  /** The shared conv-block CTEs of the conv-family scorers: z = the 72
    * ReLU'd valid-conv cells (explicit left-associated 9-term sums over
    * the 8×8 row-major embedding view, 1-based in DuckDB), p = the
    * greatest-of-4 2×2 max-pool — max/ReLU are exact in doubles, so the
    * conv block carries no float-fold risk; literals interpolated from
    * VectorOps.conv* (single source of truth, mirror of
    * VectorOps.convPooledFrame). */
  private lazy val convPooledCtes: String = {
    import VectorOps._
    val zCols = (for { f <- 0 until convFilters; r <- 0 until 6; c <- 0 until 6 } yield {
      val terms = (for { i <- 0 until 3; j <- 0 until 3 } yield
        s"CAST(embedding[${(r + i) * 8 + (c + j) + 1}] AS DOUBLE) * ${convKernel(f)(i * 3 + j)}")
        .mkString(" + ")
      s"greatest($terms + ${convBias(f)}, 0.0) AS z_${f}_${r}_$c"
    }).mkString(", ")
    val pCols = (for { f <- 0 until convFilters; pr <- 0 until 3; pc <- 0 until 3 } yield {
      s"greatest(z_${f}_${2 * pr}_${2 * pc}, z_${f}_${2 * pr}_${2 * pc + 1}, " +
        s"z_${f}_${2 * pr + 1}_${2 * pc}, z_${f}_${2 * pr + 1}_${2 * pc + 1}) AS p${f * 9 + pr * 3 + pc}"
    }).mkString(", ")
    s"z AS (SELECT vec_id, $zCols FROM embeddings), " +
      s"p AS (SELECT vec_id, $pCols FROM z)"
  }

  /** Shared int8-quantization fragments (mirror Similarity.quantized):
    * inner SELECT computes the per-vector scale, outer applies the
    * floor(x·scale + 0.5) code map. */
  private val quantizeScaleSql: String =
    "SELECT vec_id, embedding, CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0 THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) ELSE 0.0 END AS scale"
  private val quantizeQSql: String =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INTEGER)) AS q"

  /** Shared CTE prefix for the ngram-dedup oracles: distinct trigram
    * shingle rows per document (s0), the df-capped subset (s1 — mirrors
    * TextOps.shingleRows; the cap is interpolated from
    * TextOps.shingleDfCap so the oracle cannot silently drift from the
    * Spark side), and per-doc shingle counts (cnt). */
  /** Shared CTE prefix for the unigram-LM oracles: per-token −ln p
    * rounded to 6 dp as DECIMAL(18,6) (`cost`), mirroring
    * TextOps.unigramScores. */
  private val unigramCte: String =
    "WITH tk AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM documents), " +
      "tf AS (SELECT t, COUNT(*) AS c FROM tk GROUP BY t), " +
      "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tf), " +
      "cost AS (SELECT doc_id, CAST(ROUND(-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS nll FROM tk JOIN tf USING (t) CROSS JOIN tot)"

  /** Shingle CTE chain (tok/s0/s1/cnt) for span length `w` — ONE
    * builder for every shingle-shaped oracle (ngram w=3, substring
    * w=20, the pipelines' embedded copies) so a change to the shingle
    * shape cannot silently diverge between them. `src` is the source
    * relation (a prior CTE for the pipelines) and `p` prefixes the CTE
    * names so several chains can coexist in one statement. */
  private def shingleChain(w: Int, src: String, p: String): String =
    s"${p}tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src), " +
      s"${p}s0 AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + $w AS INTEGER)], ' ') AS s FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - $w, 0) + 1)) AS i FROM ${p}tok))), " +
      s"${p}s1 AS (SELECT doc_id, s FROM ${p}s0 WHERE s IN (SELECT s FROM ${p}s0 GROUP BY s HAVING COUNT(*) <= ${text.TextOps.shingleDfCap})), " +
      s"${p}cnt AS (SELECT doc_id, COUNT(*) AS n FROM ${p}s1 GROUP BY doc_id)"

  private def shingleCte(w: Int): String =
    "WITH " + shingleChain(w, "documents", "")

  private val ngramShingleCte: String = shingleCte(3)

  /** SimHash CTE prefix (tk/sh_h/sb) shared by the exact and banded
    * oracles: md5-derived token hash (the [[hex60Sql]] positional-sum
    * mirror of TextOps.baseHash) + the 32 conditional ±1 bit sums. */
  private lazy val simhashBitSumsCte: String = {
    val bitSums = (0 until 32)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(", ")
    "WITH tk AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM documents), " +
      s"sh_h AS (SELECT doc_id, ${hex60Sql("m")} AS h FROM (SELECT doc_id, md5(t) AS m FROM tk)), " +
      s"sb AS (SELECT doc_id, $bitSums FROM sh_h GROUP BY doc_id)"
  }

  /** MinHash candidate+verify CTE chain (appended after
    * [[ngramShingleCte]]): base hash h = int(md5(s)[1..15], 16) mod p —
    * DuckDB computes the hex prefix as a 15-term positional sum, the
    * exact value Spark gets from conv() in TextOps.baseHash — then
    * permutation j is (a_j·h + b_j) mod p with a/b/p interpolated from
    * TextOps (single source of truth). Bands of r rows hash with md5
    * over the comma-joined slice (= TextOps.bandKeys), candidates
    * equi-join on (band, bh), and exact Jaccard over the UNCAPPED s0
    * shingle sets verifies (mirroring nearDupPairs, which filters on
    * the unrounded jaccard). Yields `mh(id_a, id_b, jac)`. */
  /** DuckDB mirror of TextOps.baseHash60: the 15-hex-char md5 prefix as
    * a BIGINT positional sum (the exact value Spark's conv() computes).
    * `m` is a column already holding the md5 hex digest. */
  private def hex60Sql(m: String): String =
    (1 to 15)
      .map(i => s"(CAST(strpos('0123456789abcdef', substring($m, $i, 1)) AS BIGINT) - 1) * ${1L << (4 * (15 - i))}")
      .mkString("(", " + ", ")")

  /** hh/sig/bnd: base hash, 32 permutation minima, banded keys. */
  private val minhashSigCtes: String = {
    val perms = text.TextOps.minhashPerms
    val r = perms / text.TextOps.minhashBands
    val p = text.TextOps.prime
    val aLit = text.TextOps.permA.mkString("([", ", ", "])")
    val bLit = text.TextOps.permB.mkString("([", ", ", "])")
    s"hh AS (SELECT doc_id, ${hex60Sql("m")} % $p AS h FROM (SELECT doc_id, md5(s) AS m FROM s1)), " +
      s"sig AS (SELECT doc_id, j, MIN(($aLit[CAST(j + 1 AS INTEGER)] * h + $bLit[CAST(j + 1 AS INTEGER)]) % $p) AS m FROM hh CROSS JOIN (SELECT UNNEST(range(0, $perms)) AS j) perms GROUP BY doc_id, j), " +
      s"bnd AS (SELECT doc_id, CAST(j // $r AS INTEGER) AS band, md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY j)) AS bh FROM sig GROUP BY doc_id, band)"
  }

  /** Exact Jaccard over the UNCAPPED s0 shingle sets for a `cand`
    * (id_a, id_b) CTE — yields `mh(id_a, id_b, jac)`. */
  private val minhashVerifyCtes: String =
    "c0 AS (SELECT doc_id, COUNT(*) AS n FROM s0 GROUP BY doc_id), " +
      "inter AS (SELECT id_a, id_b, COUNT(*) AS ni FROM cand JOIN s0 sa ON sa.doc_id = cand.id_a JOIN s0 sb ON sb.doc_id = cand.id_b AND sb.s = sa.s GROUP BY id_a, id_b), " +
      "mh AS (SELECT id_a, id_b, CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) AS jac FROM inter JOIN c0 ca ON ca.doc_id = id_a JOIN c0 cb ON cb.doc_id = id_b)"

  private val minhashPairsCte: String =
    s"$minhashSigCtes, " +
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bnd a JOIN bnd b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id), " +
      minhashVerifyCtes

  /** Capped variant (r15): hot (band, bh) buckets star-expand against
    * their min-id rep — the q_dedup_simhash_capped CTE shape on banded
    * MinHash keys. */
  private val minhashCappedPairsCte: String =
    s"$minhashSigCtes, " +
      s"mccnt AS (SELECT band, bh, COUNT(*) > ${text.TextOps.minhashBandBucketCap} AS hot FROM bnd GROUP BY band, bh), " +
      "mctg AS (SELECT k.doc_id, k.band, k.bh, c.hot FROM bnd k JOIN mccnt c ON k.band = c.band AND k.bh = c.bh), " +
      "mccpp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM mctg a JOIN mctg b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id WHERE NOT a.hot AND NOT b.hot), " +
      "mcrp AS (SELECT band, bh, MIN(doc_id) AS id_a FROM mctg WHERE hot GROUP BY band, bh), " +
      "mcspp AS (SELECT r.id_a, h.doc_id AS id_b FROM mctg h JOIN mcrp r ON h.band = r.band AND h.bh = r.bh AND h.doc_id <> r.id_a WHERE h.hot), " +
      "cand AS (SELECT DISTINCT id_a, id_b FROM (SELECT * FROM mccpp UNION ALL SELECT * FROM mcspp)), " +
      minhashVerifyCtes

  /** Recursive-CTE connected components over the MinHash edge set (jac
    * >= 0.6, the nearDupPairs threshold) — shared by the banded and
    * star cluster oracles: both algorithms compute the SAME fixpoint
    * (min doc_id per component over all documents), so one oracle
    * serves both gate keys. */
  private val minhashClusterSql: String =
    s"${ngramShingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, $minhashPairsCte, " +
      "pairs AS MATERIALIZED (SELECT id_a, id_b FROM mh WHERE jac >= 0.6), " +
      "edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs), " +
      "comp(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.id) " +
      "SELECT id AS doc_id, MIN(lbl) AS cluster_id, (id = MIN(lbl)) AS keep FROM comp GROUP BY id ORDER BY doc_id"

  /** Stages 0–4 of the composed v2/v3 pipeline oracles (scrub → gates →
    * exact dedup → substring dedup), ending at the base3 survivor CTE —
    * shared so the v3 oracle cannot drift from v2's stage chain (the
    * SQL twin of TextOps.pipelineGatedDeduped). */
  private lazy val pipelineV2PrefixSql: String = {
      val stop = TextOps.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      val evalIn = s"substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(TextOps.decontamEvalFraction)}'"
      val inj = "CASE WHEN doc_id % 7 = 0 THEN concat('contact user', CAST(doc_id AS VARCHAR), '@example.com via https://example.org/u/', CAST(doc_id AS VARCHAR), ' ', text) ELSE text END"
      "WITH RECURSIVE " +
        // stage 0: PII inject + scrub — every later CTE reads d
        s"d AS MATERIALIZED (SELECT doc_id, source, regexp_replace(regexp_replace($inj, '${TextOps.emailRe}', '<EMAIL>', 'g'), '${TextOps.urlRe}', '<URL>', 'g') AS text FROM documents), " +
        s"${shingleChain(3, "d", "")}, " +
        // stage 1a: Gopher composite gate (q_quality_gopher shape)
        s"gop_ok AS (SELECT doc_id FROM (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens, ROUND(CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum') AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS mean_token_len, CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS INTEGER) AS stop_hits, ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS distinct_ratio FROM tok) WHERE n_tokens >= ${TextOps.gopherMinTokens} AND n_tokens <= ${TextOps.gopherMaxTokens} AND mean_token_len >= CAST(${TextOps.gopherMeanLenMin} AS DOUBLE) AND mean_token_len <= CAST(${TextOps.gopherMeanLenMax} AS DOUBLE) AND stop_hits >= ${TextOps.gopherMinStopHits} AND distinct_ratio >= CAST(${TextOps.gopherMinDistinctRatio} AS DOUBLE)), " +
        // stage 1b: unigram tail cut (q_quality_tails shape; mid mass survives)
        "utk AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM d), " +
        "utf AS (SELECT t, COUNT(*) AS c FROM utk GROUP BY t), " +
        "utot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM utf), " +
        "ucost AS (SELECT doc_id, CAST(ROUND(-ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS nll FROM utk JOIN utf USING (t) CROSS JOIN utot), " +
        "usc AS (SELECT doc_id, ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll FROM ucost GROUP BY doc_id), " +
        "ucut AS (SELECT ROUND(quantile_cont(avg_nll, 0.1), 6) AS p10, ROUND(quantile_cont(avg_nll, 0.9), 6) AS p90 FROM usc), " +
        "tail_ok AS (SELECT doc_id FROM usc CROSS JOIN ucut WHERE avg_nll > p10 AND avg_nll < p90), " +
        // stage 1c: quality gate (q_quality_score shape)
        s"qual_ok AS (SELECT doc_id FROM (SELECT doc_id, ROUND((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5 + (1.0 - CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS DOUBLE) / len(toks)) * 0.5, 6) AS quality FROM tok) WHERE quality >= ${TextOps.pipelineMinQuality}), " +
        // stage 1d: repetition gate (q_quality_repetition shape)
        "g2 AS (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS g FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS i FROM tok)), " +
        "a2 AS (SELECT doc_id, MAX(c) AS max2, SUM(c) AS tot2 FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g) GROUP BY doc_id), " +
        "g3 AS (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 3 AS INTEGER)], ' ') AS g FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM tok)), " +
        "a3 AS (SELECT doc_id, COUNT(*) AS tot3, COUNT(DISTINCT g) AS dist3 FROM g3 GROUP BY doc_id), " +
        s"rep_ok AS (SELECT a2.doc_id FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id WHERE NOT (CAST(max2 AS DOUBLE) / tot2 > ${TextOps.repTopBigramMax} OR 1.0 - CAST(dist3 AS DOUBLE) / tot3 > ${TextOps.repDupTrigramMax})), " +
        // stage 2: decontamination vs the eval carve-out
        s"ev AS (SELECT DISTINCT s FROM s1 WHERE $evalIn), " +
        s"tr AS (SELECT doc_id, s FROM s1 WHERE NOT $evalIn), " +
        "tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id), " +
        "cont AS (SELECT doc_id, COUNT(*) AS nc FROM tr JOIN ev USING (s) GROUP BY doc_id), " +
        s"decon_ok AS (SELECT t.doc_id FROM tot t LEFT JOIN cont c ON t.doc_id = c.doc_id WHERE NOT (CAST(COALESCE(nc, 0) AS DOUBLE) / n_shingles > ${TextOps.pipelineContamMax})), " +
        // gates compose; stage 3: exact dedup
        s"base AS MATERIALIZED (SELECT doc_id, source, text FROM d WHERE NOT $evalIn AND doc_id IN (SELECT doc_id FROM qual_ok) AND doc_id IN (SELECT doc_id FROM gop_ok) AND doc_id IN (SELECT doc_id FROM tail_ok) AND doc_id IN (SELECT doc_id FROM rep_ok) AND doc_id IN (SELECT doc_id FROM decon_ok)), " +
        "base2 AS MATERIALIZED (SELECT * FROM base WHERE doc_id IN (SELECT MIN(doc_id) FROM base GROUP BY md5(text))), " +
        // stage 4: exact-substring dedup (q_dedup_substring shape;
        // min-id-wins — any doc sharing a span with a lower id drops)
        s"${shingleChain(TextOps.substringSpanTokens, "base2", "x")}, " +
        "xh AS (SELECT doc_id, md5(s) AS h FROM xs1), " +
        "xdup AS (SELECT DISTINCT b.doc_id AS doc_id FROM xh a JOIN xh b ON a.h = b.h AND a.doc_id < b.doc_id), " +
        "base3 AS MATERIALIZED (SELECT * FROM base2 WHERE doc_id NOT IN (SELECT doc_id FROM xdup))"
  }

  /** Shared v2/v3 oracle tail: CC over the `cpairs` edge CTE, keep the
    * min-id survivor per component, split assignment + packing. */
  private lazy val pipelineClusterPackTailSql: String =
    ", " +         "cedges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM cpairs UNION ALL SELECT id_b, id_a FROM cpairs), " +
        "comp(id, lbl) AS (SELECT doc_id, doc_id FROM base3 UNION SELECT e.dst, c.lbl FROM comp c JOIN cedges e ON e.src = c.id), " +
        "keepc AS (SELECT id AS doc_id FROM comp GROUP BY id HAVING id = MIN(lbl)), " +
        // stages 6+7: split assignment + packing
        s"fin AS (SELECT doc_id, source, text, CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.8)}' THEN 'train' WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.9)}' THEN 'val' ELSE 'test' END AS split FROM base3 WHERE doc_id IN (SELECT doc_id FROM keepc)), " +
        "tt AS (SELECT doc_id, split || '/' || source AS stream, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM fin), " +
        "o AS (SELECT doc_id, stream, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset FROM tt) " +
        s"SELECT doc_id, stream, n_tokens, tok_offset, CAST(floor(tok_offset / ${TextOps.packBlockTokens}.0) AS BIGINT) AS chunk_first, CAST(floor((tok_offset + n_tokens - 1) / ${TextOps.packBlockTokens}.0) AS BIGINT) AS chunk_last FROM o ORDER BY doc_id"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, CAST(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS disc_price FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, disc_price",
    "q_filter" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND CAST(l_shipdate AS DATE) < DATE '1998-01-01' AND l_discount BETWEEN 0.03 AND 0.08 AND l_quantity < 30 AND l_returnflag IN ('A','R') ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, ship_date",
    "q_join_inner" ->
      "SELECT o_orderkey, c_name, o_totalprice, c_mktsegment FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey",
    "q_join_broadcast" ->
      "SELECT c_custkey, c_name, n_name, r_name FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey",
    "q_join_left" ->
      "SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey ORDER BY c_custkey",
    "q_join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') ORDER BY c_custkey",
    "q_join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) ORDER BY c_custkey",
    "q_join_range" ->
      "SELECT l_orderkey, l_linenumber, p_partkey, p_name FROM lineitem JOIN part ON l_partkey = p_partkey AND l_extendedprice/l_quantity BETWEEN p_retailprice*0.9 AND p_retailprice*1.1 ORDER BY l_orderkey, l_linenumber, p_partkey",
    // bucketing only relocates the shuffle (ingest-time layout), so the
    // oracle is the ordinary join — identical rows prove that
    "q_join_bucketed" ->
      "SELECT o_orderpriority, CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue, COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "q_join_asof" ->
      "SELECT e.event_id, e.user_id, CAST(b.d AS TIMESTAMP) AS o_date, b.okey FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tss FROM events) e ASOF JOIN (SELECT o_custkey, o_orderdate AS d, MAX(o_orderkey) AS okey FROM orders GROUP BY o_custkey, o_orderdate) b ON e.user_id = b.o_custkey AND e.tss >= b.d ORDER BY e.event_id",
    "q_agg_groupby" ->
      "SELECT l_returnflag, l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base, CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q_agg_distinct" ->
      "SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "q_agg_rollup" ->
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST",
    "q_agg_cube" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q_agg_grouping_sets" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM orders GROUP BY GROUPING SETS ((o_orderstatus),(o_orderpriority),()) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q_window_rank" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn, CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk, CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS drk FROM orders ORDER BY o_custkey, o_orderkey",
    "q_window_frame" ->
      "SELECT o_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS o_date, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running, LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_okey, LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_okey FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey",
    "q_topk_per_group" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn",
    "q_sort_limit" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_union_all" ->
      "SELECT okey, tag FROM (SELECT o_orderkey AS okey, 'open' AS tag FROM orders WHERE o_orderstatus = 'O' UNION ALL SELECT o_orderkey AS okey, 'big' AS tag FROM orders WHERE o_totalprice > 400000) ORDER BY okey, tag",
    "q_intersect" ->
      "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' INTERSECT SELECT o_custkey AS c_custkey FROM orders ORDER BY c_custkey",
    "q_except" ->
      "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT' ORDER BY c_custkey",
    "q_string_funcs" ->
      "SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS lo_brand, substring(p_type, 1, 4) AS ty4, CAST(length(p_name) AS INTEGER) AS name_len, concat(p_brand, '#', p_type) AS brand_type, replace(p_name, ' ', '_') AS name_us, string_split(p_name, ' ')[1] AS first_word, lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4, (p_name LIKE '%red%') AS is_red FROM part ORDER BY p_partkey",
    "q_date_funcs" ->
      "SELECT o_orderkey, CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS y, CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS m, CAST(day(CAST(o_orderdate AS DATE)) AS INTEGER) AS dom, CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_start, CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since, CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS d_plus30, CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INTEGER) AS dow FROM orders ORDER BY o_orderkey",
    "q_math_funcs" ->
      "SELECT l_orderkey, l_linenumber, CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil, abs(l_discount - 0.05) AS disc_dev, pow(l_quantity, 2.0) AS qty_sq, sqrt(l_extendedprice) AS price_sqrt, ROUND(ln(l_extendedprice), 6) AS price_ln, CASE WHEN l_discount < 0.03 THEN 'low' WHEN l_discount < 0.06 THEN 'mid' ELSE 'high' END AS disc_tier FROM lineitem ORDER BY l_orderkey, l_linenumber, price_floor, price_ceil, disc_dev, qty_sq, price_sqrt, price_ln, disc_tier",
    "q_json_funcs" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k, CAST(json_extract(props, '$.k') AS INTEGER) AS k_parsed FROM events WHERE CAST(json_extract(props, '$.k') AS INTEGER) > 50 ORDER BY event_id",
    "q_regex_funcs" ->
      "SELECT p_partkey, regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word, regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head, CAST(len(regexp_extract_all(p_name, '[aeiou]', 0)) AS INTEGER) AS n_vowels, regexp_matches(p_name, '^(red|blue)') AS is_primary_color FROM part ORDER BY p_partkey",
    "q_conditional_funcs" ->
      "SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm, greatest(o_totalprice, 100000.0) AS price_floor100k, least(o_totalprice, 400000.0) AS price_cap400k, CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_nn FROM orders ORDER BY o_orderkey",
    "q_array_funcs" ->
      "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n, fr[1] AS e1, fr[2] AS e2, fr[3] AS e3, fr[4] AS e4, ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS mx, ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS mn, ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS sm, so[1] AS s1, so[2] AS s2, so[3] AS s3, so[4] AS s4 FROM (SELECT vec_id, embedding, list_transform(embedding[1:4], x -> ROUND(CAST(x AS DOUBLE), 6)) AS fr, list_sort(list_transform(embedding[1:4], x -> ROUND(CAST(x AS DOUBLE), 6))) AS so FROM embeddings) ORDER BY vec_id",
    "q_subquery_scalar" ->
      "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n FROM lineitem l WHERE l_quantity < (SELECT AVG(l_quantity) * 0.5 FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)",
    "q_pivot" ->
      "SELECT l_returnflag, CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F, CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_unpivot" ->
      "SELECT l_orderkey, l_linenumber, metric, value FROM (SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS value FROM lineitem) ORDER BY l_orderkey, l_linenumber, metric, value",
    "q_percentile" ->
      "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50, quantile_cont(l_quantity, 0.9) AS p90, quantile_cont(l_quantity, 0.99) AS p99 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    // the Spark side emits exact distinct + an int flag that its HLL
    // estimate landed within 5%; DuckDB recomputes the exact side and
    // asserts the flag is 1 — the sketch itself never enters the hash
    "q_approx_distinct" ->
      "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, COUNT(*) AS n, CAST(1 AS INTEGER) AS within_5pct FROM events GROUP BY event_type ORDER BY event_type",
    // approx percentile: DuckDB recomputes the exact quantiles and
    // expects the Spark-computed rank-window flags to hold (= 1)
    "q_approx_percentile" ->
      "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50, quantile_cont(l_extendedprice, 0.95) AS p95, CAST(1 AS INTEGER) AS ok50, CAST(1 AS INTEGER) AS ok95 FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q_window_tumbling" ->
      "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM events GROUP BY 1, 2 ORDER BY hour, event_type",
    // streaming model monitor: per-event 6dp sigmoid over the literal
    // 4-feature scorer (weights interpolated from StreamOps.scoreW/B),
    // DECIMAL(28,6)-summed per tumbling hour x type (the exact sum, not
    // a rounded mean — small-n means tie at the 6dp grid and the
    // engines' rounding splits) — the batch twin of the streaming
    // stateful aggregate
    "q_stream_scored" -> {
      import graft.stream.StreamOps.{scoreW, scoreB}
      val margin = Seq(
        s"CAST(value AS DOUBLE)/100.0 * ${scoreW(0)}",
        s"CAST(user_id % 10 AS DOUBLE)/10.0 * ${scoreW(1)}",
        s"CAST(json_extract(props, '$$.k') AS DOUBLE)/100.0 * ${scoreW(2)}",
        s"CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE)/24.0 * ${scoreW(3)}")
        .mkString(" + ") + s" + $scoreB"
      "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, COUNT(*) AS n, " +
        s"CAST(SUM(CAST(ROUND(1.0/(1.0+exp(-($margin))), 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_prob " +
        "FROM events GROUP BY 1, 2 ORDER BY hour, event_type"
    },
    "q_window_sliding" ->
      "SELECT wstart, COUNT(*) AS n FROM (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - i * INTERVAL 30 MINUTE AS wstart FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i) t) GROUP BY wstart ORDER BY wstart",
    "q_window_session" ->
      "SELECT user_id, session_start, n_events FROM (SELECT user_id, MIN(tss) AS session_start, COUNT(*) AS n_events FROM (SELECT user_id, tss, SUM(CASE WHEN prev IS NULL OR tss - prev >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY tss, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events)) GROUP BY user_id, sid) ORDER BY user_id, session_start",
    // streaming keys: oracle = the batch twin's SQL verbatim — DuckDB
    // can't tell which engine produced the rows, which is the point
    "q_stream_tumbling" ->
      "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM events GROUP BY 1, 2 ORDER BY hour, event_type",
    "q_stream_sliding" ->
      "SELECT wstart, COUNT(*) AS n FROM (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - i * INTERVAL 30 MINUTE AS wstart FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i) t) GROUP BY wstart ORDER BY wstart",
    "q_stream_session" ->
      "SELECT user_id, session_start, n_events FROM (SELECT user_id, MIN(tss) AS session_start, COUNT(*) AS n_events FROM (SELECT user_id, tss, SUM(CASE WHEN prev IS NULL OR tss - prev >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY tss, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev FROM events)) GROUP BY user_id, sid) ORDER BY user_id, session_start",
    // append/watermark path: the batch tumbling SQL restricted to the
    // windows the final watermark CLOSED — window end ≤ ms-floor(max ts)
    // − 1h, mirroring Spark's millisecond watermark arithmetic (the
    // ms floor matters only when max ts − 2h lands inside the first
    // millisecond past an hour boundary, but mirror it exactly anyway)
    "q_stream_append" ->
      ("SELECT hour, event_type, n, sum_value FROM (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM events GROUP BY 1, 2) " +
        "WHERE hour + INTERVAL 1 HOUR <= (SELECT date_trunc('milliseconds', MAX(CAST(ts AS TIMESTAMP))) - INTERVAL 1 HOUR FROM events) ORDER BY hour, event_type"),
    // sliding windows in append mode: the batch sliding SQL restricted
    // to windows whose END (wstart + 1h) the final watermark passed
    "q_stream_append_sliding" ->
      ("SELECT wstart, n FROM (SELECT wstart, COUNT(*) AS n FROM (SELECT time_bucket(INTERVAL 30 MINUTE, CAST(ts AS TIMESTAMP)) - i * INTERVAL 30 MINUTE AS wstart FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i) t) GROUP BY wstart) " +
        "WHERE wstart + INTERVAL 1 HOUR <= (SELECT date_trunc('milliseconds', MAX(CAST(ts AS TIMESTAMP))) - INTERVAL 1 HOUR FROM events) ORDER BY wstart"),
    // stream-stream banded join: oracle = the equivalent batch range
    // join (clicks × purchases on user_id, purchase within 30 min after
    // the click); event ids keep output rows unique
    "q_stream_join" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tss, value FROM events), " +
        "c AS (SELECT event_id AS click_id, user_id, tss AS click_ts, value AS click_value FROM e WHERE event_type = 'click'), " +
        "p AS (SELECT event_id AS purchase_id, user_id, tss AS purchase_ts, value AS purchase_value FROM e WHERE event_type = 'purchase') " +
        "SELECT user_id, click_id, purchase_id, click_ts, purchase_ts, click_value, purchase_value " +
        "FROM c JOIN p USING (user_id) WHERE purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL 30 MINUTE " +
        "ORDER BY user_id, click_id, purchase_id"),
    // LEFT OUTER stream-stream join: matched rows = the batch range
    // join; null rows = unmatched clicks the final watermark evicted
    // (click_ts + 30min < ms-floor(min of the two stream maxima) −
    // 10min — the q_stream_append restriction device)
    "q_stream_join_outer" ->
      ("WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tss, value FROM events), " +
        "c AS (SELECT event_id AS click_id, user_id, tss AS click_ts, value AS click_value FROM e WHERE event_type = 'click'), " +
        "p AS (SELECT event_id AS purchase_id, user_id AS p_user, tss AS purchase_ts, value AS purchase_value FROM e WHERE event_type = 'purchase'), " +
        "wm AS (SELECT LEAST((SELECT date_trunc('milliseconds', MAX(click_ts)) FROM c), (SELECT date_trunc('milliseconds', MAX(purchase_ts)) FROM p)) - INTERVAL 10 MINUTE AS w), " +
        "j AS (SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts, p.purchase_ts, c.click_value, p.purchase_value FROM c JOIN p ON c.user_id = p.p_user AND p.purchase_ts >= c.click_ts AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE), " +
        "um AS (SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.click_ts, CAST(NULL AS TIMESTAMP) AS purchase_ts, c.click_value, CAST(NULL AS DOUBLE) AS purchase_value FROM c WHERE c.click_id NOT IN (SELECT click_id FROM j) AND c.click_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)) " +
        "SELECT * FROM j UNION ALL SELECT * FROM um ORDER BY user_id, click_id, purchase_id"),
    // stream-static incremental dedup: the batch twin's oracle verbatim
    // (same eval-fraction split, md5 digests, min-doc_id keep)
    "q_stream_dedup_incremental" ->
      s"WITH newb AS (SELECT doc_id, md5(text) AS h FROM documents WHERE substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(text.TextOps.decontamEvalFraction)}'), corp AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE NOT substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(text.TextOps.decontamEvalFraction)}'), keep AS (SELECT MIN(doc_id) AS doc_id, h FROM newb GROUP BY h) SELECT k.doc_id, k.h FROM keep k LEFT JOIN corp c ON k.h = c.h WHERE c.h IS NULL ORDER BY k.doc_id",
    // stream-static near-dup ingest gate: band keys over UNCAPPED
    // shingles (s0 — the row-local stream signature can't see document
    // frequencies) on both sides; the CORPUS band table is capped (hot
    // buckets keep their min-id rep — one witness per pile suffices
    // for an ingest decision); exact Jaccard over the same s0 sets
    "q_stream_dedup_neardup" -> {
      val perms = text.TextOps.minhashPerms
      val r = perms / text.TextOps.minhashBands
      val p = text.TextOps.prime
      val aLit = text.TextOps.permA.mkString("([", ", ", "])")
      val bLit = text.TextOps.permB.mkString("([", ", ", "])")
      def evalOf(x: String) =
        s"substring(md5(CAST($x AS VARCHAR)),1,2) < '${text.Sampling.cutHex(text.TextOps.decontamEvalFraction)}'"
      s"$ngramShingleCte, " +
        s"ndhh AS (SELECT doc_id, ${hex60Sql("m")} % $p AS h FROM (SELECT doc_id, md5(s) AS m FROM s0)), " +
        s"ndsig AS (SELECT doc_id, j, MIN(($aLit[CAST(j + 1 AS INTEGER)] * h + $bLit[CAST(j + 1 AS INTEGER)]) % $p) AS m FROM ndhh CROSS JOIN (SELECT UNNEST(range(0, $perms)) AS j) perms GROUP BY doc_id, j), " +
        s"ndbnd AS (SELECT doc_id, CAST(j // $r AS INTEGER) AS band, md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY j)) AS bh FROM ndsig GROUP BY doc_id, band), " +
        // corpus band table CAPPED: hot buckets keep min corpus_id only
        s"corb0 AS (SELECT doc_id, band, bh FROM ndbnd WHERE NOT ${evalOf("doc_id")}), " +
        s"ccnt AS (SELECT band, bh, COUNT(*) > ${text.TextOps.minhashBandBucketCap} AS hot FROM corb0 GROUP BY band, bh), " +
        "ctg AS (SELECT c.doc_id, c.band, c.bh, t.hot FROM corb0 c JOIN ccnt t ON c.band = t.band AND c.bh = t.bh), " +
        "corb AS (SELECT doc_id, band, bh FROM ctg WHERE NOT hot UNION ALL SELECT MIN(doc_id) AS doc_id, band, bh FROM ctg WHERE hot GROUP BY band, bh), " +
        s"cand AS (SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_id FROM ndbnd n JOIN corb c ON n.band = c.band AND n.bh = c.bh WHERE ${evalOf("n.doc_id")}), " +
        "c0 AS (SELECT doc_id, COUNT(*) AS n FROM s0 GROUP BY doc_id), " +
        "inter AS (SELECT cand.doc_id, corpus_id, COUNT(*) AS ni FROM cand JOIN s0 sa ON sa.doc_id = cand.doc_id JOIN s0 sb ON sb.doc_id = cand.corpus_id AND sb.s = sa.s GROUP BY cand.doc_id, corpus_id), " +
        "mh AS (SELECT inter.doc_id, corpus_id, CAST(ni AS DOUBLE) / (ca.n + cb.n - ni) AS jac FROM inter JOIN c0 ca ON ca.doc_id = inter.doc_id JOIN c0 cb ON cb.doc_id = corpus_id) " +
        "SELECT doc_id, corpus_id, ROUND(jac, 6) AS jaccard FROM mh WHERE jac >= 0.6 ORDER BY doc_id, corpus_id"
    },
    // §2.A
    "q_minmax_scale" ->
      "SELECT l_orderkey, l_linenumber, ROUND((l_quantity - MIN(l_quantity) OVER ()) / (MAX(l_quantity) OVER () - MIN(l_quantity) OVER ()), 6) AS scaled FROM lineitem ORDER BY l_orderkey, l_linenumber, scaled",
    "q_onehot" ->
      "SELECT vec_id, label, CAST(generate_subscripts(oh, 1) AS INTEGER) AS idx, UNNEST(oh) AS ind FROM (SELECT vec_id, label, list_transform(range(0, 10), i -> CASE WHEN i = label THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END) AS oh FROM embeddings) ORDER BY vec_id, idx",
    "q_argmax" ->
      "SELECT vec_id, CAST(list_position(embedding, list_max(embedding)) - 1 AS BIGINT) AS pred FROM embeddings ORDER BY vec_id",
    "q_vector_assemble" ->
      "SELECT l_orderkey, l_linenumber, CAST(generate_subscripts(f, 1) AS INTEGER) AS idx, UNNEST(f) AS fval FROM (SELECT l_orderkey, l_linenumber, [l_quantity, l_discount, l_tax] AS f FROM lineitem) ORDER BY l_orderkey, l_linenumber, idx, fval",
    "q_linear_predict" ->
      s"SELECT vec_id, ROUND(${dotSql("embedding", wLit)} + ${VectorOps.demoBias}, 6) AS pred FROM embeddings ORDER BY vec_id",
    // MLP forward pass: hidden tanh units then a sigmoid, all literals
    // interpolated from VectorOps.mlp* (single source of truth); the
    // weighted sum is written in the same left-associated order as the
    // Spark reduce so the double arithmetic folds identically
    "q_mlp_predict" -> {
      val hCols = (0 until VectorOps.mlpHidden).map { j =>
        val w1 = VectorOps.mlpW1(j).mkString("[", ", ", "]")
        // tanh via exp, mirroring qMlpPredict.tanhViaExp term for term
        s"1.0 - 2.0/(exp(2.0*(${dotSql("embedding", w1)} + ${VectorOps.mlpB1(j)}))+1.0) AS h$j"
      }.mkString(", ")
      val zSum = (0 until VectorOps.mlpHidden)
        .map(j => s"h$j * ${VectorOps.mlpW2(j)}").mkString(" + ")
      s"WITH h AS (SELECT vec_id, $hCols FROM embeddings) " +
        s"SELECT vec_id, ROUND(1.0/(1.0+exp(-($zSum + ${VectorOps.mlpB2}))), 6) AS mlp_prob FROM h ORDER BY vec_id"
    },
    // K-way softmax head: per-class logits via dot products,
    // max-subtracted exponentials (greatest + exp mirrored literally),
    // left-associated normalizer sum, argmax CASE with ties to the
    // smallest class index — the SoftmaxMlpModel.predictLabel semantics
    "q_softmax_predict" -> {
      import VectorOps._
      val zs = (0 until smClasses).map { k =>
        val w = smW(k).mkString("[", ", ", "]")
        s"${dotSql("embedding", w)} + ${smB(k)}"
      }
      val zCols = zs.zipWithIndex.map { case (z, k) => s"$z AS z$k" }.mkString(", ")
      val mx = s"greatest(${(0 until smClasses).map(k => s"z$k").mkString(", ")})"
      val eCols = (0 until smClasses).map(k => s"exp(z$k - $mx) AS e$k").mkString(", ")
      val tot = (0 until smClasses).map(k => s"e$k").mkString(" + ")
      val pCols = (0 until smClasses)
        .map(k => s"ROUND(e$k / ($tot), 6) AS p$k").mkString(", ")
      val argmax = (0 until smClasses - 1).map { k =>
        val cond = (k + 1 until smClasses).map(j => s"z$k >= z$j").mkString(" AND ")
        s"WHEN $cond THEN $k"
      }.mkString("CASE ", " ", s" ELSE ${smClasses - 1} END")
      s"WITH z AS (SELECT vec_id, $zCols FROM embeddings), " +
        s"e AS (SELECT vec_id, $argmax AS pred_class, $eCols FROM z) " +
        s"SELECT vec_id, pred_class, $pCols FROM e ORDER BY vec_id"
    },
    // deep (2-hidden-layer) MLP forward pass: hidden-1 tanh units from
    // dot products, hidden-2 tanh units over the h columns, sigmoid out —
    // every weighted sum left-associated to mirror the Spark reduce
    "q_mlp2_predict" -> {
      import VectorOps._
      def tanhSql(x: String): String = s"1.0 - 2.0/(exp(2.0*($x))+1.0)"
      val h1Cols = (0 until mlp2Hidden1).map { j =>
        val w1 = mlp2W1(j).mkString("[", ", ", "]")
        s"${tanhSql(s"${dotSql("embedding", w1)} + ${mlp2B1(j)}")} AS h$j"
      }.mkString(", ")
      val h2Cols = (0 until mlp2Hidden2).map { k =>
        val zk = (0 until mlp2Hidden1)
          .map(j => s"h$j * ${mlp2W2(k)(j)}").mkString(" + ")
        s"${tanhSql(s"$zk + ${mlp2B2(k)}")} AS g$k"
      }.mkString(", ")
      val zOut = (0 until mlp2Hidden2)
        .map(k => s"g$k * ${mlp2W3(k)}").mkString(" + ")
      s"WITH h AS (SELECT vec_id, $h1Cols FROM embeddings), " +
        s"g AS (SELECT vec_id, $h2Cols FROM h) " +
        s"SELECT vec_id, ROUND(1.0/(1.0+exp(-($zOut + ${mlp2B3}))), 6) AS mlp2_prob FROM g ORDER BY vec_id"
    },
    // convnet forward pass: 72 ReLU'd valid-conv cells (explicit
    // left-associated 9-term sums over the 8×8 row-major embedding
    // view, 1-based in DuckDB), greatest-of-4 max-pool, dense sigmoid —
    // all literals interpolated from VectorOps.conv* (single source of
    // truth); max/ReLU are exact so only the final sigmoid is
    // transcendental, the exact device q_mlp_predict proved
    "q_conv_predict" -> {
      import VectorOps._
      val zSum = (0 until convPooled).map(k => s"p$k * ${convDenseW(k)}").mkString(" + ")
      s"WITH $convPooledCtes " +
        s"SELECT vec_id, ROUND(1.0/(1.0+exp(-($zSum + $convDenseB))), 6) AS conv_prob FROM p ORDER BY vec_id"
    },
    // full flagship architecture: the conv z/p CTEs joined to the
    // softmax head device of q_softmax_predict (max-subtracted
    // exponentials, left-associated normalizer, argmax CASE with ties
    // to the smallest class) — all literals interpolated from
    // VectorOps.conv*/csm* (single source of truth)
    "q_conv_softmax_predict" -> {
      import VectorOps._
      val zCols = (0 until csmClasses).map { k =>
        val zk = (0 until convPooled).map(j => s"p$j * ${csmDenseW(k)(j)}")
          .mkString(" + ")
        s"$zk + ${csmDenseB(k)} AS z$k"
      }.mkString(", ")
      val mx = s"greatest(${(0 until csmClasses).map(k => s"z$k").mkString(", ")})"
      val eCols = (0 until csmClasses).map(k => s"exp(z$k - $mx) AS e$k").mkString(", ")
      val tot = (0 until csmClasses).map(k => s"e$k").mkString(" + ")
      val pCols = (0 until csmClasses)
        .map(k => s"ROUND(e$k / ($tot), 6) AS cp$k").mkString(", ")
      val argmax = (0 until csmClasses - 1).map { k =>
        val cond = (k + 1 until csmClasses).map(j => s"z$k >= z$j").mkString(" AND ")
        s"WHEN $cond THEN $k"
      }.mkString("CASE ", " ", s" ELSE ${csmClasses - 1} END")
      s"WITH $convPooledCtes, lg AS (SELECT vec_id, $zCols FROM p), " +
        s"e AS (SELECT vec_id, $argmax AS pred_class, $eCols FROM lg) " +
        s"SELECT vec_id, pred_class, $pCols FROM e ORDER BY vec_id"
    },
    // one full-batch logistic gradient step: per-row p rounded to 6 dp
    // (the q_eval_metrics device — both engines agree on every err),
    // per-coordinate terms rounded to 9 dp and summed as DECIMAL(28,9)
    // (addition-order-proof), bias as the constant-1 65th coordinate;
    // weight literals interpolated from VectorOps.demoWeights/demoBias
    "q_sgd_step" -> {
      import VectorOps._
      val wall = (demoWeights :+ demoBias).mkString("[", ", ", "]")
      s"WITH s AS (SELECT ROUND(1.0/(1.0+exp(-(${dotSql("embedding", wLit)} + $demoBias))), 6) - (label % 2) AS err, " +
        "list_concat(list_transform(embedding, v -> CAST(v AS DOUBLE)), [1.0]) AS xs FROM embeddings), " +
        "g AS (SELECT CAST(i - 1 AS INTEGER) AS idx, " +
        "SUM(CAST(ROUND(err * xs[CAST(i AS INTEGER)], 9) AS DECIMAL(28,9))) AS gsum, COUNT(*) AS n " +
        "FROM (SELECT err, xs, UNNEST(range(1, 66)) AS i FROM s) GROUP BY 1) " +
        s"SELECT idx, ROUND(($wall)[idx + 1], 6) AS w_old, " +
        s"ROUND(($wall)[idx + 1] - 0.1 * (CAST(gsum AS DOUBLE) / n), 6) AS w_new " +
        "FROM g ORDER BY idx"
    },
    // the multi-class gradient step: per-row softmax deltas (stable,
    // 6dp-rounded) exploded over class THEN coordinate in separate
    // subqueries (same-select UNNESTs would zip, not cross), 9dp terms
    // DECIMAL-summed per (k, idx) cell; nested weight-array literal
    // interpolated from VectorOps.smW/smB
    "q_softmax_sgd_step" -> {
      import VectorOps._
      val zs = (0 until smClasses).map { k =>
        val w = smW(k).mkString("[", ", ", "]")
        s"${dotSql("embedding", w)} + ${smB(k)} AS z$k"
      }.mkString(", ")
      val mx = s"greatest(${(0 until smClasses).map(k => s"z$k").mkString(", ")})"
      val tot = (0 until smClasses).map(k => s"exp(z$k - $mx)").mkString(" + ")
      val ds = (0 until smClasses).map(k =>
        s"ROUND(exp(z$k - $mx) / ($tot), 6) - CASE WHEN y = $k THEN 1.0 ELSE 0.0 END")
        .mkString("[", ", ", "]")
      val wall = (0 until smClasses)
        .map(k => (smW(k) :+ smB(k)).mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"WITH z AS (SELECT (label % $smClasses) AS y, " +
        "list_concat(list_transform(embedding, v -> CAST(v AS DOUBLE)), [1.0]) AS xs, " +
        s"$zs FROM embeddings), " +
        s"d AS (SELECT xs, $ds AS ds FROM z), " +
        s"ek AS (SELECT xs, ds, UNNEST(range(0, $smClasses)) AS k FROM d), " +
        "ei AS (SELECT k, ds[CAST(k + 1 AS INTEGER)] AS dd, xs, UNNEST(range(1, 66)) AS i FROM ek), " +
        "g AS (SELECT CAST(k AS INTEGER) AS k, CAST(i - 1 AS INTEGER) AS idx, " +
        "SUM(CAST(ROUND(dd * xs[CAST(i AS INTEGER)], 9) AS DECIMAL(28,9))) AS gsum, COUNT(*) AS n " +
        "FROM ei GROUP BY 1, 2) " +
        s"SELECT k, idx, ROUND(($wall)[k + 1][idx + 1], 6) AS w_old, " +
        s"ROUND(($wall)[k + 1][idx + 1] - 0.1 * (CAST(gsum AS DOUBLE) / n), 6) AS w_new " +
        "FROM g ORDER BY k, idx"
    },
    "q_accuracy" ->
      "SELECT ROUND(AVG(CASE WHEN (list_position(embedding, list_max(embedding)) - 1) % 10 = label THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 6) AS acc FROM embeddings",
    // int8-quantized inference: weight codes + scale interpolated from
    // VectorOps.int8Weight* (single source of truth), embedding side
    // via the shared quantize fragments, exact BIGINT code dot, one
    // double rescale into the sigmoid
    "q_linear_predict_int8" -> {
      import VectorOps._
      val dotQ = (0 until 64)
        .map(i => s"CAST(q[${i + 1}] AS BIGINT) * ${int8WeightCodes(i)}")
        .mkString(" + ")
      s"WITH s AS ($quantizeScaleSql FROM embeddings), " +
        s"qt AS (SELECT vec_id, scale, $quantizeQSql FROM s), " +
        s"d AS (SELECT vec_id, scale, $dotQ AS dot_q FROM qt) " +
        "SELECT vec_id, dot_q, " +
        s"ROUND(1.0/(1.0+exp(-(CASE WHEN scale > 0 THEN CAST(dot_q AS DOUBLE) / (scale * $int8WeightScale) ELSE 0.0 END + $demoBias))), 6) AS prob_int8 " +
        "FROM d ORDER BY vec_id"
    },
    // multi-class evaluator: confusion grid first (K^2 rows leave the
    // shuffle), then one-vs-rest tp/fp/fn per class unpivoted from the
    // grid; argmax CASE mirrored from q_softmax_predict; NULLIF guards
    // align the engines' divide-by-zero behavior (NULL vs inf)
    "q_multiclass_metrics" -> {
      import VectorOps._
      val zs = (0 until smClasses).map { k =>
        val w = smW(k).mkString("[", ", ", "]")
        s"${dotSql("embedding", w)} + ${smB(k)} AS z$k"
      }.mkString(", ")
      val argmax = (0 until smClasses - 1).map { k =>
        val cond = (k + 1 until smClasses).map(j => s"z$k >= z$j").mkString(" AND ")
        s"WHEN $cond THEN $k"
      }.mkString("CASE ", " ", s" ELSE ${smClasses - 1} END")
      val classes = (0 until smClasses).mkString("[", ", ", "]")
      s"WITH z AS (SELECT (label % $smClasses) AS y, $zs FROM embeddings), " +
        s"s AS (SELECT y, $argmax AS pred FROM z), " +
        "c AS (SELECT y, pred, COUNT(*) AS n FROM s GROUP BY 1, 2), " +
        s"e AS (SELECT k.class, c.y, c.pred, c.n FROM c CROSS JOIN (SELECT UNNEST($classes) AS class) k), " +
        "m AS (SELECT class, CAST(SUM(CASE WHEN y = class AND pred = class THEN n ELSE 0 END) AS BIGINT) AS tp, " +
        "CAST(SUM(CASE WHEN y <> class AND pred = class THEN n ELSE 0 END) AS BIGINT) AS fp, " +
        "CAST(SUM(CASE WHEN y = class AND pred <> class THEN n ELSE 0 END) AS BIGINT) AS fn FROM e GROUP BY 1) " +
        "SELECT class, tp, fp, fn, " +
        "ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS prec, " +
        "ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall, " +
        "ROUND(2.0 * tp / NULLIF(2 * tp + fp + fn, 0), 6) AS f1 " +
        "FROM m ORDER BY class"
    },
    // categorical cross-entropy of the softmax head: stable softmax
    // p_y via 1-based list pick, -ln clamped at 1e-12, per-row rounded
    // 6 dp then DECIMAL(28,6)-summed (order-proof) before the mean
    "q_cross_entropy" -> {
      import VectorOps._
      val zs = (0 until smClasses).map { k =>
        val w = smW(k).mkString("[", ", ", "]")
        s"${dotSql("embedding", w)} + ${smB(k)} AS z$k"
      }.mkString(", ")
      val mx = s"greatest(${(0 until smClasses).map(k => s"z$k").mkString(", ")})"
      val es = (0 until smClasses).map(k => s"exp(z$k - $mx)").mkString(", ")
      val tot = (0 until smClasses).map(k => s"exp(z$k - $mx)").mkString(" + ")
      s"WITH z AS (SELECT (label % $smClasses) AS y, $zs FROM embeddings), " +
        s"c AS (SELECT ROUND(-ln(greatest(([$es])[y + 1] / ($tot), 1e-12)), 6) AS ce FROM z) " +
        "SELECT ROUND(CAST(SUM(CAST(ce AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS mean_ce, COUNT(*) AS n FROM c"
    },
    // top-k categorical accuracy: the true class hits when fewer than
    // k logits strictly beat it (equal logits at smaller indices count
    // against it — the q_softmax_predict argmax tie-break, so top-1
    // here equals argmax accuracy); 0/1 hits make the AVG exact
    "q_topk_accuracy" -> {
      import VectorOps._
      val zs = (0 until smClasses).map { k =>
        val w = smW(k).mkString("[", ", ", "]")
        s"${dotSql("embedding", w)} + ${smB(k)} AS z$k"
      }.mkString(", ")
      val zy = s"([${(0 until smClasses).map(k => s"z$k").mkString(", ")}])[y + 1]"
      val rank = (0 until smClasses).map(j =>
        s"CASE WHEN z$j > zy OR (z$j = zy AND $j < y) THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"WITH z AS (SELECT (label % $smClasses) AS y, $zs FROM embeddings), " +
        s"r AS (SELECT y, $zy AS zy, z0" +
        (1 until smClasses).map(k => s", z$k").mkString + " FROM z), " +
        s"s AS (SELECT ($rank) AS rnk FROM r) " +
        "SELECT ROUND(AVG(CASE WHEN rnk < 1 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 6) AS top1_acc, " +
        "ROUND(AVG(CASE WHEN rnk < 2 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END), 6) AS top2_acc, " +
        "COUNT(*) AS n FROM s"
    },
    // binned ROC curve: 256 fixed score cells (p rounded to 6 dp BEFORE
    // binning — both engines agree on every cell), per-bin exact counts,
    // descending-threshold cumulative tpr/fpr over the <=256 bin rows
    "q_roc_curve" ->
      s"""WITH s AS (SELECT ROUND(1.0/(1.0+exp(-(${dotSql("embedding", wLit)} + ${VectorOps.demoBias}))), 6) AS p, CAST((list_position(embedding, list_max(embedding)) - 1) % 2 AS INTEGER) AS y FROM embeddings), b AS (SELECT CAST(least(floor(p*256), 255) AS INTEGER) AS bin, CAST(SUM(y) AS BIGINT) AS n_pos, CAST(SUM(1-y) AS BIGINT) AS n_neg FROM s GROUP BY 1), c AS (SELECT bin, n_pos, n_neg, SUM(n_pos) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos, SUM(n_neg) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_neg FROM b), t AS (SELECT SUM(n_pos) AS tot_pos, SUM(n_neg) AS tot_neg FROM b) SELECT bin, n_pos, n_neg, ROUND(CAST(cum_pos AS DOUBLE)/NULLIF(tot_pos, 0), 6) AS tpr, ROUND(CAST(cum_neg AS DOUBLE)/NULLIF(tot_neg, 0), 6) AS fpr FROM c CROSS JOIN t ORDER BY bin DESC""",
    // cumulative lift/capture at descending score cutoffs over the same
    // 256-cell reduction: lift = precision-above-cutoff / base rate
    "q_lift_curve" ->
      s"""WITH s AS (SELECT ROUND(1.0/(1.0+exp(-(${dotSql("embedding", wLit)} + ${VectorOps.demoBias}))), 6) AS p, CAST((list_position(embedding, list_max(embedding)) - 1) % 2 AS INTEGER) AS y FROM embeddings), b AS (SELECT CAST(least(floor(p*256), 255) AS INTEGER) AS bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos FROM s GROUP BY 1), c AS (SELECT bin, n, n_pos, SUM(n) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n, SUM(n_pos) OVER (ORDER BY bin DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos FROM b), t AS (SELECT SUM(n) AS tot_n, SUM(n_pos) AS tot_pos FROM b) SELECT bin, n, n_pos, ROUND((CAST(cum_pos AS DOUBLE)/cum_n)/NULLIF(CAST(tot_pos AS DOUBLE)/tot_n, 0.0), 6) AS lift, ROUND(CAST(cum_pos AS DOUBLE)/NULLIF(tot_pos, 0), 6) AS capture FROM c CROSS JOIN t ORDER BY bin DESC""",
    "q_string_index" ->
      "WITH f AS (SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment), i AS (SELECT c_mktsegment, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, c_mktsegment) - 1 AS BIGINT) AS seg_idx FROM f) SELECT c_custkey, c.c_mktsegment, seg_idx FROM customer c JOIN i ON c.c_mktsegment = i.c_mktsegment ORDER BY c_custkey",
    "q_bucketize" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice >= 300000.0 AND o_totalprice <= 1e9 THEN CAST(3 AS BIGINT) WHEN o_totalprice >= 200000.0 AND o_totalprice < 300000.0 THEN 2 WHEN o_totalprice >= 100000.0 AND o_totalprice < 200000.0 THEN 1 WHEN o_totalprice >= 0.0 AND o_totalprice < 100000.0 THEN 0 ELSE -1 END AS price_bucket FROM orders ORDER BY o_orderkey",
    // binary evaluator: prob rounded to 6 BEFORE thresholding/binning so
    // both engines agree on every decision; binned (1024) AUC mirrors
    // Evaluator.binaryMetrics term for term
    "q_eval_metrics" ->
      s"""WITH s AS (SELECT ROUND(1.0/(1.0+exp(-(${dotSql("embedding", wLit)} + ${VectorOps.demoBias}))), 6) AS p, CAST((list_position(embedding, list_max(embedding)) - 1) % 2 AS INTEGER) AS y FROM embeddings), b AS (SELECT CAST(least(floor(p*1024), 1023) AS INTEGER) AS bin, CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred, y FROM s), c AS (SELECT SUM(CASE WHEN pred=1 AND y=1 THEN 1 ELSE 0 END) AS tp, SUM(CASE WHEN pred=1 AND y=0 THEN 1 ELSE 0 END) AS fp, SUM(CASE WHEN pred=0 AND y=1 THEN 1 ELSE 0 END) AS fn FROM b), h AS (SELECT bin, CAST(SUM(y) AS DOUBLE) AS pos, CAST(SUM(1-y) AS DOUBLE) AS neg FROM b GROUP BY bin), a AS (SELECT SUM(pos*neg_below) + 0.5*SUM(pos*neg) AS num, SUM(pos) AS npos, SUM(neg) AS nneg FROM (SELECT pos, neg, COALESCE(SUM(neg) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS neg_below FROM h)) SELECT ROUND(CAST(tp AS DOUBLE)/(tp+fp), 6) AS prec, ROUND(CAST(tp AS DOUBLE)/(tp+fn), 6) AS recall, ROUND(2.0*tp/(2.0*tp+fp+fn), 6) AS f1, ROUND(num/(npos*nneg), 6) AS auc FROM c CROSS JOIN a""",
    "q_vec_avg_by_label" ->
      "SELECT label, idx, ROUND(AVG(CAST(v AS DOUBLE)), 6) AS avg_v FROM (SELECT label, CAST(generate_subscripts(embedding, 1) AS INTEGER) AS idx, UNNEST(embedding) AS v FROM embeddings) GROUP BY label, idx ORDER BY label, idx",
    "q_reshape" ->
      "SELECT vec_id, CAST((i - 1) // 8 AS INTEGER) AS r, CAST((i - 1) % 8 AS INTEGER) AS c, ROUND(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE), 6) AS v FROM (SELECT vec_id, embedding, UNNEST(range(1, 65)) AS i FROM embeddings) ORDER BY vec_id, r, c",
    "q_dense_vec" ->
      "WITH sp AS (SELECT vec_id, list_transform(list_filter(list_zip(range(0, 64), embedding), p -> p[2] > 0.15), p -> p[1]) AS idx, list_transform(list_filter(list_zip(range(0, 64), embedding), p -> p[2] > 0.15), p -> ROUND(CAST(p[2] AS DOUBLE), 6)) AS vals FROM embeddings) SELECT vec_id, CAST(generate_subscripts(dense, 1) - 1 AS INTEGER) AS pos, UNNEST(dense) AS v FROM (SELECT vec_id, list_transform(range(0, 64), i -> coalesce(vals[CAST(list_position(idx, i) AS INTEGER)], 0.0)) AS dense FROM sp) ORDER BY vec_id, pos",
    // §2.C
    "q_dedup_exact" ->
      "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups, md5(text) AS h FROM documents GROUP BY md5(text) ORDER BY keep_id",
    "q_text_tokens" ->
      "SELECT term, COUNT(*) AS cnt FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS term FROM documents) GROUP BY term ORDER BY cnt DESC, term LIMIT 20",
    "q_text_stats" ->
      "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, COUNT(DISTINCT source) AS n_sources FROM documents GROUP BY lang ORDER BY lang",
    "q_token_count" ->
      "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens, ROUND(CAST(len(string_split(text, ' ')) AS DOUBLE) / n_chars, 6) AS tokens_per_char, CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe_tokens FROM documents ORDER BY doc_id",
    "q_quality_score" ->
      "SELECT doc_id, CAST(nt AS INTEGER) AS n_tokens, ROUND(nd / ntd, 6) AS distinct_ratio, ROUND(ns / ntd, 6) AS stop_ratio, ROUND((nd / ntd) * 0.5 + (1.0 - ns / ntd) * 0.5, 6) AS quality FROM (SELECT doc_id, len(toks) AS nt, CAST(len(toks) AS DOUBLE) AS ntd, CAST(len(list_distinct(toks)) AS DOUBLE) AS nd, CAST(len(list_filter(toks, t -> list_contains(['the','a','of','data','table','row'], t))) AS DOUBLE) AS ns FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)) ORDER BY doc_id",
    "q_fingerprint" ->
      "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp FROM documents ORDER BY doc_id",
    // content-hash sampling/splits: md5 hex is engine-identical, cut
    // literals interpolated from Sampling.cutHex (single source of truth)
    "q_sample_hash" ->
      s"SELECT doc_id, lang FROM documents WHERE substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.10)}' ORDER BY doc_id",
    "q_split_assign" ->
      s"SELECT split, lang, COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id FROM (SELECT doc_id, lang, CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.8)}' THEN 'train' WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.9)}' THEN 'val' ELSE 'test' END AS split FROM documents) GROUP BY split, lang ORDER BY split, lang",
    // relational shingle form with the df cap (HAVING df <=
    // containment: same shingle chain over the AUGMENTED corpus
    // (documents ∪ 25-token-prefix twins of every 31st doc); min-side
    // normalization instead of the union
    "q_dedup_containment" -> {
      val aug = "aug AS (SELECT doc_id, text FROM documents UNION ALL " +
        s"SELECT doc_id + ${text.TextOps.containmentTwinOffset}, array_to_string((string_split(text, ' '))[1:25], ' ') " +
        "FROM documents WHERE doc_id % 31 = 0)"
      s"WITH $aug, ${shingleChain(5, "aug", "")} " +
        "SELECT id_a, id_b, containment, jaccard FROM (SELECT id_a, id_b, " +
        "ROUND(CAST(ni AS DOUBLE) / least(ca.n, cb.n), 6) AS containment, " +
        "ROUND(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 6) AS jaccard " +
        "FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni " +
        "FROM s1 a JOIN s1 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) i " +
        "JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b) " +
        "WHERE containment >= 0.9 ORDER BY id_a, id_b"
    },
    // TextOps.shingleDfCap, interpolated), the exact mirror of
    // TextOps.shingleRows + ngramJaccardPairs
    "q_dedup_ngram" ->
      s"$ngramShingleCte SELECT id_a, id_b, jaccard FROM (SELECT id_a, id_b, ROUND(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 6) AS jaccard FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni FROM s1 a JOIN s1 b ON a.s = b.s AND a.doc_id < b.doc_id AND a.doc_id < 50 GROUP BY 1, 2) i JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b) WHERE jaccard > 0.1 ORDER BY id_a, id_b",
    // decontamination: eval split = the q_sample_hash 10% cut (same
    // interpolated literal), shingle universe = the df-capped s1 set,
    // threshold interpolated from TextOps.decontamThreshold
    "q_decontaminate" ->
      s"$ngramShingleCte, ev AS (SELECT DISTINCT s FROM s1 WHERE substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(text.TextOps.decontamEvalFraction)}'), tr AS (SELECT doc_id, s FROM s1 WHERE NOT substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(text.TextOps.decontamEvalFraction)}'), tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id), cont AS (SELECT doc_id, COUNT(*) AS nc FROM tr JOIN ev USING (s) GROUP BY doc_id) SELECT t.doc_id, n_shingles, CAST(COALESCE(nc, 0) AS BIGINT) AS n_contaminated, ROUND(CAST(COALESCE(nc, 0) AS DOUBLE) / n_shingles, 6) AS contamination, CAST(COALESCE(nc, 0) AS DOUBLE) / n_shingles > ${text.TextOps.decontamThreshold} AS flagged FROM tot t LEFT JOIN cont c ON t.doc_id = c.doc_id ORDER BY t.doc_id",
    // Gopher repetition signals; thresholds interpolated from TextOps
    "q_quality_repetition" ->
      s"WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), g2 AS (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS g FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS i FROM tok)), p2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g), a2 AS (SELECT doc_id, MAX(c) AS max2, SUM(c) AS tot2 FROM p2 GROUP BY doc_id), g3 AS (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 3 AS INTEGER)], ' ') AS g FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM tok)), a3 AS (SELECT doc_id, COUNT(*) AS tot3, COUNT(DISTINCT g) AS dist3 FROM g3 GROUP BY doc_id) SELECT a2.doc_id, ROUND(CAST(max2 AS DOUBLE) / tot2, 6) AS top_bigram_frac, ROUND(1.0 - CAST(dist3 AS DOUBLE) / tot3, 6) AS dup_trigram_frac, (CAST(max2 AS DOUBLE) / tot2 > ${text.TextOps.repTopBigramMax} OR 1.0 - CAST(dist3 AS DOUBLE) / tot3 > ${text.TextOps.repDupTrigramMax}) AS flagged FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id ORDER BY a2.doc_id",
    // stratified sample: per-stratum conditions generated from the SAME
    // fraction list the Spark side uses (cuts via Sampling.cutHex — a
    // fraction rounding to 256 becomes a bare stratum predicate, the
    // SQL mirror of the always-true guard)
    // deterministic shuffle: the oracle is the naive global window; the
    // Spark side must reproduce it from the bucketed two-phase plan
    "q_shuffle_order" ->
      "SELECT doc_id, ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos FROM documents ORDER BY doc_id",
    // per-source cap: same md5 order, ranked within source
    "q_domain_cap" ->
      "SELECT doc_id, source FROM (SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents) WHERE rn <= 15 ORDER BY doc_id",
    // DLT priority sample: priority = w/u is a pure IEEE division chain
    // of exactly-representable integers (no ln/pow in the sort key) and
    // the output carries NO float — priorities only order the window
    "q_sample_weighted" ->
      (s"WITH s AS (SELECT source, doc_id, n_chars, " +
        s"CAST(greatest(n_chars, 1) AS DOUBLE) / (CAST((${hex60Sql("md5('ws:' || CAST(doc_id AS VARCHAR))")}) % 999983 + 1 AS DOUBLE) / CAST(999984 AS DOUBLE)) AS priority FROM documents) " +
        "SELECT source, doc_id, n_chars, rn FROM (SELECT source, doc_id, n_chars, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority DESC, doc_id) AS INTEGER) AS rn FROM s) " +
        s"WHERE rn <= ${text.Sampling.weightedK} ORDER BY source, rn"),
    // domain mix: targets interpolated as CAST(x AS DOUBLE) literals
    // (bare 0.5 would be DECIMAL in DuckDB and break double parity);
    // rate/keep arithmetic is a single IEEE chain, same order both sides
    "q_domain_mix" -> {
      val vals = text.Sampling.domainMixTargets
        .map { case (s, f) => s"('$s', CAST($f AS DOUBLE))" }.mkString(", ")
      s"WITH avail AS (SELECT lang AS domain, COUNT(*) AS n_docs FROM documents GROUP BY lang), " +
        s"tgt(domain, target) AS (VALUES $vals), " +
        "a AS (SELECT avail.domain, n_docs, COALESCE(target, CAST(0.0 AS DOUBLE)) AS target FROM avail LEFT JOIN tgt USING (domain)), " +
        "cap AS (SELECT MIN(CAST(n_docs AS DOUBLE) / target) AS t_cap FROM a WHERE target > 0), " +
        "r AS (SELECT domain, n_docs, target, CASE WHEN target = 0 THEN CAST(0.0 AS DOUBLE) ELSE ROUND(LEAST(CAST(1.0 AS DOUBLE), target * t_cap / CAST(n_docs AS DOUBLE)), 6) END AS rate FROM a CROSS JOIN cap) " +
        "SELECT domain, n_docs, target, rate, CAST(FLOOR(rate * CAST(n_docs AS DOUBLE)) AS BIGINT) AS n_keep FROM r ORDER BY domain"
    },
    "q_stratified_sample" -> {
      val conds = text.Sampling.stratifiedDemoFractions.map { case (s, f) =>
        if (math.round(f * 256).toInt >= 256) s"(lang = '$s')"
        else s"(lang = '$s' AND substring(md5(lang || '|' || CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(f)}')"
      }.mkString(" OR ")
      s"SELECT doc_id, lang FROM documents WHERE $conds ORDER BY doc_id"
    },
    // incremental dedup: batch/corpus split = the same interpolated 10%
    // hash cut as q_decontaminate; digests compared, never documents
    "q_dedup_incremental" ->
      s"WITH newb AS (SELECT doc_id, md5(text) AS h FROM documents WHERE substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(text.TextOps.decontamEvalFraction)}'), corp AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE NOT substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(text.TextOps.decontamEvalFraction)}'), keep AS (SELECT MIN(doc_id) AS doc_id, h FROM newb GROUP BY h) SELECT k.doc_id, k.h FROM keep k LEFT JOIN corp c ON k.h = c.h WHERE c.h IS NULL ORDER BY k.doc_id",
    // split leakage: the q_split_assign md5 cut + a digest-keyed agg;
    // membership flags via MAX(CASE), cast to INTEGER to match Spark
    "q_split_leakage" ->
      (s"WITH d AS (SELECT doc_id, md5(CASE WHEN doc_id % 17 = 0 THEN 'standard license boilerplate variant ' || CAST(doc_id % 3 AS VARCHAR) ELSE text END) AS h, CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.8)}' THEN 'train' WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.9)}' THEN 'val' ELSE 'test' END AS split FROM documents) " +
        "SELECT h, n_docs, n_splits, min_id, in_train, in_val, in_test FROM (" +
        "SELECT h, COUNT(*) AS n_docs, COUNT(DISTINCT split) AS n_splits, MIN(doc_id) AS min_id, " +
        "CAST(MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS INTEGER) AS in_train, " +
        "CAST(MAX(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS INTEGER) AS in_val, " +
        "CAST(MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS INTEGER) AS in_test " +
        "FROM d GROUP BY h) WHERE n_splits > 1 ORDER BY h"),
    // NFC canonicalization: decomposed marks injected via chr(769)/
    // chr(771) (the Spark literal carries the same decomposed bytes);
    // java.text.Normalizer and nfc_normalize agree byte-for-byte, the
    // whitespace regex is ASCII \s on both engines, 'g' = replace-all
    "q_text_normalize" ->
      ("WITH d AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' cafe' || chr(769) || '  nin' || chr(771) || 'o' ELSE text END AS ti FROM documents), " +
        "n AS (SELECT doc_id, ti, trim(regexp_replace(lower(nfc_normalize(ti)), '\\s+', ' ', 'g')) AS norm FROM d) " +
        "SELECT doc_id, CAST(len(ti) AS BIGINT) AS n_raw, CAST(len(norm) AS BIGINT) AS n_norm, md5(norm) AS digest FROM n ORDER BY doc_id"),
    // boilerplate mining: same footer injection + the dedup_cluster
    // oracle's shingle slicing; ties ordered (df, occ, gram)
    "q_boilerplate_ngrams" -> {
      import text.TextOps.{boilerW => w, boilerMinDf => mdf, boilerTopK => k}
      s"WITH tok AS (SELECT doc_id, string_split(CASE WHEN doc_id % 17 = 0 THEN text || ' copyright example corp all rights reserved' ELSE text END, ' ') AS toks FROM documents), " +
        s"sh AS (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + $w AS INTEGER)], ' ') AS g FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - $w, 0) + 1)) AS i FROM tok)), " +
        "pd AS (SELECT g, doc_id, COUNT(*) AS c FROM sh GROUP BY g, doc_id) " +
        "SELECT g, n_docs, n_occ FROM (SELECT g, COUNT(*) AS n_docs, CAST(SUM(c) AS BIGINT) AS n_occ FROM pd GROUP BY g) " +
        s"WHERE n_docs >= $mdf ORDER BY n_docs DESC, n_occ DESC, g LIMIT $k"
    },
    // snapshot diff: bucket assignment + the every-5th edit reproduce
    // verbatim (md5-derived buckets are engine-identical); the compare
    // is digest-only, like the Spark side
    "q_snapshot_diff" ->
      (s"WITH h AS (SELECT doc_id, text, (${hex60Sql("md5('snap:' || CAST(doc_id AS VARCHAR))")}) % 10 AS hb, " +
        s"(${hex60Sql("md5('mod:' || CAST(doc_id AS VARCHAR))")}) % 5 AS mb FROM documents), " +
        "o AS (SELECT doc_id, md5(text) AS d FROM h WHERE hb < 8), " +
        "n AS (SELECT doc_id, md5(CASE WHEN mb = 0 THEN text || ' rev2' ELSE text END) AS d FROM h WHERE hb >= 2) " +
        "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
        "WHEN o.d IS DISTINCT FROM n.d THEN 'changed' ELSE 'unchanged' END AS status " +
        "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id ORDER BY doc_id"),
    // MERGE apply: same snap/mod buckets as the diff; the changeset is
    // the digest-filtered full-outer join, the merge an anti join +
    // upsert union — all compares digest-level, null-text-safe
    "q_cdc_merge" ->
      (s"WITH h AS (SELECT doc_id, text, (${hex60Sql("md5('snap:' || CAST(doc_id AS VARCHAR))")}) % 10 AS hb, " +
        s"(${hex60Sql("md5('mod:' || CAST(doc_id AS VARCHAR))")}) % 5 AS mb FROM documents), " +
        "o AS (SELECT doc_id, text FROM h WHERE hb < 8), " +
        "n AS (SELECT doc_id, CASE WHEN mb = 0 THEN text || ' rev2' ELSE text END AS text FROM h WHERE hb >= 2), " +
        "chg AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN n.doc_id IS NULL THEN 'delete' ELSE 'upsert' END AS op, n.text AS text " +
        "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id " +
        "WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR md5(o.text) IS DISTINCT FROM md5(n.text)) " +
        "SELECT o.doc_id, md5(o.text) AS digest, 'base' AS src FROM o ANTI JOIN chg ON o.doc_id = chg.doc_id " +
        "UNION ALL SELECT doc_id, md5(text) AS digest, 'merged' AS src FROM chg WHERE op = 'upsert' " +
        "ORDER BY doc_id"),
    // IVM: the oracle is the DIRECT recompute over the new snapshot —
    // hash parity with the incrementally-maintained Spark output is the
    // view-maintenance invariant itself (all-integer algebra)
    "q_agg_incremental" ->
      (s"WITH h AS (SELECT doc_id, source, text, (${hex60Sql("md5('snap:' || CAST(doc_id AS VARCHAR))")}) % 10 AS hb, " +
        s"(${hex60Sql("md5('mod:' || CAST(doc_id AS VARCHAR))")}) % 5 AS mb FROM documents), " +
        "n AS (SELECT doc_id, source, CASE WHEN mb = 0 THEN text || ' rev2' ELSE text END AS text FROM h WHERE hb >= 2) " +
        "SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(text)) AS BIGINT) AS n_chars, " +
        s"CAST(SUM((${hex60Sql("md5(text)")}) % 1000000007) AS BIGINT) AS content_sum " +
        "FROM n GROUP BY source ORDER BY source"),
    // per-source KL drift: the DSIR bucket space, add-1 smoothed over
    // the full source × bucket grid; per-term ROUND(,9) + DECIMAL sum
    "q_domain_shift" ->
      ("WITH tk AS (SELECT source, UNNEST(string_split(lower(text), ' ')) AS t FROM documents), " +
        "tm AS (SELECT source, md5(t) AS m FROM tk), " +
        s"tb AS (SELECT source, (${hex60Sql("m")}) % 256 AS b FROM tm), " +
        "per AS (SELECT source, b, COUNT(*) AS c FROM tb GROUP BY source, b), " +
        "corpus AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cc FROM per GROUP BY b), " +
        "tots AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM per GROUP BY source), " +
        "grand AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM corpus), " +
        "corpusf AS (SELECT ab.b, COALESCE(cc, 0) AS cc FROM (SELECT UNNEST(range(0, 256)) AS b) ab LEFT JOIN corpus ON corpus.b = ab.b), " +
        "grid AS (SELECT s.source, corpusf.b, corpusf.cc FROM (SELECT DISTINCT source FROM per) s CROSS JOIN corpusf), " +
        "t AS (SELECT g.source, n_s, CAST(ROUND(((COALESCE(p.c, 0) + 1.0) / (n_s + 256)) * ln(((COALESCE(p.c, 0) + 1.0) / (n_s + 256)) / ((g.cc + 1.0) / (n + 256))), 9) AS DECIMAL(18,9)) AS term " +
        "FROM grid g LEFT JOIN per p ON p.source = g.source AND p.b = g.b JOIN tots ON tots.source = g.source CROSS JOIN grand) " +
        "SELECT source, n_s AS n_tokens, ROUND(CAST(SUM(term) AS DOUBLE), 6) AS kl FROM t GROUP BY source, n_s ORDER BY source"),
    // BPE merge-pair counting: pair explode over the DISTINCT vocab,
    // weighted by word count; DuckDB slice w[i:i+1] ≡ Spark substr(i, 2)
    "q_bpe_merge" ->
      ("WITH w AS (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents), " +
        "v AS (SELECT w, COUNT(*) AS wc FROM w WHERE len(w) >= 2 GROUP BY w), " +
        "p AS (SELECT w[i:i+1] AS pair, wc FROM (SELECT w, wc, UNNEST(range(1, len(w))) AS i FROM v)), " +
        "a AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS pc FROM p GROUP BY pair) " +
        "SELECT pair, pc, rank FROM (SELECT pair, pc, CAST(ROW_NUMBER() OVER (ORDER BY pc DESC, pair) AS INTEGER) AS rank FROM a) WHERE rank <= 50 ORDER BY rank"),
    // SCD2: lead(ts) over the same total key order as q_dedup_latest;
    // the open current row is the NULL valid_to
    "q_scd2_history" ->
      ("SELECT user_id, event_type, event_id, value, valid_from, valid_to, (valid_to IS NULL) AS is_current " +
        "FROM (SELECT user_id, event_type, event_id, value, CAST(ts AS TIMESTAMP) AS valid_from, " +
        "LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id, event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to FROM events) " +
        "ORDER BY user_id, event_type, valid_from, event_id"),
    // rolling z-score: the two DECIMAL power sums over the trailing
    // 20-row frame (19-wide operands force DuckDB's exact int128
    // product — the q_stats_moments device), mean/var derived in ONE
    // fixed expression order, var floored at 0 before sqrt
    "q_anomaly_zscore" ->
      ("WITH s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value, " +
        "COUNT(*) OVER w AS n_prior, " +
        "CAST(SUM(CAST(value AS DECIMAL(19,2))) OVER w AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2)) AS DECIMAL(30,8))) OVER w AS DOUBLE) AS sxx " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id, event_id, ts, value, ROUND(sx / n_prior, 6) AS mu, " +
        "(abs(value - sx / n_prior) > 3.0 * sqrt(greatest((sxx - sx * sx / n_prior) / n_prior, 0.0))) AS is_anomaly " +
        "FROM s WHERE n_prior >= 10 ORDER BY user_id, event_id"),
    // salted skew join: the salt is result-invisible, so the oracle is
    // the PLAIN join — any drift means the salting changed semantics
    "q_join_skew_salted" ->
      "SELECT l_orderkey, l_linenumber, l_suppkey, s_name, l_quantity FROM lineitem JOIN supplier ON l_suppkey = s_suppkey ORDER BY l_orderkey, l_linenumber, l_suppkey, s_name, l_quantity",
    // bloom-prefiltered semi join: the Bloom pass only moves work off
    // the shuffle; the oracle is the plain semi-join it must equal
    "q_bloom_join" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0) ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice",
    // JSONL ingest round-trip: the oracle aggregates the PARQUET
    // directly — matching checksums prove the write→read cycle lossless
    "q_ingest_jsonl" ->
      (s"SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(text)) AS BIGINT) AS n_chars, " +
        s"CAST(SUM((${hex60Sql("md5(text)")}) % 1000000007) AS BIGINT) AS content_sum, " +
        "CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM documents GROUP BY source ORDER BY source"),
    // CSV round-trip: same parquet-direct checksum contract as JSONL —
    // the Spark side differs (format, RFC-4180 quoting), the proof of
    // losslessness is identical by design
    "q_ingest_csv" ->
      (s"SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(text)) AS BIGINT) AS n_chars, " +
        s"CAST(SUM((${hex60Sql("md5(text)")}) % 1000000007) AS BIGINT) AS content_sum, " +
        "CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM documents GROUP BY source ORDER BY source"),
    // ORC round-trip: the second columnar/pushdown storage path under
    // the same parquet-direct checksum contract
    "q_ingest_orc" ->
      (s"SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(text)) AS BIGINT) AS n_chars, " +
        s"CAST(SUM((${hex60Sql("md5(text)")}) % 1000000007) AS BIGINT) AS content_sum, " +
        "CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM documents GROUP BY source ORDER BY source"),
    // blocked Levenshtein linkage: DISTINCT names → block on the second
    // token → edit distance ≤ threshold (interpolated); levenshtein is
    // the textbook DP on both engines so distances agree exactly
    "q_join_fuzzy" ->
      (s"WITH nm AS (SELECT p_name, COUNT(*) AS n FROM part GROUP BY p_name), " +
        "k AS (SELECT p_name, n, split_part(p_name, ' ', 2) AS blk FROM nm) " +
        "SELECT a.p_name AS name_a, b.p_name AS name_b, " +
        "CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist, " +
        "a.n AS n_a, b.n AS n_b FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name " +
        s"WHERE levenshtein(a.p_name, b.p_name) <= ${RelQueries.fuzzyMaxDist} " +
        "ORDER BY name_a, name_b"),
    // triangle counting: same sample, same (degree, id) orientation,
    // same id-canonical closure probe; counts are pure integers
    "q_triangle_count" -> {
      import graft.graph.Triangles.{triPartMod => m, triTopK => k}
      s"WITH li AS (SELECT l_orderkey AS o, l_partkey AS p FROM lineitem WHERE l_partkey % $m = 0 GROUP BY 1, 2), " +
        "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p), " +
        "deg AS (SELECT n, COUNT(*) AS d FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n), " +
        "o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS s, " +
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS t " +
        "FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v), " +
        "w AS (SELECT x.s AS tu, x.t AS tv, y.t AS tw FROM o x JOIN o y ON x.s = y.s AND x.t < y.t), " +
        "tri AS (SELECT tu, tv, tw FROM w WHERE EXISTS (SELECT 1 FROM e WHERE e.u = w.tv AND e.v = w.tw)), " +
        "c AS (SELECT part_id, COUNT(*) AS n_triangles FROM (SELECT UNNEST([tu, tv, tw]) AS part_id FROM tri) GROUP BY part_id) " +
        s"SELECT part_id, n_triangles FROM c ORDER BY n_triangles DESC, part_id LIMIT $k"
    },
    // interval join: FLOORED epoch seconds (DuckDB epoch() keeps the
    // µs fraction — a bare BIGINT cast would round where Spark's
    // timestamp→long floors); range() is exclusive-high → +1
    "q_join_interval" -> {
      import RelQueries.{intervalBinSecs => w, intervalUserMod => m}
      s"WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s FROM events), " +
        s"a AS (SELECT user_id, CAST(ts AS DATE) AS d, MIN(s) AS a_start, MAX(s) AS a_end FROM e WHERE user_id % $m = 0 GROUP BY 1, 2), " +
        "b AS (SELECT event_type, date_trunc('hour', ts) AS h, MIN(s) AS b_start, MAX(s) AS b_end FROM e GROUP BY 1, 2), " +
        s"ab AS (SELECT a.*, UNNEST(range(a_start // $w, a_end // $w + 1)) AS bin FROM a), " +
        s"bb AS (SELECT b.*, UNNEST(range(b_start // $w, b_end // $w + 1)) AS bin FROM b), " +
        "c AS (SELECT DISTINCT user_id, d, event_type, h, a_start, a_end, b_start, b_end FROM ab JOIN bb USING (bin)) " +
        "SELECT user_id, CAST(d AS TIMESTAMP) AS d, event_type, h, least(a_end, b_end) - greatest(a_start, b_start) AS overlap_secs " +
        "FROM c WHERE a_start <= b_end AND b_start <= a_end " +
        "ORDER BY user_id, d, event_type, h"
    },
    // survivorship: same vocab/block/threshold as the linkage key,
    // clusters via the recursive-CTE transitive closure over md5-derived
    // node ids (the q_dedup_cluster device), election = (n DESC, name)
    "q_survivorship" ->
      (s"WITH RECURSIVE nm AS (SELECT p_name, COUNT(*) AS n, split_part(p_name, ' ', 2) AS blk, " +
        s"(${hex60Sql("md5(p_name)")}) AS id FROM part GROUP BY p_name), " +
        "pairs AS MATERIALIZED (SELECT a.id AS ida, b.id AS idb FROM nm a JOIN nm b ON a.blk = b.blk AND a.p_name < b.p_name " +
        s"WHERE levenshtein(a.p_name, b.p_name) <= ${RelQueries.fuzzyMaxDist}), " +
        "edges AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM pairs UNION ALL SELECT idb, ida FROM pairs), " +
        "comp(id, lbl) AS (SELECT id, id FROM nm UNION SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.id), " +
        "lab AS (SELECT id, MIN(lbl) AS lbl FROM comp GROUP BY id), " +
        "mem AS (SELECT lab.lbl, nm.p_name, nm.n FROM lab JOIN nm USING (id)), " +
        "ag AS (SELECT lbl, MIN(p_name) AS cluster_name, COUNT(*) AS n_variants, CAST(SUM(n) AS BIGINT) AS support_total FROM mem GROUP BY lbl HAVING COUNT(*) > 1), " +
        "g AS (SELECT lbl, p_name AS golden_name, n AS support_golden FROM (SELECT lbl, p_name, n, ROW_NUMBER() OVER (PARTITION BY lbl ORDER BY n DESC, p_name) AS rn FROM mem) WHERE rn = 1) " +
        "SELECT cluster_name, golden_name, n_variants, support_total, support_golden FROM ag JOIN g USING (lbl) ORDER BY cluster_name"),
    // PageRank: the oracle unrolls the same 3 damped iterations as
    // chained CTEs (generated from the SAME constants — see PageRank)
    "q_pagerank" -> graft.graph.PageRank.oracleSql,
    // z-order clustering key: bit-interleave generated by
    // ZOrder.zvalueSql from the SAME (cols, bits) as the Spark side
    "q_zorder_layout" ->
      s"SELECT p_partkey, p_size, p_partkey % 256 AS kb, ${graft.plans.ZOrder.zvalueSql(Seq("p_size", "p_partkey % 256"), graft.plans.ZOrder.zBits)} AS zval FROM part ORDER BY zval, p_partkey",
    // compaction planner: same md5 file buckets, same scale-free
    // per-source target (ceil(total/4) via FLOOR(+3 / 4.0)), same
    // cumsum first-fit bin — all BIGINT + one exact IEEE division
    "q_compaction_plan" -> {
      import graft.plans.Compaction.{gateFilesPerPart => nf, gateBinsPerPart => nb}
      s"WITH m AS (SELECT source AS part, (${hex60Sql("md5('cf:' || CAST(doc_id AS VARCHAR))")}) % $nf AS file_id, " +
        "COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS bytes FROM documents GROUP BY 1, 2), " +
        s"t AS (SELECT *, CAST(FLOOR((CAST(SUM(bytes) OVER (PARTITION BY part) AS DOUBLE) + ${nb - 1}) / $nb) AS BIGINT) AS target_bytes FROM m), " +
        "b AS (SELECT part, file_id, n_rows, bytes, CAST(FLOOR(CAST(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id) - bytes AS DOUBLE) / CAST(target_bytes AS DOUBLE)) AS BIGINT) AS bin FROM t) " +
        "SELECT part AS source, file_id, n_rows, bytes, bin FROM b ORDER BY source, file_id"
    },
    // manifest pruning: NTILE over identical total orders builds the
    // same balanced files; money min/max are exact 2-dp doubles so the
    // band classification cannot diverge
    "q_manifest_prune" -> {
      import graft.plans.Pruning.{pruneFiles => nf, pruneLo => lo, pruneHi => hi}
      s"WITH a AS (SELECT o_totalprice, NTILE($nf) OVER (ORDER BY o_orderkey) AS file_id, 'arrival' AS layout FROM orders), " +
        s"c AS (SELECT o_totalprice, NTILE($nf) OVER (ORDER BY o_totalprice, o_orderkey) AS file_id, 'clustered' AS layout FROM orders), " +
        "u AS (SELECT * FROM a UNION ALL SELECT * FROM c), " +
        "m AS (SELECT layout, file_id, COUNT(*) AS n_rows, MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM u GROUP BY layout, file_id) " +
        s"SELECT layout, CAST(file_id AS INTEGER) AS file_id, n_rows, mn, mx, " +
        s"CASE WHEN mx < $lo OR mn > $hi THEN 'skipped' WHEN mn >= $lo AND mx <= $hi THEN 'full' ELSE 'partial' END AS status " +
        "FROM m ORDER BY layout, file_id"
    },
    // value-based RANGE frame over epoch seconds (numeric RANGE is
    // engine-identical; ties share one frame so no tiebreak needed)
    "q_window_range" ->
      "SELECT o_custkey, o_orderkey, CAST(epoch(CAST(o_orderdate AS DATE)) AS BIGINT) AS t, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY CAST(epoch(CAST(o_orderdate AS DATE)) AS BIGINT) RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing30 FROM orders ORDER BY o_custkey, t, o_orderkey",
    // argmin/argmax: ordering value is the UNIQUE o_orderkey, so the
    // picked row is deterministic (ties would be engine-dependent)
    "q_arg_minmax" ->
      "SELECT o_custkey, arg_min(o_totalprice, o_orderkey) AS first_price, arg_max(o_totalprice, o_orderkey) AS latest_price, MIN(o_orderkey) AS first_okey, MAX(o_orderkey) AS latest_okey FROM orders GROUP BY o_custkey ORDER BY o_custkey",
    // null-safe join: Spark <=> mirrors IS NOT DISTINCT FROM; the NULL
    // group (status 'P' nulled) must survive the join on both engines
    "q_join_null_safe" ->
      "WITH o AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k FROM orders), dim AS (SELECT k AS dk, COUNT(*) AS n_in_group FROM o GROUP BY k) SELECT o_orderkey, k, n_in_group FROM o JOIN dim ON k IS NOT DISTINCT FROM dk ORDER BY o_orderkey",
    // fixed-width histogram: floor pinned both engines (DuckDB CAST
    // rounds); width/bucket-count literals interpolated from RelQueries
    "q_histogram" ->
      s"SELECT bucket, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price FROM (SELECT least(greatest(CAST(floor(o_totalprice / ${RelQueries.histWidth}) AS BIGINT), 0), ${RelQueries.histBuckets - 1}) AS bucket, o_totalprice FROM orders) GROUP BY bucket ORDER BY bucket",
    // per-column profile: one unpivot pass; DuckDB SUM(int) yields
    // HUGEINT so n_null is cast back to BIGINT; mean via exact DECIMAL
    "q_profile" ->
      "WITH u AS (SELECT 'l_quantity' AS col_name, l_quantity AS value FROM lineitem UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem UNION ALL SELECT 'l_discount', l_discount FROM lineitem) SELECT col_name, COUNT(*) AS n, CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, COUNT(DISTINCT value) AS n_distinct, MIN(value) AS mn, MAX(value) AS mx, ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value), 6) AS mean FROM u GROUP BY col_name ORDER BY col_name",
    // tf-idf: smoothed idf, rank over the ROUNDED score (ties by term)
    "q_tfidf" ->
      "WITH tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term FROM documents) GROUP BY doc_id, term), dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), n AS (SELECT COUNT(*) AS n_docs FROM documents), s AS (SELECT doc_id, term, tf, ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS score FROM tf JOIN dft USING (term) CROSS JOIN n) SELECT doc_id, term, tf, score, rn FROM (SELECT doc_id, term, tf, score, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rn FROM s) WHERE rn <= 3 ORDER BY doc_id, rn",
    // BM25: per-term contributions rounded to 6 dp then summed as
    // DECIMAL(18,6) (addition-order-proof); k1/b-derived constants
    // interpolated from Relevance so both engines parse one double
    "q_bm25_search" -> {
      import text.Relevance.{bm25B => b, bm25K1 => k1, demoQuery}
      val terms = demoQuery.map(t => s"'$t'").mkString(", ")
      s"WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents), dl AS (SELECT doc_id, len(toks) AS dl FROM tok), st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM (SELECT doc_id, UNNEST(toks) AS term FROM tok) WHERE term IN ($terms) GROUP BY doc_id, term), dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), w AS (SELECT doc_id, CAST(ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b} + $b * dl / (CAST(sum_dl AS DOUBLE) / n_docs))), 6) AS DECIMAL(18,6)) AS wd FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st) SELECT doc_id, CAST(SUM(wd) AS DOUBLE) AS score, COUNT(*) AS n_terms_matched FROM w GROUP BY doc_id ORDER BY SUM(wd) DESC, doc_id LIMIT 10"
    },
    // RRF fusion: the bm25 CTE verbatim (LIMIT rrfPerList) + the VSM
    // tf·idf² list under the same 6-dp DECIMAL device; rrf = two
    // one-shot divisions added in fixed order, ROUND(,9)
    "q_rank_fusion" -> {
      import text.Relevance.{bm25B => b, bm25K1 => k1, demoQuery, rrfK, rrfPerList, rrfTopK}
      val terms = demoQuery.map(t => s"'$t'").mkString(", ")
      s"WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents), " +
        "dl AS (SELECT doc_id, len(toks) AS dl FROM tok), " +
        "st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl), " +
        s"tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM (SELECT doc_id, UNNEST(toks) AS term FROM tok) WHERE term IN ($terms) GROUP BY doc_id, term), " +
        "dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), " +
        s"w AS (SELECT doc_id, CAST(ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b} + $b * dl / (CAST(sum_dl AS DOUBLE) / n_docs))), 6) AS DECIMAL(18,6)) AS wd FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st), " +
        s"bm AS (SELECT doc_id, CAST(SUM(wd) AS DOUBLE) AS score FROM w GROUP BY doc_id ORDER BY SUM(wd) DESC, doc_id LIMIT $rrfPerList), " +
        "lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank_lex FROM bm), " +
        "vw AS (SELECT doc_id, CAST(ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS DECIMAL(18,6)) AS wd FROM tf JOIN dft USING (term) CROSS JOIN st), " +
        s"vs AS (SELECT doc_id, CAST(SUM(wd) AS DOUBLE) AS score FROM vw GROUP BY doc_id ORDER BY SUM(wd) DESC, doc_id LIMIT $rrfPerList), " +
        "vsm AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank_vsm FROM vs), " +
        "f AS (SELECT COALESCE(lex.doc_id, vsm.doc_id) AS doc_id, rank_lex, rank_vsm, " +
        s"ROUND(COALESCE(1.0 / ($rrfK + rank_lex), 0.0) + COALESCE(1.0 / ($rrfK + rank_vsm), 0.0), 9) AS rrf " +
        "FROM lex FULL OUTER JOIN vsm ON lex.doc_id = vsm.doc_id) " +
        "SELECT doc_id, rank_lex, rank_vsm, rrf, rn FROM (SELECT f.*, CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER) AS rn FROM f) " +
        s"WHERE rn <= $rrfTopK ORDER BY rn"
    },
    // latest-record compaction: total order inside each key via
    // (ts DESC, event_id DESC); ns ts cast to µs TIMESTAMP both engines
    "q_dedup_latest" ->
      "SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (SELECT user_id, event_type, event_id, ts, value, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id, event_type",
    // sequence packing: keyed (per-source) running offset; block size
    // interpolated from TextOps.packBlockTokens; explicit floor (a bare
    // DuckDB CAST would round where Spark truncates)
    "q_pack_chunks" ->
      s"WITH t AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents), o AS (SELECT doc_id, source AS stream, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset FROM t) SELECT doc_id, stream, n_tokens, tok_offset, CAST(floor(tok_offset / ${text.TextOps.packBlockTokens}.0) AS BIGINT) AS chunk_first, CAST(floor((tok_offset + n_tokens - 1) / ${text.TextOps.packBlockTokens}.0) AS BIGINT) AS chunk_last FROM o ORDER BY doc_id",
    "q_dedup_cluster" ->
      s"WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), s0 AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 3 AS INTEGER)], ' ') AS s FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM tok))), s1 AS (SELECT doc_id, s FROM s0 WHERE s IN (SELECT s FROM s0 GROUP BY s HAVING COUNT(*) <= ${text.TextOps.shingleDfCap})), cnt AS (SELECT doc_id, COUNT(*) AS n FROM s1 GROUP BY doc_id), pairs AS MATERIALIZED (SELECT id_a, id_b FROM (SELECT id_a, id_b, ROUND(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 6) AS jaccard FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni FROM s1 a JOIN s1 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) i JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b) WHERE jaccard > 0.5), edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs), comp(id, lbl) AS (SELECT doc_id, doc_id FROM documents UNION SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.id) SELECT id AS doc_id, MIN(lbl) AS cluster_id, (id = MIN(lbl)) AS keep FROM comp GROUP BY id ORDER BY doc_id",
    "q_frame_sample" ->
      "SELECT media_id, CAST(i AS INTEGER) AS frame_idx FROM (SELECT doc_id AS media_id, UNNEST(range(0, n_chars % 240 + 1)) AS i FROM documents) WHERE i % 10 = 0 ORDER BY media_id, frame_idx",
    // DSv2 media connector: the synthesized directory's every cell —
    // including the exact on-disk byte size (PPM: 9 + digits(w) +
    // digits(h) + 3wh; WAV: 44 + 2·n_samples) — is a fixed function of
    // (doc_id, n_chars), so the connector's listing-pruned,
    // metadata-only scan has a full relational oracle; blob files
    // (doc_id % 3 = 2) are excluded by the pushed kind filter on the
    // Spark side and by construction here
    "q_media_scan" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "img AS (SELECT doc_id, n_chars % 13 + 2 AS w, doc_id % 7 + 2 AS h FROM d WHERE doc_id % 4 = 0), " +
        "aud AS (SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS rate, n_chars % 300 + 10 AS ns FROM d WHERE doc_id % 4 = 1), " +
        // deterministic stored-block PNG: size = 8 sig + 25 IHDR +
        // (12 + 2 + 5*ceil(raw/65535) + raw + 4) IDAT + 12 IEND with
        // raw = h*(1+3w) — PngCodec.encodedSize's closed form
        "png AS (SELECT doc_id, n_chars % 11 + 2 AS w, doc_id % 5 + 2 AS h FROM d WHERE doc_id % 4 = 2) " +
        "SELECT name, kind, size, width, height, sample_rate FROM (" +
        "SELECT 'm' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.ppm' AS name, 'image' AS kind, " +
        "CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h AS BIGINT) AS size, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, CAST(NULL AS INTEGER) AS sample_rate FROM img " +
        "UNION ALL " +
        "SELECT 'm' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.wav', 'audio', " +
        "CAST(44 + 2 * ns AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(rate AS INTEGER) FROM aud " +
        "UNION ALL " +
        "SELECT 'm' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.png', 'image', " +
        "CAST(63 + 5 * ((h * (1 + 3 * w) + 65534) // 65535) + h * (1 + 3 * w) AS BIGINT), " +
        "CAST(w AS INTEGER), CAST(h AS INTEGER), CAST(NULL AS INTEGER) FROM png" +
        ") ORDER BY name"),
    // deterministic flat-9-bit LZW GIF: size = 794-byte fixed envelope
    // (13 header + 768 padded palette + 10 descriptor + min-code +
    // terminator + trailer) + data bytes + one length prefix per
    // ≤255-byte sub-block, with codes = n + 2 clears/EOI + a CLEAR
    // every 252 pixels — GifCodec.encodedSize's closed form
    "q_media_gif" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "g AS (SELECT doc_id, n_chars % 9 + 2 AS w, doc_id % 6 + 2 AS h FROM d), " +
        "sz AS (SELECT doc_id, w, h, (9 * (w * h + 2 + (w * h - 1) // 252) + 7) // 8 AS db FROM g) " +
        "SELECT 'g' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.gif' AS name, " +
        "'image' AS kind, CAST(794 + db + (db + 254) // 255 AS BIGINT) AS size, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height FROM sz ORDER BY name"),
    // distributed LZW decode: the staged gray ramp v_j = (j*5 + doc_id)
    // % 256 makes every decoded-pixel aggregate a closed form — a single
    // wrong pixel anywhere in the decode path breaks the hash
    "q_media_gif_decode" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "g AS (SELECT doc_id, n_chars % 9 + 2 AS w, doc_id % 6 + 2 AS h FROM d), " +
        // range() can't take lateral column bounds in DuckDB: cross a
        // constant ramp (max w*h = 10*7) and filter j < w*h instead
        "px AS (SELECT doc_id, w, h, (j * 5 + doc_id) % 256 AS v FROM g CROSS JOIN range(0, 70) t(j) WHERE j < w * h) " +
        "SELECT 'g' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.gif' AS name, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(COUNT(*) AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum, " +
        "CAST(MIN(v) AS INTEGER) AS px_min, CAST(MAX(v) AS INTEGER) AS px_max " +
        "FROM px GROUP BY doc_id, w, h ORDER BY name"),
    // JPEG header path: kind from extension, dims from the SOF0 frame
    // header (no size column — a Huffman stream's length is not a
    // closed form; the decode sibling pins the pixels instead)
    "q_media_jpeg" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48) " +
        "SELECT 'j' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.jpg' AS name, " +
        "'image' AS kind, CAST(n_chars % 11 + 6 AS INTEGER) AS width, " +
        "CAST(doc_id % 9 + 6 AS INTEGER) AS height FROM d ORDER BY name"),
    // distributed baseline-JPEG decode: the per-8x8-block-constant gray
    // v_b = (b*37 + doc_id) % 256 round-trips EXACTLY through the lossy
    // format (Q00 = 8 makes DC quantization the identity and every AC
    // coefficient zero), so each pixel aggregate is a closed form — one
    // wrong pixel in Huffman decode / dequant / IDCT breaks the hash
    "q_media_jpeg_decode" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "g AS (SELECT doc_id, n_chars % 11 + 6 AS w, doc_id % 9 + 6 AS h FROM d), " +
        // constant-ramp cross (max w = 16, h = 14) + j < bound filters,
        // the q_media_gif_decode device
        "px AS (SELECT doc_id, w, h, " +
        "(((y // 8) * ((w + 7) // 8) + (x // 8)) * 37 + doc_id) % 256 AS v " +
        "FROM g CROSS JOIN range(0, 16) tx(x) CROSS JOIN range(0, 14) ty(y) " +
        "WHERE x < w AND y < h) " +
        "SELECT 'j' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.jpg' AS name, " +
        "CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, " +
        "CAST(COUNT(*) AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum, " +
        "CAST(MIN(v) AS INTEGER) AS px_min, CAST(MAX(v) AS INTEGER) AS px_max " +
        "FROM px GROUP BY doc_id, w, h ORDER BY name"),
    // distributed IMA-ADPCM decode: per-33-sample-block-constant signal
    // round-trips exactly (block headers store the first sample
    // verbatim; constant blocks emit zero nibbles = zero delta at step
    // index 0), so sample aggregates AND the exact on-disk size are
    // closed forms — one wrong sample in block parse / nibble unpack /
    // step adaptation breaks the hash
    "q_media_adpcm_decode" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "g AS (SELECT doc_id, 8000 + (doc_id % 4) * 4000 AS rate, n_chars % 150 + 30 AS n FROM d), " +
        "s AS (SELECT doc_id, rate, n, ((j // 33) * 911 + doc_id * 73) % 60001 - 30000 AS v " +
        "FROM g CROSS JOIN range(0, 180) t(j) WHERE j < n) " +
        "SELECT 'a' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.wav' AS name, " +
        "CAST(60 + ((n + 32) // 33) * 20 AS BIGINT) AS size, " +
        "CAST(rate AS INTEGER) AS sample_rate, " +
        "CAST(COUNT(*) AS BIGINT) AS n_samples, CAST(SUM(v) AS BIGINT) AS s_sum, " +
        "CAST(MIN(v) AS INTEGER) AS s_min, CAST(MAX(v) AS INTEGER) AS s_max " +
        "FROM s GROUP BY doc_id, rate, n ORDER BY name"),
    // animated-GIF demux + stride-5 frame sampling: frame f of file
    // doc_id holds v_j = (j*3 + f*11 + doc_id) % 256 and the flat-9-bit
    // encode makes the on-disk size a closed form (782-byte envelope +
    // per-frame 21 + ceil((9*w*h + 18)/8) data bytes), so size, frame
    // count, sampled indices and per-frame pixel sums are all oracled
    "q_media_video_sample" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "g AS (SELECT doc_id, n_chars % 7 + 2 AS w, doc_id % 5 + 2 AS h, n_chars % 20 + 4 AS nf FROM d), " +
        "fr AS (SELECT doc_id, w, h, nf, f FROM g CROSS JOIN range(0, 23) t(f) WHERE f < nf AND f % 5 = 0), " +
        "px AS (SELECT doc_id, w, h, nf, f, (j * 3 + f * 11 + doc_id) % 256 AS v " +
        "FROM fr CROSS JOIN range(0, 48) tj(j) WHERE j < w * h) " +
        "SELECT 'v' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.gif' AS name, " +
        "CAST(782 + nf * (21 + (9 * w * h + 25) // 8) AS BIGINT) AS size, " +
        "CAST(nf AS INTEGER) AS n_frames, CAST(f AS INTEGER) AS frame_idx, " +
        "CAST(SUM(v) AS BIGINT) AS px_sum, " +
        "CAST(MIN(v) AS INTEGER) AS px_min, CAST(MAX(v) AS INTEGER) AS px_max " +
        "FROM px GROUP BY doc_id, w, h, nf, f ORDER BY name, frame_idx"),
    // the codec dispatch capstone: all six real formats in one mixed
    // directory (doc_id % 6 picks the format; PCM and ADPCM share .wav
    // so the audio branch must dispatch by format TAG); each branch
    // reuses its family's closed-form fixture, so one mis-dispatched
    // file changes a cell and breaks the hash
    "q_media_profile" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "g AS (SELECT doc_id AS id, n_chars AS nc, doc_id % 6 AS m FROM d), " +
        "u AS (SELECT id, m, " +
        "CASE m WHEN 0 THEN (nc % 13 + 2) * (id % 7 + 2) WHEN 1 THEN nc % 300 + 10 " +
        "WHEN 2 THEN (nc % 11 + 2) * (id % 5 + 2) WHEN 3 THEN (nc % 9 + 2) * (id % 6 + 2) " +
        "WHEN 4 THEN (nc % 11 + 6) * (id % 9 + 6) ELSE nc % 150 + 30 END AS n, " +
        "nc % 11 + 6 AS jw FROM g), " +
        "s AS (SELECT id, m, n, " +
        "CASE m WHEN 0 THEN (3 * j + id) % 251 WHEN 1 THEN (j * 31 + id) % 20000 " +
        "WHEN 2 THEN (21 * j + id) % 253 WHEN 3 THEN (5 * j + id) % 256 " +
        "WHEN 4 THEN ((((j // jw) // 8) * ((jw + 7) // 8) + (j % jw) // 8) * 37 + id) % 256 " +
        "ELSE ((j // 33) * 911 + id * 73) % 60001 - 30000 END AS v " +
        "FROM u CROSS JOIN range(0, 310) t(j) WHERE j < n) " +
        "SELECT 'm' || lpad(CAST(id AS VARCHAR), 6, '0') || " +
        "CASE m WHEN 0 THEN '.ppm' WHEN 1 THEN '.wav' WHEN 2 THEN '.png' " +
        "WHEN 3 THEN '.gif' WHEN 4 THEN '.jpg' ELSE '.wav' END AS name, " +
        "CASE WHEN m IN (1, 5) THEN 'audio' ELSE 'image' END AS kind, " +
        "CAST(COUNT(*) AS BIGINT) AS n_units, CAST(SUM(v) AS BIGINT) AS payload_sum " +
        "FROM s GROUP BY id, m ORDER BY name"),
    // distributed resize: nearest-neighbor to 4x3 over the PPM ramp —
    // output (x,y) samples source pixel floor(y*h/3)*w + floor(x*w/4),
    // whose red byte is (3p + doc_id) % 251; the executor path is
    // decode -> resize -> RE-ENCODE -> decode, so the oracle also pins
    // the re-encode leg
    "q_media_resize" ->
      ("WITH d AS (SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 48), " +
        "g AS (SELECT doc_id AS id, n_chars % 13 + 2 AS w, doc_id % 7 + 2 AS h FROM d), " +
        "px AS (SELECT id, (3 * ((y * h // 3) * w + (x * w // 4)) + id) % 251 AS v " +
        "FROM g CROSS JOIN range(0, 4) tx(x) CROSS JOIN range(0, 3) ty(y)) " +
        "SELECT 'r' || lpad(CAST(id AS VARCHAR), 6, '0') || '.ppm' AS name, " +
        "CAST(COUNT(*) AS BIGINT) AS n_px, CAST(SUM(v) AS BIGINT) AS px_sum, " +
        "CAST(MIN(v) AS INTEGER) AS px_min, CAST(MAX(v) AS INTEGER) AS px_max " +
        "FROM px GROUP BY id ORDER BY name"),
    "q_cosine_topk" ->
      s"WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8), s AS (SELECT qid, cid, ${dotSql("qe", "ce")} AS score FROM c CROSS JOIN q) SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM s) WHERE rn <= 3 ORDER BY qid, rn",
    // kNN label noise: the cosine-topk window shape + two vote aggs;
    // majority ties break on smallest label (ORDER BY v DESC, clabel)
    "q_knn_label_noise" ->
      (s"WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlabel FROM embeddings WHERE vec_id < 64), " +
        "c AS (SELECT vec_id AS cid, embedding AS ce, label AS clabel FROM embeddings WHERE vec_id >= 64), " +
        s"s AS (SELECT qid, qlabel, cid, clabel, ${dotSql("qe", "ce")} AS score FROM c CROSS JOIN q), " +
        "nn AS (SELECT qid, qlabel, clabel FROM (SELECT qid, qlabel, clabel, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rn FROM s) WHERE rn <= 5), " +
        "agree AS (SELECT qid, qlabel, CAST(SUM(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END) AS INTEGER) AS n_agree FROM nn GROUP BY qid, qlabel), " +
        "votes AS (SELECT qid, clabel, COUNT(*) AS v FROM nn GROUP BY qid, clabel), " +
        "maj AS (SELECT qid, clabel AS majority_label FROM (SELECT qid, clabel, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY v DESC, clabel) AS vr FROM votes) WHERE vr = 1) " +
        "SELECT a.qid, qlabel AS label, majority_label, n_agree, CAST(majority_label <> qlabel AS INTEGER) AS flagged " +
        "FROM agree a JOIN maj m ON a.qid = m.qid ORDER BY a.qid"),
    // sign random projection: 8 literal ±1 chains generated from the
    // SAME md5-derived matrix, left-associated on both engines;
    // fixed-point output (the quantize floor device)
    "q_random_projection" -> sim.Similarity.randomProjectionOracleSql,
    // int8 quantization: floor(x*scale + 0.5) — floor is engine-identical
    // on doubles where round-half ties are not; all math in double
    "q_embedding_quantize" ->
      s"SELECT vec_id, ROUND(scale, 6) AS scale, array_to_string(q, ',') AS q_codes FROM (SELECT vec_id, scale, $quantizeQSql FROM ($quantizeScaleSql FROM embeddings)) ORDER BY vec_id",
    "q_ann_topk_int8" ->
      s"WITH qz AS (SELECT vec_id AS cid, scale, $quantizeQSql FROM ($quantizeScaleSql FROM embeddings WHERE vec_id >= 8)), qs AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), s AS (SELECT qid, cid, CASE WHEN scale > 0 THEN ${dotSql("qe", "q")} / scale ELSE 0.0 END AS score FROM qz CROSS JOIN qs) SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM s) WHERE rn <= 3 ORDER BY qid, rn",
    // PQ: codebooks = first-16 candidates' 8-dim subvectors; code
    // assignment ties break on min k (the ORDER BY dist, k window ≡
    // Spark's struct-min); ADC partials rounded 6 dp then DECIMAL-summed
    "q_pq_topk" ->
      ("WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), " +
        "c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8), " +
        "ms AS (SELECT UNNEST(range(0, 8)) AS m), " +
        "book AS (SELECT m, CAST(vec_id - 8 AS INTEGER) AS k, list_transform(embedding[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS cv FROM embeddings CROSS JOIN ms WHERE vec_id >= 8 AND vec_id < 24), " +
        "csub AS (SELECT cid, m, list_transform(ce[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS sv FROM c CROSS JOIN ms), " +
        "dists AS (SELECT cid, m, k, list_aggregate(list_transform(range(1, 9), i -> (sv[i] - cv[i]) * (sv[i] - cv[i])), 'sum') AS dist FROM csub JOIN book USING (m)), " +
        "codes AS (SELECT cid, m, k FROM (SELECT cid, m, k, ROW_NUMBER() OVER (PARTITION BY cid, m ORDER BY dist, k) AS rn FROM dists) WHERE rn = 1), " +
        "qsub AS (SELECT qid, m, list_transform(qe[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS qv FROM q CROSS JOIN ms), " +
        "lut AS (SELECT qid, m, k, CAST(ROUND(list_aggregate(list_transform(range(1, 9), i -> qv[i] * cv[i]), 'sum'), 6) AS DECIMAL(18,6)) AS pdot FROM qsub JOIN book USING (m)), " +
        "sc AS (SELECT qid, cid, CAST(SUM(pdot) AS DOUBLE) AS score FROM codes JOIN lut USING (m, k) GROUP BY qid, cid) " +
        "SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM sc) WHERE rn <= 3 ORDER BY qid, rn"),
    // TRAINED-codebook PQ (r15, no_oracle extinction): both Lloyd
    // training rounds unrolled — each is the q_pq_lloyd_round CTE chain
    // (squared-L2 argmin, decimal-device means, emptied codewords keep
    // their seed) — then the q_pq_topk encode/LUT/ADC tail verbatim
    // over the trained book
    "q_pq_topk_trained" -> {
      def lloydRoundCte(r: Int, prev: String): String =
        s"dists$r AS (SELECT cid, m, k, list_aggregate(list_transform(range(1, 9), i -> (sv[i] - cv[i]) * (sv[i] - cv[i])), 'sum') AS dist FROM csub JOIN $prev USING (m)), " +
          s"codes$r AS (SELECT cid, m, k FROM (SELECT cid, m, k, ROW_NUMBER() OVER (PARTITION BY cid, m ORDER BY dist, k) AS rn FROM dists$r) WHERE rn = 1), " +
          s"terms$r AS (SELECT codes$r.m, codes$r.k, dim, CAST(ROUND(sv[dim + 1], 9) AS DECIMAL(18,9)) AS t FROM codes$r JOIN csub ON codes$r.cid = csub.cid AND codes$r.m = csub.m CROSS JOIN dm), " +
          s"sums$r AS (SELECT m, k, dim, SUM(t) AS s, COUNT(*) AS n FROM terms$r GROUP BY m, k, dim), " +
          s"old$r AS (SELECT m, k, dim, cv[dim + 1] AS o FROM $prev CROSS JOIN dm), " +
          s"nc$r AS (SELECT old$r.m, old$r.k, old$r.dim, COALESCE(ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6), o) AS coord FROM old$r LEFT JOIN sums$r ON old$r.m = sums$r.m AND old$r.k = sums$r.k AND old$r.dim = sums$r.dim), " +
          s"book$r AS (SELECT m, k, list(coord ORDER BY dim) AS cv FROM nc$r GROUP BY m, k)"
      "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), " +
        "c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8), " +
        "ms AS (SELECT CAST(UNNEST(range(0, 8)) AS INTEGER) AS m), " +
        "dm AS (SELECT CAST(UNNEST(range(0, 8)) AS INTEGER) AS dim), " +
        "book0 AS (SELECT m, CAST(vec_id - 8 AS INTEGER) AS k, list_transform(embedding[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS cv FROM embeddings CROSS JOIN ms WHERE vec_id >= 8 AND vec_id < 24), " +
        "csub AS (SELECT cid, m, list_transform(ce[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS sv FROM c CROSS JOIN ms), " +
        s"${lloydRoundCte(1, "book0")}, ${lloydRoundCte(2, "book1")}, " +
        "fdists AS (SELECT cid, m, k, list_aggregate(list_transform(range(1, 9), i -> (sv[i] - cv[i]) * (sv[i] - cv[i])), 'sum') AS dist FROM csub JOIN book2 USING (m)), " +
        "fcodes AS (SELECT cid, m, k FROM (SELECT cid, m, k, ROW_NUMBER() OVER (PARTITION BY cid, m ORDER BY dist, k) AS rn FROM fdists) WHERE rn = 1), " +
        "qsub AS (SELECT qid, m, list_transform(qe[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS qv FROM q CROSS JOIN ms), " +
        "lut AS (SELECT qid, m, k, CAST(ROUND(list_aggregate(list_transform(range(1, 9), i -> qv[i] * cv[i]), 'sum'), 6) AS DECIMAL(18,6)) AS pdot FROM qsub JOIN book2 USING (m)), " +
        "sc AS (SELECT qid, cid, CAST(SUM(pdot) AS DOUBLE) AS score FROM fcodes JOIN lut USING (m, k) GROUP BY qid, cid) " +
        "SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM sc) WHERE rn <= 3 ORDER BY qid, rn"
    },
    "q_dedup_embedding" ->
      s"WITH a AS (SELECT vec_id AS id_a, embedding AS ea FROM embeddings WHERE vec_id < 100), b AS (SELECT vec_id AS id_b, embedding AS eb FROM embeddings) SELECT id_a, id_b, ROUND(score, 6) AS score FROM (SELECT id_a, id_b, ${dotSql("ea", "eb")} AS score FROM b CROSS JOIN a WHERE id_a < id_b) WHERE score > 0.25 ORDER BY id_a, id_b",
    // MinHash/LSH near-dup: md5-derived permutations are engine-
    // identical (see minhashPairsCte), so signatures, band keys,
    // candidates AND the exact-Jaccard verify all reproduce in DuckDB
    "q_dedup_minhash" ->
      s"$ngramShingleCte, $minhashPairsCte SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM mh WHERE jac >= 0.6 ORDER BY id_a, id_b",
    // capped band buckets: hot (band, bh) star-expands vs its min-id
    // rep before the exact-Jaccard verify (the simhash_capped device)
    "q_dedup_minhash_capped" ->
      s"$ngramShingleCte, $minhashCappedPairsCte SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM mh WHERE jac >= 0.6 ORDER BY id_a, id_b",
    // banded/star CC over the same MinHash edges: one recursive-CTE
    // oracle serves both (identical fixpoint, different round structure)
    "q_dedup_cluster_banded" -> minhashClusterSql,
    "q_dedup_cluster_star" -> minhashClusterSql,
    // language ID: marker profiles are literal constants interpolated
    // from TextOps.langMarkers; argmax-with-tiebreak = list_max over
    // (score, lang) structs, the exact greatest(struct...) mirror
    "q_lang_id" -> {
      val structs = TextOps.langMarkers.keys.toSeq.sorted.map { l =>
        val markers = TextOps.langMarkers(l).map(m => s"'$m'").mkString("[", ", ", "]")
        s"{'s': CAST(len(list_filter(toks, t -> list_contains($markers, t))) AS INTEGER), 'l': '$l'}"
      }.mkString(", ")
      "WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents), " +
        s"b AS (SELECT doc_id, list_max([$structs]) AS best FROM t) " +
        "SELECT doc_id, CASE WHEN best.s > 0 THEN best.l ELSE 'und' END AS lang_pred FROM b ORDER BY doc_id"
    },
    // unigram LM quality: per-token -ln p rounded to 6 dp then summed
    // as DECIMAL (order-proof, the BM25 device); corpus total via CAST
    // to BIGINT (DuckDB SUM -> HUGEINT)
    "q_quality_unigram" ->
      s"$unigramCte SELECT doc_id, COUNT(*) AS n_tokens, ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll FROM cost GROUP BY doc_id ORDER BY doc_id",
    // tail cut: rounded p10/p90 cuts (quantile_cont ≡ Spark percentile,
    // the q_percentile parity) broadcast over the same scores
    "q_quality_tails" ->
      (s"$unigramCte, sc AS (SELECT doc_id, ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll FROM cost GROUP BY doc_id), " +
        "cuts AS (SELECT ROUND(quantile_cont(avg_nll, 0.1), 6) AS p10, ROUND(quantile_cont(avg_nll, 0.9), 6) AS p90 FROM sc) " +
        "SELECT doc_id, avg_nll, CASE WHEN avg_nll <= p10 THEN 'low' WHEN avg_nll >= p90 THEN 'high' ELSE 'mid' END AS tail FROM sc CROSS JOIN cuts ORDER BY doc_id"),
    // per-source adaptive cuts: same unigram scores, quantile_cont
    // GROUPED BY source (≡ Spark exact percentile, the q_percentile
    // parity), cuts rejoined on source
    "q_quality_tails_by_source" ->
      (s"$unigramCte, sc AS (SELECT doc_id, ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll FROM cost GROUP BY doc_id), " +
        "ss AS (SELECT sc.doc_id, d.source, avg_nll FROM sc JOIN documents d ON d.doc_id = sc.doc_id), " +
        "cuts AS (SELECT source, ROUND(quantile_cont(avg_nll, 0.1), 6) AS p10, ROUND(quantile_cont(avg_nll, 0.9), 6) AS p90 FROM ss GROUP BY source) " +
        "SELECT doc_id, ss.source, avg_nll, p10, p90, CASE WHEN avg_nll <= p10 THEN 'low' WHEN avg_nll >= p90 THEN 'high' ELSE 'mid' END AS tail " +
        "FROM ss JOIN cuts ON cuts.source = ss.source ORDER BY doc_id"),
    // bigram LM: same device one level up — p(b|a) = c(a,b)/c(a,·) from
    // the corpus bigram table (every scored bigram has c ≥ 1, so no
    // smoothing); aligned double-UNNEST zips the shifted token slices
    "q_quality_bigram" ->
      ("WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents), " +
        "bg AS (SELECT doc_id, UNNEST(l[1:len(l)-1]) AS a, UNNEST(l[2:len(l)]) AS b FROM tk), " +
        "bf AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY a, b), " +
        "af AS (SELECT a, COUNT(*) AS ca FROM bg GROUP BY a), " +
        "cost AS (SELECT doc_id, CAST(ROUND(-ln(CAST(cab AS DOUBLE) / CAST(ca AS DOUBLE)), 6) AS DECIMAL(18,6)) AS nll FROM bg JOIN bf USING (a, b) JOIN af USING (a)) " +
        "SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll FROM cost GROUP BY doc_id ORDER BY doc_id"),
    // overlapping chunking: start offsets via stepped range, chunk =
    // 1-based 50-token slice re-joined to text
    "q_chunk_overlap" ->
      "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents), ch AS (SELECT doc_id, l, UNNEST(range(0, greatest(len(l), 1), 40)) AS st FROM tk) SELECT doc_id, CAST(st / 40 AS INTEGER) AS chunk_id, CAST(len(l[st+1:least(st+50, len(l))]) AS INTEGER) AS n_tokens, array_to_string(l[st+1:least(st+50, len(l))], ' ') AS chunk_text FROM ch ORDER BY doc_id, chunk_id",
    // DSIR-lite: token → 60-bit md5 hash → bucket (% 256, non-negative
    // so % ≡ pmod); add-1-smoothed target/source bucket rates; per-token
    // ln-ratio rounded 6 dp, DECIMAL-summed per doc (order-proof)
    "q_dsir_weights" ->
      (s"WITH tk AS (SELECT doc_id, lang, UNNEST(string_split(lower(text), ' ')) AS t FROM documents), " +
        "tm AS (SELECT doc_id, lang, md5(t) AS m FROM tk), " +
        s"tb AS (SELECT doc_id, lang, (${hex60Sql("m")}) % 256 AS b FROM tm), " +
        "src AS (SELECT b, COUNT(*) AS cs FROM tb GROUP BY b), " +
        "tgt AS (SELECT b, COUNT(*) AS ct FROM tb WHERE lang = 'en' GROUP BY b), " +
        "tot AS (SELECT (SELECT CAST(SUM(cs) AS BIGINT) FROM src) AS ns, (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS nt), " +
        "rates AS (SELECT b, CAST(ROUND(ln((CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / (nt + 256)) / (CAST(cs + 1 AS DOUBLE) / (ns + 256))), 6) AS DECIMAL(18,6)) AS llr_b FROM src LEFT JOIN tgt USING (b) CROSS JOIN tot) " +
        "SELECT doc_id, COUNT(*) AS n_tokens, ROUND(CAST(SUM(llr_b) AS DOUBLE), 6) AS llr, CAST(SUM(llr_b) > 0 AS INTEGER) AS selected FROM tb JOIN rates USING (b) GROUP BY doc_id ORDER BY doc_id"),
    // exact-substring dedup: the w=20 form of the shingle CTE (span
    // length + df cap interpolated from TextOps constants)
    "q_dedup_substring" -> {
      s"${shingleCte(TextOps.substringSpanTokens)}, " +
        "s2 AS (SELECT doc_id, md5(s) AS h FROM s1) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_spans FROM s2 a JOIN s2 b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2 ORDER BY id_a, id_b"
    },
    // PII scrubbing: portable char-class regexes (no lookaround — Java
    // regex and RE2 agree), deterministic doc_id-derived injection so
    // the scrubber is exercised on real matches; cleaned text compared
    // by md5
    "q_scrub_pii" -> {
      val inj = "CASE WHEN doc_id % 7 = 0 THEN concat('contact user', CAST(doc_id AS VARCHAR), '@example.com via https://example.org/u/', CAST(doc_id AS VARCHAR), ' ', text) ELSE text END"
      s"WITH t AS (SELECT doc_id, $inj AS tx FROM documents) " +
        s"SELECT doc_id, CAST(len(regexp_extract_all(tx, '${TextOps.emailRe}')) AS INTEGER) AS n_emails, CAST(len(regexp_extract_all(tx, '${TextOps.urlRe}')) AS INTEGER) AS n_urls, md5(regexp_replace(regexp_replace(tx, '${TextOps.emailRe}', '<EMAIL>', 'g'), '${TextOps.urlRe}', '<URL>', 'g')) AS clean_md5 FROM t ORDER BY doc_id"
    },
    // SimHash exact-fingerprint dedup: md5-derived token hashes (the
    // baseHash60 positional-sum mirror), 32 conditional bit sums, sign
    // -> bit char; engine-identical fingerprints group identically
    "q_dedup_simhash" -> {
      val fpChars = (0 until 32)
        .map(b => s"CASE WHEN b$b > 0 THEN '1' ELSE '0' END")
        .mkString("concat(", ", ", ")")
      s"$simhashBitSumsCte, " +
        s"fp AS (SELECT doc_id, $fpChars AS sh FROM sb) " +
        "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_docs, sh FROM fp GROUP BY sh ORDER BY keep_id"
    },
    // Hamming-banded SimHash pairs: same md5-derived fingerprints as a
    // packed long, 4x8-bit band keys via shift/mask, popcount verify
    // via bit_count(xor) — maxHamming=3/nBands=4, the gate defaults
    "q_dedup_simhash_banded" -> {
      val fpLong = (0 until 32)
        .map(b => s"CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"$simhashBitSumsCte, " +
        s"fps AS (SELECT doc_id, $fpLong AS fp FROM sb), " +
        "keyed AS (SELECT doc_id, fp, band, (fp >> (band * 8)) & 255 AS bits FROM fps CROSS JOIN (SELECT UNNEST(range(0, 4)) AS band) bands), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.fp AS fp_a, c.fp AS fp_b FROM keyed a JOIN keyed c ON a.band = c.band AND a.bits = c.bits AND a.doc_id < c.doc_id) " +
        "SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3 ORDER BY id_a, id_b"
    },
    // capped SimHash banding: the same fps/keyed CTEs plus the hot map,
    // cold exact pairing, and min-id-rep star expansion (the
    // capped-fixed embedding oracle's CTE shape on (band, bits) keys)
    "q_dedup_simhash_capped" -> {
      val fpLong = (0 until 32)
        .map(b => s"CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"$simhashBitSumsCte, " +
        s"fps AS (SELECT doc_id, $fpLong AS fp FROM sb), " +
        "keyed AS (SELECT doc_id, fp, band, (fp >> (band * 8)) & 255 AS bits FROM fps CROSS JOIN (SELECT UNNEST(range(0, 4)) AS band) bands), " +
        s"cnt AS (SELECT band, bits, COUNT(*) > ${TextOps.simhashBucketCap} AS hot FROM keyed GROUP BY band, bits), " +
        "tg AS (SELECT k.doc_id, k.fp, k.band, k.bits, c.hot FROM keyed k JOIN cnt c ON k.band = c.band AND k.bits = c.bits), " +
        "cpp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fp_a, b.fp AS fp_b FROM tg a JOIN tg b ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id WHERE NOT a.hot AND NOT b.hot), " +
        "rp AS (SELECT band, bits, MIN(doc_id) AS id_a FROM tg WHERE hot GROUP BY band, bits), " +
        "rv AS (SELECT r.band, r.bits, r.id_a, t.fp AS fp_a FROM rp r JOIN tg t ON t.band = r.band AND t.bits = r.bits AND t.doc_id = r.id_a), " +
        "spp AS (SELECT v.id_a, h.doc_id AS id_b, v.fp_a, h.fp AS fp_b FROM tg h JOIN rv v ON h.band = v.band AND h.bits = v.bits WHERE h.hot AND h.doc_id <> v.id_a), " +
        "pairs AS (SELECT DISTINCT id_a, id_b, fp_a, fp_b FROM (SELECT * FROM cpp UNION ALL SELECT * FROM spp)) " +
        "SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming FROM pairs WHERE bit_count(xor(fp_a, fp_b)) <= 3 ORDER BY id_a, id_b"
    },
    // hyperplane-LSH ANN: bucket assignment via Similarity.lshBucketSql
    // (plane vectors interpolated as literals — the zvalueSql pattern);
    // multi-probe explode, bucket equi-join, window top-k all mirrored
    "q_ann_topk" -> {
      val b = (v: String) => Similarity.lshBucketSql(v, 4, 64)
      s"WITH qb AS (SELECT vec_id AS qid, embedding AS qe, ${b("embedding")} AS b0 FROM embeddings WHERE vec_id < 8), " +
        s"probes AS (SELECT qid, qe, ${Similarity.multiProbeSql("b0", 4)} AS bucket FROM qb), " +
        s"c AS (SELECT vec_id AS cid, embedding AS ce, ${b("embedding")} AS bucket FROM embeddings WHERE vec_id >= 8), " +
        s"s AS (SELECT qid, cid, ${dotSql("qe", "ce")} AS score FROM c JOIN probes USING (bucket)) " +
        "SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM s) WHERE rn <= 3 ORDER BY qid, rn"
    },
    // composed LLM pipeline: the per-stage oracle SQLs (quality,
    // repetition, decontamination, exact dedup, ngram-cluster CC,
    // split, pack) chained in ONE recursive CTE — every threshold and
    // hash cut interpolated from the same TextOps/Sampling constants
    // the Spark stages read
    "q_llm_pipeline" -> {
      val stop = TextOps.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      val evalIn = s"substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(TextOps.decontamEvalFraction)}'"
      s"${ngramShingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")}, " +
        // stage 1a: quality gate (q_quality_score shape)
        s"qual_ok AS (SELECT doc_id FROM (SELECT doc_id, ROUND((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5 + (1.0 - CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS DOUBLE) / len(toks)) * 0.5, 6) AS quality FROM tok) WHERE quality >= ${TextOps.pipelineMinQuality}), " +
        // stage 1b: repetition gate (q_quality_repetition shape)
        "g2 AS (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS g FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS i FROM tok)), " +
        "a2 AS (SELECT doc_id, MAX(c) AS max2, SUM(c) AS tot2 FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g) GROUP BY doc_id), " +
        "g3 AS (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 3 AS INTEGER)], ' ') AS g FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM tok)), " +
        "a3 AS (SELECT doc_id, COUNT(*) AS tot3, COUNT(DISTINCT g) AS dist3 FROM g3 GROUP BY doc_id), " +
        s"rep_ok AS (SELECT a2.doc_id FROM a2 JOIN a3 ON a2.doc_id = a3.doc_id WHERE NOT (CAST(max2 AS DOUBLE) / tot2 > ${TextOps.repTopBigramMax} OR 1.0 - CAST(dist3 AS DOUBLE) / tot3 > ${TextOps.repDupTrigramMax})), " +
        // stage 2: decontamination vs the eval carve-out (q_decontaminate shape)
        s"ev AS (SELECT DISTINCT s FROM s1 WHERE $evalIn), " +
        s"tr AS (SELECT doc_id, s FROM s1 WHERE NOT $evalIn), " +
        "tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id), " +
        "cont AS (SELECT doc_id, COUNT(*) AS nc FROM tr JOIN ev USING (s) GROUP BY doc_id), " +
        s"decon_ok AS (SELECT t.doc_id FROM tot t LEFT JOIN cont c ON t.doc_id = c.doc_id WHERE NOT (CAST(COALESCE(nc, 0) AS DOUBLE) / n_shingles > ${TextOps.pipelineContamMax})), " +
        // stages 1+2 compose; stage 3: exact dedup (q_dedup_exact shape)
        s"base AS MATERIALIZED (SELECT doc_id, source, text FROM documents WHERE NOT $evalIn AND doc_id IN (SELECT doc_id FROM qual_ok) AND doc_id IN (SELECT doc_id FROM rep_ok) AND doc_id IN (SELECT doc_id FROM decon_ok)), " +
        "base2 AS MATERIALIZED (SELECT * FROM base WHERE doc_id IN (SELECT MIN(doc_id) FROM base GROUP BY md5(text))), " +
        // stage 4: ngram-jaccard cluster dedup over the survivors
        // (q_dedup_cluster shape, c-prefixed CTE names, source = base2)
        "ctok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM base2), " +
        "cs0 AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 3 AS INTEGER)], ' ') AS s FROM (SELECT doc_id, toks, UNNEST(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM ctok))), " +
        s"cs1 AS (SELECT doc_id, s FROM cs0 WHERE s IN (SELECT s FROM cs0 GROUP BY s HAVING COUNT(*) <= ${TextOps.shingleDfCap})), " +
        "ccnt AS (SELECT doc_id, COUNT(*) AS n FROM cs1 GROUP BY doc_id), " +
        s"cpairs AS MATERIALIZED (SELECT id_a, id_b FROM (SELECT id_a, id_b, ROUND(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 6) AS jaccard FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni FROM cs1 a JOIN cs1 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) i JOIN ccnt ca ON ca.doc_id = id_a JOIN ccnt cb ON cb.doc_id = id_b) WHERE jaccard > ${TextOps.pipelineClusterJaccard}), " +
        "cedges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM cpairs UNION ALL SELECT id_b, id_a FROM cpairs), " +
        "comp(id, lbl) AS (SELECT doc_id, doc_id FROM base2 UNION SELECT e.dst, c.lbl FROM comp c JOIN cedges e ON e.src = c.id), " +
        "keepc AS (SELECT id AS doc_id FROM comp GROUP BY id HAVING id = MIN(lbl)), " +
        // stages 5+6: split assignment (q_split_assign cuts) + packing
        // (q_pack_chunks shape) over (split, source) streams
        s"fin AS (SELECT doc_id, source, text, CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.8)}' THEN 'train' WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '${text.Sampling.cutHex(0.9)}' THEN 'val' ELSE 'test' END AS split FROM base2 WHERE doc_id IN (SELECT doc_id FROM keepc)), " +
        "tt AS (SELECT doc_id, split || '/' || source AS stream, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM fin), " +
        "o AS (SELECT doc_id, stream, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset FROM tt) " +
        s"SELECT doc_id, stream, n_tokens, tok_offset, CAST(floor(tok_offset / ${TextOps.packBlockTokens}.0) AS BIGINT) AS chunk_first, CAST(floor((tok_offset + n_tokens - 1) / ${TextOps.packBlockTokens}.0) AS BIGINT) AS chunk_last FROM o ORDER BY doc_id"
    },
    // composed LLM pipeline v2: the v1 chain re-rooted on the SCRUBBED
    // corpus (PII inject + redact first — the q_scrub_pii device), with
    // the round-6 gates spliced in at their production positions:
    // Gopher composite + unigram tail cut before the dedups, exact-
    // substring dedup between exact and cluster dedup. Every stage is
    // its own gate key's oracle SQL with the source relation swapped;
    // all thresholds/cuts interpolated from the same constants.
    "q_llm_pipeline_v2" ->
      (s"$pipelineV2PrefixSql, " +
        // stage 5: ngram-jaccard cluster dedup over the survivors
        s"${shingleChain(3, "base3", "c")}, " +
        s"cpairs AS MATERIALIZED (SELECT id_a, id_b FROM (SELECT id_a, id_b, ROUND(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 6) AS jaccard FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni FROM cs1 a JOIN cs1 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) i JOIN ccnt ca ON ca.doc_id = id_a JOIN ccnt cb ON cb.doc_id = id_b) WHERE jaccard > ${TextOps.pipelineClusterJaccard})" +
        pipelineClusterPackTailSql),
    // composed LLM pipeline v3 (r15, verdict ask #7): v2's exact stage
    // chain with the cluster-dedup edges generated by the CAPPED
    // SimHash band join (the scale-safe operator the SimHash family's
    // notes point production users at) — the q_dedup_simhash_capped
    // mirror re-rooted on the base3 survivor CTE
    "q_llm_pipeline_v3" -> {
      val bitSums = (0 until 32)
        .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
        .mkString(", ")
      val fpLong = (0 until 32)
        .map(b => s"CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
        .mkString(" + ")
      s"$pipelineV2PrefixSql, " +
        // stage 5: capped SimHash band pairs over the survivors
        "stk AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t FROM base3), " +
        s"ssh AS (SELECT doc_id, ${hex60Sql("m")} AS h FROM (SELECT doc_id, md5(t) AS m FROM stk)), " +
        s"ssb AS MATERIALIZED (SELECT doc_id, $bitSums FROM ssh GROUP BY doc_id), " +
        s"sfps AS MATERIALIZED (SELECT doc_id, $fpLong AS fp FROM ssb), " +
        "skeyed AS (SELECT doc_id, fp, band, (fp >> (band * 8)) & 255 AS bits FROM sfps CROSS JOIN (SELECT UNNEST(range(0, 4)) AS band) bands), " +
        s"scnt AS (SELECT band, bits, COUNT(*) > ${TextOps.simhashBucketCap} AS hot FROM skeyed GROUP BY band, bits), " +
        "stg AS MATERIALIZED (SELECT k.doc_id, k.fp, k.band, k.bits, c.hot FROM skeyed k JOIN scnt c ON k.band = c.band AND k.bits = c.bits), " +
        "scpp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fp_a, b.fp AS fp_b FROM stg a JOIN stg b ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id WHERE NOT a.hot AND NOT b.hot), " +
        "srp AS (SELECT band, bits, MIN(doc_id) AS id_a FROM stg WHERE hot GROUP BY band, bits), " +
        "srv AS (SELECT r.band, r.bits, r.id_a, t.fp AS fp_a FROM srp r JOIN stg t ON t.band = r.band AND t.bits = r.bits AND t.doc_id = r.id_a), " +
        "sspp AS (SELECT v.id_a, h.doc_id AS id_b, v.fp_a, h.fp AS fp_b FROM stg h JOIN srv v ON h.band = v.band AND h.bits = v.bits WHERE h.hot AND h.doc_id <> v.id_a), " +
        "spairs AS MATERIALIZED (SELECT DISTINCT id_a, id_b, fp_a, fp_b FROM (SELECT * FROM scpp UNION ALL SELECT * FROM sspp)), " +
        "cpairs AS MATERIALIZED (SELECT id_a, id_b FROM spairs WHERE bit_count(xor(fp_a, fp_b)) <= 3)" +
        pipelineClusterPackTailSql
    },
    // URL/domain blocklist: synthetic doc_id-derived URLs over the
    // literal pool (the q_scrub_pii injection device), host extracted
    // with a portable char-class regex, www-stripped/lowercased, then
    // exact + suffix blocklists — all literals interpolated from the
    // same TextOps constants the Spark side reads
    // temperature mix (α pinned at 0.5 → sqrt, correctly rounded in
    // IEEE on both engines unlike general pow): natural shares rounded
    // to 6 dp, √p terms summed as exact DECIMAL(18,6) (addition-order-
    // free), ONE double division per domain, boost from the two already-
    // rounded columns — every number bit-identical across engines
    "q_domain_mix_temp" ->
      ("WITH avail AS (SELECT lang AS domain, COUNT(*) AS n_docs FROM documents GROUP BY lang), " +
        "tot AS (SELECT SUM(n_docs) AS n_total FROM avail), " +
        "p AS (SELECT domain, n_docs, ROUND(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS p_nat FROM avail CROSS JOIN tot), " +
        "pa AS (SELECT domain, n_docs, p_nat, CAST(ROUND(sqrt(p_nat), 6) AS DECIMAL(18,6)) AS pa FROM p), " +
        "z AS (SELECT SUM(pa) AS z FROM pa) " +
        "SELECT domain, n_docs, p_nat, ROUND(CAST(pa AS DOUBLE) / CAST(z AS DOUBLE), 6) AS q_mix, " +
        "ROUND(ROUND(CAST(pa AS DOUBLE) / CAST(z AS DOUBLE), 6) / p_nat, 6) AS boost " +
        "FROM pa CROSS JOIN z ORDER BY domain"),
    // paragraph dedup: 10-token windows, first occurrence = min doc
    // then min index within it (two exact aggregates — no struct min),
    // reassembly order restored by seg_idx (string_agg ORDER BY ↔
    // array_sort(collect_list(struct))), md5('') for fully-deduped docs
    "q_dedup_paragraph" ->
      ("WITH d AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'terms of service apply to this content please read carefully ' || text ELSE text END AS text FROM documents), " +
        "tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d), " +
        "b AS (SELECT doc_id, toks, CAST((len(toks) + 9) // 10 AS BIGINT) AS n_segments FROM tok), " +
        "seg AS (SELECT doc_id, i AS seg_idx, array_to_string(toks[CAST(i * 10 + 1 AS INTEGER):CAST(i * 10 + 10 AS INTEGER)], ' ') AS seg FROM (SELECT doc_id, toks, UNNEST(range(0, n_segments)) AS i FROM b)), " +
        "f1 AS (SELECT seg, MIN(doc_id) AS d0 FROM seg GROUP BY seg), " +
        "f2 AS (SELECT s.seg, f1.d0, MIN(s.seg_idx) AS i0 FROM f1 JOIN seg s ON s.seg = f1.seg AND s.doc_id = f1.d0 GROUP BY s.seg, f1.d0), " +
        "kept AS (SELECT s.doc_id, s.seg_idx, s.seg FROM seg s JOIN f2 ON s.seg = f2.seg AND s.doc_id = f2.d0 AND s.seg_idx = f2.i0), " +
        "ka AS (SELECT doc_id, COUNT(*) AS n_kept, md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS kept_md5 FROM kept GROUP BY doc_id) " +
        "SELECT b.doc_id, n_segments, COALESCE(n_kept, 0) AS n_kept, COALESCE(kept_md5, md5('')) AS kept_md5 FROM b LEFT JOIN ka ON b.doc_id = ka.doc_id ORDER BY b.doc_id"),
    // URL canonicalization dedup: the synthetic variant arm and the
    // regex chain mirror TextOps.canonicalUrl step for step (every
    // pattern anchored, so Spark replace-all ≡ DuckDB replace-first;
    // backref spelled $1 in Spark, \1 in DuckDB)
    "q_dedup_url" -> {
      val pool = TextOps.domainPool.map(d => s"'$d'").mkString("([", ", ", "])")
      s"WITH h AS (SELECT doc_id, $pool[CAST(doc_id % 100 % ${TextOps.domainPool.size} + 1 AS INTEGER)] AS host, '/p/' || CAST(doc_id % 100 AS VARCHAR) AS path FROM documents), " +
        "u AS (SELECT doc_id, CASE (doc_id // 100) % 4 " +
        "WHEN 1 THEN 'https://' || host || path || '?utm_source=feed&utm_campaign=sync' " +
        "WHEN 2 THEN 'https://' || host || path || '/' " +
        "WHEN 3 THEN 'HTTPS://' || upper(host) || path || '#ref' " +
        "ELSE 'https://' || host || path END AS url FROM h), " +
        "n2 AS (SELECT doc_id, url, regexp_replace(regexp_replace(url, '#.*$', ''), '[?]utm_[^#]*$', '') AS nu FROM u), " +
        "c AS (SELECT doc_id, url, regexp_replace(lower(regexp_extract(nu, '^([A-Za-z]+://[^/?#]+)', 1)), '^(https?://)www[.]', '\\1') || regexp_replace(regexp_replace(nu, '^[A-Za-z]+://[^/?#]+', ''), '/$', '') AS url_canon FROM n2) " +
        "SELECT url_canon, COUNT(*) AS n_docs, COUNT(DISTINCT url) AS n_raw_forms, MIN(doc_id) AS keep_doc_id FROM c GROUP BY url_canon ORDER BY url_canon"
    },
    "q_filter_domains" -> {
      val pool = TextOps.domainPool.map(d => s"'$d'").mkString("([", ", ", "])")
      val blocked = TextOps.blockedDomains.map(d => s"'$d'").mkString(", ")
      val sufCond = TextOps.blockedSuffixes.map(s => s"d LIKE '%$s'").mkString(" OR ")
      s"WITH u AS (SELECT doc_id, concat('https://', $pool[CAST(doc_id % ${TextOps.domainPool.size} + 1 AS INTEGER)], '/p/', CAST(doc_id AS VARCHAR)) AS url FROM documents), " +
        s"dom AS (SELECT doc_id, regexp_replace(lower(regexp_extract(url, '${TextOps.hostRe}', 1)), '^www[.]', '') AS d FROM u) " +
        s"SELECT d AS domain, (d IN ($blocked) OR $sufCond) AS blocked, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id FROM dom GROUP BY 1, 2 ORDER BY domain"
    },
    // tokenizer fertility: the q_token_bpe piece stream (same injection
    // device) aggregated per language; ratios divide the exact BIGINT
    // sums once (one IEEE division — addition-order-proof)
    "q_token_fertility" -> {
      val inj = "CASE WHEN doc_id % 5 = 0 THEN concat('id=', CAST(doc_id AS VARCHAR), ' v1.2, cost $', CAST(doc_id % 97 AS VARCHAR), '! ', text) ELSE text END"
      s"WITH i AS (SELECT lang, $inj AS tx FROM documents), " +
        s"m AS (SELECT lang, CAST(len(regexp_extract_all(tx, '${TextOps.bpePieceRe}')) AS BIGINT) AS p, CAST(len(string_split(tx, ' ')) AS BIGINT) AS w, CAST(len(tx) AS BIGINT) AS c FROM i) " +
        "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(p) AS BIGINT) AS n_pieces, CAST(SUM(w) AS BIGINT) AS n_words, CAST(SUM(c) AS BIGINT) AS n_chars, ROUND(CAST(SUM(p) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS fertility, ROUND(CAST(SUM(c) AS DOUBLE) / CAST(SUM(p) AS DOUBLE), 6) AS bytes_per_piece FROM m GROUP BY lang ORDER BY lang"
    },
    // SemDeDup-style embedding clusters: the q_dedup_embedding_lsh pair
    // SQL (generated bucket mirror, unrounded score filter) feeding the
    // same recursive-CTE CC fixpoint as the MinHash cluster oracles
    "q_dedup_embedding_cluster" -> {
      s"WITH RECURSIVE wb AS (SELECT vec_id, embedding, ${Similarity.lshBucketSql("embedding", 4, 64)} AS b0 FROM embeddings), " +
        s"a AS (SELECT vec_id AS id_a, embedding AS ea, ${Similarity.multiProbeSql("b0", 4)} AS bucket FROM wb), " +
        "b AS (SELECT vec_id AS id_b, embedding AS eb, b0 AS bucket FROM wb), " +
        s"p AS MATERIALIZED (SELECT id_a, id_b FROM (SELECT id_a, id_b, ${dotSql("ea", "eb")} AS score FROM a JOIN b USING (bucket) WHERE id_a < id_b) WHERE score > 0.25), " +
        "edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p UNION ALL SELECT id_b, id_a FROM p), " +
        "comp(id, lbl) AS (SELECT vec_id, vec_id FROM embeddings UNION SELECT e.dst, c.lbl FROM comp c JOIN edges e ON e.src = c.id) " +
        "SELECT id AS vec_id, MIN(lbl) AS cluster_id, (id = MIN(lbl)) AS keep FROM comp GROUP BY id ORDER BY vec_id"
    },
    // non-adaptive core of the capped LSH near-dup: two fixed plane
    // families (offsets 0/101, the adaptive key's table layout), hot =
    // bucket population > 64, cold buckets pair within-bucket, hot
    // buckets star-expand against their min-id member; pairs dedup
    // across tables before the unrounded score filter. Bucket ids via
    // the same generated lshBucketSql mirror as the other LSH keys.
    "q_dedup_embedding_lsh_capped_fixed" -> {
      val t = (i: Int) => {
        val b = Similarity.lshBucketSql("embedding", 4, 64, i * 101)
        s"wb$i AS (SELECT vec_id, embedding, $b AS bucket FROM embeddings), " +
          s"cn$i AS (SELECT bucket, COUNT(*) > 64 AS hot FROM wb$i GROUP BY bucket), " +
          s"tg$i AS (SELECT vec_id, embedding, wb$i.bucket, hot FROM wb$i JOIN cn$i ON wb$i.bucket = cn$i.bucket), " +
          s"cp$i AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM tg$i a JOIN tg$i b ON a.bucket = b.bucket AND a.vec_id < b.vec_id WHERE NOT a.hot AND NOT b.hot), " +
          s"rp$i AS (SELECT bucket, MIN(vec_id) AS id_a FROM tg$i WHERE hot GROUP BY bucket), " +
          s"sp$i AS (SELECT r.id_a, h.vec_id AS id_b FROM tg$i h JOIN rp$i r ON h.bucket = r.bucket AND h.vec_id <> r.id_a WHERE h.hot)"
      }
      s"WITH ${t(0)}, ${t(1)}, " +
        "pairs AS (SELECT DISTINCT id_a, id_b FROM (SELECT id_a, id_b FROM cp0 UNION ALL SELECT id_a, id_b FROM sp0 UNION ALL SELECT id_a, id_b FROM cp1 UNION ALL SELECT id_a, id_b FROM sp1)), " +
        s"s AS (SELECT id_a, id_b, ${dotSql("ea.embedding", "eb.embedding")} AS score FROM pairs JOIN embeddings ea ON ea.vec_id = id_a JOIN embeddings eb ON eb.vec_id = id_b) " +
        "SELECT id_a, id_b, ROUND(score, 6) AS score FROM s WHERE score > 0.25 ORDER BY id_a, id_b"
    },
    // the ADAPTIVE capped key itself (r15, no_oracle extinction): plane
    // count = the integer autoPlanes formula over COUNT(*), refinement
    // loop unrolled to its maxDepth bound, planes computed by the
    // integer hyperplane formula inline — see cappedLshMirrorSql
    "q_dedup_embedding_lsh_capped" ->
      Similarity.cappedLshMirrorSql(threshold = 0.25, target = 64L, cap = 256L),
    // one capped-LSH refinement round: level-0 buckets, the hot test,
    // the sub-plane re-bucket composition (bucket*8 + sub-signature at
    // plane offset 4), and the post-round population/residual-hot flag
    "q_lsh_refine_round" -> {
      val b0 = Similarity.lshBucketSql("embedding", 4, 64)
      val sub = Similarity.lshBucketSql("embedding", 3, 64, 4)
      s"WITH b0 AS (SELECT vec_id, embedding, CAST($b0 AS BIGINT) AS bucket FROM embeddings), " +
        "c0 AS (SELECT bucket, COUNT(*) > 64 AS hot0 FROM b0 GROUP BY bucket), " +
        s"refined AS (SELECT vec_id, CASE WHEN hot0 THEN 1 ELSE 0 END AS lvl, CASE WHEN hot0 THEN b0.bucket * 8 + ($sub) ELSE b0.bucket END AS bucket FROM b0 JOIN c0 ON b0.bucket = c0.bucket), " +
        "a AS (SELECT lvl, bucket, COUNT(*) AS n_bucket FROM refined GROUP BY lvl, bucket) " +
        "SELECT r.vec_id, r.lvl, r.bucket, a.n_bucket, CAST(a.n_bucket > 64 AS INTEGER) AS still_hot " +
        "FROM refined r JOIN a ON r.lvl = a.lvl AND r.bucket = a.bucket ORDER BY vec_id"
    },
    // fixed-seed IVF: the 16 lowest candidate ids seed the quantizer
    // (no hash sample, no Lloyd), so assignment, probe choice and the
    // final ranking are all the shared sequential dot fold — window
    // ranks mirror the Spark row_number tie-breaks exactly
    // the full PRODUCTION IVF build→probe (r15, no_oracle extinction):
    // multiplicative-hash seed sample (pure BIGINT — xxhash64 was the
    // old, DuckDB-opaque choice), one Lloyd refinement via the decimal
    // device (ROUND(x,9)→DECIMAL(18,9) exact sums, mean ROUND(/n, 6)),
    // centroid arrays rebuilt in dim order, then the q_ivf_topk_fixed
    // probe plan verbatim
    "q_ivf_topk" -> {
      import sim.Similarity.{seedHashMul, seedHashMod}
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8), " +
        "q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), " +
        s"sd AS (SELECT cid AS centroid_id, ce AS centroid FROM c WHERE cid IN (SELECT cid FROM c ORDER BY ((cid % $seedHashMod) * $seedHashMul) % $seedHashMod, cid LIMIT 16)), " +
        s"a0 AS (SELECT cid, ce, centroid_id FROM (SELECT c.cid, c.ce, sd.centroid_id, ROW_NUMBER() OVER (PARTITION BY c.cid ORDER BY ${dotSql("c.ce", "sd.centroid")} DESC, sd.centroid_id) AS r FROM c CROSS JOIN sd) WHERE r = 1), " +
        "ex AS (SELECT centroid_id, i AS dim, CAST(ROUND(CAST(ce[i+1] AS DOUBLE), 9) AS DECIMAL(18,9)) AS xd FROM a0 CROSS JOIN range(0,64) t(i)), " +
        "mn AS (SELECT centroid_id, dim, ROUND(CAST(SUM(xd) AS DOUBLE)/COUNT(*), 6) AS coord FROM ex GROUP BY centroid_id, dim), " +
        "ctr AS (SELECT centroid_id, list(coord ORDER BY dim) AS centroid FROM mn GROUP BY centroid_id), " +
        s"asg AS (SELECT cid, ce, centroid_id FROM (SELECT c.cid, c.ce, ctr.centroid_id, ROW_NUMBER() OVER (PARTITION BY c.cid ORDER BY ${dotSql("c.ce", "ctr.centroid")} DESC, ctr.centroid_id) AS r FROM c CROSS JOIN ctr) WHERE r = 1), " +
        s"probes AS (SELECT qid, qe, centroid_id FROM (SELECT q.qid, q.qe, ctr.centroid_id, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY ${dotSql("q.qe", "ctr.centroid")} DESC, ctr.centroid_id) AS r FROM q CROSS JOIN ctr) WHERE r <= 4), " +
        s"s AS (SELECT qid, cid, ${dotSql("qe", "ce")} AS score FROM asg JOIN probes USING (centroid_id)) " +
        "SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM s) WHERE rn <= 3 ORDER BY qid, rn"
    },
    "q_ivf_topk_fixed" -> {
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8), " +
        "q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), " +
        "ctr AS (SELECT cid AS centroid_id, ce AS centroid FROM c WHERE cid IN (SELECT cid FROM c ORDER BY cid LIMIT 16)), " +
        s"asg AS (SELECT cid, ce, centroid_id FROM (SELECT c.cid, c.ce, ctr.centroid_id, ROW_NUMBER() OVER (PARTITION BY c.cid ORDER BY ${dotSql("c.ce", "ctr.centroid")} DESC, ctr.centroid_id) AS r FROM c CROSS JOIN ctr) WHERE r = 1), " +
        s"probes AS (SELECT qid, qe, centroid_id FROM (SELECT q.qid, q.qe, ctr.centroid_id, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY ${dotSql("q.qe", "ctr.centroid")} DESC, ctr.centroid_id) AS r FROM q CROSS JOIN ctr) WHERE r <= 4), " +
        s"s AS (SELECT qid, cid, ${dotSql("qe", "ce")} AS score FROM asg JOIN probes USING (centroid_id)) " +
        "SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM s) WHERE rn <= 3 ORDER BY qid, rn"
    },
    // composed IVF->PQ serving key: the fixed-seed IVF CTEs (ctr/asg/
    // probes, q_ivf_topk_fixed verbatim) feed the PQ CTEs (book/csub/
    // dists/codes/lut, q_pq_topk verbatim) — with the one structural
    // difference that IS the operator: codes carry their centroid_id and
    // the scoring join goes codes ⋈ probes (pruning) before the LUT, so
    // only probed lists are ever scored. Same determinism devices:
    // min-id tie-breaks, 6-dp DECIMAL ADC partials.
    "q_ivf_pq_topk" -> {
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8), " +
        "q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8), " +
        "ctr AS (SELECT cid AS centroid_id, ce AS centroid FROM c WHERE cid IN (SELECT cid FROM c ORDER BY cid LIMIT 16)), " +
        s"asg AS (SELECT cid, ce, centroid_id FROM (SELECT c.cid, c.ce, ctr.centroid_id, ROW_NUMBER() OVER (PARTITION BY c.cid ORDER BY ${dotSql("c.ce", "ctr.centroid")} DESC, ctr.centroid_id) AS r FROM c CROSS JOIN ctr) WHERE r = 1), " +
        s"probes AS (SELECT qid, centroid_id FROM (SELECT q.qid, ctr.centroid_id, ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY ${dotSql("q.qe", "ctr.centroid")} DESC, ctr.centroid_id) AS r FROM q CROSS JOIN ctr) WHERE r <= 4), " +
        "ms AS (SELECT UNNEST(range(0, 8)) AS m), " +
        "book AS (SELECT m, CAST(vec_id - 8 AS INTEGER) AS k, list_transform(embedding[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS cv FROM embeddings CROSS JOIN ms WHERE vec_id >= 8 AND vec_id < 24), " +
        "csub AS (SELECT centroid_id, cid, m, list_transform(ce[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS sv FROM asg CROSS JOIN ms), " +
        "dists AS (SELECT centroid_id, cid, m, k, list_aggregate(list_transform(range(1, 9), i -> (sv[i] - cv[i]) * (sv[i] - cv[i])), 'sum') AS dist FROM csub JOIN book USING (m)), " +
        "codes AS (SELECT centroid_id, cid, m, k FROM (SELECT centroid_id, cid, m, k, ROW_NUMBER() OVER (PARTITION BY cid, m ORDER BY dist, k) AS rn FROM dists) WHERE rn = 1), " +
        "pruned AS (SELECT qid, cid, m, k FROM codes JOIN probes USING (centroid_id)), " +
        "qsub AS (SELECT qid, m, list_transform(qe[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS qv FROM q CROSS JOIN ms), " +
        "lut AS (SELECT qid, m, k, CAST(ROUND(list_aggregate(list_transform(range(1, 9), i -> qv[i] * cv[i]), 'sum'), 6) AS DECIMAL(18,6)) AS pdot FROM qsub JOIN book USING (m)), " +
        "sc AS (SELECT qid, cid, CAST(SUM(pdot) AS DOUBLE) AS score FROM pruned JOIN lut USING (qid, m, k) GROUP BY qid, cid) " +
        "SELECT qid, cid, ROUND(score, 6) AS score, rn FROM (SELECT qid, cid, score, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INTEGER) AS rn FROM sc) WHERE rn <= 3 ORDER BY qid, rn"
    },
    // LSH-bucketed all-pairs near-dup: same generated bucket mirror;
    // one-bit multi-probe on the probe side only (pairs are unique by
    // construction — b0 and its flips are distinct), unrounded filter
    "q_dedup_embedding_lsh" -> {
      s"WITH wb AS (SELECT vec_id, embedding, ${Similarity.lshBucketSql("embedding", 4, 64)} AS b0 FROM embeddings), " +
        s"a AS (SELECT vec_id AS id_a, embedding AS ea, ${Similarity.multiProbeSql("b0", 4)} AS bucket FROM wb), " +
        "b AS (SELECT vec_id AS id_b, embedding AS eb, b0 AS bucket FROM wb), " +
        s"s AS (SELECT id_a, id_b, ${dotSql("ea", "eb")} AS score FROM a JOIN b USING (bucket) WHERE id_a < id_b) " +
        "SELECT id_a, id_b, ROUND(score, 6) AS score FROM s WHERE score > 0.25 ORDER BY id_a, id_b"
    },
    // Gopher composite gate: every threshold interpolated from the same
    // TextOps constants the Spark side reads; ratio signals rounded to
    // 6 dp BEFORE thresholding, thresholds pinned CAST(x AS DOUBLE) so
    // both engines make the identical keep decision per document
    "q_quality_gopher" -> {
      val stop = TextOps.stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
      "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
        "m AS (SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens, " +
        "ROUND(CAST(list_aggregate(list_transform(toks, t -> len(t)), 'sum') AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS mean_token_len, " +
        s"CAST(len(list_filter(toks, t -> list_contains($stop, t))) AS INTEGER) AS stop_hits, " +
        "ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS distinct_ratio FROM t) " +
        s"SELECT doc_id, n_tokens, mean_token_len, stop_hits, distinct_ratio, " +
        s"(n_tokens >= ${TextOps.gopherMinTokens} AND n_tokens <= ${TextOps.gopherMaxTokens}) AS len_ok, " +
        s"(mean_token_len >= CAST(${TextOps.gopherMeanLenMin} AS DOUBLE) AND mean_token_len <= CAST(${TextOps.gopherMeanLenMax} AS DOUBLE)) AS mean_len_ok, " +
        s"(stop_hits >= ${TextOps.gopherMinStopHits}) AS stop_ok, " +
        s"(distinct_ratio >= CAST(${TextOps.gopherMinDistinctRatio} AS DOUBLE)) AS diverse_ok, " +
        s"(n_tokens >= ${TextOps.gopherMinTokens} AND n_tokens <= ${TextOps.gopherMaxTokens} AND mean_token_len >= CAST(${TextOps.gopherMeanLenMin} AS DOUBLE) AND mean_token_len <= CAST(${TextOps.gopherMeanLenMax} AS DOUBLE) AND stop_hits >= ${TextOps.gopherMinStopHits} AND distinct_ratio >= CAST(${TextOps.gopherMinDistinctRatio} AS DOUBLE)) AS keep " +
        "FROM m ORDER BY doc_id"
    },
    // token entropy: per-term −p·ln p rounded to 6 dp then summed as
    // DECIMAL (addition-order-proof, the BM25 device); norm guard (d=1)
    // mirrored as the same CASE on both engines
    "q_quality_entropy" ->
      ("WITH tk AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents), " +
        "tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tk GROUP BY doc_id, t), " +
        "tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS d FROM tf GROUP BY doc_id), " +
        "con AS (SELECT tf.doc_id, n, d, CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS e FROM tf JOIN tot ON tf.doc_id = tot.doc_id) " +
        "SELECT doc_id, MIN(n) AS n_tokens, MIN(d) AS n_distinct, CAST(SUM(e) AS DOUBLE) AS entropy, " +
        "CASE WHEN MIN(d) > 1 THEN ROUND(CAST(SUM(e) AS DOUBLE) / ln(CAST(MIN(d) AS DOUBLE)), 6) ELSE CAST(0.0 AS DOUBLE) END AS norm_entropy " +
        "FROM con GROUP BY doc_id ORDER BY doc_id"),
    // regex pre-tokenizer: piece regex interpolated from TextOps
    // (disjoint char classes — Java regex and RE2 agree); deterministic
    // injection exercises the numeric/symbol classes (q_scrub_pii
    // device); exact piece stream verified via md5 over a \\u0001 join
    "q_token_bpe" -> {
      val inj = "CASE WHEN doc_id % 5 = 0 THEN concat('id=', CAST(doc_id AS VARCHAR), ' v1.2, cost $', CAST(doc_id % 97 AS VARCHAR), '! ', text) ELSE text END"
      s"WITH inj AS (SELECT doc_id, $inj AS tx FROM documents) " +
        s"SELECT doc_id, CAST(len(regexp_extract_all(tx, '${TextOps.bpePieceRe}')) AS INTEGER) AS n_pieces, " +
        s"CAST(len(regexp_extract_all(tx, '${TextOps.bpeNumRe}')) AS INTEGER) AS n_numeric, " +
        s"CAST(len(regexp_extract_all(tx, '${TextOps.bpeSymRe}')) AS INTEGER) AS n_symbol, " +
        s"md5(array_to_string(regexp_extract_all(tx, '${TextOps.bpePieceRe}'), chr(1))) AS pieces_md5 FROM inj ORDER BY doc_id"
    },
    // single-pass moment statistics: the five moment sums are exact
    // DECIMAL (partitioning-independent); the derived mean/var/std/corr
    // chain is written in ONE fixed order, mirrored token for token
    // (operands cast DECIMAL(19,4) in DuckDB: 18-wide operands multiply
    // in int64 and overflow; 19 forces the exact int128 path — values
    // are identical, so parity with Spark's DECIMAL(18,4) products holds)
    "q_stats_moments" -> {
      val q = "CAST(l_quantity AS DECIMAL(19,4))"
      val p = "CAST(l_extendedprice AS DECIMAL(19,4))"
      def prod(a: String, b: String) = s"CAST(SUM(CAST($a * $b AS DECIMAL(30,8))) AS DOUBLE)"
      val nd = "CAST(n AS DOUBLE)"
      val varX = s"(sxx - sx * sx / $nd) / $nd"
      val varY = s"(syy - sy * sy / $nd) / $nd"
      s"WITH m AS (SELECT l_returnflag, COUNT(*) AS n, CAST(SUM($q) AS DOUBLE) AS sx, CAST(SUM($p) AS DOUBLE) AS sy, ${prod(q, q)} AS sxx, ${prod(p, p)} AS syy, ${prod(q, p)} AS sxy FROM lineitem GROUP BY l_returnflag) " +
        s"SELECT l_returnflag, n, ROUND(sx / $nd, 6) AS mean_qty, ROUND($varX, 6) AS var_qty, ROUND(sqrt($varX), 6) AS std_qty, " +
        s"ROUND(((sxy - sx * sy / $nd) / $nd) / sqrt(($varX) * ($varY)), 6) AS corr_qty_price FROM m ORDER BY l_returnflag"
    },
    // distribution window functions: unique o_orderkey in the ordering
    // so CUME_DIST cannot be tie-ambiguous; NTILE cast to INTEGER
    // (Spark int vs DuckDB bigint)
    "q_window_ntile" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, CAST(NTILE(4) OVER w AS INTEGER) AS quartile, " +
        "ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank, ROUND(CUME_DIST() OVER w, 6) AS cdist " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) ORDER BY o_custkey, o_orderkey"),
    // full outer: unmatched rows on both sides are the point
    "q_join_full" ->
      ("SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey, o.n_open, o.open_total, c.c_name, c.c_acctbal " +
        "FROM (SELECT o_custkey, COUNT(*) AS n_open, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_total " +
        "FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) o " +
        "FULL OUTER JOIN (SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000) c " +
        "ON o.o_custkey = c.c_custkey ORDER BY custkey"),
    // sorted collect_list/collect_set: the ONLY deterministic grouped-
    // concatenation form (unsorted collect is partitioning-dependent)
    "q_agg_collect" ->
      ("SELECT o_custkey, string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses, " +
        "array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS prio_set, COUNT(*) AS n " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
    "q_agg_multi_distinct" ->
      ("SELECT l_linestatus, COUNT(DISTINCT l_partkey) AS nd_part, COUNT(DISTINCT l_suppkey) AS nd_supp, " +
        "COUNT(DISTINCT l_returnflag) AS nd_flag, COUNT(*) AS n FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"),
    // correlated EXISTS / NOT EXISTS — the decorrelation pair; Spark
    // side is the decorrelated semi+anti join form
    "q_subquery_exists" ->
      ("SELECT c_custkey, c_name, c_acctbal FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) " +
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') " +
        "ORDER BY c_custkey"),
    // gap-fill/densify: generated day spine (MIN..MAX) left-joined to
    // the daily aggregates; zero-fill types pinned (0 BIGINT, 0.0
    // DOUBLE), window SUM cast back to BIGINT (DuckDB -> HUGEINT)
    "q_gap_fill" ->
      ("WITH e AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, value FROM events), " +
        "daily AS (SELECT user_id, day, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM e GROUP BY user_id, day), " +
        "b AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM e), " +
        "spine AS (SELECT user_id, UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS day FROM (SELECT DISTINCT user_id FROM e) CROSS JOIN b) " +
        "SELECT user_id, day, COALESCE(n, CAST(0 AS BIGINT)) AS n, COALESCE(sum_value, CAST(0.0 AS DOUBLE)) AS sum_value, " +
        "CAST(SUM(COALESCE(n, 0)) OVER (PARTITION BY user_id ORDER BY day) AS BIGINT) AS cum_n " +
        "FROM spine LEFT JOIN daily USING (user_id, day) ORDER BY user_id, day"),
    // funnel: stage thresholds are keyed MINs (order-insensitive);
    // conversion window interpolated from TimeSeries.funnelWindowHours
    "q_funnel" -> {
      val w = s"INTERVAL ${TimeSeries.funnelWindowHours} HOUR"
      "WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tss FROM events), " +
        "t1 AS (SELECT user_id, MIN(tss) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id), " +
        s"t2 AS (SELECT e.user_id, MIN(tss) AS t2 FROM e JOIN t1 USING (user_id) WHERE event_type = 'click' AND tss > t1 AND tss <= t1 + $w GROUP BY e.user_id), " +
        s"t3 AS (SELECT e.user_id, MIN(tss) AS t3 FROM e JOIN t2 USING (user_id) WHERE event_type = 'purchase' AND tss > t2 AND tss <= t2 + $w GROUP BY e.user_id) " +
        "SELECT stage, n_users FROM (" +
        "SELECT '0_all' AS stage, COUNT(DISTINCT user_id) AS n_users FROM e " +
        "UNION ALL SELECT '1_view', COUNT(*) FROM t1 " +
        "UNION ALL SELECT '2_click', COUNT(*) FROM t2 " +
        "UNION ALL SELECT '3_purchase', COUNT(*) FROM t3) ORDER BY stage"
    },
    // cohort retention: month-truncated timestamps subtract to exact
    // month multiples, so Spark's CAST(months_between) ≡ DuckDB's
    // date_diff('month'); activity de-duplicated before COUNT(DISTINCT)
    "q_cohort" ->
      ("WITH o AS (SELECT o_custkey, CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month FROM orders), " +
        "f AS (SELECT o_custkey, MIN(month) AS cohort_month FROM o GROUP BY o_custkey), " +
        "a AS (SELECT DISTINCT o.o_custkey, cohort_month, month FROM o JOIN f USING (o_custkey)) " +
        "SELECT cohort_month, CAST(date_diff('month', cohort_month, month) AS INTEGER) AS month_offset, COUNT(DISTINCT o_custkey) AS n_customers " +
        "FROM a GROUP BY cohort_month, month_offset ORDER BY cohort_month, month_offset"),
    // sessionization: lag/flag/cumsum with event_id tiebreak; gap
    // interpolated from TimeSeries.sessionGapHours; duration in exact
    // integer µs (epoch_us ≡ unix_micros)
    "q_sessionize" -> {
      val g = s"INTERVAL ${TimeSeries.sessionGapHours} HOUR"
      "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, value FROM events), " +
        "l AS (SELECT *, lag(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev_ts FROM e), " +
        s"f AS (SELECT *, CASE WHEN prev_ts IS NULL OR tss > prev_ts + $g THEN 1 ELSE 0 END AS new_sess FROM l), " +
        "s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS BIGINT) AS session_idx FROM f) " +
        "SELECT user_id, session_idx, MIN(tss) AS session_start, MAX(tss) AS session_end, " +
        "epoch_us(MAX(tss)) - epoch_us(MIN(tss)) AS duration_us, COUNT(*) AS n_events, " +
        "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value " +
        "FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx"
    },
    // transition matrix: integer counts, prob = ROUND(n/rowtotal, 6)
    "q_markov_transitions" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, event_type FROM events), " +
        "l AS (SELECT event_type AS next_type, lag(event_type) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev_type FROM e), " +
        "c AS (SELECT prev_type, next_type, COUNT(*) AS n FROM l WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type) " +
        "SELECT prev_type, next_type, n, ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6) AS prob " +
        "FROM c ORDER BY prev_type, next_type"),
    // Welch t-test: md5-bucket arm assignment (cut literal from
    // Sampling.cutHex — same decision value as q_split_assign), DECIMAL
    // power sums, t/df arithmetic mirrored term for term
    "q_ab_test" -> {
      val cut = text.Sampling.cutHex(0.5)
      s"WITH e AS (SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$cut' THEN 'A' ELSE 'B' END AS arm, CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS x FROM events), " +
        "a AS (SELECT arm, COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(CAST(x*x AS DECIMAL(30,8))) AS DOUBLE) AS sxx FROM e GROUP BY arm), " +
        "p AS (SELECT arm, n, sx / CAST(n AS DOUBLE) AS m, (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v FROM a), " +
        "w AS (SELECT MAX(CASE WHEN arm='A' THEN n END) AS n_a, MAX(CASE WHEN arm='A' THEN m END) AS m_a, MAX(CASE WHEN arm='A' THEN v END) AS v_a, " +
        "MAX(CASE WHEN arm='B' THEN n END) AS n_b, MAX(CASE WHEN arm='B' THEN m END) AS m_b, MAX(CASE WHEN arm='B' THEN v END) AS v_b FROM p) " +
        "SELECT n_a, n_b, ROUND(m_a, 6) AS mean_a, ROUND(m_b, 6) AS mean_b, " +
        "ROUND((m_a - m_b) / sqrt(v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE)), 6) AS t_stat, " +
        "ROUND(pow(v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE), 2) / " +
        "(pow(v_a / CAST(n_a AS DOUBLE), 2) / (CAST(n_a AS DOUBLE) - 1) + pow(v_b / CAST(n_b AS DOUBLE), 2) / (CAST(n_b AS DOUBLE) - 1)), 6) AS welch_df FROM w"
    },
    // linear attribution: per-purchase credit 1/n as ROUND(,9)->DECIMAL
    // terms so the channel sum folds engine-exact
    "q_attribution" -> {
      val lb = s"INTERVAL ${TimeSeries.attributionWindowHours} HOUR"
      "WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS tss FROM events), " +
        "p AS (SELECT user_id, event_id AS p_id, tss AS p_ts FROM e WHERE event_type = 'purchase'), " +
        "t AS (SELECT user_id, event_type AS channel, tss AS t_ts FROM e WHERE event_type IN ('view','click')), " +
        s"m AS (SELECT p_id, channel FROM p JOIN t USING (user_id) WHERE t_ts < p_ts AND t_ts >= p_ts - $lb), " +
        "c AS (SELECT p_id, channel, CAST(ROUND(CAST(1.0 AS DOUBLE) / COUNT(*) OVER (PARTITION BY p_id), 9) AS DECIMAL(18,9)) AS credit FROM m) " +
        "SELECT channel, COUNT(*) AS n_touches, COUNT(DISTINCT p_id) AS n_purchases_touched, " +
        "ROUND(CAST(SUM(credit) AS DOUBLE), 6) AS credit FROM c GROUP BY channel ORDER BY channel"
    },
    // per-user trend: grouped power sums over (exact hours, DECIMAL
    // value); slope mirrored term for term
    "q_trend_per_user" ->
      ("WITH o AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t0 FROM events GROUP BY user_id), " +
        "d AS (SELECT e.user_id, CAST(ROUND(CAST(epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(t0) AS DOUBLE) / 3600000000.0, 6) AS DECIMAL(18,6)) AS x, CAST(value AS DECIMAL(18,2)) AS y FROM events e JOIN o USING (user_id)), " +
        "s AS (SELECT user_id, COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(CAST(x*y AS DECIMAL(30,8))) AS DOUBLE) AS sxy, CAST(SUM(CAST(x*x AS DECIMAL(30,12))) AS DOUBLE) AS sxx FROM d GROUP BY user_id) " +
        "SELECT user_id, n, ROUND((sxy - sx * sy / CAST(n AS DOUBLE)) / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS slope_per_hour FROM s ORDER BY user_id"),
    // entry paths: rank-filtered prefix, in-order list join, path count
    "q_funnel_paths" -> {
      val k = TimeSeries.pathLen
      "WITH r AS (SELECT user_id, event_type, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn FROM events), " +
        s"f AS (SELECT user_id, array_to_string(list(event_type ORDER BY rn), '>') AS path, COUNT(*) AS k FROM r WHERE rn <= $k GROUP BY user_id) " +
        s"SELECT path, COUNT(*) AS n_users FROM f WHERE k = $k GROUP BY path ORDER BY n_users DESC, path"
    },
    // k-anonymity: QI equivalence classes with an at-risk flag
    "q_k_anonymity" -> {
      val k = RelQueries.kAnonK
      "SELECT c_nationkey, c_mktsegment, CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign, " +
        s"COUNT(*) AS class_size, CAST(COUNT(*) < $k AS INTEGER) AS at_risk FROM customer " +
        "GROUP BY c_nationkey, c_mktsegment, bal_sign ORDER BY c_nationkey, c_mktsegment, bal_sign"
    },
    // RFM: anchored recency + quintile ntiles totally ordered by the
    // custkey tie-break, so scores reproduce on both engines
    "q_rfm" -> {
      val k = RelQueries.rfmBuckets
      "WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, CAST(o_totalprice AS DECIMAL(18,2)) AS tp FROM orders), " +
        "a AS (SELECT MAX(d) AS anchor FROM o), " +
        "b AS (SELECT o_custkey, CAST(date_diff('day', MAX(d), (SELECT anchor FROM a)) AS INTEGER) AS recency_days, COUNT(*) AS frequency, SUM(tp) AS monetary FROM o GROUP BY o_custkey) " +
        "SELECT o_custkey, recency_days, frequency, ROUND(CAST(monetary AS DOUBLE), 2) AS monetary, " +
        s"CAST(NTILE($k) OVER (ORDER BY recency_days DESC, o_custkey) AS INTEGER) AS r_score, " +
        s"CAST(NTILE($k) OVER (ORDER BY frequency, o_custkey) AS INTEGER) AS f_score, " +
        s"CAST(NTILE($k) OVER (ORDER BY monetary, o_custkey) AS INTEGER) AS m_score " +
        "FROM b ORDER BY o_custkey"
    },
    // DQ audit: each check one conditional aggregate / distinct-parent
    // left join, mirrored branch for branch
    "q_dq_audit" ->
      ("WITH pk AS (SELECT 'pk_unique_lineitem' AS check_name, 'lineitem' AS table_name, COUNT(*) AS n_rows, CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_violations FROM lineitem), " +
        "f1 AS (SELECT 'fk_lineitem_orders', 'lineitem', COUNT(*), CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON l.l_orderkey = o.o_orderkey), " +
        "f2 AS (SELECT 'fk_orders_customer', 'orders', COUNT(*), CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c ON o.o_custkey = c.c_custkey), " +
        "bal AS (SELECT 'nonneg_c_acctbal', 'customer', COUNT(*), CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM customer), " +
        "disc AS (SELECT 'range_l_discount', 'lineitem', COUNT(*), CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem), " +
        "fresh AS (SELECT 'fresh_o_orderdate', 'orders', COUNT(*), CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) > DATE '2001-01-01' THEN 1 ELSE 0 END) AS BIGINT) FROM orders), " +
        "txt AS (SELECT 'nonempty_text', 'documents', COUNT(*), CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) FROM documents), " +
        "u AS (SELECT * FROM pk UNION ALL SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM bal UNION ALL SELECT * FROM disc UNION ALL SELECT * FROM fresh UNION ALL SELECT * FROM txt) " +
        "SELECT check_name, table_name, n_rows, n_violations, CAST(n_violations = 0 AS INTEGER) AS pass FROM u ORDER BY check_name"),
    // target encoding: DECIMAL-exact category sums, the LOO shrinkage
    // expression mirrored term for term
    "q_target_encoding" -> {
      val m = RelQueries.teSmoothing
      "WITH s AS (SELECT o_orderpriority AS category, COUNT(*) AS n_cat, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_cat FROM orders GROUP BY o_orderpriority), " +
        "p AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS prior FROM orders) " +
        "SELECT o_orderkey, o_orderpriority AS category, " +
        s"ROUND((CAST(sum_cat AS DOUBLE) - o_totalprice + $m * prior) / (CAST(n_cat AS DOUBLE) - 1.0 + $m), 6) AS te " +
        "FROM orders JOIN s ON s.category = orders.o_orderpriority CROSS JOIN p " +
        "ORDER BY o_orderkey, category"
    },
    // CMS heavy hitters: counters rebuilt bucket-for-bucket from the
    // hex60 hash mirror; flags pin both sketch guarantees
    "q_heavy_hitters" -> {
      import text.TextOps.{cmsDepth, cmsWidth, hhTopK}
      "WITH tok AS (SELECT string_split(lower(text), ' ') AS toks FROM documents), " +
        "tk AS (SELECT array_to_string(toks[CAST(i + 1 AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS t FROM (SELECT toks, UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS i FROM tok)), " +
        "cnts AS (SELECT t, COUNT(*) AS n FROM tk WHERE t <> '' GROUP BY t), " +
        "tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM cnts), " +
        s"kb AS (SELECT t, n, r, (${hex60Sql("md5('cms' || CAST(r AS VARCHAR) || ':' || t)")}) % $cmsWidth AS b FROM cnts CROSS JOIN (SELECT UNNEST(range(0, $cmsDepth)) AS r) rr), " +
        "ctr AS (SELECT r, b, CAST(SUM(n) AS BIGINT) AS cnt FROM kb GROUP BY r, b), " +
        s"top AS (SELECT t, n FROM cnts ORDER BY n DESC, t LIMIT $hhTopK), " +
        "est AS (SELECT kb.t, kb.n, MIN(ctr.cnt) AS cms_est FROM top JOIN kb ON kb.t = top.t JOIN ctr ON ctr.r = kb.r AND ctr.b = kb.b GROUP BY kb.t, kb.n) " +
        "SELECT t AS token, n AS n_exact, cms_est, " +
        "CAST(cms_est >= n AS INTEGER) AS overcount_ok, " +
        s"CAST(cms_est <= n + ceil(2.0 * CAST(n_total AS DOUBLE) / $cmsWidth.0) AS INTEGER) AS within_bound " +
        "FROM est CROSS JOIN tot ORDER BY n_exact DESC, token"
    },
    // correlation matrix: the one-pass DECIMAL power sums rebuilt in a
    // CTE, each pair's cov/corr mirrored term for term
    "q_corr_matrix" -> {
      val vars = Seq("discount" -> "l_discount", "price" -> "l_extendedprice",
        "quantity" -> "l_quantity", "tax" -> "l_tax")
      def d4(c: String) = s"CAST($c AS DECIMAL(18,4))"
      // width 19 operands force DuckDB's hugeint multiply path — the
      // (18,4)x(18,4) int64 path overflows on price*price
      def d19(c: String) = s"CAST($c AS DECIMAL(19,4))"
      val sums = vars.map { case (nm, c) =>
        s"CAST(SUM(${d4(c)}) AS DOUBLE) AS s_$nm" }
      val prods = for {
        i <- vars.indices; j <- i until vars.size
      } yield s"CAST(SUM(CAST(${d19(vars(i)._2)} * ${d19(vars(j)._2)} AS DECIMAL(30,8))) AS DOUBLE) AS s_${vars(i)._1}_${vars(j)._1}"
      def ss(a: String, b: String) = s"(s_${a}_$b - s_$a * s_$b / CAST(n AS DOUBLE))"
      val branches = for {
        i <- vars.indices; j <- (i + 1) until vars.size
      } yield {
        val (a, b) = (vars(i)._1, vars(j)._1)
        s"SELECT '$a' AS var_a, '$b' AS var_b, n, " +
          s"ROUND(${ss(a, b)} / CAST(n AS DOUBLE), 6) AS cov, " +
          s"ROUND(${ss(a, b)} / sqrt(${ss(a, a)} * ${ss(b, b)}), 6) AS corr FROM s"
      }
      s"WITH s AS (SELECT COUNT(*) AS n, ${(sums ++ prods).mkString(", ")} FROM lineitem) " +
        branches.mkString("", " UNION ALL ", " ORDER BY var_a, var_b")
    },
    // seasonality grid: ISO dow on both engines; DECIMAL value sums
    "q_seasonal_profile" ->
      ("WITH c AS (SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS INTEGER) AS dow, CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod, COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sv FROM events GROUP BY dow, hod), " +
        "g AS (SELECT CAST(SUM(sv) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS g_mean FROM c) " +
        "SELECT dow, hod, n, ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_value, " +
        "ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) - g_mean, 6) AS dev_from_global " +
        "FROM c CROSS JOIN g ORDER BY dow, hod"),
    // calibration: the q_eval_metrics scoring verbatim, then per-bin
    // DECIMAL(18,6) prob sums (the rounded prob is exactly representable)
    "q_calibration" -> {
      val k = VectorOps.calibBins
      s"WITH s AS (SELECT ROUND(1.0/(1.0+exp(-(${dotSql("embedding", wLit)} + ${VectorOps.demoBias}))), 6) AS p, CAST((list_position(embedding, list_max(embedding)) - 1) % 2 AS INTEGER) AS y FROM embeddings), " +
        s"b AS (SELECT CAST(least(floor(p * $k), ${k - 1}) AS INTEGER) AS bin, p, y FROM s), " +
        "a AS (SELECT bin, COUNT(*) AS n, SUM(CAST(p AS DECIMAL(18,6))) AS sp, CAST(SUM(y) AS BIGINT) AS sy FROM b GROUP BY bin) " +
        "SELECT bin, n, ROUND(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_p, " +
        "ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos, " +
        "ROUND(abs(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS gap " +
        "FROM a ORDER BY bin"
    },
    // EMA: the truncated kernel as lag() reads; Scala-computed weight
    // doubles interpolated verbatim, the weighted chain left-assoc on
    // both engines
    "q_ema_smoothing" -> {
      import rel.TimeSeries.{emaAlpha, emaLags}
      val wts = (0 until emaLags).map(k => math.pow(emaAlpha, k))
      val over = "OVER (PARTITION BY user_id ORDER BY tss, event_id)"
      def lagK(k: Int) = if (k == 0) "value" else s"lag(value, $k) $over"
      val num = (0 until emaLags)
        .map(k => s"COALESCE(${wts(k)} * ${lagK(k)}, 0.0)").mkString(" + ")
      val den = (0 until emaLags)
        .map(k => s"CASE WHEN ${lagK(k)} IS NULL THEN 0.0 ELSE ${wts(k)} END")
        .mkString(" + ")
      "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, value FROM events) " +
        s"SELECT user_id, event_id, value, ROUND(($num) / ($den), 6) AS ema " +
        "FROM e ORDER BY user_id, event_id"
    },
    // Benford: digit read from the canonical DECIMAL string; chi2 from
    // the ROUNDED frequencies so both engines compute identical terms
    "q_benford" -> {
      val obs = "ROUND(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6)"
      val exp = "ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)"
      "WITH d AS (SELECT TRY_CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM orders), " +
        "g AS (SELECT digit, COUNT(*) AS n FROM d WHERE digit BETWEEN 1 AND 9 GROUP BY digit), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM g) " +
        s"SELECT digit, n, $obs AS obs_freq, $exp AS benford_freq, " +
        s"ROUND(CAST(n_total AS DOUBLE) * ($obs - $exp) * ($obs - $exp) / $exp, 6) AS chi2_term " +
        "FROM g CROSS JOIN t ORDER BY digit"
    },
    // Poisson bootstrap: integer thresholds on the integer hash uniform
    // (no floats in the weights); replicate means ROUND(,9)->DECIMAL;
    // width-19 cast forces the hugeint multiply path for m*m
    "q_bootstrap_se" -> {
      import text.Sampling.{bootReps, poissonCuts}
      val wCase = "CASE " + poissonCuts.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString(" ") + s" ELSE ${poissonCuts.size} END"
      s"WITH r AS (SELECT doc_id, source, n_chars, UNNEST(range(0, $bootReps)) AS rep FROM documents), " +
        s"w AS (SELECT source, rep, n_chars, $wCase AS w FROM (SELECT source, rep, n_chars, (${hex60Sql("md5('boot' || CAST(rep AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))")}) % 1000000 AS u FROM r)), " +
        "m AS (SELECT source, rep, CAST(ROUND(CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 9) AS DECIMAL(18,9)) AS m FROM w GROUP BY source, rep), " +
        "e AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sx FROM documents GROUP BY source), " +
        "s AS (SELECT source, CAST(SUM(m) AS DOUBLE) AS sm, CAST(SUM(CAST(CAST(m AS DECIMAL(19,9)) * CAST(m AS DECIMAL(19,9)) AS DECIMAL(38,18))) AS DOUBLE) AS smm FROM m GROUP BY source) " +
        s"SELECT s.source, n_docs, ROUND(CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_chars, " +
        s"ROUND(sqrt((smm - sm * sm / $bootReps.0) / ($bootReps.0 - 1.0)), 6) AS boot_se " +
        "FROM s JOIN e ON e.source = s.source ORDER BY s.source"
    },
    // PSI: the q_split_assign md5 cut, fixed bin spine, add-0.5
    // smoothing; terms ROUND(,9)->DECIMAL so the total is order-proof
    "q_psi" -> {
      import text.TextOps.{psiBins, psiBinWidth}
      val c80 = text.Sampling.cutHex(0.8)
      val c90 = text.Sampling.cutHex(0.9)
      val pT = s"(CAST(n_train AS DOUBLE) + 0.5) / (CAST(nt AS DOUBLE) + ${0.5 * psiBins})"
      val pV = s"(CAST(n_val AS DOUBLE) + 0.5) / (CAST(nv AS DOUBLE) + ${0.5 * psiBins})"
      s"WITH d AS (SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '$c80' THEN 'train' WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '$c90' THEN 'val' ELSE 'test' END AS split, CAST(least(floor(length(text) / $psiBinWidth), ${psiBins - 1}) AS INTEGER) AS bin FROM documents), " +
        "c AS (SELECT bin, CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train, CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val FROM d WHERE split IN ('train', 'val') GROUP BY bin), " +
        s"f AS (SELECT CAST(s.b AS INTEGER) AS bin, COALESCE(n_train, 0) AS n_train, COALESCE(n_val, 0) AS n_val FROM (SELECT UNNEST(range(0, $psiBins)) AS b) s LEFT JOIN c ON c.bin = s.b), " +
        "t AS (SELECT CAST(SUM(n_train) AS BIGINT) AS nt, CAST(SUM(n_val) AS BIGINT) AS nv FROM f), " +
        s"x AS (SELECT bin, n_train, n_val, ROUND($pT, 6) AS p_train, ROUND($pV, 6) AS p_val, CAST(ROUND(($pT - $pV) * ln(($pT) / ($pV)), 9) AS DECIMAL(18,9)) AS term FROM f CROSS JOIN t), " +
        "g AS (SELECT ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi_total FROM x) " +
        "SELECT bin, n_train, n_val, p_train, p_val, CAST(term AS DOUBLE) AS psi_term, psi_total FROM x CROSS JOIN g ORDER BY bin"
    },
    // seasonal anomaly: the seasonal-profile cells with DECIMAL power
    // sums, scored per row; top-100 by |z| with the |z|>3 flag (a hard
    // threshold is structurally empty when cells are small — max |z|
    // in a cell of n points is sqrt(n-1))
    "q_anomaly_seasonal" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS INTEGER) AS dow, CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hod, value FROM events), " +
        "c AS (SELECT dow, hod, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv, CAST(SUM(CAST(CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2)) AS DECIMAL(30,8))) AS DOUBLE) AS svv FROM e GROUP BY dow, hod), " +
        "s AS (SELECT dow, hod, sv / CAST(n AS DOUBLE) AS cell_mean, sqrt(greatest((svv - sv * sv / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0)) AS cell_sd FROM c), " +
        "r AS (SELECT user_id, event_id, e.dow, e.hod, value, ROUND((value - cell_mean) / cell_sd, 6) AS z " +
        "FROM e JOIN s ON s.dow = e.dow AND s.hod = e.hod WHERE cell_sd > 0) " +
        "SELECT user_id, event_id, dow, hod, value, z, abs(z) > 3.0 AS is_anomaly " +
        "FROM r ORDER BY abs(z) DESC, user_id, event_id LIMIT 100"),
    // growth accounting: distinct (user, week) lag classification
    "q_growth_accounting" ->
      ("WITH uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk FROM events), " +
        "l AS (SELECT wk, lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev FROM uw), " +
        "c AS (SELECT wk, CASE WHEN prev IS NULL THEN 'new' WHEN date_diff('day', prev, wk) = 7 THEN 'retained' ELSE 'resurrected' END AS cls FROM l), " +
        "w AS (SELECT wk, COUNT(*) AS n_active, CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new, CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected FROM c GROUP BY wk) " +
        "SELECT wk, n_active, n_new, n_retained, n_resurrected, " +
        "COALESCE(lag(n_active) OVER (ORDER BY wk), 0) - n_retained AS n_churned_from_prev " +
        "FROM w ORDER BY wk"),
    // MDE: the ab_test power sums + fixed z literals, one row
    "q_mde" -> {
      val cut = text.Sampling.cutHex(0.5)
      val z = rel.TimeSeries.mdeZAlpha + rel.TimeSeries.mdeZPower
      val se = "sqrt(v_a / CAST(n_a AS DOUBLE) + v_b / CAST(n_b AS DOUBLE))"
      s"WITH e AS (SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$cut' THEN 'A' ELSE 'B' END AS arm, CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS x FROM events), " +
        "a AS (SELECT arm, COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(CAST(x*x AS DECIMAL(30,8))) AS DOUBLE) AS sxx FROM e GROUP BY arm), " +
        "p AS (SELECT arm, n, sx / CAST(n AS DOUBLE) AS m, (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v FROM a), " +
        "w AS (SELECT MAX(CASE WHEN arm='A' THEN n END) AS n_a, MAX(CASE WHEN arm='A' THEN m END) AS m_a, MAX(CASE WHEN arm='A' THEN v END) AS v_a, " +
        "MAX(CASE WHEN arm='B' THEN n END) AS n_b, MAX(CASE WHEN arm='B' THEN v END) AS v_b FROM p) " +
        s"SELECT n_a, n_b, ROUND(m_a, 6) AS mean_a, ROUND($z * $se, 6) AS mde_abs, " +
        s"ROUND($z * $se / m_a, 6) AS mde_rel FROM w"
    },
    // path conversion: the funnel_paths prefix + a distinct-purchaser join
    "q_path_conversion" -> {
      val k = rel.TimeSeries.pathLen
      "WITH r AS (SELECT user_id, event_type, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn FROM events), " +
        s"f AS (SELECT user_id, array_to_string(list(event_type ORDER BY rn), '>') AS path, COUNT(*) AS k FROM r WHERE rn <= $k GROUP BY user_id), " +
        s"p AS (SELECT user_id, path FROM f WHERE k = $k), " +
        "cv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') " +
        "SELECT path, COUNT(*) AS n_users, CAST(SUM(CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_converted, " +
        "ROUND(CAST(SUM(CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate " +
        "FROM p LEFT JOIN cv ON cv.user_id = p.user_id GROUP BY path " +
        "ORDER BY n_users DESC, path"
    },
    // exact AUC: the calibration scoring CTE grouped to distinct
    // 6-dp scores; doubled Mann-Whitney numerator stays pure BIGINT
    "q_auc_exact" ->
      (s"WITH s AS (SELECT ROUND(1.0/(1.0+exp(-(${dotSql("embedding", wLit)} + ${VectorOps.demoBias}))), 6) AS p, CAST((list_position(embedding, list_max(embedding)) - 1) % 2 AS INTEGER) AS y FROM embeddings), " +
        "g AS (SELECT p, CAST(SUM(y) AS BIGINT) AS n1, CAST(SUM(1 - y) AS BIGINT) AS n0 FROM s GROUP BY p), " +
        "c AS (SELECT n1, n0, COALESCE(SUM(n0) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0 FROM g) " +
        "SELECT CAST(SUM(n1) AS BIGINT) AS n_pos, CAST(SUM(n0) AS BIGINT) AS n_neg, " +
        "ROUND(CAST(SUM(n1 * (2 * cum0 + n0)) AS DOUBLE) / (2.0 * CAST(SUM(n1) AS DOUBLE) * CAST(SUM(n0) AS DOUBLE)), 9) AS auc FROM c"),
    // KS: the psi split CTE, distinct-length cumulative counts; the
    // argmax is selected on the integer cross-product, ties to the
    // smaller length
    "q_ks_test" -> {
      val c80 = text.Sampling.cutHex(0.8)
      val c90 = text.Sampling.cutHex(0.9)
      s"WITH d AS (SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '$c80' THEN 'train' WHEN substring(md5(CAST(doc_id AS VARCHAR)),1,2) < '$c90' THEN 'val' ELSE 'test' END AS split, length(text) AS len FROM documents), " +
        "g AS (SELECT len, CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS a, CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS b FROM d WHERE split IN ('train', 'val') GROUP BY len), " +
        "c AS (SELECT len, SUM(a) OVER w AS ca, SUM(b) OVER w AS cb FROM g WINDOW w AS (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "t AS (SELECT CAST(SUM(a) AS BIGINT) AS n_train, CAST(SUM(b) AS BIGINT) AS n_val FROM g), " +
        "x AS (SELECT len, n_train, n_val, abs(CAST(ca AS HUGEINT) * CAST(n_val AS HUGEINT) - CAST(cb AS HUGEINT) * CAST(n_train AS HUGEINT)) AS diff2 FROM c CROSS JOIN t) " +
        "SELECT n_train, n_val, len AS at_len, " +
        "ROUND(CAST(diff2 AS DOUBLE) / (CAST(n_train AS DOUBLE) * CAST(n_val AS DOUBLE)), 9) AS d_stat " +
        "FROM x ORDER BY diff2 DESC, len LIMIT 1"
    },
    // Gini: rank-weighted identity over the per-customer cents
    // aggregate; hugeint products, one final double division
    "q_gini" ->
      ("WITH s AS (SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents FROM orders GROUP BY o_custkey), " +
        "r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i FROM s) " +
        "SELECT COUNT(*) AS n_customers, CAST(SUM(cents) AS BIGINT) AS total_cents, " +
        "ROUND((2.0 * CAST(SUM(CAST(i AS HUGEINT) * CAST(cents AS HUGEINT)) AS DOUBLE) - CAST(COUNT(*) + 1 AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)) / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)), 9) AS gini FROM r"),
    // Kaplan-Meier: censored time-to-conversion; at-risk = suffix sum
    // over distinct hours; survival = exp of cumulative
    // ROUND(,9)->DECIMAL ln terms; a terminal all-convert row
    // (d = n_risk) emits 0 via the same branch
    "q_survival_km" -> {
      val h = rel.TimeSeries.kmFollowupHours
      s"WITH u AS (SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us, MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS purch_us FROM events GROUP BY user_id), " +
        "dh AS (SELECT CAST(floor(CAST(purch_us - first_us AS DOUBLE) / 3600000000.0) AS BIGINT) AS dur_h, purch_us FROM u), " +
        s"lab AS (SELECT CASE WHEN purch_us IS NOT NULL AND dur_h <= $h THEN dur_h ELSE $h END AS t, CASE WHEN purch_us IS NOT NULL AND dur_h <= $h THEN 1 ELSE 0 END AS converted FROM dh), " +
        "bt AS (SELECT t, COUNT(*) AS m, CAST(SUM(converted) AS BIGINT) AS d FROM lab GROUP BY t), " +
        "nr AS (SELECT t, d, CAST(SUM(m) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk FROM bt), " +
        "f AS (SELECT t, d, n_risk, CASE WHEN d < n_risk THEN CAST(ROUND(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(18,9)) ELSE NULL END AS term FROM nr WHERE d > 0) " +
        "SELECT t AS t_hours, n_risk, d AS d_converted, " +
        "CASE WHEN d < n_risk THEN ROUND(exp(CAST(SUM(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6) ELSE 0.0 END AS survival " +
        "FROM f ORDER BY t_hours"
    },
    // ACF: zero-filled hourly spine; integer residuals n·x − S so
    // every product is exact; per-lag shift via an index equi-join
    "q_acf" -> {
      val maxLag = rel.TimeSeries.acfMaxLagHours
      s"WITH hc AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS x FROM events GROUP BY h), " +
        "bd AS (SELECT MIN(h) AS hmin, MAX(h) AS hmax FROM hc), " +
        "sp AS (SELECT UNNEST(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS h FROM bd), " +
        "f AS (SELECT sp.h, COALESCE(hc.x, 0) AS x, CAST(date_diff('hour', bd.hmin, sp.h) AS BIGINT) AS t FROM sp LEFT JOIN hc ON hc.h = sp.h CROSS JOIN bd), " +
        "tot AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s FROM f), " +
        "g AS (SELECT t, CAST(n * x - s AS HUGEINT) AS r, n FROM f CROSS JOIN tot), " +
        s"ks AS (SELECT CAST(UNNEST(range(1, ${maxLag + 1})) AS INTEGER) AS lag_h), " +
        "p AS (SELECT ks.lag_h, a.r AS r, g2.r AS rlag, a.n FROM ks CROSS JOIN g a LEFT JOIN g g2 ON g2.t = a.t - ks.lag_h) " +
        "SELECT lag_h, CAST(MAX(n) AS BIGINT) AS n_hours, " +
        "ROUND(CAST(SUM(r * rlag) AS DOUBLE) / CAST(SUM(r * r) AS DOUBLE), 9) AS r_k " +
        "FROM p GROUP BY lag_h ORDER BY lag_h"
    },
    // SRM: distinct-USER arm counts vs the declared 50/50, chi2 on the
    // 1-row pivot
    "q_srm_check" -> {
      val c50 = text.Sampling.cutHex(0.5)
      val crit = rel.TimeSeries.srmChi2Crit
      val e = "(CAST(n_a + n_b AS DOUBLE) / 2.0)"
      val chi2 = s"((CAST(n_a AS DOUBLE) - $e) * (CAST(n_a AS DOUBLE) - $e) / $e + (CAST(n_b AS DOUBLE) - $e) * (CAST(n_b AS DOUBLE) - $e) / $e)"
      s"WITH u AS (SELECT DISTINCT user_id FROM events), " +
        s"a AS (SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$c50' THEN 'A' ELSE 'B' END AS arm FROM u), " +
        "c AS (SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a, CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b FROM a) " +
        s"SELECT n_a, n_b, ROUND($chi2, 6) AS chi2, ROUND($chi2, 6) > $crit AS srm_detected FROM c"
    },
    // DID: one conditional pass to the 4 (arm x period) cells, all
    // arithmetic on the 1-row pivot, DECIMAL sums
    "q_did" -> {
      val c50 = text.Sampling.cutHex(0.5)
      val cut = rel.TimeSeries.cupedCutDate
      def m(sx: String, n: String) = s"(CAST($sx AS DOUBLE) / CAST($n AS DOUBLE))"
      s"WITH e AS (SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$c50' THEN 'A' ELSE 'B' END AS arm, (CAST(ts AS TIMESTAMP) >= TIMESTAMP '$cut 00:00:00') AS post, CAST(value AS DECIMAL(18,2)) AS x FROM events), " +
        "c AS (SELECT arm, post, COUNT(*) AS n, SUM(x) AS sx FROM e GROUP BY arm, post), " +
        "w AS (SELECT MAX(CASE WHEN arm = 'A' AND NOT post THEN n END) AS n_a_pre, MAX(CASE WHEN arm = 'A' AND NOT post THEN sx END) AS sx_a_pre, " +
        "MAX(CASE WHEN arm = 'A' AND post THEN n END) AS n_a_post, MAX(CASE WHEN arm = 'A' AND post THEN sx END) AS sx_a_post, " +
        "MAX(CASE WHEN arm = 'B' AND NOT post THEN n END) AS n_b_pre, MAX(CASE WHEN arm = 'B' AND NOT post THEN sx END) AS sx_b_pre, " +
        "MAX(CASE WHEN arm = 'B' AND post THEN n END) AS n_b_post, MAX(CASE WHEN arm = 'B' AND post THEN sx END) AS sx_b_post FROM c) " +
        "SELECT n_a_pre, n_a_post, n_b_pre, n_b_post, " +
        s"ROUND(${m("sx_a_pre", "n_a_pre")}, 6) AS mean_a_pre, ROUND(${m("sx_a_post", "n_a_post")}, 6) AS mean_a_post, " +
        s"ROUND(${m("sx_b_pre", "n_b_pre")}, 6) AS mean_b_pre, ROUND(${m("sx_b_post", "n_b_post")}, 6) AS mean_b_post, " +
        s"ROUND((${m("sx_b_post", "n_b_post")} - ${m("sx_b_pre", "n_b_pre")}) - (${m("sx_a_post", "n_a_post")} - ${m("sx_a_pre", "n_a_pre")}), 6) AS did FROM w"
    },
    // Theil: per-customer income-share ln terms vs the OWN group mean
    // (ROUND(,9)->DECIMAL), decomposition identity crossed in
    "q_theil_index" -> {
      val mg = "(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))"
      val mAll = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
      val share = "(CAST(s_g AS DOUBLE) / CAST(s AS DOUBLE))"
      "WITH sp AS (SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents FROM orders GROUP BY o_custkey), " +
        "br AS (SELECT r_name AS region, cents FROM sp JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey), " +
        "g AS (SELECT region, COUNT(*) AS n_g, CAST(SUM(cents) AS BIGINT) AS s_g FROM br GROUP BY region), " +
        "t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s FROM g), " +
        s"tm AS (SELECT br.region, CAST(ROUND((CAST(cents AS DOUBLE) / $mg) * ln(CAST(cents AS DOUBLE) / $mg), 9) AS DECIMAL(18,9)) AS term FROM br JOIN g ON g.region = br.region), " +
        "ts2 AS (SELECT region, SUM(term) AS t_sum FROM tm GROUP BY region), " +
        s"o AS (SELECT g.region, n_g AS n_customers, ROUND($share, 6) AS spend_share, ROUND(CAST(t_sum AS DOUBLE) / CAST(n_g AS DOUBLE), 6) AS t_within, " +
        s"CAST(ROUND($share * ln($mg / $mAll), 9) AS DECIMAL(18,9)) AS t_between_term, " +
        s"CAST(ROUND($share * (CAST(t_sum AS DOUBLE) / CAST(n_g AS DOUBLE)), 9) AS DECIMAL(18,9)) AS t_within_weighted " +
        "FROM g JOIN ts2 ON ts2.region = g.region CROSS JOIN t), " +
        "tt AS (SELECT ROUND(CAST(SUM(t_between_term + t_within_weighted) AS DOUBLE), 6) AS theil_total FROM o) " +
        "SELECT region, n_customers, spend_share, t_within, CAST(t_between_term AS DOUBLE) AS t_between_term, theil_total " +
        "FROM o CROSS JOIN tt ORDER BY region"
    },
    // k-core: three unrolled synchronous peels, counts only
    "q_kcore" -> {
      import graft.graph.KCore.{kcPartMod, kcK}
      s"WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem WHERE l_partkey % $kcPartMod = 0), " +
        "e0 AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p), " +
        s"d1 AS (SELECT n, COUNT(*) AS d FROM (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY n), " +
        s"k1 AS (SELECT n FROM d1 WHERE d >= $kcK), " +
        "e1 AS (SELECT u, v FROM e0 WHERE u IN (SELECT n FROM k1) AND v IN (SELECT n FROM k1)), " +
        s"d2 AS (SELECT n, COUNT(*) AS d FROM (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1) GROUP BY n), " +
        s"k2 AS (SELECT n FROM d2 WHERE d >= $kcK), " +
        "e2 AS (SELECT u, v FROM e1 WHERE u IN (SELECT n FROM k2) AND v IN (SELECT n FROM k2)), " +
        s"d3 AS (SELECT n, COUNT(*) AS d FROM (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2) GROUP BY n), " +
        s"k3 AS (SELECT n FROM d3 WHERE d >= $kcK), " +
        "e3 AS (SELECT u, v FROM e2 WHERE u IN (SELECT n FROM k3) AND v IN (SELECT n FROM k3)) " +
        "SELECT 1 AS round, (SELECT COUNT(*) FROM k1) AS n_nodes, (SELECT COUNT(*) FROM e1) AS n_edges " +
        "UNION ALL SELECT 2, (SELECT COUNT(*) FROM k2), (SELECT COUNT(*) FROM e2) " +
        "UNION ALL SELECT 3, (SELECT COUNT(*) FROM k3), (SELECT COUNT(*) FROM e3) ORDER BY round"
    },
    // 2-hop recs: same sample as triangles, FULL bidirectional wedge
    // enumeration under the stop-hub cap (orientation would undercount
    // common neighbors), wedge pairs minus the adjacency,
    // row_number-capped per node
    "q_2hop_recs" -> {
      import graft.graph.KCore.kcPartMod
      import graft.graph.LinkPred.{lpTopK, lpMinCommon, lpHubCap}
      s"WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem WHERE l_partkey % $kcPartMod = 0), " +
        "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p), " +
        "bi AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e), " +
        "deg AS (SELECT src AS n, COUNT(*) AS d FROM bi GROUP BY src), " +
        s"ctr AS (SELECT src, dst FROM bi WHERE src IN (SELECT n FROM deg WHERE d <= $lpHubCap)), " +
        "w AS (SELECT x.dst AS a, y.dst AS b FROM ctr x JOIN ctr y ON x.src = y.src AND x.dst < y.dst), " +
        s"cn AS (SELECT a, b, COUNT(*) AS common FROM w GROUP BY a, b HAVING COUNT(*) >= $lpMinCommon), " +
        "na AS (SELECT a, b, common FROM cn WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = cn.a AND e.v = cn.b)), " +
        "x AS (SELECT a AS part_id, b AS rec, common FROM na UNION ALL SELECT b, a, common FROM na), " +
        "r AS (SELECT part_id, rec, common, ROW_NUMBER() OVER (PARTITION BY part_id ORDER BY common DESC, rec) AS rn FROM x) " +
        s"SELECT part_id, rec, common, CAST(rn AS INTEGER) AS rn FROM r WHERE rn <= $lpTopK ORDER BY part_id, rn"
    },
    // degree power law: histogram + per-node ROUND(,9) ln terms, the
    // CSN continuous-MLE alpha crossed into the tiny frame
    "q_degree_powerlaw" -> {
      import graft.graph.KCore.kcPartMod
      s"WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem WHERE l_partkey % $kcPartMod = 0), " +
        "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p), " +
        "deg AS (SELECT n, COUNT(*) AS d FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n), " +
        "dm AS (SELECT MIN(d) AS d_min FROM deg), " +
        "t AS (SELECT d_min, COUNT(*) AS n_nodes_total, SUM(CAST(ROUND(ln(CAST(d AS DOUBLE) / (CAST(d_min AS DOUBLE) - 0.5)), 9) AS DECIMAL(18,9))) AS t_sum FROM deg CROSS JOIN dm GROUP BY d_min), " +
        "al AS (SELECT d_min, n_nodes_total, ROUND(1.0 + CAST(n_nodes_total AS DOUBLE) / CAST(t_sum AS DOUBLE), 6) AS alpha FROM t), " +
        "h AS (SELECT d AS degree, COUNT(*) AS n_nodes FROM deg GROUP BY d) " +
        "SELECT degree, n_nodes, n_nodes_total, d_min, alpha FROM h CROSS JOIN al ORDER BY degree"
    },
    // Fano: the gap_fill spine per user, integer power sums
    "q_fano_dispersion" ->
      ("WITH e AS (SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events), " +
        "daily AS (SELECT user_id, day, COUNT(*) AS x FROM e GROUP BY user_id, day), " +
        "b AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM e), " +
        "sp AS (SELECT u.user_id, UNNEST(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS day FROM (SELECT DISTINCT user_id FROM e) u CROSS JOIN b), " +
        "f AS (SELECT sp.user_id, COALESCE(daily.x, 0) AS x FROM sp LEFT JOIN daily ON daily.user_id = sp.user_id AND daily.day = sp.day), " +
        "a AS (SELECT user_id, COUNT(*) AS n_days, CAST(SUM(x) AS BIGINT) AS n_events, CAST(SUM(x * x) AS BIGINT) AS sxx FROM f GROUP BY user_id) " +
        "SELECT user_id, n_days, n_events, ROUND(CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean_daily, " +
        "ROUND(CAST(n_days * sxx - n_events * n_events AS DOUBLE) / CAST(n_days * n_events AS DOUBLE), 6) AS fano " +
        "FROM a ORDER BY user_id"),
    // weighted median: (flag, value) agg bounded by the value domain;
    // 2*cumw >= W threshold is pure BIGINT
    "q_weighted_median" ->
      ("WITH li AS (SELECT l_returnflag AS flag, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents, CAST(l_quantity AS BIGINT) AS wt FROM lineitem), " +
        "g AS (SELECT flag, cents, CAST(SUM(wt) AS BIGINT) AS w FROM li GROUP BY flag, cents), " +
        "c AS (SELECT flag, cents, SUM(w) OVER (PARTITION BY flag ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM g), " +
        "t AS (SELECT flag, CAST(SUM(w) AS BIGINT) AS w_total FROM g GROUP BY flag), " +
        "m AS (SELECT c.flag, w_total, MIN(cents) AS med_cents FROM c JOIN t ON t.flag = c.flag WHERE 2 * cw >= w_total GROUP BY c.flag, w_total) " +
        "SELECT flag, w_total, ROUND(CAST(med_cents AS DOUBLE) / 100.0, 2) AS weighted_median FROM m ORDER BY flag"),
    // Welch t: per-user DECIMAL totals -> per-arm exact power sums
    // (x^2 via DECIMAL(30,8), the q_cuped device) -> one-shot doubles
    "q_welch_ttest" -> {
      val c50 = text.Sampling.cutHex(0.5)
      val crit = rel.TimeSeries.welchCrit
      def nd(c: String) = s"CAST($c AS DOUBLE)"
      def mean(s: String, n: String) = s"(${nd(s)} / ${nd(n)})"
      def variance(sxx: String, sx: String, n: String) =
        s"((${nd(sxx)} - ${nd(sx)} * ${nd(sx)} / ${nd(n)}) / (${nd(n)} - 1.0))"
      val vna = s"(${variance("sxx_a", "sx_a", "n_a")} / ${nd("n_a")})"
      val vnb = s"(${variance("sxx_b", "sx_b", "n_b")} / ${nd("n_b")})"
      val se2 = s"($vna + $vnb)"
      val t = s"((${mean("sx_a", "n_a")} - ${mean("sx_b", "n_b")}) / sqrt($se2))"
      val df = s"(($se2 * $se2) / ($vna * $vna / (${nd("n_a")} - 1.0) + $vnb * $vnb / (${nd("n_b")} - 1.0)))"
      "WITH u AS (SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS x FROM events GROUP BY user_id), " +
        s"a AS (SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$c50' THEN 'A' ELSE 'B' END AS arm, x FROM u), " +
        "g AS (SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(CAST(x * x AS DECIMAL(30,8))) AS sxx FROM a GROUP BY arm), " +
        "w AS (SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS n_a, MAX(CASE WHEN arm = 'A' THEN sx END) AS sx_a, MAX(CASE WHEN arm = 'A' THEN sxx END) AS sxx_a, " +
        "MAX(CASE WHEN arm = 'B' THEN n END) AS n_b, MAX(CASE WHEN arm = 'B' THEN sx END) AS sx_b, MAX(CASE WHEN arm = 'B' THEN sxx END) AS sxx_b FROM g) " +
        s"SELECT n_a, n_b, ROUND(${mean("sx_a", "n_a")}, 6) AS mean_a, ROUND(${mean("sx_b", "n_b")}, 6) AS mean_b, " +
        s"ROUND($t, 6) AS t_stat, ROUND($df, 4) AS df_welch, ABS(ROUND($t, 6)) > $crit AS significant FROM w"
    },
    // chi2 independence: domain-bounded cell agg, per-cell
    // ROUND(,9)->DECIMAL terms, observed r/c for dof and Cramer's V
    "q_chi2_independence" ->
      ("WITH c AS (SELECT event_type, CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS INTEGER) AS dow, COUNT(*) AS o FROM events GROUP BY event_type, dow), " +
        "r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS nr FROM c GROUP BY event_type), " +
        "k AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS nc FROM c GROUP BY dow), " +
        "t AS (SELECT CAST(SUM(o) AS BIGINT) AS n, CAST(COUNT(DISTINCT event_type) AS INTEGER) AS rc, CAST(COUNT(DISTINCT dow) AS INTEGER) AS cc FROM c), " +
        "m AS (SELECT CAST(ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 9) AS DECIMAL(18,9)) AS term FROM (SELECT o, CAST(nr * nc AS DOUBLE) / CAST(n AS DOUBLE) AS e FROM c JOIN r USING (event_type) JOIN k USING (dow) CROSS JOIN t)), " +
        "s AS (SELECT SUM(term) AS chi2d FROM m) " +
        "SELECT n, rc AS n_rows, cc AS n_cols, (rc - 1) * (cc - 1) AS dof, ROUND(CAST(chi2d AS DOUBLE), 6) AS chi2, " +
        "ROUND(sqrt(CAST(chi2d AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(LEAST(rc - 1, cc - 1) AS DOUBLE))), 6) AS cramers_v FROM s CROSS JOIN t"),
    // OLS: exact integer/DECIMAL power sums per flag, one-shot
    // normal-equation chains on the <=3-row pivot
    "q_ols_regression" -> {
      def nd(c: String) = s"CAST($c AS DOUBLE)"
      val covN = s"(${nd("n")} * ${nd("sxy")} - ${nd("sx")} * ${nd("sy")})"
      val varXn = s"(${nd("n")} * ${nd("sxx")} - ${nd("sx")} * ${nd("sx")})"
      val varYn = s"(${nd("n")} * ${nd("syy")} - ${nd("sy")} * ${nd("sy")})"
      "WITH li AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents FROM lineitem), " +
        "g AS (SELECT flag, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sx, CAST(SUM(cents) AS BIGINT) AS sy, CAST(SUM(q * q) AS BIGINT) AS sxx, CAST(SUM(q * cents) AS BIGINT) AS sxy, SUM(CAST(cents * cents AS DECIMAL(28,0))) AS syy FROM li GROUP BY flag) " +
        s"SELECT flag, n, ROUND($covN / $varXn / 100.0, 6) AS slope, " +
        s"ROUND((${nd("sy")} - $covN / $varXn * ${nd("sx")}) / ${nd("n")} / 100.0, 6) AS intercept, " +
        s"ROUND($covN * $covN / ($varXn * $varYn), 6) AS r2 FROM g ORDER BY flag"
    },
    // stump: feature-domain histogram + cumulative window; counts pure
    // BIGINT, impurity a one-shot ROUND(,9) chain, argmin total order
    "q_decision_stump" -> {
      def nd(c: String) = s"CAST($c AS DOUBLE)"
      def gini(pos: String, tot: String) =
        s"(1.0 - (${nd(pos)} * ${nd(pos)} + ${nd(s"$tot - ($pos)")} * ${nd(s"$tot - ($pos)")}) / (${nd(tot)} * ${nd(tot)}))"
      val giniL = gini("pl", "nl")
      val giniR = gini("p - pl", "n - nl")
      val imp = s"ROUND((${nd("nl")} * $giniL + ${nd("n - nl")} * $giniR) / ${nd("n")}, 9)"
      val parent = s"ROUND(${gini("p", "n")}, 9)"
      "WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS q, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem), " +
        "h AS (SELECT q, COUNT(*) AS cnt, CAST(SUM(y) AS BIGINT) AS pos FROM li GROUP BY q), " +
        "c AS (SELECT q, CAST(SUM(cnt) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nl, CAST(SUM(pos) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pl, CAST(SUM(cnt) OVER () AS BIGINT) AS n, CAST(SUM(pos) OVER () AS BIGINT) AS p FROM h), " +
        "f AS (SELECT * FROM c WHERE nl < n), " +
        s"s AS (SELECT q AS threshold, nl AS n_left, n - nl AS n_right, pl AS pos_left, p - pl AS pos_right, $imp AS impurity, ROUND($parent - $imp, 9) AS gain FROM f), " +
        "z AS (SELECT s.*, ROW_NUMBER() OVER (ORDER BY impurity, threshold) AS rn FROM s) " +
        "SELECT threshold, n_left, n_right, pos_left, pos_right, impurity, gain FROM z WHERE rn = 1"
    },
    // naive Bayes: add-1 likelihoods over the vocab x class grid, each
    // ln term ROUND(,9)->DECIMAL so per-doc class scores sum exactly;
    // argmax total order (score DESC, class) identical on both engines
    "q_naive_bayes" -> {
      val cut = text.Sampling.cutHex(text.Relevance.nbTrainFraction)
      "WITH d AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h FROM documents), " +
        s"trt AS (SELECT doc_id, lang, unnest(toks) AS tok FROM d WHERE h < '$cut'), " +
        s"tet AS (SELECT doc_id, lang, unnest(toks) AS tok FROM d WHERE h >= '$cut'), " +
        "ct AS (SELECT lang AS cl, tok, COUNT(*) AS c FROM trt GROUP BY lang, tok), " +
        "cls AS (SELECT lang AS cl, COUNT(*) AS ntok, COUNT(DISTINCT doc_id) AS ndocs FROM trt GROUP BY lang), " +
        "nt AS (SELECT CAST(SUM(ndocs) AS BIGINT) AS n_train FROM cls), " +
        "v AS (SELECT DISTINCT tok FROM ct), " +
        "vs AS (SELECT COUNT(*) AS vsize FROM v), " +
        "g AS (SELECT v.tok, cls.cl, CAST(ROUND(ln((CAST(COALESCE(ct.c, 0) AS DOUBLE) + 1.0) / CAST(cls.ntok + vs.vsize AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ll FROM v CROSS JOIN cls CROSS JOIN vs LEFT JOIN ct ON ct.tok = v.tok AND ct.cl = cls.cl), " +
        "pri AS (SELECT cl, CAST(ROUND(ln(CAST(ndocs AS DOUBLE) / CAST(n_train AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lp FROM cls CROSS JOIN nt), " +
        "sc AS (SELECT t.doc_id, t.lang, g.cl, SUM(g.ll) AS sll FROM tet t JOIN g ON g.tok = t.tok GROUP BY t.doc_id, t.lang, g.cl), " +
        "fin AS (SELECT doc_id, lang, sc.cl, sll + lp AS score FROM sc JOIN pri ON pri.cl = sc.cl), " +
        "r AS (SELECT fin.*, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cl) AS rn FROM fin) " +
        "SELECT doc_id, lang AS lang_true, cl AS lang_pred, ROUND(CAST(score AS DOUBLE), 6) AS logprob, CAST(lang = cl AS INTEGER) AS correct FROM r WHERE rn = 1 ORDER BY doc_id"
    },
    // WOE/IV: feature-domain histogram + window totals; WOE is the
    // ROUNDED ln (iv_term multiplies the rounded value on both
    // engines); IV's cross-bin sum runs in DECIMAL(18,9)
    "q_woe_iv" -> {
      val bw = RelQueries.woeBinWidth
      val posShare = "((CAST(pos AS DOUBLE) + 0.5) / CAST(p AS DOUBLE))"
      val negShare = "((CAST(neg AS DOUBLE) + 0.5) / CAST(q AS DOUBLE))"
      s"WITH li AS (SELECT CAST(floor((l_quantity - 1) / $bw) AS INTEGER) AS bin, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem), " +
        "h AS (SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos FROM li GROUP BY bin), " +
        "m AS (SELECT bin, n, pos, n - pos AS neg, CAST(SUM(pos) OVER () AS BIGINT) AS p, CAST(SUM(n - pos) OVER () AS BIGINT) AS q FROM h), " +
        s"s AS (SELECT bin, n, pos, neg, ROUND(ln($posShare / $negShare), 9) AS woe, $posShare AS ps, $negShare AS ns FROM m), " +
        "t AS (SELECT bin, n, pos, neg, woe, CAST(ROUND((ps - ns) * woe, 9) AS DECIMAL(18,9)) AS iv_term FROM s) " +
        "SELECT bin, n, pos, neg, woe, ROUND(CAST(iv_term AS DOUBLE), 9) AS iv_term, ROUND(CAST(SUM(iv_term) OVER () AS DOUBLE), 9) AS iv FROM t ORDER BY bin"
    },
    // HITS: integer-exact power method — no rounding device at all
    "q_hits" -> graft.graph.Hits.oracleSql,
    // multiple OLS: exact power sums; the Cramer solve + R² chains are
    // ONE shared SQL text (olsMultiChains) parsed by both engines
    "q_ols_multi" -> {
      val chains = rel.TimeSeries.olsMultiChains
        .map { case (name, chain) => s"$chain AS $name" }.mkString(", ")
      "WITH li AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q, CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents FROM lineitem), " +
        "g AS (SELECT flag, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s1, CAST(SUM(d) AS BIGINT) AS s2, CAST(SUM(cents) AS BIGINT) AS sy, " +
        "CAST(SUM(q * q) AS BIGINT) AS s11, CAST(SUM(d * d) AS BIGINT) AS s22, CAST(SUM(q * d) AS BIGINT) AS s12, " +
        "CAST(SUM(q * cents) AS BIGINT) AS s1y, CAST(SUM(d * cents) AS BIGINT) AS s2y, SUM(CAST(cents * cents AS DECIMAL(28,0))) AS syy FROM li GROUP BY flag) " +
        s"SELECT flag, n, $chains FROM g ORDER BY flag"
    },
    // NN matching: per-user DECIMAL sums, one ordered window with
    // IGNORE NULLS running controls — exact end to end, no float device
    "q_nn_match" -> {
      val cT = text.Sampling.cutHex(0.5)
      val cut = rel.TimeSeries.cupedCutDate
      "WITH u AS (SELECT user_id, " +
        s"CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '$cut 00:00:00' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(28,2)) AS pre, " +
        s"CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '$cut 00:00:00' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(28,2)) AS post " +
        "FROM events GROUP BY user_id), " +
        s"a AS (SELECT user_id, CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$cT' THEN 'T' ELSE 'C' END AS arm, pre, post FROM u), " +
        "m AS (SELECT a.*, " +
        "last_value(CASE WHEN arm = 'C' THEN user_id END IGNORE NULLS) OVER w1 AS b_id, " +
        "last_value(CASE WHEN arm = 'C' THEN pre END IGNORE NULLS) OVER w1 AS b_pre, " +
        "last_value(CASE WHEN arm = 'C' THEN post END IGNORE NULLS) OVER w1 AS b_post, " +
        "first_value(CASE WHEN arm = 'C' THEN user_id END IGNORE NULLS) OVER w2 AS a_id, " +
        "first_value(CASE WHEN arm = 'C' THEN pre END IGNORE NULLS) OVER w2 AS a_pre, " +
        "first_value(CASE WHEN arm = 'C' THEN post END IGNORE NULLS) OVER w2 AS a_post " +
        "FROM a WINDOW w1 AS (ORDER BY pre, user_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "w2 AS (ORDER BY pre, user_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), " +
        "t AS (SELECT *, (a_id IS NULL OR (b_id IS NOT NULL AND (pre - b_pre) <= (a_pre - pre))) AS ub FROM m WHERE arm = 'T') " +
        "SELECT user_id, CAST(pre AS DOUBLE) AS pre, CAST(post AS DOUBLE) AS post, " +
        "CASE WHEN ub THEN b_id ELSE a_id END AS ctrl_id, " +
        "CAST(ABS(pre - CASE WHEN ub THEN b_pre ELSE a_pre END) AS DOUBLE) AS delta_pre, " +
        "CAST(post - CASE WHEN ub THEN b_post ELSE a_post END AS DOUBLE) AS effect " +
        "FROM t ORDER BY user_id"
    },
    // BFS layers: the identical unrolled frontier expansion, set-exact
    "q_bfs_layers" -> graft.graph.Bfs.oracleSql,
    // conformal: shared (a, b) text, per-row residual chain,
    // percentile = quantile_cont on identical doubles
    "q_conformal_interval" -> {
      val cut = text.Sampling.cutHex(0.8)
      val (a, b) = rel.TimeSeries.conformalAB
      "WITH li AS (SELECT substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_quantity AS VARCHAR)), 1, 2) < " +
        s"'$cut' AS tr, CAST(l_quantity AS BIGINT) AS x, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y FROM lineitem), " +
        "g AS (SELECT CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_tr, CAST(SUM(CASE WHEN tr THEN x ELSE 0 END) AS BIGINT) AS sx_tr, CAST(SUM(CASE WHEN tr THEN y ELSE 0 END) AS BIGINT) AS sy_tr, " +
        "CAST(SUM(CASE WHEN tr THEN x * x ELSE 0 END) AS BIGINT) AS sxx_tr, CAST(SUM(CASE WHEN tr THEN x * y ELSE 0 END) AS BIGINT) AS sxy_tr FROM li), " +
        s"ab AS (SELECT $a AS a, $b AS b FROM g), " +
        "r AS (SELECT ABS(CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)) AS r FROM li CROSS JOIN ab WHERE NOT tr), " +
        "q AS (SELECT quantile_cont(r, 0.9) AS qh, COUNT(*) AS n_val FROM r), " +
        "c AS (SELECT ROUND(AVG(CASE WHEN r <= qh THEN 1.0 ELSE 0.0 END), 6) AS coverage FROM r CROSS JOIN q) " +
        "SELECT n_val, ROUND(b / 100.0, 6) AS slope, ROUND(a / 100.0, 6) AS intercept, ROUND(qh / 100.0, 6) AS q90_resid, coverage FROM q CROSS JOIN ab CROSS JOIN c"
    },
    // dedup eval: truth = the df-capped exact-jaccard equi-join (s1/
    // cnt), candidates = the banded cand CTE — both reused verbatim
    "q_dedup_eval" ->
      (s"$ngramShingleCte, $minhashPairsCte, " +
        "tru AS (SELECT id_a, id_b FROM (SELECT id_a, id_b, ROUND(CAST(ni AS DOUBLE) / (ca.n + cb.n - ni), 6) AS j FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ni FROM s1 a JOIN s1 b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) i JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b) WHERE j > 0.6), " +
        "mtc AS (SELECT t.id_a, t.id_b FROM tru t JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b) " +
        "SELECT (SELECT COUNT(*) FROM tru) AS n_true, (SELECT COUNT(*) FROM cand) AS n_candidates, (SELECT COUNT(*) FROM mtc) AS n_matched, " +
        "ROUND(CAST((SELECT COUNT(*) FROM mtc) AS DOUBLE) / CAST((SELECT COUNT(*) FROM tru) AS DOUBLE), 6) AS recall, " +
        "ROUND(CAST((SELECT COUNT(*) FROM mtc) AS DOUBLE) / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 6) AS band_precision"),
    // ridge grid: one-scan conditional train/val power sums crossed
    // with the lambda axis; per-lambda solve + val SSE are ONE shared
    // SQL text (ridgeChains); best = min rounded SSE, lambda tie-break
    "q_ridge_grid" -> {
      val cut = text.Sampling.cutHex(0.8)
      val lams = rel.TimeSeries.ridgeLambdas.mkString("[", ", ", "]")
      val chains = rel.TimeSeries.ridgeChains
        .map { case (name, chain) => s"$chain AS $name" }.mkString(", ")
      "WITH li AS (SELECT substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_quantity AS VARCHAR)), 1, 2) < " +
        s"'$cut' AS tr, CAST(l_quantity AS BIGINT) AS x, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y FROM lineitem), " +
        "g AS (SELECT CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_tr, CAST(SUM(CASE WHEN tr THEN x ELSE 0 END) AS BIGINT) AS sx_tr, CAST(SUM(CASE WHEN tr THEN y ELSE 0 END) AS BIGINT) AS sy_tr, " +
        "CAST(SUM(CASE WHEN tr THEN x * x ELSE 0 END) AS BIGINT) AS sxx_tr, CAST(SUM(CASE WHEN tr THEN x * y ELSE 0 END) AS BIGINT) AS sxy_tr, " +
        "CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT) AS n_va, CAST(SUM(CASE WHEN NOT tr THEN x ELSE 0 END) AS BIGINT) AS sx_va, CAST(SUM(CASE WHEN NOT tr THEN y ELSE 0 END) AS BIGINT) AS sy_va, " +
        "CAST(SUM(CASE WHEN NOT tr THEN x * x ELSE 0 END) AS BIGINT) AS sxx_va, CAST(SUM(CASE WHEN NOT tr THEN x * y ELSE 0 END) AS BIGINT) AS sxy_va, " +
        "SUM(CASE WHEN NOT tr THEN CAST(y * y AS DECIMAL(28,0)) ELSE CAST(0 AS DECIMAL(28,0)) END) AS syy_va FROM li), " +
        s"grid AS (SELECT g.*, UNNEST($lams) AS lambda FROM g), " +
        s"fit AS (SELECT lambda, $chains FROM grid) " +
        "SELECT lambda, slope, intercept, rmse_val, CAST(ROW_NUMBER() OVER (ORDER BY rmse_val, lambda) = 1 AS INTEGER) AS is_best FROM fit ORDER BY lambda"
    },
    // PCA power step: per-row coordinate-sum fold, ROUND(,9)->DECIMAL
    // per-dim terms (the lloyd device), 64-row norm window
    "q_pca_power" -> {
      val s = "list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')"
      "WITH dm AS (SELECT CAST(UNNEST(range(0, 64)) AS INTEGER) AS dim), " +
        s"terms AS (SELECT dim, CAST(ROUND($s * CAST(embedding[dim + 1] AS DOUBLE), 9) AS DECIMAL(18,9)) AS t FROM embeddings CROSS JOIN dm), " +
        "u AS (SELECT dim, CAST(SUM(t) AS DOUBLE) AS u FROM terms GROUP BY dim), " +
        "w AS (SELECT dim, u, sqrt(CAST(SUM(CAST(ROUND(u * u, 9) AS DECIMAL(38,9))) OVER () AS DOUBLE)) AS nrm FROM u) " +
        "SELECT dim, ROUND(u, 6) AS u, ROUND(u / nrm, 6) AS v1 FROM w ORDER BY dim"
    },
    // quantile normalization: INTEGER-exact target index (no float
    // quantile interpolation), doc_id tie-breaks on both rank windows
    "q_quantile_normalize" ->
      ("WITH d AS (SELECT doc_id, source, n_chars FROM documents), " +
        "g AS (SELECT n_chars AS g_chars, ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gidx FROM d), " +
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d), " +
        "r AS (SELECT doc_id, source, n_chars, ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS ridx, COUNT(*) OVER (PARTITION BY source) AS m FROM d), " +
        "t AS (SELECT doc_id, source, n_chars, CASE WHEN m > 1 THEN ((ridx - 1) * (n_total - 1)) // (m - 1) + 1 ELSE (n_total + 1) // 2 END AS gidx FROM r CROSS JOIN nn) " +
        "SELECT doc_id, source, n_chars, g_chars AS norm_chars FROM t JOIN g USING (gidx) ORDER BY doc_id"),
    // Lloyd round: max-dot assignment (the IVF fixed device), per-dim
    // means from ROUND(,9)->DECIMAL sums, movement vs the old centroid
    // PQ Lloyd round: per-subspace (m,k)-keyed assignment (squared-L2
    // fold mirrored from q_pq_topk's encode) + decimal-device means +
    // per-codeword movement; emptied codewords keep their seed, n=0
    "q_pq_lloyd_round" ->
      ("WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8), " +
        "ms AS (SELECT CAST(UNNEST(range(0, 8)) AS INTEGER) AS m), " +
        "book AS (SELECT m, CAST(vec_id - 8 AS INTEGER) AS k, list_transform(embedding[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS cv FROM embeddings CROSS JOIN ms WHERE vec_id >= 8 AND vec_id < 24), " +
        "csub AS (SELECT cid, m, list_transform(ce[m*8+1 : m*8+8], x -> CAST(x AS DOUBLE)) AS sv FROM c CROSS JOIN ms), " +
        "dists AS (SELECT cid, m, k, list_aggregate(list_transform(range(1, 9), i -> (sv[i] - cv[i]) * (sv[i] - cv[i])), 'sum') AS dist FROM csub JOIN book USING (m)), " +
        "codes AS (SELECT cid, m, k FROM (SELECT cid, m, k, ROW_NUMBER() OVER (PARTITION BY cid, m ORDER BY dist, k) AS rn FROM dists) WHERE rn = 1), " +
        "dm AS (SELECT CAST(UNNEST(range(0, 8)) AS INTEGER) AS dim), " +
        "terms AS (SELECT codes.m, codes.k, dim, CAST(ROUND(sv[dim + 1], 9) AS DECIMAL(18,9)) AS t FROM codes JOIN csub ON codes.cid = csub.cid AND codes.m = csub.m CROSS JOIN dm), " +
        "sums AS (SELECT m, k, dim, SUM(t) AS s, COUNT(*) AS n FROM terms GROUP BY m, k, dim), " +
        "old AS (SELECT m, k, dim, cv[dim + 1] AS o FROM book CROSS JOIN dm), " +
        "nc AS (SELECT old.m, old.k, old.dim, COALESCE(CAST(n AS BIGINT), 0) AS n_points, COALESCE(ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6), ROUND(o, 6)) AS coord, o FROM old LEFT JOIN sums ON old.m = sums.m AND old.k = sums.k AND old.dim = sums.dim), " +
        "mt AS (SELECT m, k, dim, n_points, coord, CAST(ROUND((coord - o) * (coord - o), 9) AS DECIMAL(18,9)) AS mv FROM nc) " +
        "SELECT m, k, dim, n_points, coord, ROUND(CAST(SUM(mv) OVER (PARTITION BY m, k) AS DOUBLE), 6) AS movement FROM mt ORDER BY m, k, dim"),
    "q_lloyd_round" -> {
      import sim.Similarity.silhouetteK
      "WITH p AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings), " +
        s"ctr AS (SELECT cid AS centroid_id, ce AS centroid FROM p WHERE cid IN (SELECT cid FROM p ORDER BY cid LIMIT $silhouetteK)), " +
        s"asg AS (SELECT cid, ce, centroid_id FROM (SELECT p.cid, p.ce, ctr.centroid_id, ROW_NUMBER() OVER (PARTITION BY p.cid ORDER BY ${dotSql("p.ce", "ctr.centroid")} DESC, ctr.centroid_id) AS r FROM p CROSS JOIN ctr) WHERE r = 1), " +
        "dm AS (SELECT CAST(UNNEST(range(0, 64)) AS INTEGER) AS dim), " +
        "terms AS (SELECT centroid_id, dim, CAST(ROUND(CAST(ce[dim + 1] AS DOUBLE), 9) AS DECIMAL(18,9)) AS t FROM asg CROSS JOIN dm), " +
        "sums AS (SELECT centroid_id, dim, SUM(t) AS s, COUNT(*) AS n FROM terms GROUP BY centroid_id, dim), " +
        "nc AS (SELECT centroid_id, dim, CAST(n AS BIGINT) AS n_points, ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS coord FROM sums), " +
        "old AS (SELECT centroid_id, dim, CAST(centroid[dim + 1] AS DOUBLE) AS o FROM ctr CROSS JOIN dm), " +
        "mt AS (SELECT nc.centroid_id, nc.dim, n_points, coord, CAST(ROUND((coord - o) * (coord - o), 9) AS DECIMAL(18,9)) AS m FROM nc JOIN old ON nc.centroid_id = old.centroid_id AND nc.dim = old.dim) " +
        "SELECT centroid_id, dim, n_points, coord, ROUND(CAST(SUM(m) OVER (PARTITION BY centroid_id) AS DOUBLE), 6) AS movement FROM mt ORDER BY centroid_id, dim"
    },
    // stratified ATT: cuped per-user frame + ntile(5), per-stratum
    // fixed-order diff chains, pooled terms ROUND(,9)->DECIMAL
    "q_propensity_strata" -> {
      val cT = text.Sampling.cutHex(0.5)
      val cut = rel.TimeSeries.cupedCutDate
      def nd(c: String) = s"CAST($c AS DOUBLE)"
      val diff = s"CASE WHEN n_t > 0 AND n_c > 0 THEN ROUND(${nd("sp_t")} / ${nd("n_t")} - ${nd("sp_c")} / ${nd("n_c")}, 6) END"
      "WITH u AS (SELECT user_id, " +
        s"CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '$cut 00:00:00' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(28,2)) AS pre, " +
        s"CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '$cut 00:00:00' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(28,2)) AS post " +
        "FROM events GROUP BY user_id), " +
        s"a AS (SELECT user_id, CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$cT' THEN 'T' ELSE 'C' END AS arm, pre, post FROM u), " +
        "st AS (SELECT *, CAST(NTILE(5) OVER (ORDER BY pre, user_id) AS INTEGER) AS stratum FROM a), " +
        "g AS (SELECT stratum, CAST(SUM(CASE WHEN arm = 'T' THEN 1 ELSE 0 END) AS BIGINT) AS n_t, CAST(SUM(CASE WHEN arm = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS n_c, " +
        "SUM(CASE WHEN arm = 'T' THEN post ELSE CAST(0 AS DECIMAL(18,2)) END) AS sp_t, SUM(CASE WHEN arm = 'C' THEN post ELSE CAST(0 AS DECIMAL(18,2)) END) AS sp_c FROM st GROUP BY stratum), " +
        s"sc AS (SELECT stratum, n_t, n_c, $diff AS att_stratum FROM g), " +
        "tm AS (SELECT sc.*, CAST(ROUND(att_stratum * CAST(n_t AS DOUBLE), 9) AS DECIMAL(18,9)) AS term FROM sc) " +
        "SELECT stratum, n_t, n_c, att_stratum, " +
        "ROUND(CAST(SUM(term) OVER () AS DOUBLE) / SUM(CASE WHEN att_stratum IS NOT NULL THEN CAST(n_t AS DOUBLE) ELSE 0.0 END) OVER (), 6) AS att_pooled " +
        "FROM tm ORDER BY stratum"
    },
    // silhouette: the (x−c)² sequential fold (the PQ ADC device), rank
    // ties on centroid_id, per-point s ROUND(,9)->DECIMAL cluster means
    "q_silhouette" -> {
      import sim.Similarity.silhouetteK
      def l2(a: String, b: String) =
        s"list_aggregate(list_transform(range(1, 65), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), 'sum')"
      "WITH p AS (SELECT vec_id, embedding FROM embeddings), " +
        s"ctr AS (SELECT vec_id AS centroid_id, embedding AS centroid FROM p WHERE vec_id IN (SELECT vec_id FROM p ORDER BY vec_id LIMIT $silhouetteK)), " +
        s"dd AS (SELECT p.vec_id, ctr.centroid_id, ${l2("p.embedding", "ctr.centroid")} AS d FROM p CROSS JOIN ctr), " +
        "r AS (SELECT vec_id, centroid_id, d, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, centroid_id) AS rn FROM dd), " +
        "ab AS (SELECT vec_id, MAX(CASE WHEN rn = 1 THEN centroid_id END) AS cluster, MAX(CASE WHEN rn = 1 THEN d END) AS a, MAX(CASE WHEN rn = 2 THEN d END) AS b FROM r WHERE rn <= 2 GROUP BY vec_id), " +
        "s AS (SELECT cluster AS centroid_id, CAST(ROUND(CASE WHEN GREATEST(a, b) = 0.0 THEN 0.0 ELSE (b - a) / GREATEST(a, b) END, 9) AS DECIMAL(18,9)) AS s FROM ab) " +
        "SELECT centroid_id, COUNT(*) AS n_points, ROUND(CAST(SUM(s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_silhouette FROM s GROUP BY centroid_id ORDER BY centroid_id"
    },
    // CUPED: per-user DECIMAL-exact (X, Y) conditional sums, one
    // power-sum pass for theta, arm aggregates crossed with scalars
    "q_cuped" -> {
      val cut = rel.TimeSeries.cupedCutDate
      val arm50 = text.Sampling.cutHex(0.5)
      val nD = "CAST(n AS DOUBLE)"
      def d19(c: String) = s"CAST($c AS DECIMAL(19,2))"
      def p(a: String, b: String) =
        s"CAST(SUM(CAST(${d19(a)} * ${d19(b)} AS DECIMAL(30,8))) AS DOUBLE)"
      s"WITH u AS (SELECT user_id, SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '$cut 00:00:00' THEN CAST(0 AS DECIMAL(18,2)) ELSE CAST(value AS DECIMAL(18,2)) END) AS x, SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '$cut 00:00:00' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS y FROM events GROUP BY user_id), " +
        s"a AS (SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),1,2) < '$arm50' THEN 'A' ELSE 'B' END AS arm, x, y FROM u), " +
        s"g AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy, ${p("x", "x")} AS sxx, ${p("y", "y")} AS syy, ${p("x", "y")} AS sxy FROM a), " +
        s"s AS (SELECT (sxy - sx * sy / $nD) / (sxx - sx * sx / $nD) AS theta, sx / $nD AS gmx, ((sxy - sx * sy / $nD) * (sxy - sx * sy / $nD)) / ((sxx - sx * sx / $nD) * (syy - sy * sy / $nD)) AS var_reduction FROM g), " +
        "r AS (SELECT arm, COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS asx, CAST(SUM(y) AS DOUBLE) AS asy FROM a GROUP BY arm) " +
        s"SELECT arm, n, ROUND(asy / $nD, 6) AS mean_y, " +
        s"ROUND(asy / $nD - theta * (asx / $nD - gmx), 6) AS mean_y_adj, " +
        "ROUND(theta, 6) AS theta, ROUND(var_reduction, 6) AS var_reduction " +
        "FROM r CROSS JOIN s ORDER BY arm"
    },
    // confusion matrix: mod-10 scoring grid + per-true-label shares
    "q_confusion_matrix" ->
      ("WITH g AS (SELECT CAST(label AS BIGINT) AS label, CAST((list_position(embedding, list_max(embedding)) - 1) % 10 AS BIGINT) AS pred, COUNT(*) AS n FROM embeddings GROUP BY label, pred) " +
        "SELECT label, pred, n, ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY label) AS DOUBLE), 6) AS row_share " +
        "FROM g ORDER BY label, pred"),
    // winsorized mean: global clip percentiles, ROUND->DECIMAL folds
    "q_winsorized_mean" ->
      ("WITH c AS (SELECT quantile_cont(o_totalprice, 0.05) AS p05, quantile_cont(o_totalprice, 0.95) AS p95 FROM orders), " +
        "w AS (SELECT o_orderpriority AS category, CAST(o_totalprice AS DECIMAL(18,2)) AS raw, CAST(ROUND(least(greatest(o_totalprice, p05), p95), 6) AS DECIMAL(18,6)) AS w FROM orders CROSS JOIN c) " +
        "SELECT category, COUNT(*) AS n, ROUND(CAST(SUM(raw) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_raw, " +
        "ROUND(CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_winsorized " +
        "FROM w GROUP BY category ORDER BY category"),
    // k-fold audit: md5 folds, per-language shares over the tiny grid
    "q_kfold" -> {
      val k = text.Sampling.kFolds
      s"WITH g AS (SELECT CAST((${hex60Sql("md5('fold:' || CAST(doc_id AS VARCHAR))")}) % $k AS INTEGER) AS fold, lang, COUNT(*) AS n FROM documents GROUP BY fold, lang) " +
        "SELECT fold, lang, n, ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS lang_share " +
        "FROM g ORDER BY fold, lang"
    },
    // TWAP: exact integer cents*µs sums, one final double division
    "q_twap" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events), " +
        "l AS (SELECT user_id, cents, epoch_us(lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id)) - epoch_us(tss) AS dt_us FROM e), " +
        "f AS (SELECT * FROM l WHERE dt_us IS NOT NULL) " +
        "SELECT user_id, COUNT(*) AS n_intervals, CAST(SUM(dt_us) AS BIGINT) AS total_us, " +
        "ROUND(CAST(SUM(cents * dt_us) AS DOUBLE) / (100.0 * CAST(SUM(dt_us) AS DOUBLE)), 6) AS twap " +
        "FROM f GROUP BY user_id ORDER BY user_id"),
    // user entropy: per-user fold of <=|types| ROUND(,9)->DECIMAL terms
    "q_user_entropy" -> {
      val sh = "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
      "WITH c AS (SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY user_id, event_type), " +
        "w AS (SELECT user_id, c, CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM c), " +
        s"t AS (SELECT user_id, n, CAST(ROUND(-$sh * ln($sh), 9) AS DECIMAL(18,9)) AS term FROM w) " +
        "SELECT user_id, MAX(n) AS n_events, COUNT(*) AS n_types, ROUND(CAST(SUM(term) AS DOUBLE), 6) AS entropy " +
        "FROM t GROUP BY user_id ORDER BY user_id"
    },
    // trending: one conditional agg per part, TakeOrdered top-k
    "q_trending" -> {
      import rel.RelQueries.{trendCutDate, trendTopK}
      s"SELECT l_partkey, n_early, n_late, ROUND((CAST(n_late AS DOUBLE) + 1.0) / (CAST(n_early AS DOUBLE) + 1.0), 6) AS rise FROM (" +
        s"SELECT l_partkey, CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '$trendCutDate' THEN 0 ELSE 1 END) AS BIGINT) AS n_early, " +
        s"CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '$trendCutDate' THEN 1 ELSE 0 END) AS BIGINT) AS n_late FROM lineitem GROUP BY l_partkey) " +
        s"ORDER BY rise DESC, l_partkey LIMIT $trendTopK"
    },
    // norm audit: sequential HOF fold on both engines (bit-identical
    // float sums), then the DECIMAL device
    "q_embedding_norm_audit" ->
      ("WITH n AS (SELECT label, CAST(ROUND(sqrt(list_aggregate(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')), 6) AS DECIMAL(18,6)) AS nrm FROM embeddings) " +
        "SELECT label, COUNT(*) AS n, ROUND(CAST(SUM(nrm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_norm, " +
        "CAST(MIN(nrm) AS DOUBLE) AS min_norm, CAST(MAX(nrm) AS DOUBLE) AS max_norm " +
        "FROM n GROUP BY label ORDER BY label"),
    // lateness audit: per-user running high-water mark, one summary row;
    // every 7th event's ts injected 3h earlier (corpus arrives in order)
    "q_lateness_audit" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) - CASE WHEN event_id % 7 = 0 THEN 10800000000 ELSE 0 END AS ts_us FROM events), " +
        "h AS (SELECT greatest(COALESCE(MAX(ts_us) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - ts_us, 0), 0) AS late_us FROM e) " +
        "SELECT COUNT(*) AS n_events, CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late, " +
        "ROUND(AVG(CASE WHEN late_us > 0 THEN 1.0 ELSE 0.0 END), 6) AS frac_late, " +
        "ROUND(quantile_cont(CASE WHEN late_us > 0 THEN late_us END, 0.5), 2) AS p50_late_us, " +
        "ROUND(quantile_cont(CASE WHEN late_us > 0 THEN late_us END, 0.95), 2) AS p95_late_us, " +
        "MAX(late_us) AS max_late_us FROM h"),
    // source concentration: ROUND(,9)->DECIMAL HHI/entropy terms
    "q_source_concentration" -> {
      val sh = "(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE))"
      "WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c), " +
        s"x AS (SELECT source, n, ROUND($sh, 6) AS share, " +
        s"CAST(ROUND($sh * $sh, 9) AS DECIMAL(18,9)) AS hhi_term, " +
        s"CAST(ROUND(-$sh * ln($sh), 9) AS DECIMAL(18,9)) AS ent_term FROM c CROSS JOIN t), " +
        "s AS (SELECT ROUND(CAST(SUM(hhi_term) AS DOUBLE), 6) AS hhi, ROUND(CAST(SUM(ent_term) AS DOUBLE), 6) AS entropy, ROUND(exp(CAST(SUM(ent_term) AS DOUBLE)), 6) AS effective_sources FROM x) " +
        "SELECT source, n, share, hhi, entropy, effective_sources FROM x CROSS JOIN s ORDER BY source"
    },
    // robust scaler: exact interpolated percentiles broadcast back
    "q_robust_scale" ->
      ("WITH c AS (SELECT quantile_cont(o_totalprice, 0.25) AS p25, quantile_cont(o_totalprice, 0.5) AS p50, quantile_cont(o_totalprice, 0.75) AS p75 FROM orders) " +
        "SELECT o_orderkey, o_totalprice, ROUND((o_totalprice - p50) / (p75 - p25), 6) AS scaled " +
        "FROM orders CROSS JOIN c ORDER BY o_orderkey"),
    // leakage screen: embedding floats ROUND(,6)->DECIMAL power sums per
    // dim; width-19 products force the hugeint multiply path
    "q_leakage_corr" ->
      ("WITH d AS (SELECT CAST(label AS DECIMAL(18,0)) AS y, CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim, CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE), 6) AS DECIMAL(18,6)) AS x FROM embeddings), " +
        "s AS (SELECT dim, COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy, " +
        "CAST(SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)) AS DECIMAL(30,12))) AS DOUBLE) AS sxx, " +
        "CAST(SUM(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(30,0))) AS DOUBLE) AS syy, " +
        "CAST(SUM(CAST(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(30,6))) AS DOUBLE) AS sxy FROM d GROUP BY dim) " +
        "SELECT dim, n, ROUND((sxy - sx * sy / CAST(n AS DOUBLE)) / sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) * (syy - sy * sy / CAST(n AS DOUBLE))), 6) AS corr_with_label " +
        "FROM s ORDER BY dim"),
    // graph Jaccard: the cooccur incidence chain with the set-overlap
    // normalization
    "q_graph_jaccard" ->
      (s"WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), " +
        "deg AS (SELECT p, COUNT(*) AS d FROM li GROUP BY p), " +
        s"pr AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS c_ab FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p HAVING COUNT(*) >= ${RelQueries.cooccurMinSupport}) " +
        "SELECT pa, pb, c_ab, da.d AS deg_a, db.d AS deg_b, " +
        "ROUND(CAST(c_ab AS DOUBLE) / CAST(da.d + db.d - c_ab AS DOUBLE), 6) AS jaccard " +
        "FROM pr JOIN deg da ON da.p = pa JOIN deg db ON db.p = pb ORDER BY pa, pb"),
    // stateful-stream keys: oracle = the batch SQL the state machine
    // must reproduce (sessionize verbatim; counters = plain GROUP BY)
    "q_stream_sessionize" -> {
      val g = s"INTERVAL ${rel.TimeSeries.sessionGapHours} HOUR"
      "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, value FROM events), " +
        "l AS (SELECT *, lag(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev_ts FROM e), " +
        s"f AS (SELECT *, CASE WHEN prev_ts IS NULL OR tss > prev_ts + $g THEN 1 ELSE 0 END AS new_sess FROM l), " +
        "s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS BIGINT) AS session_idx FROM f) " +
        "SELECT user_id, session_idx, MIN(tss) AS session_start, MAX(tss) AS session_end, " +
        "epoch_us(MAX(tss)) - epoch_us(MIN(tss)) AS duration_us, COUNT(*) AS n_events, " +
        "CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value " +
        "FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx"
    },
    "q_stream_counters" ->
      ("SELECT user_id, COUNT(*) AS n_events, CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
    // mutual information: the contingency grid rebuilt verbatim, PMI
    // terms ROUND(,9)->DECIMAL so the MI total is order-proof
    "q_mutual_info" -> {
      import rel.RelQueries.{miBinWidth, miBins}
      val pmi = "ln(CAST(n_xy AS DOUBLE) * CAST(n_total AS DOUBLE) / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))"
      s"WITH g AS (SELECT o_orderpriority AS x, CAST(least(floor(o_totalprice / $miBinWidth), ${miBins - 1}) AS INTEGER) AS y, COUNT(*) AS n_xy FROM orders GROUP BY x, y), " +
        "mx AS (SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM g GROUP BY x), " +
        "my AS (SELECT y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM g GROUP BY y), " +
        "t AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_total FROM g), " +
        s"cells AS (SELECT g.x, g.y, n_xy, ROUND($pmi, 6) AS pmi, CAST(ROUND((CAST(n_xy AS DOUBLE) / CAST(n_total AS DOUBLE)) * $pmi, 9) AS DECIMAL(18,9)) AS term FROM g JOIN mx ON mx.x = g.x JOIN my ON my.y = g.y CROSS JOIN t), " +
        "s AS (SELECT ROUND(CAST(SUM(term) AS DOUBLE), 6) AS mi_total FROM cells) " +
        "SELECT x, y, n_xy, pmi, CAST(term AS DOUBLE) AS mi_term, mi_total FROM cells CROSS JOIN s ORDER BY x, y"
    },
    // DP counts: hash-uniform inverse-CDF Laplace noise, ln ROUND-pinned
    "q_dp_counts" -> {
      val b = 1.0 / rel.RelQueries.dpEps
      val noise = s"-$b * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))"
      "WITH c AS (SELECT c_nationkey, COUNT(*) AS n_true FROM customer GROUP BY c_nationkey), " +
        s"n AS (SELECT c_nationkey, n_true, (CAST((${hex60Sql("md5('dp:' || CAST(c_nationkey AS VARCHAR))")}) % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u FROM c) " +
        s"SELECT c_nationkey, n_true, ROUND($noise, 6) AS noise, " +
        s"ROUND(CAST(n_true AS DOUBLE) + $noise, 6) AS n_noisy " +
        "FROM n ORDER BY c_nationkey"
    },
    // gains curve: the calibration scoring + a total decile rank and a
    // 10-row cumulative window
    "q_gains_curve" ->
      (s"WITH s AS (SELECT vec_id, ROUND(1.0/(1.0+exp(-(${dotSql("embedding", wLit)} + ${VectorOps.demoBias}))), 6) AS p, CAST((list_position(embedding, list_max(embedding)) - 1) % 2 AS INTEGER) AS y FROM embeddings), " +
        "d AS (SELECT CAST(NTILE(10) OVER (ORDER BY p DESC, vec_id) AS INTEGER) AS decile, y FROM s), " +
        "a AS (SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos FROM d GROUP BY decile), " +
        "c AS (SELECT decile, n, n_pos, CAST(SUM(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / CAST(SUM(n_pos) OVER () AS DOUBLE) AS capture FROM a) " +
        "SELECT decile, n, n_pos, ROUND(capture, 6) AS cum_capture, " +
        "ROUND(capture / (CAST(decile AS DOUBLE) / 10.0), 6) AS lift FROM c ORDER BY decile"),
    // vocab growth: first-appearance min-agg + 10-row cumulative sums
    "q_vocab_growth" -> {
      val vb = text.TextOps.vocabBuckets
      s"WITH tk AS (SELECT CAST((${hex60Sql("md5('vg:' || CAST(doc_id AS VARCHAR))")}) % $vb AS INTEGER) AS hb, UNNEST(string_split(lower(text), ' ')) AS t FROM documents), " +
        "tk2 AS (SELECT hb, t FROM tk WHERE t <> ''), " +
        "pt AS (SELECT t, MIN(hb) AS first_hb FROM tk2 GROUP BY t), " +
        "tb AS (SELECT hb, COUNT(*) AS n_tokens FROM tk2 GROUP BY hb), " +
        "nb AS (SELECT first_hb AS hb, COUNT(*) AS n_new_vocab FROM pt GROUP BY first_hb), " +
        "f AS (SELECT tb.hb, n_tokens, COALESCE(n_new_vocab, 0) AS n_new_vocab FROM tb LEFT JOIN nb ON nb.hb = tb.hb), " +
        "c AS (SELECT hb, n_tokens, n_new_vocab, CAST(SUM(n_tokens) OVER (ORDER BY hb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens, CAST(SUM(n_new_vocab) OVER (ORDER BY hb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab FROM f) " +
        "SELECT hb AS bucket, n_tokens, n_new_vocab, cum_tokens, cum_vocab, " +
        "ROUND(ln(CAST(cum_vocab AS DOUBLE)) / ln(CAST(cum_tokens AS DOUBLE)), 6) AS heaps_beta FROM c ORDER BY bucket"
    },
    // partition audit: per-candidate keyed count then a one-row summary
    "q_partition_audit" ->
      ("WITH a1 AS (SELECT COUNT(*) AS n_partitions, CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(c) AS BIGINT) AS max_rows FROM (SELECT CAST(o_orderdate AS DATE) AS k, COUNT(*) AS c FROM orders GROUP BY k)), " +
        "a2 AS (SELECT COUNT(*) AS n_partitions, CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(c) AS BIGINT) AS max_rows FROM (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS k, COUNT(*) AS c FROM events GROUP BY k)), " +
        "a3 AS (SELECT COUNT(*) AS n_partitions, CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(c) AS BIGINT) AS max_rows FROM (SELECT event_type AS k, COUNT(*) AS c FROM events GROUP BY k)), " +
        "a4 AS (SELECT COUNT(*) AS n_partitions, CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(c) AS BIGINT) AS max_rows FROM (SELECT CAST(l_shipdate AS DATE) AS k, COUNT(*) AS c FROM lineitem GROUP BY k)), " +
        "u AS (SELECT 'orders' AS table_name, 'o_orderdate_day' AS candidate, * FROM a1 " +
        "UNION ALL SELECT 'events', 'event_day', * FROM a2 " +
        "UNION ALL SELECT 'events', 'event_type', * FROM a3 " +
        "UNION ALL SELECT 'lineitem', 'l_shipdate_day', * FROM a4) " +
        "SELECT table_name, candidate, n_partitions, n_rows, max_rows, " +
        "ROUND(CAST(max_rows AS DOUBLE) / (CAST(n_rows AS DOUBLE) / CAST(n_partitions AS DOUBLE)), 6) AS skew " +
        "FROM u ORDER BY table_name, candidate"),
    // soft dedup: weight = 1/cluster_size, exact BIGINT then ROUND(,6)
    "q_soft_dedup" ->
      ("WITH d AS (SELECT doc_id, md5(text) AS h FROM documents), " +
        "c AS (SELECT h, COUNT(*) AS cluster_size FROM d GROUP BY h) " +
        "SELECT doc_id, cluster_size, ROUND(CAST(1.0 AS DOUBLE) / CAST(cluster_size AS DOUBLE), 6) AS weight " +
        "FROM d JOIN c USING (h) ORDER BY doc_id"),
    // Zipf fit: ln pairs ROUND(,9)->DECIMAL (the domain_shift device),
    // power sums, slope/intercept mirrored term for term
    "q_zipf_fit" ->
      ("WITH c AS (SELECT term, COUNT(*) AS cnt FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS term FROM documents) GROUP BY term), " +
        "r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank FROM c), " +
        "p AS (SELECT CAST(ROUND(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x, CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y FROM r), " +
        "s AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy, CAST(SUM(CAST(x*y AS DECIMAL(30,18))) AS DOUBLE) AS sxy, CAST(SUM(CAST(x*x AS DECIMAL(30,18))) AS DOUBLE) AS sxx FROM p) " +
        "SELECT n AS vocab_size, " +
        "ROUND((sxy - sx * sy / CAST(n AS DOUBLE)) / (sxx - sx * sx / CAST(n AS DOUBLE)), 6) AS zipf_slope, " +
        "ROUND(sy / CAST(n AS DOUBLE) - ((sxy - sx * sy / CAST(n AS DOUBLE)) / (sxx - sx * sx / CAST(n AS DOUBLE))) * (sx / CAST(n AS DOUBLE)), 6) AS intercept FROM s"),
    // NPMI collocations: parallel UNNEST zips the shifted slices;
    // min count interpolated from npmiMinCount
    "q_npmi_collocations" -> {
      val mc = TextOps.npmiMinCount
      "WITH tk AS (SELECT string_split(lower(text), ' ') AS t FROM documents), " +
        s"bg AS (SELECT w1, w2, COUNT(*) AS c_xy FROM (SELECT UNNEST(t[1:len(t)-1]) AS w1, UNNEST(t[2:len(t)]) AS w2 FROM tk) GROUP BY w1, w2 HAVING COUNT(*) >= $mc), " +
        "uni AS (SELECT w, COUNT(*) AS c FROM (SELECT UNNEST(t) AS w FROM tk) GROUP BY w), " +
        "tot AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n_tokens, CAST(SUM(greatest(len(t) - 1, 0)) AS BIGINT) AS n_pairs FROM tk) " +
        "SELECT w1, w2, c_xy, " +
        "ROUND(ln((CAST(c_xy AS DOUBLE) / CAST(n_pairs AS DOUBLE)) / ((CAST(u1.c AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * (CAST(u2.c AS DOUBLE) / CAST(n_tokens AS DOUBLE)))) / -ln(CAST(c_xy AS DOUBLE) / CAST(n_pairs AS DOUBLE)), 6) AS npmi " +
        "FROM bg JOIN uni u1 ON u1.w = bg.w1 JOIN uni u2 ON u2.w = bg.w2 CROSS JOIN tot ORDER BY w1, w2"
    },
    // Flesch-Kincaid: plain-character-class regexes (Java = RE2),
    // vowel-less tokens still cost one syllable
    "q_readability" ->
      ("WITH b AS (SELECT doc_id, " +
        "CAST(greatest(len(string_split(lower(text), ' ')), 1) AS DOUBLE) AS nw, " +
        "CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS ns, " +
        "CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) + len(list_filter(string_split(lower(text), ' '), t -> NOT regexp_matches(t, '[aeiou]'))) AS DOUBLE) AS sy FROM documents) " +
        "SELECT doc_id, CAST(nw AS BIGINT) AS n_words, CAST(ns AS BIGINT) AS n_sentences, CAST(sy AS BIGINT) AS n_syllables, " +
        "ROUND(0.39 * (nw / ns) + 11.8 * (sy / nw) - 15.59, 6) AS fk_grade " +
        "FROM b ORDER BY doc_id"),
    // conversion latency: keyed MINs then floor-of-µs-difference to
    // hours (floor of the DIFFERENCE — engine-safe)
    "q_time_to_convert" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tss FROM events), " +
        "v AS (SELECT user_id, MIN(tss) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id), " +
        "p AS (SELECT e.user_id, t_view, MIN(tss) AS t_buy FROM e JOIN v USING (user_id) WHERE event_type = 'purchase' AND tss > t_view GROUP BY e.user_id, t_view) " +
        "SELECT (epoch_us(t_buy) - epoch_us(t_view)) // 3600000000 AS hours_bucket, COUNT(*) AS n_users " +
        "FROM p GROUP BY hours_bucket ORDER BY hours_bucket"),
    // retention: per-user span histogram -> suffix sum over <= |days| rows
    "q_retention_curve" ->
      ("WITH s AS (SELECT user_id, CAST(date_diff('day', MIN(date_trunc('day', CAST(ts AS TIMESTAMP))), MAX(date_trunc('day', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS span_days FROM events GROUP BY user_id), " +
        "t AS (SELECT COUNT(*) AS n_users FROM s), " +
        "h AS (SELECT span_days, COUNT(*) AS n_at_span FROM s GROUP BY span_days) " +
        "SELECT span_days AS day_offset, CAST(SUM(n_at_span) OVER (ORDER BY span_days DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_surviving, " +
        "ROUND(CAST(SUM(n_at_span) OVER (ORDER BY span_days DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / n_users, 6) AS retention " +
        "FROM h CROSS JOIN t ORDER BY day_offset"),
    // CUSUM control chart: exact scaled deviations (value*n - sum), n
    // divides out only inside ROUND(,6); k interpolated from cusumK
    "q_cusum" -> {
      val k = TimeSeries.cusumK
      "WITH s AS (SELECT user_id, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sx_dec, " +
        "CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,8))) AS DOUBLE) AS sxx FROM events GROUP BY user_id), " +
        "st AS (SELECT user_id, n, sx_dec, sqrt(greatest((sxx - CAST(sx_dec AS DOUBLE) * CAST(sx_dec AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0)) AS sigma FROM s), " +
        "e AS (SELECT ev.user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, CAST(CAST(value AS DECIMAL(18,2)) * n - sx_dec AS DECIMAL(28,2)) AS dev_n, n, sigma FROM events ev JOIN st USING (user_id)), " +
        "c AS (SELECT user_id, event_id, CAST(SUM(dev_n) OVER w AS DECIMAL(38,2)) AS cusum_n, n, sigma, ROW_NUMBER() OVER w AS rn FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)) " +
        "SELECT user_id, event_id, CAST(cusum_n AS DOUBLE) AS cusum_n, n, " +
        s"CAST(CAST(abs(cusum_n) AS DOUBLE) > $k * sigma * sqrt(CAST(rn AS DOUBLE)) * CAST(n AS DOUBLE) AS INTEGER) AS flag " +
        "FROM c ORDER BY user_id, event_id"
    },
    // market-basket lift: exact BIGINT counts divided then ROUND(,6);
    // support floor interpolated from cooccurMinSupport
    "q_cooccur_lift" -> {
      val ms = RelQueries.cooccurMinSupport
      "WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), " +
        "m AS (SELECT p, COUNT(*) AS c FROM li GROUP BY p), " +
        "n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM li), " +
        s"pr AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS c_ab FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY a.p, b.p HAVING COUNT(*) >= $ms) " +
        "SELECT pa, pb, c_ab, ma.c AS c_a, mb.c AS c_b, " +
        "ROUND(CAST(c_ab AS DOUBLE) * CAST(n_orders AS DOUBLE) / (CAST(ma.c AS DOUBLE) * CAST(mb.c AS DOUBLE)), 6) AS lift " +
        "FROM pr JOIN m ma ON ma.p = pr.pa JOIN m mb ON mb.p = pr.pb CROSS JOIN n ORDER BY pa, pb"
    },
    // PIT join: half-open validity intervals partition each key's
    // timeline, so every purchase matches at most one signup version
    "q_scd2_join" ->
      ("WITH d AS (SELECT user_id, event_id AS version_id, value AS version_value, CAST(ts AS TIMESTAMP) AS valid_from, " +
        "lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to " +
        "FROM events WHERE event_type = 'signup'), " +
        "f AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, value FROM events WHERE event_type = 'purchase') " +
        "SELECT f.user_id, f.event_id, f.tss AS ts, CAST(CAST(f.value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_value, " +
        "version_id, CAST(CAST(version_value AS DECIMAL(18,2)) AS DOUBLE) AS version_value " +
        "FROM f JOIN d ON f.user_id = d.user_id AND f.tss >= d.valid_from AND (d.valid_to IS NULL OR f.tss < d.valid_to) " +
        "ORDER BY f.user_id, f.event_id"),
    // MAD: deviations rounded BEFORE the second median; quantile_cont
    // interpolation parity as in q_percentile
    "q_mad" ->
      ("WITH m AS (SELECT user_id, ROUND(quantile_cont(value, 0.5), 6) AS med, COUNT(*) AS n FROM events GROUP BY user_id), " +
        "d AS (SELECT e.user_id, med, n, ROUND(abs(value - med), 6) AS adev FROM events e JOIN m USING (user_id)) " +
        "SELECT user_id, ANY_VALUE(med) AS med, ANY_VALUE(n) AS n, ROUND(quantile_cont(adev, 0.5), 6) AS mad " +
        "FROM d GROUP BY user_id ORDER BY user_id"),
    // gaps-and-islands: run id = rn_overall - rn_within_type
    "q_islands" -> {
      val k = TimeSeries.islandMinRun
      "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, event_type FROM events), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tss, event_id) - " +
        "ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY tss, event_id) AS run FROM e) " +
        "SELECT user_id, event_type, MIN(tss) AS run_start, MAX(tss) AS run_end, COUNT(*) AS run_len " +
        s"FROM r GROUP BY user_id, event_type, run HAVING COUNT(*) >= $k ORDER BY user_id, run_start, event_type"
    },
    // mergeable HLL sketches: exact+bound-flag device (oracle recomputes
    // exact distincts, expects the sketch-union flags to hold = 1)
    "q_hll_merge" ->
      ("WITH d AS (SELECT source, md5(text) AS h FROM documents), " +
        "per AS (SELECT source, COUNT(DISTINCT h) AS exact_distinct, COUNT(*) AS n_docs FROM d GROUP BY source), " +
        "allr AS (SELECT '__all__' AS source, COUNT(DISTINCT h) AS exact_distinct, COUNT(*) AS n_docs FROM d) " +
        "SELECT source, exact_distinct, n_docs, CAST(1 AS INTEGER) AS within_5pct " +
        "FROM (SELECT * FROM per UNION ALL SELECT * FROM allr) ORDER BY source"),
    // rolling median: windowed exact quantile; dev subtracts the ROUNDED
    // median so both engines difference identical values
    "q_rolling_median" -> {
      val k = RelQueries.rollingMedianWindow - 1
      s"WITH m AS (SELECT user_id, event_id, value, ROUND(quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id ROWS BETWEEN $k PRECEDING AND CURRENT ROW), 6) AS med FROM events) " +
        "SELECT user_id, event_id, med, ROUND(value - med, 6) AS dev FROM m ORDER BY user_id, event_id"
    },
    // hashing-trick vectorizer: bucket/sign from the hex60 positional
    // sum (exact BIGINT both engines); integer div ≡ shiftright on the
    // non-negative 60-bit hash
    "q_feature_hashing" -> {
      val b = text.Relevance.featureHashBuckets
      s"WITH tk AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term FROM documents), " +
        s"h AS (SELECT doc_id, (${hex60Sql("md5('fh:' || term)")}) AS hv FROM tk), " +
        s"f AS (SELECT doc_id, CAST(hv % $b AS INTEGER) AS bucket, ((hv // $b) % 2) * 2 - 1 AS sign FROM h) " +
        "SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS feature_val, COUNT(*) AS n_terms " +
        "FROM f GROUP BY doc_id, bucket ORDER BY doc_id, bucket"
    },
    // one LP round: seed cut from Sampling.cutHex, majority vote with
    // (count DESC, label) total-order tiebreak
    "q_label_propagation" -> {
      import graft.graph.LabelProp.{lpPartMod => m, lpSeedFraction => f}
      val cut = text.Sampling.cutHex(f)
      s"WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem WHERE l_partkey % $m = 0), " +
        "e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p), " +
        "bi AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e), " +
        "nodes AS (SELECT DISTINCT src AS id FROM bi), " +
        s"lab AS (SELECT p_partkey AS id, p_brand AS label FROM part WHERE p_partkey % $m = 0), " +
        "ing AS (SELECT lab.id, label FROM lab JOIN nodes USING (id)), " +
        s"seeded AS (SELECT id, label, substring(md5('lp:' || CAST(id AS VARCHAR)),1,2) < '$cut' AS is_seed FROM ing), " +
        "votes AS (SELECT bi.src, s.label AS voted, COUNT(*) AS n_votes FROM bi JOIN (SELECT id, label FROM seeded WHERE is_seed) s ON bi.dst = s.id JOIN (SELECT id FROM seeded WHERE NOT is_seed) u ON bi.src = u.id GROUP BY bi.src, s.label), " +
        "el AS (SELECT src AS part_id, voted AS label, 'prop' AS origin, n_votes AS n_support, ROW_NUMBER() OVER (PARTITION BY src ORDER BY n_votes DESC, voted) AS rn FROM votes) " +
        "SELECT part_id, label, origin, n_support FROM (" +
        "SELECT id AS part_id, label, 'seed' AS origin, CAST(0 AS BIGINT) AS n_support FROM seeded WHERE is_seed " +
        "UNION ALL SELECT part_id, label, origin, n_support FROM el WHERE rn = 1) ORDER BY part_id"
    },
    // Pareto frontier: the oracle states raw NOT EXISTS dominance — an
    // independent O(n²) definition the per-size-sweep plan must equal
    "q_skyline" ->
      ("SELECT p_partkey, p_name, p_size, CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price FROM part p " +
        "WHERE NOT EXISTS (SELECT 1 FROM part q WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice " +
        "AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)) ORDER BY p_partkey"),
  )
}
