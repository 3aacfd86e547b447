package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming.{AttributionStream, BootstrapStream, BoxplotStream, CdcCompact, ChangepointStream, CorpusFilterStream, DailyModeStream, DoclenStream, DriftStream, EngagementStream, EwmaStream, FunnelStream, HhiStream, HllStream, JdbcSink, MomentsStream, PercentileBandsStream, ProfileStreams, RollupStream, SeasonalityStream, Sessionize, StreamDedup, StreamIncrementalDedup, ZipfStream}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Engagement.leaderboardTopN(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Engagement-pipeline core (reference surface)
    "cdc_latest_by_key"  -> Engagement.cdcLatestByKey _,
    "cdc_with_deletes"   -> Engagement.cdcWithDeletes _,
    "enrich_events"      -> Engagement.enrichEvents _,
    "hop_window_agg"     -> Engagement.hopWindowAgg _,
    "tumble_window_agg"  -> Engagement.tumbleWindowAgg _,
    "session_window_agg" -> Engagement.sessionWindowAgg _,
    "leaderboard_topn"   -> ((s: SparkSession, d: String) => Engagement.leaderboardTopN(s, d)),
    "topk_per_group"     -> ((s: SparkSession, d: String) => Engagement.topkPerGroup(s, d)),
    "event_router"       -> Engagement.eventRouter _,
    "json_extract_props" -> Engagement.jsonExtractProps _,
    "asof_join"          -> Engagement.asofJoin _,
    "funnel_conversion"  -> Engagement.funnelConversion _,
    "sequence_count"     -> Sequences.sequenceCount _,
    "funnel_strict_order" -> Sequences.funnelStrictOrder _,
    "funnel_any_order"   -> Sequences.funnelAnyOrder _,
    "interval_coalesce"  -> Intervals.intervalCoalesce _,
    "stream_sequence_count" -> ((s: SparkSession, d: String) => streaming.SequenceCountStream.streamSequenceCount(s, d)),
    "stream_funnel_strict" -> ((s: SparkSession, d: String) => streaming.SequenceCountStream.streamFunnelStrict(s, d)),
    "funnel_conversion_windowed" -> ((s: SparkSession, d: String) => Engagement.funnelConversionWindowed(s, d)),
    "retention_cohorts"  -> ((s: SparkSession, d: String) => Engagement.retentionCohorts(s, d)),
    "asof_join_forward"  -> Engagement.asofJoinForward _,
    "asof_join_nearest"  -> Engagement.asofJoinNearest _,
    "rolling_retention"  -> Retention.rollingRetention _,
    "peak_concurrency"   -> Retention.peakConcurrency _,
    "acf_daily"          -> ((s: SparkSession, d: String) => Timeseries.acfDaily(s, d)),
    "rolling_corr_daily" -> ((s: SparkSession, d: String) => Timeseries.rollingCorrDaily(s, d)),
    "survival_km"        -> ((s: SparkSession, d: String) => Timeseries.survivalKm(s, d)),
    "code_prose_stats"   -> ((s: SparkSession, d: String) => CorpusQa.codeProseStats(s, d)),
    "tokenizer_fertility" -> ((s: SparkSession, d: String) => CorpusQa.tokenizerFertility(s, d)),
    "dedup_cluster_sizes" -> ((s: SparkSession, d: String) => CorpusQa.dedupClusterSizes(s, d)),
    "bfs_distances"      -> ((s: SparkSession, d: String) => Graph.bfsDistances(s, d)),
    "clustering_coefficient" -> ((s: SparkSession, d: String) => Graph.clusteringCoefficient(s, d)),
    "embedding_covariance" -> ((s: SparkSession, d: String) => VectorOps.embeddingCovariance(s, d)),
    "stream_transitions" -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamTransitions(s, d)),
    "stream_scc_items"   -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamSccItems(s, d)),
    "stream_distinct_daily" -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamDistinctDaily(s, d)),
    "scd2_apply_batch"   -> Engagement.scd2ApplyBatch _,
    "winsorized_stats"   -> Behavior.winsorizedStats _,
    "embedding_outliers" -> ((s: SparkSession, d: String) => VectorOps.embeddingOutliers(s, d)),
    "url_canonicalize"   -> ((s: SparkSession, d: String) => CorpusQa.urlCanonicalize(s, d)),
    "stream_acf"         -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamAcf(s, d)),
    "stream_rolling_corr" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamRollingCorr(s, d)),
    "stream_survival"    -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamSurvival(s, d)),
    "stream_scd2"        -> ((s: SparkSession, d: String) => streaming.CdcCompact.streamScd2(s, d)),
    "degree_assortativity" -> ((s: SparkSession, d: String) => Graph.degreeAssortativity(s, d)),
    "graph_components"   -> ((s: SparkSession, d: String) => Graph.graphComponents(s, d)),
    "scc_items"          -> ((s: SparkSession, d: String) => Graph.sccItems(s, d)),
    "time_weighted_value" -> ((s: SparkSession, d: String) => Timeseries.timeWeightedValue(s, d)),
    "user_revenue_percentile" -> Behavior.userRevenuePercentile _,
    "stream_user_lifecycle" -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamUserLifecycle(s, d)),
    "stream_dau_wau_mau" -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamDauWauMau(s, d)),
    "stream_winsorized"  -> ((s: SparkSession, d: String) => streaming.BoxplotStream.streamWinsorized(s, d)),
    "stream_time_weighted" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamTimeWeighted(s, d)),
    "boilerplate_score"  -> ((s: SparkSession, d: String) => CorpusQa.boilerplateScore(s, d)),
    "dataset_card"       -> ((s: SparkSession, d: String) => CorpusQa.datasetCard(s, d)),
    "hard_negatives"     -> ((s: SparkSession, d: String) => VectorOps.hardNegatives(s, d)),
    "ma_crossover"       -> ((s: SparkSession, d: String) => Timeseries.maCrossover(s, d)),
    "asof_join_tolerance" -> ((s: SparkSession, d: String) => Engagement.asofJoinTolerance(s, d)),
    "type_mix_drift"     -> ((s: SparkSession, d: String) => Timeseries.typeMixDrift(s, d)),
    "item_adoption"      -> ((s: SparkSession, d: String) => Behavior.itemAdoption(s, d)),
    "script_detect"      -> ((s: SparkSession, d: String) => CorpusQa.scriptDetect(s, d)),
    "stream_dataset_card" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamDatasetCard(s, d)),
    "stream_ma_crossover" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamMaCrossover(s, d)),
    "stream_type_mix_drift" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamTypeMixDrift(s, d)),
    "stream_item_adoption" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamItemAdoption(s, d)),
    "holt_linear_trend"  -> ((s: SparkSession, d: String) => Timeseries.holtLinearTrend(s, d)),
    "stream_holt"        -> ((s: SparkSession, d: String) => streaming.EwmaStream.streamHolt(s, d)),
    "graph_modularity"   -> ((s: SparkSession, d: String) => Graph.graphModularity(s, d)),
    "neyman_allocation"  -> Stats.neymanAllocation _,
    "fano_factor_daily"  -> Stats.fanoFactorDaily _,
    "type_reach_ci"      -> Stats.typeReachCi _,
    "spearman_daily_pairs" -> Stats.spearmanDailyPairs _,
    "benford_first_digit" -> Stats.benfordFirstDigit _,
    "transition_entropy" -> Stats.transitionEntropy _,
    "stream_spearman"    -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamSpearman(s, d)),
    "runs_test_daily"    -> Stats.runsTestDaily _,
    "kendall_tau_daily"  -> Stats.kendallTauDaily _,
    "markov_stationary"  -> Stats.markovStationary _,
    "mutual_info_type_dow" -> Stats.mutualInfoTypeDow _,
    "absorption_steps"   -> Stats.absorptionSteps _,
    "sessions_per_user"  -> Retention.sessionsPerUser _,
    "stream_mutual_info" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamMutualInfo(s, d)),
    "stream_absorption"  -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamAbsorption(s, d)),
    "dow_residual_outliers" -> Stats.dowResidualOutliers _,
    "funnel_excluding"   -> Engagement.funnelExcluding _,
    "katz_centrality"    -> Graph.katzItems _,
    "flesch_reading_ease" -> TextOps.fleschReadingEase _,
    "bot_burst_screen"   -> Behavior.botBurstScreen _,
    "jarque_bera_daily"  -> Timeseries.jarqueBeraDaily _,
    "theil_sen_trend"    -> Timeseries.theilSenTrend _,
    "anova_f_cents"      -> Stats.anovaFCents _,
    "kruskal_wallis"     -> Stats.kruskalWallis _,
    "levene_brown_forsythe" -> Stats.leveneBrownForsythe _,
    "friedman_daily"     -> Stats.friedmanDaily _,
    "page_hinkley_daily" -> Stats.pageHinkleyDaily _,
    "grubbs_daily"       -> Stats.grubbsDaily _,
    "bootstrap_mean_ci"  -> ((s: SparkSession, d: String) => Sampling.bootstrapMeanCi(s, d)),
    "cms_top_items"      -> Sketches.cmsTopItems _,
    "stream_kruskal"     -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamKruskal(s, d)),
    "stream_levene"      -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamLevene(s, d)),
    "stream_friedman"    -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamFriedman(s, d)),
    "stream_page_hinkley" -> ((s: SparkSession, d: String) => EwmaStream.streamPageHinkley(s, d)),
    "stream_grubbs"      -> ((s: SparkSession, d: String) => EwmaStream.streamGrubbs(s, d)),
    "stream_bootstrap"   -> ((s: SparkSession, d: String) => streaming.BootstrapStream.streamBootstrap(s, d)),
    "stream_cms"         -> ((s: SparkSession, d: String) => streaming.HllStream.streamCms(s, d)),
    "stream_jarque_bera" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamJarqueBera(s, d)),
    "stream_theil_sen"   -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamTheilSen(s, d)),
    "stream_anova"       -> ((s: SparkSession, d: String) => streaming.MomentsStream.streamAnova(s, d)),
    "seasonal_strength"  -> Stats.seasonalStrength _,
    "stream_seasonal_strength" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamSeasonalStrength(s, d)),
    "stream_bot_screen"  -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamBotScreen(s, d)),
    "stream_funnel_excluding" -> ((s: SparkSession, d: String) => streaming.FunnelStream.streamFunnelExcluding(s, d)),
    "stream_pagerank"    -> ((s: SparkSession, d: String) => streaming.GraphStream.streamPagerank(s, d)),
    "stream_katz"        -> ((s: SparkSession, d: String) => streaming.GraphStream.streamKatz(s, d)),
    "stream_flesch"      -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamFlesch(s, d)),
    "wilcoxon_signed_rank" -> Stats.wilcoxonSignedRank _,
    "user_type_entropy"  -> Behavior.userTypeEntropy _,
    "cross_correlation_daily" -> Timeseries.crossCorrelationDaily _,
    "session_type_affinity" -> Behavior.sessionTypeAffinity _,
    "pacf_daily"         -> Timeseries.pacfDaily _,
    "first_passage_matrix" -> Stats.firstPassageMatrix _,
    "burstiness_index"   -> Behavior.burstinessIndex _,
    "stream_first_passage" -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamFirstPassage(s, d)),
    "stream_pacf"        -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamPacf(s, d)),
    "stream_session_affinity" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamSessionAffinity(s, d)),
    "stream_ccf"         -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamCcf(s, d)),
    "stream_user_type_entropy" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamUserTypeEntropy(s, d)),
    "stream_sessions_per_user" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamSessionsPerUser(s, d)),
    "source_jsonl_docs"  -> sources.Formats.jsonlDocsRoundtrip _,
    "source_csv_lineitem" -> sources.Formats.csvLineitemRoundtrip _,
    "source_orc_events"  -> sources.Formats.orcEventsRoundtrip _,
    "capture_recapture"  -> Retention.captureRecapture _,
    "stream_wilcoxon"    -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamWilcoxon(s, d)),
    "stream_capture_recapture" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamCaptureRecapture(s, d)),
    "stream_markov"      -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamMarkov(s, d)),
    "stream_dow_residual" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamDowResidual(s, d)),
    "ljung_box_daily"    -> ((s: SparkSession, d: String) => Timeseries.ljungBoxDaily(s, d)),
    "stream_kendall"     -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamKendall(s, d)),
    "stream_ljung_box"   -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamLjungBox(s, d)),
    "props_key_census"   -> Stats.propsKeyCensus _,
    "stream_runs_test"   -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamRunsTest(s, d)),
    "stream_benford"     -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamBenford(s, d)),
    "degree_powerlaw_fit" -> ((s: SparkSession, d: String) => Graph.degreePowerlawFit(s, d)),
    "stream_neyman"      -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamNeyman(s, d)),
    "stream_fano"        -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamFano(s, d)),
    "stream_cramers_v"   -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamCramersV(s, d)),
    "stream_mann_whitney" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamMannWhitney(s, d)),
    "stream_vocab_coverage" -> ((s: SparkSession, d: String) => streaming.ZipfStream.streamVocabCoverage(s, d)),
    "stream_chi2_type_dow" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamChi2TypeDow(s, d)),
    "stream_ks_doclen"   -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamKsDoclen(s, d)),
    "session_duration"   -> Retention.sessionDuration _,
    "stream_session_duration" -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamSessionDuration(s, d)),
    "vocab_coverage_curve" -> ((s: SparkSession, d: String) => TextOps.vocabCoverageCurve(s, d)),
    "embedding_pca_power" -> VectorOps.embeddingPcaPower _,
    "stream_interevent"  -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamInterevent(s, d)),
    "stream_peak_concurrency" -> ((s: SparkSession, d: String) => streaming.TransitionStream.streamPeakConcurrency(s, d)),
    "chi2_type_dow"      -> Stats.chi2TypeDow _,
    "mann_whitney_u"     -> Stats.mannWhitneyU _,
    "ks_doclen_sources"  -> Stats.ksDoclenSources _,
    "wasserstein_doclen" -> Stats.wassersteinDoclen _,
    "stream_wasserstein_doclen" -> ((s: SparkSession, d: String) =>
      streaming.ProfileStreams.streamWassersteinDoclen(s, d)),
    "psi_value_drift"    -> Stats.psiValueDrift _,
    "stream_psi_drift"   -> ((s: SparkSession, d: String) =>
      streaming.ProfileStreams.streamPsiDrift(s, d)),
    "cramers_v_source_lang" -> Stats.cramersVSourceLang _,
    "heaps_law_fit"      -> ((s: SparkSession, d: String) => CorpusQa.heapsLawFit(s, d)),
    "url_filter"         -> ((s: SparkSession, d: String) => CorpusQa.urlFilter(s, d)),
    "snapshot_diff"      -> Engagement.snapshotDiff _,
    "events_sessionized" -> ((s: SparkSession, d: String) => Engagement.eventsSessionized(s, d)),
    "cohort_ltv"         -> Engagement.cohortLtv _,
    "trending_daily"     -> ((s: SparkSession, d: String) => Engagement.trendingDaily(s, d)),
    // behavioral analytics over the enriched event log
    "attribution_last_touch" -> Behavior.attributionLastTouch _,
    "attribution_first_touch" -> Behavior.attributionFirstTouch _,
    "attribution_linear"     -> MultiTouch.attributionLinear _,
    "attribution_position"   -> MultiTouch.attributionPosition _,
    "attribution_time_decay" -> MultiTouch.attributionTimeDecay _,
    "top_paths"          -> Behavior.topPaths _,
    "key_skew_stats"     -> Behavior.keySkewStats _,
    "event_transitions"  -> Behavior.eventTransitions _,
    "decayed_leaderboard" -> ((s: SparkSession, d: String) => Behavior.decayedLeaderboard(s, d)),
    "lag_features"       -> Behavior.lagFeatures _,
    "anomaly_zscore"     -> ((s: SparkSession, d: String) => Behavior.anomalyZscore(s, d)),
    "co_engagement"      -> Behavior.coEngagement _,
    "association_rules"  -> Behavior.associationRules _,
    "activity_heatmap"   -> Behavior.activityHeatmap _,
    "dau_wau_mau"        -> Behavior.dauWauMau _,
    "session_kpis"       -> ((s: SparkSession, d: String) => Behavior.sessionKpis(s, d)),
    "conversion_lag_stats" -> Behavior.conversionLagStats _,
    "frequent_sequences" -> Behavior.frequentSequences _,
    "topk_diversified"   -> ((s: SparkSession, d: String) => Behavior.topkDiversified(s, d)),
    // graph analytics over the co-engagement item graph
    "pagerank_items"     -> Graph.pagerankItems _,
    "ppr_items"          -> Graph.pprItems _,
    "stream_ppr"         -> ((s: SparkSession, d: String) => streaming.GraphStream.streamPpr(s, d)),
    "random_walks"       -> Graph.randomWalks _,
    "stream_random_walks" -> ((s: SparkSession, d: String) => streaming.GraphStream.streamRandomWalks(s, d)),
    "harmonic_centrality" -> Graph.harmonicCentrality _,
    "stream_harmonic"    -> ((s: SparkSession, d: String) => streaming.GraphStream.streamHarmonic(s, d)),
    "betweenness_centrality" -> Graph.betweennessItems _,
    "stream_betweenness" -> ((s: SparkSession, d: String) => streaming.GraphStream.streamBetweenness(s, d)),
    "triangle_count"     -> Graph.triangleCount _,
    "hits_scores"        -> Graph.hitsScores _,
    "communities_lpa"    -> Graph.communitiesLpa _,
    "degree_histogram"   -> Graph.degreeHistogram _,
    "stream_assortativity" -> ((s: SparkSession, d: String) => streaming.GraphStream.streamAssortativity(s, d)),
    "stream_k_core"      -> ((s: SparkSession, d: String) => streaming.GraphStream.streamKCore(s, d)),
    "heavy_changers"     -> Timeseries.heavyChangers _,
    "markov_attribution" -> MultiTouch.markovAttribution _,
    "jackknife_ratio"    -> Stats.jackknifeRatio _,
    "decile_lift"        -> Behavior.decileLift _,
    "stream_decile_lift" -> ProfileStreams.streamDecileLift _,
    "stream_rfm_segments" -> ProfileStreams.streamRfmSegments _,
    "stream_user_revenue_percentile" -> ProfileStreams.streamUserRevenuePercentile _,
    "stream_engagement_gini" -> ProfileStreams.streamEngagementGini _,
    "stream_heaps_law_fit" -> ((s: SparkSession, d: String) => ProfileStreams.streamHeapsLawFit(s, d)),
    "stream_jackknife"   -> ((s: SparkSession, d: String) => EwmaStream.streamJackknife(s, d)),
    "stream_markov_attribution" -> ((s: SparkSession, d: String) => streaming.MarkovAttrStream.streamMarkovAttribution(s, d)),
    "stream_heavy_changers" -> ((s: SparkSession, d: String) => streaming.TimeseriesStream.streamHeavyChangers(s, d)),
    "nb_lang_classifier" -> CorpusQa.nbLangClassifier _,
    "stream_nb_lang"     -> ((s: SparkSession, d: String) => streaming.NbLangStream.streamNbLang(s, d)),
    "pivot_type_dow"     -> Olap.pivotTypeDow _,
    "stream_pivot_type_dow" -> RollupStream.streamPivotTypeDow _,
    "k_core"             -> Graph.kCoreItems _,
    "link_prediction"    -> Graph.linkPrediction _,
    "changepoint_cusum"  -> Behavior.changepointCusum _,
    // behavioral statistics over the event log
    "rfm_segments"        -> Behavior.rfmSegments _,
    "item_similarity"     -> Behavior.itemSimilarity _,
    "item_cf_recommend"   -> Behavior.itemCfRecommend _,
    "engagement_gini"     -> Behavior.engagementGini _,
    "metric_correlations" -> Behavior.metricCorrelations _,
    "mode_daily_item"     -> Behavior.modeDailyItem _,
    "char_ngram_profile"  -> TextOps.charNgramProfile _,
    "bpe_merge_candidates" -> TextOps.bpeMergeCandidates _,
    "sentence_stats"       -> TextOps.sentenceStats _,
    "source_drift_tv"      -> TextOps.sourceDriftTv _,
    "user_lifecycle"       -> Behavior.userLifecycle _,
    "interevent_histogram" -> Behavior.intereventHistogram _,
    "rank_delta_daily"     -> Behavior.rankDeltaDaily _,
    "ewma_daily"           -> Behavior.ewmaDaily _,
    "pareto_users"         -> Behavior.paretoUsers _,
    "boxplot_stats"        -> Behavior.boxplotStats _,
    "ab_welch_ttest"       -> Behavior.abWelchTtest _,
    "ab_cuped"             -> Experiments.abCuped _,
    "stream_ab_cuped"      -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamAbCuped(s, d)),
    "conformal_interval"   -> Experiments.conformalInterval _,
    "stream_conformal"     -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamConformal(s, d)),
    "ab_srm_check"         -> Experiments.abSrmCheck _,
    "k_anonymity_check"    -> Experiments.kAnonymityCheck _,
    "offpolicy_eval"       -> Experiments.offpolicyEval _,
    "stream_offpolicy"     -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamOffpolicy(s, d)),
    "stream_k_anonymity"   -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamKAnonymity(s, d)),
    "stream_ab_srm"        -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamAbSrm(s, d)),
    "qte_deciles"          -> Experiments.qteDeciles _,
    "stratified_ate"       -> Experiments.stratifiedAte _,
    "stream_stratified_ate" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamStratifiedAte(s, d)),
    "ab_peeking_curve"     -> Experiments.abPeekingCurve _,
    "stream_peeking"       -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamPeeking(s, d)),
    "stream_qte"           -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamQte(s, d)),
    "hill_tail_index"      -> Stats.hillTailIndex _,
    "stream_hill"          -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamHill(s, d)),
    "zipf_slope"           -> TextOps.zipfSlope _,
    "dup_rate_by_source"   -> TextOps.dupRateBySource _,
    "ngram_novelty"        -> TextOps.ngramNovelty _,
    "source_lang_entropy"  -> TextOps.sourceLangEntropy _,
    "term_pmi_top"         -> TextOps.termPmiTop _,
    "seasonality_profile"  -> Behavior.seasonalityProfile _,
    "cdc_scd2"             -> Engagement.cdcScd2 _,
    "doclen_histogram"     -> TextOps.doclenHistogram _,
    "stream_seasonality"   -> SeasonalityStream.streamSeasonality _,
    "percentile_bands_daily" -> Behavior.percentileBandsDaily _,
    "langid_confusion"     -> TextOps.langidConfusion _,
    "centroid_drift"       -> VectorOps.centroidDrift _,
    "stream_percentile_bands" -> PercentileBandsStream.streamPercentileBands _,
    "stream_doclen"        -> DoclenStream.streamDoclen _,
    "type_user_overlap"    -> Behavior.typeUserOverlap _,
    "revenue_hhi"          -> Behavior.revenueHhi _,
    "stream_zipf_slope"    -> ZipfStream.streamZipfSlope _,
    "stream_revenue_hhi"   -> HhiStream.streamRevenueHhi _,
    "vocab_coverage_by_source" -> TextOps.vocabCoverageBySource _,
    "cross_source_dups"    -> TextOps.crossSourceDups _,
    "stream_boxplot"       -> BoxplotStream.streamBoxplot _,
    "stream_approx_distinct" -> HllStream.streamApproxDistinct _,
    "stream_rolling_retention" -> ProfileStreams.streamRollingRetention _,
    "stream_label_centroids" -> ((s: SparkSession, d: String) => ProfileStreams.streamLabelCentroids(s, d)),
    "label_centroids"      -> VectorOps.labelCentroids _,
    "stream_ewma"          -> EwmaStream.streamEwma _,
    // Structured Streaming (real engine: readStream -> AvailableNow),
    // checked against the same DuckDB oracles as their batch twins
    "stream_hop_agg"     -> EngagementStream.streamHopAgg _,
    "stream_hop_append"  -> ((s: SparkSession, d: String) => EngagementStream.streamHopAppend(s, d)),
    "stream_tumble_append" -> ((s: SparkSession, d: String) => EngagementStream.streamTumbleAppend(s, d)),
    "stream_tumble_agg"  -> EngagementStream.streamTumbleAgg _,
    "stream_tumble_jsonl" -> EngagementStream.streamTumbleJsonl _,
    "stream_topk_per_group" -> ((s: SparkSession, d: String) => EngagementStream.streamTopkPerGroup(s, d)),
    "stream_enrich"      -> EngagementStream.streamEnrich _,
    "stream_cdc_compact" -> ((s: SparkSession, d: String) => CdcCompact.streamCdcCompact(s, d)),
    "stream_cdc_with_deletes" -> ((s: SparkSession, d: String) => CdcCompact.streamCdcWithDeletes(s, d)),
    "stream_cdc_schema_drift" -> CdcCompact.streamCdcSchemaDrift _,
    "stream_session_agg" -> Sessionize.streamSessionAgg _,
    "stream_router"      -> EngagementStream.streamRouter _,
    "stream_router_jdbc" -> JdbcSink.streamRouterJdbc _,
    // local-mode sink-protocol test: the mock consumer lives in the
    // driver JVM (see HttpSink.streamRouterHttp scaladoc); only the
    // executor-side postPartition path is the deployable piece.
    "stream_router_http" -> graft.streaming.HttpSink.streamRouterHttp _,
    "stream_leaderboard" -> EngagementStream.streamLeaderboard _,
    "stream_dedup"       -> StreamDedup.streamDedup _,
    "stream_dedup_incremental" ->
      ((s: SparkSession, d: String) => StreamIncrementalDedup.streamDedupIncremental(s, d)),
    "stream_funnel"      -> ((s: SparkSession, d: String) => FunnelStream.streamFunnel(s, d)),
    "stream_attribution" -> ((s: SparkSession, d: String) => AttributionStream.streamAttribution(s, d)),
    "stream_moments"     -> MomentsStream.streamMoments _,
    "stream_rollup"      -> RollupStream.streamRollup _,
    "stream_mode_daily"  -> DailyModeStream.streamModeDaily _,
    "stream_source_drift" -> DriftStream.streamSourceDrift _,
    "stream_changepoint"  -> ChangepointStream.streamChangepoint _,
    "stream_interval_join" -> EngagementStream.streamIntervalJoin _,
    "stream_interval_join_left" -> EngagementStream.streamIntervalJoinLeft _,
    // Analytic core
    "q1_pricing_summary"    -> Olap.q1PricingSummary _,
    "q3_top_orders"         -> Olap.q3TopOrders _,
    "q5_region_revenue"     -> Olap.q5RegionRevenue _,
    "running_total"         -> Olap.runningTotal _,
    "distinct_daily"        -> Olap.distinctDaily _,
    "approx_distinct_daily" -> Olap.approxDistinctDaily _,
    "approx_top_items"      -> ((s: SparkSession, d: String) => Olap.approxTopItems(s, d)),
    "rollup_sales"          -> Olap.rollupSales _,
    "pivot_sales"           -> Olap.pivotSales _,
    "cube_sales"            -> Olap.cubeSales _,
    "grouping_sets_sales"   -> Olap.groupingSetsSales _,
    "histogram_value"       -> ((s: SparkSession, d: String) => Olap.histogramValue(s, d)),
    "timeseries_fill"       -> Olap.timeseriesFill _,
    "q17_small_quantity"    -> ((s: SparkSession, d: String) => Olap.q17SmallQuantity(s, d)),
    "q8_market_share"       -> ((s: SparkSession, d: String) => Olap.q8MarketShare(s, d)),
    "q19_discounted_revenue" -> Olap.q19DiscountedRevenue _,
    "q4_order_priority"     -> ((s: SparkSession, d: String) => Olap.q4OrderPriority(s, d)),
    "q7_volume_shipping"    -> ((s: SparkSession, d: String) => Olap.q7VolumeShipping(s, d)),
    "q18_large_orders"      -> ((s: SparkSession, d: String) => Olap.q18LargeOrders(s, d)),
    "q6_revenue_delta"      -> ((s: SparkSession, d: String) => Olap.q6RevenueDelta(s, d)),
    "q10_returned_items"    -> ((s: SparkSession, d: String) => Olap.q10ReturnedItems(s, d)),
    "q13_order_distribution" -> ((s: SparkSession, d: String) => Olap.q13OrderDistribution(s, d)),
    "q14_promo_effect"      -> ((s: SparkSession, d: String) => Olap.q14PromoEffect(s, d)),
    "q15_top_supplier"      -> ((s: SparkSession, d: String) => Olap.q15TopSupplier(s, d)),
    "q22_dormant_customers" -> ((s: SparkSession, d: String) => Olap.q22DormantCustomers(s, d)),
    "q2_min_cost_supplier"  -> ((s: SparkSession, d: String) => TpchShapes.q2MinCostSupplier(s, d)),
    "q9_product_profit"     -> ((s: SparkSession, d: String) => TpchShapes.q9ProductProfit(s, d)),
    "q11_important_parts"   -> ((s: SparkSession, d: String) => TpchShapes.q11ImportantParts(s, d)),
    "q12_ship_lag"          -> ((s: SparkSession, d: String) => TpchShapes.q12ShipLag(s, d)),
    "q16_parts_suppliers"   -> ((s: SparkSession, d: String) => TpchShapes.q16PartsSuppliers(s, d)),
    "q20_dominant_supplier" -> ((s: SparkSession, d: String) => TpchShapes.q20DominantSupplier(s, d)),
    "q21_waiting_supplier"  -> ((s: SparkSession, d: String) => TpchShapes.q21WaitingSupplier(s, d)),
    "histogram_equidepth"   -> ((s: SparkSession, d: String) => Olap.histogramEquidepth(s, d)),
    "yoy_revenue"           -> Olap.yoyRevenue _,
    "open_orders_daily"     -> Olap.openOrdersDaily _,
    "rolling_distinct_users" -> ((s: SparkSession, d: String) => Olap.rollingDistinctUsers(s, d)),
    "rolling_p95_value"      -> ((s: SparkSession, d: String) => Olap.rollingP95Value(s, d)),
    "vocab_stats"            -> TextOps.vocabStats _,
    "anomaly_mad"            -> ((s: SparkSession, d: String) => Behavior.anomalyMad(s, d)),
    "incremental_rollup"    -> ((s: SparkSession, d: String) => Olap.incrementalRollup(s, d)),
    "unpivot_metrics"       -> Olap.unpivotMetrics _,
    "profile_columns"       -> Olap.profileColumns _,
    "hll_sketch_daily"      -> ((s: SparkSession, d: String) => Olap.hllSketchDaily(s, d)),
    "kll_quantiles_daily"   -> ((s: SparkSession, d: String) => Olap.kllQuantilesDaily(s, d)),
    "stream_kll_quantiles"  -> ((s: SparkSession, d: String) => HllStream.streamKllQuantiles(s, d)),
    "zorder_layout"         -> Olap.zorderLayout _,
    "semi_anti_customers"   -> Olap.semiAntiCustomers _,
    "percentile_stats"      -> ((s: SparkSession, d: String) => Olap.percentileStats(s, d)),
    "percentile_stats_approx" -> Olap.percentileStatsApprox _,
    "skew_salted_join"      -> ((s: SparkSession, d: String) => Olap.skewSaltedJoin(s, d)),
    "bucketed_join"         -> ((s: SparkSession, d: String) => Olap.bucketedJoin(s, d)),
    "bloom_filtered_join"   -> ((s: SparkSession, d: String) => Olap.bloomFilteredJoin(s, d)),
    "range_join_agg"        -> Olap.rangeJoinAgg _,
    // LLM training-data pipeline
    "dedup_exact"        -> TextOps.dedupExact _,
    "word_jaccard_pairs" -> ((s: SparkSession, d: String) => TextOps.wordJaccardPairs(s, d)),
    "word_jaccard_naive" -> ((s: SparkSession, d: String) => TextOps.wordJaccardNaive(s, d)),
    "containment_pairs"  -> ((s: SparkSession, d: String) => TextOps.containmentPairs(s, d)),
    "dedup_incremental"  -> ((s: SparkSession, d: String) => Dedup.dedupIncremental(s, d)),
    // corpus assembly: deterministic selection / split / packing
    "train_test_split"    -> ((s: SparkSession, d: String) => Sampling.trainTestSplit(s, d)),
    "stratified_sample"   -> ((s: SparkSession, d: String) => Sampling.stratifiedSample(s, d)),
    "pack_sequences"      -> ((s: SparkSession, d: String) => Sampling.packSequences(s, d)),
    "ngram_contamination" -> ((s: SparkSession, d: String) => Sampling.ngramContamination(s, d)),
    "decontaminate"       -> ((s: SparkSession, d: String) => Sampling.decontaminate(s, d)),
    "decontaminate_fuzzy" -> ((s: SparkSession, d: String) => Sampling.decontaminateFuzzy(s, d)),
    "domain_frequency_cap" -> ((s: SparkSession, d: String) => Sampling.domainFrequencyCap(s, d)),
    "doc_chunking"        -> ((s: SparkSession, d: String) => Sampling.docChunking(s, d)),
    "corpus_mix"          -> ((s: SparkSession, d: String) => Sampling.corpusMix(s, d)),
    "corpus_mix_temperature" -> ((s: SparkSession, d: String) => Sampling.corpusMixTemperature(s, d)),
    "sample_k_per_group"  -> ((s: SparkSession, d: String) => Sampling.sampleKPerGroup(s, d)),
    "weighted_sample"     -> ((s: SparkSession, d: String) => Sampling.weightedSample(s, d)),
    "corpus_filter"       -> ((s: SparkSession, d: String) => TextOps.corpusFilter(s, d)),
    "stream_corpus_filter" -> ((s: SparkSession, d: String) =>
      CorpusFilterStream.streamCorpusFilter(s, d)),
    "stream_corpus_filter_tombstone" -> ((s: SparkSession, d: String) =>
      CorpusFilterStream.streamCorpusFilterTombstone(s, d)),
    "semantic_clusters"   -> ((s: SparkSession, d: String) => VectorOps.semanticClusters(s, d)),
    // the scale path its contract promises: components over the IVF
    // multi-probe pair graph (rows-only; refinement/recall spec).
    // nCells follows the dedup_semantic sizing rule nCells = |corpus|/C
    // AT THE REGISTRATION (a fixed cell count re-quadratizes the
    // in-cell join as the corpus grows — the round-12 100x anchor
    // caught exactly that: nCells=8 at 500k vectors timed out, the
    // sized knob completes); C=512 keeps each cell's probe-2 join at
    // ~0.5M cosine evals, single-task territory at any corpus size.
    "semantic_clusters_ivf" -> ((s: SparkSession, d: String) => {
      val n = sources.Tables.embeddings(s, d).count()
      VectorOps.semanticClustersIvf(s, d, nCells = math.max(8L, n / 512L).toInt)
    }),
    // serve-while-ingesting twin: batch x accrued-index incremental
    // screen over the SAME fixed centroids/sized cells (rows-only;
    // stream≡batch parity spec)
    "stream_semantic_clusters_ivf" -> ((s: SparkSession, d: String) =>
      streaming.ProfileStreams.streamSemanticIvf(s, d)),
    "lang_id"            -> TextOps.langId _,
    "text_quality"       -> TextOps.textQuality _,
    "gopher_quality_gates" -> TextOps.gopherGates _,
    "text_repetition"    -> TextOps.textRepetition _,
    "text_redact"        -> TextOps.textRedact _,
    "bpe_train"          -> TextOps.bpeTrain _,
    "stream_bpe_train"   -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamBpeTrain(s, d)),
    "bpe_fertility_by_source" -> TextOps.bpeFertilityBySource _,
    "stream_bpe_fertility" -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamBpeFertility(s, d)),
    "dsir_importance"    -> CorpusQa.dsirImportance _,
    "stream_dsir"        -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamDsir(s, d)),
    "stream_dsir_tombstone" -> ((s: SparkSession, d: String) =>
      streaming.ProfileStreams.streamDsirTombstone(s, d)),
    "pii_density"        -> TextOps.piiDensity _,
    "stream_pii_density" -> ((s: SparkSession, d: String) => ProfileStreams.streamPiiDensity(s, d)),
    "token_rarity"       -> ((s: SparkSession, d: String) => TextOps.tokenRarity(s, d)),
    "tfidf_top_terms"    -> ((s: SparkSession, d: String) => TextOps.tfidfTopTerms(s, d)),
    "bm25_topk"          -> ((s: SparkSession, d: String) => TextOps.bm25TopK(s, d)),
    "ngram_lm_score"     -> TextOps.ngramLmScore _,
    "word_entropy"       -> TextOps.wordEntropy _,
    "token_count"        -> TextOps.tokenCount _,
    "text_normalize"     -> TextOps.textNormalize _,
    "doc_fingerprint"    -> TextOps.docFingerprint _,
    "winnow_pairs"       -> ((s: SparkSession, d: String) => Winnow.winnowPairs(s, d)),
    "edit_distance_pairs" -> ((s: SparkSession, d: String) => TextOps.editDistancePairs(s, d)),
    "multimodal_meta"    -> TextOps.multimodalMeta _,
    "multimodal_decode"  -> Multimodal.decode _,
    "multimodal_pipeline" -> Multimodal.pipeline _,
    "dedup_substring"    -> ((s: SparkSession, d: String) => Dedup.dedupSubstring(s, d)),
    "dedup_substring_remove" -> ((s: SparkSession, d: String) => Dedup.dedupSubstringRemove(s, d)),
    "dedup_paragraph"    -> ((s: SparkSession, d: String) => Dedup.dedupParagraph(s, d)),
    "dedup_minhash_lsh"  -> ((s: SparkSession, d: String) => Dedup.minHashLsh(s, d)),
    "dedup_clusters"     -> ((s: SparkSession, d: String) => Dedup.dedupClusters(s, d)),
    "dedup_clusters_star" -> ((s: SparkSession, d: String) => Dedup.dedupClustersStar(s, d)),
    "dedup_simhash"      -> ((s: SparkSession, d: String) => Dedup.simHashPairs(s, d)),
    "dedup_simhash_clusters" -> ((s: SparkSession, d: String) => Dedup.dedupSimhashClusters(s, d)),
    "embedding_neardup"  -> ((s: SparkSession, d: String) => VectorOps.embeddingNearDup(s, d)),
    "decontaminate_semantic" -> ((s: SparkSession, d: String) => VectorOps.decontaminateSemantic(s, d)),
    "stream_decontaminate_semantic" -> ((s: SparkSession, d: String) =>
      ProfileStreams.streamDecontaminateSemantic(s, d)),
    // nCells ∝ |corpus|/target-cell-size, nProbe buys back boundary
    // recall — see dedupSemantic's sizing note; tuned here, not inside
    // the operator.
    "dedup_semantic"     -> ((s: SparkSession, d: String) =>
      VectorOps.dedupSemantic(s, d, threshold = 0.35, nCells = 8, nProbe = 2)),
    "ann_topk"           -> ((s: SparkSession, d: String) => VectorOps.annTopK(s, d)),
    "hybrid_rrf_topk"    -> ((s: SparkSession, d: String) => VectorOps.hybridRrfTopK(s, d)),
    "stream_hybrid_rrf"  -> ((s: SparkSession, d: String) => streaming.ProfileStreams.streamHybridRrf(s, d)),
    "stream_hybrid_rrf_tombstone" -> ((s: SparkSession, d: String) =>
      streaming.ProfileStreams.streamHybridRrfTombstone(s, d)),
    "ann_lsh_topk"       -> ((s: SparkSession, d: String) => VectorOps.annLshTopK(s, d)),
    "ann_ivf_topk"       -> ((s: SparkSession, d: String) => VectorOps.annIvfTopK(s, d)),
    "ann_pq_topk"        -> ((s: SparkSession, d: String) => VectorOps.annPqTopK(s, d)),
    "ann_ivfpq_topk"     -> ((s: SparkSession, d: String) => VectorOps.annIvfPqTopK(s, d)),
    "embedding_norms"    -> VectorOps.embeddingNorms _,
    "embedding_dim_stats" -> VectorOps.embeddingDimStats _,
    "embedding_quantize_sq" -> VectorOps.embeddingQuantizeSq _,
    "knn_classify"       -> ((s: SparkSession, d: String) => VectorOps.knnClassify(s, d)),
  )

  /** DuckDB-runnable oracle for each SQL-expressible query.
    * Column names/aliases match the Spark side exactly; timestamps
    * are cast to microsecond TIMESTAMP up front so DuckDB's ns
    * precision matches Spark's µs parquet reads. */
  def oracleSql: Map[String, String] = {
    val base = baseOracleSql
    // streaming variants produce byte-identical results to their
    // batch twins (shared transforms / MERGE semantics) — same oracle
    base ++ Map(
      // the naive blocked join is output-identical to the
      // prefix-filtered path (both exact) — same oracle
      "word_jaccard_naive" -> base("word_jaccard_pairs"),
      "stream_cdc_with_deletes" -> base("cdc_with_deletes"),
      // verdicts are against the static corpus only, so micro-batch
      // boundaries cannot change any answer — same oracle
      "stream_dedup_incremental" -> base("dedup_incremental"),
      "stream_funnel" -> base("funnel_conversion"),
      // incremental attribution equals the batch window row-for-row
      // (integer-cents accumulation, time-ordered replay)
      "stream_attribution" -> base("attribution_last_touch"),
      // the incremental DFA folds each batch on top of the stored
      // accumulator (init = prior state), so time-ordered replay
      // reproduces the batch fold exactly
      "stream_sequence_count" -> base("sequence_count"),
      "stream_funnel_strict" -> base("funnel_strict_order"),
      // min/max spans and (label,dim) sums are additive state; the
      // reports are the SAME derivations the batch operators run
      "stream_rolling_retention" -> base("rolling_retention"),
      "stream_label_centroids" -> base("label_centroids"),
      // additive per-source PII grid / per-vector stateless verdicts
      // against the broadcast eval side — reports run the batch
      // operators' own derivations over the merged state
      "stream_pii_density" -> base("pii_density"),
      // id-disjoint delta-appended doc-bucket grid; weights derive at
      // report time against the FINAL bucket LMs — same oracle
      "stream_dsir" -> base("dsir_importance"),
      // append-only inverted index + vector store; queries, stats, df
      // and both rankings re-derive from the final index through the
      // batch fusion core — same oracle
      "stream_hybrid_rrf" -> base("hybrid_rrf_topk"),
      "stream_decontaminate_semantic" -> base("decontaminate_semantic"),
      // per-batch LSH screening against the accumulated index union'd
      // over an id-disjoint batching reproduces the full self-join
      // pair set; representatives re-elected at report time
      "stream_corpus_filter" -> base("corpus_filter"),
      // boundary pairs reconstructed from the per-user frontier state
      // + additive counts: time-ordered replay equals the batch
      // window count table, then the SAME report derivation runs
      "stream_transitions" -> base("event_transitions"),
      // the edge SET is batching-invariant (in-batch window +
      // frontier stitching yield every consecutive hop exactly once;
      // distinct union is idempotent) — same SCC oracle as batch
      "stream_scc_items" -> base("scc_items"),
      // set-union (day,user) state is idempotent and order-blind —
      // same exact-distinct oracle as the batch twin
      "stream_distinct_daily" -> base("distinct_daily"),
      // incremental-equals-rebuild IS the operator's contract: the
      // mid-span split is internal and the full-log SCD2 SQL is the
      // oracle
      "scd2_apply_batch" -> base("cdc_scd2"),
      // additive daily-count / (day,x,y) / per-user-min states, each
      // reported through the batch operator's own derivation — the
      // state-merge family invariant (stream ≡ batch row-for-row)
      "stream_acf" -> base("acf_daily"),
      "stream_rolling_corr" -> base("rolling_corr_daily"),
      "stream_survival" -> base("survival_km"),
      // per-batch apply IS the batch incremental operator; repeated
      // apply over time-ordered batches equals the full-log rebuild
      "stream_scd2" -> base("cdc_scd2"),
      // the same distinct-(day,user) set state, reported through the
      // batch operators' own derivations
      "stream_user_lifecycle" -> base("user_lifecycle"),
      "stream_dau_wau_mau" -> base("dau_wau_mau"),
      // the boxplot counting-sort grid serves the winsorized report
      // too — one additive state, two robust-stat faces
      "stream_winsorized" -> base("winsorized_stats"),
      // additive (lang, source) card grid / daily (x, y) grid — the
      // one-state-many-faces pattern again
      "stream_dataset_card" -> base("dataset_card"),
      "stream_ma_crossover" -> base("ma_crossover"),
      "stream_type_mix_drift" -> base("type_mix_drift"),
      "stream_item_adoption" -> base("item_adoption"),
      // cross-batch-pair family: boundary gaps / boundary-spanning
      // sessions reconstructed from per-user frontiers
      "stream_interevent" -> base("interevent_histogram"),
      "stream_peak_concurrency" -> base("peak_concurrency"),
      "stream_session_duration" -> base("session_duration"),
      // further one-state-many-faces reads: the vocab, (type, day)
      // and (source, len) grids each serve another derivation
      "stream_vocab_coverage" -> base("vocab_coverage_curve"),
      "stream_chi2_type_dow" -> base("chi2_type_dow"),
      "stream_ks_doclen" -> base("ks_doclen_sources"),
      // same additive length grid, W1 face; same PSI grid discipline
      "stream_wasserstein_doclen" -> base("wasserstein_doclen"),
      "stream_psi_drift" -> base("psi_value_drift"),
      "stream_holt" -> base("holt_linear_trend"),
      "stream_cramers_v" -> base("cramers_v_source_lang"),
      "stream_mann_whitney" -> base("mann_whitney_u"),
      "stream_neyman" -> base("neyman_allocation"),
      "stream_fano" -> base("fano_factor_daily"),
      "stream_spearman" -> base("spearman_daily_pairs"),
      "stream_runs_test" -> base("runs_test_daily"),
      "stream_benford" -> base("benford_first_digit"),
      "stream_kendall" -> base("kendall_tau_daily"),
      "stream_ljung_box" -> base("ljung_box_daily"),
      "stream_markov" -> base("markov_stationary"),
      "stream_dow_residual" -> base("dow_residual_outliers"),
      "stream_mutual_info" -> base("mutual_info_type_dow"),
      "stream_absorption" -> base("absorption_steps"),
      "stream_jarque_bera" -> base("jarque_bera_daily"),
      "stream_theil_sen" -> base("theil_sen_trend"),
      // additive per-type integer moments (the stream_moments state):
      // the ANOVA decomposition is a pure read over them
      "stream_anova" -> base("anova_f_cents"),
      // additive (type, cents) support grid faces 3 + 4
      "stream_kruskal" -> base("kruskal_wallis"),
      "stream_levene" -> base("levene_brown_forsythe"),
      // additive (type, day) count grid face 17
      "stream_friedman" -> base("friedman_daily"),
      // additive (type, day, Σcents, n) grid faces 3 + 4
      "stream_page_hinkley" -> base("page_hinkley_daily"),
      "stream_grubbs" -> base("grubbs_daily"),
      // additive per-replicate (n_eff, Σw·cents) — the Poisson
      // bootstrap's whole sampling distribution as a 32-row state
      "stream_bootstrap" -> base("bootstrap_mean_ci"),
      // additive d×w counter grid + idempotent item dictionary
      "stream_cms" -> base("cms_top_items"),
      "stream_seasonal_strength" -> base("seasonal_strength"),
      // additive (user, minute) burst grid; rollup is a pure read
      "stream_bot_screen" -> base("bot_burst_screen"),
      // three conditional mins per user under time-ordered delivery;
      // the dirty verdict is a read over (t_view, t_purchase, t_err)
      "stream_funnel_excluding" -> base("funnel_excluding"),
      // idempotent (user, item) presence set: the graph (cap, pair
      // counts, edge cut, centrality rounds) is a pure read over it
      "stream_pagerank" -> base("pagerank_items"),
      // additive per-user (pre,post) sums / conformal counting grid /
      // per-user monetary state — reports run the batch operators'
      // own derivations over the merged state
      "stream_ab_cuped" -> base("ab_cuped"),
      "stream_ab_srm" -> base("ab_srm_check"),
      "stream_k_anonymity" -> base("k_anonymity_check"),
      "stream_offpolicy" -> base("offpolicy_eval"),
      "stream_qte" -> base("qte_deciles"),
      "stream_stratified_ate" -> base("stratified_ate"),
      "stream_peeking" -> base("ab_peeking_curve"),
      "stream_conformal" -> base("conformal_interval"),
      "stream_hill" -> base("hill_tail_index"),
      // the presence-set state is batching-invariant (set union), and
      // the PPR read is the batch transform on the same edge cut
      "stream_ppr" -> base("ppr_items"),
      "stream_random_walks" -> base("random_walks"),
      "stream_harmonic" -> base("harmonic_centrality"),
      "stream_katz" -> base("katz_centrality"),
      "stream_assortativity" -> base("degree_assortativity"),
      // additive NB training grids; evaluation re-reads the staged corpus
      "stream_nb_lang" -> base("nb_lang_classifier"),
      // additive (item, day) grid; the period cut is a min over it
      "stream_heavy_changers" -> base("heavy_changers"),
      // additive journey-chain counts + per-user truncation frontier
      // under time-ordered replay; NULL terminals derive at read
      "stream_markov_attribution" -> base("markov_attribution"),
      // the daily (cents, n) grid's fifth face
      "stream_jackknife" -> base("jackknife_ratio"),
      // dow pivot is a pure read over the daily rollup state
      "stream_pivot_type_dow" -> base("pivot_type_dow"),
      // additive per-source readability sums
      "stream_flesch" -> base("flesch_reading_ease"),
      "stream_wilcoxon" -> base("wilcoxon_signed_rank"),
      // per-user (first, last) span: half membership is a pure read
      "stream_capture_recapture" -> base("capture_recapture"),
      // additive (user, type) counts; per-user entropies cannot merge
      "stream_user_type_entropy" -> base("user_type_entropy"),
      // per-user (last_ts, k) session frontier under ordered delivery
      "stream_sessions_per_user" -> base("sessions_per_user"),
      "stream_ccf" -> base("cross_correlation_daily"),
      // stable per-user session ids under ordered delivery; the
      // presence set union is idempotent
      "stream_session_affinity" -> base("session_type_affinity"),
      "stream_pacf" -> base("pacf_daily"),
      // same transition-pair state; |types| value-iteration reads
      "stream_first_passage" -> base("first_passage_matrix"),
      // cross-batch intervals reconstructed from the per-user
      // frontier; additive daily sufficient sums
      "stream_time_weighted" -> base("time_weighted_value"),
      // additive integer moments: batch boundaries are invisible, so
      // the oracle is the same formula in one corpus pass (expression
      // shape mirrored literally for bit-equal doubles)
      // additive per-(day,type) rollup state: same full-recompute
      // oracle as the batch incremental_rollup
      "stream_rollup" -> base("incremental_rollup"),
      // sufficient-count state + shared mode derivation: stream
      // equals the batch mode_daily_item row-for-row
      "stream_mode_daily" -> base("mode_daily_item"),
      "stream_source_drift" -> base("source_drift_tv"),
      "stream_changepoint" -> base("changepoint_cusum"),
      // additive daily-cents state + shared dyadic EWMA derivation:
      // stream equals the batch ewma_daily row-for-row
      "stream_ewma" -> base("ewma_daily"),
      // additive hour-of-week cell counts + shared share/deviation
      // derivation: stream equals the batch seasonality_profile
      "stream_seasonality" -> base("seasonality_profile"),
      // additive value counts + shared counting-sort quantiles:
      // stream equals the batch boxplot_stats
      "stream_boxplot" -> base("boxplot_stats"),
      // per-day-keyed value counts, same counting-sort derivation
      "stream_percentile_bands" -> base("percentile_bands_daily"),
      // histograms are already additive: merge and report coincide
      "stream_doclen" -> base("doclen_histogram"),
      // additive vocabulary counts + shared regression derivation
      "stream_zipf_slope" -> base("zipf_slope"),
      // additive item-cents grid + shared HHI derivation
      "stream_revenue_hhi" -> base("revenue_hhi"),
      "stream_moments" ->
        """WITH m AS (SELECT event_type, count(*) AS n,
          |                  CAST(sum(c) AS BIGINT) AS sum_c,
          |                  CAST(sum(c * c) AS BIGINT) AS sumsq_c
          |           FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events)
          |           GROUP BY 1)
          |SELECT event_type, n, round((sum_c / 100.0) / n, 4) AS mean,
          |       CASE WHEN n > 1
          |            THEN round(sqrt((sumsq_c - CAST(sum_c AS DOUBLE) * sum_c / n) / (n - 1)) / 100.0, 4)
          |       END AS sd
          |FROM m ORDER BY event_type""".stripMargin,
      "stream_hop_agg"     -> base("hop_window_agg"),
      // Append mode emits exactly the windows the final watermark
      // (max event time − 47 min) has closed — the batch HOP rows
      // restricted to window end ≤ that watermark
      "stream_hop_append" ->
        """SELECT w_start, event_type, count(*) AS n, round(sum(value), 2) AS total
          |FROM (SELECT make_timestamp(((CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 300) * 300 - k * 300) * 1000000) AS w_start,
          |             event_type, value
          |      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks) t
          |GROUP BY w_start, event_type
          |HAVING w_start + INTERVAL 10 MINUTE
          |       <= (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 47 MINUTE FROM events)
          |ORDER BY w_start, event_type""".stripMargin,
      // the tumbling twin: batch TUMBLE rows whose hourly window
      // closed under the final watermark
      "stream_tumble_append" ->
        """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start, event_type,
          |       count(*) AS n,
          |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
          |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100.0) AS avg_value
          |FROM events GROUP BY 1, 2
          |HAVING w_start + INTERVAL 1 HOUR
          |       <= (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 47 MINUTE FROM events)
          |ORDER BY 1, 2""".stripMargin,
      "stream_tumble_agg"  -> base("tumble_window_agg"),
      // same windowed state, JSON-lines wire format feeding it
      "stream_tumble_jsonl" -> base("tumble_window_agg"),
      "stream_topk_per_group" -> base("topk_per_group"),
      "stream_enrich"      -> base("enrich_events"),
      "stream_cdc_compact" -> base("cdc_latest_by_key"),
      // cdc_latest_by_key extended with the post-DDL column: keys
      // whose latest row predates min(ts)+15d read NULL plan
      // (Postgres ADD COLUMN semantics through the drift boundary)
      "stream_cdc_schema_drift" ->
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
          |       CASE WHEN ts >= (SELECT min(ts) + INTERVAL 15 DAY FROM events)
          |            THEN concat('plan_', CAST(event_id % 3 AS VARCHAR)) END AS plan
          |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          |      FROM events) t
          |WHERE rn = 1 ORDER BY user_id""".stripMargin,
      "stream_session_agg" -> base("session_window_agg"),
      "stream_router"      -> base("event_router"),
      "stream_router_jdbc" -> base("event_router"),
      "stream_router_http" -> base("event_router"),
      "stream_leaderboard" -> base("leaderboard_topn"),
      // a full replay of the input is 100% duplicates → the deduped
      // stream equals the events table itself
      "stream_dedup" ->
        """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
          |FROM events ORDER BY event_id""".stripMargin,
      "stream_interval_join" ->
        """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
          |       CAST(c.ts AS TIMESTAMP) AS click_ts, CAST(p.ts AS TIMESTAMP) AS purchase_ts
          |FROM events c JOIN events p
          |  ON c.user_id = p.user_id AND c.event_type = 'click' AND p.event_type = 'purchase'
          | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
          |ORDER BY click_id, purchase_id""".stripMargin,
      // left-outer twin: null-padded rows appear only for clicks whose
      // 30-min match window is CLOSED under the final watermark
      // (min of the two sides' max event time − 1 h — Spark's default
      // multipleWatermarkPolicy=min); younger unmatched clicks are
      // still buffered when the replay ends and must not appear
      "stream_interval_join_left" ->
        """WITH wm AS (SELECT least(
          |    (SELECT max(CAST(ts AS TIMESTAMP)) FROM events WHERE event_type = 'click'),
          |    (SELECT max(CAST(ts AS TIMESTAMP)) FROM events WHERE event_type = 'purchase'))
          |    - INTERVAL 1 HOUR AS w)
          |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
          |       CAST(c.ts AS TIMESTAMP) AS click_ts, CAST(p.ts AS TIMESTAMP) AS purchase_ts
          |FROM (SELECT * FROM events WHERE event_type = 'click') c
          |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          |  ON c.user_id = p.user_id
          | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
          |WHERE p.event_id IS NOT NULL
          |   OR CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE < (SELECT w FROM wm)
          |ORDER BY click_id, purchase_id""".stripMargin)
  }

  private def baseOracleSql: Map[String, String] = Map(
    "cdc_latest_by_key" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // latest row per key wins UNLESS it is a tombstone (op = delete
    // iff event_type = 'error' — Engagement.opExpr, shared with the
    // streaming twin's staged input)
    "cdc_with_deletes" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type != 'error' ORDER BY user_id""".stripMargin,

    // ordered funnel: stage k counts only events after the user's
    // stage k-1 first-time; base CTE truncates ns->us to match Spark
    "funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        |      WHERE e.event_type = 'purchase' GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT count(v.t_view) AS reached_view, count(c.t_click) AS reached_click,
        |       count(p.t_purchase) AS reached_purchase, count(*) AS n_users
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |       LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id""".stripMargin,

    // last-touch attribution: the same struct-max carry-forward
    // window as the Spark side (Behavior.attributionLastTouch) — no
    // touches x conversions self-join in either engine
    "attribution_last_touch" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value FROM events),
        |lt AS (SELECT *, max(CASE WHEN event_type IN ('view','click')
        |                          THEN {'ts': ts, 'eid': event_id, 'et': event_type} END)
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |       FROM e)
        |SELECT CASE WHEN last_touch IS NOT NULL AND last_touch.ts >= ts - INTERVAL 7 DAY
        |            THEN last_touch.et ELSE 'none' END AS touch_type,
        |       count(*) AS n_conversions, round(sum(value), 2) AS attributed_value
        |FROM lt WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // first-touch: correlated earliest-touch lookup (independent
    // formulation of the Spark side's moving RANGE frame)
    "attribution_first_touch" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value FROM events)
        |SELECT touch_type, count(*) AS n_conversions, round(sum(value), 2) AS attributed_value
        |FROM (SELECT c.value,
        |             coalesce((SELECT t.event_type FROM e t
        |                       WHERE t.user_id = c.user_id
        |                         AND t.event_type IN ('view','click')
        |                         AND t.ts < c.ts
        |                         AND t.ts >= c.ts - INTERVAL 7 DAY
        |                       ORDER BY t.ts, t.event_id LIMIT 1), 'none') AS touch_type
        |      FROM e c WHERE c.event_type = 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "top_paths" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
        |rn AS (SELECT user_id, event_type,
        |              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |       FROM e),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM rn WHERE rn <= 5 GROUP BY 1)
        |SELECT path, count(*) AS n_users
        |FROM p GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,

    "key_skew_stats" ->
      """WITH counts AS (SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item, count(*) AS n
        |                FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM counts),
        |top AS (SELECT item, n FROM counts ORDER BY n DESC, item LIMIT 10)
        |SELECT item, n, round(n / total, 4) AS share,
        |       round(CAST(sum(n) OVER (ORDER BY n DESC, item ROWS UNBOUNDED PRECEDING) AS BIGINT) / total, 4) AS cum_share,
        |       round(n * n_keys / total, 4) AS skew_ratio
        |FROM top, tot ORDER BY n DESC, item""".stripMargin,

    "event_transitions" ->
      """WITH p AS (
        |  SELECT prev_type, event_type AS curr_type, count(*) AS n
        |  FROM (SELECT event_type,
        |               lag(event_type) OVER (PARTITION BY user_id
        |                                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |        FROM events) t
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, curr_type, n,
        |       round(n / (sum(n) OVER (PARTITION BY prev_type)), 4) AS p
        |FROM p ORDER BY prev_type, curr_type""".stripMargin,

    // decay anchored at the corpus max ts; exp() is IEEE libm in
    // both engines and the 4-decimal round absorbs last-ulp drift
    "decayed_leaderboard" ->
      """WITH r AS (SELECT max(CAST(ts AS TIMESTAMP)) AS t_ref FROM events)
        |SELECT user_id,
        |       round(sum(value * exp(-0.6931471805599453 / 86400.0 *
        |                 (epoch_us(r.t_ref) - epoch_us(CAST(ts AS TIMESTAMP))) / 1e6)), 4) AS score
        |FROM events CROSS JOIN r
        |GROUP BY user_id ORDER BY score DESC, user_id LIMIT 20""".stripMargin,

    "lag_features" ->
      """SELECT event_id, user_id, value,
        |       lag(value, 1) OVER w AS value_lag1,
        |       lag(value, 2) OVER w AS value_lag2,
        |       round((epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER w)) / 1e6, 3) AS gap_seconds,
        |       round(avg(value) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                              ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 4) AS rolling_avg3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin,

    "anomaly_zscore" ->
      """WITH s AS (SELECT event_type, avg(value) AS mean, stddev_samp(value) AS sd
        |           FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN abs(e.value - s.mean) > 2.5 * s.sd THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       round(sum(CASE WHEN abs(e.value - s.mean) > 2.5 * s.sd THEN 1 ELSE 0 END) / count(*), 4) AS outlier_share
        |FROM events e JOIN s ON e.event_type = s.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical double arithmetic on both sides: (v-lo)/((hi-lo)/10)
    // then floor + clamp, so bin boundaries agree bit-for-bit
    "histogram_value" ->
      """WITH r AS (SELECT event_type, min(value) AS lo, max(value) AS hi FROM events GROUP BY 1)
        |SELECT e.event_type,
        |       CAST(CASE WHEN r.hi > r.lo
        |                 THEN least(floor((e.value - r.lo) / ((r.hi - r.lo) / 10)), 9.0)
        |                 ELSE 0.0 END AS BIGINT) AS bin,
        |       count(*) AS n, round(min(e.value), 2) AS bin_min, round(max(e.value), 2) AS bin_max
        |FROM events e JOIN r ON e.event_type = r.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "zorder_layout" -> operators.Olap.zorderOracleSql,

    "timeseries_fill" -> operators.Olap.timeseriesFillOracleSql,
    "q17_small_quantity" -> operators.Olap.q17OracleSql(),
    "q8_market_share" -> operators.Olap.q8OracleSql(),
    "q19_discounted_revenue" -> operators.Olap.q19OracleSql,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |       round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0, 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        |WHERE ns.n_name IN ('NATION_18', 'NATION_19')
        |  AND nc.n_name IN ('NATION_18', 'NATION_19')
        |  AND ns.n_name != nc.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q18_large_orders" ->
      """WITH q AS (SELECT l_orderkey,
        |                  sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_c
        |           FROM lineitem GROUP BY 1 HAVING qty_c > 15000)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey,
        |       date_trunc('day', o.o_orderdate) AS o_day,
        |       round(o.o_totalprice, 2) AS o_totalprice,
        |       qty_c / 100.0 AS total_qty
        |FROM orders o
        |JOIN q ON o.o_orderkey = q.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin,
    "q6_revenue_delta" -> operators.Olap.q6OracleSql(),
    "q10_returned_items" -> operators.Olap.q10OracleSql(),
    "q13_order_distribution" -> operators.Olap.q13OracleSql(),
    "q14_promo_effect" -> operators.Olap.q14OracleSql(),
    "q15_top_supplier" -> operators.Olap.q15OracleSql(),
    "q22_dormant_customers" -> operators.Olap.q22OracleSql(),
    "q2_min_cost_supplier" -> operators.TpchShapes.q2OracleSql(),
    "q9_product_profit" -> operators.TpchShapes.q9OracleSql(),
    "q11_important_parts" -> operators.TpchShapes.q11OracleSql(),
    "q12_ship_lag" -> operators.TpchShapes.q12OracleSql(),
    "q16_parts_suppliers" -> operators.TpchShapes.q16OracleSql(),
    "q20_dominant_supplier" -> operators.TpchShapes.q20OracleSql(),
    "q21_waiting_supplier" -> operators.TpchShapes.q21OracleSql(),
    "histogram_equidepth" -> operators.Olap.histogramEquidepthOracleSql(),
    "yoy_revenue" -> operators.Olap.yoyRevenueOracleSql,
    "open_orders_daily" -> operators.Olap.openOrdersOracleSql,
    "rolling_distinct_users" -> operators.Olap.rollingDistinctOracleSql,
    // discrete rank selection spelled out with the same integer-exact
    // k = ceil(95n/100) in both engines (quantile_disc semantics vary)
    "rolling_p95_value" ->
      """WITH d AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        |fan AS (SELECT d.day + i.range * INTERVAL 1 DAY AS day, d.cents
        |        FROM d, b, range(0, 7) i
        |        WHERE d.day + i.range * INTERVAL 1 DAY >= b.lo
        |          AND d.day + i.range * INTERVAL 1 DAY <= b.hi),
        |r AS (SELECT day, cents,
        |             row_number() OVER (PARTITION BY day ORDER BY cents) AS rn,
        |             count(*) OVER (PARTITION BY day) AS n
        |      FROM fan)
        |SELECT day, CAST(n AS BIGINT) AS n, round(cents / 100.0, 2) AS p95
        |FROM r WHERE rn = (n * 95 + 99) // 100
        |ORDER BY day""".stripMargin,
    "vocab_stats" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok, count(*) AS cf, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |t AS (SELECT count(*) AS total FROM toks),
        |r AS (SELECT tok, cf, df,
        |             row_number() OVER (ORDER BY cf DESC, tok) AS rank,
        |             sum(cf) OVER (ORDER BY cf DESC, tok ROWS UNBOUNDED PRECEDING) AS cum_cf
        |      FROM v)
        |SELECT tok, cf, df, CAST(rank AS BIGINT) AS rank,
        |       round(CAST(cum_cf AS BIGINT) / CAST(total AS BIGINT), 6) AS cum_share
        |FROM r, t ORDER BY rank""".stripMargin,
    // both medians are the same integer rank selection (k = (n+1)//2)
    // the Spark side runs; the outlier test is the cross-multiplied
    // integer comparison |x-med|*10 > 25*mad (k = 2.5, no floats)
    "anomaly_mad" ->
      """WITH ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |r1 AS (SELECT event_type, c,
        |              row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        |              count(*) OVER (PARTITION BY event_type) AS n
        |       FROM ev),
        |med AS (SELECT event_type, c AS med_c, n FROM r1 WHERE rn = (n + 1) // 2),
        |dev AS (SELECT e.event_type, e.c, abs(e.c - m.med_c) AS d, m.med_c
        |        FROM ev e JOIN med m ON e.event_type = m.event_type),
        |r2 AS (SELECT event_type, d,
        |              row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
        |              count(*) OVER (PARTITION BY event_type) AS n
        |       FROM dev),
        |mad AS (SELECT event_type, d AS mad_c FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(max(dev.med_c) / 100.0, 2) AS median,
        |       round(max(mad.mad_c) / 100.0, 2) AS mad,
        |       CAST(sum(CASE WHEN dev.d * 10 > 25 * mad.mad_c THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad ON dev.event_type = mad.event_type
        |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin,
    "incremental_rollup" -> operators.Olap.incrementalRollupOracleSql,
    "unpivot_metrics" -> operators.Olap.unpivotMetricsOracleSql,
    "snapshot_diff" -> operators.Engagement.snapshotDiffOracleSql,
    "events_sessionized" -> operators.Engagement.eventsSessionizedOracleSql(),
    "cohort_ltv" -> operators.Engagement.cohortLtvOracleSql,
    "embedding_norms" -> operators.VectorOps.embeddingNormsOracleSql,
    "embedding_dim_stats" -> operators.VectorOps.embeddingDimStatsOracleSql,
    "embedding_quantize_sq" -> operators.VectorOps.embeddingQuantizeSqOracleSql,
    "knn_classify" -> operators.VectorOps.knnClassifyOracleSql(),
    "trending_daily" -> operators.Engagement.trendingDailyOracleSql(),
    "profile_columns" -> operators.Olap.profileColumnsOracleSql,

    // same heavy-user cap (<= 50 distinct items) and support floor
    "co_engagement" ->
      """WITH items AS (SELECT DISTINCT user_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item FROM events),
        |kept AS (SELECT i.* FROM items i
        |         JOIN (SELECT user_id, count(*) AS n_items FROM items GROUP BY 1) c
        |           ON i.user_id = c.user_id AND c.n_items <= 50)
        |SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_users
        |FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY 1, 2""".stripMargin,

    "activity_heatmap" -> operators.Behavior.activityHeatmapOracleSql,
    "dau_wau_mau" -> operators.Behavior.dauWauMauOracleSql,
    "session_kpis" -> operators.Behavior.sessionKpisOracleSql,
    "conversion_lag_stats" -> operators.Behavior.conversionLagOracleSql,

    "association_rules" ->
      """WITH items AS (SELECT DISTINCT user_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item FROM events),
        |kept AS (SELECT i.* FROM items i
        |         JOIN (SELECT user_id, count(*) AS n_items FROM items GROUP BY 1) c
        |           ON i.user_id = c.user_id AND c.n_items <= 50),
        |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM kept),
        |ic AS (SELECT item, count(*) AS n_item FROM kept GROUP BY 1),
        |p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
        |      FROM kept a JOIN kept b ON a.user_id = b.user_id AND a.item < b.item
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |w AS (SELECT p.*, ia.n_item AS n_a, ib.n_item AS n_b, nu.n_users
        |      FROM p JOIN ic ia ON p.item_a = ia.item JOIN ic ib ON p.item_b = ib.item CROSS JOIN nu),
        |r AS (SELECT item_a AS antecedent, item_b AS consequent, n_ab,
        |             CAST((n_ab * 10000) // n_a AS BIGINT) AS conf_10000,
        |             CAST((n_ab * n_users * 10000) // (n_a * n_b) AS BIGINT) AS lift_10000 FROM w
        |      UNION ALL
        |      SELECT item_b, item_a, n_ab,
        |             CAST((n_ab * 10000) // n_b AS BIGINT),
        |             CAST((n_ab * n_users * 10000) // (n_a * n_b) AS BIGINT) FROM w)
        |SELECT antecedent, consequent, CAST(n_ab AS BIGINT) AS n_ab, conf_10000, lift_10000
        |FROM r ORDER BY conf_10000 DESC, antecedent, consequent LIMIT 50""".stripMargin,

    "frequent_sequences" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |f0 AS (SELECT user_id, event_type AS t, ts, event_id,
        |              row_number() OVER (PARTITION BY user_id, event_type
        |                                 ORDER BY ts, event_id) AS rn
        |       FROM e),
        |f AS (SELECT user_id, t,
        |             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
        |      FROM f0 WHERE rn = 1),
        |s AS (SELECT user_id, t AS pattern FROM f
        |      UNION ALL
        |      SELECT a.user_id, a.t || '>' || b.t
        |      FROM f a JOIN f b ON a.user_id = b.user_id AND a.pos < b.pos
        |      UNION ALL
        |      SELECT a.user_id, a.t || '>' || b.t || '>' || c.t
        |      FROM f a JOIN f b ON a.user_id = b.user_id AND a.pos < b.pos
        |               JOIN f c ON a.user_id = c.user_id AND b.pos < c.pos)
        |SELECT pattern, count(*) AS support
        |FROM s GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 30""".stripMargin,

    // graph family: unrolled integer-PageRank recurrence / naive
    // triple-join triangle oracle (algorithm-independent result set)
    "pagerank_items" -> operators.Graph.pagerankOracleSql(),
    "ppr_items" -> operators.Graph.pprOracleSql(),
    "random_walks" -> operators.Graph.randomWalksOracleSql(),
    "harmonic_centrality" -> operators.Graph.harmonicCentralityOracleSql(),
    "katz_centrality" -> operators.Graph.katzOracleSql(),
    "flesch_reading_ease" -> operators.TextOps.fleschReadingEaseOracleSql,
    "hits_scores" -> operators.Graph.hitsOracleSql(),
    "triangle_count" -> operators.Graph.triangleOracleSql(),
    "communities_lpa" -> operators.Graph.lpaOracleSql(),
    "degree_histogram" -> operators.Graph.degreeHistogramOracleSql,
    "nb_lang_classifier" -> operators.CorpusQa.nbLangClassifierOracleSql,
    "heavy_changers" -> operators.Timeseries.heavyChangersOracleSql,
    "markov_attribution" -> operators.MultiTouch.markovAttributionOracleSql(),
    "jackknife_ratio" -> operators.Stats.jackknifeRatioOracleSql,
    "decile_lift" -> operators.Behavior.decileLiftOracleSql,
    "stream_decile_lift" -> operators.Behavior.decileLiftOracleSql,
    "stream_rfm_segments" -> operators.Behavior.rfmSegmentsOracleSql,
    "stream_user_revenue_percentile" -> operators.Behavior.userRevenuePercentileOracleSql,
    "stream_engagement_gini" -> operators.Behavior.engagementGiniOracleSql,
    "stream_heaps_law_fit" -> operators.CorpusQa.heapsLawFitOracleSql,
    "pivot_type_dow" -> operators.Olap.pivotTypeDowOracleSql,
    "link_prediction" -> operators.Graph.linkPredictionOracleSql(),
    "changepoint_cusum" -> operators.Behavior.changepointCusumOracleSql,
    "rfm_segments" -> operators.Behavior.rfmSegmentsOracleSql,
    "item_similarity" -> operators.Behavior.itemSimilarityOracleSql,
    "item_cf_recommend" -> operators.Behavior.itemCfRecommendOracleSql,
    "engagement_gini" -> operators.Behavior.engagementGiniOracleSql,
    "containment_pairs" -> operators.TextOps.containmentOracleSql(),
    "metric_correlations" -> operators.Behavior.metricCorrelationsOracleSql,
    "mode_daily_item" -> operators.Behavior.modeDailyItemOracleSql,
    "char_ngram_profile" -> operators.TextOps.charNgramProfileOracleSql,
    "bpe_merge_candidates" -> operators.TextOps.bpeMergeCandidatesOracleSql,
    "sentence_stats" -> operators.TextOps.sentenceStatsOracleSql,
    "source_drift_tv" -> operators.TextOps.sourceDriftTvOracleSql,
    "user_lifecycle" -> operators.Behavior.userLifecycleOracleSql,
    "interevent_histogram" -> operators.Behavior.intereventHistogramOracleSql,
    "rank_delta_daily" -> operators.Behavior.rankDeltaDailyOracleSql,
    "ewma_daily" -> operators.Behavior.ewmaDailyOracleSql,
    "pareto_users" -> operators.Behavior.paretoUsersOracleSql,
    "boxplot_stats" -> operators.Behavior.boxplotStatsOracleSql,
    "ab_welch_ttest" -> operators.Behavior.abWelchTtestOracleSql,
    "ab_cuped" -> operators.Experiments.abCupedOracleSql,
    "ab_srm_check" -> operators.Experiments.abSrmOracleSql,
    "k_anonymity_check" -> operators.Experiments.kAnonymityOracleSql,
    "offpolicy_eval" -> operators.Experiments.offpolicyOracleSql,
    "qte_deciles" -> operators.Experiments.qteOracleSql,
    "stratified_ate" -> operators.Experiments.stratifiedAteOracleSql,
    "ab_peeking_curve" -> operators.Experiments.abPeekingOracleSql,
    "conformal_interval" -> operators.Experiments.conformalOracleSql,
    "hill_tail_index" -> operators.Stats.hillOracleSql,
    "rolling_retention" -> operators.Retention.rollingRetentionOracleSql,
    "peak_concurrency" -> operators.Retention.peakConcurrencyOracleSql(),
    "acf_daily" -> operators.Timeseries.acfDailyOracleSql,
    "rolling_corr_daily" -> operators.Timeseries.rollingCorrDailyOracleSql,
    "survival_km" -> operators.Timeseries.survivalKmOracleSql,
    "code_prose_stats" -> operators.CorpusQa.codeProseStatsOracleSql,
    "tokenizer_fertility" -> operators.CorpusQa.tokenizerFertilityOracleSql,
    "dedup_cluster_sizes" -> operators.CorpusQa.dedupClusterSizesOracleSql(),
    "bfs_distances" -> operators.Graph.bfsDistancesOracleSql(),
    "clustering_coefficient" -> operators.Graph.clusteringCoefficientOracleSql,
    "embedding_covariance" -> operators.VectorOps.embeddingCovarianceOracleSql,
    "winsorized_stats" -> operators.Behavior.winsorizedStatsOracleSql,
    "embedding_outliers" -> operators.VectorOps.embeddingOutliersOracleSql,
    "url_canonicalize" -> operators.CorpusQa.urlCanonicalizeOracleSql,
    "degree_assortativity" -> operators.Graph.degreeAssortativityOracleSql,
    "graph_components" -> operators.Graph.graphComponentsOracleSql,
    "scc_items" -> operators.Graph.sccItemsOracleSql,
    "time_weighted_value" -> operators.Timeseries.timeWeightedValueOracleSql,
    "user_revenue_percentile" -> operators.Behavior.userRevenuePercentileOracleSql,
    "boilerplate_score" -> operators.CorpusQa.boilerplateScoreOracleSql,
    "dataset_card" -> operators.CorpusQa.datasetCardOracleSql,
    "hard_negatives" -> operators.VectorOps.hardNegativesOracleSql(),
    "ma_crossover" -> operators.Timeseries.maCrossoverOracleSql,
    "asof_join_tolerance" -> operators.Engagement.asofJoinToleranceOracleSql(),
    "type_mix_drift" -> operators.Timeseries.typeMixDriftOracleSql,
    "item_adoption" -> operators.Behavior.itemAdoptionOracleSql,
    "script_detect" -> operators.CorpusQa.scriptDetectOracleSql,
    "holt_linear_trend" -> operators.Timeseries.holtLinearTrendOracleSql,
    "graph_modularity" -> operators.Graph.graphModularityOracleSql(),
    "neyman_allocation" -> operators.Stats.neymanAllocationOracleSql,
    "fano_factor_daily" -> operators.Stats.fanoFactorDailyOracleSql,
    "type_reach_ci" -> operators.Stats.typeReachCiOracleSql,
    "spearman_daily_pairs" -> operators.Stats.spearmanDailyPairsOracleSql,
    "benford_first_digit" -> operators.Stats.benfordFirstDigitOracleSql,
    "transition_entropy" -> operators.Stats.transitionEntropyOracleSql,
    "runs_test_daily" -> operators.Stats.runsTestDailyOracleSql,
    "props_key_census" -> operators.Stats.propsKeyCensusOracleSql,
    "kendall_tau_daily" -> operators.Stats.kendallTauDailyOracleSql,
    "ljung_box_daily" -> operators.Timeseries.ljungBoxDailyOracleSql,
    "markov_stationary" -> operators.Stats.markovStationaryOracleSql(),
    "dow_residual_outliers" -> operators.Stats.dowResidualOutliersOracleSql,
    "mutual_info_type_dow" -> operators.Stats.mutualInfoTypeDowOracleSql,
    "absorption_steps" -> operators.Stats.absorptionStepsOracleSql(),
    "funnel_excluding" -> operators.Engagement.funnelExcludingOracleSql,
    "bot_burst_screen" -> operators.Behavior.botBurstScreenOracleSql,
    "jarque_bera_daily" -> operators.Timeseries.jarqueBeraDailyOracleSql,
    "theil_sen_trend" -> operators.Timeseries.theilSenTrendOracleSql,
    "anova_f_cents" -> operators.Stats.anovaFCentsOracleSql,
    "kruskal_wallis" -> operators.Stats.kruskalWallisOracleSql,
    "levene_brown_forsythe" -> operators.Stats.leveneBrownForsytheOracleSql,
    "friedman_daily" -> operators.Stats.friedmanDailyOracleSql,
    "page_hinkley_daily" -> operators.Stats.pageHinkleyDailyOracleSql,
    "grubbs_daily" -> operators.Stats.grubbsDailyOracleSql,
    "bootstrap_mean_ci" -> operators.Sampling.bootstrapMeanCiOracleSql(),
    "cms_top_items" -> operators.Sketches.cmsTopItemsOracleSql,
    "seasonal_strength" -> operators.Stats.seasonalStrengthOracleSql,
    "wilcoxon_signed_rank" -> operators.Stats.wilcoxonSignedRankOracleSql,
    "user_type_entropy" -> operators.Behavior.userTypeEntropyOracleSql,
    "cross_correlation_daily" -> operators.Timeseries.crossCorrelationDailyOracleSql(),
    "session_type_affinity" -> operators.Behavior.sessionTypeAffinityOracleSql,
    "pacf_daily" -> operators.Timeseries.pacfDailyOracleSql(),
    "first_passage_matrix" -> operators.Stats.firstPassageMatrixOracleSql(),
    "burstiness_index" -> operators.Behavior.burstinessIndexOracleSql,
    "source_jsonl_docs" -> sources.Formats.jsonlDocsRoundtripOracleSql,
    "source_csv_lineitem" -> sources.Formats.csvLineitemRoundtripOracleSql,
    "source_orc_events" -> sources.Formats.orcEventsRoundtripOracleSql,
    "capture_recapture" -> operators.Retention.captureRecaptureOracleSql,
    "sessions_per_user" -> operators.Retention.sessionsPerUserOracleSql(),
    "degree_powerlaw_fit" -> operators.Graph.degreePowerlawFitOracleSql,
    "session_duration" -> operators.Retention.sessionDurationOracleSql(),
    "vocab_coverage_curve" -> operators.TextOps.vocabCoverageCurveOracleSql,
    "embedding_pca_power" -> operators.VectorOps.embeddingPcaPowerOracleSql,
    "chi2_type_dow" -> operators.Stats.chi2TypeDowOracleSql,
    "mann_whitney_u" -> operators.Stats.mannWhitneyUOracleSql,
    "ks_doclen_sources" -> operators.Stats.ksDoclenSourcesOracleSql,
    "wasserstein_doclen" -> operators.Stats.wassersteinDoclenOracleSql,
    "psi_value_drift" -> operators.Stats.psiValueDriftOracleSql,
    "cramers_v_source_lang" -> operators.Stats.cramersVSourceLangOracleSql,
    "heaps_law_fit" -> operators.CorpusQa.heapsLawFitOracleSql,
    "url_filter" -> operators.CorpusQa.urlFilterOracleSql,
    "sequence_count" -> operators.Sequences.sequenceCountOracleSql,
    "funnel_strict_order" -> operators.Sequences.funnelStrictOracleSql,
    "funnel_any_order" -> operators.Sequences.funnelAnyOrderOracleSql,
    "interval_coalesce" -> operators.Intervals.intervalCoalesceOracleSql,
    "attribution_linear" -> operators.MultiTouch.linearOracleSql,
    "attribution_position" -> operators.MultiTouch.positionOracleSql,
    "attribution_time_decay" -> operators.MultiTouch.timeDecayOracleSql,
    "zipf_slope" -> operators.TextOps.zipfSlopeOracleSql,
    "dup_rate_by_source" -> operators.TextOps.dupRateBySourceOracleSql,
    "ngram_novelty" -> operators.TextOps.ngramNoveltyOracleSql,
    "source_lang_entropy" -> operators.TextOps.sourceLangEntropyOracleSql,
    "term_pmi_top" -> operators.TextOps.termPmiOracleSql,
    "seasonality_profile" -> operators.Behavior.seasonalityProfileOracleSql,
    "cdc_scd2" -> operators.Engagement.cdcScd2OracleSql,
    "doclen_histogram" -> operators.TextOps.doclenHistogramOracleSql,
    "percentile_bands_daily" -> operators.Behavior.percentileBandsDailyOracleSql,
    "langid_confusion" -> operators.TextOps.langidConfusionOracleSql,
    "centroid_drift" -> operators.VectorOps.centroidDriftOracleSql,
    "type_user_overlap" -> operators.Behavior.typeUserOverlapOracleSql,
    "revenue_hhi" -> operators.Behavior.revenueHhiOracleSql,
    "vocab_coverage_by_source" -> operators.TextOps.vocabCoverageOracleSql,
    "cross_source_dups" -> operators.TextOps.crossSourceDupsOracleSql,
    "label_centroids" -> operators.VectorOps.labelCentroidsOracleSql,

    // the bounded-heap stage-2 equals this nested-window formulation
    "topk_diversified" ->
      """WITH c AS (SELECT event_id, user_id, event_type, value,
        |                  row_number() OVER (PARTITION BY event_type, user_id
        |                                     ORDER BY value DESC, event_id) AS ur
        |           FROM events),
        |r AS (SELECT event_type, event_id, user_id, value,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY value DESC, event_id) AS rank
        |      FROM c WHERE ur <= 2)
        |SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id, user_id,
        |       round(value, 2) AS value
        |FROM r WHERE rank <= 10 ORDER BY event_type, rank""".stripMargin,

    "ngram_lm_score" -> operators.TextOps.ngramLmScoreOracleSql,

    // windowFunnel(24h) gate: every later stage within 24 h of the
    // user's first view
    "funnel_conversion_windowed" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click, min(v.t_view) AS tv
        |      FROM e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        |                   AND e.ts <= v.t_view + INTERVAL 24 HOUR
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        |                   AND e.ts <= c.tv + INTERVAL 24 HOUR
        |      WHERE e.event_type = 'purchase' GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT count(v.t_view) AS reached_view, count(c.t_click) AS reached_click,
        |       count(p.t_purchase) AS reached_purchase, count(*) AS n_users
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |       LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id""".stripMargin,

    "word_entropy" ->
      """WITH counts AS (
        |  SELECT doc_id, u.w AS w, count(*) AS c
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), unnest(ws) AS u(w)
        |  GROUP BY 1, 2),
        |wn AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM counts)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_words,
        |       round(-sum((c / n) * log2(c / n)), 4) AS entropy
        |FROM wn GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "retention_cohorts" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |ch AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT strftime(ch.cohort_day, '%Y-%m-%d') AS cohort_day,
        |       CAST(datediff('day', ch.cohort_day, a.day) AS BIGINT) AS k,
        |       count(*) AS n_active
        |FROM a JOIN ch ON a.user_id = ch.user_id
        |WHERE datediff('day', ch.cohort_day, a.day) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "enrich_events" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment AS segment,
        |       round(e.value / 1000.0, 6) AS engagement_seconds,
        |       CASE WHEN c.c_acctbal > 0 THEN round(e.value / c.c_acctbal, 6) END AS engagement_pct
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "hop_window_agg" ->
      """SELECT w_start, event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM (SELECT make_timestamp(((CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 300) * 300 - k * 300) * 1000000) AS w_start,
        |             event_type, value
        |      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks) t
        |GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    // integer-cents aggregation: order-independent exact sum, single
    // int-division at the end — see Engagement.tumbleWindowAgg
    "tumble_window_agg" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / (count(*) * 100.0) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "session_window_agg" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id FROM events),
        |x AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |                          OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM x)
        |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
        |       count(*) AS n_events, round(sum(value), 2) AS total
        |FROM y GROUP BY user_id, sess ORDER BY user_id, s_start""".stripMargin,

    "leaderboard_topn" ->
      """SELECT rank, user_id, score, n_events
        |FROM (SELECT user_id, round(sum(value), 2) AS score, count(*) AS n_events,
        |             row_number() OVER (ORDER BY sum(value) DESC, user_id) AS rank
        |      FROM events GROUP BY user_id) t
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "event_router" ->
      """SELECT CASE WHEN event_type = 'purchase' THEN 'billing'
        |            WHEN event_type = 'signup' THEN 'crm'
        |            WHEN event_type = 'error' THEN 'ops'
        |            ELSE 'analytics' END AS route,
        |       count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "json_extract_props" ->
      """SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |       count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // orders are pre-compacted to one row per (custkey, date) with a
    // deterministic tie-break, so ASOF's pick is unique in both engines
    "asof_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey,
        |                  max_by(o_totalprice, o_orderkey) AS last_totalprice
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id,
        |       o.last_orderkey, o.o_orderdate AS last_orderdate,
        |       round(o.last_totalprice, 2) AS last_totalprice
        |FROM events e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    // forward as-of: DuckDB's native ASOF with the inequality
    // flipped — an independent formulation of the Spark union-window
    "asof_join_forward" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS next_orderkey,
        |                  max_by(o_totalprice, o_orderkey) AS next_totalprice
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id,
        |       o.next_orderkey, o.o_orderdate AS next_orderdate,
        |       round(o.next_totalprice, 2) AS next_totalprice
        |FROM events e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    // nearest: both native ASOF directions joined, closer side wins,
    // exact-microsecond distances, ties backward; forward is STRICT
    // (an order exactly at the event's ts belongs to the backward
    // side at distance 0)
    "asof_join_nearest" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS okey
        |           FROM orders GROUP BY 1, 2),
        |e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
        |b AS (SELECT e.event_id, e.ts, e.user_id, o.okey AS bk, o.o_orderdate AS bd
        |      FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
        |f AS (SELECT e.event_id, o.okey AS fk, o.o_orderdate AS fd
        |      FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts < o.o_orderdate),
        |j AS (SELECT b.event_id, b.ts, b.user_id, bk, bd, fk, fd,
        |             epoch_us(b.ts) - epoch_us(bd) AS db,
        |             epoch_us(fd) - epoch_us(b.ts) AS df
        |      FROM b JOIN f USING (event_id))
        |SELECT event_id, ts, user_id,
        |       CASE WHEN bd IS NULL AND fd IS NULL THEN NULL
        |            WHEN bd IS NULL THEN fk WHEN fd IS NULL THEN bk
        |            WHEN db <= df THEN bk ELSE fk END AS nearest_orderkey,
        |       CASE WHEN bd IS NULL AND fd IS NULL THEN NULL
        |            WHEN bd IS NULL THEN 'f' WHEN fd IS NULL THEN 'b'
        |            WHEN db <= df THEN 'b' ELSE 'f' END AS direction,
        |       CAST(CASE WHEN bd IS NULL AND fd IS NULL THEN NULL
        |            WHEN bd IS NULL THEN df WHEN fd IS NULL THEN db
        |            ELSE least(db, df) END AS BIGINT) AS dist_us
        |FROM j ORDER BY event_id""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, revenue, o_orderdate, o_orderpriority
        |FROM (SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |             o.o_orderdate, o.o_orderpriority
        |      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |           JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |      WHERE c.c_mktsegment = 'BUILDING'
        |        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |        AND l.l_shipdate > TIMESTAMP '1998-01-01'
        |      GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority) t
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |     JOIN customer ON c_nationkey = n_nationkey
        |     JOIN orders ON o_custkey = c_custkey
        |     JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       row_number() OVER w AS rn,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "distinct_daily" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |       count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "rollup_sales" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "cube_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "grouping_sets_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "semi_anti_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "percentile_stats" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
        |       round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price,
        |       round(min(l_extendedprice), 2) AS min_price,
        |       round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "skew_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // bucketing is result-invisible — the plain join, as for the
    // salted variant (same aggregate over the same join)
    "bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "bloom_filtered_join" -> operators.Olap.bloomFilteredJoinOracleSql(),

    "topk_per_group" -> operators.Engagement.topkPerGroupOracleSql(),

    "pivot_sales" -> operators.Olap.pivotSalesOracleSql,

    "range_join_agg" ->
      """SELECT e.event_id, count(f.event_id) AS n_nearby,
        |       round(coalesce(sum(f.value), 0), 2) AS nearby_value
        |FROM events e LEFT JOIN events f
        |  ON f.event_id != e.event_id
        | AND f.ts >= e.ts - INTERVAL 300 SECOND
        | AND f.ts <= e.ts + INTERVAL 300 SECOND
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "word_jaccard_pairs" ->
      """WITH d AS (SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS words FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |             round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
        |                   / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))), 4) AS jaccard
        |      FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.75 ORDER BY doc_a, doc_b""".stripMargin,

    "lang_id" -> operators.TextOps.langIdOracleSql,

    "corpus_filter" -> operators.TextOps.corpusFilterOracleSql(),
    // tombstone face: the SAME composed SQL over the live corpus —
    // every `FROM documents` rewritten to a filtered inline subquery
    // (DuckDB rejects a CTE shadowing its own source table, and
    // schema-qualifying depends on how the harness registers views)
    "stream_corpus_filter_tombstone" ->
      operators.TextOps.corpusFilterOracleSql().replace("FROM documents",
        "FROM (SELECT * FROM documents WHERE NOT (doc_id % 7 = 3)) AS documents"),

    // corpus assembly — all keyed off the same md5(doc_id:salt) 32-bit
    // hash, which DuckDB computes bit-identically
    "train_test_split" ->
      """WITH h AS (SELECT doc_id, source,
        |                  ('0x' || substr(md5(doc_id || ':graft'), 1, 8))::UBIGINT % 100 AS hv
        |           FROM documents)
        |SELECT doc_id, source,
        |       CASE WHEN hv < 5 THEN 'test' WHEN hv < 10 THEN 'val' ELSE 'train' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,

    "stratified_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5(doc_id || ':graft'), 1, 8))::UBIGINT / 4294967296.0
        |      < (CAST(substr(source, 4) AS INT) + 1) / 21.0
        |ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |                  ('0x' || substr(md5(doc_id || ':graft'), 1, 8))::UBIGINT % 16 AS bucket,
        |                  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |o AS (SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, n_tokens,
        |             CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |      FROM t)
        |SELECT doc_id, bucket, n_tokens, start_offset,
        |       CAST(start_offset // 2048 AS BIGINT) AS chunk_first,
        |       CAST((start_offset + greatest(n_tokens, 1) - 1) // 2048 AS BIGINT) AS chunk_last,
        |       CAST((start_offset + greatest(n_tokens, 1) - 1) // 2048 - start_offset // 2048 + 1 AS BIGINT) AS n_chunks
        |FROM o ORDER BY doc_id""".stripMargin,

    "ngram_contamination" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |                  ('0x' || substr(md5(doc_id || ':graft'), 1, 8))::UBIGINT % 100 AS hv
        |           FROM documents),
        |g AS (SELECT doc_id, hv,
        |             list_distinct(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
        |               i -> array_to_string(w[i:i+7], ' '))) AS grams
        |      FROM d),
        |eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE hv < 10),
        |cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE hv >= 10)
        |SELECT cg.doc_id, CAST(count(DISTINCT cg.gram) AS BIGINT) AS n_shared_ngrams
        |FROM cg JOIN eg ON cg.gram = eg.gram
        |GROUP BY cg.doc_id ORDER BY cg.doc_id""".stripMargin,

    "doc_chunking" -> operators.Sampling.docChunkingOracleSql(),
    "decontaminate" -> operators.Sampling.decontaminateOracleSql(),
    "decontaminate_fuzzy" -> operators.Sampling.decontaminateFuzzyOracleSql(),
    "domain_frequency_cap" -> operators.Sampling.domainFrequencyCapOracleSql(),
    "corpus_mix" -> operators.Sampling.corpusMixOracleSql(),
    "corpus_mix_temperature" -> operators.Sampling.corpusMixTemperatureOracleSql(),

    "text_quality" -> operators.TextOps.textQualityOracleSql,
    "gopher_quality_gates" -> operators.TextOps.gopherGatesOracleSql,
    "text_repetition" -> operators.TextOps.textRepetitionOracleSql,
    "text_redact" -> operators.TextOps.textRedactOracleSql,
    "dsir_importance" -> operators.CorpusQa.dsirOracleSql(),
    // tombstone face: same SQL over the live corpus (the
    // corpus_filter_tombstone subquery rewrite)
    "stream_dsir_tombstone" -> operators.CorpusQa.dsirOracleSql().replace(
      "FROM documents",
      "FROM (SELECT * FROM documents WHERE NOT (doc_id % 7 = 3)) AS documents"),
    "pii_density" -> operators.TextOps.piiDensityOracleSql,
    "token_rarity" -> operators.TextOps.tokenRarityOracleSql(),
    "tfidf_top_terms" -> operators.TextOps.tfidfTopTermsOracleSql(),

    "token_count" ->
      """WITH t AS (SELECT doc_id, length(text) AS n,
        |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |                  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens
        |           FROM documents)
        |SELECT doc_id, ws_tokens, bpe_tokens,
        |       CASE WHEN bpe_tokens > 0 THEN round(CAST(n AS DOUBLE) / bpe_tokens, 4) END AS chars_per_token
        |FROM t ORDER BY doc_id""".stripMargin,

    "doc_fingerprint" -> operators.TextOps.docFingerprintOracleSql,
    "winnow_pairs" -> operators.Winnow.winnowPairsOracleSql,
    "edit_distance_pairs" -> operators.TextOps.editDistanceOracleSql(),
    "bm25_topk" -> operators.TextOps.bm25OracleSql(),
    "hybrid_rrf_topk" -> operators.VectorOps.hybridRrfOracleSql(),
    // tombstone face: oracle = the SAME fusion SQL over the live
    // (retraction-compacted) corpus — the 10a' pattern applied to a
    // serving index
    "stream_hybrid_rrf_tombstone" ->
      operators.VectorOps.hybridRrfOracleSql(live = "NOT ({col} % 7 = 3)"),
    "sample_k_per_group" -> operators.Sampling.sampleKPerGroupOracleSql(),
    "weighted_sample" -> operators.Sampling.weightedSampleOracleSql(),

    // same canonicalization pipeline: NFC -> lower -> \s-run collapse
    // (the kernel's whitespace set IS the RE2 \s class)
    "text_normalize" ->
      """SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars_norm
        |FROM (SELECT doc_id,
        |             trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_text
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "dedup_substring" -> operators.Dedup.dedupSubstringOracleSql(),
    "dedup_substring_remove" -> operators.Dedup.dedupSubstringRemoveOracleSql(),
    "dedup_paragraph" -> operators.Dedup.dedupParagraphOracleSql(),

    "dedup_minhash_lsh" -> operators.Dedup.minHashLshOracleSql(),

    "dedup_incremental" -> operators.Dedup.dedupIncrementalOracleSql(),

    // deterministic (pigeonhole-exact) — full fingerprint recompute in
    // DuckDB, see Dedup.simHashOracleSql's arithmetic notes
    "dedup_simhash" -> operators.Dedup.simHashOracleSql(),
    "dedup_simhash_clusters" -> operators.Dedup.simHashClustersOracleSql(),
    "decontaminate_semantic" -> operators.VectorOps.decontaminateSemanticOracleSql(),
    "semantic_clusters" -> operators.VectorOps.semanticClustersOracleSql(),

    "dedup_clusters" -> operators.Dedup.dedupClustersOracleSql(),
    // alternating-star components converge to the same (doc, min-id
    // label) fixpoint as min-label propagation — identical oracle
    "dedup_clusters_star" -> operators.Dedup.dedupClustersOracleSql(),

    "multimodal_meta" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents)
        |SELECT doc_id, n_bytes, n_bytes % 640 + 1 AS width, (n_bytes * 7) % 480 + 1 AS height,
        |       CASE WHEN n_bytes % 3 = 0 THEN 'png' WHEN n_bytes % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format
        |FROM m ORDER BY doc_id""".stripMargin,

    // mirrors the deterministic stub kernel in Multimodal.decodeKernel
    // byte-for-byte (test corpus is pure ASCII, so ascii() = byte value)
    "multimodal_decode" ->
      """WITH m AS (SELECT doc_id,
        |                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |                  ascii(substr(text, 1, 1)) AS b0,
        |                  ascii(substr(text, 2, 1)) AS b1
        |           FROM documents)
        |SELECT doc_id, n_bytes,
        |       CAST((b0 * 256 + b1) % 1920 + 1 AS INT) AS width,
        |       CAST((b1 * 256 + b0) % 1080 + 1 AS INT) AS height,
        |       CASE WHEN n_bytes % 3 = 0 THEN 'png' WHEN n_bytes % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format,
        |       CAST(n_bytes % 64 + 1 AS INT) AS n_frames
        |FROM m ORDER BY doc_id""".stripMargin,

    // stub decode dims (b0/b1 formulas) + REAL integer resize /
    // frame-sample / byte-feature math, mirrored exactly
    "multimodal_pipeline" ->
      """WITH m AS (SELECT doc_id, text,
        |                  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |                  ascii(substr(text, 1, 1)) AS b0,
        |                  ascii(substr(text, 2, 1)) AS b1
        |           FROM documents),
        |d AS (SELECT doc_id, text, n_bytes,
        |             CAST((b0 * 256 + b1) % 1920 + 1 AS BIGINT) AS w,
        |             CAST((b1 * 256 + b0) % 1080 + 1 AS BIGINT) AS h,
        |             CAST(n_bytes % 64 + 1 AS BIGINT) AS n_frames,
        |             least(4, CAST(n_bytes % 64 + 1 AS BIGINT)) AS k
        |      FROM m)
        |SELECT doc_id, n_bytes,
        |       CAST(CASE WHEN w >= h THEN 224 ELSE greatest(1, (w * 224) // h) END AS INT) AS fit_w,
        |       CAST(CASE WHEN w >= h THEN greatest(1, (h * 224) // w) ELSE 224 END AS INT) AS fit_h,
        |       array_to_string(list_transform(range(0, k), i -> CAST((i * n_frames) // k AS VARCHAR)), ',') AS frame_offsets,
        |       CAST(COALESCE(list_sum(list_transform(range(1, CAST(len(text) AS BIGINT) + 1),
        |              i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) * 1000 // n_bytes AS BIGINT) AS mean_byte_milli,
        |       CAST(COALESCE(list_max(list_transform(range(1, CAST(len(text) AS BIGINT) + 1),
        |              i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS INT) AS max_byte
        |FROM d ORDER BY doc_id""".stripMargin,

    "embedding_neardup" ->
      """WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |                  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS c
        |           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, round(c, 4) AS cosine FROM p WHERE c >= 0.3 ORDER BY vec_a, vec_b""".stripMargin,

    "ann_topk" ->
      """SELECT query_id, neighbor_id, rank, cosine
        |FROM (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |             row_number() OVER (PARTITION BY a.vec_id
        |               ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id) AS rank,
        |             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
        |      FROM embeddings a JOIN embeddings b ON a.vec_id < 10 AND b.vec_id >= 10) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
  )
}
