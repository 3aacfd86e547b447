#!/usr/bin/env bash
# Round-10 class re-freeze (round-9 verdict task 2): re-stamp EVERY
# still-stale pre-round-6 frozen row (round-3 in-session numbers +
# round-4/5 additions, minus rows already re-frozen in rounds 6-9) as
# fresh-JVM medians in ONE pass, canary-bracketed, instead of working
# the flag tail round by round.
#
# Methodology = the round-9 re-freeze exactly: tools/scale_run.sh per
# (query, run) — one fresh JVM each, Bench.isolatedRun flags, sf0.1,
# 32 cores, quiet box (check uptime first). 3 passes over the full
# list (pass-major, so a transient load spike cannot hit all three
# runs of one query), with a 3-run canary (markov_stationary) before,
# between and after the passes.
#
# Usage: tools/refreeze.sh <outFile>
set -u
OUT="${1:-/tmp/refreeze_results.txt}"
SFDIR=/root/testdata/sf0.1
CPUS=32
cd /root/repo

QUERIES="dedup_clusters stream_dedup_incremental stream_funnel dedup_incremental \
dedup_minhash_lsh funnel_conversion stream_interval_join stream_cdc_with_deletes \
stream_cdc_compact stream_router embedding_neardup stream_dedup stream_hop_agg \
stream_leaderboard stream_enrich dedup_simhash q3_top_orders percentile_stats_approx \
q5_region_revenue running_total asof_join percentile_stats text_quality ann_lsh_topk \
ann_ivf_topk rollup_sales cube_sales lang_id json_extract_props hop_window_agg \
distinct_daily enrich_events multimodal_meta token_count tumble_window_agg ann_topk \
pack_sequences cdc_with_deletes q1_pricing_summary cdc_latest_by_key \
approx_distinct_daily semi_anti_customers multimodal_pipeline dedup_exact event_router \
stratified_sample multimodal_decode doc_fingerprint train_test_split dedup_clusters_star \
dedup_semantic text_repetition pivot_sales bloom_filtered_join topk_per_group \
dedup_substring dedup_substring_remove ann_pq_topk stream_hop_append tfidf_top_terms \
bucketed_join text_redact token_rarity doc_chunking stream_attribution ngram_lm_score \
anomaly_zscore topk_diversified histogram_value lag_features event_transitions \
attribution_last_touch zorder_layout decayed_leaderboard text_normalize \
funnel_conversion_windowed word_entropy dedup_paragraph timeseries_fill corpus_mix \
hll_sketch_daily pagerank_items triangle_count attribution_first_touch top_paths \
key_skew_stats q17_small_quantity open_orders_daily stream_moments edit_distance_pairs \
rolling_distinct_users profile_columns q8_market_share bm25_topk incremental_rollup \
sample_k_per_group snapshot_diff trending_daily unpivot_metrics events_sessionized \
cohort_ltv embedding_norms frequent_sequences q19_discounted_revenue activity_heatmap \
conversion_lag_stats dau_wau_mau session_kpis knn_classify decontaminate hits_scores"

echo "# refreeze $(date -u +%FT%TZ) uptime: $(uptime)" >> "$OUT"
canary() {
  echo "## canary $1" >> "$OUT"
  for r in 1 2 3; do
    tools/scale_run.sh "$SFDIR" "$CPUS" markov_stationary >> "$OUT"
  done
}
canary pre
for pass in 1 2 3; do
  echo "## pass $pass $(date -u +%T)" >> "$OUT"
  tools/scale_run.sh "$SFDIR" "$CPUS" $QUERIES >> "$OUT"
  [ "$pass" = 2 ] && canary mid
done
canary post
echo "# refreeze done $(date -u +%FT%TZ)" >> "$OUT"
