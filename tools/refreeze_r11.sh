#!/usr/bin/env bash
# Round-11 measurement session (round-10 verdict tasks 1-3, combined):
#   1. Complete the class re-freeze: pass 1 finished (67 queries the
#      round-10 session never reached) + passes 2-3 over the full
#      111-query stale class. Existing pass-1 rows are seeded from
#      /tmp/refreeze_results.txt so every query ends with >= 3
#      fresh-JVM samples.
#   2. First-freeze pass (3 runs each) for the 42 round-9/10 entries
#      that have NO frozen row yet — they are invisible to the
#      bench's self-adjudication until they do.
#   3. The 100x anchors (tools/anchors_r10.sh wave) ride separately.
# Canary (markov_stationary) bracketed pre / between phases / post.
# Quiet box required. Usage: tools/refreeze_r11.sh <outFile>
set -u
OUT="${1:-/tmp/refreeze_r11.txt}"
SFDIR=/root/testdata/sf0.1
CPUS=32
cd /root/repo

FULL=$(cat /tmp/r11_full_list.txt)
P1MISS=$(cat /tmp/r11_pass1_missing.txt)
NEW="approx_top_items bootstrap_mean_ci burstiness_index cms_top_items \
decile_lift decontaminate_fuzzy domain_frequency_cap first_passage_matrix \
friedman_daily grubbs_daily heavy_changers jackknife_ratio kruskal_wallis \
levene_brown_forsythe markov_attribution nb_lang_classifier page_hinkley_daily \
pivot_type_dow stream_assortativity stream_bootstrap stream_cdc_schema_drift \
stream_cms stream_decile_lift stream_engagement_gini stream_first_passage \
stream_friedman stream_grubbs stream_heaps_law_fit stream_heavy_changers \
stream_jackknife stream_k_core stream_kruskal stream_levene \
stream_markov_attribution stream_nb_lang stream_page_hinkley \
stream_pivot_type_dow stream_rfm_segments stream_router_http \
stream_router_jdbc stream_topk_per_group stream_user_revenue_percentile"

# Seed the round-10 pass-1 rows (44 queries) so medians see them.
grep -hE '^[a-z0-9_]+ [0-9]' /tmp/refreeze_results.txt >> "$OUT"

echo "# refreeze_r11 $(date -u +%FT%TZ) uptime: $(uptime)" >> "$OUT"
canary() {
  echo "## canary $1" >> "$OUT"
  for r in 1 2 3; do
    tools/scale_run.sh "$SFDIR" "$CPUS" markov_stationary >> "$OUT"
  done
}
canary pre
echo "## pass 1 completion $(date -u +%T)" >> "$OUT"
tools/scale_run.sh "$SFDIR" "$CPUS" $P1MISS >> "$OUT"
canary mid1
for pass in 2 3; do
  echo "## pass $pass $(date -u +%T)" >> "$OUT"
  tools/scale_run.sh "$SFDIR" "$CPUS" $FULL >> "$OUT"
  [ "$pass" = 2 ] && canary mid2
done
canary mid3
for pass in 1 2 3; do
  echo "## new-freeze pass $pass $(date -u +%T)" >> "$OUT"
  tools/scale_run.sh "$SFDIR" "$CPUS" $NEW >> "$OUT"
done
canary post
echo "# refreeze_r11 done $(date -u +%FT%TZ)" >> "$OUT"
