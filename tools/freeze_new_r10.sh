#!/usr/bin/env bash
# Freeze pass for round-10's new entries (canary-bracketed fresh-JVM
# medians of 3, quiet box): the two rank-window streaming twins from
# the verdict-task wave (stream_decile_lift, stream_router_http) and
# the round-10 additions wave (stream_rfm_segments,
# stream_user_revenue_percentile, stream_engagement_gini,
# stream_heaps_law_fit).
# Usage: tools/freeze_new_r10.sh <outFile>
set -u
OUT="${1:-/tmp/freeze_new_r10.txt}"
SF=/root/testdata/sf0.1
cd /root/repo

echo "# freeze_new_r10 $(date -u +%FT%TZ) uptime: $(uptime)" >> "$OUT"
echo "## canary pre" >> "$OUT"
for r in 1 2 3; do tools/scale_run.sh "$SF" 32 markov_stationary >> "$OUT"; done
for pass in 1 2 3; do
  echo "## pass $pass $(date -u +%T)" >> "$OUT"
  tools/scale_run.sh "$SF" 32 stream_decile_lift stream_router_http \
    stream_rfm_segments stream_user_revenue_percentile \
    stream_engagement_gini stream_heaps_law_fit >> "$OUT"
done
echo "## canary post" >> "$OUT"
for r in 1 2 3; do tools/scale_run.sh "$SF" 32 markov_stationary >> "$OUT"; done
echo "# freeze_new_r10 done $(date -u +%FT%TZ)" >> "$OUT"
