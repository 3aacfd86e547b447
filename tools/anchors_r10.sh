#!/usr/bin/env bash
# Round-10 100x anchors (round-9 verdict task 6): the round-9 second
# wave measured at 100x as canary-bracketed fresh-JVM medians of 3,
# plus a 5-run re-measure of the k_core anchor (its round-9 3-run
# spread [27.7, 164.1, 88.2] was too wide to quote a decade ratio).
# Quiet box required.
# Usage: tools/anchors_r10.sh <outFile>
set -u
OUT="${1:-/tmp/anchors_r10.txt}"
cd /root/repo
D100=/tmp/graft_scale100
SF=/root/testdata/sf0.1

echo "# anchors_r10 $(date -u +%FT%TZ) uptime: $(uptime)" >> "$OUT"
echo "## canary pre (sf0.1)" >> "$OUT"
for r in 1 2 3; do tools/scale_run.sh "$SF" 32 markov_stationary >> "$OUT"; done
for q in markov_attribution heavy_changers cms_top_items nb_lang_classifier stream_cdc_schema_drift; do
  echo "## 100x $q" >> "$OUT"
  for r in 1 2 3; do tools/scale_run.sh "$D100" 32 "$q" >> "$OUT"; done
done
echo "## 100x k_core (5 runs - round-9 spread adjudication)" >> "$OUT"
for r in 1 2 3 4 5; do tools/scale_run.sh "$D100" 32 k_core >> "$OUT"; done
echo "## canary post (sf0.1)" >> "$OUT"
for r in 1 2 3; do tools/scale_run.sh "$SF" 32 markov_stationary >> "$OUT"; done
echo "# anchors_r10 done $(date -u +%FT%TZ)" >> "$OUT"
