#!/usr/bin/env bash
# Round-11 third-stint first-freeze: 3 fresh-JVM passes over the 22
# new entries, canary (markov_stationary) bracketed pre/mid/post.
# Usage: tools/freeze_r11s3.sh <outFile>
set -u
OUT="${1:-/tmp/freeze_r11s3.txt}"
SFDIR=/root/testdata/sf0.1
CPUS=32
cd /root/repo
NEW="ppr_items stream_ppr ab_cuped stream_ab_cuped conformal_interval \
stream_conformal hill_tail_index stream_hill dsir_importance stream_dsir \
hybrid_rrf_topk stream_hybrid_rrf ab_srm_check stream_ab_srm qte_deciles \
stream_qte bpe_train stream_bpe_train stratified_ate stream_stratified_ate \
ab_peeking_curve stream_peeking"
canary() {
  echo "## canary $1" >> "$OUT"
  for r in 1 2 3; do
    tools/scale_run.sh "$SFDIR" "$CPUS" markov_stationary >> "$OUT"
  done
}
echo "# freeze_r11s3 $(date -u +%FT%TZ) uptime: $(uptime)" >> "$OUT"
canary pre
for pass in 1 2 3; do
  echo "## pass $pass $(date -u +%T)" >> "$OUT"
  tools/scale_run.sh "$SFDIR" "$CPUS" $NEW >> "$OUT"
  [ "$pass" = 2 ] && canary mid
done
canary post
echo "# freeze_r11s3 done $(date -u +%FT%TZ)" >> "$OUT"
