#!/usr/bin/env bash
# Round-16 decade sweep: sf0.1 -> sf1 -> sf10 TimeOne rows for the new
# gates, plus the q256 default-heap re-measure (round-15 weak #1 check).
# Run inside tmux (multi-hour sweep discipline, see the verify skill).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/decade_r16.log}
: > "$OUT"
run() { # query sfdir [mem]
  local q=$1 sf=$2 mem=${3:-}
  echo "== $q $sf mem=${mem:-8g(default)}" | tee -a "$OUT"
  if [ -n "$mem" ]; then
    SPARK_DRIVER_MEM=$mem scripts/runmain.sh graft.TimeOne "$sf" "$q" 2 2>/dev/null | tail -1 | tee -a "$OUT"
  else
    scripts/runmain.sh graft.TimeOne "$sf" "$q" 2 2>/dev/null | tail -1 | tee -a "$OUT"
  fi
}
for q in q276_maxsim_token_cdc q278_maxsim_pq_clustered q279_maxsim_ivfpq_residual q280_cdc_store_vacuum q277_multi_index_cdc; do
  run "$q" /root/testdata/sf0.1
  run "$q" /tmp/graft_sf1
  run "$q" /tmp/graft_sf10
done
# q256 at the DEFAULT heap across the decade (the conditional eager trade)
run q256_pagerank_store_absorb /root/testdata/sf0.1
run q256_pagerank_store_absorb /tmp/graft_sf1
run q256_pagerank_store_absorb /tmp/graft_sf10
echo "SWEEP DONE" | tee -a "$OUT"
