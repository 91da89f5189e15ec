#!/bin/bash
# Runs the full 6-task AIA campaign for every IL strategy, sequentially
# (one TPU chip). Writes ACCURACY_RUNS/<il>.json per strategy + a log.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-ACCURACY_RUNS}
mkdir -p "$OUT"
for il in base ewc lwf wa der mrn joint_mix; do
  if [ -f "$OUT/$il.json" ]; then
    echo "== $il: already done, skipping"
    continue
  fi
  echo "== $il: starting at $(date +%T)"
  timeout 7200 python scripts/accuracy_campaign.py --il "$il" --out "$OUT" \
    > "$OUT/$il.log" 2>&1
  rc=$?
  echo "== $il: rc=$rc at $(date +%T)"
done
echo "campaign complete"
