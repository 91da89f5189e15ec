#!/bin/bash
# Runs the full 6-task AIA campaign for every IL strategy in ONE process
# (the 2.6GB device-resident image bank uploads once).
# Writes ACCURACY_RUNS/<il>.json per strategy + a log.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-ACCURACY_RUNS}
mkdir -p "$OUT"
timeout 28800 python scripts/accuracy_campaign.py --il all --skip_done \
  --out "$OUT" >> "$OUT/campaign.log" 2>&1
echo "campaign rc=$?"
