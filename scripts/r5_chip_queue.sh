#!/bin/bash
# Round-5 serial TPU-chip queue (VERDICT r4 #4): 6-task campaigns for SVTR
# and TRBA through the per-stage process-recycled driver.  Ordered by
# evidence value; every stage is crash-safe/idempotent (kill this queue at
# any point and re-run — completed stages are never redone), so the chip can
# be reclaimed for bench/profiling and the queue resumed after.
#
# Budgets: SVTR at 1000 iters/task (600 was already well out of the noise
# floor — diagonals 85.66/47.26 — so 1000 buys margin without letting the
# queue eat the whole session); TRBA at 600 (its per-stage cost is dominated
# by compile+eval overhead, and the 6-task base-vs-wa retention contrast is
# the point — the plasticity analysis lives in ACCURACY.md).
cd /root/repo
OUT=ACCURACY_RUNS/t6
mkdir -p $OUT
Q=/tmp/queue_r5chip_status.log
echo "r5 chip queue start $(date -u +%H:%M:%S)" >> $Q

run() {  # run <arch> <il> <tasks> <iters>
  local arch=$1 il=$2 tasks=$3 iters=$4
  local final=$OUT/${arch}_${il}.json
  [ "$arch" = crnn ] && final=$OUT/${il}.json
  if [ -f "$final" ]; then
    echo "skip ${arch}_${il} (done) $(date -u +%H:%M:%S)" >> $Q
    return 0
  fi
  python scripts/campaign_recycle.py --il "$il" --arch "$arch" \
    --tasks "$tasks" --num_iter "$iters" --bf16 --out $OUT \
    > /tmp/q_${arch}_${il}.log 2>&1
  echo "${arch}_${il} rc=$? $(date -u +%H:%M:%S)" >> $Q
}

run svtr mrn  6 1000
run svtr wa   6 1000
run svtr base 6 1000
run trba base 6 600
run trba wa   6 600
run trba mrn  6 600
echo "r5 chip queue ALL DONE $(date -u +%H:%M:%S)" >> $Q
