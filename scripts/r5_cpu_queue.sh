#!/bin/bash
# Round-5 serial CPU queue: the WA r1500 oracle pair (VERDICT r4 #7) — the
# last noisy cell in the torch-vs-rebuild grid (wa_r300 had torch task-0 at
# 0.00).  Both arms at the non-degenerate budget the base/lwf/mrn pairs used.
cd /root/repo
echo "queue5 start $(date -u +%H:%M:%S)" >> /tmp/queue5_status.log

if [ ! -f oracle/runs/wa_r1500/.done ]; then
  nice -n 19 timeout 28800 python oracle/run_reference.py --il wa \
    --num_iter 1500 --tasks 3 --tag r1500 > /tmp/q7_torch_wa.log 2>&1
  rc=$?; [ $rc -eq 0 ] && touch oracle/runs/wa_r1500/.done
  echo "torch_wa_r1500 rc=$rc $(date -u +%H:%M:%S)" >> /tmp/queue5_status.log
fi

if [ ! -f oracle/runs/jax_wa_r1500/.done ]; then
  nice -n 19 env ORACLE_IL=wa ORACLE_TASKS=3 ORACLE_ITER=1500 ORACLE_TAG=r1500 \
    MRN_TPU_PLATFORM=cpu \
    timeout 28800 python train.py --config oracle/jax_config.py \
    > /tmp/q7_jax_wa.log 2>&1
  rc=$?; [ $rc -eq 0 ] && touch oracle/runs/jax_wa_r1500/.done
  echo "jax_wa_r1500 rc=$rc $(date -u +%H:%M:%S)" >> /tmp/queue5_status.log
fi
echo "queue5 ALL DONE $(date -u +%H:%M:%S)" >> /tmp/queue5_status.log
