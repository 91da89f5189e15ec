#!/bin/bash
# Round-4 session-2 serial CPU queue: jax overlap arms (VERDICT item 7).
cd /root/repo
echo "queue2 start $(date -u +%H:%M:%S)" >> /tmp/queue2_status.log

for IL in lwf base; do
  if [ ! -f oracle/runs/jax_${IL}_ov1500/.done ]; then
    nice -n 19 env ORACLE_IL=$IL ORACLE_TASKS=3 ORACLE_ITER=1500 ORACLE_TAG=ov1500 \
      ORACLE_DATA=data_shared MRN_TPU_PLATFORM=cpu \
      timeout 14400 python train.py --config oracle/jax_config.py > /tmp/q6_jax_${IL}_ov.log 2>&1
    rc=$?; [ $rc -eq 0 ] && touch oracle/runs/jax_${IL}_ov1500/.done
    echo "jax_${IL}_ov1500 rc=$rc $(date -u +%H:%M:%S)" >> /tmp/queue2_status.log
  fi
done
echo "queue2 ALL DONE $(date -u +%H:%M:%S)" >> /tmp/queue2_status.log
