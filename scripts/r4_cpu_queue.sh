#!/bin/bash
# Round-4 serial CPU oracle queue (this host has ONE core — never parallelize).
# Detached via setsid so it survives builder-session restarts; progress in
# /tmp/queue_status.log, per-run logs in /tmp/q*.log.
cd /root/repo
echo "queue start $(date -u +%H:%M:%S)" >> /tmp/queue_status.log

# Q1: resume the interrupted jax DER r300 oracle half (tasks 0-1 ckpts exist)
if [ ! -f oracle/runs/jax_der_r300/.done ]; then
  mv oracle/runs/jax_der_r300/data_any.txt oracle/runs/jax_der_r300/data_any_attempt1.txt 2>/dev/null
  nice -n 19 env ORACLE_IL=der ORACLE_TASKS=3 ORACLE_ITER=300 ORACLE_TAG=r300 \
    ORACLE_START=2 MRN_TPU_PLATFORM=cpu \
    timeout 7200 python train.py --config oracle/jax_config.py > /tmp/q1_jax_der.log 2>&1
  rc=$?; [ $rc -eq 0 ] && touch oracle/runs/jax_der_r300/.done
  echo "Q1 jax_der_r300 rc=$rc $(date -u +%H:%M:%S)" >> /tmp/queue_status.log
fi

# Q2: resume the interrupted torch MRN r1500 (tasks 0-1 ckpts incl. router step)
if [ ! -f oracle/runs/mrn_r1500/.done ]; then
  mv oracle/runs/mrn_r1500/data_any.txt oracle/runs/mrn_r1500/data_any_attempt1.txt 2>/dev/null
  nice -n 19 timeout 18000 python oracle/run_reference.py --il mrn --num_iter 1500 \
    --tasks 3 --tag r1500 --start_task 2 > /tmp/q2_torch_mrn1500.log 2>&1
  rc=$?; [ $rc -eq 0 ] && touch oracle/runs/mrn_r1500/.done
  echo "Q2 torch_mrn_r1500 rc=$rc $(date -u +%H:%M:%S)" >> /tmp/queue_status.log
fi

# Q3: BN running-stat drift analysis on the torch reference's own checkpoints
nice -n 19 timeout 1800 python scripts/mrn_bn_drift_torch.py --run oracle/runs/mrn_r1500 \
  > /tmp/q3_drift.log 2>&1
echo "Q3 bn_drift rc=$? $(date -u +%H:%M:%S)" >> /tmp/queue_status.log

# Q4: torch lwf on the OVERLAP suite at r1500 (VERDICT item 7)
if [ ! -f oracle/runs/lwf_ov1500/.done ]; then
  nice -n 19 timeout 18000 python oracle/run_reference.py --il lwf --num_iter 1500 \
    --tasks 3 --tag ov1500 --data_root data_shared > /tmp/q4_torch_lwf_ov.log 2>&1
  rc=$?; [ $rc -eq 0 ] && touch oracle/runs/lwf_ov1500/.done
  echo "Q4 torch_lwf_ov1500 rc=$rc $(date -u +%H:%M:%S)" >> /tmp/queue_status.log
fi

# Q5: torch base on the OVERLAP suite at r1500 (the AIA comparison arm)
if [ ! -f oracle/runs/base_ov1500/.done ]; then
  nice -n 19 timeout 18000 python oracle/run_reference.py --il base --num_iter 1500 \
    --tasks 3 --tag ov1500 --data_root data_shared > /tmp/q5_torch_base_ov.log 2>&1
  rc=$?; [ $rc -eq 0 ] && touch oracle/runs/base_ov1500/.done
  echo "Q5 torch_base_ov1500 rc=$rc $(date -u +%H:%M:%S)" >> /tmp/queue_status.log
fi

echo "queue ALL DONE $(date -u +%H:%M:%S)" >> /tmp/queue_status.log
