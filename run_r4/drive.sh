#!/bin/bash
# Round-4 long-horizon convergence drive (VERDICT r3 item 1).
#
# Re-stages the 100k-step --synthetic_online run lost to the round-3b box
# restart: infinite on-device stream (no finite set to overfit, zero per-step
# host bytes, no relay RSS leak), held-out seed-1234 eval set of 64, ckpt +
# eval every 5k so any interruption costs <=5k steps. schedule_scale 0.25
# puts the reference's LR boundaries (50k/100k/150k/200k, vv_recon.py:479-480)
# at 12.5k/25k/37.5k/50k — the final 1e-5 phase is reached mid-run, so the
# eval-CD curve shows the full plateau even if the wall-clock deadline lands
# before step 100k.
#
# DEADLINE-bounded: the round's driver needs the chip back for bench/judge;
# segments restart on crash (orbax auto-restore-latest) and stop hard at the
# deadline. One TPU process at a time (CLAUDE.md).
mkdir -p /root/repo/run_r4
cd /root/repo/run_r4
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE=${DEADLINE:-1787144700}
while :; do
  NOW=$(date +%s)
  LEFT=$((DEADLINE - NOW))
  if [ "$LEFT" -lt 300 ]; then
    echo "DEADLINE REACHED $(date -u)" >> train_r4.log
    break
  fi
  echo "=== segment start $(date -u) left ${LEFT}s ===" >> train_r4.log
  timeout "$LEFT" python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 --schedule_scale 0.25 \
    --steps 100000 --ckpt_every 5000 \
    --workdir /root/repo/run_r4/modelvv_recon >> train_r4.log 2>&1
  rc=$?
  echo "=== segment exit $rc $(date -u) ===" >> train_r4.log
  if [ "$rc" -eq 0 ]; then
    echo "ALL DONE $(date -u)" >> train_r4.log
    break
  fi
  sleep 20
done
echo "DRIVE EXIT $(date -u)" >> train_r4.log
