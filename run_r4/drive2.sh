#!/bin/bash
# Round-4 continuation drive: extend the finished 100k-step run to 150k in
# the final 1e-5 LR phase (schedule_scale 0.25 boundaries all passed at 50k).
# The plateau is flat, so this is a low-risk squeeze: best-by-CD only
# updates if a 5k-eval beats 0.023228, in which case bench automatically
# quotes the better weights. Deadline-bounded like drive.sh so the chip is
# free well before the round's driver needs it.
mkdir -p /root/repo/run_r4
cd /root/repo/run_r4
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
while :; do
  NOW=$(date +%s)
  LEFT=$((DEADLINE - NOW))
  if [ "$LEFT" -lt 300 ]; then
    echo "DEADLINE REACHED $(date -u)" >> train_r4b.log
    break
  fi
  echo "=== segment start $(date -u) left ${LEFT}s ===" >> train_r4b.log
  timeout "$LEFT" python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 --schedule_scale 0.25 \
    --steps 150000 --ckpt_every 5000 \
    --workdir /root/repo/run_r4/modelvv_recon >> train_r4b.log 2>&1
  rc=$?
  echo "=== segment exit $rc $(date -u) ===" >> train_r4b.log
  if [ "$rc" -eq 0 ]; then
    echo "ALL DONE $(date -u)" >> train_r4b.log
    break
  fi
  sleep 20
done
echo "DRIVE EXIT $(date -u)" >> train_r4b.log
