#!/bin/bash
# Round-4 continuation drive, take 2 (the drive2.sh extension never started:
# the box restarted 2026-08-19 ~21:30 UTC and took the gitignored workdir
# with it). Same goal — extend the finished 100k-step run through the final
# 1e-5 LR phase toward 150k — but RESTART-PROOF: if the workdir has no
# checkpoint, it is seeded from the git-committed run_r4/bestrecord/95000
# (best-by-CD, held-out CD 0.023228), so a box restart costs at most the
# un-checkpointed tail, never the whole run. best.json's guard means
# bestrecord only advances if a 5k-eval beats 0.023228.
mkdir -p /root/repo/run_r4
cd /root/repo/run_r4
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
WORKDIR=/root/repo/run_r4/modelvv_recon
if ! ls "$WORKDIR"/[0-9]* >/dev/null 2>&1; then
  echo "=== seeding $WORKDIR from bestrecord/95000 $(date -u) ===" >> train_r4b.log
  mkdir -p "$WORKDIR"
  cp -r /root/repo/run_r4/bestrecord/95000 "$WORKDIR"/95000
fi
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
    --workdir "$WORKDIR" >> train_r4b.log 2>&1
  rc=$?
  echo "=== segment exit $rc $(date -u) ===" >> train_r4b.log
  if [ "$rc" -eq 0 ]; then
    echo "ALL DONE $(date -u)" >> train_r4b.log
    break
  fi
  sleep 20
done
echo "DRIVE EXIT $(date -u)" >> train_r4b.log
