#!/bin/bash
# Round-5 continuation drive. Same goal as drive3.sh — extend the synthetic
# online run through the final 1e-5 LR phase toward 150k steps — but the
# bestrecord seed step is DISCOVERED, not hardcoded: a box restart wipes the
# gitignored workdir, and bestrecord's latest numbered checkpoint (force-added
# to git, currently 105000 @ held-out CD 0.023168) is always the right seed.
# best.json's guard means bestrecord only advances if a 5k-eval beats it.
mkdir -p /root/repo/run_r4
cd /root/repo/run_r4
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
WORKDIR=/root/repo/run_r4/modelvv_recon
BESTDIR=/root/repo/run_r4/bestrecord
if ! ls "$WORKDIR"/[0-9]* >/dev/null 2>&1; then
  SEED=$(ls "$BESTDIR" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -z "$SEED" ]; then
    echo "FATAL: no bestrecord checkpoint to seed from $(date -u)" >> train_r5.log
    exit 1
  fi
  echo "=== seeding $WORKDIR from $BESTDIR/$SEED $(date -u) ===" >> train_r5.log
  mkdir -p "$WORKDIR"
  cp -r "$BESTDIR/$SEED" "$WORKDIR/$SEED"
fi
while :; do
  NOW=$(date +%s)
  LEFT=$((DEADLINE - NOW))
  if [ "$LEFT" -lt 300 ]; then
    echo "DEADLINE REACHED $(date -u)" >> train_r5.log
    break
  fi
  echo "=== segment start $(date -u) left ${LEFT}s ===" >> train_r5.log
  timeout "$LEFT" python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 --schedule_scale 0.25 \
    --steps 150000 --ckpt_every 5000 \
    --workdir "$WORKDIR" >> train_r5.log 2>&1
  rc=$?
  echo "=== segment exit $rc $(date -u) ===" >> train_r5.log
  if [ "$rc" -eq 0 ]; then
    echo "ALL DONE $(date -u)" >> train_r5.log
    break
  fi
  sleep 20
done
echo "DRIVE EXIT $(date -u)" >> train_r5.log
