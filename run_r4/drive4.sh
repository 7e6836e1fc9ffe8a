#!/bin/bash
# Round-5 continuation drive. Same goal as drive3.sh — extend the synthetic
# online run through the final 1e-5 LR phase toward 150k steps — but the
# bestrecord seed step is DISCOVERED, not hardcoded: a box restart wipes the
# gitignored workdir, and bestrecord's latest numbered checkpoint (force-added
# to git, currently 105000 @ held-out CD 0.023168) is always the right seed.
# best.json's guard means bestrecord only advances if a 5k-eval beats it.
#
# ADVICE r4 fixes applied: (1) the seed copy is ATOMIC — cp -r to a temp name
# then mv, so the digit-glob re-seed guard can never match a partially-copied
# checkpoint after a mid-copy box restart; (2) a log-silence watchdog kills
# the train PID if the log stops growing for SILENCE_S (the documented relay
# dispatch-hang signature: process alive, log silent ~30 min), instead of
# burning the rest of the budget until the deadline timeout. The train
# process is launched directly so the managed PID is python itself (a
# timeout(1) wrapper killed with -9 would orphan the child).
mkdir -p /root/repo/run_r4
cd /root/repo/run_r4
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
SILENCE_S=${SILENCE_S:-1800}
WORKDIR=/root/repo/run_r4/modelvv_recon
BESTDIR=/root/repo/run_r4/bestrecord
LOG=/root/repo/run_r4/train_r5.log
if ! ls "$WORKDIR"/[0-9]* >/dev/null 2>&1; then
  SEED=$(ls "$BESTDIR" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -z "$SEED" ]; then
    echo "FATAL: no bestrecord checkpoint to seed from $(date -u)" >> "$LOG"
    exit 1
  fi
  echo "=== seeding $WORKDIR from $BESTDIR/$SEED $(date -u) ===" >> "$LOG"
  mkdir -p "$WORKDIR"
  rm -rf "$WORKDIR/.seed.tmp"
  cp -r "$BESTDIR/$SEED" "$WORKDIR/.seed.tmp"
  mv "$WORKDIR/.seed.tmp" "$WORKDIR/$SEED"
fi
while :; do
  NOW=$(date +%s); LEFT=$((DEADLINE - NOW))
  if [ "$LEFT" -lt 300 ]; then
    echo "DEADLINE REACHED $(date -u)" >> "$LOG"
    break
  fi
  echo "=== segment start $(date -u) left ${LEFT}s ===" >> "$LOG"
  python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 --schedule_scale 0.25 \
    --steps 150000 --ckpt_every 5000 \
    --workdir "$WORKDIR" >> "$LOG" 2>&1 &
  TPID=$!
  echo "$TPID" > /root/repo/run_r4/train.pid
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    MTIME=$(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW")
    if [ $((NOW - MTIME)) -gt "$SILENCE_S" ]; then
      echo "=== WATCHDOG: log silent $((NOW - MTIME))s, killing $TPID $(date -u) ===" >> "$LOG"
      kill "$TPID" 2>/dev/null; sleep 15; kill -9 "$TPID" 2>/dev/null
      break
    fi
    if [ "$NOW" -gt "$DEADLINE" ]; then
      echo "=== deadline mid-segment, stopping $TPID $(date -u) ===" >> "$LOG"
      kill "$TPID" 2>/dev/null; sleep 15; kill -9 "$TPID" 2>/dev/null
      break
    fi
  done
  wait "$TPID" 2>/dev/null; rc=$?
  echo "=== segment exit $rc $(date -u) ===" >> "$LOG"
  if [ "$rc" -eq 0 ]; then
    echo "ALL DONE $(date -u)" >> "$LOG"
    break
  fi
  sleep 20
done
echo "DRIVE EXIT $(date -u)" >> "$LOG"
