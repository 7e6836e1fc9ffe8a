#!/bin/bash
# Round-5 protocol drive: the EXACT reference training schedule
# (schedule_scale=1 — LR boundaries 50k/100k/150k/200k and the α₁ 0.01→0.001
# drop at 150k, vv_recon.py:479-482) on the infinite synthetic stream,
# target 230k steps = the shipped reference checkpoint's horizon
# (bestrecord/checkpoint:1, model-229999). Fresh run from random init in
# run_r5/ — no seeding from run_r4: those weights were trained on the
# COMPRESSED (scale=0.25) schedule, a different protocol.
#
# Restart-proof: each segment auto-restores the latest checkpoint in WORKDIR
# (train.py restore-on-start). Relay-hang-proof (ADVICE r4): the train
# process is launched directly (its PID is the one we manage — no timeout(1)
# wrapper whose SIGKILL would orphan the child) and a log-silence watchdog
# kills it if the log hasn't grown for SILENCE_S seconds — the documented
# dispatch-hang signature is "process alive, log silent ~30 min"
# (CLAUDE.md relay-hang recovery protocol). The loop then restores the
# latest checkpoint and is back at speed in ~8 min on the warm cache.
mkdir -p /root/repo/run_r5
cd /root/repo/run_r5
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
SILENCE_S=${SILENCE_S:-1800}
WORKDIR=/root/repo/run_r5/modelvv_recon
LOG=/root/repo/run_r5/train_proto.log
mkdir -p "$WORKDIR"
while :; do
  NOW=$(date +%s); LEFT=$((DEADLINE - NOW))
  if [ "$LEFT" -lt 300 ]; then
    echo "DEADLINE REACHED $(date -u)" >> "$LOG"
    break
  fi
  echo "=== segment start $(date -u) left ${LEFT}s ===" >> "$LOG"
  python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 \
    --steps 230000 --ckpt_every 5000 \
    --workdir "$WORKDIR" >> "$LOG" 2>&1 &
  TPID=$!
  echo "$TPID" > /root/repo/run_r5/train.pid
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
