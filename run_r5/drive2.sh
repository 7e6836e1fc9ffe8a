#!/bin/bash
# Round-5 protocol drive, v2 — survives BOX RESTARTS, not just process
# deaths. Same reference schedule as drive.sh (schedule_scale=1, target
# 230k = the shipped checkpoint's horizon, vv_recon.py:479-482 /
# bestrecord/checkpoint:1), plus:
#   * SNAPSHOT COMMITS: every SNAP_S seconds the newest checkpoint in
#     WORKDIR (plus bestrecord/ and the log) is copied atomically to
#     ckpt_snapshot/ and committed with `git add -f`. A box restart (three
#     so far: 2026-08-19 x2, 2026-08-21) now loses at most SNAP_S of
#     training instead of the whole run — attempt 1 of this run died at
#     ~22k steps with zero surviving checkpoints (train_proto_attempt1.log).
#   * ATOMIC SEED (ADVICE r4): on start, if WORKDIR has no step dirs and a
#     committed snapshot exists, restore it via tmp-name + mv so the
#     digit-glob never sees a partial copy.
#   * the v1 log-silence watchdog for the documented relay dispatch-hang.
set -u
mkdir -p /root/repo/run_r5
cd /root/repo/run_r5
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
SILENCE_S=${SILENCE_S:-1800}
SNAP_S=${SNAP_S:-2700}
WORKDIR=/root/repo/run_r5/modelvv_recon
SNAPDIR=/root/repo/run_r5/ckpt_snapshot
LOG=/root/repo/run_r5/train_proto.log
mkdir -p "$WORKDIR"

# --- atomic seed from the committed snapshot (if the workdir is empty) ---
if ! ls -d "$WORKDIR"/[0-9]* >/dev/null 2>&1; then
  SEED=$(ls -d "$SNAPDIR"/[0-9]* 2>/dev/null | sort -n -t/ -k6 | tail -1)
  if [ -n "${SEED:-}" ]; then
    STEP=$(basename "$SEED")
    echo "=== seeding workdir from committed snapshot step $STEP $(date -u) ===" >> "$LOG"
    rm -rf "$WORKDIR/.seed.tmp"
    cp -r "$SEED" "$WORKDIR/.seed.tmp" && mv "$WORKDIR/.seed.tmp" "$WORKDIR/$STEP"
  fi
fi

snapshot() {
  local newest step
  newest=$(ls -d "$WORKDIR"/[0-9]* 2>/dev/null | sort -n -t/ -k6 | tail -1)
  [ -z "$newest" ] && return 0
  step=$(basename "$newest")
  # skip if this step is already snapshotted
  [ -d "$SNAPDIR/$step" ] && return 0
  # orbax writes atomically (tmp dir + rename), so $newest is complete
  rm -rf "$SNAPDIR.tmp"
  mkdir -p "$SNAPDIR.tmp"
  cp -r "$newest" "$SNAPDIR.tmp/$step" || return 1
  rm -rf "$SNAPDIR"
  mv "$SNAPDIR.tmp" "$SNAPDIR"
  cd /root/repo
  git add -f run_r5/ckpt_snapshot run_r5/train_proto.log 2>/dev/null
  [ -d run_r5/bestrecord ] && git add -f run_r5/bestrecord
  [ -f run_r5/logs/metrics.jsonl ] && git add -f run_r5/logs/metrics.jsonl
  git commit -q -m "protocol run: checkpoint snapshot @ step $step" 2>/dev/null
  cd /root/repo/run_r5
  echo "=== snapshot committed @ step $step $(date -u) ===" >> "$LOG"
}

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
  LAST_SNAP=$(date +%s)
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
    if [ $((NOW - LAST_SNAP)) -gt "$SNAP_S" ]; then
      snapshot
      LAST_SNAP=$NOW
    fi
  done
  wait "$TPID" 2>/dev/null; rc=$?
  echo "=== segment exit $rc $(date -u) ===" >> "$LOG"
  snapshot
  if [ "$rc" -eq 0 ]; then
    echo "ALL DONE $(date -u)" >> "$LOG"
    break
  fi
  sleep 20
done
echo "DRIVE EXIT $(date -u)" >> "$LOG"
