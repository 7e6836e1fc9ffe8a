#!/bin/bash
# Round-3c: longer-horizon on-device synthetic stream run. Fresh model, the
# reference schedule compressed 3x less aggressively than round-3b
# (--schedule_scale 0.33 -> LR boundaries ~16.5k/33k/50k/66k) and a 100k-step
# horizon: extends the monotone-to-plateau evidence past the 30k curve in
# PARITY.md and leaves a better-converged checkpoint for bench weights.
# Segmented with auto-restore so relay drops only cost one segment, and a
# DEADLINE guard so the chip is free for the driver's end-of-round bench:
# no new segment starts after DEADLINE_TS (a running segment still finishes,
# worst case ~40 min past it — budget that margin when setting it).
cd /root/repo/run_r3c
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 21600 ))}  # default: +6h
for target in $(seq 10000 10000 100000); do
  if [ "$(date +%s)" -ge "$DEADLINE_TS" ]; then
    echo "=== deadline reached, stopping before segment -> $target $(date -u) ===" >> train_online.log
    break
  fi
  echo "=== online segment -> $target start $(date -u +%H:%M:%S) ===" >> train_online.log
  timeout 7200 python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 --schedule_scale 0.33 \
    --steps $target --ckpt_every 5000 \
    --workdir /root/repo/run_r3c/modelvv_recon >> train_online.log 2>&1
  echo "=== online segment -> $target exit $? $(date -u +%H:%M:%S) ===" >> train_online.log
done
echo "ONLINE DRIVE DONE $(date -u)" >> train_online.log
