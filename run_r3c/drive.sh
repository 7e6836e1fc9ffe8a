#!/bin/bash
# Round-3c: longer-horizon on-device synthetic stream run. Fresh model, the
# reference schedule compressed 3x less aggressively than round-3b
# (--schedule_scale 0.33 -> LR boundaries ~16.5k/33k/50k/66k) and a 100k-step
# horizon: extends the monotone-to-plateau evidence past the 30k curve in
# PARITY.md and leaves a better-converged checkpoint for bench weights.
# Waits (indefinitely — see the loop comment) for the bench queue marker
# (chipq_probe.log "queue done") before touching the chip (one TPU process
# at a time). Grabs the forward stage profile first, then trains. Segmented
# with auto-restore so relay drops only cost the segment.
cd /root/repo/run_r3c
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
# Wait for the bench queue marker with NO time bailout: the watchdog
# (/tmp/chip_queue.sh) only writes "queue done" after the relay is back AND
# the benches + verify_onchip have finished, so bailing out on a clock would
# race the queue for the exclusive chip. If the watchdog itself dies the
# operator restarts it (its pid is visible in plain `ps aux`).
waited=0
while ! grep -q "queue done" /tmp/chipq_probe.log 2>/dev/null; do
  echo "$(date -u) waiting for bench queue (${waited}m)" >> drive_wait.log
  sleep 60
  waited=$((waited+1))
done
sleep 15
timeout 2400 python /root/repo/tools/profile_forward.py > /tmp/chipq_fwd.log 2>&1
for target in $(seq 10000 10000 100000); do
  echo "=== online segment -> $target start $(date -u +%H:%M:%S) ===" >> train_online.log
  timeout 7200 python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 --schedule_scale 0.33 \
    --steps $target --ckpt_every 5000 \
    --workdir /root/repo/run_r3c/modelvv_recon >> train_online.log 2>&1
  echo "=== online segment -> $target exit $? $(date -u +%H:%M:%S) ===" >> train_online.log
done
echo "ONLINE ALL DONE $(date -u)" >> train_online.log
