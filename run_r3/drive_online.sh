#!/bin/bash
# Round-3 experiment B: infinite on-device synthetic stream (--synthetic_online).
# Control for the finite-set run in drive.sh: same model, same compressed
# schedule (LR boundaries 5k/10k/15k/20k), same held-out seed-1234 eval set,
# but a never-repeating training stream — no finite set to overfit. If the
# held-out eval-CD curve is monotone-to-plateau here, the optimizer/loss
# wiring is sound and the finite-set rise is generalization gap, not
# instability. Waits for drive.sh's "ALL DONE" before touching the chip
# (one TPU process at a time). Separate cwd: best-record/logs paths are
# derived from the workdir's parent, and must not clobber the finite run's.
mkdir -p /root/repo/run_r3_online
cd /root/repo/run_r3_online
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
while ! grep -q "ALL DONE" /root/repo/run_r3/train_r3.log; do sleep 60; done
sleep 30
for target in $(seq 10000 10000 30000); do
  echo "=== online segment -> $target start $(date -u +%H:%M:%S) ===" >> train_online.log
  timeout 7200 python -m rfnet_tpu.train --synthetic_online \
    --synthetic_val_size 64 --schedule_scale 0.1 \
    --steps $target --ckpt_every 2500 \
    --workdir /root/repo/run_r3_online/modelvv_recon >> train_online.log 2>&1
  echo "=== online segment -> $target exit $? $(date -u +%H:%M:%S) ===" >> train_online.log
done
echo "ONLINE ALL DONE $(date -u)" >> train_online.log
