#!/bin/bash
# Round-3 long-horizon training-stability run (VERDICT r2 #1):
# 30k steps, 4096-sample synthetic set, held-out 64-sample validation,
# reference schedule compressed 10x (LR boundaries 5k/10k/15k/20k).
# --preload_device: whole training set resident in HBM, on-device batch
# gather (the relay's ~0.7-0.9 s/step host->device copy disappears).
# Segmented restarts every 5000 steps bound residual host RSS growth;
# auto-restore makes each restart bit-exact. ckpt/eval cadence stays 2500.
cd /root/repo/run_r3
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
for target in $(seq 10000 5000 30000); do
  echo "=== segment -> $target start $(date -u +%H:%M:%S) ===" >> train_r3.log
  timeout 7200 python -m rfnet_tpu.train --synthetic \
    --synthetic_size 4096 --synthetic_val_size 64 --schedule_scale 0.1 \
    --preload_device --steps $target --ckpt_every 2500 \
    --workdir /root/repo/run_r3/modelvv_recon >> train_r3.log 2>&1
  echo "=== segment -> $target exit $? $(date -u +%H:%M:%S) ===" >> train_r3.log
done
echo "ALL DONE $(date -u)" >> train_r3.log
