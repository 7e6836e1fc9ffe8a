#!/bin/bash
# Round-4 post-training chip queue: waits for the training drive to finish,
# then runs the evidence jobs sequentially (one TPU process at a time,
# CLAUDE.md). Each step logs to run_r4/ and failures don't block later steps
# — the session driving this keeps dying to API 529s, so the queue must be
# self-sufficient. Nothing here commits; the interactive session commits.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
Q=/root/repo/run_r4/chipqueue.log
echo "=== chipqueue start $(date -u) ===" >> "$Q"

# 1. wait for the drive to exit
DPID=$(cat /root/repo/run_r4/drive.pid 2>/dev/null || echo "")
while [ -n "$DPID" ] && kill -0 "$DPID" 2>/dev/null; do sleep 30; done
echo "drive exited $(date -u): $(tail -1 run_r4/train_r4.log)" >> "$Q"

# 2. curve artifacts (CPU-only, fast)
python tools/curve_report.py run_r4/logs/metrics.jsonl run_r4/train_r4.log \
  --json run_r4/curves.json > run_r4/eval_curve.txt 2>> "$Q" \
  && echo "curves ok $(date -u)" >> "$Q" || echo "curves FAILED" >> "$Q"

# 3. bench with the converged weights (headline + train_step breakdown)
timeout 3600 python bench.py > run_r4/bench_r4.json 2> run_r4/bench_r4.err \
  && echo "bench ok $(date -u): $(cat run_r4/bench_r4.json)" >> "$Q" \
  || echo "bench FAILED rc=$? $(date -u)" >> "$Q"

# 4. full on-chip validation incl. the round-4 checks (auction, ball-query/
#    three_nn, export round-trip) -> ONCHIP_VALIDATION.json at repo root
timeout 5400 python tools/verify_onchip.py > run_r4/verify_onchip_r4.log 2>&1 \
  && echo "verify_onchip ok $(date -u)" >> "$Q" \
  || echo "verify_onchip FAILED rc=$? $(date -u)" >> "$Q"

# 5. random-init step breakdown for the weight-dependence comparison
timeout 3600 python tools/profile_trainstep.py \
  > run_r4/profile_trainstep_r4.txt 2>&1 \
  && echo "profile_trainstep ok $(date -u)" >> "$Q" \
  || echo "profile_trainstep FAILED rc=$? $(date -u)" >> "$Q"

echo "=== chipqueue done $(date -u) ===" >> "$Q"
