#!/bin/bash
# Stage 2 of the round-4 chip evidence queue: after chipqueue.sh finishes,
# run the eval CLI on the converged best checkpoint over the dumped held-out
# synthetic set (bit-identical to the training evaluator's inputs — see
# tools/make_synthetic_evalset.py) and record the CSV. The mean cd column
# must reproduce the train log's final `eval @ N: mean cd` to fp tolerance:
# an end-to-end cross-check of pcd codec -> restore -> jitted forward ->
# sorted-space metrics against the training loop.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
Q=/root/repo/run_r4/chipqueue.log

QPID=$(cat /root/repo/run_r4/chipqueue.pid 2>/dev/null || echo "")
while [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; do sleep 30; done
echo "=== chipqueue2 start $(date -u) ===" >> "$Q"

python tools/make_synthetic_evalset.py --out run_r4/evalset --num 64 \
  >> "$Q" 2>&1 || echo "evalset dump FAILED" >> "$Q"

timeout 3600 python -m rfnet_tpu.eval \
  --checkpoint run_r4/bestrecord \
  --list_path run_r4/evalset/test.list \
  --data_dir run_r4/evalset/data \
  --results_dir run_r4/results_synth \
  --batch_size 4 --plot_freq 16 \
  > run_r4/eval_cli_r4.log 2>&1 \
  && echo "eval CLI ok $(date -u)" >> "$Q" \
  || echo "eval CLI FAILED rc=$? $(date -u)" >> "$Q"

python - >> "$Q" 2>&1 <<'EOF'
import csv
rows = list(csv.DictReader(open("run_r4/results_synth/results.csv")))
cds = [float(r["cd"]) for r in rows]
emds = [float(r["emd"]) for r in rows]
print(f"eval-CLI cross-check: n={len(rows)} mean_cd={sum(cds)/len(cds):.6f} "
      f"mean_fidelity={sum(emds)/len(emds):.6f} (train log eval @ final for comparison)")
EOF

echo "=== chipqueue2 done $(date -u) ===" >> "$Q"
