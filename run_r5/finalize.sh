#!/bin/bash
# Round-5 end-of-run finalization (run AFTER the protocol drive exits).
# Produces the committed artifacts for the schedule_scale=1 reference-
# protocol run: curve json, bestrecord force-add, optional on-chip
# eval-CLI cross-check of the best checkpoint.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

# 1. curves artifact (train-cd trajectory + held-out eval curve)
python tools/curve_report.py run_r5/logs/metrics.jsonl run_r5/train_proto.log \
    --json run_r5/curves.json | tail -20

# 2. force-add the best checkpoint (gitignored by the bestrecord/ pattern;
#    committing it is what makes the drive restart-proof and lets bench
#    quote converged weights after a box wipe)
git add -f run_r5/bestrecord
git add run_r5/curves.json run_r5/train_proto.log run_r5/logs/metrics.jsonl \
    run_r5/finalize.sh run_r5/drive.sh

# 3. (manual, time permitting — NEEDS the chip free) on-chip eval-CLI
#    cross-check of the best checkpoint over the held-out synthetic set,
#    the round-4 protocol (run_r4/chipqueue2.sh):
#      python tools/make_synthetic_evalset.py --out run_r5/evalset --num 64
#      timeout 3000 python -m rfnet_tpu.eval --checkpoint run_r5/bestrecord \
#        --list_path run_r5/evalset/test.list --data_dir run_r5/evalset/data \
#        --results_dir run_r5/results_synth --batch_size 4 --plot_freq 16
#    Expect results.csv mean cd == the train log's eval @ <best step> to
#    all printed digits.
echo "now: git commit; then fill PARITY.md round-5 run subsection"
