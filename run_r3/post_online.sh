#!/bin/bash
# Post-run chip queue: waits for the online-stream run to finish, then
# executes the round-3 analysis sweep on the freed chip, in order:
#   1. eval_curve on the finite run   -> run_r3/eval_curve.txt
#      (in-sample vs held-out CD per retained checkpoint: the decisive
#       overfit-vs-instability evidence)
#   2. eval_curve on the online run   -> run_r3_online/eval_curve.txt
#   3. profile_trainstep              -> run_r3/profile_post_emdfuse.txt
#      (first on-chip measurement of the fused train-path EMD)
#   4. refresh repo-root bestrecord from the online run's best weights
#   5. bench.py sanity (breakdown included) -> run_r3/bench_sanity.json
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
while ! grep -q "ONLINE ALL DONE" /root/repo/run_r3_online/train_online.log; do sleep 60; done
sleep 20
{
  echo "=== eval_curve finite $(date -u +%H:%M:%S) ==="
  timeout 3600 python tools/eval_curve.py run_r3/modelvv_recon 64 > run_r3/eval_curve.txt 2>&1
  echo "exit $?"
  echo "=== eval_curve online $(date -u +%H:%M:%S) ==="
  timeout 3600 python tools/eval_curve.py run_r3_online/modelvv_recon 64 > run_r3_online/eval_curve.txt 2>&1
  echo "exit $?"
  echo "=== profile_trainstep $(date -u +%H:%M:%S) ==="
  timeout 3600 python tools/profile_trainstep.py > run_r3/profile_post_emdfuse.txt 2>&1
  echo "exit $?"
  echo "=== refresh bestrecord $(date -u +%H:%M:%S) ==="
  python - <<'EOF'
import json, os, shutil
best = json.load(open("run_r3_online/bestrecord/best.json"))
root_best = json.load(open("bestrecord/best.json"))
if best["cd"] < root_best["cd"]:
    for d in os.listdir("bestrecord"):
        p = os.path.join("bestrecord", d)
        if os.path.isdir(p):
            shutil.rmtree(p)
    step = str(best["step"])
    shutil.copytree(os.path.join("run_r3_online/bestrecord", step),
                    os.path.join("bestrecord", step))
    json.dump(best, open("bestrecord/best.json", "w"))
    print("bestrecord <-", best)
else:
    print("kept", root_best)
EOF
  echo "=== bench sanity $(date -u +%H:%M:%S) ==="
  timeout 3600 python bench.py > run_r3/bench_sanity.json 2> run_r3/bench_sanity.err
  echo "exit $?"
  echo "=== POST ALL DONE $(date -u) ==="
} >> run_r3/post_online.out 2>&1
