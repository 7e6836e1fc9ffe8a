"""Summarize a training run: per-term loss trajectory + held-out eval curve.

Reads logs/metrics.jsonl (500-step LossBreakdown rows) and the train log's
`eval @ N: mean cd X mean emd Y` lines; prints a step-ordered table. This is
the evidence artifact for the long-horizon stability requirement (the
round-2 run's eval regression had no such trail).

    python tools/curve_report.py run_r3/logs/metrics.jsonl run_r3/train_r3.log

With `--json OUT` also writes a compact curve artifact (train-cd trajectory
+ held-out eval curve) for the stability regression pin
(tests/test_stability_curves.py reads the committed run_r3*/curves.json).
"""

import json
import re
import sys


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    metrics_path = argv[0] if argv else "logs/metrics.jsonl"
    log_path = argv[1] if len(argv) > 1 else None

    rows, eval_rows = [], {}
    with open(metrics_path) as f:
        for line in f:
            r = json.loads(line)
            if "eval_cd" in r:  # eval-curve rows live in the same jsonl
                eval_rows[r["step"]] = (r["eval_cd"], r["eval_emd"])
            else:
                rows.append(r)
    print(f"{'step':>6} {'total':>9} {'cd3+cd4':>9} {'emd64':>8} {'emd1024':>8} "
          f"{'recd':>8} {'move':>8} {'zgn1':>8} {'zgn2':>8} {'decfac':>8}")
    for r in rows:
        print(f"{r['step']:>6} {r['total']:>9.5f} {r['cd3'] + r['cd4']:>9.5f} "
              f"{r['cd1_emd']:>8.4f} {r['cd2_emd']:>8.4f} {r['recd3']:>8.4f} "
              f"{r['moveloss']:>8.4f} {r['loss_d1']:>8.5f} {r['loss_d2']:>8.5f} "
              f"{r['loss_dec']:>8.4f}")

    seen = dict(eval_rows)
    if log_path:
        pat = re.compile(r"eval @ (\d+): mean cd ([\d.]+) mean emd ([\d.]+)")
        with open(log_path) as f:
            for line in f:
                m = pat.search(line)
                if m:
                    seen[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    if seen:
        print("\nheld-out eval curve:")
        for step in sorted(seen):
            cd, emd = seen[step]
            print(f"  step {step:>6}: eval cd {cd:.6f}  emd {emd:.6f}")

    if json_out:
        artifact = {
            "train_cd": [
                {"step": r["step"], "cd": round(r["cd3"] + r["cd4"], 6)}
                for r in rows
            ],
            "eval": [
                {"step": s, "cd": round(seen[s][0], 6), "emd": round(seen[s][1], 6)}
                for s in sorted(seen)
            ],
        }
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1)
            f.write("\n")
        print(f"\nwrote {json_out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
