"""Merge a continuation run's curve artifact into a base run's curves.json.

The round-4 continuation (run_r4/drive3.sh) resumes from the committed
best-by-CD checkpoint (step 95000), so its log covers steps 95001+ while the
base artifact (run_r4/curves.json) covers 0-100k — including a 95k-100k
overlap the resumed run REPLAYS deterministically (synthetic_online batches
are keyed on state.step). This tool step-key-merges the two curve JSONs
(continuation wins on overlap) and, when both sides carry an eval for the
same step, reports the replay delta — the determinism evidence.

    python tools/merge_curves.py run_r4/curves.json run_r4/curves_ext.json \
        --out run_r4/curves_150k.json
"""

import argparse
import json


def _merge(base_rows, ext_rows, key="step"):
    by_step = {r[key]: r for r in base_rows}
    overlaps = []
    for r in ext_rows:
        if r[key] in by_step and by_step[r[key]] != r:
            overlaps.append((r[key], by_step[r[key]], r))
        by_step[r[key]] = r
    return [by_step[s] for s in sorted(by_step)], overlaps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("ext")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    with open(args.base) as f:
        base = json.load(f)
    with open(args.ext) as f:
        ext = json.load(f)

    merged = {}
    for section in sorted(set(base) | set(ext)):
        rows, overlaps = _merge(base.get(section, []), ext.get(section, []))
        merged[section] = rows
        for step, old, new in overlaps:
            deltas = {
                k: (old.get(k), new.get(k))
                for k in new
                if k != "step" and old.get(k) != new.get(k)
            }
            print(f"replay overlap [{section}] step {step}: "
                  f"{'IDENTICAL' if not deltas else deltas}")

    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    evals = merged.get("eval", [])
    if evals:
        best = min(evals, key=lambda r: r["cd"])
        print(f"merged: {len(evals)} evals to step {evals[-1]['step']}, "
              f"best cd {best['cd']:.6f} @ {best['step']}")


if __name__ == "__main__":
    main()
