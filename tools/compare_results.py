"""Compare two recon results.csv files (ours vs the reference baseline).

The reference ships its eval output as `results/recon/results.csv` (1200 rows,
header `id,cd,emd`), and BASELINE.md records the per-category means computed
from it. This tool reports overall and per-category mean deltas so a parity
claim ("CD within 1%") is one command:

    python tools/compare_results.py ours.csv baseline.csv
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict


def load(path: str):
    rows = {}
    with open(path) as f:
        for rec in csv.DictReader(f):
            rows[rec["id"]] = (float(rec["cd"]), float(rec["emd"]))
    return rows


def means(rows):
    cats = defaultdict(lambda: ([], []))
    for mid, (cd, emd) in rows.items():
        cat = mid.split("/")[0]
        cats[cat][0].append(cd)
        cats[cat][1].append(emd)
    out = {}
    for cat, (cds, emds) in cats.items():
        out[cat] = (sum(cds) / len(cds), sum(emds) / len(emds))
    allcd = sum(cd for cd, _ in rows.values()) / len(rows)
    allemd = sum(e for _, e in rows.values()) / len(rows)
    return out, allcd, allemd


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("ours")
    p.add_argument("baseline")
    p.add_argument(
        "--tolerance", type=float, default=1.0,
        help="parity band in PERCENT (default: the BASELINE.md 1%% band)",
    )
    args = p.parse_args(argv)
    tol = args.tolerance
    ours = load(args.ours)
    base = load(args.baseline)
    common = set(ours) & set(base)
    print(f"models: ours {len(ours)}, baseline {len(base)}, common {len(common)}")
    o_cat, o_cd, o_emd = means(ours)
    b_cat, b_cd, b_emd = means(base)
    print(f"{'category':>12} {'ours cd':>10} {'base cd':>10} {'Δ%':>8}")
    for cat in sorted(set(o_cat) | set(b_cat)):
        oc = o_cat.get(cat, (float('nan'),))[0]
        bc = b_cat.get(cat, (float('nan'),))[0]
        d = 100 * (oc - bc) / bc if bc == bc and bc != 0 else float("nan")
        print(f"{cat:>12} {oc:>10.6f} {bc:>10.6f} {d:>7.2f}%")
    d_all = 100 * (o_cd - b_cd) / b_cd
    print(f"{'ALL':>12} {o_cd:>10.6f} {b_cd:>10.6f} {d_all:>7.2f}%")
    print(f"overall fidelity('emd' col): ours {o_emd:.6f} base {b_emd:.6f}")
    # exit code doubles as the parity gate: 0 = within the band
    # (default 1%, the BASELINE.md north star), 2 = outside
    print("PARITY" if abs(d_all) <= tol else f"OUTSIDE {tol:g}% BAND")
    return 0 if abs(d_all) <= tol else 2


if __name__ == "__main__":
    raise SystemExit(main())
