"""Dump the training run's held-out synthetic validation set as an eval-CLI
fixture (``data/partial|complete/<id>.pcd`` + ``test.list``).

The train CLI's ``--synthetic_online``/``--synthetic_val_size`` mode holds
out ``synthetic_pairs(N, seed=1234)`` and reports ``mean cd`` =
``chamfer_big`` on it every eval interval (train.py). ``rfnet_tpu.eval``
computes the same per-sample form (`recon_test.py:27-28` contract), so
running the eval CLI over this dump with the run's best checkpoint must
reproduce the training log's held-out CD — an end-to-end cross-check of the
whole serving path (pcd codec -> resample -> restored weights -> jitted
forward -> sorted-space metrics) against the training-loop numbers:

    python tools/make_synthetic_evalset.py --out run_r4/evalset
    python -m rfnet_tpu.eval --checkpoint run_r4/bestrecord \
        --list_path run_r4/evalset/test.list \
        --data_dir run_r4/evalset/data --results_dir run_r4/results_synth

With ``--pcn_layout`` the dump instead mirrors the REAL PCN test set's
8-known-category structure (`recon_test.py:42-76,95-100`;
`results/recon/results.csv` layout) — the dress rehearsal for real-data day.

The pcd round-trip is exact (binary fp32, data/pcd_io.py) and both partial
(3000) and gt (16384) hit resample_pcd's identity path, so the eval CLI sees
bit-identical inputs to the training evaluator.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rfnet_tpu.data.dataset import synthetic_pairs
from rfnet_tpu.data.pcd_io import save_pcd

# the 8 PCN "known" category synsets, exactly the dirs of the reference's
# test set (`results/recon/results.csv` rows; BASELINE.md per-category table)
PCN_SYNSETS = (
    "02691156",  # airplane
    "02933112",  # cabinet
    "02958343",  # car
    "03001627",  # chair
    "03636649",  # lamp
    "04256520",  # sofa
    "04379243",  # table
    "04530566",  # vessel
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=64)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--input_size", type=int, default=3000)
    p.add_argument("--gt_size", type=int, default=16384)
    p.add_argument(
        "--pcn_layout", action="store_true",
        help="lay the dump out EXACTLY like the real PCN test set: ids are "
        "<synset>/<model> over the 8 known-category synset dirs "
        "(round-robin), so the eval CLI's per-category path — "
        "plots/<synset>/, pcds/<synset>/, per-category means, "
        "compare_results gating — runs end-to-end before the real dataset "
        "exists (the dress rehearsal: on real-data day only --data_dir "
        "changes)",
    )
    args = p.parse_args(argv)

    ids = []
    for i, (mid, part, gt) in enumerate(
        synthetic_pairs(args.num, args.input_size, args.gt_size, seed=args.seed)
    ):
        if args.pcn_layout:
            mid = f"{PCN_SYNSETS[i % len(PCN_SYNSETS)]}/{mid.split('/')[-1]}"
        for kind, cloud in (("partial", part), ("complete", gt)):
            path = os.path.join(args.out, "data", kind, mid + ".pcd")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            save_pcd(path, cloud)
        ids.append(mid)
    lst = os.path.join(args.out, "test.list")
    with open(lst, "w") as f:
        f.write("\n".join(ids) + "\n")
    print(f"wrote {len(ids)} models under {args.out} (list: {lst})")


if __name__ == "__main__":
    main()
