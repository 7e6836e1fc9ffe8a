"""One-command real-data parity drill: train → best ckpt → eval → compare.

The day the PCN dataset lands, parity vs the reference's shipped results
(`/root/reference/results/recon/results.csv`, mean CD 0.008132 produced by
`recon_test.py:42-68`) is ONE invocation:

    python tools/protocol_drive.py \
        --train_path dense_data/train.lmdb --val_path dense_data/valid.lmdb \
        --list_path dense_data/test.list --data_dir dense_data/test \
        --baseline_csv /root/reference/results/recon/results.csv \
        --steps 300000 --workdir run_pcn/modelvv_recon

Until then the --synthetic smoke mode runs the identical chain on generated
data (the pinned end-to-end coverage is
tests/test_data_eval.py::test_full_protocol_drive; this CLI is the same
chain packaged for the real run). Stages, matching BASELINE config 2:

  1. `rfnet_tpu.train` for --steps (checkpoints + best-by-eval-CD record);
  2. `rfnet_tpu.eval` restoring the BEST checkpoint over the test list,
     writing the reference-contract `results.csv` (`id,cd,emd` rows);
  3. `tools/compare_results.py` against --baseline_csv — exits 0 iff the
     overall mean CD is within --tolerance (default the 1% parity band).

Each stage runs in its own interpreter (subprocess) so a relay outage or
OOM in one stage leaves the artifacts of the previous ones on disk, and a
rerun resumes from the checkpoints (train auto-restores latest).
"""

import argparse
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)  # runnable as `python tools/protocol_drive.py`
# (the --synthetic fixture writer imports rfnet_tpu in-process; the train/
# eval stages get PYTHONPATH through _run's subprocess env either way)


def _run(label: str, cmd: list[str]) -> None:
    print(f"[protocol_drive] {label}: {' '.join(cmd)}", flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(cmd, env=env)
    if r.returncode != 0:
        sys.exit(f"[protocol_drive] {label} failed with exit {r.returncode}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--train_path", default="../../dense_data/train.lmdb")
    p.add_argument("--val_path", default="../../dense_data/valid.lmdb")
    p.add_argument("--list_path", default="../../dense_data/test.list")
    p.add_argument("--data_dir", default="../../dense_data/test")
    p.add_argument("--baseline_csv", default=None,
                   help="reference results.csv to compare against; "
                   "omit to skip stage 3")
    p.add_argument("--steps", type=int, default=300_000)
    p.add_argument("--ckpt_every", type=int, default=None)
    p.add_argument("--workdir", default="./modelvv_recon")
    p.add_argument("--results_dir", default="results/recon")
    p.add_argument("--tolerance", type=float, default=None,
                   help="compare_results CD band (its default: 1%%)")
    p.add_argument("--synthetic", action="store_true",
                   help="smoke mode: generated data end to end")
    p.add_argument("--skip_train", action="store_true",
                   help="evaluate an existing bestrecord only")
    p.add_argument("--train_extra", nargs=argparse.REMAINDER, default=[],
                   help="extra args forwarded verbatim to rfnet_tpu.train")
    args = p.parse_args(argv)

    py = [sys.executable, "-m"]
    best_dir = os.path.join(os.path.dirname(os.path.abspath(args.workdir)),
                            "bestrecord")

    if not args.skip_train:
        cmd = py + ["rfnet_tpu.train", "--workdir", args.workdir,
                    "--steps", str(args.steps)]
        if args.ckpt_every:
            cmd += ["--ckpt_every", str(args.ckpt_every)]
        if args.synthetic:
            cmd += ["--synthetic"]
        else:
            cmd += ["--train_path", args.train_path,
                    "--val_path", args.val_path]
        cmd += args.train_extra
        _run("train", cmd)
    if not os.path.isdir(best_dir):
        # checked for --skip_train too: a clear message beats the orbax
        # restore stack trace the eval subprocess would raise minutes later
        sys.exit(f"[protocol_drive] no best checkpoint at {best_dir}")

    cmd = py + ["rfnet_tpu.eval", "--checkpoint", best_dir,
                "--results_dir", args.results_dir]
    if not args.synthetic:
        cmd += ["--list_path", args.list_path, "--data_dir", args.data_dir]
    else:
        # smoke mode still needs a list/dir: synthesize a 3-model fixture
        import numpy as np

        from rfnet_tpu.data.pcd_io import save_pcd

        rng = np.random.RandomState(0)
        fix = os.path.join(os.path.dirname(args.results_dir) or ".",
                           "protocol_fixture")
        ids = ["0001/a", "0001/b", "0002/c"]
        for mid in ids:
            for kind, n in (("partial", 3000), ("complete", 16384)):
                path = os.path.join(fix, "data", kind, mid + ".pcd")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                save_pcd(path, rng.rand(n, 3).astype(np.float32))
        lst = os.path.join(fix, "test.list")
        with open(lst, "w") as f:
            f.write("\n".join(ids))
        cmd += ["--list_path", lst, "--data_dir", os.path.join(fix, "data")]
    _run("eval", cmd)

    ours = os.path.join(args.results_dir, "results.csv")
    if args.baseline_csv:
        cmd = [sys.executable, os.path.join(_REPO, "tools",
                                            "compare_results.py"),
               ours, args.baseline_csv]
        if args.tolerance is not None:
            cmd += ["--tolerance", str(args.tolerance)]
        _run("compare", cmd)
    else:
        print(f"[protocol_drive] done — results at {ours} (no baseline given)")


if __name__ == "__main__":
    main()
