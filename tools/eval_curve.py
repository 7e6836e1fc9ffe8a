"""In-sample vs held-out eval-CD curves across every retained checkpoint.

The decisive overfit-vs-instability experiment for the long-horizon run
(VERDICT r2 #1 / weak #1): for each checkpoint step, evaluate the model on

  * 64 TRAINING samples (the first 64 items of the seed-0 synthetic set —
    identical to the run's training data), and
  * 64 HELD-OUT samples (the disjoint seed-1234 validation set the run's
    `--synthetic_val_size` built),

with the exact eval protocol (chamfer_means of out4 vs gt + plan-free EMD,
batch 4). A healthy-but-overfitting run shows the in-sample curve falling
monotonically while the held-out curve bottoms out and rises; an unstable
run shows BOTH rising. Data lives on device (one upload per set) so the
sweep is compute-bound.

    python tools/eval_curve.py run_r3/modelvv_recon
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def build_set(num, seed, innum, ptnum):
    from rfnet_tpu.data.dataset import resample_pcd, synthetic_pairs

    parts, gts = [], []
    for _, partial, gt in synthetic_pairs(num, innum * 2, ptnum, seed):
        parts.append(resample_pcd(partial, innum))
        gts.append(resample_pcd(gt, ptnum))
    return (
        jax.device_put(np.stack(parts).astype(np.float32)),
        jax.device_put(np.stack(gts).astype(np.float32)),
    )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    workdir = argv[0] if argv else "run_r3/modelvv_recon"
    num = int(argv[1]) if len(argv) > 1 else 64
    bsz = 4

    import orbax.checkpoint as ocp

    from rfnet_tpu.train import TrainConfig, _abstract, create_state, eval_step

    config = TrainConfig()
    state = create_state(config)
    mgr = ocp.CheckpointManager(os.path.abspath(workdir))
    steps = sorted(mgr.all_steps())
    print(f"checkpoints: {steps}", file=sys.stderr)

    train_set = build_set(num, 0, config.innum, config.ptnum)
    heldout_set = build_set(num, 1234, config.innum, config.ptnum)
    jeval = jax.jit(eval_step)

    def sweep(state, data):
        parts, gts = data
        cds = []
        for i in range(0, num, bsz):
            cd, _ = jeval(state, parts[i : i + bsz], gts[i : i + bsz])
            cds.append(float(cd))
        return float(np.mean(cds))

    print(f"{'step':>6} {'in-sample cd':>13} {'held-out cd':>12}")
    for step in steps:
        st = mgr.restore(step, args=ocp.args.StandardRestore(_abstract(state)))
        tr = sweep(st, train_set)
        ho = sweep(st, heldout_set)
        print(f"{step:>6} {tr:>13.6f} {ho:>12.6f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
