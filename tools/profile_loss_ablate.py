"""Ablate total_loss term-by-term to find the full-stack composition penalty.

Pairwise composites are additive (tools/profile_loss_composites.py:
cd34 65, +recd 85, +emd 74, recd+emd 33) yet the full stack f+b is 154 ms
(tools/profile_step_gap.py) vs ~102 expected — this times total_loss with
one term dropped at a time, on fabricated outputs with the real shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import functools as _functools

from tools._common import timeit as _timeit

from rfnet_tpu import losses
from rfnet_tpu.models import RFNet
from rfnet_tpu.train import TrainConfig, create_state

ITERS = 10


# shared timing protocol (compile + 2 warmups + readback-of-last);
# see tools/_common.py — one place to change the measurement rules
timeit = _functools.partial(_timeit, iters=ITERS, width=16)


def make_loss(drop):
    from rfnet_tpu.ops.chamfer import chamfer_means_pair

    def f(outputs, gt, gt1, gt2):
        total = 0.0
        if "emd" not in drop:
            total += 0.2 * (
                losses.earth_mover(gt1, outputs.points1_pre)
                + losses.earth_mover(gt2, outputs.points2_pre)
            )
        if "cd34" not in drop:
            m3a, m3b, m4a, m4b = chamfer_means_pair(gt, outputs.out3, outputs.out4)
            total += (m3a + m3b) / 2.0 + (m4a + m4b) / 2.0
        if "recd" not in drop:
            total += 0.2 * losses.re_chamfer(gt, outputs.out3, part=8)
        if "move" not in drop:
            total += 0.1 * jnp.mean(jnp.sum(outputs.final_move**2, axis=-1))
        if "zgn" not in drop:
            total += 0.05 * losses.zero_groupnear(gt1, gt2, outputs.moves1)
            total += 0.05 * losses.zero_groupnear(gt2, gt, outputs.moves2)
        if "dec" not in drop:
            total += 0.01 * jnp.sum(outputs.decfactor_sq)
        return total

    return f


def main():
    config = TrainConfig()
    state = create_state(config, RFNet())
    b = 32
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(b, config.innum, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    gt1 = jnp.asarray(rng.rand(b, 64, 3).astype(np.float32))
    gt2 = jnp.asarray(rng.rand(b, 1024, 3).astype(np.float32))
    outputs = jax.jit(state.apply_fn)(state.params, partial)
    outputs = jax.tree_util.tree_map(jax.lax.stop_gradient, outputs)
    jax.block_until_ready(outputs)

    for drop in ((), ("zgn",), ("emd",), ("recd",), ("move", "dec")):
        loss = make_loss(set(drop))

        @jax.jit
        def fb(outputs, gt, gt1, gt2, loss=loss):
            val, g = jax.value_and_grad(loss)(outputs, gt, gt1, gt2)
            return val, g.out3, g.out4

        timeit(f"full-{'-'.join(drop) or 'none'}", fb, outputs, gt, gt1, gt2)


if __name__ == "__main__":
    main()
