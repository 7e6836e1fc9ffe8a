"""Sweep the early-exit kernel's tile_n/rounds on REAL early-training data.

The (tile_n=256, tile_m=512, rounds=2) default was chosen on random uniform
clouds (tools/bench_chamfer_dyn2.py). On real (untrained) model outputs the
per-tile break bound is governed by the worst of the 256 query lanes and
cd34 f+b measured 118 ms vs 65 random (tools/profile_loss_ablate.py) —
smaller query tiles tighten the bound at the price of more grid steps.
This times the kernel pair (out3→gt + gt→out3, presorted, b32 16384²) per
config on exactly that data.
"""

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import functools as _functools

from tools._common import timeit as _timeit

from rfnet_tpu.models import RFNet
from rfnet_tpu.ops.chamfer import _zsort
from rfnet_tpu.ops.pallas.chamfer_dyn import nn_dyn_pallas
from rfnet_tpu.train import TrainConfig, create_state

ITERS = 10


# shared timing protocol (compile + 2 warmups + readback-of-last);
# see tools/_common.py — one place to change the measurement rules
timeit = _functools.partial(_timeit, iters=ITERS, width=32)


def main():
    config = TrainConfig()
    state = create_state(config, RFNet())
    b = 32
    rng = np.random.RandomState(0)
    from rfnet_tpu.data.online import synthetic_batch

    partial, gt = synthetic_batch(jax.random.PRNGKey(7), b, config.innum, config.ptnum)
    out = jax.jit(state.apply_fn)(state.params, partial)
    o3 = jax.lax.stop_gradient(out.out3)
    gs, _ = _zsort(gt)
    os_, _ = _zsort(o3)
    rnd = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    rs, _ = _zsort(rnd)
    jax.block_until_ready((gs, os_, rs))

    for tile_n in (128, 256):
        for rounds in (2, 4):
            @jax.jit
            def pair(a, c, tile_n=tile_n, rounds=rounds):
                d1, _ = nn_dyn_pallas(a, c, tile_n=tile_n, rounds=rounds)
                d2, _ = nn_dyn_pallas(c, a, tile_n=tile_n, rounds=rounds)
                return jnp.sum(d1) + jnp.sum(d2)

            timeit(f"real out3<->gt  tn={tile_n} r={rounds}", pair, os_, gs)
            timeit(f"rand rnd<->gt   tn={tile_n} r={rounds}", pair, rs, gs)


if __name__ == "__main__":
    main()
