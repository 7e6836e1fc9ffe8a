"""On-chip A/B of the WHOLE loss-path chamfer (fwd+bwd) per sorted backend.

Times value_and_grad of the fused cd3/cd4 pair (ops/chamfer.chamfer_means_pair
— sorts, kernel launches, banded backward, unsorts) with the module backend
switched between "dyn" (z-slab) and "tile" (Morton 3D AABB), on random clouds
and on real untrained-model outputs. This is the number that moves the train
step: cd34 f+b was 65 ms (random) / 118 ms (real init outputs) on the z-slab
path (tools/profile_loss_ablate.py, 2026-08-17). It also captures the Morton-
order effect on nn_grad_scatter's band intervals (over-visits are exact but
cost time).
"""

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import functools as _functools

from tools._common import timeit as _timeit

from rfnet_tpu.models import RFNet
from rfnet_tpu.ops import chamfer
from rfnet_tpu.train import TrainConfig, create_state

ITERS = 10


# shared timing protocol (compile + 2 warmups + readback-of-last);
# see tools/_common.py — one place to change the measurement rules
timeit = _functools.partial(_timeit, iters=ITERS, width=44)


def main():
    config = TrainConfig()
    state = create_state(config, RFNet())
    b = 32
    rng = np.random.RandomState(0)
    from rfnet_tpu.data.online import synthetic_batch

    partial, gt = synthetic_batch(jax.random.PRNGKey(7), b, config.innum, config.ptnum)
    out = jax.jit(state.apply_fn)(state.params, partial)
    o3 = jax.lax.stop_gradient(out.out3)
    o4 = jax.lax.stop_gradient(out.out4)
    r3 = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    r4 = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    jax.block_until_ready((gt, o3, o4, r3, r4))

    def cd34(gt_, a_, b_):
        m1, m2, m3, m4 = chamfer.chamfer_means_pair(gt_, a_, b_)
        return m1 + m2 + m3 + m4

    for backend in ("dyn", "tile"):
        chamfer._NN_SORTED_BACKEND = backend
        vg = jax.jit(jax.value_and_grad(cd34, argnums=(1, 2)))
        fwd = jax.jit(cd34)
        timeit(f"[{backend}] cd34 fwd   real out3/out4", lambda *a: (fwd(*a),), gt, o3, o4)
        timeit(f"[{backend}] cd34 f+b   real out3/out4", vg, gt, o3, o4)
        timeit(f"[{backend}] cd34 f+b   random clouds ", vg, gt, r3, r4)
        v_r = float(vg(gt, o3, o4)[0])
        print(f"[{backend}] value real = {v_r:.6f}", flush=True)


if __name__ == "__main__":
    main()
