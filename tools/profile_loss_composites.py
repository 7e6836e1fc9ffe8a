"""Locate the loss-stack composition penalty found by profile_step_gap.py.

The composed total_loss f+b measured ~154 ms (b32, 2026-08-17) while its
pieces sum to ~106 (cd34 66 + recd 23 + emd 11 + zgn 6). These composites
bisect which combination pays the extra ~48 ms.
"""

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import functools as _functools

from tools._common import timeit as _timeit

from rfnet_tpu import losses
from rfnet_tpu.ops.chamfer import chamfer_means_pair

ITERS = 10


# shared timing protocol (compile + 2 warmups + readback-of-last);
# see tools/_common.py — one place to change the measurement rules
timeit = _functools.partial(_timeit, iters=ITERS, width=14)


def main():
    b = 32
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(b, 16384, 3).astype(np.float32))
    gt1 = jnp.asarray(rng.rand(b, 64, 3).astype(np.float32))
    gt2 = jnp.asarray(rng.rand(b, 1024, 3).astype(np.float32))
    out3 = jnp.asarray(rng.rand(b, 16384, 3).astype(np.float32))
    out4 = jnp.asarray(rng.rand(b, 16384, 3).astype(np.float32))
    p1 = jnp.asarray(rng.rand(b, 64, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(b, 1024, 3).astype(np.float32))

    def cd34(gt, o3, o4):
        a, b_, c, d = chamfer_means_pair(gt, o3, o4)
        return (a + b_) / 2.0 + (c + d) / 2.0

    @jax.jit
    def cd34_fb(gt, o3, o4):
        return jax.value_and_grad(lambda x, y: cd34(gt, x, y), argnums=(0, 1))(
            o3, o4
        )

    timeit("cd34 f+b", cd34_fb, gt, out3, out4)

    @jax.jit
    def cd34_recd_fb(gt, o3, o4):
        def f(x, y):
            return cd34(gt, x, y) + 0.2 * losses.re_chamfer(gt, x, part=8)

        return jax.value_and_grad(f, argnums=(0, 1))(o3, o4)

    timeit("cd34+recd f+b", cd34_recd_fb, gt, out3, out4)

    @jax.jit
    def cd34_emd_fb(gt, gt1, gt2, o3, o4, p1, p2):
        def f(x, y, q1, q2):
            return (
                cd34(gt, x, y)
                + 0.2 * losses.earth_mover(gt1, q1)
                + 0.2 * losses.earth_mover(gt2, q2)
            )

        return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(o3, o4, p1, p2)

    timeit("cd34+emd f+b", cd34_emd_fb, gt, gt1, gt2, out3, out4, p1, p2)

    @jax.jit
    def recd_emd_fb(gt, gt1, gt2, o3, p1, p2):
        def f(x, q1, q2):
            return (
                0.2 * losses.re_chamfer(gt, x, part=8)
                + 0.2 * losses.earth_mover(gt1, q1)
                + 0.2 * losses.earth_mover(gt2, q2)
            )

        return jax.value_and_grad(f, argnums=(0, 1, 2))(o3, p1, p2)

    timeit("recd+emd f+b", recd_emd_fb, gt, gt1, gt2, out3, p1, p2)


if __name__ == "__main__":
    main()
