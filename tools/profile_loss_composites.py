"""Locate the loss-stack composition penalty found by profile_step_gap.py.

The composed total_loss f+b measured ~154 ms (b32, 2026-08-17) while its
pieces sum to ~106 (cd34 66 + recd 23 + emd 11 + zgn 6). These composites
bisect which combination pays the extra ~48 ms.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

from rfnet_tpu import losses
from rfnet_tpu.ops.chamfer import chamfer_means_pair

ITERS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    for _ in range(2):
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:14s}: {ms:8.2f} ms", flush=True)
    return ms


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
