"""Time the building blocks of the chamfer backward paths on the real chip.

The cd34 backward (ops/chamfer._chamfer_means_bwd) is gathers + scatter-adds
+ unsorts; recd's backward is the dense nn_distance VJP at the folded
(256, 2048) shape. This tool times each block so optimization follows
measurement (see CLAUDE.md kernel facts).
"""

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import functools as _functools

from tools._common import timeit as _timeit

from rfnet_tpu.ops import chamfer as C

ITERS = 10


# shared timing protocol (compile + 2 warmups + readback-of-last);
# see tools/_common.py — one place to change the measurement rules
timeit = _functools.partial(_timeit, iters=ITERS, width=26)


def main():
    rng = np.random.RandomState(0)
    b, n = 32, 16384
    x1 = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n, size=(b, n)).astype(np.int32))
    # near-diagonal indices (what sorted-space argmins actually look like)
    idx_band = jnp.clip(
        jnp.arange(n, dtype=np.int32)[None, :]
        + jnp.asarray(rng.randint(-64, 64, size=(b, n)).astype(np.int32)),
        0, n - 1,
    )
    upd = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    order = jnp.argsort(x1[..., 2], axis=1).astype(jnp.int32)

    timeit("sort_by_z_with_order", jax.jit(C.sort_by_z_with_order), x1)
    timeit("gather (b,n,3) rand", jax.jit(
        lambda x, i: jnp.take_along_axis(x, i[..., None], axis=1)), x2, idx)
    timeit("gather (b,n,3) banded", jax.jit(
        lambda x, i: jnp.take_along_axis(x, i[..., None], axis=1)), x2, idx_band)
    timeit("scatter_add rand", jax.jit(
        lambda i, u: C._scatter_add_points((b, n, 3), i, u)), idx, upd)
    timeit("scatter_add banded", jax.jit(
        lambda i, u: C._scatter_add_points((b, n, 3), i, u)), idx_band, upd)
    timeit("unsort_rows", jax.jit(C._unsort_rows), order, upd)

    # the full cd34-style backward at the real shapes, via value_and_grad
    @jax.jit
    def cd_fb(a, c):
        m = C.chamfer_means(a, c)
        return m[0] + m[1]

    timeit("chamfer_means fwd", cd_fb, x1, x2)
    timeit("chamfer_means f+b", jax.jit(
        lambda a, c: jax.grad(cd_fb, argnums=(0, 1))(a, c)), x1, x2)

    # recd shapes: folded (256, 2048)
    bf, nf = 256, 2048
    y1 = x1.reshape(bf, nf, 3)
    y2 = x2.reshape(bf, nf, 3)
    idx_f = jnp.asarray(rng.randint(0, nf, size=(bf, nf)).astype(np.int32))
    upd_f = upd.reshape(bf, nf, 3)

    timeit("recd nn_distance fwd", jax.jit(
        lambda a, c: C.nn_distance(a, c)[0]), y1, y2)
    timeit("recd scatter (256,2048)", jax.jit(
        lambda i, u: C._scatter_add_points((bf, nf, 3), i, u)), idx_f, upd_f)

    @jax.jit
    def recd_fb(a, c):
        from rfnet_tpu import losses

        return jax.grad(lambda p: losses.re_chamfer(c, p, part=8))(a)

    timeit("re_chamfer f+b (32,16k)", recd_fb, x1, x2)


if __name__ == "__main__":
    main()
