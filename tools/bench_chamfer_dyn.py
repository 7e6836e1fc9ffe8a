"""Benchmark the early-exit slab NN kernel (chamfer_dyn) vs the dense scan.

Cases (b32 fp32, the train-step loss shapes):
  - one-sided 16384² uniform clouds (cd3/cd4 proxy)
  - one-sided 16384² shell clouds (surface-like geometry, closer to real data)
  - one-sided 16384² all-z-equal (degenerate worst case: zero pruning)
  - one-sided 16384 queries → 3000 targets (merge-layer scan)
  - bidirectional 16384² with shared sorts (chamfer_big's nn_distance)

Timings include the wrapper's sort/unsort/index-remap work — the honest
end-to-end cost a caller pays. Completion forced via scalar readback of the
last dispatched result (block_until_ready unreliable on this platform).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

from rfnet_tpu.ops.chamfer import (
    _one_sided,  # noqa: F401 (xla fallback, for reference)
    _unsort_results,
    _zsort,
)
from rfnet_tpu.ops.pallas.chamfer import nn_distance_pallas
from rfnet_tpu.ops.pallas.chamfer_dyn import nn_dyn_pallas

ITERS = 10


@jax.jit
def dyn_one_sided(q, t):
    qs, qo = _zsort(q)
    ts, to = _zsort(t)
    d, i = nn_dyn_pallas(qs, ts)
    return _unsort_results(d, i, qo, to)


@jax.jit
def dyn_bidir(x1, x2):
    x1s, o1 = _zsort(x1)
    x2s, o2 = _zsort(x2)
    d1, i1 = nn_dyn_pallas(x1s, x2s)
    d2, i2 = nn_dyn_pallas(x2s, x1s)
    return _unsort_results(d1, i1, o1, o2) + _unsort_results(d2, i2, o2, o1)


@jax.jit
def dense_bidir(x1, x2):
    return nn_distance_pallas(x1, x2) + nn_distance_pallas(x2, x1)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))  # compile + warmup
    for _ in range(2):
        float(jnp.sum(fn(*args)[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(jnp.sum(outs[-1][0]))
    return (time.perf_counter() - t0) / ITERS * 1e3


def check(name, fast, ref):
    d_f, d_r = np.asarray(fast[0]), np.asarray(ref[0])
    i_f, i_r = np.asarray(fast[1]), np.asarray(ref[1])
    derr = np.abs(d_f - d_r).max()
    imatch = (i_f == i_r).mean()
    print(f"  [{name}] dist maxerr {derr:.2e}  idx match {imatch:.5f}")


def clouds(kind, b, n, seed):
    rng = np.random.RandomState(seed)
    if kind == "uniform":
        return rng.rand(b, n, 3).astype(np.float32)
    if kind == "shell":
        v = rng.randn(b, n, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True) + 1e-9
        return (0.5 + 0.02 * rng.randn(b, n, 1).astype(np.float32)) * v
    if kind == "flat":  # all z equal: zero pruning possible
        c = rng.rand(b, n, 3).astype(np.float32)
        c[..., 2] = 0.25
        return c
    raise ValueError(kind)


def main():
    b = 32
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    for kind in ("uniform", "shell", "flat"):
        q = jnp.asarray(clouds(kind, b, 16384, 1))
        t = jnp.asarray(clouds(kind, b, 16384, 2))
        ms_dense = timeit(nn_distance_pallas, q, t)
        ms_dyn = timeit(dyn_one_sided, q, t)
        print(
            f"one-sided 16384^2 {kind:8s}: dense {ms_dense:7.2f} ms   "
            f"dyn {ms_dyn:7.2f} ms   ({ms_dense / ms_dyn:4.2f}x)"
        )
        check(kind, dyn_one_sided(q, t), nn_distance_pallas(q, t))

    q = jnp.asarray(clouds("uniform", b, 16384, 3))
    t = jnp.asarray(clouds("uniform", b, 3000, 4))
    ms_dense = timeit(nn_distance_pallas, q, t)
    ms_dyn = timeit(dyn_one_sided, q, t)
    print(
        f"one-sided 16384->3000 merge : dense {ms_dense:7.2f} ms   "
        f"dyn {ms_dyn:7.2f} ms   ({ms_dense / ms_dyn:4.2f}x)"
    )
    check("merge", dyn_one_sided(q, t), nn_distance_pallas(q, t))

    x1 = jnp.asarray(clouds("uniform", b, 16384, 5))
    x2 = jnp.asarray(clouds("uniform", b, 16384, 6))
    ms_dense = timeit(dense_bidir, x1, x2)
    ms_dyn = timeit(dyn_bidir, x1, x2)
    print(
        f"bidirectional 16384^2 pair  : dense {ms_dense:7.2f} ms   "
        f"dyn {ms_dyn:7.2f} ms   ({ms_dense / ms_dyn:4.2f}x)"
    )


if __name__ == "__main__":
    main()
