"""Sweep (tile_n, tile_m, rounds) of the early-exit slab kernel on-chip, plus
a sort/unsort microbench to size the wrapper overhead.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_chamfer_dyn2.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

from rfnet_tpu.ops.chamfer import _unsort_results, _zsort
from rfnet_tpu.ops.pallas.chamfer import nn_distance_pallas
from rfnet_tpu.ops.pallas.chamfer_dyn import nn_dyn_pallas

ITERS = 10


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    for _ in range(2):
        o = fn(*args)
        float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    o = outs[-1]
    float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    return (time.perf_counter() - t0) / ITERS * 1e3


def clouds(kind, b, n, seed):
    rng = np.random.RandomState(seed)
    if kind == "uniform":
        return rng.rand(b, n, 3).astype(np.float32)
    if kind == "flat":
        c = rng.rand(b, n, 3).astype(np.float32)
        c[..., 2] = 0.25
        return c
    raise ValueError(kind)


def main():
    b = 32
    print(f"devices={jax.devices()}")

    # --- sort/unsort overhead in isolation -------------------------------
    q = jnp.asarray(clouds("uniform", b, 16384, 1))

    @jax.jit
    def sort_only(x):
        xs, o = _zsort(x)
        return xs

    @jax.jit
    def sort_unsort(x):
        xs, o = _zsort(x)
        d = jnp.sum(xs, axis=-1)  # stand-in result
        i = jnp.zeros(d.shape, jnp.int32)
        return _unsort_results(d, i, o, o)

    print(f"zsort 32x16384 alone        : {timeit(sort_only, q):7.2f} ms")
    print(f"zsort+unsort+remap 32x16384 : {timeit(sort_unsort, q):7.2f} ms")

    q3 = jnp.asarray(clouds("uniform", b, 3000, 2))
    print(f"zsort 32x3000 alone         : {timeit(sort_only, q3):7.2f} ms")

    # --- kernel sweep on PRE-SORTED inputs (kernel cost only) -------------
    for kind in ("uniform", "flat"):
        qq = jnp.asarray(
            np.take_along_axis(
                clouds(kind, b, 16384, 3),
                np.argsort(clouds(kind, b, 16384, 3)[..., 2], axis=1)[..., None],
                axis=1,
            )
        )
        tt = jnp.asarray(
            np.take_along_axis(
                clouds(kind, b, 16384, 4),
                np.argsort(clouds(kind, b, 16384, 4)[..., 2], axis=1)[..., None],
                axis=1,
            )
        )
        ms_dense = timeit(nn_distance_pallas, qq, tt)
        print(f"[{kind}] dense (no sorts): {ms_dense:7.2f} ms")
        for tn in (128, 256):
            for tm in (256, 512, 1024):
                for r in (2, 4, 8):
                    fn = functools.partial(
                        nn_dyn_pallas, tile_n=tn, tile_m=tm, rounds=r
                    )
                    try:
                        ms = timeit(fn, qq, tt)
                    except Exception as e:  # noqa: BLE001
                        print(f"[{kind}] tn={tn} tm={tm:5d} r={r}: FAIL {type(e).__name__}")
                        continue
                    print(
                        f"[{kind}] tn={tn} tm={tm:5d} r={r}: {ms:7.2f} ms "
                        f"({ms_dense / ms:4.2f}x)"
                    )


if __name__ == "__main__":
    main()
