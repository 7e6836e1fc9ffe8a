"""Measure micro-variants of the one-sided NN Pallas kernel on the real chip.

Round-2 follow-up to the round-1 kernel study (ops/pallas/chamfer.py): the
train step is chamfer-bound (cd3+cd4 = 4 one-sided 16384^2 scans ~ 208 ms of
356 ms @ b32). Variants measured here:

  v0  the shipping kernel (re-measured baseline)
  v1  fma-folded distance: e = m0*q0 + (m1*q1 + (m2*q2 + s2)) with m = -2*x2,
      replacing the mul+add+sub chain (3 fma vs ~6 VPU ops per pair)
  v2  equality-argmin: lmin via jnp.min, index via min(where(e==lmin, rows))
      instead of the variadic jnp.argmin reduce
  v3  v1 + v2

Plus the structural question (VERDICT round 1): do cd3/cd4's four scans go
faster batched — concat(out3,out4) as one 32768-query scan vs gt, and
stack([gt,gt]) vs stack([out3,out4]) — than as four dispatches?

Timing: dispatch ITERS iterations, force completion with a scalar readback of
the LAST result (block_until_ready unreliable on this platform, CLAUDE.md).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256
_TILE_M = 1024
_PAD_COORD = 1.0e18
ITERS = 10


def _round_up(x, mult):
    return -(-x // mult) * mult


def make_kernel(fma: bool, eq_argmin: bool):
    def _kernel(x1t_ref, x2_ref, dist_ref, idx_ref, best_e, best_i):
        mi = pl.program_id(2)
        mt = pl.num_programs(2)

        @pl.when(mi == 0)
        def _init():
            best_e[...] = jnp.full(best_e.shape, jnp.inf, jnp.float32)
            best_i[...] = jnp.zeros(best_i.shape, jnp.int32)

        x1 = x1t_ref[0]
        x2 = x2_ref[0]
        s2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
        if fma:
            m0 = -2.0 * x2[:, 0:1]
            m1 = -2.0 * x2[:, 1:2]
            m2 = -2.0 * x2[:, 2:3]
            e = m0 * x1[0:1, :] + (m1 * x1[1:2, :] + (m2 * x1[2:3, :] + s2))
        else:
            cross = (
                x2[:, 0:1] * x1[0:1, :]
                + x2[:, 1:2] * x1[1:2, :]
                + x2[:, 2:3] * x1[2:3, :]
            )
            e = s2 - 2.0 * cross
        lmin = jnp.min(e, axis=0, keepdims=True)
        if eq_argmin:
            rows = lax.broadcasted_iota(jnp.int32, e.shape, 0)
            larg = (
                jnp.min(jnp.where(e == lmin, rows, jnp.int32(1 << 30)), axis=0,
                        keepdims=True)
                + mi * e.shape[0]
            )
        else:
            larg = jnp.argmin(e, axis=0).astype(jnp.int32)[None, :] + mi * e.shape[0]
        upd = lmin < best_e[...]
        best_i[...] = jnp.where(upd, larg, best_i[...])
        best_e[...] = jnp.where(upd, lmin, best_e[...])

        @pl.when(mi == mt - 1)
        def _write():
            s1 = jnp.sum(x1 * x1, axis=0, keepdims=True)
            d = jnp.maximum(best_e[...] + s1, 0.0)
            dist_ref[0] = jnp.broadcast_to(d, dist_ref.shape[1:])
            idx_ref[0] = jnp.broadcast_to(best_i[...], idx_ref.shape[1:])

    return _kernel


@functools.partial(jax.jit, static_argnames=("fma", "eq_argmin"))
def nn_variant(xyz1, xyz2, fma=False, eq_argmin=False):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tile_n = min(_TILE_N, _round_up(n, 128))
    tile_m = min(_TILE_M, _round_up(m, 8))
    n_pad = _round_up(n, tile_n)
    m_pad = _round_up(m, tile_m)
    x1t = jnp.pad(xyz1.astype(jnp.float32).transpose(0, 2, 1), ((0, 0), (0, 0), (0, n_pad - n)))
    x2 = jnp.pad(xyz2.astype(jnp.float32), ((0, 0), (0, m_pad - m), (0, 0)),
                 constant_values=_PAD_COORD)
    grid = (b, n_pad // tile_n, m_pad // tile_m)
    dist, idx = pl.pallas_call(
        make_kernel(fma, eq_argmin),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda bi, ni, mi: (bi, 0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda bi, ni, mi: (bi, mi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, tile_n), lambda bi, ni, mi: (bi, 0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile_n), lambda bi, ni, mi: (bi, 0, ni), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_n), jnp.float32),
            pltpu.VMEM((1, tile_n), jnp.int32),
        ],
    )(x1t, x2)
    return dist[:, 0, :n], idx[:, 0, :n]


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(jnp.sum(outs[-1][0]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    B, N = 32, 16384
    gt = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    out3 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    out4 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))

    # correctness first, on a small shape
    sm1 = jnp.asarray(rng.rand(2, 700, 3).astype(np.float32))
    sm2 = jnp.asarray(rng.rand(2, 1100, 3).astype(np.float32))
    d0, i0 = nn_variant(sm1, sm2)
    for fma in (False, True):
        for eq in (False, True):
            d, i = nn_variant(sm1, sm2, fma=fma, eq_argmin=eq)
            np.testing.assert_allclose(np.asarray(d), np.asarray(d0), atol=1e-5)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i0))
    print("small-shape parity ok (all variants)", flush=True)

    variants = [("v0 baseline", False, False), ("v1 fma", True, False),
                ("v2 eq-argmin", False, True), ("v3 fma+eq", True, True)]
    times = {}
    for name, fma, eq in variants:
        times[name] = timeit(
            f"{name} 16384^2 b32", lambda a, b, f=fma, e=eq: nn_variant(a, b, fma=f, eq_argmin=e),
            gt, out3,
        )

    best = min(times, key=times.get)
    fma, eq = dict((n, (f, e)) for n, f, e in variants)[best]
    print(f"best variant: {best}", flush=True)

    # structural: 4 separate scans vs batched
    def four_scans(gt, o3, o4):
        a = nn_variant(gt, o3, fma=fma, eq_argmin=eq)
        b = nn_variant(o3, gt, fma=fma, eq_argmin=eq)
        c = nn_variant(gt, o4, fma=fma, eq_argmin=eq)
        d = nn_variant(o4, gt, fma=fma, eq_argmin=eq)
        return (a[0] + b[0] + c[0] + d[0],)

    def batched_scans(gt, o3, o4):
        q = jnp.concatenate([o3, o4], axis=1)  # (b, 32768, 3) vs gt
        a = nn_variant(q, gt, fma=fma, eq_argmin=eq)
        tgt = jnp.concatenate([o3, o4], axis=0)  # (2b, 16384)
        qq = jnp.concatenate([gt, gt], axis=0)
        b = nn_variant(qq, tgt, fma=fma, eq_argmin=eq)
        return (jnp.sum(a[0]) + jnp.sum(b[0]),)

    timeit("four separate scans", jax.jit(four_scans), gt, out3, out4)
    timeit("batched (2 calls)", jax.jit(batched_scans), gt, out3, out4)


if __name__ == "__main__":
    main()
