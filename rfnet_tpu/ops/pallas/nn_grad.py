"""Pallas TPU kernel: banded scatter-add for the chamfer backward.

The reference's gradient kernel (`pc_distance/tf_nndistance.cu:169-194`)
scatter-adds ``-2*g[i]*(x1[i]-x2[idx[i]])`` onto the target cloud with
``atomicAdd``. On TPU, XLA lowers that scatter to a row-serialized loop —
measured ~15 ms per (32,16384,3) scatter (tools/bench_bwd_pieces.py), the
single largest cost of the train-step backward.

This kernel exploits the structure the z-sorted loss path already has
(ops/chamfer.chamfer_means): query ``i``'s argmin index ``idx[i]`` lies in a
narrow band of ``i`` because both clouds are sorted by z. The scatter then
becomes a *banded one-hot contraction*: for each target tile ``t``, only the
query tiles whose [min(idx), max(idx)] interval overlaps ``t`` can
contribute, and their contribution is

    S_p[j] = sum_i 1[idx[i]==j] * g[i] * x1[i]      (3 components)
    S_w[j] = sum_i 1[idx[i]==j] * g[i]

— an MXU matmul of the one-hot mask with a 4-row payload. The caller folds
these into the reference formula: ``d_x2[j] = -2*S_p[j] + 2*x2[j]*S_w[j]``.

Visit lists are intervals [qlo, qlo+cnt) of query tiles, precomputed in XLA
from per-tile idx ranges; over-visiting (a non-member tile inside the
interval) adds exact zeros, so interval coverage keeps the kernel exact for
ANY idx distribution — pathological inputs only cost time (bounded by the
dense mask contraction, ~1/4 the flops of the dense distance scan).

Padding contract: query lanes beyond n carry g=0 and contribute nothing;
idx is always < m so padded target rows stay zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rfnet_tpu.ops.pallas.exact_dot import onehot_select

_TILE_N = 256  # query lanes per inner step (multiple of 128)
_TILE_M = 512  # target rows per grid step (multiple of 8)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _make_kernel(tile_n: int, tile_m: int):
    def kernel(qlo_ref, qcnt_ref, x1g_ref, idx_ref, out_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        j0 = ti * tile_m
        rows = lax.broadcasted_iota(jnp.int32, (tile_m, tile_n), 0)

        def body(k, acc):
            q = qlo_ref[bi, ti] + k
            p = x1g_ref[0, :, pl.ds(q * tile_n, tile_n)]  # (4, tile_n): g*x,g*y,g*z,g
            ii = idx_ref[0, :, pl.ds(q * tile_n, tile_n)]  # (1, tile_n)
            onehot = ((ii - j0) == rows).astype(jnp.float32)  # (tile_m, tile_n)
            # the default MXU path truncates the fp32 gradient payload to
            # bf16 (caught on-chip 2026-08-18 — grad err 2.6e-4 vs XLA
            # autodiff); the 3-pass payload split keeps the scatter sums
            # exact at half the HIGHEST cost (ops/pallas/exact_dot.py)
            return acc + onehot_select(
                onehot, p, dimension_numbers=(((1,), (1,)), ((), ()))
            )  # (tile_m, 4)

        acc = lax.fori_loop(
            0, qcnt_ref[bi, ti], body, jnp.zeros((tile_m, 4), jnp.float32)
        )
        out_ref[0] = jnp.pad(acc, ((0, 0), (0, out_ref.shape[2] - 4)))

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "tile_n", "tile_m"))
def nn_grad_scatter(
    x1_sorted: jax.Array,
    g: jax.Array,
    idx: jax.Array,
    m: int,
    *,
    tile_n: int = _TILE_N,
    tile_m: int = _TILE_M,
):
    """Banded equivalent of ``scatter_add(zeros(b,m,4), idx, [g*x1, g])``.

    Args: ``x1_sorted (b,n,3)`` z-sorted queries, ``g (b,n)`` per-query
    gradient scale, ``idx (b,n)`` int32 argmins into a z-sorted target cloud
    of ``m`` points. Returns ``(S_p (b,m,3), S_w (b,m))`` with
    ``S_p[j] = Σ_{i: idx[i]=j} g[i]·x1[i]`` and ``S_w[j] = Σ g[i]``.

    Exact for any idx (band intervals only bound WHICH tiles are visited,
    membership is re-tested by the one-hot compare).
    """
    b, n, _ = x1_sorted.shape
    tile_n = min(tile_n, _round_up(n, 128))
    tile_m = min(tile_m, _round_up(m, 8))
    n_pad = _round_up(n, tile_n)
    m_pad = _round_up(m, tile_m)
    nt, mt = n_pad // tile_n, m_pad // tile_m

    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, n_pad - n)))
    x1p = jnp.pad(x1_sorted.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    x1g = jnp.concatenate(
        [x1p.transpose(0, 2, 1) * gp[:, None, :], gp[:, None, :]], axis=1
    )  # (b, 4, n_pad)
    idxp = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, n_pad - n)))[:, None, :]

    # per-query-tile idx ranges over REAL lanes (pad lanes excluded so they
    # never widen a band; their g=0 makes over-visits exact zeros anyway)
    lane = jnp.arange(n_pad).reshape(1, nt, tile_n)
    it = idxp[:, 0, :].reshape(b, nt, tile_n)
    lo_q = jnp.min(jnp.where(lane < n, it, m), axis=2)  # (b, nt)
    hi_q = jnp.max(jnp.where(lane < n, it, -1), axis=2)
    # query tile q touches target tile t iff its idx interval overlaps t
    t_lo = jnp.arange(mt) * tile_m  # (mt,)
    member = (lo_q[:, :, None] <= t_lo[None, None, :] + (tile_m - 1)) & (
        hi_q[:, :, None] >= t_lo[None, None, :]
    )  # (b, nt, mt)
    q_iota = jnp.arange(nt)[None, :, None]
    qlo = jnp.min(jnp.where(member, q_iota, nt), axis=1).astype(jnp.int32)  # (b, mt)
    qhi = jnp.max(jnp.where(member, q_iota, -1), axis=1).astype(jnp.int32)
    qcnt = jnp.maximum(qhi - qlo + 1, 0)
    qlo = jnp.minimum(qlo, nt - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # qlo, qcnt ride SMEM
        grid=(b, mt),
        in_specs=[
            pl.BlockSpec(
                (1, 4, n_pad), lambda bi, ti, *_: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, n_pad), lambda bi, ti, *_: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_m, 8), lambda bi, ti, *_: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _make_kernel(tile_n, tile_m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m_pad, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # typical band: a handful of query tiles per target tile
            flops=8 * b * mt * tile_m * tile_n,
            bytes_accessed=4 * b * (5 * n_pad + 8 * m_pad),
            transcendentals=0,
        ),
    )(qlo, qcnt, x1g, idxp)
    return out[:, :m, :3], out[:, :m, 3]
