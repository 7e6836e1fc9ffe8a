"""Pallas TPU kernel: one-sided nearest-neighbour min/argmin scan.

Computes, for every point of ``xyz1 (b, n, 3)``, the squared distance to and
index of its nearest neighbour in ``xyz2 (b, m, 3)`` — the forward of the
reference ``NmDistanceKernel`` (`pc_distance/tf_nndistance.cu:5-127`). Where
the CUDA kernel tiles xyz2 through 512-point shared-memory chunks, this kernel
walks a (b, n_tiles, m_tiles) grid keeping the running (min, argmin) for the
current n-tile in VMEM scratch; the (TILE_N × TILE_M) distance tile lives only
in registers/VMEM and is never written to HBM.

Layout note: distances are computed as a (TILE_M sublane × TILE_N lane) tile
from xyz1 supplied coordinate-major (b, 3, n) and xyz2 point-major (b, m, 3),
so both the per-coordinate broadcasts and the axis-0 min/argmin reductions map
directly onto the VPU with no transposes.

Variant study (tools/bench_chamfer_variants.py; v5e-1, 16384² b32, round 2):
this kernel re-measured 49.4 ms; explicit fma-folding of the distance chain
51.9 ms; equality-based argmin (min + masked-iota-min) 53.8 ms; both 53.8 ms
— Mosaic already emits near-optimal code, so this formulation stays. The
scan is VPU-compute-bound, NOT load-bound: batching cd3/cd4's four scans to
share gt tiles (one 32768-query scan + one stacked-target scan) measured
192.44 ms vs 192.37 ms for four separate dispatches — exactly zero gain —
so the loss keeps independent calls. (Round-1 studies: MXU fp32 K=3 dot ~2×
slower; fused bidirectional sweep 3.6× slower; bbox-pruned z-sorted variant
in chamfer_pruned.py 64-77 ms.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256  # lanes (multiple of 128)
_TILE_M = 1024  # sublanes (multiple of 8); d2 tile = 1 MB fp32
_PAD_COORD = 1.0e18  # padding coordinate => squared distance ~1e36, never the min


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _kernel(x1t_ref, x2_ref, dist_ref, idx_ref, best_e, best_i):
    """Tile scan of e = |x2|² − 2·x1·x2 (the query norm |x1|² is a per-query
    constant: it cannot change the argmin over targets, so it is added once
    at the very end instead of once per pair)."""
    mi = pl.program_id(2)
    mt = pl.num_programs(2)

    @pl.when(mi == 0)
    def _init():
        best_e[...] = jnp.full(best_e.shape, jnp.inf, jnp.float32)
        best_i[...] = jnp.zeros(best_i.shape, jnp.int32)

    x1 = x1t_ref[0]  # (3, TILE_N) queries, coordinate-major
    x2 = x2_ref[0]  # (TILE_M, 3) targets
    # VPU broadcast dot: an MXU fp32 dot here is SLOWER (K=3 padded to 128 ×
    # 6 exact-fp32 passes ≈ 2× the VPU cost — measured); the VPU pays
    # 6 ops/pair for e = |x2|² − 2·x1·x2 with |x2|² folded into the fma
    s2 = jnp.sum(x2 * x2, axis=1, keepdims=True)  # (TILE_M, 1)
    cross = (
        x2[:, 0:1] * x1[0:1, :]
        + x2[:, 1:2] * x1[1:2, :]
        + x2[:, 2:3] * x1[2:3, :]
    )  # (TILE_M, TILE_N)
    e = s2 - 2.0 * cross
    lmin = jnp.min(e, axis=0, keepdims=True)  # (1, TILE_N)
    larg = jnp.argmin(e, axis=0).astype(jnp.int32)[None, :] + mi * e.shape[0]
    upd = lmin < best_e[...]  # strict < keeps the first (lowest-index) tie
    best_i[...] = jnp.where(upd, larg, best_i[...])
    best_e[...] = jnp.where(upd, lmin, best_e[...])

    @pl.when(mi == mt - 1)
    def _write():
        s1 = jnp.sum(x1 * x1, axis=0, keepdims=True)  # (1, TILE_N)
        d = jnp.maximum(best_e[...] + s1, 0.0)
        # outputs carry an 8-row sublane band (Mosaic's min tile height);
        # every row holds the same result and the caller keeps row 0.
        dist_ref[0] = jnp.broadcast_to(d, dist_ref.shape[1:])
        idx_ref[0] = jnp.broadcast_to(best_i[...], idx_ref.shape[1:])


def _make_coords_kernel(tile_m: int, mt: int):
    def kernel(x1t_ref, x2all_ref, dist_ref, nn_ref, best_e, best_i):
        """Min/argmin scan + a SINGLE post-loop recovery of the argmin's
        COORDINATES (one-hot equality mask against the whole target cloud,
        contracted on the MXU) — replacing the XLA ``take_along_axis`` gather
        the merge layer would otherwise run (~6.7 ms at (32,16384,3)).

        The target axis is an in-kernel static-bound ``fori_loop`` over the
        VMEM-resident cloud rather than a grid dimension: ``pl.when``
        PREDICATES on this Mosaic version, so a grid-step recovery guard paid
        the (m_pad × TILE_N) compare + K=m_pad matmul on EVERY step — at the
        merge shape (m_pad 3072, 6 steps) roughly doubling the kernel. The
        cloud is resident for the recovery anyway, so the loop loses no DMA
        pipelining; the recovery now runs exactly once per query tile.
        """
        x1 = x1t_ref[0]  # (3, TILE_N)
        x2a = x2all_ref[0]  # (m_pad, 3) — whole padded target cloud
        best_e[...] = jnp.full(best_e.shape, jnp.inf, jnp.float32)
        best_i[...] = jnp.zeros(best_i.shape, jnp.int32)

        def body(mi, _):
            x2 = x2all_ref[0, pl.ds(mi * tile_m, tile_m), :]  # (TILE_M, 3)
            s2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
            cross = (
                x2[:, 0:1] * x1[0:1, :]
                + x2[:, 1:2] * x1[1:2, :]
                + x2[:, 2:3] * x1[2:3, :]
            )
            e = s2 - 2.0 * cross
            lmin = jnp.min(e, axis=0, keepdims=True)
            larg = jnp.argmin(e, axis=0).astype(jnp.int32)[None, :] + mi * tile_m
            upd = lmin < best_e[...]  # strict <: first (lowest-index) tie wins
            best_i[...] = jnp.where(upd, larg, best_i[...])
            best_e[...] = jnp.where(upd, lmin, best_e[...])
            return 0

        lax.fori_loop(0, mt, body, 0)

        s1 = jnp.sum(x1 * x1, axis=0, keepdims=True)
        d = jnp.maximum(best_e[...] + s1, 0.0)
        dist_ref[0] = jnp.broadcast_to(d, dist_ref.shape[1:])
        # one-hot gather on the VPU: rows == best_i is exact-single per lane
        # (best_i is one index), so the masked column sum returns exactly
        # x2[best_i] — bit-exact in ONE pass (0/1-masked products are exact;
        # each lane's sum has exactly one nonzero term). The MXU form of the
        # same contraction truncates fp32 payloads to bf16 (quantized coords
        # to ~1/256, caught by tools/verify_onchip.py 2026-08-18) and even
        # the 3-pass exact_dot repair pays K=m_pad matmuls with N=3 padded
        # to 128 lanes — ~6× the cost of the distance scan itself at the
        # merge shape (b32, n16384, m3072). Masked sublane reduction over
        # the resident cloud costs the same as one extra e-pass.
        rows = jax.lax.broadcasted_iota(jnp.int32, (x2a.shape[0], best_i.shape[1]), 0)
        onehot = rows == best_i[...]  # (m_pad, TILE_N) bool
        nn_t = jnp.concatenate(
            [
                jnp.sum(jnp.where(onehot, x2a[:, c : c + 1], 0.0), axis=0, keepdims=True)
                for c in range(3)
            ],
            axis=0,
        )  # (3, TILE_N) coordinate-major
        nn_ref[0] = jnp.pad(nn_t, ((0, nn_ref.shape[1] - 3), (0, 0)))

    return kernel


@functools.partial(jax.jit, static_argnames=())
def nn_coords_pallas(xyz1: jax.Array, xyz2: jax.Array):
    """One-sided NN with fused coordinate lookup:
    (dist² (b, n), nn_coords (b, n, 3) = xyz2[argmin]).

    Identical distance/tie semantics to :func:`nn_distance_pallas`; built for
    the merge layer (`vv_recon.py:132-139`), which consumes the neighbour's
    coordinates, not its index.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tile_n = min(_TILE_N, _round_up(n, 128))
    tile_m = min(_TILE_M, _round_up(m, 8))
    n_pad = _round_up(n, tile_n)
    m_pad = _round_up(m, tile_m)

    x1t = jnp.pad(
        xyz1.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, 0), (0, n_pad - n)),
    )
    x2 = jnp.pad(
        xyz2.astype(jnp.float32),
        ((0, 0), (0, m_pad - m), (0, 0)),
        constant_values=_PAD_COORD,
    )

    mt = m_pad // tile_m
    grid = (b, n_pad // tile_n)
    dist, nn = pl.pallas_call(
        _make_coords_kernel(tile_m, mt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM),
            # the WHOLE (padded) target cloud, VMEM-resident: the in-kernel
            # fori slices scan tiles from it and the final one-hot gather
            # contracts against it (constant across ni — fetched per batch)
            pl.BlockSpec((1, m_pad, 3), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
            # coords come out coordinate-major (8-row sublane band, rows 0-2
            # real) — the natural layout of the per-coordinate masked sums;
            # the caller transposes the (b, 3, n) slice back to point-major
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_n), jnp.float32),
            pltpu.VMEM((1, tile_n), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=9 * b * n_pad * m_pad,
            bytes_accessed=4 * b * (3 * n_pad + 3 * m_pad + 5 * n_pad),
            transcendentals=0,
        ),
    )(x1t, x2)
    return dist[:, 0, :n], nn[:, :3, :n].transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=())
def nn_distance_pallas(xyz1: jax.Array, xyz2: jax.Array):
    """One-sided NN scan: (dist (b, n) squared, idx (b, n) int32)."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tile_n = min(_TILE_N, _round_up(n, 128))
    tile_m = min(_TILE_M, _round_up(m, 8))
    n_pad = _round_up(n, tile_n)
    m_pad = _round_up(m, tile_m)

    x1t = jnp.pad(
        xyz1.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, 0), (0, n_pad - n)),
    )  # (b, 3, n_pad); padded queries produce garbage rows sliced off below
    x2 = jnp.pad(
        xyz2.astype(jnp.float32),
        ((0, 0), (0, m_pad - m), (0, 0)),
        constant_values=_PAD_COORD,
    )  # (b, m_pad, 3); padded targets sit astronomically far away

    grid = (b, n_pad // tile_n, m_pad // tile_m)
    dist, idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda bi, ni, mi: (bi, 0, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda bi, ni, mi: (bi, mi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni, mi: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni, mi: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_n), jnp.float32),
            pltpu.VMEM((1, tile_n), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * b * n_pad * m_pad,
            bytes_accessed=4 * b * (3 * n_pad + 3 * m_pad + 2 * n_pad),
            transcendentals=0,
        ),
    )(x1t, x2)
    return dist[:, 0, :n], idx[:, 0, :n]
