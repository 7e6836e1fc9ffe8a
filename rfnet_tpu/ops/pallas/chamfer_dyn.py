"""Pallas TPU kernel: EXACT one-sided NN scan with dynamic early exit.

Third-generation pruning attempt for the chamfer bottleneck (the train step
spends ~208 of 356 ms in four one-sided 16384² scans, see CLAUDE.md). The
round-1/2 studies established two facts this design is built on:

  1. the dense scan (ops/pallas/chamfer.py) is VPU-COMPUTE-bound, not
     load-bound — sharing target tiles across scans gains nothing;
  2. ``pl.when`` is PREDICATED on this Mosaic version — a guarded tile costs
     the same as an executed one (ops/pallas/chamfer_pruned.py measured
     64-77 ms vs 52 ms dense), so pruning must remove loop *iterations*, not
     mask them.

Here the grid is only (b, n_tiles); the entire z-SORTED target cloud lives in
VMEM (16384·3 fp32 = 196 KB) and each query tile walks target slabs with a
``lax.while_loop`` — a genuinely data-dependent trip count. Slabs are visited
two-pointer style outward from the diagonal (quantile-matched) slab; because
both clouds are z-sorted, slab z-ranges are monotone, so once the z-gap² of
both frontier slabs exceeds the tile's worst per-query best distance, no
remaining slab can improve any query and the loop exits. Iterations that do
not run cost nothing — this is real work skipped, unlike predication.

Exactness: the break condition compares against ``max over valid queries of
(best_e + |q|²)`` and uses ``<=`` to keep scanning through equal-distance
slabs; ties resolve to the LOWEST target index globally (the update keeps an
equal-distance candidate only when its index is smaller), which is exactly the
dense kernel's first-tie semantics under its index-ordered visit. Distances
use the identical ``|t|² − 2·q·t`` op chain, so results are bit-equal.

Reference: forward of ``NmDistanceKernel`` (`pc_distance/tf_nndistance.cu:
5-127`); the CUDA kernel scans all of xyz2 through shared-memory chunks — the
early exit is new capability, enabled by the z-sort the wrapper applies
(ops/chamfer.py).

MEASURED (v5e-1, b32, fp32, kernel on pre-sorted 16384² clouds; sweep in
tools/bench_chamfer_dyn2.py): 12.3 ms vs 49.7 ms dense (4.0×) at the chosen
tile_n=256/tile_m=512/rounds=2; all-z-equal worst case (zero pruning
possible) 58.5 ms = dense + 18%. Wrapper overhead measured separately:
one variadic z-sort 7 ms, naive unsort/remap gathers ~18 ms — which is why
the LOSS path (ops/chamfer.chamfer_means) stays entirely in sorted space
and never unsorts in the forward. The train-loss dispatch uses this kernel
for pair counts ≥ 2²⁵; the dense kernel keeps smaller scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256  # query lanes per grid step (multiple of 128)
_TILE_M = 512  # targets per slab (multiple of 8); thinner slabs prune tighter
_PAD_COORD = 1.0e18


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _make_kernel(
    n: int, tile_n: int, tile_m: int, nt: int, mt: int, rounds: int
):
    def kernel(zlo_ref, zhi_ref, x1t_ref, x2_ref, dist_ref, idx_ref, best_e, best_i):
        bi = pl.program_id(0)
        ni = pl.program_id(1)

        x1 = x1t_ref[0]  # (3, tile_n) queries, coordinate-major, z-sorted
        s1 = jnp.sum(x1 * x1, axis=0, keepdims=True)  # (1, tile_n)
        lanes = lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + ni * tile_n
        valid = lanes < n
        # query tile z-range over REAL lanes only (pad lanes sit at 0.0)
        qz = x1[2:3, :]
        q_zlo = jnp.min(jnp.where(valid, qz, jnp.inf))
        q_zhi = jnp.max(jnp.where(valid, qz, -jnp.inf))

        # padded lanes start at -inf: they never update and never veto the
        # break (their best_e + s1 stays -inf in the max)
        best_e[...] = jnp.where(valid, jnp.inf, -jnp.inf).astype(jnp.float32)
        best_i[...] = jnp.zeros((1, tile_n), jnp.int32)

        def process(phys):
            """Scan slab ``phys``: identical op chain to the dense kernel."""
            x2 = x2_ref[0, pl.ds(phys * tile_m, tile_m), :]  # (tile_m, 3)
            s2 = jnp.sum(x2 * x2, axis=1, keepdims=True)  # (tile_m, 1)
            cross = (
                x2[:, 0:1] * x1[0:1, :]
                + x2[:, 1:2] * x1[1:2, :]
                + x2[:, 2:3] * x1[2:3, :]
            )
            e = s2 - 2.0 * cross  # (tile_m, tile_n)
            lmin = jnp.min(e, axis=0, keepdims=True)
            larg = (
                jnp.argmin(e, axis=0).astype(jnp.int32)[None, :] + phys * tile_m
            )
            prev_e = best_e[...]
            prev_i = best_i[...]
            # global lowest-index tie-break, independent of visit order
            upd = (lmin < prev_e) | ((lmin == prev_e) & (larg < prev_i))
            best_i[...] = jnp.where(upd, larg, prev_i)
            best_e[...] = jnp.where(upd, lmin, prev_e)

        anchor = jnp.minimum((ni * mt) // nt, mt - 1)

        def frontier_gaps(up, dn):
            """Squared z-gap of the two unvisited frontier slabs (inf when a
            side is exhausted). Slab z-ranges are monotone (sorted cloud), so
            these lower-bound every remaining slab on their side."""
            gup = jnp.where(
                up < mt, zlo_ref[bi, jnp.minimum(up, mt - 1)] - q_zhi, jnp.inf
            )
            gdn = jnp.where(
                dn >= 0, q_zlo - zhi_ref[bi, jnp.maximum(dn, 0)], jnp.inf
            )
            return jnp.maximum(gup, 0.0), jnp.maximum(gdn, 0.0)

        def cond(carry):
            up, dn, max_bd = carry
            gup, gdn = frontier_gaps(up, dn)
            g = jnp.minimum(gup, gdn)
            # <= keeps equal-distance slabs in play for exact tie parity
            return (g * g <= max_bd) & ((up < mt) | (dn >= 0))

        def round_body(carry):
            """Process ``rounds`` slabs back-to-back, then one break check:
            the inner fori has no data-dependent control flow, so its tile
            scans pipeline; the expensive vector→scalar max reduction runs
            once per round instead of once per slab. Over-processing past the
            break point is harmless (results only converge to the full-scan
            answer) and bounded by rounds−1 slabs."""
            up, dn, _ = carry

            def one(_, ptrs):
                up2, dn2 = ptrs
                gup, gdn = frontier_gaps(up2, dn2)
                take_up = gup <= gdn
                process(
                    jnp.where(take_up, jnp.minimum(up2, mt - 1), jnp.maximum(dn2, 0))
                )
                return (
                    jnp.where(take_up, up2 + 1, up2),
                    jnp.where(take_up, dn2, dn2 - 1),
                )

            up, dn = lax.fori_loop(0, rounds, one, (up, dn))
            max_bd = jnp.max(jnp.where(valid, best_e[...] + s1, -jnp.inf))
            # conservative 4-ulp inflation: the frontier bound g² is computed
            # through a DIFFERENT op chain than the candidate distances
            # (|t|²−2qt vs (zlo−qz)²), so at ulp-scale near-ties a slab whose
            # rounded g² lands just above max_bd could still hold a candidate
            # whose rounded distance lands just below it. Widening the bound
            # by 4 ulps makes the break airtight; extra slabs scanned can only
            # confirm (the update keeps the global min / lowest tie index).
            max_bd = max_bd + 4.8e-7 * jnp.abs(max_bd)
            return up, dn, max_bd

        lax.while_loop(cond, round_body, (anchor, anchor - 1, jnp.inf))

        d = jnp.maximum(best_e[...] + s1, 0.0)
        dist_ref[0] = jnp.broadcast_to(d, dist_ref.shape[1:])
        idx_ref[0] = jnp.broadcast_to(best_i[...], idx_ref.shape[1:])

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "rounds"))
def nn_dyn_pallas(
    xyz1_sorted: jax.Array,
    xyz2_sorted: jax.Array,
    *,
    tile_n: int = _TILE_N,
    tile_m: int = _TILE_M,
    rounds: int = 2,
):
    """One-sided NN over z-SORTED clouds: (dist² (b,n), idx (b,n) into sorted xyz2).

    Exact (bit-equal distances to the dense kernel, lowest-index ties); the
    z-sort only affects how much of the scan the early exit skips.
    """
    b, n, _ = xyz1_sorted.shape
    m = xyz2_sorted.shape[1]
    tile_n = min(tile_n, _round_up(n, 128))
    tile_m = min(tile_m, _round_up(m, 8))
    n_pad = _round_up(n, tile_n)
    m_pad = _round_up(m, tile_m)
    nt, mt = n_pad // tile_n, m_pad // tile_m

    x1t = jnp.pad(
        xyz1_sorted.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, 0), (0, n_pad - n)),
    )  # (b, 3, n_pad); pad lanes masked inside the kernel
    x2 = jnp.pad(
        xyz2_sorted.astype(jnp.float32),
        ((0, 0), (0, m_pad - m), (0, 0)),
        constant_values=_PAD_COORD,
    )  # (b, m_pad, 3); padded targets sit astronomically far away

    # per-slab z-ranges over REAL points (padded targets excluded so the last
    # slab's range stays finite and tight)
    z = x2[..., 2].reshape(b, mt, tile_m)
    tvalid = jnp.arange(m_pad).reshape(1, mt, tile_m) < m
    zlo = jnp.min(jnp.where(tvalid, z, jnp.inf), axis=2)  # (b, mt)
    zhi = jnp.max(jnp.where(tvalid, z, -jnp.inf), axis=2)

    grid = (b, nt)
    kernel = _make_kernel(n, tile_n, tile_m, nt, mt, rounds)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # zlo, zhi ride SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 3, tile_n), lambda bi, ni, *_: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
            # the whole sorted target cloud; constant across ni so Pallas
            # fetches it once per batch element
            pl.BlockSpec(
                (1, m_pad, 3), lambda bi, ni, *_: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni, *_: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni, *_: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_n), jnp.float32),
            pltpu.VMEM((1, tile_n), jnp.int32),
        ],
    )
    dist, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # the (m_pad, 3) whole-cloud block pads its 3 coords to 128 lanes in
        # VMEM (~8.4 MB at m=16384) and is double-buffered — beyond the 16 MB
        # default scoped limit but far inside the chip's 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # average-case estimate: ~1/4 of the dense pair count
            flops=max(9 * b * n_pad * m_pad // 4, 1),
            bytes_accessed=4 * b * (3 * n_pad + 3 * m_pad + 2 * n_pad),
            transcendentals=0,
        ),
    )(zlo, zhi, x1t, x2)
    return dist[:, 0, :n], idx[:, 0, :n]
