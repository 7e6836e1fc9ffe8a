"""Pallas TPU kernel: EXACT one-sided NN scan with 3D best-first tile pruning.

Fourth-generation pruning design for the chamfer bottleneck. The round-3
step-time attribution (CLAUDE.md) showed the z-slab early-exit kernel
(ops/pallas/chamfer_dyn.py) is DATA-DEPENDENT in the worst way for training:
on real (untrained) model outputs cd34 f+b costs 118 ms vs 65 ms on random
clouds, because a z-sorted slab is a horizontal SHELL spanning the full x/y
extent — when the query cloud is a blob in the z-middle of the target, the
1D z-gap bound stays near zero for most slabs and prunes almost nothing.

This kernel prunes in all three dimensions:

  * both clouds are sorted by MORTON code (bit-interleaved quantized xyz),
    so a run of ``tile_m`` consecutive target points is a spatially COMPACT
    box, not a shell, and a run of ``tile_n`` queries likewise;
  * per target tile the wrapper precomputes an axis-aligned bounding box;
    the kernel lower-bounds the distance from the query tile's AABB to each
    target tile's AABB (the classic BVH bound: per-axis gap, squared, summed);
  * tiles are visited BEST-FIRST (smallest current bound first, greedy argmin
    over a masked bounds vector held in VMEM scratch) — the most promising
    tiles collapse ``max_bd`` fastest, so the loop exits after a handful of
    tiles regardless of where the query cloud sits inside the target.

Exactness argument is the same as chamfer_dyn's: the AABB gap lower-bounds
the true distance from every query lane in the tile to every point of the
target tile, the break compares ``bound² … <= max over valid lanes of
(best_e + |q|²)`` inflated by 4 ulps (bound and candidate distances come from
different op chains), and the tile-local update keeps an equal-distance
candidate only when its (sorted-space) index is smaller — so distances are
bit-equal to the dense kernel and ties resolve to the globally lowest sorted
index, independent of visit order. Re-processing a tile is an exact no-op,
which makes over-processing past the break (bounded by ``rounds−1`` tiles)
and the degenerate all-visited pick both harmless.

Reference: forward of ``NmDistanceKernel`` (`pc_distance/tf_nndistance.cu:
5-127`) — the CUDA kernel scans all of xyz2; the 3D pruning is new
capability enabled by the Morton sort the wrapper applies (ops/chamfer.py).

The while_loop/dynamic-slab-load skeleton is inherited from chamfer_dyn.py —
``pl.when`` predicates on this Mosaic version, so pruning must remove loop
iterations (see that module's header for the measured history).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256  # query lanes per grid step (multiple of 128)
_TILE_M = 512  # targets per tile (multiple of 8); smaller boxes prune tighter
_PAD_COORD = 1.0e18
_LANES = 128  # bounds-vector lane width (min TPU vector register width)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def morton_code(x: jax.Array, bits: int = 10) -> jax.Array:
    """(b, n, 3) float cloud → (b, n) int32 Morton (Z-order) key.

    Coordinates are normalized per cloud to its own AABB, quantized to
    ``bits`` bits per axis and bit-interleaved (x lowest). 3·10 = 30 bits
    fits int32 with the sign bit clear. Any spatially-coherent order works
    for the kernel's correctness; Morton maximizes tile compactness per sort.
    """
    lo = jnp.min(x, axis=1, keepdims=True)
    hi = jnp.max(x, axis=1, keepdims=True)
    u = (x - lo) / jnp.maximum(hi - lo, 1e-12)
    scale = float(1 << bits)
    q = jnp.clip((u * scale).astype(jnp.int32), 0, (1 << bits) - 1)

    def spread(v):  # 10 bits → one bit every 3 positions (magic-mask spread)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return spread(q[..., 0]) | (spread(q[..., 1]) << 1) | (spread(q[..., 2]) << 2)


def sort_by_morton_with_order(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Morton-sort a cloud carrying coords + original indices as payload
    (ONE variadic lax.sort, same structure/cost class as
    ops/chamfer.sort_by_z_with_order)."""
    b, n, _ = x.shape
    code = morton_code(x)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    _, x0, x1, x2, order = lax.sort(
        (code, x[..., 0], x[..., 1], x[..., 2], iota), dimension=1, num_keys=1
    )
    return jnp.stack([x0, x1, x2], axis=-1), order


def _make_kernel(n: int, tile_n: int, tile_m: int, mt: int, rounds: int):
    def kernel(x1t_ref, x2_ref, aabb_ref, dist_ref, idx_ref, best_e, best_i, bnd):
        ni = pl.program_id(1)

        x1 = x1t_ref[0]  # (3, tile_n) queries, coordinate-major, Morton-sorted
        s1 = jnp.sum(x1 * x1, axis=0, keepdims=True)  # (1, tile_n)
        lanes = lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + ni * tile_n
        valid = lanes < n

        # query-tile AABB over REAL lanes only (pad lanes sit at 0.0)
        def vrange(row):
            v = x1[row : row + 1, :]
            return (
                jnp.min(jnp.where(valid, v, jnp.inf)),
                jnp.max(jnp.where(valid, v, -jnp.inf)),
            )

        qxlo, qxhi = vrange(0)
        qylo, qyhi = vrange(1)
        qzlo, qzhi = vrange(2)

        # AABB-to-AABB squared lower bounds, one lane per target tile.
        # Padded lanes carry lo=+inf / hi=−inf → bound = +inf → never picked.
        a = aabb_ref[0]  # (8, LANES): xlo xhi ylo yhi zlo zhi pad pad

        def gap(lo_row, hi_row, qlo, qhi):
            tlo = a[lo_row : lo_row + 1, :]
            thi = a[hi_row : hi_row + 1, :]
            return jnp.maximum(jnp.maximum(tlo - qhi, qlo - thi), 0.0)

        gx = gap(0, 1, qxlo, qxhi)
        gy = gap(2, 3, qylo, qyhi)
        gz = gap(4, 5, qzlo, qzhi)
        bnd[...] = gx * gx + gy * gy + gz * gz  # (1, LANES) squared bounds

        # padded query lanes start at −inf: they never update and never veto
        # the break (their best_e + s1 stays −inf in the max)
        best_e[...] = jnp.where(valid, jnp.inf, -jnp.inf).astype(jnp.float32)
        best_i[...] = jnp.zeros((1, tile_n), jnp.int32)

        tl_iota = lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

        def process(phys):
            """Scan tile ``phys``: identical op chain to the dense kernel."""
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

        def cond(carry):
            cnt, max_bd = carry
            bmin = jnp.min(bnd[...])
            # <= keeps equal-bound tiles in play for exact tie parity; the
            # cnt guard terminates once every tile is visited (all-inf bounds
            # would otherwise satisfy inf <= inf forever when max_bd = inf)
            return (bmin <= max_bd) & (cnt < mt)

        def round_body(carry):
            """Process ``rounds`` best-first tiles back-to-back, then one
            break check: the inner fori has no data-dependent control flow,
            so its tile scans pipeline; the vector→scalar max reduction runs
            once per round. Over-processing past the break point is harmless
            (re-confirms the same minima) and bounded by rounds−1 tiles."""
            cnt, _ = carry

            def one(_, c):
                b = bnd[...]
                bmin = jnp.min(b)
                # lowest-index argmin via min-where (deterministic on ties);
                # when all lanes are +inf this picks lane 0 — re-processing a
                # visited tile is an exact no-op (see module docstring)
                t = jnp.min(jnp.where(b == bmin, tl_iota, mt))
                t = jnp.minimum(t, mt - 1)
                process(t)
                bnd[...] = jnp.where(tl_iota == t, jnp.inf, b)
                return c + 1

            cnt = lax.fori_loop(0, rounds, one, cnt)
            max_bd = jnp.max(jnp.where(valid, best_e[...] + s1, -jnp.inf))
            # conservative 4-ulp inflation: the AABB bound is computed through
            # a DIFFERENT op chain than the candidate distances (per-axis gaps
            # squared vs |t|²−2qt), so at ulp-scale near-ties a tile whose
            # rounded bound lands just above max_bd could still hold a
            # candidate whose rounded distance lands just below it. Widening
            # the bound makes the break airtight; extra tiles scanned can only
            # confirm (the update keeps the global min / lowest tie index).
            max_bd = max_bd + 4.8e-7 * jnp.abs(max_bd)
            return cnt, max_bd

        lax.while_loop(cond, round_body, (jnp.int32(0), jnp.inf))

        d = jnp.maximum(best_e[...] + s1, 0.0)
        dist_ref[0] = jnp.broadcast_to(d, dist_ref.shape[1:])
        idx_ref[0] = jnp.broadcast_to(best_i[...], idx_ref.shape[1:])

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "rounds"))
def nn_tile_pallas(
    xyz1_sorted: jax.Array,
    xyz2_sorted: jax.Array,
    *,
    tile_n: int = _TILE_N,
    tile_m: int = _TILE_M,
    rounds: int = 2,
):
    """One-sided NN over spatially-sorted clouds: (dist² (b,n), idx (b,n)
    into sorted xyz2).

    Exact for ANY input order (bit-equal distances to the dense kernel,
    lowest-sorted-index ties); the Morton sort only affects how much of the
    scan the 3D best-first pruning skips. ``mt = ceil(m/tile_m)`` must be
    ≤ 128 (one bounds lane per target tile); all loss/eval shapes satisfy it.
    """
    b, n, _ = xyz1_sorted.shape
    m = xyz2_sorted.shape[1]
    tile_n = min(tile_n, _round_up(n, 128))
    tile_m = min(tile_m, _round_up(m, 8))
    n_pad = _round_up(n, tile_n)
    m_pad = _round_up(m, tile_m)
    nt, mt = n_pad // tile_n, m_pad // tile_m
    if mt > _LANES:
        raise ValueError(f"target tile count {mt} exceeds {_LANES} bound lanes")

    x1t = jnp.pad(
        xyz1_sorted.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, 0), (0, n_pad - n)),
    )  # (b, 3, n_pad); pad lanes masked inside the kernel
    x2 = jnp.pad(
        xyz2_sorted.astype(jnp.float32),
        ((0, 0), (0, m_pad - m), (0, 0)),
        constant_values=_PAD_COORD,
    )  # (b, m_pad, 3); padded targets sit astronomically far away

    # per-tile AABBs over REAL points (padded targets excluded: a lane whose
    # tile is all padding gets lo=+inf / hi=−inf → bound inf → never visited)
    pts = x2.reshape(b, mt, tile_m, 3)
    tvalid = (jnp.arange(m_pad).reshape(1, mt, tile_m, 1) < m)
    lo = jnp.min(jnp.where(tvalid, pts, jnp.inf), axis=2)  # (b, mt, 3)
    hi = jnp.max(jnp.where(tvalid, pts, -jnp.inf), axis=2)
    rows = jnp.stack(
        [lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1], lo[..., 2], hi[..., 2]],
        axis=1,
    )  # (b, 6, mt)
    aabb = jnp.full((b, 8, _LANES), jnp.inf, jnp.float32)
    aabb = aabb.at[:, 1:6:2, :].set(-jnp.inf)  # hi rows default −inf
    aabb = aabb.at[:, :6, :mt].set(rows)

    grid = (b, nt)
    kernel = _make_kernel(n, tile_n, tile_m, mt, rounds)
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 3, tile_n), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
            # the whole sorted target cloud; constant across ni so Pallas
            # fetches it once per batch element
            pl.BlockSpec(
                (1, m_pad, 3), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, _LANES), lambda bi, ni: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_n), jnp.float32),
            pltpu.VMEM((1, tile_n), jnp.int32),
            pltpu.VMEM((1, _LANES), jnp.float32),
        ],
        # same VMEM footprint class as chamfer_dyn: the (m_pad, 3) block pads
        # its 3 coords to 128 lanes (~8.4 MB at m=16384), double-buffered
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            # best-first 3D pruning typically visits a small constant number
            # of tiles per query tile regardless of data distribution
            flops=max(9 * b * n_pad * m_pad // 8, 1),
            bytes_accessed=4 * b * (3 * n_pad + 3 * m_pad + 2 * n_pad),
            transcendentals=0,
        ),
    )(x1t, x2, aabb)
    return dist[:, 0, :n], idx[:, 0, :n]
