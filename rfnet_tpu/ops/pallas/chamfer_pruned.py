"""Pallas TPU kernel: EXACT nearest-neighbour scan with tile pruning.

The plain scan (ops/pallas/chamfer.py) pays 8-9 VPU ops for every
(query, target) pair — O(n·m) with no escape. This kernel keeps the result
bit-exact while skipping most of that work:

  1. both clouds are sorted by their z coordinate (outside the kernel), so a
     tile of consecutive targets occupies a thin spatial slab and a tile of
     consecutive queries is spatially coherent;
  2. per target-tile bounding boxes are precomputed; inside the kernel a
     cheap per-query lower bound ``dist(query, box)²`` is tested against the
     running best — if NO query in the tile can improve, the whole
     (TILE_M × TILE_N) distance tile is skipped (`pl.when` ⇒ a real branch);
  3. target tiles are visited starting from the query tile's diagonal
     (where the nearest slab lives, since both clouds are z-sorted) and
     wrapping around, so the running best is tight after the first visit and
     the far slabs prune.

Pruning never changes the result — a tile is skipped only when its lower
bound proves it cannot contain any query's argmin (ties: the visit order is
query-major like the dense kernel; exact ties across tiles may resolve to a
different equally-near index, same as any reordering of the scan).

The sorting/unsorting permutations are applied by the wrapper in
ops/chamfer.nearest_neighbor_pruned.

MEASURED (v5e-1, 16384² b32): 76.6 ms structured / 64.2 ms uniform vs
52.1 ms for the dense kernel — the `pl.when` guard does not recover the
skipped tiles' cost on this Mosaic version (predication rather than a real
branch, plus ~12 ms of z-sorts in the wrapper), so the DENSE kernel remains
the default dispatch. Kept as a public op for workloads/toolchains where the
branch is profitable; exactness is covered by interpret-mode tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 256
_TILE_M = 1024
_PAD_COORD = 1.0e18


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _visit_to_phys(ni, mi, nt, mt):
    """Physical target-tile index for visit step mi of query tile ni:
    anchor at the z-diagonal, then wrap forward."""
    anchor = (ni * mt) // nt
    return lax.rem(anchor + mi, mt)


def _make_kernel(n: int, tile_n: int, nt: int, mt: int):
    def kernel(box_ref, x1t_ref, x2_ref, dist_ref, idx_ref, best_e, best_i):
        # box_ref is a scalar-prefetch SMEM array (b, mt, 6)
        bi = pl.program_id(0)
        ni = pl.program_id(1)
        mi = pl.program_id(2)
        phys = _visit_to_phys(ni, mi, nt, mt)
        tile_m = x2_ref.shape[1]

        x1 = x1t_ref[0]  # (3, TILE_N)
        s1 = jnp.sum(x1 * x1, axis=0, keepdims=True)  # (1, TILE_N)

        @pl.when(mi == 0)
        def _init():
            lanes = lax.broadcasted_iota(jnp.int32, (1, tile_n), 1) + ni * tile_n
            # padded query lanes start at −inf so they can never veto pruning
            best_e[...] = jnp.where(lanes < n, jnp.inf, -jnp.inf).astype(jnp.float32)
            best_i[...] = jnp.zeros((1, tile_n), jnp.int32)

        # lower bound: squared distance from each query to the tile's box
        # (box scalars live in SMEM: [lox, loy, loz, hix, hiy, hiz])
        lbx = jnp.maximum(
            jnp.maximum(
                box_ref[bi, phys, 0] - x1[0:1, :], x1[0:1, :] - box_ref[bi, phys, 3]
            ),
            0.0,
        )
        lby = jnp.maximum(
            jnp.maximum(
                box_ref[bi, phys, 1] - x1[1:2, :], x1[1:2, :] - box_ref[bi, phys, 4]
            ),
            0.0,
        )
        lbz = jnp.maximum(
            jnp.maximum(
                box_ref[bi, phys, 2] - x1[2:3, :], x1[2:3, :] - box_ref[bi, phys, 5]
            ),
            0.0,
        )
        lb = lbx * lbx + lby * lby + lbz * lbz  # (1, TILE_N) true d² bound

        @pl.when(jnp.any(lb < best_e[...] + s1))
        def _process():
            x2 = x2_ref[0]  # (TILE_M, 3)
            s2 = jnp.sum(x2 * x2, axis=1, keepdims=True)
            cross = (
                x2[:, 0:1] * x1[0:1, :]
                + x2[:, 1:2] * x1[1:2, :]
                + x2[:, 2:3] * x1[2:3, :]
            )
            e = s2 - 2.0 * cross
            lmin = jnp.min(e, axis=0, keepdims=True)
            larg = jnp.argmin(e, axis=0).astype(jnp.int32)[None, :] + phys * tile_m
            upd = lmin < best_e[...]
            best_i[...] = jnp.where(upd, larg, best_i[...])
            best_e[...] = jnp.where(upd, lmin, best_e[...])

        @pl.when(mi == mt - 1)
        def _write():
            d = jnp.maximum(best_e[...] + s1, 0.0)
            dist_ref[0] = jnp.broadcast_to(d, dist_ref.shape[1:])
            idx_ref[0] = jnp.broadcast_to(best_i[...], idx_ref.shape[1:])

    return kernel


@functools.partial(jax.jit, static_argnames=())
def nn_pruned_pallas(xyz1_sorted: jax.Array, xyz2_sorted: jax.Array):
    """One-sided NN over z-SORTED clouds. (dist² (b, n), idx into sorted xyz2)."""
    b, n, _ = xyz1_sorted.shape
    m = xyz2_sorted.shape[1]
    tile_n = min(_TILE_N, _round_up(n, 128))
    tile_m = min(_TILE_M, _round_up(m, 8))
    n_pad = _round_up(n, tile_n)
    m_pad = _round_up(m, tile_m)
    nt, mt = n_pad // tile_n, m_pad // tile_m

    x1t = jnp.pad(
        xyz1_sorted.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, 0), (0, n_pad - n)),
        constant_values=_PAD_COORD,
    )
    x2 = jnp.pad(
        xyz2_sorted.astype(jnp.float32),
        ((0, 0), (0, m_pad - m), (0, 0)),
        constant_values=_PAD_COORD,
    )
    # per-tile boxes over the REAL points only: min/max of each coordinate,
    # padding excluded so the last tile's box stays tight (padded targets sit
    # at +PAD_COORD and are pruned by construction... except they inflate the
    # box); exclude them by masking before the reduce.
    tiles = x2.reshape(b, mt, tile_m, 3)
    valid = (
        jnp.arange(m_pad).reshape(1, mt, tile_m, 1) < m
    )
    lo = jnp.min(jnp.where(valid, tiles, jnp.inf), axis=2)  # (b, mt, 3)
    hi = jnp.max(jnp.where(valid, tiles, -jnp.inf), axis=2)
    boxes = jnp.concatenate([lo, hi], axis=-1)  # (b, mt, 6)

    grid = (b, nt, mt)
    kernel = _make_kernel(n, tile_n, nt, mt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # boxes ride SMEM, indexable by program ids
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 3, tile_n),
                lambda bi, ni, mi, *_: (bi, 0, ni),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_m, 3),
                lambda bi, ni, mi, *_: (bi, _visit_to_phys(ni, mi, nt, mt), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni, mi, *_: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, tile_n), lambda bi, ni, mi, *_: (bi, 0, ni), memory_space=pltpu.VMEM
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
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * b * n_pad * m_pad,
            bytes_accessed=4 * b * (3 * n_pad + 3 * m_pad + 2 * n_pad),
            transcendentals=0,
        ),
    )(boxes, x1t, x2)
    return dist[:, 0, :n], idx[:, 0, :n]
