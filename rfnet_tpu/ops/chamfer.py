"""Bidirectional nearest-neighbour distance (the Chamfer kernel).

TPU-native equivalent of the reference ``NnDistance`` CUDA op
(`pc_distance/tf_nndistance.cu:5-127` forward, `:169-194` backward; Python
contract `pc_distance/tf_nndistance.py:7-30`):

    nn_distance(xyz1 (b,n,3), xyz2 (b,m,3))
        -> dist1 (b,n)  squared distance to the nearest point of xyz2
           idx1  (b,n)  int32 argmin index into xyz2
           dist2 (b,m), idx2 (b,m)  the symmetric direction

The reference tiles xyz2 through 512-point shared-memory chunks with an
unrolled min-scan; the TPU design instead computes each distance tile as an
MXU matmul (``d² = |x|² + |y|² − 2·x·yᵀ``) with fp32-accurate precision and a
running min/argmin, chunked over the n axis so the live tile stays small. The
backward pass mirrors the reference's hand-written gradient kernel
(`tf_nndistance.cpp:130-163`): ``∂dist/∂x = 2(x1 − x2[idx])`` routed through
the saved argmin indices, scatter-added on the opposite cloud (the TPU
scatter-add plays the role of the CUDA ``atomicAdd``).

On TPU backends with large point counts a Pallas kernel
(:mod:`rfnet_tpu.ops.pallas.chamfer`) performs the same tiled scan entirely in
VMEM; dispatch is automatic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Rows of xyz1 processed per tile. Chosen so a (CHUNK, m) fp32 tile stays a
# few MB even at m = 16384 (the dense output size of the flagship model).
_CHUNK = 256


def _pairwise_sq_dists(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Squared pairwise distances (b, n, m) via an MXU-friendly expansion."""
    # fp32-exact matmul: point coordinates are O(1) so the |x|²+|y|²−2x·y
    # expansion at HIGHEST precision is accurate to ~1e-7 absolute, well
    # inside the tolerance of the loss (see tests/test_chamfer.py).
    s1 = jnp.sum(x1 * x1, axis=-1)  # (b, n)
    s2 = jnp.sum(x2 * x2, axis=-1)  # (b, m)
    cross = lax.dot_general(
        x1,
        x2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (b, n, m)
    d2 = s1[:, :, None] + s2[:, None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _one_sided(x1: jax.Array, x2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """min/argmin squared distance from every x1 point into x2.

    Chunks the n axis so the transient (chunk, m) tile is bounded; `lax.map`
    keeps one compiled body regardless of n.
    """
    b, n, _ = x1.shape
    chunk = min(_CHUNK, n)
    n_pad = -(-n // chunk) * chunk
    x1p = jnp.pad(x1, ((0, 0), (0, n_pad - n), (0, 0)))
    tiles = x1p.reshape(b, n_pad // chunk, chunk, 3).transpose(1, 0, 2, 3)

    def tile_min(xc):  # xc: (b, chunk, 3)
        d2 = _pairwise_sq_dists(xc, x2)  # (b, chunk, m)
        return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32)

    dist_t, idx_t = lax.map(tile_min, tiles)  # (k, b, chunk)
    dist = dist_t.transpose(1, 0, 2).reshape(b, n_pad)[:, :n]
    idx = idx_t.transpose(1, 0, 2).reshape(b, n_pad)[:, :n]
    return dist, idx


def _nn_distance_fwd_impl(xyz1, xyz2):
    if jax.default_backend() == "tpu":
        # Pallas path: two one-sided VMEM scans. (A fused bidirectional
        # sweep that reduced each tile along both axes was measured 3.6×
        # SLOWER — the per-tile (TILE_M,1)→(1,TILE_M) relayout for the
        # column direction dominates — so the recompute wins.)
        from rfnet_tpu.ops.pallas.chamfer import nn_distance_pallas

        try:
            d1, i1 = nn_distance_pallas(xyz1, xyz2)
            d2, i2 = nn_distance_pallas(xyz2, xyz1)
            return d1, i1, d2, i2
        except Exception:  # pragma: no cover - fallback if shapes unsupported
            pass
    d1, i1 = _one_sided(xyz1, xyz2)
    d2, i2 = _one_sided(xyz2, xyz1)
    return d1, i1, d2, i2


@jax.custom_vjp
def nn_distance(xyz1: jax.Array, xyz2: jax.Array):
    """Squared NN distances + argmin indices in both directions.

    Matches the reference op contract (`pc_distance/tf_nndistance.py:7-17`).
    """
    return _nn_distance_fwd_impl(xyz1, xyz2)


def _fwd(xyz1, xyz2):
    out = _nn_distance_fwd_impl(xyz1, xyz2)
    _, i1, _, i2 = out
    return out, (xyz1, xyz2, i1, i2)


def _scatter_add_points(target_shape, idx, updates):
    """Batched scatter-add of (b, k, 3) updates into a (b, n, 3) zero array.

    Decomposed into three per-coordinate scalar scatters: XLA's TPU scatter
    of 3-float rows measures 24 ms at (32,16384,3) while three (b,n) scalar
    scatters measure 13.5 ms total (tools bench, v5e-1)."""
    b, n = target_shape[0], target_shape[1]

    def one_coord(i, u):
        def one(ii, uu):
            return jnp.zeros((n,), updates.dtype).at[ii].add(
                uu, mode="promise_in_bounds"
            )

        return jax.vmap(one)(i, u)

    cols = [one_coord(idx, updates[..., c]) for c in range(target_shape[2])]
    return jnp.stack(cols, axis=-1)


def _bwd(res, grads):
    xyz1, xyz2, idx1, idx2 = res
    g1, _, g2, _ = grads  # cotangents of int32 idx outputs are symbolic zeros
    # ∂dist1/∂xyz1 = 2 (xyz1 − xyz2[idx1]); ∂dist1/∂xyz2 = −(same), routed to
    # the argmin rows (reference grad kernel tf_nndistance.cpp:130-163).
    nn1 = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)  # (b, n, 3)
    nn2 = jnp.take_along_axis(xyz1, idx2[..., None], axis=1)  # (b, m, 3)
    diff1 = xyz1 - nn1
    diff2 = xyz2 - nn2
    d_xyz1 = 2.0 * g1[..., None] * diff1
    d_xyz2 = 2.0 * g2[..., None] * diff2
    d_xyz1 = d_xyz1 + _scatter_add_points(xyz1.shape, idx2, -2.0 * g2[..., None] * diff2)
    d_xyz2 = d_xyz2 + _scatter_add_points(xyz2.shape, idx1, -2.0 * g1[..., None] * diff1)
    return d_xyz1, d_xyz2


nn_distance.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnums=())
def nn_distance_jit(xyz1, xyz2):
    """Jitted convenience wrapper (compile cache keyed on shapes)."""
    return nn_distance(xyz1, xyz2)


def _inverse_perm(perm: jax.Array) -> jax.Array:
    """Inverse of a batched permutation via scatter (cheaper than argsort)."""
    b, n = perm.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=perm.dtype)[None], (b, n))

    def one(p, i):
        return jnp.zeros((n,), perm.dtype).at[p].set(i)

    return jax.vmap(one)(perm, iota)


def _zsort(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sort a cloud by its z coordinate; returns (sorted, order)."""
    order = jnp.argsort(x[..., 2], axis=1).astype(jnp.int32)
    return jnp.take_along_axis(x, order[..., None], axis=1), order


def _unsort_results(d_s, i_s, q_order, t_order):
    """Map (dist, idx) from sorted-query/sorted-target space back to the
    original orders of both clouds."""
    inv = _inverse_perm(q_order)
    d = jnp.take_along_axis(d_s, inv, axis=1)
    i_sorted = jnp.take_along_axis(i_s, inv, axis=1)
    return d, jnp.take_along_axis(t_order, i_sorted, axis=1)


# Pair-count threshold above which the early-exit kernel's sort overhead is
# repaid many times over (covers the 16384² loss scans; leaves small/medium
# scans on the dense kernel, whose fixed cost is already low).
_DYN_MIN_PAIRS = 1 << 25


def _use_dyn(n: int, m: int) -> bool:
    return n * m >= _DYN_MIN_PAIRS


def sort_by_z_with_order(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Z-sort a cloud carrying coordinates and original indices as sort
    payload (ONE variadic lax.sort — no separate argsort + gather, which
    costs ~4-5 ms per (32,16384) gather on v5e)."""
    b, n, _ = x.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    zs, x0, x1, order = lax.sort(
        (x[..., 2], x[..., 0], x[..., 1], iota), dimension=1, num_keys=1
    )
    return jnp.stack([x0, x1, zs], axis=-1), order


def _unsort_rows(order, rows):
    """Undo a row permutation: out[order[k]] = rows[k].

    Implemented as a second variadic sort (recovers the inverse permutation)
    plus a gather — 6.8 ms at (32,16384,3) vs 24 ms for the equivalent
    scatter-set on v5e (XLA TPU scatters are row-serialized)."""
    b, n = order.shape
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    _, inv = lax.sort((order, iota), dimension=1, num_keys=1)
    return jnp.take_along_axis(rows, inv[..., None], axis=1, mode="promise_in_bounds")


# Which sorted-space kernel the loss path uses: "tile" = Morton sort + 3D
# best-first AABB pruning (ops/pallas/chamfer_tile.py), "dyn" = z sort + 1D
# slab walk (ops/pallas/chamfer_dyn.py). Both are exact; they differ only in
# how much scan the early exit skips. Default "dyn": the CPU prune simulation
# (tools/sim_prune_stats.py) shows the 512-pt Morton cells bound WORSE than
# thin z slabs on uniform clouds (16.7 vs 4.7 of 32 tiles scanned) and the
# Morton-order argmin intervals cost the banded backward ~4× the visits —
# flip to "tile" only if the on-chip A/B (tools/bench_chamfer_backend.py)
# proves otherwise. The backward is key-agnostic either way.
_NN_SORTED_BACKEND = "dyn"


def _sorted_nn_fns():
    if _NN_SORTED_BACKEND == "tile":
        from rfnet_tpu.ops.pallas.chamfer_tile import (
            nn_tile_pallas,
            sort_by_morton_with_order,
        )

        return sort_by_morton_with_order, nn_tile_pallas
    from rfnet_tpu.ops.pallas.chamfer_dyn import nn_dyn_pallas

    return sort_by_z_with_order, nn_dyn_pallas


def _chamfer_means_fwd_impl(pcd1, pcd2):
    sort_fn, nn_fn = _sorted_nn_fns()

    x1s, o1 = sort_fn(pcd1)
    x2s, o2 = sort_fn(pcd2)
    d1, i1 = nn_fn(x1s, x2s)
    d2, i2 = nn_fn(x2s, x1s)
    # _safe_sqrt forward semantics (losses._safe_sqrt): plain sqrt
    m1 = jnp.mean(jnp.sqrt(d1))
    m2 = jnp.mean(jnp.sqrt(d2))
    return (m1, m2), (x1s, o1, x2s, o2, d1, i1, d2, i2)


@jax.custom_vjp
def _chamfer_means_dyn(pcd1: jax.Array, pcd2: jax.Array):
    """(mean √NN-dist pcd1→pcd2, mean √ pcd2→pcd1) via the early-exit kernel.

    The whole computation stays in sorted space (Morton or z, per
    ``_NN_SORTED_BACKEND``) — means are permutation invariant, so the forward
    needs NO unsort at all (the dominant cost of the naive wrapper: ~18 ms of
    gathers per 16384² call). The backward applies the reference gradient
    formula (`tf_nndistance.cpp:130-163`) composed with d(mean√)/d(dist) =
    1/(2N·max(√d,1e-7)) (the safe-sqrt guard of losses._safe_sqrt) in sorted
    space, then unsorts only the two final gradient tensors with one scatter
    each. Ties may route gradient to a different equally-near point than the
    dense scan (sort reorders exact duplicates); distances are bit-equal.
    """
    out, _ = _chamfer_means_fwd_impl(pcd1, pcd2)
    return out


def _chamfer_means_fwd(pcd1, pcd2):
    return _chamfer_means_fwd_impl(pcd1, pcd2)


def _chamfer_means_bwd(res, gs):
    # A variant that emitted the argmin COORDS from the dyn kernel (one-hot
    # MXU pass over the visited band) to kill these gathers measured a WASH
    # (44.4 vs 44.9 ms f+b at 16384² b32) and forces coords for both
    # directions even when one is dead — gathers stay.
    x1s, o1, x2s, o2, d1, i1, d2, i2 = res
    g1, g2 = gs
    n1 = d1.shape[0] * d1.shape[1]
    n2 = d2.shape[0] * d2.shape[1]
    # d(mean √d)/d(d) with the safe-sqrt guard
    gd1 = g1 / (n1 * 2.0 * jnp.maximum(jnp.sqrt(d1), 1e-7))  # (b, n)
    gd2 = g2 / (n2 * 2.0 * jnp.maximum(jnp.sqrt(d2), 1e-7))  # (b, m)
    nn1 = jnp.take_along_axis(x2s, i1[..., None], axis=1)
    nn2 = jnp.take_along_axis(x1s, i2[..., None], axis=1)
    diff1 = x1s - nn1
    diff2 = x2s - nn2
    # The reference scatter-add (`tf_nndistance.cu:169-194`) of the reverse-
    # routed term becomes a banded one-hot MXU contraction in sorted space:
    # d_x2[j] += Σ_{i: i1[i]=j} −2·gd1[i]·(x1s[i] − x2s[j])
    #         = −2·S_p[j] + 2·x2s[j]·S_w[j]   (ops/pallas/nn_grad.py; the
    # XLA scatter this replaces measures ~15 ms at (32,16384,3), the kernel
    # low single-digit ms — tools/bench_bwd_pieces.py). The unused direction
    # (cotangent of a constant cloud, e.g. gt) is dead code XLA eliminates.
    from rfnet_tpu.ops.pallas.nn_grad import nn_grad_scatter

    sp2, sw2 = nn_grad_scatter(x2s, gd2, i2, x1s.shape[1])
    sp1, sw1 = nn_grad_scatter(x1s, gd1, i1, x2s.shape[1])
    ga_s = 2.0 * gd1[..., None] * diff1 - 2.0 * sp2 + 2.0 * x1s * sw2[..., None]
    gb_s = 2.0 * gd2[..., None] * diff2 - 2.0 * sp1 + 2.0 * x2s * sw1[..., None]
    return _unsort_rows(o1, ga_s), _unsort_rows(o2, gb_s)


_chamfer_means_dyn.defvjp(_chamfer_means_fwd, _chamfer_means_bwd)


def _chamfer_means_pair_fwd_impl(gt, out_a, out_b):
    sort_fn, nn_fn = _sorted_nn_fns()

    b = gt.shape[0]
    gts, og = sort_fn(gt)  # ONE gt sort shared by both terms
    outs, oo = sort_fn(jnp.concatenate([out_a, out_b], axis=0))
    gt2 = jnp.concatenate([gts, gts], axis=0)  # (2b, n, 3)
    d1, i1 = nn_fn(gt2, outs)  # gt→out, both terms in one launch
    d2, i2 = nn_fn(outs, gt2)  # out→gt
    r1 = jnp.sqrt(d1)
    r2 = jnp.sqrt(d2)
    means = (
        jnp.mean(r1[:b]), jnp.mean(r2[:b]),  # chamfer_means(gt, out_a)
        jnp.mean(r1[b:]), jnp.mean(r2[b:]),  # chamfer_means(gt, out_b)
    )
    return means, (gts, og, outs, oo, d1, i1, d2, i2, b)


@jax.custom_vjp
def _chamfer_means_pair_dyn(gt: jax.Array, out_a: jax.Array, out_b: jax.Array):
    """``chamfer_means(gt, out_a) + chamfer_means(gt, out_b)`` fused.

    The train loss evaluates cd3 = chamfer_big(gt, out3) and
    cd4 = chamfer_big(gt, out4) against the SAME ground-truth cloud
    (`vv_recon.py:491-492`); calling :func:`_chamfer_means_dyn` twice sorts
    gt twice (~7 ms each at (32,16384) — pure overhead) and launches four
    kernels. Here gt is sorted once and out3/out4 are stacked on the batch
    axis, so each direction is ONE kernel launch at batch 2b and the
    backward runs one banded contraction + one unsort per cloud set.
    Arithmetic is identical (means are taken per half; every half has equal
    element count), so values match the unfused path bit-for-bit up to the
    kernel's documented tie semantics.
    """
    out, _ = _chamfer_means_pair_fwd_impl(gt, out_a, out_b)
    return out


def _chamfer_means_pair_fwd(gt, out_a, out_b):
    return _chamfer_means_pair_fwd_impl(gt, out_a, out_b)


def _chamfer_means_pair_bwd(res, gs):
    gts, og, outs, oo, d1, i1, d2, i2, b = res
    ga1, ga2, gb1, gb2 = gs
    n = d1.shape[1]
    m = d2.shape[1]
    # per-half cotangents of the stacked means; each half normalises by its
    # own element count (b·n / b·m)
    rep = lambda a_, b_: jnp.concatenate(
        [jnp.broadcast_to(a_, (b,)), jnp.broadcast_to(b_, (b,))]
    )[:, None]
    gd1 = rep(ga1, gb1) / (b * n * 2.0 * jnp.maximum(jnp.sqrt(d1), 1e-7))
    gd2 = rep(ga2, gb2) / (b * m * 2.0 * jnp.maximum(jnp.sqrt(d2), 1e-7))
    gt2 = jnp.concatenate([gts, gts], axis=0)
    nn1 = jnp.take_along_axis(outs, i1[..., None], axis=1)
    nn2 = jnp.take_along_axis(gt2, i2[..., None], axis=1)
    diff1 = gt2 - nn1
    diff2 = outs - nn2
    from rfnet_tpu.ops.pallas.nn_grad import nn_grad_scatter

    sp2, sw2 = nn_grad_scatter(outs, gd2, i2, n)  # routed onto gt rows
    sp1, sw1 = nn_grad_scatter(gt2, gd1, i1, m)  # routed onto out rows
    ggt_s = 2.0 * gd1[..., None] * diff1 - 2.0 * sp2 + 2.0 * gt2 * sw2[..., None]
    gout_s = 2.0 * gd2[..., None] * diff2 - 2.0 * sp1 + 2.0 * outs * sw1[..., None]
    gout = _unsort_rows(oo, gout_s)  # (2b, m, 3), one unsort for both clouds
    ggt = _unsort_rows(og, ggt_s[:b] + ggt_s[b:])
    return ggt, gout[:b], gout[b:]


_chamfer_means_pair_dyn.defvjp(_chamfer_means_pair_fwd, _chamfer_means_pair_bwd)


def chamfer_means_pair(gt: jax.Array, out_a: jax.Array, out_b: jax.Array):
    """(m_a1, m_a2, m_b1, m_b2) = chamfer_means(gt, out_a) ++ chamfer_means(gt, out_b).

    TPU large shapes dispatch to the fused single-gt-sort batched-stack path;
    elsewhere it is exactly two :func:`chamfer_means` calls."""
    n, m = gt.shape[1], out_a.shape[1]
    if (
        jax.default_backend() == "tpu"
        and out_a.shape == out_b.shape
        and _use_dyn(n, m)
    ):
        return _chamfer_means_pair_dyn(gt, out_a, out_b)
    ma = chamfer_means(gt, out_a)
    mb = chamfer_means(gt, out_b)
    return ma[0], ma[1], mb[0], mb[1]


def chamfer_means(pcd1: jax.Array, pcd2: jax.Array, force_dyn: bool = False):
    """(mean √NN-dist both directions) — the chamfer_big reduction without
    indices. Dispatches the large-shape TPU case to the sorted-space
    early-exit path; identical semantics (incl. the safe-sqrt gradient
    guard) on the dense fallback. ``force_dyn`` routes below-threshold
    shapes to the sorted path too (re_chamfer's folded slices: the dyn
    backward's banded contraction beats the dense VJP's XLA scatters)."""
    n, m = pcd1.shape[1], pcd2.shape[1]
    if jax.default_backend() == "tpu" and (force_dyn or _use_dyn(n, m)):
        return _chamfer_means_dyn(pcd1, pcd2)
    from rfnet_tpu import losses as _losses

    d1, _, d2, _ = nn_distance(pcd1, pcd2)
    return (
        jnp.mean(_losses._safe_sqrt(d1)),
        jnp.mean(_losses._safe_sqrt(d2)),
    )


def nearest_neighbor_dyn(query: jax.Array, target: jax.Array):
    """One-sided NN via the early-exit slab kernel (sorts included).

    Exact — bit-equal distances to :func:`nearest_neighbor` with identical
    lowest-index tie resolution (see ops/pallas/chamfer_dyn.py).
    """
    from rfnet_tpu.ops.pallas.chamfer_dyn import nn_dyn_pallas

    return _nn_sorted_unsorted(query, target, _zsort, nn_dyn_pallas)


def chamfer_sample_means(
    pcd1: jax.Array, pcd2: jax.Array, force_sorted: bool = False
):
    """Per-sample mean √NN distance, both directions: ((b,), (b,)).

    The eval metric form (`recon_test.py` computes chamfer_big per model at
    batch 1; rfnet_tpu/eval.py batches it). Per-sample means are permutation
    invariant, so on TPU the whole computation runs in sorted space with NO
    unsort — two early-exit scans replace the four one-sided dense scans of
    the nn_distance-based formulation. Gradient-free (metric only)."""
    n, m = pcd1.shape[1], pcd2.shape[1]
    if force_sorted or (jax.default_backend() == "tpu" and _use_dyn(n, m)):
        sort_fn, nn_fn = _sorted_nn_fns()
        x1s, _ = sort_fn(lax.stop_gradient(pcd1))
        x2s, _ = sort_fn(lax.stop_gradient(pcd2))
        d1, _ = nn_fn(x1s, x2s)
        d2, _ = nn_fn(x2s, x1s)
    else:
        d1, _, d2, _ = nn_distance(pcd1, pcd2)
    return jnp.mean(jnp.sqrt(d1), axis=1), jnp.mean(jnp.sqrt(d2), axis=1)


def nn_sample_mean_one(
    query: jax.Array, target: jax.Array, force_sorted: bool = False
):
    """Per-sample mean √ ONE-SIDED NN distance: (b,).

    The fidelity metric (`recon_test.py`'s emd column is the partial→output
    direction only); the nn_distance-based form computes and discards the
    whole reverse scan. Gradient-free."""
    n, m = query.shape[1], target.shape[1]
    if force_sorted or (jax.default_backend() == "tpu" and _use_dyn(n, m)):
        sort_fn, nn_fn = _sorted_nn_fns()
        qs, _ = sort_fn(lax.stop_gradient(query))
        ts, _ = sort_fn(lax.stop_gradient(target))
        d1, _ = nn_fn(qs, ts)
    else:
        d1, _ = nearest_neighbor(query, target)
    return jnp.mean(jnp.sqrt(d1), axis=1)


def _nn_sorted_unsorted(query, target, sort_fn, nn_fn):
    """Shared wrapper: sort both clouds, run a sorted-space NN kernel, map
    (dist, idx) back to the original orders. Gradient-free by contract."""
    query = lax.stop_gradient(query)
    target = lax.stop_gradient(target)
    qs, q_ord = sort_fn(query)
    ts, t_ord = sort_fn(target)
    d_s, i_s = nn_fn(qs, ts)
    return _unsort_results(d_s, i_s, q_ord, t_ord)


def nearest_neighbor_tile(query: jax.Array, target: jax.Array):
    """One-sided NN via the 3D best-first AABB-tile kernel (sorts included).

    Exact — bit-equal distances to :func:`nearest_neighbor` with identical
    lowest-index tie resolution in Morton-sorted space (see
    ops/pallas/chamfer_tile.py). Kept as the documented alternative to the
    z-slab kernel; the prune simulation rejected it as the loss-path default
    (CLAUDE.md Round-3b)."""
    from rfnet_tpu.ops.pallas.chamfer_tile import (
        nn_tile_pallas,
        sort_by_morton_with_order,
    )

    return _nn_sorted_unsorted(
        query, target, sort_by_morton_with_order, nn_tile_pallas
    )


def nearest_neighbor_pruned(query: jax.Array, target: jax.Array):
    """One-sided NN via the z-sorted tile-pruned Pallas kernel.

    Bit-equivalent distances to :func:`nearest_neighbor` (ties may resolve to
    a different equally-near index). Sorting both clouds by z makes target
    tiles thin spatial slabs whose bounding-box lower bounds prune most of
    the O(n·m) scan; the permutations are undone on the way out.
    """
    query = lax.stop_gradient(query)
    target = lax.stop_gradient(target)
    from rfnet_tpu.ops.pallas.chamfer_pruned import nn_pruned_pallas

    q_ord = jnp.argsort(query[..., 2], axis=1).astype(jnp.int32)
    t_ord = jnp.argsort(target[..., 2], axis=1).astype(jnp.int32)
    qs = jnp.take_along_axis(query, q_ord[..., None], axis=1)
    ts = jnp.take_along_axis(target, t_ord[..., None], axis=1)
    d_s, i_s = nn_pruned_pallas(qs, ts)
    inv = _inverse_perm(q_ord)
    d = jnp.take_along_axis(d_s, inv, axis=1)
    i_sorted = jnp.take_along_axis(i_s, inv, axis=1)
    idx = jnp.take_along_axis(t_ord, i_sorted, axis=1)
    return d, idx


def nearest_neighbor_coords(query: jax.Array, target: jax.Array):
    """One-sided NN returning (dist² (b,n), nn_coords (b,n,3) = target[argmin]).

    The merge layer's access pattern (`vv_recon.py:132-139` consumes the
    neighbour's coordinates via group_point): on TPU the coordinate lookup is
    fused into the scan kernel (one-hot MXU contraction) instead of paying
    the ~6.7 ms XLA row gather. Outputs carry stop_gradient — callers
    recompute distances from the coords to differentiate (the merge layer's
    gradient contract)."""
    query = lax.stop_gradient(query)
    target = lax.stop_gradient(target)
    if jax.default_backend() == "tpu":
        from rfnet_tpu.ops.pallas.chamfer import nn_coords_pallas

        try:
            return nn_coords_pallas(query, target)
        except Exception:  # pragma: no cover
            pass
    d, i = _one_sided(query, target)
    return d, jnp.take_along_axis(target, i[..., None], axis=1)


def nearest_neighbor(query: jax.Array, target: jax.Array):
    """One-sided NN scan: (dist² (b, n), idx (b, n)) of query into target.

    Half the work of ``nn_distance`` when only one direction is needed (the
    merge layer's case). Index gradient-free; distances are not returned
    with a custom VJP — recompute from gathered points to differentiate,
    as the merge layer does.
    """
    query = lax.stop_gradient(query)
    target = lax.stop_gradient(target)
    if jax.default_backend() == "tpu":
        from rfnet_tpu.ops.pallas.chamfer import nn_distance_pallas

        try:
            return nn_distance_pallas(query, target)
        except Exception:  # pragma: no cover
            pass
    return _one_sided(query, target)
