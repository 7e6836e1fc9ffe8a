"""Multi-device sharded distance ops.

The reference scales its O(n·m) pairwise kernels by tiling into one GPU's
shared memory (SURVEY.md §5); past one chip's HBM/VMEM budget the TPU answer
is to shard the *target* axis of the scan across the mesh and combine the
per-shard partial results with collectives — structurally the ring/allreduce
analogue of blockwise attention, applied to N² distances.

``nn_distance_sharded`` shards xyz2 over the mesh's data axis: every device
scans its m/D slice of the targets for the full set of queries (an
embarrassingly-parallel Pallas/XLA scan), then a single ``psum``-style
min-combine over the axis yields the global (min, argmin). Communication is
O(n) scalars per device — negligible next to the O(n·m/D) compute — and XLA
lowers the combine onto ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rfnet_tpu.ops.chamfer import _one_sided


def _one_sided_local(x1, x2_shard, axis_name):
    """Per-device scan of the local target shard + global min-combine."""
    d_loc, i_loc = _one_sided(x1, x2_shard)  # (b, n) each, local indices
    m_loc = x2_shard.shape[1]
    shard_id = jax.lax.axis_index(axis_name)
    i_glob = i_loc + shard_id * m_loc
    # combine (min dist, argmin) across devices; ties resolve to the lowest
    # shard id to match the single-device first-index semantics
    num = jax.lax.axis_size(axis_name)
    all_d = jax.lax.all_gather(d_loc, axis_name)  # (D, b, n)
    all_i = jax.lax.all_gather(i_glob, axis_name)
    best = jnp.argmin(all_d, axis=0)  # first minimum -> lowest shard id
    d = jnp.take_along_axis(all_d, best[None], axis=0)[0]
    i = jnp.take_along_axis(all_i, best[None], axis=0)[0]
    return d, i


def nearest_neighbor_sharded(
    xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh
) -> tuple[jax.Array, jax.Array]:
    """One-sided NN (dist², idx) with xyz2 sharded over the mesh axis.

    Requires m divisible by the mesh size. Queries are replicated.
    """
    axis = mesh.axis_names[0]
    if xyz2.shape[1] % mesh.devices.size != 0:
        raise ValueError("target count must divide the mesh size")
    fn = jax.shard_map(
        functools.partial(_one_sided_local, axis_name=axis),
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=(P(), P()),
        # outputs are replicated by construction (identical all_gather+argmin
        # on every device) but the static checker can't prove it
        check_vma=False,
    )
    return fn(xyz1, xyz2)


def nn_distance_sharded(xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh):
    """Both directions of the Chamfer scan with the *opposite* cloud sharded.

    Same contract as ``ops.chamfer.nn_distance`` (no gradient — use it for
    giant eval-time scans; training shapes fit one chip).
    """
    d1, i1 = nearest_neighbor_sharded(xyz1, xyz2, mesh)
    d2, i2 = nearest_neighbor_sharded(xyz2, xyz1, mesh)
    return d1, i1, d2, i2


def _emd_cost_local(x1, x2_shard, axis_name, multi_l, multi_r):
    """Per-device slice of the plan-free approx-EMD cost recurrence.

    The level recurrence (`tf_approxmatch.cu:1-179`; plan-free form in
    ops/emd.approx_match_cost) is separable over the xyz2 axis given two
    cross-device reductions per level: the row sums Σ_r w·remainR (which
    normalise ratio_l) and the row mass Σ_r δ (which updates remain_l).
    Both are O(b·n) scalars — negligible next to the O(b·n·m/D) local tile
    work — and XLA lowers the psums onto ICI. All other quantities
    (remain_r, ratio_r, the cost partial) stay shard-local.
    """
    from rfnet_tpu.ops.emd import _levels, _mm, _sq_dists

    b, n, _ = x1.shape
    m_loc = x2_shard.shape[1]
    d2 = _sq_dists(x1, x2_shard)  # (b, n, m_loc)
    dd = jnp.sqrt(d2)

    def level_step(carry, level):
        cost, remain_l, remain_r = carry  # remain_l replicated, remain_r local
        w = jnp.exp(level * d2)
        suml = 1e-9 + jax.lax.psum(
            _mm(w, remain_r[:, :, None])[..., 0], axis_name
        )  # (b, n) — global row sums
        ratio_l = remain_l / suml
        sumr = _mm(w.transpose(0, 2, 1), ratio_l[:, :, None])[..., 0] * remain_r
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        delta = w * ratio_l[:, :, None] * ratio_r[:, None, :]
        cost = cost + jnp.sum(delta * dd, axis=(1, 2))  # local partial
        remain_l = jnp.maximum(
            0.0, remain_l - jax.lax.psum(jnp.sum(delta, axis=2), axis_name)
        )
        return (cost, remain_l, remain_r), None

    init = (
        jnp.zeros((b,), jnp.float32),
        jnp.full((b, n), multi_l, jnp.float32),
        jnp.full((b, m_loc), multi_r, jnp.float32),
    )
    (cost, _, _), _ = jax.lax.scan(level_step, init, _levels())
    return jax.lax.psum(cost, axis_name)


def approx_match_cost_sharded(xyz1: jax.Array, xyz2: jax.Array, mesh: Mesh):
    """Plan-free approx-EMD transport cost with xyz2 sharded over the mesh.

    Same value as ``ops.emd.approx_match_cost`` up to fp summation order;
    non-differentiable (eval metric). Use when one device cannot hold the
    (n, m) level tiles — the multi-chip analogue of the reference's 1024-pt
    shared-memory tiling (`tf_approxmatch.cu:11,35`).
    """
    from rfnet_tpu.ops.emd import _capacities

    axis = mesh.axis_names[0]
    if xyz2.shape[1] % mesh.devices.size != 0:
        raise ValueError("target count must divide the mesh size")
    multi_l, multi_r = _capacities(xyz1.shape[1], xyz2.shape[1])
    x1 = jax.lax.stop_gradient(xyz1.astype(jnp.float32))
    x2 = jax.lax.stop_gradient(xyz2.astype(jnp.float32))
    fn = jax.shard_map(
        functools.partial(
            _emd_cost_local, axis_name=axis, multi_l=multi_l, multi_r=multi_r
        ),
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(),
        check_vma=False,  # psum makes the cost replicated by construction
    )
    return fn(x1, x2)
