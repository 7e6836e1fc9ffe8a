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
