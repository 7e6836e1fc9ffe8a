"""Ball query, grouping gather, and k-NN.

TPU-native equivalents of the reference grouping op family
(`tf_ops/grouping/tf_grouping_g.cu`, Python contract
`tf_ops/grouping/tf_grouping.py:8-73`).

Semantics reproduced exactly:

``query_ball_point`` (`tf_grouping_g.cu:3-36`): for each query point, take the
FIRST ``nsample`` cloud points (in index order) whose euclidean distance —
clamped below at 1e-20 — is strictly less than ``radius``; pad the remaining
slots by repeating the first hit; also return the hit count (capped at
``nsample``). The order-dependent "first k in the ball" selection is
vectorised with a cumulative count over the in-radius mask instead of the
CUDA sequential scan. When a query has no neighbours the CUDA kernel leaves
the indices uninitialised; here they are defined as 0.

``group_point`` (`tf_grouping_g.cu:40-78`): batched fancy gather; its autodiff
transpose is the scatter-add that the reference implements with ``atomicAdd``.

``knn_point`` (`tf_grouping.py:48-73`): pure dense pairwise distance + top-k.
NOTE the reference returns ``tf.nn.top_k(-dist)`` values verbatim, i.e. the
*negated squared* distances — that quirk is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pairwise_sq(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """(b, n, 3), (b, m, 3) -> (b, m, n) squared distances (query-major)."""
    diff = x2[:, :, None, :] - x1[:, None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def query_ball_point(radius, nsample: int, xyz1: jax.Array, xyz2: jax.Array):
    """First-``nsample``-in-ball indices.

    Args:
      radius: scalar search radius (compared against euclidean distance).
      nsample: max points per ball.
      xyz1: (b, n, 3) cloud points.
      xyz2: (b, m, 3) query/centroid points.
    Returns:
      idx (b, m, nsample) int32, pts_cnt (b, m) int32.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    d2 = _pairwise_sq(xyz1, xyz2)  # (b, m, n)
    d = jnp.maximum(jnp.sqrt(d2), 1e-20)
    mask = d < radius  # (b, m, n)
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # 1-based hit rank
    cnt = jnp.minimum(rank[..., -1], nsample)
    in_first_k = mask & (rank <= nsample)
    # Scatter each hit's source index k into its rank slot; misses go to a
    # dump slot (nsample) that is dropped.
    slot = jnp.where(in_first_k, rank - 1, nsample)  # (b, m, n)
    k_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, None, :], (b, m, n)
    )

    def scatter_one(slots_q, ks_q):  # (n,), (n,) for one (batch, query)
        return jnp.zeros((nsample + 1,), jnp.int32).at[slots_q].set(ks_q)[:nsample]

    idx = jax.vmap(jax.vmap(scatter_one))(slot, k_ids)  # (b, m, nsample)
    first_hit = jnp.argmax(mask, axis=-1).astype(jnp.int32)  # 0 when no hit
    slot_ids = jnp.arange(nsample, dtype=jnp.int32)[None, None, :]
    idx = jnp.where(slot_ids < cnt[..., None], idx, first_hit[..., None])
    return idx, cnt.astype(jnp.int32)


def group_point(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather (b, n, c) at (b, m, k) -> (b, m, k, c); grad scatter-adds."""

    def one(p, i):  # p (n, c), i (m, k)
        return p[i]

    return jax.vmap(one)(points, idx.astype(jnp.int32))


def knn_point(k: int, xyz1: jax.Array, xyz2: jax.Array):
    """k nearest neighbours of each xyz2 query among xyz1.

    Returns (val, idx): val (b, m, k) is the NEGATED squared distance (the
    reference returns `tf.nn.top_k(-dist)` values unmodified,
    `tf_grouping.py:72`); idx (b, m, k) int32.
    """
    d2 = _pairwise_sq(xyz1, xyz2)  # (b, m, n)
    val, idx = lax.top_k(-d2, k)
    return val, idx.astype(jnp.int32)
