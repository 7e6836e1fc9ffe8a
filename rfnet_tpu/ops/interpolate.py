"""Three-nearest-neighbour search and inverse-distance interpolation.

TPU-native equivalent of the reference ``ThreeNN`` / ``ThreeInterpolate``
CPU ops (`tf_ops/interpolation/tf_interpolate.cpp`, Python contract
`tf_ops/interpolation/tf_interpolate.py:8-34`). The reference model imports
but never calls these (`vv_recon.py:17`); they are provided for API parity.

Semantics reproduced:
  * ``three_nn`` returns the three smallest SQUARED distances in ascending
    order plus their indices (the CPU kernel keeps best1<best2<best3,
    first-index-wins on ties — matched by ``top_k``'s stable ordering);
  * ``three_nn`` has no gradient (`tf_interpolate.py:18`);
  * ``three_interpolate``'s reference gradient flows to ``points`` only (the
    registered grad returns None for idx and weight,
    `tf_interpolate.py:29-34`) — reproduced with a custom VJP so the weight
    cotangent is exactly zero, matching the reference's (surprising) choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def three_nn(xyz1: jax.Array, xyz2: jax.Array):
    """(b, n, 3) unknown, (b, m, 3) known -> dist (b, n, 3) squared, idx int32."""
    xyz1 = lax.stop_gradient(xyz1)
    xyz2 = lax.stop_gradient(xyz2)
    diff = xyz1[:, :, None, :] - xyz2[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # (b, n, m)
    neg, idx = lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


@jax.custom_vjp
def three_interpolate(points: jax.Array, idx: jax.Array, weight: jax.Array):
    """Weighted gather: out[b, i] = Σ_k weight[b, i, k] · points[b, idx[b, i, k]].

    points (b, m, c), idx (b, n, 3), weight (b, n, 3) -> (b, n, c).
    """
    return _interp(points, idx, weight)


def _interp(points, idx, weight):
    def one(p, i, w):  # (m, c), (n, 3), (n, 3)
        return jnp.sum(p[i] * w[..., None], axis=1)

    return jax.vmap(one)(points, idx.astype(jnp.int32), weight)


def _fwd(points, idx, weight):
    return _interp(points, idx, weight), (points.shape, idx, weight)


def _bwd(res, g):
    points_shape, idx, weight = res
    # Reference grad kernel scatter-adds w·g into the source points and stops
    # the gradient at idx and weight (`tf_interpolate.py:29-34`).
    upd = weight[..., None] * g[:, :, None, :]  # (b, n, 3, c)

    def one(i, u):
        return jnp.zeros(points_shape[1:], u.dtype).at[i].add(u)

    d_points = jax.vmap(one)(idx.astype(jnp.int32), upd)
    return d_points, None, jnp.zeros_like(weight)


three_interpolate.defvjp(_fwd, _bwd)
