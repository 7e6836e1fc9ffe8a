"""Farthest point sampling + gather.

TPU-native equivalent of the reference ``FarthestPointSample`` /
``GatherPoint`` CUDA ops (`tf_ops/sampling/tf_sampling_g.cu:105-192`, Python
contract `tf_ops/sampling/tf_sampling.py:29-57`).

Semantics reproduced exactly:
  * the first selected index is always 0 (`tf_sampling_g.cu:114-116`);
  * each subsequent pick is the argmax of the running min-distance to the
    selected set, initialised to +huge (`:118`), ties resolved to the first
    (lowest) index;
  * ``farthest_point_sample`` has no gradient (`tf_sampling.py:56-57`);
  * ``gather_point``'s gradient is a scatter-add into the source cloud
    (`tf_sampling.py:37-47`) — here that is simply the autodiff transpose of
    ``take_along_axis``.

The selection loop is inherently sequential in ``npoint``; it is expressed as
a ``lax.scan`` whose body is one fused VPU pass over the cloud (distance to
the last pick + running min + argmax), batched with ``vmap``. All shapes are
static so the scan compiles once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _fps_single(xyz: jax.Array, npoint: int) -> jax.Array:
    """FPS indices for one cloud (n, 3) -> (npoint,) int32."""
    n = xyz.shape[0]

    def step(carry, _):
        min_d, last = carry
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)  # (n,)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        return (min_d, nxt), nxt

    init = (jnp.full((n,), 1e38, xyz.dtype), jnp.int32(0))
    if npoint == 1:
        return jnp.zeros((1,), jnp.int32)
    (_, _), picks = lax.scan(step, init, None, length=npoint - 1)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), picks])


def farthest_point_sample(npoint: int, xyz: jax.Array) -> jax.Array:
    """(b, n, 3) -> (b, npoint) int32 sample indices. Not differentiable.

    On TPU the whole selection loop runs inside one Pallas kernel
    (ops/pallas/fps.py) — the scan formulation pays a device-loop dispatch
    per selected point, ~200× slower end to end at 1024-of-16384.
    """
    xyz = lax.stop_gradient(xyz)
    if jax.default_backend() == "tpu":
        from rfnet_tpu.ops.pallas.fps import fps_fits_vmem, fps_pallas

        if fps_fits_vmem(xyz.shape[0], xyz.shape[1]):
            try:
                return fps_pallas(npoint, xyz)
            except Exception:  # pragma: no cover - shape-dependent fallback
                pass
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


def gather_point(xyz: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather (b, n, 3) at (b, npoint) -> (b, npoint, 3); grad scatter-adds."""
    return jnp.take_along_axis(xyz, idx[..., None].astype(jnp.int32), axis=1)


def sampling(npoint: int, xyz: jax.Array, use_type: str = "f", *, key=None):
    """Reference `sampling` helper (`vv_recon.py:67-83`).

    'f' — farthest point sampling; 'r' — one random index subset shared by
    every cloud in the batch (the reference shuffles a single index vector
    and tiles it across the batch, `vv_recon.py:72-82`).
    """
    if use_type == "f":
        idx = farthest_point_sample(npoint, xyz)
        return idx, gather_point(xyz, idx)
    if use_type == "r":
        if key is None:
            raise ValueError("random sampling requires an explicit PRNG key")
        n = xyz.shape[1]
        perm = jax.random.permutation(key, n)[:npoint].astype(jnp.int32)
        idx = jnp.broadcast_to(perm[None, :], (xyz.shape[0], npoint))
        return idx, gather_point(xyz, idx)
    raise ValueError(f"unknown sampling type: {use_type!r}")
