"""Sharded distance ops on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rfnet_tpu.ops.chamfer import nn_distance
from rfnet_tpu.ops.sharded import nn_distance_sharded
from rfnet_tpu.parallel import make_mesh


def test_sharded_matches_single_device(rng):
    mesh = make_mesh(8)
    x1 = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))  # 128 % 8 == 0... and 96 % 8 == 0
    d1s, i1s, d2s, i2s = jax.jit(
        lambda a, b: nn_distance_sharded(a, b, mesh)
    )(x1, x2)
    d1, i1, d2, i2 = nn_distance(x1, x2)
    np.testing.assert_allclose(np.asarray(d1s), np.asarray(d1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2s), np.asarray(d2), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1s), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(i2s), np.asarray(i2))


def test_sharded_rejects_indivisible(rng):
    mesh = make_mesh(8)
    x1 = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(1, 17, 3).astype(np.float32))
    try:
        nn_distance_sharded(x1, x2, mesh)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_sharded_emd_cost_matches_single_device(rng):
    """approx_match_cost with the target axis sharded over the 8-device mesh
    equals the single-device plan-free recurrence (fp summation order only)."""
    from rfnet_tpu.ops.emd import approx_match_cost
    from rfnet_tpu.ops.sharded import approx_match_cost_sharded

    mesh = make_mesh(8)
    # unequal sizes exercise the capacity logic (m > n here)
    x1 = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    cs = jax.jit(lambda a, b: approx_match_cost_sharded(a, b, mesh))(x1, x2)
    c = approx_match_cost(x1, x2)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(c), rtol=1e-4)
