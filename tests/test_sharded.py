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


def test_shard_batch_matches_device_put(rng):
    """Multi-host batch assembly (make_array_from_process_local_data) must be
    bit-identical to the plain device_put path single-process (VERDICT r2 #2)."""
    from rfnet_tpu.parallel import data_sharding, shard_batch

    mesh = make_mesh(8)
    x = rng.rand(16, 12, 3).astype(np.float32)
    got = shard_batch({"a": x, "b": x[:, 0]}, mesh)
    want_a = jax.device_put(x, data_sharding(mesh))
    assert got["a"].sharding.is_equivalent_to(want_a.sharding, x.ndim)
    np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(want_a))
    np.testing.assert_array_equal(np.asarray(got["b"]), x[:, 0])
    # committed global arrays feed the mesh-jitted step directly
    s = jax.jit(lambda t: t["a"].sum() + t["b"].sum())(got)
    np.testing.assert_allclose(float(s), x.sum() + x[:, 0].sum(), rtol=1e-6)


def test_maybe_initialize_distributed_noop(monkeypatch):
    """Without coordinator env vars the distributed bootstrap must be a no-op
    (single-process behaviour untouched)."""
    from rfnet_tpu.parallel import maybe_initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("RFNET_DISTRIBUTED", raising=False)
    assert maybe_initialize_distributed() is False
    assert jax.process_count() == 1


def test_per_process_shards_compose_to_global_batch():
    """k per-process dataflow shards at batch B/k yield, per step, the SAME
    global multiset of rows as the single-process dataflow at batch B (row
    order inside the global batch may differ — batch means are unaffected)."""
    from rfnet_tpu.data.dataset import synthetic_dataflow

    B, k, steps = 8, 2, 3
    full_iter = iter(synthetic_dataflow(32, B, 64, 128)[0])
    shard_iters = [
        iter(synthetic_dataflow(32, B // k, 64, 128, shard_id=i, num_shards=k)[0])
        for i in range(k)
    ]
    for _ in range(steps):
        ids_full, inputs_full, _, _ = next(full_iter)
        parts = [next(it) for it in shard_iters]
        ids_global = np.concatenate([p[0] for p in parts])
        assert sorted(ids_global.tolist()) == sorted(ids_full.tolist())
        # same underlying rows: match by id and compare the input clouds
        by_id = {i: inputs_full[j] for j, i in enumerate(ids_full.tolist())}
        inputs_global = np.concatenate([p[1] for p in parts])
        for ident, row in zip(ids_global.tolist(), inputs_global):
            np.testing.assert_array_equal(row, by_id[ident])
