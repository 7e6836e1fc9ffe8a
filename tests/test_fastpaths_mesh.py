"""The fast data paths compose with the DP mesh (VERDICT r3 item 2).

Round 3 left `--preload_device` and `--synthetic_online` single-device: the
two fastest data paths could not feed the dp mesh (BASELINE config 5). These
tests pin the lifted restriction on the virtual 8-device CPU mesh:

  * the DATA is bit-identical between the single-device and mesh paths: the
    shard_map psum-gather that assembles batches from the sample-sharded
    resident set equals a single-device `jnp.take` bit-for-bit (each row is
    summed with exact fp32 zeros from the other shards), and the in-jit
    online generation is unchanged by the dp sharding constraint;
  * a short `train()` run in each mode on the mesh reproduces the
    single-device run's per-step LOSS trajectory to fp-summation-order
    tolerance. (Parameters after Adam steps are NOT compared: for a
    near-zero gradient Adam's update is ≈ lr·sign(g), so an ulp-level
    reduction-order difference flips an update by 2·lr — trajectory chaos,
    not a data or wiring difference. The bit-exact data checks above plus
    the loss trajectory are the meaningful invariants.)
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rfnet_tpu.data.dataset import synthetic_dataflow
from rfnet_tpu.data.online import synthetic_batch
from rfnet_tpu.parallel import data_sharding, make_mesh
from rfnet_tpu.train import TrainConfig, _make_resident_gather, train
from jax.sharding import NamedSharding, PartitionSpec as P

# online mode needs innum <= ptnum // 2 (data/online.py crop contract)
TINY = dict(innum=64, ptnum=128, n_seed=4, up_ratio=4)


def test_resident_gather_bit_exact(rng):
    mesh = make_mesh(8)
    res = rng.rand(16, 5, 3).astype(np.float32)
    res_dev = jax.device_put(res, NamedSharding(mesh, P("dp")))
    idx = jnp.asarray(rng.randint(0, 16, size=6).astype(np.int32))
    got = np.asarray(_make_resident_gather(mesh)(res_dev, idx))
    want = np.asarray(jnp.take(jnp.asarray(res), idx, axis=0))
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)  # bit-for-bit, no tolerance


def test_online_generation_identical_under_sharding():
    key = jax.random.PRNGKey(5)
    p1, g1 = jax.jit(synthetic_batch, static_argnums=(1, 2, 3))(key, 8, 64, 128)
    mesh = make_mesh(8)
    data = data_sharding(mesh)

    @jax.jit
    def gen_sharded(k):
        p, g = synthetic_batch(k, 8, 64, 128)
        return (jax.lax.with_sharding_constraint(p, data),
                jax.lax.with_sharding_constraint(g, data))

    p2, g2 = gen_sharded(key)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def _run(tmp_path, monkeypatch, tag, use_mesh, **train_kw):
    d = tmp_path / tag
    d.mkdir()
    monkeypatch.chdir(d)  # train() writes ./logs relative to cwd
    config = TrainConfig(
        iters=3, batch_size=8, eval_size=8, seed=7, log_every=1,
        ckpt_every=1000, workdir=str(d / "ckpt"), **TINY,
    )
    if train_kw.get("synthetic_online"):
        train_df = None
    else:
        train_df, _ = synthetic_dataflow(
            16, config.batch_size, config.innum, config.ptnum, seed=3
        )
    valid_df, valid_num = synthetic_dataflow(
        8, config.eval_size, config.innum, config.ptnum,
        is_training=False, seed=1234,
    )
    train(config, train_df, valid_df, valid_num, use_mesh=use_mesh, **train_kw)
    with open(d / "logs" / "metrics.jsonl") as f:
        return [json.loads(line)["total"] for line in f if "total" in line]


@pytest.mark.parametrize("mode", ["synthetic_online", "preload_device"])
def test_fast_path_mesh_matches_single_device(tmp_path, monkeypatch, mode):
    kw = {mode: True}
    loss_single = _run(tmp_path, monkeypatch, f"{mode}_1dev", False, **kw)
    loss_mesh = _run(tmp_path, monkeypatch, f"{mode}_mesh", True, **kw)
    assert len(loss_single) == len(loss_mesh) == 3
    assert all(np.isfinite(loss_mesh))
    # fp-order tolerance: dp loss/grad means reduce in a different
    # association than the single-device sum; steps 2-3 also fold the
    # Adam-amplified parameter deltas of the earlier steps back in
    np.testing.assert_allclose(loss_single, loss_mesh, rtol=2e-3)
