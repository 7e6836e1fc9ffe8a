"""Loss formulas, schedules, and an end-to-end tiny training run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rfnet_tpu import losses
from rfnet_tpu.models import RFNet
from rfnet_tpu.train import TrainConfig, create_state, make_jitted_steps


def test_chamfer_big_formula(rng):
    a = rng.rand(2, 40, 3).astype(np.float32)
    b = rng.rand(2, 50, 3).astype(np.float32)
    cd, idx1 = losses.chamfer_big(a, b)
    d = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    ref = (np.mean(np.sqrt(d.min(2))) + np.mean(np.sqrt(d.min(1)))) / 2
    np.testing.assert_allclose(float(cd), ref, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx1), d.argmin(2))


def test_fidelity_is_one_sided(rng):
    a = rng.rand(1, 30, 3).astype(np.float32)
    b = rng.rand(1, 60, 3).astype(np.float32)
    f = losses.fidelity_loss(a, b)
    d = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    np.testing.assert_allclose(float(f), np.mean(np.sqrt(d.min(2))), rtol=1e-5)


def test_re_chamfer_contiguous_slices(rng):
    gt = rng.rand(1, 64, 3).astype(np.float32)
    pred = rng.rand(1, 64, 3).astype(np.float32)
    v = losses.re_chamfer(jnp.asarray(gt), jnp.asarray(pred), part=8)
    acc = 0.0
    for i in range(8):
        sl = slice(i * 8, (i + 1) * 8)
        d = np.sum((pred[:, sl][:, :, None] - gt[:, sl][:, None]) ** 2, -1)
        acc += (np.mean(np.sqrt(d.min(2))) + np.mean(np.sqrt(d.min(1)))) / 2
    np.testing.assert_allclose(float(v), acc / 8, rtol=1e-5)


def test_schedules_match_reference():
    # vv_recon.py:479-482 piecewise boundaries; TF keeps the earlier value
    # through step <= boundary (boundary-inclusive)
    for step, lr in [(0, 5e-4), (50_000, 5e-4), (50_001, 2e-4), (100_000, 2e-4),
                     (150_000, 2e-4), (150_001, 1e-4), (200_000, 1e-4),
                     (200_001, 1e-5)]:
        np.testing.assert_allclose(float(losses.learning_rate(step)), lr, rtol=1e-6)
    for step, a1 in [(0, 0.01), (150_000, 0.01), (150_001, 0.001)]:
        np.testing.assert_allclose(float(losses.decfactor_weight(step)), a1, rtol=1e-6)
    # schedule_scale compresses boundaries proportionally, keeping the same
    # boundary-inclusive semantics and untouched values (scale=1 = parity)
    for step, lr in [(0, 5e-4), (5_000, 5e-4), (5_001, 2e-4), (20_000, 1e-4),
                     (20_001, 1e-5)]:
        np.testing.assert_allclose(
            float(losses.learning_rate(step, scale=0.1)), lr, rtol=1e-6
        )
    for step, a1 in [(15_000, 0.01), (15_001, 0.001)]:
        np.testing.assert_allclose(
            float(losses.decfactor_weight(step, scale=0.1)), a1, rtol=1e-6
        )


def test_zero_groupnear_hinge(rng):
    cens = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32))
    raw = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    small = jnp.zeros((1, 16, 4, 3))
    assert float(losses.zero_groupnear(cens, raw, small)) == 0.0  # inside hinge
    big = 10.0 * jnp.ones((1, 16, 4, 3))
    assert float(losses.zero_groupnear(cens, raw, big)) > 0.0


def _tiny_config():
    return TrainConfig(
        iters=30, batch_size=4, eval_size=2, innum=64, ptnum=128,
        n_seed=4, up_ratio=4, log_every=1000, ckpt_every=10_000,
    )


def _synthetic_batch(config, rng):
    gt = rng.rand(config.batch_size, config.ptnum, 3).astype(np.float32)
    partial = gt[:, : config.innum] + 0.01 * rng.randn(
        config.batch_size, config.innum, 3
    ).astype(np.float32)
    return jnp.asarray(partial), jnp.asarray(gt)


def test_overfit_one_batch(rng):
    """The loss must fall steadily when training on a single fixed batch —
    exercises model fwd, all loss terms, FPS pyramids, Adam, custom VJPs."""
    config = _tiny_config()
    state = create_state(config)
    jstep, _ = make_jitted_steps(config)
    partial, gt = _synthetic_batch(config, rng)
    first = None
    for _ in range(30):
        state, lb, _ = jstep(state, partial, gt)
        if first is None:
            first = float(lb.total)
    last = float(lb.total)
    assert np.isfinite(last)
    assert last < 0.75 * first, f"no learning: {first} -> {last}"


def test_train_step_dp_mesh(rng):
    """The same step over a virtual 8-device mesh: batch dp-sharded, state
    replicated, gradient all-reduce inserted by XLA."""
    from rfnet_tpu.parallel import make_mesh, shard_batch

    config = dataclasses.replace(_tiny_config(), batch_size=8)
    mesh = make_mesh(8)
    state = create_state(config)
    jstep, jeval = make_jitted_steps(config, mesh)
    partial, gt = _synthetic_batch(config, rng)
    partial, gt = shard_batch((partial, gt), mesh)
    state2, lb, _ = jstep(state, partial, gt)
    assert np.isfinite(float(lb.total))
    # the replicated state must be identical to a single-device step's result
    jstep1, _ = make_jitted_steps(config)
    state1, lb1, _ = jstep1(create_state(config), jnp.asarray(partial), jnp.asarray(gt))
    np.testing.assert_allclose(float(lb.total), float(lb1.total), rtol=1e-4)
    cd, emd = jeval(state2, partial, gt)
    assert np.isfinite(float(cd)) and np.isfinite(float(emd))


def test_training_dynamics_regression_pin():
    """Tolerance-banded pin of the synthetic training curve (fixed seeds,
    deterministic data order): catches silent training-dynamics drift — a
    dropped loss term, a changed schedule, an init change — without the PCN
    dataset. Reference trajectory recorded on this config (CPU, seed 1,
    synthetic seed 0): step0 0.61209, step9 0.45515, step29 0.43063."""
    from rfnet_tpu.data.dataset import synthetic_dataflow

    config = _tiny_config()
    df, _ = synthetic_dataflow(16, config.batch_size, config.innum, config.ptnum, seed=0)
    state = create_state(config)
    jstep, _ = make_jitted_steps(config)
    gen = iter(df)
    expected = {0: 0.61209, 9: 0.45515, 29: 0.43063}
    for i in range(30):
        _, bp, _, op = next(gen)
        state, lb, _ = jstep(state, jnp.asarray(bp), jnp.asarray(op))
        if i in expected:
            np.testing.assert_allclose(
                float(lb.total), expected[i], rtol=0.08,
                err_msg=f"training dynamics drifted at step {i}",
            )


def test_eval_batch_tiling_on_mesh(rng):
    """Regression: the default eval batch (4) is smaller than an 8-device
    mesh; `_tile_for_devices` repeats it to a shardable size with EXACTLY
    unchanged mean metrics (every row appears the same number of times)."""
    from rfnet_tpu.parallel import make_mesh
    from rfnet_tpu.train import _tile_for_devices

    config = dataclasses.replace(_tiny_config(), batch_size=8, eval_size=4)
    mesh = make_mesh(8)
    state = create_state(config)
    _, jeval = make_jitted_steps(config, mesh)
    gt = rng.rand(4, config.ptnum, 3).astype(np.float32)
    partial = np.ascontiguousarray(gt[:, : config.innum])
    tp, tg = _tile_for_devices(partial, 8), _tile_for_devices(gt, 8)
    assert tp.shape[0] % 8 == 0
    cd_t, emd_t = jeval(state, jnp.asarray(tp), jnp.asarray(tg))
    _, jeval1 = make_jitted_steps(config)
    cd1, emd1 = jeval1(state, jnp.asarray(partial), jnp.asarray(gt))
    np.testing.assert_allclose(float(cd_t), float(cd1), rtol=1e-4)
    np.testing.assert_allclose(float(emd_t), float(emd1), rtol=1e-3)


def test_model_applies_at_flagship_shapes_abstractly():
    """Shape-check the full 3000→16384 pyramid without paying CPU compute."""
    model = RFNet()
    out = jax.eval_shape(
        lambda p, x: model.apply(p, x),
        jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jax.ShapeDtypeStruct((2, 3000, 3), jnp.float32)
        ),
        jax.ShapeDtypeStruct((2, 3000, 3), jnp.float32),
    )
    assert out.out1.shape == (2, 64, 3)
    assert out.out2.shape == (2, 1024, 3)
    assert out.out3.shape == (2, 16384, 3)
    assert out.out4.shape == (2, 16384, 3)


def test_chamfer_grad_finite_at_zero_distance():
    """Regression: exact-0 squared distances (the kernels clamp tiny fp
    negatives to 0) must not produce NaN gradients through the sqrt."""
    a = jnp.asarray(np.array([[[0.1, 0.2, 0.3], [0.5, 0.5, 0.5]]], np.float32))
    g = jax.grad(lambda x: losses.chamfer_big(x, a)[0])(a)
    assert bool(jnp.all(jnp.isfinite(g)))
    g2 = jax.grad(lambda x: losses.fidelity_loss(x, a))(a)
    assert bool(jnp.all(jnp.isfinite(g2)))


def test_preload_device_batches_match_host_path():
    """On-device batch assembly (preload + index-stream gather) must produce
    bit-identical batches to the host dataflow path (same epoch permutation,
    same deterministic truncation resample)."""
    import jax.numpy as jnp

    from rfnet_tpu.data.dataset import synthetic_dataflow
    from rfnet_tpu.train import TrainConfig, preload_device_data

    config = TrainConfig(batch_size=4, innum=64, ptnum=128)
    df, _ = synthetic_dataflow(16, config.batch_size, config.innum, config.ptnum)
    parts_dev, gts_dev, index_iter = preload_device_data(df, config)
    host_iter = iter(df)
    for _ in range(5):  # crosses an epoch boundary (16 samples / batch 4)
        _, host_parts, _, host_gts = next(host_iter)
        idx = np.asarray([next(index_iter) for _ in range(config.batch_size)])
        np.testing.assert_array_equal(
            np.asarray(jnp.take(parts_dev, jnp.asarray(idx), axis=0)), host_parts
        )
        np.testing.assert_array_equal(
            np.asarray(jnp.take(gts_dev, jnp.asarray(idx), axis=0)), host_gts
        )


def test_precomputed_pyramids_step_bitexact(rng):
    """train_step_pyr with set-precomputed FPS pyramids must produce the
    EXACT same update as the on-step train_step (FPS is a deterministic
    per-row function of gt, independent of batch grouping)."""
    import functools

    from rfnet_tpu.train import (
        _precompute_pyramids,
        train_step,
        train_step_pyr,
    )

    config = TrainConfig(batch_size=4, innum=64, ptnum=128, n_seed=4, up_ratio=4)
    state = create_state(config)
    n1 = 2 * config.n_seed
    n2 = n1 * config.up_ratio
    gts = jnp.asarray(rng.rand(8, config.ptnum, 3).astype(np.float32))
    parts = gts[:, : config.innum]
    # pyramids over the whole "resident set" in a different chunking than the
    # batch, then gather the batch rows — mirrors the preload-mode flow
    g1, g2 = _precompute_pyramids(gts, n1, n2, chunk=3)
    idx = jnp.asarray([5, 1, 6, 2])
    take = lambda a: jnp.take(a, idx, axis=0)
    s_ref, lb_ref, _ = jax.jit(
        functools.partial(train_step, n1=n1, n2=n2)
    )(state, take(parts), take(gts))
    s_pyr, lb_pyr, _ = jax.jit(train_step_pyr)(
        state, take(parts), take(gts), take(g1), take(g2)
    )
    np.testing.assert_array_equal(
        np.asarray(lb_ref.total), np.asarray(lb_pyr.total)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_pyr.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
