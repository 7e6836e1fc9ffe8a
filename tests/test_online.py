"""On-device infinite synthetic stream (data/online.py).

The round-3 training-stability experiment depends on three properties
pinned here: batches are deterministic functions of (key, step) — so
checkpoint resume replays the exact stream — the partial really is a
half-space crop of the gt (same construction as the host generator,
dataset.py:59-78), and the train CLI's --synthetic_online mode runs end
to end.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from rfnet_tpu.data.online import batch_stream, synthetic_batch

B, INNUM, PTNUM = 2, 16, 64


def test_shapes_and_dtypes():
    partial, gt = synthetic_batch(jax.random.PRNGKey(7), B, INNUM, PTNUM)
    assert partial.shape == (B, INNUM, 3) and gt.shape == (B, PTNUM, 3)
    assert partial.dtype == jnp.float32 and gt.dtype == jnp.float32
    assert bool(jnp.isfinite(partial).all()) and bool(jnp.isfinite(gt).all())


def test_deterministic_in_key():
    p1, g1 = synthetic_batch(jax.random.PRNGKey(7), B, INNUM, PTNUM)
    p2, g2 = synthetic_batch(jax.random.PRNGKey(7), B, INNUM, PTNUM)
    p3, g3 = synthetic_batch(jax.random.PRNGKey(8), B, INNUM, PTNUM)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(g1, g2)
    assert not np.array_equal(np.asarray(g1), np.asarray(g3))


def test_partial_is_top_half_crop_of_gt():
    """Every partial point is bit-exactly a gt row (the variadic sorts carry
    coordinates as payload), and its plane projection ranks in the top
    ptnum/2 — i.e. the partial is a subset of the half-space crop."""
    partial, gt = synthetic_batch(jax.random.PRNGKey(3), B, INNUM, PTNUM)
    partial, gt = np.asarray(partial), np.asarray(gt)
    for b in range(B):
        # recover each partial row's index in gt by exact match
        eq = (partial[b][:, None, :] == gt[b][None, :, :]).all(-1)  # (innum, ptnum)
        assert eq.any(1).all(), "partial row not found among gt rows"
        idx = eq.argmax(1)
        assert len(np.unique(idx)) == INNUM, "subset sampled with replacement"


def test_stream_resume_replays_identical_batches():
    key = jax.random.PRNGKey(1)
    full = batch_stream(key, 0, B, INNUM, PTNUM)
    batches = [next(full) for _ in range(5)]
    resumed = batch_stream(key, 3, B, INNUM, PTNUM)
    for step in (3, 4):
        p, g = next(resumed)
        np.testing.assert_array_equal(p, batches[step][0])
        np.testing.assert_array_equal(g, batches[step][1])


def test_train_cli_synthetic_online(tmp_path, monkeypatch):
    from rfnet_tpu import train as train_mod
    from rfnet_tpu.train import TrainConfig

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        train_mod, "TrainConfig",
        lambda **kw: TrainConfig(
            n_seed=4, up_ratio=4, ptnum=128, batch_size=4, eval_size=4,
            innum=64, **kw,
        ),
    )
    workdir = os.path.join(tmp_path, "modelvv_recon")
    train_mod.main([
        "--synthetic_online", "--synthetic_val_size", "4",
        "--steps", "4", "--ckpt_every", "2", "--workdir", workdir,
    ])
    assert os.path.isdir(os.path.join(tmp_path, "bestrecord"))


def test_fused_step_generation_matches_stream():
    """The train loop fuses synthetic_batch into the step program keyed by
    the TRACED device-resident state.step (int32); batches must be
    bit-identical to the host-side batch_stream (a pure function of
    (seed, step) — resume safety depends on it)."""
    import jax

    from rfnet_tpu.data.online import batch_stream, synthetic_batch

    key = jax.random.PRNGKey(7)
    stream = batch_stream(key, 5, 2, 16, 64)

    @jax.jit
    def fused(step_idx):
        return synthetic_batch(jax.random.fold_in(key, step_idx), 2, 16, 64)

    for step in (5, 6, 7):
        p_s, g_s = next(stream)
        # int32 mirrors flax's TrainState.step dtype
        p_f, g_f = fused(jnp.asarray(step, jnp.int32))
        np.testing.assert_array_equal(np.asarray(p_s), np.asarray(p_f))
        np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_f))
