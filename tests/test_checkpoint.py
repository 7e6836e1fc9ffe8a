"""Checkpoint/resume semantics (SURVEY.md §5): save → restore → identical
state; auto-restore picks the latest step; best-record manager keeps one."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from rfnet_tpu.train import (
    TrainConfig,
    _ckpt_managers,
    create_state,
    make_jitted_steps,
    restore_if_available,
)


def test_checkpoint_roundtrip(tmp_path, rng):
    import orbax.checkpoint as ocp

    config = TrainConfig(
        iters=3, batch_size=2, innum=32, ptnum=64, n_seed=4, up_ratio=4,
        workdir=os.path.join(tmp_path, "ckpt"),
    )
    state = create_state(config)
    jstep, _ = make_jitted_steps(config)
    gt = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    partial = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32))
    for _ in range(3):
        state, _, _ = jstep(state, partial, gt)

    mgr, best = _ckpt_managers(config)
    mgr.save(3, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    assert mgr.latest_step() == 3

    fresh = create_state(config)
    restored = restore_if_available(mgr, fresh)
    assert int(restored.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming training from the restored state must produce the same next
    # step as continuing the original
    s1, lb1, _ = jstep(state, partial, gt)
    s2, lb2, _ = jstep(restored, partial, gt)
    np.testing.assert_allclose(float(lb1.total), float(lb2.total), rtol=1e-6)


def test_restore_noop_without_checkpoint(tmp_path):
    config = TrainConfig(
        innum=32, ptnum=64, n_seed=4, up_ratio=4,
        workdir=os.path.join(tmp_path, "empty"),
    )
    mgr, _ = _ckpt_managers(config)
    state = create_state(config)
    out = restore_if_available(mgr, state)
    assert out is state  # untouched
