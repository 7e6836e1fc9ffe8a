"""Regression tests for train-loop robustness fixes (round-3 review):

  * the host staging thread must stop on EVERY train() exit path, including
    an exception escaping the loop (train.py's try/finally) — before the fix
    a failure in evaluate()/jstep left a daemon thread spinning on its
    0.5 s put-retry holding ~2 staged device batches;
  * data/online.synthetic_batch must refuse innum > ptnum//2 rather than
    silently returning a clamped (b, ptnum//2, 3) partial (jnp static
    slicing clamps; the host generator pads — the modes must not diverge);
  * the train CLI must reject --schedule_scale 0 instead of treating the
    falsy value as "unset" and silently using the default schedule.
"""

import itertools
import threading
import time

import jax
import numpy as np
import pytest

from rfnet_tpu.train import TrainConfig


def _tiny_config(workdir, **kw):
    return TrainConfig(
        n_seed=4, up_ratio=4, innum=64, ptnum=128, batch_size=4, eval_size=4,
        workdir=str(workdir), **kw,
    )


def test_stager_thread_stops_when_loop_raises(tmp_path, monkeypatch):
    from rfnet_tpu import train as train_mod

    monkeypatch.chdir(tmp_path)  # train writes ./logs relative to cwd
    config = _tiny_config(tmp_path / "modelvv_recon", iters=10, ckpt_every=2)

    rng = np.random.RandomState(0)

    def good_batches():
        while True:
            gt = rng.rand(config.batch_size, config.ptnum, 3).astype(np.float32)
            yield (None, gt[:, : config.innum], config.innum, gt)

    # evaluate() unpacks 4-tuples from valid_iter — ints make it raise at the
    # first ckpt boundary, with the stager thread healthy and parked on a
    # full queue at that moment
    with pytest.raises(TypeError):
        train_mod.train(config, good_batches(), itertools.repeat(1), valid_num=4)

    # only the stager matters here (orbax keeps its own service threads)
    leaked = []
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.name == "rfnet-stager" and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.2)
    assert not leaked, f"staging thread leaked after train() raised: {leaked}"


def test_synthetic_batch_rejects_oversized_innum():
    from rfnet_tpu.data.online import synthetic_batch

    with pytest.raises(ValueError, match="innum <= ptnum//2"):
        synthetic_batch(jax.random.PRNGKey(0), 2, 65, 128)


def test_train_cli_rejects_zero_schedule_scale(tmp_path, monkeypatch):
    from rfnet_tpu import train as train_mod

    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        train_mod.main([
            "--synthetic_online", "--schedule_scale", "0", "--steps", "1",
            "--workdir", str(tmp_path / "modelvv_recon"),
        ])
