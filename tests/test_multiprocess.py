"""REAL multi-process data parallelism (VERDICT r2 #2, SURVEY §2.3).

Spawns two OS processes with FOUR virtual devices each — the v5e-16
topology shape (2 hosts x N chips), scaled to what one CPU core can compile —
forming one JAX distributed system over localhost
(`jax.distributed.initialize`
via the env-gated bootstrap, a global mesh spanning both processes'
devices, per-process batch shards assembled into global arrays with
`shard_batch`, and the jitted dp train step running collectively). The
replicated loss each process reports must equal the single-process value on
the same global batch — proving gradient all-reduce and batch assembly are
correct end to end, not just single-process-degenerate.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
# force EXACTLY N local devices (replace any inherited count, e.g. the
# 8-device flag tests/conftest.py exports)
_local = int(os.environ["RFNET_LOCAL_DEVICES"])
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append(f"--xla_force_host_platform_device_count={_local}")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ["RFNET_JAX_CACHE"] = "off"
sys.path.insert(0, os.environ["RFNET_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from rfnet_tpu.parallel import make_mesh, maybe_initialize_distributed, shard_batch
from rfnet_tpu.train import TrainConfig, create_state, make_jitted_steps

assert maybe_initialize_distributed() is True, "env-gated init did not fire"
pi, pc = jax.process_index(), jax.process_count()
assert pc == 2, f"expected 2 processes, got {pc}"
_glob = 2 * _local
assert jax.device_count() == _glob, f"expected {_glob} global devices, got {jax.device_count()}"

config = TrainConfig(batch_size=_glob, innum=64, ptnum=128, n_seed=4, up_ratio=4)
mesh = make_mesh()  # all global devices, spanning both processes
state = create_state(config)  # same seed on every process -> identical params
jstep, jeval = make_jitted_steps(config, mesh)

rng = np.random.RandomState(0)
gt = rng.rand(config.batch_size, config.ptnum, 3).astype(np.float32)
partial = gt[:, : config.innum]
lo, hi = pi * _local, (pi + 1) * _local  # this process's rows of the global batch
partial_l, gt_l = shard_batch((partial[lo:hi], gt[lo:hi]), mesh)
assert partial_l.shape == (config.batch_size, config.innum, 3)  # GLOBAL shape
state, lb, _ = jstep(state, partial_l, gt_l)
print(f"RESULT {pi} {float(lb.total):.8f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process(tmp_path):
    """2 processes x 4 virtual devices each (VERDICT r4 item 6): a
    process-SPANNING mesh where each process holds several devices — the
    real v5e-16 layout (2 hosts x 8 chips) scaled to CPU-compile size."""
    local_devices = 4
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            RFNET_REPO=_REPO,
            JAX_PLATFORMS="cpu",
            RFNET_LOCAL_DEVICES=str(local_devices),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER], env=env, cwd=str(tmp_path),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pi, val = line.split()
                losses[int(pi)] = float(val)
    assert set(losses) == {0, 1}
    # replicated output: both processes must see the identical global loss
    assert losses[0] == losses[1]

    # single-process reference on the same global batch
    import jax

    from rfnet_tpu.train import TrainConfig, create_state, make_jitted_steps

    config = TrainConfig(
        batch_size=2 * local_devices, innum=64, ptnum=128, n_seed=4, up_ratio=4
    )
    state = create_state(config)
    jstep, _ = make_jitted_steps(config, mesh=None)
    rng = np.random.RandomState(0)
    gt = rng.rand(config.batch_size, config.ptnum, 3).astype(np.float32)
    partial = gt[:, : config.innum]
    _, lb, _ = jstep(state, partial, gt)
    np.testing.assert_allclose(losses[0], float(lb.total), rtol=2e-5)
