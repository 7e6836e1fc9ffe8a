"""Device mesh + sharding layer.

The reference is a single-GPU codebase with no multi-device support of any
kind (SURVEY.md §2.3: `vv_recon.py:32` pins one CUDA device; no tf.distribute,
no NCCL/MPI). This module is therefore NEW capability, designed the TPU way:

  * one `jax.sharding.Mesh` over the chips (data-parallel 'dp' axis for the
    flagship model — at ~3.8 M params the model replicates; gradients
    all-reduce over ICI automatically when the jitted loss averages a
    batch-sharded input);
  * shardings expressed as `NamedSharding` annotations on jit boundaries —
    XLA inserts the collectives (psum for the gradient reduction), nothing is
    hand-scheduled;
  * works identically on a real v5e pod slice and on the virtual 8-device CPU
    mesh used by tests/the driver's dry run.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Env-gated `jax.distributed.initialize()` — the multi-HOST entry point.

    A v5e-16 sweep (configs/README.md §5) spans 2 hosts: each host runs this
    same train CLI, JAX's distributed runtime glues their local chips into one
    global `jax.devices()` list, and the dp mesh + `shard_batch` below build
    GLOBAL arrays from per-host batch shards. Initialization runs when:

      * coordinator args are passed explicitly (tests / manual launch), or
      * `JAX_COORDINATOR_ADDRESS` is set (manual multi-host launch; process
        count/index ride `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID`), or
      * `RFNET_DISTRIBUTED=1` (Cloud-TPU auto-detect: `initialize()` with no
        args reads the TPU runtime's own env).

    and is a NO-OP otherwise, so single-process behaviour — including every
    existing test — is untouched. Returns True iff initialize() was called.
    Must run before the first device query (reference contrast: the reference
    pins a single GPU, `vv_recon.py:32`; multi-host is new capability,
    SURVEY.md §2.3).
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = os.environ.get("RFNET_DISTRIBUTED") == "1"
    if addr is None and not auto:
        return False
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
        n = num_processes or os.environ.get("JAX_NUM_PROCESSES")
        i = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
        if n is not None:
            kwargs["num_processes"] = int(n)
        if i is not None:
            kwargs["process_id"] = int(i)
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices}-device mesh but only {len(devs)} present"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over the mesh's (single) data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading axis split over devices.

    Each leaf is this PROCESS's local portion of the global batch (the whole
    batch single-process). `make_array_from_process_local_data` assembles the
    global jax.Array from the per-host shards — on one process it is exactly
    the `device_put(x, sharding)` this replaces (bit-identical, pinned by
    tests/test_sharded.py::test_shard_batch_matches_device_put), and on a
    multi-host mesh it is the only correct way to build the dp-sharded batch
    (a plain device_put cannot address remote devices).
    """
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
    )
