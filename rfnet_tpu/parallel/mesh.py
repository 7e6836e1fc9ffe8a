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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    """Place a host batch pytree with the leading axis split over devices."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
