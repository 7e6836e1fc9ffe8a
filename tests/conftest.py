"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the platform flags before jax initialises its backends — this is the
TPU answer to "multi-device tests without a cluster" (SURVEY.md §4).
"""

import os

# The machine's sitecustomize pins JAX_PLATFORMS to the TPU plugin; the config
# update below is authoritative and must land before any backend initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# CPU-only cache dir: keeps test artifacts separate from the TPU cache so
# machine-feature metadata stays internally consistent (see CLAUDE.md).
os.environ.setdefault(
    "RFNET_JAX_CACHE", os.path.expanduser("~/.cache/rfnet_jax_cputests")
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(100)  # the reference tests' seed
