"""rfnet_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud completion framework.

A from-scratch re-design of the capabilities of RFNet ("RFNet: Recurrent
Forward Network for Dense Point Cloud Completion", ICCV 2021; reference
implementation surveyed in SURVEY.md). The compute path is pure JAX — the
reference's CUDA op zoo (chamfer / approx-EMD / auction-EMD / FPS / grouping /
interpolation, see SURVEY.md §2.1) is re-implemented as XLA-fused primitives
plus Pallas TPU kernels for the hot pairwise-distance scans; the model is a
flax module whose 3-step recurrence compiles to a single jitted graph; scaling
is expressed with `jax.sharding.Mesh` + NamedSharding data parallelism.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: XLA/Mosaic compiles in this environment go
# through a remote relay and can take minutes; cache executables on disk so
# every process after the first pays nothing for an already-seen shape.
_cache_dir = _os.environ.get("RFNET_JAX_CACHE", _os.path.expanduser("~/.cache/rfnet_jax"))
if _cache_dir.lower() not in ("", "off", "none"):  # RFNET_JAX_CACHE=off to disable
    try:  # pragma: no cover - trivially environment dependent
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from rfnet_tpu import ops  # noqa: F401
