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
import sys as _sys

import jax as _jax

# Self-heal the TPU backend registration. On this machine the `axon` PJRT
# plugin registers through a sitecustomize module on
# PYTHONPATH=/root/.axon_site; any shell that clobbers PYTHONPATH (instead of
# appending) silently loses it and every jax call dies with
# "RuntimeError: Unable to initialize backend 'axon'" — this is exactly what
# made the round-2 on-chip numbers irreproducible outside the driver's
# environment. JAX backend discovery is lazy, so re-running the registration
# here (before any jax.devices()/computation) fully recovers: importing
# rfnet_tpu first is enough to get the chip from a plain shell.
def _axon_registered() -> bool:
    try:
        from jax._src import xla_bridge as _xb

        return "axon" in getattr(_xb, "_backend_factories", {})
    except Exception:  # pragma: no cover - jax internals moved
        return True  # can't tell; don't meddle


_axon_site = _os.environ.get("RFNET_AXON_SITE", "/root/.axon_site")
if (
    "axon" in _os.environ.get("JAX_PLATFORMS", "")
    and _os.path.isdir(_axon_site)
    and not _axon_registered()
):
    try:  # pragma: no cover - environment dependent
        if _axon_site not in _sys.path:
            _sys.path.insert(0, _axon_site)
        _sys.modules.pop("sitecustomize", None)  # force a fresh registration run
        import sitecustomize as _axon_sitecustomize  # noqa: F401
    except Exception:
        pass

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
