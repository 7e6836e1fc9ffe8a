"""Shared measurement protocol for the tools/ scripts.

One canonical `timeit` implements the timing rules this repo's numbers rely
on (CLAUDE.md "Perf numbers"): compile call, N warmup calls, then `iters`
dispatches with ONE scalar readback of the LAST result — on this platform
`jax.block_until_ready` has been observed returning before execution
completes, so completion is forced by `float(jnp.sum(...))` of the first
output leaf. Changing the protocol here changes every tool at once.

Importing this module also puts the repo root on sys.path (resolved via
namespace package `tools.` once the per-script bootstrap stanza has run, or
directly when imported from the repo root).
"""

import os as _os
import sys as _sys
import time

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO not in _sys.path:
    _sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def readback(out) -> float:
    """Force completion of `out` (scalar readback of its first leaf)."""
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timeit(name, fn, *args, iters=10, warmups=2, width=32):
    """Compile + warm `fn(*args)`, then time `iters` dispatches (ms/call).

    The timed loop keeps the dispatch pipeline full and reads back only the
    last result (in-order per-device execution bounds the whole pipeline).
    """
    readback(fn(*args))  # compile
    for _ in range(warmups):
        readback(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    readback(outs[-1])
    ms = (time.perf_counter() - t0) / iters * 1e3
    if name:
        print(f"{name:{width}s}: {ms:8.2f} ms", flush=True)
    return ms
