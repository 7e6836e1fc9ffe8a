"""Probe whether the axon TPU relay is reachable (exit 0) or down (exit 1).

The relay drops out for stretches (observed 2026-08-17: backend init hangs
~30 min then fails UNAVAILABLE); this gives a fast, bounded check before
launching on-chip work. Run: `timeout 120 python tools/probe_chip.py`.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import rfnet_tpu  # noqa: F401  (self-heals axon registration)


def main() -> int:
    import jax

    try:
        devs = jax.devices()
    except Exception as exc:  # backend init failure
        print(f"DOWN: {type(exc).__name__}: {exc}", flush=True)
        return 1
    import jax.numpy as jnp

    x = float(jnp.sum(jnp.ones((8, 128))))
    print(f"UP: {devs} smoke={x}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
