"""Headline benchmark: dense completion throughput at 16384 output points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: clouds completed per second per chip, flagship RFNet forward
(3000-pt partial -> 16384-pt completion), batched inference, steady state
(warmup excluded — the reference's timing convention, recon_test.py:58-64).

Baseline: the BASELINE.json north star is >=5000 clouds/s on a v4-8 (4 chips)
=> 1250 clouds/s/chip. vs_baseline = value / 1250.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLOUDS_PER_SEC_PER_CHIP = 1250.0


def _load_trained(state):
    """Restore the newest local checkpoint (best-by-CD preferred) so the
    bench exercises trained weights — a trained merge layer's
    exp(−d²/decfactor²) reroute traffic differs from random-init. Falls back
    to random init when no checkpoint exists (throughput is shape-dominated,
    so the number stays valid either way)."""
    for d in ("./bestrecord", "./modelvv_recon"):
        try:
            import orbax.checkpoint as ocp

            from rfnet_tpu.train import _abstract

            mgr = ocp.CheckpointManager(os.path.abspath(d))
            latest = mgr.latest_step()
            if latest is None:
                continue
            restored = mgr.restore(
                latest, args=ocp.args.StandardRestore(_abstract(state))
            )
            print(f"bench weights: {d} step {latest}", file=sys.stderr)
            return restored
        except Exception:
            continue
    print("bench weights: random init (no checkpoint found)", file=sys.stderr)
    return state


def main():
    from rfnet_tpu.models import RFNet
    from rfnet_tpu.train import TrainConfig, create_state

    config = TrainConfig()
    state = create_state(config, RFNet())
    state = _load_trained(state)

    batch = 64  # measured sweet spot: +5% clouds/s over b32, b128 is flat
    rng = np.random.RandomState(0)
    partial = jnp.asarray(rng.rand(batch, config.innum, 3).astype(np.float32))

    @jax.jit
    def forward(params, x):
        return state.apply_fn(params, x).out4

    # compile + warmup; the float() readback forces real completion (the
    # experimental platform's block_until_ready has been observed returning
    # before execution finishes)
    out = forward(state.params, partial)
    assert out.shape == (batch, 16384, 3)
    for _ in range(3):
        float(jnp.sum(forward(state.params, partial)))

    iters = 20
    t0 = time.perf_counter()
    outs = [forward(state.params, partial) for _ in range(iters)]
    # in-order per-device execution: reading back the LAST output bounds the
    # completion of all dispatched iterations while keeping the pipeline full
    float(jnp.sum(outs[-1]))
    dt = time.perf_counter() - t0
    clouds_per_sec = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "completion_throughput_16384pts",
                "value": round(clouds_per_sec, 2),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(
                    clouds_per_sec / BASELINE_CLOUDS_PER_SEC_PER_CHIP, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
