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
    root = os.path.dirname(os.path.abspath(__file__))
    candidates = ["./bestrecord", "./modelvv_recon"] + [
        os.path.join(root, r, d)
        for r in ("run_r4", "run_r3c", "run_r3_online", "run_r3", ".")
        for d in ("bestrecord", "modelvv_recon")
    ]
    for d in candidates:
        try:
            import orbax.checkpoint as ocp

            from rfnet_tpu.compat.ckpt_compat import restore_flexible
            from rfnet_tpu.train import _abstract

            mgr = ocp.CheckpointManager(os.path.abspath(d))
            latest = mgr.latest_step()
            if latest is None:
                continue
            restored, _up = restore_flexible(mgr, latest, _abstract(state))
            print(f"bench weights: {d} step {latest}", file=sys.stderr)
            return restored
        except Exception:
            continue
    print("bench weights: random init (no checkpoint found)", file=sys.stderr)
    return state


def _backend_reachable(timeout_s: int = 600) -> tuple[bool, str]:
    """Bounded reachability check in a SUBPROCESS: the axon relay has been
    observed hanging ~30 min inside backend init before failing UNAVAILABLE
    (2026-08-17 outage) — an in-process attempt can't be timed out.

    Returns (ok, reason). The 10-minute bound leaves room for a cold compile
    of the probe's trivial program (first relay compiles run minutes); the
    reason string distinguishes a genuine DOWN from a timeout or a probe
    harness failure so the emitted JSON never misattributes."""
    import subprocess

    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "probe_chip.py")
    try:
        r = subprocess.run(
            [sys.executable, probe], timeout=timeout_s,
            capture_output=True, text=True,
        )
        if r.returncode == 0:
            return True, "up"
        return False, (r.stdout + r.stderr).strip()[-300:]
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s}s (backend init hang)"
    except Exception as e:  # pragma: no cover - probe harness failure
        return False, f"probe harness error: {e!r}"


def main():
    from rfnet_tpu.models import RFNet
    from rfnet_tpu.train import TrainConfig, create_state

    ok, reason = _backend_reachable()
    if not ok:
        # emit the one JSON line the driver expects, honestly marked: the
        # TPU relay is unreachable, not the framework slow
        print(
            json.dumps(
                {
                    "metric": "completion_throughput_16384pts",
                    "value": 0.0,
                    "unit": "clouds/sec/chip",
                    "vs_baseline": 0.0,
                    "breakdown": {
                        "error": f"axon TPU backend unreachable: {reason} — "
                        "see tools/probe_chip.py; prior measured value in "
                        "BENCH_r02.json: 1770 clouds/s/chip"
                    },
                }
            )
        )
        return

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

    # Component breakdown (VERDICT r2 #8): sub-timings captured in the
    # driver's environment, where on-chip numbers can actually be measured —
    # BENCH_r*.json then carries the full evidence trail, not one scalar.
    try:
        breakdown = _component_breakdown(state, config)
    except Exception as e:  # the headline metric must always print
        breakdown = {"error": repr(e)[:200]}
    breakdown["fwd_b64_ms"] = round(dt / iters * 1e3, 2)
    # MFU grounding (VERDICT r3 item 4): tie clouds/s to hardware peak via
    # XLA's own cost model for the compiled forward. Peak basis: v5e MXU is
    # 197 TFLOP/s bf16 per chip, and the default-precision fp32 matmul path
    # TRUNCATES operands to bf16 in a single MXU pass (CLAUDE.md kernel
    # facts), so 197 is the honest ceiling for this program. Note the
    # forward is gather/VPU-heavy by design (FPS, grouping, merge), so its
    # MFU is bounded well below dense-matmul workloads; the Pallas
    # while-loop distance kernels are data-dependent and excluded from XLA's
    # static count (documented in README perf table).
    try:
        # lower the SAME jitted callable the throughput number came from, so
        # the flop count describes the program actually measured
        ca = forward.lower(state.params, partial).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            achieved = flops * iters / dt / 1e12
            breakdown["fwd_gflops_per_cloud"] = round(flops / batch / 1e9, 3)
            breakdown["achieved_tflops"] = round(achieved, 3)
            breakdown["mfu_vs_v5e_bf16_peak197"] = round(achieved / 197.0, 5)
    except Exception as e:
        breakdown["mfu_error"] = repr(e)[:120]

    print(
        json.dumps(
            {
                "metric": "completion_throughput_16384pts",
                "value": round(clouds_per_sec, 2),
                "unit": "clouds/sec/chip",
                "vs_baseline": round(
                    clouds_per_sec / BASELINE_CLOUDS_PER_SEC_PER_CHIP, 4
                ),
                "breakdown": breakdown,
            }
        )
    )


def _component_breakdown(state, config):
    """Per-component on-chip ms at the training batch (32): the train step's
    major pieces, so regressions localize without re-running the profiler."""
    import functools

    from rfnet_tpu import losses
    from rfnet_tpu.ops.chamfer import chamfer_means_pair
    from rfnet_tpu.ops.fps import farthest_point_sample, gather_point
    from rfnet_tpu.train import train_step

    b = 32
    rng = np.random.RandomState(1)
    partial = jnp.asarray(rng.rand(b, config.innum, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    out3 = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    out4 = jnp.asarray(rng.rand(b, config.ptnum, 3).astype(np.float32))
    gt1 = jnp.asarray(rng.rand(b, 64, 3).astype(np.float32))
    gt2 = jnp.asarray(rng.rand(b, 1024, 3).astype(np.float32))
    p1 = jnp.asarray(rng.rand(b, 64, 3).astype(np.float32))
    p2 = jnp.asarray(rng.rand(b, 1024, 3).astype(np.float32))

    def timed(fn, *args, iters=5):
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))  # compile
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]))  # warm
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]))
        return round((time.perf_counter() - t0) / iters * 1e3, 2)

    res = {}
    res["fwd_b32_ms"] = timed(
        jax.jit(lambda p, x: state.apply_fn(p, x).out4), state.params, partial
    )
    # ONE jitted cd34 grad serves all three regimes below (same program,
    # different data) — re-jitting per regime would re-trace and, on a cold
    # persistent cache, re-compile through the minutes-per-shape relay
    cd34_grad = jax.jit(
        lambda g, a, c: jax.grad(
            lambda aa, cc: sum(chamfer_means_pair(g, aa, cc)), argnums=(0, 1)
        )(a, c)
    )
    res["cd34_fb_b32_ms"] = timed(cd34_grad, gt, out3, out4)
    # same measurement on REAL model outputs: early-exit kernel cost is
    # data-dependent (random clouds understated the z-slab kernel by ~2×,
    # CLAUDE.md round-3 attribution) — this entry pins the in-training regime
    fwd34 = jax.jit(
        lambda p, x: (lambda o: (o.out3, o.out4))(state.apply_fn(p, x))
    )
    o34 = fwd34(state.params, partial)
    res["cd34_fb_real_b32_ms"] = timed(
        cd34_grad,
        gt, jax.lax.stop_gradient(o34[0]), jax.lax.stop_gradient(o34[1]),
    )
    res["emd_fb_b32_ms"] = timed(
        jax.jit(
            lambda g1, g2, a, c: jax.grad(
                lambda aa, cc: losses.earth_mover(g1, aa) + losses.earth_mover(g2, cc),
                argnums=(0, 1),
            )(a, c)
        ),
        gt1, gt2, p1, p2,
    )
    res["recd_fb_b32_ms"] = timed(
        jax.jit(lambda g, a: jax.grad(lambda aa: losses.re_chamfer(g, aa, part=8))(a)),
        gt, out3,
    )
    res["fps_pyramids_b32_ms"] = timed(
        jax.jit(
            lambda g: (
                gather_point(g, farthest_point_sample(64, g)),
                gather_point(g, farthest_point_sample(1024, g)),
            )
        ),
        gt,
    )
    res["eval_emd_16k_b4_ms"] = timed(
        jax.jit(losses.earth_mover_eval), gt[:4], out4[:4]
    )
    jstep = jax.jit(functools.partial(train_step, n1=64, n2=1024))
    res["train_step_b32_ms"] = timed(
        lambda s, x, g: jstep(s, x, g)[1].total, state, partial, gt
    )
    # IN-DISTRIBUTION variants: uniform-random clouds are OOD for a trained
    # model, so its outputs don't hug the gt and the early-exit chamfer scans
    # near worst case — the numbers above are the stress regime. A user
    # training on the synthetic task sees THESE numbers instead (converged
    # outputs ≈ gt ⇒ tight exit bounds; CLAUDE.md §Step-time attribution).
    from rfnet_tpu.data.online import synthetic_batch

    partial_d, gt_d = jax.jit(
        lambda: synthetic_batch(jax.random.PRNGKey(7), b, config.innum, config.ptnum)
    )()
    o34d = fwd34(state.params, partial_d)
    res["cd34_fb_indist_b32_ms"] = timed(
        cd34_grad,
        gt_d, jax.lax.stop_gradient(o34d[0]), jax.lax.stop_gradient(o34d[1]),
    )
    res["train_step_indist_b32_ms"] = timed(
        lambda s, x, g: jstep(s, x, g)[1].total, state, partial_d, gt_d
    )
    return res


if __name__ == "__main__":
    main()
