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
        for r in ("run_r5", "run_r4", "run_r3c", "run_r3_online", "run_r3", ".")
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

    rng = np.random.RandomState(0)

    @jax.jit
    def forward(params, x):
        return state.apply_fn(params, x).out4

    def measure(batch, iters):
        """clouds/s + ms/batch at `batch` (compile + 3 warmups + timed loop;
        the float() readback forces real completion — the experimental
        platform's block_until_ready has been observed returning before
        execution finishes; reading back the LAST output bounds all
        dispatched iterations while keeping the pipeline full)."""
        x = jnp.asarray(rng.rand(batch, config.innum, 3).astype(np.float32))
        out = forward(state.params, x)
        assert out.shape == (batch, 16384, 3)
        for _ in range(3):
            float(jnp.sum(forward(state.params, x)))
        t0 = time.perf_counter()
        outs = [forward(state.params, x) for _ in range(iters)]
        float(jnp.sum(outs[-1]))
        dt = time.perf_counter() - t0
        return batch * iters / dt, dt / iters, x

    # Serving-throughput sweep (VERDICT r4 item 2): the reference evals at
    # batch 1 (recon_test.py:20,58-64); batching is the first-class TPU lever,
    # so quote b64/b128/b256 and let the headline ride the best of them.
    sweep = {}
    best_batch, clouds_per_sec, dt_best, partial = 64, 0.0, 0.0, None
    for batch, iters in ((64, 20), (128, 10), (256, 10)):
        cps, ms, x = measure(batch, iters)
        sweep[batch] = (cps, ms)
        if cps > clouds_per_sec:
            best_batch, clouds_per_sec, dt_best, partial = batch, cps, ms, x
    batch, iters, dt = best_batch, 1, dt_best  # for the MFU block below

    # Component breakdown (VERDICT r2 #8): sub-timings captured in the
    # driver's environment, where on-chip numbers can actually be measured —
    # BENCH_r*.json then carries the full evidence trail, not one scalar.
    try:
        breakdown = _component_breakdown(state, config)
    except Exception as e:  # the headline metric must always print
        breakdown = {"error": repr(e)[:200]}
    for bN, (cps, ms) in sweep.items():
        breakdown[f"fwd_b{bN}_ms"] = round(ms * 1e3, 2)
        breakdown[f"fwd_b{bN}_clouds_per_sec"] = round(cps, 1)
    breakdown["headline_batch"] = best_batch
    # the BASELINE.json 5000-clouds/s aggregate is a 4-chip v4-8 figure:
    # restate it as chips x best single chip (dp serving is embarrassingly
    # parallel — eval.py --mesh N shards the batch with no cross-chip traffic)
    breakdown["agg_4chip_clouds_per_sec_est"] = round(4 * clouds_per_sec, 1)
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

    # Roofline (VERDICT r4 item 2): the achievable ceiling for THIS op mix on
    # v5e, stated so the ~10% MXU-peak MFU reads as structural, not slack.
    # The forward splits into (a) XLA-visible FLOPs — decode/refine point-MLP
    # matmuls, MXU-eligible at 197 TFLOP/s bf16 — and (b) the exact-NN merge
    # scans, which are elementwise running-min chains on the 8x128 VPU
    # (~1.9 TFLOP/s fp32 = 1024 lanes x 2 flops x ~0.94 GHz; K=3 MXU
    # contractions measured SLOWER than the VPU chain, CLAUDE.md kernel
    # facts). Speed-of-light = each part at its own unit's peak.
    try:
        mxu_gf = float(breakdown.get("fwd_gflops_per_cloud", 0.0))
        scan_pairs = (64 + 1024 + 16384) * config.innum + 32 * config.innum
        scan_gf = 8.0 * scan_pairs / 1e9
        sol_ms = mxu_gf / 197.0 + scan_gf / 1.9
        ceiling = 1000.0 / sol_ms if sol_ms > 0 else 0.0
        breakdown["roofline"] = (
            f"fwd = {mxu_gf:.1f} GFLOP/cloud MXU-eligible matmul (197 TFLOP/s "
            f"bf16 peak) + {scan_gf:.2f} GFLOP/cloud dense-equivalent exact-NN "
            f"scan (VPU-bound, ~1.9 TFLOP/s fp32); speed-of-light "
            f"= {sol_ms:.3f} ms/cloud = {ceiling:.0f} clouds/s/chip; measured "
            f"{clouds_per_sec:.0f} = {100 * clouds_per_sec / ceiling:.0f}% of "
            "that ceiling — MXU-peak MFU is structurally ~10% because the "
            "scan work cannot ride the MXU"
        )
    except Exception as e:
        breakdown["roofline_error"] = repr(e)[:120]

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
    # Train-step MFU (VERDICT r4 item 3): XLA's static count misses every
    # Pallas custom call, so total = cost_analysis(train_step) + the
    # closed-form pair counts of the distance/FPS kernels.
    try:
        ca = jstep.lower(state, partial_d, gt_d).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_flops = float(ca.get("flops", 0.0))
        total = xla_flops + _pallas_train_flops(b, config)
        ms = res["train_step_indist_b32_ms"]
        res["train_gflops_per_cloud"] = round(total / b / 1e9, 3)
        res["train_achieved_tflops"] = round(total / (ms / 1e3) / 1e12, 3)
        res["train_mfu_vs_v5e_bf16_peak197"] = round(
            total / (ms / 1e3) / 1e12 / 197.0, 5
        )
    except Exception as e:
        res["train_mfu_error"] = repr(e)[:120]
    return res


def _pallas_train_flops(b: int, config) -> float:
    """Closed-form FLOPs of the Pallas kernels in one train step (invisible
    to XLA cost_analysis — custom calls count as 0).

    Convention: 8 flops per candidate pair for an exact NN scan (3 sub +
    3 mul + 2 add running-min chain), x2 for the backward (the banded one-hot
    contraction re-realizes the scan at >= forward cost). For the
    data-dependent early-exit kernels this counts the DENSE-equivalent pair
    set — the algorithmic work any exact method is priced at — so the quoted
    MFU is the kernels' algorithmic utilization, not hardware op counting
    (the early exit does strictly fewer ops; the hardware-op MFU is lower).
    FPS: npoint iterations x one 8-flop distance row over n points. The
    approx-EMD recurrences are pure XLA (lax.scan) and already counted.

    Kernel inventory of train_step (train.py:104-140 + models/rfnet.py
    merge calls at :350,359,367 + losses.total_loss):
      FPS pyramids     : (64 + 1024) x 16384 pair-rows       (fwd only, no grad)
      model FPS        : 32 x 3000                            (fwd only)
      merge NN  (x3)   : one-sided {64,1024,16384} -> 3000    (fwd + bwd)
      cd3+cd4          : 4 one-sided 16384^2 scans            (fwd + bwd)
      re_chamfer       : 8 folded slices, 2 one-sided 2048^2  (fwd + bwd)
      zgn1+zgn2        : one-sided 1024->64 and 16384->1024   (fwd only: both
                         args are GT constants, grad contract dead)
    """
    n_in, n_out = config.innum, config.ptnum  # 3000, 16384
    n1, n2 = 2 * config.n_seed, 2 * config.n_seed * config.up_ratio  # 64, 1024
    pairs_fwd_only = (
        (n1 + n2) * n_out            # gt FPS pyramids
        + 32 * n_in                  # model FPS seed sampling
        + n2 * n1 + n_out * n2       # zgn NN-gap terms
    )
    pairs_fwd_bwd = (
        (n1 + n2 + n_out) * n_in     # merge layers
        + 4 * n_out * n_out          # cd3 + cd4, both directions
        + 8 * 2 * (n_out // 8) ** 2  # re_chamfer folded slices
    )
    return 8.0 * b * (pairs_fwd_only + 2 * pairs_fwd_bwd)


if __name__ == "__main__":
    main()
