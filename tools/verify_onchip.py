"""On-chip validation sweep: every Pallas kernel + TPU dispatch path vs an
independent oracle, in one bounded run, emitting a machine-readable artifact.

Until now the Pallas kernels were "re-validated on the real chip manually"
(CLAUDE.md §Testing) — this makes that a one-command artifact the driver/judge
can run: `timeout 5400 python tools/verify_onchip.py` writes
`ONCHIP_VALIDATION.json` at the repo root with per-check pass/fail, max
errors, and timings, and exits non-zero on any failure.

Oracles are chosen so each check is independent of the code under test:
  - the dense Pallas NN kernel is checked against float64 numpy brute force;
  - the early-exit z-slab kernel (chamfer_dyn) and the Morton AABB-tile
    kernel (chamfer_tile) are checked against the dense kernel on three
    distributions incl. the all-z-equal worst case and model-like blob data
    (distances are documented bit-equal; tie indices must still index an
    equally-near point);
  - the banded one-hot MXU backward (nn_grad) is checked against plain XLA
    autodiff through nn_distance (gather transpose = scatter-add);
  - the fused plan-free EMD paths are checked against the composed
    approx_match -> match_cost full-matrix XLA path (`tf_approxmatch.cu`
    semantics), values and gradients;
  - the Pallas FPS kernel is checked against the lax.scan formulation
    (exact index parity: seed 0, argmax-first ties);
  - the fused merge-coords kernel is checked against NN-idx + XLA gather.

Pure-XLA ops (grouping, interpolation) are exercised by the CPU suite's
numpy oracles and have no kernel code of ours to diverge on TPU; they are
covered here transitively through the full train step check.

`--tiny` runs the same logic at toy shapes with Pallas interpret mode when
no TPU is present (CI/logic smoke; does not write the artifact).
"""

import argparse
import json
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`

import rfnet_tpu  # noqa: F401  (self-heals axon registration)

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def _readback(x) -> float:
    """Force completion (block_until_ready can return early on this relay)."""
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def _clouds(rng, shape, kind):
    """Test distributions: uniform, all-z-equal (slab-kernel worst case),
    and gaussian blobs (model-output-like clustering)."""
    if kind == "uniform":
        return rng.rand(*shape).astype(np.float32)
    if kind == "flatz":
        x = rng.rand(*shape).astype(np.float32)
        x[..., 2] = 0.5
        return x
    if kind == "blobs":
        b, n, _ = shape
        k = 8
        centers = rng.rand(b, k, 3).astype(np.float32)
        assign = rng.randint(0, k, size=(b, n))
        base = np.take_along_axis(centers, assign[..., None], axis=1)
        return (base + 0.03 * rng.randn(b, n, 3)).astype(np.float32)
    raise ValueError(kind)


class Sweep:
    def __init__(self, only=None):
        self.results = {}
        self.ok = True
        self.only = only  # list of substrings; None = run everything

    def run(self, name, fn):
        if self.only is not None and not any(s in name for s in self.only):
            return
        t0 = time.perf_counter()
        try:
            detail = fn() or {}
            entry = {"ok": True, **detail}
        except AssertionError as e:
            entry = {"ok": False, "error": str(e)[:500]}
        except Exception as e:  # compile/runtime failure counts as a failure
            entry = {"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}
        entry["seconds"] = round(time.perf_counter() - t0, 1)
        self.results[name] = entry
        self.ok &= entry["ok"]
        status = "PASS" if entry["ok"] else "FAIL"
        detail = entry.get("error", "") if not entry["ok"] else " ".join(
            f"{k}={v}" for k, v in entry.items()
            if k not in ("ok", "seconds")
        )
        print(f"[{status}] {name} ({entry['seconds']}s) {detail}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="toy shapes + Pallas interpret mode (no-TPU smoke)")
    ap.add_argument("--out", default=_os.path.join(REPO, "ONCHIP_VALIDATION.json"))
    ap.add_argument("--only", default=None,
                    help="comma-separated check-name substrings to run; a "
                         "partial sweep never writes the artifact")
    args = ap.parse_args()

    if args.tiny:
        # force CPU BEFORE the first backend query: initialising the pinned
        # axon platform during a relay outage hangs ~30 min (CLAUDE.md).
        # Also drop the persistent compile cache — its CPU AOT artifacts can
        # carry machine features this host lacks (see __graft_entry__.py).
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not args.tiny:
        print("no TPU backend (run with --tiny for the logic smoke)", flush=True)
        return 2

    interpret = contextlib.nullcontext()
    if not on_tpu:
        from jax.experimental.pallas import tpu as pltpu

        interpret = pltpu.force_tpu_interpret_mode()

    # shapes: representative on TPU, toy under --tiny
    if args.tiny:
        N_DYN, B_DYN = 256, 2        # dyn/tile/banded-grad clouds
        N_FPS, K_FPS = 512, 64       # fps source / sample sizes
        N_EMD = 128                  # square emd check
        N_EVAL_EMD, B_EVAL = 256, 1  # banded eval emd
    else:
        N_DYN, B_DYN = 4096, 2
        N_FPS, K_FPS = 16384, 1024
        N_EMD = 1024
        N_EVAL_EMD, B_EVAL = 4096, 1

    from rfnet_tpu import losses, ops
    from rfnet_tpu.ops import chamfer as chamfer_mod

    rng = np.random.RandomState(20260818)
    sweep = Sweep(only=args.only.split(",") if args.only else None)
    # every check below runs inside this context: Pallas interpret mode on
    # CPU (--tiny logic smoke), a no-op on the real chip
    interpret.__enter__()

    # ---- 1. dense Pallas NN kernel vs float64 numpy brute force ----------
    def check_dense_vs_numpy():
        x1 = jnp.asarray(_clouds(rng, (2, 384, 3), "uniform"))
        x2 = jnp.asarray(_clouds(rng, (2, 512, 3), "uniform"))
        d1, i1, d2, i2 = jax.jit(ops.nn_distance)(x1, x2)
        _readback(d1)
        a1, a2 = np.asarray(x1, np.float64), np.asarray(x2, np.float64)
        full = ((a1[:, :, None] - a2[:, None]) ** 2).sum(-1)  # (b, n, m)
        ref_i1, ref_d1 = full.argmin(2), full.min(2)
        ref_i2, ref_d2 = full.argmin(1), full.min(1)
        err = max(np.abs(np.asarray(d1, np.float64) - ref_d1).max(),
                  np.abs(np.asarray(d2, np.float64) - ref_d2).max())
        assert err < 1e-5, f"dist err {err}"
        mism = int((np.asarray(i1) != ref_i1).sum() + (np.asarray(i2) != ref_i2).sum())
        assert mism == 0, f"{mism} argmin index mismatches"
        return {"max_dist_err": float(err)}

    sweep.run("nn_dense_vs_numpy", check_dense_vs_numpy)

    # ---- 2./3. early-exit kernels vs the dense kernel ---------------------
    # bit-equality holds on TPU, where the dense oracle is the Pallas kernel
    # with the identical |t|²−2qt op chain; the CPU smoke's XLA oracle
    # computes (a−b)² directly, so allow last-ulp rounding skew there
    dist_tol = 0.0 if on_tpu else 2e-6

    def make_sorted_check(nn_fn):
        def check():
            worst = 0.0
            for kind in ("uniform", "flatz", "blobs"):
                q = jnp.asarray(_clouds(rng, (B_DYN, N_DYN, 3), kind))
                t = jnp.asarray(_clouds(rng, (B_DYN, N_DYN, 3), kind))
                dd, _ = jax.jit(ops.nearest_neighbor)(q, t)
                ds, si = jax.jit(nn_fn)(q, t)
                _readback(ds)
                derr = float(np.abs(np.asarray(dd) - np.asarray(ds)).max())
                worst = max(worst, derr)
                assert derr <= dist_tol, (
                    f"{kind}: dist mismatch (max {derr}, tol {dist_tol})"
                )
                # ties may route to a different equally-near index; every
                # returned index must still realize the returned distance
                picked = jnp.take_along_axis(t, si[..., None], axis=1)
                d_re = jnp.sum((q - picked) ** 2, axis=-1)
                ierr = float(np.abs(np.asarray(d_re) - np.asarray(ds)).max())
                assert ierr < 1e-5, f"{kind}: idx does not realize dist ({ierr})"
            return {"max_dist_err": worst}

        return check

    sweep.run("nn_dyn_vs_dense",
              make_sorted_check(chamfer_mod.nearest_neighbor_dyn))
    sweep.run("nn_tile_vs_dense",
              make_sorted_check(ops.nearest_neighbor_tile))

    # ---- 4. banded one-hot MXU backward vs plain XLA autodiff -------------
    def check_banded_grad():
        p1 = jnp.asarray(_clouds(rng, (B_DYN, N_DYN, 3), "blobs"))
        p2 = jnp.asarray(_clouds(rng, (B_DYN, N_DYN, 3), "uniform"))

        def fast(a, b):
            # what chamfer_means(force_dyn=True) dispatches to on TPU; called
            # directly so the --tiny CPU smoke exercises it under interpret
            return sum(chamfer_mod._chamfer_means_dyn(a, b))

        # ROUTING-MATCHED oracle: gather with the indices the dyn path itself
        # picked (stop-grad) and let XLA autodiff the identical
        # mean∘sqrt∘d² expression. Separately-compiled kernels flip
        # near-tie argmins at ulp level (e = |t|²−2q·t fma/rounding skew;
        # both routes realize the same distance — first observed on-chip
        # 2026-08-18: grad err 2.6e-4 against an independently-routed
        # oracle, entirely tie flips). Pinning the routing isolates what
        # this check is for: the banded one-hot scatter backward must match
        # XLA's scatter backward given the same argmin choice.
        _, i12 = jax.jit(chamfer_mod.nearest_neighbor_dyn)(p1, p2)
        _, i21 = jax.jit(chamfer_mod.nearest_neighbor_dyn)(p2, p1)

        def oracle(a, b):
            t12 = jnp.take_along_axis(b, i12[..., None], axis=1)
            t21 = jnp.take_along_axis(a, i21[..., None], axis=1)
            d1 = jnp.sum((a - t12) ** 2, axis=-1)
            d2 = jnp.sum((b - t21) ** 2, axis=-1)
            return (jnp.mean(losses._safe_sqrt(d1))
                    + jnp.mean(losses._safe_sqrt(d2)))

        g_fast = jax.jit(jax.grad(fast, argnums=(0, 1)))(p1, p2)
        g_ref = jax.jit(jax.grad(oracle, argnums=(0, 1)))(p1, p2)
        _readback(g_fast)
        err = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                  for a, b in zip(g_fast, g_ref))
        assert err < 1e-5, f"grad err {err}"
        v1 = float(jax.jit(fast)(p1, p2))
        v2 = float(jax.jit(oracle)(p1, p2))
        assert abs(v1 - v2) < 1e-6, f"value {v1} vs {v2}"
        return {"max_grad_err": err}

    sweep.run("chamfer_banded_bwd_vs_xla", check_banded_grad)

    # ---- 5. Pallas FPS vs lax.scan formulation (exact index parity) -------
    def check_fps():
        from rfnet_tpu.ops.fps import _fps_single
        from rfnet_tpu.ops.pallas.fps import fps_pallas

        x = jnp.asarray(_clouds(rng, (2, N_FPS, 3), "blobs"))
        idx_k = jax.jit(lambda p: fps_pallas(K_FPS, p))(x)
        idx_s = jax.jit(jax.vmap(lambda p: _fps_single(p, K_FPS)))(x)
        _readback(idx_k)
        mism = int((np.asarray(idx_k) != np.asarray(idx_s)).sum())
        assert mism == 0, f"{mism} index mismatches of {idx_s.size}"
        return {"npoint": K_FPS, "n": N_FPS}

    sweep.run("fps_pallas_vs_scan", check_fps)

    # ---- 6. fused merge-coords kernel vs NN + gather -----------------------
    def check_coords():
        q = jnp.asarray(_clouds(rng, (2, N_DYN, 3), "blobs"))
        t = jnp.asarray(_clouds(rng, (2, 3000, 3), "uniform"))
        d_f, c_f = jax.jit(ops.nearest_neighbor_coords)(q, t)
        d_r, i_r = jax.jit(ops.nearest_neighbor)(q, t)
        _readback(c_f)
        c_r = jnp.take_along_axis(t, i_r[..., None], axis=1)
        derr = float(np.abs(np.asarray(d_f) - np.asarray(d_r)).max())
        assert derr == 0.0, f"dist err {derr}"
        # The one-hot gather returns exactly x2[best_i]; but best_i itself
        # can differ from the separate index kernel's pick on NEAR-TIES
        # (ulp-level e = |t|²−2q·t skew between two compilations; the final
        # distances collapse bit-equal — observed on-chip 2026-08-18, coords
        # err 2e-3 with dist err exactly 0). Tie-agnostic contract: every
        # fused coordinate must REALIZE the reported min distance, and
        # index divergence must stay at tie rarity.
        d_realized = jnp.sum((q - c_f) ** 2, axis=-1)
        rerr = float(np.abs(np.asarray(d_realized) - np.asarray(d_f)).max())
        assert rerr < 1e-6, f"coords do not realize min dist (err {rerr})"
        mismatch = float(np.mean(np.any(np.asarray(c_f) != np.asarray(c_r), axis=-1)))
        assert mismatch < 1e-3, f"coords diverge beyond tie rarity: {mismatch:.2%}"
        return {"tie_divergence_frac": mismatch}

    sweep.run("merge_coords_vs_gather", check_coords)

    # ---- 7. fused plan-free EMD (eval) vs composed full-matrix path -------
    def check_emd_eval():
        x1 = jnp.asarray(_clouds(rng, (2, N_EMD, 3), "uniform"))
        x2 = jnp.asarray(_clouds(rng, (2, N_EMD, 3), "blobs"))
        fused = jax.jit(ops.approx_match_cost)(x1, x2)
        _readback(fused)
        composed = jax.jit(
            lambda a, b: ops.match_cost(a, b, ops.approx_match(a, b))
        )(x1, x2)
        rel = float(np.abs(np.asarray(fused) - np.asarray(composed)).max()
                    / max(np.abs(np.asarray(composed)).max(), 1e-12))
        # "identical up to fp summation order" — thousands of fp32 adds
        # reassociated between the fused and composed paths
        assert rel < 1e-4, f"rel err {rel}"
        return {"rel_err": rel}

    sweep.run("emd_fused_vs_composed", check_emd_eval)

    # ---- 8. banded eval-EMD loss wrapper at eval batch ---------------------
    def check_emd_eval_banded():
        g = jnp.asarray(_clouds(rng, (B_EVAL, N_EVAL_EMD, 3), "uniform"))
        o = jnp.asarray(_clouds(rng, (B_EVAL, N_EVAL_EMD, 3), "blobs"))
        v = jax.jit(losses.earth_mover_eval)(g, o)
        _readback(v)
        ref = jax.jit(
            lambda a, b: jnp.mean(ops.match_cost(a, b, ops.approx_match(a, b)))
            / N_EVAL_EMD
        )(g, o)
        rel = abs(float(v) - float(ref)) / max(abs(float(ref)), 1e-12)
        # fp summation-order skew only (see emd_fused_vs_composed)
        assert rel < 1e-4, f"rel err {rel} ({float(v)} vs {float(ref)})"
        return {"rel_err": rel}

    sweep.run("emd_eval_banded_vs_composed", check_emd_eval_banded)

    # ---- 9. differentiable plan-free train EMD: value + gradients ----------
    def check_emd_diff():
        x1 = jnp.asarray(_clouds(rng, (2, N_EMD // 4, 3), "uniform"))
        x2 = jnp.asarray(_clouds(rng, (2, N_EMD // 2, 3), "uniform"))

        def fused(a, b):
            return jnp.sum(ops.approx_match_cost_diff(a, b))

        def composed(a, b):
            m = jax.lax.stop_gradient(ops.approx_match(a, b))
            return jnp.sum(ops.match_cost(a, b, m))

        v1 = float(jax.jit(fused)(x1, x2))
        v2 = float(jax.jit(composed)(x1, x2))
        rel = abs(v1 - v2) / max(abs(v2), 1e-12)
        assert rel < 1e-5, f"value rel err {rel}"
        g1 = jax.jit(jax.grad(fused, argnums=(0, 1)))(x1, x2)
        g2 = jax.jit(jax.grad(composed, argnums=(0, 1)))(x1, x2)
        _readback(g1)
        gerr = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                   for a, b in zip(g1, g2))
        # relative to the gradient scale: the two paths reassociate
        # thousands of fp32 exp/mul/add chains (10 sweep levels), so the
        # absolute skew scales with |g| (on-chip 2026-08-18: 6.1e-5 abs at
        # |g|~O(1) — diffuse fp noise, value rel err passed at 1e-5)
        gscale = max(float(np.abs(np.asarray(a)).max()) for a in g2)
        grel = gerr / max(gscale, 1e-12)
        assert grel < 2e-4, f"grad rel err {grel} (abs {gerr}, scale {gscale})"
        return {"value_rel_err": rel, "max_grad_err": gerr, "grad_rel_err": grel}

    sweep.run("emd_diff_value_and_grad", check_emd_diff)

    # ---- 10. auction match: noised-permutation recovery --------------------
    def check_auction():
        # the reference's own acceptance test (`tf_auctionmatch.py:40-50`):
        # match a cloud against a permuted+noised copy of itself — the
        # assignment must be a permutation that pairs each point with its
        # noised twin (matched distance at the noise scale, not the
        # point-spacing scale)
        from rfnet_tpu.ops.auction import auction_match

        n = 64 if args.tiny else 256
        noise = 1e-4
        b = 2
        x1 = _clouds(rng, (b, n, 3), "uniform")
        perms = np.stack([rng.permutation(n) for _ in range(b)])
        x2 = np.take_along_axis(x1, perms[..., None], axis=1)
        x2 = (x2 + noise * rng.randn(b, n, 3)).astype(np.float32)
        ml, mr = jax.jit(auction_match)(jnp.asarray(x1), jnp.asarray(x2))
        _readback(ml)
        ml, mr = np.asarray(ml), np.asarray(mr)
        for bi in range(b):
            assert sorted(ml[bi]) == list(range(n)), "matchl not a permutation"
            np.testing.assert_array_equal(mr[bi][ml[bi]], np.arange(n))
        matched = np.take_along_axis(x2, ml[..., None], axis=1)
        mean_d = float(np.mean(np.linalg.norm(x1 - matched, axis=-1)))
        # perfect recovery pairs each point with its twin: mean matched
        # distance == mean noise norm (~noise·√3·√(2/π)·… ≈ 1.6·noise)
        assert mean_d < 5 * noise, f"mean matched dist {mean_d} >> noise"
        recovered = float(np.mean(ml == np.argsort(perms, axis=-1)))
        assert recovered > 0.99, f"recovered only {recovered:.1%} of the permutation"
        return {"mean_matched_dist": mean_d, "recovered_frac": recovered}

    sweep.run("auction_noised_permutation", check_auction)

    # ---- 10b. auction at the reference contract ceiling (4096²) ------------
    def check_auction_4096():
        # VERDICT r4 item 7: the reference op rejects n > 4096
        # (`tf_auctionmatch.cpp:37-41`); enforce the same contract and time
        # the op AT that ceiling — the shape the reference can maximally run.
        import time as _time

        from rfnet_tpu.ops.auction import auction_match

        n = 128 if args.tiny else 4096
        try:
            auction_match(jnp.zeros((1, 4097, 3)), jnp.zeros((1, 4097, 3)))
            raise AssertionError("n>4096 not rejected")
        except ValueError:
            pass
        try:
            auction_match(jnp.zeros((1, 64, 3)), jnp.zeros((1, 65, 3)))
            raise AssertionError("n != m not rejected")
        except ValueError:
            pass
        x1 = _clouds(rng, (1, n, 3), "uniform")
        perm = rng.permutation(n)[None]
        x2 = (
            np.take_along_axis(x1, perm[..., None], axis=1)
            + 1e-4 * rng.randn(1, n, 3)
        ).astype(np.float32)
        fn = jax.jit(auction_match)
        ml, _ = fn(jnp.asarray(x1), jnp.asarray(x2))  # compile
        _readback(ml)
        t0 = _time.perf_counter()
        ml, mr = fn(jnp.asarray(x1), jnp.asarray(x2))
        _readback(ml)
        ms = (_time.perf_counter() - t0) * 1e3
        ml = np.asarray(ml)
        assert sorted(ml[0]) == list(range(n)), "matchl not a permutation"
        matched = np.take_along_axis(x2, ml[..., None], axis=1)
        mean_d = float(np.mean(np.linalg.norm(x1 - matched, axis=-1)))
        assert mean_d < 5e-4, f"mean matched dist {mean_d} >> noise"
        return {"n": n, "ms": round(ms, 1), "mean_matched_dist": mean_d}

    sweep.run("auction_4096_contract_timing", check_auction_4096)

    # ---- 11. ball query + three_nn vs numpy oracles ------------------------
    def check_grouping_interp():
        from rfnet_tpu.ops.grouping import query_ball_point
        from rfnet_tpu.ops.interpolate import three_nn

        b, n, m, k, radius = 2, 128, 32, 16, 0.25
        pts = _clouds(rng, (b, n, 3), "blobs")
        qs = _clouds(rng, (b, m, 3), "uniform")
        idx, cnt = jax.jit(
            lambda a, b_: query_ball_point(radius, k, a, b_)
        )(jnp.asarray(pts), jnp.asarray(qs))
        _readback(cnt)
        idx, cnt = np.asarray(idx), np.asarray(cnt)
        d = np.sqrt(((qs[:, :, None] - pts[:, None]) ** 2).sum(-1))  # (b,m,n)
        d = np.maximum(d, 1e-20)
        for bi in range(b):
            for qi in range(m):
                hits = np.nonzero(d[bi, qi] < radius)[0]
                c = min(len(hits), k)
                assert cnt[bi, qi] == c, f"cnt {cnt[bi, qi]} vs {c}"
                first = hits[0] if len(hits) else 0
                want = list(hits[:c]) + [first] * (k - c)
                assert list(idx[bi, qi]) == want, f"ball idx row mismatch"

        dist3, idx3 = jax.jit(three_nn)(jnp.asarray(qs), jnp.asarray(pts))
        _readback(dist3)
        dist3, idx3 = np.asarray(dist3, np.float64), np.asarray(idx3)
        d2 = ((qs.astype(np.float64)[:, :, None]
               - pts.astype(np.float64)[:, None]) ** 2).sum(-1)
        ref3 = np.sort(d2, axis=-1)[..., :3]
        err = float(np.abs(dist3 - ref3).max())
        assert err < 1e-5, f"three_nn dist err {err}"
        # returned indices must realize the returned distances (tie-agnostic)
        realized = np.take_along_axis(d2, idx3, axis=-1)
        rerr = float(np.abs(realized - dist3).max())
        assert rerr < 1e-5, f"three_nn idx does not realize dist ({rerr})"
        return {"ball_rows": b * m, "three_nn_max_err": err}

    sweep.run("ball_query_three_nn_vs_numpy", check_grouping_interp)

    # ---- 12. StableHLO export artifact: save -> load -> run ----------------
    def check_export_roundtrip():
        import tempfile

        from rfnet_tpu.export import export_forward, load_forward, save_exported
        from rfnet_tpu.train import TrainConfig, create_state

        if args.tiny:
            config = TrainConfig(batch_size=2, innum=64, ptnum=128,
                                 n_seed=4, up_ratio=4)
        else:
            config = TrainConfig()
        state = create_state(config)
        exported = export_forward(state, 2, config.innum)
        with tempfile.TemporaryDirectory() as td:
            path = _os.path.join(td, "rfnet.shlo")
            nbytes = save_exported(exported, path)
            served = load_forward(path)
            x = jnp.asarray(_clouds(rng, (2, config.innum, 3), "uniform"))
            y_art = served(x)
            _readback(y_art)
            y_live = jax.jit(
                lambda p, a: state.apply_fn(p, a).out4
            )(state.params, x)
            err = float(np.abs(np.asarray(y_art) - np.asarray(y_live)).max())
            # same trace, same backend, same compiler — bit-exact expected;
            # the tolerance only covers compiler-version fusion skew
            assert err < 1e-6, f"artifact vs live err {err}"
        return {"bytes": nbytes, "max_err": err}

    sweep.run("export_roundtrip", check_export_roundtrip)

    # ---- 13. model forward + param golden + train steps --------------------
    def check_model_and_step():
        import functools

        from rfnet_tpu.train import TrainConfig, create_state, train_step

        if args.tiny:
            config = TrainConfig(batch_size=4, innum=64, ptnum=128,
                                 n_seed=4, up_ratio=4)
        else:
            config = TrainConfig()
        state = create_state(config)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(state.params))
        if not args.tiny:  # golden holds for the flagship widths only
            assert n_params == 3_827_611, f"param count {n_params}"
        b = 2 if args.tiny else 4
        partial = jnp.asarray(_clouds(rng, (b, config.innum, 3), "uniform"))
        gt = jnp.asarray(_clouds(rng, (b, config.ptnum, 3), "uniform"))
        out = jax.jit(state.apply_fn)(state.params, partial)
        _readback(out.out4)
        assert out.out4.shape == (b, config.ptnum, 3)
        assert bool(jnp.isfinite(out.out4).all()), "non-finite forward output"
        n1, n2 = 2 * config.n_seed, 2 * config.n_seed * config.up_ratio
        jstep = jax.jit(functools.partial(train_step, n1=n1, n2=n2))
        tot = []
        for _ in range(3):
            state, lb, _ = jstep(state, partial, gt)
            tot.append(float(lb.total))
        assert all(np.isfinite(tot)), f"non-finite losses {tot}"
        assert tot[-1] < tot[0], f"loss did not decrease over 3 steps: {tot}"
        return {"param_count": n_params, "losses": [round(t, 4) for t in tot]}

    sweep.run("model_forward_and_train_step", check_model_and_step)
    interpret.__exit__(None, None, None)

    artifact = {
        "ok": sweep.ok,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "tiny": bool(args.tiny),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "checks": sweep.results,
    }
    if on_tpu and args.only is None:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}", flush=True)
    print(json.dumps({"ok": sweep.ok,
                      "passed": sum(r["ok"] for r in sweep.results.values()),
                      "total": len(sweep.results)}), flush=True)
    return 0 if sweep.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
