"""CPU simulation: how many target tiles each kernel actually scans.

Counts, per query tile, the number of target slabs/tiles processed by

  * the z-slab two-pointer walk of ops/pallas/chamfer_dyn.py (1D z bound,
    rounds=2 over-processing included), and
  * the 3D best-first AABB walk of ops/pallas/chamfer_tile.py,

on three data regimes (random uniform, compact blob inside spread target,
real untrained-model outputs vs synthetic gt). Scan counts are the dominant
cost term of both kernels (each processed tile is a tile_m×tile_n VPU scan),
so the ratio predicts on-chip speedup without the chip — useful because the
axon relay drops out for hours at a time.

Run on CPU: forces jax cpu platform; the model forward at b=1 is slow but
bounded (~1 min).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable as `python tools/<x>.py`


def zslab_counts(q, t, tile_n=256, tile_m=512, rounds=2):
    """Slabs processed per query tile by the two-pointer z walk (both clouds
    z-sorted), including round-granularity over-processing."""
    q = q[np.argsort(q[:, 2])]
    t = t[np.argsort(t[:, 2])]
    n, m = len(q), len(t)
    nt = -(-n // tile_n)
    mt = -(-m // tile_m)
    zlo = np.array([t[i * tile_m : (i + 1) * tile_m, 2].min() for i in range(mt)])
    zhi = np.array([t[i * tile_m : (i + 1) * tile_m, 2].max() for i in range(mt)])
    s_t = (t * t).sum(1)
    counts = []
    for ni in range(nt):
        qt = q[ni * tile_n : (ni + 1) * tile_n]
        qzlo, qzhi = qt[:, 2].min(), qt[:, 2].max()
        s_q = (qt * qt).sum(1)
        best = np.full(len(qt), np.inf)
        anchor = min((ni * mt) // nt, mt - 1)
        up, dn = anchor, anchor - 1
        processed = 0
        max_bd = np.inf
        while True:
            gup = zlo[up] - qzhi if up < mt else np.inf
            gdn = qzlo - zhi[dn] if dn >= 0 else np.inf
            g = max(min(max(gup, 0.0), max(gdn, 0.0)), 0.0)
            if not (g * g <= max_bd and (up < mt or dn >= 0)):
                break
            for _ in range(rounds):
                gu = max(zlo[up] - qzhi, 0.0) if up < mt else np.inf
                gd = max(qzlo - zhi[dn], 0.0) if dn >= 0 else np.inf
                if gu <= gd:
                    phys = min(up, mt - 1)
                    up += 1
                else:
                    phys = max(dn, 0)
                    dn -= 1
                sl = t[phys * tile_m : (phys + 1) * tile_m]
                e = ((qt[:, None] - sl[None]) ** 2).sum(-1).min(1)
                best = np.minimum(best, e)
                processed += 1
            max_bd = best.max()
        counts.append(processed)
    return np.array(counts), mt


def tile_counts(q, t, tile_n=256, tile_m=512, rounds=2):
    """Tiles processed per query tile by the 3D best-first AABB walk (both
    clouds Morton-sorted), including round-granularity over-processing."""
    from rfnet_tpu.ops.pallas.chamfer_tile import sort_by_morton_with_order

    q = np.asarray(sort_by_morton_with_order(jnp.asarray(q[None]))[0][0])
    t = np.asarray(sort_by_morton_with_order(jnp.asarray(t[None]))[0][0])
    n, m = len(q), len(t)
    nt = -(-n // tile_n)
    mt = -(-m // tile_m)
    lo = np.stack([t[i * tile_m : (i + 1) * tile_m].min(0) for i in range(mt)])
    hi = np.stack([t[i * tile_m : (i + 1) * tile_m].max(0) for i in range(mt)])
    counts = []
    for ni in range(nt):
        qt = q[ni * tile_n : (ni + 1) * tile_n]
        qlo, qhi = qt.min(0), qt.max(0)
        gaps = np.maximum(np.maximum(lo - qhi[None], qlo[None] - hi), 0.0)
        bnd = (gaps * gaps).sum(1)
        bnd = bnd.copy()
        best = np.full(len(qt), np.inf)
        processed = 0
        max_bd = np.inf
        while bnd.min() <= max_bd and processed < mt + rounds:
            for _ in range(rounds):
                ti = int(bnd.argmin())
                sl = t[ti * tile_m : (ti + 1) * tile_m]
                e = ((qt[:, None] - sl[None]) ** 2).sum(-1).min(1)
                best = np.minimum(best, e)
                bnd[ti] = np.inf
                processed += 1
            max_bd = best.max()
        counts.append(processed)
    return np.array(counts), mt


def band_widths(q, t, sort, tile_n=256, tile_m=512):
    """nn_grad_scatter cost proxy: per-TARGET-tile visit count = number of
    query tiles whose [min idx, max idx] interval overlaps it."""
    from rfnet_tpu.ops.pallas.chamfer_tile import sort_by_morton_with_order

    if sort == "z":
        q = q[np.argsort(q[:, 2])]
        t = t[np.argsort(t[:, 2])]
    else:
        q = np.asarray(sort_by_morton_with_order(jnp.asarray(q[None]))[0][0])
        t = np.asarray(sort_by_morton_with_order(jnp.asarray(t[None]))[0][0])
    n, m = len(q), len(t)
    nt = -(-n // tile_n)
    mt = -(-m // tile_m)
    # exact argmin idx (chunked to bound memory)
    idx = np.empty(n, np.int64)
    for s in range(0, n, 512):
        e = ((q[s : s + 512, None] - t[None]) ** 2).sum(-1)
        idx[s : s + 512] = e.argmin(1)
    visits = np.zeros(mt, np.int64)
    for qi in range(nt):
        ii = idx[qi * tile_n : (qi + 1) * tile_n]
        lo_t, hi_t = ii.min() // tile_m, ii.max() // tile_m
        visits[lo_t : hi_t + 1] += 1
    return visits


def report(name, q, t):
    """Sweep tile shapes; print pairs scanned per query point (the VPU cost)
    and iteration count (the while-loop overhead proxy) for each config."""
    rows = []
    for tm in (512, 256, 128):
        zc, mt = zslab_counts(q, t, tile_m=tm)
        rows.append(f"z tm={tm}: it={zc.mean():5.1f}/{mt} pp={zc.mean()*tm:7.0f}")
    for tn, tm in ((256, 512), (256, 256), (256, 128), (128, 128), (128, 64)):
        tc, mt = tile_counts(q, t, tile_n=tn, tile_m=tm)
        rows.append(
            f"3d tn={tn} tm={tm}: it={tc.mean():5.1f}/{mt} pp={tc.mean()*tm:7.0f}"
        )
    bz = band_widths(q, t, "z")
    bm = band_widths(q, t, "morton")
    print(f"== {name}  (bwd interval visits/ttile: z={bz.mean():.1f} morton={bm.mean():.1f})", flush=True)
    for r in rows:
        print("   " + r, flush=True)


def main():
    rng = np.random.RandomState(0)
    n = 16384
    gt_like = rng.rand(n, 3).astype(np.float32)
    rand = rng.rand(n, 3).astype(np.float32)
    blob = (0.05 * rng.randn(n, 3)).astype(np.float32) + 0.5

    # real synthetic gt + untrained model output (b=1, CPU — slow but bounded)
    from rfnet_tpu.data.online import synthetic_batch
    from rfnet_tpu.models import RFNet
    from rfnet_tpu.train import TrainConfig, create_state

    config = TrainConfig()
    state = create_state(config, RFNet())
    partial, gt = synthetic_batch(jax.random.PRNGKey(7), 1, config.innum, config.ptnum)
    out = jax.jit(state.apply_fn)(state.params, partial)
    o3 = np.asarray(jax.lax.stop_gradient(out.out3))[0]
    g0 = np.asarray(gt)[0]
    report("init out3->gt (REAL)", o3, g0)
    report("gt->init out3 (REAL)", g0, o3)
    report("gt->gt' (converged proxy)", g0 + 0.01 * rng.randn(n, 3).astype(np.float32), g0)

    report("rand->rand", rand, gt_like)
    report("blob->spread", blob, gt_like)
    report("spread->blob", gt_like, blob)


if __name__ == "__main__":
    main()
