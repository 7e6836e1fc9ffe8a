"""nn_distance: brute-force numpy oracle + gradient checks.

Oracle methodology follows the reference's own (commented-out) numpy check in
`pc_distance/tf_nndistance.py:70-78` and its CPU kernel
(`pc_distance/tf_nndistance.cpp:21-43`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfnet_tpu.ops.chamfer import nn_distance


def brute_force(xyz1, xyz2):
    d = np.sum((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2, axis=-1)
    return (
        d.min(axis=2),
        d.argmin(axis=2).astype(np.int32),
        d.min(axis=1),
        d.argmin(axis=1).astype(np.int32),
    )


@pytest.mark.parametrize("n,m", [(64, 64), (100, 37), (300, 513)])
def test_forward_matches_bruteforce(rng, n, m):
    x1 = rng.randn(2, n, 3).astype(np.float32)
    x2 = rng.randn(2, m, 3).astype(np.float32)
    d1, i1, d2, i2 = jax.jit(nn_distance)(x1, x2)
    bd1, bi1, bd2, bi2 = brute_force(x1, x2)
    np.testing.assert_allclose(d1, bd1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(d2, bd2, rtol=1e-5, atol=1e-5)
    # indices must point at equally-near neighbours (fp ties tolerated)
    g1 = np.take_along_axis(
        np.sum((x1[:, :, None] - x2[:, None]) ** 2, -1), np.asarray(i1)[..., None], 2
    )[..., 0]
    np.testing.assert_allclose(g1, bd1, rtol=1e-5, atol=1e-5)


def test_gradient_matches_finite_difference(rng):
    x1 = rng.randn(1, 24, 3).astype(np.float64).astype(np.float32)
    x2 = rng.randn(1, 31, 3).astype(np.float32)

    def loss(a, b):
        d1, _, d2, _ = nn_distance(a, b)
        return jnp.sum(d1) + 0.5 * jnp.sum(d2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x1), jnp.asarray(x2))

    eps = 1e-3
    for arr_idx, (arr, g) in enumerate([(x1, g1), (x2, g2)]):
        for flat in [0, 10, 40]:
            p = arr.copy().reshape(-1)
            p[flat] += eps
            up = [x1, x2]
            up[arr_idx] = p.reshape(arr.shape)
            lp = float(loss(jnp.asarray(up[0]), jnp.asarray(up[1])))
            p[flat] -= 2 * eps
            up[arr_idx] = p.reshape(arr.shape)
            lm = float(loss(jnp.asarray(up[0]), jnp.asarray(up[1])))
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - float(g.reshape(-1)[flat])) < 5e-2, (arr_idx, flat)


def test_identical_clouds_zero(rng):
    x = rng.randn(1, 50, 3).astype(np.float32)
    d1, i1, d2, i2 = nn_distance(x, x)
    np.testing.assert_allclose(d1, 0.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.arange(50)[None])


def test_grad_descent_pulls_clouds_together(rng):
    """Reference smoke test: 100 GD steps shrink the distance
    (`pc_distance/tf_nndistance.py:33-78`)."""
    x1 = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    x2 = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))

    @jax.jit
    def step(a):
        def f(a):
            d1, _, d2, _ = nn_distance(a, x2)
            return jnp.mean(d1) + jnp.mean(d2)

        l, g = jax.value_and_grad(f)(a)
        return a - 0.25 * g, l

    l0 = None
    for _ in range(100):
        x1, l = step(x1)
        l0 = l if l0 is None else l0
    # GD converges to the structural CD floor of two random clouds; require a
    # solid monotone-ish reduction rather than an exact value.
    assert float(l) < 0.5 * float(l0)


def test_dyn_kernel_interpret_matches_bruteforce(rng):
    """Early-exit slab NN scan: exact distances AND exact lowest-index ties
    (interpret mode on CPU; on-chip timing in tools/bench_chamfer_dyn.py)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.chamfer import nearest_neighbor_dyn

    cases = []
    # structured blobs, ragged sizes
    centers = rng.randn(6, 3).astype(np.float32)
    for n, m in [(70, 150), (300, 520)]:
        q = (centers[rng.randint(0, 6, n)] + 0.1 * rng.randn(n, 3)).astype(np.float32)[None]
        t = (centers[rng.randint(0, 6, m)] + 0.1 * rng.randn(m, 3)).astype(np.float32)[None]
        cases.append((q, t))
    # exact duplicated targets force distance ties: the kernel must return the
    # LOWEST target index, like the dense scan's index-ordered first-tie rule
    t = rng.rand(1, 64, 3).astype(np.float32)
    t_dup = np.concatenate([t, t[:, ::-1], t], axis=1)  # each point 3 times
    cases.append((rng.rand(1, 40, 3).astype(np.float32), t_dup))
    # all-z-equal worst case: zero pruning possible, must still be exact
    qf = rng.rand(1, 100, 3).astype(np.float32)
    tf = rng.rand(1, 130, 3).astype(np.float32)
    qf[..., 2] = 0.5
    tf[..., 2] = 0.5
    cases.append((qf, tf))

    for q, t in cases:
        with pltpu.force_tpu_interpret_mode():
            d, i = nearest_neighbor_dyn(jnp.asarray(q), jnp.asarray(t))
        bd = np.sum((q[:, :, None] - t[:, None]) ** 2, -1)
        # |t|²−2·q·t expansion noise, same tolerance class as the dense kernel
        np.testing.assert_allclose(np.asarray(d), bd.min(-1), rtol=1e-3, atol=1e-5)
        picked = np.take_along_axis(bd, np.asarray(i)[..., None], 2)[..., 0]
        np.testing.assert_allclose(picked, bd.min(-1), rtol=1e-3, atol=1e-5)


def test_dyn_tie_resolution_lowest_index(rng):
    """With exactly duplicated target points, idx must equal the brute-force
    argmin (numpy argmin returns the first == lowest index)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.pallas.chamfer_dyn import nn_dyn_pallas

    t_base = rng.rand(1, 80, 3).astype(np.float32)
    t = np.concatenate([t_base, t_base], axis=1)  # duplicate block
    q = rng.rand(1, 50, 3).astype(np.float32)
    # the kernel contract takes z-SORTED inputs; sort here, compare in sorted space
    qs = np.take_along_axis(q, np.argsort(q[..., 2], 1)[..., None], 1)
    ts = np.take_along_axis(t, np.argsort(t[..., 2], 1)[..., None], 1)
    with pltpu.force_tpu_interpret_mode():
        d, i = nn_dyn_pallas(jnp.asarray(qs), jnp.asarray(ts))
    bd = np.sum((qs[:, :, None] - ts[:, None]) ** 2, -1)
    np.testing.assert_array_equal(np.asarray(i), bd.argmin(-1).astype(np.int32))


@pytest.mark.parametrize("backend", ["tile", "dyn"])
def test_chamfer_means_dyn_value_and_grad(rng, backend, monkeypatch):
    """Sorted-space chamfer (the train loss fast path) must match the dense
    nn_distance-based value AND gradient (interpret mode on CPU) under BOTH
    sorted backends (Morton 3D tile and z slab)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.losses import _safe_sqrt
    from rfnet_tpu.ops import chamfer as chamfer_mod
    from rfnet_tpu.ops.chamfer import _chamfer_means_dyn

    monkeypatch.setattr(chamfer_mod, "_NN_SORTED_BACKEND", backend)

    a = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 130, 3).astype(np.float32))

    def dense_loss(a, b):
        d1, _, d2, _ = nn_distance(a, b)
        return 1.3 * jnp.mean(_safe_sqrt(d1)) + 0.7 * jnp.mean(_safe_sqrt(d2))

    def dyn_loss(a, b):
        m1, m2 = _chamfer_means_dyn(a, b)
        return 1.3 * m1 + 0.7 * m2

    with pltpu.force_tpu_interpret_mode():
        v_dyn, (ga_dyn, gb_dyn) = jax.value_and_grad(dyn_loss, argnums=(0, 1))(a, b)
    v_ref, (ga_ref, gb_ref) = jax.value_and_grad(dense_loss, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(float(v_dyn), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_dyn), np.asarray(ga_ref), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_dyn), np.asarray(gb_ref), rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("backend", ["tile", "dyn"])
def test_chamfer_means_pair_value_and_grad(rng, backend, monkeypatch):
    """Fused cd3/cd4 path (one gt sort, batch-stacked outs) must match two
    independent dense chamfer means in value AND gradient (interpret mode),
    under BOTH sorted backends."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.losses import _safe_sqrt
    from rfnet_tpu.ops import chamfer as chamfer_mod
    from rfnet_tpu.ops.chamfer import _chamfer_means_pair_dyn

    monkeypatch.setattr(chamfer_mod, "_NN_SORTED_BACKEND", backend)

    gt = jnp.asarray(rng.rand(2, 96, 3).astype(np.float32))
    oa = jnp.asarray(rng.rand(2, 130, 3).astype(np.float32))
    ob = jnp.asarray(rng.rand(2, 130, 3).astype(np.float32))

    def dense_loss(oa, ob):
        d1, _, d2, _ = nn_distance(gt, oa)
        e1, _, e2, _ = nn_distance(gt, ob)
        # distinct weights per term so a half-mixup would be caught
        return (
            1.3 * jnp.mean(_safe_sqrt(d1)) + 0.7 * jnp.mean(_safe_sqrt(d2))
            + 0.9 * jnp.mean(_safe_sqrt(e1)) + 1.1 * jnp.mean(_safe_sqrt(e2))
        )

    def pair_loss(oa, ob):
        ma1, ma2, mb1, mb2 = _chamfer_means_pair_dyn(gt, oa, ob)
        return 1.3 * ma1 + 0.7 * ma2 + 0.9 * mb1 + 1.1 * mb2

    with pltpu.force_tpu_interpret_mode():
        v_p, (ga_p, gb_p) = jax.value_and_grad(pair_loss, argnums=(0, 1))(oa, ob)
    v_r, (ga_r, gb_r) = jax.value_and_grad(dense_loss, argnums=(0, 1))(oa, ob)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), rtol=1e-3, atol=1e-6)
    # the gt cotangent path must also be correct (exercised explicitly here
    # even though the train loss never requests it)
    ggt_p = jax.grad(lambda g: _chamfer_means_pair_dyn(g, oa, ob)[0])
    ggt_r = jax.grad(
        lambda g: jnp.mean(_safe_sqrt(nn_distance(g, oa)[0]))
    )(gt)
    with pltpu.force_tpu_interpret_mode():
        ggt_p = ggt_p(gt)
    np.testing.assert_allclose(np.asarray(ggt_p), np.asarray(ggt_r), rtol=1e-3, atol=1e-6)


def test_chamfer_means_matches_chamfer_big(rng):
    """Dispatch fallback (CPU): chamfer_means halves average to chamfer_big."""
    from rfnet_tpu.losses import chamfer_big
    from rfnet_tpu.ops.chamfer import chamfer_means

    a = jnp.asarray(rng.rand(2, 50, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 70, 3).astype(np.float32))
    m1, m2 = chamfer_means(a, b)
    cd, _ = chamfer_big(a, b)
    np.testing.assert_allclose(float((m1 + m2) / 2.0), float(cd), rtol=1e-6)


def test_pruned_kernel_interpret_matches_bruteforce(rng):
    """Tile-pruned sorted NN scan must be exact (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.chamfer import nearest_neighbor_pruned

    # structured clouds (blobs) so the pruning actually fires, plus ragged sizes
    for n, m in [(70, 150), (300, 520)]:
        centers = rng.randn(6, 3).astype(np.float32)
        q = (centers[rng.randint(0, 6, n)] + 0.1 * rng.randn(n, 3)).astype(np.float32)[None]
        t = (centers[rng.randint(0, 6, m)] + 0.1 * rng.randn(m, 3)).astype(np.float32)[None]
        with pltpu.force_tpu_interpret_mode():
            d, i = nearest_neighbor_pruned(jnp.asarray(q), jnp.asarray(t))
        bd = np.sum((q[:, :, None] - t[:, None]) ** 2, -1)
        np.testing.assert_allclose(np.asarray(d), bd.min(-1), rtol=1e-3, atol=1e-5)
        picked = np.take_along_axis(bd, np.asarray(i)[..., None], 2)[..., 0]
        np.testing.assert_allclose(picked, bd.min(-1), rtol=1e-3, atol=1e-5)


def test_nn_grad_scatter_matches_dense_scatter(rng):
    """Banded one-hot contraction == scatter-add oracle, including
    pathological index distributions (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.pallas.nn_grad import nn_grad_scatter

    def oracle(x1, g, idx, m):
        b, n, _ = x1.shape
        sp = np.zeros((b, m, 3), np.float32)
        sw = np.zeros((b, m), np.float32)
        for bi in range(b):
            for i in range(n):
                sp[bi, idx[bi, i]] += g[bi, i] * x1[bi, i]
                sw[bi, idx[bi, i]] += g[bi, i]
        return sp, sw

    b, n, m = 2, 100, 140
    x1 = rng.rand(b, n, 3).astype(np.float32)
    g = rng.randn(b, n).astype(np.float32)
    cases = [
        # banded (what sorted argmins look like)
        np.clip(
            (np.arange(n) * m // n)[None, :] + rng.randint(-9, 9, (b, n)), 0, m - 1
        ).astype(np.int32),
        # adversarial: everything on one target
        np.full((b, n), m - 1, np.int32),
        # adversarial: uniformly random (band interval covers everything)
        rng.randint(0, m, (b, n)).astype(np.int32),
    ]
    for idx in cases:
        with pltpu.force_tpu_interpret_mode():
            sp, sw = nn_grad_scatter(
                jnp.asarray(x1), jnp.asarray(g), jnp.asarray(idx), m
            )
        osp, osw = oracle(x1, g, idx, m)
        np.testing.assert_allclose(np.asarray(sp), osp, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sw), osw, rtol=1e-5, atol=1e-5)


def test_nn_coords_kernel_interpret(rng):
    """Fused coordinate-lookup scan: distances == brute force, coords ==
    target[argmin] under the dense kernel's first-tie rule — including exact
    duplicated targets, the resample_pcd-common tie case (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.pallas.chamfer import nn_coords_pallas

    t_base = rng.rand(1, 90, 3).astype(np.float32)
    cases = [
        (rng.rand(2, 70, 3).astype(np.float32), rng.rand(2, 150, 3).astype(np.float32)),
        # duplicated targets force ties; coords of any tied row are identical
        (rng.rand(1, 50, 3).astype(np.float32), np.concatenate([t_base, t_base], 1)),
    ]
    for q, t in cases:
        with pltpu.force_tpu_interpret_mode():
            d, nn = nn_coords_pallas(jnp.asarray(q), jnp.asarray(t))
        bd = np.sum((q[:, :, None] - t[:, None]) ** 2, -1)
        np.testing.assert_allclose(np.asarray(d), bd.min(-1), rtol=1e-5, atol=1e-6)
        expect = np.take_along_axis(t, bd.argmin(-1)[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(nn), expect, rtol=1e-6, atol=1e-6)


def test_nearest_neighbor_coords_fallback(rng):
    """CPU dispatch path: coords == target[idx] of nearest_neighbor."""
    from rfnet_tpu.ops.chamfer import nearest_neighbor, nearest_neighbor_coords

    q = jnp.asarray(rng.rand(2, 40, 3).astype(np.float32))
    t = jnp.asarray(rng.rand(2, 60, 3).astype(np.float32))
    d, nn = nearest_neighbor_coords(q, t)
    d2, i2 = nearest_neighbor(q, t)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), rtol=1e-6)
    expect = jnp.take_along_axis(t, i2[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(nn), np.asarray(expect), rtol=1e-6)


def test_tile_kernel_interpret_matches_bruteforce(rng):
    """3D best-first AABB-tile NN scan: exact distances AND exact ties
    (interpret mode on CPU; on-chip timing in tools/bench_chamfer_tile.py).
    Includes the blob-inside-cloud case the z-slab kernel degrades on."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.chamfer import nearest_neighbor_tile

    cases = []
    # structured blobs, ragged sizes
    centers = rng.randn(6, 3).astype(np.float32)
    for n, m in [(70, 150), (300, 520)]:
        q = (centers[rng.randint(0, 6, n)] + 0.1 * rng.randn(n, 3)).astype(np.float32)[None]
        t = (centers[rng.randint(0, 6, m)] + 0.1 * rng.randn(m, 3)).astype(np.float32)[None]
        cases.append((q, t))
    # compact blob query centred inside a spread target (early-training regime)
    q = (0.05 * rng.randn(90, 3)).astype(np.float32)[None]
    t = (rng.rand(300, 3) * 2.0 - 1.0).astype(np.float32)[None]
    cases.append((q, t))
    # exact duplicated targets force distance ties
    t = rng.rand(1, 64, 3).astype(np.float32)
    t_dup = np.concatenate([t, t[:, ::-1], t], axis=1)
    cases.append((rng.rand(1, 40, 3).astype(np.float32), t_dup))
    # all points identical: degenerate Morton normalization (hi == lo)
    qd = np.full((1, 50, 3), 0.25, np.float32)
    td = np.full((1, 70, 3), 0.75, np.float32)
    cases.append((qd, td))
    # all-z-equal plane: pruning still works via x/y bounds
    qf = rng.rand(1, 100, 3).astype(np.float32)
    tf = rng.rand(1, 130, 3).astype(np.float32)
    qf[..., 2] = 0.5
    tf[..., 2] = 0.5
    cases.append((qf, tf))

    for q, t in cases:
        with pltpu.force_tpu_interpret_mode():
            d, i = nearest_neighbor_tile(jnp.asarray(q), jnp.asarray(t))
        bd = np.sum((q[:, :, None] - t[:, None]) ** 2, -1)
        np.testing.assert_allclose(np.asarray(d), bd.min(-1), rtol=1e-3, atol=1e-5)
        picked = np.take_along_axis(bd, np.asarray(i)[..., None], 2)[..., 0]
        np.testing.assert_allclose(picked, bd.min(-1), rtol=1e-3, atol=1e-5)


def test_tile_tie_resolution_lowest_index(rng):
    """With exactly duplicated target points, idx must equal the brute-force
    argmin in Morton-sorted space (lowest sorted index wins)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.pallas.chamfer_tile import (
        nn_tile_pallas,
        sort_by_morton_with_order,
    )

    t_base = rng.rand(1, 80, 3).astype(np.float32)
    t = np.concatenate([t_base, t_base], axis=1)  # duplicate block
    q = rng.rand(1, 50, 3).astype(np.float32)
    # the kernel contract takes MORTON-sorted inputs; compare in sorted space
    qs, _ = sort_by_morton_with_order(jnp.asarray(q))
    ts, _ = sort_by_morton_with_order(jnp.asarray(t))
    qs, ts = np.asarray(qs), np.asarray(ts)
    with pltpu.force_tpu_interpret_mode():
        d, i = nn_tile_pallas(jnp.asarray(qs), jnp.asarray(ts))
    bd = np.sum((qs[:, :, None] - ts[:, None]) ** 2, -1)
    np.testing.assert_array_equal(np.asarray(i), bd.argmin(-1).astype(np.int32))


def test_morton_sort_is_permutation(rng):
    """sort_by_morton_with_order returns (sorted cloud, order) with
    sorted[k] == x[order[k]] and order a permutation."""
    from rfnet_tpu.ops.pallas.chamfer_tile import sort_by_morton_with_order

    x = rng.randn(3, 97, 3).astype(np.float32)
    xs, order = sort_by_morton_with_order(jnp.asarray(x))
    xs, order = np.asarray(xs), np.asarray(order)
    for bi in range(3):
        assert sorted(order[bi].tolist()) == list(range(97))
        np.testing.assert_array_equal(xs[bi], x[bi][order[bi]])


def test_sample_means_sorted_match_dense(rng):
    """Eval-metric helpers: sorted-space per-sample means (the TPU path) must
    equal the dense nn_distance formulation (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.chamfer import (
        chamfer_sample_means,
        nn_distance,
        nn_sample_mean_one,
    )

    out = jnp.asarray(rng.rand(3, 140, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(3, 96, 3).astype(np.float32))
    par = jnp.asarray(rng.rand(3, 50, 3).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        m1, m2 = chamfer_sample_means(out, gt, force_sorted=True)
        f1 = nn_sample_mean_one(par, out, force_sorted=True)
    d1, _, d2, _ = nn_distance(out, gt)
    np.testing.assert_allclose(np.asarray(m1), np.mean(np.sqrt(d1), 1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.mean(np.sqrt(d2), 1), rtol=1e-5)
    e1, _, _, _ = nn_distance(par, out)
    np.testing.assert_allclose(np.asarray(f1), np.mean(np.sqrt(e1), 1), rtol=1e-5)
