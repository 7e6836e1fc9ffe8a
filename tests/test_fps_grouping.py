"""FPS / gather / ball-query / group / knn / three_nn oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfnet_tpu.ops.fps import farthest_point_sample, gather_point, sampling
from rfnet_tpu.ops.grouping import group_point, knn_point, query_ball_point
from rfnet_tpu.ops.interpolate import three_interpolate, three_nn


def fps_oracle(xyz, npoint):
    """Sequential FPS mirroring tf_sampling_g.cu:105-170 (seed = index 0)."""
    n = xyz.shape[0]
    idx = np.zeros(npoint, np.int32)
    mind = np.full(n, 1e38, np.float64)
    last = 0
    for j in range(1, npoint):
        d = np.sum((xyz - xyz[last]) ** 2, axis=-1)
        mind = np.minimum(mind, d)
        last = int(np.argmax(mind))
        idx[j] = last
    return idx


@pytest.mark.parametrize("n,npoint", [(128, 16), (333, 50)])
def test_fps_matches_sequential_oracle(rng, n, npoint):
    xyz = rng.randn(3, n, 3).astype(np.float32)
    idx = np.asarray(jax.jit(farthest_point_sample, static_argnums=0)(npoint, xyz))
    for b in range(3):
        np.testing.assert_array_equal(idx[b], fps_oracle(xyz[b].astype(np.float64), npoint))


def test_gather_point_grad_is_scatter_add(rng):
    xyz = jnp.asarray(rng.randn(2, 20, 3).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 20, (2, 7)).astype(np.int32))

    g = jax.grad(lambda p: jnp.sum(gather_point(p, idx) ** 2))(xyz)
    expected = np.zeros((2, 20, 3), np.float32)
    gathered = np.asarray(gather_point(xyz, idx))
    for b in range(2):
        for j in range(7):
            expected[b, int(idx[b, j])] += 2 * gathered[b, j]
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


def test_sampling_helper_types(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    idx, pts = sampling(8, xyz, "f")
    assert idx.shape == (2, 8) and pts.shape == (2, 8, 3)
    idx_r, pts_r = sampling(8, xyz, "r", key=jax.random.PRNGKey(0))
    assert pts_r.shape == (2, 8, 3)
    # random mode uses ONE shared index set across the batch (vv_recon.py:72-82)
    np.testing.assert_array_equal(np.asarray(idx_r[0]), np.asarray(idx_r[1]))


def ball_oracle(xyz1, xyz2, radius, nsample):
    """Sequential scan mirroring tf_grouping_g.cu:3-36."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    idx = np.zeros((b, m, nsample), np.int32)
    cnt = np.zeros((b, m), np.int32)
    for bi in range(b):
        for j in range(m):
            c = 0
            for k in range(n):
                if c == nsample:
                    break
                d = max(np.sqrt(np.sum((xyz2[bi, j] - xyz1[bi, k]) ** 2)), 1e-20)
                if d < radius:
                    if c == 0:
                        idx[bi, j, :] = k
                    idx[bi, j, c] = k
                    c += 1
            cnt[bi, j] = c
    return idx, cnt


def test_query_ball_matches_cuda_semantics(rng):
    xyz1 = rng.rand(2, 60, 3).astype(np.float32)
    xyz2 = rng.rand(2, 9, 3).astype(np.float32)
    idx, cnt = jax.jit(query_ball_point, static_argnums=1)(0.3, 4, xyz1, xyz2)
    oidx, ocnt = ball_oracle(xyz1, xyz2, 0.3, 4)
    np.testing.assert_array_equal(np.asarray(cnt), ocnt)
    # compare only defined slots (reference leaves no-hit queries undefined)
    mask = ocnt > 0
    np.testing.assert_array_equal(np.asarray(idx)[mask], oidx[mask])


def test_group_point_and_grad(rng):
    pts = jnp.asarray(rng.randn(2, 30, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 30, (2, 6, 3)).astype(np.int32))
    out = group_point(pts, idx)
    assert out.shape == (2, 6, 3, 5)
    for b in range(2):
        np.testing.assert_array_equal(
            np.asarray(out[b]), np.asarray(pts)[b][np.asarray(idx)[b]]
        )
    # gradient-check style of the reference op test (tf_grouping_op_test.py:22-25)
    g = jax.grad(lambda p: jnp.sum(group_point(p, idx) ** 2))(pts)
    num = np.zeros_like(np.asarray(pts))
    for b in range(2):
        for q in range(6):
            for k in range(3):
                num[b, int(idx[b, q, k])] += 2 * np.asarray(out)[b, q, k]
    np.testing.assert_allclose(np.asarray(g), num, rtol=1e-4, atol=1e-5)


def test_knn_point_negated_value_quirk(rng):
    xyz1 = rng.randn(1, 40, 3).astype(np.float32)
    xyz2 = rng.randn(1, 5, 3).astype(np.float32)
    val, idx = knn_point(3, xyz1, xyz2)
    d2 = np.sum((xyz2[:, :, None] - xyz1[:, None]) ** 2, axis=-1)
    order = np.argsort(d2, axis=-1)[:, :, :3]
    np.testing.assert_array_equal(np.asarray(idx), order)
    np.testing.assert_allclose(
        np.asarray(val), -np.take_along_axis(d2, order, -1), rtol=1e-5
    )


def test_three_nn_and_interpolate(rng):
    xyz1 = rng.randn(2, 25, 3).astype(np.float32)
    xyz2 = rng.randn(2, 10, 3).astype(np.float32)
    dist, idx = three_nn(xyz1, xyz2)
    d2 = np.sum((xyz1[:, :, None] - xyz2[:, None]) ** 2, axis=-1)
    order = np.argsort(d2, axis=-1)[:, :, :3]
    np.testing.assert_array_equal(np.asarray(idx), order)
    np.testing.assert_allclose(
        np.asarray(dist), np.take_along_axis(d2, order, -1), rtol=1e-5, atol=1e-6
    )

    pts = jnp.asarray(rng.randn(2, 10, 7).astype(np.float32))
    w = jnp.asarray(rng.rand(2, 25, 3).astype(np.float32))
    out = three_interpolate(pts, idx, w)
    ref = np.einsum(
        "bnk,bnkc->bnc", np.asarray(w), np.asarray(pts)[np.arange(2)[:, None, None], np.asarray(idx)]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)
    # reference grad: flows to points only; weight cotangent is exactly zero
    gp, gw = jax.grad(lambda p, ww: jnp.sum(three_interpolate(p, idx, ww)), (0, 1))(pts, w)
    assert float(jnp.max(jnp.abs(gw))) == 0.0
    assert float(jnp.max(jnp.abs(gp))) > 0.0


def test_fps_pallas_interpret_matches_scan(rng):
    """The Pallas FPS kernel (interpret mode on CPU) must match the scan."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.pallas.fps import fps_pallas

    xyz = rng.randn(2, 200, 3).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        idx_k = np.asarray(fps_pallas(24, jnp.asarray(xyz)))
    idx_s = np.asarray(farthest_point_sample(24, jnp.asarray(xyz)))
    np.testing.assert_array_equal(idx_k, idx_s)
