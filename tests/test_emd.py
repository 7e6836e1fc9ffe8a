"""approx_match / match_cost / auction_match oracles and invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfnet_tpu.ops.auction import auction_match
from rfnet_tpu.ops.emd import (
    _approx_match_chunked,
    _approx_match_full,
    approx_match,
    match_cost,
)


def approx_match_oracle(xyz1, xyz2):
    """Direct numpy transcription of the GPU algorithm
    (`pc_distance/tf_approxmatch.cu:1-179`, levels 7…−2, fp32 guards)."""
    n, m = xyz1.shape[0], xyz2.shape[0]
    if n >= m:
        mult_l, mult_r = 1.0, float(n // m)
    else:
        mult_l, mult_r = float(m // n), 1.0
    remain_l = np.full(n, mult_l, np.float64)
    remain_r = np.full(m, mult_r, np.float64)
    match = np.zeros((m, n), np.float64)
    d2 = np.sum((xyz1[:, None] - xyz2[None]) ** 2, axis=-1)
    for j in range(7, -3, -1):
        level = 0.0 if j == -2 else -(4.0**j)
        w = np.exp(level * d2)  # (n, m)
        suml = 1e-9 + w @ remain_r
        ratio_l = remain_l / suml
        sumr = (w.T @ ratio_l) * remain_r
        ratio_r = np.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = np.maximum(0.0, remain_r - sumr)
        delta = w * ratio_l[:, None] * ratio_r[None, :]
        match += delta.T
        remain_l = np.maximum(0.0, remain_l - delta.sum(axis=1))
    return match


@pytest.mark.parametrize("n,m", [(32, 32), (64, 16), (17, 51)])
def test_approx_match_vs_oracle(rng, n, m):
    x1 = rng.rand(2, n, 3).astype(np.float32)
    x2 = rng.rand(2, m, 3).astype(np.float32)
    match = np.asarray(jax.jit(approx_match)(x1, x2))
    assert match.shape == (2, m, n)
    for b in range(2):
        np.testing.assert_allclose(
            match[b], approx_match_oracle(x1[b], x2[b]), rtol=1e-3, atol=1e-4
        )


def test_transport_plan_invariants(rng):
    """Row/col mass must respect the capacities (SURVEY.md §4)."""
    n, m = 48, 24
    x1 = rng.rand(1, n, 3).astype(np.float32)
    x2 = rng.rand(1, m, 3).astype(np.float32)
    match = np.asarray(approx_match(x1, x2))[0]
    mult_l, mult_r = 1.0, n // m
    assert match.min() >= 0
    # After the λ=0 final level (w ≡ 1, `tf_approxmatch.cu:21-130`) every
    # point's remaining capacity moves: per-point mass is EQUAL to its
    # capacity, not merely bounded by it — the property `earth_mover`'s
    # cost normalisation assumes.
    np.testing.assert_allclose(match.sum(axis=0), mult_l, atol=1e-4)  # per-xyz1
    np.testing.assert_allclose(match.sum(axis=1), mult_r, atol=1e-4)  # per-xyz2


def test_chunked_path_matches_full(rng):
    x1 = rng.rand(1, 128, 3).astype(np.float32)
    x2 = rng.rand(1, 96, 3).astype(np.float32)
    full = np.asarray(_approx_match_full(jnp.asarray(x1), jnp.asarray(x2)))
    chunked = np.asarray(
        _approx_match_chunked(jnp.asarray(x1), jnp.asarray(x2), chunk=32)
    )
    # chunked matmuls accumulate in a different order; only fp noise differs
    np.testing.assert_allclose(chunked, full, rtol=1e-3, atol=3e-4)


def test_approx_match_cost_fused_equals_composed(rng):
    """The plan-free fused cost must equal match_cost∘approx_match — on the
    full path AND on a shape that exercises the chunked streaming with
    padding (n % chunk != 0 via the internal pad)."""
    from rfnet_tpu.ops.emd import approx_match_cost

    for n, m in [(48, 48), (100, 36), (513, 513)]:
        x1 = rng.rand(2, n, 3).astype(np.float32)
        x2 = rng.rand(2, m, 3).astype(np.float32)
        composed = match_cost(x1, x2, approx_match(x1, x2))
        fused = approx_match_cost(jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(composed), rtol=2e-4, atol=1e-4
        )


def test_earth_mover_eval_matches_train_form(rng):
    from rfnet_tpu import losses

    x1 = rng.rand(2, 64, 3).astype(np.float32)
    x2 = rng.rand(2, 64, 3).astype(np.float32)
    np.testing.assert_allclose(
        float(losses.earth_mover_eval(x1, x2)),
        float(losses.earth_mover(x1, x2)),
        rtol=2e-4,
    )


def test_match_cost_value_and_grad(rng):
    n, m = 24, 24
    x1 = jnp.asarray(rng.rand(2, n, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, m, 3).astype(np.float32))
    match = approx_match(x1, x2)
    cost = match_cost(x1, x2, match)
    d = np.sqrt(np.sum((np.asarray(x1)[:, :, None] - np.asarray(x2)[:, None]) ** 2, -1))
    ref = np.einsum("bnm,bmn->b", d, np.asarray(match))
    np.testing.assert_allclose(np.asarray(cost), ref, rtol=1e-4)

    # finite differences through the custom VJP (match held fixed, as in the
    # reference where ApproxMatch is non-differentiable)
    def f(a):
        return jnp.sum(match_cost(a, x2, match))

    g = jax.grad(f)(x1)
    eps = 1e-3
    x1n = np.asarray(x1)
    for flat in [0, 17, 50]:
        p = x1n.copy().reshape(-1)
        p[flat] += eps
        lp = float(f(jnp.asarray(p.reshape(x1n.shape))))
        p[flat] -= 2 * eps
        lm = float(f(jnp.asarray(p.reshape(x1n.shape))))
        assert abs((lp - lm) / (2 * eps) - float(np.asarray(g).reshape(-1)[flat])) < 2e-2


@pytest.mark.parametrize("n,m", [(32, 32), (96, 32), (24, 72)])
def test_amc_diff_value_and_grad_match_composed(rng, n, m):
    """The fused differentiable cost (train path) must reproduce the composed
    match_cost∘approx_match pair: same value AND the same hand-written
    gradient, with the plan never materialised. The moments distribute over
    the per-level deltas, so agreement is up to fp summation order only.
    (No direct FD check: an FD probe re-solves the plan, whose sensitivity
    the reference gradient deliberately excludes — the fixed-plan FD check
    lives in test_match_cost_value_and_grad.)"""
    from rfnet_tpu.ops.emd import approx_match_cost_diff

    x1 = jnp.asarray(rng.rand(2, n, 3).astype(np.float32))
    x2 = jnp.asarray(rng.rand(2, m, 3).astype(np.float32))

    def composed(a, b):
        return jnp.sum(match_cost(a, b, approx_match(a, b)))

    def fused(a, b):
        return jnp.sum(approx_match_cost_diff(a, b))

    np.testing.assert_allclose(
        float(fused(x1, x2)), float(composed(x1, x2)), rtol=1e-5
    )
    gc1, gc2 = jax.grad(composed, argnums=(0, 1))(x1, x2)
    gf1, gf2 = jax.grad(fused, argnums=(0, 1))(x1, x2)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gc1), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf2), np.asarray(gc2), rtol=1e-4, atol=1e-6)


def test_earth_mover_zero_for_identical(rng):
    x = rng.rand(1, 32, 3).astype(np.float32)
    match = approx_match(x, x)
    cost = match_cost(x, x, match)
    assert float(cost[0]) / 32 < 5e-3


def test_auction_recovers_noised_permutation(rng):
    """Reference smoke test (`tf_ops/emd/tf_auctionmatch.py:33-50`)."""
    n = 64
    x1 = rng.rand(2, n, 3).astype(np.float32)
    perm = np.stack([rng.permutation(n) for _ in range(2)])
    x2 = np.take_along_axis(x1, perm[..., None], axis=1) + 1e-5 * rng.randn(2, n, 3).astype(
        np.float32
    )
    matchl, matchr = jax.jit(auction_match)(x1, x2.astype(np.float32))
    matchl = np.asarray(matchl)
    # matchl must map each x1 point to (nearly) its permuted twin
    matched = np.take_along_axis(x2, matchl[..., None], axis=1)
    mse = np.mean((matched - x1) ** 2)
    assert mse < 1e-6
    # and matchl/matchr are inverse permutations
    for b in range(2):
        assert sorted(matchl[b].tolist()) == list(range(n))
        np.testing.assert_array_equal(np.asarray(matchr)[b][matchl[b]], np.arange(n))


def test_auction_cutoff_yields_permutations(rng):
    """Forcing the bounded-iteration cutoff (max_rounds=1) must still produce
    true inverse permutations — stragglers are parked on UNCLAIMED objects,
    never piled onto object 0 (the `tf_auctionmatch.py:11-20` contract)."""
    n = 32
    x1 = rng.rand(2, n, 3).astype(np.float32)
    x2 = rng.rand(2, n, 3).astype(np.float32)
    matchl, matchr = auction_match(jnp.asarray(x1), jnp.asarray(x2), max_rounds=1)
    matchl, matchr = np.asarray(matchl), np.asarray(matchr)
    for b in range(2):
        assert sorted(matchl[b].tolist()) == list(range(n))
        assert sorted(matchr[b].tolist()) == list(range(n))
        np.testing.assert_array_equal(matchr[b][matchl[b]], np.arange(n))


def test_auction_input_contract():
    """The reference op's input checks (`tf_auctionmatch.cpp:37-41`): equal
    sizes and n ≤ 4096; both violations must raise before tracing."""
    import pytest

    with pytest.raises(ValueError, match="equal-size"):
        auction_match(jnp.zeros((1, 8, 3)), jnp.zeros((1, 9, 3)))
    with pytest.raises(ValueError, match="4096"):
        auction_match(jnp.zeros((1, 4097, 3)), jnp.zeros((1, 4097, 3)))


def test_emd_func_api_parity(rng):
    """emd_func (vv_recon.py:365-380): radius-normalised auction EMD."""
    from rfnet_tpu.losses import emd_func

    n = 32
    x = rng.rand(2, n, 3).astype(np.float32)
    v_same = float(emd_func(jnp.asarray(x), jnp.asarray(x)))
    assert v_same < 1e-6
    y = x + 0.3 * rng.randn(2, n, 3).astype(np.float32)
    assert float(emd_func(jnp.asarray(x), jnp.asarray(y))) > v_same


def test_chunked_padding_mass_conservation(rng):
    """Regression: padded query rows must carry zero mass — capacities come
    from the REAL query count, and the λ=0 final level must not let padding
    absorb transport."""
    _padding_body(rng)


def test_pallas_banded_cost_matches_xla(rng):
    """The VMEM-resident banded-sweep kernels (ops/pallas/emd.py — the TPU
    eval dispatch) must reproduce the XLA recurrence: same level schedule,
    same guards; the underflow band skip is bit-exact by construction
    (exp(x) == 0 for x < −104)."""
    from jax.experimental.pallas import tpu as pltpu

    from rfnet_tpu.ops.emd import approx_match_cost
    from rfnet_tpu.ops.pallas.emd import approx_match_cost_pallas

    for (b, n, m) in [(2, 256, 256), (1, 300, 130), (2, 96, 520)]:
        x1 = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
        x2 = jnp.asarray(rng.rand(b, m, 3).astype(np.float32))
        ref = np.asarray(approx_match_cost(x1, x2))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(approx_match_cost_pallas(x1, x2))
        np.testing.assert_allclose(got, ref, rtol=2e-4)


def _padding_body(rng):
    n, m = 100, 32  # n % chunk != 0 when chunked with chunk=32
    x1 = rng.rand(1, n, 3).astype(np.float32)
    x2 = rng.rand(1, m, 3).astype(np.float32)
    full = np.asarray(_approx_match_full(jnp.asarray(x1), jnp.asarray(x2)))
    from rfnet_tpu.ops.emd import _approx_match_chunked

    n_pad = 128
    x1p = np.pad(x1, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=1e6)
    chunked = np.asarray(
        _approx_match_chunked(jnp.asarray(x1p), jnp.asarray(x2), 32, real_n=n)
    )[:, :, :n]
    np.testing.assert_allclose(chunked, full, rtol=1e-3, atol=3e-4)
    # padded columns of the (unsliced) plan must be exactly zero
    full_pad = np.asarray(
        _approx_match_chunked(jnp.asarray(x1p), jnp.asarray(x2), 32, real_n=n)
    )
    assert float(np.abs(full_pad[:, :, n:]).max()) == 0.0
