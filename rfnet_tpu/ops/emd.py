"""Approximate Earth Mover's Distance: multiscale soft matching + cost.

TPU-native equivalent of the reference ``ApproxMatch`` / ``MatchCost`` CUDA
ops (`pc_distance/tf_approxmatch.cu`, Python contract
`pc_distance/tf_approxmatch.py:10-50`).

Algorithm (mirrors the GPU kernel `tf_approxmatch.cu:1-179` exactly — the GPU
level schedule j = 7 … −2, not the CPU one):

  capacities: multiL = 1, multiR = n//m  if n ≥ m  (integer division, as the
  CUDA ints do), else multiL = m//n, multiR = 1.
  for level j in 7, 6, …, −1, −2 with λ = −4^j (λ = 0 at j = −2):
      w_kl       = exp(λ · d²(xyz1_k, xyz2_l))
      ratioL_k   = remainL_k / (1e−9 + Σ_l w_kl · remainR_l)
      s_l        = (Σ_k w_kl · ratioL_k) · remainR_l
      ratioR_l   = min(remainR_l / (s_l + 1e−9), 1) · remainR_l
      remainR_l  = max(0, remainR_l − s_l)
      Δ_kl       = w_kl · ratioL_k · ratioR_l
      match     += Δ;  remainL_k = max(0, remainL_k − Σ_l Δ_kl)

``approx_match`` returns the transport plan ``match (b, m, n)`` and is
non-differentiable (`tf_approxmatch.py:19`). ``match_cost`` is
``Σ ‖p1−p2‖·match`` per batch element with the reference's hand-written
gradient (`tf_approxmatch.cu:229-295`): cotangents flow to both clouds through
``match·(p1−p2)/max(‖p1−p2‖, 1e−10)``, and the plan itself gets none.

Two execution paths share the level recurrence:
  * full — one (b, n, m) distance matrix, per-level reductions as fp32 MXU
    matmuls; used when the matrix fits comfortably in HBM.
  * chunked — streams n-axis chunks, recomputing the distance tile per pass
    (the TPU analogue of the CUDA kernel's 1024-pt shared-memory tiling,
    `tf_approxmatch.cu:11,35`); only the (b, m, n) plan is materialised, so
    the 16384² eval case fits on one chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Full-matrix path is used while b·n·m stays below this many fp32 elements.
_FULL_PATH_MAX_ELEMS = 160 * 1024 * 1024
# Chunk rows for the streamed path (transient tile = b·chunk·m floats).
_CHUNK = 512


def _levels() -> jax.Array:
    js = jnp.arange(7, -3, -1, dtype=jnp.float32)
    lv = -jnp.power(4.0, js)
    return jnp.where(js == -2, 0.0, lv)


def _capacities(n: int, m: int) -> tuple[float, float]:
    if n >= m:
        return 1.0, float(n // m)
    return float(m // n), 1.0


def _sq_dists(x1, x2):
    """(b, n, 3), (b, m, 3) -> (b, n, m) squared distances, fp32-exact."""
    s1 = jnp.sum(x1 * x1, axis=-1)
    s2 = jnp.sum(x2 * x2, axis=-1)
    cross = lax.dot_general(
        x1, x2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(s1[:, :, None] + s2[:, None, :] - 2.0 * cross, 0.0)


def _mm(a, b):
    return lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _approx_match_full(xyz1, xyz2):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    multi_l, multi_r = _capacities(n, m)
    d2 = _sq_dists(xyz1, xyz2)  # (b, n, m)

    def level_step(carry, level):
        match, remain_l, remain_r = carry  # match (b, n, m)
        w = jnp.exp(level * d2)
        suml = 1e-9 + _mm(w, remain_r[:, :, None])[..., 0]  # (b, n)
        ratio_l = remain_l / suml
        sumr = _mm(w.transpose(0, 2, 1), ratio_l[:, :, None])[..., 0] * remain_r
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        delta = w * ratio_l[:, :, None] * ratio_r[:, None, :]
        match = match + delta
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(delta, axis=2))
        return (match, remain_l, remain_r), None

    init = (
        jnp.zeros((b, n, m), jnp.float32),
        jnp.full((b, n), multi_l, jnp.float32),
        jnp.full((b, m), multi_r, jnp.float32),
    )
    (match, _, _), _ = lax.scan(level_step, init, _levels())
    return match.transpose(0, 2, 1)  # (b, m, n) — reference layout


def _chunk_of(x, i, size):
    return lax.dynamic_slice_in_dim(x, i * size, size, axis=1)


def _approx_match_chunked(xyz1, xyz2, chunk, real_n=None):
    """Same recurrence, streaming n-axis chunks; only the plan is resident.

    real_n: logical query count when xyz1 carries padding rows — capacities
    come from it and padded rows start with ZERO mass, so they can never
    absorb transport at the λ=0 final level.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    assert n % chunk == 0, "point counts are padded to the chunk size"
    n_chunks = n // chunk
    multi_l, multi_r = _capacities(real_n if real_n is not None else n, m)

    def w_tile(i, level):
        x1c = _chunk_of(xyz1, i, chunk)
        return jnp.exp(level * _sq_dists(x1c, xyz2))  # (b, chunk, m)

    def level_step(carry, level):
        match, remain_l, remain_r = carry  # match (b, m, n)

        # ratio_l for chunk i is row-local and sumr accumulates per chunk, so
        # both passes share ONE w tile (one exp + one matmul fewer per level)
        def p12(i, carry12):
            ratio_l, sumr = carry12
            w = w_tile(i, level)
            suml = 1e-9 + _mm(w, remain_r[:, :, None])[..., 0]
            rlc = _chunk_of(remain_l, i, chunk) / suml
            ratio_l = lax.dynamic_update_slice_in_dim(ratio_l, rlc, i * chunk, axis=1)
            sumr = sumr + _mm(w.transpose(0, 2, 1), rlc[:, :, None])[..., 0]
            return ratio_l, sumr

        ratio_l, sumr = lax.fori_loop(
            0,
            n_chunks,
            p12,
            (jnp.zeros((b, n), jnp.float32), jnp.zeros((b, m), jnp.float32)),
        )
        sumr = sumr * remain_r
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)

        def p3(i, carry3):
            match, remain_l = carry3
            w = w_tile(i, level)
            rlc = _chunk_of(ratio_l, i, chunk)
            delta = w * rlc[:, :, None] * ratio_r[:, None, :]  # (b, chunk, m)
            mcols = lax.dynamic_slice(match, (0, 0, i * chunk), (b, m, chunk))
            match = lax.dynamic_update_slice(
                match, mcols + delta.transpose(0, 2, 1), (0, 0, i * chunk)
            )
            rl_new = jnp.maximum(
                0.0, _chunk_of(remain_l, i, chunk) - jnp.sum(delta, axis=2)
            )
            remain_l = lax.dynamic_update_slice_in_dim(
                remain_l, rl_new, i * chunk, axis=1
            )
            return match, remain_l

        match, remain_l = lax.fori_loop(0, n_chunks, p3, (match, remain_l))
        return (match, remain_l, remain_r), None

    remain_l0 = jnp.full((b, n), multi_l, jnp.float32)
    if real_n is not None and real_n < n:
        remain_l0 = jnp.where(jnp.arange(n)[None, :] < real_n, remain_l0, 0.0)
    init = (
        jnp.zeros((b, m, n), jnp.float32),
        remain_l0,
        jnp.full((b, m), multi_r, jnp.float32),
    )
    (match, _, _), _ = lax.scan(level_step, init, _levels())
    return match


def approx_match(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Transport plan (b, m, n) between xyz1 (b, n, 3) and xyz2 (b, m, 3).

    Non-differentiable, like the reference op (`tf_approxmatch.py:19`).
    """
    xyz1 = lax.stop_gradient(xyz1.astype(jnp.float32))
    xyz2 = lax.stop_gradient(xyz2.astype(jnp.float32))
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if b * n * m <= _FULL_PATH_MAX_ELEMS or n <= _CHUNK:
        return _approx_match_full(xyz1, xyz2)
    chunk = _CHUNK
    if n % chunk != 0:  # pad queries; padded rows carry zero mass and are cut
        n_pad = -(-n // chunk) * chunk
        x1p = jnp.pad(xyz1, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=1e6)
        return _approx_match_chunked(x1p, xyz2, chunk, real_n=n)[:, :, :n]
    return _approx_match_chunked(xyz1, xyz2, chunk)


def approx_match_cost(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Fused ``match_cost(xyz1, xyz2, approx_match(xyz1, xyz2))`` — EXACT,
    non-differentiable, and plan-free.

    The cost is linear in the plan, and the plan is the sum of per-level
    deltas, so the cost can be accumulated level by level
    (``cost += Σ δ_kl · ‖p1_k − p2_l‖``) while only the (b,n)/(b,m) remaining
    capacities are carried — the (b, m, n) transport plan (4 GiB at the
    16384² eval shape) is never materialised and never round-trips HBM on
    each of the 10 levels. Same arithmetic as the reference recurrence
    (`tf_approxmatch.cu:1-179` + `:183-225`), identical up to fp summation
    order; use this for evaluation (`eval_one_batch`, vv_recon.py:445-459)
    where no gradient or plan is needed.
    """
    xyz1 = lax.stop_gradient(xyz1.astype(jnp.float32))
    xyz2 = lax.stop_gradient(xyz2.astype(jnp.float32))
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if jax.default_backend() == "tpu":
        # VMEM-resident + underflow-banded kernels: 89 ms vs 322 ms for this
        # XLA recurrence at the 16384² b4 eval shape (see ops/pallas/emd.py)
        from rfnet_tpu.ops.pallas.emd import approx_match_cost_pallas

        try:
            return approx_match_cost_pallas(xyz1, xyz2)
        except Exception:  # pragma: no cover - fallback if shapes unsupported
            pass
    multi_l, multi_r = _capacities(n, m)
    chunk = min(_CHUNK, n)
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        # padded rows sit far away AND start with zero mass (see remain_l0)
        xyz1 = jnp.pad(xyz1, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=1e6)
    n_chunks = n_pad // chunk

    def w_tile(i, level):
        x1c = _chunk_of(xyz1, i, chunk)
        d2 = _sq_dists(x1c, xyz2)
        return jnp.exp(level * d2), d2  # (b, chunk, m) each

    def level_step(carry, level):
        cost, remain_l, remain_r = carry

        # passes 1+2 share one w tile: ratio_l is row-local per chunk and the
        # sumr column accumulation is chunk-separable (identical arithmetic,
        # one exp + one matmul pass fewer per level)
        def p12(i, carry12):
            ratio_l, sumr = carry12
            w, _ = w_tile(i, level)
            suml = 1e-9 + _mm(w, remain_r[:, :, None])[..., 0]
            rlc = _chunk_of(remain_l, i, chunk) / suml
            ratio_l = lax.dynamic_update_slice_in_dim(ratio_l, rlc, i * chunk, axis=1)
            sumr = sumr + _mm(w.transpose(0, 2, 1), rlc[:, :, None])[..., 0]
            return ratio_l, sumr

        ratio_l, sumr = lax.fori_loop(
            0,
            n_chunks,
            p12,
            (jnp.zeros((b, n_pad), jnp.float32), jnp.zeros((b, m), jnp.float32)),
        )
        sumr = sumr * remain_r
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)

        def p3(i, carry3):
            cost, remain_l = carry3
            w, d2 = w_tile(i, level)
            rlc = _chunk_of(ratio_l, i, chunk)
            delta = w * rlc[:, :, None] * ratio_r[:, None, :]  # (b, chunk, m)
            cost = cost + jnp.sum(delta * jnp.sqrt(d2), axis=(1, 2))
            rl_new = jnp.maximum(
                0.0, _chunk_of(remain_l, i, chunk) - jnp.sum(delta, axis=2)
            )
            remain_l = lax.dynamic_update_slice_in_dim(
                remain_l, rl_new, i * chunk, axis=1
            )
            return cost, remain_l

        cost, remain_l = lax.fori_loop(0, n_chunks, p3, (cost, remain_l))
        return (cost, remain_l, remain_r), None

    remain_l0 = jnp.full((b, n_pad), multi_l, jnp.float32)
    if n_pad != n:
        remain_l0 = jnp.where(jnp.arange(n_pad)[None, :] < n, remain_l0, 0.0)
    init = (
        jnp.zeros((b,), jnp.float32),
        remain_l0,
        jnp.full((b, m), multi_r, jnp.float32),
    )
    (cost, _, _), _ = lax.scan(level_step, init, _levels())
    return cost


# ---------------------------------------------------------------------------
# fused differentiable cost (train path)
# ---------------------------------------------------------------------------


def _amc_diff_impl(xyz1, xyz2):
    """One 10-level scan producing the cost AND the match_cost gradients.

    The reference train path is ``match_cost(x1, x2, approx_match(x1, x2))``
    with the plan non-differentiable (`tf_approxmatch.py:19,44-50`), so the
    only things autodiff ever needs are cost = Σ match·d and the hand-written
    gradient g1_k = (Σ_l c_kl)·x1_k − Σ_l c_kl·x2_l (and symmetrically g2)
    with c = match·rsqrt(max(d², 1e−20)). Both are LINEAR in the plan, and
    the plan is a sum of per-level deltas — so cost, the row/col sums of c,
    and the two 3-vector moments Σ c·x2 / Σ c·x1 can all be accumulated
    inside the level recurrence. The (b, n, m) plan is never materialised
    and the separate match_cost forward+backward passes disappear; only the
    (b, n, m) d² matrix is resident (recomputed nowhere). Residuals saved
    for the VJP are O(n+m): the two gradient fields themselves.
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    multi_l, multi_r = _capacities(n, m)
    d2 = _sq_dists(xyz1, xyz2)  # (b, n, m)

    def level_step(carry, level):
        cost, row, col, p1, p2, remain_l, remain_r = carry
        w = jnp.exp(level * d2)
        suml = 1e-9 + _mm(w, remain_r[:, :, None])[..., 0]
        ratio_l = remain_l / suml
        sumr = _mm(w.transpose(0, 2, 1), ratio_l[:, :, None])[..., 0] * remain_r
        ratio_r = jnp.minimum(remain_r / (sumr + 1e-9), 1.0) * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        delta = w * ratio_l[:, :, None] * ratio_r[:, None, :]
        cost = cost + jnp.sum(delta * jnp.sqrt(d2), axis=(1, 2))
        c = delta * lax.rsqrt(jnp.maximum(d2, 1e-20))  # this level's slice of c
        row = row + jnp.sum(c, axis=2)
        col = col + jnp.sum(c, axis=1)
        p1 = p1 + _mm(c, xyz2)
        p2 = p2 + _mm(c.transpose(0, 2, 1), xyz1)
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(delta, axis=2))
        return (cost, row, col, p1, p2, remain_l, remain_r), None

    init = (
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b, n), jnp.float32),
        jnp.zeros((b, m), jnp.float32),
        jnp.zeros((b, n, 3), jnp.float32),
        jnp.zeros((b, m, 3), jnp.float32),
        jnp.full((b, n), multi_l, jnp.float32),
        jnp.full((b, m), multi_r, jnp.float32),
    )
    (cost, row, col, p1, p2, _, _), _ = lax.scan(level_step, init, _levels())
    g1 = row[..., None] * xyz1 - p1
    g2 = col[..., None] * xyz2 - p2
    return cost, g1, g2


@jax.custom_vjp
def _amc_diff(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    cost, _, _ = _amc_diff_impl(
        lax.stop_gradient(xyz1), lax.stop_gradient(xyz2)
    )
    return cost


def _amc_diff_fwd(xyz1, xyz2):
    cost, g1, g2 = _amc_diff_impl(xyz1, xyz2)
    return cost, (g1, g2)


def _amc_diff_bwd(res, g):
    g1, g2 = res
    gb = g[:, None, None]
    return gb * g1, gb * g2


_amc_diff.defvjp(_amc_diff_fwd, _amc_diff_bwd)


def approx_match_cost_diff(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Differentiable fused ``match_cost(x1, x2, approx_match(x1, x2))``.

    Exactly the composed pair's value and gradient (up to fp summation
    order — the moments distribute over the per-level deltas), with no
    (b, m, n) plan tensor and no separate cost passes. Use on the TRAIN
    path (`earth_mover`, vv_recon.py:392-399) at full-matrix shapes; falls
    back to the composed ops above the full-path size cap.
    """
    if xyz1.shape[0] * xyz1.shape[1] * xyz2.shape[1] > _FULL_PATH_MAX_ELEMS:
        return match_cost(xyz1, xyz2, approx_match(xyz1, xyz2))
    return _amc_diff(xyz1.astype(jnp.float32), xyz2.astype(jnp.float32))


# ---------------------------------------------------------------------------
# match_cost
# ---------------------------------------------------------------------------


def _cost_fwd_full(xyz1, xyz2, match):
    d = jnp.sqrt(_sq_dists(xyz1, xyz2))  # (b, n, m)
    return jnp.einsum("bnm,bmn->b", d, match, precision=lax.Precision.HIGHEST)


def _cost_grads_full(xyz1, xyz2, match):
    # c_kl = match_lk / max(‖p1_k − p2_l‖, 1e−10); reference rsqrt guard
    # `tf_approxmatch.cu:243,281`.
    d2 = _sq_dists(xyz1, xyz2)
    c = match.transpose(0, 2, 1) * lax.rsqrt(jnp.maximum(d2, 1e-20))  # (b, n, m)
    row = jnp.sum(c, axis=2)  # (b, n)
    col = jnp.sum(c, axis=1)  # (b, m)
    g1 = row[..., None] * xyz1 - _mm(c, xyz2)
    g2 = col[..., None] * xyz2 - _mm(c.transpose(0, 2, 1), xyz1)
    return g1, g2


@jax.custom_vjp
def match_cost(xyz1: jax.Array, xyz2: jax.Array, match: jax.Array) -> jax.Array:
    """Σ euclidean‖p1 − p2‖ · match  -> (b,). match layout (b, m, n)."""
    return _match_cost_impl(xyz1, xyz2, match)


def _match_cost_impl(xyz1, xyz2, match):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if b * n * m <= _FULL_PATH_MAX_ELEMS:
        return _cost_fwd_full(xyz1, xyz2, match)
    chunk = _CHUNK
    n_chunks = -(-n // chunk)

    def body(i, acc):
        x1c = lax.dynamic_slice_in_dim(xyz1, i * chunk, chunk, axis=1)
        mc = lax.dynamic_slice(match, (0, 0, i * chunk), (b, m, chunk))
        d = jnp.sqrt(_sq_dists(x1c, xyz2))
        return acc + jnp.einsum(
            "bnm,bmn->b", d, mc, precision=lax.Precision.HIGHEST
        )

    if n % chunk != 0:
        n_pad = n_chunks * chunk
        xyz1 = jnp.pad(xyz1, ((0, 0), (0, n_pad - n), (0, 0)))
        match = jnp.pad(match, ((0, 0), (0, 0), (0, n_pad - n)))
    return lax.fori_loop(0, n_chunks, body, jnp.zeros((b,), jnp.float32))


def _cost_fwd(xyz1, xyz2, match):
    return _match_cost_impl(xyz1, xyz2, match), (xyz1, xyz2, match)


def _cost_bwd(res, g):
    xyz1, xyz2, match = res
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if b * n * m <= _FULL_PATH_MAX_ELEMS:
        g1, g2 = _cost_grads_full(xyz1, xyz2, match)
    else:
        chunk = _CHUNK
        n_chunks = -(-n // chunk)
        n_pad = n_chunks * chunk
        x1p = jnp.pad(xyz1, ((0, 0), (0, n_pad - n), (0, 0)))
        mp = jnp.pad(match, ((0, 0), (0, 0), (0, n_pad - n)))

        def body(i, carry):
            g1, g2 = carry
            x1c = lax.dynamic_slice_in_dim(x1p, i * chunk, chunk, axis=1)
            mc = lax.dynamic_slice(mp, (0, 0, i * chunk), (b, m, chunk))
            c = mc.transpose(0, 2, 1) * lax.rsqrt(
                jnp.maximum(_sq_dists(x1c, xyz2), 1e-20)
            )
            g1c = jnp.sum(c, axis=2)[..., None] * x1c - _mm(c, xyz2)
            g1 = lax.dynamic_update_slice_in_dim(g1, g1c, i * chunk, axis=1)
            g2 = g2 + jnp.sum(c, axis=1)[..., None] * xyz2 - _mm(
                c.transpose(0, 2, 1), x1c
            )
            return g1, g2

        g1p, g2 = lax.fori_loop(
            0,
            n_chunks,
            body,
            (jnp.zeros((b, n_pad, 3), jnp.float32), jnp.zeros_like(xyz2)),
        )
        g1 = g1p[:, :n]
    gb = g[:, None, None]
    # The transport plan receives no cotangent (reference grad returns None
    # for match, `tf_approxmatch.py:44-50`).
    return gb * g1, gb * g2, jnp.zeros_like(match)


match_cost.defvjp(_cost_fwd, _cost_bwd)
