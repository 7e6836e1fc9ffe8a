"""Bit-exact one-hot MXU contraction at 3 bf16 passes.

The MXU's fast path truncates fp32 inputs to bf16 (caught on-chip — see
CLAUDE.md "Hard-won kernel facts"), and ``Precision.HIGHEST`` repairs it
at ~6 passes (both operands split 3-way). For the one-hot gathers/scatters
in this codebase the MASK side is exactly representable in bf16 (entries
are 0.0/1.0), so only the payload needs splitting: an fp32 value is the
exact sum of three non-overlapping bf16 parts (8+8+8 ≥ 24 mantissa bits),
each product against the 0/1 mask is exact, and fp32 accumulation of
non-overlapping parts is exact. Three default-precision bf16 matmuls —
half the HIGHEST cost (HIGHEST splits BOTH operands 3-way ≈ 6 passes).

Used by the banded chamfer backward (ops/pallas/nn_grad.py), whose payload
is 4 full gradient rows; on-chip validated 2026-08-18 (grad err 1e-6 vs XLA
autodiff, was 2.6e-4 at default precision). For NARROW payloads the MXU is
the wrong tool entirely — the merge-coords recovery (N=3, padded to 128
lanes) uses a per-coordinate VPU masked sublane sum instead, exact in one
pass (ops/pallas/chamfer.py `_make_coords_kernel`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def onehot_select(mask: jax.Array, payload: jax.Array, dimension_numbers):
    """``dot_general(mask, payload)`` where ``mask`` ∈ {0, 1} — bit-exact
    fp32 result via the 3-part payload split. Accepts the same
    ``dimension_numbers`` as ``lax.dot_general``; both inputs fp32."""
    mask16 = mask.astype(jnp.bfloat16)  # 0/1: exact in bf16
    p0 = payload.astype(jnp.bfloat16)
    r1 = payload - p0.astype(jnp.float32)
    p1 = r1.astype(jnp.bfloat16)
    # the third residual carries the last ≤8 mantissa bits — exact in bf16
    p2 = (r1 - p1.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot(p):
        return lax.dot_general(
            mask16, p, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
        )

    return dot(p0) + dot(p1) + dot(p2)
