"""Pallas TPU kernel: farthest point sampling, whole selection on-chip.

The reference's CUDA FPS kernel (`tf_ops/sampling/tf_sampling_g.cu:105-170`)
keeps the running min-distance array in registers/shared memory and does one
block-wide argmax reduction per selected point. The `lax.scan` formulation
(ops/fps.py) is correct but latency-bound: every one of the npoint iterations
is a separate device-loop step (~0.4 ms/iter through this platform's
dispatch). This kernel runs the ENTIRE selection loop inside one Pallas
program: coordinates and the running min-distance matrix stay in VMEM, every
iteration is a fused VPU pass over all batch rows at once, and only the
selected indices leave the chip. Semantics identical to ops/fps.py
(seed = index 0, argmax-first tie-breaking).

VMEM budget: coords (3, b, n) + mind (b, n) fp32 ≈ 16·b·n bytes — b=32 at
n=16384 is 8 MB. The wrapper falls back to the scan path beyond that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_COORD = 1.0e9  # padded target points: huge distance, never selected
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(npoint: int, n: int, np_pad: int):
    def kernel(xt_ref, idx_ref):
        x0 = xt_ref[0]  # (b, n_pad)
        x1 = xt_ref[1]
        x2 = xt_ref[2]
        b = x0.shape[0]
        lane = lax.broadcasted_iota(jnp.int32, x0.shape, 1)
        out_lane = lax.broadcasted_iota(jnp.int32, (b, np_pad), 1)
        # padded lanes start "already covered" so argmax never picks them
        mind0 = jnp.where(lane < n, jnp.float32(1e38), jnp.float32(-1.0))
        acc0 = jnp.zeros((b, np_pad), jnp.int32)  # slot 0 = seed index 0
        lx, ly, lz = x0[:, 0:1], x1[:, 0:1], x2[:, 0:1]

        def body(j, carry):
            mind, lx, ly, lz, acc = carry
            d = (x0 - lx) ** 2 + (x1 - ly) ** 2 + (x2 - lz) ** 2
            mind = jnp.minimum(mind, d)
            nxt = jnp.argmax(mind, axis=1).astype(jnp.int32)  # (b,)
            # Mosaic forbids dynamic lane-indexed stores; select into a
            # carried accumulator instead and store once at the end
            acc = jnp.where(out_lane == j, nxt[:, None], acc)
            onehot = lane == nxt[:, None]
            lx = jnp.sum(jnp.where(onehot, x0, 0.0), axis=1, keepdims=True)
            ly = jnp.sum(jnp.where(onehot, x1, 0.0), axis=1, keepdims=True)
            lz = jnp.sum(jnp.where(onehot, x2, 0.0), axis=1, keepdims=True)
            return mind, lx, ly, lz, acc

        carry = lax.fori_loop(1, npoint, body, (mind0, lx, ly, lz, acc0))
        idx_ref[...] = carry[4]

    return kernel


_BATCH_TILE = 8  # batch rows per program; keeps VMEM ≈ 5 MB at n = 16384


@functools.partial(jax.jit, static_argnums=0)
def fps_pallas(npoint: int, xyz: jax.Array) -> jax.Array:
    """(b, n, 3) -> (b, npoint) int32, all iterations in one kernel.

    The batch axis is split into sublane-height grid programs so the live
    coordinate + min-distance arrays stay inside scoped VMEM at 16384 pts.
    """
    b, n, _ = xyz.shape
    b_pad = _round_up(b, _BATCH_TILE)
    n_pad = _round_up(n, 128)
    np_pad = _round_up(npoint, 128)
    xt = jnp.pad(
        xyz.astype(jnp.float32).transpose(2, 0, 1),
        ((0, 0), (0, b_pad - b), (0, n_pad - n)),
        constant_values=_PAD_COORD,
    )  # (3, b_pad, n_pad)
    idx = pl.pallas_call(
        _make_kernel(npoint, n, np_pad),
        grid=(b_pad // _BATCH_TILE,),
        in_specs=[
            pl.BlockSpec(
                (3, _BATCH_TILE, n_pad), lambda gi: (0, gi, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_BATCH_TILE, np_pad), lambda gi: (gi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, np_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=8 * b_pad * n_pad * npoint,
            bytes_accessed=4 * (3 * b_pad * n_pad + b_pad * npoint),
            transcendentals=0,
        ),
    )(xt)
    return idx[:b, :npoint]


def fps_fits_vmem(b: int, n: int) -> bool:
    # per-program live set ≈ coords(96n) + mind/d/iota/masks(~160n) bytes
    return 256 * _round_up(n, 128) <= _VMEM_BUDGET_BYTES
