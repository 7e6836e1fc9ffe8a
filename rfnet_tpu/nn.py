"""Point-MLP primitives.

The reference's entire network is stacks of 1×1 convolutions over
``(b, npts, 1, c)`` tensors — i.e. per-point shared MLPs — built from
``conv2d``/``get_weight_variable`` (`vv_recon.py:34-65`). On TPU a 1×1 conv
IS a dense matmul over the channel axis, so the primitive here is a flax
``Dense`` over ``(b, npts, c)`` tensors (the dummy width-1 axis is dropped
throughout): one MXU matmul per layer, fused with bias+activation by XLA.

Init parity: TF1 ``xavier_initializer`` (uniform ±√(6/(fan_in+fan_out))) →
``nn.initializers.xavier_uniform``; biases zero (`vv_recon.py:40-43,56`).

Matmul precision: the feature MLPs run at JAX's DEFAULT TPU matmul
precision (fp32 params/activations, single-pass MXU with bf16-truncated
inputs and fp32 accumulation) — a deliberate TPU-first choice: it is the
hardware's native fast path, and the model's accuracy is insensitive to it
(the coordinate pipeline, merges, and all loss/metric kernels stay exact
fp32; exactness-critical one-hot contractions in ops/pallas pin
``Precision.HIGHEST`` — see CLAUDE.md "Hard-won kernel facts").
The reference *collects* an L2 regulariser per weight but never adds the
collection to the loss (`vv_recon.py:34-39` vs `:495-500` — the 'losses'
collection is never read), so no weight decay is applied by default; the
``l2_regularizer`` helper computes the term for anyone who wants it.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier = nn.initializers.xavier_uniform()


def dense(ch: int, name: str, dtype=None) -> nn.Dense:
    """One per-point Dense layer with the reference's init scheme.

    dtype: computation dtype (params stay float32). bf16 halves the HBM
    traffic of the big per-point feature layers for serving; coordinates
    remain float32 throughout the model (offsets promote back on add).
    """
    return nn.Dense(
        ch, kernel_init=xavier, bias_init=nn.initializers.zeros, name=name,
        dtype=dtype,
    )


class StepDense(nn.Module):
    """Dense layer with a SHARED kernel and PER-STEP biases.

    Replicates a subtle reference quirk proven by its trained checkpoint
    (`bestrecord/model-229999.index`): ``conv2d`` creates weights with
    ``tf.get_variable`` (honors ``variable_scope(reuse=True)`` → shared
    across recurrent invocations, `vv_recon.py:35,49-54`) but biases with
    ``tf.Variable`` (`vv_recon.py:41` — NEVER reused; under a reused scope
    TF uniquifies the name scope, yielding the checkpoint's bias-only
    ``cell_1/ cell_2/ decode_cell_1/`` scopes). So each recurrent step of
    the reference trains its OWN bias while sharing the kernel. Bias is
    stored as one ``(n_steps, ch)`` table; ``step`` must be a static int.
    Init parity: biases start at zero (`vv_recon.py:41`), so at init every
    step's bias is identical and the forward equals the fully-shared one.
    """

    ch: int
    n_steps: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, step: int) -> jax.Array:
        kernel = self.param("kernel", xavier, (x.shape[-1], self.ch))
        bias = self.param(
            "bias", nn.initializers.zeros, (self.n_steps, self.ch)
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        return x @ kernel + bias[step]


class PointMLP(nn.Module):
    """conv2d-[1,1] stack; every layer ReLU unless the last is overridden
    (mirrors ``conv2d``'s default ``activation_func=tf.nn.relu``).

    ``n_steps > 1`` switches every layer to :class:`StepDense` (shared
    kernels, per-recurrent-step biases — the reference reuse quirk); the
    call then takes the static step index via ``step``.
    """

    features: tuple
    last_act: Any = nn.relu
    dtype: Any = None
    n_steps: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, step: int = 0) -> jax.Array:
        for i, ch in enumerate(self.features):
            if self.n_steps > 1:
                x = StepDense(ch, self.n_steps, name=f"l{i}", dtype=self.dtype)(x, step)
            else:
                x = dense(ch, f"l{i}", self.dtype)(x)
            act = nn.relu if i < len(self.features) - 1 else self.last_act
            if act is not None:
                x = act(x)
        return x


def l2_regularizer(params, rate: float = 1e-5) -> jax.Array:
    """Σ rate·‖W‖²/2 over kernels — the term the reference computes but never
    applies (`vv_recon.py:34-39`)."""
    leaves = [
        v
        for path, v in jax.tree_util.tree_leaves_with_path(params)
        if path and getattr(path[-1], "key", "") == "kernel"
    ]
    if not leaves:
        return jnp.float32(0.0)
    return rate * 0.5 * sum(jnp.sum(w * w) for w in leaves)
