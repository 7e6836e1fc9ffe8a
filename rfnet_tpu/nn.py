"""Point-MLP primitives.

The reference's entire network is stacks of 1×1 convolutions over
``(b, npts, 1, c)`` tensors — i.e. per-point shared MLPs — built from
``conv2d``/``get_weight_variable`` (`vv_recon.py:34-65`). On TPU a 1×1 conv
IS a dense matmul over the channel axis, so the primitive here is a flax
``Dense`` over ``(b, npts, c)`` tensors (the dummy width-1 axis is dropped
throughout): one MXU matmul per layer, fused with bias+activation by XLA.

Init parity: TF1 ``xavier_initializer`` (uniform ±√(6/(fan_in+fan_out))) →
``nn.initializers.xavier_uniform``; biases zero (`vv_recon.py:40-43,56`).
The reference *collects* an L2 regulariser per weight but never adds the
collection to the loss (`vv_recon.py:34-39` vs `:495-500` — the 'losses'
collection is never read), so no weight decay is applied here either; the
optional ``l2_regularizer`` helper exists for anyone who wants the term.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointMLP(nn.Module):
    """A stack of per-point Dense layers (the conv2d-[1,1] stacks).

    features: output channels per layer.
    final_activation: activation of the LAST layer ('relu' default mirrors
      conv2d's default; None mirrors `activation_func=None`).
    """

    features: Sequence[int]
    activation: Callable = nn.relu
    final_activation: Callable | None = nn.relu

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, ch in enumerate(self.features):
            x = nn.Dense(
                ch,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                name=f"layer{i}",
            )(x)
            act = self.activation if i < len(self.features) - 1 else self.final_activation
            if act is not None:
                x = act(x)
        return x


def dense(x: jax.Array, ch: int, name: str, activation=nn.relu, *, parent) -> jax.Array:
    """Inline per-point Dense for use inside nn.compact bodies."""
    y = nn.Dense(
        ch,
        kernel_init=nn.initializers.xavier_uniform(),
        bias_init=nn.initializers.zeros,
        name=name,
        parent=parent,
    )(x)
    return activation(y) if activation is not None else y


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
