"""The 3-pass bf16 one-hot contraction returns bit-exact fp32 selections."""

import jax.numpy as jnp
import numpy as np

from rfnet_tpu.ops.pallas.exact_dot import onehot_select


def test_onehot_select_bit_exact(rng):
    k, n, c = 96, 64, 4
    # adversarial mantissas: random bit patterns in a sane exponent range,
    # plus exact-integer and tiny values
    bits = rng.randint(0, 2**23, size=(k, c)).astype(np.uint32)
    expo = rng.randint(118, 135, size=(k, c)).astype(np.uint32) << 23
    payload = (bits | expo).view(np.float32)
    payload[0] = 1.0
    payload[1] = np.float32(1e-20)
    payload[2] = 0.0
    sel = rng.randint(0, k, size=n)
    mask = np.zeros((k, n), np.float32)
    mask[sel, np.arange(n)] = 1.0

    out = onehot_select(
        jnp.asarray(mask), jnp.asarray(payload),
        dimension_numbers=(((0,), (0,)), ((), ())),
    )
    np.testing.assert_array_equal(np.asarray(out), payload[sel])


def test_onehot_select_other_contraction_layout(rng):
    # the nn_grad layout: mask (m, n) contracted with payload (c, n) on n —
    # each mask row selects exactly one column
    m, n, c = 32, 48, 4
    payload = rng.randn(c, n).astype(np.float32)
    cols = rng.randint(0, n, size=m)
    mask = np.zeros((m, n), np.float32)
    mask[np.arange(m), cols] = 1.0
    out = onehot_select(
        jnp.asarray(mask), jnp.asarray(payload),
        dimension_numbers=(((1,), (1,)), ((), ())),
    )
    np.testing.assert_array_equal(np.asarray(out), payload[:, cols].T)
