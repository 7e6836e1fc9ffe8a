"""RFNet model: shape pyramid, weight sharing, gradient flow, param count."""

import jax
import jax.numpy as jnp
import numpy as np

from rfnet_tpu.models import RFNet


def tiny_model():
    # up_ratio 4: 8 -> 32 -> 128 output pyramid; cheap on the 1-core CPU host
    return RFNet(n_seed=4, up_ratio=4)


def test_output_pyramid_shapes(rng):
    model = tiny_model()
    pc = jnp.asarray(rng.rand(2, 100, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc)
    out = jax.jit(model.apply)(params, pc)
    assert out.out1.shape == (2, 8, 3)
    assert out.out2.shape == (2, 32, 3)
    assert out.out3.shape == (2, 128, 3)
    assert out.out4.shape == (2, 128, 3)
    assert out.points1_pre.shape == (2, 8, 3)
    assert out.points2_pre.shape == (2, 32, 3)
    assert out.moves1.shape == (2, 8, 4, 3)
    assert out.moves2.shape == (2, 32, 4, 3)
    assert out.final_move.shape == (2, 128, 3)
    assert out.code1.shape == (2, 1, 256)
    assert out.decfactor_sq.shape == (3,)
    for leaf in jax.tree_util.tree_leaves(out):
        assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite model output"


def test_weight_sharing_matches_reference(rng):
    """encode_cell and decode_cell appear ONCE in the param tree (reference
    reuse=True at vv_recon.py:217,229,232); recover/refine are per-step."""
    model = tiny_model()
    pc = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc)["params"]
    keys = set(params.keys())
    assert "cell" in keys and "decode_cell" in keys
    assert {"recover1", "recover2", "recover3"} <= keys
    assert {"refine_layer1", "refine_layer2", "refine_layer_final"} <= keys
    assert {"decline_factor0", "decline_factor1", "decline_factor"} <= keys
    # kernel-only sharing: tf.Variable biases ignore scope reuse, so the
    # trained checkpoint has per-invocation bias scopes (cell_1/ cell_2/
    # decode_cell_1/) — modeled as (n_steps, ch) bias tables
    cell = params["cell"]
    assert cell["state_mlp"]["l0"]["bias"].shape[0] == 3
    assert cell["state_mlp"]["l0"]["kernel"].ndim == 2  # one shared kernel
    assert params["decode_cell"]["mlp"]["l0"]["bias"].shape[0] == 2
    # per-step (non-cell) modules keep plain (ch,) biases
    assert params["recover1"]["mlp"]["l0"]["bias"].ndim == 1


def test_gradients_flow_everywhere(rng):
    model = tiny_model()
    pc = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc)

    def loss_fn(p):
        out = model.apply(p, pc)
        from rfnet_tpu.losses import chamfer_big

        return chamfer_big(gt, out.out4)[0] + chamfer_big(gt, out.out3)[0]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    n_nonzero = 0
    for path, g in flat:
        assert bool(jnp.all(jnp.isfinite(g))), f"non-finite grad at {path}"
        if float(jnp.max(jnp.abs(g))) > 0:
            n_nonzero += 1
    # nearly every parameter should receive signal through out3/out4
    assert n_nonzero / len(flat) > 0.9, f"only {n_nonzero}/{len(flat)} grads nonzero"


def test_fullsize_param_count_golden():
    """Param count of the flagship config — 3,827,611, equal to the trained
    reference checkpoint's trainable-variable count (sum over every
    non-Adam float32 variable in `bestrecord/model-229999.index`, minus
    the beta powers and the untrained subvar buffers; fixture:
    tests/fixtures/ref_ckpt_index.json). Layer-by-layer: init_mlp 41,600 +
    cell 395,392 + 2×1,408 extra per-step cell biases + recover×3 594,432 +
    init_move 553,091 + part_mlp 41,600 + feat_trans 197,120 + init_cell
    525,292 + decode_cell 984,304 + 6,000 extra per-step decode biases +
    refine×3 485,961 + 3 decline factors."""
    model = RFNet()  # n_seed=32, up_ratio=16
    shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3000, 3), jnp.float32),
    )
    count = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes))
    # pinned from the first correct build; see docstring
    assert count == PARAM_COUNT_GOLDEN, f"param count changed: {count}"


PARAM_COUNT_GOLDEN = 3_827_611


def test_deterministic_forward(rng):
    model = tiny_model()
    pc = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc)
    o1 = model.apply(params, pc)
    o2 = model.apply(params, pc)
    np.testing.assert_array_equal(np.asarray(o1.out4), np.asarray(o2.out4))


def test_bf16_compute_mode(rng):
    """Serving mode: feature MLPs in bf16, coordinates stay f32; params are
    shared with the f32 model (same tree, f32 storage) and outputs stay
    close to the f32 forward."""
    pc = jnp.asarray(rng.rand(1, 100, 3).astype(np.float32))
    f32 = RFNet(n_seed=4, up_ratio=4)
    bf16 = RFNet(n_seed=4, up_ratio=4, dtype=jnp.bfloat16)
    params = f32.init(jax.random.PRNGKey(0), pc)
    out32 = f32.apply(params, pc)
    out16 = bf16.apply(params, pc)  # same params, different compute dtype
    assert out16.out4.dtype == jnp.float32  # coords promote back to f32
    # random-init recurrences amplify rounding via discrete argmin reroutes;
    # judge by the mean deviation (trained-model CD deltas are measured on
    # chip and recorded in PARITY.md)
    err = float(jnp.mean(jnp.abs(out16.out4 - out32.out4)))
    assert err < 0.03, f"bf16 deviates too much: {err}"
    assert err > 0  # actually ran in lower precision
