"""Reference-checkpoint interop: TensorBundle codec, weight mapping,
artifact-verified parity, and legacy-layout checkpoint upgrades.

The fixture `fixtures/ref_ckpt_index.json` is the parsed index of the
reference's trained checkpoint (`bestrecord/model-229999.index`, step
229999): every variable name, dtype, shape, and whether the Adam optimizer
created slots for it (no slots == the variable received no gradient ==
dead branch in the trained graph). It pins parity at the artifact level —
not against the reference *source*, but against what its training run
actually produced.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfnet_tpu.compat import ref_import, tf_bundle

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ref_ckpt_index.json")
REAL_INDEX = "/root/reference/bestrecord/model-229999.index"


def load_fixture():
    with open(FIXTURE) as f:
        return json.load(f)


def flagship_param_shapes():
    """Full-size param tree SHAPES without running the (expensive) init."""
    from rfnet_tpu.models import RFNet

    shapes = jax.eval_shape(
        RFNet().init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3000, 3), jnp.float32),
    )
    return shapes["params"]


def _get(tree, path):
    for key in path:
        tree = tree[key]
    return tree


# --------------------------------------------------------------------------
# TensorBundle codec
# --------------------------------------------------------------------------


def test_bundle_roundtrip(tmp_path, rng):
    tensors = {
        "a/weights": rng.randn(1, 1, 7, 5).astype(np.float32),
        "a/Variable": rng.randn(5).astype(np.float32),
        "nested/scope/x": rng.randint(0, 9, (3, 2)).astype(np.int32),
        "step": np.asarray(229999, np.int64),
    }
    prefix = str(tmp_path / "model-1")
    tf_bundle.write_bundle(prefix, tensors)
    back = tf_bundle.read_bundle(prefix)
    assert sorted(back) == sorted(tensors)
    for name, arr in tensors.items():
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(back[name]))
    # index alone reports names/shapes/dtypes
    num_shards, entries = tf_bundle.read_index(prefix + ".index")
    assert num_shards == 1
    assert entries["a/weights"].shape == (1, 1, 7, 5)
    assert entries["a/weights"].np_dtype == np.float32
    assert entries["step"].np_dtype == np.int64


def test_bundle_crc_detects_corruption(tmp_path, rng):
    prefix = str(tmp_path / "model-9")
    tf_bundle.write_bundle(prefix, {"w": rng.randn(4, 4).astype(np.float32)})
    data_file = prefix + ".data-00000-of-00001"
    raw = bytearray(open(data_file, "rb").read())
    raw[3] ^= 0xFF
    open(data_file, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc32c"):
        tf_bundle.read_bundle(prefix)


@pytest.mark.skipif(not os.path.exists(REAL_INDEX), reason="reference absent")
def test_real_index_matches_fixture():
    """The checked-in fixture is a faithful parse of the real artifact."""
    num_shards, entries = tf_bundle.read_index(REAL_INDEX)
    fix = load_fixture()
    assert num_shards == fix["num_shards"]
    non_adam = {k: e for k, e in entries.items() if "/Adam" not in k}
    assert sorted(non_adam) == sorted(fix["variables"])
    for name, e in non_adam.items():
        rec = fix["variables"][name]
        assert e.dtype == rec["dtype"], name
        assert list(e.shape) == rec["shape"], name
        assert ((name + "/Adam") in entries) == rec["has_adam_slot"], name


# --------------------------------------------------------------------------
# Mapping: artifact-verified parameter parity
# --------------------------------------------------------------------------


def trainable_fixture_vars():
    fix = load_fixture()
    return {
        name: rec
        for name, rec in fix["variables"].items()
        if rec["dtype"] == 1 and not name.startswith(ref_import.IGNORED_PREFIXES)
    }


def test_mapping_is_a_bijection_with_the_trained_artifact():
    """Every trainable variable of the trained reference checkpoint maps to
    exactly one slice of our param tree and vice versa, shapes included —
    parameter parity verified against the artifact, not just analytically."""
    mapping = ref_import.reference_variable_map()
    trainable = trainable_fixture_vars()
    assert sorted(mapping) == sorted(trainable)

    params = flagship_param_shapes()
    covered = {}
    for ref_name, (kind, path, row) in mapping.items():
        leaf = _get(params, path)
        ref_shape = tuple(trainable[ref_name]["shape"])
        if kind == "kernel":
            assert ref_shape == (1, 1) + leaf.shape, ref_name
            covered[path] = covered.get(path, 0) + 1
        elif kind == "bias" and row is not None:
            assert ref_shape == leaf.shape[1:], ref_name
            covered.setdefault(path, set()).add(row)
        else:
            assert ref_shape == leaf.shape, ref_name
            covered[path] = covered.get(path, 0) + 1

    leaves = {
        tuple(p.key for p in path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    }
    assert set(leaves) == set(covered)
    for path, leaf in leaves.items():
        c = covered[path]
        if isinstance(c, set):
            assert c == set(range(leaf.shape[0])), path  # every bias row
        else:
            assert c == 1, path

    # total trainable parity (the param-count golden, derived independently)
    total = sum(int(np.prod(r["shape"])) for r in trainable.values())
    ours = sum(int(np.prod(leaf.shape)) for leaf in leaves.values())
    assert total == ours == 3_827_611


def test_import_export_roundtrip(tmp_path, rng):
    """export_reference_checkpoint → import_reference_checkpoint is exact."""
    shapes = flagship_param_shapes()
    params = jax.tree_util.tree_map(
        lambda s: rng.randn(*s.shape).astype(np.float32), shapes
    )
    prefix = str(tmp_path / "model-42")
    ref_import.export_reference_checkpoint(prefix, params, step=42)
    assert os.path.exists(prefix + ".index")
    assert os.path.exists(prefix + ".data-00000-of-00001")
    assert os.path.exists(str(tmp_path / "checkpoint"))
    back = ref_import.import_reference_checkpoint(prefix, shapes)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, arr in flat_a:
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(flat_b[path]))


def test_import_rejects_missing_variables(tmp_path, rng):
    shapes = flagship_param_shapes()
    params = jax.tree_util.tree_map(
        lambda s: rng.randn(*s.shape).astype(np.float32), shapes
    )
    prefix = str(tmp_path / "model-7")
    ref_import.export_reference_checkpoint(prefix, params)
    # drop one variable from the bundle
    tensors = tf_bundle.read_bundle(prefix)
    del tensors["cell/state0/weights"]
    tf_bundle.write_bundle(prefix, tensors)
    with pytest.raises(ValueError, match="missing"):
        ref_import.import_reference_checkpoint(prefix, shapes)


# --------------------------------------------------------------------------
# Gradient-flow parity: the trained artifact's Adam-slot fingerprint
# --------------------------------------------------------------------------


def test_untrained_fingerprint_matches_dead_branches():
    """Variables WITHOUT Adam slots in the trained checkpoint are exactly
    the graph's dead branches: the second decode invocation's state path
    (its output state only feeds the final refine layer's feat path) and
    that feat path itself. Mapped into our tree, the fingerprint lands on
    decode_cell bias row 1 of the state layers and refine_layer_final's
    feat_mlp/feat_out — nothing else."""
    mapping = ref_import.reference_variable_map()
    untrained = {
        name
        for name, rec in trainable_fixture_vars().items()
        if not rec["has_adam_slot"]
    }
    got = set()
    for name in untrained:
        kind, path, row = mapping[name]
        got.add((path, row))

    expected = set()
    for layer in ("state_mlp",):
        for sub in ("l0", "l1"):
            expected.add((("decode_cell", layer, sub, "bias"), 1))
    for i in range(16):
        expected.add((("decode_cell", f"expand{i}", "bias"), 1))
        expected.add((("decode_cell", f"expand{i}_pre", "l0", "bias"), 1))
    for layer, subs in (("feat_mlp", ("l0", "l1")), ("feat_out", ())):
        paths = (
            [("refine_layer_final", layer, s) for s in subs]
            if subs
            else [("refine_layer_final", layer)]
        )
        for p in paths:
            expected.add((p + ("kernel",), None))
            expected.add((p + ("bias",), None))
    assert got == expected


def test_gradient_flow_reproduces_fingerprint(rng):
    """Our graph's actual gradient support reproduces the artifact's
    fingerprint (scaled to the tiny config): zero gradient exactly on
    decode_cell's step-1 state-path biases and refine_layer_final's feat
    layers, nonzero everywhere else."""
    from rfnet_tpu.models import RFNet

    model = RFNet(n_seed=4, up_ratio=4)
    pc = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pc)

    def loss_fn(v):
        out = model.apply(v, pc)
        from rfnet_tpu.losses import chamfer_big

        return (
            chamfer_big(gt[:, :8], out.out1)[0]
            + chamfer_big(gt[:, :32], out.out2)[0]
            + chamfer_big(gt, out.out3)[0]
            + chamfer_big(gt, out.out4)[0]
        )

    grads = jax.grad(loss_fn)(variables)["params"]

    dead_rows = {("decode_cell", "state_mlp", "l0", "bias"),
                 ("decode_cell", "state_mlp", "l1", "bias")}
    for i in range(model.up_ratio):
        dead_rows.add(("decode_cell", f"expand{i}", "bias"))
        dead_rows.add(("decode_cell", f"expand{i}_pre", "l0", "bias"))
    dead_leaves = set()
    for layer in ("feat_mlp", "feat_out"):
        for path, _ in jax.tree_util.tree_leaves_with_path(
            grads["refine_layer_final"][layer]
        ):
            dead_leaves.add(
                ("refine_layer_final", layer) + tuple(p.key for p in path)
            )

    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        keys = tuple(p.key for p in path)
        g = np.asarray(g)
        if keys in dead_leaves:
            assert np.all(g == 0), f"expected dead: {keys}"
        elif keys in dead_rows:
            assert np.all(g[1] == 0), f"expected dead row 1: {keys}"
            assert np.any(g[0] != 0), f"expected live row 0: {keys}"
        elif keys[-1] == "bias" and g.ndim == 2:
            for r in range(g.shape[0]):
                assert np.any(g[r] != 0), f"expected live rows: {keys} row {r}"
        else:
            assert np.any(g != 0), f"expected live: {keys}"


# --------------------------------------------------------------------------
# Legacy checkpoint upgrade
# --------------------------------------------------------------------------


def test_legacy_checkpoint_upgrade(tmp_path, rng):
    """A checkpoint saved in the old shared-bias layout restores through
    restore_flexible: shared biases broadcast into every step row, forward
    identical to the legacy model's."""
    import orbax.checkpoint as ocp

    from rfnet_tpu.compat import ckpt_compat
    from rfnet_tpu.models import RFNet
    from rfnet_tpu.train import TrainConfig, _abstract, create_state

    config = TrainConfig(batch_size=2, innum=64, ptnum=128, n_seed=4, up_ratio=4)
    state = create_state(config, RFNet(n_seed=4, up_ratio=4))

    # fabricate a legacy-layout state: collapse every step-bias table to a
    # single random shared row (the old layout's single bias)
    def collapse(path, x):
        if ckpt_compat._is_step_bias(path) and np.ndim(x) == 2:
            return jnp.asarray(rng.randn(x.shape[1]).astype(np.float32))
        return x

    legacy_state = jax.tree_util.tree_map_with_path(collapse, state)
    mgr = ocp.CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, args=ocp.args.StandardSave(legacy_state))
    mgr.wait_until_finished()

    restored, upgraded = ckpt_compat.restore_flexible(mgr, 0, _abstract(state))
    assert upgraded
    # every step row equals the legacy shared bias; structure matches new
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(state)
    checked = 0
    flat_legacy = dict(jax.tree_util.tree_leaves_with_path(legacy_state))
    for path, leaf in jax.tree_util.tree_leaves_with_path(restored):
        if ckpt_compat._is_step_bias(path) and np.ndim(leaf) == 2:
            for row in np.asarray(leaf):
                np.testing.assert_array_equal(row, np.asarray(flat_legacy[path]))
            checked += 1
    assert checked > 0

    # the upgraded model computes the same forward as the legacy one did
    # (shared bias == identical rows)
    pc = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    out = state.apply_fn(restored.params, pc)
    assert np.all(np.isfinite(np.asarray(out.out4)))

    # a current-layout checkpoint restores WITHOUT the upgrade path
    mgr2 = ocp.CheckpointManager(str(tmp_path / "ckpt2"))
    mgr2.save(0, args=ocp.args.StandardSave(state))
    mgr2.wait_until_finished()
    _, upgraded2 = ckpt_compat.restore_flexible(mgr2, 0, _abstract(state))
    assert not upgraded2


# --------------------------------------------------------------------------
# Hyperparameter parity from the trained MetaGraphDef
# --------------------------------------------------------------------------

REAL_META = "/root/reference/bestrecord/model-229999.meta"


@pytest.mark.skipif(not os.path.exists(REAL_META), reason="reference absent")
def test_trained_graph_confirms_schedules_and_adam():
    """The trained run's graph (not just its source) pins the schedules and
    optimizer: LR piecewise [5e-4,2e-4,2e-4,1e-4,1e-5]@[50k,100k,150k,200k]
    boundary-inclusive, decfactor weight [0.01,0.01,0.001]@[50k,150k],
    Adam(0.9, 0.999, 1e-8); 239 ApplyAdam == 279 trainable − 40 dead."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import inspect_ref_graph as irg

    from rfnet_tpu import losses

    nodes = irg.load_nodes(REAL_META)
    bounds, values = irg.dump_case_schedule(nodes, "alpha_op")
    assert bounds == [50_000, 100_000, 150_000, 200_000]
    np.testing.assert_allclose(
        values, [5e-4, 2e-4, 2e-4, 1e-4, 1e-5], rtol=1e-6
    )
    # our schedule emits exactly these values across the boundaries
    # (boundary-inclusive: step == 50k still gets 5e-4)
    for step, want in [(0, 5e-4), (50_000, 5e-4), (50_001, 2e-4),
                       (100_000, 2e-4), (150_000, 2e-4), (150_001, 1e-4),
                       (200_000, 1e-4), (200_001, 1e-5)]:
        np.testing.assert_allclose(
            float(losses.learning_rate(jnp.int32(step))), want, rtol=1e-6
        )

    bounds1, values1 = irg.dump_case_schedule(nodes, "alpha_op_1")
    assert bounds1 == [50_000, 150_000]
    np.testing.assert_allclose(values1, [0.01, 0.01, 0.001], rtol=1e-6)
    for step, want in [(0, 0.01), (150_000, 0.01), (150_001, 0.001)]:
        np.testing.assert_allclose(
            float(losses.decfactor_weight(jnp.int32(step))), want, rtol=1e-6
        )

    np.testing.assert_allclose(irg.const_val(nodes, "Adam/beta1"), 0.9, rtol=1e-6)
    np.testing.assert_allclose(irg.const_val(nodes, "Adam/beta2"), 0.999, rtol=1e-6)
    np.testing.assert_allclose(irg.const_val(nodes, "Adam/epsilon"), 1e-8, rtol=1e-6)

    n_apply = sum(1 for _n, (op, _i, _t) in nodes.items() if op == "ApplyAdam")
    untrained = [r for r in trainable_fixture_vars().values()
                 if not r["has_adam_slot"]]
    assert n_apply == len(trainable_fixture_vars()) - len(untrained) == 239
