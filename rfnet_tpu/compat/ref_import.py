"""Bidirectional weight conversion: reference TF checkpoints ↔ rfnet_tpu.

The reference trains `vv_recon.py`'s graph with TF1 and saves TensorBundle
checkpoints (`vv_recon.py:461-550`, `bestrecord/`). This module carries a
complete, shape-verified 1:1 mapping between every trainable variable in
that graph and a leaf of our flax param tree, so users can

* **import**: bring a trained reference checkpoint into rfnet_tpu
  (:func:`import_reference_checkpoint`) and serve/fine-tune it on TPU;
* **export**: write rfnet_tpu weights as a reference-named TF bundle
  (:func:`export_reference_checkpoint`) readable by
  ``tf.train.load_checkpoint`` / ``init_from_checkpoint``.

Name mapping facts (derived from the trained artifact
`bestrecord/model-229999.index`, which fixes every name and shape):

* TF 1×1-conv kernels are ``[1, 1, in, out]`` → our Dense kernels
  ``(in, out)`` (same orientation, squeeze only);
* conv biases are named ``<scope>/Variable`` (``get_bias_variable``,
  `vv_recon.py:40-43`);
* the recurrent scopes share KERNELS only: ``tf.Variable`` biases ignore
  ``reuse=True``, so invocation 2/3 of `encode_cell` and invocation 2 of
  `decode_cell` create fresh bias variables under uniquified scopes
  (``cell_1/ cell_2/ decode_cell_1/`` — bias-only in the checkpoint).
  Ours store those as rows of one ``(n_steps, ch)`` bias table
  (:class:`rfnet_tpu.nn.StepDense`);
* non-variable entries (``Variable`` = global step, ``beta?_power`` +
  ``*/Adam*`` = Adam state, ``subvar*`` = untrained [b,16384,1] buffers
  absent from the current reference source) are not model weights and are
  ignored.
"""

from __future__ import annotations

import numpy as np

from rfnet_tpu.compat import tf_bundle

#: checkpoint entries that are not model weights
IGNORED_PREFIXES = ("Variable", "beta1_power", "beta2_power", "subvar")


def reference_variable_map():
    """{ref_name: (kind, our_path, bias_row)} over every trainable variable.

    ``kind`` ∈ {'kernel', 'bias', 'raw'}; ``our_path`` indexes into the
    ``params`` collection; ``bias_row`` selects the row of a per-step bias
    table (None for plain (ch,) biases).
    """
    m = {}

    def conv(ref_scope, path, row=None, bias_only=False):
        if not bias_only:
            m[ref_scope + "/weights"] = ("kernel", path + ("kernel",), None)
        m[ref_scope + "/Variable"] = ("bias", path + ("bias",), row)

    # encode cell: kernels live in cell/, biases per step (cell, cell_1, cell_2)
    cellmap = {
        "codemlp0": ("cell", "code_mlp", "l0"),
        "codemlp1": ("cell", "code_mlp", "l1"),
        "state0": ("cell", "state_mlp", "l0"),
        "state1": ("cell", "state_mlp", "l1"),
        "state_end": ("cell", "state_end"),
    }
    for step, scope in enumerate(("cell", "cell_1", "cell_2")):
        for ref_key, path in cellmap.items():
            conv(f"{scope}/{ref_key}", path, row=step, bias_only=step > 0)

    # decode cell: kernels in decode_cell/, biases per step (…, decode_cell_1)
    decmap = {
        "basic_state0": ("mlp", "l0"),
        "basic_state1": ("mlp", "l1"),
        "input_trans": ("input_trans",),
        "mask_tensor": ("mask_out",),
        "mlp_mask0": ("mask_mlp", "l0"),
        "mlp_mask1": ("mask_mlp", "l1"),
        "points0": ("points_mlp", "l0"),
        "points1": ("points_mlp", "l1"),
        "points_out": ("points_out",),
        "state0": ("state_mlp", "l0"),
        "state1": ("state_mlp", "l1"),
        "state_trans": ("state_trans",),
    }
    for i in range(16):
        decmap[f"state_expand{i}"] = (f"expand{i}",)
        decmap[f"state_expand{i}_0"] = (f"expand{i}_pre", "l0")
    for step, scope in enumerate(("decode_cell", "decode_cell_1")):
        for ref_key, path in decmap.items():
            conv(f"{scope}/{ref_key}", ("decode_cell",) + path, row=step,
                 bias_only=step > 0)

    # init_move_layer builds its convs OUTSIDE any variable scope
    # (`vv_recon.py:140-159`), so its layers sit at the checkpoint top level
    for i in range(3):
        conv(f"ini_layer{i}", ("init_move", "mlp", f"l{i}"))
    for i in range(2):
        conv(f"ini_featout{i}", ("init_move", "featmlp", f"l{i}"))
    conv("inimove_featout", ("init_move", "featout"))
    for i in range(3):
        conv(f"ini_ptsout{i}", ("init_move", "ptsmlp", f"l{i}"))
    conv("inimove_ptsout", ("init_move", "ptsout"))
    for i in range(2):  # feat_trans (`vv_recon.py:208`) — also top level
        conv(f"partfeat{i}", ("feat_trans", f"l{i}"))

    for scope in ("init_mlp", "part_mlp"):  # global_mlp instances
        for i in range(3):
            conv(f"{scope}/ini_layer{i}", (scope, "mlp", f"l{i}"))

    for n in (1, 2, 3):  # recover_cell per step
        conv(f"recover{n}/recover20", (f"recover{n}", "mlp", "l0"))
        conv(f"recover{n}/recover21", (f"recover{n}", "mlp", "l1"))
        conv(f"recover{n}/recover2out1", (f"recover{n}", "out"))

    icmap = {
        "basic_state0": ("mlp", "l0"),
        "basic_state1": ("mlp", "l1"),
        "input_trans": ("input_trans",),
        "points_out": ("points_out",),
        "state0": ("state_mlp", "l0"),
        "state1": ("state_mlp", "l1"),
        "state_out": ("state_out",),
        "state_outo": ("state_outo",),
    }
    for ref_key, path in icmap.items():
        conv(f"init_cell/{ref_key}", ("init_cell",) + path)

    for scope in ("refine_layer1", "refine_layer2", "refine_layer_final"):
        for i in range(3):
            conv(f"{scope}/refine_layers{i}", (scope, "mlp", f"l{i}"))
        conv(f"{scope}/refine_layer_final", (scope, "out"))
        for i in range(2):
            conv(f"{scope}/ini_layer{i}", (scope, "self_mlp", f"l{i}"))
        for i in range(2):
            conv(f"{scope}/feat_refine{i}", (scope, "feat_mlp", f"l{i}"))
        conv(f"{scope}/feat_refine_final", (scope, "feat_out"))

    for name in ("decline_factor", "decline_factor0", "decline_factor1"):
        m[name] = ("raw", (name,), None)
    return m


def _unwrap(variables):
    """Accept either the full variables dict or the params collection."""
    if isinstance(variables, dict) and set(variables) == {"params"}:
        return variables["params"], True
    if hasattr(variables, "keys") and set(variables.keys()) == {"params"}:
        return variables["params"], True
    return variables, False


def _get(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def _to_plain(tree):
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def _set(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = value


def import_reference_checkpoint(prefix: str, variables):
    """Load a reference TF checkpoint into a copy of ``variables``.

    ``prefix`` is the checkpoint path without extension (the directory must
    contain ``<prefix>.index`` and its ``.data-*`` shard). ``variables`` is
    the model's init output (``{'params': ...}`` or the params collection);
    its shapes pin the expected model config. Every trainable reference
    variable is consumed and every target leaf fully assigned — partial or
    shape-mismatched checkpoints raise.
    """
    params, wrapped = _unwrap(variables)
    mapping = reference_variable_map()
    tensors = tf_bundle.read_bundle(prefix, names=set(mapping))
    missing = sorted(set(mapping) - set(tensors))
    if missing:
        raise ValueError(
            f"reference checkpoint is missing {len(missing)} expected "
            f"variables, e.g. {missing[:5]} — wrong model or truncated save?"
        )

    out = _to_plain(params)
    assigned_rows: dict = {}
    for ref_name, (kind, path, row) in mapping.items():
        arr = np.asarray(tensors[ref_name], dtype=np.float32)
        # targets may be abstract (ShapeDtypeStruct) — only shapes are read
        tshape = tuple(_get(out, path).shape)
        if kind == "kernel":
            if arr.shape[:2] != (1, 1) or arr.shape[2:] != tshape:
                raise ValueError(
                    f"{ref_name}: shape {arr.shape} does not map to "
                    f"{'/'.join(path)} {tshape}"
                )
            _set(out, path, arr.reshape(tshape))
        elif kind == "bias" and row is not None:
            if arr.shape != tshape[1:]:
                raise ValueError(
                    f"{ref_name}: bias shape {arr.shape} vs row shape "
                    f"{tshape[1:]} at {'/'.join(path)}"
                )
            rows = assigned_rows.setdefault(path, np.zeros(tshape, np.float32))
            rows[row] = arr
            _set(out, path, rows)
        else:  # plain bias or raw scalar
            if arr.shape != tshape:
                raise ValueError(
                    f"{ref_name}: shape {arr.shape} vs {tshape} at "
                    f"{'/'.join(path)}"
                )
            _set(out, path, arr)
    return {"params": out} if wrapped else out


def export_reference_checkpoint(prefix: str, variables, step: int = 0):
    """Write rfnet_tpu weights as a reference-named TF checkpoint bundle.

    Produces ``<prefix>.index`` + ``<prefix>.data-00000-of-00001`` plus the
    Saver's ``checkpoint`` state file next to it. The bundle carries every
    trainable variable under its reference graph name (including the
    per-step bias scopes) and the int64 global step, so TF-side tooling
    (``tf.train.load_checkpoint``, ``init_from_checkpoint``) can consume it
    directly. The ``.meta`` graph is TF-side state and is not produced.
    """
    import os

    params, _ = _unwrap(variables)
    tensors = {}
    for ref_name, (kind, path, row) in reference_variable_map().items():
        arr = np.asarray(_get(params, path), dtype=np.float32)
        if kind == "kernel":
            tensors[ref_name] = arr.reshape((1, 1) + arr.shape)
        elif kind == "bias" and row is not None:
            tensors[ref_name] = np.ascontiguousarray(arr[row])
        else:
            tensors[ref_name] = arr
    tensors["Variable"] = np.asarray(step, dtype=np.int32)
    tf_bundle.write_bundle(prefix, tensors)
    ckpt_file = os.path.join(os.path.dirname(os.path.abspath(prefix)), "checkpoint")
    base = os.path.basename(prefix)
    with open(ckpt_file, "w") as f:
        f.write(f'model_checkpoint_path: "{base}"\n')
        f.write(f'all_model_checkpoint_paths: "{base}"\n')
