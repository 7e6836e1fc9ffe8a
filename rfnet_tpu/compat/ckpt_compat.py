"""Restore orbax checkpoints saved before the per-step-bias layout.

Round 3 changed the ``cell`` / ``decode_cell`` bias params from a single
shared ``(ch,)`` vector to a ``(n_steps, ch)`` table
(:class:`rfnet_tpu.nn.StepDense` — the reference's tf.Variable biases
ignore scope reuse, so each recurrent invocation trains its own bias).
Checkpoints written before that change restore through here: the shared
bias is broadcast into every step row (exactly the state the old model was
in — all steps using one bias), and likewise for the Adam ``mu``/``nu``
mirrors. The upgraded state is then byte-compatible with the new layout
and produces the same forward as the legacy model it came from.
"""

from __future__ import annotations

import jax
import numpy as np


def _dict_keys(path) -> list:
    return [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]


def _is_step_bias(path) -> bool:
    keys = _dict_keys(path)
    return bool(keys) and keys[-1] == "bias" and (
        "cell" in keys or "decode_cell" in keys
    )


def legacy_abstract(new_abstract):
    """Abstract tree of the pre-upgrade layout: per-step bias tables
    collapse back to the shared ``(ch,)`` shape."""

    def collapse(path, x):
        if _is_step_bias(path) and hasattr(x, "shape") and len(x.shape) == 2:
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(x.shape[1:], x.dtype, sharding=sharding)
        return x

    return jax.tree_util.tree_map_with_path(collapse, new_abstract)


def upgrade(legacy_tree, new_abstract):
    """Broadcast a legacy-layout tree into the per-step-bias layout."""

    def expand(path, new_ab, old):
        if _is_step_bias(path) and hasattr(new_ab, "shape") and len(new_ab.shape) == 2:
            arr = np.broadcast_to(np.asarray(old)[None], new_ab.shape)
            sharding = getattr(new_ab, "sharding", None)
            if sharding is not None:
                return jax.device_put(np.ascontiguousarray(arr), sharding)
            return jax.numpy.asarray(arr)
        return old

    return jax.tree_util.tree_map_with_path(expand, new_abstract, legacy_tree)


def restore_flexible(mgr, step: int, abstract):
    """Orbax restore that falls back to the legacy bias layout.

    Tries the current layout first; on a structure/shape mismatch retries
    with :func:`legacy_abstract` and upgrades the result. Returns
    ``(tree, upgraded)``.
    """
    import orbax.checkpoint as ocp

    try:
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract)), False
    except Exception as exc:  # noqa: BLE001 - orbax raises various types here
        legacy = legacy_abstract(abstract)
        if jax.tree_util.tree_structure(legacy) == jax.tree_util.tree_structure(
            abstract
        ) and all(
            getattr(a, "shape", None) == getattr(b, "shape", None)
            for a, b in zip(
                jax.tree_util.tree_leaves(legacy),
                jax.tree_util.tree_leaves(abstract),
            )
        ):
            raise  # no layout difference to fall back to — original error
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(legacy))
        except Exception:
            raise exc from None  # surface the current-layout error
        return upgrade(restored, abstract), True
