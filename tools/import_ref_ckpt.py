"""Convert trained weights between the reference TF format and rfnet_tpu.

Import (TF bundle -> orbax, servable by rfnet_tpu.eval / resumable by
rfnet_tpu.train):

    python tools/import_ref_ckpt.py \
        --ref_prefix /path/to/bestrecord/model-229999 --workdir ./modelvv_recon

Export (rfnet_tpu orbax checkpoint -> reference-named TF bundle readable by
``tf.train.load_checkpoint`` / ``init_from_checkpoint``):

    python tools/import_ref_ckpt.py --export \
        --workdir ./modelvv_recon --ref_prefix /path/out/model-0

The mapping covers every trainable variable of `vv_recon.py`'s graph 1:1
(per-step bias scopes included) and refuses partial or shape-mismatched
checkpoints — see rfnet_tpu/compat/ref_import.py. Import requires the full
bundle (``.index`` + ``.data-*``); the reference checkout ships only the
``.index``, so real imports need a user-supplied complete checkpoint.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref_prefix", required=True,
                    help="TF checkpoint path without extension")
    ap.add_argument("--workdir", required=True,
                    help="orbax checkpoint dir (import target / export source)")
    ap.add_argument("--export", action="store_true",
                    help="export rfnet_tpu weights to TF format instead")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: parse from ref_prefix on "
                    "import, latest on export)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host-side

    import orbax.checkpoint as ocp

    from rfnet_tpu.compat.ckpt_compat import restore_flexible
    from rfnet_tpu.compat.ref_import import (
        export_reference_checkpoint,
        import_reference_checkpoint,
    )
    from rfnet_tpu.train import TrainConfig, _abstract, create_state

    state = create_state(TrainConfig())
    mgr = ocp.CheckpointManager(os.path.abspath(args.workdir))

    if args.export:
        latest = args.step if args.step is not None else mgr.latest_step()
        if latest is None:
            sys.exit(f"no checkpoint under {args.workdir}")
        state, _ = restore_flexible(mgr, latest, _abstract(state))
        export_reference_checkpoint(args.ref_prefix, state.params, step=latest)
        print(f"wrote {args.ref_prefix}.index / .data-00000-of-00001 "
              f"(step {latest})")
        return

    step = args.step
    if step is None:
        m = re.search(r"-(\d+)$", args.ref_prefix)
        step = int(m.group(1)) if m else 0
    params = import_reference_checkpoint(args.ref_prefix, state.params)
    state = state.replace(params=params, step=step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    print(f"imported {args.ref_prefix} -> {args.workdir} step {step} "
          f"({sum(x.size for x in jax.tree_util.tree_leaves(params))} params)")


if __name__ == "__main__":
    main()
