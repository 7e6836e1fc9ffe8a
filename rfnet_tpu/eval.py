"""Evaluation / test driver — `recon_test.py` parity.

Reproduces the reference metric contract exactly (`recon_test.py:19-114`):
  * per-model CSV `results.csv` with header `id,cd,emd` where `cd` is
    ``chamfer_big(output, gt)`` and the **`emd` column is actually
    ``fidelity_loss(inputs, output)``** — the one-sided partial→output CD
    (`recon_test.py:27-28`), a reference quirk preserved for comparability;
  * per-category means printed at the end;
  * "Average time" excludes the first 10 iterations as warmup
    (`recon_test.py:58-64,92`);
  * optional three-view plots every `--plot_freq` models and .pcd dumps;
  * trainable-parameter count printed up front (`recon_test.py:15-18`).

TPU upgrades: the whole forward + metric computation is one jit; an optional
``--batch_size`` amortises dispatch across models (the reference is locked to
batch 1); checkpoints restore via orbax from the `best/` record.
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rfnet_tpu.data.dataset import resample_pcd
from rfnet_tpu.data.pcd_io import read_pcd, save_pcd
from rfnet_tpu.train import TrainConfig, create_state, ocp_abstract


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))


def load_state(checkpoint: str, config: TrainConfig):
    import orbax.checkpoint as ocp

    state = create_state(config)
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint))
    latest = mgr.latest_step()
    if latest is None:
        print(f"WARNING: no checkpoint under {checkpoint}; evaluating random init")
        return state
    from rfnet_tpu.compat.ckpt_compat import restore_flexible

    abstract = jax.tree_util.tree_map(ocp_abstract, state)
    restored, upgraded = restore_flexible(mgr, latest, abstract)
    if upgraded:
        print("checkpoint upgraded from legacy shared-bias layout")
    return restored


def make_complete_fn(state, mesh=None):
    """Jitted (complete, metrics) pair; with ``mesh`` the model-batch axis is
    data-parallel over the device mesh (weights replicated, batch sharded) —
    the aggregate-serving path: N chips complete N× the clouds per dispatch
    with per-sample results identical to single-device
    (tests/test_data_eval.py::test_eval_cli_mesh_matches_single)."""
    in_shard = out_shard = None
    if mesh is not None:
        from rfnet_tpu.parallel import data_sharding, replicated

        in_shard, repl = data_sharding(mesh), replicated(mesh)
        out_shard = in_shard
        state = jax.device_put(state, repl)

    def _complete(partial):
        return state.apply_fn(state.params, partial).out4

    def _metrics(partial, output, gt):
        # per-sample forms of chamfer_big / fidelity_loss (identical to the
        # reference values, which are computed at batch 1); on TPU both run
        # in sorted space through the early-exit kernel — per-sample means
        # are permutation invariant, and the fidelity form skips the unused
        # reverse scan nn_distance would compute (ops/chamfer.py)
        from rfnet_tpu.ops.chamfer import chamfer_sample_means, nn_sample_mean_one

        m1, m2 = chamfer_sample_means(output, gt)
        cd = (m1 + m2) / 2
        emd = nn_sample_mean_one(partial, output)
        return cd, emd

    if mesh is None:
        return jax.jit(_complete), jax.jit(_metrics)
    complete = jax.jit(
        _complete, in_shardings=(in_shard,), out_shardings=out_shard
    )
    metrics = jax.jit(
        _metrics,
        in_shardings=(in_shard, in_shard, in_shard),
        out_shardings=(out_shard, out_shard),
    )
    return complete, metrics


def _load_chunks(model_list, bsz, args, out_q, stop):
    """Producer thread: read + resample the next batches while the device
    computes the current one (the host PCD decode otherwise serializes with
    the ~50-100 ms per-dispatch relay latency — CLAUDE.md).

    Any I/O failure (missing/corrupt .pcd) is enqueued as the exception
    itself so the consumer re-raises it — a bare daemon-thread death would
    leave test() blocked on load_q.get() forever."""
    import queue as _q

    def put(item) -> bool:
        while not stop.is_set():
            try:
                out_q.put(item, timeout=0.5)
                return True
            except _q.Full:
                continue
        return False

    try:
        for chunk_start in range(0, len(model_list), bsz):
            chunk = model_list[chunk_start : chunk_start + bsz]
            partials, gts = [], []
            for model_id in chunk:
                partial = read_pcd(
                    os.path.join(args.data_dir, "partial", f"{model_id}.pcd")
                )
                complete_gt = read_pcd(
                    os.path.join(args.data_dir, "complete", f"{model_id}.pcd")
                )
                partials.append(resample_pcd(partial, 3000).astype(np.float32))
                gts.append(
                    resample_pcd(complete_gt, args.num_gt_points).astype(np.float32)
                )
            # pad the final group so one compiled batch shape serves the run
            while len(partials) < bsz:
                partials.append(partials[-1])
                gts.append(gts[-1])
            if not put((chunk_start, chunk, np.stack(partials), np.stack(gts))):
                return
        put(None)
    except BaseException as exc:  # re-raised by the consumer loop
        put(exc)


def test(args):
    import queue as _q
    import threading
    from collections import deque

    config = TrainConfig(
        ptnum=args.num_gt_points,
        compute_dtype="bfloat16" if getattr(args, "bf16", False) else "float32",
    )
    state = load_state(args.checkpoint, config)
    print("trainable parameters:", count_params(state.params))
    mesh = None
    n_mesh = int(getattr(args, "mesh", 0) or 0)
    if n_mesh:
        from rfnet_tpu.parallel import make_mesh

        mesh = make_mesh(n_mesh)
        if max(1, args.batch_size) % mesh.size:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be a multiple of the "
                f"mesh size {mesh.size}"
            )
    complete, metrics = make_complete_fn(state, mesh)

    os.makedirs(args.results_dir, exist_ok=True)
    csv_path = os.path.join(args.results_dir, "results.csv")
    csv_file = open(csv_path, "w", newline="")
    writer = csv.writer(csv_file)
    writer.writerow(["id", "cd", "emd"])

    with open(args.list_path) as f:
        model_list = f.read().splitlines()

    total_time = 0.0
    timed_models = 0
    total_cd = 0.0
    total_emd = 0.0
    cd_per_cat: dict[str, list] = {}
    emd_per_cat: dict[str, list] = {}
    bsz = max(1, args.batch_size)
    pipeline = bool(getattr(args, "pipeline", False))

    def process_results(chunk_start, chunk, partials, gts, completion, cds, emds,
                        elapsed):
        nonlocal total_time, timed_models, total_cd, total_emd
        for j, model_id in enumerate(chunk):
            i = chunk_start + j
            if chunk_start >= 10:
                # warmup-exclusion (recon_test.py:58-64): exact at the default
                # batch 1 (chunk_start == i); at batch_size>1 `elapsed` is
                # batch-amortized, so a batch STRADDLING index 10 is excluded
                # entirely (its per-cloud time is warmup-contaminated) and the
                # divisor counts only the models actually timed
                total_time += elapsed
                timed_models += 1
            cd, emd = float(cds[j]), float(emds[j])
            total_cd += cd
            total_emd += emd
            writer.writerow([model_id, cd, emd])

            synset_id, short_id = model_id.split("/")
            cd_per_cat.setdefault(synset_id, []).append(cd)
            emd_per_cat.setdefault(synset_id, []).append(emd)

            if i % args.plot_freq == 0:
                from rfnet_tpu.visu import plot_pcd_three_views

                os.makedirs(
                    os.path.join(args.results_dir, "plots", synset_id), exist_ok=True
                )
                plot_pcd_three_views(
                    os.path.join(args.results_dir, "plots", synset_id, f"{short_id}.png"),
                    [partials[j], np.asarray(completion[j]), gts[j]],
                    ["input", "output", "ground truth"],
                    f"CD {cd:.4f}  EMD {emd:.4f}",
                    [5, 0.5, 0.5],
                )
            if args.save_pcd:
                os.makedirs(
                    os.path.join(args.results_dir, "pcds", synset_id), exist_ok=True
                )
                save_pcd(
                    os.path.join(args.results_dir, "pcds", synset_id, f"{short_id}.pcd"),
                    np.asarray(completion[j]),
                )

    if mesh is None:
        to_dev = jnp.asarray
    else:
        from rfnet_tpu.parallel import data_sharding

        _data = data_sharding(mesh)

        def to_dev(a):
            return jax.device_put(a, _data)

    load_q: _q.Queue = _q.Queue(maxsize=4)
    stop = threading.Event()
    loader = threading.Thread(
        target=_load_chunks, args=(model_list, bsz, args, load_q, stop), daemon=True
    )
    loader.start()

    def get_item():
        """Next loader item; re-raises a loader-thread I/O failure here."""
        item = load_q.get()
        if isinstance(item, BaseException):
            raise item
        return item

    try:
        if not pipeline:
            # reference behaviour: synchronous per-batch timing
            # (recon_test.py:58-64); only the disk reads are overlapped
            while (item := get_item()) is not None:
                chunk_start, chunk, pnp, gnp = item
                pb = to_dev(pnp)
                gb = to_dev(gnp)
                start = time.time()
                completion = jax.block_until_ready(complete(pb))
                float(jnp.sum(completion))  # force real completion (CLAUDE.md)
                elapsed = (time.time() - start) / bsz
                cds, emds = metrics(pb, completion, gb)
                process_results(chunk_start, chunk, pnp, gnp, completion,
                                cds, emds, elapsed)
        else:
            # pipelined: keep DEPTH batches in flight so device compute hides
            # the dispatch-relay latency; "Average time" becomes amortized
            # wall-clock per cloud (documented deviation — the sync path keeps
            # the reference convention)
            DEPTH = 3
            pending: deque = deque()
            t_prev = time.time()
            done_loading = False
            while not done_loading or pending:
                while not done_loading and len(pending) < DEPTH:
                    item = get_item()
                    if item is None:
                        done_loading = True
                        break
                    chunk_start, chunk, pnp, gnp = item
                    pb = to_dev(pnp)
                    completion = complete(pb)  # async dispatch
                    cds, emds = metrics(pb, completion, to_dev(gnp))
                    pending.append(
                        (chunk_start, chunk, pnp, gnp, completion, cds, emds)
                    )
                if pending:
                    chunk_start, chunk, pnp, gnp, completion, cds, emds = (
                        pending.popleft()
                    )
                    cds = np.asarray(cds)  # readback bounds this batch's work
                    now = time.time()
                    elapsed = (now - t_prev) / bsz  # amortized per cloud
                    t_prev = now
                    process_results(chunk_start, chunk, pnp, gnp, completion,
                                    cds, emds, elapsed)
    finally:
        stop.set()
    csv_file.close()

    print("Average time: %f" % (total_time / max(1, timed_models)))
    print("Average Chamfer distance: %f" % (total_cd / max(1, len(model_list))))
    print("Average Earth mover distance: %f" % (total_emd / max(1, len(model_list))))
    print("Chamfer distance per category")
    for synset_id in cd_per_cat:
        print(synset_id, "%f" % np.mean(cd_per_cat[synset_id]))
    print("Earth mover distance per category")
    for synset_id in emd_per_cat:
        print(synset_id, "%f" % np.mean(emd_per_cat[synset_id]))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--list_path", default="../../dense_data/test.list")
    parser.add_argument("--data_dir", default="../../dense_data/test")
    parser.add_argument("--checkpoint", default="./bestrecord")
    parser.add_argument("--results_dir", default="results/recon")
    parser.add_argument("--num_gt_points", type=int, default=16384)
    parser.add_argument("--plot_freq", type=int, default=100)
    parser.add_argument("--save_pcd", action="store_true")
    parser.add_argument(
        "--batch_size", type=int, default=1,
        help="models per device batch (1 = reference behaviour)",
    )
    parser.add_argument(
        "--mesh", type=int, default=0,
        help="data-parallel serving over an N-device mesh: weights "
        "replicated, model batch sharded (batch_size must be a multiple "
        "of N); per-sample metrics identical to single-device",
    )
    parser.add_argument(
        "--pipeline", action="store_true",
        help="keep several batches in flight to hide dispatch latency; "
        "'Average time' becomes amortized wall-clock per cloud",
    )
    parser.add_argument(
        "--profile_dir", default=None, help="write a jax profiler trace here"
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 feature MLPs (serving mode; CD delta -0.04%% measured on converged weights, throughput a wash -- fp32 is the default)",
    )
    args = parser.parse_args(argv)
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    try:
        test(args)
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
