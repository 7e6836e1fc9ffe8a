"""Training loop — the `vv_recon.py:461-550` capability, TPU-native.

Differences from the reference, by design:
  * one jitted, donated train step (model fwd + all losses + Adam update)
    replaces the per-step `sess.run` feed_dict round-trips — host→device
    traffic is just the batch arrays;
  * GT coarse pyramids (FPS 64/1024 of the 16384-pt GT, `vv_recon.py:472-475`)
    are computed on-device inside the step with the fused FPS op — same
    semantics, no host round trip;
  * data parallelism over a `jax.sharding.Mesh`: the batch is dp-sharded, the
    state replicated, and XLA inserts the gradient all-reduce (new capability,
    SURVEY.md §2.3);
  * checkpoint/resume via orbax `CheckpointManager(max_to_keep=20)`, save
    every 20 000 steps, auto-restore-latest on start, best-by-eval-CD kept in
    `best/` — the reference's Saver + `cp -r ./bestrecord` semantics
    (`vv_recon.py:509-550`);
  * metrics: the same scalar set the reference prints every 500 steps
    (`vv_recon.py:432-444`) goes to stdout + a JSONL metrics file.

Defaults reproduce the reference constants (`vv_recon.py:25-31`):
300 000 iterations, batch 32, eval batch 4, 3000-pt inputs, 16384-pt GT,
Adam with the piecewise LR 5e-4→1e-5 and decfactor weight 0.01→0.001.
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import NamedSharding, PartitionSpec as P

from rfnet_tpu import losses
from rfnet_tpu.models import RFNet
from rfnet_tpu.ops.fps import farthest_point_sample, gather_point
from rfnet_tpu.parallel import (
    data_sharding,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
    shard_batch,
)


@dataclasses.dataclass
class TrainConfig:
    # reference constants, vv_recon.py:25-31
    iters: int = 300_000
    batch_size: int = 32
    eval_size: int = 4
    innum: int = 3000
    ptnum: int = 16384
    seed: int = 1
    log_every: int = 500
    ckpt_every: int = 20_000
    max_to_keep: int = 20
    workdir: str = "./modelvv_recon"
    # model
    n_seed: int = 32
    up_ratio: int = 16
    # 'bfloat16' = serving mode for the feature MLPs (params/coords stay f32;
    # measured CD delta 0.02% on a trained model — see PARITY.md)
    compute_dtype: str = "float32"
    # compresses the LR/α₁ schedule boundaries proportionally for runs
    # shorter than the reference's 300k steps (1.0 = exact reference parity;
    # 0.1 → LR boundaries 5k/10k/15k/20k for a 30k-step run)
    schedule_scale: float = 1.0
    # per-weight TensorBoard histograms (the reference's tf.summary.histogram
    # per variable, vv_recon.py:36,42). OFF by default: emitting them reads
    # every parameter back to host each log step — on a relay-attached host
    # each readback is a blocking round trip, a hidden stall the step-rate
    # numbers would silently include. Scalars are always written.
    tb_histograms: bool = False


class TrainState(train_state.TrainState):
    pass


def create_state(config: TrainConfig, model: RFNet | None = None) -> TrainState:
    dtype = None if config.compute_dtype == "float32" else jnp.dtype(config.compute_dtype)
    model = model or RFNet(n_seed=config.n_seed, up_ratio=config.up_ratio, dtype=dtype)
    params = model.init(
        jax.random.PRNGKey(config.seed),
        jnp.zeros((1, config.innum, 3), jnp.float32),
    )
    tx = optax.adam(
        learning_rate=functools.partial(
            losses.learning_rate, scale=config.schedule_scale
        )
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def train_step(state: TrainState, partial: jax.Array, gt: jax.Array, *, n1: int,
               n2: int, schedule_scale: float = 1.0):
    """One fused optimization step. n1/n2 are the coarse pyramid sizes."""
    gt1 = gather_point(gt, farthest_point_sample(n1, gt))
    gt2 = gather_point(gt, farthest_point_sample(n2, gt))
    return train_step_pyr(state, partial, gt, gt1, gt2,
                          schedule_scale=schedule_scale)


def train_step_pyr(state: TrainState, partial: jax.Array, gt: jax.Array,
                   gt1: jax.Array, gt2: jax.Array, *,
                   schedule_scale: float = 1.0):
    """The step with the GT FPS pyramids passed in. FPS is a deterministic
    per-row function of gt, so precomputing the pyramids (e.g. once over the
    device-resident set in --preload_device mode) is bit-identical to the
    on-step recompute while saving ~10 ms/step at b32 (the 64- and 1024-point
    FPS of the 16384-point GT). SURVEY §7's pipeline-precompute optimization;
    the on-step path stays for streamed data (reference computes them in-graph
    per batch, vv_recon.py:472-475)."""

    def loss_fn(params):
        out = state.apply_fn(params, partial)
        lb = losses.total_loss(out, gt, gt1, gt2, state.step, schedule_scale)
        return lb.total, (lb, out)

    (_, (lb, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads=grads)
    diag = {
        "code1_first": out.code1[0, 0, 0],
        "code1_nonzero": jnp.sum(out.code1[0, 0] != 0),
        "code2_nonzero": jnp.sum(out.code2[0, 0] != 0),
        "code3_nonzero": jnp.sum(out.code3[0, 0] != 0),
        "code1_max": jnp.max(out.code1[0, 0]),
        "code2_max": jnp.max(out.code2[0, 0]),
        "code3_max": jnp.max(out.code3[0, 0]),
    }
    return new_state, lb, diag


def eval_step(state: TrainState, partial: jax.Array, gt: jax.Array):
    """chamfer + emd of the final output (`eval_one_batch`, vv_recon.py:445-459)."""
    out = state.apply_fn(state.params, partial)
    from rfnet_tpu.ops.chamfer import chamfer_means

    ma, mb = chamfer_means(gt, out.out4)  # = chamfer_big value, no indices
    emd = losses.earth_mover_eval(gt, out.out4)
    return (ma + mb) / 2.0, emd


def make_jitted_steps(config: TrainConfig, mesh=None):
    n1 = 2 * config.n_seed
    n2 = n1 * config.up_ratio
    step_fn = functools.partial(
        train_step, n1=n1, n2=n2, schedule_scale=config.schedule_scale
    )
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0), jax.jit(eval_step)
    repl = replicated(mesh)
    data = data_sharding(mesh)
    jstep = jax.jit(
        step_fn,
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl, repl),
        donate_argnums=0,
    )
    jeval = jax.jit(eval_step, in_shardings=(repl, data, data), out_shardings=repl)
    return jstep, jeval


def _ckpt_managers(config: TrainConfig):
    import orbax.checkpoint as ocp

    opts = ocp.CheckpointManagerOptions(max_to_keep=config.max_to_keep)
    mgr = ocp.CheckpointManager(os.path.abspath(config.workdir), options=opts)
    best = ocp.CheckpointManager(
        os.path.abspath(os.path.join(config.workdir, "..", "bestrecord")),
        options=ocp.CheckpointManagerOptions(max_to_keep=1),
    )
    return mgr, best


def restore_if_available(mgr, state: TrainState) -> TrainState:
    latest = mgr.latest_step()
    if latest is None:
        return state
    from rfnet_tpu.compat.ckpt_compat import restore_flexible

    restored, upgraded = restore_flexible(mgr, latest, _abstract(state))
    note = " (upgraded from legacy shared-bias layout)" if upgraded else ""
    print(f"restored checkpoint at step {latest}{note}")
    return restored


def _abstract(state):
    return jax.tree_util.tree_map(ocp_abstract, state)


def ocp_abstract(x):
    if isinstance(x, jax.Array):
        # carry the target sharding so restore places arrays directly on the
        # current mesh (and stays safe across topology changes)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    if isinstance(x, np.ndarray):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


def preload_device_data(train_df, config: TrainConfig, mesh=None):
    """Upload the ENTIRE training set to device once; batches become
    on-device gathers driven by the dataflow's own index stream.

    Valid when every sample's partial has ≥ innum points (resample is then a
    DETERMINISTIC truncation — no per-batch RNG — so batch composition is
    bit-identical to the host path, reusing `BatchedDataflow._index_stream`
    for the epoch permutations). Purpose: on a relay-attached host the
    ~6.3 MB/step host→device batch copy dominates the step wall-clock
    (measured 0.7-0.9 s vs a 0.2 s device step); preloading removes it
    entirely — the per-step upload is 32 int32 indices. On a real TPU host
    this is still a win (no per-step DMA), at the cost of HBM residency
    (~950 MB for the 4096-sample synthetic set vs 16 GB HBM).

    With a mesh the resident set is SHARDED over the dp axis along the
    sample dimension (padded to a multiple of the mesh size; pad rows are
    never indexed) — residency per chip scales as N/D, so a mesh extends the
    dataset sizes this mode can hold, the multi-chip analogue of the single
    -chip HBM residency trade. Batches are then assembled by the shard_map
    psum-gather in `_make_resident_gather`.

    Returns (partials_dev (N, innum, 3), gts_dev (N, ptnum, 3), index_iter).
    """
    from rfnet_tpu.data.dataset import resample_pcd

    parts, gts = [], []
    for i in range(train_df.size):
        _, partial, gt = train_df._load(i)
        if partial.shape[0] < config.innum:
            raise ValueError(
                "preload_device requires partials with >= innum points "
                "(smaller partials take the RNG duplicate-padding path, "
                "which is per-batch-stateful on the host)"
            )
        parts.append(resample_pcd(partial, config.innum))
        gts.append(resample_pcd(gt, config.ptnum))
    parts_np = np.stack(parts).astype(np.float32)
    gts_np = np.stack(gts).astype(np.float32)
    if mesh is None:
        return jax.device_put(parts_np), jax.device_put(gts_np), train_df._index_stream()
    n_dev = mesh.devices.size
    pad = (-parts_np.shape[0]) % n_dev
    if pad:
        # pad rows (repeat of row 0 so FPS precompute sees real geometry)
        # are never produced by the index stream — only real rows gather
        parts_np = np.concatenate([parts_np, np.repeat(parts_np[:1], pad, 0)])
        gts_np = np.concatenate([gts_np, np.repeat(gts_np[:1], pad, 0)])
    spec = NamedSharding(mesh, P(mesh.axis_names[0]))
    partials_dev = jax.device_put(parts_np, spec)
    gts_dev = jax.device_put(gts_np, spec)
    return partials_dev, gts_dev, train_df._index_stream()


def _make_resident_gather(mesh):
    """On-mesh batch gather from a sample-sharded resident array.

    Each device takes the requested rows that live in ITS shard (masked
    clipped take — no dynamic shapes), zeros elsewhere, and one `psum` over
    the dp axis assembles the full batch on every device. The psum adds each
    real row to D−1 exact fp32 zeros, so the result is BIT-identical to a
    single-device `jnp.take` (pinned by tests/test_fastpaths_mesh.py). A
    one-hot matmul gather would be simpler but rides the MXU, which
    truncates fp32 operands to bf16 (CLAUDE.md) — this stays on gather/VPU.
    Communication: one B-row psum (~2.6 MB at b32) per step over ICI.
    """
    dp = mesh.axis_names[0]

    def local(res, idx):
        shard_n = res.shape[0]  # static: local shard row count
        lo = jax.lax.axis_index(dp) * shard_n
        rel = idx - lo
        inb = (rel >= 0) & (rel < shard_n)
        rows = jnp.take(res, jnp.clip(rel, 0, shard_n - 1), axis=0)
        mask = inb.reshape(inb.shape + (1,) * (rows.ndim - 1))
        return jax.lax.psum(jnp.where(mask, rows, 0.0), dp)

    def gather(res, idx):
        return jax.shard_map(
            local, mesh=mesh, in_specs=(P(dp), P()), out_specs=P(),
            check_vma=False,  # psum output is replicated by construction
        )(res, idx)

    return gather


def _precompute_pyramids(gts_dev: jax.Array, n1: int, n2: int, chunk: int = 64):
    """FPS pyramids (N, n1, 3) / (N, n2, 3) for a device-resident GT set.

    One-time startup cost (~1.3 s for 4096 samples at the measured 10 ms per
    64-row FPS pair); chunked so the kernel shapes match the training batch
    scale and the transient state stays small."""
    n = gts_dev.shape[0]
    g1s, g2s = [], []
    for s in range(0, n, chunk):
        g = gts_dev[s : s + chunk]
        if g.shape[0] < chunk:
            # pad the ragged tail to the chunk shape (FPS is per-row; the
            # pad rows are sliced off below) — a second compiled shape would
            # cost a new multi-minute relay compile (CLAUDE.md)
            g = jnp.pad(g, ((0, chunk - g.shape[0]), (0, 0), (0, 0)))
        g1s.append(gather_point(g, farthest_point_sample(n1, g)))
        g2s.append(gather_point(g, farthest_point_sample(n2, g)))
    return (
        jnp.concatenate(g1s, axis=0)[:n],
        jnp.concatenate(g2s, axis=0)[:n],
    )


def train(config: TrainConfig, train_df, valid_df, valid_num: int, use_mesh=False,
          preload_device=False, synthetic_online=False):
    import orbax.checkpoint as ocp

    mesh = make_mesh() if use_mesh else None
    state = create_state(config)
    mgr, best_mgr = _ckpt_managers(config)
    state = restore_if_available(mgr, state)
    jstep, jeval = make_jitted_steps(config, mesh)

    os.makedirs("logs", exist_ok=True)
    metrics_path = os.path.join("logs", "metrics.jsonl")
    tb = _tb_writer("logs")
    # preload mode drives batches from the index stream directly — don't
    # spin up the host prefetch worker just to park on a full queue
    train_gen = None if (preload_device or synthetic_online) else iter(train_df)
    valid_iter = iter(valid_df)
    # local tiling divisor: a process's eval rows must split over ITS devices
    # (multi-host: mesh.size spans all hosts, each host feeds its own shard)
    n_devices = mesh.size // jax.process_count() if mesh is not None else 1
    is_lead = jax.process_index() == 0
    # best-by-CD survives restarts: without this a resumed run's first eval
    # overwrites a better earlier record (observed: a 7500-step cd 0.031
    # clobbered the 2500-step cd 0.016 best after a resume)
    best_meta_path = os.path.join(config.workdir, "..", "bestrecord", "best.json")
    best_cd = float("inf")
    try:
        with open(best_meta_path) as f:
            best_cd = float(json.load(f)["cd"])
        print(f"best-so-far cd {best_cd:.6f} (from {best_meta_path})")
    except Exception:
        pass
    t_last = time.perf_counter()
    start = int(state.step)

    if mesh is not None:
        # global-array assembly from this process's batch shard: identical to
        # device_put(x, sharding) single-process, required multi-host
        to_dev = lambda x: shard_batch(x, mesh)  # noqa: E731
    else:
        to_dev = jax.device_put

    if synthetic_online:
        # infinite on-device data (data/online.py): no host->device bytes,
        # no finite set to overfit — the training-stability capability proof.
        # Generation is FUSED into the train-step program (the key fold and
        # blob synthesis trace into the same XLA computation), so each step
        # is ONE dispatch — on the relay every dispatch blocks the host
        # ~4 ms, and the separate generator dispatch measured at that cost.
        # The stream is a pure function of (seed, step): bit-identical to
        # data/online.batch_stream and stable across resumes. Under a mesh
        # the generated batch is dp-sharded via a sharding constraint inside
        # the SAME jitted program — GSPMD partitions the per-row generation
        # and the gradient all-reduce like the streamed mesh path; no host
        # bytes move regardless of process count, so this composes with
        # multi-host too (each process runs the identical program).
        from rfnet_tpu.data.online import synthetic_batch

        base_key = jax.random.PRNGKey(config.seed)
        n1 = 2 * config.n_seed
        n2 = n1 * config.up_ratio
        data_shd = data_sharding(mesh) if mesh is not None else None

        def online_step(state):
            # key the fold on the DEVICE-RESIDENT state.step (== the loop
            # index at every iteration, including across resumes): zero
            # per-step host→device traffic — on the relay even a scalar
            # device_put blocks the host for a round trip — and no host
            # iterator to exhaust when a restored checkpoint is already past
            # --steps (the loop then simply runs zero iterations)
            partial, gt = synthetic_batch(
                jax.random.fold_in(base_key, state.step),
                config.batch_size, config.innum, config.ptnum,
            )
            if data_shd is not None:
                partial = jax.lax.with_sharding_constraint(partial, data_shd)
                gt = jax.lax.with_sharding_constraint(gt, data_shd)
            return train_step(
                state, partial, gt, n1=n1, n2=n2,
                schedule_scale=config.schedule_scale,
            )

        if mesh is None:
            jstep = jax.jit(online_step, donate_argnums=0)
        else:
            repl = replicated(mesh)
            jstep = jax.jit(
                online_step, in_shardings=(repl,),
                out_shardings=(repl, repl, repl), donate_argnums=0,
            )
        fetch = tuple  # staged is always the (empty) extra-args tuple
        staged = fetch()
        stage_stop = None
    elif preload_device:
        if jax.process_count() > 1:
            # each process's dataflow holds a DISJOINT 1/P shard and its own
            # index stream — the global epoch permutation the single-host
            # path replays does not decompose; use --synthetic_online (fully
            # in-jit) for multi-host fast-path runs
            raise ValueError("--preload_device is single-host (any mesh size); "
                             "multi-host fast path is --synthetic_online")
        partials_dev, gts_dev, index_iter = preload_device_data(
            train_df, config, mesh
        )
        # FPS pyramids once for the whole resident set (deterministic per
        # row ⇒ bit-identical to the on-step recompute, train_step_pyr),
        # then each batch gathers its 4 arrays — saves the ~10 ms/step FPS
        n1 = 2 * config.n_seed
        n2 = n1 * config.up_ratio
        if mesh is None:
            gt1_dev, gt2_dev = _precompute_pyramids(gts_dev, n1, n2)
            jstep = jax.jit(
                functools.partial(
                    train_step_pyr, schedule_scale=config.schedule_scale
                ),
                donate_argnums=0,
            )

            @jax.jit
            def gather_batch(parts, gts, g1, g2, idx):
                take = functools.partial(jnp.take, indices=idx, axis=0)
                return take(parts), take(gts), take(g1), take(g2)

            to_idx = jnp.asarray
        else:
            # pyramids per shard (FPS is per-row; _precompute_pyramids is
            # pure jnp, so it traces inside shard_map) — stays sharded like
            # the resident set it derives from
            dp = mesh.axis_names[0]
            gt1_dev, gt2_dev = jax.jit(
                jax.shard_map(
                    functools.partial(_precompute_pyramids, n1=n1, n2=n2),
                    mesh=mesh, in_specs=P(dp), out_specs=(P(dp), P(dp)),
                    # FPS's scan carry starts from unvarying constants; vma
                    # tracking would demand pcasts inside ops/fps for what
                    # is plainly per-row local work
                    check_vma=False,
                )
            )(gts_dev)
            repl = replicated(mesh)
            data_shd = data_sharding(mesh)
            jstep = jax.jit(
                functools.partial(
                    train_step_pyr, schedule_scale=config.schedule_scale
                ),
                in_shardings=(repl, data_shd, data_shd, data_shd, data_shd),
                out_shardings=(repl, repl, repl),
                donate_argnums=0,
            )
            mesh_gather = _make_resident_gather(mesh)

            @functools.partial(
                jax.jit, out_shardings=(data_shd, data_shd, data_shd, data_shd)
            )
            def gather_batch(parts, gts, g1, g2, idx):
                take = functools.partial(mesh_gather, idx=idx)
                return take(parts), take(gts), take(g1), take(g2)

            to_idx = functools.partial(jax.device_put, device=repl)

        def fetch():
            idx = np.fromiter(
                (next(index_iter) for _ in range(config.batch_size)),
                dtype=np.int32, count=config.batch_size,
            )
            return gather_batch(
                partials_dev, gts_dev, gt1_dev, gt2_dev, to_idx(idx)
            )

        staged = fetch()
        stage_stop = None  # no staging thread in this mode
    else:
        # Host→device staging runs in its OWN thread with a depth-2 queue:
        # on this machine device_put BLOCKS the calling thread for the full
        # relay transfer (~6.3 MB/step at 10-40 MB/s — the dominant
        # host-side cost), so doing it on the main thread serializes
        # transfer with everything else. The stager releases the GIL inside
        # the C++ transfer, letting the main loop dispatch/log concurrently;
        # batch order and values are untouched (bit-exact with the inline
        # path).
        import queue as _queue
        import threading as _threading

        stage_q: "_queue.Queue" = _queue.Queue(maxsize=2)
        stage_stop = _threading.Event()

        def _stager():
            try:
                for item in train_gen:
                    _, batch_point, _, output_point = item
                    staged_item = (
                        to_dev(np.asarray(batch_point)),
                        to_dev(np.asarray(output_point)),
                    )
                    while not stage_stop.is_set():
                        try:
                            stage_q.put(staged_item, timeout=0.5)
                            break
                        except _queue.Full:
                            continue
                    if stage_stop.is_set():
                        return
            except BaseException as exc:  # surface loader/transfer failures
                # stop-aware put: if the consumer already died with the queue
                # full, an unconditional put would pin this thread forever
                while not stage_stop.is_set():
                    try:
                        stage_q.put(exc, timeout=0.5)
                        break
                    except _queue.Full:
                        continue

        _threading.Thread(
            target=_stager, daemon=True, name="rfnet-stager"
        ).start()

        def fetch():
            item = stage_q.get()
            if isinstance(item, BaseException):
                raise item
            return item

        staged = fetch()
    inflight: "collections.deque" = collections.deque()
    # the staging thread (host mode) must be stopped on EVERY exit
    # path: an exception escaping the loop (--debug_nans, loader
    # failure, KeyboardInterrupt) would otherwise leak a daemon
    # thread spinning on its put-retry with ~2 staged device batches
    try:
        for i in range(start, config.iters):
            # staged is (partial, gt) — or (partial, gt, gt1, gt2) in preload
            # mode, where the FPS pyramids were precomputed over the resident set
            state, lb, diag = jstep(state, *staged)
            staged = fetch()
            # Bound the async dispatch depth: without this the host can race
            # hundreds of steps ahead of the device, pinning every staged batch
            # (observed: ~30 GB RSS and a progressively degrading step rate).
            # The sync is amortized — ONE scalar readback per 16 steps, from 64
            # steps in the past — because on this platform every readback is a
            # full relay round trip (a per-step float() measured 3× slower than
            # free-running).
            if i % 16 == 0:
                inflight.append(lb.total)
                if len(inflight) > 4:
                    float(inflight.popleft())
            if (i + 1) % config.log_every == 0:
                lb_host = jax.tree_util.tree_map(float, lb)
                now = time.perf_counter()
                rate = config.log_every * config.batch_size / (now - t_last)
                t_last = now
                print(
                    f"batch {i}  loss {lb_host.total:.6f}  cd {lb_host.cd3 + lb_host.cd4:.6f}"
                    f"  emd64 {lb_host.cd1_emd:.6f}  emd1024 {lb_host.cd2_emd:.6f}"
                    f"  decfac {lb_host.loss_dec:.6f}  {rate:.1f} clouds/s"
                )
                print(
                    "max of code1 first: %f  nonzero:%d | code2 max %f nz %d | code3 max %f nz %d"
                    % (
                        float(diag["code1_max"]), int(diag["code1_nonzero"]),
                        float(diag["code2_max"]), int(diag["code2_nonzero"]),
                        float(diag["code3_max"]), int(diag["code3_nonzero"]),
                    )
                )
                if is_lead:
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps({"step": i, **lb_host._asdict()}) + "\n")
                if tb is not None and is_lead:
                    with tb.as_default(step=i):
                        import tensorflow as tf  # noqa: PLC0415

                        for k, v in lb_host._asdict().items():
                            tf.summary.scalar(f"loss/{k}", v)
                        tf.summary.scalar("throughput/clouds_per_sec", rate)
                        if config.tb_histograms:
                            # per-weight/bias histograms at the same 500-step
                            # cadence the reference merges its
                            # tf.summary.histogram calls
                            # (vv_recon.py:36,42,432-434)
                            for path, leaf in jax.tree_util.tree_flatten_with_path(
                                state.params
                            )[0]:
                                name = jax.tree_util.keystr(path).strip(
                                    "[]"
                                ).replace("']['", "/").strip("'")
                                tf.summary.histogram(name, np.asarray(leaf))
            if (i + 1) % config.ckpt_every == 0:
                mgr.save(i + 1, args=ocp.args.StandardSave(state))
                mgr.wait_until_finished()
                mean_cd, mean_emd = evaluate(
                    jeval, state, valid_iter, valid_num, config, n_devices, to_dev
                )
                print(f"eval @ {i + 1}: mean cd {mean_cd:.6f} mean emd {mean_emd:.6f}")
                if is_lead:  # machine-readable eval curve alongside the scalars
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps(
                            {"step": i + 1, "eval_cd": mean_cd, "eval_emd": mean_emd}
                        ) + "\n")
                # multi-host: mean_cd is computed from replicated jeval outputs
                # over per-process eval shards — identical on every process, so
                # the save decision agrees and the orbax save stays collective
                if mean_cd < best_cd:
                    best_cd = mean_cd
                    best_mgr.save(i + 1, args=ocp.args.StandardSave(state))
                    best_mgr.wait_until_finished()
                    if is_lead:
                        with open(best_meta_path, "w") as f:
                            json.dump({"step": i + 1, "cd": best_cd}, f)
                    print("record bestsofar:", mean_emd, mean_cd)
    finally:
        if stage_stop is not None:
            stage_stop.set()
    jax.block_until_ready(state.params)
    print(f"trained {int(state.step) - start} steps (now at step {int(state.step)})")
    return state


def _tb_writer(logdir: str):
    """TensorBoard scalar writer — same cadence and scalar set the reference
    logs via tf.summary (`vv_recon.py:432-444,516-517`); optional (needs TF)."""
    try:
        import tensorflow as tf  # noqa: PLC0415

        return tf.summary.create_file_writer(logdir)
    except Exception:
        return None


def _tile_for_devices(arr: np.ndarray, n_devices: int) -> np.ndarray:
    """Repeat the batch k times so it dp-shards over n_devices.

    Every row appears exactly k times, so any per-batch MEAN metric is
    unchanged — this keeps eval batches (default 4) shardable over larger
    meshes (e.g. 8 devices) with exact metric parity.
    """
    b = arr.shape[0]
    if n_devices <= 1 or b % n_devices == 0:
        return arr
    import math

    k = n_devices // math.gcd(b, n_devices)
    return np.tile(arr, (k,) + (1,) * (arr.ndim - 1))


def evaluate(jeval, state, valid_iter, valid_num: int, config: TrainConfig,
             n_devices: int = 1, to_dev=jnp.asarray):
    """valid_iter is a persistent iterator (one prefetch thread for the whole
    run, not one per eval). `to_dev` places a host array on the mesh —
    multi-host it assembles the global eval batch from per-process shards."""
    cds, emds = [], []
    for _ in range(max(1, valid_num // config.eval_size)):
        _, batch_point, _, output_point = next(valid_iter)
        partial = _tile_for_devices(np.asarray(batch_point), n_devices)
        gt = _tile_for_devices(np.asarray(output_point), n_devices)
        cd, emd = jeval(state, to_dev(partial), to_dev(gt))
        cds.append(float(cd))
        emds.append(float(emd))
    return float(np.mean(cds)), float(np.mean(emds))


def main(argv=None):
    p = argparse.ArgumentParser(description="RFNet-TPU training")
    p.add_argument("--train_path", default="../../dense_data/train.lmdb")
    p.add_argument("--val_path", default="../../dense_data/valid.lmdb")
    p.add_argument("--synthetic", action="store_true", help="train on synthetic clouds")
    p.add_argument("--synthetic_size", type=int, default=256)
    p.add_argument(
        "--synthetic_val_size", type=int, default=None,
        help="HELD-OUT synthetic validation set of this many samples "
        "(disjoint generator seed); default = the legacy in-sample 8",
    )
    p.add_argument(
        "--synthetic_online", action="store_true",
        help="infinite on-device synthetic stream (data/online.py): batches "
        "are generated inside jit from a step-indexed key fold — no "
        "host->device transfer, no finite set to overfit; eval uses the "
        "held-out seed-1234 synthetic set; composes with --mesh and "
        "--distributed (generation dp-shards inside the step program)",
    )
    p.add_argument(
        "--preload_device", action="store_true",
        help="upload the whole training set to device HBM once and gather "
        "batches on-device (removes the per-step host->device copy; "
        "requires partials >= innum points, e.g. --synthetic); composes "
        "with --mesh (resident set sharded over the mesh, psum-gather "
        "batches); single-host only",
    )
    p.add_argument(
        "--schedule_scale", type=float, default=None,
        help="compress the LR/α₁ boundary schedule by this factor "
        "(0.1 → reference boundaries ÷10 for a 30k-step run)",
    )
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--ckpt_every", type=int, default=None)
    p.add_argument(
        "--innum", type=int, default=None,
        help="partial-cloud size (reference: 3000). Override together with "
        "--ptnum/--n_seed/--up_ratio for reduced-shape dress rehearsals",
    )
    p.add_argument("--ptnum", type=int, default=None,
                   help="dense output size; must equal 2*n_seed*up_ratio^2")
    p.add_argument("--n_seed", type=int, default=None,
                   help="coarse seed half-count (reference: 32)")
    p.add_argument("--up_ratio", type=int, default=None,
                   help="per-stage upsampling factor (reference: 16)")
    p.add_argument("--workdir", default="./modelvv_recon")
    p.add_argument("--mesh", action="store_true", help="data-parallel over all devices")
    p.add_argument(
        "--distributed", action="store_true",
        help="multi-host: jax.distributed.initialize() before device queries "
        "(also triggered by JAX_COORDINATOR_ADDRESS / RFNET_DISTRIBUTED=1); "
        "implies --mesh",
    )
    p.add_argument(
        "--tb_histograms", action="store_true",
        help="also write per-weight TensorBoard histograms every log step "
        "(reference parity, vv_recon.py:36,42) — reads every param back to "
        "host per log; off by default on relay-attached hosts",
    )
    p.add_argument("--profile_dir", default=None, help="write a jax profiler trace here")
    p.add_argument(
        "--debug_nans", action="store_true",
        help="fail fast on any NaN (the TPU answer to CUDA sanitizers)",
    )
    args = p.parse_args(argv)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    if args.distributed:
        os.environ.setdefault("RFNET_DISTRIBUTED", "1")
        args.mesh = True
    if maybe_initialize_distributed():
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
            f" ({jax.local_device_count()} local / {jax.device_count()} global devices)"
        )

    config = TrainConfig(workdir=args.workdir)
    for field in ("innum", "ptnum", "n_seed", "up_ratio"):
        if getattr(args, field) is not None:
            config = dataclasses.replace(config, **{field: getattr(args, field)})
    if config.ptnum != 2 * config.n_seed * config.up_ratio**2:
        p.error(
            f"--ptnum {config.ptnum} inconsistent with the 3-step pyramid: "
            f"2*n_seed*up_ratio^2 = {2 * config.n_seed * config.up_ratio**2}"
        )
    if args.steps:
        config = dataclasses.replace(config, iters=args.steps)
    if args.batch_size:
        config = dataclasses.replace(config, batch_size=args.batch_size)
    if args.ckpt_every:
        config = dataclasses.replace(config, ckpt_every=args.ckpt_every)
    if args.schedule_scale is not None:  # `if x:` would drop an explicit 0.0
        if args.schedule_scale <= 0:
            p.error("--schedule_scale must be > 0")
        config = dataclasses.replace(config, schedule_scale=args.schedule_scale)
    if args.tb_histograms:
        config = dataclasses.replace(config, tb_histograms=True)

    # per-host input pipeline: each process loads a DISJOINT 1/num_shards of
    # the data at 1/num_shards of the global batch size; shard_batch glues
    # the local batches into the global dp-sharded array (SURVEY §5: the
    # Grain-worker role of the reference's ZMQ fan-out). Single-process this
    # is shard 0-of-1 — the exact previous behaviour.
    pc, pi = jax.process_count(), jax.process_index()
    if config.batch_size % pc or config.eval_size % pc:
        raise ValueError(
            f"batch_size {config.batch_size} / eval_size {config.eval_size} "
            f"must divide by process_count {pc}"
        )
    shard_kw = dict(shard_id=pi, num_shards=pc)
    local_bs = config.batch_size // pc
    local_eval = config.eval_size // pc

    if args.synthetic_online:
        from rfnet_tpu.data.dataset import synthetic_dataflow

        train_df = None  # batches come from the on-device stream
        val_n = args.synthetic_val_size or 64
        valid_df, valid_num = synthetic_dataflow(
            val_n, local_eval, config.innum, config.ptnum,
            is_training=False, seed=1234, **shard_kw,
        )
    elif args.synthetic:
        from rfnet_tpu.data.dataset import synthetic_dataflow

        train_df, _ = synthetic_dataflow(
            args.synthetic_size, local_bs, config.innum, config.ptnum, **shard_kw
        )
        # held-out split: a DISJOINT generator seed, so eval measures
        # generalisation instead of training-set recall
        val_n = args.synthetic_val_size or max(8, config.eval_size)
        val_seed = 1234 if args.synthetic_val_size else 0
        valid_df, valid_num = synthetic_dataflow(
            val_n, local_eval, config.innum, config.ptnum,
            is_training=False, seed=val_seed, **shard_kw,
        )
    else:
        from rfnet_tpu.data.dataset import lmdb_dataflow

        train_df, _ = lmdb_dataflow(
            args.train_path, local_bs, config.innum, config.ptnum, True, **shard_kw
        )
        valid_df, valid_num = lmdb_dataflow(
            args.val_path, local_eval, config.innum, config.ptnum, False, **shard_kw
        )

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    try:
        train(config, train_df, valid_df, valid_num, use_mesh=args.mesh,
              preload_device=args.preload_device,
              synthetic_online=args.synthetic_online)
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
