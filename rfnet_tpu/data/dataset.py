"""Host data pipeline.

TPU-native replacement for the reference's lmdb/tensorpack dataflow
(`data_util.py:73-87`): a dependency-light generator pipeline with the same
stages — source → local shuffle (buffer 2000) → resample-to-fixed-size →
batch → background prefetch — plus per-host sharding for data-parallel
training (the role the reference's PrefetchDataZMQ 8-process fan-out played
is taken by a prefetch thread + per-host shard split; TPU input pipelines are
per-host by construction).

Batch contract matches ``BatchData._aggregate_batch`` (`data_util.py:56-70`):
``(ids, inputs (b, input_size, 3) f32, npts = input_size, gts (b, gt_size, 3)
f32)``.

Sources:
  * ``lmdb_dataflow`` — reads tensorpack ``LMDBSerializer`` databases
    directly with lmdb+msgpack (no tensorpack needed); gated on the lmdb
    module being installed.
  * ``dir_source`` — a directory of ``.npz`` files with ``partial``/``gt``
    arrays (this framework's native format; an lmdb→npz converter lives in
    ``rfnet_tpu.data.convert``).
  * ``synthetic_pairs`` — deterministic random clouds for tests and benches.
"""

from __future__ import annotations

import os
import queue as queue_mod
import threading
from collections.abc import Iterator

import numpy as np


def resample_pcd(pcd: np.ndarray, n: int, rng: np.random.RandomState | None = None):
    """Drop or duplicate points so pcd has exactly n points.

    Parity with `data_util.py:8-13`: truncation keeps the FIRST n points in
    file order; padding appends uniformly random duplicates.
    """
    if pcd.shape[0] == n:
        # identity (keep-first-n of an exactly-n cloud): skip the fancy-index
        # copy — 32 such copies of a (16384,3) gt per batch are a measurable
        # slice of the 1-core host pipeline budget. No RNG is consumed on
        # this path in the reference either (padding only).
        return pcd
    idx = np.arange(pcd.shape[0])
    if idx.shape[0] < n:
        r = rng if rng is not None else np.random
        idx = np.concatenate([idx, r.randint(pcd.shape[0], size=n - pcd.shape[0])])
    return pcd[idx[:n]]


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------


def synthetic_pairs(
    num: int, input_size: int = 3000, gt_size: int = 16384, seed: int = 0
) -> Iterator[tuple[str, np.ndarray, np.ndarray]]:
    """Deterministic random (id, partial, gt) triples.

    The gt is a structured random surface (mixture of gaussian blobs) and the
    partial is a crop of it — shaped like the real task so overfit tests are
    meaningful.
    """
    rng = np.random.RandomState(seed)
    for i in range(num):
        centers = rng.randn(8, 3).astype(np.float32) * 0.3
        which = rng.randint(0, 8, size=gt_size)
        gt = centers[which] + 0.08 * rng.randn(gt_size, 3).astype(np.float32)
        # partial = points on one side of a random plane (a synthetic "view")
        normal = rng.randn(3).astype(np.float32)
        side = (gt @ normal) > np.median(gt @ normal)
        part = gt[side]
        part = resample_pcd(part, input_size, rng)
        yield f"synthetic/{i:06d}", part.astype(np.float32), gt.astype(np.float32)


def dir_source(path: str) -> tuple[list[str], "callable"]:
    """A directory of .npz files, each with `partial` and `gt` arrays.
    Returns (ids, load_fn)."""
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".npz")
    )
    ids = [os.path.splitext(f)[0] for f in files]

    def load(i: int):
        with np.load(os.path.join(path, files[i])) as z:
            return ids[i], z["partial"], z["gt"]

    return ids, load


def _decode_msgpack_array(obj):
    """Decode one msgpack-numpy-encoded object to an ndarray.

    tensorpack's LMDBSerializer (`data_util.py:73-87` reads its output)
    serialises datapoints with msgpack + the msgpack_numpy extension, which
    wraps each ndarray as ``{b'nd': True, b'type': dtype_str,
    b'shape': [...], b'data': bytes}``. Decoding that layout directly keeps
    this a pure, fixture-testable function with no msgpack_numpy dependency.
    Non-array objects pass through unchanged.
    """
    if isinstance(obj, dict):
        for nd_key, type_key, shape_key, data_key in (
            (b"nd", b"type", b"shape", b"data"),
            ("nd", "type", "shape", "data"),
        ):
            if obj.get(nd_key) is True and data_key in obj:
                return np.frombuffer(
                    obj[data_key], dtype=np.dtype(obj[type_key])
                ).reshape(obj[shape_key])
    return obj


def decode_datapoint(raw: bytes):
    """Decode one LMDBSerializer value: a msgpack list ``[id, partial, gt]``
    with msgpack-numpy arrays. Returns (id str, partial (p,3), gt (g,3))."""
    import msgpack  # noqa: PLC0415

    dp = msgpack.unpackb(raw, raw=False, strict_map_key=False)
    dp = [_decode_msgpack_array(x) for x in dp]
    ident = dp[0]
    if isinstance(ident, bytes):
        ident = ident.decode("utf-8")
    return ident, np.asarray(dp[1]), np.asarray(dp[2])


def decode_key_list(keys_raw: bytes | None, cursor_keys=None):
    """LMDBSerializer key handling: the ordered datapoint key list is
    msgpack'd under ``b'__keys__'``; when absent, fall back to cursor order
    with the meta key excluded."""
    if keys_raw is not None:
        import msgpack  # noqa: PLC0415

        return list(msgpack.unpackb(keys_raw, raw=False, strict_map_key=False))
    return [k for k in (cursor_keys or []) if k != b"__keys__"]


def _lmdb_items(lmdb_path: str):
    """Iterate a tensorpack LMDBSerializer database.

    Prefers the C ``lmdb`` package when installed; otherwise falls back to
    :mod:`rfnet_tpu.data.lmdb_pure`, a pure-Python implementation of the
    LMDB on-disk format — so this path executes for real even where the C
    package cannot be installed (this environment)."""
    try:
        import lmdb  # noqa: PLC0415
    except ImportError:
        from rfnet_tpu.data import lmdb_pure as lmdb  # noqa: PLC0415
    env = lmdb.open(
        lmdb_path, subdir=os.path.isdir(lmdb_path), readonly=True, lock=False
    )
    with env.begin() as txn:
        keys = decode_key_list(
            txn.get(b"__keys__"), (k for k, _ in txn.cursor())
        )
        size = len(keys)

    def load(i: int):
        key = keys[i]
        if isinstance(key, str):
            key = key.encode("utf-8")
        with env.begin() as txn:
            return decode_datapoint(txn.get(key))

    return size, load


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


class BatchedDataflow:
    """shuffle-buffer → per-host shard → resample → batch → prefetch thread."""

    def __init__(
        self,
        size: int,
        load_fn,
        batch_size: int,
        input_size: int,
        gt_size: int,
        is_training: bool = True,
        shuffle_buffer: int = 2000,
        seed: int = 1,
        shard_id: int = 0,
        num_shards: int = 1,
        prefetch: int = 8,
    ):
        self.size = size
        self._load = load_fn
        self.batch_size = batch_size
        self.input_size = input_size
        self.gt_size = gt_size
        self.is_training = is_training
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch

    def _index_stream(self):
        # infinite epochs in both modes (RepeatedData(-1), data_util.py:83)
        rng = np.random.RandomState(self.seed)
        while True:
            order = np.arange(self.size)
            if self.is_training:
                # the reference uses a 2000-item local shuffle buffer; a full
                # per-epoch permutation is at least as random and reproducible
                rng.shuffle(order)
            yield from order[self.shard_id :: self.num_shards]

    def _batches(self):
        rng = np.random.RandomState(self.seed + 997 * self.shard_id)
        holder = []
        for i in self._index_stream():
            holder.append(self._load(int(i)))
            if len(holder) == self.batch_size:
                yield self._aggregate(holder, rng)
                holder = []

    def _aggregate(self, holder, rng):
        ids = np.stack([x[0] for x in holder])
        inputs = np.stack(
            [resample_pcd(x[1], self.input_size, rng) for x in holder]
        ).astype(np.float32)
        gts = np.stack(
            [resample_pcd(x[2], self.gt_size, rng) for x in holder]
        ).astype(np.float32)
        return ids, inputs, self.input_size, gts

    def __iter__(self):
        """Background-thread prefetch (the PrefetchDataZMQ role)."""
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checking_stop(item) -> bool:
            # Never block indefinitely in `put`: an abandoned iterator (e.g. a
            # fresh eval iterator per checkpoint) sets `stop` and walks away,
            # and a worker parked in a full queue's `put` would leak the
            # thread plus `prefetch` buffered batches forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            try:
                for item in self._batches():
                    if not put_checking_stop(item):
                        return
            finally:
                put_checking_stop(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def get_data(self):  # tensorpack-compatible spelling (data_util.py:422)
        return iter(self)


def lmdb_dataflow(
    lmdb_path: str,
    batch_size: int,
    input_size: int,
    output_size: int,
    is_training: bool,
    **kw,
):
    """Reference-compatible entry (`data_util.py:73-87`): returns (df, size)."""
    size, load = _lmdb_items(lmdb_path)
    df = BatchedDataflow(
        size, load, batch_size, input_size, output_size, is_training, **kw
    )
    return df, size


def synthetic_dataflow(
    num: int, batch_size: int, input_size: int, output_size: int,
    is_training: bool = True, seed: int = 0, **kw,
):
    items = list(synthetic_pairs(num, input_size * 2, output_size, seed))

    def load(i: int):
        return items[i]

    df = BatchedDataflow(
        num, load, batch_size, input_size, output_size, is_training, **kw
    )
    return df, num
