"""Dataset conversion: PCN lmdb → .npz directory (this framework's native
storage) and .pcd directory → .npz.

The lmdb path needs the `lmdb` package (see dataset._lmdb_items). The npz
format stores `partial` and `gt` float32 arrays per model, named
`<synset>__<model>.npz` (the '/' of PCN ids is encoded as '__').

Usage:
    python -m rfnet_tpu.data.convert lmdb  train.lmdb out_dir/
    python -m rfnet_tpu.data.convert pcds  list.txt data_dir/ out_dir/
"""

from __future__ import annotations

import os
import sys

import numpy as np


def convert_lmdb(lmdb_path: str, out_dir: str) -> int:
    from rfnet_tpu.data.dataset import _lmdb_items

    size, load = _lmdb_items(lmdb_path)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(size):
        mid, partial, gt = load(i)
        name = str(mid).replace("/", "__")
        np.savez_compressed(
            os.path.join(out_dir, f"{name}.npz"),
            partial=np.asarray(partial, np.float32),
            gt=np.asarray(gt, np.float32),
        )
    return size


def convert_pcds(list_path: str, data_dir: str, out_dir: str) -> int:
    from rfnet_tpu.data.pcd_io import read_pcd

    os.makedirs(out_dir, exist_ok=True)
    with open(list_path) as f:
        ids = f.read().splitlines()
    for mid in ids:
        partial = read_pcd(os.path.join(data_dir, "partial", f"{mid}.pcd"))
        gt = read_pcd(os.path.join(data_dir, "complete", f"{mid}.pcd"))
        np.savez_compressed(
            os.path.join(out_dir, mid.replace("/", "__") + ".npz"),
            partial=partial.astype(np.float32),
            gt=gt.astype(np.float32),
        )
    return len(ids)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    if argv[0] == "lmdb":
        n = convert_lmdb(argv[1], argv[2])
    elif argv[0] == "pcds":
        n = convert_pcds(argv[1], argv[2], argv[3])
    else:
        print(__doc__)
        return 1
    print(f"converted {n} models")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
