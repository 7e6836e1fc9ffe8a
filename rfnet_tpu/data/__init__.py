from rfnet_tpu.data.dataset import (
    BatchedDataflow,
    lmdb_dataflow,
    resample_pcd,
    synthetic_pairs,
)
from rfnet_tpu.data.pcd_io import read_pcd, save_pcd

__all__ = [
    "BatchedDataflow",
    "lmdb_dataflow",
    "resample_pcd",
    "synthetic_pairs",
    "read_pcd",
    "save_pcd",
]
