"""Native C++ PCD codec vs the pure-python parser."""

import os
import struct

import numpy as np
import pytest

from rfnet_tpu.data.native import get_lib, read_pcd_native
from rfnet_tpu.data.pcd_io import _read_pcd_py, read_pcd, save_pcd

needs_native = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


@needs_native
def test_native_matches_python_ascii(tmp_path, rng):
    pts = rng.rand(200, 3).astype(np.float32)
    p = os.path.join(tmp_path, "a.pcd")
    save_pcd(p, pts)
    nat = read_pcd_native(p)
    py = _read_pcd_py(p)
    np.testing.assert_allclose(nat, py, rtol=1e-6)
    np.testing.assert_allclose(read_pcd(p), pts, rtol=1e-5, atol=1e-6)


@needs_native
def test_native_binary_with_extra_fields(tmp_path, rng):
    """Binary PCD with an extra non-xyz field interleaved (like PCN rgb)."""
    n = 57
    pts = rng.rand(n, 3).astype(np.float32)
    extra = rng.rand(n).astype(np.float32)
    p = os.path.join(tmp_path, "b.pcd")
    header = (
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
        f"COUNT 1 1 1 1\nWIDTH {n}\nHEIGHT 1\nPOINTS {n}\nDATA binary\n"
    )
    with open(p, "wb") as f:
        f.write(header.encode())
        for i in range(n):
            f.write(struct.pack("<ffff", pts[i, 0], pts[i, 1], pts[i, 2], extra[i]))
    nat = read_pcd_native(p)
    np.testing.assert_allclose(nat, pts, rtol=1e-6)
    py = _read_pcd_py(p)
    np.testing.assert_allclose(py, pts, rtol=1e-6)


@needs_native
def test_native_rejects_garbage(tmp_path):
    p = os.path.join(tmp_path, "junk.pcd")
    with open(p, "wb") as f:
        f.write(b"not a pcd file at all\n")
    assert read_pcd_native(p) is None
