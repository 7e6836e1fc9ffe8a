"""Matplotlib point-cloud renders — the `visu_util.py` capability.

`plot_pcd_three_views` reproduces the reference contract
(`visu_util.py:34-67`): for each cloud in `pcds`, render 3 azimuths
(-30/30/90 elevation 30) into one figure saved at `filename`.
"""

from __future__ import annotations

import os

import numpy as np


def plot_pcd_three_views(
    filename: str,
    pcds,
    titles,
    suptitle: str = "",
    sizes=None,
    cmap: str = "Reds",
    zdir: str = "y",
    xlim=(-0.3, 0.3),
    ylim=(-0.3, 0.3),
    zlim=(-0.3, 0.3),
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if sizes is None:
        sizes = [0.5 for _ in pcds]
    fig = plt.figure(figsize=(len(pcds) * 3, 9))
    elev = 30
    for i, (azim_idx, azim) in enumerate([(0, -30), (1, 30), (2, 90)]):
        for j, (pcd, size) in enumerate(zip(pcds, sizes)):
            pcd = np.asarray(pcd)
            color = pcd[:, 0]
            ax = fig.add_subplot(
                3, len(pcds), i * len(pcds) + j + 1, projection="3d"
            )
            ax.view_init(elev, azim)
            ax.scatter(
                pcd[:, 0], pcd[:, 1], pcd[:, 2], zdir=zdir, c=color, s=size,
                cmap=cmap, vmin=-1, vmax=0.5,
            )
            ax.set_title(titles[j])
            ax.set_axis_off()
            ax.set_xlim(xlim)
            ax.set_ylim(ylim)
            ax.set_zlim(zlim)
    plt.subplots_adjust(left=0.05, right=0.95, bottom=0.05, top=0.9, wspace=0.1, hspace=0.1)
    plt.suptitle(suptitle)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename)
    plt.close(fig)


def render_balls(
    points: np.ndarray,
    image_size: int = 512,
    radius: int = 3,
    colors: np.ndarray | None = None,
    background: int = 0,
) -> np.ndarray:
    """Z-buffered point-sprite render (capability parity with the reference's
    `render_balls_so.cpp`). Returns an (H, W, 3) uint8 image.

    Uses the native C++ rasteriser when buildable, else a numpy z-buffer.
    """
    pts = np.asarray(points, np.float64)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    scale = (image_size * 0.8) / max(float((hi - lo).max()), 1e-9)
    xy = ((pts[:, :2] - lo[:2]) * scale + image_size * 0.1).astype(np.int32)
    z = ((pts[:, 2] - lo[2]) * scale * 1000).astype(np.int32)
    if colors is None:
        t = (pts[:, 0] - lo[0]) / max(float(hi[0] - lo[0]), 1e-9)
        colors = np.stack([255 * t, 80 + 0 * t, 255 * (1 - t)], axis=1)
    colors = np.asarray(colors, np.int32)
    img = np.full((image_size, image_size, 3), background, np.uint8)

    lib = _render_lib()
    if lib is not None:
        import ctypes

        xyzs = np.ascontiguousarray(
            np.stack([xy[:, 0], xy[:, 1], z], axis=1), np.int32
        )
        c0 = np.ascontiguousarray(colors[:, 0])
        c1 = np.ascontiguousarray(colors[:, 1])
        c2 = np.ascontiguousarray(colors[:, 2])
        lib.render_ball(
            image_size, image_size,
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            len(pts),
            xyzs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            c0.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            c1.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            c2.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            radius,
        )
        return img

    # numpy fallback: nearest-wins z-buffer with a square splat
    order = np.argsort(z)
    for i in order:
        x0, y0 = int(xy[i, 0]), int(xy[i, 1])
        x1, x2 = max(0, x0 - radius), min(image_size, x0 + radius + 1)
        y1, y2 = max(0, y0 - radius), min(image_size, y0 + radius + 1)
        if x1 < x2 and y1 < y2:
            img[x1:x2, y1:y2] = np.clip(colors[i], 0, 255).astype(np.uint8)
    return img


_render_cache: list = []


def _render_lib():
    if _render_cache:
        return _render_cache[0]
    import ctypes
    import os as _os
    import subprocess

    src = os.path.join(os.path.dirname(__file__), "..", "native", "render_balls.cpp")
    so = _os.path.join(
        _os.path.expanduser("~"), ".cache", "rfnet_native", "librenderballs.so"
    )
    lib = None
    try:
        if _os.path.exists(src):
            _os.makedirs(_os.path.dirname(so), exist_ok=True)
            if not _os.path.exists(so) or _os.path.getmtime(so) < _os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, _os.path.abspath(src)],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
    except Exception:
        lib = None
    _render_cache.append(lib)
    return lib


def plot_pcd_atten_views(
    filename: str, pcds, attens, titles, suptitle: str = "", sizes=None
):
    """Attention-coloured variant (`visu_util.py:68-117`): point colour comes
    from a per-point scalar instead of the x coordinate."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if sizes is None:
        sizes = [0.5 for _ in pcds]
    fig = plt.figure(figsize=(len(pcds) * 3, 9))
    for i, azim in enumerate([-30, 30, 90]):
        for j, (pcd, att, size) in enumerate(zip(pcds, attens, sizes)):
            pcd = np.asarray(pcd)
            ax = fig.add_subplot(3, len(pcds), i * len(pcds) + j + 1, projection="3d")
            ax.view_init(30, azim)
            ax.scatter(
                pcd[:, 0], pcd[:, 1], pcd[:, 2], zdir="y",
                c=np.asarray(att).reshape(-1), s=size, cmap="jet",
            )
            ax.set_title(titles[j])
            ax.set_axis_off()
    plt.suptitle(suptitle)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename)
    plt.close(fig)
