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
