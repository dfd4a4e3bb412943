"""Cover-tree separation-ratio check
(legacy/playground_covertree.py:15-43 equivalent).

Builds trees at several resolutions and prints the minimum-separation /
radius ratio — the paper's guarantee is ratio >= 1 at the final level —
plus build timings for the numpy and native C++ backends.
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.native import native_available
from cggp_tpu.selection.covertree import CoverTree


def main():
    (x, y), _ = synthetic(n=20_000, dim=3, seed=0)
    data = (x, y)
    backends = ["numpy"] + (["native"] if native_available() else [])

    print(f"{'resolution':>10} {'backend':>8} {'M':>6} {'min_sep/res':>12} {'build_s':>8}")
    for resolution in (1.0, 0.5, 0.25):
        for backend in backends:
            t0 = time.perf_counter()
            tree = CoverTree(None, data, spatial_resolution=resolution,
                             backend=backend)
            dt = time.perf_counter() - t0
            ratio = tree.minimum_separation() / resolution
            print(f"{resolution:>10.2f} {backend:>8} {tree.centroids.shape[0]:>6d} "
                  f"{ratio:>12.3f} {dt:>8.2f}")


def plot_levels(out_path: str = "covertree_levels.png"):
    """Per-level coverage plot from ``CoverTree(plotting=True)`` diagnostics
    (the reference's playground drew these from per-node ``plotting_data``
    snapshots, covertree.py:61-62,116-117 / legacy/playground_covertree.py):
    claimed points colored per node with the level's covering circles."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    (x, y), _ = synthetic(n=2_000, dim=2, seed=0)
    tree = CoverTree(None, (x, y), spatial_resolution=0.25, plotting=True)

    n_levels = len(tree.plotting_data)
    fig, axes = plt.subplots(1, n_levels, figsize=(4 * n_levels, 4))
    for ax, (level, snap) in zip(np.atleast_1d(axes), enumerate(tree.plotting_data)):
        centers, radius, labels = snap["centers"], snap["radius"], snap["labels"]
        ax.scatter(x[:, 0], x[:, 1], c=labels, s=4, cmap="tab20", alpha=0.6)
        ax.scatter(centers[:, 0], centers[:, 1], c="black", s=18, marker="x")
        for c in centers:
            ax.add_patch(plt.Circle(c, radius, fill=False, color="black",
                                    linewidth=0.6, alpha=0.5))
        ax.set_title(f"level {level}: M={centers.shape[0]}, r={radius:.3g}")
        ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    import sys

    if "--plot" in sys.argv:
        plot_levels()
    main()
