"""Cover-tree separation-ratio check
(legacy/playground_covertree.py:15-43 equivalent).

Builds trees at several resolutions and prints the minimum-separation /
radius ratio — the paper's guarantee is ratio >= 1 at the final level —
plus build timings for the numpy and native C++ backends.
"""

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


if __name__ == "__main__":
    main()
