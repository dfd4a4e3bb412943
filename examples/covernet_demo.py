"""Covernet vs cover tree: same guarantees, device speed.

Builds both selections at several resolutions on synthetic data and prints
minimum separation (the paper's conditioning guarantee — must exceed the
resolution for BOTH), coverage radius, M, and wall time, plus a streaming
`covernet_extend` step ingesting a second data batch incrementally (the
tree has to rebuild from scratch).

Run: python examples/covernet_demo.py [N]
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.selection import CoverTree, covernet_extend, covernet_select


def min_sep(z: np.ndarray) -> float:
    d = np.linalg.norm(z[:, None, :] - z[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return float(d.min())


def coverage(x: np.ndarray, z: np.ndarray) -> float:
    out = 0.0
    for start in range(0, len(x), 8192):
        xb = x[start:start + 8192]
        d = np.linalg.norm(xb[:, None, :] - z[None, :, :], axis=-1)
        out = max(out, float(d.min(axis=1).max()))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    (x, y), _ = synthetic(n=n, dim=3, seed=0)
    x = np.asarray(x)
    xj = jnp.asarray(x, jnp.float32)

    print(f"N={len(x)}, dim=3")
    print(f"{'res':>5} | {'M tree':>7} {'M net':>6} | {'sep tree':>9} "
          f"{'sep net':>8} | {'cover net':>9} | {'t tree':>7} {'t net':>7}")
    for res in (0.8, 0.4, 0.2):
        t0 = time.perf_counter()
        tree = CoverTree(None, (x, np.asarray(y)), spatial_resolution=res)
        t_tree = time.perf_counter() - t0
        zt = tree.centroids

        covernet_select(xj, res)  # warm the jit once
        t0 = time.perf_counter()
        zn, m = covernet_select(xj, res)
        zn = np.asarray(zn)
        t_net = time.perf_counter() - t0

        print(f"{res:5.2f} | {len(zt):7d} {m:6d} | {min_sep(zt):9.3f} "
              f"{min_sep(zn):8.3f} | {coverage(x, zn):9.3f} | "
              f"{t_tree:6.2f}s {t_net:6.3f}s")

    # Streaming: a second batch arrives; the net extends incrementally.
    (x2, _), _ = synthetic(n=n, dim=3, seed=1)
    x2 = jnp.asarray(np.asarray(x2) + 2.0, jnp.float32)  # new territory
    z, m = covernet_select(xj, 0.4)
    t0 = time.perf_counter()
    z2, m2 = covernet_extend(z, x2, 0.4)
    t_ext = time.perf_counter() - t0
    print(f"\nstreaming extend: M {m} -> {m2} over {x2.shape[0]} new points "
          f"in {t_ext:.3f}s (tree: full rebuild)")
    assert min_sep(np.asarray(z2)) > 0.4


if __name__ == "__main__":
    main()
