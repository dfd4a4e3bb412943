"""Cover-tree inducing-point selection with a minimum-separation guarantee.

Host-side numpy, run once per inducing-point update — exactly the placement
the reference chose (covertree.py:25-176 runs on ``.numpy()`` data,
optimize.py:25).  It never sits in the jitted training step, so keeping it on
the host costs nothing while keeping the device graph static.

This is a fresh, vectorised implementation of the same construction (the
paper's headline contribution), not a port of the reference's per-node
Python object graph:

* root at the data mean with ``max_radius`` = max distance to any point
  (reference :50-57); ``spatial_resolution`` fixes
  ``num_levels = ceil(log2(max_radius / res)) + 1`` and snaps
  ``max_radius = res * 2^(num_levels - 1)`` (reference :54-56);
* each level halves the radius; new centers are seeded from the first
  still-uncovered point; with ``lloyds=True`` the seed is replaced by the
  local mean of its radius-neighbourhood unless that mean violates the
  minimum-separation constraint against already-placed centers (reference
  :72-84);
* with ``voronoi=True`` (the default used by the update fn) all points are
  re-partitioned to their nearest center at each level (reference :118-156).

Difference from the reference (documented, intentional): coverage claiming is
global rather than restricted to the parent's ``r_neighbors`` node lists.
The ``r_neighbors`` machinery is a locality optimisation that only affects
*which* seeds get picked, not the two properties that matter downstream —
(a) every final center is >= ``radius`` away from every other center (the
minimum-separation guarantee that bounds the condition number of
``Kuu + Lambda``) and (b) with Voronoi repartition the final clusters are the
Voronoi cells of the centers.  Both hold here; see tests/test_covertree.py.
"""

from __future__ import annotations

import math
import warnings
from typing import Callable, List, Optional, Tuple

import numpy as np


class CoverTree:
    """Hierarchical cover tree over ``data = (x, y)`` numpy arrays."""

    def __init__(
        self,
        distance: Optional[Callable],
        data: Tuple[np.ndarray, np.ndarray],
        spatial_resolution: Optional[float] = None,
        num_levels: int = 1,
        lloyds: bool = True,
        voronoi: bool = True,
        backend: str = "auto",
    ):
        if distance is not None:
            # Parity with the reference, which ignores the distance argument
            # and forces the Euclidean norm (covertree.py:36-47).
            warnings.warn(
                "Distance function is ignored; Euclidean distance is used "
                "(matches reference covertree.py:36-47)."
            )

        x = np.asarray(data[0], dtype=np.float64)
        y = np.asarray(data[1], dtype=np.float64)
        if y.ndim == 1:
            y = y[:, None]
        n = x.shape[0]

        if backend in ("auto", "native"):
            # Multithreaded C++ builder (cggp_tpu/native/covertree.cc) — the
            # same construction; falls back to numpy when no toolchain.
            from cggp_tpu.native import covertree_build_native

            result = covertree_build_native(
                x, spatial_resolution, num_levels=num_levels,
                lloyds=lloyds, voronoi=voronoi,
            )
            if result is not None:
                centers, labels, levels = result
                self.num_levels = levels
                # Same radius bookkeeping as the numpy path (and the C++ code).
                root = x.mean(axis=0)
                max_radius = float(np.linalg.norm(x - root, axis=-1).max())
                if spatial_resolution is not None:
                    max_radius = max(max_radius, spatial_resolution)
                    max_radius = spatial_resolution * (2 ** (levels - 1))
                self.max_radius = max_radius
                self.level_centers = [root[None, :], centers]
                self._x, self._y, self._labels = x, y, labels
                return
            if backend == "native":
                raise RuntimeError("native covertree backend unavailable")

        root = x.mean(axis=0)
        max_radius = float(np.linalg.norm(x - root, axis=-1).max())
        if spatial_resolution is not None:
            max_radius = max(max_radius, spatial_resolution)
            num_levels = math.ceil(math.log2(max_radius / spatial_resolution)) + 1
            max_radius = spatial_resolution * (2 ** (num_levels - 1))

        self.max_radius = max_radius
        self.num_levels = num_levels
        self.level_centers: List[np.ndarray] = [root[None, :]]
        labels = np.zeros(n, dtype=np.int64)

        for level in range(1, num_levels):
            radius = max_radius / (2**level)
            centers: List[np.ndarray] = []
            assigned = np.zeros(n, dtype=bool)
            order = np.argsort(labels, kind="stable")  # keep parent-major order

            center_arr = np.empty((0, x.shape[1]))
            cursor = 0
            while True:
                # first still-uncovered point in parent-major order
                while cursor < n and assigned[order[cursor]]:
                    cursor += 1
                if cursor >= n:
                    break
                seed_idx = order[cursor]
                seed = x[seed_idx]

                if lloyds:
                    # local mean of the seed's uncovered radius-neighbourhood
                    un_idx = np.flatnonzero(~assigned)
                    d_seed = np.linalg.norm(x[un_idx] - seed, axis=-1)
                    neighborhood = x[un_idx[d_seed <= radius]]
                    point = neighborhood.mean(axis=0)
                    if center_arr.shape[0]:
                        sep = np.linalg.norm(center_arr - point, axis=-1)
                        if np.any(sep < radius):
                            point = seed  # keep minimum separation
                else:
                    point = seed

                # claim all uncovered points within radius of the new center
                un_idx = np.flatnonzero(~assigned)
                d_center = np.linalg.norm(x[un_idx] - point, axis=-1)
                claimed = un_idx[d_center <= radius]
                assigned[claimed] = True
                assigned[seed_idx] = True  # guard against an empty claim
                new_label = len(centers)
                labels[claimed] = new_label
                labels[seed_idx] = new_label
                centers.append(point)
                center_arr = np.vstack([center_arr, point[None, :]])

            center_arr = np.stack(centers)
            if voronoi:
                labels = _nearest_center_labels(x, center_arr)
            self.level_centers.append(center_arr)

        self._x = x
        self._y = y
        self._labels = labels

    # -- outputs consumed by the update fn (reference covertree.py:160-176) --

    @property
    def centroids(self) -> np.ndarray:
        return self.level_centers[-1]

    @property
    def labels(self) -> np.ndarray:
        return self._labels

    @property
    def cluster_ys(self) -> List[np.ndarray]:
        m = self.centroids.shape[0]
        return [self._y[self._labels == i] for i in range(m)]

    @property
    def cluster_mean_and_counts(self) -> Tuple[np.ndarray, np.ndarray]:
        m = self.centroids.shape[0]
        counts = np.bincount(self._labels, minlength=m).astype(self._y.dtype)
        sums = np.zeros(m, dtype=self._y.dtype)
        np.add.at(sums, self._labels, self._y.mean(axis=-1))
        means = np.divide(sums, counts, out=np.zeros_like(sums), where=counts > 0)
        return means[:, None], counts[:, None]

    def minimum_separation(self, level: int = -1) -> float:
        """Smallest pairwise distance between centers at ``level``."""
        centers = self.level_centers[level]
        if centers.shape[0] < 2:
            return float("inf")
        d = np.linalg.norm(centers[:, None, :] - centers[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return float(d.min())


def _nearest_center_labels(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Voronoi labels, blocked to bound peak memory at large N."""
    n = x.shape[0]
    labels = np.empty(n, dtype=np.int64)
    c2 = np.sum(centers**2, axis=-1)
    block = max(1, int(2e7) // max(centers.shape[0], 1))
    for start in range(0, n, block):
        xb = x[start : start + block]
        d2 = np.sum(xb**2, axis=-1)[:, None] + c2[None, :] - 2.0 * xb @ centers.T
        labels[start : start + block] = np.argmin(d2, axis=-1)
    return labels
