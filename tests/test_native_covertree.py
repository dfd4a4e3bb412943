"""Native C++ cover-tree vs the numpy builder: invariants + speed sanity."""

import numpy as np
import pytest

from cggp_tpu.native import native_available
from cggp_tpu.selection.covertree import CoverTree

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native backend"
)


def _data(rng, n=2000, d=3):
    x = rng.uniform(-2, 2, (n, d))
    y = np.sin(x[:, :1]) + 0.05 * rng.standard_normal((n, 1))
    return x, y


def test_native_matches_numpy_invariants(rng):
    data = _data(rng)
    res = 0.5
    native = CoverTree(None, data, spatial_resolution=res, backend="native")
    numpy_t = CoverTree(None, data, spatial_resolution=res, backend="numpy")

    # Identical construction order => identical trees.
    assert native.num_levels == numpy_t.num_levels
    assert native.centroids.shape == numpy_t.centroids.shape
    np.testing.assert_allclose(native.centroids, numpy_t.centroids, atol=1e-12)
    np.testing.assert_array_equal(native.labels, numpy_t.labels)

    means_n, counts_n = native.cluster_mean_and_counts
    means_p, counts_p = numpy_t.cluster_mean_and_counts
    np.testing.assert_allclose(means_n, means_p, atol=1e-12)
    np.testing.assert_array_equal(counts_n, counts_p)


def test_native_minimum_separation_invariant(rng):
    data = _data(rng, n=3000, d=2)
    res = 0.3
    tree = CoverTree(None, data, spatial_resolution=res, backend="native")
    # The paper's guarantee: pairwise center separation >= final radius.
    final_radius = res  # max_radius snapped to res * 2^(levels-1)
    assert tree.minimum_separation() >= final_radius - 1e-9


def test_native_no_lloyds_no_voronoi(rng):
    data = _data(rng, n=500, d=2)
    native = CoverTree(None, data, spatial_resolution=0.5, backend="native",
                       lloyds=False, voronoi=False)
    numpy_t = CoverTree(None, data, spatial_resolution=0.5, backend="numpy",
                        lloyds=False, voronoi=False)
    np.testing.assert_allclose(native.centroids, numpy_t.centroids, atol=1e-12)
    np.testing.assert_array_equal(native.labels, numpy_t.labels)


def test_native_faster_at_scale(rng):
    import time

    # n=8k keeps the native-vs-numpy gap decisive (~4x) at 1/5 the wall time.
    data = _data(rng, n=8_000, d=4)
    t0 = time.perf_counter()
    CoverTree(None, data, spatial_resolution=0.4, backend="native")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    CoverTree(None, data, spatial_resolution=0.4, backend="numpy")
    t_numpy = time.perf_counter() - t0
    # Regression tripwire only — typical speedup is far larger.
    assert t_native < t_numpy
