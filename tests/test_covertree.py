"""Cover-tree property tests.

The reference validates the tree visually (legacy/playground_covertree.py);
here the separation/covering invariants become assertions — exactly the R /
delta ratio the playground plots (SURVEY.md section 4).
"""

import numpy as np
import pytest

from cggp_tpu.selection import CoverTree, covertree_update_inducing_parameters


def _data(rng, n=400, dim=2):
    x = rng.normal(size=(n, dim))
    y = rng.normal(size=(n, 1))
    return x, y


def test_levels_and_radius_snapping(rng):
    x, y = _data(rng)
    res = 0.25
    tree = CoverTree(None, (x, y), spatial_resolution=res)
    assert tree.max_radius == pytest.approx(res * 2 ** (tree.num_levels - 1))
    assert tree.num_levels >= 2


def test_minimum_separation_invariant(rng):
    """Centers at the last level are >= spatial_resolution apart."""
    x, y = _data(rng)
    res = 0.5
    tree = CoverTree(None, (x, y), spatial_resolution=res)
    assert tree.minimum_separation(-1) >= res


def test_voronoi_partition_covers_all_points(rng):
    x, y = _data(rng)
    tree = CoverTree(None, (x, y), spatial_resolution=0.5)
    m = tree.centroids.shape[0]
    labels = tree.labels
    assert labels.shape == (400,)
    assert labels.min() >= 0 and labels.max() < m
    means, counts = tree.cluster_mean_and_counts
    assert counts.sum() == 400
    # labels are genuinely nearest-center
    d = np.linalg.norm(x[:, None, :] - tree.centroids[None, :, :], axis=-1)
    np.testing.assert_array_equal(labels, d.argmin(axis=1))


def test_cluster_means_match_labels(rng):
    x, y = _data(rng)
    tree = CoverTree(None, (x, y), spatial_resolution=0.5)
    means, counts = tree.cluster_mean_and_counts
    labels = tree.labels
    for c in range(tree.centroids.shape[0]):
        mask = labels == c
        if mask.sum():
            np.testing.assert_allclose(means[c, 0], y[mask].mean(), rtol=1e-10)


def test_resolution_controls_m(rng):
    x, y = _data(rng)
    m_coarse = CoverTree(None, (x, y), spatial_resolution=1.0).centroids.shape[0]
    m_fine = CoverTree(None, (x, y), spatial_resolution=0.25).centroids.shape[0]
    assert m_fine > m_coarse


def test_update_fn_returns_device_arrays(rng):
    import jax.numpy as jnp

    x = jnp.asarray(rng.normal(size=(200, 2)))
    y = jnp.asarray(rng.normal(size=(200, 1)))
    z, u, counts = covertree_update_inducing_parameters((x, y), spatial_resolution=0.5)
    assert z.ndim == 2 and u.shape == (z.shape[0], 1) and counts.shape == (z.shape[0], 1)
    assert float(counts.sum()) == 200
    assert u.dtype == x.dtype


def test_no_lloyds_no_voronoi(rng):
    x, y = _data(rng)
    tree = CoverTree(None, (x, y), spatial_resolution=0.5, lloyds=False, voronoi=False)
    assert tree.minimum_separation(-1) >= 0.5
    _, counts = tree.cluster_mean_and_counts
    assert counts.sum() == 400


def test_reference_backend_invariants(rng):
    """The exact-parity backend (r_neighbors locality lists) upholds the
    separation guarantee and partitions the data."""
    x, y = _data(rng)
    res = 0.5
    tree = CoverTree(None, (x, y), spatial_resolution=res, backend="reference")
    assert tree.max_radius == pytest.approx(res * 2 ** (tree.num_levels - 1))
    assert tree.minimum_separation(-1) >= res
    m = tree.centroids.shape[0]
    labels = tree.labels
    assert labels.min() >= 0 and labels.max() < m
    _means, counts = tree.cluster_mean_and_counts
    assert counts.sum() == 400


def test_reference_backend_matches_numpy_backend_on_separated_data(rng):
    """Where locality lists cannot bind (few well-separated blobs), the
    parity backend and the global-claiming backend build the same tree."""
    centers = np.array([[0.0, 0.0], [8.0, 0.0], [0.0, 8.0], [8.0, 8.0]])
    x = np.concatenate([c + 0.3 * rng.normal(size=(50, 2)) for c in centers])
    y = rng.normal(size=(200, 1))
    kwargs = dict(spatial_resolution=2.0)
    t_ref = CoverTree(None, (x, y), backend="reference", **kwargs)
    t_np = CoverTree(None, (x, y), backend="numpy", **kwargs)
    assert t_ref.num_levels == t_np.num_levels
    # same centers as sets (creation order may differ)
    def canon(c):
        return np.array(sorted(map(tuple, np.round(c, 9))))
    np.testing.assert_allclose(canon(t_ref.centroids), canon(t_np.centroids),
                               atol=1e-8)


def test_reference_backend_no_lloyds_no_voronoi(rng):
    x, y = _data(rng, n=200)
    tree = CoverTree(None, (x, y), spatial_resolution=0.5, backend="reference",
                     lloyds=False, voronoi=False)
    # without voronoi, claimed clusters still partition the data
    _means, counts = tree.cluster_mean_and_counts
    assert counts.sum() == 200
    assert tree.minimum_separation(-1) > 0


def test_cluster_means_multi_output_y():
    """[N, P] targets: per-column cluster means (round-1 weak finding: the
    old axis=-1 mean silently averaged across output columns)."""
    rng = np.random.RandomState(3)
    x = rng.uniform(-2, 2, (120, 2))
    y = rng.standard_normal((120, 3))
    from cggp_tpu.selection.covertree import CoverTree

    tree = CoverTree(None, (x, y), spatial_resolution=1.0, backend="numpy")
    means, counts = tree.cluster_mean_and_counts
    assert means.shape == (tree.centroids.shape[0], 3)
    labels = tree.labels
    for i in range(tree.centroids.shape[0]):
        sel = labels == i
        if sel.any():
            np.testing.assert_allclose(means[i], y[sel].mean(axis=0), atol=1e-12)
            assert counts[i, 0] == sel.sum()


def test_plotting_diagnostics(rng):
    """plotting=True (reference covertree.py:34,61-62,116-117 parity):
    per-level snapshots carry the coverage invariant — every point lies
    within `radius` of its PRE-Voronoi labeled center — plus the halving
    radius schedule, independent of the later Voronoi reassignment."""
    x, y = _data(rng, n=300)
    tree = CoverTree(None, (x, y), spatial_resolution=0.5, plotting=True)

    assert len(tree.plotting_data) == tree.num_levels
    for level, snap in enumerate(tree.plotting_data):
        centers, radius, labels = snap["centers"], snap["radius"], snap["labels"]
        assert centers.shape[0] == tree.level_centers[level].shape[0]
        np.testing.assert_allclose(radius, tree.max_radius / 2**level)
        assert labels.shape == (300,)
        dists = np.linalg.norm(x - centers[labels], axis=-1)
        assert dists.max() <= radius + 1e-12, (level, dists.max(), radius)

    # Default stays lean: no snapshots recorded, native backend allowed.
    lean = CoverTree(None, (x, y), spatial_resolution=0.5)
    assert lean.plotting_data == []
