"""Tests for k-means, OIPS, greedy, uniform selection and the update fns."""

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.ops import Matern32, SquaredExponential
from cggp_tpu.selection import (
    greedy_selection,
    kmeans_indices_and_distances,
    kmeans_lloyd,
    kmeans_update_inducing_parameters,
    labels_update_inducing_parameters,
    oips,
    uniform,
)


def _blobs(rng, k=4, per=50, dim=2, spread=0.1):
    centers = rng.normal(size=(k, dim)) * 5.0
    x = np.concatenate([c + spread * rng.normal(size=(per, dim)) for c in centers])
    return jnp.asarray(x), centers


def test_kmeans_recovers_blobs(rng):
    x, true_centers = _blobs(rng)
    centroids, mean_dist = kmeans_lloyd(x, 4, key=jax.random.PRNGKey(0))
    # every true center is close to some found centroid
    d = np.linalg.norm(true_centers[:, None, :] - np.asarray(centroids)[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 0.5
    assert float(mean_dist) < 0.5


def test_kmeans_indices_and_distances(rng):
    x, _ = _blobs(rng)
    centroids = x[:4]
    indices, distances = kmeans_indices_and_distances(centroids, x)
    assert indices.shape == (x.shape[0],)
    # distances match the chosen centroid
    chosen = np.asarray(centroids)[np.asarray(indices)]
    np.testing.assert_allclose(
        np.asarray(distances),
        np.linalg.norm(np.asarray(x) - chosen, axis=-1),
        rtol=1e-10, atol=1e-12,
    )


def test_oips_acceptance_invariant(rng):
    x, _ = _blobs(rng, k=3, per=40)
    kernel = SquaredExponential()
    params = kernel.init_params(variance=1.0, lengthscales=[1.0, 1.0])
    rho = 0.5
    z, indices = oips(kernel, params, x, rho=rho, max_points=60)
    m = z.shape[0]
    assert 1 <= m <= 60
    # accepted points are mutually "far" in kernel space: k(z_i, z_j) < rho
    # for every pair accepted after one another (check pairwise, conservative:
    # the invariant guarantees it vs previously accepted points)
    k_zz = np.asarray(kernel.K(params, z))
    upper = np.triu(k_zz, k=1)
    assert upper.max() < rho * 1.0 + 1e-9


def test_oips_respects_max_points(rng):
    x, _ = _blobs(rng)
    kernel = SquaredExponential()
    params = kernel.init_params(variance=1.0, lengthscales=[0.05, 0.05])
    z, _ = oips(kernel, params, x, rho=0.9, max_points=10)
    assert z.shape[0] <= 10


def test_greedy_selection_spreads_points(rng):
    x, _ = _blobs(rng)
    kernel = Matern32()
    params = kernel.init_params(variance=1.0, lengthscales=[1.0, 1.0])
    z, inds = greedy_selection(kernel, params, x, 8, jax.random.PRNGKey(1))
    assert z.shape == (8, 2)
    assert len(np.unique(np.asarray(inds))) == 8
    # greedy max-variance should hit all 4 blobs
    _, true_centers = _blobs(rng)  # regen irrelevant; just check spread
    pd = np.linalg.norm(np.asarray(z)[:, None] - np.asarray(z)[None, :], axis=-1)
    np.fill_diagonal(pd, np.inf)
    assert pd.min() > 0.01


def test_uniform_no_replacement(rng):
    x = jnp.asarray(rng.normal(size=(50, 2)))
    z, inds = uniform(x, 20, jax.random.PRNGKey(2))
    assert z.shape == (20, 2)
    assert len(np.unique(np.asarray(inds))) == 20


def test_labels_update_means_and_counts(rng):
    x = jnp.asarray(rng.normal(size=(30, 2)))
    y = jnp.asarray(rng.normal(size=(30, 1)))
    iv = x[:5]
    z, u, counts = labels_update_inducing_parameters((x, y), iv)
    assert z.shape == (5, 2) and u.shape == (5, 1) and counts.shape == (5, 1)
    assert float(jnp.sum(counts)) >= 30  # empties clipped to 1
    # recompute one cluster mean by hand
    labels, _ = kmeans_indices_and_distances(iv, x)
    labels = np.asarray(labels)
    for c in range(5):
        mask = labels == c
        if mask.sum():
            np.testing.assert_allclose(
                float(u[c, 0]), float(np.asarray(y)[mask].mean()), rtol=1e-10
            )
            np.testing.assert_allclose(float(counts[c, 0]), mask.sum(), rtol=1e-12)


def test_kmeans_update_fn(rng):
    x = jnp.asarray(rng.normal(size=(60, 2)))
    y = jnp.asarray(rng.normal(size=(60, 1)))

    def clustering_fn():
        c, _ = kmeans_lloyd(x, 6, initial_centroids=x[:6])
        return c

    z, u, counts = kmeans_update_inducing_parameters((x, y), clustering_fn)
    assert z.shape == (6, 2)
    assert float(jnp.sum(counts)) >= 60


def test_labels_update_multi_output_means(rng):
    """All output columns are averaged per cluster ([M, P]), matching the
    covertree path — previously only y[:, 0] survived."""
    x = jnp.asarray(rng.uniform(-1, 1, (40, 2)))
    y = jnp.asarray(rng.standard_normal((40, 3)))
    iv = x[:5]
    z, u, counts = labels_update_inducing_parameters((x, y), iv)
    assert u.shape == (5, 3)
    # Oracle: per-cluster numpy means of every column.
    from cggp_tpu.selection.kmeans import kmeans_indices_and_distances

    labels = np.asarray(kmeans_indices_and_distances(iv, x)[0])
    for c in range(5):
        members = labels == c
        if members.any():
            np.testing.assert_allclose(
                np.asarray(u)[c], np.asarray(y)[members].mean(axis=0),
                rtol=1e-12,
            )


def test_greedy_selection_no_duplicates(rng):
    """Past the numerical rank of K, greedy must not re-pick an index
    (duplicate inducing points make Kuu rank-deficient)."""
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.selection.points import greedy_selection

    kernel = SquaredExponential()
    # 10 distinct points duplicated 4x: numerical rank ~10, ask for 20.
    base = rng.uniform(-1, 1, (10, 2))
    x = jnp.asarray(np.concatenate([base] * 4))
    kp = kernel.init_params(dtype=x.dtype)
    z, idx = greedy_selection(kernel, kp, x, 20, jax.random.PRNGKey(0))
    assert len(np.unique(np.asarray(idx))) == 20
