"""Device greedy delta-net selection (covernet): exactness, guarantees, wiring.

The net must be *exactly* the sequential greedy delta-net in scan order
(the cover tree's leaf-level seeding rule with global claiming, reference
covertree.py:42-156) — verified against a trivially-correct numpy oracle
with a block size small enough to force many blocks and multi-round
in-block resolution.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.selection import (
    covernet_lloyds,
    covernet_select,
    covernet_update_inducing_parameters,
)


def _greedy_net_oracle(x: np.ndarray, resolution: float) -> np.ndarray:
    """Sequential greedy delta-net: accept x[i] iff > resolution from all
    earlier accepted centers."""
    centers = []
    for p in x:
        if all(np.linalg.norm(p - c) > resolution for c in centers):
            centers.append(p)
    return np.stack(centers)


def _pairwise_min(a: np.ndarray) -> float:
    d = np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return float(d.min())


@pytest.mark.parametrize("resolution", [0.3, 0.8, 2.0])
def test_covernet_matches_sequential_oracle(rng, resolution):
    x = rng.normal(size=(700, 3))
    # Tiny blocks force many block boundaries and multi-round in-block MIS.
    z, m = covernet_select(jnp.asarray(x), resolution, block_size=64)
    oracle = _greedy_net_oracle(x, resolution)
    assert m == oracle.shape[0]
    np.testing.assert_allclose(np.asarray(z), oracle, rtol=0, atol=1e-12)


def test_covernet_separation_and_coverage(rng):
    x = rng.uniform(-3, 3, size=(2000, 2))
    res = 0.5
    z, m = covernet_select(jnp.asarray(x), res, block_size=256)
    z = np.asarray(z)
    assert _pairwise_min(z) > res  # minimum separation
    d = np.linalg.norm(x[:, None, :] - z[None, :, :], axis=-1)
    assert d.min(axis=1).max() <= res  # coverage


def test_covernet_buffer_auto_doubles(rng):
    x = rng.normal(size=(500, 2))
    res = 0.05  # nearly every point is its own center
    z, m = covernet_select(jnp.asarray(x), res, max_points=64, block_size=128)
    oracle = _greedy_net_oracle(x, res)
    assert m == oracle.shape[0] > 64  # saturated the initial cap and retried
    np.testing.assert_allclose(np.asarray(z), oracle, atol=1e-12)


def test_covernet_lloyds_preserves_separation(rng):
    x = rng.uniform(-3, 3, size=(3000, 2))
    res = 0.7
    z, _ = covernet_select(jnp.asarray(x), res)
    z2 = covernet_lloyds(jnp.asarray(x), z, res, rounds=2)
    assert _pairwise_min(np.asarray(z2)) > res
    # Refinement actually moved something (blob means differ from seeds).
    assert not np.allclose(np.asarray(z2), np.asarray(z))


def test_covernet_update_inducing_parameters(rng):
    x = rng.uniform(-2, 2, size=(800, 2))
    y = rng.normal(size=(800, 1))
    res = 0.6
    iv, means, counts = covernet_update_inducing_parameters(
        (jnp.asarray(x), jnp.asarray(y)), res, lloyds=0
    )
    m = iv.shape[0]
    assert means.shape == (m, 1) and counts.shape == (m, 1)
    # counts total N (no empty cells before Lloyd's: centers are data points)
    assert float(jnp.sum(counts)) == x.shape[0]
    # means match a numpy Voronoi recomputation
    d = np.linalg.norm(x[:, None, :] - np.asarray(iv)[None, :, :], axis=-1)
    labels = d.argmin(axis=1)
    for i in range(m):
        np.testing.assert_allclose(
            np.asarray(means)[i, 0], y[labels == i, 0].mean(), atol=1e-10
        )


def test_covernet_update_with_lloyds_keeps_shapes(rng):
    x = rng.uniform(-2, 2, size=(600, 3))
    y = rng.normal(size=(600,))  # 1-D targets accepted like the other paths
    iv, means, counts = covernet_update_inducing_parameters(
        (jnp.asarray(x), jnp.asarray(y)), 0.8, lloyds=1
    )
    assert iv.shape[0] == means.shape[0] == counts.shape[0]
    assert _pairwise_min(np.asarray(iv)) > 0.8
    assert bool(jnp.all(jnp.isfinite(means))) and bool(jnp.all(counts >= 1.0))


def test_covernet_warns_when_nothing_reduced(rng):
    x = rng.normal(size=(50, 2)) * 100.0  # all points far apart
    with warnings.catch_warnings(record=True) as captured:
        warnings.simplefilter("always")
        covernet_update_inducing_parameters(
            (jnp.asarray(x), jnp.asarray(rng.normal(size=(50, 1)))), 1e-6
        )
    assert any("resolution" in str(w.message) for w in captured)


def test_covernet_covariance_metric_guarantee(rng):
    from cggp_tpu.ops import SquaredExponential

    x = rng.uniform(-2, 2, size=(1500, 2))
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.5, lengthscales=np.array([0.7, 1.3]))
    res = 0.9
    z, m = covernet_select(
        jnp.asarray(x), res, block_size=128,
        distance_type="covariance", kernel=kernel, kernel_params=kp,
    )
    assert 1 < m < x.shape[0]
    # separation in covariance distance: k(a,a)+k(b,b)-2k(a,b) > res^2
    k = np.asarray(kernel.K(kp, z))
    d2 = np.diag(k)[:, None] + np.diag(k)[None, :] - 2 * k
    np.fill_diagonal(d2, np.inf)
    assert d2.min() > res**2
    # coverage in the same metric
    kxz = np.asarray(kernel.K(kp, jnp.asarray(x), z))
    kxx = np.asarray(kernel.K_diag(kp, jnp.asarray(x)))
    d2_xz = kxx[:, None] + np.diag(k)[None, :] - 2 * kxz
    assert d2_xz.min(axis=1).max() <= res**2 + 1e-9


def test_covernet_correlation_equals_oips(rng):
    """For stationary kernels the correlation-metric net IS the OIPS rule
    (reference selection.py:87-96, rho = 1 - resolution) — but evaluated
    blocked-parallel.  Exact set equality against our OIPS scan."""
    from cggp_tpu.ops import Matern32
    from cggp_tpu.selection import oips

    x = rng.uniform(-2, 2, size=(900, 3))
    kernel = Matern32()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(3, 0.8))
    res = 0.45
    z, m = covernet_select(
        jnp.asarray(x), res, block_size=128,
        distance_type="correlation", kernel=kernel, kernel_params=kp,
    )
    z_oips, _idx = oips(kernel, kp, jnp.asarray(x), rho=1.0 - res,
                        max_points=x.shape[0])
    # OIPS seeds from argmax of the (constant) kernel diagonal = index 0,
    # then scans in the same order: identical acceptance rule => identical set.
    assert m == z_oips.shape[0]
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_oips), atol=1e-12)


def test_covernet_update_kernel_metric_rejects_lloyds(rng):
    from cggp_tpu.ops import SquaredExponential

    x = jnp.asarray(rng.uniform(-2, 2, size=(200, 2)))
    y = jnp.asarray(rng.normal(size=(200, 1)))
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=np.ones(2))
    with pytest.raises(ValueError, match="euclidean-only"):
        covernet_update_inducing_parameters(
            (x, y), 0.5, lloyds=1, distance_type="covariance",
            kernel=kernel, kernel_params=kp,
        )
    iv, means, counts = covernet_update_inducing_parameters(
        (x, y), 0.5, lloyds=0, distance_type="covariance",
        kernel=kernel, kernel_params=kp,
    )
    assert iv.shape[0] == means.shape[0] == counts.shape[0] > 1


def test_covernet_cli_covariance_dispatch(rng):
    from cggp_tpu.cli.cli_utils import create_model_and_update_fn

    x = jnp.asarray(rng.uniform(-2, 2, size=(300, 2)))
    y = jnp.asarray(rng.normal(size=(300, 1)))
    model, params, update_fn = create_model_and_update_fn(
        "cdgp", (x, y),
        clustering_type="covernet",
        distance_type="covariance",
        clustering_kwargs={"spatial_resolution": 0.8},
    )
    m0 = update_fn(params)["inducing_points"].shape[0]
    # The selection adapts to the CURRENT hyperparameters: a much shorter
    # lengthscale decorrelates points, so the covariance-metric net keeps more.
    params2 = dict(params)
    kp = dict(params["kernel"])
    ell = model.kernel.lengthscales(params["kernel"])
    kp["lengthscales"] = model.kernel.bijector.inverse(ell / 8.0)
    params2["kernel"] = kp
    m1 = update_fn(params2)["inducing_points"].shape[0]
    assert m1 > m0


def test_covernet_cli_dispatch(rng):
    from cggp_tpu.cli.cli_utils import create_model_and_update_fn

    x = jnp.asarray(rng.uniform(-2, 2, size=(300, 2)))
    y = jnp.asarray(rng.normal(size=(300, 1)))
    model, params, update_fn = create_model_and_update_fn(
        "cdgp", (x, y),
        clustering_type="covernet",
        clustering_kwargs={"spatial_resolution": 0.7},
    )
    params = update_fn(params)
    m = params["inducing_points"].shape[0]
    assert m > 1
    assert _pairwise_min(np.asarray(params["inducing_points"])) > 0.7
    import jax

    loss = model.training_loss(params, (x, y), jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(loss))
