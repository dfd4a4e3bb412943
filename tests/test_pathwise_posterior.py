"""Pathwise posterior serving cache (net-new; reference models.py:391-420
has only the per-call, ELBO-internal sampler).

The cache freezes posterior FUNCTION draws: same key => same functions as
``pathwise_samples``; evaluation at new points is solve-free; the CG-built
weights match the Cholesky-built ones; sample moments match the closed-form
ClusterGP posterior; masked (capacity-padded) params serve identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import (
    CGGP,
    ClusterGP,
    PathwiseClusterGP,
    build_pathwise_posterior,
    pathwise_samples_at,
    pathwise_samples_scan,
)
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32, SquaredExponential


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _setup(rng, n=40, m=12, d=2):
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])) + 0.1 * rng.standard_normal((n, 1)))
    z = x[:m]
    u = jnp.asarray(rng.standard_normal((m, 1)))
    counts = jnp.asarray(rng.integers(1, 9, (m, 1)), x.dtype)
    return x, y, z, u, counts


def test_cached_samples_equal_per_call_path(rng):
    """Same key => the cache holds the SAME posterior functions as
    pathwise_samples, so evaluating the cache at the per-call points
    reproduces the per-call draws (key-split discipline pinned)."""
    x, y, z, u, counts = _setup(rng)
    model = PathwiseClusterGP(SquaredExponential(), num_data=x.shape[0],
                              num_bases=64, num_samples=6)
    params = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                               cluster_counts=counts)
    key = jax.random.PRNGKey(11)
    direct = model.pathwise_samples(params, x, key)  # [S, N, 1]
    post = model.pathwise_posterior(params, key)
    cached = pathwise_samples_at(model, post, x)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(direct),
                               rtol=1e-9, atol=1e-10)


def test_build_rejects_multioutput_pseudo_u(rng):
    """The cache is single-output only: a [M, P>1] pseudo_u would broadcast
    u.T [P, M] against the [S, M] prior draws and silently mix outputs
    across samples (round-3 review finding) — reject loudly."""
    x, y, z, u, counts = _setup(rng)
    model = PathwiseClusterGP(SquaredExponential(), num_data=x.shape[0],
                              num_bases=32, num_samples=3)
    u_multi = jnp.concatenate([u, 2.0 * u], axis=1)
    params = model.init_params(z, noise_variance=0.05, pseudo_u=u_multi,
                               cluster_counts=counts)
    with pytest.raises(ValueError, match="single-output"):
        build_pathwise_posterior(model, params, jax.random.PRNGKey(0))


def test_cg_weights_match_chol_weights(rng):
    """CGGP route: the batched CG solve at a tight threshold reproduces the
    Cholesky weights (and therefore the samples)."""
    x, y, z, u, counts = _setup(rng)
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-14, max_iterations=200),
        num_data=x.shape[0], num_probes=2,
    )
    params = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                               cluster_counts=counts)
    key = jax.random.PRNGKey(3)
    post_chol = build_pathwise_posterior(model, params, key, num_bases=64,
                                         num_samples=5, solver="chol")
    post_cg = build_pathwise_posterior(model, params, key, num_bases=64,
                                       num_samples=5, solver="cg")
    np.testing.assert_allclose(np.asarray(post_cg.weights),
                               np.asarray(post_chol.weights),
                               rtol=1e-7, atol=1e-9)
    s_chol = pathwise_samples_at(model, post_chol, x)
    s_cg = pathwise_samples_at(model, post_cg, x)
    np.testing.assert_allclose(np.asarray(s_cg), np.asarray(s_chol),
                               rtol=1e-7, atol=1e-8)


def test_cg_solver_requires_cg_model(rng):
    x, y, z, u, counts = _setup(rng)
    model = PathwiseClusterGP(SquaredExponential(), num_data=x.shape[0])
    params = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                               cluster_counts=counts)
    with pytest.raises(ValueError, match="conjugate_gradient"):
        build_pathwise_posterior(model, params, jax.random.PRNGKey(0),
                                 solver="cg")
    with pytest.raises(ValueError, match="solver"):
        build_pathwise_posterior(model, params, jax.random.PRNGKey(0),
                                 solver="lanczos")


def test_cached_sample_moments_match_clustergp(rng):
    """Many cached draws at HELD-OUT points reproduce the closed-form
    posterior moments — the cache is a faithful posterior, not just a prior
    + offset."""
    x, y, z, u, counts = _setup(rng, n=40, m=12)
    kernel = SquaredExponential()
    model = PathwiseClusterGP(kernel, num_data=x.shape[0],
                              num_bases=6000, num_samples=4000)
    params = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                               cluster_counts=counts)
    x_new = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (25, 2)))
    post = model.pathwise_posterior(params, jax.random.PRNGKey(3))
    samples = np.asarray(pathwise_samples_at(model, post, x_new))
    mu, var = ClusterGP(kernel, num_data=x.shape[0]).predict_f(params, x_new)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu), atol=0.08)
    np.testing.assert_allclose(samples.var(axis=0), np.asarray(var), atol=0.08)


def test_scan_matches_direct_and_jits(rng):
    """The one-dispatch lax.map sweep equals the direct evaluation across
    block boundaries (incl. a non-multiple tail), and the whole cache is a
    pytree: build + serve composes under jit."""
    x, y, z, u, counts = _setup(rng, n=50, m=10)
    model = PathwiseClusterGP(Matern32(), num_data=x.shape[0],
                              num_bases=32, num_samples=4)
    params = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                               cluster_counts=counts)
    post = model.pathwise_posterior(params, jax.random.PRNGKey(5))
    direct = pathwise_samples_at(model, post, x)
    swept = pathwise_samples_scan(model, post, x, batch_size=16)
    np.testing.assert_allclose(np.asarray(swept), np.asarray(direct),
                               rtol=1e-10, atol=1e-12)

    jitted = jax.jit(lambda p, xq: pathwise_samples_at(
        model, build_pathwise_posterior(model, p, jax.random.PRNGKey(5),
                                        num_bases=32, num_samples=4), xq))
    np.testing.assert_allclose(np.asarray(jitted(params, x)),
                               np.asarray(direct), rtol=1e-9, atol=1e-10)


def test_masked_capacity_padded_cache_serves_like_dense(rng):
    """Capacity-padded CGGP params: pad rows carry zero weight and zero
    kernel coupling, so the padded cache's correction term depends only on
    the real rows.  Oracle: a cache built on the PADDED params must produce
    FINITE samples whose moments match the unpadded closed form (the random
    draws differ in shape, so moment equality — not bitwise — is the
    contract)."""
    x, y, z, u, counts = _setup(rng, n=40, m=12)
    kernel = SquaredExponential()
    cg = ConjugateGradient(1e-12, max_iterations=200)
    model = CGGP(kernel=kernel, conjugate_gradient=cg, num_data=x.shape[0],
                 num_probes=2)
    padded = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                               cluster_counts=counts, capacity=20)
    assert padded["inducing_points"].shape[0] == 20
    post = build_pathwise_posterior(model, padded, jax.random.PRNGKey(3),
                                    num_bases=6000, num_samples=4000)
    # Pad rows must carry exactly zero weight.
    np.testing.assert_array_equal(np.asarray(post.weights[:, 12:]), 0.0)
    x_new = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (20, 2)))
    samples = np.asarray(pathwise_samples_at(model, post, x_new))
    assert np.isfinite(samples).all()
    dense_params = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                                     cluster_counts=counts)
    mu, var = ClusterGP(kernel, num_data=x.shape[0]).predict_f(
        dense_params, x_new)
    np.testing.assert_allclose(samples.mean(axis=0), np.asarray(mu), atol=0.08)
    np.testing.assert_allclose(samples.var(axis=0), np.asarray(var), atol=0.08)
