"""RFF Monte-Carlo convergence tests (reference rff_test.py:9-69 pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.ops import kernel_by_name
from cggp_tpu.ops.rff import basis_theta_parameter, basis_vectors, rff_basis, rff_sample


@pytest.mark.parametrize("name", ["se", "matern32", "matern52"])
def test_rff_kernel_approximation(name, rng):
    """Phi Phi^T * variance / L converges to K (reference rff_test.py:9-28)."""
    n, dim, num_bases = 30, 2, 100_000
    x = jnp.asarray(rng.normal(size=(n, dim)))
    kernel = kernel_by_name(name)
    params = kernel.init_params(variance=1.1, lengthscales=[0.9, 1.4])

    u = rff_basis(x, kernel, params, num_bases, jax.random.PRNGKey(0))
    approx = np.asarray(u @ u.T)
    exact = np.asarray(kernel.K(params, x))
    np.testing.assert_allclose(approx, exact, atol=2e-2)


@pytest.mark.parametrize("name", ["se", "matern32"])
def test_rff_sample_covariance(name, rng):
    """Empirical covariance of prior samples approaches the kernel (rff_test.py:52-69)."""
    n, dim = 20, 2
    x = jnp.asarray(rng.normal(size=(n, dim)))
    kernel = kernel_by_name(name)
    params = kernel.init_params(variance=1.0, lengthscales=[1.0, 1.0])

    # 2k bases x 5k samples keeps MC error ~0.03 (atol 0.06) at 1/4 the
    # wall time of the original 4k x 10k (the [S, L] weight draw dominates).
    samples = rff_sample(x, kernel, params, num_bases=2_000,
                         key=jax.random.PRNGKey(3), num_samples=5_000)
    emp_cov = np.cov(np.asarray(samples), rowvar=False)
    exact = np.asarray(kernel.K(params, x))
    np.testing.assert_allclose(emp_cov, exact, atol=0.06)


def test_theta_spectral_density_se(rng):
    """SE frequencies have per-dimension std 1/lengthscale."""
    kernel = kernel_by_name("se")
    ell = np.array([0.5, 2.0])
    params = kernel.init_params(variance=1.0, lengthscales=ell)
    theta = np.asarray(
        basis_theta_parameter(kernel, params, 200_000, jax.random.PRNGKey(4))
    )
    np.testing.assert_allclose(theta.std(axis=0), 1.0 / ell, rtol=0.02)
    np.testing.assert_allclose(theta.mean(axis=0), [0.0, 0.0], atol=0.02)


def test_basis_vectors_shape(rng):
    x = jnp.asarray(rng.normal(size=(7, 3)))
    theta = jnp.asarray(rng.normal(size=(13, 3)))
    phi = basis_vectors(x, theta)
    assert phi.shape == (7, 26)
    # cos^2 + sin^2 == 1
    np.testing.assert_allclose(
        np.asarray(phi[:, :13] ** 2 + phi[:, 13:] ** 2), np.ones((7, 13)), atol=1e-12
    )
