"""Oracle tests for kernels and bijectors vs NumPy closed forms."""

import numpy as np
import jax.numpy as jnp
import pytest

from cggp_tpu.ops import kernel_by_name, positive
from cggp_tpu.ops.kernels import Kernel


def _numpy_kernel(name, x, y, variance, lengthscales):
    xs = x / lengthscales
    ys = y / lengthscales
    r2 = ((xs[:, None, :] - ys[None, :, :]) ** 2).sum(-1)
    r = np.sqrt(np.maximum(r2, 0.0))
    if name == "se":
        return variance * np.exp(-0.5 * r2)
    if name == "matern12":
        return variance * np.exp(-r)
    if name == "matern32":
        return variance * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    if name == "matern52":
        return variance * (1 + np.sqrt(5) * r + 5 / 3 * r2) * np.exp(-np.sqrt(5) * r)
    raise ValueError(name)


@pytest.mark.parametrize("name", ["se", "matern12", "matern32", "matern52"])
def test_kernel_matches_closed_form(name, rng):
    x = rng.normal(size=(17, 3))
    y = rng.normal(size=(11, 3))
    variance = 1.3
    lengthscales = np.array([0.7, 1.1, 2.0])

    kernel = kernel_by_name(name)
    params = kernel.init_params(variance=variance, lengthscales=lengthscales)

    k_xy = np.asarray(kernel.K(params, jnp.asarray(x), jnp.asarray(y)))
    expected = _numpy_kernel(name, x, y, variance, lengthscales)
    np.testing.assert_allclose(k_xy, expected, rtol=1e-10, atol=1e-12)

    k_diag = np.asarray(kernel.K_diag(params, jnp.asarray(x)))
    np.testing.assert_allclose(k_diag, np.full(17, variance), rtol=1e-9)

    # Symmetric Gram
    k_xx = np.asarray(kernel.K(params, jnp.asarray(x)))
    np.testing.assert_allclose(k_xx, k_xx.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(k_xx), np.full(17, variance), rtol=1e-9, atol=1e-12)


def test_positive_bijector_roundtrip():
    bij = positive(1e-6)
    values = jnp.asarray([1e-5, 0.1, 1.0, 100.0], dtype=jnp.float64)
    raw = bij.inverse(values)
    np.testing.assert_allclose(np.asarray(bij.forward(raw)), np.asarray(values), rtol=1e-9)
    # forward always respects the lower bound
    assert np.all(np.asarray(bij.forward(jnp.asarray([-50.0, -1e3]))) >= 1e-6)


def test_kernel_param_roundtrip():
    kernel = Kernel("matern32")
    params = kernel.init_params(variance=2.5, lengthscales=[0.5, 1.5])
    np.testing.assert_allclose(float(kernel.variance(params)), 2.5, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(kernel.lengthscales(params)), [0.5, 1.5], rtol=1e-9)


def test_kernel_is_hashable_static():
    assert hash(Kernel("se")) == hash(Kernel("se"))
    assert Kernel("se") == Kernel("se")
    assert Kernel("se") != Kernel("matern32")
