"""Fused Gram-matvec kernel vs the dense oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.ops.kernels import kernel_by_name
from cggp_tpu.ops.pallas_gram import gram_matvec, kuu_matvec


@pytest.mark.parametrize("kernel_name", ["se", "matern12", "matern32", "matern52"])
def test_gram_matvec_matches_dense(rng, kernel_name):
    n, m, d, r = 70, 33, 3, 2  # deliberately unaligned everywhere
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((m, r)), jnp.float32)
    ell = jnp.asarray(rng.uniform(0.5, 1.5, (d,)), jnp.float32)
    variance = 1.7

    kernel = kernel_by_name(kernel_name)
    kp = kernel.init_params(variance=variance, lengthscales=ell, dtype=jnp.float32)
    expected = kernel.K(kp, x, z) @ v

    out = gram_matvec(
        x / ell, z / ell, v, jnp.asarray(variance, jnp.float32),
        kernel_name=kernel_name, block_n=16, block_m=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_kuu_matvec_matches_dense(rng):
    m, d, r = 21, 2, 3
    z = jnp.asarray(rng.uniform(-1, 1, (m, d)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.1, 0.5, (m,)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((r, m)), jnp.float32)
    ell = jnp.asarray([0.8, 1.2], jnp.float32)
    variance = 0.9

    kernel = kernel_by_name("matern32")
    kp = kernel.init_params(variance=variance, lengthscales=ell, dtype=jnp.float32)
    a = kernel.K(kp, z) + jnp.diag(lam)
    expected = p @ a

    out = kuu_matvec(
        z / ell, lam, p, jnp.asarray(variance, jnp.float32),
        kernel_name="matern32", interpret=True, block_n=16, block_m=16,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_gram_matvec_large_single_block_padding(rng):
    """Exercise the multi-block accumulation path with n > block."""
    n, m, d, r = 100, 50, 5, 1
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((m, r)), jnp.float32)
    kernel = kernel_by_name("se")
    kp = kernel.init_params(variance=1.0, lengthscales=np.ones(d), dtype=jnp.float32)
    expected = kernel.K(kp, x, z) @ v
    out = gram_matvec(
        x, z, v, jnp.asarray(1.0, jnp.float32), kernel_name="se",
        block_n=32, block_m=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)
