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


def test_pallas_matvec_matches_dense(rng):
    from cggp_tpu.ops.pallas_matvec import pallas_matvec

    r, m = 3, 70  # unaligned
    p = jnp.asarray(rng.standard_normal((r, m)), jnp.float32)
    a0 = rng.standard_normal((m, m))
    a = jnp.asarray(a0 + a0.T, jnp.float32)
    expected = p @ a
    out = pallas_matvec(p, a, block_i=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-4)


def test_cg_with_pallas_matvec_matches_xla(rng):
    """ConjugateGradient(matvec_impl="pallas") must agree with the XLA path
    (interpret mode under CPU)."""
    import jax

    from cggp_tpu.ops.cg import conjugate_gradient
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    # interpret=False pallas doesn't run on CPU; monkeypatch via interpret mode
    from jax.experimental.pallas import tpu as pltpu

    m = 40
    kernel = SquaredExponential()
    kp = kernel.init_params(dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (m, 2)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.2, 0.5, (m,)), jnp.float32)
    a = add_diagonal(kernel.K(kp, z), lam)
    rhs = jnp.asarray(rng.standard_normal((4, m)), jnp.float32)

    sol_xla, _ = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-10,
                                    max_iterations=m)
    with pltpu.force_tpu_interpret_mode():
        sol_pallas, _ = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-10,
                                           max_iterations=m, matvec_impl="pallas")
    np.testing.assert_allclose(np.asarray(sol_pallas), np.asarray(sol_xla),
                               rtol=1e-4, atol=1e-4)
