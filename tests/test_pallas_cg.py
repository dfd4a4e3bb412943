"""VMEM-resident Pallas CG vs the dense oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from cggp_tpu.ops.kernels import SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.ops.pallas_cg import pallas_cg_solve


def _system(rng, m=70, r=5):
    kernel = SquaredExponential()
    kp = kernel.init_params(dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (m, 2)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.2, 0.6, (m,)), jnp.float32)
    a = add_diagonal(kernel.K(kp, z), lam)
    rhs = jnp.asarray(rng.standard_normal((r, m)), jnp.float32)
    return a, rhs


def test_pallas_cg_matches_dense(rng):
    a, rhs = _system(rng)
    sol, steps = pallas_cg_solve(a, rhs, 1e-10, 256, interpret=True)
    expected = jnp.linalg.solve(jnp.asarray(a, jnp.float64),
                                jnp.asarray(rhs, jnp.float64).T).T
    np.testing.assert_allclose(np.asarray(sol), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)
    assert 0 < int(steps) <= 256


def test_pallas_cg_threshold_stops_early(rng):
    a, rhs = _system(rng)
    _, steps_loose = pallas_cg_solve(a, rhs, 1e-2, 256, interpret=True)
    _, steps_tight = pallas_cg_solve(a, rhs, 1e-10, 256, interpret=True)
    assert int(steps_loose) < int(steps_tight)


def test_conjugate_gradient_pallas_resident_path(rng):
    """ConjugateGradient(matvec_impl="pallas_resident") matches the XLA loop
    — values, stats, and gradients (interpret mode on CPU)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from cggp_tpu.ops.cg import ConjugateGradient, conjugate_gradient

    a, rhs = _system(rng, m=40, r=3)

    sol_ref, stats_ref = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-10,
                                            max_iterations=80)
    with pltpu.force_tpu_interpret_mode():
        sol, stats = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-10,
                                        max_iterations=80,
                                        matvec_impl="pallas_resident")
        # gradients through the custom VJP (backward also in-kernel)
        def loss(a):
            s, _ = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-10,
                                      max_iterations=80,
                                      matvec_impl="pallas_resident")
            return jnp.sum(jnp.square(s))
        g = jax.grad(loss)(a)

    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref), rtol=1e-4, atol=1e-5)
    assert float(stats.error.max()) <= 2e-10

    def loss_ref(a):
        s, _ = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-10, max_iterations=80)
        return jnp.sum(jnp.square(s))
    g_ref = jax.grad(loss_ref)(a)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-2, atol=1e-4)


def test_pallas_resident_falls_back_when_ineligible(rng):
    """Preconditioned / restarting / compensated configs must fall back to
    the loop path rather than mis-solve."""
    from cggp_tpu.ops.cg import NystromPreconditioner, conjugate_gradient

    a, rhs = _system(rng, m=24, r=2)
    factor = jnp.asarray(np.random.RandomState(0).standard_normal((24, 8)), jnp.float32)
    precond = NystromPreconditioner(factor, 0.3 * jnp.ones(24, jnp.float32))
    sol, _ = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-10,
                                preconditioner=precond, max_iterations=48,
                                matvec_impl="pallas_resident")
    expected = jnp.linalg.solve(jnp.asarray(a, jnp.float64),
                                jnp.asarray(rhs, jnp.float64).T).T
    np.testing.assert_allclose(np.asarray(sol), np.asarray(expected), rtol=1e-3, atol=1e-3)
