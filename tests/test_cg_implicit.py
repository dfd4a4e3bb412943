"""Matrix-free CG vs the dense oracle (solution + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.ops.cg_implicit import blocked_kuu_matvec, make_implicit_cg
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.ops.linalg import add_diagonal


def _system(rng, m=64, d=3):
    kernel = Matern32()
    kp = kernel.init_params(variance=1.4, lengthscales=np.full(d, 0.8))
    z = jnp.asarray(rng.uniform(-1, 1, (m, d)))
    lam = jnp.asarray(rng.uniform(0.1, 0.5, (m,)))
    rhs = jnp.asarray(rng.standard_normal((3, m)))
    return kernel, kp, z, lam, rhs


def test_blocked_matvec_matches_dense(rng):
    kernel, kp, z, lam, rhs = _system(rng, m=64)
    a = add_diagonal(kernel.K(kp, z), lam)
    expected = rhs @ a
    out = blocked_kuu_matvec(kernel, kp, z, lam, rhs, block=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-10)


def test_implicit_cg_matches_dense_solve(rng):
    kernel, kp, z, lam, rhs = _system(rng)
    solve = make_implicit_cg(kernel, 1e-14, 128, block=16)
    solution, stats = solve(kp, z, lam, rhs)
    a = add_diagonal(kernel.K(kp, z), lam)
    expected = jnp.linalg.solve(a, rhs.T).T
    np.testing.assert_allclose(np.asarray(solution), np.asarray(expected), atol=1e-6)
    assert int(stats.steps) > 0


def test_implicit_cg_gradients_match_dense(rng):
    kernel, kp, z, lam, rhs = _system(rng, m=32)
    solve = make_implicit_cg(kernel, 1e-14, 64, block=8)

    def loss_implicit(kp, z, lam):
        sol, _ = solve(kp, z, lam, rhs)
        return jnp.sum(jnp.square(sol))

    def loss_dense(kp, z, lam):
        a = add_diagonal(kernel.K(kp, z), lam)
        sol = jnp.linalg.solve(a, rhs.T).T
        return jnp.sum(jnp.square(sol))

    g_impl = jax.grad(loss_implicit, argnums=(0, 1, 2))(kp, z, lam)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(kp, z, lam)
    for gi, gd in zip(jax.tree_util.tree_leaves(g_impl),
                      jax.tree_util.tree_leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gd), rtol=1e-5, atol=1e-7)


def test_implicit_cg_under_jit(rng):
    kernel, kp, z, lam, rhs = _system(rng, m=32)
    solve = make_implicit_cg(kernel, 1e-12, 64, block=8)

    @jax.jit
    def run(kp, z, lam, rhs):
        sol, stats = solve(kp, z, lam, rhs)
        return sol, stats.steps

    sol, steps = run(kp, z, lam, rhs)
    a = add_diagonal(kernel.K(kp, z), lam)
    expected = jnp.linalg.solve(a, rhs.T).T
    np.testing.assert_allclose(np.asarray(sol), np.asarray(expected), atol=1e-5)


def test_implicit_cg_with_pivchol_preconditioner(rng):
    """Matrix-free solve + matrix-free pivoted-Cholesky preconditioning:
    matches the dense solve and cuts iterations (the giant-M single-chip
    configuration)."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import SpectralPreconditioner
    from cggp_tpu.ops.cg_implicit import make_implicit_cg, pivoted_cholesky_kernel
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    m = 200
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=[2.0, 2.0])
    z = jnp.asarray(rng.normal(size=(m, 2)))
    lam = jnp.asarray(1e-3 * np.ones(m))
    rhs = jnp.asarray(rng.standard_normal((3, m)))

    solve = make_implicit_cg(kernel, 1e-12, max_iterations=4 * m, block=50)
    sol_plain, stats_plain = solve(kp, z, lam, rhs)

    factor = pivoted_cholesky_kernel(kernel, kp, z, 64)
    state = SpectralPreconditioner(factor, lam).state
    sol_pre, stats_pre = solve(kp, z, lam, rhs, state)

    dense = jnp.linalg.solve(add_diagonal(kernel.K(kp, z), lam), rhs.T).T
    np.testing.assert_allclose(np.asarray(sol_pre), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)
    assert int(stats_pre.steps) * 3 < int(stats_plain.steps), (
        int(stats_pre.steps), int(stats_plain.steps))

    # gradients flow with the preconditioned solve
    def loss(kp_):
        s, _ = solve(kp_, z, lam, rhs, state)
        return jnp.sum(s)

    g = jax.grad(loss)(kp)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
