"""CG oracle tests: solution AND gradient parity vs dense solves.

Mirrors the reference test strategy (cg_test.py:12-46): solve a kernel system
with multiple RHS, compare against the dense solver, and compare gradients of
a scalar functional w.r.t. the kernel parameters between the CG
custom-VJP path and dense-solve autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.ops import (
    BlockPreconditioner,
    ConjugateGradient,
    EyePreconditioner,
    NystromPreconditioner,
    SquaredExponential,
    add_diagonal,
    conjugate_gradient,
)


def _make_system(rng, n=100, dim=2, num_systems=5, noise=0.01):
    inputs = jnp.asarray(rng.normal(size=(n, dim)))
    kernel = SquaredExponential()
    lengthscales = rng.random(dim) ** 2 + 0.5
    params = kernel.init_params(variance=1.3, lengthscales=lengthscales)
    rhs = jnp.asarray(rng.normal(size=(n, num_systems)))
    return kernel, params, inputs, rhs, noise


def _system_matrix(kernel, params, inputs, noise):
    k = kernel.K(params, inputs)
    return add_diagonal(k, noise * jnp.ones(k.shape[0], dtype=k.dtype))


def test_cg_matches_dense_solution(rng):
    kernel, params, inputs, rhs, noise = _make_system(rng)
    matrix = _system_matrix(kernel, params, inputs, noise)

    dense = jnp.linalg.solve(matrix, rhs)
    cg = ConjugateGradient(1e-12)
    cg_solution = cg(matrix, rhs)

    np.testing.assert_allclose(np.asarray(cg_solution), np.asarray(dense), rtol=1e-3, atol=1e-4)


def test_cg_gradient_matches_dense(rng):
    kernel, params, inputs, rhs, noise = _make_system(rng)

    def loss_dense(params):
        matrix = _system_matrix(kernel, params, inputs, noise)
        return jnp.sum(jnp.linalg.solve(matrix, rhs))

    def loss_cg(params):
        matrix = _system_matrix(kernel, params, inputs, noise)
        cg = ConjugateGradient(1e-12)
        return jnp.sum(cg(matrix, rhs))

    g_dense = jax.grad(loss_dense)(params)
    g_cg = jax.grad(loss_cg)(params)

    for key in ("variance", "lengthscales"):
        np.testing.assert_allclose(
            np.asarray(g_cg[key]), np.asarray(g_dense[key]), rtol=1e-3, atol=1e-3
        )


def test_cg_stats_and_threshold(rng):
    kernel, params, inputs, rhs, noise = _make_system(rng)
    matrix = _system_matrix(kernel, params, inputs, noise)

    cg = ConjugateGradient(1e-12)
    solution, stats = cg.solve_with_stats(matrix, rhs)
    assert int(stats.steps) > 0
    assert int(stats.steps) <= matrix.shape[0]
    # true residuals are small (the loop stops on the recurrence residual,
    # which drifts from the true one by rounding — allow slack)
    residual = rhs - matrix @ solution
    assert float(jnp.max(0.5 * jnp.sum(residual**2, axis=0))) <= 1e-8


def test_cg_stats_converged_flag(rng):
    """CGStats.converged reflects the exit-time stop rule exactly: True when
    the threshold was met (even on the last permitted iteration), False when
    the cap cut the solve short."""
    kernel, params, inputs, rhs, noise = _make_system(rng)
    matrix = _system_matrix(kernel, params, inputs, noise)

    # An achievable threshold (1e-12 legitimately caps out on this
    # ill-conditioned SE system — and converged correctly reports that).
    _, stats = ConjugateGradient(1e-6).solve_with_stats(matrix, rhs)
    assert int(stats.steps) < matrix.shape[0]
    assert bool(stats.converged)

    # Cap at the natural step count: steps == cap AND converged.
    cap = int(stats.steps)
    _, stats_capped = ConjugateGradient(
        1e-6, max_iterations=cap
    ).solve_with_stats(matrix, rhs)
    assert int(stats_capped.steps) == cap
    assert bool(stats_capped.converged)

    # Starve the solve: unconverged.
    _, stats_starved = ConjugateGradient(
        1e-14, max_iterations=2
    ).solve_with_stats(matrix, rhs)
    assert not bool(stats_starved.converged)


def test_mixed_precision_loops_respect_iteration_cap(rng):
    """bf16_ru / bf16_ir must honor max_iterations exactly: the reliable-
    update cycle and the refinement's inner solves are clamped to the
    remaining budget (they previously overshot by up to a full cycle)."""
    kernel, params, inputs, rhs, noise = _make_system(rng)
    matrix = _system_matrix(kernel, params, inputs, noise).astype(jnp.float32)
    rhs32 = rhs.T.astype(jnp.float32)

    for impl in ("bf16_ru", "bf16_ir"):
        for cap in (2, 7):
            _, stats = conjugate_gradient(
                matrix, rhs32, jnp.zeros_like(rhs32), 1e-14,
                max_iterations=cap, matvec_impl=impl,
            )
            assert int(stats.steps) <= cap, (impl, cap, int(stats.steps))
            assert not bool(stats.converged)


def test_cg_restart_cycle(rng):
    """max_steps_cycle triggers an exact residual recompute and still converges."""
    kernel, params, inputs, rhs, noise = _make_system(rng)
    matrix = _system_matrix(kernel, params, inputs, noise)
    sol, stats = conjugate_gradient(
        matrix,
        rhs.T,
        jnp.zeros_like(rhs.T),
        1e-12,
        max_iterations=500,
        max_steps_cycle=50,
    )
    # restarts drop Krylov memory, so more steps than plain CG but converged
    assert int(stats.steps) > matrix.shape[0]
    dense = jnp.linalg.solve(matrix, rhs)
    np.testing.assert_allclose(np.asarray(sol.T), np.asarray(dense), rtol=1e-3, atol=1e-4)


def test_cg_under_jit(rng):
    kernel, params, inputs, rhs, noise = _make_system(rng)
    matrix = _system_matrix(kernel, params, inputs, noise)
    cg = ConjugateGradient(1e-12)

    @jax.jit
    def solve(matrix, rhs):
        return cg(matrix, rhs)

    np.testing.assert_allclose(
        np.asarray(solve(matrix, rhs)),
        np.asarray(jnp.linalg.solve(matrix, rhs)),
        rtol=1e-3,
        atol=1e-4,
    )


@pytest.mark.parametrize("precond_name", ["eye", "block", "nystrom"])
def test_preconditioned_cg_solution(rng, precond_name):
    kernel, params, inputs, rhs, noise = _make_system(rng, n=96)
    matrix = _system_matrix(kernel, params, inputs, noise)

    if precond_name == "eye":
        precond = EyePreconditioner()
    elif precond_name == "block":
        indices = np.arange(96).reshape(8, 12)
        precond = BlockPreconditioner(indices)
    else:
        # Nystrom factor from a column subset: U = K[:, idx] chol(K[idx, idx])^{-T}
        idx = np.arange(0, 96, 4)
        kmm = np.asarray(matrix)[np.ix_(idx, idx)]
        chol = np.linalg.cholesky(kmm + 1e-8 * np.eye(len(idx)))
        u = np.asarray(matrix)[:, idx] @ np.linalg.inv(chol).T
        precond = NystromPreconditioner(jnp.asarray(u), noise * jnp.ones(96))

    # Block-Jacobi over arbitrary index blocks can legitimately need more
    # than n iterations on a kernel matrix; give all variants headroom.
    cg = ConjugateGradient(1e-12, preconditioner=precond, max_iterations=500)
    solution, stats = cg.solve_with_stats(matrix, rhs)
    dense = jnp.linalg.solve(matrix, rhs)
    np.testing.assert_allclose(np.asarray(solution), np.asarray(dense), rtol=1e-3, atol=1e-4)


def test_nystrom_preconditioner_reduces_iterations(rng):
    """A good low-rank preconditioner must cut CG iteration counts."""
    n, m_rank = 200, 64
    inputs = jnp.asarray(rng.normal(size=(n, 2)))
    kernel = SquaredExponential()
    params = kernel.init_params(variance=1.0, lengthscales=[2.0, 2.0])
    matrix = add_diagonal(kernel.K(params, inputs), 1e-3 * jnp.ones(n))
    rhs = jnp.asarray(rng.normal(size=(n, 3)))

    _, stats_plain = ConjugateGradient(1e-10).solve_with_stats(matrix, rhs)

    idx = np.linspace(0, n - 1, m_rank).astype(int)
    kmm = np.asarray(matrix)[np.ix_(idx, idx)]
    chol = np.linalg.cholesky(kmm + 1e-8 * np.eye(m_rank))
    u = np.linalg.solve(chol, np.asarray(matrix)[idx, :]).T
    precond = NystromPreconditioner(jnp.asarray(u), 1e-3 * jnp.ones(n))
    _, stats_pre = ConjugateGradient(1e-10, preconditioner=precond).solve_with_stats(matrix, rhs)

    assert int(stats_pre.steps) < int(stats_plain.steps)


def test_compensated_dot_matches_standard(rng):
    kernel, params, inputs, rhs, noise = _make_system(rng)
    matrix = _system_matrix(kernel, params, inputs, noise)
    dense = np.asarray(jnp.linalg.solve(matrix, rhs))
    sol_std = ConjugateGradient(1e-12, dot="standard")(matrix, rhs)
    sol_comp = ConjugateGradient(1e-12, dot="compensated")(matrix, rhs)
    np.testing.assert_allclose(np.asarray(sol_std), dense, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol_comp), dense, rtol=1e-3, atol=1e-4)


def test_rff_preconditioner_reduces_cg_iterations(rng):
    """The net-new RFF preconditioner must cut iterations on an
    ill-conditioned SE system (BASELINE.md config 4)."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import ConjugateGradient, EyePreconditioner
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal
    from cggp_tpu.ops.rff import rff_preconditioner

    m, d = 256, 2
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=2.0, lengthscales=np.full(d, 1.5))
    z = jnp.asarray(rng.uniform(-1, 1, (m, d)))
    lam = jnp.asarray(rng.uniform(1e-3, 5e-3, (m,)))  # tiny diag -> ill-conditioned
    a = add_diagonal(kernel.K(kp, z), lam)
    rhs = jnp.asarray(rng.standard_normal((m, 2)))

    solve_eye = ConjugateGradient(1e-10, preconditioner=EyePreconditioner(),
                                  max_iterations=m)
    precond = rff_preconditioner(kernel, kp, z, lam, 512, jax.random.PRNGKey(0))
    solve_rff = ConjugateGradient(1e-10, preconditioner=precond, max_iterations=m)

    sol_eye, stats_eye = solve_eye.solve_with_stats(a, rhs)
    sol_rff, stats_rff = solve_rff.solve_with_stats(a, rhs)

    expected = jnp.linalg.solve(a, rhs)
    np.testing.assert_allclose(np.asarray(sol_rff), np.asarray(expected), atol=1e-3)
    assert int(stats_rff.steps) < int(stats_eye.steps), (
        f"rff {int(stats_rff.steps)} vs eye {int(stats_eye.steps)}"
    )


def test_cg_bf16_matvec_converges_on_well_conditioned_system(rng):
    """xla_bf16 matvec: half the HBM bytes; converges to the bf16 floor on a
    covertree-conditioned (moderate condition number) system."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import conjugate_gradient
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    m = 128
    kernel = SquaredExponential()
    kp = kernel.init_params(dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-2, 2, (m, 3)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.3, 0.6, (m,)), jnp.float32)
    a = add_diagonal(kernel.K(kp, z), lam)
    rhs = jnp.asarray(rng.standard_normal((4, m)), jnp.float32)

    sol_bf16, _ = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 1e-5,
                                     max_iterations=m, matvec_impl="xla_bf16")
    expected = jnp.linalg.solve(jnp.asarray(a, jnp.float64),
                                jnp.asarray(rhs, jnp.float64).T).T
    rel = float(jnp.linalg.norm(sol_bf16 - expected) / jnp.linalg.norm(expected))
    assert rel < 5e-2, rel


def test_pivoted_cholesky_factorization(rng):
    """Greedy pivoted Cholesky must reproduce the matrix at full rank and
    decay monotonically in trace error with rank."""
    import jax.numpy as jnp

    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import pivoted_cholesky

    n = 120
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.3, lengthscales=[1.5, 1.5])
    x = jnp.asarray(rng.normal(size=(n, 2)))
    kmat = kernel.K(kp, x)

    errs = []
    for rank in (4, 16, 64, n):
        ell = pivoted_cholesky(kmat, rank)
        errs.append(float(jnp.abs(kmat - ell @ ell.T).max()))
    assert errs[0] > errs[1] > errs[2], errs
    assert errs[-1] < 1e-10, errs  # full rank: exact (fp64)
    # over-requesting rank beyond numerical rank is safe (zero columns)
    ell = pivoted_cholesky(kmat, n)
    assert bool(jnp.isfinite(ell).all())


def test_spectral_preconditioner_applies_exact_woodbury_inverse(rng):
    """SpectralPreconditioner == (U U^T + diag(lam))^{-1}, with a positive
    self-consistent rz, in fp64."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import SpectralPreconditioner

    n, k = 60, 20
    u = jnp.asarray(rng.normal(size=(n, k)))
    lam = jnp.asarray(rng.uniform(0.1, 0.5, (n,)))
    vec = jnp.asarray(rng.normal(size=(5, n)))

    precond = SpectralPreconditioner(u, lam)
    z, rz = precond(vec, None)

    target = np.asarray(vec) @ np.linalg.inv(
        np.asarray(u) @ np.asarray(u).T + np.diag(np.asarray(lam))
    )
    np.testing.assert_allclose(np.asarray(z), target, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(rz)[:, 0], np.sum(np.asarray(z) * np.asarray(vec), axis=1),
        rtol=1e-8,
    )
    assert bool((rz > 0).all())


def test_spectral_preconditioner_stays_spd_in_fp32(rng):
    """The fp32 regime that breaks the plain Woodbury form (||U||^2/min(lam)
    large): the stable apply must keep rz positive and still solve."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import ConjugateGradient, pivoted_cholesky_preconditioner
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    n = 256
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=[2.0, 2.0], dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    kmat = kernel.K(kp, x)
    lam = jnp.asarray(1e-4 * np.ones(n), jnp.float32)  # 1/lam = 1e4: cancellation regime
    a = add_diagonal(kmat, lam)
    rhs = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    _, stats_plain = ConjugateGradient(1e-8, max_iterations=4 * n).solve_with_stats(a, rhs)
    precond = pivoted_cholesky_preconditioner(kmat, lam, 64)
    sol, stats_pre = ConjugateGradient(
        1e-8, preconditioner=precond, max_iterations=4 * n
    ).solve_with_stats(a, rhs)

    expected = np.linalg.solve(np.asarray(a, np.float64), np.asarray(rhs, np.float64))
    rel = np.abs(np.asarray(sol, np.float64) - expected).max() / np.abs(expected).max()
    assert rel < 5e-2, rel
    # the whole point: a several-fold iteration cut where RFF/Woodbury regressed
    assert int(stats_pre.steps) * 4 < int(stats_plain.steps), (
        int(stats_pre.steps), int(stats_plain.steps))


def test_pivoted_cholesky_preconditioner_cuts_iterations_fp64(rng):
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import ConjugateGradient, pivoted_cholesky_preconditioner
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    n = 300
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=[1.5, 1.5])
    x = jnp.asarray(rng.normal(size=(n, 2)))
    kmat = kernel.K(kp, x)
    lam = jnp.asarray(1e-6 * np.ones(n))
    a = add_diagonal(kmat, lam)
    rhs = jnp.asarray(rng.standard_normal((n, 4)))

    _, stats_plain = ConjugateGradient(1e-14, max_iterations=5000).solve_with_stats(a, rhs)
    precond = pivoted_cholesky_preconditioner(kmat, lam, 64)
    sol, stats_pre = ConjugateGradient(
        1e-14, preconditioner=precond, max_iterations=5000
    ).solve_with_stats(a, rhs)

    expected = np.asarray(jnp.linalg.solve(a, rhs))
    # cond(A) ~ 1e9: element-wise rtol is meaningless on the small entries;
    # gate on the norm-relative error instead.
    rel = np.abs(np.asarray(sol) - expected).max() / np.abs(expected).max()
    assert rel < 1e-4, rel
    assert int(stats_pre.steps) * 10 < int(stats_plain.steps), (
        int(stats_pre.steps), int(stats_plain.steps))


def test_chol_preconditioner_converges_in_refinement_iterations(rng):
    """The exact-factor preconditioner turns PCG into iterative refinement:
    on an ill-conditioned system it must converge in a handful of
    iterations (vs hundreds unpreconditioned) to the dense solution."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import CholPreconditioner, ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    n = 300
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=[1.5, 1.5])
    x = jnp.asarray(rng.normal(size=(n, 2)))
    kmat = kernel.K(kp, x)
    lam = jnp.asarray(1e-6 * np.ones(n))
    a = add_diagonal(kmat, lam)
    rhs = jnp.asarray(rng.standard_normal((n, 4)))

    _, stats_plain = ConjugateGradient(
        1e-14, max_iterations=5000).solve_with_stats(a, rhs)
    precond = CholPreconditioner(kmat, lam)
    sol, stats_pre = ConjugateGradient(
        1e-14, preconditioner=precond, max_iterations=5000
    ).solve_with_stats(a, rhs)

    expected = np.asarray(jnp.linalg.solve(a, rhs))
    rel = np.abs(np.asarray(sol) - expected).max() / np.abs(expected).max()
    assert rel < 1e-6, rel
    # Exact factor in fp64: refinement converges almost immediately.
    assert int(stats_pre.steps) <= 4, int(stats_pre.steps)
    assert int(stats_pre.steps) * 20 < int(stats_plain.steps), (
        int(stats_pre.steps), int(stats_plain.steps))


def test_chol_preconditioner_spd_and_fallback(rng):
    """The chol-preconditioner operator is W^T W (SPD by construction) with
    rz = ||r W^T||^2 >= 0 always; a matrix whose Cholesky fails (non-finite
    factor) must fall back to the identity state = plain CG, never
    propagate NaNs into the solve."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import CholPreconditioner, ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    n = 64
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=[1.0, 1.0])
    x = jnp.asarray(rng.normal(size=(n, 2)))
    kmat = kernel.K(kp, x)
    a = add_diagonal(kmat, 1e-2 * jnp.ones(n))
    vec = jnp.asarray(rng.standard_normal((5, n)))

    precond = CholPreconditioner(kmat, 1e-2 * jnp.ones(n))
    z, rz = precond(vec, a)
    assert np.all(np.asarray(rz) > 0)
    # z = vec @ W^T W with W = L^{-1}: multiplying back by A recovers vec.
    np.testing.assert_allclose(np.asarray(z @ a), np.asarray(vec),
                               rtol=1e-8, atol=1e-10)

    # Indefinite input: cholesky produces NaNs -> identity fallback.
    broken = CholPreconditioner(-a, jnp.zeros(n))
    np.testing.assert_array_equal(
        np.asarray(broken.state["chol_w"]), np.eye(n))
    z_b, rz_b = broken(vec, a)
    np.testing.assert_array_equal(np.asarray(z_b), np.asarray(vec))
    np.testing.assert_allclose(
        np.asarray(rz_b),
        np.sum(np.asarray(vec) ** 2, axis=-1, keepdims=True), rtol=1e-12)

    # And a solve with the broken preconditioner behaves exactly like
    # plain CG (converges, matches dense).
    rhs = jnp.asarray(rng.standard_normal((n, 3)))
    sol, stats = ConjugateGradient(
        1e-14, preconditioner=broken, max_iterations=500
    ).solve_with_stats(a, rhs)
    _, stats_plain = ConjugateGradient(
        1e-14, max_iterations=500).solve_with_stats(a, rhs)
    np.testing.assert_allclose(np.asarray(sol),
                               np.asarray(jnp.linalg.solve(a, rhs)),
                               rtol=1e-6, atol=1e-9)
    assert int(stats.steps) == int(stats_plain.steps)


def test_chol_preconditioner_fp32_ill_conditioned(rng):
    """fp32, kappa ~ 1e6: the fp32 residual FLOOR is ~eps*kappa relative
    (no solver beats it), so the meaningful claims are comparative — at an
    equal iteration budget the fp32-degraded exact factor drives the true
    residual orders of magnitude closer to that floor than plain CG, stays
    finite, and never produces a negative rz (the SPD-by-construction
    apply) — the regime raw Cholesky SOLVES are unsafe in."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import CholPreconditioner, ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    n = 256
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=2.0, lengthscales=[1.5, 1.5],
                            dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    kmat = kernel.K(kp, x)
    lam = jnp.asarray(rng.uniform(1e-4, 5e-4, (n,)), jnp.float32)
    a = add_diagonal(kmat, lam)
    rhs = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)

    def rel_res(sol):
        res = np.asarray(a, np.float64) @ np.asarray(sol, np.float64) - \
            np.asarray(rhs, np.float64)
        return (np.linalg.norm(res, axis=0) /
                np.linalg.norm(np.asarray(rhs, np.float64), axis=0)).max()

    budget = 32
    precond = CholPreconditioner(kmat, lam)
    sol_pre, _ = ConjugateGradient(
        1e-12, preconditioner=precond, max_iterations=budget,
        relative_threshold=True,
    ).solve_with_stats(a, rhs)
    sol_plain, _ = ConjugateGradient(
        1e-12, max_iterations=budget, relative_threshold=True,
    ).solve_with_stats(a, rhs)

    assert np.isfinite(np.asarray(sol_pre)).all()
    r_pre, r_plain = rel_res(sol_pre), rel_res(sol_plain)
    assert r_pre < 0.05, r_pre  # at/near the eps*kappa fp32 floor
    assert r_pre * 20 < r_plain, (r_pre, r_plain)

    # rz stays a sum of squares even with the degraded factor.
    z, rz = precond(jnp.asarray(rng.standard_normal((8, n)), jnp.float32), a)
    assert np.isfinite(np.asarray(z)).all()
    assert np.all(np.asarray(rz) >= 0)


def test_relative_threshold_scale_invariance(rng):
    """Net-new stopping rule: with relative_threshold the iteration count is
    invariant to RHS scaling, where the reference's absolute rule is not."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    n = 128
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=[1.0, 1.0])
    x = jnp.asarray(rng.normal(size=(n, 2)))
    a = add_diagonal(kernel.K(kp, x), 0.1 * jnp.ones(n))
    rhs = jnp.asarray(rng.standard_normal((n, 3)))

    rel = ConjugateGradient(1e-12, max_iterations=n, relative_threshold=True)
    _, s1 = rel.solve_with_stats(a, rhs)
    _, s2 = rel.solve_with_stats(a, 1e4 * rhs)
    assert int(s1.steps) == int(s2.steps)

    absolute = ConjugateGradient(1e-12, max_iterations=n)
    _, a1 = absolute.solve_with_stats(a, rhs)
    _, a2 = absolute.solve_with_stats(a, 1e4 * rhs)
    assert int(a2.steps) > int(a1.steps)  # absolute rule is scale-dependent

    # and the relative solve is still correct (residual 1e-6 relative =>
    # solution error ~ cond * 1e-6)
    sol, _ = rel.solve_with_stats(a, rhs)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(jnp.linalg.solve(a, rhs)),
                               rtol=1e-3, atol=1e-4)


def test_mixed_precision_solvers_reach_fp32_thresholds(rng):
    """bf16_ir / bf16_ru (net-new, no reference twin): the hot loop streams a
    bf16 matrix copy, yet exact-fp32 residual anchoring reaches thresholds
    plain bf16 CG cannot (docs/PERF.md measured its floor at ~1e-2 relative).

    Mixed-precision refinement converges when kappa(A) * eps_bf16 is
    comfortably below 1 (the classic IR envelope), so the test system is a
    well-conditioned Gram + diagonal — the covertree-conditioned regime the
    production models produce.  Ill-conditioned/tight-absolute solves should
    stay on the fp32 path (documented in ir_cg_loop/mixed_cg_loop)."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import conjugate_gradient

    n, m = 256, 4
    q = rng.standard_normal((n, n)).astype(np.float32)
    a = jnp.asarray(q @ q.T / n + 0.5 * np.eye(n, dtype=np.float32))
    rhs = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    dense = jnp.linalg.solve(a, rhs.T).T

    for impl in ("bf16_ir", "bf16_ru"):
        sol, stats = conjugate_gradient(
            a, rhs, jnp.zeros_like(rhs), 1e-10,
            max_iterations=600, max_steps_cycle=601, matvec_impl=impl,
        )
        np.testing.assert_allclose(np.asarray(sol), np.asarray(dense),
                                   rtol=1e-4, atol=1e-4, err_msg=impl)
        # Converged to the requested fp32-level threshold: ~8 orders below
        # what a plain bf16 matvec loop can reach.
        assert float(stats.error.max()) <= 1e-10, (impl, stats)


def test_bf16_envelope_guard_routes_out_of_envelope_solves(rng):
    """check_bf16_envelope (round-4): a bf16_ir/ru facade solve on a system
    OUTSIDE the measured mixed-precision envelope (lambda_min ~ 2e-4, the
    covertree-training regime where the refinement stalls) warns and routes
    to xla_high; a bench-regime system (lambda >= 0.05) stays on the
    configured bf16 impl; under jit the tracer passes through unchecked."""
    import warnings as _warnings

    import jax
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32

    n = 256
    kernel = Matern32()
    kp = kernel.init_params(1.0, np.ones(2), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    gram = kernel.K(kp, z)
    rhs = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    # Covertree-training shape: Lambda ~ 2e-4 -> eps_bf16 * max|K_offdiag|
    # (~3.9e-3) dominates lambda_min.
    a_ill = gram + 2e-4 * jnp.eye(n, dtype=jnp.float32)
    # Bench shape: Lambda in [0.05, 0.5] keeps lambda_min >= 0.05.
    lam = jnp.asarray(rng.uniform(0.05, 0.5, (n,)), jnp.float32)
    a_ok = gram + jnp.diag(lam)

    for impl in ("bf16_ir", "bf16_ru"):
        # kappa ~ 1e7 at Lambda=2e-4: unpreconditioned fp32 CG needs well
        # over n rounding-perturbed iterations to dig the residual down.
        solver = ConjugateGradient(1e-5, max_iterations=4000,
                                   relative_threshold=True, matvec_impl=impl)
        with pytest.warns(RuntimeWarning, match="envelope"):
            assert solver.check_bf16_envelope(a_ill) == "xla_high"
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # in-envelope must NOT warn
            assert solver.check_bf16_envelope(a_ok) == impl

        # The facade applies the guard: the out-of-envelope solve warns and
        # makes real fp32 progress (kappa ~ 1e4/2e-4 is too steep to fully
        # converge in n unpreconditioned iterations, but the relative
        # residual must land far below the ~1e-2 bf16 stall floor the guard
        # exists to avoid).
        with pytest.warns(RuntimeWarning, match="envelope"):
            sol, _stats = solver.solve_with_stats(a_ill, rhs)
        rel_res = float(
            jnp.linalg.norm(a_ill @ sol - rhs) / jnp.linalg.norm(rhs))
        # fp32 rounding floors around ~4e-3 at this kappa without a
        # preconditioner; the routing claim is that the solve digs well
        # under the bf16 stall floor (~1e-2 relative, docs/PERF.md).
        assert rel_res < 8e-3, rel_res

        # Under jit the matrix is a tracer: configured impl passes through.
        traced = {}

        @jax.jit
        def probe(mat):
            traced["impl"] = solver.check_bf16_envelope(mat)
            return mat

        probe(a_ill)
        assert traced["impl"] == impl

    # Non-bf16 impls skip the estimate entirely.
    assert ConjugateGradient(1e-5).check_bf16_envelope(a_ill) == "xla"


def test_xla_high_matvec_solves_and_differentiates(rng):
    """matvec_impl="xla_high" (bf16x3 MXU emulation — half of HIGHEST's six
    passes) must match the fp32 path through the façade, value AND gradient.

    The numeric distinction only exists on TPU MXUs (CPU executes HIGH as
    plain fp32) — chip-measured behavior is pinned in docs/PERF.md and
    scripts/precision_cg_chip.py (+2% iterations, 2e-4 solution agreement,
    1.34x wall on the compute-bound fused shape); this test pins the option
    plumbing: dispatch, convergence, stats, and the custom VJP."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import conjugate_gradient

    n, m = 256, 4
    q = rng.standard_normal((n, n)).astype(np.float32)
    base = jnp.asarray(q @ q.T / n)
    lam0 = jnp.asarray(rng.uniform(0.3, 0.7, n), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)

    sol, stats = conjugate_gradient(
        base + jnp.diag(lam0), rhs, jnp.zeros_like(rhs), 1e-10,
        max_iterations=600, max_steps_cycle=601, matvec_impl="xla_high",
    )
    dense = jnp.linalg.solve(base + jnp.diag(lam0), rhs.T).T
    np.testing.assert_allclose(np.asarray(sol), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)
    assert float(stats.error.max()) <= 1e-10 and bool(stats.converged)

    def loss(lam_, impl):
        sol, _ = conjugate_gradient(
            base + jnp.diag(lam_), rhs, jnp.zeros_like(rhs), 1e-12,
            max_iterations=400, max_steps_cycle=401, matvec_impl=impl,
        )
        return jnp.sum(jnp.square(sol))

    g_hi = jax.grad(lambda l: loss(l, "xla"))(lam0)
    g_high = jax.grad(lambda l: loss(l, "xla_high"))(lam0)
    np.testing.assert_allclose(np.asarray(g_high), np.asarray(g_hi),
                               rtol=1e-3, atol=1e-3)


def test_mixed_precision_gradients_match_fp32_cg(rng):
    """The custom VJP's backward solve also runs mixed-precision; gradients
    must agree with the fp32 CG path (same VJP, fp32 matvec) on a system
    inside the refinement envelope."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import conjugate_gradient

    n, m = 192, 3
    q = rng.standard_normal((n, n)).astype(np.float32)
    base = jnp.asarray(q @ q.T / n)
    lam = jnp.asarray(rng.uniform(0.4, 0.8, n), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)

    def loss(lam_, impl):
        a = base + jnp.diag(lam_)
        sol, _ = conjugate_gradient(
            a, rhs, jnp.zeros_like(rhs), 1e-12,
            max_iterations=400, max_steps_cycle=401, matvec_impl=impl,
        )
        return jnp.sum(jnp.square(sol))

    g_fp = jax.grad(lambda l: loss(l, "xla"))(lam)
    for impl in ("bf16_ir", "bf16_ru"):
        g_mx = jax.grad(lambda l: loss(l, impl))(lam)
        np.testing.assert_allclose(np.asarray(g_mx), np.asarray(g_fp),
                                   rtol=1e-3, atol=1e-3, err_msg=impl)


def test_mixed_precision_with_preconditioner(rng):
    """SpectralPreconditioner composes with the mixed loops — and by
    shrinking the effective condition number it also widens the bf16
    refinement envelope (the production pivchol + bf16_ru configuration)."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import (
        conjugate_gradient, pivoted_cholesky_preconditioner,
    )
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal

    n = 160
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=[0.5, 0.5],
                            dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    k_mat = kernel.K(kp, x)
    lam = jnp.asarray(rng.uniform(0.2, 0.4, n), jnp.float32)
    a = add_diagonal(k_mat, lam)
    rhs = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    dense = jnp.linalg.solve(a, rhs.T).T
    precond = pivoted_cholesky_preconditioner(k_mat, lam, rank=48)

    sol, stats = conjugate_gradient(
        a, rhs, jnp.zeros_like(rhs), 1e-8, preconditioner=precond,
        max_iterations=600, max_steps_cycle=601, matvec_impl="bf16_ru",
        relative_threshold=True,
    )
    np.testing.assert_allclose(np.asarray(sol), np.asarray(dense),
                               rtol=1e-3, atol=1e-3)
    # stats.error for the mixed loops is the TRUE fp32 residual (not the
    # preconditioned rz), checked against the per-row relative target.
    target = 1e-8 * 0.5 * float(jnp.sum(jnp.square(rhs), axis=-1).max())
    assert float(stats.error.max()) <= target


def test_bf16_ru_drift_adaptive_no_stagnation(rng):
    """Round-3 regression (VERDICT item 6): the fixed-stride bf16_ru
    stagnated (~6x iteration inflation at scale; cycles ran long after the
    bf16 recursion drifted past usefulness).  The drift-adaptive loop must
    (a) converge at a tight relative target and (b) keep iteration
    inflation vs fp32 bounded — measured 2.0-2.6x on the bench-like system
    across M in {1k..8k}; 4x is the regression tripwire.  Also asserts the
    result no longer depends on the refresh_every cap (the drift rule,
    not the stride, ends cycles)."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import conjugate_gradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal

    n = 1024
    kernel = Matern32()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(8, 1.2),
                            dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(-2, 2, (n, 8)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.05, 0.5, n), jnp.float32)
    a = add_diagonal(kernel.K(kp, x), lam)
    rhs = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
    v0 = jnp.zeros_like(rhs)

    _, fp32 = conjugate_gradient(
        a, rhs, v0, 1e-6, max_iterations=2 * n, max_steps_cycle=2 * n + 1,
        matvec_impl="xla", relative_threshold=True,
    )
    assert bool(fp32.converged)

    _, ru = conjugate_gradient(
        a, rhs, v0, 1e-6, max_iterations=2 * n, max_steps_cycle=2 * n + 1,
        matvec_impl="bf16_ru", relative_threshold=True,
    )
    assert bool(ru.converged), "bf16_ru failed to converge"
    assert int(ru.steps) <= 4 * int(fp32.steps), (
        f"stagnation regression: ru={int(ru.steps)} vs fp32={int(fp32.steps)}"
    )

    # Cap-insensitivity: the drift rule, not the refresh_every stride, ends
    # cycles (the public path does not expose the stride; call the loop).
    import jax

    from cggp_tpu.ops.cg import EyePreconditioner, _standard_dot, mixed_cg_loop

    a_bf16 = a.astype(jnp.bfloat16)

    def matvec_hi(p):
        return jnp.matmul(p, a, precision=jax.lax.Precision.HIGHEST)

    def matvec_lo(p):
        out = jax.lax.dot_general(
            p.astype(jnp.bfloat16), a_bf16, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(a.dtype)

    pre = EyePreconditioner()
    steps_by_cap = []
    for cap in (32, 256):
        _, stats = mixed_cg_loop(
            matvec_hi, matvec_lo, pre.apply, pre.state, rhs, v0,
            error_threshold=1e-6, max_iterations=2 * n, refresh_every=cap,
            dot=_standard_dot, mat_for_precond=a, relative_threshold=True,
        )
        assert bool(stats.converged), f"cap={cap}"
        steps_by_cap.append(int(stats.steps))
    # Identical on the systems measured; allow slack for boundary wiggle.
    assert abs(steps_by_cap[0] - steps_by_cap[1]) <= 8, steps_by_cap


def test_bf16_variants_stay_finite_below_their_envelope(rng):
    """Regression: with Lambda ~2e-4 on diag entries ~1.0 (the covertree e2e
    regime) a plain bf16 copy of A loses the SPD shift to rounding; the
    inner CG then sees negative curvature, and before the per-row direction
    restart in cg_loop the stuck direction grew unboundedly — fp32 overflow
    to NaN that poisoned whole training runs.  The contract now: out-of-
    envelope bf16 solves return FINITE iterates and report converged=False
    (the monitor warns); fp32 "xla" still converges on the same system.
    Also pins the diagonal split: diag(A) including Lambda rides in fp32
    (exact), never in the bf16 copy."""
    from cggp_tpu.ops.cg import _bf16_diagsplit_matvec
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal

    m = 256
    kernel = Matern32()
    kp = kernel.init_params(1.0, np.full(3, 0.8), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-2, 2, (m, 3)), jnp.float32)
    lam = jnp.asarray(rng.uniform(1.8e-4, 1.9e-3, (m,)), jnp.float32)
    a = add_diagonal(kernel.K(kp, z), lam)
    rhs = jnp.asarray(rng.standard_normal((m, 4)), jnp.float32)

    # The diagonal (kernel variance + Lambda) survives the half-width copy
    # bit-exactly: a basis-vector matvec reads back the fp32 diagonal.
    e0 = jnp.zeros((1, m), jnp.float32).at[0, 0].set(1.0)
    got = _bf16_diagsplit_matvec(a)(e0)[0, 0]
    np.testing.assert_allclose(float(got), float(a[0, 0]), rtol=1e-7)

    sol_ref = None
    for impl in ("xla", "bf16_ir", "bf16_ru", "xla_bf16"):
        cg = ConjugateGradient(1e-6, max_iterations=4 * m,
                               relative_threshold=True, matvec_impl=impl)
        sol, stats = cg.solve_with_stats(a, rhs)
        assert bool(jnp.all(jnp.isfinite(sol))), impl
        if impl == "xla":
            assert bool(stats.converged)
            sol_ref = sol
    assert sol_ref is not None


def test_solve_chunked_matches_single_program_solve(rng):
    """solve_chunked (round-4): host-driven restarted CG in bounded
    dispatches — the watchdog-safe route for solves whose single program
    would exceed the tunnel's ~60 s execution limit (docs/PERF.md).  Each
    chunk re-anchors on the TRUE residual, so the converged result matches
    the one-program facade solve and the dense oracle; stats aggregate
    total iterations and report real convergence."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32

    n, m = 200, 3
    kernel = Matern32()
    kp = kernel.init_params(1.0, np.ones(2), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    a = kernel.K(kp, z) + jnp.diag(
        jnp.asarray(rng.uniform(0.1, 0.5, (n,)), jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)

    for relative in (True, False):
        solver = ConjugateGradient(1e-9 if relative else 1e-6,
                                   max_iterations=n,
                                   relative_threshold=relative)
        expected, ref_stats = solver.solve_with_stats(a, rhs)
        assert bool(ref_stats.converged)

        # Tiny chunks (8 iterations per dispatch) still converge.
        chunked, stats = solver.solve_chunked(a, rhs, chunk_iterations=8,
                                              max_chunks=128)
        assert bool(stats.converged), relative
        assert int(stats.steps) > 8  # genuinely ran multiple chunks
        assert stats.error.shape == (m, 1)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(expected),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(jnp.linalg.solve(a, rhs)),
            rtol=2e-3, atol=2e-4)

    # An impossible budget reports converged=False honestly.
    tight = ConjugateGradient(1e-12, max_iterations=n,
                              relative_threshold=True)
    _, bad_stats = tight.solve_chunked(a, rhs, chunk_iterations=2,
                                       max_chunks=2)
    assert not bool(bad_stats.converged)


def test_solve_chunked_carried_direction_safeguard(rng):
    """Residual-replacement chunks carry Krylov momentum across dispatches;
    on an ill-conditioned fp32 system a noise-scale carried direction
    meeting a re-anchored larger rz explodes gamma = rz/denom (observed:
    divergence to 1e4x the solution scale on this exact system before the
    safeguard).  The monotonicity safeguard discards such a chunk and
    redoes it fresh — the solution must stay at the fp32 floor, never
    diverge."""
    import jax.numpy as jnp

    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential

    n = 400
    kernel = SquaredExponential()
    kp = kernel.init_params(1.0, np.ones(2), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    a = kernel.K(kp, z) + 0.01 * jnp.eye(n, dtype=jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    ref = np.linalg.solve(np.asarray(a, np.float64),
                          np.asarray(rhs, np.float64))

    # 1e-10 relative is BELOW the fp32 floor for kappa ~ 1e4: the loop must
    # stall honestly at the floor (converged=False), not blow up.
    solver = ConjugateGradient(1e-10, max_iterations=n,
                               relative_threshold=True)
    sol, stats = solver.solve_chunked(a, rhs, chunk_iterations=8,
                                      max_chunks=100)
    rel = float(np.max(np.abs(np.asarray(sol) - ref)) / np.max(np.abs(ref)))
    assert rel < 1e-3, rel
    assert not bool(stats.converged)  # honest: target unreachable in fp32
