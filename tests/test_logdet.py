"""Log-det estimator tests (reference cg_test.py:49-77 pattern + SLQ upgrade)."""

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.ops import ConjugateGradient, SquaredExponential, add_diagonal
from cggp_tpu.ops.logdet import eval_logdet, slq_logdet


def _setup(rng, n=100, dim=2, noise=0.01):
    inputs = jnp.asarray(rng.normal(size=(n, dim)))
    kernel = SquaredExponential()
    lengthscales = rng.random(dim) ** 2 + 0.5
    params = kernel.init_params(variance=1.3, lengthscales=lengthscales)

    def matrix_fn(params):
        k = kernel.K(params, inputs)
        return add_diagonal(k, noise * jnp.ones(n, dtype=k.dtype))

    return kernel, params, matrix_fn


def test_eval_logdet_value_is_zero_and_grad_matches(rng):
    kernel, params, matrix_fn = _setup(rng)

    def logdet_dense(params):
        sign, logabsdet = jnp.linalg.slogdet(matrix_fn(params))
        return logabsdet

    def logdet_cg(params):
        return eval_logdet(matrix_fn(params), ConjugateGradient(1e-12))

    value = logdet_cg(params)
    np.testing.assert_allclose(float(value), 0.0, atol=1e-12)

    g_dense = jax.grad(logdet_dense)(params)
    g_cg = jax.grad(logdet_cg)(params)
    for key in ("variance", "lengthscales"):
        np.testing.assert_allclose(
            np.asarray(g_cg[key]), np.asarray(g_dense[key]), rtol=1e-3, atol=1e-3
        )


def test_eval_logdet_probe_grad_is_unbiased(rng):
    """Rademacher-probe gradient approaches the dense gradient with many probes."""
    kernel, params, matrix_fn = _setup(rng, n=60)

    def logdet_dense(params):
        return jnp.linalg.slogdet(matrix_fn(params))[1]

    def logdet_probe(params, key):
        return eval_logdet(matrix_fn(params), ConjugateGradient(1e-12), num_probes=512, key=key)

    g_dense = jax.grad(logdet_dense)(params)
    g_probe = jax.grad(logdet_probe)(params, jax.random.PRNGKey(0))
    for key in ("variance", "lengthscales"):
        np.testing.assert_allclose(
            np.asarray(g_probe[key]), np.asarray(g_dense[key]), rtol=0.15, atol=0.05
        )


def test_slq_logdet_value(rng):
    kernel, params, matrix_fn = _setup(rng, n=120, noise=0.1)
    matrix = matrix_fn(params)
    exact = float(jnp.linalg.slogdet(matrix)[1])
    est = float(
        slq_logdet(matrix, ConjugateGradient(1e-12), num_probes=64,
                   key=jax.random.PRNGKey(1), lanczos_iters=30)
    )
    assert abs(est - exact) / abs(exact) < 0.05, (est, exact)


def test_slq_logdet_grad_matches_dense(rng):
    kernel, params, matrix_fn = _setup(rng, n=60)

    def logdet_dense(params):
        return jnp.linalg.slogdet(matrix_fn(params))[1]

    def logdet_slq(params, key):
        return slq_logdet(matrix_fn(params), ConjugateGradient(1e-12),
                          num_probes=512, key=key, lanczos_iters=25)

    g_dense = jax.grad(logdet_dense)(params)
    g_slq = jax.grad(logdet_slq)(params, jax.random.PRNGKey(2))
    for key in ("variance", "lengthscales"):
        np.testing.assert_allclose(
            np.asarray(g_slq[key]), np.asarray(g_dense[key]), rtol=0.15, atol=0.05
        )


def test_eval_logdet_from_solves_matches_eval_logdet_grad(rng):
    """Reusing precomputed probe solves must give the same Hutchinson
    gradient as the re-solving estimator (same probes)."""
    import jax

    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.logdet import eval_logdet_from_solves

    n = 24
    a0 = rng.standard_normal((n, n))
    a = jnp.asarray(a0 @ a0.T + n * np.eye(n))
    probes = jnp.asarray(rng.choice([-1.0, 1.0], size=(n, 6)))

    solved = jnp.linalg.solve(a, probes)

    def via_solves(a_):
        return eval_logdet_from_solves(a_, probes, solved)

    g1 = jax.grad(via_solves)(a)
    expected = (solved @ probes.T) / 6.0
    np.testing.assert_allclose(np.asarray(g1), np.asarray(expected), rtol=1e-12)
    # value stays zero (reference models.py:46 semantics)
    assert float(via_solves(a)) == 0.0


def test_lanczos_extremal_eigs_matches_dense(rng):
    """Extremal Ritz values vs dense eigvalsh on a kernel spectrum."""
    import jax

    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.ops.linalg import add_diagonal
    from cggp_tpu.ops.logdet import lanczos_extremal_eigs

    n = 300
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.5, lengthscales=[1.0, 1.0])
    x = jnp.asarray(rng.normal(size=(n, 2)))
    a = add_diagonal(kernel.K(kp, x), 0.05 * jnp.ones(n))

    lo, hi = lanczos_extremal_eigs(a, jax.random.PRNGKey(0), num_iters=64)
    dense = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(float(hi), dense[-1], rtol=1e-6)
    # eig_min estimate is an over-estimate but must be in the right ballpark
    assert dense[0] <= float(lo) <= dense[0] * 1.5
    # and the implied condition number within ~2x
    cond_est = float(hi) / float(lo)
    cond = dense[-1] / dense[0]
    assert cond / 2 <= cond_est <= cond * 1.05


def test_lanczos_chunked_matches_scanned(rng):
    """Host-chunked Lanczos (round-4 dispatch-bounded twin) reproduces the
    scanned recurrence — tridiagonals AND basis — to floating-point noise,
    including past an early termination (full-depth run on a small N)."""
    from cggp_tpu.ops.logdet import (
        lanczos_tridiag_rows,
        lanczos_tridiag_rows_chunked,
    )

    n, p = 48, 3
    a_np = rng.normal(size=(n, n))
    a = jnp.asarray(a_np @ a_np.T + n * np.eye(n))
    probes = jnp.asarray(rng.choice([-1.0, 1.0], size=(p, n)))
    matvec = jax.jit(lambda rows: rows @ a)

    # Early-termination regime: num_iters > n forces beta -> 0 paddings.
    for k in (12, n + 4):
        al_s, be_s, b_s = lanczos_tridiag_rows(
            matvec, probes, k, return_basis=True)
        al_c, be_c, b_c = lanczos_tridiag_rows_chunked(
            matvec, probes, k, return_basis=True)
        np.testing.assert_allclose(np.asarray(al_c), np.asarray(al_s),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(be_c), np.asarray(be_s),
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(np.asarray(b_c), np.asarray(b_s),
                                   rtol=1e-10, atol=1e-10)


def test_slq_value_rows_chunked_matches(rng):
    """slq_value_rows_chunked == slq_value_rows on the same probes, and at
    full depth with scaled-identity probes == the exact logdet."""
    from cggp_tpu.ops.logdet import slq_value_rows, slq_value_rows_chunked

    n = 40
    a_np = rng.normal(size=(n, n))
    a = jnp.asarray(a_np @ a_np.T + n * np.eye(n))
    matvec = jax.jit(lambda rows: rows @ a)

    probes = jnp.sqrt(jnp.asarray(float(n))) * jnp.eye(n)
    got = slq_value_rows_chunked(matvec, probes, n)
    want = slq_value_rows(matvec, probes, n)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-9)
    exact = float(np.linalg.slogdet(np.asarray(a))[1])
    np.testing.assert_allclose(float(got), exact, rtol=1e-6)


def test_lanczos_quad_cache_rows_chunked_matches(rng):
    """The host-chunked LOVE cache build equals the one-program build."""
    from cggp_tpu.ops.logdet import (
        lanczos_quad_cache_rows,
        lanczos_quad_cache_rows_chunked,
        love_seed_row,
    )

    n = 56
    a_np = rng.normal(size=(n, n))
    a = jnp.asarray(a_np @ a_np.T + n * np.eye(n))
    matvec = jax.jit(lambda rows: rows @ a)
    start = love_seed_row(jnp.asarray(rng.normal(size=(1, n))))

    for rank in (16, n):
        got = lanczos_quad_cache_rows_chunked(matvec, start, rank)
        want = lanczos_quad_cache_rows(matvec, start, rank)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-9, atol=1e-10)
