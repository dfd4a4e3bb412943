"""IterGPR parity tests: matrix-free CG exact GPR vs the dense Cholesky GPR.

The oracle pattern mirrors the reference's own test strategy
(cg_test.py:12-46: iterative-vs-dense solution AND gradient parity) lifted to
the model level.  Scaled-identity probes ``sqrt(N) * I`` make the stochastic
machinery deterministic and EXACT:

* Hutchinson gradient: sum_p (A^{-1} sqrt(N) e_p)^T dA (sqrt(N) e_p) / N
  = tr(A^{-1} dA) — the exact log-det gradient;
* SLQ value: each e_p's full-depth Lanczos quadrature is exact
  (e_p^T log(A) e_p), and the ||z_p||^2 = N Hutchinson scaling averages the
  diagonal back to tr(log A) = logdet(A) — the exact value.

So IterGPR must match the dense GPR to solver precision, not statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import GPR, IterGPR
from cggp_tpu.ops import Matern32, SquaredExponential


def _data(rng, n, dim=2):
    x = jnp.asarray(rng.uniform(-1.5, 1.5, size=(n, dim)))
    f = np.sin(np.asarray(x).sum(-1, keepdims=True))
    y = jnp.asarray(f + 0.1 * rng.normal(size=(n, 1)))
    return x, y


def _exact_probes(n, dtype):
    return jnp.sqrt(jnp.asarray(float(n), dtype)) * jnp.eye(n, dtype=dtype)


def _models(kernel, n, **overrides):
    kw = dict(
        error_threshold=1e-13, max_cg_iterations=4 * n,
        relative_threshold=False, precondition=None,
        logdet_variant="slq", slq_lanczos_iters=n,
    )
    kw.update(overrides)
    return GPR(kernel=kernel), IterGPR(kernel=kernel, **kw)


def _tree_allclose(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=rtol, atol=atol)


def test_itergpr_mll_value_and_grad_match_dense(rng):
    """Single-panel path (n <= block): SLQ MLL value and gradients equal the
    dense Cholesky GPR's to solver precision with exact probes."""
    n = 56
    x, y = _data(rng, n)
    dense, iter_model = _models(SquaredExponential(), n)
    params = dense.init_params(x.shape[-1], noise_variance=0.1,
                               dtype=jnp.float64)
    probes = _exact_probes(n, x.dtype)

    mll_dense = dense.log_marginal_likelihood(params, (x, y))
    mll_iter = iter_model.log_marginal_likelihood(params, (x, y), probes=probes)
    np.testing.assert_allclose(float(mll_iter), float(mll_dense),
                               rtol=1e-8, atol=1e-8)

    g_dense = jax.grad(lambda p: dense.training_loss(p, (x, y)))(params)
    g_iter = jax.grad(
        lambda p: iter_model.training_loss(p, (x, y), probes=probes)
    )(params)
    _tree_allclose(g_iter, g_dense, rtol=1e-6, atol=1e-8)


def test_itergpr_zero_variant_value_convention(rng):
    """logdet_variant="zero" keeps the reference's value-free convention
    (models.py:21-48): the reported MLL omits exactly the log-det term while
    the gradient still includes it exactly."""
    n = 48
    x, y = _data(rng, n)
    dense, iter_model = _models(Matern32(), n, logdet_variant="zero")
    params = dense.init_params(x.shape[-1], noise_variance=0.15,
                               dtype=jnp.float64)
    probes = _exact_probes(n, x.dtype)

    noise = dense.likelihood.variance(params["likelihood"])
    k_hat = dense.kernel.K(params["kernel"], x) + noise * jnp.eye(n, dtype=x.dtype)
    _sign, logdet = jnp.linalg.slogdet(k_hat)

    mll_dense = dense.log_marginal_likelihood(params, (x, y))
    mll_zero = iter_model.log_marginal_likelihood(params, (x, y), probes=probes)
    np.testing.assert_allclose(float(mll_zero) - 0.5 * float(logdet),
                               float(mll_dense), rtol=1e-8, atol=1e-8)

    g_dense = jax.grad(lambda p: dense.training_loss(p, (x, y)))(params)
    g_iter = jax.grad(
        lambda p: iter_model.training_loss(p, (x, y), probes=probes)
    )(params)
    _tree_allclose(g_iter, g_dense, rtol=1e-6, atol=1e-8)


def test_itergpr_padded_scan_path_with_preconditioning(rng):
    """n > block forces the scanned-panel matvec and pads N to the block
    multiple (140 -> 144 at block 48); preconditioning must change iteration
    counts only.  MLL value + grad still match the dense GPR exactly."""
    n = 140
    x, y = _data(rng, n, dim=3)
    dense, iter_model = _models(
        SquaredExponential(), n, block=48,
        precondition="pivchol", precond_rank=32,
    )
    params = dense.init_params(x.shape[-1], noise_variance=0.2,
                               dtype=jnp.float64)
    # Real-N probe rows: the model pads the columns itself.
    probes = _exact_probes(n, x.dtype)

    mll_dense = dense.log_marginal_likelihood(params, (x, y))
    mll_iter = iter_model.log_marginal_likelihood(params, (x, y), probes=probes)
    np.testing.assert_allclose(float(mll_iter), float(mll_dense),
                               rtol=1e-8, atol=1e-8)

    g_dense = jax.grad(lambda p: dense.training_loss(p, (x, y)))(params)
    g_iter = jax.grad(
        lambda p: iter_model.training_loss(p, (x, y), probes=probes)
    )(params)
    _tree_allclose(g_iter, g_dense, rtol=1e-6, atol=1e-8)


def test_itergpr_predict_and_posterior_cache_match_dense(rng):
    """predict_f and the posterior cache reproduce the dense GPR posterior
    (mean, diag var, full cov) to solver precision, including through the
    padded scan path."""
    n = 90
    x, y = _data(rng, n)
    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(40, x.shape[-1])))
    dense, iter_model = _models(Matern32(), n, block=32,
                                precondition="pivchol", precond_rank=16)
    params = dense.init_params(x.shape[-1], noise_variance=0.1,
                               dtype=jnp.float64)

    mu_d, var_d = dense.predict_f(params, (x, y), xq)
    mu_i, var_i = iter_model.predict_f(params, (x, y), xq)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_d),
                               rtol=1e-5, atol=1e-8)

    _mu_fd, cov_d = dense.predict_f(params, (x, y), xq, full_cov=True)
    _mu_fi, cov_i = iter_model.predict_f(params, (x, y), xq, full_cov=True)
    # Off-diagonal covariances shrink to ~1e-8 where the CG stop rule
    # (0.5*||r||^2 <= 1e-13) dominates — compare those absolutely.
    np.testing.assert_allclose(np.asarray(cov_i), np.asarray(cov_d),
                               rtol=1e-5, atol=1e-6)

    post = iter_model.posterior(params, (x, y))
    mu_c, var_c = iter_model.posterior_predict(post, xq)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_i), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_i), rtol=1e-12)
    mean_only = iter_model.posterior_mean(post, xq)
    np.testing.assert_allclose(np.asarray(mean_only), np.asarray(mu_i),
                               rtol=1e-12)


def test_itergpr_predict_in_batches_integration(rng):
    """The shared serving plumbing treats IterGPR as a data-bound posterior
    model (like GPR/SGPR): batched serving equals the dense posterior."""
    from cggp_tpu.training.optimize import predict_in_batches

    n = 64
    x, y = _data(rng, n)
    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(70, x.shape[-1])))
    dense, iter_model = _models(SquaredExponential(), n)
    params = dense.init_params(x.shape[-1], noise_variance=0.1,
                               dtype=jnp.float64)

    mu_d, var_d = dense.predict_f(params, (x, y), xq)
    mu_b, var_b = predict_in_batches(iter_model, params, xq, batch_size=32,
                                     train_data=(x, y))
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_d),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_d),
                               rtol=1e-5, atol=1e-8)

    mu_m, none = predict_in_batches(iter_model, params, xq, batch_size=32,
                                    train_data=(x, y), mean_only=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_d),
                               rtol=1e-5, atol=1e-8)


def test_itergpr_validation(rng):
    x, y = _data(rng, 16)
    model = IterGPR(kernel=SquaredExponential(), precondition=None)
    params = model.init_params(x.shape[-1], dtype=jnp.float64)
    with pytest.raises(ValueError, match="PRNG key"):
        model.log_marginal_likelihood(params, (x, y))
    with pytest.raises(ValueError, match="logdet_variant"):
        IterGPR(kernel=SquaredExponential(), logdet_variant="exact")
    bad = IterGPR(kernel=SquaredExponential(), precondition="nystrom")
    with pytest.raises(ValueError, match="precondition"):
        bad.log_marginal_likelihood(params, (x, y), key=jax.random.PRNGKey(0))


def test_itergpr_random_probes_are_unbiased_ballpark(rng):
    """With honest Rademacher probes the SLQ MLL lands near the dense value
    (sanity that the production path — key-drawn probes — is wired right;
    tight parity is covered by the exact-probe tests)."""
    n = 48
    x, y = _data(rng, n)
    import dataclasses

    dense, iter_model = _models(SquaredExponential(), n, slq_lanczos_iters=32)
    iter_model = dataclasses.replace(iter_model, num_probes=64)
    params = dense.init_params(x.shape[-1], noise_variance=0.1,
                               dtype=jnp.float64)
    mll_dense = float(dense.log_marginal_likelihood(params, (x, y)))
    mll_iter = float(iter_model.log_marginal_likelihood(
        params, (x, y), key=jax.random.PRNGKey(3)
    ))
    # Hutchinson noise scales with the off-diagonal mass of log(K_hat);
    # 64 probes on this system put the estimate within a few percent.
    assert abs(mll_iter - mll_dense) < 0.05 * abs(mll_dense) + 2.0


# ---------------------------------------------------------------------------
# Multi-chip twin: ShardedIterGPR (N-axis row blocks over the virtual mesh)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh():
    from cggp_tpu.parallel import make_mesh

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_itergpr_matches_dense_gpr(rng, mesh):
    """The psum-blocked exact GP equals the dense Cholesky GPR: SLQ MLL value,
    gradients (through the sharded implicit-function VJP), and the posterior
    — with N padded to the mesh multiple (52 -> 56 on 8 devices)."""
    from cggp_tpu.parallel import ShardedIterGPR

    n = 52
    x, y = _data(rng, n)
    dense = GPR(kernel=SquaredExponential())
    model = ShardedIterGPR(
        kernel=SquaredExponential(), mesh=mesh,
        error_threshold=1e-13, max_cg_iterations=4 * n,
        relative_threshold=False, precondition=None,
        logdet_variant="slq", slq_lanczos_iters=n,
    )
    params = dense.init_params(x.shape[-1], noise_variance=0.1,
                               dtype=jnp.float64)
    probes = _exact_probes(n, x.dtype)  # model pads the columns itself

    mll_dense = dense.log_marginal_likelihood(params, (x, y))
    mll_sharded = model.log_marginal_likelihood(params, (x, y), probes=probes)
    np.testing.assert_allclose(float(mll_sharded), float(mll_dense),
                               rtol=1e-8, atol=1e-8)

    g_dense = jax.grad(lambda p: dense.training_loss(p, (x, y)))(params)
    g_sharded = jax.jit(jax.grad(
        lambda p: model.training_loss(p, (x, y), probes=probes)
    ))(params)
    _tree_allclose(g_sharded, g_dense, rtol=1e-6, atol=1e-8)

    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(24, x.shape[-1])))
    mu_d, var_d = dense.predict_f(params, (x, y), xq)
    post = model.posterior(params, (x, y))
    mu_s, var_s = model.posterior_predict(post, xq)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.posterior_mean(post, xq)),
                               np.asarray(mu_d), rtol=1e-5, atol=1e-8)


def test_sharded_itergpr_requires_mesh():
    from cggp_tpu.parallel import ShardedIterGPR

    with pytest.raises(ValueError, match="mesh"):
        ShardedIterGPR(kernel=SquaredExponential())


# ---------------------------------------------------------------------------
# LOVE-style Lanczos serving cache (solver="lanczos")
# ---------------------------------------------------------------------------


def test_itergpr_lanczos_serving_exact_at_full_rank_conservative_below(rng):
    """posterior(solver="lanczos"): exact at rank = N (full reorthogonalised
    Krylov spans the space); below full rank variances are conservative
    over-estimates whose error shrinks as the rank grows.  Means are always
    the exact CG-solved alpha path."""
    import dataclasses

    n = 72
    x, y = _data(rng, n)
    _dense, model = _models(SquaredExponential(), n)
    params = model.init_params(x.shape[-1], noise_variance=0.1,
                               dtype=jnp.float64)
    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(30, x.shape[-1])))

    post_cg = model.posterior(params, (x, y))
    mu_cg, var_cg = model.posterior_predict(post_cg, xq)

    full = dataclasses.replace(model, serving_lanczos_rank=n)
    post_full = full.posterior(params, (x, y), solver="lanczos")
    mu_f, var_f = full.posterior_predict(post_full, xq)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_cg), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_cg),
                               rtol=1e-6, atol=1e-9)

    errs = {}
    for rank in (8, 32):
        low = dataclasses.replace(model, serving_lanczos_rank=rank)
        post = low.posterior(params, (x, y), solver="lanczos")
        _mu, var = low.posterior_predict(post, xq)
        # Conservative: the Gauss-quadrature quad under-estimate makes the
        # variance an over-estimate (never below the exact one).
        assert float(jnp.min(var - var_cg)) > -1e-9
        errs[rank] = float(jnp.max(var - var_cg))
    assert errs[32] <= errs[8] + 1e-12, errs


def test_rowcg_lanczos_serving_matches_cg(rng):
    """The shared row-solver family (here ImplicitCGGP) serves through the
    same LOVE cache: full-rank parity with the CG posterior, including
    through predict_in_batches(posterior_solver="lanczos") and padding."""
    import dataclasses

    from cggp_tpu.models import ImplicitCGGP
    from cggp_tpu.training.optimize import predict_in_batches

    n, m = 120, 36
    x, y = _data(rng, n)
    model = ImplicitCGGP(
        kernel=Matern32(), num_data=n, num_probes=2,
        error_threshold=1e-13, max_cg_iterations=4 * m,
        block=16,  # forces padding: M=36 -> 48
        serving_lanczos_rank=48,
    )
    params = model.init_params(
        x[:m], noise_variance=0.1,
        pseudo_u=jnp.asarray(np.sin(np.asarray(x[:m]).sum(-1, keepdims=True))),
        cluster_counts=jnp.full((m, 1), 3.0, jnp.float64),
        dtype=jnp.float64,
    )
    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(40, x.shape[-1])))

    post_cg = model.posterior(params, solver="cg")
    mu_cg, var_cg = model.posterior_predict(post_cg, xq)
    post_lz = model.posterior(params, solver="lanczos")
    mu_lz, var_lz = model.posterior_predict(post_lz, xq)
    np.testing.assert_allclose(np.asarray(mu_lz), np.asarray(mu_cg), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var_lz), np.asarray(var_cg),
                               rtol=1e-6, atol=1e-9)
    _mu_fc, cov_lz = model.posterior_predict(post_lz, xq[:7], full_cov=True)
    _mu_fc, cov_cg = model.posterior_predict(post_cg, xq[:7], full_cov=True)
    np.testing.assert_allclose(np.asarray(cov_lz), np.asarray(cov_cg),
                               rtol=1e-6, atol=1e-7)

    mu_b, var_b = predict_in_batches(model, params, xq, batch_size=16,
                                     posterior_solver="lanczos")
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_cg), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_cg),
                               rtol=1e-6, atol=1e-9)

    # Low rank stays conservative.
    low = dataclasses.replace(model, serving_lanczos_rank=8)
    post8 = low.posterior(params, solver="lanczos")
    _mu8, var8 = low.posterior_predict(post8, xq)
    assert float(jnp.min(var8 - var_cg)) > -1e-9


def test_itergpr_grad_never_materializes_stacked_panels(rng):
    """Memory contract of the matrix-free path: the MLL gradient must not
    save the [num_blocks, block, N] kernel-panel stack (= the full [N, N])
    as a scan residual.  Two past regressions produced exactly that buffer
    (16 GB at N=65536, chip OOM): differentiating the un-checkpointed panel
    scan, and an OUTPUT-side stop_gradient around the SLQ value (tangents
    still traced through the Lanczos scan force panel residuals; gradients
    must be stopped at the SLQ INPUTS)."""
    n, dim, block = 512, 3, 128
    x = jnp.asarray(rng.uniform(-2, 2, size=(n, dim)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x).sum(-1, keepdims=True)), jnp.float32)
    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-5, relative_threshold=True,
        max_cg_iterations=32, num_probes=4, logdet_variant="slq",
        slq_lanczos_iters=10, precondition="pivchol", precond_rank=16,
        block=block,
    )
    params = model.init_params(dim, noise_variance=0.1, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    jaxpr = jax.make_jaxpr(jax.value_and_grad(
        lambda p: model.training_loss(p, (x, y), key=key)
    ))(params)
    stacked = f"{n // block},{block},{n}"
    assert stacked not in str(jaxpr).replace(" ", ""), (
        f"gradient stacks the full kernel-panel buffer f32[{stacked}]"
    )


def test_rowcg_chunk_frozen_preconditioner(rng):
    """precond_override on the row-solver family (ImplicitCGGP here): a
    frozen precond_state leaves loss values and gradients unchanged — the
    CG stop rule tests the true residual, so preconditioner state can never
    change what the solve returns (the chunk-frozen trainer mode relies on
    exactly this)."""
    from cggp_tpu.models import ImplicitCGGP

    n, m = 120, 36
    x, y = _data(rng, n)
    model = ImplicitCGGP(
        kernel=Matern32(), num_data=n, num_probes=2,
        error_threshold=1e-13, max_cg_iterations=4 * m,
        block=16,  # forces padding: M=36 -> 48 (mask-threaded build)
        precondition="pivchol", precond_rank=8,
    )
    params = model.init_params(
        x[:m], noise_variance=0.1,
        pseudo_u=jnp.asarray(np.sin(np.asarray(x[:m]).sum(-1, keepdims=True))),
        cluster_counts=jnp.full((m, 1), 3.0, jnp.float64),
        dtype=jnp.float64,
    )
    key = jax.random.PRNGKey(5)
    batch = (x[:48], y[:48])

    state = model.precond_state(params)
    assert state != ()

    loss_step = float(model.training_loss(params, batch, key))
    loss_frozen = float(
        model.training_loss(params, batch, key, precond_override=state))
    loss_identity = float(
        model.training_loss(params, batch, key, precond_override=()))
    np.testing.assert_allclose(loss_step, loss_frozen, rtol=1e-9)
    np.testing.assert_allclose(loss_step, loss_identity, rtol=1e-7)

    g_step = jax.grad(lambda p: model.training_loss(p, batch, key))(params)
    g_frozen = jax.grad(
        lambda p: model.training_loss(p, batch, key, precond_override=state)
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-10),
        g_step, g_frozen,
    )


def test_dense_cggp_lanczos_serving(rng):
    """Dense CGGP's posterior(solver="lanczos"): exact at full rank, mean
    always exact (CG nu), diag variances conservative over-estimates that
    tighten with rank — the large-M dense serving path where chol cannot
    factorize and per-batch CG is too slow.  Also threads through
    predict_in_batches(posterior_solver="lanczos")."""
    import dataclasses

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops import ConjugateGradient
    from cggp_tpu.training.optimize import predict_in_batches

    n, m = 120, 32
    x, y = _data(rng, n)
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-13, max_iterations=4 * m),
        num_data=n, num_probes=2, serving_lanczos_rank=m,  # full rank
    )
    u = jnp.asarray(np.sin(np.asarray(x[:m]).sum(-1, keepdims=True)))
    params = model.init_params(
        x[:m], pseudo_u=u, cluster_counts=jnp.full((m, 1), 3.0, jnp.float64),
        noise_variance=0.1, dtype=jnp.float64,
    )
    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(40, x.shape[-1])))

    post_cg = model.posterior(params, solver="cg")
    mu_cg, var_cg = model.posterior_predict(post_cg, xq)
    post_lz = model.posterior(params, solver="lanczos")
    assert post_lz.kmm_lambda is None  # the raw system is dropped
    mu_lz, var_lz = model.posterior_predict(post_lz, xq)
    np.testing.assert_allclose(np.asarray(mu_lz), np.asarray(mu_cg),
                               rtol=1e-10)
    # rtol 1e-5: the comparison mixes the CG solve tolerance and Lanczos
    # reorthogonalisation residue (measured max rel diff ~1e-6 at fp64).
    np.testing.assert_allclose(np.asarray(var_lz), np.asarray(var_cg),
                               rtol=1e-5, atol=1e-9)
    # full_cov through the cache too
    _, cov_lz = model.posterior_predict(post_lz, xq, full_cov=True)
    _, cov_cg = model.posterior_predict(post_cg, xq, full_cov=True)
    # atol-dominant: off-diagonal covariances pass through zero, where a
    # relative rule is meaningless (measured max ABS diff ~3.5e-8 at fp64).
    np.testing.assert_allclose(np.asarray(cov_lz), np.asarray(cov_cg),
                               rtol=1e-5, atol=1e-6)

    # Low rank: conservative over-estimate, monotone in rank.
    errs = {}
    for rank in (4, 16):
        lo = dataclasses.replace(model, serving_lanczos_rank=rank)
        post_r = lo.posterior(params, solver="lanczos")
        _, var_r = lo.posterior_predict(post_r, xq)
        assert float(jnp.min(var_r - var_cg)) > -1e-9
        errs[rank] = float(jnp.max(var_r - var_cg))
    assert errs[16] <= errs[4] + 1e-12, errs

    # Production path threading.
    mu_b, var_b = predict_in_batches(model, params, xq, batch_size=16,
                                     posterior_solver="lanczos")
    # atol-dominant: the jitted cache build fuses differently from the
    # eager one through the CG nu solve (abs diffs ~5e-8 at fp64), and means
    # pass through zero where a relative rule is meaningless.
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_lz),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_lz),
                               rtol=1e-5, atol=1e-6)


def test_chunked_mll_value_and_grad_match_fused_path(rng):
    """log_marginal_likelihood_chunked (round-4, watchdog-safe exact-GP
    training): with the SAME probes, the chunked-dispatch value and
    gradient must match the single-program zero-logdet path — the chunked
    solves re-anchor on the true residual, and the surrogate's jax.grad is
    algebraically the fused path's custom-VJP estimator."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import IterGPR
    from cggp_tpu.ops.kernels import Matern32

    n = 96
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])).astype(np.float32)
                    + 0.1 * rng.standard_normal((n, 1)).astype(np.float32))

    # 1e-9 on 0.5||r||^2 (relative): the chunked path re-anchors on the
    # TRUE residual, whose fp32 floor sits near 1e-11 relative — a 1e-12
    # target is only "reachable" by the fused loop's optimistic recurrence
    # residual.
    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-9, max_cg_iterations=400,
        num_probes=6, precondition="pivchol", precond_rank=16,
        relative_threshold=True, block=32, logdet_variant="zero",
    )
    params = model.init_params(input_dim=2, dtype=jnp.float32)
    probes = jnp.asarray(
        rng.choice([-1.0, 1.0], size=(6, n)).astype(np.float32))

    ref_val, ref_grads = jax.jit(jax.value_and_grad(
        lambda p: model.log_marginal_likelihood(p, (x, y), probes=probes)
    ))(params)

    val, grads, info = model.log_marginal_likelihood_chunked(
        params, (x, y), probes=probes, chunk_iterations=7, max_chunks=100)
    assert info["converged"], info
    assert info["chunks"] > 1  # genuinely multi-dispatch
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for section in ("kernel", "likelihood"):
        for name, want in ref_grads[section].items():
            np.testing.assert_allclose(
                np.asarray(grads[section][name]), np.asarray(want),
                rtol=2e-3, atol=1e-5, err_msg=f"{section}/{name}")

    # Starved budget reports honestly.
    _, _, bad = model.log_marginal_likelihood_chunked(
        params, (x, y), probes=probes, chunk_iterations=2, max_chunks=2)
    assert not bad["converged"]


def test_sharded_chunked_mll_matches_fused(rng, mesh):
    """Multi-chip chunked exact-GP training (round-4): the chunked MLL
    inherits through ShardedIterGPR's psum-blocked hooks unchanged — with
    shared probes its value and gradient match the single-program sharded
    path on the 8-way mesh (every dispatch bounded: a chunk-capped sharded
    CG or one sharded matvec)."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.parallel import ShardedIterGPR
    from cggp_tpu.ops.kernels import Matern32

    n = 72
    x, y = _data(rng, n)
    model = ShardedIterGPR(
        kernel=Matern32(), mesh=mesh,
        error_threshold=1e-10, max_cg_iterations=300,
        relative_threshold=True, precondition="pivchol", precond_rank=8,
        num_probes=4, logdet_variant="zero",
    )
    params = model.init_params(x.shape[-1], noise_variance=0.1, dtype=x.dtype)
    probes = jnp.asarray(rng.choice([-1.0, 1.0], size=(4, n)), x.dtype)

    ref_val, ref_grads = jax.jit(jax.value_and_grad(
        lambda p: model.log_marginal_likelihood(p, (x, y), probes=probes)
    ))(params)

    val, grads, info = model.log_marginal_likelihood_chunked(
        params, (x, y), probes=probes, chunk_iterations=6, max_chunks=100)
    assert info["converged"], info
    assert info["chunks"] > 1
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    for section in ("kernel", "likelihood"):
        for name, want in ref_grads[section].items():
            np.testing.assert_allclose(
                np.asarray(grads[section][name]), np.asarray(want),
                rtol=2e-4, atol=1e-8, err_msg=f"{section}/{name}")


def test_chunked_mll_slq_value_matches_dense(rng):
    """log_marginal_likelihood_chunked(logdet_value="slq") (round-4): the
    host-chunked SLQ adds the TRUE log-det value to the dispatch-bounded
    MLL.  With scaled-identity probes and full-depth Lanczos the quadrature
    is exact, so the chunked value must equal the dense GPR's MLL — the
    same oracle the fused path is pinned to."""
    n = 64
    x, y = _data(rng, n)
    dense, model = _models(
        SquaredExponential(), n, precondition="pivchol", precond_rank=12,
        error_threshold=1e-12, block=32)
    params = model.init_params(input_dim=2, dtype=x.dtype)
    probes = _exact_probes(n, x.dtype)

    want = dense.log_marginal_likelihood(params, (x, y))
    val, grads, info = model.log_marginal_likelihood_chunked(
        params, (x, y), probes=probes, chunk_iterations=9, max_chunks=200,
        logdet_value="slq")
    assert info["converged"], info
    np.testing.assert_allclose(float(val), float(want), rtol=1e-8)

    # The explicit override beats the model default: "zero" drops the
    # log-det term only (difference is exactly 0.5 * logdet).
    val0, _, _ = model.log_marginal_likelihood_chunked(
        params, (x, y), probes=probes, chunk_iterations=9, max_chunks=200,
        logdet_value="zero")
    kmat = np.asarray(model.kernel.K(params["kernel"], x))
    noise = float(model.likelihood.variance(params["likelihood"]))
    logdet = np.linalg.slogdet(kmat + noise * np.eye(n))[1]
    np.testing.assert_allclose(float(val0) - float(val), 0.5 * logdet,
                               rtol=1e-6)


def test_posterior_chunked_matches_posterior(rng):
    """posterior_chunked (round-4 watchdog rule) builds the SAME serving
    cache as the one-program posterior: alpha to solver precision, and the
    lanczos LOVE cache serves identical mean/variance batches."""
    n = 72
    x, y = _data(rng, n)
    _, model = _models(
        Matern32(), n, precondition="pivchol", precond_rank=16,
        error_threshold=1e-20, block=32, serving_lanczos_rank=n)
    params = model.init_params(input_dim=2, dtype=x.dtype)
    x_new = jnp.asarray(rng.uniform(-1.5, 1.5, size=(17, 2)), x.dtype)

    for solver in ("cg", "lanczos"):
        ref = model.posterior(params, (x, y), solver=solver)
        got = model.posterior_chunked(params, (x, y), solver=solver,
                                      chunk_iterations=7, max_chunks=100)
        # Both solves stop at 0.5||r||^2 <= 1e-20; two solutions that deep
        # can still differ by ~||r||/lambda_min — compare at that level.
        np.testing.assert_allclose(np.asarray(got.alpha),
                                   np.asarray(ref.alpha),
                                   rtol=1e-6, atol=1e-8)
        mu_ref, var_ref = model.posterior_predict(ref, x_new)
        mu_got, var_got = model.posterior_predict(got, x_new)
        np.testing.assert_allclose(np.asarray(mu_got), np.asarray(mu_ref),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(var_got), np.asarray(var_ref),
                                   rtol=1e-6, atol=1e-9)

    with pytest.raises(ValueError, match="posterior solver"):
        model.posterior_chunked(params, (x, y), solver="qr")


def test_sharded_chunked_slq_and_posterior(rng, mesh):
    """The round-4 dispatch-bounded surface composes with the mesh: on an
    8-way ShardedIterGPR, the chunked MLL with the host-chunked SLQ value
    matches the dense GPR's MLL (exact probes, full depth), and
    posterior_chunked (cg AND lanczos) serves the dense posterior — every
    device program a bounded sharded matvec or chunk-capped sharded CG."""
    import jax.numpy as jnp

    from cggp_tpu.parallel import ShardedIterGPR
    from cggp_tpu.ops.kernels import Matern32

    n = 64
    x, y = _data(rng, n)
    dense = GPR(kernel=Matern32())
    model = ShardedIterGPR(
        kernel=Matern32(), mesh=mesh,
        error_threshold=1e-16, max_cg_iterations=400,
        relative_threshold=True, precondition="pivchol", precond_rank=12,
        slq_lanczos_iters=n, serving_lanczos_rank=n,
    )
    params = model.init_params(x.shape[-1], noise_variance=0.1, dtype=x.dtype)
    probes = _exact_probes(n, x.dtype)

    want = float(dense.log_marginal_likelihood(params, (x, y)))
    val, _grads, info = model.log_marginal_likelihood_chunked(
        params, (x, y), probes=probes, chunk_iterations=6, max_chunks=200,
        logdet_value="slq")
    assert info["converged"], info
    np.testing.assert_allclose(float(val), want, rtol=1e-7)

    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(19, x.shape[-1])), x.dtype)
    mu_d, var_d = dense.predict_f(params, (x, y), xq)
    for solver in ("cg", "lanczos"):
        post = model.posterior_chunked(params, (x, y), solver=solver,
                                       chunk_iterations=6, max_chunks=200)
        mu, var = model.posterior_predict(post, xq)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_d),
                                   rtol=1e-5, atol=1e-7)


def test_padded_system_coerces_host_arrays(rng):
    """Eager chunked paths fed raw numpy must still produce device-array
    caches: a float64 numpy x in an fp32 process previously leaked into
    posterior.npz as a mixed-dtype cache that failed the x64 round-trip
    guard on reload (found driving predict --chunk-iterations)."""
    import numpy as _np

    n = 40
    x_np = _np.asarray(rng.uniform(-1, 1, (n, 2)))
    y_np = _np.asarray(rng.normal(size=(n, 1)))
    model = IterGPR(kernel=Matern32(), error_threshold=1e-10,
                    max_cg_iterations=6, relative_threshold=True,
                    precondition=None, block=16)
    params = model.init_params(input_dim=2)
    post = model.posterior_chunked(params, (x_np, y_np),
                                   chunk_iterations=6, max_chunks=50)
    for leaf in jax.tree_util.tree_leaves(post):
        assert isinstance(leaf, jax.Array), type(leaf)


def test_posterior_predict_chunked_matches(rng):
    """Dispatch-bounded variance serving (review finding: the cg cache's
    per-batch solve was the one unbounded program left in chunked mode):
    posterior_predict_chunked == posterior_predict to solver precision on
    diag and full_cov, routes LOVE caches unchanged, and warns on a
    starved chunk budget instead of returning silently-wrong variances."""
    import warnings as _warnings

    n = 64
    x, y = _data(rng, n)
    _, model = _models(Matern32(), n, precondition="pivchol",
                       precond_rank=12, error_threshold=1e-16,
                       relative_threshold=True, block=32,
                       serving_lanczos_rank=n)
    params = model.init_params(input_dim=2, dtype=x.dtype)
    xq = jnp.asarray(rng.uniform(-1.5, 1.5, size=(13, 2)), x.dtype)

    post = model.posterior(params, (x, y), solver="cg")
    mu_ref, var_ref = model.posterior_predict(post, xq)
    mu, var = model.posterior_predict_chunked(post, xq, chunk_iterations=6,
                                              max_chunks=100)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-5, atol=1e-8)
    _muf, cov_ref = model.posterior_predict(post, xq, full_cov=True)
    _mug, cov = model.posterior_predict_chunked(
        post, xq, chunk_iterations=6, max_chunks=100, full_cov=True)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_ref),
                               rtol=1e-5, atol=1e-7)

    # LOVE cache: unchanged solve-free route, bit-identical.
    post_l = model.posterior(params, (x, y), solver="lanczos")
    mu_l, var_l = model.posterior_predict(post_l, xq)
    mu_lc, var_lc = model.posterior_predict_chunked(post_l, xq)
    np.testing.assert_array_equal(np.asarray(mu_lc), np.asarray(mu_l))
    np.testing.assert_array_equal(np.asarray(var_lc), np.asarray(var_l))

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        model.posterior_predict_chunked(post, xq, chunk_iterations=2,
                                        max_chunks=1)
    assert any("unconverged" in str(w.message) for w in caught)

    # posterior_chunked shares the loop: starved budgets warn there too.
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        model.posterior_chunked(params, (x, y), chunk_iterations=2,
                                max_chunks=1)
    assert any("unconverged" in str(w.message) for w in caught)

    with pytest.raises(ValueError, match="logdet_value"):
        model.log_marginal_likelihood_chunked(
            params, (x, y), probes=_exact_probes(n, x.dtype),
            logdet_value="sql")


def test_chunked_solve_carries_krylov_momentum(rng):
    """Residual-replacement chunks (round-4, later): carrying the search
    direction across bounded dispatches converges like UNRESTARTED CG.  On
    this ill-conditioned fp32 system at a 1e-12 relative target the plain
    restart needed ~2.7x more chunks (measured 27 vs 10 at n=1500) — pin
    the improvement by requiring convergence inside a budget the restart
    variant demonstrably exceeds."""
    from cggp_tpu.models.itergpr import (
        _chunked_mll_parts,
        _chunked_restart_solve,
    )

    n = 800
    x = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x).sum(-1, keepdims=True))
                    + 0.01 * rng.normal(size=(n, 1)), jnp.float32)
    model = IterGPR(kernel=Matern32(), error_threshold=1e-12,
                    max_cg_iterations=8, relative_threshold=True,
                    precondition="pivchol", precond_rank=16, block=256)
    params = model.init_params(input_dim=3, dtype=jnp.float32)
    kp = params["kernel"]
    x_pad, lam, mask, y_rows = model._padded_system(params, x, y)
    solve_chunk, matvec, precond_fn, _ = _chunked_mll_parts(model, 8)
    state = precond_fn(kp, x_pad, lam, mask)

    # Plain-restart baseline: same chunk program, direction dropped.
    b_norm2 = 0.5 * jnp.sum(jnp.square(y_rows), axis=-1)
    target = 1e-12 * b_norm2
    v = jnp.zeros_like(y_rows)
    err = b_norm2
    restart_chunks = 0
    while restart_chunks < 120 and not bool(jnp.all(err <= target)):
        v, _p, err = solve_chunk(kp, x_pad, lam, mask, y_rows, v, None, state)
        restart_chunks += 1

    v_rr, err_rr, converged, carry_chunks = _chunked_restart_solve(
        model, kp, x_pad, lam, mask, y_rows, state, solve_chunk, matvec,
        max_chunks=120)
    assert converged
    assert carry_chunks < restart_chunks, (carry_chunks, restart_chunks)
    # And the carried solve matches the dense oracle.
    noise = float(model.likelihood.variance(params["likelihood"]))
    a = np.asarray(model.kernel.K(kp, x)) + noise * np.eye(n)
    alpha_dense = np.linalg.solve(a, np.asarray(y).astype(np.float64))
    np.testing.assert_allclose(np.asarray(v_rr[0, :n]), alpha_dense[:, 0],
                               rtol=5e-4, atol=5e-5)


def test_watchdog_headroom_guard(rng, monkeypatch):
    """Round-5 (VERDICT r4 weak-7): single-program IterGPR legs estimate
    their wall against the runtime's per-program watchdog budget and warn
    BEFORE launching when headroom runs out, pointing at the chunked
    alternative.  CGGP_PROGRAM_BUDGET_S arms/overrides the budget (the
    default only arms on TPU-class backends); <= 0 disables."""
    import warnings

    from cggp_tpu.models.itergpr import _program_time_budget_s

    x, y = _data(rng, 48)
    model = IterGPR(kernel=Matern32(), error_threshold=1e-8,
                    max_cg_iterations=64, num_probes=2,
                    precondition=None, block=24)
    params = model.init_params(input_dim=2, dtype=x.dtype)

    # CPU backend, no env: guard disarmed.
    monkeypatch.delenv("CGGP_PROGRAM_BUDGET_S", raising=False)
    assert _program_time_budget_s() is None

    # Tiny budget: est ~ 64 iters * 3 s * (48/262144)^2 ~ 6.4e-9 s, so the
    # budget must be smaller still to trip the 70% line.
    monkeypatch.setenv("CGGP_PROGRAM_BUDGET_S", "1e-12")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        val = model.log_marginal_likelihood(
            params, (x, y), key=jax.random.PRNGKey(0))
        post = model.posterior(params, (x, y))
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("log_marginal_likelihood_chunked" in m for m in msgs), msgs
    assert any("posterior_chunked" in m for m in msgs), msgs
    # The guard warns but never blocks: both programs still ran.
    assert bool(jnp.isfinite(val))
    assert bool(jnp.all(jnp.isfinite(post.alpha)))

    # Serving's per-batch [T, N] CG has the same single-program exposure
    # (round-5 review): the guard covers posterior_predict too.
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mu, var = model.posterior_predict(post, x[:8])
    assert any("posterior_predict_chunked" in str(w.message) for w in caught
               if issubclass(w.category, RuntimeWarning))
    assert bool(jnp.all(jnp.isfinite(mu))) and bool(jnp.all(jnp.isfinite(var)))

    # An unparseable budget value must NOT silently disarm the guard — it
    # warns and falls back to the backend default (None on CPU).
    monkeypatch.setenv("CGGP_PROGRAM_BUDGET_S", "60s")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert _program_time_budget_s() is None  # cpu backend default
    assert any("not a number" in str(w.message) for w in caught)

    # Explicit disable.
    monkeypatch.setenv("CGGP_PROGRAM_BUDGET_S", "0")
    assert _program_time_budget_s() is None
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        model.log_marginal_likelihood(params, (x, y),
                                      key=jax.random.PRNGKey(0))
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]
