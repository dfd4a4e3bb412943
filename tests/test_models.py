"""Model-level parity tests.

The load-bearing ones mirror the reference's implicit contract: CGGP is
ClusterGP with Cholesky solves replaced by CG, so with an exact solver and
exact trace (num_probes=None) the two must agree — in gradients everywhere,
and in ELBO value up to the deliberately-omitted logdet term
(reference models.py:46).  The SLQ variant must close that value gap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import CGGP, GPR, SGPR, ClusterGP, LpSVGP, PathwiseClusterGP
from cggp_tpu.ops import ConjugateGradient, Matern32, SquaredExponential, add_diagonal


def _setup(rng, n=80, m=20, dim=2):
    x = jnp.asarray(rng.normal(size=(n, dim)))
    f = np.sin(np.asarray(x).sum(-1, keepdims=True))
    y = jnp.asarray(f + 0.1 * rng.normal(size=(n, 1)))
    z = x[:m]
    counts = jnp.asarray(np.maximum(rng.integers(1, 8, size=(m, 1)), 1).astype(np.float64))
    u = jnp.asarray(rng.normal(size=(m, 1)) * 0.3)
    return x, y, z, u, counts


def _cluster_pair(rng, num_probes=None, logdet_variant="zero", **cg_kwargs):
    x, y, z, u, counts = _setup(rng)
    kernel = Matern32()
    cluster = ClusterGP(kernel, num_data=x.shape[0])
    params = cluster.init_params(z, lengthscales=[1.2, 0.9], noise_variance=0.05,
                                 pseudo_u=u, cluster_counts=counts)
    cg_kwargs.setdefault("max_iterations", 400)
    cg = ConjugateGradient(1e-14, **cg_kwargs)
    cggp = CGGP(kernel, num_data=x.shape[0], conjugate_gradient=cg,
                num_probes=num_probes, logdet_variant=logdet_variant)
    return cluster, cggp, params, (x, y)


def test_cggp_predict_matches_clustergp(rng):
    cluster, cggp, params, (x, y) = _cluster_pair(rng)
    mu_c, var_c = cluster.predict_f(params, x)
    mu_g, var_g = cggp.predict_f(params, x)
    np.testing.assert_allclose(np.asarray(mu_g), np.asarray(mu_c), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var_g), np.asarray(var_c), rtol=1e-5, atol=1e-7)


def test_cggp_elbo_value_omits_logdet_only(rng):
    """elbo_cggp + 0.5 * logdet(Kmm + Lambda) == elbo_cluster (exact trace)."""
    cluster, cggp, params, (x, y) = _cluster_pair(rng, num_probes=None)
    elbo_c = float(cluster.elbo(params, (x, y)))
    elbo_g = float(cggp.elbo(params, (x, y), key=jax.random.PRNGKey(0)))

    kmm = cggp.kernel.K(params["kernel"], params["inducing_points"])
    lam = cggp.diag_variance(params)[:, 0]
    logdet = float(jnp.linalg.slogdet(add_diagonal(kmm, lam))[1])
    np.testing.assert_allclose(elbo_g - 0.5 * logdet, elbo_c, rtol=1e-6)


def test_cggp_gradient_matches_clustergp_exact(rng):
    """num_probes=None: CG gradients == Cholesky gradients (reference contract)."""
    cluster, cggp, params, (x, y) = _cluster_pair(rng, num_probes=None)

    g_c = jax.grad(lambda p: cluster.elbo(p, (x, y)))(params)
    g_g = jax.grad(lambda p: cggp.elbo(p, (x, y), key=jax.random.PRNGKey(0)))(params)

    for section in ("kernel", "likelihood"):
        for name, val in g_c[section].items():
            np.testing.assert_allclose(
                np.asarray(g_g[section][name]), np.asarray(val),
                rtol=1e-4, atol=1e-6, err_msg=f"{section}/{name}",
            )


def test_cggp_probe_gradient_is_close(rng):
    """Rademacher probes give a noisy but unbiased gradient."""
    cluster, cggp_probe, params, (x, y) = _cluster_pair(rng, num_probes=256)
    g_c = jax.grad(lambda p: cluster.elbo(p, (x, y)))(params)
    g_p = jax.grad(
        lambda p: cggp_probe.elbo(p, (x, y), key=jax.random.PRNGKey(1))
    )(params)
    for section in ("kernel", "likelihood"):
        for name, val in g_c[section].items():
            np.testing.assert_allclose(
                np.asarray(g_p[section][name]), np.asarray(val),
                rtol=0.2, atol=0.05, err_msg=f"{section}/{name}",
            )


def test_cggp_slq_elbo_value_close_to_clustergp(rng):
    cluster, cggp_slq, params, (x, y) = _cluster_pair(
        rng, num_probes=64, logdet_variant="slq"
    )
    elbo_c = float(cluster.elbo(params, (x, y)))
    elbo_s = float(cggp_slq.elbo(params, (x, y), key=jax.random.PRNGKey(2)))
    assert abs(elbo_s - elbo_c) / abs(elbo_c) < 0.05, (elbo_s, elbo_c)


def test_lpsvgp_kl_against_dense_formula(rng):
    x, y, z, u, counts = _setup(rng)
    kernel = SquaredExponential()
    model = LpSVGP(kernel, num_data=x.shape[0])
    nu = jnp.asarray(rng.normal(size=(z.shape[0], 1)) * 0.1)
    var0 = jnp.asarray(rng.random((z.shape[0], 1)) * 0.01 + 1e-4)
    params = model.init_params(z, nu=nu, diag_variance=var0)

    kmm = np.asarray(kernel.K(params["kernel"], z))
    var = np.asarray(model.diag_variance(params))[:, 0]
    k = kmm + np.diag(var)
    expected = 0.5 * (
        float((np.asarray(nu).T @ kmm @ np.asarray(nu))[0, 0])
        - np.trace(np.linalg.solve(k, kmm))
        + np.linalg.slogdet(k)[1]
        - np.sum(np.log(var))
    )
    np.testing.assert_allclose(float(model.prior_kl(params)), expected, rtol=1e-8)


def test_lpsvgp_elbo_improves_with_adam_direction(rng):
    """One gradient step along the ELBO gradient increases the ELBO."""
    x, y, z, _, _ = _setup(rng)
    model = LpSVGP(SquaredExponential(), num_data=x.shape[0])
    params = model.init_params(z)
    elbo0, grads = jax.value_and_grad(lambda p: model.elbo(p, (x, y)))(params)
    stepped = jax.tree_util.tree_map(lambda p, g: p + 1e-4 * g, params, grads)
    elbo1 = model.elbo(stepped, (x, y))
    assert float(elbo1) > float(elbo0)


def test_sgpr_bound_tight_at_full_inducing(rng):
    """With Z == X the Titsias bound equals the exact GPR marginal likelihood."""
    x, y, _, _, _ = _setup(rng, n=50)
    kernel = SquaredExponential()
    gpr = GPR(kernel)
    sgpr = SGPR(kernel, jitter=1e-10)
    p_gpr = gpr.init_params(x.shape[-1], lengthscales=[1.0, 1.0], noise_variance=0.1)
    p_sgpr = sgpr.init_params(x, lengthscales=[1.0, 1.0], noise_variance=0.1)
    lml = float(gpr.log_marginal_likelihood(p_gpr, (x, y)))
    bound = float(sgpr.elbo(p_sgpr, (x, y)))
    assert bound <= lml + 1e-6
    np.testing.assert_allclose(bound, lml, rtol=1e-5)


def test_sgpr_predict_matches_gpr_at_full_inducing(rng):
    x, y, _, _, _ = _setup(rng, n=50)
    x_new = jnp.asarray(np.random.default_rng(7).normal(size=(9, 2)))
    kernel = SquaredExponential()
    gpr = GPR(kernel)
    sgpr = SGPR(kernel, jitter=1e-10)
    p_gpr = gpr.init_params(2, noise_variance=0.1)
    p_sgpr = sgpr.init_params(x, noise_variance=0.1)
    mu_g, var_g = gpr.predict_f(p_gpr, (x, y), x_new)
    mu_s, var_s = sgpr.predict_f(p_sgpr, (x, y), x_new)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_g), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_g), rtol=1e-3, atol=1e-6)


def test_pathwise_sample_moments_match_clustergp(rng):
    """Pathwise posterior sample mean/var -> ClusterGP predict_f moments."""
    x, y, z, u, counts = _setup(rng, n=40, m=12)
    kernel = SquaredExponential()
    model = PathwiseClusterGP(kernel, num_data=x.shape[0],
                              num_bases=6000, num_samples=4000)
    params = model.init_params(z, noise_variance=0.05, pseudo_u=u,
                               cluster_counts=counts)
    samples = model.pathwise_samples(params, x, jax.random.PRNGKey(3))  # [S, N, 1]
    mu_mc = np.asarray(samples).mean(axis=0)
    var_mc = np.asarray(samples).var(axis=0)
    mu, var = ClusterGP(kernel, num_data=x.shape[0]).predict_f(params, x)
    np.testing.assert_allclose(mu_mc, np.asarray(mu), atol=0.08)
    np.testing.assert_allclose(var_mc, np.asarray(var), atol=0.08)


def test_trainable_masks(rng):
    x, y, z, u, counts = _setup(rng)
    cg = ConjugateGradient(1e-10)
    model = CGGP(Matern32(), num_data=80, conjugate_gradient=cg)
    params = model.init_params(z, pseudo_u=u, cluster_counts=counts)
    mask = model.trainable_mask(params)
    assert mask["pseudo_u"] is False
    assert mask["cluster_counts"] is False
    assert mask["inducing_points"] is False
    assert all(jax.tree_util.tree_leaves(mask["kernel"]))
    assert all(jax.tree_util.tree_leaves(mask["likelihood"]))


def test_elbo_jits_and_is_finite(rng):
    cluster, cggp, params, (x, y) = _cluster_pair(rng, num_probes=8)
    loss = jax.jit(lambda p, d, k: cggp.training_loss(p, d, k))
    val = loss(params, (x, y), jax.random.PRNGKey(0))
    assert np.isfinite(float(val))


def test_cggp_fused_elbo_matches_unfused(rng):
    """The single-solve ELBO must equal the two-solve path exactly (same
    probes, same CG semantics)."""
    import jax

    from cggp_tpu.selection.update import labels_update_inducing_parameters

    x = jnp.asarray(rng.uniform(-1, 1, (96, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])))
    kernel = SquaredExponential()
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:12])
    # max_iterations well above M: with the default (M) the multi-RHS solve
    # truncates before 1e-14 and fused/unfused diverge at ~1e-3.
    fused = CGGP(kernel=kernel, conjugate_gradient=ConjugateGradient(1e-14, max_iterations=96),
                 num_data=96, num_probes=4, fuse_kl_solves=True)
    unfused = CGGP(kernel=kernel, conjugate_gradient=ConjugateGradient(1e-14, max_iterations=96),
                   num_data=96, num_probes=4, fuse_kl_solves=False)
    params = fused.init_params(iv, pseudo_u=u, cluster_counts=counts)
    key = jax.random.PRNGKey(0)
    e_fused = float(fused.elbo(params, (x, y), key))
    e_unfused = float(unfused.elbo(params, (x, y), key))
    np.testing.assert_allclose(e_fused, e_unfused, rtol=1e-5)

    g_fused = jax.grad(lambda p: fused.training_loss(p, (x, y), key))(params)
    g_unfused = jax.grad(lambda p: unfused.training_loss(p, (x, y), key))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_unfused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["rff", "pivchol", "chol"])
def test_cggp_preconditioned_elbo_matches(rng, mode):
    """Per-step preconditioning (RFF sketch, pivoted Cholesky, or the
    exact blocked factor) must not change the ELBO (same solves,
    converged) while cutting CG iterations."""
    import jax

    from cggp_tpu.ops.linalg import add_diagonal
    from cggp_tpu.selection.update import labels_update_inducing_parameters

    x = jnp.asarray(rng.uniform(-1, 1, (256, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])))
    kernel = SquaredExponential()
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:64])
    cg = ConjugateGradient(1e-12, max_iterations=256)
    plain = CGGP(kernel=kernel, conjugate_gradient=cg, num_data=256, num_probes=4)
    precond = CGGP(kernel=kernel, conjugate_gradient=cg, num_data=256, num_probes=4,
                   precondition=mode, precond_rank=32 if mode == "pivchol" else 128)
    params = plain.init_params(iv, pseudo_u=u, cluster_counts=counts)
    key = jax.random.PRNGKey(0)
    e_plain = float(plain.elbo(params, (x, y), key))
    e_pre = float(precond.elbo(params, (x, y), key))
    np.testing.assert_allclose(e_pre, e_plain, rtol=1e-6)

    g_plain = jax.grad(lambda p: plain.training_loss(p, (x, y), key))(params)
    g_pre = jax.grad(lambda p: precond.training_loss(p, (x, y), key))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pre), jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)

    # The UNFUSED path (prior_kl + predict_f as separate solves) must give
    # the same preconditioned-vs-plain parity: prior_kl previously never
    # built the preconditioner, silently training KL with identity-
    # preconditioned solves in exactly the regime `precondition` exists for.
    plain_uf = CGGP(kernel=kernel, conjugate_gradient=cg, num_data=256,
                    num_probes=4, fuse_kl_solves=False)
    pre_uf = CGGP(kernel=kernel, conjugate_gradient=cg, num_data=256,
                  num_probes=4, fuse_kl_solves=False,
                  precondition=mode, precond_rank=32 if mode == "pivchol" else 128)
    kl_plain = float(plain_uf.prior_kl(params, key))
    kl_pre = float(pre_uf.prior_kl(params, key))
    np.testing.assert_allclose(kl_pre, kl_plain, rtol=1e-6)
    gk_plain = jax.grad(lambda p: plain_uf.prior_kl(p, key))(params)
    gk_pre = jax.grad(lambda p: pre_uf.prior_kl(p, key))(params)
    # Solver-tolerance-limited: the logdet backward re-solves the probe
    # systems independently on each path; 0.5*||r||^2 <= 1e-12 pins the
    # solutions (hence these gradients) only to ~1e-6 absolute.
    for a, b in zip(jax.tree_util.tree_leaves(gk_pre),
                    jax.tree_util.tree_leaves(gk_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)


def test_precondition_auto_picks_by_m(rng, monkeypatch):
    """precondition="auto" resolves statically: the exact chol factor
    (dict state) while M <= _CHOL_AUTO_MAX_M, pivchol (3-tuple spectral
    state) above — and trains/serves identically to the explicit modes."""
    import jax

    import cggp_tpu.models.cggp as cggp_mod
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.update import labels_update_inducing_parameters

    x = jnp.asarray(rng.uniform(-1, 1, (128, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])))
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:16])
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-12, max_iterations=64),
        num_data=128, num_probes=3,
        precondition="auto", precond_rank=8,
    )
    params = model.init_params(iv, pseudo_u=u, cluster_counts=counts)

    # Small M: the auto state is the chol dict.
    state = model.precond_state(params)
    assert isinstance(state, dict) and "chol_w" in state

    # Above the cutoff (forced low so the test stays small): pivchol tuple.
    monkeypatch.setattr(cggp_mod, "_CHOL_AUTO_MAX_M", 8)
    state_big = model.precond_state(params)
    assert isinstance(state_big, tuple) and len(state_big) == 3
    monkeypatch.undo()

    # And the ELBO value matches the explicit chol mode exactly (same
    # solves, same preconditioner).
    explicit = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-12, max_iterations=64),
        num_data=128, num_probes=3,
        precondition="chol",
    )
    key = jax.random.PRNGKey(0)
    np.testing.assert_allclose(
        float(model.elbo(params, (x, y), key)),
        float(explicit.elbo(params, (x, y), key)), rtol=1e-12)


def test_training_precondition_auto_resolves_by_conditioning(rng):
    """Eager training-side auto (round-4): resolve_precondition uses the
    Lanczos conditioning estimate, not size alone — an ill-conditioned
    M=2048 system (near-duplicate centers, tiny Lambda: kappa >> 1/eps_f32)
    routes to pivchol below the size cap, a well-conditioned M=8192 system
    keeps the exact factor, and above the cap the compiler/HBM guard picks
    pivchol without estimating."""
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential

    def make(z, counts_val, lengthscale):
        m = z.shape[0]
        model = CGGP(
            kernel=SquaredExponential(),
            conjugate_gradient=ConjugateGradient(1e-6, max_iterations=32),
            num_data=10_000, precondition="auto", precond_rank=16,
        )
        params = model.init_params(
            jnp.asarray(z, jnp.float32),
            lengthscales=jnp.full((z.shape[-1],), lengthscale, jnp.float32),
            cluster_counts=jnp.full((m, 1), counts_val, jnp.float32),
            dtype=jnp.float32,
        )
        return model, params

    # Ill-conditioned, M=2048 (below the size cap): 1024 base points each
    # duplicated at 1e-4 separation, long lengthscale (Kmm rows nearly
    # collinear), counts 1e6 => Lambda = 1e-7.  kappa ~ 1e9+.
    base = rng.uniform(-1, 1, (1024, 2))
    z_ill = np.concatenate([base, base + 1e-4], axis=0)
    model, params = make(z_ill, 1e6, 10.0)
    assert model.resolve_precondition(params) == "pivchol"

    # Well-conditioned, M=8192 (at the cap): spread points, short
    # lengthscale (Kmm ~ I), counts 1 => Lambda = 0.1.  kappa ~ 10.
    z_ok = rng.uniform(-100, 100, (8192, 2))
    model, params = make(z_ok, 1.0, 0.05)
    assert model.resolve_precondition(params) == "chol"

    # Above the cap: guard short-circuits (no estimate) to pivchol.
    z_big = rng.uniform(-100, 100, (8320, 2))
    model, params = make(z_big, 1.0, 0.05)
    assert model.resolve_precondition(params) == "pivchol"

    # Explicit modes pass through untouched.
    explicit = CGGP(
        kernel=SquaredExponential(),
        conjugate_gradient=ConjugateGradient(1e-6), num_data=10,
        precondition="chol",
    )
    assert explicit.resolve_precondition(params) == "chol"


def test_trainable_pseudo_u_mask():
    """Net-new free-variational mode: trainable_pseudo_u frees the cluster
    means only (counts stay fixed — they must remain positive)."""
    model = ClusterGP(kernel=SquaredExponential(), num_data=10)
    params = model.init_params(jnp.zeros((4, 2)))
    m0 = model.trainable_mask(params)
    assert m0["pseudo_u"] is False and m0["cluster_counts"] is False
    m1 = model.trainable_mask(params, trainable_pseudo_u=True)
    assert m1["pseudo_u"] is True
    assert m1["cluster_counts"] is False
    assert m1["inducing_points"] is False


def test_cggp_posterior_cache_matches_predict_f(rng):
    """posterior()/posterior_predict/posterior_mean (net-new serving cache;
    the reference recomputes the u-solve + preconditioner per batch,
    models.py:333-345) must reproduce predict_f exactly and jit as a pytree."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32

    n, m = 160, 20
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])), jnp.float32)
    # "chol" exercises the dict-shaped CholPreconditioner state through the
    # posterior cache pytree + CG serving rewrap (_precond_from_state).
    for precondition in (None, "pivchol", "chol"):
        model = CGGP(
            kernel=Matern32(),
            conjugate_gradient=ConjugateGradient(1e-12, relative_threshold=True),
            num_data=n, num_probes=4,
            precondition=precondition, precond_rank=8,
        )
        params = model.init_params(x[:m], pseudo_u=y[:m],
                                   cluster_counts=jnp.ones((m, 1), x.dtype))
        mu0, var0 = model.predict_f(params, x[:48])
        # "auto" resolves to the one-time Cholesky factorization at this M;
        # "cg" is the round-1 per-batch CG block solve.  Both must agree
        # with predict_f.
        for solver in ("auto", "cg"):
            post = model.posterior(params, solver=solver)
            assert (post.chol is not None) == (solver == "auto")
            # chol path drops the raw [M, M] system matrix (the factor alone
            # serves) — carrying both would double the cache's HBM.
            assert (post.kmm_lambda is None) == (solver == "auto")
            mu1, var1 = model.posterior_predict(post, x[:48])
            mu2 = model.posterior_mean(post, x[:48])
            np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-5)
            np.testing.assert_allclose(np.asarray(var1), np.asarray(var0), atol=1e-5)
            np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu0), atol=1e-5)
            jit_pred = jax.jit(lambda p_, xb: model.posterior_predict(p_, xb))
            mu3, var3 = jit_pred(post, x[:48])
            np.testing.assert_allclose(np.asarray(mu3), np.asarray(mu0), atol=1e-5)
            np.testing.assert_allclose(np.asarray(var3), np.asarray(var0), atol=1e-5)


def test_cholesky_family_posterior_caches_match_predict_f(rng):
    """Every model family serves from a posterior cache (net-new; GPflow's
    posterior() analogue — the reference refactorizes per batch).  Each
    cache must reproduce predict_f and compose with predict_in_batches."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import GPR, SGPR, ClusterGP, LpSVGP
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.training.optimize import predict_in_batches

    n, m, t = 96, 12, 40
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.sin(2 * x[:, :1]) + 0.05
    xs = jnp.asarray(rng.uniform(-1, 1, (t, 2)))
    kernel = Matern32()

    # -- params-only models -------------------------------------------------
    cluster = ClusterGP(kernel=kernel, num_data=n)
    cluster_params = cluster.init_params(
        x[:m], pseudo_u=y[:m], cluster_counts=2.0 * jnp.ones((m, 1), x.dtype)
    )
    lpsvgp = LpSVGP(kernel=kernel, num_data=n)
    lpsvgp_params = lpsvgp.init_params(
        x[:m], nu=y[:m], diag_variance=0.3 * jnp.ones((m, 1), x.dtype)
    )
    for model, params in ((cluster, cluster_params), (lpsvgp, lpsvgp_params)):
        mu0, var0 = model.predict_f(params, xs)
        post = jax.jit(model.posterior)(params)
        mu1, var1 = model.posterior_predict(post, xs)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-10)
        np.testing.assert_allclose(np.asarray(var1), np.asarray(var0), atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(model.posterior_mean(post, xs)), np.asarray(mu0), atol=1e-10
        )
        mu_b, var_b = predict_in_batches(model, params, xs, batch_size=16)
        np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu0), atol=1e-10)
        np.testing.assert_allclose(np.asarray(var_b), np.asarray(var0), atol=1e-10)
        mu_m, none_var = predict_in_batches(model, params, xs, batch_size=16,
                                            mean_only=True)
        assert none_var is None
        np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu0), atol=1e-10)

    # -- internal-data models (cache binds the training set) ---------------
    sgpr = SGPR(kernel=kernel)
    sgpr_params = sgpr.init_params(x[:m])
    gpr = GPR(kernel=kernel)
    gpr_params = gpr.init_params(input_dim=2)
    for model, params in ((sgpr, sgpr_params), (gpr, gpr_params)):
        mu0, var0 = model.predict_f(params, (x, y), xs)
        post = jax.jit(model.posterior)(params, (x, y))
        mu1, var1 = model.posterior_predict(post, xs)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-9)
        np.testing.assert_allclose(np.asarray(var1), np.asarray(var0), atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(model.posterior_mean(post, xs)), np.asarray(mu0), atol=1e-9
        )
        mu_b, var_b = predict_in_batches(model, params, xs, batch_size=16,
                                         train_data=(x, y))
        np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu0), atol=1e-9)
        np.testing.assert_allclose(np.asarray(var_b), np.asarray(var0), atol=1e-9)
        mu_m, none_var = predict_in_batches(model, params, xs, batch_size=16,
                                            train_data=(x, y), mean_only=True)
        assert none_var is None
        np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu0), atol=1e-9)


def test_cggp_auto_serving_solver_picks_by_conditioning(rng):
    """Round-2 verdict item 8: "auto" serving must pick chol/cg from an
    estimated kappa(Kmm + Lambda) * eps(dtype), not size alone — an
    ill-conditioned fp32 system at modest M must auto-pick CG (and serve
    finite values) WITHOUT relying on the post-hoc NaN fallback."""
    import jax.numpy as jnp

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential

    n, d, m = 256, 2, 96

    def build(lengthscale, counts_scale, dtype):
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)), dtype)
        model = CGGP(
            kernel=SquaredExponential(),
            conjugate_gradient=ConjugateGradient(
                1e-6, max_iterations=4 * m, relative_threshold=True
            ),
            num_data=n, num_probes=3, precondition="pivchol", precond_rank=32,
        )
        params = model.init_params(
            x[:m], lengthscales=jnp.full(d, lengthscale, dtype),
            noise_variance=0.1,
            pseudo_u=jnp.asarray(rng.standard_normal((m, 1)), dtype),
            cluster_counts=jnp.full((m, 1), counts_scale, dtype),
            dtype=dtype,
        )
        return model, params, x

    # Well-conditioned fp32 (short lengthscale, large lam): chol is safe.
    model, params, x = build(0.5, 1.0, jnp.float32)
    post = model.posterior(params)  # eager: conditioning estimate runs
    assert post.chol is not None

    # Ill-conditioned fp32: long lengthscale makes Kmm near-rank-deficient
    # and counts=1e4 shrinks Lambda to ~1e-5 — kappa >> 1/eps(fp32).
    model, params, x = build(8.0, 1.0e4, jnp.float32)
    post = model.posterior(params)
    assert post.chol is None, "auto must pick CG for an ill-conditioned system"
    mu, var = model.posterior_predict(post, x[:32])
    assert np.isfinite(np.asarray(mu)).all() and np.isfinite(np.asarray(var)).all()

    # Same system in fp64: kappa * eps is tiny again -> chol.
    model64, params64, _ = build(8.0, 1.0e4, jnp.float64)
    assert model64.posterior(params64).chol is not None

    # Under jit the estimate is a tracer: auto must still work (size rule).
    post_jit = jax.jit(model.posterior)(params)
    assert post_jit.chol is not None


def test_predict_in_batches_auto_resolves_conditioning_eagerly(rng, monkeypatch):
    """Round-3 review regression: the production serving path
    (predict_in_batches -> jitted posterior) previously never ran the
    conditioning estimate — posterior() was always traced, the Tracer check
    fired, and "auto" degraded to the size-only rule.  The resolver must now
    run EAGERLY before jitting: an ill-conditioned fp32 M=96 system routes
    to CG serving without tripping the post-hoc NaN fallback."""
    import warnings as _warnings

    import jax.numpy as jnp

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.training import optimize as opt

    n, d, m = 256, 2, 96
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    model = CGGP(
        kernel=SquaredExponential(),
        conjugate_gradient=ConjugateGradient(
            1e-6, max_iterations=4 * m, relative_threshold=True
        ),
        num_data=n, num_probes=3, precondition="pivchol", precond_rank=32,
    )
    params = model.init_params(
        x[:m], lengthscales=jnp.full(d, 8.0, jnp.float32), noise_variance=0.1,
        pseudo_u=jnp.asarray(rng.standard_normal((m, 1)), jnp.float32),
        cluster_counts=jnp.full((m, 1), 1.0e4, jnp.float32),
        dtype=jnp.float32,
    )

    solvers_used = []
    orig = opt._cached_posterior_jits.__wrapped__

    def spy(mdl, solver="auto", mesh=None):
        solvers_used.append(solver)
        return orig(mdl, solver, mesh)

    monkeypatch.setattr(opt, "_cached_posterior_jits", spy)

    with _warnings.catch_warnings():
        # The eager resolver must choose CG up front — reaching the NaN
        # fallback (a RuntimeWarning) means the estimate never ran.
        _warnings.simplefilter("error", RuntimeWarning)
        mu, var = opt.predict_in_batches(model, params, x, batch_size=64)
    assert solvers_used == ["cg"], solvers_used
    assert np.isfinite(np.asarray(mu)).all() and np.isfinite(np.asarray(var)).all()


def test_posterior_cache_save_load_roundtrip(rng, tmp_path):
    """save_posterior/load_posterior: a persisted serving cache serves
    EXACTLY like the in-memory one — the serving process skips the build
    (factorization / CG solves) entirely.  Covers the cg cache (dict
    preconditioner state + [M, M] system), the chol cache (factor-only,
    kmm_lambda=None), and the LOVE cache; plus the pathwise sample cache
    (nested kernel_params dict through the generic encode)."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import (
        CGGP, PathwiseClusterGP, build_pathwise_posterior, pathwise_samples_at,
    )
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32, SquaredExponential
    from cggp_tpu.utils import load_posterior, save_posterior

    n, m = 120, 16
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])), jnp.float32)
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-10, relative_threshold=True),
        num_data=n, num_probes=3, precondition="chol",
    )
    params = model.init_params(x[:m], pseudo_u=y[:m],
                               cluster_counts=jnp.ones((m, 1), x.dtype))
    xq = x[:40]
    for solver in ("cg", "chol", "lanczos"):
        post = model.posterior(params, solver=solver)
        d = tmp_path / solver
        save_posterior(d, post)
        loaded = load_posterior(d)
        assert type(loaded) is type(post)
        for a, b in zip(jax.tree_util.tree_leaves(post),
                        jax.tree_util.tree_leaves(loaded)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for got, want in zip(model.posterior_predict(loaded, xq),
                             model.posterior_predict(post, xq)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    pw = PathwiseClusterGP(SquaredExponential(), num_data=n, num_bases=16,
                           num_samples=3)
    pp = pw.init_params(x[:m], noise_variance=0.05, pseudo_u=y[:m],
                        cluster_counts=jnp.ones((m, 1), x.dtype))
    ppost = build_pathwise_posterior(pw, pp, jax.random.PRNGKey(0),
                                     num_samples=3)
    save_posterior(tmp_path / "pw", ppost)
    ploaded = load_posterior(tmp_path / "pw")
    np.testing.assert_array_equal(
        np.asarray(pathwise_samples_at(pw, ploaded, xq)),
        np.asarray(pathwise_samples_at(pw, ppost, xq)))

    # predict_in_batches(posterior=...): the injected cache serves through
    # the production router (scan/loop) with the build skipped.
    from cggp_tpu.training.optimize import predict_in_batches

    post_c = load_posterior(tmp_path / "chol")
    mu_i, var_i = predict_in_batches(model, params, xq, batch_size=16,
                                     posterior=post_c)
    mu_r, var_r = model.posterior_predict(post_c, xq)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_r), atol=1e-6)

    # Tampered sidecar: the loader refuses to import outside the package.
    import json as _json
    bad = tmp_path / "bad"
    save_posterior(bad, ppost)
    desc = _json.loads((bad / "posterior.json").read_text())
    desc["class"] = ["os.path", "join"]
    (bad / "posterior.json").write_text(_json.dumps(desc))
    with pytest.raises(ValueError, match="cggp_tpu"):
        load_posterior(bad)

    # Escape via the qualname getattr walk: the module prefix passes but the
    # resolved object reaches outside the package through the module's own
    # imports (cli.sweep imports subprocess) — must be refused BEFORE any
    # call, by the resolved-class NamedTuple check.
    desc["class"] = ["cggp_tpu.cli.sweep", "subprocess.check_output"]
    (bad / "posterior.json").write_text(_json.dumps(desc))
    with pytest.raises(ValueError, match="NamedTuple"):
        load_posterior(bad)

    # In-package but not a NamedTuple class (a function): also refused.
    desc["class"] = ["cggp_tpu.utils.store", "load_posterior"]
    (bad / "posterior.json").write_text(_json.dumps(desc))
    with pytest.raises(ValueError, match="NamedTuple"):
        load_posterior(bad)

    with pytest.raises(TypeError, match="NamedTuple"):
        save_posterior(tmp_path / "notpost", {"nu": y[:m]})


def test_multi_output_serving_and_elbo(rng, tmp_path):
    """Multi-output (P>1) support across the serving caches (round-4
    verdict item 9): fused predict_f/elbo slice the solved block by
    pseudo_u's width (a fixed :1 slice silently misaligned every column at
    P>1), every CGGP cache serves [T, P] means that match the dense
    Cholesky ClusterGP twin column-for-column, and the caches persist
    through save/load_posterior.  Variance stays [T, 1] — shared-kernel
    models have one predictive variance per point (the dense twin's
    convention)."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import CGGP, ClusterGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.utils import load_posterior, save_posterior

    n, m, p_out = 96, 12, 3
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, p_out)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((m, p_out)), jnp.float32)
    counts = jnp.asarray(rng.integers(1, 6, (m, 1)), jnp.float32)
    xq = x[:20]

    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-12, relative_threshold=True),
        num_data=n, num_probes=3, precondition="chol",
    )
    params = model.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    dense = ClusterGP(kernel=Matern32(), num_data=n)
    dparams = dense.init_params(x[:m], pseudo_u=u, cluster_counts=counts)

    mu_ref, var_ref = dense.predict_f(dparams, xq)
    assert mu_ref.shape == (20, p_out) and var_ref.shape == (20, 1)

    mu, var = model.predict_f(params, xq)
    assert mu.shape == (20, p_out) and var.shape == (20, 1)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-5)

    # Fused ELBO runs (and differentiates) at P>1.
    loss, grads = jax.value_and_grad(
        lambda p: model.training_loss(p, (x, y), jax.random.PRNGKey(0))
    )(params)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grads["kernel"]["lengthscales"])).all()

    # Every serving cache: [T, P] means matching the dense twin; exact
    # save/load round trip.
    for solver in ("cg", "chol", "lanczos"):
        post = model.posterior(params, solver=solver)
        pmu, pvar = model.posterior_predict(post, xq)
        assert pmu.shape == (20, p_out), solver
        np.testing.assert_allclose(np.asarray(pmu), np.asarray(mu_ref),
                                   rtol=1e-4, atol=1e-5, err_msg=solver)
        if solver != "lanczos":  # LOVE variance is a conservative estimate
            np.testing.assert_allclose(np.asarray(pvar), np.asarray(var_ref),
                                       rtol=1e-4, atol=1e-5, err_msg=solver)
        d = tmp_path / f"mo_{solver}"
        save_posterior(d, post)
        loaded = load_posterior(d)
        np.testing.assert_array_equal(
            np.asarray(model.posterior_predict(loaded, xq)[0]),
            np.asarray(pmu))

    # Matrix-free family (ImplicitCGGP): fused elbo + posterior at P>1.
    from cggp_tpu.models import ImplicitCGGP

    imp = ImplicitCGGP(
        kernel=Matern32(), num_data=n, num_probes=3, block=8,
        error_threshold=1e-12, relative_threshold=True,
        max_cg_iterations=64,
    )
    ip = imp.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    mask = np.asarray(ip["inducing_mask"])[:, 0] > 0.5
    iloss = float(imp.training_loss(ip, (x, y), jax.random.PRNGKey(0)))
    assert np.isfinite(iloss)
    imu, ivar = imp.predict_f(ip, xq)
    assert imu.shape == (20, p_out)
    np.testing.assert_allclose(np.asarray(imu), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-5)
    ipost = imp.posterior(ip, solver="cg")
    pmu2, _ = imp.posterior_predict(ipost, xq)
    np.testing.assert_allclose(np.asarray(pmu2), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-5)
    del mask
