"""ImplicitCGGP: single-chip matrix-free CGGP (no [M, M] Gram build).

Exactness anchors:
* vs ShardedCGGP — same RowSolveCGGP math, same PRNG probe layout, so ELBO
  and gradients must agree to solver tolerance;
* vs dense ClusterGP — deterministic paths (predict, serving) must match the
  Cholesky oracle;
* the compiled ELBO program must contain NO [M, M]-shaped tensor (the
  model's reason to exist).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import CGGP, ClusterGP, ImplicitCGGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32, SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.parallel import ShardedCGGP, make_mesh


def _data(rng, n=96, d=2):
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])) + 0.1 * rng.standard_normal((n, 1)))
    return x, y


def _models(rng, m=13, n=96, block=8, **kw):
    x, y = _data(rng, n=n)
    kernel = Matern32()
    counts = jnp.asarray(rng.integers(1, 9, (m, 1)), x.dtype)
    u = jnp.asarray(rng.standard_normal((m, 1)))
    implicit = ImplicitCGGP(
        kernel=kernel, num_data=n, num_probes=4, error_threshold=1e-14,
        max_cg_iterations=64, block=block, **kw,
    )
    params = implicit.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    dense = ClusterGP(kernel=kernel, num_data=n)
    dense_params = dense.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    return implicit, params, dense, dense_params, (x, y)


def test_implicit_predict_matches_dense_clustergp(rng):
    implicit, params, dense, dense_params, data = _models(rng, m=13, block=8)
    # m=13 > block=8: padded to 16, scan path + mask both exercised.
    assert params["inducing_points"].shape[0] == 16
    x = data[0]
    mu_i, var_i = jax.jit(implicit.predict_f)(params, x)
    mu_d, var_d = dense.predict_f(dense_params, x)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_d), atol=1e-6)

    mu_f, cov_f = jax.jit(implicit.predict_f, static_argnames="full_cov")(
        params, x[:9], full_cov=True
    )
    mu_fd, cov_fd = dense.predict_f(dense_params, x[:9], full_cov=True)
    np.testing.assert_allclose(np.asarray(cov_f), np.asarray(cov_fd), atol=1e-6)


def test_implicit_elbo_and_grads_match_sharded(rng):
    """ImplicitCGGP and ShardedCGGP share the row-convention math and probe
    layout — same key must give near-identical ELBOs and gradients (the two
    backends differ only in how the matvec is blocked)."""
    implicit, params, _, _, data = _models(rng, m=13, block=8)
    mesh = make_mesh(8)
    sharded = ShardedCGGP(
        kernel=implicit.kernel, mesh=mesh, num_data=implicit.num_data,
        num_probes=4, error_threshold=1e-14, max_cg_iterations=64,
    )
    # Same pad multiple (8) by construction -> identical param shapes.
    key = jax.random.PRNGKey(3)
    e_i = float(jax.jit(implicit.elbo)(params, data, key))
    e_s = float(jax.jit(sharded.elbo)(params, data, key))
    np.testing.assert_allclose(e_i, e_s, rtol=1e-7)

    g_i = jax.jit(jax.grad(lambda p: implicit.training_loss(p, data, key)))(params)
    g_s = jax.jit(jax.grad(lambda p: sharded.training_loss(p, data, key)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_i), jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(g_i["pseudo_u"][13:]), 0.0)


def test_implicit_preconditioned_and_slq_variants(rng):
    """pivchol/rff preconditioning must not change converged values; SLQ
    makes the ELBO value match the Cholesky ClusterGP ELBO."""
    implicit, params, dense, dense_params, data = _models(rng, m=13, block=8)
    key = jax.random.PRNGKey(5)
    e_plain = float(jax.jit(implicit.elbo)(params, data, key))

    for mode in ("pivchol", "rff"):
        pre = ImplicitCGGP(
            kernel=implicit.kernel, num_data=implicit.num_data, num_probes=4,
            error_threshold=1e-14, max_cg_iterations=64, block=8,
            precondition=mode, precond_rank=6,
        )
        e_pre = float(jax.jit(pre.elbo)(params, data, key))
        np.testing.assert_allclose(e_pre, e_plain, rtol=1e-7)

    slq = ImplicitCGGP(
        kernel=implicit.kernel, num_data=implicit.num_data, num_probes=96,
        error_threshold=1e-14, max_cg_iterations=64, block=8,
        logdet_variant="slq", slq_lanczos_iters=13,
    )
    e_slq = float(jax.jit(slq.elbo)(params, data, key))
    e_dense = float(dense.elbo(dense_params, data))
    np.testing.assert_allclose(e_slq, e_dense, rtol=0.05, atol=0.5)
    grads = jax.jit(jax.grad(lambda p: slq.training_loss(p, data, key)))(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_implicit_posterior_serving(rng):
    implicit, params, dense, dense_params, data = _models(rng, m=13, block=8)
    x = data[0][:17]
    mu_d, var_d = dense.predict_f(dense_params, x)

    post = jax.jit(implicit.posterior, static_argnames="solver")(params)
    assert post.chol is None  # auto NEVER picks chol on the implicit model
    mu_p, var_p = jax.jit(implicit.posterior_predict)(post, x)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_d), atol=1e-6)
    mu_m = jax.jit(implicit.posterior_mean)(post, x)
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_d), atol=1e-6)

    mu_f, cov_f = jax.jit(implicit.posterior_predict, static_argnames="full_cov")(
        post, x, full_cov=True
    )
    _, cov_fd = dense.predict_f(dense_params, x, full_cov=True)
    np.testing.assert_allclose(np.asarray(cov_f), np.asarray(cov_fd), atol=1e-6)

    with pytest.raises(ValueError, match="matrix-free"):
        implicit.posterior(params, solver="chol")


def test_implicit_elbo_compiles_without_m_by_m_tensor(rng):
    """The reason this model exists: at M = 64 > block = 16 the compiled
    training-loss program must contain no [M, M]-shaped tensor anywhere
    (forward or backward).  The dense CGGP program does, proving the check
    would catch a regression."""
    m, n, block = 64, 8, 16
    x, y = _data(rng, n=n)
    kernel = SquaredExponential()
    counts = jnp.ones((m, 1), x.dtype)
    u = jnp.asarray(rng.standard_normal((m, 1)))

    implicit = ImplicitCGGP(kernel=kernel, num_data=n, num_probes=2,
                            error_threshold=1e-10, max_cg_iterations=16,
                            block=block, precondition="pivchol", precond_rank=4)
    params = implicit.init_params(jnp.asarray(rng.uniform(-1, 1, (m, 2))),
                                  pseudo_u=u, cluster_counts=counts)
    key = jax.random.PRNGKey(0)

    def loss(p):
        return implicit.training_loss(p, (x, y), key)

    def grad_hlo(fn, p):
        return jax.jit(jax.grad(fn)).lower(p).compile().as_text()

    import re

    # Anchor to the bracketed HLO shape syntax (f64[64,64]) so unrelated
    # shapes like f32[264,64] or f32[64,640] can never match.
    marker = re.compile(rf"\[{m},{m}\]")
    hlo = grad_hlo(loss, params)
    assert not marker.search(hlo), "implicit model materialised an [M, M] tensor"

    dense = CGGP(kernel=kernel, conjugate_gradient=ConjugateGradient(1e-10, max_iterations=16),
                 num_data=n, num_probes=2)
    dense_params = dense.init_params(params["inducing_points"],
                                     pseudo_u=params["pseudo_u"],
                                     cluster_counts=params["cluster_counts"])
    hlo_dense = grad_hlo(lambda p: dense.training_loss(p, (x, y), key), dense_params)
    assert marker.search(hlo_dense), "sanity: the dense model should show [M, M]"


def test_implicit_training_improves_loss(rng):
    import optax

    implicit, params, _, _, data = _models(rng, m=16, block=8)
    implicit = ImplicitCGGP(
        kernel=implicit.kernel, num_data=implicit.num_data, num_probes=3,
        error_threshold=1e-10, max_cg_iterations=48, block=8,
        relative_threshold=True,
    )
    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(0)
    mask = implicit.trainable_mask(params)

    @jax.jit
    def step(p, s, k):
        g = jax.grad(lambda q: implicit.training_loss(q, data, k))(p)
        g = jax.tree_util.tree_map(
            lambda gi, mi: gi if mi else jnp.zeros_like(gi), g,
            jax.tree_util.tree_map(lambda _: True, p) if mask is None else mask,
        )
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    before = float(jax.jit(implicit.training_loss)(params, data, key))
    for i in range(25):
        params, opt_state = step(params, opt_state, jax.random.fold_in(key, i))
    after = float(jax.jit(implicit.training_loss)(params, data, key))
    assert np.isfinite(after) and after < before


def test_implicit_use_pallas_reaches_kernel_and_matches(rng, monkeypatch):
    """Round-3 review regression: use_pallas=True previously never routed any
    solve through the Pallas kernel (the gate required mask is None, but the
    row-solver base always threads an inducing_mask array).  The masked
    matvec now composes around the unmasked kernel —
    ``mask * kuu_matvec(p * mask) + p * lam * (1 - mask)`` — so this asserts
    (a) the kernel is actually reached and (b) results match the blocked XLA
    path on a genuinely padded system (m=50 -> 64, 14 pad rows)."""
    import cggp_tpu.ops.pallas_gram as pg

    calls = []
    orig = pg.kuu_matvec

    def spy(z_scaled, lam, p, variance, kernel_name="se", **kw):
        calls.append(1)
        # interpret=False pallas doesn't run on CPU; small blocks fit m=64.
        kw.update(interpret=True, block_n=16, block_m=16)
        return orig(z_scaled, lam, p, variance, kernel_name, **kw)

    monkeypatch.setattr(pg, "kuu_matvec", spy)

    n, m = 96, 50
    kernel = SquaredExponential()
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
    counts = jnp.asarray(rng.uniform(1, 6, (m, 1)), jnp.float32)
    iv = jnp.asarray(rng.uniform(-1, 1, (m, 2)), jnp.float32)

    def build(use_pallas):
        model = ImplicitCGGP(kernel=kernel, num_data=n, error_threshold=1e-12,
                             max_cg_iterations=128, num_probes=2, block=32,
                             use_pallas=use_pallas)
        params = model.init_params(iv, pseudo_u=u, cluster_counts=counts,
                                   noise_variance=0.1)
        return model, params

    model_p, params_p = build(True)
    assert int(params_p["inducing_mask"].shape[0]) == 64  # pads present
    model_x, params_x = build(False)

    key = jax.random.PRNGKey(0)
    mu_p, var_p = model_p.predict_f(params_p, x)
    assert calls, "use_pallas=True never reached the Pallas kernel"
    mu_x, var_x = model_x.predict_f(params_x, x)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_x),
                               rtol=1e-4, atol=1e-5)

    loss_p = float(model_p.training_loss(params_p, (x, y), key))
    loss_x = float(model_x.training_loss(params_x, (x, y), key))
    np.testing.assert_allclose(loss_p, loss_x, rtol=1e-4)
