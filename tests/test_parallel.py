"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md section 4:
psum-blocked matvec vs single-device oracle, sharded model vs dense model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import CGGP, ClusterGP
from cggp_tpu.ops.cg import ConjugateGradient, conjugate_gradient
from cggp_tpu.ops.kernels import Matern32, SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.parallel import (
    ShardedCGGP,
    make_data_parallel_loss,
    make_data_parallel_predict,
    make_mesh,
    make_sharded_cg,
    pad_inducing,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _system(rng, m=32, d=2):
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.3, lengthscales=np.full(d, 0.7))
    z = jnp.asarray(rng.uniform(-1, 1, (m, d)))
    lam = jnp.asarray(rng.uniform(0.1, 0.5, (m,)))
    rhs = jnp.asarray(rng.standard_normal((3, m)))
    return kernel, kp, z, lam, rhs


def test_sharded_cg_matches_dense_solve(mesh, rng):
    kernel, kp, z, lam, rhs = _system(rng)
    solve = make_sharded_cg(kernel, mesh, 1e-14, 64)
    solution, stats = solve(kp, z, lam, rhs)

    a = add_diagonal(kernel.K(kp, z), lam)
    expected = jnp.linalg.solve(a, rhs.T).T
    np.testing.assert_allclose(np.asarray(solution), np.asarray(expected), atol=1e-8)
    assert int(stats.steps) > 0


def test_sharded_cg_gradients_match_dense(mesh, rng):
    """Gradient parity vs the dense custom-VJP solver AND the pure autodiff
    dense-solve path (the cg_test.py:12-46 pattern, now multi-device)."""
    kernel, kp, z, lam, rhs = _system(rng, m=16)
    solve = make_sharded_cg(kernel, mesh, 1e-14, 64)

    def loss_sharded(kp, z, lam):
        sol, _ = solve(kp, z, lam, rhs)
        return jnp.sum(jnp.square(sol))

    def loss_dense(kp, z, lam):
        a = add_diagonal(kernel.K(kp, z), lam)
        sol = jnp.linalg.solve(a, rhs.T).T
        return jnp.sum(jnp.square(sol))

    # jit: unjitted op-by-op dispatch through the 8-device emulation is the
    # suite's wall-clock hot spot (~6x slower than the compiled program).
    g_sharded = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(kp, z, lam)
    g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(kp, z, lam)
    for gs, gd in zip(jax.tree_util.tree_leaves(g_sharded),
                      jax.tree_util.tree_leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-5, atol=1e-7)


def test_pad_inducing_is_exact_noop(mesh, rng):
    """M=13 padded to 16: solutions on real entries match the unpadded dense
    solve and padded entries are exactly 0."""
    kernel, kp, z, lam, rhs = _system(rng, m=13)
    z_p, lam_p, rhs_p = pad_inducing(z, lam, 8, rhs)
    assert z_p.shape[0] == 16

    solve = make_sharded_cg(kernel, mesh, 1e-14, 64)
    solution, _ = solve(kp, z_p, lam_p, rhs_p)

    a = add_diagonal(kernel.K(kp, z), lam)
    expected = jnp.linalg.solve(a, rhs.T).T
    np.testing.assert_allclose(np.asarray(solution[:, :13]), np.asarray(expected), atol=1e-8)
    np.testing.assert_allclose(np.asarray(solution[:, 13:]), 0.0, atol=1e-12)


def test_pad_inducing_exact_with_huge_lengthscale(mesh, rng):
    """A lengthscale on the pad-offset scale (1e6) breaks the underflow
    trick outright (K(pad, real) ~ exp(-2) ~ 0.14); the threaded
    inducing mask keeps padded solutions EXACTLY 0 and real entries equal to
    the unpadded dense solve at any scale."""
    kernel = SquaredExponential()
    d, m = 2, 13
    kp = kernel.init_params(variance=1.3, lengthscales=np.full(d, 1.0e6))
    z = jnp.asarray(rng.uniform(-1, 1, (m, d)))
    lam = jnp.asarray(rng.uniform(0.5, 1.0, (m,)))
    rhs = jnp.asarray(rng.standard_normal((3, m)))
    z_p, lam_p, rhs_p = pad_inducing(z, lam, 8, rhs)
    mask = jnp.concatenate([jnp.ones(m), jnp.zeros(z_p.shape[0] - m)])

    solve = make_sharded_cg(kernel, mesh, 1e-14, 64)
    solution, _ = solve(kp, z_p, lam_p, rhs_p, mask=mask)

    a = add_diagonal(kernel.K(kp, z), lam)
    expected = jnp.linalg.solve(a, rhs.T).T
    np.testing.assert_allclose(
        np.asarray(solution[:, :m]), np.asarray(expected), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_array_equal(np.asarray(solution[:, m:]), 0.0)

    # Sanity: WITHOUT the mask the pads visibly re-couple at this scale,
    # proving the mask is load-bearing rather than vacuous.
    unmasked, _ = solve(kp, z_p, lam_p, rhs_p)
    assert np.abs(np.asarray(unmasked[:, m:])).max() > 1e-6


def _cluster_setup(rng, mesh, m=13, n=96, d=2):
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])) + 0.1 * rng.standard_normal((n, 1)))
    kernel = Matern32()
    sharded = ShardedCGGP(
        kernel=kernel, mesh=mesh, num_data=n, num_probes=4,
        error_threshold=1e-14, max_cg_iterations=64,
    )
    counts = jnp.asarray(rng.integers(1, 9, (m, 1)), x.dtype)
    u = jnp.asarray(rng.standard_normal((m, 1)))
    params = sharded.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    dense = ClusterGP(kernel=kernel, num_data=n)
    dense_params = dense.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    return sharded, params, dense, dense_params, (x, y)


def test_sharded_cggp_predict_matches_dense_clustergp(mesh, rng):
    sharded, params, dense, dense_params, data = _cluster_setup(rng, mesh)
    x = data[0]
    mu_s, var_s = jax.jit(sharded.predict_f)(params, x)
    mu_d, var_d = dense.predict_f(dense_params, x)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d), atol=1e-6)


def test_sharded_posterior_cache_matches_predict_f(mesh, rng):
    """The multi-chip serving cache (posterior / posterior_predict /
    posterior_mean) must reproduce predict_f, and compose with
    predict_in_batches' fast path."""
    sharded, params, dense, dense_params, data = _cluster_setup(rng, mesh)
    x = data[0]
    mu_ref, var_ref = jax.jit(sharded.predict_f)(params, x)

    # "auto" = one-time Cholesky of the masked (Kmm + Lambda) (pads
    # decoupled, unit diag); "cg" = the psum-blocked per-batch solve.
    # predict_f itself is CG-accurate, so the chol comparison is bounded by
    # the CG stopping error (~3e-8 here), not exactness.
    for solver, atol in (("auto", 1e-6), ("cg", 1e-8)):
        post = jax.jit(sharded.posterior, static_argnames="solver")(
            params, solver=solver
        )
        assert (post.chol is not None) == (solver == "auto")
        mu_p, var_p = jax.jit(sharded.posterior_predict)(post, x)
        np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_ref), atol=atol)
        np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_ref), atol=atol)
        mu_m = jax.jit(sharded.posterior_mean)(post, x)
        np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_ref), atol=atol)

    from cggp_tpu.training.optimize import predict_in_batches

    mu_b, none_var = predict_in_batches(sharded, params, x, batch_size=32,
                                        mean_only=True)
    assert none_var is None
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_ref), atol=1e-6)


def test_sharded_cggp_kl_matches_dense_modulo_logdet(mesh, rng):
    """Sharded KL (logdet term = 0 by design) must equal the Cholesky KL
    minus its 0.5*logdet term, up to Monte-Carlo trace error."""
    sharded, params, dense, dense_params, _ = _cluster_setup(rng, mesh)
    sharded = ShardedCGGP(
        kernel=sharded.kernel, mesh=mesh, num_data=sharded.num_data,
        num_probes=256, error_threshold=1e-14, max_cg_iterations=64,
    )
    kl_sharded = float(jax.jit(sharded.prior_kl)(params, jax.random.PRNGKey(0)))

    from cggp_tpu.ops.linalg import add_diagonal

    var = dense.diag_variance(dense_params)
    a = add_diagonal(dense.kernel.K(dense_params["kernel"], dense_params["inducing_points"]),
                     var[:, 0])
    logdet = float(jnp.linalg.slogdet(a)[1])
    kl_dense = float(dense.prior_kl(dense_params))
    np.testing.assert_allclose(kl_sharded, kl_dense - 0.5 * logdet, rtol=0.05, atol=0.3)


def test_sharded_logdet_gradient_matches_true_logdet_grad(mesh, rng):
    """With many probes the zero-valued logdet's gradient approaches the
    autodiff gradient of the true logdet (the logdet_test pattern of
    reference cg_test.py:49-77, multi-device)."""
    kernel, kp, z, lam, _ = _system(rng, m=16)
    sharded = ShardedCGGP(
        kernel=kernel, mesh=mesh, num_data=10, num_probes=192,
        error_threshold=1e-14, max_cg_iterations=64,
    )

    def logdet_via_sharded(kp_):
        m = z.shape[0]
        probes = jax.random.rademacher(jax.random.PRNGKey(1), (192, m), dtype=z.dtype)
        mask = jnp.ones((m,), dtype=z.dtype)
        return sharded._logdet(kp_, z, lam, mask, probes)

    def logdet_true(kp_):
        a = add_diagonal(kernel.K(kp_, z), lam)
        return jnp.linalg.slogdet(a)[1]

    g_est = jax.jit(jax.grad(logdet_via_sharded))(kp)
    g_true = jax.jit(jax.grad(logdet_true))(kp)
    for ge, gt in zip(jax.tree_util.tree_leaves(g_est), jax.tree_util.tree_leaves(g_true)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gt), rtol=0.25, atol=0.03)


def test_data_parallel_loss_matches_single_device(mesh, rng):
    n, d, m = 64, 2, 8
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(np.asarray(x[:, :1])))
    kernel = SquaredExponential()
    model = CGGP(
        kernel=kernel, conjugate_gradient=ConjugateGradient(1e-12),
        num_data=n, num_probes=3,
    )
    params = model.init_params(x[:m])
    key = jax.random.PRNGKey(0)

    loss_fn = lambda p, batch, k: model.training_loss(p, batch, k)
    dp_loss = make_data_parallel_loss(loss_fn, mesh)
    batch = shard_batch(mesh, x, y)
    sharded_val = float(dp_loss(params, batch, key))
    single_val = float(loss_fn(params, (x, y), key))
    np.testing.assert_allclose(sharded_val, single_val, rtol=1e-6)


def test_data_parallel_predict_shards_rows(mesh, rng):
    n, d, m = 64, 2, 8
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.zeros((n, 1), x.dtype)
    kernel = SquaredExponential()
    model = ClusterGP(kernel=kernel, num_data=n)
    params = model.init_params(x[:m])

    dp_predict = make_data_parallel_predict(
        lambda p, xq: model.predict_f(p, xq, full_cov=False), mesh
    )
    xq = shard_batch(mesh, x)
    mu, var = dp_predict(params, xq)
    mu_ref, var_ref = model.predict_f(params, x, full_cov=False)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=1e-9)


def test_sharded_training_step_improves_loss(mesh, rng):
    """One full Adam training step pipeline on the mesh — the dryrun path."""
    import optax

    sharded, params, _, _, data = _cluster_setup(rng, mesh, m=13, n=128)
    initial_mask = np.asarray(params["inducing_mask"]).copy()
    assert initial_mask.sum() == 13 and initial_mask.shape[0] == 16  # 3 pads
    loss_fn = lambda p, b, k: sharded.training_loss(p, b, k)
    optimizer = optax.adam(0.05)
    opt_state = optimizer.init(params)
    mask = sharded.trainable_mask(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        grads = jax.tree_util.tree_map(
            lambda g, m_: g if m_ else jnp.zeros_like(g), grads, mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(10):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, data, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # Frozen pads must not move.
    np.testing.assert_array_equal(np.asarray(params["inducing_mask"]), initial_mask)


def test_sharded_assign_clusters_repads(mesh, rng):
    sharded, params, _, _, data = _cluster_setup(rng, mesh, m=13)
    x, y = data
    # Re-cluster to a different, also non-divisible M.
    from cggp_tpu.selection.update import labels_update_inducing_parameters

    iv, u, counts = labels_update_inducing_parameters(data, x[:10])
    new_params = sharded.assign_clusters(params, iv, u, counts)
    assert new_params["inducing_points"].shape[0] == 16  # padded to mesh multiple
    assert float(new_params["inducing_mask"].sum()) == 10.0
    mu, var = sharded.predict_f(new_params, x[:8])
    assert np.all(np.isfinite(np.asarray(mu)))


def test_sharded_fused_elbo_consistent_with_parts(mesh, rng):
    """The fused sharded ELBO must match KL + data-term computed via the
    separate prior_kl / predict_f paths (same key => same probes)."""
    sharded, params, _, _, data = _cluster_setup(rng, mesh, m=13, n=96)
    x, y = data
    key = jax.random.PRNGKey(3)
    e_fused = float(jax.jit(sharded.elbo)(params, (x, y), key))

    kl = float(jax.jit(sharded.prior_kl)(params, key))
    mu, var = jax.jit(sharded.predict_f)(params, x)
    ve = float(jnp.sum(sharded.likelihood.variational_expectations(
        params["likelihood"], mu, var, y)))
    np.testing.assert_allclose(e_fused, ve - kl, rtol=1e-6)


def test_sharded_fused_elbo_gradients_finite_and_pads_inert(mesh, rng):
    sharded, params, _, _, data = _cluster_setup(rng, mesh, m=13, n=96)
    key = jax.random.PRNGKey(4)
    grads = jax.jit(jax.grad(lambda p: sharded.training_loss(p, data, key)))(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # Gradients w.r.t. padded inducing rows must be exactly zero for pseudo_u
    # (pads never touch the objective).
    np.testing.assert_array_equal(np.asarray(grads["pseudo_u"][13:]), 0.0)


def test_sharded_pivchol_preconditioned_elbo_matches(mesh, rng):
    """Matrix-free pivoted-Cholesky preconditioning inside the sharded solve:
    same ELBO and gradients (converged solves), far fewer CG iterations."""
    x = jnp.asarray(rng.uniform(-1, 1, (64, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])) + 0.1 * rng.standard_normal((64, 1)))
    kernel = Matern32()
    counts = jnp.asarray(rng.integers(1, 9, (9, 1)), x.dtype)
    u = jnp.asarray(rng.standard_normal((9, 1)))

    def build(**kw):
        model = ShardedCGGP(kernel=kernel, mesh=mesh, num_data=64, num_probes=2,
                            error_threshold=1e-14, max_cg_iterations=32, **kw)
        return model, model.init_params(x[:9], pseudo_u=u, cluster_counts=counts)

    plain, params = build()
    pre, params_pre = build(precondition="pivchol", precond_rank=8)
    key = jax.random.PRNGKey(5)

    e_plain = float(jax.jit(plain.elbo)(params, (x, y), key))
    e_pre = float(jax.jit(pre.elbo)(params_pre, (x, y), key))
    np.testing.assert_allclose(e_pre, e_plain, rtol=1e-8)

    g_plain = jax.jit(jax.grad(lambda p: plain.training_loss(p, (x, y), key)))(params)
    g_pre = jax.jit(jax.grad(lambda p: pre.training_loss(p, (x, y), key)))(params_pre)
    for a, b in zip(jax.tree_util.tree_leaves(g_pre), jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)

    # On this tiny well-conditioned system both converge in ~10 iterations;
    # the iteration CUT is asserted at realistic sizes in the single-chip
    # tests (same cg_loop under the shard_map) — here just require the
    # preconditioner never costs extra iterations.
    s_plain = plain.cg_stats(params, (x, y), key)
    s_pre = pre.cg_stats(params_pre, (x, y), key)
    assert int(s_pre.steps) <= int(s_plain.steps)


def test_sharded_pivchol_under_jit(mesh, rng):
    """The preconditioned sharded training step must compile and run jitted
    (the factor build, QR and eigh all trace into one program)."""
    x = jnp.asarray(rng.uniform(-1, 1, (64, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])))
    kernel = Matern32()
    model = ShardedCGGP(kernel=kernel, mesh=mesh, num_data=64, num_probes=2,
                        error_threshold=1e-10, max_cg_iterations=32,
                        precondition="pivchol", precond_rank=8)
    counts = jnp.ones((11, 1), x.dtype)
    params = model.init_params(x[:11], pseudo_u=y[:11], cluster_counts=counts)
    loss = jax.jit(lambda p, k: model.training_loss(p, (x, y), k))
    val = loss(params, jax.random.PRNGKey(0))
    assert np.isfinite(float(val))


def test_sharded_training_with_steps_per_call(mesh, rng):
    """The K-steps-per-dispatch scan composes with the shard_map'd model."""
    from cggp_tpu.training.optimize import train_using_adam_and_update

    x = jnp.asarray(rng.uniform(-1, 1, (96, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])))
    kernel = Matern32()
    model = ShardedCGGP(kernel=kernel, mesh=mesh, num_data=96, num_probes=2,
                        error_threshold=1e-10, max_cg_iterations=32)
    counts = jnp.ones((11, 1), x.dtype)
    params = model.init_params(x[:11], pseudo_u=y[:11], cluster_counts=counts)
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    eval_loss = jax.jit(loss_fn)
    key = jax.random.PRNGKey(0)
    before = float(eval_loss(params, (x, y), key))
    out = train_using_adam_and_update(params, loss_fn, (x, y), 6, 32, 0.05, key,
                                      steps_per_call=3,
                                      trainable_mask=model.trainable_mask(params))
    after = float(eval_loss(out, (x, y), key))
    assert np.isfinite(after) and after < before


# -- round 3: SLQ logdet on the sharded path, rff preconditioning, full_cov --


def test_sharded_slq_value_matches_dense_and_truth(mesh, rng):
    """The psum-blocked SLQ value must equal the dense SLQ estimator on the
    SAME probes (identical Lanczos recurrence), and with Krylov-exhausting
    iteration counts both approach the true slogdet up to Hutchinson error."""
    from cggp_tpu.ops.logdet import _slq_value, slq_value_rows
    from cggp_tpu.parallel.sharded_cg import make_sharded_slq_value

    kernel, kp, z, lam, _ = _system(rng, m=16)
    m = 16
    iters = 16  # = m: per-probe quadrature becomes exact
    probes = jax.random.rademacher(jax.random.PRNGKey(7), (64, m), dtype=z.dtype)
    mask = jnp.ones((m,), dtype=z.dtype)

    slq = make_sharded_slq_value(kernel, mesh, iters)
    v_sharded = float(jax.jit(slq)(kp, z, lam, mask, probes))

    a = add_diagonal(kernel.K(kp, z), lam)
    v_dense = float(_slq_value(a, probes.T, iters))
    np.testing.assert_allclose(v_sharded, v_dense, rtol=1e-8)

    v_true = float(jnp.linalg.slogdet(a)[1])
    np.testing.assert_allclose(v_sharded, v_true, rtol=0.15, atol=0.3)


def test_sharded_slq_value_with_pads_targets_real_submatrix(mesh, rng):
    """Masked probes + the ||z||^2 Hutchinson scaling: the SLQ value of the
    padded system equals the dense SLQ value of the REAL submatrix computed
    with the same (truncated) probes."""
    from cggp_tpu.ops.logdet import _slq_value
    from cggp_tpu.parallel.sharded_cg import make_sharded_slq_value

    kernel, kp, z, lam, _ = _system(rng, m=13)
    z_p, lam_p = pad_inducing(z, lam, 8)
    m_pad = z_p.shape[0]
    mask = jnp.concatenate([jnp.ones(13), jnp.zeros(m_pad - 13)])
    iters = 13
    probes = jax.random.rademacher(
        jax.random.PRNGKey(8), (48, m_pad), dtype=z.dtype
    ) * mask[None, :]

    slq = make_sharded_slq_value(kernel, mesh, iters)
    v_padded = float(jax.jit(slq)(kp, z_p, lam_p, mask, probes))

    a_real = add_diagonal(kernel.K(kp, z), lam)
    v_real = float(_slq_value(a_real, probes[:, :13].T, iters))
    np.testing.assert_allclose(v_padded, v_real, rtol=1e-8)


def test_sharded_slq_gradient_matches_true_logdet_grad(mesh, rng):
    """SLQ keeps the reference gradient path: with many probes its gradient
    approaches the autodiff gradient of the true logdet (same contract as the
    zero-value estimator, test above)."""
    kernel, kp, z, lam, _ = _system(rng, m=16)
    sharded = ShardedCGGP(
        kernel=kernel, mesh=mesh, num_data=10, num_probes=192,
        error_threshold=1e-14, max_cg_iterations=64,
        logdet_variant="slq", slq_lanczos_iters=16,
    )
    m = z.shape[0]
    probes = jax.random.rademacher(jax.random.PRNGKey(1), (192, m), dtype=z.dtype)
    mask = jnp.ones((m,), dtype=z.dtype)

    def logdet_slq(kp_):
        return sharded._slq_logdet(kp_, z, lam, mask, probes)

    def logdet_true(kp_):
        a = add_diagonal(kernel.K(kp_, z), lam)
        return jnp.linalg.slogdet(a)[1]

    # Value: per-probe quadrature exact at iters = m, so only MC error left.
    v = float(jax.jit(logdet_slq)(kp))
    np.testing.assert_allclose(v, float(logdet_true(kp)), rtol=0.1, atol=0.3)

    g_est = jax.jit(jax.grad(logdet_slq))(kp)
    g_true = jax.jit(jax.grad(logdet_true))(kp)
    for ge, gt in zip(jax.tree_util.tree_leaves(g_est), jax.tree_util.tree_leaves(g_true)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gt), rtol=0.25, atol=0.03)


def test_sharded_slq_elbo_value_matches_cholesky_elbo(mesh, rng):
    """With logdet_variant="slq" the sharded ELBO VALUE approaches the dense
    Cholesky ClusterGP ELBO (true logdet included) — sharded ELBOs become
    meaningful, not gradient-only.  Padded M exercises the masked-probe
    Hutchinson scaling inside the fused step."""
    sharded, params, dense, dense_params, data = _cluster_setup(rng, mesh, m=13, n=96)
    sharded = ShardedCGGP(
        kernel=sharded.kernel, mesh=mesh, num_data=sharded.num_data,
        num_probes=128, error_threshold=1e-14, max_cg_iterations=64,
        logdet_variant="slq", slq_lanczos_iters=13,
    )
    key = jax.random.PRNGKey(11)
    e_sharded = float(jax.jit(sharded.elbo)(params, data, key))
    e_dense = float(dense.elbo(dense_params, data))
    np.testing.assert_allclose(e_sharded, e_dense, rtol=0.05, atol=0.5)

    # prior_kl and elbo stay consistent (same fused/unfused contract as the
    # zero-value variant).
    kl = float(jax.jit(sharded.prior_kl)(params, key))
    x, y = data
    mu, var = jax.jit(sharded.predict_f)(params, x)
    ve = float(jnp.sum(sharded.likelihood.variational_expectations(
        params["likelihood"], mu, var, y)))
    np.testing.assert_allclose(e_sharded, ve - kl, rtol=1e-6)

    # Gradients: finite everywhere, exactly zero on padded pseudo_u rows.
    grads = jax.jit(jax.grad(lambda p: sharded.training_loss(p, data, key)))(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    np.testing.assert_array_equal(np.asarray(grads["pseudo_u"][13:]), 0.0)


def test_sharded_rff_preconditioned_elbo_matches(mesh, rng):
    """RFF preconditioning on the sharded model (round-2 verdict item 7):
    preconditioning is solver state, so ELBO values and gradients must match
    the unpreconditioned model on converged solves."""
    x = jnp.asarray(rng.uniform(-1, 1, (64, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])) + 0.1 * rng.standard_normal((64, 1)))
    kernel = Matern32()
    counts = jnp.asarray(rng.integers(1, 9, (9, 1)), x.dtype)
    u = jnp.asarray(rng.standard_normal((9, 1)))

    def build(**kw):
        model = ShardedCGGP(kernel=kernel, mesh=mesh, num_data=64, num_probes=2,
                            error_threshold=1e-14, max_cg_iterations=64, **kw)
        return model, model.init_params(x[:9], pseudo_u=u, cluster_counts=counts)

    plain, params = build()
    pre, params_pre = build(precondition="rff", precond_rank=16)
    key = jax.random.PRNGKey(5)

    e_plain = float(jax.jit(plain.elbo)(params, (x, y), key))
    e_pre = float(jax.jit(pre.elbo)(params_pre, (x, y), key))
    np.testing.assert_allclose(e_pre, e_plain, rtol=1e-7)

    g_plain = jax.jit(jax.grad(lambda p: plain.training_loss(p, (x, y), key)))(params)
    g_pre = jax.jit(jax.grad(lambda p: pre.training_loss(p, (x, y), key)))(params_pre)
    for a, b in zip(jax.tree_util.tree_leaves(g_pre), jax.tree_util.tree_leaves(g_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_sharded_full_cov_matches_dense(mesh, rng):
    """full_cov predictive covariance on the sharded paths (round-2 verdict
    item 4): predict_f and posterior_predict (both solvers) must match the
    dense ClusterGP's full covariance, pads stripped exactly."""
    sharded, params, dense, dense_params, data = _cluster_setup(rng, mesh, m=13)
    x = data[0][:17]

    mu_d, cov_d = dense.predict_f(dense_params, x, full_cov=True)
    mu_s, cov_s = jax.jit(sharded.predict_f, static_argnames="full_cov")(
        params, x, full_cov=True
    )
    assert cov_s.shape == (1, 17, 17)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov_s), np.asarray(cov_d), atol=1e-6)

    for solver in ("chol", "cg"):
        post = jax.jit(sharded.posterior, static_argnames="solver")(params, solver=solver)
        mu_p, cov_p = jax.jit(sharded.posterior_predict, static_argnames="full_cov")(
            post, x, full_cov=True
        )
        np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_d), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cov_p), np.asarray(cov_d), atol=1e-6)


def test_sharded_resolve_serving_solver_by_conditioning(mesh, rng):
    """Round-3 review follow-up: the eager 'auto' resolver (matrix-free
    Lanczos through the psum matvec, no [M, M] build) must route an
    ill-conditioned fp32 system to CG serving and a well-conditioned one to
    chol — the dense CGGP rule, one class up in the shared row-solver base."""
    n, d, m = 128, 2, 24

    def build(lengthscale, counts_scale):
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
        model = ShardedCGGP(
            kernel=SquaredExponential(), mesh=mesh, num_data=n, num_probes=2,
            error_threshold=1e-6, max_cg_iterations=4 * m,
            relative_threshold=True,
        )
        params = model.init_params(
            x[:m], lengthscales=jnp.full(d, lengthscale, jnp.float32),
            noise_variance=0.1,
            pseudo_u=jnp.asarray(rng.standard_normal((m, 1)), jnp.float32),
            cluster_counts=jnp.full((m, 1), counts_scale, jnp.float32),
            dtype=jnp.float32,
        )
        return model, params

    model, params = build(0.5, 1.0)
    assert model.resolve_serving_solver(params) == "chol"

    model, params = build(8.0, 1.0e4)  # kappa >> 1/eps(fp32)
    assert model.resolve_serving_solver(params) == "cg"
    post = model.posterior(params, solver="cg")
    mu, var = model.posterior_predict(post, jnp.asarray(
        rng.uniform(-1, 1, (16, d)), jnp.float32))
    assert np.isfinite(np.asarray(mu)).all() and np.isfinite(np.asarray(var)).all()

    # The matrix-free model never cholesky-serves, whatever the conditioning.
    from cggp_tpu.models import ImplicitCGGP

    imp = ImplicitCGGP(kernel=SquaredExponential(), num_data=n, block=16,
                       error_threshold=1e-6, max_cg_iterations=64)
    x = jnp.asarray(rng.uniform(-1, 1, (m, d)), jnp.float32)
    ip = imp.init_params(x, noise_variance=0.1, dtype=jnp.float32)
    assert imp.resolve_serving_solver(ip) == "cg"


def test_trainer_mesh_hybrid_dp_tp_matches_replicated(mesh, rng):
    """train_using_adam_and_update(mesh=...) (net-new, round 3): the hybrid
    dp+tp step — batch rows sharded, GSPMD psums for the data terms, the
    model's own M-sharded KL collectives — must produce the same training
    trajectory as the replicated-batch path (identical PRNG streams =>
    identical minibatches; only the reduction layout differs)."""
    from cggp_tpu.training.optimize import train_using_adam_and_update

    n, d, m = 128, 2, 8
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])) + 0.1 * rng.standard_normal((n, 1)))
    model = ShardedCGGP(
        kernel=SquaredExponential(), mesh=mesh, num_data=n, num_probes=2,
        error_threshold=1e-12, max_cg_iterations=32,
    )
    params0 = model.init_params(
        x[:m], noise_variance=0.1,
        pseudo_u=jnp.asarray(rng.standard_normal((m, 1))),
        cluster_counts=jnp.full((m, 1), 4.0),
    )
    kw = dict(
        iterations=4, batch_size=64, learning_rate=0.05,
        key=jax.random.PRNGKey(7),
        trainable_mask=model.trainable_mask(params0),
    )
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    p_repl = train_using_adam_and_update(dict(params0), loss_fn, (x, y), **kw)
    p_dp = train_using_adam_and_update(dict(params0), loss_fn, (x, y),
                                       mesh=mesh, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(p_repl),
                    jax.tree_util.tree_leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)

    with pytest.raises(ValueError, match="steps_per_call"):
        train_using_adam_and_update(dict(params0), loss_fn, (x, y), mesh=mesh,
                                    steps_per_call=4, **kw)
    with pytest.raises(ValueError, match="divide"):
        bad = dict(kw, batch_size=60)
        train_using_adam_and_update(dict(params0), loss_fn, (x, y), mesh=mesh,
                                    **bad)


def test_predict_in_batches_mesh_dp_serving_matches(mesh, rng):
    """Data-parallel serving (net-new, round 3): predict_in_batches(mesh=...)
    shards query rows over the mesh with the posterior cache replicated —
    outputs must match single-device serving exactly; models that run their
    own mesh collectives are rejected."""
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.training.optimize import predict_in_batches

    n, d, m = 200, 2, 24
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    model = CGGP(
        kernel=SquaredExponential(),
        conjugate_gradient=ConjugateGradient(1e-10, max_iterations=4 * m),
        num_data=n, num_probes=2,
    )
    params = model.init_params(
        x[:m], noise_variance=0.1,
        pseudo_u=jnp.asarray(rng.standard_normal((m, 1)), jnp.float32),
        cluster_counts=jnp.full((m, 1), 4.0, jnp.float32),
        dtype=jnp.float32,
    )
    xq = jnp.asarray(rng.uniform(-1, 1, (100, d)), jnp.float32)

    mu1, var1 = predict_in_batches(model, params, xq, batch_size=40)
    # batch 40 does not divide 8 devices: rounded up internally to 48.
    mu8, var8 = predict_in_batches(model, params, xq, batch_size=40, mesh=mesh)
    np.testing.assert_allclose(np.asarray(mu8), np.asarray(mu1),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var8), np.asarray(var1),
                               rtol=1e-6, atol=1e-7)

    mu_m, none = predict_in_batches(model, params, xq, batch_size=40,
                                    mesh=mesh, mean_only=True)
    assert none is None
    # GSPMD partitions the [M] contraction of the mean matmul; fp32
    # reduction order differs from the single-device program at ~1e-5 abs.
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu1),
                               rtol=1e-3, atol=1e-4)

    sharded = ShardedCGGP(kernel=SquaredExponential(), mesh=mesh, num_data=n,
                          error_threshold=1e-8, max_cg_iterations=64)
    sp = sharded.init_params(x[:m], noise_variance=0.1, dtype=jnp.float32)
    with pytest.raises(ValueError, match="own mesh collectives"):
        predict_in_batches(sharded, sp, xq, batch_size=40, mesh=mesh)


def test_mesh_scan_serving_matches(mesh, rng):
    """The one-dispatch scan composes with mesh dp serving (round 3): block
    rows are sharding-constrained inside the lax.map body, and a FORCED
    scan=True over the mesh matches the single-device scan exactly."""
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.training.optimize import (
        posterior_predict_scan,
        predict_in_batches,
    )

    n, d, m = 120, 2, 16
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
    model = CGGP(
        kernel=SquaredExponential(),
        conjugate_gradient=ConjugateGradient(1e-10, max_iterations=4 * m),
        num_data=n, num_probes=2,
    )
    params = model.init_params(
        x[:m], noise_variance=0.1,
        pseudo_u=jnp.asarray(rng.standard_normal((m, 1)), jnp.float32),
        cluster_counts=jnp.full((m, 1), 4.0, jnp.float32),
        dtype=jnp.float32,
    )
    xq = jnp.asarray(rng.uniform(-1, 1, (100, d)), jnp.float32)

    mu1, var1 = predict_in_batches(model, params, xq, batch_size=48)
    mu8, var8 = predict_in_batches(model, params, xq, batch_size=48,
                                   mesh=mesh, scan=True)
    # GSPMD partitions the per-block solve/contractions; fp32 reduction
    # order differs from the single-device program at ~3e-5 abs.
    np.testing.assert_allclose(np.asarray(mu8), np.asarray(mu1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var8), np.asarray(var1),
                               rtol=1e-3, atol=1e-4)

    # Direct scan call with a non-mesh-multiple batch: rounded up inside.
    post = model.posterior(params, solver="chol")
    mu_s, var_s = posterior_predict_scan(model, post, xq, batch_size=30,
                                         mesh=mesh)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var1),
                               rtol=1e-3, atol=1e-4)

    # mean_only over the mesh scan.
    mu_m, none = predict_in_batches(model, params, xq, batch_size=48,
                                    mesh=mesh, mean_only=True, scan=True)
    assert none is None
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu1),
                               rtol=1e-3, atol=1e-4)

    # LOVE cache (solver="lanczos") through the mesh scan: must match the
    # SINGLE-DEVICE scan on the same cache (fp32 Lanczos at rank m is not
    # bit-identical to chol, so the oracle is the unsharded LOVE scan).
    love = CGGP(
        kernel=model.kernel, conjugate_gradient=model.conjugate_gradient,
        num_data=n, num_probes=2, serving_lanczos_rank=m,
    )
    post_l = love.posterior(params, solver="lanczos")
    mu_l1, var_l1 = posterior_predict_scan(love, post_l, xq, batch_size=48)
    mu_lv, var_lv = posterior_predict_scan(love, post_l, xq, batch_size=48,
                                           mesh=mesh)
    np.testing.assert_allclose(np.asarray(mu_lv), np.asarray(mu_l1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_lv), np.asarray(var_l1),
                               rtol=1e-3, atol=1e-4)


def test_sharded_lanczos_serving_matches_cg(mesh, rng):
    """posterior(solver="lanczos") on the sharded model (LOVE-style rank-k
    cache built through the psum-blocked matvec): exact at rank >= real M,
    solve-free per batch."""
    n, m = 100, 20
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    u = jnp.asarray(rng.standard_normal((m, 1)) * 0.3)
    model = ShardedCGGP(
        kernel=Matern32(), mesh=mesh, num_data=n, error_threshold=1e-13,
        max_cg_iterations=4 * m, serving_lanczos_rank=24,
    )
    params = model.init_params(
        x[:m], noise_variance=0.1, pseudo_u=u,
        cluster_counts=jnp.full((m, 1), 3.0, jnp.float64), dtype=jnp.float64,
    )
    xq = jnp.asarray(rng.uniform(-1, 1, (30, 2)))
    post_cg = model.posterior(params, solver="cg")
    mu_cg, var_cg = model.posterior_predict(post_cg, xq)
    post_lz = model.posterior(params, solver="lanczos")
    mu_lz, var_lz = model.posterior_predict(post_lz, xq)
    np.testing.assert_allclose(np.asarray(mu_lz), np.asarray(mu_cg), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(var_lz), np.asarray(var_cg),
                               rtol=1e-6, atol=1e-7)


def test_sharded_cg_config5_shape_m8192(mesh, rng):
    """BASELINE config 5 at its REAL inducing shape: the psum-blocked
    M-sharded CG on an [8192, 8192] covertree-conditioned system over the
    8-way mesh matches the dense single-device solver (round-4 verdict: the
    dryrun exercised only toy M; this pins the flagship M=8192 shape), and
    one ShardedCGGP training step at M=8192 produces a finite loss and
    finite masked gradients.  fp32 keeps the Gram panels at chip-realistic
    precision and CPU-mesh runtime bounded."""
    m, d = 8192, 3
    kernel = Matern32()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(d, 0.5),
                            dtype=jnp.float32)
    # Minimum-separation centers (the covertree guarantee config 5 relies
    # on): a jittered 0.2-spaced grid.  Random-uniform 8192 points in this
    # box have near-duplicate pairs — the ill-conditioned case the paper's
    # selection exists to PREVENT, and fp32 CG rightly cannot dig there.
    axes = [np.arange(21) * 0.2 - 2.0] + [np.arange(20) * 0.2 - 2.0] * (d - 1)
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, d)[:m]
    assert g.shape[0] == m
    z = jnp.asarray(g + rng.uniform(-0.05, 0.05, g.shape), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.1, 0.5, (m,)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((2, m)), jnp.float32)

    solve = make_sharded_cg(kernel, mesh, 1e-10, 300, relative_threshold=True)
    solution, stats = solve(kp, z, lam, rhs)
    assert bool(stats.converged)

    dense_sol, dense_stats = conjugate_gradient(
        add_diagonal(kernel.K(kp, z), lam), rhs, jnp.zeros_like(rhs),
        1e-10, max_iterations=300, max_steps_cycle=301,
        relative_threshold=True,
    )
    assert bool(dense_stats.converged)
    np.testing.assert_allclose(np.asarray(solution), np.asarray(dense_sol),
                               rtol=2e-3, atol=2e-3)

    # One training step of the config-5 model itself at the real M: the
    # mesh-sharded fused ELBO (KL solve + probe trace + batch terms)
    # compiles, executes, and yields finite loss + finite trainable grads.
    n = 1_000_000  # num_data scale constant of config 5 (batch is small)
    model = ShardedCGGP(
        kernel=kernel, mesh=mesh, num_data=n, num_probes=1,
        error_threshold=1e-3, max_cg_iterations=8,
        relative_threshold=True, precondition="pivchol", precond_rank=32,
    )
    counts = jnp.asarray(rng.integers(1, 200, (m, 1)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
    params = model.init_params(z, pseudo_u=u, cluster_counts=counts,
                               dtype=jnp.float32)
    assert params["inducing_points"].shape[0] == m  # 8192 % 8 == 0: no pads
    batch = (jnp.asarray(rng.uniform(-2, 2, (64, d)), jnp.float32),
             jnp.asarray(rng.standard_normal((64, 1)), jnp.float32))

    loss, grads = jax.jit(jax.value_and_grad(
        lambda p, b, k: model.training_loss(p, b, k)
    ))(params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    mask = model.trainable_mask(params)
    for g, m_ in zip(jax.tree_util.tree_leaves(grads),
                     jax.tree_util.tree_leaves(mask)):
        if m_:
            assert np.isfinite(np.asarray(g)).all()


def test_sharded_cggp_multi_output(mesh, rng):
    """P>1 on the mesh (round-4): the row-solver fused blocks slice by u's
    width, so the M-sharded model trains and serves [T, P] means matching
    the dense Cholesky twin column-for-column."""
    n, m, p_out = 96, 13, 3
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(rng.standard_normal((n, p_out)))
    u = jnp.asarray(rng.standard_normal((m, p_out)))
    counts = jnp.asarray(rng.integers(1, 6, (m, 1)), x.dtype)
    kernel = Matern32()
    sharded = ShardedCGGP(
        kernel=kernel, mesh=mesh, num_data=n, num_probes=3,
        error_threshold=1e-14, max_cg_iterations=64,
    )
    params = sharded.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    dense = ClusterGP(kernel=kernel, num_data=n)
    dparams = dense.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    xq = x[:20]

    mu_ref, var_ref = dense.predict_f(dparams, xq)
    assert mu_ref.shape == (20, p_out)

    mu, var = jax.jit(sharded.predict_f)(params, xq)
    assert mu.shape == (20, p_out)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), atol=1e-6)

    loss, grads = jax.jit(jax.value_and_grad(
        lambda p, b, k: sharded.training_loss(p, b, k)
    ))(params, (x, y), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grads["kernel"]["lengthscales"])).all()

    for solver in ("cg", "chol"):
        post = jax.jit(sharded.posterior, static_argnames="solver")(
            params, solver=solver)
        pmu, _pvar = jax.jit(sharded.posterior_predict)(post, xq)
        np.testing.assert_allclose(np.asarray(pmu), np.asarray(mu_ref),
                                   atol=1e-6, err_msg=solver)
