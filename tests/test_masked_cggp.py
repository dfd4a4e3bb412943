"""Capacity-padded (masked) dense CGGP: pads must be EXACT no-ops.

Mirrors the sharded/implicit mask contract (models/rowcg.py, tested in
test_parallel.py): masked kernel coupling, masked probes, masked KL constant.
Capacity pinning is what lets re-clustering swap buffers without recompiling
the dense training program (host updates or the fused recluster_fn).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import CGGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.ops.linalg import add_diagonal


def _setup(rng, m=11, cap=16, n=80, d=2, **model_kw):
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])) + 0.1 * rng.standard_normal((n, 1)))
    kernel = Matern32()
    counts = jnp.asarray(rng.integers(1, 9, (m, 1)), x.dtype)
    u = jnp.asarray(rng.standard_normal((m, 1)))
    model = CGGP(
        kernel=kernel,
        conjugate_gradient=ConjugateGradient(1e-14, max_iterations=2 * cap),
        num_data=n, num_probes=4, **model_kw,
    )
    plain = model.init_params(x[:m], pseudo_u=u, cluster_counts=counts)
    padded = model.init_params(x[:m], pseudo_u=u, cluster_counts=counts,
                               capacity=cap)
    return model, plain, padded, (x, y), m


def test_capacity_init_shapes_and_mask(rng):
    model, plain, padded, _, m = _setup(rng)
    assert padded["inducing_points"].shape[0] == 16
    assert int(padded["inducing_mask"].sum()) == m
    assert model.trainable_mask(padded)["inducing_mask"] is False
    # pads: far coords, u 0, counts 1
    assert float(padded["inducing_points"][m:, 0].min()) >= 1e6
    np.testing.assert_array_equal(np.asarray(padded["pseudo_u"][m:]), 0.0)
    np.testing.assert_array_equal(np.asarray(padded["cluster_counts"][m:]), 1.0)


def test_padded_predict_matches_unpadded_exactly(rng):
    model, plain, padded, (x, y), m = _setup(rng)
    mu_p, var_p = model.predict_f(padded, x[:20])
    mu, var = model.predict_f(plain, x[:20])
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var), atol=1e-9)


@pytest.mark.parametrize("solver", ["chol", "cg", "lanczos"])
def test_padded_posterior_matches_unpadded(rng, solver):
    model, plain, padded, (x, y), m = _setup(
        rng, serving_lanczos_rank=11,  # full real rank: lanczos exact too
    )
    post_p = model.posterior(padded, solver=solver)
    post = model.posterior(plain, solver=solver)
    mu_p, var_p = model.posterior_predict(post_p, x[:16])
    mu, var = model.posterior_predict(post, x[:16])
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(model.posterior_mean(post_p, x[:16])),
        np.asarray(model.posterior_mean(post, x[:16])), atol=1e-8,
    )


def test_padded_kl_matches_unpadded_mc(rng):
    """Monte-Carlo trace/logdet parity at many probes (probe draws differ in
    shape, so parity is statistical — same pattern as the sharded KL test)."""
    model, plain, padded, _, m = _setup(rng)
    model = CGGP(
        kernel=model.kernel, conjugate_gradient=model.conjugate_gradient,
        num_data=model.num_data, num_probes=512,
    )
    kl_p = float(jax.jit(model.prior_kl)(padded, jax.random.PRNGKey(0)))
    kl = float(jax.jit(model.prior_kl)(plain, jax.random.PRNGKey(1)))
    np.testing.assert_allclose(kl_p, kl, rtol=0.05, atol=0.3)


def test_padded_slq_value_targets_real_submatrix(rng):
    """SLQ with masked probes + per-probe ||z||^2 scaling equals the dense
    SLQ of the REAL submatrix computed with the same (truncated) probes."""
    from cggp_tpu.ops.logdet import _slq_value, rademacher, slq_logdet

    model, plain, padded, _, m = _setup(rng)
    cap = padded["inducing_points"].shape[0]
    mask = padded["inducing_mask"][:, 0]
    kmm_p = model._masked_kmm(padded["kernel"], padded["inducing_points"], mask)
    a_p = add_diagonal(kmm_p, model.diag_variance(padded)[:, 0])

    key = jax.random.PRNGKey(7)
    iters = m
    v_padded = float(slq_logdet(a_p, model.conjugate_gradient, num_probes=48,
                                key=key, lanczos_iters=iters, mask=mask))
    probes = rademacher(key, (cap, 48), a_p.dtype) * mask[:, None]
    a_real = add_diagonal(
        model.kernel.K(plain["kernel"], plain["inducing_points"]),
        model.diag_variance(plain)[:, 0],
    )
    v_real = float(_slq_value(a_real, probes[:m], iters))
    np.testing.assert_allclose(v_padded, v_real, rtol=1e-8)


def test_padded_fused_loss_gradients_pads_inert(rng):
    model, plain, padded, data, m = _setup(rng)
    key = jax.random.PRNGKey(3)
    loss = float(model.training_loss(padded, data, key))
    assert np.isfinite(loss)
    grads = jax.jit(jax.grad(lambda p: model.training_loss(p, data, key)))(padded)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    np.testing.assert_array_equal(np.asarray(grads["pseudo_u"][m:]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(grads["inducing_points"][m:]), 0.0
    )


def test_padded_loss_with_slq_and_precondition(rng):
    model, plain, padded, data, m = _setup(
        rng, logdet_variant="slq", slq_lanczos_iters=8, precondition="chol",
    )
    loss_p = float(model.training_loss(padded, data, jax.random.PRNGKey(5)))
    assert np.isfinite(loss_p)
    # SLQ values are meaningful: padded vs unpadded within MC noise.
    loss = float(model.training_loss(plain, data, jax.random.PRNGKey(6)))
    np.testing.assert_allclose(loss_p, loss, rtol=0.1, atol=3.0)


def test_host_assign_reclusters_repad_to_capacity(rng):
    from cggp_tpu.selection.covernet import covernet_update_inducing_parameters

    model, plain, padded, (x, y), m = _setup(rng)
    iv, means, counts = covernet_update_inducing_parameters((x, y), 0.5,
                                                            lloyds=0)
    new = model.assign_clusters(padded, iv, means, counts)
    assert new["inducing_points"].shape == padded["inducing_points"].shape
    assert int(new["inducing_mask"].sum()) == iv.shape[0]
    with pytest.raises(ValueError, match="exceeds the pinned capacity"):
        model.assign_clusters(padded, jnp.zeros((99, 2)), jnp.zeros((99, 1)),
                              jnp.ones((99, 1)))


def test_dense_fused_recluster_chunk(rng):
    """The fully-fused recluster path now reaches the DENSE model: one jitted
    dispatch = covernet update + K Adam steps, shapes pinned at capacity."""
    import optax

    from cggp_tpu.selection.covernet import (
        covernet_update_padded,
        make_device_recluster_fn,
    )
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import make_adam_multi_step

    x = jnp.asarray(rng.uniform(-2, 2, (300, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(300, 1)), jnp.float32)
    cap, res = 64, 0.5
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-8, max_iterations=cap),
        num_data=300, num_probes=3, precondition="chol",
    )
    z0, u0, c0, mask0 = covernet_update_padded(x, y, res, cap, lloyds=0)
    k = int(mask0.sum())
    assert 1 < k < cap
    params = model.init_params(jnp.asarray(z0[:k]), pseudo_u=u0[:k],
                               cluster_counts=c0[:k], capacity=cap,
                               dtype=jnp.float32)
    optimizer = optax.adam(0.05)
    multi = make_adam_multi_step(
        lambda p, b, kk: model.training_loss(p, b, kk), optimizer, (x, y),
        trainable_mask=model.trainable_mask(params),
        recluster_fn=make_device_recluster_fn(model, (x, y), res, cap,
                                              lloyds=0),
    )
    idx = next(minibatch_index_iterator(jax.random.PRNGKey(0), 300, 64, 4))
    params, _, losses = multi(params, optimizer.init(params), idx,
                              jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(losses)))
    assert params["inducing_points"].shape == (cap, 2)
    assert int(params["inducing_mask"].sum()) == k
