"""Gang training (net-new, no reference twin — the reference runs one grid
cell per process, xp_*.py + its process runner): G same-shape replicas
trained in one compiled program, vmapped on one device or sharded
one-per-device over the mesh.

The load-bearing contract: gang training changes the SCHEDULE, never the
math — a gang member fed the same key and batch stream as a solo
``make_adam_multi_step`` run must reproduce its trajectory to fp64
roundoff (vmap batches the reductions, so bitwise equality is not
guaranteed; observed deltas are ~1e-11 relative)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cggp_tpu.models import CGGP
from cggp_tpu.ops import ConjugateGradient, Matern32
from cggp_tpu.training.gang import (
    gang_index_chunks,
    init_gang_adam,
    make_adam_gang_multi_step,
    shard_gang,
    stack_pytrees,
    train_gang_adam,
    unstack_pytree,
)
from cggp_tpu.training.optimize import make_adam_multi_step


def _small_model(rng, n=96, m=12, dim=2):
    x = jnp.asarray(rng.normal(size=(n, dim)))
    y = jnp.asarray(np.sin(np.asarray(x).sum(-1, keepdims=True))
                    + 0.1 * rng.normal(size=(n, 1)))
    z = x[:m]
    u = jnp.asarray(rng.normal(size=(m, 1)) * 0.3)
    counts = jnp.asarray(np.maximum(rng.integers(1, 6, (m, 1)), 1).astype(float))
    model = CGGP(Matern32(), num_data=n,
                 conjugate_gradient=ConjugateGradient(1e-10, max_iterations=4 * m),
                 num_probes=3)
    params = model.init_params(z, pseudo_u=u, cluster_counts=counts)
    return model, params, (x, y)


def _init_variants(model, params, scales):
    out = []
    for s in scales:
        p = jax.tree_util.tree_map(jnp.copy, params)
        p["kernel"]["lengthscales"] = p["kernel"]["lengthscales"] * s
        out.append(p)
    return out


def test_gang_matches_solo_trajectories(rng):
    """Each gang member's parameter trajectory must match the solo
    trainer's (same loss_fn, same key, same index stream) to fp64
    roundoff."""
    model, params, data = _small_model(rng)
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    variants = _init_variants(model, params, [1.0, 1.7])
    mask = model.trainable_mask(params)
    lr, k_steps = 0.05, 6
    keys = jax.random.split(jax.random.PRNGKey(3), 2)

    # Shared index chunk: [K, G, B] for the gang, [K, B] per solo run.
    idx = next(gang_index_chunks(jax.random.PRNGKey(9), data[0].shape[0],
                                 batch_size=32, chunk=k_steps, gang=2))

    optimizer, opt_state = init_gang_adam(variants, [lr, lr])
    gang_step = make_adam_gang_multi_step(loss_fn, optimizer, data,
                                          trainable_mask=mask)
    gp, _, glosses = gang_step(stack_pytrees(variants), opt_state, idx, keys)
    gang_members = unstack_pytree(gp, 2)

    solo_opt = optax.adam(lr)
    solo_step = make_adam_multi_step(loss_fn, solo_opt, data,
                                     trainable_mask=mask)
    for g, (p0, key) in enumerate(zip(variants, keys)):
        sp, _, slosses = solo_step(p0, solo_opt.init(p0), idx[:, g], key)
        np.testing.assert_allclose(np.asarray(slosses),
                                   np.asarray(glosses[:, g]), rtol=1e-9)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9),
            sp, gang_members[g])


def test_gang_per_model_learning_rates(rng):
    """inject_hyperparams carries each model's own rate: lr=0 must freeze
    that member while its gangmate trains."""
    model, params, data = _small_model(rng)
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    variants = _init_variants(model, params, [1.0, 1.0])

    trained, losses = train_gang_adam(
        variants, loss_fn, data, iterations=8, batch_size=32,
        learning_rates=[0.05, 0.0], key=jax.random.PRNGKey(0),
        trainable_mask=model.trainable_mask(params), steps_per_call=4)
    assert losses.shape == (8, 2) and np.all(np.isfinite(losses))

    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), trained[0], variants[0])
    frozen = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), trained[1], variants[1])
    assert max(jax.tree_util.tree_leaves(moved)) > 1e-4
    assert max(jax.tree_util.tree_leaves(frozen)) == 0.0


def test_gang_sharded_over_mesh_matches_single_device(rng):
    """shard_gang + jit partitions the gang SPMD (one replica per virtual
    device, no collectives) with results matching the unsharded gang to
    roundoff (partitioned compilation reorders reductions ~1e-9)."""
    from cggp_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)
    model, params, data = _small_model(rng)
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    variants = _init_variants(model, params,
                              list(np.linspace(0.8, 2.0, 8)))
    mask = model.trainable_mask(params)

    kwargs = dict(iterations=6, batch_size=32, learning_rates=0.05,
                  key=jax.random.PRNGKey(1), trainable_mask=mask,
                  steps_per_call=3)
    plain, losses_plain = train_gang_adam(variants, loss_fn, data, **kwargs)
    sharded, losses_shard = train_gang_adam(variants, loss_fn, data,
                                            mesh=mesh, **kwargs)
    np.testing.assert_allclose(losses_shard, losses_plain, rtol=1e-7)
    for a, b in zip(plain, sharded):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-8),
            a, b)


def test_gang_eval_matches_sequential(rng):
    """Vmapped gang evaluation must reproduce the per-cell sequential
    RMSE/NLPD (the ranking step of a sweep)."""
    from cggp_tpu.training.gang import gang_eval_rmse_nlpd
    from cggp_tpu.training.optimize import bind_predict_fn

    model, params, data = _small_model(rng)
    variants = _init_variants(model, params, [0.7, 1.0, 1.6])
    x, y = data
    test = (x[:48], y[:48])

    rmse, nlpd = gang_eval_rmse_nlpd(model, stack_pytrees(variants), test,
                                     batch_size=17)
    assert rmse.shape == (3,) and nlpd.shape == (3,)

    predict = bind_predict_fn(model, data)
    for g, p in enumerate(variants):
        mu, var = predict(p, test[0])
        r = float(jnp.sqrt(jnp.mean(jnp.square(test[1] - mu))))
        lpd = model.likelihood.predict_log_density(
            p["likelihood"], mu, var, test[1])
        np.testing.assert_allclose(rmse[g], r, rtol=1e-6)
        np.testing.assert_allclose(nlpd[g], -float(jnp.mean(lpd)), rtol=1e-6)


def test_gang_index_streams_are_independent(rng):
    idx = next(gang_index_chunks(jax.random.PRNGKey(0), n=512,
                                 batch_size=64, chunk=4, gang=3))
    assert idx.shape == (4, 3, 64)
    assert not np.array_equal(np.asarray(idx[:, 0]), np.asarray(idx[:, 1]))


def test_gang_rejects_mismatched_learning_rates(rng):
    model, params, _ = _small_model(rng)
    with pytest.raises(ValueError, match="learning rates"):
        init_gang_adam([params, params], [0.1])
