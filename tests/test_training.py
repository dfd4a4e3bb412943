"""Training-loop tests: Adam/L-BFGS improve objectives, monitor + store work.

Mirrors the reference's implicit test strategy (training drivers exercised via
the experiment pipeline, SURVEY.md section 4) with explicit assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import CGGP, GPR, ClusterGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import SquaredExponential
from cggp_tpu.selection.update import labels_update_inducing_parameters
from cggp_tpu.training import (
    create_monitor,
    make_metrics_callback,
    make_param_callback,
    train_using_adam_and_update,
    train_using_lbfgs_and_update,
)
from cggp_tpu.utils import assign_flat, flatten_params, load_config_dir, save_config_dir


def _toy_data(rng, n=128, d=2):
    x = rng.uniform(-1.0, 1.0, size=(n, d))
    y = np.sin(3.0 * x[:, :1]) + 0.1 * rng.standard_normal((n, 1))
    return jnp.asarray(x), jnp.asarray(y)


def _make_cggp(data, m=16):
    x, y = data
    kernel = SquaredExponential()
    model = CGGP(
        kernel=kernel,
        conjugate_gradient=ConjugateGradient(error_threshold=1e-12),
        num_data=x.shape[0],
        num_probes=3,
    )
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:m])
    params = model.init_params(iv, pseudo_u=u, cluster_counts=counts)
    return model, params


def test_adam_improves_cggp_elbo(rng):
    data = _toy_data(rng)
    model, params = _make_cggp(data)
    key = jax.random.PRNGKey(0)

    def loss_fn(p, batch, k):
        return model.training_loss(p, batch, k)

    loss_before = float(loss_fn(params, data, key))
    trained = train_using_adam_and_update(
        params,
        loss_fn,
        data,
        iterations=30,
        batch_size=64,
        learning_rate=0.05,
        key=key,
        trainable_mask=model.trainable_mask(params),
    )
    loss_after = float(loss_fn(trained, data, key))
    assert np.isfinite(loss_after)
    assert loss_after < loss_before
    # Frozen leaves must not move.
    np.testing.assert_array_equal(trained["pseudo_u"], params["pseudo_u"])
    np.testing.assert_array_equal(trained["cluster_counts"], params["cluster_counts"])


def test_adam_with_update_fn_reclusters(rng):
    data = _toy_data(rng)
    model, params = _make_cggp(data, m=16)
    key = jax.random.PRNGKey(1)

    calls = {"n": 0}

    def update_fn(p):
        calls["n"] += 1
        iv, u, counts = labels_update_inducing_parameters(data, p["inducing_points"])
        return model.assign_clusters(p, iv, u, counts)

    trained = train_using_adam_and_update(
        params,
        lambda p, b, k: model.training_loss(p, b, k),
        data,
        iterations=5,
        batch_size=64,
        learning_rate=0.01,
        key=key,
        update_fn=update_fn,
        trainable_mask=model.trainable_mask(params),
    )
    assert calls["n"] == 5
    assert np.all(np.isfinite(np.asarray(trained["pseudo_u"])))


def test_lbfgs_improves_gpr(rng):
    data = _toy_data(rng, n=64)
    model = GPR(kernel=SquaredExponential())
    params = model.init_params(input_dim=2)
    loss_before = float(model.training_loss(params, data))
    trained = train_using_lbfgs_and_update(
        params, lambda p: model.training_loss(p, data), max_iterations=25
    )
    loss_after = float(model.training_loss(trained, data))
    assert loss_after < loss_before - 1.0


def test_lbfgs_respects_trainable_mask(rng):
    data = _toy_data(rng, n=64)
    model = GPR(kernel=SquaredExponential())
    params = model.init_params(input_dim=2)
    mask = {
        "kernel": {"variance": True, "lengthscales": True},
        "likelihood": {"variance": False},
    }
    trained = train_using_lbfgs_and_update(
        params, lambda p: model.training_loss(p, data), max_iterations=10,
        trainable_mask=mask,
    )
    np.testing.assert_array_equal(
        trained["likelihood"]["variance"], params["likelihood"]["variance"]
    )
    assert not np.allclose(trained["kernel"]["lengthscales"], params["kernel"]["lengthscales"])

    # PREFIX-tree form (one bool freezes a whole subtree) — the format the
    # device L-BFGS documents — must work on the scipy path too.
    prefix_mask = {"kernel": True, "likelihood": False}
    trained2 = train_using_lbfgs_and_update(
        params, lambda p: model.training_loss(p, data), max_iterations=10,
        trainable_mask=prefix_mask,
    )
    np.testing.assert_array_equal(
        trained2["likelihood"]["variance"], params["likelihood"]["variance"]
    )
    assert not np.allclose(trained2["kernel"]["lengthscales"],
                           params["kernel"]["lengthscales"])


def test_metrics_callback_and_monitor(rng, tmp_path):
    data = _toy_data(rng)
    test_data = _toy_data(rng, n=32)
    model, params = _make_cggp(data)
    metrics_fn = make_metrics_callback(
        model, data, test_data, batch_size=16, key=jax.random.PRNGKey(0),
    )
    param_fn = make_param_callback(model)
    monitor = create_monitor(
        str(tmp_path), metrics_fn, param_fn, record_step=1, use_tensorboard=False
    )
    monitor(0, params)
    metrics = monitor.collect_logs()["metrics"][0]
    assert np.isfinite(metrics["test/rmse"])
    assert np.isfinite(metrics["test/nlpd"])
    assert np.isfinite(metrics["train/elbo"])
    assert "kernel/variance" in monitor.collect_logs()["params"][0]
    monitor.close()
    assert (tmp_path / "metrics.logs.npy").exists()


def test_monitor_sees_live_params_during_training(rng, tmp_path):
    """Regression: mid-training callbacks must observe the trainer's current
    params, not a stale snapshot (found by driving the monitor end-to-end)."""
    data = _toy_data(rng)
    model, params = _make_cggp(data)
    seen = []

    def spy(step, p):
        seen.append(np.asarray(p["kernel"]["variance"]).copy())
        return None

    monitor = create_monitor(str(tmp_path), use_tensorboard=False)
    monitor.add_callback("spy", spy, record_step=5)
    train_using_adam_and_update(
        params,
        lambda p, b, k: model.training_loss(p, b, k),
        data,
        iterations=11,
        batch_size=64,
        learning_rate=0.05,
        key=jax.random.PRNGKey(2),
        trainable_mask=model.trainable_mask(params),
        monitor=monitor,
    )
    assert len(seen) == 3  # steps 0, 5, 10
    assert not np.allclose(seen[0], seen[-1])


def test_config_dir_roundtrip(rng, tmp_path):
    data = _toy_data(rng, n=64)
    gpr = GPR(kernel=SquaredExponential())
    gpr_params = gpr.init_params(input_dim=2, variance=2.0, noise_variance=0.3)
    save_config_dir(tmp_path / "cfg", gpr_params, {"dataset": "toy", "seed": 0})

    flat, info = load_config_dir(tmp_path / "cfg")
    assert info["dataset"] == "toy"
    assert set(flat) == {"kernel/variance", "kernel/lengthscales", "likelihood/variance"}

    # GPR hyperparameters flow into a ClusterGP (the reference's cross-model
    # multiple_assign workflow, paper_cli_uci.py:123-124).
    model = ClusterGP(kernel=SquaredExponential(), num_data=64)
    params = model.init_params(data[0][:8])
    loaded = assign_flat(params, flat)
    np.testing.assert_allclose(
        loaded["kernel"]["variance"], gpr_params["kernel"]["variance"]
    )
    np.testing.assert_array_equal(loaded["pseudo_u"], params["pseudo_u"])
    assert flatten_params(loaded)["likelihood/variance"] == flat["likelihood/variance"]


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    from cggp_tpu.utils import load_checkpoint, save_checkpoint

    data = _toy_data(rng, n=32)
    model, params = _make_cggp(data, m=8)
    save_checkpoint(tmp_path / "ckpt", params, step=3)
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = load_checkpoint(tmp_path / "ckpt", template)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cg_stats_callback(rng):
    from cggp_tpu.training.optimize import make_cg_stats_callback

    data = _toy_data(rng, n=64)
    model, params = _make_cggp(data, m=8)
    cb = make_cg_stats_callback(model, data, batch_size=32)
    out = cb(0, params)
    assert out["cg/steps"] > 0
    assert np.isfinite(out["cg/max_error"])

    # With an achievable (fp32) threshold the solve converges under the cap
    # and the unconverged flag stays clear.
    model_ok = CGGP(
        kernel=SquaredExponential(),
        conjugate_gradient=ConjugateGradient(
            error_threshold=1e-4, max_iterations=64
        ),
        num_data=data[0].shape[0],
        num_probes=3,
    )
    cb_ok = make_cg_stats_callback(model_ok, data, batch_size=32)
    out_ok = cb_ok(0, params)
    assert out_ok["cg/unconverged"] == 0


def test_cg_stats_callback_warns_on_unconverged(rng):
    """A deliberately-capped solve (2 iterations, tight threshold) must raise
    a one-time RuntimeWarning and log cg/unconverged=1 — the reference facade
    silently drops stats (conjugate_gradient.py:204-212)."""
    import warnings

    from cggp_tpu.training.optimize import make_cg_stats_callback

    data = _toy_data(rng, n=64)
    x, y = data
    model = CGGP(
        kernel=SquaredExponential(),
        conjugate_gradient=ConjugateGradient(
            error_threshold=1e-14, max_iterations=2
        ),
        num_data=x.shape[0],
        num_probes=3,
    )
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:16])
    params = model.init_params(iv, pseudo_u=u, cluster_counts=counts)

    cb = make_cg_stats_callback(model, data, batch_size=32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = cb(0, params)
        assert out["cg/unconverged"] == 1
        assert any(
            issubclass(w.category, RuntimeWarning)
            and "max_iterations" in str(w.message)
            for w in caught
        )
        # One-time: a second call does not warn again.
        n_warn = len(caught)
        cb(1, params)
        assert len(caught) == n_warn


def test_cg_stats_callback_no_false_positive_at_cap(rng):
    """Converging EXACTLY on the last permitted iteration is not a failure:
    the loop's own exit-time stop-rule evaluation (CGStats.converged) must
    keep cg/unconverged clear and emit no warning."""
    import warnings

    from cggp_tpu.training.optimize import make_cg_stats_callback

    data = _toy_data(rng, n=64)
    x, y = data
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:12])

    def build(cap):
        model = CGGP(
            kernel=SquaredExponential(),
            conjugate_gradient=ConjugateGradient(
                error_threshold=1e-8, max_iterations=cap
            ),
            num_data=x.shape[0],
            num_probes=3,
        )
        params = model.init_params(iv, pseudo_u=u, cluster_counts=counts)
        return model, params

    # Find the natural convergence step count under a generous cap — with
    # the SAME probe key the callback uses for step 0 (fold_in(key, 0)):
    # different probes would change the fused RHS and the step count.
    probe_key = jax.random.fold_in(jax.random.PRNGKey(0), 0)
    model, params = build(64)
    steps = int(model.cg_stats(params, data, probe_key).steps)
    assert 0 < steps < 64
    # ...then cap the solver at exactly that count: steps == max_iterations
    # yet the solve IS converged.
    model_capped, params = build(steps)
    cb = make_cg_stats_callback(model_capped, data, batch_size=64)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = cb(0, params)
    assert out["cg/steps"] == steps
    assert out["cg/unconverged"] == 0
    assert not any(issubclass(w.category, RuntimeWarning) for w in caught)


def test_predict_in_batches_solver_threading(rng):
    """posterior_solver is forwarded to solver-aware models; 'chol' refuses a
    non-finite factor loudly and 'auto' falls back to the CG path."""
    import pytest as _pytest

    from cggp_tpu.training.optimize import predict_in_batches

    data = _toy_data(rng, n=100)
    model, params = _make_cggp(data, m=8)
    x_query = _toy_data(rng, n=37)[0]
    mu, var = model.predict_f(params, x_query)

    mu_cg, var_cg = predict_in_batches(model, params, x_query, batch_size=16,
                                       posterior_solver="cg")
    np.testing.assert_allclose(np.asarray(mu_cg), np.asarray(mu),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_cg), np.asarray(var),
                               rtol=1e-3, atol=1e-5)

    # Poison the system so the Cholesky factor is non-finite: explicit chol
    # raises, auto warns and falls back to CG.
    bad = dict(params)
    bad["inducing_points"] = params["inducing_points"].at[0, 0].set(jnp.nan)
    with _pytest.raises(FloatingPointError):
        predict_in_batches(model, bad, x_query, batch_size=16,
                           posterior_solver="chol")
    with _pytest.warns(RuntimeWarning, match="falling back to CG"):
        predict_in_batches(model, bad, x_query, batch_size=16,
                           posterior_solver="auto")

    # Cholesky-family models have no CG path: the guard must stay silent
    # (no bogus "falling back to CG" advice) and NaNs surface as NaNs.
    import warnings as _warnings

    from cggp_tpu.models import GPR

    gpr = GPR(kernel=SquaredExponential())
    gp = gpr.init_params(input_dim=2)
    gp["kernel"]["lengthscales"] = gp["kernel"]["lengthscales"] * jnp.nan
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        mu_bad, _ = predict_in_batches(gpr, gp, x_query, batch_size=16,
                                       train_data=data)
    assert not any("falling back" in str(w.message) for w in caught)
    assert not np.isfinite(np.asarray(mu_bad)).any()


def test_vanilla_lbfgs_variants(rng):
    """Reference optimize.py:101-150 twins: plain L-BFGS and the
    Z-only-per-step update variant."""
    import jax.numpy as jnp

    from cggp_tpu.models import SGPR
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.training.optimize import (
        train_vanilla_using_lbfgs,
        train_vanilla_using_lbfgs_and_standard_ip_update,
    )

    x = jnp.asarray(rng.uniform(-1, 1, (64, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])))
    model = SGPR(kernel=SquaredExponential())
    params = model.init_params(x[:8])
    loss = lambda p: model.training_loss(p, (x, y))

    before = float(loss(params))
    out = train_vanilla_using_lbfgs(params, loss, 15)
    assert float(loss(out)) < before

    calls = {"n": 0}

    def clustering_fn():
        calls["n"] += 1
        return np.asarray(x[:8]) + 0.01 * calls["n"]

    out2 = train_vanilla_using_lbfgs_and_standard_ip_update(params, loss, clustering_fn, 10)
    assert calls["n"] >= 1  # ran once per optimizer iteration
    np.testing.assert_allclose(
        np.asarray(out2["inducing_points"]),
        np.asarray(x[:8]) + 0.01 * calls["n"], rtol=1e-6)


def test_adam_steps_per_call_matches_stepwise(rng):
    """K-steps-per-dispatch scan training must produce the same parameters
    as the step-per-dispatch loop given the same key (same batches, same
    step keys order is internal — so compare convergence, not bitwise), and
    must improve the loss."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops import ConjugateGradient, SquaredExponential
    from cggp_tpu.selection.update import labels_update_inducing_parameters
    from cggp_tpu.training.optimize import train_using_adam_and_update

    x = jnp.asarray(rng.uniform(-1, 1, (128, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, :1])))
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:8])
    model = CGGP(kernel=SquaredExponential(),
                 conjugate_gradient=ConjugateGradient(1e-10, max_iterations=8),
                 num_data=128, num_probes=2)
    params0 = model.init_params(iv, pseudo_u=u, cluster_counts=counts)
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    key = jax.random.PRNGKey(0)

    before = float(loss_fn(params0, (x, y), key))
    out = train_using_adam_and_update(
        params0, loss_fn, (x, y), 8, 32, 0.05, key, steps_per_call=4,
        trainable_mask=model.trainable_mask(params0),
    )
    after = float(loss_fn(out, (x, y), key))
    assert after < before

    # non-trainables stay fixed under the mask in the scan path too
    np.testing.assert_array_equal(np.asarray(out["pseudo_u"]),
                                  np.asarray(params0["pseudo_u"]))


def test_predict_in_batches_matches_single_call(rng):
    from cggp_tpu.training.optimize import predict_in_batches

    data = _toy_data(rng, n=100)
    model, params = _make_cggp(data, m=8)
    x_query = _toy_data(rng, n=37)[0]  # non-multiple of batch_size -> padding

    mu_b, var_b = predict_in_batches(model, params, x_query, batch_size=16)
    mu, var = model.predict_f(params, x_query)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var), rtol=1e-3, atol=1e-5)
    assert mu_b.shape == (37, 1) and var_b.shape == (37, 1)

    # GPR path (predict needs train data)
    from cggp_tpu.models import GPR

    gpr = GPR(kernel=SquaredExponential())
    gp = gpr.init_params(input_dim=2)
    mu_b, var_b = predict_in_batches(gpr, gp, x_query, batch_size=16,
                                     train_data=data)
    mu, var = gpr.predict_f(gp, data, x_query)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu), rtol=1e-4, atol=1e-6)


def test_predict_in_batches_posterior_paths(rng):
    """The posterior-cache fast path (default for CGGP) and mean_only serving
    match the per-batch predict_f oracle; use_posterior=False falls back."""
    from cggp_tpu.training.optimize import predict_in_batches

    data = _toy_data(rng, n=100)
    model, params = _make_cggp(data, m=8)
    x_query = _toy_data(rng, n=37)[0]
    mu, var = model.predict_f(params, x_query)

    mu_b, var_b = predict_in_batches(model, params, x_query, batch_size=16)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var), rtol=1e-3, atol=1e-5)

    mu_f, var_f = predict_in_batches(model, params, x_query, batch_size=16,
                                     use_posterior=False)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var), rtol=1e-3, atol=1e-5)

    mu_m, none_var = predict_in_batches(model, params, x_query, batch_size=16,
                                        mean_only=True)
    assert none_var is None
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu), rtol=1e-4, atol=1e-6)

    import pytest as _pytest

    from cggp_tpu.models import GPR

    # Data-bound models now serve mean_only through their posterior cache
    # (round-2: GPR/SGPR posterior() binds the training set once).
    gpr = GPR(kernel=SquaredExponential())
    gp = gpr.init_params(input_dim=2)
    mu_g, _ = predict_in_batches(gpr, gp, x_query, batch_size=16,
                                 train_data=data)
    mu_gm, none_var_g = predict_in_batches(gpr, gp, x_query, batch_size=16,
                                           train_data=data, mean_only=True)
    assert none_var_g is None
    np.testing.assert_allclose(np.asarray(mu_gm), np.asarray(mu_g),
                               rtol=1e-6, atol=1e-9)
    # mean_only with the cache explicitly disabled has no fast path: error.
    with _pytest.raises(ValueError):
        predict_in_batches(gpr, gp, x_query, batch_size=16, train_data=data,
                           mean_only=True, use_posterior=False)


def test_auto_serving_batch_size():
    """The dispatch-loop batch rule: largest power-of-two T with
    M*T <= 2^27, clamped to [8192, 65536] and to the dataset size
    (chip A/B: scripts/serving_batch_chip.py — loop peaks at T=65536;
    the one-dispatch scan route keeps 8192 and never uses this rule)."""
    from cggp_tpu.training.optimize import auto_serving_batch_size

    big = 10_000_000
    assert auto_serving_batch_size(989, big) == 65536    # bench e2e shape
    assert auto_serving_batch_size(1024, big) == 65536   # measured loop peak
    assert auto_serving_batch_size(4096, big) == 32768
    assert auto_serving_batch_size(16384, big) == 8192   # today's default
    assert auto_serving_batch_size(32768, big) == 8192   # floor: never below
    # Dataset smaller than the budget batch: ONE exact-size block — the
    # batch never exceeds n (no phantom padding rows for direct callers).
    assert auto_serving_batch_size(989, 1000) == 1000
    assert auto_serving_batch_size(989, 1) == 1
    assert auto_serving_batch_size(989, 65537) == 65536  # cap still binds


def test_predict_in_batches_auto_batch(rng):
    """batch_size="auto" serves identical values to an explicit batch, on
    both the posterior-cache path and a data-bound model."""
    from cggp_tpu.training.optimize import predict_in_batches

    data = _toy_data(rng, n=100)
    model, params = _make_cggp(data, m=8)
    x_query = _toy_data(rng, n=37)[0]

    mu_a, var_a = predict_in_batches(model, params, x_query, batch_size="auto")
    mu, var = model.predict_f(params, x_query)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_a), np.asarray(var), rtol=1e-3, atol=1e-5)

    from cggp_tpu.models import GPR

    gpr = GPR(kernel=SquaredExponential())
    gp = gpr.init_params(input_dim=2)
    mu_g, var_g = predict_in_batches(gpr, gp, x_query, batch_size="auto",
                                     train_data=data)
    mu_e, var_e = predict_in_batches(gpr, gp, x_query, batch_size=16,
                                     train_data=data)
    np.testing.assert_allclose(np.asarray(mu_g), np.asarray(mu_e),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_g), np.asarray(var_e),
                               rtol=1e-6, atol=1e-9)


def test_posterior_predict_scan_matches_loop(rng):
    """The one-dispatch lax.map serving sweep equals the python-loop path
    exactly (same per-batch program over the same blocks), including the
    tail-padding strip, mean_only, LOVE caches, and under an outer jit."""
    import pytest as _pytest

    from cggp_tpu.training.optimize import posterior_predict_scan

    data = _toy_data(rng, n=100)
    model, params = _make_cggp(data, m=8)
    x_query = _toy_data(rng, n=37)[0]  # non-multiple of batch_size -> padding

    post = model.posterior(params, solver="chol")
    mu_ref, var_ref = model.posterior_predict(post, x_query, full_cov=False)

    mu, var = posterior_predict_scan(model, post, x_query, batch_size=16)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-4, atol=1e-6)
    assert mu.shape == (37, 1) and var.shape == (37, 1)

    mu_m, none_var = posterior_predict_scan(model, post, x_query,
                                            batch_size=16, mean_only=True)
    assert none_var is None
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-7)

    # jit-composable with post as an argument (the production serving shape)
    serve = jax.jit(lambda p, xq: posterior_predict_scan(
        model, p, xq, batch_size=16))
    mu_j, var_j = serve(post, x_query)
    np.testing.assert_allclose(np.asarray(mu_j), np.asarray(mu),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_j), np.asarray(var),
                               rtol=1e-6, atol=1e-8)

    # LOVE cache: solve-free per batch; scan output equals its loop output
    post_l = model.posterior(params, solver="lanczos")
    mu_l_ref, var_l_ref = model.posterior_predict(post_l, x_query)
    mu_l, var_l = posterior_predict_scan(model, post_l, x_query, batch_size=16)
    np.testing.assert_allclose(np.asarray(mu_l), np.asarray(mu_l_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var_l), np.asarray(var_l_ref),
                               rtol=1e-4, atol=1e-6)

    # a CG-branch posterior warns (while_loop-in-scan cliff) but still works
    post_cg = model.posterior(params, solver="cg")
    with _pytest.warns(RuntimeWarning, match="12-20x"):
        mu_c, var_c = posterior_predict_scan(model, post_cg, x_query,
                                             batch_size=16)
    np.testing.assert_allclose(np.asarray(mu_c), np.asarray(mu_ref),
                               rtol=1e-4, atol=1e-6)

    # predict_in_batches auto-routes through the (cached-jit) scan and
    # matches; forcing scan without the posterior-cache path is an error,
    # not a silent loop.
    from cggp_tpu.training.optimize import predict_in_batches

    mu_a, var_a = predict_in_batches(model, params, x_query, batch_size=16)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu),
                               rtol=1e-5, atol=1e-7)
    with _pytest.raises(ValueError, match="scan=True"):
        predict_in_batches(model, params, x_query, batch_size=16,
                           use_posterior=False, scan=True)


def test_posterior_serves_via_cg_classification(rng):
    """The scan auto-router must classify every family's cache correctly:
    solver fields present-but-unset = CG per batch (loop); a factor, LOVE
    rows, or no solver fields at all = solve-free (scan)."""
    from cggp_tpu.training.optimize import _posterior_serves_via_cg

    data = _toy_data(rng, n=60)
    model, params = _make_cggp(data, m=8)
    assert not _posterior_serves_via_cg(model.posterior(params, solver="chol"))
    assert not _posterior_serves_via_cg(
        model.posterior(params, solver="lanczos"))
    assert _posterior_serves_via_cg(model.posterior(params, solver="cg"))

    from cggp_tpu.models import GPR, SGPR

    gpr = GPR(kernel=SquaredExponential())
    assert not _posterior_serves_via_cg(
        gpr.posterior(gpr.init_params(input_dim=2), data))

    from cggp_tpu.models import IterGPR

    ig = IterGPR(kernel=SquaredExponential(), max_cg_iterations=16)
    igp = ig.init_params(2, noise_variance=0.1)
    assert _posterior_serves_via_cg(ig.posterior(igp, data))  # CG variance
    assert not _posterior_serves_via_cg(
        ig.posterior(igp, data, solver="lanczos"))


def test_monitor_fires_in_chunked_training(rng, tmp_path):
    """Regression (code-review finding): with steps_per_call=K the monitor
    step must stay a multiple of K so record_step gates remain satisfiable —
    the old last-step-of-chunk numbering (K*c - 1) silently disabled every
    metrics/checkpoint callback under the CLI defaults (K=25, r=50)."""
    data = _toy_data(rng)
    model, params = _make_cggp(data)
    seen = []

    monitor = create_monitor(str(tmp_path), use_tensorboard=False)
    monitor.add_callback("spy", lambda step, p: seen.append(step), record_step=4)
    train_using_adam_and_update(
        params,
        lambda p, b, k: model.training_loss(p, b, k),
        data,
        iterations=8,
        batch_size=64,
        learning_rate=0.05,
        key=jax.random.PRNGKey(2),
        trainable_mask=model.trainable_mask(params),
        monitor=monitor,
        steps_per_call=2,
    )
    assert seen == [0, 4], seen  # chunks start at steps 0,2,4,6 -> gate at 0,4


def test_device_lbfgs_matches_scipy_on_gpr(rng, tmp_path):
    """train_using_device_lbfgs (net-new: whole optimization under one jit,
    no per-iteration host round trips) must reach the scipy twin's optimum
    and keep frozen leaves exactly in place."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import GPR
    from cggp_tpu.ops.kernels import SquaredExponential
    from cggp_tpu.training.optimize import (
        train_using_device_lbfgs,
        train_using_lbfgs_and_update,
    )

    n = 60
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)))
    y = jnp.sin(x[:, :1].sum(-1, keepdims=True)) + 0.05

    model = GPR(kernel=SquaredExponential())
    params0 = model.init_params(input_dim=2, noise_variance=0.5)
    loss_fn = lambda p: model.training_loss(p, (x, y))

    p_scipy = train_using_lbfgs_and_update(params0, loss_fn, 60)
    p_dev = train_using_device_lbfgs(params0, loss_fn, 60)
    l_scipy = float(loss_fn(p_scipy))
    l_dev = float(loss_fn(p_dev))
    l0 = float(loss_fn(params0))
    assert l_dev < l0 - 1.0  # genuinely optimized
    # At least as good as scipy (observed: scipy stops on its own ftol at
    # -305.6 while the device loop reaches -317.1 in the same 60 iters).
    assert l_dev <= l_scipy + 1e-3 * abs(l_scipy), (l_dev, l_scipy)

    # Frozen leaves stay exactly put.
    mask = {"kernel": True, "likelihood": False}
    p_frozen = train_using_device_lbfgs(params0, loss_fn, 20,
                                        trainable_mask=mask)
    np.testing.assert_array_equal(
        np.asarray(p_frozen["likelihood"]["variance"]),
        np.asarray(params0["likelihood"]["variance"]),
    )
    assert not np.allclose(
        np.asarray(p_frozen["kernel"]["lengthscales"]),
        np.asarray(params0["kernel"]["lengthscales"]),
    )

    # Monitor fires at chunk boundaries with live params.
    seen = []
    from cggp_tpu.training.monitor import Monitor

    mon = Monitor(str(tmp_path / "m"), use_tensorboard=False)
    mon.add_callback("loss", lambda step, p: {"loss": float(loss_fn(p))},
                     record_step=1)
    train_using_device_lbfgs(params0, loss_fn, 10, monitor=mon, record_step=5)
    logs = np.load(tmp_path / "m" / "loss.logs.npy", allow_pickle=True)
    assert len(logs) == 2  # steps 5 and 10


@pytest.mark.parametrize("mode", ["pivchol", "chol"])
def test_chunk_frozen_preconditioner(rng, mode):
    """Chunk-frozen preconditioning (precond_fn + training_loss's
    precond_override): the preconditioner is solver STATE, so a frozen state
    must leave loss values and gradients unchanged (CG stops on the true
    residual), and the K-step trainer must train through it.  Also pins the
    contract errors: override on the unfused path, precond_fn without
    chunking.  Parametrized over both state STRUCTURES the override
    plumbing must carry: the SpectralPreconditioner 3-tuple and the
    CholPreconditioner dict."""
    import pytest

    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.training.optimize import make_adam_multi_step
    from cggp_tpu.training.batching import minibatch_index_iterator
    import optax

    x, y = _toy_data(rng, n=256, d=3)
    iv, u, counts = labels_update_inducing_parameters((x, y), x[:32])
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-12, max_iterations=64),
        num_data=256, num_probes=3,
        precondition=mode, precond_rank=8,
    )
    params = model.init_params(iv, pseudo_u=u, cluster_counts=counts)
    key = jax.random.PRNGKey(3)
    batch = (x[:64], y[:64])

    state = model.precond_state(params)
    assert state != ()  # pivchol produces a real state pytree

    loss_step = model.training_loss(params, batch, key)
    loss_frozen = model.training_loss(params, batch, key,
                                      precond_override=state)
    loss_identity = model.training_loss(params, batch, key,
                                        precond_override=())
    np.testing.assert_allclose(float(loss_step), float(loss_frozen),
                               rtol=1e-6)
    np.testing.assert_allclose(float(loss_step), float(loss_identity),
                               rtol=1e-5)

    g_step = jax.grad(lambda p: model.training_loss(p, batch, key))(params)
    g_frozen = jax.grad(
        lambda p: model.training_loss(p, batch, key, precond_override=state)
    )(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-8),
        g_step, g_frozen,
    )

    # Trains through the chunk-frozen path.
    optimizer = optax.adam(0.05)
    multi_step = make_adam_multi_step(
        lambda p, b, k, pc: model.training_loss(p, b, k, precond_override=pc),
        optimizer, (x, y), trainable_mask=model.trainable_mask(params),
        precond_fn=model.precond_state,
    )
    chunks = minibatch_index_iterator(jax.random.PRNGKey(1), 256, 64, 8)
    out, _, losses = multi_step(params, optimizer.init(params),
                                next(chunks), jax.random.PRNGKey(2))
    assert float(losses[-1]) < float(losses[0])

    # Contract errors.
    unfused = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-12, max_iterations=64),
        num_data=256, num_probes=3, fuse_kl_solves=False,
    )
    with pytest.raises(ValueError, match="fused"):
        unfused.training_loss(params, batch, key, precond_override=())
    with pytest.raises(ValueError, match="steps_per_call"):
        train_using_adam_and_update(
            params, lambda p, b, k, pc: 0.0, (x, y), 2, 64, 0.05,
            jax.random.PRNGKey(0), precond_fn=model.precond_state,
        )


def test_auto_chol_serving_falls_back_on_program_failure(rng):
    """predict_in_batches(solver="auto"): if the chol serving PROGRAM fails
    (observed in production: the remote compiler dies on the large-M
    triangular solve even though the factor built fine), auto falls back to
    CG serving with a warning instead of crashing.  An explicit
    solver="chol" request still fails loudly."""
    import dataclasses
    import warnings as _warnings

    import pytest

    from cggp_tpu.training.optimize import predict_in_batches

    x, y = _toy_data(rng, n=96, d=2)
    model, params = _make_cggp((x, y), m=12)

    @dataclasses.dataclass(frozen=True)
    class BoomServingCGGP(type(model)):
        def posterior_predict(self, post, x_new, full_cov=False):
            if post.chol is not None:
                raise RuntimeError("synthetic chol-program failure")
            return super().posterior_predict(post, x_new, full_cov=full_cov)

    boom = BoomServingCGGP(**{f.name: getattr(model, f.name)
                              for f in dataclasses.fields(model)})
    assert boom.resolve_serving_solver(params) == "chol"  # well-conditioned

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        mu, var = predict_in_batches(boom, params, x, batch_size=32,
                                     posterior_solver="auto")
    assert any("falling back to CG" in str(w.message) for w in caught), \
        [str(w.message) for w in caught]
    assert np.all(np.isfinite(np.asarray(mu)))
    # Reference output: the plain model's CG serving path.
    mu_ref, var_ref = predict_in_batches(model, params, x, batch_size=32,
                                         posterior_solver="cg")
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-8, atol=1e-10)

    with pytest.raises(RuntimeError, match="synthetic chol-program"):
        predict_in_batches(boom, params, x, batch_size=32,
                           posterior_solver="chol")


def test_train_chunked_adam_improves_true_mll(rng):
    """train_chunked_adam (round-4 dispatch-bounded exact-GP trainer): Adam
    over log_marginal_likelihood_chunked must IMPROVE the true marginal
    likelihood (dense-GPR oracle), and the unconverged-budget warning fires
    when the chunk budget is starved."""
    import warnings

    import jax
    import jax.numpy as jnp

    from cggp_tpu.models import GPR, IterGPR
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.training.optimize import train_chunked_adam

    n = 48
    x = jnp.asarray(rng.uniform(-1.5, 1.5, size=(n, 2)))
    y = jnp.asarray(np.sin(np.asarray(x).sum(-1, keepdims=True))
                    + 0.1 * rng.normal(size=(n, 1)))
    dense = GPR(kernel=Matern32())
    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-10, max_cg_iterations=6,
        relative_threshold=True, precondition="pivchol", precond_rank=8,
        num_probes=4, block=24,
    )
    params = model.init_params(input_dim=2, dtype=x.dtype)
    before = float(dense.log_marginal_likelihood(params, (x, y)))

    def vg(p, k):
        return model.log_marginal_likelihood_chunked(
            p, (x, y), key=k, chunk_iterations=6, max_chunks=100,
            logdet_value="zero")

    trained = train_chunked_adam(
        params, vg, iterations=20, learning_rate=0.1,
        key=jax.random.PRNGKey(0))
    after = float(dense.log_marginal_likelihood(trained, (x, y)))
    assert after > before, (before, after)

    # Starved chunk budget -> one honest RuntimeWarning at the end.
    def vg_starved(p, k):
        return model.log_marginal_likelihood_chunked(
            p, (x, y), key=k, chunk_iterations=2, max_chunks=1,
            logdet_value="zero")

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        train_chunked_adam(params, vg_starved, iterations=2,
                           learning_rate=0.1, key=jax.random.PRNGKey(0))
    assert any("unconverged" in str(w.message) for w in caught)


def test_precond_resolver_threads_static_mode_into_jitted_step(rng):
    """Round-5 (VERDICT r4 weak-3): with ``precond_resolver`` +
    ``loss_fn_for_mode``, the trainer resolves ``precondition="auto"`` by
    the Lanczos conditioning estimate HOST-SIDE and compiles the concrete
    mode into the jitted step — an ill-conditioned M=2048 system (below the
    size cap, where the in-jit size rule would pick chol) trains through a
    jitted pivchol step, eager and jit agreeing on the loss; and when a
    recluster boundary hands back a well-conditioned system, the trainer
    re-resolves and swaps to the chol step."""
    import dataclasses

    m = 2048
    # Ill-conditioned: near-duplicate centers + tiny Lambda (counts 1e6)
    # and a long lengthscale -> kappa >> 1/eps_f32 (same recipe as
    # test_models.test_training_precondition_auto_resolves_by_conditioning).
    base = rng.uniform(-1, 1, (m // 2, 2))
    z_ill = np.concatenate([base, base + 1e-4], axis=0)
    # Well-conditioned: spread centers, short lengthscale, counts 1.
    z_ok = rng.uniform(-100, 100, (m, 2))

    model = CGGP(
        kernel=SquaredExponential(),
        conjugate_gradient=ConjugateGradient(1e-6, max_iterations=16),
        num_data=10_000, precondition="auto", precond_rank=16, num_probes=2,
    )

    def params_for(z, counts_val, lengthscale):
        return model.init_params(
            jnp.asarray(z, jnp.float32),
            lengthscales=jnp.full((2,), lengthscale, jnp.float32),
            cluster_counts=jnp.full((m, 1), counts_val, jnp.float32),
            dtype=jnp.float32,
        )

    params = params_for(z_ill, 1e6, 10.0)
    assert model.resolve_precondition(params) == "pivchol"

    x = jnp.asarray(rng.uniform(-1, 1, (64, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 1)), jnp.float32)

    modes_built = []

    def loss_fn_for_mode(mode):
        modes_built.append(mode)
        concrete = dataclasses.replace(model, precondition=mode)
        return lambda p, b, k: concrete.training_loss(p, b, k)

    # Boundary 2 (iteration 1) swaps in the well-conditioned system: the
    # resolver must see it and rebuild the step as chol.
    calls = {"n": 0}
    swapped = params_for(z_ok, 1.0, 0.05)

    def update_fn(p):
        calls["n"] += 1
        return swapped if calls["n"] >= 2 else p

    swaps = []
    out = train_using_adam_and_update(
        params, None, (x, y), iterations=2, batch_size=64,
        learning_rate=1e-3, key=jax.random.PRNGKey(0), update_fn=update_fn,
        precond_resolver=model.resolve_precondition,
        loss_fn_for_mode=loss_fn_for_mode, resolve_every=1,
        initial_mode="pivchol",  # caller-resolved: no double Lanczos
        on_mode_change=swaps.append,
    )
    assert modes_built == ["pivchol", "chol"], modes_built
    assert swaps == ["chol"], swaps
    # Both jitted steps executed (a failed build/trace would have raised);
    # structure is preserved across the mode swap.  (No finiteness claim:
    # the ill-conditioned fp32 system is deliberately pathological and its
    # first-step gradients may legitimately overflow — the resolver's job
    # is exactly to route such systems to the SPD-safe pivchol branch.)
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(params)

    # Eager and jit agree: the MODE decision is made once, host-side, and
    # threaded into both — and on the well-conditioned system the resolved
    # concrete program also agrees numerically.  (On the kappa~1e9 fp32
    # system numeric agreement is meaningless — eager/jit fusion-order
    # noise is amplified unboundedly; the agreement the resolver
    # guarantees there is the BRANCH, which modes_built above proves.)
    concrete = dataclasses.replace(
        model, precondition=model.resolve_precondition(swapped))
    assert concrete.precondition == "chol"
    key = jax.random.PRNGKey(1)
    eager = float(concrete.training_loss(swapped, (x, y), key))
    jitted = float(jax.jit(concrete.training_loss)(swapped, (x, y), key))
    np.testing.assert_allclose(eager, jitted, rtol=1e-4)

    # Guard-rail validation: resolver without the factory is an error.
    with pytest.raises(ValueError, match="loss_fn_for_mode"):
        train_using_adam_and_update(
            params, None, (x, y), iterations=1, batch_size=64,
            learning_rate=1e-3, key=jax.random.PRNGKey(0),
            precond_resolver=model.resolve_precondition,
        )
