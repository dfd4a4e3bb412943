"""Exact-GPR reference-hyperparameter producer (reference paper_cli_gpr.py).

Trains GPR with L-BFGS on a <=10k-row slice of the dataset
(paper_cli_gpr.py:60-66), evaluates metrics, and writes the config dir
(``params.npz`` + ``info.json`` + ``results.json``) consumed by the ``uci``
driver's ``--config-dir``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import click
import jax
import numpy as np

from cggp_tpu.cli.cli_utils import (
    DatasetType,
    FloatType,
    KernelType,
    LogdirPath,
    create_gpr_model,
    create_itergpr_model,
    precision_names,
)
from cggp_tpu.training.batching import batched_indices
from cggp_tpu.training.monitor import Monitor
from cggp_tpu.training.optimize import train_using_lbfgs_and_update
from cggp_tpu.utils import save_config_dir
from cggp_tpu.utils.store import store_as_json

SIZE_LIMIT = 10000  # reference paper_cli_gpr.py:61


@click.command("gpr")
@click.option("-s", "--seed", type=int, default=0)
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-n", "--num-iterations", type=int, required=True)
@click.option("-d", "--dataset", type=DatasetType(), required=True)
@click.option("-p", "--precision", type=FloatType(), default="fp64")
@click.option("-pm", "--positive-minimum", type=float, default=1e-6)
@click.option("-k", "--kernel", type=KernelType(), default="se")
@click.option("-tb", "--test-batch-size", type=int)
@click.option("--tensorboard/--no-tensorboard", type=bool, default=False)
@click.option("-o", "--optimizer", type=click.Choice(["scipy", "device", "adam"]),
              default="scipy",
              help="'scipy' = host L-BFGS-B (reference semantics, one "
                   "host<->device round trip per iteration); 'device' = "
                   "optax L-BFGS under one jit (net-new, no round trips — "
                   "the win is largest on remote/tunneled accelerators); "
                   "'adam' = full-batch device Adam with fresh log-det "
                   "probes per step (the standard optimizer for the "
                   "stochastic --iterative objective).")
@click.option("-I", "--iterative/--no-iterative", default=False,
              help="Train the matrix-free CG exact GPR (IterGPR) on the "
                   "FULL train split instead of the dense Cholesky GPR on "
                   "the reference's 10k slice (paper_cli_gpr.py:60-66) — "
                   "N is bounded by compute, not by an [N, N] buffer.")
@click.option("--learning-rate", type=float, default=0.05,
              help="Adam learning rate (only with -o adam).")
@click.option("--num-probes", type=int, default=8,
              help="Rademacher probes for the iterative log-det machinery.")
@click.option("--cg-threshold", type=float, default=1e-8,
              help="Iterative-GPR CG stop target (relative, per RHS row).")
@click.option("--block", type=int, default=4096,
              help="Iterative-GPR Gram panel height (peak memory one "
                   "[block, N] panel).")
@click.option("--chunk-iterations", type=int, default=0,
              help="> 0: dispatch-bounded exact-GP training (requires "
                   "--iterative and -o adam) — every objective evaluation "
                   "runs as restarted-CG chunks of this many iterations "
                   "(IterGPR.log_marginal_likelihood_chunked), so no device "
                   "program scales with the CG iteration count.  For "
                   "runtimes with per-program execution budgets "
                   "(docs/PERF.md round-4: ~60 s watchdog at N>=262k).")
@click.pass_context
def main(
    ctx: click.Context,
    seed: int,
    logdir: Path,
    num_iterations: int,
    dataset,
    precision,
    positive_minimum: float,
    kernel,
    test_batch_size: Optional[int],
    tensorboard: bool,
    optimizer: str,
    iterative: bool,
    learning_rate: float,
    num_probes: int,
    cg_threshold: float,
    block: int,
    chunk_iterations: int,
):
    """Reference paper_cli_gpr.py:29-134."""
    if precision == np.float64:
        jax.config.update("jax_enable_x64", True)
    np.random.seed(seed)

    data = dataset(seed)
    train_data = tuple(map(jax_array(precision), data.train))
    test_data = tuple(map(jax_array(precision), data.test))
    # The iterative model exists to lift the reference's 10k slice cap.
    train_slice = train_data if iterative else tuple(d[:SIZE_LIMIT] for d in train_data)

    if iterative:
        model, params = create_itergpr_model(
            train_slice, kernel, dtype=precision,
            positive_minimum=positive_minimum, num_probes=num_probes,
            cg_threshold=cg_threshold, block=block,
        )
    else:
        model, params = create_gpr_model(
            train_slice, kernel, dtype=precision, positive_minimum=positive_minimum
        )

    info = {
        "seed": seed,
        "dataset_name": data.name,
        "num_iterations": num_iterations,
        "kernel": model.kernel.name,
        "logdir": str(logdir),
        "train_size": int(train_data[0].shape[0]),
        "train_rows_used": int(train_slice[0].shape[0]),
        "test_size": int(test_data[0].shape[0]),
        "input_dimension": int(train_data[0].shape[-1]),
        "model_class": "gpr-iter" if iterative else "gpr",
        # predict serves at the run's precision (predict.py reads this;
        # without it an fp64-trained config silently downcast on assign)
        # and rebuilds with the SAME bijector lower bound / solver shape —
        # a different positive_minimum re-transforms every unconstrained
        # leaf to shifted values on assignment.
        "precision": precision_names[precision],
        "positive_minimum": positive_minimum,
        "num_probes": num_probes,
        "block": block,
        "cg_threshold": cg_threshold,
    }
    click.echo(f"-> {json.dumps(info, indent=2)}")
    click.echo("=== Start training ===")

    # The iterative objective draws log-det probes from a key.  L-BFGS paths
    # need a DETERMINISTIC loss, so they fix the probe key for the whole run;
    # Adam re-draws per step (the standard stochastic-trace training setup).
    if chunk_iterations > 0 and not (iterative and optimizer == "adam"):
        raise click.UsageError(
            "--chunk-iterations requires --iterative and -o adam (the "
            "dispatch-bounded objective is stochastic; Adam is its "
            "optimizer)")

    fixed_key = jax.random.PRNGKey(seed)
    if iterative:
        det_loss = lambda p: model.training_loss(p, train_slice, key=fixed_key)
    else:
        det_loss = lambda p: model.training_loss(p, train_slice)

    monitor = Monitor(str(logdir), use_tensorboard=tensorboard)
    if optimizer == "adam" and chunk_iterations > 0:
        from cggp_tpu.training.optimize import train_chunked_adam

        def chunked_vg(p, k):
            # Zero-logdet VALUE convention during training (gradients are
            # exact either way; the per-step host-chunked SLQ would cost
            # slq_lanczos_iters extra dispatches for a monitor-only number).
            # Final metrics below report the true LML via logdet_value="slq".
            return model.log_marginal_likelihood_chunked(
                p, train_slice, key=k, chunk_iterations=chunk_iterations,
                logdet_value="zero")

        params = train_chunked_adam(
            params, chunked_vg, iterations=num_iterations,
            learning_rate=learning_rate, key=fixed_key, monitor=monitor,
        )
    elif optimizer == "adam":
        from cggp_tpu.training.optimize import train_full_batch_adam

        if iterative:
            keyed_loss = lambda p, k: model.training_loss(p, train_slice, key=k)
        else:
            keyed_loss = lambda p, _k: model.training_loss(p, train_slice)
        params = train_full_batch_adam(
            params, keyed_loss, iterations=num_iterations,
            learning_rate=learning_rate, key=fixed_key, monitor=monitor,
        )
    elif optimizer == "device":
        from cggp_tpu.training.optimize import train_using_device_lbfgs

        params = train_using_device_lbfgs(
            params,
            det_loss,
            max_iterations=num_iterations,
            monitor=monitor,
        )
    else:
        params = train_using_lbfgs_and_update(
            params,
            det_loss,
            max_iterations=num_iterations,
            monitor=monitor,
        )
    click.echo("=== Training finished ===")

    metrics = _gpr_metrics(model, params, train_slice, test_data,
                           test_batch_size or test_data[0].shape[0],
                           key=fixed_key, chunk_iterations=chunk_iterations)
    click.echo(json.dumps(metrics, indent=2))

    save_config_dir(logdir, params, info)
    # Include the sweep-grid group keys so uci-csv's groupby keeps the GPR
    # baseline rows (metric-only rows would be NaN-keyed and silently
    # dropped from summary.csv).
    store_as_json(Path(logdir, "results.json"), {
        "model": "gpr-iter" if iterative else "gpr",
        "dataset": data.name,
        "precision": precision_names[precision],
        "seed": seed,
        "jitter": None,
        "clustering_type": None,
        **metrics,
    })
    click.echo("=== Script finished ===")


def jax_array(dtype):
    import jax.numpy as jnp

    return lambda a: jnp.asarray(np.asarray(a, dtype=dtype))


def _gpr_metrics(model, params, train_data, test_data, batch_size: int,
                 key=None, chunk_iterations: int = 0):
    """Batched exact-GPR test RMSE/NLPD + train LML (the reference reuses
    make_metrics_callback; GPR's predict needs the train data, so it gets its
    own small evaluator here).  Serves through the posterior cache: ONE
    factorization (dense GPR) / alpha-solve (IterGPR) for the whole test set
    instead of one per batch."""
    import inspect

    import jax.numpy as jnp

    x_test, y_test = test_data
    n = x_test.shape[0]
    if chunk_iterations > 0:
        # Dispatch-bounded serving + LML to match the training budget: the
        # one-program alpha solve / SLQ / per-batch variance CG would be
        # the only unbounded programs left in the run.
        post = model.posterior_chunked(
            params, train_data, chunk_iterations=chunk_iterations)

        def batch_stats(post, xb, yb):  # eager: chunked per-batch solves
            mu, var = model.posterior_predict_chunked(
                post, xb, chunk_iterations=chunk_iterations)
            lpd = model.likelihood.predict_log_density(
                params["likelihood"], mu, var, yb)
            return jnp.sum(jnp.square(yb - mu)), jnp.sum(lpd)
    else:
        post = jax.jit(model.posterior)(params, train_data)

        @jax.jit
        def batch_stats(post, xb, yb):
            mu, var = model.posterior_predict(post, xb)
            lpd = model.likelihood.predict_log_density(
                params["likelihood"], mu, var, yb)
            return jnp.sum(jnp.square(yb - mu)), jnp.sum(lpd)

    se_total, lpd_total = 0.0, 0.0
    for idx in batched_indices(n, batch_size):
        se, lpd = batch_stats(post, x_test[idx], y_test[idx])
        se_total += float(se)
        lpd_total += float(lpd)
    if chunk_iterations > 0:
        lml_val, _grads, _info = model.log_marginal_likelihood_chunked(
            params, train_data, key=key, chunk_iterations=chunk_iterations,
            logdet_value="slq")
        if not _info.get("converged", True):
            import warnings

            warnings.warn(
                "final-metrics LML chunk budget exhausted unconverged "
                f"(rel residual {_info.get('rel_residual')}): the reported "
                "train/lml quad term is biased", RuntimeWarning)
        lml = float(lml_val)
    elif "key" in inspect.signature(model.log_marginal_likelihood).parameters:
        lml = float(model.log_marginal_likelihood(params, train_data, key=key))
    else:
        lml = float(model.log_marginal_likelihood(params, train_data))
    return {
        "test/rmse": float(np.sqrt(se_total / n)),
        "test/nlpd": float(-lpd_total / n),
        "train/lml": lml,
        "train/elbo": lml,  # GPR's objective plays the ELBO role (cli_utils.py:449)
    }


if __name__ == "__main__":
    main()
