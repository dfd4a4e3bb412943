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
@click.option("-o", "--optimizer", type=click.Choice(["scipy", "device"]),
              default="scipy",
              help="'scipy' = host L-BFGS-B (reference semantics, one "
                   "host<->device round trip per iteration); 'device' = "
                   "optax L-BFGS under one jit (net-new, no round trips — "
                   "the win is largest on remote/tunneled accelerators).")
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
):
    """Reference paper_cli_gpr.py:29-134."""
    if precision == np.float64:
        jax.config.update("jax_enable_x64", True)
    np.random.seed(seed)

    data = dataset(seed)
    train_data = tuple(map(jax_array(precision), data.train))
    test_data = tuple(map(jax_array(precision), data.test))
    train_slice = tuple(d[:SIZE_LIMIT] for d in train_data)

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
        "test_size": int(test_data[0].shape[0]),
        "input_dimension": int(train_data[0].shape[-1]),
        "model_class": "gpr",
    }
    click.echo(f"-> {json.dumps(info, indent=2)}")
    click.echo("=== Start training ===")

    monitor = Monitor(str(logdir), use_tensorboard=tensorboard)
    if optimizer == "device":
        from cggp_tpu.training.optimize import train_using_device_lbfgs

        params = train_using_device_lbfgs(
            params,
            lambda p: model.training_loss(p, train_slice),
            max_iterations=num_iterations,
            monitor=monitor,
        )
    else:
        params = train_using_lbfgs_and_update(
            params,
            lambda p: model.training_loss(p, train_slice),
            max_iterations=num_iterations,
            monitor=monitor,
        )
    click.echo("=== Training finished ===")

    metrics = _gpr_metrics(model, params, train_slice, test_data,
                           test_batch_size or test_data[0].shape[0])
    click.echo(json.dumps(metrics, indent=2))

    save_config_dir(logdir, params, info)
    # Include the sweep-grid group keys so uci-csv's groupby keeps the GPR
    # baseline rows (metric-only rows would be NaN-keyed and silently
    # dropped from summary.csv).
    store_as_json(Path(logdir, "results.json"), {
        "model": "gpr",
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


def _gpr_metrics(model, params, train_data, test_data, batch_size: int):
    """Batched exact-GPR test RMSE/NLPD + train LML (the reference reuses
    make_metrics_callback; GPR's predict needs the train data, so it gets its
    own small evaluator here)."""
    import jax.numpy as jnp

    x_test, y_test = test_data
    n = x_test.shape[0]

    @jax.jit
    def batch_stats(xb, yb):
        mu, var = model.predict_f(params, train_data, xb)
        lpd = model.likelihood.predict_log_density(params["likelihood"], mu, var, yb)
        return jnp.sum(jnp.square(yb - mu)), jnp.sum(lpd)

    se_total, lpd_total = 0.0, 0.0
    for idx in batched_indices(n, batch_size):
        se, lpd = batch_stats(x_test[idx], y_test[idx])
        se_total += float(se)
        lpd_total += float(lpd)
    lml = float(model.log_marginal_likelihood(params, train_data))
    return {
        "test/rmse": float(np.sqrt(se_total / n)),
        "test/nlpd": float(-lpd_total / n),
        "train/lml": lml,
        "train/elbo": lml,  # GPR's objective plays the ELBO role (cli_utils.py:449)
    }


if __name__ == "__main__":
    main()
