"""Posterior mean/variance dumps from a saved run
(reference paper_cli_predict_mu_var.py — which is import-broken against the
current reference cli_utils; this is the working equivalent).

Loads ``params.npz`` + ``info.json`` from a config dir, rebuilds the model it
describes, and writes batched ``{split}_mean.npy`` / ``{split}_variances.npy``.
"""

from __future__ import annotations

from pathlib import Path

import click
import jax
import numpy as np

from cggp_tpu.cli.cli_utils import (
    DatasetType,
    LogdirPath,
    batch_posterior_computation,
    create_model,
    default_kernel_fn,
)
from cggp_tpu.utils import load_config_dir


@click.command("predict")
@click.option("-c", "--config-dir", type=LogdirPath(mkdir=False), required=True)
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-mc", "--model-class", type=str, default="cdgp")
@click.option("-tb", "--test-batch-size", type=int, default=4096)
@click.option("-e", "--error-threshold", type=float, default=1e-6)
def main(config_dir, logdir, model_class, test_batch_size, error_threshold):
    flat, info = load_config_dir(config_dir)
    dataset_name = info.get("dataset_name", info.get("dataset"))
    seed = int(info.get("seed", 0))
    dataset = DatasetType().convert(dataset_name, None, None)(seed)

    m = flat["inducing_points"].shape[0] if "inducing_points" in flat else None
    model, params = create_model(
        model_class, default_kernel_fn, dataset.train,
        num_inducing_points=m, error_threshold=error_threshold, seed=seed,
    )
    from cggp_tpu.utils import assign_flat

    params = assign_flat(params, flat)

    from cggp_tpu.training.optimize import bind_predict_fn

    bound_predict = bind_predict_fn(model, dataset.train)
    predict_fn = jax.jit(lambda x: bound_predict(params, x))
    for split_name, split in (("train", dataset.train), ("test", dataset.test)):
        mean, var = batch_posterior_computation(predict_fn, split, test_batch_size)
        np.save(Path(logdir, f"{split_name}_mean.npy"), mean)
        np.save(Path(logdir, f"{split_name}_variances.npy"), var)
        click.echo(f"{split_name}: mean {mean.shape}, var {var.shape}")
    click.echo("=== Script finished ===")


if __name__ == "__main__":
    main()
