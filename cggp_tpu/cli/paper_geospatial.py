"""Geospatial training driver (reference paper_cli_geospatial.py).

Command tree: ``geospatial -d east_africa -mc cdgp [opts]
{covertree|kmeans|oips} [opts] train-adam -n N [-b B ...]``.

Trains with Adam after a one-shot inducing update, then dumps ``params.npz``
and batched posterior mean/variance ``.npy`` files (reference :299-320).
"""

from __future__ import annotations

import json
from pathlib import Path

import click
import jax
import numpy as np

from cggp_tpu.cli.cli_utils import (
    DatasetType,
    FloatType,
    KernelType,
    LogdirPath,
    ModelChoices,
    precision_names,
)
from cggp_tpu.cli.click_cmds import make_selection_groups
from cggp_tpu.training.optimize import (
    create_monitor,
    make_metrics_callback,
    make_param_callback,
    train_using_adam_and_update,
)
from cggp_tpu.utils import save_config_dir


@click.group("geospatial")
@click.option("-d", "--dataset", "dataset_fn", type=DatasetType(), required=True)
@click.option("-mc", "--model-class", type=ModelChoices, required=True)
@click.option("-p", "--precision", type=FloatType(), default="fp64")
@click.option("-j", "--jitter", type=float, default=1e-6)
@click.option("-k", "--kernel", type=KernelType(), default="matern32")
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-s", "--seed", type=int, default=0)
@click.option("--jit/--no-jit", type=bool, default=True)
@click.option("-e", "--error-threshold", type=float, default=1e-6)
@click.option(
    "-P", "--preconditioner",
    type=click.Choice(["eye", "rff", "pivchol", "chol", "auto"]),
    default="eye",
    help="Per-step CG preconditioning for the cdgp model (see the uci/train "
         "groups).",
)
@click.option("--precond-rank", type=int, default=128,
              help="Low-rank preconditioner factor rank. Measured at M~1k: 256 is "
                   "+14% steps/s over 128 at identical accuracy; 64 HALVES "
                   "throughput (docs/PERF.md frontier table).")
@click.option(
    "--relative-threshold/--absolute-threshold", default=False,
    help="Scale each CG row's stopping target by its own RHS norm "
         "(net-new; recommended with -P pivchol — see docs/PERF.md).",
)
@click.pass_context
def main(ctx, dataset_fn, model_class, precision, jitter, kernel, logdir, seed,
         jit, error_threshold, preconditioner, precond_rank, relative_threshold):
    """Reference paper_cli_geospatial.py:57-116."""
    if model_class != "cdgp" and preconditioner != "eye":
        # Same contract as the uci driver: refuse rather than silently run
        # unpreconditioned (sgpr has no CG; cdgp-implicit builds its own
        # per-solve preconditioner and cannot carry a dense chol factor).
        raise click.UsageError(
            f"-P {preconditioner} only applies to the cdgp model; "
            f"model class {model_class!r} would silently ignore it"
        )
    if precision == np.float64:
        jax.config.update("jax_enable_x64", True)
    np.random.seed(seed)
    from cggp_tpu.data import cast_bundle

    dataset = cast_bundle(dataset_fn(seed), precision)
    ctx.obj = dict(
        common_ctx=dict(
            seed=seed,
            logdir=logdir,
            dataset=dataset,
            dataset_name=dataset.name,
            model_class=model_class,
            kernel_fn=kernel,
            jitter=jitter,
            jit=jit,
            error_threshold=error_threshold,
            precision=precision_names[precision],
            dtype=precision,
            relative_threshold=relative_threshold,
            model_kwargs=(
                {"precondition": preconditioner, "precond_rank": precond_rank}
                if (model_class == "cdgp" and preconditioner != "eye")
                else {}
            ),
        )
    )


@click.command("train-adam")
@click.option("-n", "--num-iterations", type=int, required=True)
@click.option("-b", "--batch-size", type=int)
@click.option("-tb", "--test-batch-size", type=int)
@click.option("-l", "--learning-rate", type=float, default=0.01)
@click.option("-r", "--record-step", type=int, default=50)
@click.option("--tip/--no-tip", type=bool, default=False)
@click.option(
    "--trainable-u/--fixed-u", default=False,
    help="Train the pseudo-observations (net-new free-variational mean).",
)
@click.option(
    "--steps-per-call", type=int, default=1,
    help="Run K optimizer steps per dispatch (lax.scan); monitor/updates "
         "fire every K steps.",
)
@click.option("--tensorboard/--no-tensorboard", type=bool, default=True)
@click.option("--serving-solver",
              type=click.Choice(["auto", "chol", "cg", "lanczos"]),
              default="auto",
              help="Block-solve mode of the posterior dumps (auto falls "
                   "back to CG on a non-finite Cholesky factor; lanczos = "
                   "LOVE-style solve-free variance for matrix-free models).")
@click.pass_context
def train_adam(ctx, num_iterations, batch_size, test_batch_size, learning_rate,
               steps_per_call,
               record_step, tip, trainable_u, tensorboard, serving_solver):
    """Reference paper_cli_geospatial.py:207-321."""
    common_ctx = ctx.obj["common_ctx"]
    ip_ctx = ctx.obj["ip_ctx"]
    logdir = common_ctx["logdir"]
    dataset = common_ctx["dataset"]
    train_data, test_data = dataset.train, dataset.test
    model, params, update_fn = ip_ctx["model"], ip_ctx["params"], ip_ctx["update_fn"]
    key = jax.random.PRNGKey(common_ctx["seed"])

    if batch_size is None:
        batch_size = train_data[0].shape[0]
    if test_batch_size is None:
        test_batch_size = test_data[0].shape[0]

    click.echo("=== Start initialising ===")
    params = update_fn(params)
    m = int(params["inducing_points"].shape[0])

    info = {
        "seed": common_ctx["seed"],
        "dataset_name": common_ctx["dataset_name"],
        # Recorded so `predict` can rebuild the SAME model (kernel identity
        # is not recoverable from params.npz — all kernels share the
        # variance/lengthscales parameter names).
        "kernel": model.kernel.name,
        "model_class": common_ctx["model_class"],
        "num_inducing_points": m,
        "num_iterations": num_iterations,
        "jitter": common_ctx["jitter"],
        "precision": common_ctx["precision"],
        "learning_rate": learning_rate,
        "logdir": str(logdir),
        "batch_size": batch_size,
        "test_batch_size": test_batch_size,
        "train_size": int(train_data[0].shape[0]),
        "test_size": int(test_data[0].shape[0]),
        "input_dimension": int(train_data[0].shape[-1]),
        "clustering_type": ip_ctx["clustering_type"],
        "clustering_kwargs": ip_ctx["clustering_kwargs"],
        "distance_type": ip_ctx["distance_type"],
        "model_class": common_ctx["model_class"],
        "trainable_inducing_points": tip,
        "trainable_u": trainable_u,
        "preconditioner": common_ctx.get("model_kwargs", {}).get("precondition", "eye"),
        "relative_threshold": common_ctx.get("relative_threshold", False),
        "steps_per_call": steps_per_call,
    }
    click.echo(f"-> {json.dumps(info, indent=2, default=str)}")

    metrics_fn = make_metrics_callback(
        model, train_data, test_data, batch_size=test_batch_size, key=key,
        use_jit=common_ctx["jit"],
    )
    monitor = create_monitor(
        str(logdir), metrics_fn, make_param_callback(model),
        record_step=record_step, use_tensorboard=tensorboard,
    )

    click.echo("=== Start training ===")
    loss_fn = _training_loss_fn(model)
    trainable_mask = (
        model.trainable_mask(params, trainable_inducing_points=tip,
                             trainable_pseudo_u=trainable_u)
        if hasattr(model, "trainable_mask")
        else None
    )
    params = train_using_adam_and_update(
        params, loss_fn, train_data,
        iterations=num_iterations, batch_size=batch_size,
        learning_rate=learning_rate, key=key,
        update_fn=None, trainable_mask=trainable_mask, monitor=monitor,
        steps_per_call=steps_per_call,
    )
    click.echo("=== Training finished ===")

    save_config_dir(logdir, params, info)

    from cggp_tpu.cli.cli_utils import dump_posterior_arrays

    for split_name, split in (("train", train_data), ("test", test_data)):
        mean, variances = dump_posterior_arrays(
            model, params, train_data, split[0], test_batch_size,
            posterior_solver=serving_solver,
        )
        np.save(Path(logdir, f"{split_name}_mean.npy"), mean)
        np.save(Path(logdir, f"{split_name}_variances.npy"), variances)
    monitor.close()
    click.echo("=== Script finished ===")


def _training_loss_fn(model):
    import inspect

    if "key" in inspect.signature(model.training_loss).parameters:
        return lambda p, b, k: model.training_loss(p, b, k)
    return lambda p, b, k: model.training_loss(p, b)


def attach_commands(group: click.Group) -> click.Group:
    # The reference geospatial driver exposes covertree/kmeans/oips (:119-204);
    # covernet is the net-new device twin of covertree (same guarantees).
    groups = make_selection_groups()
    for name in ("covertree", "covernet", "kmeans", "oips"):
        groups[name].add_command(train_adam, "train-adam")
        group.add_command(groups[name], name)
    return group


attach_commands(main)


if __name__ == "__main__":
    main()
