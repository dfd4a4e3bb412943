"""UCI evaluation driver (reference paper_cli_uci.py:39-210).

Command tree: ``uci -mc cdgp -p fp64 -j 1e-6 -c CONFIG_DIR
{covertree|kmeans|kmeans2|oips|uniform|greedy} [opts] compute-metrics -l LOGDIR``.

Loads reference GPR hyperparameters from a config dir (``params.npz`` +
``info.json`` produced by the ``gpr`` driver), builds the model + selection
update fn, runs the update once, evaluates RMSE/NLPD/ELBO and the
condition-number properties of ``Kuu``, and writes ``results.json``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import click
import jax
import numpy as np

from cggp_tpu.cli.cli_utils import (
    DatasetType,
    FloatType,
    LogdirPath,
    ModelChoices,
    covariance_properties,
    expand_paths_with_wildcards,
    precision_names,
)
from cggp_tpu.cli.click_cmds import make_selection_groups
from cggp_tpu.training.optimize import make_metrics_callback
from cggp_tpu.utils import assign_flat, load_config_dir
from cggp_tpu.utils.store import store_as_json


@click.group("uci")
@click.option("-mc", "--model-class", type=ModelChoices, required=True)
@click.option("-p", "--precision", type=FloatType(), required=True)
@click.option("-j", "--jitter", type=float, required=True)
@click.option("-c", "--config-dir", type=LogdirPath(mkdir=False))
@click.option("-e", "--error-threshold", type=float, default=1e-6)
@click.option(
    "-P", "--preconditioner",
    type=click.Choice(["eye", "rff", "pivchol", "chol", "auto"]),
    default="eye",
    help="CG preconditioner; 'rff' applies the Woodbury inverse of a "
         "random-Fourier low-rank + diagonal approximation; 'pivchol' a "
         "pivoted-Cholesky factor of Kuu (the preferred fp32 choice for "
         "ill-conditioned systems); 'chol' the exact blocked factor "
         "(CG = iterative refinement, 4.7-6.9x across M <= 8k).",
)
@click.option("--num-rff-bases", type=int, default=256)
@click.option("--precond-rank", type=int, default=128,
              help="factor rank for the 'pivchol' preconditioner")
@click.option(
    "--logdet-variant", type=click.Choice(["zero", "slq"]), default="zero",
    help="'zero' reproduces the reference's value-free logdet; 'slq' reports "
         "true ELBO values via stochastic Lanczos quadrature.",
)
@click.option(
    "--dot", type=click.Choice(["standard", "compensated"]), default="standard",
    help="CG inner products; 'compensated' = Kahan summation for fp32 runs.",
)
@click.option(
    "--relative-threshold/--absolute-threshold", default=False,
    help="Scale each CG row's stopping target by its own RHS norm "
         "(net-new; recommended with -P pivchol — see docs/PERF.md).",
)
@click.option("--jit/--no-jit", type=bool, default=True)
@click.pass_context
def main(
    ctx: click.Context,
    model_class: str,
    precision,
    jitter: float,
    config_dir,
    error_threshold: float,
    preconditioner: str,
    num_rff_bases: int,
    precond_rank: int,
    logdet_variant: str,
    dot: str,
    relative_threshold: bool,
    jit: bool,
):
    """Core command shared by all UCI evaluation runs
    (reference paper_cli_uci.py:39-105)."""
    if model_class == "cdgp-implicit" and preconditioner in ("chol", "auto"):
        raise click.UsageError(
            f"-P {preconditioner} needs the dense [M, M] system; the "
            "matrix-free model builds its factors matrix-free — use pivchol"
        )
    if precision == np.float64:
        jax.config.update("jax_enable_x64", True)

    ref_info: Optional[Dict] = None
    ref_flat = None
    if config_dir is not None:
        glob_dirs = expand_paths_with_wildcards([str(config_dir)])
        if len(glob_dirs) > 1:
            raise click.UsageError(
                f"Ambiguous config directory wildcard. Found {glob_dirs}."
            )
        config_dir = glob_dirs[0] if glob_dirs else config_dir
        ref_flat, ref_info = load_config_dir(config_dir)
        seed = int(ref_info["seed"])
        dataset_name = ref_info["dataset_name"]
    else:
        seed = 111
        dataset_name = "naval"
        config_dir = "none"

    np.random.seed(seed)
    from cggp_tpu.data import cast_bundle

    dataset = cast_bundle(
        DatasetType().convert(dataset_name, None, None)(seed), precision
    )

    ctx.obj = dict(
        common_ctx=dict(
            seed=seed,
            dataset_name=dataset_name,
            config_dir=str(config_dir),
            model_class=model_class,
            ref_info=ref_info,
            ref_flat=ref_flat,
            dataset=dataset,
            jitter=jitter,
            error_threshold=error_threshold,
            precision=precision_names[precision],
            dtype=precision,
            dot=dot,
            relative_threshold=relative_threshold,
            preconditioner=preconditioner,
            num_rff_bases=num_rff_bases,
            precond_rank=precond_rank,
            model_kwargs=(
                {"logdet_variant": logdet_variant}
                if model_class != "cdgp-implicit"
                # The matrix-free model builds its preconditioner per solve
                # from CURRENT params (no post-update rebuild step like the
                # dense cdgp path in compute_metrics), so the -P choice is a
                # construction-time field here.
                else {
                    "logdet_variant": logdet_variant,
                    **(
                        {"precondition": preconditioner,
                         "precond_rank": (num_rff_bases
                                          if preconditioner == "rff"
                                          else precond_rank)}
                        if preconditioner != "eye" else {}
                    ),
                }
            ),
            jit=jit,
        )
    )


@click.command("compute-metrics")
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-tb", "--test-batch-size", type=int)
@click.pass_context
def compute_metrics(ctx: click.Context, logdir: Path, test_batch_size):
    """Reference paper_cli_uci.py:108-171."""
    common_ctx = ctx.obj["common_ctx"]
    ip_ctx = ctx.obj["ip_ctx"]

    dataset = common_ctx["dataset"]
    model = ip_ctx["model"]
    params = ip_ctx["params"]
    update_fn = ip_ctx["update_fn"]
    jitter = common_ctx["jitter"]

    if common_ctx["ref_flat"] is not None:
        params = assign_flat(params, common_ctx["ref_flat"])

    if test_batch_size is None:
        test_batch_size = dataset.test[0].shape[0]

    params = update_fn(params)

    if (common_ctx.get("preconditioner") in ("rff", "pivchol", "chol", "auto")
            and hasattr(model, "conjugate_gradient")):
        # Preconditioner is solver state built from the post-update (Z, lam):
        # rebuild the model's CG with it (BASELINE.md config 4 path).
        import dataclasses as _dc

        from cggp_tpu.ops.cg import ConjugateGradient

        lam = model.diag_variance(params)[:, 0]
        precond_mode = common_ctx["preconditioner"]
        if precond_mode == "auto":
            from cggp_tpu.models.cggp import _CHOL_AUTO_MAX_M

            m_now = int(params["inducing_points"].shape[0])
            precond_mode = "chol" if m_now <= _CHOL_AUTO_MAX_M else "pivchol"
        if precond_mode == "pivchol":
            from cggp_tpu.ops.cg import pivoted_cholesky_preconditioner

            kmm = model.kernel.K(params["kernel"], params["inducing_points"])
            precond = pivoted_cholesky_preconditioner(
                kmm, lam, common_ctx["precond_rank"]
            )
        elif precond_mode == "chol":
            from cggp_tpu.ops.cg import CholPreconditioner

            kmm = model.kernel.K(params["kernel"], params["inducing_points"])
            precond = CholPreconditioner(kmm, lam)
        else:
            from cggp_tpu.ops.rff import rff_preconditioner

            precond = rff_preconditioner(
                model.kernel, params["kernel"], params["inducing_points"], lam,
                common_ctx["num_rff_bases"], jax.random.PRNGKey(common_ctx["seed"] + 1),
            )
        old_cg = model.conjugate_gradient
        model = _dc.replace(
            model,
            conjugate_gradient=ConjugateGradient(
                old_cg.error_threshold, preconditioner=precond,
                max_iterations=old_cg.max_iterations,
                max_steps_cycle=old_cg.max_steps_cycle, dot=old_cg.dot,
                matvec_impl=old_cg.matvec_impl,
                relative_threshold=old_cg.relative_threshold,
            ),
        )

    metrics_fn = make_metrics_callback(
        model,
        dataset.train,
        dataset.test,
        batch_size=test_batch_size,
        key=jax.random.PRNGKey(common_ctx["seed"]),
        check_numerics=False,
        use_jit=common_ctx["jit"],
    )
    metrics = metrics_fn(-1, params)
    properties = covariance_properties(model, params, jitter)
    m = int(params["inducing_points"].shape[0])

    info = {
        "seed": common_ctx["seed"],
        "model": common_ctx["model_class"],
        "dataset": common_ctx["dataset_name"],
        "train_data_size": int(dataset.train[0].shape[0]),
        "test_data_size": int(dataset.test[0].shape[0]),
        "input_dim": int(dataset.train[0].shape[-1]),
        "jitter": jitter,
        "precision": common_ctx["precision"],
        "jit": common_ctx["jit"],
        "config_dir": common_ctx["config_dir"],
        "clustering_type": ip_ctx["clustering_type"],
        "clustering_args": ip_ctx["clustering_kwargs"],
        "num_inducing_points": m,
        "preconditioner": common_ctx.get("preconditioner", "eye"),
        "logdet_variant": common_ctx.get("model_kwargs", {}).get("logdet_variant", "zero"),
        "dot": common_ctx.get("dot", "standard"),
    }
    results = {**info, **metrics, **properties}
    store_as_json(Path(logdir, "results.json"), results)
    click.echo(json.dumps(results, indent=2, default=str))
    click.echo("=== Script finished ===")


def attach_commands(group: click.Group) -> click.Group:
    for name, sel in make_selection_groups().items():
        sel.add_command(compute_metrics, "compute-metrics")
        group.add_command(sel, name)
    return group


attach_commands(main)


if __name__ == "__main__":
    main()
