"""Posterior mean/variance dumps from a saved run
(reference paper_cli_predict_mu_var.py — which is import-broken against the
current reference cli_utils; this is the working equivalent).

Loads ``params.npz`` + ``info.json`` from a config dir, rebuilds the model it
describes, and writes batched ``{split}_mean.npy`` / ``{split}_variances.npy``.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from cggp_tpu.cli.cli_utils import (
    DatasetType,
    LogdirPath,
    create_model,
    default_kernel_fn,
    dump_posterior_arrays,
)
from cggp_tpu.utils import load_config_dir


def _posterior_finite(post) -> bool:
    """True iff every inexact array leaf of the serving cache is finite."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(post):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.inexact) and not bool(
            jnp.isfinite(arr).all()
        ):
            return False
    return True


@click.command("predict")
@click.option("-c", "--config-dir", type=LogdirPath(mkdir=False), required=True)
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-mc", "--model-class", type=str, default="cdgp")
@click.option("-tb", "--test-batch-size", type=int, default=4096)
@click.option("-e", "--error-threshold", type=float, default=1e-6)
@click.option("--mean-only", is_flag=True, default=False,
              help="Dump posterior means only — the CG-free cached path "
                   "for CDGP (docs/PERF.md: 16x serving throughput).")
@click.option("--serving-solver",
              type=click.Choice(["auto", "chol", "cg", "lanczos"]),
              default="auto",
              help="Block-solve mode of the serving cache: chol = one-time "
                   "factorization + triangular solves (fast; needs "
                   "kappa(Kmm+Lambda) within fp32 range), cg = the "
                   "preconditioned-CG path (any conditioning). auto = chol "
                   "for M<=16384 with automatic CG fallback on a "
                   "non-finite factor. lanczos = LOVE-style rank-k cache "
                   "(matrix-free models, e.g. cdgp-implicit: solve-free "
                   "per-batch variance, conservative over-estimates).")
@click.option("--posterior-dir", type=LogdirPath(), default=None,
              help="Persist/reuse the serving cache: loads "
                   "posterior.{npz,json} from this dir if present (the "
                   "build — factorization / CG solves — is skipped), else "
                   "builds once and saves it there for later processes.")
@click.option("--num-devices", type=int, default=None,
              help="Serve data-parallel: query rows of each batch sharded "
                   "over an N-device mesh, the posterior cache replicated "
                   "(single-device-style models only).")
@click.option("--chunk-iterations", type=int, default=0,
              help="> 0: build the serving cache in dispatch-bounded "
                   "restarted-CG chunks (models exposing posterior_chunked, "
                   "e.g. gpr-iter) — for runtimes with per-program "
                   "execution budgets at large N (docs/PERF.md round-4).")
def main(config_dir, logdir, model_class, test_batch_size, error_threshold,
         mean_only, serving_solver, posterior_dir, num_devices,
         chunk_iterations):
    flat, info = load_config_dir(config_dir)
    dataset_name = info.get("dataset_name", info.get("dataset"))
    seed = int(info.get("seed", 0))

    # Serve at the run's precision: an fp64-trained config silently served
    # in fp32 would downcast every hyperparameter on assignment.
    if info.get("precision") == "fp64":
        import jax

        jax.config.update("jax_enable_x64", True)

    dataset = DatasetType().convert(dataset_name, None, None)(seed)

    # Rebuild with the kernel the run was TRAINED with — defaulting to
    # Matern32 against e.g. SE-trained hyperparameters assigns cleanly
    # (same param names) and dumps silently wrong posteriors.
    kernel_name = info.get("kernel")
    if kernel_name:
        from cggp_tpu.ops.kernels import kernel_by_name

        kernel_fn = lambda dim: (  # noqa: E731
            kernel_by_name(kernel_name),
            dict(variance=1.0, lengthscales=np.ones(dim)),
        )
    else:
        kernel_fn = default_kernel_fn
        click.echo(
            "WARNING: info.json records no kernel; assuming matern32 — "
            "posteriors are wrong if the run used a different kernel.",
            err=True,
        )

    # Sharded-training config dirs carry mesh-divisibility pad rows
    # (inducing_mask == 0 there; pads sit at 1e6 coords with count 1):
    # strip them — the unsharded rebuild has no mask, and with large
    # learned lengthscales the pads would re-couple into the posterior.
    if "inducing_mask" in flat:
        real = np.asarray(flat["inducing_mask"])[:, 0] > 0.5
        if not real.all():
            click.echo(
                f"stripping {int((~real).sum())} sharded pad rows "
                f"({int(real.sum())} real inducing points)"
            )
            for name in ("inducing_points", "pseudo_u", "cluster_counts"):
                if name in flat:
                    flat[name] = np.asarray(flat[name])[real]
        flat.pop("inducing_mask", None)

    m = flat["inducing_points"].shape[0] if "inducing_points" in flat else None
    model_kwargs = {}
    if model_class == "cdgp-implicit" and info.get("block"):
        model_kwargs["block"] = int(info["block"])
    if model_class in ("gpr", "gpr-iter"):
        # Rebuild the exact-GP family with the TRAINING run's bijector
        # bound and solver shape (the gpr driver records them).
        if info.get("positive_minimum") is not None:
            model_kwargs["positive_minimum"] = float(info["positive_minimum"])
        if model_class == "gpr-iter":
            if info.get("block"):
                model_kwargs["block"] = int(info["block"])
            if info.get("num_probes"):
                model_kwargs["num_probes"] = int(info["num_probes"])
    if model_class in ("cdgp", "cdgp-implicit"):
        # Rebuild with the TRAINING run's solver configuration (train.py
        # records it): dropping the preconditioner / relative threshold /
        # iteration cap here silently degrades the serving solves on
        # exactly the ill-conditioned large-M systems those knobs exist
        # for (the u-solve and per-batch Kmn CG would run
        # identity-preconditioned with an absolute threshold).
        if info.get("precondition") not in (None, "none"):
            model_kwargs["precondition"] = info["precondition"]
            if info.get("precond_rank"):
                model_kwargs["precond_rank"] = int(info["precond_rank"])
        if info.get("max_cg_iterations"):
            model_kwargs["max_cg_iterations"] = int(info["max_cg_iterations"])
    model, params = create_model(
        model_class, kernel_fn, dataset.train,
        num_inducing_points=m, error_threshold=error_threshold, seed=seed,
        relative_threshold=bool(info.get("relative_threshold", False)),
        **model_kwargs,
    )
    from cggp_tpu.utils import assign_flat

    had_pseudo_u = "pseudo_u" in flat
    if "inducing_mask" in params and all(
        k in flat for k in ("inducing_points", "pseudo_u", "cluster_counts")
    ):
        # Row-solver rebuild (e.g. cdgp-implicit): params carry pad rows at a
        # serving-time multiple that need not match the training one — re-pad
        # the stripped real rows through the model's own machinery, then
        # assign the remaining (hyperparameter) entries by name.
        params = model.assign_clusters(
            params, flat.pop("inducing_points"), flat.pop("pseudo_u"),
            flat.pop("cluster_counts"),
        )
    params = assign_flat(params, flat)
    if "pseudo_u" in params and not had_pseudo_u:
        # e.g. a GPR config dir: hyperparameters only.  The variational mean
        # stays at its zero init, so every dumped posterior mean is exactly
        # zero — correct algebra, but rarely what the caller wanted.
        click.echo(
            "WARNING: config dir carries no pseudo_u (hyperparameters only); "
            "posterior means will be identically zero. Pass a trained "
            "cdgp/geospatial config dir for non-trivial means.",
            err=True,
        )

    mesh = None
    if num_devices is not None:
        from cggp_tpu.parallel import make_mesh

        mesh = make_mesh(num_devices)
        click.echo(f"data-parallel serving over {num_devices} devices")

    post = None
    _cache_on_disk = (posterior_dir is not None
                      and Path(posterior_dir, "posterior.json").exists())
    if chunk_iterations > 0 and not _cache_on_disk:
        if not hasattr(model, "posterior_chunked"):
            raise click.ClickException(
                f"{model_class} has no dispatch-bounded posterior build; "
                "drop --chunk-iterations")
        solver = serving_solver if serving_solver != "chol" else "cg"
        post = model.posterior_chunked(
            params, dataset.train, solver=solver,
            chunk_iterations=chunk_iterations)
        click.echo(
            f"serving cache built in bounded chunks (<= {chunk_iterations} "
            f"CG iterations / one matvec per dispatch, solver {solver})")
    if posterior_dir is not None:
        from cggp_tpu.utils import (
            load_posterior, posterior_fingerprint, save_posterior,
        )

        # Fold the dataset identity in: data-built posteriors (GPR/SGPR/
        # IterGPR alpha caches) are stale across datasets even with
        # identical hyperparameters.
        xtr = np.asarray(dataset.train[0])
        fingerprint = posterior_fingerprint(
            model_class, params,
            extra=f"{dataset_name}|{seed}|{xtr.shape}")
        meta_path = Path(posterior_dir, "cache_meta.json")
        if Path(posterior_dir, "posterior.json").exists():
            # Refuse a cache built for different params/config: a
            # shape-compatible stale cache (e.g. after retraining) would
            # silently serve wrong posteriors.
            import json as _json

            if meta_path.exists():
                meta = _json.loads(meta_path.read_text())
                if meta.get("fingerprint") != fingerprint:
                    raise click.ClickException(
                        f"serving cache at {posterior_dir} was built for a "
                        f"different model/params (fingerprint "
                        f"{meta.get('fingerprint')} != {fingerprint}); "
                        f"delete the directory to rebuild")
            else:
                click.echo(
                    f"WARNING: serving cache at {posterior_dir} has no "
                    "cache_meta.json fingerprint; cannot verify it matches "
                    "this config — delete the directory to rebuild safely.",
                    err=True,
                )
            post = load_posterior(posterior_dir)
            click.echo(f"serving cache loaded from {posterior_dir} "
                       "(build skipped)")
        elif post is not None:
            # Already built above in bounded chunks; just persist it.
            if not _posterior_finite(post):
                raise click.ClickException(
                    "chunk-built serving cache is non-finite; not saving.")
            save_posterior(posterior_dir, post)
            import json as _json

            meta_path.write_text(_json.dumps({"fingerprint": fingerprint,
                                              "model_class": model_class}))
            click.echo(f"serving cache built and saved to {posterior_dir}")
        elif hasattr(model, "posterior"):
            import inspect as _inspect

            sig = _inspect.signature(model.posterior).parameters
            solver = serving_solver
            if solver == "auto" and hasattr(model, "resolve_serving_solver"):
                solver = model.resolve_serving_solver(params)
            kwargs = {"solver": solver} if "solver" in sig else {}

            def _build(kw):
                return model.posterior(params, dataset.train, **kw) \
                    if "data" in sig else model.posterior(params, **kw)

            post = _build(kwargs)
            # Persisting a non-finite factor (ill-conditioned chol) would
            # poison this and every later run of the directory; apply the
            # same CG fallback the auto serving path uses BEFORE saving.
            if not _posterior_finite(post):
                if serving_solver == "auto" and kwargs.get("solver") == "chol":
                    click.echo(
                        "WARNING: auto-resolved chol cache is non-finite "
                        "(ill-conditioned system); falling back to the CG "
                        "cache.", err=True)
                    kwargs["solver"] = "cg"
                    post = _build(kwargs)
                if not _posterior_finite(post):
                    raise click.ClickException(
                        f"{kwargs.get('solver', serving_solver)} serving "
                        "cache is non-finite; not saving. Try "
                        "--serving-solver cg.")
            save_posterior(posterior_dir, post)
            import json as _json

            meta_path.write_text(_json.dumps({"fingerprint": fingerprint,
                                              "model_class": model_class}))
            click.echo(f"serving cache built and saved to {posterior_dir}")
        else:
            click.echo(
                f"WARNING: {model_class} has no posterior cache; "
                "--posterior-dir ignored", err=True,
            )

    for split_name, split in (("train", dataset.train), ("test", dataset.test)):
        mean, var = dump_posterior_arrays(
            model, params, dataset.train, split[0], test_batch_size,
            mean_only=mean_only, posterior_solver=serving_solver, mesh=mesh,
            posterior=post, chunk_iterations=chunk_iterations,
        )
        np.save(Path(logdir, f"{split_name}_mean.npy"), mean)
        if var is not None:
            np.save(Path(logdir, f"{split_name}_variances.npy"), var)
        click.echo(
            f"{split_name}: mean {mean.shape}, "
            f"var {'skipped' if var is None else var.shape}"
        )
    click.echo("=== Script finished ===")


if __name__ == "__main__":
    main()
