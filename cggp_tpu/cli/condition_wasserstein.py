"""Condition-number / Wasserstein paper figure harness
(reference paper_condition_wasserstein.py).

For each input dimension, samples data from a GP prior, computes the exact
GPR posterior moments, then sweeps cover-tree resolutions: builds a CDGP,
records the condition number of ``Kuu + Λ``, the inducing count, the CG
iteration count for the ``(Kuu+Λ)^{-1}u`` solve, and the squared
2-Wasserstein distance between the approximate and exact posteriors.
Writes one CSV per dimension and optional matplotlib plots.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import click
import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.cli.cli_utils import FloatType, LogdirPath
from cggp_tpu.models import CGGP, GPR
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Kernel, SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.selection.update import covertree_update_inducing_parameters

Array = jnp.ndarray


def matrix_sqrt(m: Array, floor: float = 0.0) -> Array:
    """Symmetric PSD square root ``V sqrt(D) V^T``.

    NOTE deliberate divergence from the reference
    (paper_condition_wasserstein.py:42-48): its ``matrix_sqrt`` returns
    ``V sqrt(D)`` WITHOUT the trailing ``V^T`` — not a matrix square root —
    and then feeds the resulting non-symmetric product to ``eigh``, so the
    reference's "wasserstein2" values are not W2 distances (verified
    numerically: 95.85 vs the true 10.63 on a random SPD pair).  We compute
    the real thing; see docs/PARITY.md section 5.
    """
    eigvals, eigvecs = jnp.linalg.eigh(m)
    eigvals = jnp.maximum(eigvals, floor)
    return (eigvecs * jnp.sqrt(eigvals)[None, :]) @ eigvecs.T


def wasserstein2(moments1: Tuple[Array, Array], moments2: Tuple[Array, Array]) -> Array:
    """Squared 2-Wasserstein distance between two Gaussians:
    ``|mu1-mu2|^2 + tr(C1 + C2 - 2 (C1^{1/2} C2 C1^{1/2})^{1/2})``."""
    mu1, cov1 = moments1
    mu2, cov2 = moments2
    sqrt_cov1 = matrix_sqrt(cov1)
    inner = sqrt_cov1 @ cov2 @ sqrt_cov1
    inner = 0.5 * (inner + inner.T)  # exact symmetry for eigh
    cross = jnp.sum(jnp.sqrt(jnp.maximum(jnp.linalg.eigvalsh(inner), 0.0)))
    norm_term = jnp.sum(jnp.square(mu1 - mu2))
    return norm_term + jnp.trace(cov1 + cov2) - 2.0 * cross


def sample_gpr_prior(kernel: Kernel, kp, inputs: Array, key, jitter: float = 1e-10) -> Array:
    """One sample from the zero-mean GP prior at ``inputs``
    (reference :137-148)."""
    n = inputs.shape[0]
    cov = add_diagonal(kernel.K(kp, inputs), jitter * jnp.ones(n, inputs.dtype))
    chol = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(key, (n, 1), dtype=inputs.dtype)
    return chol @ eps


def run_sweep(dim: int, num_data: int, resolutions, noise: float, seed: int,
              solver_dtype=None, precondition: str = None,
              selection: str = "covertree"):
    """One dimension's resolution sweep; returns a list of row dicts.

    Ground truth — the GP-prior sample, the exact GPR posterior, and the W2
    distance — always runs in the ambient default dtype (fp64 when the CLI
    enables x64; the reference runs under gpflow's float64 default, and
    fp32 NaNs out of the ``jitter=1e-10`` prior Cholesky at these
    lengthscales).  ``solver_dtype`` (net-new, round-3) runs ONLY the CDGP
    side — covertree-conditioned ``Kuu+Λ``, CG solves, predictive moments —
    at a lower precision, so the fp32-TPU production regime can be compared
    against the same fp64 oracle.  ``precondition`` threads the model's
    per-step preconditioner (``"pivchol"`` / ``"rff"``) into both the
    stats solve and the predict path.
    """
    key = jax.random.PRNGKey(seed)
    key_x, key_f, key_probe = jax.random.split(key, 3)
    dtype = jnp.asarray(0.0).dtype
    solver_dtype = dtype if solver_dtype is None else jnp.dtype(solver_dtype)

    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(dim, 0.5), dtype=dtype)

    x = jax.random.uniform(key_x, (num_data, dim), dtype=dtype, minval=-1.0, maxval=1.0)
    f = sample_gpr_prior(kernel, kp, x, key_f)
    y = f + jnp.sqrt(noise) * jax.random.normal(key_probe, f.shape, dtype=dtype)
    data = (x, y)

    gpr = GPR(kernel=kernel)
    gpr_params = gpr.init_params(dim, noise_variance=noise, dtype=dtype)
    gpr_params["kernel"] = dict(kp)
    mu_exact, cov_exact = gpr.predict_f(gpr_params, data, x, full_cov=True)
    gpr_moments = (mu_exact, cov_exact[0])

    # Model-side inputs at solver precision (data stays fp64 for the oracle).
    x_lo = x.astype(solver_dtype)
    kp_lo = jax.tree_util.tree_map(lambda a: jnp.asarray(a, solver_dtype), dict(kp))

    if selection == "covernet":
        from cggp_tpu.selection.covernet import (
            covernet_update_inducing_parameters as update_fn,
        )
    else:
        update_fn = covertree_update_inducing_parameters

    rows = []
    for resolution in resolutions:
        iv, means, counts = update_fn(data, float(resolution))
        m = iv.shape[0]

        cg = ConjugateGradient(1e-6, max_iterations=max(m, 8))
        model = CGGP(kernel=kernel, conjugate_gradient=cg, num_data=num_data,
                     num_probes=5, precondition=precondition)
        params = model.init_params(
            iv.astype(solver_dtype), pseudo_u=means.astype(solver_dtype),
            cluster_counts=counts.astype(solver_dtype), noise_variance=noise,
            dtype=solver_dtype,
        )
        params["kernel"] = kp_lo

        var = model.diag_variance(params)
        lam = var[:, 0]
        kuu = kernel.K(params["kernel"], params["inducing_points"])
        kuu_lambda = add_diagonal(kuu, lam)
        precond = model._build_preconditioner(
            params["kernel"], params["inducing_points"], kuu, var,
            jax.random.PRNGKey(seed + 1),
        )
        _, stats = cg.solve_with_stats(
            kuu_lambda, params["pseudo_u"], preconditioner=precond
        )
        # Condition number of the solver-precision matrix, measured in fp64
        # (eigvalsh at fp32 would itself be rounding-limited at kappa~1e7).
        eigvals = np.linalg.eigvalsh(np.asarray(kuu_lambda, np.float64))

        mu_approx, cov_approx = model.predict_f(params, x_lo, full_cov=True)
        w2 = float(wasserstein2(
            gpr_moments, (mu_approx.astype(dtype), cov_approx[0].astype(dtype))
        ))

        row = {
            "dim": dim,
            "selection": selection,
            "resolution": float(resolution),
            "num_inducing_points": int(m),
            "condition_number": float(eigvals.max() / eigvals.min()),
            "eig_min": float(eigvals.min()),
            "eig_max": float(eigvals.max()),
            "cg_iterations": int(stats.steps),
            "wasserstein2": w2,
        }
        bad = [k for k, v in row.items()
               if not isinstance(v, str) and not np.isfinite(v)]
        if bad:
            click.echo(
                f"WARNING dim={dim} res={resolution}: non-finite {bad} — "
                "run with -p fp64 (fp32 NaNs out of the jitter=1e-10 prior "
                "Cholesky at these lengthscales)",
                err=True,
            )
        rows.append(row)
    return rows


@click.command("condition-wasserstein")
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-p", "--precision", type=FloatType(), default="fp64")
@click.option("-n", "--num-data", type=int, default=400)
@click.option("-s", "--seed", type=int, default=0)
@click.option("--noise", type=float, default=0.01)
@click.option("-d", "--dims", multiple=True, type=int, default=(1, 2, 4, 8))
@click.option(
    "-r", "--resolutions", multiple=True, type=float,
    default=(1.0, 0.5, 0.2, 0.1, 0.05, 0.02),
)
@click.option("--plot/--no-plot", default=False)
@click.option(
    "--precondition", type=click.Choice(["none", "pivchol", "rff", "chol"]),
    default="none",
    help="Per-solve preconditioner for the CDGP side (net-new, round-3).",
)
@click.option(
    "--selection", type=click.Choice(["covertree", "covernet"]),
    default="covertree",
    help="Inducing-point selection for the CDGP side: the reference's host "
         "cover tree, or the device delta-net with the same separation/"
         "coverage guarantees (net-new) — outputs get a _covernet suffix.",
)
def main(logdir, precision, num_data, seed, noise, dims, resolutions, plot,
         precondition, selection):
    """Reference paper_visualization (:151-213).

    ``-p fp64`` reproduces the reference protocol end-to-end in fp64.
    ``-p fp32`` (net-new) keeps the ORACLE — prior sample, exact GPR
    posterior, W2 — in fp64 but runs the CDGP/CG side at fp32, i.e. the
    precision the TPU production path actually uses; outputs get a
    ``_fp32`` filename suffix so both regimes can be checked in side by
    side.
    """
    # x64 is always on: the fp64 oracle (jitter=1e-10 prior Cholesky) is
    # shared by both precision modes; `-p` picks the CDGP solver dtype.
    jax.config.update("jax_enable_x64", True)
    solver_dtype = jnp.float32 if precision == np.float32 else jnp.float64
    precondition = None if precondition == "none" else precondition
    suffix = "_fp32" if precision == np.float32 else ""
    if precondition is not None:
        suffix += f"_{precondition}"
    if selection != "covertree":
        suffix += f"_{selection}"

    import pandas as pd

    all_rows = []
    for dim in dims:
        rows = run_sweep(dim, num_data, resolutions, noise, seed,
                         solver_dtype=solver_dtype, precondition=precondition,
                         selection=selection)
        all_rows.extend(rows)
        frame = pd.DataFrame(rows)
        out = Path(logdir, f"condition_wasserstein_dim{dim}{suffix}.csv")
        frame.to_csv(out, index=False)
        click.echo(f"dim={dim}: wrote {out}")
        click.echo(frame.to_string(index=False))

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        frame = pd.DataFrame(all_rows)
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for dim, group in frame.groupby("dim"):
            axes[0].plot(group["num_inducing_points"], group["condition_number"],
                         marker="o", label=f"d={dim}")
            axes[1].plot(group["num_inducing_points"], group["wasserstein2"],
                         marker="o", label=f"d={dim}")
            axes[2].plot(group["num_inducing_points"], group["cg_iterations"],
                         marker="o", label=f"d={dim}")
        for ax, ylabel in zip(axes, ["condition number", "W2^2", "CG iterations"]):
            ax.set_xlabel("M")
            ax.set_ylabel(ylabel)
            ax.set_yscale("log")
            ax.legend()
        fig.tight_layout()
        fig.savefig(Path(logdir, f"condition_wasserstein{suffix}.png"), dpi=120)
        click.echo(f"wrote {Path(logdir, f'condition_wasserstein{suffix}.png')}")

    click.echo("=== Script finished ===")


if __name__ == "__main__":
    main()
