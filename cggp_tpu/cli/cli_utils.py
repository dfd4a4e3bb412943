"""CLI parameter types and model/update-fn factories (reference cli_utils.py).

The factories return functional triples ``(model_spec, params, update_fn)``
instead of mutating GPflow variables: ``update_fn(params) -> params`` is the
reference's variable-assign block (cli_utils.py:396-406) re-expressed as a
pure function.

Reference bugs deliberately fixed here (SURVEY.md known-bugs):
* KernelType inline params parse correctly (``ast`` import missing at
  reference cli_utils.py:114);
* the ``kmeans2`` command actually dispatches to scipy k-means++ (reference
  click_cmds.py:73 silently fell back to Lloyd's).
"""

from __future__ import annotations

import ast
import glob as globlib
from functools import reduce
from operator import iconcat
from pathlib import Path
from typing import Callable, Dict, Optional, Sequence, Tuple

import click
import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import DATASET_NAMES, load_data
from cggp_tpu.models import CGGP, ClusterGP, GPR, LpSVGP, SGPR
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.distance import DistanceType, create_distance_fn
from cggp_tpu.ops.kernels import Kernel, kernel_by_name
from cggp_tpu.selection.kmeans import kmeans_lloyd
from cggp_tpu.selection.points import greedy_selection, oips, uniform
from cggp_tpu.selection.covernet import covernet_update_inducing_parameters
from cggp_tpu.selection.update import (
    covertree_update_inducing_parameters,
    kmeans_update_inducing_parameters,
    labels_update_inducing_parameters,
)

Array = jnp.ndarray

CLUSTERING_TYPES = (
    "kmeans", "kmeans2", "covertree", "covernet", "oips", "uniform", "greedy"
)
MODEL_NAMES = ("sgpr", "cdgp", "cdgp-implicit")
DistanceChoices = click.Choice(DistanceType)
ModelChoices = click.Choice(MODEL_NAMES)

precision_names = {np.float32: "fp32", np.float64: "fp64"}


# ---------------------------------------------------------------------------
# Click parameter types (reference cli_utils.py:42-135)
# ---------------------------------------------------------------------------


class FloatType(click.ParamType):
    name = "dtype"

    def convert(self, value, param, ctx):
        options = {"fp32": np.float32, "fp64": np.float64}
        try:
            return options[value.lower()]
        except KeyError:
            self.fail(f"{value} is not a valid float type [fp32, fp64]", param, ctx)


class LogdirPath(click.Path):
    default_logdir = "./logs-default"

    def __init__(self, mkdir: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.mkdir = mkdir

    def convert(self, value, param, ctx):
        logdir = Path(super().convert(value, param, ctx)).expanduser().resolve()
        if self.mkdir:
            logdir.mkdir(parents=True, exist_ok=True)
        return logdir


class DatasetType(click.ParamType):
    """Dataset name, with optional inline size parameters for the hermetic
    synthetic family: ``synthetic:n=435000:dim=3`` (net-new — lets the CLI
    drive reference-scale runs without dataset files)."""

    name = "dataset"
    datasets = DATASET_NAMES

    def convert(self, value, param, ctx):
        name, *conf = value.split(":")
        kwargs = {}
        if conf:
            if not name.startswith("synthetic"):
                self.fail(f"inline parameters are only supported for "
                          f"synthetic datasets, got {value!r}", param, ctx)
            try:
                for kv in conf:
                    k, v = kv.split("=")
                    kwargs[{"n": "synthetic_n", "dim": "synthetic_dim"}[k]] = int(v)
            except (ValueError, KeyError):
                self.fail(f"bad synthetic parameters in {value!r}; use "
                          f"synthetic:n=NNN:dim=D", param, ctx)
            if name == "synthetic1d" and "synthetic_dim" in kwargs:
                self.fail("synthetic1d is fixed to dim=1; use synthetic:dim=D",
                          param, ctx)
        if name not in self.datasets:
            self.fail(f"{name} dataset is not supported", param, ctx)

        def load_data_fn(seed: int):
            bundle = load_data(name, seed=seed, **kwargs)
            # Keep the FULL spec as the dataset name so saved configs
            # (info.json dataset_name) round-trip to the same-sized dataset
            # when re-loaded through this type (e.g. uci --config-dir).
            return bundle._replace(name=value) if conf else bundle

        return load_data_fn


class KernelType(click.ParamType):
    """``se``, ``matern32`` etc., with optional ``_len=..._var=...`` inline
    parameters (reference cli_utils.py:103-135; the reference's parser is
    broken by a missing ``ast`` import — fixed here)."""

    name = "kernel"
    kernels = ("se", "matern32", "matern12", "matern52")
    param_keymap = {"var": "variance", "len": "lengthscales"}

    @classmethod
    def parse_kernel_parameters(cls, source: str) -> Dict:
        params = [kv.split("=") for kv in source.split("_")]
        return {cls.param_keymap[k]: ast.literal_eval(v) for k, v in params}

    def convert(self, value, param, ctx):
        try:
            kernel_name, *conf = value.split("_", maxsplit=1)
            if kernel_name not in self.kernels:
                raise KeyError(kernel_name)
            kernel_params = self.parse_kernel_parameters(conf[0]) if conf else {}

            def create_kernel_fn(ndim: int) -> Tuple[Kernel, Dict]:
                kernel = kernel_by_name(kernel_name)
                lengthscales = np.ones(ndim)
                if "lengthscales" in kernel_params:
                    lengthscales = lengthscales * kernel_params["lengthscales"]
                variance = float(kernel_params.get("variance", 1.0))
                return kernel, dict(variance=variance, lengthscales=lengthscales)

            return create_kernel_fn
        except (KeyError, ValueError, SyntaxError):
            self.fail(f"{value} is not supported", param, ctx)


def expand_paths_with_wildcards(filepaths: Sequence[str]) -> Sequence[str]:
    full_list = [globlib.glob(str(f)) for f in filepaths]
    return list(reduce(iconcat, full_list, []))


# ---------------------------------------------------------------------------
# Model factories (reference cli_utils.py:143-184, :439-452)
# ---------------------------------------------------------------------------


def default_kernel_fn(ndim: int) -> Tuple[Kernel, Dict]:
    """Matern32 with unit ARD lengthscales (reference cli_utils.py:363-368)."""
    return kernel_by_name("matern32"), dict(variance=1.0, lengthscales=np.ones(ndim))


def create_model(
    model_name: str,
    kernel_fn: Callable,
    data: Tuple[Array, Array],
    num_inducing_points: Optional[int] = None,
    error_threshold: float = 1e-6,
    dtype=None,
    seed: int = 0,
    dot: str = "standard",
    max_cg_iterations: Optional[int] = None,
    jitter: Optional[float] = None,
    relative_threshold: bool = False,
    **model_kwargs,
):
    """Build ``(model_spec, params)`` with a random-subset Z and likelihood
    variance 0.1 (reference cli_utils.py:143-168).

    ``dot="compensated"`` switches the CG inner products to Kahan summation
    for fp32 TPU runs (BASELINE.md config 4).  ``jitter`` reaches SGPR's Kuu
    build (the reference's global ``default_jitter``); the CG models use
    jitter 0 by design (reference models.py:300).

    ``jitter=None`` resolves from :func:`cggp_tpu.config.default_config`
    (the explicit replacement for gpflow's ``set_default_jitter``)."""
    if jitter is None:
        from cggp_tpu.config import default_config

        jitter = default_config().jitter
    x = np.asarray(data[0])
    n, dim = x.shape[0], x.shape[-1]
    if num_inducing_points is None:
        num_inducing_points = int(n * 0.1)
    rng = np.random.RandomState(seed)
    rand_indices = rng.choice(n, size=num_inducing_points, replace=False)
    iv = x[rand_indices]

    kernel, kernel_init = kernel_fn(dim)
    noise_variance = 0.1

    if model_name == "cdgp":
        model = CGGP(
            kernel=kernel,
            conjugate_gradient=ConjugateGradient(
                error_threshold, max_iterations=max_cg_iterations, dot=dot,
                relative_threshold=relative_threshold,
            ),
            num_data=n,
            **model_kwargs,
        )
        params = model.init_params(
            iv, noise_variance=noise_variance, dtype=dtype, **kernel_init
        )
    elif model_name == "cdgp-implicit":
        from cggp_tpu.models import ImplicitCGGP

        if dot != "standard":
            raise ValueError(
                "cdgp-implicit's blocked matvec accumulates in HIGHEST "
                "precision already; the compensated-dot option applies to "
                "the dense solver only"
            )
        model = ImplicitCGGP(
            kernel=kernel,
            num_data=n,
            error_threshold=error_threshold,
            max_cg_iterations=max_cg_iterations or 100,
            relative_threshold=relative_threshold,
            **model_kwargs,
        )
        params = model.init_params(
            iv, noise_variance=noise_variance, dtype=dtype, **kernel_init
        )
    elif model_name == "clustergp":
        model = ClusterGP(kernel=kernel, num_data=n, **model_kwargs)
        params = model.init_params(
            iv, noise_variance=noise_variance, dtype=dtype, **kernel_init
        )
    elif model_name == "lpsvgp":
        model = LpSVGP(kernel=kernel, num_data=n, **model_kwargs)
        params = model.init_params(
            iv, noise_variance=noise_variance, dtype=dtype, **kernel_init
        )
    elif model_name == "sgpr":
        model = SGPR(kernel=kernel, jitter=jitter, **model_kwargs)
        params = model.init_params(
            iv, noise_variance=noise_variance, dtype=dtype, **kernel_init
        )
    elif model_name == "gpr":
        # Data-bound exact-GP serving (net-new): lets the predict driver
        # dump mu/var from a `gpr` config dir; num_inducing_points ignored.
        # positive_minimum must match the TRAINING bijector (info.json
        # records it) — a different lower bound re-transforms every
        # unconstrained leaf to shifted values on assignment.
        return create_gpr_model(
            data, kernel_fn, dtype=dtype,
            positive_minimum=model_kwargs.get("positive_minimum"))
    elif model_name == "gpr-iter":
        return create_itergpr_model(
            data, kernel_fn, dtype=dtype, cg_threshold=error_threshold,
            positive_minimum=model_kwargs.get("positive_minimum"),
            **{k: v for k, v in model_kwargs.items()
               if k in ("num_probes", "block")},
        )
    else:
        raise ValueError(f"Unknown model {model_name!r}")
    return model, params


def create_gpr_model(
    train_data: Tuple[Array, Array],
    kernel_fn: Callable,
    dtype=None,
    positive_minimum: Optional[float] = None,
) -> Tuple[GPR, Dict]:
    """GPR factory (reference cli_utils.py:171-184 — which ignores its kernel
    argument, SURVEY.md known-bugs 4; ours honours it).

    ``positive_minimum`` is the reference's global
    ``set_default_positive_minimum`` (paper_cli_gpr.py:55) made explicit: the
    lower bound of the positive bijectors on kernel + likelihood params.
    ``None`` resolves from :func:`cggp_tpu.config.default_config` (0.0 there
    means "keep each component's own default").
    """
    import dataclasses as _dc

    if positive_minimum is None:
        from cggp_tpu.config import default_config

        pm = default_config().positive_minimum
        positive_minimum = pm if pm > 0.0 else None

    from cggp_tpu.models.base import GaussianLikelihood

    dim = np.asarray(train_data[0]).shape[-1]
    kernel, kernel_init = kernel_fn(dim)
    if positive_minimum is not None:
        kernel = _dc.replace(kernel, positive_lower=positive_minimum)
        model = GPR(kernel=kernel,
                    likelihood=GaussianLikelihood(positive_lower=positive_minimum))
    else:
        model = GPR(kernel=kernel)
    params = model.init_params(
        input_dim=dim, noise_variance=0.1, dtype=dtype, **kernel_init
    )
    return model, params


def create_itergpr_model(
    train_data: Tuple[Array, Array],
    kernel_fn: Callable,
    dtype=None,
    positive_minimum: Optional[float] = None,
    num_probes: int = 8,
    cg_threshold: float = 1e-8,
    block: int = 4096,
):
    """Matrix-free CG exact-GPR factory (net-new twin of
    :func:`create_gpr_model` — same parameter pytree / config-dir contract,
    but the [N, N] system is never materialised, lifting the reference's
    10k-row GPR cap, paper_cli_gpr.py:60-66)."""
    import dataclasses as _dc

    from cggp_tpu.models import IterGPR
    from cggp_tpu.models.base import GaussianLikelihood

    if positive_minimum is None:
        from cggp_tpu.config import default_config

        pm = default_config().positive_minimum
        positive_minimum = pm if pm > 0.0 else None

    dim = np.asarray(train_data[0]).shape[-1]
    n = int(np.asarray(train_data[0]).shape[0])
    kernel, kernel_init = kernel_fn(dim)
    kw = dict(
        error_threshold=cg_threshold, relative_threshold=True,
        max_cg_iterations=min(n, 1000), num_probes=num_probes,
        logdet_variant="slq", precondition="pivchol",
        precond_rank=min(128, max(8, n // 8)), block=block,
    )
    if positive_minimum is not None:
        kernel = _dc.replace(kernel, positive_lower=positive_minimum)
        model = IterGPR(
            kernel=kernel,
            likelihood=GaussianLikelihood(positive_lower=positive_minimum),
            **kw,
        )
    else:
        model = IterGPR(kernel=kernel, **kw)
    params = model.init_params(
        input_dim=dim, noise_variance=0.1, dtype=dtype, **kernel_init
    )
    return model, params


# ---------------------------------------------------------------------------
# Update-fn factories (reference cli_utils.py:187-360)
# ---------------------------------------------------------------------------


def _apply_selection(model, params: Dict, iv, means, counts) -> Dict:
    """The reference's per-model assign block (cli_utils.py:396-406)."""
    if isinstance(model, ClusterGP):  # covers CGGP subclass
        return model.assign_clusters(params, iv, means, counts)
    new = dict(params)
    new["inducing_points"] = jnp.asarray(iv, dtype=params["inducing_points"].dtype)
    return new


def _distance_fn(model, params: Dict, distance_type: str):
    if distance_type == "euclidean":
        return None  # fast path in kmeans/covertree
    return create_distance_fn(model.kernel, params["kernel"], distance_type)


def create_update_fn(
    clustering_type: str,
    model,
    data: Tuple[Array, Array],
    distance_type: str = "euclidean",
    seed: int = 0,
    **clustering_kwargs,
) -> Callable[[Dict], Dict]:
    """String-dispatched factory (reference cli_utils.py:328-360).

    Returns ``update_fn(params) -> params``.  Selection strategies that
    depend on kernel hyperparameters (oips, greedy, kernel-induced
    distances) read them from the *current* params at call time.
    """
    x, _y = data
    key = jax.random.PRNGKey(seed)

    if clustering_type == "kmeans":
        max_points = int(clustering_kwargs["max_points"])

        def update_fn(params: Dict) -> Dict:
            dist = _distance_fn(model, params, distance_type)
            iv_init = params["inducing_points"]
            if "inducing_mask" in params:
                # Sharded model: drop the mesh-divisibility pads (placed at
                # 1e6 coords) — warm-starting Lloyd's from pad rows would
                # either poison the centroids or miss the count check below
                # and silently discard the warm start entirely.
                real = np.asarray(params["inducing_mask"])[:, 0] > 0.5
                iv_init = iv_init[real]
            if iv_init.shape[0] != max_points:
                idx = np.random.RandomState(seed).choice(
                    x.shape[0], max_points, replace=False
                )
                iv_init = x[idx]
            clustering = lambda: kmeans_lloyd(
                x, max_points, initial_centroids=iv_init, distance_fn=dist
            )[0]
            iv, means, counts = kmeans_update_inducing_parameters(
                data, clustering, distance_fn=dist
            )
            return _apply_selection(model, params, iv, means, counts)

    elif clustering_type == "kmeans2":
        from scipy.cluster.vq import kmeans2 as scipy_kmeans2

        max_points = int(clustering_kwargs["max_points"])

        def update_fn(params: Dict) -> Dict:
            dist = _distance_fn(model, params, distance_type)
            clustering = lambda: jnp.asarray(
                scipy_kmeans2(np.asarray(x), max_points, minit="++", seed=seed)[0],
                dtype=x.dtype,
            )
            iv, means, counts = kmeans_update_inducing_parameters(
                data, clustering, distance_fn=dist
            )
            return _apply_selection(model, params, iv, means, counts)

    elif clustering_type == "covertree":
        spatial_resolution = float(clustering_kwargs["spatial_resolution"])

        def update_fn(params: Dict) -> Dict:
            dist = _distance_fn(model, params, distance_type)
            iv, means, counts = covertree_update_inducing_parameters(
                data, spatial_resolution, distance_fn=dist
            )
            return _apply_selection(model, params, iv, means, counts)

    elif clustering_type == "covernet":
        spatial_resolution = float(clustering_kwargs["spatial_resolution"])
        covernet_kwargs = {
            k: clustering_kwargs[k]
            for k in ("max_points", "lloyds", "block_size")
            if clustering_kwargs.get(k) is not None
        }
        if distance_type != "euclidean":
            # Kernel metrics: Lloyd's mean-shift is euclidean geometry.
            # An explicit --lloyds N would be silently dropped — refuse
            # (same contract as the library fn's ValueError).
            if clustering_kwargs.get("lloyds"):
                raise ValueError(
                    "covernet Lloyd's refinement is euclidean-only; drop "
                    f"--lloyds with -d {distance_type}"
                )
            covernet_kwargs["lloyds"] = 0

        def update_fn(params: Dict) -> Dict:
            # Unlike the cover tree (which ignores non-euclidean distances,
            # reference covertree.py:36-47), the net honours the kernel
            # metric — re-selection reads the CURRENT hyperparameters, so
            # in-training updates adapt the separation to them.
            kernel_kwargs = (
                {} if distance_type == "euclidean"
                else {"kernel": model.kernel, "kernel_params": params["kernel"]}
            )
            iv, means, counts = covernet_update_inducing_parameters(
                data, spatial_resolution, distance_type=distance_type,
                **kernel_kwargs, **covernet_kwargs,
            )
            return _apply_selection(model, params, iv, means, counts)

    elif clustering_type == "oips":
        rho = float(clustering_kwargs["rho"])
        max_points = clustering_kwargs.get("max_points") or x.shape[0]

        def update_fn(params: Dict) -> Dict:
            dist = _distance_fn(model, params, distance_type)
            iv, _idx = oips(model.kernel, params["kernel"], x, rho, int(max_points))
            iv, means, counts = labels_update_inducing_parameters(
                data, iv, distance_fn=dist
            )
            return _apply_selection(model, params, iv, means, counts)

    elif clustering_type == "uniform":
        max_points = int(clustering_kwargs["max_points"])
        if max_points > x.shape[0]:
            raise ValueError("Max points cannot be larger than the dataset size")

        def update_fn(params: Dict) -> Dict:
            dist = _distance_fn(model, params, distance_type)
            iv, _idx = uniform(x, max_points, key)
            iv, means, counts = labels_update_inducing_parameters(
                data, iv, distance_fn=dist
            )
            return _apply_selection(model, params, iv, means, counts)

    elif clustering_type == "greedy":
        max_points = int(clustering_kwargs["max_points"])

        def update_fn(params: Dict) -> Dict:
            dist = _distance_fn(model, params, distance_type)
            iv, _idx = greedy_selection(
                model.kernel, params["kernel"], x, max_points, key
            )
            iv, means, counts = labels_update_inducing_parameters(
                data, iv, distance_fn=dist
            )
            return _apply_selection(model, params, iv, means, counts)

    else:
        raise ValueError(f"Unknown clustering type {clustering_type!r}")

    return update_fn


def create_model_and_update_fn(
    model_name: str,
    train_data: Tuple[Array, Array],
    clustering_type: str,
    distance_type: str = "euclidean",
    error_threshold: float = 1e-6,
    dtype=None,
    seed: int = 0,
    dot: str = "standard",
    jitter: Optional[float] = None,
    relative_threshold: bool = False,
    model_kwargs: Optional[Dict] = None,
    clustering_kwargs: Optional[Dict] = None,
    kernel_fn: Optional[Callable] = None,
):
    """Build ``(model, params, update_fn)`` (reference cli_utils.py:371-414).

    ``kernel_fn`` defaults to Matern32 (the reference's fixed choice); the
    geospatial driver threads its ``-k`` option here.
    """
    model_kwargs = model_kwargs or {}
    clustering_kwargs = clustering_kwargs or {}
    if kernel_fn is None:
        kernel_fn = default_kernel_fn
    if model_name not in ("cdgp", "cdgp-implicit"):
        # CG-solver knobs only apply to the CG-powered models.
        model_kwargs = {
            k: v for k, v in model_kwargs.items()
            if k not in ("num_probes", "logdet_variant", "precondition",
                         "precond_rank", "block")
        }
    else:
        # One model_kwargs dict may sweep BOTH CG legs (cdgp vs
        # cdgp-implicit): strip keys that are fields of the other CG model
        # only (e.g. the implicit row-solver's `block`/`use_pallas` on the
        # dense leg).  Typos still raise: anything that is a field of
        # neither class reaches the constructor unchanged.
        import dataclasses as _dc

        from cggp_tpu.models import ImplicitCGGP as _Implicit

        target = _Implicit if model_name == "cdgp-implicit" else CGGP
        other = CGGP if model_name == "cdgp-implicit" else _Implicit
        only_other = (
            {f.name for f in _dc.fields(other)}
            - {f.name for f in _dc.fields(target)}
        )
        # ...but never strip create_model's own named parameters (e.g.
        # max_cg_iterations is an ImplicitCGGP field AND a named param that
        # configures the dense model's ConjugateGradient).
        import inspect as _inspect

        only_other -= set(_inspect.signature(create_model).parameters)
        model_kwargs = {
            k: v for k, v in model_kwargs.items() if k not in only_other
        }
    model, params = create_model(
        model_name,
        kernel_fn,
        train_data,
        error_threshold=error_threshold,
        dtype=dtype,
        seed=seed,
        dot=dot if model_name == "cdgp" else "standard",  # implicit: HIGHEST-only
        jitter=jitter,
        relative_threshold=relative_threshold,
        **model_kwargs,
    )
    update_fn = create_update_fn(
        clustering_type,
        model,
        train_data,
        distance_type=distance_type,
        seed=seed,
        **clustering_kwargs,
    )
    return model, params, update_fn


# ---------------------------------------------------------------------------
# Prediction helpers (reference cli_utils.py:455-476)
# ---------------------------------------------------------------------------


def dump_posterior_arrays(model, params, train_data, x, batch_size: int,
                          mean_only: bool = False,
                          posterior_solver: str = "auto", mesh=None,
                          posterior=None, chunk_iterations: int = 0):
    """Posterior (mean, var) over ``x`` as numpy, on the fastest serving path.

    Routes through ``predict_in_batches``, so every model family serves
    from its posterior cache (built once per params, not per batch —
    docs/PERF.md round-2 table): CGGP/ClusterGP/LpSVGP params-only,
    GPR/SGPR with the training set bound in.  ``mean_only`` serves the
    solve-free cached mean.  Replaces the per-batch
    ``batch_posterior_computation`` shape (reference cli_utils.py:462-476)
    at the CLI dump sites.
    """
    import inspect

    from cggp_tpu.training.optimize import predict_in_batches

    needs_data = "data" in inspect.signature(model.predict_f).parameters
    mean, var = predict_in_batches(
        model, params, x, batch_size=batch_size,
        train_data=train_data if needs_data else None,
        mean_only=mean_only, posterior_solver=posterior_solver, mesh=mesh,
        posterior=posterior, chunk_iterations=chunk_iterations,
    )
    return np.asarray(mean), None if var is None else np.asarray(var)


def covariance_properties(model, params: Dict, jitter: float,
                          method: str = "auto") -> Dict:
    """condition_number / eig_min / eig_max of ``Kuu + jitter I``
    (reference paper_cli_uci.py:174-185).

    ``method``: "exact" = dense eigvalsh (the reference's O(M^3) route);
    "lanczos" = extremal Ritz values (O(iters * M^2), for large M);
    "auto" switches to lanczos above M = 4096.
    """
    z = params["inducing_points"]
    m = z.shape[0]
    if hasattr(model, "_matvec") and "inducing_mask" in params:
        # Row-solver family (cdgp-implicit / sharded): NEVER materialise
        # [M, M] — matrix-free Lanczos through the model's masked matvec
        # (lam = jitter restores the reference's Kuu + jitter I operand;
        # the masked start vector keeps the estimate on the real submatrix).
        import jax

        from cggp_tpu.ops.logdet import lanczos_extremal_eigs_rows

        kp = params["kernel"]
        mask = params["inducing_mask"][:, 0]
        lam = jnp.full((m,), jitter, dtype=z.dtype)
        lo, hi = lanczos_extremal_eigs_rows(
            lambda rows: model._matvec(kp, z, lam, mask, rows),
            jax.random.PRNGKey(0), m, z.dtype,
            num_iters=min(96, m), mask=mask,
        )
        eig_min, eig_max = float(lo), float(hi)
        return dict(
            condition_number=eig_max / eig_min, eig_min=eig_min,
            eig_max=eig_max, estimator="lanczos",
            condition_method="lanczos",
            eig_min_is_upper_bound=True,
        )
    kuu = model.kernel.K(params["kernel"], z)
    kuu = kuu + jitter * jnp.eye(m, dtype=z.dtype)
    if method == "auto":
        method = "exact" if m <= 4096 else "lanczos"
    if method == "lanczos":
        import jax

        from cggp_tpu.ops.logdet import lanczos_extremal_eigs

        lo, hi = lanczos_extremal_eigs(kuu, jax.random.PRNGKey(0),
                                       num_iters=min(96, m))
        eig_min, eig_max = float(lo), float(hi)
        estimator = "lanczos"
    else:
        eigvals = np.asarray(jnp.linalg.eigvalsh(kuu))
        eig_min, eig_max = float(eigvals.min()), float(eigvals.max())
        estimator = "eigvalsh"
    return dict(
        condition_number=eig_max / eig_min, eig_min=eig_min, eig_max=eig_max,
        # Which estimator actually produced the numbers, so sweep CSVs mixing
        # sizes stay unambiguous (the reference computes dense-only,
        # paper_cli_uci.py:174-185).  Lanczos Ritz values converge from the
        # interior: eig_min is an OVER-estimate (condition_number optimistic)
        # — do not compare lanczos rows against eigvalsh rows directly.
        # ``estimator`` ({eigvalsh, lanczos}) is the canonical provenance
        # field; ``condition_method`` keeps the legacy {exact, lanczos}
        # vocabulary so CSVs accumulated across rounds stay comparable
        # (changing its values would make uci-csv's mixed-estimator check
        # flag old-vs-new rows of the SAME dense estimator).
        condition_method=method,
        estimator=estimator,
        eig_min_is_upper_bound=(estimator == "lanczos"),
    )
