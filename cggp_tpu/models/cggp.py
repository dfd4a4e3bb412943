"""CGGP (CLI name "cdgp") — ClusterGP with every Cholesky replaced by CG.

Reference models.py:279-354: the injected :class:`ConjugateGradient` solves
``(Kmm + Lambda)^{-1} u``, ``(Kmm + Lambda)^{-1} Kmn`` and the probe systems;
the trace term uses Rademacher probes
``sum (K^{-1} p) . (Kmm p) / P`` (models.py:307-314, default 5 probes) and the
log-det goes through :func:`eval_logdet` (gradient-only) or, as the TPU-build
upgrade, :func:`slq_logdet` (true values, same gradient path).  ``Kuu`` is
built with jitter = 0 (models.py:300, :333) — conditioning comes from Lambda.

TPU note: all CG right-hand sides of the KL (pseudo-u and the P probes) are
batched into a single [P+1, M] row-block solve, so every CG iteration is one
MXU matmul instead of two separate solver launches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.models.base import GaussianLikelihood, minibatch_scale
from cggp_tpu.models.clustergp import ClusterGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Kernel
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.ops.logdet import (
    eval_logdet,
    eval_logdet_from_solves,
    lanczos_extremal_eigs,
    rademacher,
    slq_logdet,
)

Array = jnp.ndarray

# precondition="auto" cutoff: largest M where the exact-factor build is
# worth it per the chip measurements (scripts/chol_frontier.py, 1e-5
# relative, batch 2048: chol beats pivchol-256 end-to-end 6.9x at M=989,
# 4.7x at M=3475, 4.9x at M=6886 at equal held-out metrics — docs/PERF.md
# round-3-late table).  Capped at 8192 because the O(M^3) build keeps
# growing, the factor doubles the model's [M, M] HBM footprint, and
# M=16384 triangular-solve programs have crashed the remote compiler
# before (the serving-"auto" fallback exists for exactly that); past this
# M the dense model is near its matrix-free crossover anyway.
_CHOL_AUTO_MAX_M = 8192


@functools.lru_cache(maxsize=64)
def _jitted_extremal_eigs(model):
    """Per-model cached jitted (eig_min, eig_max) estimator for the serving
    resolver (models are frozen, hashable dataclasses, so the compiled
    program is reused across predict_in_batches calls — the Lanczos scan is
    traced once and the transient [M, M] Gram is freed at program exit)."""

    def estimate(params):
        # Masked system on capacity-padded params: pad eigenvalues are
        # exactly their Lambda (= noise/1), inside the real spectrum's span,
        # so the kappa estimate matches the real submatrix's.
        kmm = model._masked_kmm(
            params["kernel"], params["inducing_points"], model._mask_of(params)
        )
        kmm_lambda = add_diagonal(kmm, model.diag_variance(params)[:, 0])
        return lanczos_extremal_eigs(
            jax.lax.stop_gradient(kmm_lambda), jax.random.PRNGKey(0),
            num_iters=min(64, kmm_lambda.shape[-1]),
        )

    return jax.jit(estimate)


@dataclasses.dataclass(frozen=True)
class CGGP(ClusterGP):
    """CG-powered ClusterGP.  ``conjugate_gradient`` is the pluggable solver
    strategy (the reference's one deliberate dependency inversion,
    models.py:285-290)."""

    conjugate_gradient: ConjugateGradient = None  # type: ignore[assignment]
    num_probes: Optional[int] = 5
    logdet_variant: str = "zero"  # "zero" (reference semantics) | "slq"
    slq_lanczos_iters: int = 25
    fuse_kl_solves: bool = True
    # Rank of the opt-in posterior(solver="lanczos") LOVE serving cache —
    # same contract as the matrix-free family's
    # (models/rowcg.py RowSolveCGGP.serving_lanczos_rank).
    serving_lanczos_rank: int = 128
    # Per-step low-rank preconditioning of the fused solve (net-new):
    # rebuilt from the CURRENT hyperparameters each elbo call, it tracks
    # training instead of going stale like a fixed preconditioner.
    #   "rff"     — random Fourier sketch of Kuu (a few skinny matmuls)
    #   "pivchol" — greedy pivoted Cholesky of Kuu (targets the actual top
    #               eigenspace; the preferred fp32 choice — both now apply
    #               through the cancellation-free SPD SpectralPreconditioner)
    #   "chol"    — the exact blocked factor: PCG becomes iterative
    #               refinement (1-3 iterations; ~6.5x end-to-end at M~1k)
    #   "auto"    — resolved by conditioning + size: eager callers go
    #               through resolve_precondition (Lanczos kappa estimate,
    #               size cap as compiler/HBM guard); inside jit only the
    #               size rule can apply (chol while M <= _CHOL_AUTO_MAX_M)
    precondition: Optional[str] = None  # None|"rff"|"pivchol"|"chol"|"auto"
    precond_rank: int = 128  # factor rank (for "rff": Fourier bases L, rank = 2L)

    def __post_init__(self):
        if self.conjugate_gradient is None:
            raise ValueError("CGGP requires a ConjugateGradient instance")

    # -- capacity padding / masking (net-new) --------------------------------
    #
    # ``init_params(capacity=C)`` pins the inducing dimension to a fixed C
    # with pad_inducing-convention pads + an ``inducing_mask`` param, the
    # same contract as the masked row-solve family (models/rowcg.py): pads
    # are EXACT no-ops in every objective (masked kernel coupling, masked
    # probes, masked KL constant), so re-clustering swaps buffer contents
    # without changing shapes — host updates stop recompiling the training
    # program, and ``assign_clusters_device`` composes into a jitted chunk
    # (make_adam_multi_step(recluster_fn=...)).  Params without the mask key
    # behave exactly as before.

    @staticmethod
    def _mask_of(params: Dict):
        mask = params.get("inducing_mask")
        return None if mask is None else jax.lax.stop_gradient(mask)[:, 0]

    def _masked_kmm(self, kp, z, mask):
        """``K(Z, Z)`` with pad rows/cols zeroed (incl. the pad diagonal —
        the pad block of ``Kmm + Lambda`` is then exactly ``diag(Lambda)``,
        decoupled at ANY lengthscale, not just by far-coordinate underflow)."""
        kmm = self.kernel.K(kp, z)  # jitter = 0 (models.py:300, :333)
        if mask is None:
            return kmm
        return kmm * (mask[:, None] * mask[None, :])

    def _masked_kmn(self, kp, z, x, mask):
        kmn = self.kernel.K(kp, z, x)
        return kmn if mask is None else kmn * mask[:, None]

    def _pad_multiple_for(self, m: int) -> int:
        return 1  # dense model: any capacity works (no panel/mesh constraint)

    def init_params(self, inducing_points, pseudo_u=None, cluster_counts=None,
                    capacity: Optional[int] = None, **kwargs) -> Dict:
        params = super().init_params(
            inducing_points, pseudo_u=pseudo_u, cluster_counts=cluster_counts,
            **kwargs,
        )
        if capacity is None:
            return params  # unpadded: identical to the pre-capacity model
        from cggp_tpu.ops.cg_implicit import pad_inducing

        m_real = params["inducing_points"].shape[0]
        dtype = params["inducing_points"].dtype
        capacity = int(capacity)
        if capacity < m_real:
            raise ValueError(f"capacity {capacity} < real inducing count {m_real}")
        z, _lam, u_t, counts_t, mask_t = pad_inducing(
            params["inducing_points"],
            jnp.ones(m_real, dtype),
            capacity,  # pad_inducing pads to a multiple; m <= C makes it C
            params["pseudo_u"].T,
            params["cluster_counts"].T,
            jnp.ones((1, m_real), dtype),
        )
        params["inducing_points"] = z
        params["pseudo_u"] = u_t.T
        counts = counts_t.T
        params["cluster_counts"] = jnp.where(counts == 0.0, 1.0, counts)
        params["inducing_mask"] = mask_t.T
        return params

    def assign_clusters(self, params: Dict, iv, means, counts) -> Dict:
        """Host re-clustering assign; on capacity-padded params the new
        selection is RE-PADDED to the same capacity (the mask would
        otherwise go stale against a shape-changed Z)."""
        if "inducing_mask" not in params:
            return super().assign_clusters(params, iv, means, counts)
        capacity = params["inducing_points"].shape[0]
        from cggp_tpu.ops.cg_implicit import pad_inducing

        dtype = params["inducing_points"].dtype
        iv = jnp.asarray(iv, dtype)
        if iv.shape[0] > capacity:
            raise ValueError(
                f"re-clustered M={iv.shape[0]} exceeds the pinned capacity "
                f"{capacity}; raise capacity at init_params or coarsen the "
                "selection"
            )
        z, _lam, u_t, counts_t, mask_t = pad_inducing(
            iv, jnp.ones(iv.shape[0], dtype), capacity,
            jnp.asarray(means, dtype).T, jnp.asarray(counts, dtype).T,
            jnp.ones((1, iv.shape[0]), dtype),
        )
        counts_p = counts_t.T
        return self.assign_clusters_device(
            params, z, u_t.T, jnp.where(counts_p == 0.0, 1.0, counts_p),
            mask_t.T,
        )

    def assign_clusters_device(self, params: Dict, z, u, counts, mask) -> Dict:
        """Fixed-capacity re-clustering swap — jit-composable (pure dict
        update, no shape change); arguments come from
        ``selection.covernet.covernet_update_padded``."""
        if "inducing_mask" not in params:
            raise ValueError(
                "assign_clusters_device needs capacity-padded params — "
                "build them with init_params(capacity=...)"
            )
        if z.shape != params["inducing_points"].shape:
            raise ValueError(
                f"capacity mismatch: new Z {z.shape} vs params "
                f"{params['inducing_points'].shape}"
            )
        new = dict(params)
        new["inducing_points"] = z
        new["pseudo_u"] = jnp.asarray(u, z.dtype)
        new["cluster_counts"] = jnp.asarray(counts, z.dtype)
        new["inducing_mask"] = jnp.asarray(mask, z.dtype)
        return new

    def trainable_mask(self, params: Dict, *args, **kwargs) -> Dict:
        mask = super().trainable_mask(params, *args, **kwargs)
        if "inducing_mask" in mask:
            mask["inducing_mask"] = False
        return mask

    def _build_preconditioner(self, kp, z, kmm, var, key):
        """Per-step solver-state preconditioner (None when disabled); shared
        by the fused ELBO and cg_stats so observability matches training."""
        if self.precondition is None:
            return None
        sg = jax.lax.stop_gradient
        mode = self.precondition
        if mode == "auto":
            # M is static at trace time, so this resolves to ONE compiled
            # branch: the exact factor while the O(M^3) build stays cheap
            # (chip-measured 4.7-6.9x end-to-end across M=989-6886 —
            # docs/PERF.md round-3 chol section), the low-rank pivchol
            # beyond the cutoff.
            mode = "chol" if z.shape[0] <= _CHOL_AUTO_MAX_M else "pivchol"
        if mode == "rff":
            from cggp_tpu.ops.rff import rff_preconditioner

            return rff_preconditioner(
                self.kernel, sg(kp), sg(z), sg(var[:, 0]),
                self.precond_rank, key,
            )
        if mode == "pivchol":
            from cggp_tpu.ops.cg import pivoted_cholesky_preconditioner

            return pivoted_cholesky_preconditioner(
                sg(kmm), sg(var[:, 0]), self.precond_rank
            )
        if mode == "chol":
            from cggp_tpu.ops.cg import CholPreconditioner

            # Exact-factor iterative refinement: the blocked Cholesky build
            # is CHEAPER than the pivchol rank loop at M <~ 2k on TPU
            # (1.55 vs 2.53 ms at M=989 — scripts/chol_precond_probe.py)
            # and collapses the fused training solve to 1-3 refinement
            # iterations (6.5x+ end-to-end steps/s at the bench workload);
            # a non-finite factor falls back to plain CG inside the state.
            return CholPreconditioner(sg(kmm), sg(var[:, 0]))
        raise ValueError(f"unknown precondition mode: {self.precondition!r}")

    def resolve_precondition(self, params: Dict) -> Optional[str]:
        """Resolve training-side ``precondition="auto"`` to a concrete
        ``"chol"``/``"pivchol"`` choice EAGERLY (outside jit), from the same
        Lanczos conditioning estimate the serving resolver uses
        (:meth:`resolve_serving_solver`) — not size alone.  The size cap
        stays, but only as the compiler-crash / HBM guard it was measured
        for (an M=16384 triangular-solve program has crashed the remote
        compiler; benchmarks/serving_results.csv): below the cap, an
        ill-conditioned system now routes to pivchol (whose SPD low-rank
        apply is safe at any kappa) instead of auto-picking the exact
        factor on size alone (round-3 verdict, weak #3).

        Training callers (cli/train.py) call this once after params are
        built and rebuild the model with the concrete mode via
        ``dataclasses.replace``; inside jit the traced ``"auto"`` branch
        still resolves by the size rule (no data-dependent static choice
        exists there).
        """
        if self.precondition != "auto":
            return self.precondition
        m = params["inducing_points"].shape[0]
        if m > _CHOL_AUTO_MAX_M:
            return "pivchol"
        from cggp_tpu.models.base import chol_or_cg_from_eigs

        eig_min, eig_max = _jitted_extremal_eigs(self)(params)
        choice = chol_or_cg_from_eigs(
            eig_min, eig_max, params["inducing_points"].dtype
        )
        return "chol" if choice == "chol" else "pivchol"

    def precond_state(self, params: Dict, key: Optional[jax.Array] = None):
        """Build the solver-state pytree for ``elbo(precond_override=...)``.

        Chunk-frozen preconditioning (net-new): the per-step pivchol/rff
        build (~4 ms at M~1k, ~15% of a fused training step) moves to once
        per K-step dispatch, built from the chunk's entry params.  Safety
        caveat: the CG stop rule tests the TRUE residual (``0.5||r||^2``,
        reference conjugate_gradient.py:59-62), so CONVERGED solves are
        identical either way — but the stale factor's extra iterations can
        push solves into ``max_iterations`` where returned solutions DO
        degrade (``converged=False``, monitor warns).  Measured on-chip:
        early-training hyperparameter drift (~40% per 25 steps) inflates
        iterations enough to make chunk mode a net LOSS from scratch
        (docs/PERF.md "chunk-frozen preconditioning") — reserve it for
        low-drift regimes and keep iteration-budget headroom.
        Returns ``()`` (identity) when ``precondition`` is None — the
        pytree shape stays static either way.
        """
        kp = params["kernel"]
        z = params["inducing_points"]
        var = self.diag_variance(params)
        # Masked system on capacity-padded params: unmasked Kmm would let
        # pivchol burn its rank on pad pivots (full K_diag at far coords)
        # and rff sketch garbage pad rows — same reason rowcg.precond_state
        # masks (rowcg.py:137-163).
        kmm = self._masked_kmm(
            jax.lax.stop_gradient(kp), jax.lax.stop_gradient(z),
            self._mask_of(params),
        )
        precond = self._build_preconditioner(
            kp, z, kmm, var,
            key if key is not None else jax.random.PRNGKey(0),
        )
        return () if precond is None else precond.state

    def prior_kl(self, params: Dict, key: jax.Array) -> Array:
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        m = z.shape[0]
        dtype = z.dtype
        mask = self._mask_of(params)
        if mask is not None and self.num_probes is None:
            raise ValueError(
                "capacity-padded CGGP requires num_probes (the "
                "identity-solve trace/logdet path cannot mask pad rows)"
            )

        kmm = self._masked_kmm(kp, z, mask)
        kmm_lambda = add_diagonal(kmm, var[:, 0])

        cg = self.conjugate_gradient
        # One up-front split: trace probes, logdet probes, preconditioner
        # sketch — no key is consumed twice.
        key_probes, key_logdet, key_pre = jax.random.split(key, 3)
        # Same per-step preconditioner as the fused ELBO / predict paths:
        # an unpreconditioned KL solve would silently stall in exactly the
        # ill-conditioned fp32 regime `precondition` exists for.
        precond = self._build_preconditioner(kp, z, kmm, var, key_pre)

        if self.num_probes is None:
            kmm_lambda_inv_u = cg(kmm_lambda, u, preconditioner=precond)
            kmm_lambda_inv_kmm = cg(kmm_lambda, kmm, preconditioner=precond)
            trace = jnp.trace(kmm_lambda_inv_kmm)
            logdet_probes = None
        else:
            probes = rademacher(key_probes, (m, self.num_probes), dtype)
            if mask is not None:
                probes = probes * mask[:, None]
            if self.fuse_kl_solves:
                # One batched solve for [u | probes] (u may be multi-output).
                rhs = jnp.concatenate([u, probes], axis=-1)
                solved = cg(kmm_lambda, rhs, preconditioner=precond)
                kmm_lambda_inv_u = solved[:, : u.shape[-1]]
                kmm_lambda_inv_probes = solved[:, u.shape[-1] :]
            else:
                kmm_lambda_inv_u = cg(kmm_lambda, u, preconditioner=precond)
                kmm_lambda_inv_probes = cg(kmm_lambda, probes, preconditioner=precond)
            kmm_probes = kmm @ probes
            trace = jnp.sum(kmm_lambda_inv_probes * kmm_probes) / jnp.asarray(
                self.num_probes, dtype=dtype
            )
            logdet_probes = self.num_probes

        quad = jnp.sum((kmm @ kmm_lambda_inv_u) * kmm_lambda_inv_u)

        if self.logdet_variant == "slq":
            logdet = slq_logdet(
                kmm_lambda, cg,
                num_probes=logdet_probes or 8,
                key=key_logdet,
                lanczos_iters=self.slq_lanczos_iters,
                preconditioner=precond,
                mask=mask,
            )
        else:
            logdet = eval_logdet(kmm_lambda, cg, num_probes=logdet_probes,
                                 key=key_logdet, preconditioner=precond,
                                 mask=mask)

        log_var = jnp.log(var)
        const = jnp.sum(log_var if mask is None else log_var * mask[:, None])
        return 0.5 * (quad - trace + logdet - const)

    def predict_f(self, params: Dict, x_new: Array, full_cov: bool = False) -> Tuple[Array, Array]:
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        mask = self._mask_of(params)

        kmm = self._masked_kmm(kp, z, mask)  # jitter = 0 (models.py:333)
        kmn = self._masked_kmn(kp, z, x_new, mask)  # [M, T]
        kmm_lambda = add_diagonal(kmm, var[:, 0])

        cg = self.conjugate_gradient
        # Batch [u | Kmn] into a single row-block CG solve (reference runs two
        # solves, models.py:339-340; one fused solve keeps the MXU fed).
        # The serving path gets the same per-call preconditioner as training.
        # NOTE: the factor depends only on (kp, z, var) and is rebuilt per
        # call — measured ~9% of batched-serving time at reference scale
        # (the async pipeline hides most of it); hoist if it ever dominates.
        precond = self._build_preconditioner(kp, z, kmm, var, jax.random.PRNGKey(0))
        rhs = jnp.concatenate([u, kmn], axis=-1)
        solved = cg(kmm_lambda, rhs, preconditioner=precond)
        # Slice by u's width: multi-output pseudo_u [M, P>1] contributes P
        # columns to the fused block (a fixed :1 slice silently misaligned
        # every downstream column at P>1 — round-4 multi-output support).
        p_out = u.shape[-1]
        kmm_lambda_inv_u = solved[:, :p_out]
        kmm_lambda_inv_kmn = solved[:, p_out:]

        if full_cov:
            knn = self.kernel.K(kp, x_new)
            fvar = (knn - kmn.T @ kmm_lambda_inv_kmn)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            fvar = (knn - jnp.sum(kmn * kmm_lambda_inv_kmn, axis=0))[:, None]

        fmu = kmn.T @ kmm_lambda_inv_u
        return fmu, fvar

    # -- cached serving (net-new; the reference's predict_mu_var recomputes
    # the u-solve and preconditioner for every batch, models.py:333-345) ----

    def posterior(self, params: Dict, key: Optional[jax.Array] = None,
                  solver: str = "auto") -> "CGGPPosterior":
        """Precompute everything that depends only on ``params`` for
        repeated predictions: ``nu = (Kmm + Lambda)^{-1} u``, the [M, M]
        system matrix, and the solver state.  After this, the posterior
        MEAN is a single ``Kmn^T nu`` matmul (no CG at all), and
        mean+variance needs only the ``Kmn`` block solve — the GPflow
        ``posterior()`` analogue for the serving path.

        ``solver`` selects how that per-batch block solve runs:

        - ``"chol"``: factorize ``Kmm + Lambda`` ONCE here (O(M^3), ~ms at
          M~1k); each batch is then two triangular solves — ~2 CG
          iterations' worth of flops instead of the full iteration count.
          Serving-only: training gradients still flow through CG.  Numerical
          domain: same as the Cholesky-family models (kappa(Kmm+Lambda)
          safely below 1/eps of the dtype — ~1e7 in fp32); beyond that use
          ``"cg"``, whose pivchol-preconditioned fp32 path converges where
          a raw factorization would break down (docs/PERF.md).
        - ``"cg"``: the round-1 behavior (cache the preconditioner, CG the
          Kmn block per batch).  The only choice when M is too large to
          factorize or the matrix is streamed/matrix-free.
        - ``"lanczos"``: LOVE-style rank-k serving (net-new; opt-in, never
          picked by "auto"): one k-step Lanczos decomposition at cache-build
          time (``serving_lanczos_rank``) gives ``R`` [k, M] with
          ``x^T A^{-1} x ~= ||R x||^2`` — per-batch variance becomes two
          skinny matmuls, no CG and no [M, M] factor.  Approximate:
          variances are conservative OVER-estimates converging with the
          rank (exact at rank = M).  Fills the M > 16384 dense serving gap
          where chol cannot factorize and per-batch CG serves ~4k points/s
          (benchmarks/serving_results.csv).  The mean stays exact (CG nu).
        - ``"auto"`` (default): ``"chol"`` when the [M, M] factor fits
          (M <= 16384) AND an estimated ``kappa(Kmm + Lambda) * eps(dtype)``
          is safely below 1 (Lanczos extremal Ritz values, ~64 matvecs) —
          the actual fp32 breakdown boundary, not just a size rule.  Under
          ``jit`` the matrix is a tracer and no data-dependent static choice
          exists: auto falls back to the size rule there, backstopped by the
          serving-time NaN fallback.  Production callers that jit this
          method (training/optimize.predict_in_batches) resolve "auto"
          eagerly first via :meth:`resolve_serving_solver`, so the
          conditioning estimate DOES run on the real serving path.
        """
        if solver not in ("auto", "chol", "cg", "lanczos"):
            # Validate BEFORE any compute: past this point the cg/lanczos
            # branch runs a preconditioner build + full nu solve (seconds of
            # chip time at large M) that a typo'd solver must not pay for.
            raise ValueError(f"unknown posterior solver: {solver!r}")
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        mask = self._mask_of(params)
        kmm = self._masked_kmm(kp, z, mask)
        kmm_lambda = add_diagonal(kmm, var[:, 0])
        if solver == "auto":
            solver = self._auto_serving_solver(kmm_lambda)
        if solver == "chol":
            chol = jnp.linalg.cholesky(kmm_lambda)
            nu = jax.scipy.linalg.cho_solve((chol, True), u)
            # kmm_lambda=None: the chol path never reads the raw system
            # matrix (posterior_predict solves through the factor), and
            # carrying it would double the cache's HBM at large M.
            return CGGPPosterior(
                kernel_params=kp, inducing_points=z, kmm_lambda=None,
                nu=nu, precond_state=(), chol=chol, inducing_mask=mask,
                lam=var[:, 0],
            )
        precond = self._build_preconditioner(
            kp, z, kmm, var, key if key is not None else jax.random.PRNGKey(0)
        )
        nu = self.conjugate_gradient(kmm_lambda, u, preconditioner=precond)
        if solver == "lanczos":
            from cggp_tpu.ops.logdet import (
                lanczos_quad_cache_rows,
                love_seed_row,
            )

            hi = jax.lax.Precision.HIGHEST
            a = jax.lax.stop_gradient(kmm_lambda)
            start = love_seed_row(u.T)  # [1, M]; zero-u guard in the helper
            rank = min(int(self.serving_lanczos_rank), int(z.shape[0]))
            lanczos_r = lanczos_quad_cache_rows(
                lambda rows: jnp.matmul(rows, a, precision=hi), start, rank)
            # kmm_lambda=None: the LOVE path never solves against the raw
            # system again — dropping it halves the cache's HBM at large M
            # (the regime this solver exists for).
            return CGGPPosterior(
                kernel_params=kp, inducing_points=z, kmm_lambda=None,
                nu=nu, precond_state=(), chol=None, lanczos_r=lanczos_r,
                inducing_mask=mask, lam=var[:, 0],
            )
        return CGGPPosterior(
            kernel_params=kp,
            inducing_points=z,
            kmm_lambda=kmm_lambda,
            nu=nu,
            precond_state=() if precond is None else precond.state,
            chol=None,
            inducing_mask=mask,
            lam=var[:, 0],
        )

    def posterior_extend(self, post: "CGGPPosterior", params: Dict,
                         key: Optional[jax.Array] = None) -> "CGGPPosterior":
        """Extend a serving cache after streaming ingestion — O(dM * M^2)
        instead of the O(M'^3) rebuild (net-new; the reference re-solves
        everything per predict batch, models.py:333-345).

        ``params`` is the updated parameter dict from a streaming update
        (``selection.covernet.covernet_extend_update``): same kernel
        hyperparameters, the cache's inducing points as an unchanged PREFIX
        of ``params["inducing_points"]``, with ``dM >= 0`` new centers
        appended and possibly merged ``pseudo_u``/``cluster_counts``.  The
        predictive weights ``nu`` are always re-solved (pseudo-u changes on
        every touched cluster); what the cache saves is the O(M^3) factor
        work:

        - **chol cache, Lambda prefix unchanged** (pure center append):
          bordered Cholesky update (:func:`~cggp_tpu.ops.linalg.chol_extend`)
          — the extended cache is EXACTLY the one ``posterior(params,
          solver="chol")`` would build.  A non-finite Schur factor (fp32,
          ill-conditioned border) falls back to a full ``posterior(params)``
          rebuild with a warning.
        - **cg cache** (any Lambda drift — the streaming-merge norm, since
          counts grow on every old cluster that receives new points): the
          [M, M] system block is reused (diag-updated in place), only the
          dM new kernel rows are evaluated, and a cached exact-factor
          preconditioner state is border-extended
          (:func:`~cggp_tpu.ops.linalg.triangular_inv_extend`).  The factor
          is stale on the drifted prefix diagonal, but the preconditioner
          apply is SPD by construction (``W^T W``) and CG verifies the TRUE
          residual, so serving stays exact — drift only costs refinement
          iterations.  Spectral/identity preconditioner states are rebuilt
          from the new system (O(M' * rank^2), not O(M'^3)).
        - **chol cache with Lambda drift**: raises — a direct ``cho_solve``
          through a drift-stale factor would serve silently wrong values.
          Build the streaming cache with ``posterior(params, solver="cg")``
          (production config ``precondition="chol"`` caches the refinement
          factor) or rebuild.
        - **LOVE cache**: raises — a Krylov quadrature basis has no
          incremental extension; rebuild with ``posterior(solver="lanczos")``.

        Eager-only routing (host checks on prefix equality); the RETURNED
        cache is an ordinary pytree and jits like any other.  Capacity-padded
        caches are rejected — the padded flow already reserves slots for
        growth (``assign_clusters_device``) without changing shapes.
        """
        if post.inducing_mask is not None or "inducing_mask" in params:
            raise ValueError(
                "posterior_extend targets unpadded caches; capacity-padded "
                "models grow inside their padding via assign_clusters_device"
            )
        if post.lanczos_r is not None:
            raise ValueError(
                "a LOVE (solver='lanczos') cache cannot be extended — the "
                "Krylov basis is not incremental; rebuild with "
                "posterior(params, solver='lanczos')"
            )
        kp = params["kernel"]
        if jax.tree_util.tree_structure(kp) != jax.tree_util.tree_structure(
            post.kernel_params
        ) or not all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(kp),
                jax.tree_util.tree_leaves(post.kernel_params),
            )
        ):
            raise ValueError(
                "kernel hyperparameters changed since the cache was built; "
                "every cached block depends on them — rebuild with posterior()"
            )
        z = params["inducing_points"]
        z_old = post.inducing_points
        m0, m1 = z_old.shape[0], z.shape[0]
        if m1 < m0 or not bool(jnp.all(z[:m0] == z_old)):
            raise ValueError(
                "params['inducing_points'] must extend the cache's centers "
                "as an unchanged prefix (covernet_extend appends, never "
                "moves); rebuild with posterior() after a full re-selection"
            )
        u = params["pseudo_u"]
        lam_new = self.diag_variance(params)[:, 0]
        lam_prefix_same = post.lam is not None and bool(
            jnp.all(lam_new[:m0] == post.lam)
        )
        dm = m1 - m0
        hi = jax.lax.Precision.HIGHEST

        if post.chol is not None:
            if not lam_prefix_same:
                raise ValueError(
                    "Lambda drifted on the cached prefix (merged counts or "
                    "changed likelihood variance): a cho_solve through the "
                    "stale factor would serve wrong values. Build streaming "
                    "caches with posterior(params, solver='cg') — CG "
                    "verifies the true residual — or rebuild this one."
                )
            if dm == 0:
                nu = jax.scipy.linalg.cho_solve((post.chol, True), u)
                return post._replace(nu=nu)
            from cggp_tpu.ops.linalg import chol_extend

            a21 = self.kernel.K(kp, z[m0:], z_old)
            a22 = add_diagonal(self.kernel.K(kp, z[m0:]), lam_new[m0:])
            chol = chol_extend(post.chol, a21, a22)
            if not bool(jnp.all(jnp.isfinite(chol))):
                import warnings

                warnings.warn(
                    "posterior_extend: bordered Cholesky produced a "
                    "non-finite factor (ill-conditioned border at this "
                    "dtype); rebuilding the cache from scratch instead."
                )
                return self.posterior(params, key=key)
            nu = jax.scipy.linalg.cho_solve((chol, True), u)
            return CGGPPosterior(
                kernel_params=kp, inducing_points=z, kmm_lambda=None,
                nu=nu, precond_state=(), chol=chol, lam=lam_new,
            )

        # -- cg cache -------------------------------------------------------
        if post.lam is not None:
            top_left = add_diagonal(post.kmm_lambda, lam_new[:m0] - post.lam)
        else:  # pre-extension cache: cannot separate K from Lambda; rebuild
            top_left = add_diagonal(self.kernel.K(kp, z_old), lam_new[:m0])
        if dm == 0:
            kmm_lambda = top_left
        else:
            a21 = self.kernel.K(kp, z[m0:], z_old)
            a22 = add_diagonal(self.kernel.K(kp, z[m0:]), lam_new[m0:])
            kmm_lambda = jnp.concatenate(
                [
                    jnp.concatenate([top_left, a21.T], axis=1),
                    jnp.concatenate([a21, a22], axis=1),
                ],
                axis=0,
            )

        state = post.precond_state
        if isinstance(state, dict) and dm > 0:
            # Border-extend the exact-factor refinement state W = L^{-1}.
            # The extension is exact for the system the OLD factor solved
            # plus the new border; prefix-Lambda drift leaves it a stale
            # (still SPD) preconditioner — CG absorbs that as iterations.
            from cggp_tpu.ops.linalg import triangular_inv_extend

            w11 = state["chol_w"]
            l21 = jnp.matmul(a21, w11.T, precision=hi)
            schur = a22 - jnp.matmul(l21, l21.T, precision=hi)
            l22 = jnp.linalg.cholesky(schur)
            w_ext = triangular_inv_extend(w11, l21, l22)
            ok = jnp.all(jnp.isfinite(w_ext))
            state = {
                "chol_w": jnp.where(ok, w_ext, jnp.eye(m1, dtype=w_ext.dtype))
            }
        elif (
            self.precondition is not None
            and not isinstance(state, dict)
            and (dm > 0 or not lam_prefix_same)
        ):
            # Spectral ((U, ...) tuple) states have no border algebra —
            # rebuild from the new system at the model's configured mode
            # (O(M' rank^2), no O(M'^3) factor).  Identity (()) states skip
            # the branch entirely: building kmm only for
            # _build_preconditioner to return None would waste an [M', M']
            # buffer write per ingest.
            kmm = add_diagonal(kmm_lambda, -lam_new)
            precond = self._build_preconditioner(
                kp, z, kmm, lam_new[:, None],
                key if key is not None else jax.random.PRNGKey(0),
            )
            state = () if precond is None else precond.state

        nu0 = post.nu if dm == 0 else jnp.concatenate(
            [post.nu, jnp.zeros((dm, post.nu.shape[1]), post.nu.dtype)]
        )
        nu = self.conjugate_gradient(
            kmm_lambda, u, initial_solution=nu0,
            preconditioner=_precond_from_state(state),
        )
        return CGGPPosterior(
            kernel_params=kp, inducing_points=z, kmm_lambda=kmm_lambda,
            nu=nu, precond_state=state, chol=None, lam=lam_new,
        )

    def resolve_serving_solver(self, params: Dict) -> str:
        """Resolve ``solver="auto"`` to a concrete ``"chol"``/``"cg"`` choice
        EAGERLY (outside jit), where the Lanczos conditioning estimate can be
        computed.  Serving callers that jit ``posterior`` (the production
        path, training/optimize._cached_posterior_jits) must call this first
        and pass the concrete choice through — inside jit the matrix is a
        tracer, no data-dependent static choice exists, and ``"auto"`` would
        silently degrade to the size-only rule (round-3 review finding).
        The estimate itself runs as a CACHED jitted program (per model — no
        per-call retrace of the Lanczos scan; the transient Gram is freed at
        program exit); only two scalars come back to host.  The chol/cg
        policy is shared: :func:`cggp_tpu.models.base.chol_or_cg_from_eigs`."""
        from cggp_tpu.models.base import chol_or_cg_from_eigs

        z = params["inducing_points"]
        if z.shape[0] > 16384:
            return "cg"
        eig_min, eig_max = _jitted_extremal_eigs(self)(params)
        return chol_or_cg_from_eigs(eig_min, eig_max, z.dtype)

    def _auto_serving_solver(self, kmm_lambda: Array) -> str:
        from cggp_tpu.models.base import chol_or_cg_from_eigs

        m = kmm_lambda.shape[-1]
        if m > 16384:
            return "cg"  # the [M, M] factor alone would crowd HBM
        if isinstance(kmm_lambda, jax.core.Tracer):
            # Inside jit the conditioning estimate is a tracer — the
            # chol/cg choice must be static, so only the size rule applies
            # (the NaN fallback catches the rare ill-conditioned case).
            return "chol"
        eig_min, eig_max = lanczos_extremal_eigs(
            jax.lax.stop_gradient(kmm_lambda), jax.random.PRNGKey(0),
            num_iters=min(64, m),
        )
        return chol_or_cg_from_eigs(eig_min, eig_max, kmm_lambda.dtype)

    def posterior_mean(self, post: "CGGPPosterior", x_new: Array) -> Array:
        """CG-free serving mean: ``K(x, Z) @ nu``, one skinny matmul."""
        kmn = self._masked_kmn(post.kernel_params, post.inducing_points,
                               x_new, post.inducing_mask)
        return kmn.T @ post.nu

    def posterior_predict(self, post: "CGGPPosterior", x_new: Array,
                          full_cov: bool = False) -> Tuple[Array, Array]:
        """Mean + variance from the cache: the [M, T] Kmn block through two
        triangular solves (``solver="chol"``) or one CG launch (``"cg"``) —
        either way the per-batch u column and preconditioner build are gone."""
        kp = post.kernel_params
        z = post.inducing_points
        kmn = self._masked_kmn(kp, z, x_new, post.inducing_mask)  # [M, T]
        if post.lanczos_r is not None:
            # LOVE path: two skinny matmuls, no solve (conservative
            # over-estimates; math in ops/logdet.love_variance).
            from cggp_tpu.ops.logdet import love_variance

            knn = self.kernel.K(kp, x_new) if full_cov \
                else self.kernel.K_diag(kp, x_new)
            fvar = love_variance(post.lanczos_r, kmn.T, knn, full_cov)
            return kmn.T @ post.nu, fvar
        if post.chol is not None:
            inv_kmn = jax.scipy.linalg.cho_solve((post.chol, True), kmn)
        else:
            precond = _precond_from_state(post.precond_state)
            inv_kmn = self.conjugate_gradient(
                post.kmm_lambda, kmn, preconditioner=precond
            )
        if full_cov:
            knn = self.kernel.K(kp, x_new)
            fvar = (knn - kmn.T @ inv_kmn)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            fvar = (knn - jnp.sum(kmn * inv_kmn, axis=0))[:, None]
        fmu = kmn.T @ post.nu
        return fmu, fvar

    def elbo(self, params: Dict, data: Tuple[Array, Array],
             key: Optional[jax.Array] = None,
             precond_override=None) -> Array:
        """ELBO with ALL CG right-hand sides fused into one row-block solve.

        The reference runs the KL solve and the predict solve as separate CG
        launches against the same ``Kmm + Lambda`` (models.py:303, :339-340);
        fusing ``[u | probes | Kmn]`` into a single [1+P+B, M] solve halves
        the number of CG loops per training step (forward AND backward),
        which matters because small-M CG iterations are latency-dominated.

        ``precond_override`` (a state pytree from :meth:`precond_state`, or
        ``()`` for identity) replaces the per-step preconditioner build —
        the chunk-frozen mode the K-step trainer uses (see
        :meth:`precond_state` for why this is safe).  ``None`` keeps the
        per-step rebuild.
        """
        if key is None:
            raise ValueError("CGGP.elbo requires a PRNG key for the trace/logdet probes")
        if self.num_probes is None or not self.fuse_kl_solves:
            if precond_override is not None:
                raise ValueError(
                    "precond_override is supported on the fused ELBO path "
                    "only (num_probes set and fuse_kl_solves=True)"
                )
            return self._elbo_unfused(params, data, key)

        x, y = data
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        m = z.shape[0]
        dtype = z.dtype
        mask = self._mask_of(params)

        kmm = self._masked_kmm(kp, z, mask)  # jitter = 0 (models.py:300, :333)
        kmm_lambda = add_diagonal(kmm, var[:, 0])
        kmn = self._masked_kmn(kp, z, x, mask)  # [M, B]

        cg = self.conjugate_gradient
        # One up-front split (key discipline: no key both consumed and
        # re-split): trace probes, logdet probes/SLQ, preconditioner sketch.
        key_probes, key_logdet, key_rff = jax.random.split(key, 3)
        probes = rademacher(key_probes, (m, self.num_probes), dtype)
        use_slq = self.logdet_variant == "slq"
        if use_slq:
            logdet_probes = jnp.zeros((m, 0), dtype)
        else:
            # Independent probes for the logdet gradient (reference draws a
            # fresh Rademacher batch, models.py:37-44) — but solved in the
            # SAME fused CG launch.
            logdet_probes = rademacher(key_logdet, (m, self.num_probes), dtype)
        if mask is not None:
            probes = probes * mask[:, None]
            logdet_probes = logdet_probes * mask[:, None]

        # Solver state, not part of the differentiated model.
        if precond_override is None:
            precond = self._build_preconditioner(kp, z, kmm, var, key_rff)
        else:
            precond = _precond_from_state(precond_override)

        p = self.num_probes
        rhs = jnp.concatenate([u, probes, logdet_probes, kmn], axis=-1)
        solved = cg(kmm_lambda, rhs, preconditioner=precond)
        # Offsets by u's width: multi-output pseudo_u [M, P>1] contributes P
        # columns to the fused block (round-4 multi-output support).
        p_out = u.shape[-1]
        inv_u = solved[:, :p_out]
        inv_probes = solved[:, p_out : p_out + p]
        inv_logdet_probes = solved[
            :, p_out + p : p_out + p + logdet_probes.shape[-1]]
        inv_kmn = solved[:, p_out + p + logdet_probes.shape[-1] :]

        # -- KL (models.py:293-322 semantics) --
        kmm_probes = kmm @ probes
        trace = jnp.sum(inv_probes * kmm_probes) / jnp.asarray(
            self.num_probes, dtype=dtype
        )
        quad = jnp.sum((kmm @ inv_u) * inv_u)
        if use_slq:
            logdet = slq_logdet(kmm_lambda, cg, num_probes=self.num_probes,
                                key=key_logdet, lanczos_iters=self.slq_lanczos_iters,
                                preconditioner=precond, mask=mask)
        else:
            # The logdet gradient reuses this launch's probe solutions — zero
            # extra CG loops (the reference re-solves in its custom gradient,
            # models.py:32-44).  (Masked probes keep pad rows out of it.)
            logdet = eval_logdet_from_solves(
                kmm_lambda, logdet_probes, jax.lax.stop_gradient(inv_logdet_probes)
            )
        log_var = jnp.log(var)
        const = jnp.sum(log_var if mask is None else log_var * mask[:, None])
        kl = 0.5 * (quad - trace + logdet - const)

        # -- data term (models.py:324-354 predict + variational expectations) --
        knn = self.kernel.K_diag(kp, x)
        f_var = (knn - jnp.sum(kmn * inv_kmn, axis=0))[:, None]
        f_mean = kmn.T @ inv_u
        var_exp = self.likelihood.variational_expectations(
            params["likelihood"], f_mean, f_var, y
        )
        scale = minibatch_scale(self.num_data, x.shape[0], kl.dtype)
        return jnp.sum(var_exp) * scale - kl

    def _elbo_unfused(self, params: Dict, data: Tuple[Array, Array],
                      key: jax.Array) -> Array:
        x, y = data
        kl = self.prior_kl(params, key)
        f_mean, f_var = self.predict_f(params, x, full_cov=False)
        var_exp = self.likelihood.variational_expectations(
            params["likelihood"], f_mean, f_var, y
        )
        scale = minibatch_scale(self.num_data, x.shape[0], kl.dtype)
        return jnp.sum(var_exp) * scale - kl

    def training_loss(self, params: Dict, data: Tuple[Array, Array],
                      key: Optional[jax.Array] = None,
                      precond_override=None) -> Array:
        return -self.elbo(params, data, key, precond_override=precond_override)

    def cg_stats(self, params: Dict, data: Tuple[Array, Array],
                 key: jax.Array) -> "CGStats":
        """Solver stats (iterations, final residual) of the fused per-step
        solve — the first-class observability the reference only exposes in
        its Wasserstein harness (paper_condition_wasserstein.py:262-294)."""
        from cggp_tpu.ops.cg import CGStats  # noqa: F401 (return type)

        x, _y = data
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        m = z.shape[0]
        mask = self._mask_of(params)

        kmm = self._masked_kmm(kp, z, mask)
        kmm_lambda = add_diagonal(kmm, var[:, 0])
        kmn = self._masked_kmn(kp, z, x, mask)
        p = self.num_probes or 0
        key_probes, key_pre = jax.random.split(key)
        probes = (
            rademacher(key_probes, (m, 2 * p), z.dtype)
            if p
            else jnp.zeros((m, 0), z.dtype)
        )
        if mask is not None:
            probes = probes * mask[:, None]
        rhs = jnp.concatenate([u, probes, kmn], axis=-1)
        # Same preconditioner as the training solve: stats reflect what the
        # optimizer actually pays.
        precond = self._build_preconditioner(kp, z, kmm, var, key_pre)
        _, stats = self.conjugate_gradient.solve_with_stats(
            kmm_lambda, rhs, preconditioner=precond
        )
        return stats


class CGGPPosterior(NamedTuple):
    """Serving cache produced by :meth:`CGGP.posterior` — a pytree, so it
    passes straight through ``jax.jit`` as an argument."""

    kernel_params: Dict
    inducing_points: Array
    kmm_lambda: Optional[Array]  # [M, M] = Kmm + diag(Lambda); None on the
    # chol path (the factor alone serves — saves an [M, M] HBM buffer)
    nu: Array  # [M, 1] = (Kmm + Lambda)^{-1} pseudo_u
    precond_state: Tuple  # () = identity, 3-tuple = SpectralPreconditioner
    # state, dict = CholPreconditioner state (see _precond_from_state)
    chol: Optional[Array] = None  # [M, M] lower Cholesky of Kmm + Lambda
    # (solver="chol": per-batch variance = two triangular solves, no CG)
    lanczos_r: Optional[Array] = None  # [k, M] LOVE quad cache
    # (solver="lanczos": per-batch variance = two skinny matmuls, no solve)
    inducing_mask: Optional[Array] = None  # [M] 1-real/0-pad row mask of a
    # capacity-padded model (masks the serving Kmn; None = unpadded)
    lam: Optional[Array] = None  # [M] diagonal Lambda the cache was built
    # with — read by posterior_extend to detect prefix drift exactly
    # (reconstructing it from the factor would drown count-merge deltas in
    # fp32 rounding); None on caches from before the streaming extension


class _StatePreconditioner:
    """Rewraps a cached preconditioner state for the CG facade — a
    CholPreconditioner dict (``{"chol_w": W}``) or a SpectralPreconditioner
    tuple.  The facade contract is ``.apply(state, vec, mat)`` + ``.state``;
    ``apply`` is resolved from the state's shape and must keep a stable
    function identity (it is a static jit argument in the CG facade)."""

    def __init__(self, state):
        self.state = state
        from cggp_tpu.ops.cg import CholPreconditioner, SpectralPreconditioner

        self.apply = (CholPreconditioner.apply if isinstance(state, dict)
                      else SpectralPreconditioner.apply)

    def __call__(self, vec, mat):
        return self.apply(self.state, vec, mat)


def _precond_from_state(state):
    if state == ():
        return None
    return _StatePreconditioner(state)
