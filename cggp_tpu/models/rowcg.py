"""Shared math for CGGP variants over an IMPLICIT ``Kuu + diag(lam)``.

Two regimes need CG-powered ClusterGP semantics (reference models.py:279-354)
without ever materialising the [M, M] Gram matrix:

* :class:`~cggp_tpu.parallel.model.ShardedCGGP` — M sharded over a device
  mesh, psum-blocked matvec/solve (multi-chip);
* :class:`~cggp_tpu.models.implicit.ImplicitCGGP` — single chip, matvec over
  scanned [block, M] kernel panels (M beyond one chip's [M, M] HBM budget).

Both share every objective/predict path; only the solver backends differ.
This base expresses the model against four hooks a subclass wires in its
``__post_init__`` (frozen dataclass, so via ``object.__setattr__``):

    _solve(kp, z, lam, rhs [R, M], precond_state, mask) -> (solution, CGStats)
    _matvec(kp, z, lam, mask, rows [R, M]) -> rows @ (K*mask + diag(lam))
    _slq_value(kp, z, lam, mask, probes [R, M]) -> scalar   (logdet="slq")
    _pad_multiple_for(m) -> int   (inducing count padded to this multiple)

Everything is ROW-convention ([R, M] right-hand sides) like the reference's
internal solver layout (conjugate_gradient.py:24-122).  Padding uses
:func:`cggp_tpu.ops.cg_implicit.pad_inducing` + an ``inducing_mask`` param:
pads are exact no-ops in every objective (masked kernel coupling, masked
probes, masked KL constant).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cggp_tpu.models.base import minibatch_scale
from cggp_tpu.models.clustergp import ClusterGP
from cggp_tpu.ops.cg import spectral_precond_state
from cggp_tpu.ops.cg_implicit import pad_inducing, pivoted_cholesky_kernel
from cggp_tpu.ops.logdet import (
    make_matfree_eval_logdet,
    make_matfree_logdet_from_solves,
    make_matfree_slq_logdet,
    rademacher,
)

Array = jnp.ndarray


@functools.lru_cache(maxsize=64)
def _jitted_row_extremal_eigs(model):
    """Per-model cached jitted (eig_min, eig_max) for the serving resolver:
    Lanczos extremal Ritz values through the model's own matrix-free masked
    matvec — no [M, M] build, no per-call retrace (dense twin:
    models/cggp._jitted_extremal_eigs)."""
    from cggp_tpu.ops.logdet import lanczos_extremal_eigs_rows

    def estimate(params):
        kp = params["kernel"]
        z = params["inducing_points"]
        lam = model.diag_variance(params)[:, 0]
        mask = jax.lax.stop_gradient(params["inducing_mask"])[:, 0]
        return lanczos_extremal_eigs_rows(
            lambda rows: model._matvec(kp, z, lam, mask, rows),
            jax.random.PRNGKey(0), z.shape[0], z.dtype,
            num_iters=min(64, int(z.shape[0])), mask=mask,
        )

    return jax.jit(estimate)


@dataclasses.dataclass(frozen=True)
class RowSolveCGGP(ClusterGP):
    """CGGP over an implicit (never materialised) ``Kuu + diag(lam)``."""

    error_threshold: float = 1e-8
    max_cg_iterations: int = 100
    num_probes: int = 5
    # Per-step matrix-free preconditioning of the fused solve (net-new;
    # dense twin: CGGP.precondition).  "pivchol" builds the [M, k] factor
    # from per-pivot kernel rows, "rff" from a random-Fourier sketch of Kuu —
    # neither materialises [M, M].  Divergence from the dense model: the rff
    # sketch key is FIXED (``precond_seed``) instead of per-step — solver
    # state only affects iteration counts, not solutions, and the logdet
    # backward has no step key to thread.
    # ("chol"/"auto" — the dense CGGP's exact-factor refinement — are
    # deliberately absent: a dense [M, M] factor contradicts the
    # matrix-free/sharded memory model these row-solver models exist for.)
    precondition: Optional[str] = None  # None | "pivchol" | "rff"
    precond_rank: int = 128  # pivchol columns; for "rff": Fourier bases L (rank 2L)
    precond_seed: int = 0  # rff sketch key (fixed across steps; see above)
    # Net-new stopping rule: scale each RHS row's target by its own norm
    # (see ops.cg.cg_loop) — recommended for large fused batches, where the
    # reference's absolute rule is scale-dependent.
    relative_threshold: bool = False
    # "zero": reference semantics (ELBO values omit the logdet; gradients
    # exact, models.py:21-48).  "slq": matrix-free stochastic Lanczos
    # quadrature VALUE through the implicit matvec — reported ELBOs become
    # meaningful, gradient path unchanged (dense twin: CGGP.logdet_variant).
    logdet_variant: str = "zero"  # "zero" | "slq"
    slq_lanczos_iters: int = 25
    # Rank of the opt-in ``posterior(solver="lanczos")`` serving cache
    # (LOVE-style, ops/logdet.lanczos_quad_cache_rows): per-batch variance
    # becomes two skinny matmuls instead of a blocked CG solve.  Approximate
    # — variances are conservative over-estimates converging with the rank
    # (exact at rank = M) — so never picked by "auto".
    serving_lanczos_rank: int = 128

    # Whether posterior(solver="chol"/"auto") may materialise and factorize
    # the [M, M] system for serving (ShardedCGGP: yes, the replica is cheap
    # at small M; ImplicitCGGP: no — the whole point is no [M, M] buffer).
    _supports_chol_serving = False

    def _wire_logdets(self) -> None:
        """Call at the END of the subclass ``__post_init__`` (after _solve /
        _matvec / _slq_value exist)."""
        object.__setattr__(
            self, "_logdet",
            make_matfree_eval_logdet(self._matvec, self._solve, self._precond_state),
        )
        object.__setattr__(
            self, "_logdet_from_solves", make_matfree_logdet_from_solves(self._matvec)
        )
        if self.logdet_variant not in ("zero", "slq"):
            raise ValueError(f"unknown logdet_variant: {self.logdet_variant!r}")
        if self.logdet_variant == "slq":
            object.__setattr__(
                self, "_slq_logdet",
                make_matfree_slq_logdet(
                    self._slq_value, self._matvec, self._solve, self._precond_state
                ),
            )

    def _pad_multiple_for(self, m: int) -> int:
        raise NotImplementedError

    def _precond_state(self, kp, z, lam, mask=None):
        """Solver-state pytree for the fused solve; () = identity."""
        if self.precondition is None:
            return ()
        sg = jax.lax.stop_gradient
        if self.precondition == "pivchol":
            # Pads keep the full constant K_diag; left unmasked, greedy
            # pivoting would burn precond columns on no-op directions.
            factor = pivoted_cholesky_kernel(
                self.kernel, sg(kp), sg(z), self.precond_rank,
                mask=None if mask is None else sg(mask),
            )
        elif self.precondition == "rff":
            from cggp_tpu.ops.rff import rff_basis

            # [M, 2L] Fourier sketch of Kuu — matrix-free by construction.
            # Pad rows sit at huge coordinates where cos/sin are garbage
            # (NOT small) — zero them so pads stay out of the sketch.
            factor = rff_basis(
                sg(z), self.kernel, sg(kp), self.precond_rank,
                jax.random.PRNGKey(self.precond_seed),
            )
            if mask is not None:
                factor = factor * sg(mask).reshape(-1)[:, None]
        else:
            raise ValueError(f"unknown precondition mode: {self.precondition!r}")
        return spectral_precond_state(factor, sg(lam))

    def precond_state(self, params: Dict, key=None):
        """Public solver-state builder for ``elbo(precond_override=...)`` —
        the chunk-frozen preconditioning hook (same contract AND the same
        safety caveat as :meth:`CGGP.precond_state`: converged solves are
        identical, but the stale factor's extra iterations can hit
        ``max_cg_iterations`` — the default here is only 100 — where
        solutions degrade with ``converged=False``).  For the matrix-free
        family the per-step build is rank×[panel] kernel evaluations —
        substantially more than the dense pivchol — so freezing saves more,
        at the same drift risk.  ``key`` is accepted for API uniformity
        (the rff sketch here is seeded by ``precond_seed``, not a per-call
        key)."""
        del key
        kp = params["kernel"]
        z = params["inducing_points"]
        lam = self.diag_variance(params)[:, 0]
        mask = jax.lax.stop_gradient(params["inducing_mask"])[:, 0]
        return self._precond_state(kp, z, lam, mask)

    # -- parameters ----------------------------------------------------------

    def init_params(self, inducing_points, pseudo_u=None, cluster_counts=None,
                    capacity: Optional[int] = None, **kwargs) -> Dict:
        """``capacity`` (net-new) pins the padded inducing dimension to a
        fixed size >= the real count (still a multiple of the model's pad
        multiple): the shape contract for fully-jitted in-training
        re-clustering (``assign_clusters_device`` swaps buffer contents
        without changing shapes, so the training program never recompiles).
        """
        params = super().init_params(
            inducing_points, pseudo_u=pseudo_u, cluster_counts=cluster_counts,
            **kwargs,
        )
        m_real = params["inducing_points"].shape[0]
        dtype = params["inducing_points"].dtype
        if capacity is None:
            multiple = self._pad_multiple_for(m_real)
        else:
            capacity = int(capacity)
            if capacity < m_real:
                raise ValueError(
                    f"capacity {capacity} < real inducing count {m_real}"
                )
            if capacity % self._pad_multiple_for(capacity) != 0:
                raise ValueError(
                    f"capacity {capacity} must be a multiple of "
                    f"{self._pad_multiple_for(capacity)}"
                )
            # pad_inducing pads to a multiple; m_real <= capacity makes the
            # next multiple exactly capacity.
            multiple = capacity
        z, _lam, u_t, counts_t, mask_t = pad_inducing(
            params["inducing_points"],
            jnp.ones(m_real, dtype),
            multiple,
            params["pseudo_u"].T,
            params["cluster_counts"].T,
            jnp.ones((1, m_real), dtype),
        )
        params["inducing_points"] = z
        params["pseudo_u"] = u_t.T
        # Padded counts of 1 give lam = noise there; the kernel row of a pad
        # point is masked to 0 against every real point, so pads stay
        # decoupled.
        counts = counts_t.T
        counts = jnp.where(counts == 0.0, 1.0, counts)
        params["cluster_counts"] = counts
        # 1 for real inducing points, 0 for pads: probes and the KL constant
        # are masked with it so pads are EXACT no-ops in every objective.
        params["inducing_mask"] = mask_t.T
        return params

    def trainable_mask(self, params: Dict, trainable_inducing_points: bool = False,
                       trainable_pseudo_u: bool = False) -> Dict:
        mask = super().trainable_mask(params, trainable_inducing_points,
                                      trainable_pseudo_u=trainable_pseudo_u)
        mask["inducing_mask"] = False
        return mask

    def assign_clusters(self, params: Dict, iv, means, counts) -> Dict:
        """Re-cluster + re-pad: the new M must again hit the pad multiple and
        the pad mask must track the new real count."""
        dtype = params["inducing_points"].dtype
        m_real = jnp.asarray(iv).shape[0]
        z, _lam, u_t, counts_t, mask_t = pad_inducing(
            jnp.asarray(iv, dtype),
            jnp.ones(m_real, dtype),
            self._pad_multiple_for(m_real),
            jnp.asarray(means, dtype).T,
            jnp.asarray(counts, dtype).T,
            jnp.ones((1, m_real), dtype),
        )
        new = dict(params)
        new["inducing_points"] = z
        new["pseudo_u"] = u_t.T
        new["cluster_counts"] = jnp.where(counts_t.T == 0.0, 1.0, counts_t.T)
        new["inducing_mask"] = mask_t.T
        return new

    def assign_clusters_device(self, params: Dict, z, u, counts, mask) -> Dict:
        """Fixed-capacity re-clustering swap — jit-composable (pure dict
        update, no shape change): the device half of fully-fused in-training
        re-selection (``covernet_update_padded`` produces the arguments;
        ``make_adam_multi_step(recluster_fn=...)`` runs it per chunk).  The
        params must have been built with ``init_params(capacity=...)`` of the
        same capacity; pads follow the pad_inducing convention (far coords,
        count 1, u 0, mask 0) so they stay exact no-ops."""
        if z.shape != params["inducing_points"].shape:
            raise ValueError(
                f"capacity mismatch: new Z {z.shape} vs params "
                f"{params['inducing_points'].shape} — build params with "
                "init_params(capacity=...) matching the recluster capacity"
            )
        new = dict(params)
        new["inducing_points"] = z
        new["pseudo_u"] = jnp.asarray(u, z.dtype)
        new["cluster_counts"] = jnp.asarray(counts, z.dtype)
        new["inducing_mask"] = jnp.asarray(mask, z.dtype)
        return new

    # -- KL ------------------------------------------------------------------

    def prior_kl(self, params: Dict, key: jax.Array) -> Array:
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        lam = var[:, 0]
        m = z.shape[0]
        dtype = z.dtype
        zeros_lam = jnp.zeros_like(lam)

        # Same key split as the fused elbo path, so both draw identical probes.
        key_probes, key_logdet = jax.random.split(key)
        mask_row = jax.lax.stop_gradient(params["inducing_mask"])[:, 0][None, :]  # [1, M]
        mask = mask_row[0]
        probes = rademacher(key_probes, (self.num_probes, m), dtype) * mask_row  # rows
        rhs = jnp.concatenate([u.T, probes], axis=0)  # [(P_out+P), M]
        solved, _stats = self._solve(
            kp, z, lam, rhs, self._precond_state(kp, z, lam, mask), mask
        )
        p_out = u.shape[-1]  # multi-output pseudo_u contributes P_out rows
        nu = solved[:p_out]
        solved_probes = solved[p_out:]

        # One matvec launch for [nu | probes]: the Gram row-block build
        # dominates the matvec, so fusing halves the KL's build cost.
        kmm_rows = self._matvec(
            kp, z, zeros_lam, mask, jnp.concatenate([nu, probes], axis=0)
        )
        kmm_nu, kmm_probes = kmm_rows[:p_out], kmm_rows[p_out:]
        quad = jnp.sum(kmm_nu * nu)
        trace = jnp.sum(solved_probes * kmm_probes) / jnp.asarray(
            self.num_probes, dtype=dtype
        )
        # Independent logdet probes (matches the fused elbo and the dense
        # CGGP / reference models.py:37-44 — reusing the trace probes would
        # correlate the two estimators and diverge from elbo's gradients).
        logdet_probes = rademacher(
            key_logdet, (self.num_probes, m), dtype
        ) * mask_row
        if self.logdet_variant == "slq":
            logdet = self._slq_logdet(kp, z, lam, mask, logdet_probes)
        else:
            logdet = self._logdet(kp, z, lam, mask, logdet_probes)
        const = jnp.sum(mask_row[0] * jnp.log(var[:, 0]))
        return 0.5 * (quad - trace + logdet - const)

    # -- predict ---------------------------------------------------------------

    def predict_f(self, params: Dict, x_new: Array, full_cov: bool = False) -> Tuple[Array, Array]:
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        lam = var[:, 0]

        mask = jax.lax.stop_gradient(params["inducing_mask"])[:, 0]
        kmn = self.kernel.K(kp, x_new, z) * mask[None, :]  # [T, M] rows (replicated)
        rhs = jnp.concatenate([u.T, kmn], axis=0)  # [(P_out+T), M]
        solved, _ = self._solve(
            kp, z, lam, rhs, self._precond_state(kp, z, lam, mask), mask
        )
        p_out = u.shape[-1]  # multi-output pseudo_u contributes P_out rows
        inv_u = solved[:p_out]
        inv_kmn = solved[p_out:]  # [T, M]

        if full_cov:
            # Dense-twin layout (models/cggp.py: knn - Kmn^T A^{-1} Kmn);
            # here both factors are [T, M] rows, so the quadratic form is one
            # [T, T] matmul on the already-solved block.
            knn = self.kernel.K(kp, x_new)
            fvar = (knn - kmn @ inv_kmn.T)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            fvar = (knn - jnp.sum(kmn * inv_kmn, axis=-1))[:, None]
        fmu = (kmn @ inv_u.T)  # [T, P_out]
        return fmu, fvar

    def elbo(self, params: Dict, data: Tuple[Array, Array],
             key: Optional[jax.Array] = None,
             precond_override=None) -> Array:
        """ELBO with one fused solve per step: rows
        ``[u | trace probes | logdet probes | Kmn(batch)]`` go through a
        single CG launch (mirrors the dense CGGP's fused path), and the
        logdet gradient reuses this launch's probe solutions.

        ``precond_override`` (a state pytree from :meth:`precond_state`, or
        ``()`` for identity) replaces the per-step matrix-free factor build
        — chunk-frozen preconditioning, see :meth:`precond_state`."""
        if key is None:
            raise ValueError(f"{type(self).__name__}.elbo requires a PRNG key")
        x, y = data
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)
        lam = var[:, 0]
        m = z.shape[0]
        dtype = z.dtype
        zeros_lam = jnp.zeros_like(lam)
        p = self.num_probes

        key_probes, key_logdet = jax.random.split(key)
        mask_row = jax.lax.stop_gradient(params["inducing_mask"])[:, 0][None, :]
        mask = mask_row[0]
        use_slq = self.logdet_variant == "slq"
        probes = rademacher(key_probes, (p, m), dtype) * mask_row
        # SLQ runs its own Lanczos launch on fresh probes; only the zero-value
        # variant batches its gradient probes into the fused solve.
        n_ld = 0 if use_slq else p
        logdet_probes = rademacher(key_logdet, (n_ld, m), dtype) * mask_row
        kmn = self.kernel.K(kp, x, z) * mask_row  # [B, M] rows

        rhs = jnp.concatenate([u.T, probes, logdet_probes, kmn], axis=0)
        precond = (self._precond_state(kp, z, lam, mask)
                   if precond_override is None else precond_override)
        solved, _stats = self._solve(kp, z, lam, rhs, precond, mask)
        # Offsets by u's width: multi-output pseudo_u [M, P>1] contributes
        # P rows to the fused block (round-4 multi-output support).
        p_out = u.shape[-1]
        nu = solved[:p_out]
        solved_probes = solved[p_out : p_out + p]
        solved_logdet = solved[p_out + p : p_out + p + n_ld]
        inv_kmn = solved[p_out + p + n_ld :]

        # -- KL --
        kmm_nu = self._matvec(kp, z, zeros_lam, mask, nu)
        quad = jnp.sum(kmm_nu * nu)
        kmm_probes = self._matvec(kp, z, zeros_lam, mask, probes)
        trace = jnp.sum(solved_probes * kmm_probes) / jnp.asarray(p, dtype)
        if use_slq:
            slq_probes = rademacher(key_logdet, (p, m), dtype) * mask_row
            logdet = self._slq_logdet(kp, z, lam, mask, slq_probes)
        else:
            logdet = self._logdet_from_solves(
                kp, z, lam, mask, logdet_probes, jax.lax.stop_gradient(solved_logdet)
            )
        const = jnp.sum(mask_row[0] * jnp.log(lam))
        kl = 0.5 * (quad - trace + logdet - const)

        # -- data term --
        knn = self.kernel.K_diag(kp, x)
        f_var = (knn - jnp.sum(kmn * inv_kmn, axis=-1))[:, None]
        f_mean = kmn @ nu.T
        var_exp = self.likelihood.variational_expectations(
            params["likelihood"], f_mean, f_var, y
        )
        scale = minibatch_scale(self.num_data, x.shape[0], kl.dtype)
        return jnp.sum(var_exp) * scale - kl

    def training_loss(self, params: Dict, data: Tuple[Array, Array],
                      key: Optional[jax.Array] = None,
                      precond_override=None) -> Array:
        return -self.elbo(params, data, key, precond_override=precond_override)

    # -- cached serving (twin of CGGP.posterior; the reference's predict
    # path recomputes the u-solve per batch, models.py:333-345) -------------

    def resolve_serving_solver(self, params: Dict) -> str:
        """Eager ``"auto"`` resolution for the row-solver serving path
        (dense twin: :meth:`CGGP.resolve_serving_solver`): Lanczos extremal
        Ritz values through the model's own matrix-free masked matvec — no
        [M, M] build.  Masked start vector => the estimate covers the real
        submatrix only (pads are decoupled)."""
        from cggp_tpu.models.base import chol_or_cg_from_eigs

        if not self._supports_chol_serving:
            return "cg"
        z = params["inducing_points"]
        if z.shape[0] > 16384:
            return "cg"
        eig_min, eig_max = _jitted_row_extremal_eigs(self)(params)
        return chol_or_cg_from_eigs(eig_min, eig_max, z.dtype)

    def posterior(self, params: Dict,
                  solver: str = "auto") -> "RowCGGPPosterior":
        """Precompute the params-only serving state: the u-solve ``nu`` and
        the block-solve state.  ``posterior_mean`` then needs no CG at all
        and ``posterior_predict`` solves only the Kmn block.

        ``solver="chol"`` (where supported — multi-chip replicated serving)
        additionally materializes the masked ``Kmm + Lambda`` (pads
        decoupled, unit diagonal) and factorizes it ONCE — per-batch
        variance becomes two triangular solves instead of a blocked CG.
        ``"auto"``: chol for M_pad <= 16384 when supported, else ``"cg"``
        (the in-jit fallback rule; eager callers and
        training/optimize.predict_in_batches resolve "auto" through the
        conditioning-aware :meth:`resolve_serving_solver` first).
        """
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        lam = self.diag_variance(params)[:, 0]
        mask = jax.lax.stop_gradient(params["inducing_mask"])[:, 0]
        if solver == "auto":
            solver = (
                "chol"
                if self._supports_chol_serving and z.shape[0] <= 16384
                else "cg"
            )
        if solver == "chol":
            if not self._supports_chol_serving:
                raise ValueError(
                    f"{type(self).__name__} serves matrix-free; "
                    "solver='chol' would materialise the [M, M] system "
                    "this model exists to avoid — use 'cg' or 'auto'"
                )
            kmm = self.kernel.K(kp, z) * (mask[:, None] * mask[None, :])
            a = kmm + jnp.diag(lam * mask + (1.0 - mask))
            chol = jnp.linalg.cholesky(a)
            nu = jax.scipy.linalg.cho_solve(
                (chol, True), u * mask[:, None]
            ).T  # [1, M_pad] row, matching the CG path's layout
            return RowCGGPPosterior(
                kernel_params=kp, inducing_points=z, lam=lam, mask=mask,
                nu=nu, precond_state=(), chol=chol,
            )
        if solver == "lanczos":
            # LOVE-style serving (net-new): EXACT mean (CG-solved nu) +
            # rank-k Lanczos quadratic-form cache for the variance — no CG
            # at all per serving batch, no [M, M] buffer.  Conservative:
            # variances over-estimate, converging with serving_lanczos_rank.
            from cggp_tpu.ops.logdet import lanczos_quad_cache_rows, love_seed_row

            precond_state = self._precond_state(kp, z, lam, mask)
            nu, _ = self._solve(kp, z, lam, u.T, precond_state, mask)
            # Krylov seed + zero-u guard: ops/logdet.love_seed_row.
            start = love_seed_row((u * mask[:, None]).T, mask[None, :])
            rank = min(int(self.serving_lanczos_rank), int(z.shape[0]))
            lanczos_r = lanczos_quad_cache_rows(
                lambda rows: self._matvec(kp, z, lam, mask, rows), start, rank
            )
            return RowCGGPPosterior(
                kernel_params=kp, inducing_points=z, lam=lam, mask=mask,
                nu=nu, precond_state=precond_state, chol=None,
                lanczos_r=lanczos_r,
            )
        if solver != "cg":
            raise ValueError(f"unknown posterior solver: {solver!r}")
        precond_state = self._precond_state(kp, z, lam, mask)
        nu, _ = self._solve(kp, z, lam, u.T, precond_state, mask)
        return RowCGGPPosterior(
            kernel_params=kp, inducing_points=z, lam=lam, mask=mask,
            nu=nu, precond_state=precond_state, chol=None,
        )

    def posterior_mean(self, post: "RowCGGPPosterior", x_new: Array) -> Array:
        """CG-free serving mean: one skinny ``K(x, Z) @ nu`` matmul."""
        kmn = self.kernel.K(post.kernel_params, x_new, post.inducing_points)
        return (kmn * post.mask[None, :]) @ post.nu.T  # [T, 1]

    def posterior_predict(self, post: "RowCGGPPosterior", x_new: Array,
                          full_cov: bool = False) -> Tuple[Array, Array]:
        """Mean + variance from the cache: the per-batch solve covers only
        the [T, M] Kmn block (u column and preconditioner build amortized)."""
        kp = post.kernel_params
        z = post.inducing_points
        kmn = self.kernel.K(kp, x_new, z) * post.mask[None, :]  # [T, M]
        if post.lanczos_r is not None:
            # LOVE path: two skinny matmuls, solve-free (conservative
            # over-estimates; math in ops/logdet.love_variance).
            from cggp_tpu.ops.logdet import love_variance

            knn = self.kernel.K(kp, x_new) if full_cov \
                else self.kernel.K_diag(kp, x_new)
            fvar = love_variance(post.lanczos_r, kmn, knn, full_cov)
            return kmn @ post.nu.T, fvar
        if post.chol is not None:
            inv_kmn = jax.scipy.linalg.cho_solve((post.chol, True), kmn.T).T
        else:
            inv_kmn, _ = self._solve(
                kp, z, post.lam, kmn, post.precond_state, post.mask
            )
        if full_cov:
            knn = self.kernel.K(kp, x_new)
            fvar = (knn - kmn @ inv_kmn.T)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            fvar = (knn - jnp.sum(kmn * inv_kmn, axis=-1))[:, None]
        fmu = kmn @ post.nu.T
        return fmu, fvar

    def cg_stats(self, params: Dict, data: Tuple[Array, Array], key: jax.Array):
        """Iterations/residual of the fused solve (observability)."""
        x, _y = data
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        lam = self.diag_variance(params)[:, 0]
        m = z.shape[0]
        mask_row = jax.lax.stop_gradient(params["inducing_mask"])[:, 0][None, :]
        mask = mask_row[0]
        probes = rademacher(key, (2 * self.num_probes, m), z.dtype) * mask_row
        kmn = self.kernel.K(kp, x, z) * mask_row
        rhs = jnp.concatenate([u.T, probes, kmn], axis=0)
        _, stats = self._solve(
            kp, z, lam, rhs, self._precond_state(kp, z, lam, mask), mask
        )
        return stats


class RowCGGPPosterior(NamedTuple):
    """Serving cache produced by :meth:`RowSolveCGGP.posterior` — a pytree,
    so it passes straight through ``jax.jit`` as an argument (dense twin:
    :class:`cggp_tpu.models.cggp.CGGPPosterior`)."""

    kernel_params: Dict
    inducing_points: Array  # [M_pad, D] (pad-multiple rows, pads decoupled)
    lam: Array  # [M_pad] = sigma^2 / counts
    mask: Array  # [M_pad] 1 real / 0 pad
    nu: Array  # [1, M_pad] row = ((Kmm + Lambda)^{-1} u)^T
    precond_state: Tuple  # () = identity, else SpectralPreconditioner state
    chol: Optional[Array] = None  # [M_pad, M_pad] lower Cholesky (masked A)
    lanczos_r: Optional[Array] = None  # [k, M_pad] LOVE quad cache (solver="lanczos")
