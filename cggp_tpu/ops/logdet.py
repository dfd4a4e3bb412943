"""Log-determinant estimators built on CG.

Two estimators:

* :func:`eval_logdet` — exact port of the reference semantics
  (models.py:21-48): the *value* is the constant 0.0 and only the gradient is
  defined, ``d logdet / dA = A^{-1}``, computed by CG against the identity or
  by a Rademacher/Hutchinson trace estimator.  Consequence (inherited by
  design): ELBO *values* omit the true log-det; gradients are correct.

* :func:`slq_logdet` — the TPU-build upgrade: a stochastic Lanczos quadrature
  *value* estimator (so reported ELBOs are meaningful) with the same CG-based
  custom gradient, keeping gradient-path parity with the reference.

Randomness is explicit (JAX PRNG keys) instead of TF global RNG.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from cggp_tpu.ops.cg import ConjugateGradient, _cg_dense_impl

Array = jnp.ndarray


def rademacher(key, shape, dtype) -> Array:
    """+-1 probes (reference uses ``tfp.random.rademacher``, models.py:39)."""
    return jax.random.rademacher(key, shape, dtype=dtype)


def _logdet_grad(df, matrix, probes, precond_apply, precond_state, threshold,
                 max_iterations, max_steps_cycle, dot_name,
                 matvec_impl="xla", relative=False):
    """Shared backward rule: df * A^{-1} (dense or probe-estimated).

    ``matvec_impl``/``relative`` mirror the caller's facade configuration —
    dropping them (the old hardwired "xla"/False) made gradient solves use
    an ABSOLUTE stop target even when the user enabled relative thresholds
    because the absolute one is unreachable at their scale."""
    n = matrix.shape[-1]
    if probes is None:
        eye = jnp.eye(n, dtype=matrix.dtype)
        inv, _ = _cg_dense_impl(
            precond_apply, threshold, max_iterations, max_steps_cycle, dot_name,
            matvec_impl, relative, matrix, eye, jnp.zeros_like(eye), precond_state,
        )
        # Row-convention solve of the identity is A^{-T}; transpose as the
        # reference does (models.py:35) even though A is symmetric.
        return df * inv.T
    num_probes = probes.shape[-1]
    rv = df * probes  # [n, P] — valid since logdet is a scalar
    lv, _ = _cg_dense_impl(
        precond_apply, threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative, matrix, probes.T, jnp.zeros_like(probes.T),
        precond_state,
    )  # [P, n] row solutions of A x = probe
    return (lv.T @ rv.T) / jnp.asarray(num_probes, dtype=matrix.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _eval_logdet(precond_apply, threshold, max_iterations, max_steps_cycle,
                 dot_name, matvec_impl, relative, use_probes,
                 matrix, probes, precond_state):
    del precond_apply, threshold, max_iterations, max_steps_cycle, dot_name
    del matvec_impl, relative, use_probes, probes, precond_state
    return jnp.asarray(0.0, dtype=matrix.dtype)


def _eval_logdet_fwd(precond_apply, threshold, max_iterations, max_steps_cycle,
                     dot_name, matvec_impl, relative, use_probes,
                     matrix, probes, precond_state):
    value = jnp.asarray(0.0, dtype=matrix.dtype)
    return value, (matrix, probes, precond_state)


def _eval_logdet_bwd(precond_apply, threshold, max_iterations, max_steps_cycle,
                     dot_name, matvec_impl, relative, use_probes, residuals, df):
    matrix, probes, precond_state = residuals
    dA = _logdet_grad(
        df, matrix, probes if use_probes else None, precond_apply, precond_state,
        threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative,
    )
    d_probes = jnp.zeros_like(probes)
    d_state = jax.tree_util.tree_map(jnp.zeros_like, precond_state)
    return dA, d_probes, d_state


_eval_logdet.defvjp(_eval_logdet_fwd, _eval_logdet_bwd)


def _cg_static(cg: ConjugateGradient, n: int, preconditioner=None):
    """Static solver config for the estimators' internal CG solves.

    ``preconditioner`` overrides the facade's own (usually identity)
    preconditioner — callers with a per-step pivchol/rff state must thread
    it here so the logdet gradient solves converge in the same regime the
    rest of the training step does.
    """
    pre = preconditioner if preconditioner is not None else cg.preconditioner
    max_iterations = cg.max_iterations if cg.max_iterations is not None else n
    max_steps_cycle = cg.max_steps_cycle if cg.max_steps_cycle is not None else max_iterations + 1
    return (
        pre.apply,
        float(cg.error_threshold),
        int(max_iterations),
        int(max_steps_cycle),
        cg.dot,
        cg.matvec_impl,
        bool(cg.relative_threshold),
        pre.state,
    )


def eval_logdet(
    matrix: Array,
    cg: ConjugateGradient,
    num_probes: Optional[int] = None,
    key: Optional[jax.Array] = None,
    preconditioner=None,
    mask: Optional[Array] = None,
) -> Array:
    """Zero-valued log-det whose gradient is ``A^{-1}`` via CG.

    Matches reference models.py:21-48: with ``num_probes=None`` the gradient
    solves against the identity; otherwise it uses ``num_probes`` Rademacher
    probes drawn from ``key``.  ``preconditioner`` (optional) preconditions
    the gradient's internal solves.  ``mask`` [n] zeroes probe entries at the
    pad rows of a capacity-padded system (requires ``num_probes``: the
    identity-solve variant has no probes to mask).
    """
    n = matrix.shape[-1]
    (apply_fn, threshold, max_iterations, max_steps_cycle, dot_name,
     matvec_impl, relative, state) = _cg_static(cg, n, preconditioner)
    if num_probes is None:
        if mask is not None:
            raise ValueError(
                "eval_logdet(mask=...) requires num_probes — the "
                "identity-solve gradient would re-couple the pad rows"
            )
        probes = jnp.zeros((n, 1), dtype=matrix.dtype)  # placeholder, unused
        use_probes = False
    else:
        if key is None:
            raise ValueError("eval_logdet with num_probes requires an explicit PRNG key")
        probes = rademacher(key, (n, num_probes), matrix.dtype)
        if mask is not None:
            probes = probes * mask[:, None]
        use_probes = True
    return _eval_logdet(
        apply_fn, threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative, use_probes,
        matrix, probes, state,
    )


@jax.custom_vjp
def eval_logdet_from_solves(matrix: Array, probes: Array, solved_probes: Array) -> Array:
    """Zero-valued logdet whose gradient REUSES precomputed probe solves.

    ``solved_probes`` must be ``A^{-1} probes`` ([n, P] columns), already
    available when the caller batched the probe systems into its main CG
    solve (CGGP's fused ELBO).  The backward rule is the same Hutchinson
    estimator as :func:`eval_logdet` —
    ``dA = df * (A^{-1}probes) probes^T / P`` — but costs zero extra CG
    loops.  ``solved_probes`` is treated as a constant (stop-gradient
    semantics), exactly like the reference's custom gradient which never
    differentiates through the solver (models.py:21-48).
    """
    del matrix, solved_probes
    return jnp.zeros((), dtype=probes.dtype)


def _eval_logdet_from_solves_fwd(matrix, probes, solved_probes):
    del matrix
    return jnp.zeros((), dtype=probes.dtype), (probes, solved_probes)


def _eval_logdet_from_solves_bwd(residuals, df):
    probes, solved_probes = residuals
    num_probes = probes.shape[-1]
    dA = (df / jnp.asarray(num_probes, probes.dtype)) * (solved_probes @ probes.T)
    return dA, jnp.zeros_like(probes), jnp.zeros_like(solved_probes)


eval_logdet_from_solves.defvjp(_eval_logdet_from_solves_fwd, _eval_logdet_from_solves_bwd)


# ---------------------------------------------------------------------------
# Stochastic Lanczos quadrature (value estimator, net-new)
# ---------------------------------------------------------------------------


def _lanczos_tridiag(matrix: Array, v0: Array, num_iters: int):
    """Lanczos with full reorthogonalisation; returns (alphas, betas).

    ``num_iters`` is small (<= ~32) so the [k, n] basis fits easily and the
    per-step cost is one MXU matvec + two skinny matmuls.
    """
    n = matrix.shape[-1]
    dtype = matrix.dtype
    v0 = v0 / jnp.linalg.norm(v0)

    basis = jnp.zeros((num_iters, n), dtype=dtype).at[0].set(v0)

    def body(carry, i):
        basis, alphas, betas = carry
        v = basis[i]
        w = matrix @ v
        alpha = jnp.dot(w, v)
        w = w - alpha * v
        # Full reorthogonalisation against all previous vectors (two passes).
        for _ in range(2):
            w = w - basis.T @ (basis @ w)
        beta = jnp.linalg.norm(w)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        v_next = jnp.where(beta > 0, w / safe_beta, jnp.zeros_like(w))
        basis = jax.lax.cond(
            i + 1 < num_iters,
            lambda b: b.at[i + 1].set(v_next),
            lambda b: b,
            basis,
        )
        alphas = alphas.at[i].set(alpha)
        betas = betas.at[i].set(beta)
        return (basis, alphas, betas), None

    alphas = jnp.zeros((num_iters,), dtype=dtype)
    betas = jnp.zeros((num_iters,), dtype=dtype)
    (basis, alphas, betas), _ = jax.lax.scan(
        body, (basis, alphas, betas), jnp.arange(num_iters)
    )
    return alphas, betas[:-1]


def _slq_value(matrix: Array, probes: Array, lanczos_iters: int) -> Array:
    """SLQ estimate of ``logdet(A)`` from Rademacher probes [n, P].

    Each probe's quadrature is scaled by its own ``||z||^2`` (the Hutchinson
    weight — the same trick the sharded twin uses,
    parallel/sharded_cg.make_sharded_slq_value): for full Rademacher probes
    that is exactly ``n`` (value unchanged), while MASKED probes (pad-aware
    models zero pad entries) automatically target the real submatrix's
    dimension instead of over-counting by n/k.
    """
    dtype = matrix.dtype

    def one_probe(z):
        alphas, betas = _lanczos_tridiag(matrix, z, lanczos_iters)
        t = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
        evals, evecs = jnp.linalg.eigh(t)
        evals = jnp.maximum(evals, jnp.finfo(dtype).tiny)
        weights = jnp.square(evecs[0, :])
        return jnp.sum(z * z) * jnp.sum(weights * jnp.log(evals))

    per_probe = jax.vmap(one_probe, in_axes=1)(probes)
    return jnp.mean(per_probe)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _slq_logdet(precond_apply, threshold, max_iterations, max_steps_cycle,
                dot_name, matvec_impl, relative, lanczos_iters,
                matrix, probes, precond_state):
    del precond_apply, threshold, max_iterations, max_steps_cycle, dot_name
    del matvec_impl, relative, precond_state
    return _slq_value(matrix, probes, lanczos_iters)


def _slq_logdet_fwd(precond_apply, threshold, max_iterations, max_steps_cycle,
                    dot_name, matvec_impl, relative, lanczos_iters,
                    matrix, probes, precond_state):
    value = _slq_value(matrix, probes, lanczos_iters)
    return value, (matrix, probes, precond_state)


def _slq_logdet_bwd(precond_apply, threshold, max_iterations, max_steps_cycle,
                    dot_name, matvec_impl, relative, lanczos_iters,
                    residuals, df):
    matrix, probes, precond_state = residuals
    dA = _logdet_grad(
        df, matrix, probes, precond_apply, precond_state,
        threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative,
    )
    d_probes = jnp.zeros_like(probes)
    d_state = jax.tree_util.tree_map(jnp.zeros_like, precond_state)
    return dA, d_probes, d_state


_slq_logdet.defvjp(_slq_logdet_fwd, _slq_logdet_bwd)


def slq_logdet(
    matrix: Array,
    cg: ConjugateGradient,
    num_probes: int,
    key: jax.Array,
    lanczos_iters: int = 25,
    preconditioner=None,
    mask: Optional[Array] = None,
) -> Array:
    """Stochastic-Lanczos-quadrature log-det *value* with CG-probe gradient.

    Upgrade over :func:`eval_logdet` (SURVEY.md section 7, stage 3): the
    forward value is a genuine estimate of ``logdet(A)`` so ELBO values are
    meaningful; the backward rule is the same Rademacher/CG trace estimator,
    preserving the reference's gradient path.

    ``mask`` [n] (1 real / 0 pad) zeroes probe entries at pad rows, so both
    the value (``||z||^2``-scaled quadrature) and the gradient target the
    real submatrix of a capacity-padded system exactly.
    """
    n = matrix.shape[-1]
    (apply_fn, threshold, max_iterations, max_steps_cycle, dot_name,
     matvec_impl, relative, state) = _cg_static(cg, n, preconditioner)
    probes = rademacher(key, (n, num_probes), matrix.dtype)
    if mask is not None:
        probes = probes * mask[:, None]
    return _slq_logdet(
        apply_fn, threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative, int(lanczos_iters), matrix, probes, state,
    )


# ---------------------------------------------------------------------------
# Logdet estimators over an IMPLICIT operator (no [M, M] matrix argument):
# shared by the M-sharded multi-chip model (psum-blocked matvec/solve,
# parallel/model.py) and the single-chip matrix-free model (scanned panel
# matvec/solve, models/implicit.py).  Conventions:
#   matvec(kp, z, lam, mask, rows [R, M]) -> rows @ (K(Z,Z)*mask + diag(lam))
#   solve(kp, z, lam, rows, precond_state, mask) -> (solution_rows, stats)
#   precond_state_fn(kp, z, lam, mask) -> solver-state pytree (() = identity)
# ---------------------------------------------------------------------------


def make_matfree_logdet_from_solves(matvec):
    """Zero-valued logdet whose gradient reuses ALREADY-SOLVED probes
    (``solved = A^{-1} probes`` rows from a fused solve launch): the
    Hutchinson rule ``theta_bar = df/P * vjp(matvec at probes)(solved)``
    costs zero extra CG loops (dense twin: :func:`eval_logdet_from_solves`)."""

    @jax.custom_vjp
    def logdet(kp, z, lam, mask, probes, solved):
        del kp, z, lam, mask, solved
        return jnp.zeros((), dtype=probes.dtype)

    def fwd(kp, z, lam, mask, probes, solved):
        return jnp.zeros((), dtype=probes.dtype), (kp, z, lam, mask, probes, solved)

    def bwd(residuals, df):
        kp, z, lam, mask, probes, solved = residuals
        num_probes = probes.shape[0]
        w = solved * (df / jnp.asarray(num_probes, dtype=probes.dtype))
        _, matvec_vjp = jax.vjp(
            lambda kp_, z_, lam_: matvec(kp_, z_, lam_, mask, probes), kp, z, lam
        )
        kp_bar, z_bar, lam_bar = matvec_vjp(w)
        return (kp_bar, z_bar, lam_bar, jnp.zeros_like(mask),
                jnp.zeros_like(probes), jnp.zeros_like(solved))

    logdet.defvjp(fwd, bwd)
    return logdet


def make_matfree_eval_logdet(matvec, solve, precond_state_fn=None):
    """Zero-valued logdet over the implicit matrix; the gradient is the
    Rademacher/CG trace estimator (reference models.py:21-48 semantics),
    computed with matrix-free solves and a VJP of the matvec.

    ``precond_state_fn(kp, z, lam, mask)`` (optional) supplies the model's
    per-step preconditioner state for the backward probe solves — without it
    those solves run identity-preconditioned and silently stall in exactly
    the ill-conditioned regime preconditioning exists for.
    """

    @jax.custom_vjp
    def logdet(kp, z, lam, mask, probes):
        del kp, z, lam, mask
        return jnp.zeros((), dtype=probes.dtype)

    def fwd(kp, z, lam, mask, probes):
        return jnp.zeros((), dtype=probes.dtype), (kp, z, lam, mask, probes)

    def bwd(residuals, df):
        kp, z, lam, mask, probes = residuals
        num_probes = probes.shape[0]
        state = () if precond_state_fn is None else precond_state_fn(kp, z, lam, mask)
        solved, _ = solve(kp, z, lam, probes, state, mask)  # [P, M] rows of A^{-1} p
        w = solved * (df / jnp.asarray(num_probes, dtype=probes.dtype))
        # d logdet / d theta = tr(A^{-1} dA/dtheta) ~= (1/P) sum_p solved_p^T dA probe_p
        _, matvec_vjp = jax.vjp(
            lambda kp_, z_, lam_: matvec(kp_, z_, lam_, mask, probes), kp, z, lam
        )
        kp_bar, z_bar, lam_bar = matvec_vjp(w)
        return kp_bar, z_bar, lam_bar, jnp.zeros_like(mask), jnp.zeros_like(probes)

    logdet.defvjp(fwd, bwd)
    return logdet


def make_matfree_slq_logdet(slq_value, matvec, solve, precond_state_fn=None):
    """SLQ logdet VALUE over the implicit matrix, with the same CG-probe
    Hutchinson gradient as :func:`make_matfree_eval_logdet` — matrix-free
    twin of :func:`slq_logdet`: reported ELBO values become meaningful while
    the gradient path stays reference-exact (models.py:21-48).

    ``slq_value(kp, z, lam, mask, probes [P, M]) -> scalar`` supplies the
    forward estimate (e.g. :func:`slq_value_rows` over the model's matvec,
    or its shard_map'd twin).
    """

    @jax.custom_vjp
    def logdet(kp, z, lam, mask, probes):
        return slq_value(kp, z, lam, mask, probes)

    def fwd(kp, z, lam, mask, probes):
        return slq_value(kp, z, lam, mask, probes), (kp, z, lam, mask, probes)

    def bwd(residuals, df):
        kp, z, lam, mask, probes = residuals
        num_probes = probes.shape[0]
        state = () if precond_state_fn is None else precond_state_fn(kp, z, lam, mask)
        solved, _ = solve(kp, z, lam, probes, state, mask)
        w = solved * (df / jnp.asarray(num_probes, dtype=probes.dtype))
        _, matvec_vjp = jax.vjp(
            lambda kp_, z_, lam_: matvec(kp_, z_, lam_, mask, probes), kp, z, lam
        )
        kp_bar, z_bar, lam_bar = matvec_vjp(w)
        return kp_bar, z_bar, lam_bar, jnp.zeros_like(mask), jnp.zeros_like(probes)

    logdet.defvjp(fwd, bwd)
    return logdet


def lanczos_tridiag_rows(matvec_rows, v0_rows: Array, num_iters: int,
                         return_basis: bool = False):
    """Batched matrix-free Lanczos with full reorthogonalisation.

    ``matvec_rows`` maps [P, M] row-batched vectors to ``v @ A`` rows (the
    solver convention; A symmetric so this is also ``(A v)^T``) — e.g. the
    psum-blocked sharded matvec, whose per-call Gram-block build makes a
    one-probe-at-a-time loop wasteful.  All P probes advance together, so
    each Lanczos step is ONE matvec launch.  Returns
    ``(alphas [k, P], betas [k-1, P])`` — plus the orthonormal basis
    ``[k, P, M]`` when ``return_basis`` (zero rows past an early
    termination).
    """
    p, m = v0_rows.shape
    dtype = v0_rows.dtype
    norms = jnp.linalg.norm(v0_rows, axis=-1, keepdims=True)
    v0 = v0_rows / jnp.where(norms > 0, norms, 1.0)
    basis = jnp.zeros((num_iters, p, m), dtype=dtype).at[0].set(v0)

    def body(carry, i):
        basis, alphas, betas = carry
        v = basis[i]  # [P, M]
        w = matvec_rows(v)
        alpha = jnp.sum(w * v, axis=-1)  # [P]
        w = w - alpha[:, None] * v
        # Full reorthogonalisation per probe (twice is enough); unfilled
        # basis rows are zero, so projecting against them is a no-op.
        for _ in range(2):
            coef = jnp.einsum("kpm,pm->kp", basis, w)
            w = w - jnp.einsum("kp,kpm->pm", coef, basis)
        beta = jnp.linalg.norm(w, axis=-1)  # [P]
        safe = jnp.where(beta > 0, beta, 1.0)
        v_next = jnp.where((beta > 0)[:, None], w / safe[:, None], jnp.zeros_like(w))
        basis = jax.lax.cond(
            i + 1 < num_iters, lambda b: b.at[i + 1].set(v_next), lambda b: b, basis
        )
        return (basis.astype(dtype), alphas.at[i].set(alpha), betas.at[i].set(beta)), None

    alphas = jnp.zeros((num_iters, p), dtype=dtype)
    betas = jnp.zeros((num_iters, p), dtype=dtype)
    (basis, alphas, betas), _ = jax.lax.scan(
        body, (basis, alphas, betas), jnp.arange(num_iters)
    )
    if return_basis:
        return alphas, betas[:-1], basis
    return alphas, betas[:-1]


@jax.jit
def _lanczos_orth_step(basis, alphas, betas, w, i):
    """One Lanczos orthogonalisation step of the host-chunked recurrence —
    module-level so jit caching survives across calls (the per-host compile
    cache keys on source location; a per-call closure would retrace every
    posterior build)."""
    v = basis[i]
    alpha = jnp.sum(w * v, axis=-1)
    w = w - alpha[:, None] * v
    for _ in range(2):
        coef = jnp.einsum("kpm,pm->kp", basis[:-1], w)
        w = w - jnp.einsum("kp,kpm->pm", coef, basis[:-1])
    beta = jnp.linalg.norm(w, axis=-1)
    safe = jnp.where(beta > 0, beta, 1.0)
    v_next = jnp.where((beta > 0)[:, None], w / safe[:, None],
                       jnp.zeros_like(w))
    return (basis.at[i + 1].set(v_next),
            alphas.at[i].set(alpha), betas.at[i].set(beta))


@jax.jit
def _lanczos_row_at(basis, i):
    return basis[i]


def lanczos_tridiag_rows_chunked(matvec_rows, v0_rows: Array,
                                 num_iters: int,
                                 return_basis: bool = False):
    """Host-driven twin of :func:`lanczos_tridiag_rows`: ONE bounded device
    dispatch per Lanczos iteration (the matvec) plus a small fixed-shape
    orthogonalisation program — for dispatch-limited runtimes where the
    whole ``num_iters``-step scan would exceed the per-program execution
    budget (docs/PERF.md round-4: ~60 s watchdog; a 128-step LOVE build at
    N=262k measures minutes as one program).

    The recurrence, full reorthogonalisation (against the zero-padded full
    basis, twice), and early-termination handling are IDENTICAL to the
    scanned version, so the tridiagonals match it to floating-point noise.
    Eager only (host loop; call OUTSIDE jit, with ``matvec_rows`` already
    jitted).
    """
    p, m = v0_rows.shape
    dtype = v0_rows.dtype
    norms = jnp.linalg.norm(v0_rows, axis=-1, keepdims=True)
    v0 = v0_rows / jnp.where(norms > 0, norms, 1.0)
    basis = jnp.zeros((num_iters + 1, p, m), dtype=dtype).at[0].set(v0)
    alphas = jnp.zeros((num_iters, p), dtype=dtype)
    betas = jnp.zeros((num_iters, p), dtype=dtype)

    for i in range(num_iters):
        w = matvec_rows(_lanczos_row_at(basis, jnp.asarray(i)))  # bounded
        basis, alphas, betas = _lanczos_orth_step(
            basis, alphas, betas, w, jnp.asarray(i))
    if return_basis:
        return alphas, betas[:-1], basis[:-1]
    return alphas, betas[:-1]


def slq_value_rows_chunked(matvec_rows, probes_rows: Array,
                           lanczos_iters: int) -> Array:
    """Host-chunked :func:`slq_value_rows`: the same Gauss-quadrature logdet
    VALUE with one bounded dispatch per Lanczos step."""
    alphas, betas = lanczos_tridiag_rows_chunked(
        matvec_rows, probes_rows, lanczos_iters)
    return _slq_from_tridiag(alphas, betas, probes_rows)


def lanczos_quad_cache_rows_chunked(matvec_rows, start_row: Array,
                                    rank: int) -> Array:
    """Host-chunked :func:`lanczos_quad_cache_rows`: the same LOVE serving
    cache with one bounded dispatch per Lanczos step — the rank-k build at
    N beyond the single-program ceiling."""
    alphas, betas, basis = lanczos_tridiag_rows_chunked(
        matvec_rows, start_row, rank, return_basis=True)
    return _love_cache_from_tridiag(alphas, betas, basis)


def love_seed_row(u_row: Array, mask_row: Optional[Array] = None) -> Array:
    """Krylov seed for the LOVE serving cache (single source of truth for
    the zero-seed guard — previously hand-copied across the dense,
    matrix-free, and exact-GP posterior builders).

    The natural seed is the cache's own RHS (pseudo-observations/targets);
    when that row is ALL-ZERO (hyperparameters-only config dirs) it would
    yield a zero Lanczos basis and the cache would silently serve PRIOR
    variances — fall back to a fixed (masked) Gaussian instead.
    ``u_row`` is [1, M], pre-masked if padded; ``mask_row`` [1, M] masks the
    fallback so the Krylov space never leaves the real coordinates.
    """
    u_row = jax.lax.stop_gradient(u_row)
    fallback = jax.random.normal(jax.random.PRNGKey(0), u_row.shape,
                                 u_row.dtype)
    if mask_row is not None:
        fallback = fallback * jax.lax.stop_gradient(mask_row)
    return jnp.where(jnp.linalg.norm(u_row) > 0.0, u_row, fallback)


def love_variance(lanczos_r: Array, kmn_rows: Array, knn: Array,
                  full_cov: bool):
    """Predictive (co)variance from a LOVE cache (single source of truth
    for the quad math): ``quad(x) ~= ||R k(x)||^2`` with ``R`` [k, M] from
    :func:`lanczos_quad_cache_rows` — an UNDER-estimate of the true
    quadratic form, so the returned variance is a conservative
    OVER-estimate.  ``kmn_rows`` is [T, M] (dense callers pass ``kmn.T``);
    ``knn`` is the [T] kernel diagonal, or the [T, T] full kernel block
    when ``full_cov``.  Returns [T, 1] diag variance or [1, T, T] cov.
    """
    rk = jnp.matmul(lanczos_r, kmn_rows.T,
                    precision=jax.lax.Precision.HIGHEST)  # [k, T]
    if full_cov:
        return (knn - rk.T @ rk)[None, ...]
    return (knn - jnp.sum(jnp.square(rk), axis=0))[:, None]


def lanczos_quad_cache_rows(matvec_rows, start_row: Array, rank: int) -> Array:
    """Rank-``k`` quadratic-form cache for ``A^{-1}`` (LOVE-style serving,
    Pleiss et al. 2018, done matrix-free): from a ``k``-step Lanczos
    decomposition ``A ~ Q^T T Q`` (``Q`` [k, M] orthonormal rows), returns
    ``R = L_T^{-1} Q`` with ``T = L_T L_T^T``, so

        x^T A^{-1} x  ~=  || R x ||^2        (two skinny matmuls per batch).

    The Gauss-quadrature estimate UNDER-approximates ``x^T A^{-1} x`` for
    SPD ``A``, so predictive variances built as ``k_diag - quad`` are
    conservative (over-estimates), converging monotonically as ``rank``
    grows; with full reorthogonalisation and ``rank = M`` the cache is
    exact.  ``start_row`` [1, M] seeds the Krylov space (use the cache's own
    RHS, e.g. pseudo-observations/targets — pre-masked if padded: the space
    then never leaves the real coordinates).
    """
    alphas, betas, basis = lanczos_tridiag_rows(
        matvec_rows, start_row, rank, return_basis=True
    )
    return _love_cache_from_tridiag(alphas, betas, basis)


def _love_cache_from_tridiag(alphas: Array, betas: Array,
                             basis: Array) -> Array:
    """``R = L_T^{-1} Q`` from a single-seed Lanczos decomposition (shared
    by the one-program and host-chunked builders)."""
    a, b = alphas[:, 0], betas[:, 0]
    q = basis[:, 0, :]  # [k, M]
    dtype = q.dtype
    # Early termination: once the Krylov space is exhausted beta is not an
    # exact zero but reorthogonalisation residue (~eps), and the "basis"
    # rows past that point are normalised noise — carrying them corrupts T
    # AND R (measured: rank > dim inflated quadratic forms 1.7x).  Cut at a
    # relative tolerance, give T an identity block there, and ZERO the junk
    # basis rows so the corresponding R rows vanish.
    tol = jnp.sqrt(jnp.finfo(dtype).eps) * jnp.maximum(
        jnp.max(jnp.abs(a)), jnp.max(b)
    )
    bad = jnp.concatenate([jnp.zeros((1,), bool), b <= tol])
    used = jnp.cumsum(bad) == 0
    q = jnp.where(used[:, None], q, 0.0)
    diag = jnp.where(used, a, 1.0)
    off = jnp.where(used[1:], b, 0.0)
    t = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    chol_t = jnp.linalg.cholesky(t)
    return jax.scipy.linalg.solve_triangular(chol_t, q, lower=True)  # [k, M]


def slq_value_rows(matvec_rows, probes_rows: Array, lanczos_iters: int) -> Array:
    """SLQ ``logdet`` estimate from row-batched probes through a matvec.

    Per-probe Hutchinson scaling is ``||z_p||^2`` (not the ambient dimension),
    so MASKED probes — zero on padded inducing points, as the sharded model
    uses (parallel/model.py) — estimate the log-det of the REAL submatrix:
    the Krylov space of a masked probe never leaves the real coordinates
    because pad rows/columns are decoupled.
    """
    alphas, betas = lanczos_tridiag_rows(matvec_rows, probes_rows, lanczos_iters)
    return _slq_from_tridiag(alphas, betas, probes_rows)


def _slq_from_tridiag(alphas: Array, betas: Array,
                      probes_rows: Array) -> Array:
    """Gauss-quadrature logdet from per-probe Lanczos tridiagonals (shared
    by the one-program and host-chunked SLQ paths)."""
    dtype = probes_rows.dtype

    def one_probe(a, b):  # a [k], b [k-1]
        t = jnp.diag(a) + jnp.diag(b, 1) + jnp.diag(b, -1)
        evals, evecs = jnp.linalg.eigh(t)
        evals = jnp.maximum(evals, jnp.finfo(dtype).tiny)
        weights = jnp.square(evecs[0, :])
        return jnp.sum(weights * jnp.log(evals))

    quad = jax.vmap(one_probe, in_axes=(1, 1))(alphas, betas)  # [P]
    scale = jnp.sum(jnp.square(probes_rows), axis=-1)  # ||z_p||^2
    return jnp.mean(scale * quad)


def lanczos_extremal_eigs(matrix: Array, key: jax.Array, num_iters: int = 64):
    """Estimate (eig_min, eig_max) of a symmetric PSD matrix via the extremal
    Ritz values of a ``num_iters``-step Lanczos tridiagonalisation (net-new:
    the reference computes condition numbers with dense ``eigvalsh``,
    paper_cli_uci.py:174-185 — O(M^3), unusable at large M; this is
    O(num_iters * M^2) with the matvec on the MXU).

    Extremal Ritz values converge to the extremal eigenvalues first, so a few
    dozen iterations give percent-level estimates on kernel spectra; the
    returned ``eig_min`` is an over-estimate and ``eig_max`` an under-estimate
    (condition numbers are mildly optimistic).
    """
    n = matrix.shape[-1]
    dtype = matrix.dtype
    v0 = jax.random.normal(key, (n,), dtype)
    alphas, betas = _lanczos_tridiag(matrix, v0, num_iters)
    return _ritz_extremes(alphas, betas)


def _ritz_extremes(alphas: Array, betas: Array):
    """(eig_min, eig_max) Ritz estimates from Lanczos (alphas [k], betas
    [k-1]).  If Lanczos terminated early (beta == 0, Krylov space
    exhausted), the trailing rows are zero; fill their diagonal with a
    Rayleigh quotient (guaranteed inside [eig_min, eig_max]) so they are
    never extremal."""
    bad = jnp.concatenate([jnp.zeros((1,), bool), betas <= 0.0])
    used = jnp.cumsum(bad) == 0
    diag = jnp.where(used, alphas, alphas[0])
    off = jnp.where(used[1:], betas, 0.0)
    t = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    evs = jnp.linalg.eigvalsh(t)
    return evs[0], evs[-1]


def lanczos_extremal_eigs_rows(matvec_rows, key: jax.Array, n: int, dtype,
                               num_iters: int = 64,
                               mask: Optional[Array] = None):
    """Matrix-free :func:`lanczos_extremal_eigs`: the operator is given as a
    row-convention matvec (``[1, M] -> v @ A``) — e.g. the blocked implicit
    matvec or the psum-sharded one.  A masked start vector keeps the Krylov
    space inside the REAL coordinates of a padded system (pads are
    decoupled), so the estimate covers the real submatrix only."""
    v0 = jax.random.normal(key, (1, n), dtype)
    if mask is not None:
        v0 = v0 * mask.reshape(1, -1)
    alphas, betas = lanczos_tridiag_rows(matvec_rows, v0, num_iters)
    return _ritz_extremes(alphas[:, 0], betas[:, 0])
