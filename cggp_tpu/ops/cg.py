"""Batched preconditioned conjugate gradients with a hand-written VJP.

TPU-native re-design of the reference solver (conjugate_gradient.py:24-122):

* ``tf.while_loop``            -> ``jax.lax.while_loop`` over a ``CGState``
* ``@tf.custom_gradient``      -> ``jax.custom_vjp`` whose backward pass is
                                  *another CG solve* (db = A^{-1} dx,
                                  dA = -solution^T db), never differentiating
                                  through the loop itself
* row-batched RHS ``[m, n]``   -> kept: every iteration is one ``P @ A``
                                  matmul ([m, n] x [n, n]) that XLA tiles onto
                                  the MXU; batching the KL / predict / probe
                                  solves into rows is what keeps the MXU busy

Semantics preserved exactly (reference line cites):
* stop when all ``0.5 ||r||^2 <= threshold`` or ``i == max_iterations`` (:59-62)
* gamma-guard against division by <= 1e-16 (:66-68)
* periodic residual recompute ``r = b - v A`` every ``max_steps_cycle`` (:71-76)
* preconditioner protocol ``(vec, mat) -> (z, r^T z)`` (:125-128)
* returns ``(solution, (steps, 0.5 * final_rz))`` (:96-98, :120)

Net-new vs the reference:
* a Nystrom/RFF preconditioner (Woodbury solve against a low-rank+diagonal
  approximation of ``K + Lambda``) — BASELINE.md parity config 4
* optional compensated (Kahan) fp32 inner products for TPU runs where fp64
  is emulated and slow
* the loop body is factored as :func:`cg_loop` over an abstract ``matvec`` so
  the SPMD path (``cggp_tpu.parallel``) can reuse it inside ``shard_map``
  with a psum-blocked matvec.
"""

from __future__ import annotations

import functools
import warnings
from typing import Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from cggp_tpu.ops.linalg import compensated_dot

Array = jnp.ndarray


class CGState(NamedTuple):
    """Loop-carried state (reference conjugate_gradient.py:10-21)."""

    i: Array  # iteration counter, int32
    v: Array  # current solution, [m, n]
    r: Array  # residual, [m, n]
    p: Array  # search direction, [m, n]
    rz: Array  # preconditioned inner product r^T z, [m, 1]


class CGStats(NamedTuple):
    steps: Array  # int32 iterations executed
    error: Array  # 0.5 * final rz, [m, 1]
    converged: Optional[Array] = None  # bool scalar: stop rule met at exit.
    # ``steps == max_iterations`` alone cannot distinguish "hit the cap
    # unconverged" from "converged exactly on the last permitted iteration";
    # the loop evaluates its own stop rule once more at exit to settle it.


def _standard_dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _kahan_dot(a: Array, b: Array) -> Array:
    return compensated_dot(a, b, keepdims=True)


_DOT_FNS = {"standard": _standard_dot, "compensated": _kahan_dot}


@functools.lru_cache(maxsize=4)
def _eye_for(dot: str) -> "EyePreconditioner":
    """Cached default identity preconditioner per dot mode: repeated
    eager chunk dispatches must hash the SAME .apply (jit static arg)."""
    return EyePreconditioner(dot)


# ---------------------------------------------------------------------------
# Preconditioners
# ---------------------------------------------------------------------------


class EyePreconditioner:
    """Identity: ``z = r``, ``rz = ||r||^2`` (reference :131-134)."""

    state: tuple = ()

    def __init__(self, dot: str = "standard"):
        self._dot = dot
        dot_fn = _DOT_FNS[dot]

        def _apply(state, vec, mat):
            del state, mat
            return vec, dot_fn(vec, vec)

        # Built ONCE per instance (a property returning a fresh closure per
        # access defeats jit caching wherever .apply is a static argument —
        # e.g. the _dense_chunk program would retrace every chunk).
        self._apply = _apply

    @property
    def apply(self):
        return self._apply

    def __call__(self, vec: Array, mat: Array) -> Tuple[Array, Array]:
        return self.apply(self.state, vec, mat)


class BlockPreconditioner:
    """Block-Jacobi: per-block Cholesky solves (reference :137-157).

    ``block_indices`` is an int array [num_blocks, block_size] that must
    PARTITION the index range (each index in exactly one block).
    Overlapping blocks are unsupported: the scatter that reassembles the
    preconditioned residual resolves duplicate indices nondeterministically,
    producing a non-symmetric operator that can stall or diverge CG.  The
    reference gathers sub-blocks with ``tf.gather_nd`` +
    ``tf.vectorized_map``; here a single ``vmap`` over fancy-indexed blocks.
    """

    def __init__(self, block_indices):
        self.state = (jnp.asarray(block_indices, dtype=jnp.int32),)

    @staticmethod
    def apply(state, vec: Array, mat: Array) -> Tuple[Array, Array]:
        (block_indices,) = state

        def solve_block(indices):
            b = vec[..., indices]  # [m, bs]
            a = mat[indices[:, None], indices[None, :]]  # [bs, bs]
            chol = jnp.linalg.cholesky(a)
            sol = jax.scipy.linalg.cho_solve((chol, True), b.T)  # [bs, m]
            return sol.T  # [m, bs]

        blocks = jax.vmap(solve_block)(block_indices)  # [nb, m, bs]
        m = vec.shape[0]
        n = vec.shape[-1]
        z = jnp.zeros((m, n), dtype=vec.dtype)
        flat_idx = block_indices.reshape(-1)
        flat_blocks = jnp.moveaxis(blocks, 1, 0).reshape(m, -1)  # [m, nb*bs]
        z = z.at[:, flat_idx].set(flat_blocks)
        rz = _standard_dot(z, vec)
        return z, rz

    def __call__(self, vec: Array, mat: Array) -> Tuple[Array, Array]:
        return self.apply(self.state, vec, mat)


class NystromPreconditioner:
    """Low-rank + diagonal Woodbury preconditioner (net-new; no reference twin).

    Approximates ``A = Kuu + diag(lam)`` by ``U U^T + diag(lam)`` where ``U``
    is an [n, k] factor (Nystrom pivots or RFF features of the inducing
    points) and applies the exact Woodbury inverse of the approximation:

        z^T = D^{-1} r^T - D^{-1} U (I_k + U^T D^{-1} U)^{-1} U^T D^{-1} r^T

    The [k, k] Cholesky is computed once at construction, so each CG
    iteration costs two skinny [n, k] matmuls — MXU-friendly and O(n k)
    memory.  With a rank-k spectral sketch this bounds the effective
    condition number by roughly (lambda_k + max lam) / min lam.
    """

    def __init__(self, factor: Array, lam: Array):
        factor = jnp.asarray(factor)
        lam = jnp.asarray(lam).reshape(-1)
        d_inv = 1.0 / lam
        ud = factor * d_inv[:, None]  # D^{-1} U, [n, k]
        k = factor.shape[-1]
        small = jnp.eye(k, dtype=factor.dtype) + factor.T @ ud
        chol = jnp.linalg.cholesky(small)
        self.state = (ud, chol, d_inv)

    @staticmethod
    def apply(state, vec: Array, mat: Array) -> Tuple[Array, Array]:
        del mat
        ud, chol, d_inv = state
        vd = vec * d_inv[None, :]  # [m, n] = r D^{-1} (row convention)
        w = vec @ ud  # r D^{-1} U: [m, k]
        w = jax.scipy.linalg.cho_solve((chol, True), w.T).T  # [m, k]
        z = vd - w @ ud.T
        rz = _standard_dot(z, vec)
        return z, rz

    def __call__(self, vec: Array, mat: Array) -> Tuple[Array, Array]:
        return self.apply(self.state, vec, mat)


class SpectralPreconditioner:
    """Cancellation-free low-rank+diagonal preconditioner (net-new).

    Same target operator as :class:`NystromPreconditioner` — the exact
    inverse of ``U U^T + diag(lam)`` — but applied in a form that stays SPD
    in fp32 on TPU, where the plain Woodbury identity cancels
    catastrophically once ``||U||^2 / min(lam)`` is large (the measured
    failure mode that made per-step RFF preconditioning regress, see
    docs/PERF.md).

    Construction diagonalizes the whitened factor ``W = D^{-1/2} U``:
    with ``W^T W = V diag(s2) V^T`` and ``Q = W V diag(s2^{-1/2})``
    (orthonormal columns),

        (U U^T + D)^{-1} = D^{-1/2} [ (I - Q Q^T) + Q diag(1/(1+s2)) Q^T ] D^{-1/2}

    — a sum of two PSD terms with no large-magnitude subtraction.  The apply
    re-orthogonalizes the projection once (classic twice-is-enough) and
    accumulates ``r^T z`` as ``||y_perp||^2 + sum(w t^2)``, which is positive
    by construction, so CG never sees an indefinite preconditioner even at
    fp32.  Cost per iteration: four skinny [m, n] x [n, k] matmuls.
    """

    def __init__(self, factor: Array, lam: Array):
        hi = jax.lax.Precision.HIGHEST
        factor = jnp.asarray(factor)
        lam = jnp.asarray(lam).reshape(-1)
        dtype = factor.dtype
        d_inv_sqrt = jax.lax.rsqrt(lam.astype(dtype))
        w_fac = factor * d_inv_sqrt[:, None]  # D^{-1/2} U, [n, k]
        # QR first: Householder Q is orthonormal to machine precision no
        # matter how ill-conditioned W is, unlike eigenvectors of W^T W
        # (which squares the condition number — at fp32 with 1/lam ~ 1e4
        # that route produced a far-from-orthonormal Q and a preconditioner
        # that SLOWED CG down).
        q, r_fac = jnp.linalg.qr(w_fac)
        small = jnp.matmul(r_fac, r_fac.T, precision=hi)  # [k, k], = Q^T W W^T Q
        # TPU's eigh (QDWH/Jacobi, not LAPACK) returns NaN on numerically
        # rank-deficient SPD inputs; a relative ridge repairs that and only
        # shifts the spectrum by O(eps) (weights 1/(1+s2) barely move).
        k = small.shape[-1]
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype=dtype)
        ridge = 10.0 * eps * jnp.maximum(jnp.trace(small) / k, 1.0)
        s2, v = jnp.linalg.eigh(small + ridge * jnp.eye(k, dtype=dtype))
        s2 = jnp.maximum(s2 - ridge, 0.0)
        q = jnp.matmul(q, v, precision=hi)  # still orthonormal (V orthogonal)
        weights = 1.0 / (1.0 + s2)
        self.state = (q, weights, d_inv_sqrt)

    @staticmethod
    def apply(state, vec: Array, mat: Array) -> Tuple[Array, Array]:
        del mat
        q, weights, d_inv_sqrt = state
        hi = jax.lax.Precision.HIGHEST
        y = vec * d_inv_sqrt[None, :]  # [m, n]
        t = jnp.matmul(y, q, precision=hi)  # [m, k]
        y_perp = y - jnp.matmul(t, q.T, precision=hi)
        # Re-orthogonalize: after this, Q^T y_perp ~ 0 to working precision
        # even when y is almost entirely inside span(Q).
        t2 = jnp.matmul(y_perp, q, precision=hi)
        y_perp = y_perp - jnp.matmul(t2, q.T, precision=hi)
        wt = t * weights[None, :]
        z = (y_perp + jnp.matmul(wt, q.T, precision=hi)) * d_inv_sqrt[None, :]
        rz = jnp.sum(jnp.square(y_perp), axis=-1, keepdims=True) + jnp.sum(
            wt * t, axis=-1, keepdims=True
        )
        return z, rz

    def __call__(self, vec: Array, mat: Array) -> Tuple[Array, Array]:
        return self.apply(self.state, vec, mat)


class CholPreconditioner:
    """Exact-factor preconditioner: PCG becomes iterative refinement
    (net-new; no reference twin).

    Factorizes ``A = matrix + diag(lam)`` ONCE with XLA's blocked Cholesky
    and stores the triangular inverse ``W = L^{-1}``; the apply is

        z = r W^T W          rz = ||r W^T||^2

    — two [R, M] x [M, M] MXU matmuls per iteration (same order as the CG
    matvec itself).  Because the preconditioner operator is literally
    ``W^T W``, it is SPD **by construction** and ``rz`` is a sum of squares,
    so CG never sees an indefinite operator no matter how badly fp32
    rounding degraded the factor.  Three regimes:

    - accurate factor: converges in 1-3 iterations (Cholesky solve with a
      Krylov-corrected residual — the mixed-precision iterative-refinement
      pattern, done through the existing CG custom VJP so gradient
      semantics are untouched);
    - degraded factor (large kappa * eps): more refinement iterations,
      still converging on the TRUE residual;
    - failed factor (non-finite after cholesky): the state silently falls
      back to ``W = I`` = plain CG, so a training step can never be
      poisoned by a bad factorization — the failure mode that rules out
      raw Cholesky *solves* at fp32 (see ``CGGP.posterior`` solver="auto").

    Build cost is one Cholesky + one triangular solve against I (both
    O(M^3) blocked ops); see docs/PERF.md round-3 chol-preconditioning
    A/B for when the iteration cut repays it.  The state is a dict
    (``{"chol_w": W}``) so the state-based plumbing (chunk-frozen
    preconditioning, posterior caches) can distinguish it from the 3-tuple
    ``SpectralPreconditioner`` state by pytree structure alone.
    """

    def __init__(self, matrix: Array, lam: Array):
        a = jnp.asarray(matrix)
        lam = jnp.asarray(lam).reshape(-1)
        a = a + jnp.diag(lam.astype(a.dtype))
        m = a.shape[-1]
        eye = jnp.eye(m, dtype=a.dtype)
        chol = jnp.linalg.cholesky(a)
        w = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
        ok = jnp.all(jnp.isfinite(w))
        self.state = {"chol_w": jnp.where(ok, w, eye)}

    @staticmethod
    def apply(state, vec: Array, mat: Array) -> Tuple[Array, Array]:
        del mat
        w = state["chol_w"]
        hi = jax.lax.Precision.HIGHEST
        y = jnp.matmul(vec, w.T, precision=hi)  # [R, M] = (L^{-1} r^T)^T
        z = jnp.matmul(y, w, precision=hi)
        rz = jnp.sum(jnp.square(y), axis=-1, keepdims=True)
        return z, rz

    def __call__(self, vec: Array, mat: Array) -> Tuple[Array, Array]:
        return self.apply(self.state, vec, mat)


def spectral_precond_state(factor: Array, lam: Array):
    """Build :class:`SpectralPreconditioner` state (pure jnp ops; jit-safe).

    Single definition shared by the row-solver models and the sharded CG
    (both previously carried verbatim copies)."""
    return SpectralPreconditioner(factor, lam).state


def pivoted_cholesky_preconditioner(matrix: Array, lam: Array, rank: int) -> "SpectralPreconditioner":
    """Rank-``rank`` pivoted-Cholesky preconditioner for ``matrix + diag(lam)``.

    Factors ``matrix ~= L L^T`` greedily (largest-diagonal pivots — the
    optimal trace-error choice) and wraps the stable SPD Woodbury apply.
    This targets the actual top eigenspace of the kernel matrix, unlike the
    randomized RFF sketch, so it is the preferred fp32 preconditioner for
    ill-conditioned ``Kuu + Lambda`` systems.
    """
    from cggp_tpu.ops.linalg import pivoted_cholesky

    factor = pivoted_cholesky(matrix, rank)
    return SpectralPreconditioner(factor, lam)


def precond_apply_or_identity(state, vec: Array, mat) -> Tuple[Array, Array]:
    """Identity when ``state`` is the empty pytree, else the stable low-rank
    :class:`SpectralPreconditioner` apply.  The branch is on pytree STRUCTURE
    (static at trace time), so unpreconditioned solves compile with zero
    preconditioner code.  Shared by the matrix-free and sharded solvers,
    whose solve functions take a preconditioner *state* pytree rather than a
    preconditioner object."""
    if state == ():
        del mat
        return vec, jnp.sum(jnp.square(vec), axis=-1, keepdims=True)
    return SpectralPreconditioner.apply(state, vec, mat)


CGPreconditioner = Union[
    EyePreconditioner, BlockPreconditioner, NystromPreconditioner,
    SpectralPreconditioner, CholPreconditioner
]


# ---------------------------------------------------------------------------
# Core loop (shared by the dense and sharded paths)
# ---------------------------------------------------------------------------


def cg_loop(
    matvec: Callable[[Array], Array],
    precond_apply: Callable,
    precond_state,
    b: Array,
    v0: Array,
    *,
    error_threshold: float,
    max_iterations: int,
    max_steps_cycle: int,
    dot: Callable[[Array, Array], Array] = _standard_dot,
    mat_for_precond: Optional[Array] = None,
    relative_threshold: bool = False,
    iteration_budget: Optional[Array] = None,
    p0: Optional[Array] = None,
    return_state: bool = False,
):
    """Run PCG on ``v A = b`` (row convention) with an abstract matvec.

    ``matvec(p)`` must return ``p @ A`` for the (implicit) symmetric matrix A.
    Inside ``shard_map`` the caller supplies a psum-reducing matvec and the
    rest of the loop runs on replicated [m, n] blocks unchanged.

    ``relative_threshold=False`` is the reference's absolute rule — stop when
    all ``0.5 ||r_i||^2 <= threshold`` (conjugate_gradient.py:59-62).  With
    large fused RHS blocks an absolute target is scale-dependent and can be
    unreachable within the iteration budget; ``relative_threshold=True``
    (net-new) scales each row's target by its own ``0.5 ||b_i||^2``.

    ``p0`` (net-new, round-4 dispatch-bounded machinery): carry the search
    direction across bounded chunk dispatches — RESIDUAL-REPLACEMENT CG
    (van der Vorst): the entry residual is always the TRUE ``b - v0 A``
    (controlling recurrence drift) while the carried ``p0`` preserves the
    Krylov momentum a plain restart throws away (the measured "last decade
    is slow" penalty of restarted chunks, docs/PERF.md round-4).  ``None``
    keeps restart semantics (``p = z``).  ``return_state=True``
    additionally returns the final :class:`CGState` so the caller can
    resume the NEXT chunk from ``state.v`` / ``state.p``.
    """
    dtype = v0.dtype
    min_float = jnp.asarray(1e-16, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    threshold = jnp.asarray(error_threshold, dtype=dtype)
    if relative_threshold:
        threshold = threshold * 0.5 * jnp.sum(
            jnp.square(b), axis=-1, keepdims=True
        )  # [m, 1] per-row targets

    def stopping_condition(state: CGState) -> Array:
        norm_r_sq = jnp.sum(jnp.square(state.r), axis=-1, keepdims=True)
        over_threshold = jnp.any(0.5 * norm_r_sq > threshold)
        in_budget = state.i < max_iterations
        if iteration_budget is not None:
            # Traced upper bound (e.g. the iterative-refinement caller's
            # remaining budget); max_iterations stays static so the
            # restart-branch elision below remains a compile-time decision.
            in_budget = jnp.logical_and(in_budget, state.i < iteration_budget)
        return jnp.logical_and(over_threshold, in_budget)

    # With the facade default max_steps_cycle = max_iterations + 1 the restart
    # branch can never fire — compile it out entirely.  This matters: the
    # restart branch contains a SECOND matvec (b - v A), and lax.cond inside
    # the while_loop ends up paying for it every iteration (measured ~3x
    # slower than the branch-free loop at M=1024 on v5e).
    never_restart = max_steps_cycle > max_iterations

    def cg_step(state: CGState) -> CGState:
        pA = matvec(state.p)
        denom = dot(state.p, pA)
        # Curvature guards, per row, two tiers:
        # * 0 <= denom <= 1e-16 (a converged row's direction shrank to
        #   noise): gamma = 0 and KEEP the beta-momentum — the reference's
        #   exact rule (conjugate_gradient.py:66-68), preserved bit-for-bit
        #   so the reference golden tests stay tight.
        # * denom < 0 (the matvec looks INDEFINITE along p): impossible for
        #   an SPD system in exact arithmetic — it appears only when matvec
        #   error exceeds the diagonal shift (e.g. a bf16 matrix copy at
        #   tiny Lambda).  gamma = 0 alone then grew p additively every
        #   iteration (r unchanged => new_rz = rz => p <- z + p) until fp32
        #   OVERFLOW (observed: NaN params at the e2e shape under bf16_ir);
        #   restarting the direction from the preconditioned residual
        #   (p <- z, the standard stagnation remedy) keeps p bounded.
        indefinite = denom < -min_float  # [m, 1] (sub-1e-16 negatives are roundoff)
        gamma = jnp.where(denom <= min_float, zero, state.rz / denom)
        v = state.v + gamma * state.p
        i = state.i + 1
        if never_restart:
            r = state.r - gamma * pA
            z, new_rz = precond_apply(precond_state, r, mat_for_precond)
            # Keep the reference's exact association ((p * new_rz) / rz,
            # conjugate_gradient.py:66-68) — p * (new_rz/rz) drifts the
            # last bits and broke the golden parity tests.
            z_update = jnp.where(
                jnp.logical_or(indefinite, state.rz <= min_float),
                zero, state.p * new_rz / state.rz)
            p = z + z_update
        else:
            reset = state.i % max_steps_cycle == max_steps_cycle - 1
            r = jax.lax.cond(
                reset,
                lambda: b - matvec(v),
                lambda: state.r - gamma * pA,
            )
            z, new_rz = precond_apply(precond_state, r, mat_for_precond)
            z_update = jnp.where(
                jnp.logical_or(indefinite, state.rz <= min_float),
                zero, state.p * new_rz / state.rz)
            p = jax.lax.cond(
                reset,
                lambda: z,
                lambda: z + z_update,
            )
        return CGState(i, v, r, p, new_rz)

    r = b - matvec(v0)
    z, rz = precond_apply(precond_state, r, mat_for_precond)
    initial_state = CGState(jnp.asarray(0, dtype=jnp.int32), v0, r,
                            z if p0 is None else p0, rz)
    final_state = jax.lax.while_loop(stopping_condition, cg_step, initial_state)
    final_r_sq = jnp.sum(jnp.square(final_state.r), axis=-1, keepdims=True)
    converged = jnp.logical_not(jnp.any(0.5 * final_r_sq > threshold))
    stats = CGStats(steps=final_state.i, error=0.5 * final_state.rz,
                    converged=converged)
    if return_state:
        return final_state.v, stats, final_state
    return final_state.v, stats


def ir_cg_loop(
    matvec_hi: Callable[[Array], Array],
    matvec_lo: Callable[[Array], Array],
    precond_apply: Callable,
    precond_state,
    b: Array,
    v0: Array,
    *,
    error_threshold: float,
    max_iterations: int,
    inner_rtol: float = 1e-2,
    max_outer: int = 8,
    dot: Callable[[Array, Array], Array] = _standard_dot,
    mat_for_precond: Optional[Array] = None,
    relative_threshold: bool = False,
) -> Tuple[Array, CGStats]:
    """Mixed-precision CG via iterative refinement (net-new, TPU-specific).

    The CG matvec at large M is HBM-bandwidth-bound: every iteration streams
    the full [M, M] matrix.  ``matvec_lo`` streams a bf16 copy — HALF the
    bytes per iteration — but bf16's ~3 decimal digits floor the reachable
    residual around 1e-3 relative, so plain low-precision CG cannot hit tight
    thresholds.  Classic iterative refinement fixes that: an outer fp32 loop
    computes the EXACT residual with ``matvec_hi`` (one full-precision matvec
    per cycle), then an inner CG solves the correction system with the cheap
    matvec to a loose RELATIVE tolerance (``inner_rtol`` on ``0.5||r||^2``,
    i.e. ~1/10 residual-norm reduction per cycle at the 1e-2 default).  The
    default comes from a 12-point chip sweep at the bench shape (M=32768,
    16 RHS, scripts/tune_bf16_ir.py, logged in docs/PERF.md): 1e-2 is the
    optimum at target 1e-4 and statistically tied with 1e-1 at 1e-6;
    tighter inner tolerances waste iterations chasing accuracy below the
    bf16 perturbation level (classic IR behavior — the knee sits near
    sqrt(eps_bf16) on this squared metric).  Each cycle's
    correction is exact-to-inner-tolerance for the TRUE matrix up to the bf16
    perturbation, so the composed iterate converges to the fp32-level
    solution while ~all matrix traffic rides the half-width copy.

    Amortized bytes/iteration ~ (2*N_inner + 4) / (N_inner) vs 4 for fp32 —
    a ~1.9x bandwidth win once inner solves run tens of iterations.  The
    stopping metric, row convention, and stats match :func:`cg_loop`;
    ``steps`` counts TOTAL inner iterations (the streamed-bytes unit).
    """
    dtype = v0.dtype
    threshold = jnp.asarray(error_threshold, dtype=dtype)
    if relative_threshold:
        threshold = threshold * 0.5 * jnp.sum(
            jnp.square(b), axis=-1, keepdims=True
        )

    def unconverged(r):
        norm_r_sq = jnp.sum(jnp.square(r), axis=-1, keepdims=True)
        return jnp.any(0.5 * norm_r_sq > threshold)

    def outer_cond(state):
        outer_i, total_inner, _v, r = state
        return jnp.logical_and(
            jnp.logical_and(unconverged(r), outer_i < max_outer),
            total_inner < max_iterations,
        )

    def outer_body(state):
        outer_i, total_inner, v, r = state
        # Correction solve d A ~= r with the cheap matvec, to a relative
        # tolerance — absolute targets would be unreachable in bf16.
        d, inner_stats = cg_loop(
            matvec_lo,
            precond_apply,
            precond_state,
            r,
            jnp.zeros_like(r),
            error_threshold=inner_rtol,
            max_iterations=max_iterations,
            max_steps_cycle=max_iterations + 1,
            dot=dot,
            mat_for_precond=mat_for_precond,
            relative_threshold=True,
            # Hand the inner solve only the REMAINING budget so total inner
            # iterations can never exceed the caller's max_iterations (a
            # full-budget inner solve per cycle could near-double it).
            iteration_budget=max_iterations - total_inner,
        )
        v = v + d
        r = b - matvec_hi(v)  # exact fp32 residual: refinement's anchor
        return (outer_i + 1, total_inner + inner_stats.steps, v, r)

    r0 = b - matvec_hi(v0)
    state = (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        v0,
        r0,
    )
    _outer, total_inner, v, r = jax.lax.while_loop(outer_cond, outer_body, state)
    error = 0.5 * jnp.sum(jnp.square(r), axis=-1, keepdims=True)
    converged = jnp.logical_not(jnp.any(error > threshold))
    return v, CGStats(steps=total_inner, error=error, converged=converged)


def mixed_cg_loop(
    matvec_hi: Callable[[Array], Array],
    matvec_lo: Callable[[Array], Array],
    precond_apply: Callable,
    precond_state,
    b: Array,
    v0: Array,
    *,
    error_threshold: float,
    max_iterations: int,
    refresh_every: int = 32,
    drift_drop: float = 1e-2,
    stall_ratio: float = 0.25,
    dot: Callable[[Array, Array], Array] = _standard_dot,
    mat_for_precond: Optional[Array] = None,
    relative_threshold: bool = False,
) -> Tuple[Array, CGStats]:
    """CG with bf16 matvecs and DRIFT-ADAPTIVE exact-residual replacement
    ("reliable updates" — net-new, TPU-specific).

    Unlike :func:`ir_cg_loop` (restarted inner solves, which discard the
    Krylov space each cycle and measurably inflate iteration counts), this
    runs ONE continuous CG recurrence whose matvec is the cheap half-width
    ``matvec_lo``, periodically replacing the recursively-updated residual —
    which drifts at bf16 precision — with the exact fp32 ``b - v A``.

    Round-2 shipped a FIXED 32-step replacement stride, which stagnated at
    large M (docs/PERF.md: ~6x iteration inflation at M=32768): cycles kept
    running long after the bf16 recursion had drifted past usefulness, the
    convergence check fired only at stride boundaries (up to 31 wasted
    iterations), and corrupt momentum was carried into the next cycle.
    Three adaptive rules fix all three (Sleijpen & van der Vorst-style
    reliable updating; all scalar tests — the hot loop still streams only
    bf16 bytes):

    * **drift-bounded cycles**: a cycle ends once the recursive residual has
      dropped ``drift_drop`` (1e-2 = 10x in norm) since its start — beyond
      that, further bf16 progress is below the recursion's own noise floor
      and must be re-anchored;
    * **per-step stop checks**: the inner loop also exits the moment the
      recursive residual passes the convergence threshold (verified against
      the exact residual at the refresh that follows);
    * **stall-triggered momentum drop**: if a cycle reduced the EXACT
      residual by less than ``stall_ratio`` (sum-of-squares), its direction
      is corrupt — restart steepest-descent from the fresh residual instead
      of carrying beta-momentum.

    ``refresh_every`` remains the hard cycle cap.  Convergence is always
    confirmed against the exact residual, so reported errors are
    trustworthy.  Amortized traffic approaches ``refresh_every*2+4 /
    refresh_every*4`` (~0.53x fp32 bytes at cap 32) and degrades gracefully
    to fp32-like behavior when drift forces short cycles.

    The ``drift_drop`` default is the theory value: the bf16 recursion is
    trustworthy until the residual falls ~sqrt(eps_bf16) in NORM below its
    anchor (van der Vorst-style reliable-update analysis); eps_bf16 ~ 2^-8
    gives sqrt(eps) ~ 0.09 in norm = ~1e-2 in the sum-of-squares this rule
    tests.  Measured on the bench system (Matern32 8-d, Lambda~U(.05,.5),
    16 RHS, relative targets, fp32 iters / ir iters / ru iters):

    ========  ===========  ====  ====  ====
    M         target       fp32  ir    ru
    ========  ===========  ====  ====  ====
    4096      1e-4         29    70    52
    4096      1e-6         43    70    111
    8192      1e-4         43    105   78
    8192      1e-6         60    105   139
    ========  ===========  ====  ====  ====

    ru converges everywhere (round-2's fixed-stride stagnation is gone —
    the same systems previously hit the iteration cap) and wins at loose
    targets; ir re-anchors harder and wins at tight (<=1e-6) targets.
    Results are insensitive to ``refresh_every`` (the drift rule fires
    first) — no hand-tuned stride remains.
    """
    dtype = v0.dtype
    min_float = jnp.asarray(1e-16, dtype=dtype)
    zero = jnp.asarray(0.0, dtype=dtype)
    threshold = jnp.asarray(error_threshold, dtype=dtype)
    if relative_threshold:
        threshold = threshold * 0.5 * jnp.sum(
            jnp.square(b), axis=-1, keepdims=True
        )

    def cg_step(state: CGState) -> CGState:
        pA = matvec_lo(state.p)
        denom = dot(state.p, pA)
        # Same per-row curvature guard as cg_loop: on vanishing/negative
        # curvature (bf16 rounding can make the streamed system look
        # indefinite) restart the direction from the preconditioned residual
        # instead of accumulating into a stuck p (which grew unboundedly).
        # Restart on strictly NEGATIVE curvature only — the tiny-positive
        # guard band keeps the reference's momentum rule (see cg_loop).
        indefinite = denom < -min_float
        gamma = jnp.where(denom <= min_float, zero, state.rz / denom)
        v = state.v + gamma * state.p
        r = state.r - gamma * pA
        z, new_rz = precond_apply(precond_state, r, mat_for_precond)
        z_update = jnp.where(
            jnp.logical_or(indefinite, state.rz <= min_float),
            zero, state.p * new_rz / state.rz)
        p = z + z_update
        return CGState(state.i + 1, v, r, p, new_rz)

    def outer_cond(carry) -> Array:
        state, _prev_err_sum = carry
        norm_r_sq = jnp.sum(jnp.square(state.r), axis=-1, keepdims=True)
        over = jnp.any(0.5 * norm_r_sq > threshold)
        return jnp.logical_and(over, state.i < max_iterations)

    def outer_body(carry):
        state, prev_err_sum = carry
        # state.r is exact here (post-refresh / initial), so the cycle-start
        # sum anchors the drift rule.
        start_err_sum = jnp.sum(jnp.square(state.r))
        cycle_cap = jnp.minimum(state.i + refresh_every, max_iterations)

        def inner_cond(s: CGState) -> Array:
            err_rows = 0.5 * jnp.sum(jnp.square(s.r), axis=-1, keepdims=True)
            unconverged = jnp.any(err_rows > threshold)
            within_cycle = s.i < cycle_cap
            # Residual (recursive) not yet dropped drift_drop since anchor.
            not_drifted = jnp.sum(jnp.square(s.r)) > drift_drop * start_err_sum
            return jnp.logical_and(jnp.logical_and(unconverged, within_cycle),
                                   not_drifted)

        state = jax.lax.while_loop(inner_cond, cg_step, state)
        # Reliable update: replace the drifted recursive residual with the
        # exact fp32 one.
        r = b - matvec_hi(state.v)
        z, new_rz = precond_apply(precond_state, r, mat_for_precond)
        exact_err_sum = jnp.sum(jnp.square(r))
        # Momentum: keep it through the standard beta update on a productive
        # cycle; drop it (pure steepest-descent restart) on a stalled one.
        stalled = exact_err_sum > stall_ratio * prev_err_sum
        keep = jnp.logical_and(jnp.logical_not(stalled), state.rz > min_float)
        z_update = jnp.where(keep, state.p * new_rz / state.rz, zero)
        p = z + z_update
        return (CGState(state.i, state.v, r, p, new_rz), exact_err_sum)

    r0 = b - matvec_hi(v0)
    z0, rz0 = precond_apply(precond_state, r0, mat_for_precond)
    state = CGState(jnp.asarray(0, jnp.int32), v0, r0, z0, rz0)
    err0 = jnp.sum(jnp.square(r0))
    final, _ = jax.lax.while_loop(outer_cond, outer_body, (state, err0))
    error = 0.5 * jnp.sum(jnp.square(final.r), axis=-1, keepdims=True)
    converged = jnp.logical_not(jnp.any(error > threshold))
    return final.v, CGStats(steps=final.i, error=error, converged=converged)


# ---------------------------------------------------------------------------
# Dense-matrix CG with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _cg_dense(precond_apply, error_threshold, max_iterations, max_steps_cycle, dot_name,
              matvec_impl, relative, matrix, rhs, v0, precond_state):
    solution, stats = _cg_dense_impl(
        precond_apply, error_threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative, matrix, rhs, v0, precond_state,
    )
    return solution, stats


def _bf16_diagsplit_matvec(matrix: Array):
    """Half-width matvec that keeps the DIAGONAL of ``A`` in full precision.

    A plain ``matrix.astype(bfloat16)`` rounds the diagonal too — and bf16's
    ~3 significant digits erase a small SPD shift outright: at the covertree
    e2e workload ``Lambda ~ 2e-4`` on diagonal entries ~1.0 rounds to
    EXACTLY 1.0, so the streamed system lost its positive shift, CG hit
    negative curvature, and (before the per-row direction restart in
    cg_loop) stuck directions overflowed to NaN.  Splitting
    ``A = offdiag(A)_bf16 + diag(A)_fp32`` preserves the entire diagonal —
    kernel variance AND Lambda — bit-exactly; the [M] fused multiply-add per
    iteration is free next to the [M, M] stream, and HBM traffic is
    unchanged (the bf16 copy still carries all M^2 entries, diagonal as
    zeros).
    """
    diag = jnp.diagonal(matrix)  # fp32 [M]
    m = matrix.shape[-1]
    idx = jnp.arange(m)
    # Indexed update, not `matrix - jnp.diag(diag)`: the subtraction builds
    # TWO [M, M] fp32 temporaries (diag matrix + difference) — ~9 GB extra
    # at M=32768, enough to OOM the copy construction on a 16 GB chip.
    matrix_bf16 = matrix.at[idx, idx].set(0.0).astype(jnp.bfloat16)

    def matvec(p):
        out = jax.lax.dot_general(
            p.astype(jnp.bfloat16), matrix_bf16,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.astype(matrix.dtype) + p * diag[None, :]

    return matvec


def _cg_dense_impl(precond_apply, error_threshold, max_iterations, max_steps_cycle,
                   dot_name, matvec_impl, relative, matrix, rhs, v0, precond_state):
    dot = _DOT_FNS[dot_name]

    if matvec_impl == "pallas_resident":
        # Whole solve in one Pallas launch with A resident in VMEM (+~15% at
        # large RHS blocks, M <= ~1500). Only the hot training configuration
        # is supported in-kernel; anything else falls back to the loop.
        eligible = (
            precond_state == ()
            and dot_name == "standard"
            and max_steps_cycle > max_iterations
            and not relative  # in-kernel stop rule is absolute
        )
        if eligible:
            from cggp_tpu.ops.pallas_cg import pallas_cg_solve

            hi = jax.lax.Precision.HIGHEST
            # v0 support via the shifted system: (v0 + d) A = b.
            shifted_rhs = rhs - jnp.matmul(v0, matrix, precision=hi)
            delta, steps = pallas_cg_solve(
                matrix, shifted_rhs, error_threshold, max_iterations
            )
            solution = v0 + delta
            residual = rhs - jnp.matmul(solution, matrix, precision=hi)
            error = 0.5 * jnp.sum(jnp.square(residual), axis=-1, keepdims=True)
            # The in-kernel stop rule runs on the RECURSIVE residual; the
            # exact residual recomputed here can sit just above threshold
            # from recurrence drift.  An early exit (steps < cap) means the
            # kernel's own rule WAS met — count that as converged rather
            # than spuriously flagging a drift-sized excess.
            converged = jnp.logical_or(
                steps < max_iterations,
                jnp.logical_not(
                    jnp.any(error > jnp.asarray(error_threshold, error.dtype))
                ),
            )
            return solution, CGStats(steps=steps, error=error, converged=converged)
        matvec_impl = "xla"

    if matvec_impl in ("bf16_ir", "bf16_ru"):
        # Mixed-precision solves: the hot loop streams a bf16 copy of A
        # (half the HBM bytes per iteration) while exact fp32 residuals keep
        # the reachable threshold at fp32 level.  Measured guidance (see
        # mixed_cg_loop's table): "bf16_ru" (drift-adaptive reliable
        # updates) preserves Krylov momentum and wins at loose targets
        # (>= ~1e-4 relative); "bf16_ir" (restarted iterative refinement,
        # ir_cg_loop) re-anchors harder and wins at tight (~1e-6) targets.
        # Convergence envelope: the bf16 OFF-DIAGONAL rounding perturbs A by
        # ~eps_bf16 * ||K||; once that exceeds lambda_min the refinement
        # stalls (validated healthy at the bench shape, lambda >= 0.05;
        # measured stalling at the covertree-training shape, lambda ~ 2e-4).
        # Out-of-envelope solves are SAFE — finite iterates, converged=False
        # (cg_loop's per-row direction restart bounds stuck directions) —
        # but slow and inaccurate: use "xla"/"xla_high" there.  The
        # diagonal (incl. Lambda) always rides in fp32 via the diag-split
        # matvec, so a small SPD shift is never lost to rounding.
        matvec_lo = _bf16_diagsplit_matvec(matrix)

        def matvec_hi(p):
            return jnp.matmul(p, matrix, precision=jax.lax.Precision.HIGHEST)

        loop = mixed_cg_loop if matvec_impl == "bf16_ru" else ir_cg_loop
        return loop(
            matvec_hi,
            matvec_lo,
            precond_apply,
            precond_state,
            rhs,
            v0,
            error_threshold=error_threshold,
            max_iterations=max_iterations,
            dot=dot,
            mat_for_precond=matrix,
            relative_threshold=relative,
        )

    if matvec_impl == "pallas":
        # HBM-streaming Pallas panel matvec (see ops/pallas_matvec.py).  On
        # current v5e, XLA's matmul already reaches ~68% of HBM roofline at
        # M=8192, so this is an option, not the default.
        from cggp_tpu.ops.pallas_matvec import pallas_matvec

        def matvec(p):
            return pallas_matvec(p, matrix)
    elif matvec_impl == "xla_bf16":
        # bf16 matrix storage halves HBM bytes per iteration (the CG matvec
        # is bandwidth-bound), with fp32 MXU accumulation.  bf16's ~3 decimal
        # digits floor the reachable residual around 1e-2..1e-3 relative —
        # acceptable for covertree-conditioned systems with loose thresholds;
        # use fp32 for tight-threshold parity runs.
        matvec = _bf16_diagsplit_matvec(matrix)
    elif matvec_impl == "xla_high":
        # bf16x3 emulation (Precision.HIGH): ~2^-21 relative matvec error vs
        # fp32's 2^-24, at HALF of HIGHEST's six bf16 MXU passes.  On the
        # COMPUTE-bound fused training solve ([1+2P+B, M] RHS block, R~2000)
        # this measured 1.34x wall on the chip with +2% iterations and 2e-4
        # solution agreement (scripts/precision_cg_chip.py, M=1024 R=2059
        # kappa~1e6 pivchol-128, relative target 1e-6); on the HBM-bound
        # 16-RHS bench shape it is a wash.  Not the default: the extra
        # mantissa headroom of HIGHEST is what guarantees CG's fp32-level
        # floor at tight (<=1e-8) absolute thresholds.
        def matvec(p):
            return jnp.matmul(p, matrix, precision=jax.lax.Precision.HIGH)
    else:
        # Full fp32 matmul precision: the TPU default (bf16 passes) floors
        # the reachable residual ~1e-2 and can stall/diverge CG outright.
        # At small RHS counts the solve is HBM-bound and the extra MXU
        # passes are ~free; for the compute-bound fused training block see
        # "xla_high" above.
        def matvec(p):
            return jnp.matmul(p, matrix, precision=jax.lax.Precision.HIGHEST)

    return cg_loop(
        matvec,
        precond_apply,
        precond_state,
        rhs,
        v0,
        error_threshold=error_threshold,
        max_iterations=max_iterations,
        max_steps_cycle=max_steps_cycle,
        dot=dot,
        mat_for_precond=matrix,
        relative_threshold=relative,
    )


def _cg_dense_fwd(precond_apply, error_threshold, max_iterations, max_steps_cycle,
                  dot_name, matvec_impl, relative, matrix, rhs, v0, precond_state):
    solution, stats = _cg_dense_impl(
        precond_apply, error_threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative, matrix, rhs, v0, precond_state,
    )
    return (solution, stats), (matrix, solution, v0, precond_state)


def _cg_dense_bwd(precond_apply, error_threshold, max_iterations, max_steps_cycle,
                  dot_name, matvec_impl, relative, residuals, cotangents):
    matrix, solution, v0, precond_state = residuals
    dx, _dstats = cotangents
    # Backward pass = another CG solve: db = A^{-1} dx (reference :100-118).
    db, _ = _cg_dense_impl(
        precond_apply, error_threshold, max_iterations, max_steps_cycle, dot_name,
        matvec_impl, relative, matrix, dx, jnp.zeros_like(dx), precond_state,
    )
    dA = -solution.T @ db
    dv0 = jnp.zeros_like(v0)
    d_state = jax.tree_util.tree_map(jnp.zeros_like, precond_state)
    return dA, db, dv0, d_state


_cg_dense.defvjp(_cg_dense_fwd, _cg_dense_bwd)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _dense_chunk(precond_apply, chunk_iterations, error_threshold, relative,
                 dot_name, matrix, rhs_rows, v, p0, precond_state):
    """One bounded residual-replacement CG chunk on a dense system (row
    convention): entry re-anchors on the true residual, the carried ``p0``
    keeps unrestarted convergence (see ``cg_loop``'s ``p0``).  ``p0=None``
    (a structurally-different pytree) compiles the fresh-start variant.
    Module-level jit so repeated ``solve_chunked`` calls reuse ONE compiled
    program per shape."""
    v_out, _stats, state = cg_loop(
        lambda q: jnp.matmul(q, matrix, precision=jax.lax.Precision.HIGHEST),
        precond_apply,
        precond_state,
        rhs_rows,
        v,
        error_threshold=error_threshold,
        max_iterations=chunk_iterations,
        max_steps_cycle=chunk_iterations + 1,
        dot=_DOT_FNS[dot_name],
        mat_for_precond=matrix,
        relative_threshold=relative,
        p0=p0,
        return_state=True,
    )
    err = 0.5 * jnp.sum(jnp.square(state.r), axis=-1)
    return v_out, state.p, err


def conjugate_gradient(
    matrix: Array,
    rhs: Array,
    initial_solution: Array,
    error_threshold: float,
    preconditioner: Optional[CGPreconditioner] = None,
    max_iterations: Optional[int] = None,
    max_steps_cycle: int = 100,
    dot: str = "standard",
    matvec_impl: str = "xla",
    relative_threshold: bool = False,
) -> Tuple[Array, CGStats]:
    """Solve ``v A = b`` for a batch of row RHS (reference :24-122 semantics).

    Args:
        matrix: symmetric PD matrix ``A``, [n, n].
        rhs: batch of right-hand sides as rows, [m, n].
        initial_solution: initial iterate, [m, n].
        error_threshold: stop when all ``0.5 ||r_i||^2 <= threshold``.
        preconditioner: object with ``.apply(state, vec, mat)`` and ``.state``.
        max_iterations: defaults to n.
        max_steps_cycle: period of the exact-residual restart.
        dot: "standard" | "compensated" inner products.

    Returns:
        ``(solution [m, n], CGStats(steps, error))``.  Differentiable w.r.t.
        ``matrix`` and ``rhs`` through the custom VJP; ``stats`` carry no
        gradient.
    """
    if preconditioner is None:
        preconditioner = EyePreconditioner()
    if max_iterations is None:
        max_iterations = matrix.shape[-1]
    return _cg_dense(
        preconditioner.apply,
        float(error_threshold),
        int(max_iterations),
        int(max_steps_cycle),
        dot,
        matvec_impl,
        bool(relative_threshold),
        matrix,
        rhs,
        initial_solution,
        preconditioner.state,
    )


class ConjugateGradient:
    """Column-major facade matching reference :160-212.

    Callable on ``(matrix [n, n], rhs [n, m])``; transposes to the internal
    row convention, uses a zero initial solution, defaults
    ``max_iterations = n`` and ``max_steps_cycle = max_iterations + 1`` (never
    restart), and returns the [n, m] solution (stats dropped, as in the
    reference facade; use :meth:`solve_with_stats` to keep them).
    """

    def __init__(
        self,
        error_threshold: float,
        preconditioner: Optional[CGPreconditioner] = None,
        max_iterations: Optional[int] = None,
        max_steps_cycle: Optional[int] = None,
        dot: str = "standard",
        matvec_impl: str = "xla",
        relative_threshold: bool = False,
    ):
        self.error_threshold = error_threshold
        self.preconditioner = preconditioner if preconditioner is not None else EyePreconditioner()
        self.max_iterations = max_iterations
        self.max_steps_cycle = max_steps_cycle
        self.dot = dot
        self.matvec_impl = matvec_impl
        self.relative_threshold = relative_threshold

    # Off-diagonal bf16 rounding unit: the diag-split matvec keeps the
    # diagonal fp32, so the perturbation scale is eps_bf16 * max|K_offdiag|.
    _BF16_EPS = 2.0 ** -8

    def check_bf16_envelope(self, matrix: Array) -> str:
        """Eager envelope check for the mixed-precision impls (round-4).

        The bf16 matvec's off-diagonal rounding perturbs the system by
        ~``eps_bf16 * max|K_offdiag|``; once that reaches ``lambda_min`` the
        refinement loop stalls — finite and safe, but a silent 0x win
        (measured: healthy at the bench shape, lambda >= 0.05; stalling at
        the covertree-training shape, lambda ~ 2e-4 — docs/PERF.md).
        Returns the impl to ACTUALLY use: the configured one inside the
        envelope, ``"xla_high"`` (with a RuntimeWarning) outside it.
        Estimates ``lambda_min`` with a ~64-matvec Lanczos pass, so call it
        once per system, not per hot-loop solve; under ``jit`` the matrix is
        a tracer, no data-dependent static choice exists, and the configured
        impl is returned unchecked.
        """
        if self.matvec_impl not in ("bf16_ir", "bf16_ru"):
            return self.matvec_impl
        if isinstance(matrix, jax.core.Tracer):
            return self.matvec_impl
        # Last-call memo: repeated eager solves against the SAME matrix
        # object (e.g. solve_chunked's per-chunk dispatches) must not pay
        # the Lanczos estimate again — the verdict for a fixed matrix never
        # changes.
        memo = getattr(self, "_bf16_memo", None)
        if memo is not None and memo[0] is matrix:
            return memo[1]
        from cggp_tpu.ops.logdet import lanczos_extremal_eigs

        n = matrix.shape[-1]
        eig_min, _eig_max = lanczos_extremal_eigs(
            jax.lax.stop_gradient(matrix), jax.random.PRNGKey(0),
            num_iters=min(64, n),
        )
        idx = jnp.arange(n)
        offdiag_scale = float(jnp.max(jnp.abs(
            matrix - jnp.zeros_like(matrix).at[idx, idx].set(matrix[idx, idx])
        )))
        perturbation = self._BF16_EPS * offdiag_scale
        if perturbation >= float(eig_min):
            warnings.warn(
                f"matvec_impl={self.matvec_impl!r} is outside its "
                f"convergence envelope for this system (bf16 perturbation "
                f"~{perturbation:.2e} >= estimated lambda_min "
                f"{float(eig_min):.2e}): the mixed-precision loop would "
                f"stall below fp32 accuracy. Falling back to 'xla_high' "
                f"for this solve.",
                RuntimeWarning,
            )
            resolved = "xla_high"
        else:
            resolved = self.matvec_impl
        self._bf16_memo = (matrix, resolved)
        return resolved

    def solve_with_stats(
        self, matrix: Array, rhs: Array, initial_solution: Optional[Array] = None,
        preconditioner: Optional[CGPreconditioner] = None,
    ) -> Tuple[Array, CGStats]:
        rhs_t = rhs.T
        if initial_solution is None:
            v0 = jnp.zeros_like(rhs_t)
        else:
            v0 = initial_solution.T

        max_iterations = self.max_iterations
        if max_iterations is None:
            max_iterations = matrix.shape[-1]
        max_steps_cycle = self.max_steps_cycle
        if max_steps_cycle is None:
            # Never restart inside the run (reference :196).
            max_steps_cycle = max_iterations + 1

        solution, stats = conjugate_gradient(
            matrix,
            rhs_t,
            v0,
            self.error_threshold,
            preconditioner=preconditioner or self.preconditioner,
            max_iterations=max_iterations,
            max_steps_cycle=max_steps_cycle,
            dot=self.dot,
            # Eager calls route out-of-envelope bf16 solves to xla_high with
            # a warning; under jit this passes matvec_impl through unchanged.
            matvec_impl=self.check_bf16_envelope(matrix),
            relative_threshold=self.relative_threshold,
        )
        return solution.T, stats

    def __call__(
        self, matrix: Array, rhs: Array, initial_solution: Optional[Array] = None,
        preconditioner: Optional[CGPreconditioner] = None,
    ) -> Array:
        solution, _stats = self.solve_with_stats(
            matrix, rhs, initial_solution, preconditioner=preconditioner
        )
        return solution

    def solve_chunked(
        self, matrix: Array, rhs: Array,
        chunk_iterations: int = 64,
        max_chunks: int = 64,
        preconditioner: Optional[CGPreconditioner] = None,
    ) -> Tuple[Array, CGStats]:
        """Host-driven dispatch-bounded CG (residual-replacement chunks).

        Round-4 discovery (docs/PERF.md): this tunnel environment kills any
        SINGLE device program past ~60 s of execution (measured: a 49.6 s
        dense solve completes, a ~72 s one crashes the worker) — so a large
        solve must not run as one ``lax.while_loop`` program.  This method
        runs eager chunks of ``chunk_iterations`` CG iterations, each
        re-anchored on the TRUE residual ``b - A v`` at entry while
        CARRYING the search direction across chunks — unrestarted-CG
        convergence (a plain restart pays a momentum penalty near tight
        tolerances: measured 2.7x more chunks on an ill-conditioned fp32
        system), with a monotonicity safeguard that redoes a
        residual-increasing carried chunk fresh from the same anchor.
        Convergence decisions ride true-residual anchors, so a CONVERGED
        result is as accurate as the single-program solve — and an
        at-the-fp32-floor target is reported honestly (the one-program
        recurrence can drift optimistically below the true floor).

        Host-driven by design: call it OUTSIDE jit.  Stats aggregate
        across chunks (``steps`` = total iterations run).  Pick
        ``chunk_iterations`` so one chunk's wall stays well under the
        watchdog (e.g. at N=262k matrix-free, ~3 s/iteration => 8-16).
        """
        column_rhs = rhs
        # Column convention like __call__: per-column squared-residual
        # target, matching cg_loop's relative rule.
        b_norm2 = 0.5 * jnp.sum(jnp.square(column_rhs), axis=0)
        threshold = jnp.asarray(self.error_threshold, column_rhs.dtype)
        if self.relative_threshold:
            target = threshold * b_norm2
        else:
            target = jnp.broadcast_to(threshold, b_norm2.shape)

        # Resolve the bf16 envelope ONCE for the whole chunk loop (the
        # matrix is fixed; the per-solve memo would also catch this).
        resolved_impl = self.check_bf16_envelope(matrix)
        if resolved_impl in ("xla", "xla_high"):
            # Residual-replacement chunks (round-4, later): carry the
            # search direction across dispatches — unrestarted-CG
            # convergence while each chunk re-anchors on the true residual
            # (the plain restart below pays a momentum penalty near tight
            # tolerances: measured 2.7x more chunks on an ill-conditioned
            # fp32 system at the 1e-12 target).
            precond = preconditioner or self.preconditioner or _eye_for(self.dot)
            rhs_rows = column_rhs.T
            v = jnp.zeros_like(rhs_rows)
            p = None
            err = b_norm2
            total_steps = 0
            chunks = 0
            for _ in range(max_chunks):
                if bool(jnp.all(err <= target)):  # host sync per dispatch
                    break
                err_sum = float(jnp.sum(err))
                v_new, p_new, err_new = _dense_chunk(
                    precond.apply, chunk_iterations,
                    float(self.error_threshold), bool(self.relative_threshold),
                    self.dot, matrix, rhs_rows, v, p, precond.state)
                chunks += 1
                if p is not None and float(jnp.sum(err_new)) > err_sum:
                    # Carried-momentum safeguard (see the model-side twin in
                    # models/itergpr._chunked_restart_solve): a noise-scale
                    # direction meeting a re-anchored larger rz explodes
                    # gamma = rz/denom — discard the bad chunk, redo fresh
                    # from the same anchor; err stays monotone.
                    p = None
                    continue
                v, p, err = v_new, p_new, err_new
            total_steps = chunks * chunk_iterations  # upper bound; the
            # final chunk may stop early, invisible from out here.
            converged = bool(jnp.all(err <= target))
            return v.T, CGStats(
                steps=jnp.asarray(total_steps),
                error=err[:, None],
                converged=jnp.asarray(converged),
            )

        # bf16_ir/bf16_ru/pallas impls keep the facade-driven restart loop
        # (their mixed-precision inner loops manage their own anchoring).
        solution = jnp.zeros_like(column_rhs)
        chunk_solver = ConjugateGradient(
            float(jnp.min(target)),
            preconditioner=preconditioner or self.preconditioner,
            max_iterations=chunk_iterations,
            dot=self.dot,
            matvec_impl=resolved_impl,
            relative_threshold=False,
        )
        hi = jax.lax.Precision.HIGHEST
        total_steps = 0
        err = b_norm2
        for _ in range(max_chunks):
            residual = column_rhs - jnp.matmul(matrix, solution, precision=hi)
            err = 0.5 * jnp.sum(jnp.square(residual), axis=0)
            if bool(jnp.all(err <= target)):  # host sync per dispatch
                break
            delta, stats = chunk_solver.solve_with_stats(matrix, residual)
            solution = solution + delta
            total_steps += int(stats.steps)
        else:
            # Loop exhausted AFTER a correction: err is one chunk stale —
            # a solve that converges on its last allowed chunk must not be
            # reported unconverged with the pre-update residual.
            residual = column_rhs - jnp.matmul(matrix, solution, precision=hi)
            err = 0.5 * jnp.sum(jnp.square(residual), axis=0)
        converged = bool(jnp.all(err <= target))
        # error follows the internal row convention ([rhs, 1] — one row per
        # RHS column of the user's column-major rhs), like solve_with_stats.
        return solution, CGStats(
            steps=jnp.asarray(total_steps),
            error=err[:, None],
            converged=jnp.asarray(converged),
        )
