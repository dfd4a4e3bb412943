"""Matrix-free CG on ``Kuu + diag(lam)``: the Gram matrix never exists.

The dense solver (ops/cg.py) materialises the [M, M] system once per solve;
past M ~ 40-50k fp32 that no longer fits one chip's HBM.  Here the matvec
builds Gram ROW BLOCKS on the fly:

* ``blocked_kuu_matvec`` — a ``lax.scan`` over [block, M] kernel panels,
  pure jnp (differentiable, O(block * M) peak memory);
* optionally the Pallas fused kernel (ops/pallas_gram.kuu_matvec) for the
  non-differentiated forward/backward *solves*.

Differentiation uses the same implicit-function trick as the dense and
sharded solvers: backward = another matrix-free CG solve ``w = A^{-1} v̄``
plus one VJP of the (differentiable, blocked) matvec at the solution:

    kp̄, z̄, lam̄ = -vjp( (kp, z, lam) -> solution @ A(kp, z, lam) )(w),
    b̄ = w.

Single-device counterpart of ``parallel.sharded_cg`` (which shards the same
row blocks over a mesh); cite: reference conjugate_gradient.py:24-122 for
the loop semantics, :100-118 for the gradient trick.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cggp_tpu.ops.cg import CGStats, cg_loop, precond_apply_or_identity
from cggp_tpu.ops.kernels import Kernel

Array = jnp.ndarray


def pad_inducing(
    z: Array, lam: Array, multiple: int, *rhs_arrays: Array
) -> Tuple:
    """Pad (Z, Λ, rhs...) so M divides ``multiple`` (mesh size for the
    sharded solver, panel block for the matrix-free one).

    Padding points are placed at huge coordinates (1e6 + arange) so every
    stationary kernel value against real points underflows to 0; Λ pads are 1
    and rhs pads are 0, so padded solution entries are exactly 0 and real
    entries are untouched.  (For learned lengthscales on the pad-offset
    scale, thread the inducing mask instead of relying on underflow — see
    :func:`blocked_kuu_matvec` / parallel.sharded_cg._local_rows.)
    """
    m = z.shape[0]
    rem = (-m) % multiple
    if rem == 0:
        return (z, lam, *rhs_arrays)
    far = 1.0e6 * (1.0 + jnp.arange(1, rem + 1, dtype=z.dtype))[:, None]
    z_pad = jnp.concatenate([z, jnp.broadcast_to(far, (rem, z.shape[-1]))], axis=0)
    lam_pad = jnp.concatenate([lam.reshape(-1), jnp.ones((rem,), dtype=lam.dtype)])
    padded_rhs = tuple(
        jnp.concatenate(
            [r, jnp.zeros((*r.shape[:-1], rem), dtype=r.dtype)], axis=-1
        )
        for r in rhs_arrays
    )
    return (z_pad, lam_pad, *padded_rhs)


def pivoted_cholesky_kernel(kernel: Kernel, kp, z: Array, rank: int,
                            mask: Optional[Array] = None) -> Array:
    """Matrix-free pivoted-Cholesky factor of ``K(Z, Z)``: each step
    evaluates ONE kernel row on the fly, so no [M, M] Gram matrix is ever
    built — the preconditioner construction for the matrix-free and sharded
    regimes.

    ``mask`` (1 real / 0 pad) zeroes pad entries of the greedy-pivot diagonal
    and of each evaluated row: pads otherwise keep the full constant
    ``K_diag = variance`` and get picked early, wasting up to
    ``num_devices - 1`` of the ``rank`` columns on no-op directions.
    """
    from cggp_tpu.ops.linalg import pivoted_cholesky_matfree

    if mask is not None:
        mask = mask.reshape(-1)

    def row_fn(pivot):
        z_p = lax.dynamic_slice_in_dim(z, pivot, 1, axis=0)
        row = kernel.K(kp, z_p, z)[0]
        return row if mask is None else row * mask

    diag = kernel.K_diag(kp, z)
    if mask is not None:
        diag = diag * mask
    return pivoted_cholesky_matfree(row_fn, diag, rank)


def blocked_kuu_matvec(
    kernel: Kernel, kp, z: Array, lam: Array, p: Array, block: int = 2048,
    mask: Optional[Array] = None,
) -> Array:
    """``p @ (K(Z,Z) + diag(lam))`` via scanned row panels; differentiable.

    ``p`` is [R, M] rows; peak extra memory is one [block, M] panel.
    M must be a multiple of ``block`` or smaller than it.  ``mask``
    (1 = real inducing point, 0 = pad) zeroes the kernel coupling of pad
    rows/columns BEFORE the diagonal add — same contract as the sharded
    matvec (parallel/sharded_cg.py:_local_rows): the padded system is
    exactly block-diagonal, so zero-padded RHS rows give exactly-zero
    padded solution entries at any lengthscale.
    """
    m = z.shape[0]
    lam = lam.reshape(-1)
    if mask is not None:
        mask = mask.reshape(-1)
    if m <= block:
        a = kernel.K(kp, z)
        if mask is not None:
            a = a * (mask[:, None] * mask[None, :])
        # HIGHEST: TPU's default bf16 matmul passes break CG convergence
        # (see ops/kernels.scaled_squared_distance).
        return jnp.matmul(p, a, precision=jax.lax.Precision.HIGHEST) + p * lam[None, :]

    assert m % block == 0, (m, block)
    num_blocks = m // block
    z_blocks = z.reshape(num_blocks, block, z.shape[-1])
    p_blocks = jnp.moveaxis(p.reshape(p.shape[0], num_blocks, block), 1, 0)
    mask_blocks = (
        jnp.zeros((num_blocks, 0), z.dtype) if mask is None
        else mask.reshape(num_blocks, block)
    )

    def panel(carry, inputs):
        z_blk, p_blk, mask_blk = inputs
        a_rows = kernel.K(kp, z_blk, z)  # [block, M] on the fly
        if mask is not None:
            a_rows = a_rows * (mask_blk[:, None] * mask[None, :])
        return carry + jnp.matmul(
            p_blk, a_rows, precision=jax.lax.Precision.HIGHEST
        ), None

    init = jnp.zeros_like(p)
    # Rematerialize each panel in the backward pass: without checkpoint,
    # differentiating through the scan (solve_bwd's matvec-VJP, the logdet
    # probe gradients) saves every [block, M] panel — the full [M, M] in
    # aggregate, exactly what this function exists to avoid (observed:
    # 16 GB HBM OOM at M=65536). Recomputing costs one extra kernel-panel
    # eval per backward step and keeps peak memory at O(block * M).
    out, _ = lax.scan(jax.checkpoint(panel), init, (z_blocks, p_blocks, mask_blocks))
    return out + p * lam[None, :]


def make_implicit_cg(
    kernel: Kernel,
    error_threshold: float,
    max_iterations: int,
    max_steps_cycle: Optional[int] = None,
    block: int = 2048,
    use_pallas: bool = False,
    relative_threshold: bool = False,
):
    """Build ``solve(kp, z, lam, rhs [R, M], precond_state=(), mask=None) ->
    (solution, CGStats)``.

    ``use_pallas=True`` runs the forward/backward solve matvecs through the
    fused Pallas kernel (TPU only); the gradient's matvec-VJP always goes
    through the differentiable blocked XLA path.  ``precond_state`` is a
    :func:`cggp_tpu.ops.cg.spectral` state pytree (build one matrix-free
    with :func:`pivoted_cholesky_kernel` + ``SpectralPreconditioner``); the
    backward solve reuses it.  ``mask`` marks real (1) vs pad (0) inducing
    points when Z was padded to a block multiple — pads stay exactly
    decoupled on both matvec paths.  The Pallas kernel itself is unmasked;
    masking composes around it exactly (mask in {0,1}):

        masked(p) = mask * kuu_matvec(p * mask) + p * lam * (1 - mask)

    — premasking kills pad COLUMNS, postmasking kills pad ROWS (including
    each pad's kernel DIAGONAL ``K(pad, pad) = variance``, which is NOT
    small — self-distance is zero regardless of placement), and the
    correction restores the pads' lam diagonal that the postmask removed.
    The masks are what protect the result; the only job of the 1e6-spaced
    pad placement is to keep off-diagonal pad kernel entries finite (they
    underflow to 0, never NaN).
    """
    if max_steps_cycle is None:
        max_steps_cycle = max_iterations + 1

    def matvec_for_solve(kp, z, lam, mask, p):
        if use_pallas:
            from cggp_tpu.ops.pallas_gram import kuu_matvec

            ell = kernel.lengthscales(kp)
            lam_flat = lam.reshape(-1)
            if mask is None:
                return kuu_matvec(
                    z / ell, lam_flat, p, kernel.variance(kp), kernel.name
                )
            out = kuu_matvec(
                z / ell, lam_flat, p * mask[None, :], kernel.variance(kp),
                kernel.name,
            )
            return out * mask[None, :] + p * (lam_flat * (1.0 - mask))[None, :]
        return blocked_kuu_matvec(kernel, kp, z, lam, p, block=block, mask=mask)

    def run_solve(kp, z, lam, mask, rhs, precond_state):
        return cg_loop(
            lambda p: matvec_for_solve(kp, z, lam, mask, p),
            precond_apply_or_identity,
            precond_state,
            rhs,
            jnp.zeros_like(rhs),
            error_threshold=error_threshold,
            max_iterations=max_iterations,
            max_steps_cycle=max_steps_cycle,
            relative_threshold=relative_threshold,
        )

    @jax.custom_vjp
    def _solve_cvjp(kp, z, lam, mask, rhs, precond_state):
        solution, stats = run_solve(kp, z, lam, mask, rhs, precond_state)
        return solution, CGStats(*stats)

    def solve_fwd(kp, z, lam, mask, rhs, precond_state):
        solution, stats = run_solve(kp, z, lam, mask, rhs, precond_state)
        return (solution, CGStats(*stats)), (kp, z, lam, mask, solution, precond_state)

    def solve_bwd(residuals, cotangents):
        kp, z, lam, mask, solution, precond_state = residuals
        v_bar, _ = cotangents
        # Backward = another (equally preconditioned) matrix-free solve.
        w, _ = run_solve(kp, z, lam, mask, v_bar, precond_state)
        _, matvec_vjp = jax.vjp(
            lambda kp_, z_, lam_: blocked_kuu_matvec(
                kernel, kp_, z_, lam_, solution, block=block, mask=mask
            ),
            kp, z, lam,
        )
        kp_bar, z_bar, lam_bar = matvec_vjp(w)
        neg = lambda t: jax.tree_util.tree_map(jnp.negative, t)
        d_state = jax.tree_util.tree_map(jnp.zeros_like, precond_state)
        return (neg(kp_bar), neg(z_bar), neg(lam_bar),
                None if mask is None else jnp.zeros_like(mask), w, d_state)

    _solve_cvjp.defvjp(solve_fwd, solve_bwd)

    def solve(kp, z, lam, rhs, precond_state=(), mask=None):
        if mask is not None:
            mask = jax.lax.stop_gradient(mask.reshape(-1))
        return _solve_cvjp(kp, z, lam, mask, rhs, precond_state)

    return solve
