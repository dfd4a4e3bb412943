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

from cggp_tpu.ops.cg import CGStats, cg_loop
from cggp_tpu.ops.kernels import Kernel

Array = jnp.ndarray


def blocked_kuu_matvec(
    kernel: Kernel, kp, z: Array, lam: Array, p: Array, block: int = 2048
) -> Array:
    """``p @ (K(Z,Z) + diag(lam))`` via scanned row panels; differentiable.

    ``p`` is [R, M] rows; peak extra memory is one [block, M] panel.
    M must be a multiple of ``block`` or smaller than it.
    """
    m = z.shape[0]
    lam = lam.reshape(-1)
    if m <= block:
        a = kernel.K(kp, z)
        return p @ a + p * lam[None, :]

    assert m % block == 0, (m, block)
    num_blocks = m // block
    z_blocks = z.reshape(num_blocks, block, z.shape[-1])
    p_blocks = jnp.moveaxis(p.reshape(p.shape[0], num_blocks, block), 1, 0)

    def panel(carry, inputs):
        z_blk, p_blk = inputs
        a_rows = kernel.K(kp, z_blk, z)  # [block, M] on the fly
        return carry + p_blk @ a_rows, None

    init = jnp.zeros_like(p)
    out, _ = lax.scan(panel, init, (z_blocks, p_blocks))
    return out + p * lam[None, :]


def make_implicit_cg(
    kernel: Kernel,
    error_threshold: float,
    max_iterations: int,
    max_steps_cycle: Optional[int] = None,
    block: int = 2048,
    use_pallas: bool = False,
):
    """Build ``solve(kp, z, lam, rhs [R, M]) -> (solution, CGStats)``.

    ``use_pallas=True`` runs the forward/backward solve matvecs through the
    fused Pallas kernel (TPU only); the gradient's matvec-VJP always goes
    through the differentiable blocked XLA path.
    """
    if max_steps_cycle is None:
        max_steps_cycle = max_iterations + 1

    def matvec_for_solve(kp, z, lam, p):
        if use_pallas:
            from cggp_tpu.ops.pallas_gram import kuu_matvec

            ell = kernel.lengthscales(kp)
            return kuu_matvec(
                z / ell, lam.reshape(-1), p, kernel.variance(kp), kernel.name
            )
        return blocked_kuu_matvec(kernel, kp, z, lam, p, block=block)

    def eye_apply(state, vec, mat):
        del state, mat
        return vec, jnp.sum(jnp.square(vec), axis=-1, keepdims=True)

    def run_solve(kp, z, lam, rhs):
        return cg_loop(
            lambda p: matvec_for_solve(kp, z, lam, p),
            eye_apply,
            (),
            rhs,
            jnp.zeros_like(rhs),
            error_threshold=error_threshold,
            max_iterations=max_iterations,
            max_steps_cycle=max_steps_cycle,
        )

    @jax.custom_vjp
    def solve(kp, z, lam, rhs):
        solution, stats = run_solve(kp, z, lam, rhs)
        return solution, CGStats(*stats)

    def solve_fwd(kp, z, lam, rhs):
        solution, stats = run_solve(kp, z, lam, rhs)
        return (solution, CGStats(*stats)), (kp, z, lam, solution)

    def solve_bwd(residuals, cotangents):
        kp, z, lam, solution = residuals
        v_bar, _ = cotangents
        w, _ = run_solve(kp, z, lam, v_bar)
        _, matvec_vjp = jax.vjp(
            lambda kp_, z_, lam_: blocked_kuu_matvec(
                kernel, kp_, z_, lam_, solution, block=block
            ),
            kp, z, lam,
        )
        kp_bar, z_bar, lam_bar = matvec_vjp(w)
        neg = lambda t: jax.tree_util.tree_map(jnp.negative, t)
        return neg(kp_bar), neg(z_bar), neg(lam_bar), w

    solve.defvjp(solve_fwd, solve_bwd)
    return solve
