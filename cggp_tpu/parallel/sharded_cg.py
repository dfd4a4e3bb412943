"""M-sharded conjugate gradients: psum-blocked Gram matvec inside shard_map.

The single-chip solver (cggp_tpu/ops/cg.py) materialises ``Kuu + Λ`` as an
[M, M] array; past a few tens of thousands of inducing points that no longer
fits one chip's HBM.  Here each device owns a *row block* of the system:

    (p @ A)[*, :] = Σ_d  p[:, rows_d] @ A[rows_d, :]        (psum over d)

with ``A[rows_d, :] = K(Z[rows_d], Z) + diag(Λ)[rows_d, :]`` built locally —
the full Gram matrix never exists on any chip (M²/d per device), the block
matmul rides the MXU, and the reduction is one ``psum`` over ICI per CG
iteration.  The entire CG loop runs inside one ``shard_map`` region, so the
loop-carried [m, M] state stays replicated and only the matvec communicates.

Differentiation: the same implicit-function trick as the dense solver
(reference conjugate_gradient.py:100-118) — the backward pass is another
sharded CG solve ``w = A^{-1} v̄`` plus a VJP of the matvec at the solution:

    θ̄ = -vjp_θ( p ↦ p @ A(θ) )(solution, w),    b̄ = w.

Requires M divisible by the mesh size — :func:`pad_inducing` pads with
far-away pseudo-points whose kernel row underflows to exactly 0, making the
padded system block-diagonal and the padded solution exactly 0.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cggp_tpu.ops.cg import CGStats, cg_loop, spectral_precond_state  # noqa: F401 (re-export)
from cggp_tpu.ops.kernels import Kernel
from cggp_tpu.parallel.mesh import DATA_AXIS

Array = jnp.ndarray


# pad_inducing moved to ops/cg_implicit.py (shared with the single-chip
# matrix-free solver); re-exported here for back-compat.
from cggp_tpu.ops.cg_implicit import pad_inducing  # noqa: E402,F401


def _local_rows(kernel: Kernel, kp, z: Array, lam: Array, axis_name: str,
                mask: Optional[Array] = None):
    """This device's row block of ``K(Z, Z) + diag(Λ)``: [M/d, M].

    ``mask`` (1 = real inducing point, 0 = pad) zeroes the kernel coupling of
    pad rows/columns BEFORE the diagonal add, making the padded system exactly
    block-diagonal regardless of lengthscale or data scale — the
    underflow-at-1e6 trick alone re-couples pads once ``max|z| / lengthscale``
    shrinks below ~15 (e.g. learned lengthscales ~1e5).
    """
    d = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    m = z.shape[0]
    mb = m // d
    offset = i * mb
    z_block = lax.dynamic_slice_in_dim(z, offset, mb, axis=0)
    lam_block = lax.dynamic_slice_in_dim(lam.reshape(-1), offset, mb, axis=0)
    a_rows = kernel.K(kp, z_block, z)  # [mb, M] — built on the fly
    if mask is not None:
        mask = mask.reshape(-1)
        mask_block = lax.dynamic_slice_in_dim(mask, offset, mb, axis=0)
        a_rows = a_rows * (mask_block[:, None] * mask[None, :])
    rows = jnp.arange(mb)
    a_rows = a_rows.at[rows, rows + offset].add(lam_block)
    return a_rows, offset, mb


def _make_local_matvec(a_rows: Array, offset, mb: int, axis_name: str):
    def matvec(p: Array) -> Array:  # p replicated [m, M] -> replicated [m, M]
        p_block = lax.dynamic_slice_in_dim(p, offset, mb, axis=1)
        # Full fp32 precision: TPU's default bf16 matmul passes break CG
        # convergence (see ops/kernels.scaled_squared_distance).
        block_product = jnp.matmul(
            p_block, a_rows, precision=jax.lax.Precision.HIGHEST
        )
        return lax.psum(block_product, axis_name)

    return matvec


# The dispatching apply runs replicated inside the shard_map'd loop: the
# [M, k] factor is small next to the [M^2/d] row blocks and the CG state is
# already replicated, so preconditioning adds no communication.
from cggp_tpu.ops.cg import precond_apply_or_identity as _precond_apply
from cggp_tpu.ops.cg_implicit import pivoted_cholesky_kernel  # re-export




def make_sharded_matvec(kernel: Kernel, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Replicated-in/replicated-out ``p @ (K(Z,Z) + diag(lam))`` matvec:
    ``matvec(kp, z, lam, mask, p)``.  Per-device Gram row blocks built on
    the fly, one psum per call.  Shared by :func:`make_sharded_cg` and the
    sharded model's KL/logdet terms (one definition, one compiled program
    per shape)."""

    def body(kp, z, lam, mask, p):
        a_rows, offset, mb = _local_rows(kernel, kp, z, lam, axis_name, mask)
        return _make_local_matvec(a_rows, offset, mb, axis_name)(p)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P(), P()), out_specs=P()
    )


def make_sharded_slq_value(kernel: Kernel, mesh: Mesh, lanczos_iters: int,
                           axis_name: str = DATA_AXIS):
    """Matrix-free stochastic-Lanczos-quadrature ``logdet`` VALUE over the
    implicit sharded ``K(Z,Z)*mask + diag(lam)`` system:
    ``slq(kp, z, lam, mask, probes [P, M]) -> scalar`` (replicated).

    The whole batched Lanczos runs inside ONE shard_map region, so the
    per-device Gram row block is built once and reused for every iteration;
    each Lanczos step costs one psum.  Probes must be masked (zero on pads) —
    the Hutchinson scaling then targets the real submatrix (see
    :func:`cggp_tpu.ops.logdet.slq_value_rows`).
    """
    from cggp_tpu.ops.logdet import slq_value_rows

    def body(kp, z, lam, mask, probes):
        a_rows, offset, mb = _local_rows(kernel, kp, z, lam, axis_name, mask)
        matvec = _make_local_matvec(a_rows, offset, mb, axis_name)
        return slq_value_rows(matvec, probes, lanczos_iters)

    return jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P(), P()), out_specs=P()
    )


def make_sharded_cg(
    kernel: Kernel,
    mesh: Mesh,
    error_threshold: float,
    max_iterations: int,
    max_steps_cycle: Optional[int] = None,
    axis_name: str = DATA_AXIS,
    relative_threshold: bool = False,
):
    """Build a differentiable sharded solver
    ``solve(kp, z, lam, rhs [m, M]) -> (solution [m, M], CGStats)``.

    ``kp`` are kernel params, ``z`` the inducing inputs (replicated, M
    divisible by the mesh size — see :func:`pad_inducing`), ``lam`` the
    diagonal, ``rhs`` row-batched right-hand sides.
    """
    if max_steps_cycle is None:
        max_steps_cycle = max_iterations + 1
    specs_in = (P(), P(), P(), P(), P())

    def _solve_body(kp, z, lam, mask, rhs, precond_state):
        a_rows, offset, mb = _local_rows(kernel, kp, z, lam, axis_name, mask)
        matvec = _make_local_matvec(a_rows, offset, mb, axis_name)
        return cg_loop(
            matvec,
            _precond_apply,
            precond_state,
            rhs,
            jnp.zeros_like(rhs),
            error_threshold=error_threshold,
            max_iterations=max_iterations,
            max_steps_cycle=max_steps_cycle,
            relative_threshold=relative_threshold,
        )

    sharded_solve = jax.shard_map(
        _solve_body, mesh=mesh, in_specs=specs_in + (P(),),
        out_specs=(P(), CGStats(P(), P(), P())),
    )

    sharded_matvec = make_sharded_matvec(kernel, mesh, axis_name)

    @jax.custom_vjp
    def _solve_cvjp(kp, z, lam, mask, rhs, precond_state):
        solution, stats = sharded_solve(kp, z, lam, mask, rhs, precond_state)
        return solution, CGStats(*stats)

    def solve_fwd(kp, z, lam, mask, rhs, precond_state):
        solution, stats = sharded_solve(kp, z, lam, mask, rhs, precond_state)
        return (solution, CGStats(*stats)), (kp, z, lam, mask, solution, precond_state)

    def solve_bwd(residuals, cotangents):
        kp, z, lam, mask, solution, precond_state = residuals
        v_bar, _stats_bar = cotangents
        # Backward = another (equally preconditioned) CG solve.
        w, _ = sharded_solve(kp, z, lam, mask, v_bar, precond_state)
        # theta_bar = -vjp of (theta -> solution @ A(theta)) at cotangent w.
        _, matvec_vjp = jax.vjp(
            lambda kp_, z_, lam_: sharded_matvec(kp_, z_, lam_, mask, solution),
            kp, z, lam,
        )
        kp_bar, z_bar, lam_bar = matvec_vjp(w)
        neg = lambda t: jax.tree_util.tree_map(jnp.negative, t)
        d_state = jax.tree_util.tree_map(jnp.zeros_like, precond_state)
        return (neg(kp_bar), neg(z_bar), neg(lam_bar),
                jnp.zeros_like(mask), w, d_state)

    _solve_cvjp.defvjp(solve_fwd, solve_bwd)

    def solve(kp, z, lam, rhs, precond_state=(), mask=None):
        if mask is None:
            # No pads declared: every point is real (the 1e6-offset underflow
            # then carries exactness only for unit-ish lengthscales — callers
            # with pads should thread the inducing mask).
            mask = jnp.ones(z.shape[0], dtype=z.dtype)
        return _solve_cvjp(kp, z, lam, jax.lax.stop_gradient(mask.reshape(-1)),
                           rhs, precond_state)

    return solve


class ShardedKuuSolver:
    """Column-convention facade over :func:`make_sharded_cg` matching the
    single-chip :class:`~cggp_tpu.ops.cg.ConjugateGradient` call shape, for
    slotting into CG-powered models."""

    def __init__(
        self,
        kernel: Kernel,
        mesh: Mesh,
        error_threshold: float,
        max_iterations: int,
        max_steps_cycle: Optional[int] = None,
        axis_name: str = DATA_AXIS,
        relative_threshold: bool = False,
    ):
        self.kernel = kernel
        self.mesh = mesh
        self.num_devices = mesh.devices.size
        self._solve = make_sharded_cg(
            kernel, mesh, error_threshold, max_iterations, max_steps_cycle,
            axis_name, relative_threshold=relative_threshold,
        )

    def solve_with_stats(self, kp, z: Array, lam: Array, rhs: Array,
                         precond_state=(), mask: Optional[Array] = None):
        """``rhs`` is [M, m] column-major like the dense facade.  ``mask``
        marks real (1) vs pad (0) inducing points — thread it whenever ``z``
        was padded so pads stay exactly decoupled at any lengthscale."""
        solution, stats = self._solve(
            kp, z, lam.reshape(-1), rhs.T, precond_state, mask=mask
        )
        return solution.T, stats

    def __call__(self, kp, z: Array, lam: Array, rhs: Array,
                 precond_state=(), mask: Optional[Array] = None) -> Array:
        return self.solve_with_stats(kp, z, lam, rhs, precond_state, mask=mask)[0]
