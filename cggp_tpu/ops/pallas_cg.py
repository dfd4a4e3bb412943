"""Pallas TPU kernel: the ENTIRE CG solve in one launch, matrix resident in VMEM.

For small/mid M (A = M² fp32 ≤ ~16 MB, i.e. M ≤ ~2048) the production CG is
launch/loop-overhead-bound, not bandwidth-bound (benchmarks: ~10k iters/s
ceiling regardless of M below ~4096).  This kernel loads ``A`` into VMEM
once and runs the whole ``lax.while_loop`` inside the kernel: every
iteration's matvec reads A from VMEM (no HBM traffic, no per-iteration
dispatch), with the same stopping rule as the reference solver
(conjugate_gradient.py:59-62: all ``0.5‖r‖² ≤ threshold`` or max iters).

Only the never-restart configuration is supported in-kernel
(``max_steps_cycle > max_iterations``, the facade default) and only the
identity preconditioner — exactly the hot training configuration.

Exact zero-padding: padded columns of A are given unit diagonal (decoupled
rows) and padded rhs entries are 0, so padded solution entries stay 0.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cg_kernel(threshold, max_iterations, a_ref, b_ref, out_ref, steps_ref):
    a = a_ref[:]  # [Mp, Mp] resident in VMEM for the whole solve
    b = b_ref[:]  # [Rp, Mp]
    dtype = b.dtype
    min_float = jnp.asarray(1e-16, dtype)
    zero = jnp.asarray(0.0, dtype)
    thr = jnp.asarray(threshold, dtype)

    def matvec(p):
        return jnp.dot(p, a, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    r0 = b  # v0 = 0
    rz0 = jnp.sum(r0 * r0, axis=-1, keepdims=True)

    def cond(state):
        i, v, r, p, rz = state
        over = jnp.any(0.5 * jnp.sum(r * r, axis=-1, keepdims=True) > thr)
        return jnp.logical_and(over, i < max_iterations)

    def body(state):
        i, v, r, p, rz = state
        pA = matvec(p)
        denom = jnp.sum(p * pA, axis=-1, keepdims=True)
        gamma = jnp.where(denom <= min_float, zero, rz / denom)
        v = v + gamma * p
        r = r - gamma * pA
        new_rz = jnp.sum(r * r, axis=-1, keepdims=True)
        p = r + jnp.where(rz <= min_float, zero, p * new_rz / rz)
        return (i + 1, v, r, p, new_rz)

    init = (jnp.asarray(0, jnp.int32), jnp.zeros_like(b), r0, r0, rz0)
    i, v, r, p, rz = jax.lax.while_loop(cond, body, init)
    out_ref[:] = v
    steps_ref[0] = i


@functools.partial(jax.jit, static_argnames=("threshold", "max_iterations", "interpret"))
def pallas_cg_solve(
    a: Array,
    rhs: Array,
    threshold: float,
    max_iterations: int,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Solve ``v A = b`` (row convention) fully in-kernel.

    Args:
        a: symmetric PD [M, M]; M² fp32 plus CG state must fit VMEM
           (practically M ≤ ~1500 with a 2048-row RHS block).
        rhs: [R, M] row right-hand sides.
    Returns:
        ``(solution [R, M], steps int32)``.
    """
    r, m = rhs.shape
    assert a.shape == (m, m)
    dtype = jnp.float32

    m_p = _round_up(m, LANE)
    r_p = _round_up(r, 8)
    ap = jnp.zeros((m_p, m_p), dtype).at[:m, :m].set(a.astype(dtype))
    if m_p > m:
        pad_idx = jnp.arange(m, m_p)
        ap = ap.at[pad_idx, pad_idx].set(1.0)  # decoupled unit rows
    bp = jnp.zeros((r_p, m_p), dtype).at[:r, :m].set(rhs.astype(dtype))

    # The while_loop carries (v, r, p, rz) plus temporaries and the compiler
    # double-buffers some of them; budget ~12 row-blocks + A + headroom.
    vmem_bytes = 4 * (m_p * m_p + 12 * r_p * m_p) + 8 * 1024 * 1024
    solution, steps = pl.pallas_call(
        functools.partial(_cg_kernel, float(threshold), int(max_iterations)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_p, m_p), dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 120 * 1024 * 1024),
        ),
        interpret=interpret,
    )(ap, bp)
    return solution[:r, :m].astype(rhs.dtype), steps[0]
