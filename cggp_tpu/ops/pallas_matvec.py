"""Pallas TPU kernel: HBM-streaming row-batched matvec ``p @ A``.

The CG hot loop multiplies a skinny row-block ``p [R, M]`` (R = 16-128 RHS)
against the materialised system matrix ``A [M, M]`` once per iteration
(reference conjugate_gradient.py:64-85).  XLA's generic matmul reaches only
~25% of HBM bandwidth on this shape (measured on v5e); this kernel tiles A
into [M, BJ] column panels that stream through VMEM with Pallas's automatic
double buffering while the resident ``p`` stays in VMEM, so the runtime is
the time to read A once.

Used by ``ConjugateGradient(matvec="pallas")`` on the dense single-chip path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matvec_kernel(p_ref, a_ref, out_ref):
    # One grid step j: out[:, j-panel] = p @ A[:, j-panel].
    out_ref[:] = jnp.dot(p_ref[:], a_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_j", "interpret"))
def pallas_matvec(
    p: Array,
    a: Array,
    block_j: int = 256,
    interpret: bool = False,
) -> Array:
    """``p @ A`` with A streamed once through VMEM: [R, M] x [M, M] -> [R, M]."""
    r, m = p.shape
    assert a.shape == (m, m), (p.shape, a.shape)
    dtype = jnp.float32

    m_p = _round_up(m, max(block_j, LANE))
    r_p = _round_up(r, 8)

    pp = jnp.zeros((r_p, m_p), dtype).at[:r, :m].set(p.astype(dtype))
    ap = jnp.zeros((m_p, m_p), dtype).at[:m, :m].set(a.astype(dtype))

    grid = (m_p // block_j,)
    out = pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_p, m_p), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_p, block_j), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_p, block_j), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_p, m_p), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_p * m_p * m_p,
            bytes_accessed=4 * (m_p * m_p + r_p * m_p * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pp, ap)
    return out[:r, :m].astype(p.dtype)
