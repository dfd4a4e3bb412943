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


def _matvec_kernel(a_ref, pt_ref, out_ref):
    # One grid step i: out[i-panel, :] = A[i-panel, :] @ p^T.
    # A row panels are CONTIGUOUS in HBM (row-major), so the stream hits full
    # DMA bandwidth; column panels (the naive p @ A tiling) are strided and
    # measured ~2x slower.
    out_ref[:] = jnp.dot(a_ref[:], pt_ref[:], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("block_i", "interpret"))
def pallas_matvec(
    p: Array,
    a: Array,
    block_i: int = 512,
    interpret: bool = False,
) -> Array:
    """``p @ A`` for SYMMETRIC A streamed once through VMEM.

    Uses ``p @ A = (A @ p^T)^T`` so A is read in contiguous row panels
    ([block_i, M], double-buffered by the Pallas pipeline) while the skinny
    ``p^T`` stays resident: [R, M] x [M, M] -> [R, M].
    """
    r, m = p.shape
    assert a.shape == (m, m), (p.shape, a.shape)
    dtype = jnp.float32

    m_p = _round_up(m, max(block_i, LANE))
    r_p = _round_up(r, LANE)

    pt = jnp.zeros((m_p, r_p), dtype).at[:m, :r].set(p.astype(dtype).T)
    ap = jnp.zeros((m_p, m_p), dtype).at[:m, :m].set(a.astype(dtype))

    grid = (m_p // block_i,)
    out = pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, m_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_p, r_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, r_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, r_p), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_p * m_p * m_p,
            bytes_accessed=4 * (m_p * m_p + m_p * r_p * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ap, pt)
    return out[:m, :r].T.astype(p.dtype)
