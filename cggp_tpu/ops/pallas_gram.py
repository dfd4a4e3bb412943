"""Pallas TPU kernel: fused Gram-matrix matvec, K never materialised in HBM.

The hot op of every CG iteration and every prediction pass is
``K(x, z) @ v`` (reference conjugate_gradient.py:64-85 hot loop;
models.py:333-340 predict solves).  XLA materialises ``K`` ([N, M]) in HBM —
at N=435k, M=1024 that is a 1.7 GB round-trip per matvec.  This kernel tiles
x and z blocks through VMEM, builds the kernel tile with the MXU
(cross-term matmul) + VPU (elementwise), and accumulates ``K_tile @ v_tile``
on the MXU, so HBM traffic drops from O(N*M) to O((N+M)*D + (N+M)*R).

Inputs are pre-scaled by lengthscales (x/ell) and zero-padded on the feature
axis to a lane multiple — zero padding is exact for scaled squared
distances.  Kernel families: se / matern12 / matern32 / matern52 (same
closed forms as cggp_tpu.ops.kernels.kernel_value_from_r2).

The grid is (N/BN, M/BM) with the M axis innermost, accumulating into the
[BN, R] output block (zeroed at j == 0) — the standard Pallas reduction
pattern.  A custom VJP is NOT defined here: the op is only used inside CG's
custom VJP (which needs matvecs, not matvec gradients) and in inference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_tile(name: str, r2, variance):
    """Stationary kernel value from the scaled squared distance (VPU).

    Delegates to the XLA path's closed forms — pure jnp, traceable inside a
    Pallas body — so a kernel-math fix cannot diverge the fused path."""
    from cggp_tpu.ops.kernels import kernel_value_from_r2

    return kernel_value_from_r2(name, r2, variance)


def _gram_matvec_kernel(kernel_name, x_ref, z_ref, v_ref, var_ref, out_ref, acc_ref):
    """One (i, j) grid step: acc[i] += K(x_i, z_j) @ v_j."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xs = x_ref[:]  # [BN, Dp], pre-scaled
    zs = z_ref[:]  # [BM, Dp]
    # r2 = |x|^2 + |z|^2 - 2 x z^T; cross term on the MXU.
    x2 = jnp.sum(jnp.square(xs), axis=-1, keepdims=True)  # [BN, 1]
    z2 = jnp.sum(jnp.square(zs), axis=-1, keepdims=True)  # [BM, 1]
    cross = jax.lax.dot_general(
        xs, zs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # bf16 passes cancel badly in r2
    )  # [BN, BM]
    r2 = jnp.maximum(x2 + z2.T - 2.0 * cross, 0.0)
    k_tile = _kernel_tile(kernel_name, r2, var_ref[0, 0])
    acc_ref[:] += jnp.dot(k_tile, v_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("kernel_name", "block_n", "block_m", "interpret"),
)
def gram_matvec(
    x_scaled: Array,
    z_scaled: Array,
    v: Array,
    variance: Array,
    kernel_name: str = "se",
    block_n: int = 512,
    block_m: int = 512,
    interpret: bool = False,
) -> Array:
    """``K(x, z) @ v`` fused: [N, D], [M, D], [M, R] -> [N, R].

    ``x_scaled``/``z_scaled`` must already be divided by the lengthscales.
    Pads N/M/D/R to hardware-friendly multiples internally (zero rows of z
    with zero v rows contribute exactly 0).
    """
    n, d = x_scaled.shape
    m = z_scaled.shape[0]
    r = v.shape[-1]
    dtype = jnp.float32

    n_p = _round_up(n, block_n)
    m_p = _round_up(m, block_m)
    d_p = _round_up(d, LANE)
    r_p = _round_up(r, LANE)

    # Zero padding is exact: padded z ROWS pair with zero v rows (their K
    # values are multiplied by 0), and padded feature COLUMNS add 0 to r2.
    xp = jnp.zeros((n_p, d_p), dtype).at[:n, :d].set(x_scaled.astype(dtype))
    zp = jnp.zeros((m_p, d_p), dtype).at[:m, :d].set(z_scaled.astype(dtype))
    vp = jnp.zeros((m_p, r_p), dtype).at[:m, :r].set(v.astype(dtype))
    var = jnp.asarray(variance, dtype).reshape(1, 1)

    grid = (n_p // block_n, m_p // block_m)
    out = pl.pallas_call(
        functools.partial(_gram_matvec_kernel, kernel_name),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d_p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d_p), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, r_p), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, r_p), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_p, r_p), dtype),
        scratch_shapes=[pltpu.VMEM((block_n, r_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_p * m_p * (d_p + r_p),
            bytes_accessed=4 * (n_p * d_p + grid[0] * m_p * (d_p + r_p) + n_p * r_p),
            transcendentals=n_p * m_p,
        ),
        interpret=interpret,
    )(xp, zp, vp, var)
    return out[:n, :r].astype(v.dtype)


def kuu_matvec(
    z_scaled: Array,
    lam: Array,
    p_rows: Array,
    variance: Array,
    kernel_name: str = "se",
    interpret: bool = False,
    block_n: int = 512,
    block_m: int = 512,
) -> Array:
    """Row-convention CG matvec ``p @ (K(Z,Z) + diag(lam))`` fused.

    K is symmetric so ``p @ K = (K @ p^T)^T``; the diagonal term is added
    elementwise.  ``p_rows`` is [R, M]; returns [R, M].
    """
    kp = gram_matvec(
        z_scaled, z_scaled, p_rows.T, variance, kernel_name,
        block_n=block_n, block_m=block_m, interpret=interpret,
    )  # [M, R]
    return kp.T + p_rows * lam.reshape(1, -1)
