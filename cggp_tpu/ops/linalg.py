"""Small linear-algebra helpers.

``add_diagonal`` mirrors reference utils.py:11-17. The compensated (Kahan)
reduction helpers back the fp32 TPU CG path: on TPU fp64 is emulated and slow,
so CG inner products use error-compensated fp32 accumulation instead
(BASELINE.md parity config 4).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def add_diagonal(matrix: jnp.ndarray, diagonal: jnp.ndarray) -> jnp.ndarray:
    """Return ``matrix + diag(diagonal)`` for an [n, n] matrix and [n] vector."""
    n = matrix.shape[-1]
    idx = jnp.arange(n)
    return matrix.at[..., idx, idx].add(diagonal)


def pad_rows_to_blocks(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Reshape ``x [n, d]`` into fixed-size row blocks
    ``[num_blocks, block_size, d]`` for a ``lax.map`` sweep, padding the
    tail block with broadcast copies of row 0 (callers strip outputs back
    to ``[:n]``).  Shared by the one-dispatch serving sweeps
    (``posterior_predict_scan``, ``pathwise_samples_scan``) and the blocked
    k-means distances so the pad-row convention cannot drift apart.
    ``block_size`` is used as given — callers clamp/round it first (mesh
    multiples, dataset size) — except that it is floored at 1 so an empty
    ``x`` yields zero blocks instead of a division by zero."""
    n, d = x.shape
    block = max(int(block_size), 1)
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad, d))])
    return x.reshape(-1, block, d)


def two_sum(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Knuth's exact two-sum: a + b = s + err with s = fl(a + b)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def compensated_sum(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """Kahan-compensated summation along ``axis``.

    Gives close-to-fp64 accuracy for fp32 inputs at ~4x the VPU adds — still
    negligible next to the MXU matvec it follows inside a CG step.
    """
    x = jnp.moveaxis(x, axis, 0)

    def body(carry, xi):
        s, c = carry
        y = xi - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    import jax

    (s, _c), _ = jax.lax.scan(body, (jnp.zeros_like(x[0]), jnp.zeros_like(x[0])), x)
    if keepdims:
        s = jnp.expand_dims(s, axis)
    return s


def compensated_dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Row-wise dot product ``sum(a * b, -1)`` with compensated accumulation."""
    return compensated_sum(a * b, axis=-1, keepdims=keepdims)


def chol_extend(l11: jnp.ndarray, a21: jnp.ndarray, a22: jnp.ndarray) -> jnp.ndarray:
    """Bordered Cholesky update: extend the factor of a leading block.

    Given ``L11`` = lower Cholesky of the [M, M] leading block ``A11`` and
    the new blocks ``A21 [dM, M]`` / ``A22 [dM, dM]`` of the extended SPD
    matrix ``[[A11, A21^T], [A21, A22]]``, returns the [M+dM, M+dM] lower
    Cholesky factor

        L' = [[L11,   0 ],
              [L21,  L22]]    with  L21 = A21 L11^{-T},
                                    L22 = chol(A22 - L21 L21^T).

    Cost: one [dM, M] triangular solve + one [dM, dM] Schur complement +
    one [dM, dM] Cholesky — O(dM * M^2 + dM^2 * M + dM^3) instead of the
    O((M+dM)^3) full refactorization; for dM << M this is the streaming
    serving-cache extension (net-new; no reference twin — the reference
    refactorizes per batch, models.py:238-249).

    The Schur complement runs at HIGHEST matmul precision (the subtraction
    is cancellation-prone in bf16).  If ``A22 - L21 L21^T`` is not positive
    definite at working precision the [dM, dM] Cholesky yields NaN — callers
    should check ``isfinite`` and fall back to a full factorization (same
    contract as ``CholPreconditioner``'s non-finite guard).
    """
    import jax

    hi = jax.lax.Precision.HIGHEST
    m = l11.shape[-1]
    dm = a22.shape[-1]
    # L21^T = L11^{-1} A21^T (forward substitution against the old factor).
    l21_t = jax.scipy.linalg.solve_triangular(l11, a21.T, lower=True)
    schur = a22 - jnp.matmul(l21_t.T, l21_t, precision=hi)
    l22 = jnp.linalg.cholesky(schur)
    top = jnp.concatenate([l11, jnp.zeros((m, dm), l11.dtype)], axis=1)
    bottom = jnp.concatenate([l21_t.T, l22], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def triangular_inv_extend(w11: jnp.ndarray, l21: jnp.ndarray,
                          l22: jnp.ndarray) -> jnp.ndarray:
    """Extend a cached triangular inverse ``W11 = L11^{-1}`` to the bordered
    factor's inverse:

        W' = L'^{-1} = [[ W11,          0  ],
                        [-W22 L21 W11,  W22]]    with  W22 = L22^{-1}.

    ``l21``/``l22`` come from :func:`chol_extend`'s bottom row.  This is the
    streaming update of :class:`~cggp_tpu.ops.cg.CholPreconditioner` state
    (which stores ``W``, not ``L``): O(dM * M^2) instead of the O((M+dM)^3)
    triangular solve against the identity.
    """
    import jax

    hi = jax.lax.Precision.HIGHEST
    m = w11.shape[-1]
    dm = l22.shape[-1]
    w22 = jax.scipy.linalg.solve_triangular(
        l22, jnp.eye(dm, dtype=l22.dtype), lower=True
    )
    w21 = -jnp.matmul(
        w22, jnp.matmul(l21, w11, precision=hi), precision=hi
    )
    top = jnp.concatenate([w11, jnp.zeros((m, dm), w11.dtype)], axis=1)
    bottom = jnp.concatenate([w21, w22], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def pivoted_cholesky(matrix: jnp.ndarray, rank: int) -> jnp.ndarray:
    """Greedy partial pivoted Cholesky: ``L [n, rank]`` with ``L L^T ~= matrix``.

    Each step picks the largest remaining diagonal (the greedy trace-error
    pivot), so for kernel matrices with fast spectral decay the approximation
    error drops geometrically in ``rank`` — this is the classic CG
    preconditioner factor (net-new vs the reference, which has no
    preconditioner construction beyond block-Jacobi,
    conjugate_gradient.py:137-157).

    Runs as a fixed-``rank`` ``fori_loop`` with static shapes (jit-safe).
    Exhausted or numerically non-positive pivots contribute zero columns, so
    requesting ``rank > numerical rank`` is safe.  Cost: one [n, rank]-by-
    [rank] matvec + one gathered row of ``matrix`` per step, O(n * rank^2)
    total.
    """
    import jax

    def row_fn(pivot):
        return jax.lax.dynamic_index_in_dim(matrix, pivot, axis=0, keepdims=False)

    return pivoted_cholesky_matfree(row_fn, jnp.diagonal(matrix), rank)


def pivoted_cholesky_matfree(row_fn, diag: jnp.ndarray, rank: int) -> jnp.ndarray:
    """Matrix-free pivoted Cholesky: the matrix is exposed only through
    ``row_fn(pivot) -> row [n]`` and its ``diag [n]``.

    This is what makes preconditioning possible in the M-sharded regime
    where ``Kuu`` is never materialised (parallel/sharded_cg.py): each step
    evaluates ONE kernel row on the fly — O(rank * n * d) kernel work total
    instead of an [n, n] Gram build.
    """
    import jax

    n = diag.shape[0]
    dtype = diag.dtype
    # Relative pivot floor: once the residual diagonal falls to rounding
    # noise, further columns are amplified garbage (each is divided by
    # sqrt(pivot)); stop contributing instead.
    eps = float(jnp.finfo(dtype).eps)
    tiny = 10.0 * eps * jnp.maximum(jnp.max(diag), 1e-30)

    def step(i, carry):
        ell, d = carry
        pivot = jnp.argmax(d)
        val = d[pivot]
        ok = val > tiny
        row = row_fn(pivot)
        ell_pivot = jax.lax.dynamic_index_in_dim(ell, pivot, axis=0, keepdims=False)
        cross = jnp.matmul(ell, ell_pivot, precision=jax.lax.Precision.HIGHEST)
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(val, tiny))
        col = jnp.where(ok, (row - cross) * inv_sqrt, jnp.zeros_like(row))
        ell = ell.at[:, i].set(col)
        d = jnp.maximum(d - jnp.square(col), 0.0)
        d = d.at[pivot].set(0.0)
        return ell, d

    ell0 = jnp.zeros((n, rank), dtype=dtype)
    ell, _d = jax.lax.fori_loop(0, rank, step, (ell0, diag))
    return ell
