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
