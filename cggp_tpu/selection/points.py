"""OIPS, uniform and greedy max-variance selection (reference selection.py:76-153).

JAX requires static shapes, so the growing-tensor ``tf.while_loop``s of the
reference become fixed-size buffers + masks inside ``lax.fori_loop``:

* :func:`oips` scans points sequentially, accepting point i when
  ``max_j k(x_i, Z_j) < rho * k(x_i, x_i)`` (reference :87-96), writing into a
  preallocated [max_points, D] buffer; the host wrapper trims to the accepted
  count.
* :func:`greedy_selection` runs the CGLB/RobustGP conditional-variance greedy
  rule with a preallocated partial-Cholesky row buffer (reference :113-153).
* :func:`uniform` samples indices WITHOUT replacement — the reference samples
  with replacement (selection.py:106-110, a latent bug; SURVEY.md known-bugs
  item 8), which we deliberately do not reproduce.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cggp_tpu.ops.kernels import Kernel, KernelParams

Array = jnp.ndarray


@partial(jax.jit, static_argnums=(0, 4))
def _oips_scan(kernel: Kernel, params: KernelParams, inputs: Array, rho, max_points: int):
    n = inputs.shape[0]
    dtype = inputs.dtype
    kxx = kernel.K_diag(params, inputs)  # [n]
    start = jnp.argmax(kxx)

    z_idx = jnp.zeros((max_points,), dtype=jnp.int32).at[0].set(start.astype(jnp.int32))
    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)

    def body(i, state):
        z_idx, count = state
        point = inputs[i][None, :]  # [1, D]
        z_points = inputs[z_idx]  # [max_points, D]
        k_row = kernel.K(params, point, z_points)[0]  # [max_points]
        valid = jnp.arange(max_points) < count
        weight = jnp.max(jnp.where(valid, k_row, neg_inf))
        accept = jnp.logical_and(weight < rho * kxx[i], count < max_points)
        accept = jnp.logical_and(accept, i != start)
        z_idx = jnp.where(
            accept,
            z_idx.at[jnp.minimum(count, max_points - 1)].set(i.astype(jnp.int32)),
            z_idx,
        )
        count = count + accept.astype(count.dtype)
        return z_idx, count

    z_idx, count = jax.lax.fori_loop(0, n, body, (z_idx, jnp.asarray(1, dtype=jnp.int32)))
    return z_idx, count


def oips(
    kernel: Kernel, params: KernelParams, inputs: Array, rho: float, max_points: int
) -> Tuple[Array, Array]:
    """Online inducing-point selection. Returns ``(Z [m, D], indices [m])``.

    Host-facing: the sequential scan runs jitted on device; the accepted count
    is fetched once to trim the static buffer (selection runs at update time,
    outside the training step, exactly like the reference's host boundary at
    optimize.py:25).

    At dataset scale the point-at-a-time ``fori_loop`` is impractical (an
    N=291k scan crashed the TPU worker outright, 2026-08-19): for stationary
    kernels ``covernet_select(..., distance_type="correlation",
    resolution=1 - rho)`` computes the IDENTICAL acceptance set
    blocked-parallel in ~0.1 s (exact-equality test in tests/test_covernet.py).
    """
    rho = jnp.asarray(rho, dtype=inputs.dtype)
    z_idx, count = _oips_scan(kernel, params, inputs, rho, int(max_points))
    m = int(count)
    indices = z_idx[:m]
    return inputs[indices], indices


@partial(jax.jit, static_argnums=(0, 3))
def _greedy_scan(kernel: Kernel, params: KernelParams, inputs: Array, max_points: int, perm):
    n = inputs.shape[0]
    x = inputs[perm]
    di = kernel.K_diag(params, x)  # residual conditional variances [n]
    ci = jnp.zeros((max_points, n), dtype=x.dtype)  # partial Cholesky rows
    inds = jnp.zeros((max_points,), dtype=jnp.int32).at[0].set(
        jnp.argmax(di).astype(jnp.int32)
    )

    def body(t, state):
        di, ci, inds = state
        j = inds[t - 1]
        new_z = x[j][None, :]
        dj = jnp.sqrt(jnp.maximum(di[j], 1e-36))
        cj = ci[:, j]  # [max_points]; rows >= t are zero so the matmul is exact
        k_col = kernel.K(params, x, new_z)[:, 0]  # [n]
        ei = (k_col - ci.T @ cj) / dj  # [n]
        ci = ci.at[t - 1].set(ei)
        di = di - jnp.square(ei)
        # Exclude the picked index from all later argmaxes: once residual
        # variances collapse to rounding noise (max_points beyond the
        # numerical rank of K), a picked index at di ~ +-eps could otherwise
        # be re-selected, yielding duplicate inducing points and a
        # rank-deficient Kuu.  (-inf survives the di - ei^2 updates.)
        di = di.at[j].set(-jnp.inf)
        inds = inds.at[t].set(jnp.argmax(di).astype(jnp.int32))
        return di, ci, inds

    di, ci, inds = jax.lax.fori_loop(1, max_points, body, (di, ci, inds))
    return perm[inds]


def greedy_selection(
    kernel: Kernel,
    params: KernelParams,
    inputs: Array,
    max_points: int,
    key: jax.Array,
) -> Tuple[Array, Array]:
    """Greedy conditional-variance selection; returns ``(Z, indices)``."""
    n = inputs.shape[0]
    m = min(int(max_points), n)
    perm = jax.random.permutation(key, n)
    perm_inds = _greedy_scan(kernel, params, inputs, m, perm)
    perm_inds = jax.lax.stop_gradient(perm_inds)
    return inputs[perm_inds], perm_inds


def uniform(inputs: Array, max_points: int, key: jax.Array) -> Tuple[Array, Array]:
    """Uniform subset without replacement (fixes reference selection.py:106-110)."""
    n = inputs.shape[0]
    indices = jax.random.choice(key, n, shape=(int(max_points),), replace=False)
    return inputs[indices], indices
