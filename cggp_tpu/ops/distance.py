"""Distance functions for clustering front-ends.

Mirrors reference distance.py:6-34: ``euclidean``, kernel-induced
``covariance`` (k(x,x) + k(y,y) - 2 k(x,y)) and ``correlation``
(1 - k(x,y) / sqrt(k(x,x) k(y,y))).  All take a single ``(x, y)`` tuple
argument like the reference so they slot into the same k-means / cover-tree
call sites.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

DistanceType = ("euclidean", "covariance", "correlation")


def euclid_distance(args: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    x, y = args
    return jnp.linalg.norm(x - y, axis=-1)


def create_distance_fn(kernel, kernel_params, distance_type: str) -> Callable:
    """Build a distance fn over pairs, parameterised by a kernel spec+params."""

    def _pairwise_k(x, y):
        # Elementwise (broadcast) kernel evaluation k(x_i, y_i).
        ell = kernel.lengthscales(kernel_params)
        diff = (x - y) / ell
        r2 = jnp.maximum(jnp.sum(jnp.square(diff), axis=-1), 0.0)
        from cggp_tpu.ops.kernels import kernel_value_from_r2

        return kernel_value_from_r2(kernel.name, r2, kernel.variance(kernel_params))

    def cov(args):
        x, y = args
        x_diag = kernel.K_diag(kernel_params, x)
        y_diag = kernel.K_diag(kernel_params, y)
        xy = _pairwise_k(x, y)
        return x_diag + y_diag - 2.0 * xy

    def cor(args):
        x, y = args
        x_diag = kernel.K_diag(kernel_params, x)
        y_diag = kernel.K_diag(kernel_params, y)
        xy = _pairwise_k(x, y)
        return 1.0 - xy / jnp.sqrt(x_diag * y_diag)

    functions = {"covariance": cov, "correlation": cor, "euclidean": euclid_distance}
    return functions[distance_type]
