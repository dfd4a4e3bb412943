"""Shared model machinery: Gaussian likelihood, minibatch scaling.

Replaces the GPflow base classes used by the reference (models.py:51-77).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp

from cggp_tpu.ops.bijectors import positive
from cggp_tpu.config import default_float

Array = jnp.ndarray

_LOG2PI = math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class GaussianLikelihood:
    """Gaussian likelihood with positive variance (GPflow closed forms).

    ``variational_expectations`` and ``predict_log_density`` are the exact
    Gaussian expressions GPflow evaluates in the reference's ELBO
    (models.py:132) and metrics callback (optimize.py:306).
    """

    positive_lower: float = 1e-6

    @property
    def bijector(self):
        return positive(self.positive_lower)

    def init_params(self, variance: float = 0.1, dtype=None) -> Dict[str, Array]:
        dtype = default_float() if dtype is None else dtype
        return {"variance": self.bijector.inverse(jnp.asarray(variance, dtype=dtype))}

    def variance(self, params: Dict[str, Array]) -> Array:
        return self.bijector.forward(params["variance"])

    def variational_expectations(
        self, params, f_mean: Array, f_var: Array, y: Array
    ) -> Array:
        """E_q[log N(y | f, sigma^2)] per data point."""
        noise = self.variance(params)
        return -0.5 * (_LOG2PI + jnp.log(noise) + (jnp.square(y - f_mean) + f_var) / noise)

    def predict_log_density(self, params, f_mean: Array, f_var: Array, y: Array) -> Array:
        """log N(y | f_mean, f_var + sigma^2) per data point."""
        total_var = f_var + self.variance(params)
        return -0.5 * (_LOG2PI + jnp.log(total_var) + jnp.square(y - f_mean) / total_var)


def minibatch_scale(num_data: Optional[int], batch_size: int, dtype) -> Array:
    """N / batch ELBO scale (reference models.py:163-169)."""
    if num_data is None:
        return jnp.asarray(1.0, dtype=dtype)
    return jnp.asarray(num_data, dtype=dtype) / jnp.asarray(batch_size, dtype=dtype)


class CholPosterior(NamedTuple):
    """Params-only serving cache for the Cholesky-family models
    (ClusterGP / LpSVGP): the [M, M] factor of ``Kmm + diag(var)`` and the
    predictive weight vector ``nu``.  A pytree, so it passes straight
    through ``jax.jit``.  The reference (and round-1 ``predict_f``) rebuilds
    the O(M^3) Cholesky for EVERY serving batch; with the cache each batch
    costs one [M, T] kernel block, one triangular solve, and a skinny
    matmul (GPflow's ``posterior()`` analogue)."""

    kernel_params: Dict
    inducing_points: Array  # [M, D]
    chol: Array  # [M, M] lower Cholesky of Kmm + diag(var)
    nu: Array  # [M, 1] predictive weights: mean(x) = K(x, Z) @ nu


# kappa * eps must stay below this for a one-shot fp32 Cholesky serving
# factorization to be trustworthy; 0.1 also absorbs the mild optimism of
# the Ritz-value estimate (lanczos_extremal_eigs docstring).  Single source
# for the dense CGGP and the row-solver/sharded models.
CHOL_KAPPA_EPS_MARGIN = 0.1


def chol_or_cg_from_eigs(eig_min, eig_max, dtype,
                         margin: float = CHOL_KAPPA_EPS_MARGIN) -> str:
    """Serving-solver policy from extremal-eigenvalue estimates: ``"chol"``
    iff the estimated ``kappa * eps(dtype)`` is safely below 1.  A
    NON-finite estimate means poisoned inputs, not ill-conditioning (CG
    would serve NaNs too): defer to ``"chol"`` so the serving-time NaN
    fallback surfaces its diagnostic warning."""
    import numpy as _np

    eps = float(jnp.finfo(dtype).eps)
    tiny = float(jnp.finfo(dtype).tiny)
    kappa = float(eig_max) / max(float(eig_min), tiny)
    if not _np.isfinite(kappa):
        return "chol"
    return "chol" if kappa * eps <= margin else "cg"
