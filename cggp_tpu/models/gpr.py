"""Exact GP regression (the GPflow GPR baseline wrapped at reference
cli_utils.py:449-452 and trained by paper_cli_gpr.py to produce reference
hyperparameters)."""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cggp_tpu.models.base import GaussianLikelihood
from cggp_tpu.ops.kernels import Kernel
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.config import default_float

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GPR:
    """Exact GPR: O(N^3) Cholesky — used on <=10k-row slices like the
    reference (paper_cli_gpr.py:60-66)."""

    kernel: Kernel
    likelihood: GaussianLikelihood = GaussianLikelihood()

    def init_params(self, input_dim: int, variance: float = 1.0,
                    lengthscales=None, noise_variance: float = 0.1,
                    dtype=None) -> Dict:
        dtype = default_float() if dtype is None else dtype
        if lengthscales is None:
            lengthscales = jnp.ones((input_dim,), dtype=dtype)
        return {
            "kernel": self.kernel.init_params(variance, lengthscales, dtype=dtype),
            "likelihood": self.likelihood.init_params(noise_variance, dtype=dtype),
        }

    def log_marginal_likelihood(self, params: Dict, data: Tuple[Array, Array]) -> Array:
        x, y = data
        n = x.shape[0]
        noise = self.likelihood.variance(params["likelihood"])
        k = add_diagonal(self.kernel.K(params["kernel"], x), noise * jnp.ones(n, dtype=x.dtype))
        chol = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((chol, True), y)
        quad = jnp.sum(y * alpha)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (quad + logdet + n * math.log(2.0 * math.pi))

    # In the reference CLI, GPR's objective plays the role of the ELBO.
    def maximum_log_likelihood_objective(self, params, data):
        return self.log_marginal_likelihood(params, data)

    def training_loss(self, params: Dict, data: Tuple[Array, Array]) -> Array:
        return -self.log_marginal_likelihood(params, data)

    def predict_f(
        self, params: Dict, data: Tuple[Array, Array], x_new: Array, full_cov: bool = False
    ) -> Tuple[Array, Array]:
        x, y = data
        n = x.shape[0]
        noise = self.likelihood.variance(params["likelihood"])
        kp = params["kernel"]
        kmm = add_diagonal(self.kernel.K(kp, x), noise * jnp.ones(n, dtype=x.dtype))
        kmn = self.kernel.K(kp, x, x_new)  # [N, T]
        chol = jnp.linalg.cholesky(kmm)
        alpha = jax.scipy.linalg.cho_solve((chol, True), y)
        mu = kmn.T @ alpha
        a = jax.scipy.linalg.solve_triangular(chol, kmn, lower=True)  # [N, T]
        if full_cov:
            knn = self.kernel.K(kp, x_new)
            var = (knn - a.T @ a)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            var = (knn - jnp.sum(jnp.square(a), axis=0))[:, None]
        return mu, var
