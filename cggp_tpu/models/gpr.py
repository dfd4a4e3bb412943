"""Exact GP regression (the GPflow GPR baseline wrapped at reference
cli_utils.py:449-452 and trained by paper_cli_gpr.py to produce reference
hyperparameters)."""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, NamedTuple, Optional, Tuple

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

    # -- cached serving (net-new; GPflow's ``posterior()`` analogue).  The
    # reference predict path redoes the O(N^3) Cholesky of the FULL training
    # Gram for every batch; the cache factorizes once per params. ----------

    def posterior(self, params: Dict, data: Tuple[Array, Array]) -> "GPRPosterior":
        x, y = data
        n = x.shape[0]
        noise = self.likelihood.variance(params["likelihood"])
        kp = params["kernel"]
        kmm = add_diagonal(self.kernel.K(kp, x), noise * jnp.ones(n, dtype=x.dtype))
        chol = jnp.linalg.cholesky(kmm)
        alpha = jax.scipy.linalg.cho_solve((chol, True), y)
        return GPRPosterior(kernel_params=kp, x_train=x, chol=chol, nu=alpha)

    def posterior_mean(self, post: "GPRPosterior", x_new: Array) -> Array:
        kmn = self.kernel.K(post.kernel_params, post.x_train, x_new)
        return kmn.T @ post.nu

    def posterior_predict(self, post: "GPRPosterior", x_new: Array,
                          full_cov: bool = False) -> Tuple[Array, Array]:
        kp = post.kernel_params
        kmn = self.kernel.K(kp, post.x_train, x_new)  # [N, T]
        a = jax.scipy.linalg.solve_triangular(post.chol, kmn, lower=True)
        if full_cov:
            knn = self.kernel.K(kp, x_new)
            var = (knn - a.T @ a)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            var = (knn - jnp.sum(jnp.square(a), axis=0))[:, None]
        return kmn.T @ post.nu, var

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


class GPRPosterior(NamedTuple):
    """Serving cache from :meth:`GPR.posterior` — a pytree, jit-safe."""

    kernel_params: Dict
    x_train: Array  # [N, D]
    chol: Array  # [N, N] lower Cholesky of Knn + noise I
    nu: Array  # [N, 1] = (Knn + noise I)^{-1} y
