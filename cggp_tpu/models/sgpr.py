"""Titsias SGPR (the GPflow baseline used throughout the reference sweeps,
cli_utils.py:444-446).  Our own implementation of the collapsed ELBO since
GPflow is not a dependency of the TPU build."""

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
class SGPR:
    """Sparse GP regression with the collapsed Titsias bound.

    Internal-data model: ``elbo(params, data)`` over the full training set
    (reference trains it with L-BFGS, optimize.py:153-195).
    """

    kernel: Kernel
    likelihood: GaussianLikelihood = GaussianLikelihood()
    jitter: float = 1e-6

    def init_params(self, inducing_points: Array, variance: float = 1.0,
                    lengthscales=None, noise_variance: float = 0.1,
                    dtype=None) -> Dict:
        dtype = default_float() if dtype is None else dtype
        z = jnp.asarray(inducing_points, dtype=dtype)
        if lengthscales is None:
            lengthscales = jnp.ones((z.shape[-1],), dtype=dtype)
        return {
            "kernel": self.kernel.init_params(variance, lengthscales, dtype=dtype),
            "likelihood": self.likelihood.init_params(noise_variance, dtype=dtype),
            "inducing_points": z,
        }

    def _common(self, params: Dict, x: Array):
        kp = params["kernel"]
        z = params["inducing_points"]
        m = z.shape[0]
        kuu = add_diagonal(
            self.kernel.K(kp, z), self.jitter * jnp.ones(m, dtype=z.dtype)
        )
        kuf = self.kernel.K(kp, z, x)  # [M, N]
        chol_uu = jnp.linalg.cholesky(kuu)
        return kp, z, kuu, kuf, chol_uu

    def elbo(self, params: Dict, data: Tuple[Array, Array]) -> Array:
        x, y = data
        n = x.shape[0]
        dtype = x.dtype
        noise = self.likelihood.variance(params["likelihood"])
        sigma = jnp.sqrt(noise)

        kp, z, kuu, kuf, chol_uu = self._common(params, x)
        m = z.shape[0]

        a = jax.scipy.linalg.solve_triangular(chol_uu, kuf, lower=True) / sigma  # [M, N]
        aat = a @ a.T
        b = aat + jnp.eye(m, dtype=dtype)
        chol_b = jnp.linalg.cholesky(b)
        a_y = a @ y  # [M, 1]
        c = jax.scipy.linalg.solve_triangular(chol_b, a_y, lower=True) / sigma

        kdiag_sum = jnp.sum(self.kernel.K_diag(kp, x))

        bound = -0.5 * n * math.log(2.0 * math.pi)
        bound -= jnp.sum(jnp.log(jnp.diagonal(chol_b)))
        bound -= 0.5 * n * jnp.log(noise)
        bound -= 0.5 * jnp.sum(jnp.square(y)) / noise
        bound += 0.5 * jnp.sum(jnp.square(c))
        bound -= 0.5 * kdiag_sum / noise
        bound += 0.5 * jnp.trace(aat)
        return bound

    def training_loss(self, params: Dict, data: Tuple[Array, Array]) -> Array:
        return -self.elbo(params, data)

    # -- cached serving (net-new; GPflow's ``posterior()`` analogue).  The
    # reference predict path recomputes the [M, N] Kuf block, BOTH Cholesky
    # factors, and the information vector for EVERY batch (the dominant
    # serving cost at N >> M); the cache binds the training set once and
    # each batch is two [M, T] triangular solves. --------------------------

    def posterior(self, params: Dict, data: Tuple[Array, Array]) -> "SGPRPosterior":
        x, y = data
        dtype = x.dtype
        noise = self.likelihood.variance(params["likelihood"])
        sigma = jnp.sqrt(noise)
        kp, z, kuu, kuf, chol_uu = self._common(params, x)
        m = z.shape[0]
        a = jax.scipy.linalg.solve_triangular(chol_uu, kuf, lower=True) / sigma
        b = a @ a.T + jnp.eye(m, dtype=dtype)
        chol_b = jnp.linalg.cholesky(b)
        c = jax.scipy.linalg.solve_triangular(chol_b, a @ y, lower=True) / sigma
        # Fold both back-substitutions into one weight vector so the cached
        # MEAN is a single skinny matmul: mu = Kus^T (Luu^-T Lb^-T c).
        w = jax.scipy.linalg.solve_triangular(
            chol_uu.T,
            jax.scipy.linalg.solve_triangular(chol_b.T, c, lower=False),
            lower=False,
        )
        return SGPRPosterior(kernel_params=kp, inducing_points=z,
                             chol_uu=chol_uu, chol_b=chol_b, nu=w)

    def posterior_mean(self, post: "SGPRPosterior", x_new: Array) -> Array:
        kus = self.kernel.K(post.kernel_params, post.inducing_points, x_new)
        return kus.T @ post.nu

    def posterior_predict(self, post: "SGPRPosterior", x_new: Array,
                          full_cov: bool = False) -> Tuple[Array, Array]:
        kp = post.kernel_params
        kus = self.kernel.K(kp, post.inducing_points, x_new)  # [M, T]
        tmp1 = jax.scipy.linalg.solve_triangular(post.chol_uu, kus, lower=True)
        tmp2 = jax.scipy.linalg.solve_triangular(post.chol_b, tmp1, lower=True)
        mu = kus.T @ post.nu
        if full_cov:
            knn = self.kernel.K(kp, x_new)
            var = (knn + tmp2.T @ tmp2 - tmp1.T @ tmp1)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            var = (knn + jnp.sum(jnp.square(tmp2), 0)
                   - jnp.sum(jnp.square(tmp1), 0))[:, None]
        return mu, var

    def predict_f(
        self, params: Dict, data: Tuple[Array, Array], x_new: Array, full_cov: bool = False
    ) -> Tuple[Array, Array]:
        x, y = data
        dtype = x.dtype
        noise = self.likelihood.variance(params["likelihood"])
        sigma = jnp.sqrt(noise)

        kp, z, kuu, kuf, chol_uu = self._common(params, x)
        m = z.shape[0]
        kus = self.kernel.K(kp, z, x_new)  # [M, T]

        a = jax.scipy.linalg.solve_triangular(chol_uu, kuf, lower=True) / sigma
        b = a @ a.T + jnp.eye(m, dtype=dtype)
        chol_b = jnp.linalg.cholesky(b)
        a_y = a @ y
        c = jax.scipy.linalg.solve_triangular(chol_b, a_y, lower=True) / sigma

        tmp1 = jax.scipy.linalg.solve_triangular(chol_uu, kus, lower=True)  # [M, T]
        tmp2 = jax.scipy.linalg.solve_triangular(chol_b, tmp1, lower=True)  # [M, T]
        mu = tmp2.T @ c

        if full_cov:
            knn = self.kernel.K(kp, x_new)
            var = knn + tmp2.T @ tmp2 - tmp1.T @ tmp1
            var = var[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            var = knn + jnp.sum(jnp.square(tmp2), 0) - jnp.sum(jnp.square(tmp1), 0)
            var = var[:, None]
        return mu, var


class SGPRPosterior(NamedTuple):
    """Serving cache from :meth:`SGPR.posterior` — a pytree, jit-safe.
    ``nu`` folds the information vector and both back-substitutions, so the
    cached mean is ``K(x, Z) @ nu`` with no solves at all."""

    kernel_params: Dict
    inducing_points: Array  # [M, D]
    chol_uu: Array  # [M, M] lower Cholesky of Kuu + jitter I
    chol_b: Array  # [M, M] lower Cholesky of B = A A^T + I
    nu: Array  # [M, 1] = Luu^-T Lb^-T c
