"""LpSVGP — SVGP with subspace (whitened-free) inducing parameterization.

Reference models.py:51-173 (Panos, Dellaportas & Titsias 2018,
arXiv:1807.02537): trainables are ``nu`` and a positive ``diag_variance``;
the KL uses a Cholesky of ``Kmm + diag(var)``:

    KL = 1/2 ( nu^T Kmm nu - tr((Kmm+L)^{-1} Kmm)
               + logdet(Kmm+L) - sum log var )

predict: ``mu = Kmn^T nu``, ``var = Knn - sum(A^2)`` with ``A = L^{-1} Kmn``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cggp_tpu.models.base import CholPosterior, GaussianLikelihood, minibatch_scale
from cggp_tpu.ops.bijectors import positive
from cggp_tpu.ops.kernels import Kernel
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.config import default_float

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LpSVGP:
    kernel: Kernel
    likelihood: GaussianLikelihood = GaussianLikelihood()
    num_data: Optional[int] = None
    positive_lower: float = 1e-6  # bijector for diag_variance

    @property
    def _var_bijector(self):
        return positive(self.positive_lower)

    def init_params(self, inducing_points: Array, variance: float = 1.0,
                    lengthscales=None, noise_variance: float = 0.1,
                    nu: Optional[Array] = None, diag_variance: Optional[Array] = None,
                    dtype=None) -> Dict:
        dtype = default_float() if dtype is None else dtype
        z = jnp.asarray(inducing_points, dtype=dtype)
        m = z.shape[0]
        if lengthscales is None:
            lengthscales = jnp.ones((z.shape[-1],), dtype=dtype)
        nu = jnp.zeros((m, 1), dtype=dtype) if nu is None else jnp.asarray(nu, dtype=dtype)
        # reference init: var = 1e-4 (models.py:94)
        var = (
            1e-4 * jnp.ones((m, 1), dtype=dtype)
            if diag_variance is None
            else jnp.asarray(diag_variance, dtype=dtype)
        )
        return {
            "kernel": self.kernel.init_params(variance, lengthscales, dtype=dtype),
            "likelihood": self.likelihood.init_params(noise_variance, dtype=dtype),
            "inducing_points": z,
            "nu": nu,
            "raw_diag_variance": self._var_bijector.inverse(var),
        }

    def trainable_mask(self, params: Dict, trainable_inducing_points: bool = False,
                       trainable_pseudo_u: bool = False) -> Dict:
        # nu IS the free variational mean here; trainable_pseudo_u is
        # accepted for a uniform driver interface and has nothing to free.
        del trainable_pseudo_u
        mask = jax.tree_util.tree_map(lambda _: True, params)
        mask["inducing_points"] = trainable_inducing_points
        return mask

    def diag_variance(self, params: Dict) -> Array:
        return self._var_bijector.forward(params["raw_diag_variance"])

    def prior_kl(self, params: Dict) -> Array:
        kp = params["kernel"]
        z = params["inducing_points"]
        nu = params["nu"]
        var = self.diag_variance(params)

        kmm = self.kernel.K(kp, z)  # jitter = 0 (models.py:112)
        quad = jnp.sum(nu * (kmm @ nu))
        k = add_diagonal(kmm, var[:, 0])
        chol = jnp.linalg.cholesky(k)
        trace = jnp.trace(jax.scipy.linalg.cho_solve((chol, True), kmm))
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol))) - jnp.sum(jnp.log(var))
        return 0.5 * (quad - trace + logdet)

    def predict_f(self, params: Dict, x_new: Array, full_cov: bool = False) -> Tuple[Array, Array]:
        kp = params["kernel"]
        z = params["inducing_points"]
        nu = params["nu"]
        var = self.diag_variance(params)

        kmm = self.kernel.K(kp, z)
        kmn = self.kernel.K(kp, z, x_new)  # [M, T]
        k = add_diagonal(kmm, var[:, 0])
        chol = jnp.linalg.cholesky(k)
        a = jax.scipy.linalg.solve_triangular(chol, kmn, lower=True)

        if full_cov:
            knn = self.kernel.K(kp, x_new)
            fvar = (knn - a.T @ a)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            fvar = (knn - jnp.sum(jnp.square(a), axis=0))[:, None]

        fmu = kmn.T @ nu
        return fmu, fvar

    # -- cached serving (net-new; GPflow's ``posterior()`` analogue): the
    # reference predict path re-runs the O(M^3) Cholesky per batch
    # (models.py:136-161). ``nu`` is already the free variational mean. ----

    def posterior(self, params: Dict) -> CholPosterior:
        kp = params["kernel"]
        z = params["inducing_points"]
        var = self.diag_variance(params)
        chol = jnp.linalg.cholesky(add_diagonal(self.kernel.K(kp, z), var[:, 0]))
        return CholPosterior(kernel_params=kp, inducing_points=z, chol=chol,
                             nu=params["nu"])

    def posterior_mean(self, post: CholPosterior, x_new: Array) -> Array:
        kmn = self.kernel.K(post.kernel_params, post.inducing_points, x_new)
        return kmn.T @ post.nu

    def posterior_predict(self, post: CholPosterior, x_new: Array,
                          full_cov: bool = False) -> Tuple[Array, Array]:
        kp = post.kernel_params
        kmn = self.kernel.K(kp, post.inducing_points, x_new)  # [M, T]
        a = jax.scipy.linalg.solve_triangular(post.chol, kmn, lower=True)
        if full_cov:
            knn = self.kernel.K(kp, x_new)
            fvar = (knn - a.T @ a)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            fvar = (knn - jnp.sum(jnp.square(a), axis=0))[:, None]
        return kmn.T @ post.nu, fvar

    def elbo(self, params: Dict, data: Tuple[Array, Array],
             key: Optional[jax.Array] = None) -> Array:
        del key  # deterministic ELBO
        x, y = data
        kl = self.prior_kl(params)
        f_mean, f_var = self.predict_f(params, x, full_cov=False)
        var_exp = self.likelihood.variational_expectations(
            params["likelihood"], f_mean, f_var, y
        )
        scale = minibatch_scale(self.num_data, x.shape[0], kl.dtype)
        return jnp.sum(var_exp) * scale - kl

    def training_loss(self, params: Dict, data: Tuple[Array, Array],
                      key: Optional[jax.Array] = None) -> Array:
        return -self.elbo(params, data, key)
