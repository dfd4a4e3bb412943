"""ClusterGP — Cluster-Dirichlet GP with Cholesky solves.

Reference models.py:176-277: non-trainable ``pseudo_u`` (cluster y-means) and
``cluster_counts``; ``diag_variance = likelihood_variance / counts`` is
*derived*, not learned (models.py:227-228).  KL and predict share the LpSVGP
structure with ``nu = (Kmm + Lambda)^{-1} u`` via Cholesky.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cggp_tpu.models.base import CholPosterior, GaussianLikelihood, minibatch_scale
from cggp_tpu.ops.kernels import Kernel
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.config import default_float

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ClusterGP:
    kernel: Kernel
    likelihood: GaussianLikelihood = GaussianLikelihood()
    num_data: Optional[int] = None

    def init_params(self, inducing_points: Array, variance: float = 1.0,
                    lengthscales=None, noise_variance: float = 0.1,
                    pseudo_u: Optional[Array] = None,
                    cluster_counts: Optional[Array] = None,
                    dtype=None) -> Dict:
        dtype = default_float() if dtype is None else dtype
        z = jnp.asarray(inducing_points, dtype=dtype)
        m = z.shape[0]
        if lengthscales is None:
            lengthscales = jnp.ones((z.shape[-1],), dtype=dtype)
        u = jnp.zeros((m, 1), dtype=dtype) if pseudo_u is None else jnp.asarray(pseudo_u, dtype)
        counts = (
            jnp.ones((m, 1), dtype=dtype)
            if cluster_counts is None
            else jnp.asarray(cluster_counts, dtype)
        )
        return {
            "kernel": self.kernel.init_params(variance, lengthscales, dtype=dtype),
            "likelihood": self.likelihood.init_params(noise_variance, dtype=dtype),
            "inducing_points": z,
            "pseudo_u": u,
            "cluster_counts": counts,
        }

    def trainable_mask(self, params: Dict, trainable_inducing_points: bool = False,
                       trainable_pseudo_u: bool = False) -> Dict:
        """Only kernel + likelihood train by default (reference
        models.py:219-220).

        ``trainable_pseudo_u=True`` (net-new) frees the pseudo-observations —
        a CG-powered variational mean in the cluster parameterization.
        Measured at reference scale (N=435k, M=652, 400 steps): RMSE
        0.176 -> 0.137, NLPD -0.32 -> -0.57 vs fixed cluster means, at
        identical step cost; freeing Z or counts on top adds nothing (and
        counts must stay positive, so they remain fixed).  See docs/PERF.md.
        """
        mask = jax.tree_util.tree_map(lambda _: True, params)
        mask["inducing_points"] = trainable_inducing_points
        mask["pseudo_u"] = trainable_pseudo_u
        mask["cluster_counts"] = False
        return mask

    def diag_variance(self, params: Dict) -> Array:
        return self.likelihood.variance(params["likelihood"]) / params["cluster_counts"]

    def assign_clusters(self, params: Dict, iv: Array, means: Array, counts: Array) -> Dict:
        """Functional analogue of the reference's variable assigns
        (cli_utils.py:396-406): returns params with new inducing state."""
        dtype = params["inducing_points"].dtype
        new = dict(params)
        new["inducing_points"] = jnp.asarray(iv, dtype=dtype)
        new["pseudo_u"] = jnp.asarray(means, dtype=dtype)
        new["cluster_counts"] = jnp.asarray(counts, dtype=dtype)
        return new

    def prior_kl(self, params: Dict) -> Array:
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)

        kmm = self.kernel.K(kp, z)  # jitter = 0 (models.py:236)
        k = add_diagonal(kmm, var[:, 0])
        chol = jnp.linalg.cholesky(k)
        kzz_lambda_inv_u = jax.scipy.linalg.cho_solve((chol, True), u)

        quad = jnp.sum((kmm @ kzz_lambda_inv_u) * kzz_lambda_inv_u)
        trace = jnp.trace(jax.scipy.linalg.cho_solve((chol, True), kmm))
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        const = jnp.sum(jnp.log(var))
        return 0.5 * (quad - trace + logdet - const)

    def predict_f(self, params: Dict, x_new: Array, full_cov: bool = False) -> Tuple[Array, Array]:
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        var = self.diag_variance(params)

        kmm = self.kernel.K(kp, z)
        kmn = self.kernel.K(kp, z, x_new)
        k = add_diagonal(kmm, var[:, 0])
        chol = jnp.linalg.cholesky(k)
        kuu_inv_u = jax.scipy.linalg.cho_solve((chol, True), u)
        a = jax.scipy.linalg.solve_triangular(chol, kmn, lower=True)

        if full_cov:
            knn = self.kernel.K(kp, x_new)
            fvar = (knn - a.T @ a)[None, ...]
        else:
            knn = self.kernel.K_diag(kp, x_new)
            fvar = (knn - jnp.sum(jnp.square(a), axis=0))[:, None]

        fmu = kmn.T @ kuu_inv_u
        return fmu, fvar

    # -- cached serving (net-new; GPflow's ``posterior()`` analogue).  The
    # reference's predict path re-runs the O(M^3) Cholesky per batch
    # (models.py:255-276); the cache factorizes once per params. ------------

    def posterior(self, params: Dict) -> CholPosterior:
        kp = params["kernel"]
        z = params["inducing_points"]
        var = self.diag_variance(params)
        chol = jnp.linalg.cholesky(add_diagonal(self.kernel.K(kp, z), var[:, 0]))
        nu = jax.scipy.linalg.cho_solve((chol, True), params["pseudo_u"])
        return CholPosterior(kernel_params=kp, inducing_points=z, chol=chol, nu=nu)

    def posterior_mean(self, post: CholPosterior, x_new: Array) -> Array:
        """Cache-served mean: one [T, M] kernel block and a skinny matmul."""
        kmn = self.kernel.K(post.kernel_params, post.inducing_points, x_new)
        return kmn.T @ post.nu

    def posterior_predict(self, post: CholPosterior, x_new: Array,
                          full_cov: bool = False) -> Tuple[Array, Array]:
        """Cache-served mean + variance: one triangular solve per batch
        (the factorization is amortized across all batches)."""
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
        del key
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
