"""PathwiseClusterGP — pathwise (Matheron) sampling ELBO.

Reference models.py:357-420: prior samples at ``[X; Z]`` via RFF, per-sample
noise ``eps ~ N(0, Lambda)``, pathwise weights
``(Kzz + Lambda)^{-1} (u - f_z - eps)`` via Cholesky, posterior sample =
prior + ``Kzx^T weights``; the likelihood term is a Monte-Carlo Gaussian
log-density (models.py:374-389).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cggp_tpu.models.clustergp import ClusterGP
from cggp_tpu.models.base import minibatch_scale
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.ops.rff import rff_sample

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PathwiseClusterGP(ClusterGP):
    num_bases: int = 512
    num_samples: int = 8

    def pathwise_samples(
        self, params: Dict, sample_at: Array, key: jax.Array,
        num_bases: Optional[int] = None, num_samples: Optional[int] = None,
    ) -> Array:
        """Posterior samples at ``sample_at``: [S, N, 1] (models.py:391-420)."""
        num_bases = num_bases or self.num_bases
        num_samples = num_samples or self.num_samples
        kp = params["kernel"]
        z = params["inducing_points"]
        u = params["pseudo_u"]
        lambda_diag = self.diag_variance(params)[:, 0]

        key_prior, key_eps = jax.random.split(key)
        prior_at = jnp.concatenate([sample_at, z], axis=0)
        n = sample_at.shape[0]
        prior = rff_sample(prior_at, self.kernel, kp, num_bases, key_prior,
                           num_samples=num_samples)  # [S, N + M]
        prior = prior[..., None]  # [S, N + M, 1]
        prior_fx = prior[:, :n]  # [S, N, 1]
        prior_fz = prior[:, n:]  # [S, M, 1]

        # eps ~ N(0, Lambda), one draw per sample (models.py:404-407)
        eps = (
            jnp.sqrt(lambda_diag)[None, :, None]
            * jax.random.normal(key_eps, (num_samples, z.shape[0], 1), dtype=z.dtype)
        )

        kzz = self.kernel.K(kp, z)  # jitter = 0 (models.py:410)
        kzx = self.kernel.K(kp, z, sample_at)  # [M, N]
        kzz_lambda = add_diagonal(kzz, lambda_diag)

        solve_against = u[None, ...] - prior_fz - eps  # [S, M, 1]
        chol = jnp.linalg.cholesky(kzz_lambda)
        weights = jax.vmap(lambda b: jax.scipy.linalg.cho_solve((chol, True), b))(
            solve_against
        )  # [S, M, 1]

        correction = jnp.einsum("mn,smo->sno", kzx, weights)  # [S, N, 1]
        return prior_fx + correction

    def compute_likelihood_term(
        self, params: Dict, data: Tuple[Array, Array], key: jax.Array,
        num_bases: Optional[int] = None, num_samples: Optional[int] = None,
    ) -> Array:
        x, y = data
        num_samples = num_samples or self.num_samples
        num_data = jnp.asarray(y.shape[0], dtype=y.dtype)
        samples = self.pathwise_samples(params, x, key, num_bases, num_samples)
        noise = self.likelihood.variance(params["likelihood"])

        error_sq = jnp.square(y[None, ...] - samples)
        lik = jnp.sum(error_sq) / (noise * num_samples)
        const = num_data * jnp.log(2.0 * math.pi * noise)
        return -0.5 * (lik + const)

    def elbo(self, params: Dict, data: Tuple[Array, Array],
             key: Optional[jax.Array] = None) -> Array:
        if key is None:
            raise ValueError("PathwiseClusterGP.elbo requires a PRNG key")
        x, _ = data
        kl = self.prior_kl(params)  # Cholesky KL, inherited from ClusterGP
        likelihood = self.compute_likelihood_term(params, data, key)
        scale = minibatch_scale(self.num_data, x.shape[0], kl.dtype)
        return likelihood * scale - kl

    def training_loss(self, params: Dict, data: Tuple[Array, Array],
                      key: Optional[jax.Array] = None) -> Array:
        return -self.elbo(params, data, key)
