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
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cggp_tpu.models.clustergp import ClusterGP
from cggp_tpu.models.base import minibatch_scale
from cggp_tpu.ops.linalg import add_diagonal, pad_rows_to_blocks
from cggp_tpu.ops.rff import basis_theta_parameter, basis_vectors, rff_sample

Array = jnp.ndarray


class PathwisePosterior(NamedTuple):
    """Serving cache for pathwise (Matheron) posterior FUNCTION samples.

    Net-new vs the reference: its pathwise machinery exists only inside the
    ELBO (models.py:357-420) and redraws the RFF prior + refactorizes
    ``Kzz + Lambda`` on every call.  This cache freezes ``num_samples``
    posterior function draws at build time — each is a deterministic
    function ``f_s(x*) = Phi(x*) w_s + k(x*, Z) weights_s`` evaluable at ANY
    query points with two skinny matmuls (solve-free, MXU-only), the
    property downstream consumers (Thompson sampling, Bayesian
    optimization, consistent multi-point rollouts) actually need.

    A pytree (jit/scan-composable).  Fields:

    - ``theta`` [L, D]: spectral frequencies of the RFF prior basis
    - ``w`` [S, 2L]: per-sample basis weights (prior draw coefficients)
    - ``basis_scale``: scalar ``sqrt(kernel_variance / L)``
    - ``weights`` [S, M]: pathwise correction weights
      ``(Kzz + Lambda)^{-1} (u - f_z - eps)`` per sample (models.py:414-416)
    - ``inducing_mask`` [M] or None: capacity-padding mask (pad rows carry
      zero weight, so padded and unpadded caches serve identically)
    """

    kernel_params: Dict
    inducing_points: Array  # [M, D]
    theta: Array  # [L, D]
    w: Array  # [S, 2L]
    basis_scale: Array  # scalar
    weights: Array  # [S, M]
    inducing_mask: Optional[Array] = None


def build_pathwise_posterior(
    model, params: Dict, key: jax.Array,
    num_bases: int = 512, num_samples: int = 8, solver: str = "chol",
) -> PathwisePosterior:
    """Build a :class:`PathwisePosterior` for any ClusterGP-family model
    (``PathwiseClusterGP``, ``ClusterGP``, ``CGGP`` — anything with
    ``kernel`` / ``diag_variance`` and the ``(Z, u, counts)`` params).

    One O(M^2 L) prior evaluation + ONE batched M-system solve against all
    ``num_samples`` right-hand sides; after this every query batch is
    solve-free.  Key discipline matches ``pathwise_samples``
    (models.py:391-420): the same ``key`` yields draws from the same prior
    functions, so cached samples agree with the per-call path.

    ``solver="chol"`` factorizes once (the reference's choice,
    models.py:414); ``"cg"`` routes the batched solve through the model's
    preconditioned CG (CGGP only) — the pick when M is too large or too
    ill-conditioned for a raw fp32 factorization, same trade as
    ``CGGP.posterior``.
    """
    if solver not in ("chol", "cg"):
        raise ValueError(f"unknown pathwise posterior solver: {solver!r}")
    kp = params["kernel"]
    z = params["inducing_points"]
    u = params["pseudo_u"]
    if u.ndim != 2 or u.shape[1] != 1:
        # The cache stores one weight row per SAMPLE ([S, M]); a multi-output
        # pseudo_u [M, P>1] would broadcast u.T [P, M] against the [S, M]
        # prior draws and silently mix outputs across samples. The per-call
        # pathwise_samples path handles P>1; the cache is single-output only.
        raise ValueError(
            "build_pathwise_posterior supports single-output pseudo_u "
            f"[M, 1]; got {u.shape}. Use pathwise_samples for multi-output."
        )
    lambda_diag = model.diag_variance(params)[:, 0]
    mask_of = getattr(model, "_mask_of", None)
    mask = mask_of(params) if mask_of is not None else None

    # Same key splits as pathwise_samples -> rff_sample: (prior, eps) then
    # (theta, w) inside the prior — identical draws for identical keys.
    key_prior, key_eps = jax.random.split(key)
    key_theta, key_w = jax.random.split(key_prior)
    theta = basis_theta_parameter(model.kernel, kp, num_bases, key_theta,
                                  ndim=z.shape[-1])
    variance = model.kernel.variance(kp)
    basis_scale = jnp.sqrt(variance / num_bases)
    w = jax.random.normal(key_w, (num_samples, 2 * num_bases), dtype=z.dtype)

    prior_fz = w @ (basis_vectors(z, theta) * basis_scale).T  # [S, M]
    # eps ~ N(0, Lambda): drawn [S, M, 1] like models.py:404-407 so the
    # same key produces the same noise as the per-call path.
    eps = (
        jnp.sqrt(lambda_diag)[None, :, None]
        * jax.random.normal(key_eps, (num_samples, z.shape[0], 1), dtype=z.dtype)
    )[..., 0]
    b = u.T - prior_fz - eps  # [S, M]
    if mask is not None:
        b = b * mask[None, :]

    if mask is not None:
        kzz = model._masked_kmm(kp, z, mask)
    else:
        kzz = model.kernel.K(kp, z)  # jitter = 0 (models.py:410)
    kzz_lambda = add_diagonal(kzz, lambda_diag)
    if solver == "cg":
        cg = getattr(model, "conjugate_gradient", None)
        if cg is None:
            raise ValueError(
                "solver='cg' needs a CG-powered model (CGGP); "
                f"{type(model).__name__} has no conjugate_gradient"
            )
        build_precond = getattr(model, "_build_preconditioner", None)
        precond = None if build_precond is None else build_precond(
            kp, z, kzz, lambda_diag[:, None], jax.random.PRNGKey(0))
        weights = cg(kzz_lambda, b.T, preconditioner=precond).T  # [S, M]
    else:
        chol = jnp.linalg.cholesky(kzz_lambda)
        weights = jax.scipy.linalg.cho_solve((chol, True), b.T).T  # [S, M]
    if mask is not None:
        weights = weights * mask[None, :]
    return PathwisePosterior(
        kernel_params=kp, inducing_points=z, theta=theta, w=w,
        basis_scale=basis_scale, weights=weights, inducing_mask=mask,
    )


def pathwise_samples_at(model, post: PathwisePosterior, x_new: Array) -> Array:
    """Evaluate the cached posterior function samples at ``x_new``:
    [S, B, 1].  Solve-free — ``Phi(x*) w^T`` (prior) plus
    ``weights @ K(Z, x*)`` (correction, models.py:418-419) — so it composes
    with jit, lax.map sweeps, and data-parallel sharding constraints."""
    phi = basis_vectors(x_new, post.theta) * post.basis_scale  # [B, 2L]
    prior = post.w @ phi.T  # [S, B]
    if post.inducing_mask is not None:
        kmn = model._masked_kmn(post.kernel_params, post.inducing_points,
                                x_new, post.inducing_mask)
    else:
        kmn = model.kernel.K(post.kernel_params, post.inducing_points, x_new)
    return (prior + post.weights @ kmn)[..., None]  # [S, B, 1]


def pathwise_samples_scan(model, post: PathwisePosterior, x: Array,
                          batch_size: int = 8192) -> Array:
    """Whole-dataset sample evaluation as ONE device program (``lax.map``
    over fixed-size row blocks — the posterior_predict_scan pattern from
    training/optimize.py, applied to the solve-free sample evaluator).
    Returns [S, N, 1]."""
    n = x.shape[0]
    blocks = pad_rows_to_blocks(x, min(int(batch_size), n))
    out = jax.lax.map(lambda xb: pathwise_samples_at(model, post, xb), blocks)
    # [num_blocks, S, batch, 1] -> [S, N, 1]
    out = jnp.moveaxis(out, 0, 1).reshape(out.shape[1], -1, out.shape[-1])
    return out[:, :n]


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

    def pathwise_posterior(
        self, params: Dict, key: jax.Array,
        num_bases: Optional[int] = None, num_samples: Optional[int] = None,
        solver: str = "chol",
    ) -> PathwisePosterior:
        """Serving cache of posterior function samples — see
        :func:`build_pathwise_posterior` (works for CGGP/ClusterGP too)."""
        return build_pathwise_posterior(
            self, params, key,
            num_bases=num_bases or self.num_bases,
            num_samples=num_samples or self.num_samples,
            solver=solver,
        )

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
