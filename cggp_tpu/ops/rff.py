"""Random Fourier features (reference rff.py:13-91, re-done with JAX PRNG).

Spectral sampling: for the squared-exponential kernel the spectral density is
a diagonal Gaussian with std ``1/lengthscale``; for Matern-nu/2 kernels it is
a multivariate Student-t realised as a chi^2(nu) scale mixture (reference
rff.py:82-91).  Feature map ``Phi(x) = [cos(x theta^T), sin(x theta^T)]`` of
shape [N, 2L]; prior samples are ``w @ (sqrt(variance / L) * Phi)^T`` with
``w ~ N(0, I_{2L})``.

Beyond the reference (pathwise sampling only), RFF here also feeds the
Nystrom/RFF CG preconditioner (``ops.cg.NystromPreconditioner``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cggp_tpu.ops.kernels import Kernel, KernelParams

Array = jnp.ndarray

_SMOOTHNESS = {"matern12": 1.0, "matern32": 3.0, "matern52": 5.0}


def basis_theta_parameter(
    kernel: Kernel, params: KernelParams, num_bases: int, key: jax.Array, ndim: Optional[int] = None
) -> Array:
    """Sample L spectral frequencies theta [L, D] for a stationary kernel."""
    lengthscales = kernel.lengthscales(params)
    if lengthscales.ndim == 0:
        if ndim is None:
            raise ValueError("Scalar lengthscale needs an explicit input dimension `ndim`")
        lengthscales = jnp.broadcast_to(lengthscales, (ndim,))
    scale = 1.0 / lengthscales
    dtype = scale.dtype
    dim = scale.shape[-1]

    if kernel.name == "se":
        eps = jax.random.normal(key, (num_bases, dim), dtype=dtype)
        return eps * scale[None, :]

    nu = _SMOOTHNESS.get(kernel.name)
    if nu is None:
        raise ValueError(f"RFF sampling not supported for kernel {kernel.name!r}")
    key_norm, key_chi2 = jax.random.split(key)
    eps = jax.random.normal(key_norm, (num_bases, dim), dtype=dtype) * scale[None, :]
    # chi2(nu) = Gamma(nu/2, scale=2); Student-t scale mixture (rff.py:82-91).
    chi2 = 2.0 * jax.random.gamma(key_chi2, 0.5 * nu, (num_bases,), dtype=dtype)
    return jnp.sqrt(nu / chi2)[:, None] * eps


def basis_vectors(inputs: Array, theta: Array) -> Array:
    """``Phi(x) = [cos(x theta^T), sin(x theta^T)]``: [N, D] x [L, D] -> [N, 2L]."""
    x_theta = inputs @ theta.T  # MXU
    return jnp.concatenate([jnp.cos(x_theta), jnp.sin(x_theta)], axis=-1)


def rff_basis(
    inputs: Array, kernel: Kernel, params: KernelParams, num_bases: int, key: jax.Array
) -> Array:
    """Scaled feature matrix ``U`` with ``U U^T ~= K`` (for preconditioning)."""
    theta = basis_theta_parameter(kernel, params, num_bases, key, ndim=inputs.shape[-1])
    bases = basis_vectors(inputs, theta)
    variance = kernel.variance(params)
    scale = jnp.sqrt(variance / num_bases)
    return bases * scale


def rff_preconditioner(
    kernel: Kernel,
    params: KernelParams,
    z: Array,
    lam: Array,
    num_bases: int,
    key: jax.Array,
    stable: bool = True,
):
    """Low-rank RFF preconditioner for CG on ``K(Z,Z) + diag(lam)``
    (net-new; BASELINE.md config 4).

    Builds ``U`` with ``U U^T ~= K(Z, Z)`` from ``num_bases`` random Fourier
    features and applies the exact Woodbury inverse of
    ``U U^T + diag(lam)``.  By default through the cancellation-free
    :class:`~cggp_tpu.ops.cg.SpectralPreconditioner` apply, which stays SPD
    in fp32 (the plain Woodbury form cancels catastrophically once
    ``||U||^2 / min(lam)`` is large — the measured fp32 regression in
    docs/PERF.md); ``stable=False`` selects the reference-shaped
    :class:`~cggp_tpu.ops.cg.NystromPreconditioner`.  Rebuild it whenever the
    kernel params or Z change (it is a solver-state object, not a trainable).
    """
    from cggp_tpu.ops.cg import NystromPreconditioner, SpectralPreconditioner

    factor = rff_basis(z, kernel, params, num_bases, key)  # [M, 2L]
    cls = SpectralPreconditioner if stable else NystromPreconditioner
    return cls(factor, jnp.asarray(lam).reshape(-1))


def rff_sample(
    inputs: Array,
    kernel: Kernel,
    params: KernelParams,
    num_bases: int,
    key: jax.Array,
    num_samples: int = 1,
) -> Array:
    """Prior GP samples at ``inputs``: [num_samples, N] (reference rff.py:60-73)."""
    key_theta, key_w = jax.random.split(key)
    bases = rff_basis(inputs, kernel, params, num_bases, key_theta)  # [N, 2L]
    dtype = bases.dtype
    weights = jax.random.normal(key_w, (num_samples, bases.shape[-1]), dtype=dtype)
    return weights @ bases.T
