"""Stationary GP kernels as pure functions over parameter pytrees.

Replaces GPflow's kernel objects (used throughout the reference, e.g.
models.py:112 ``gpflow.covariances.Kuu``, cli_utils.py:363-368 Matern32
default).  A :class:`Kernel` is a frozen, hashable *spec* (safe to close over
or pass as a static argument to ``jax.jit``); all numerical state lives in a
small parameter pytree ``{"variance": raw, "lengthscales": raw}`` stored in
unconstrained space.

TPU notes: the pairwise scaled squared distance is computed as
``|x|^2 + |y|^2 - 2 x @ y.T`` so the dominant term is a single MXU matmul;
everything else is cheap VPU elementwise work that XLA fuses into neighbours.
The Gram matrix math therefore runs at matmul speed for both ``Kuu`` (M x M)
and ``Kuf`` (M x B) — the hot constructions in the training step (reference
models.py:300, :333-334).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.ops.bijectors import positive
from cggp_tpu.config import default_float

KernelParams = Dict[str, jnp.ndarray]

_SUPPORTED = ("se", "matern12", "matern32", "matern52")

# gpflow clips the scaled squared distance at 1e-36 before sqrt so Matern
# gradients stay finite at r == 0.
_R2_FLOOR = 1e-36


def scaled_squared_distance(x_scaled: jnp.ndarray, y_scaled: Optional[jnp.ndarray]) -> jnp.ndarray:
    """``r2[i, j] = ||xs_i - ys_j||^2`` with the cross term on the MXU.

    The cross term MUST run at full fp32 precision: JAX's TPU default
    (bfloat16 matmul passes) loses ~2 decimal digits, and ``x2 + y2 - 2xy``
    cancels catastrophically for nearby points — the resulting Gram-matrix
    error makes ``Kuu + Lambda`` indefinite and CG diverges (observed at
    N=435k/M=989: fp32-on-CPU healthy, TPU-default garbage).
    """
    if y_scaled is None:
        y_scaled = x_scaled
    xs2 = jnp.sum(jnp.square(x_scaled), axis=-1, keepdims=True)  # [N, 1]
    ys2 = jnp.sum(jnp.square(y_scaled), axis=-1, keepdims=True)  # [M, 1]
    cross = jnp.matmul(x_scaled, y_scaled.T, precision=jax.lax.Precision.HIGHEST)
    r2 = xs2 + ys2.T - 2.0 * cross
    return jnp.maximum(r2, 0.0)


def kernel_value_from_r2(name: str, r2: jnp.ndarray, variance: jnp.ndarray) -> jnp.ndarray:
    """Stationary kernel value as a function of the scaled squared distance."""
    if name == "se":
        return variance * jnp.exp(-0.5 * r2)
    r = jnp.sqrt(jnp.maximum(r2, _R2_FLOOR))
    if name == "matern12":
        return variance * jnp.exp(-r)
    if name == "matern32":
        sqrt3_r = math.sqrt(3.0) * r
        return variance * (1.0 + sqrt3_r) * jnp.exp(-sqrt3_r)
    if name == "matern52":
        sqrt5_r = math.sqrt(5.0) * r
        return variance * (1.0 + sqrt5_r + (5.0 / 3.0) * r2) * jnp.exp(-sqrt5_r)
    raise ValueError(f"Unsupported kernel name: {name!r}")


@dataclasses.dataclass(frozen=True)
class Kernel:
    """Static spec of a stationary kernel with ARD lengthscales.

    ``name`` is one of {"se", "matern12", "matern32", "matern52"};
    ``positive_lower`` is the softplus lower bound for both parameters
    (reference default ``positive(1e-6)``, cli_utils.py:124).
    """

    name: str
    positive_lower: float = 1e-6

    def __post_init__(self):
        if self.name not in _SUPPORTED:
            raise ValueError(f"Unsupported kernel {self.name!r}; choose from {_SUPPORTED}")

    # -- parameters ---------------------------------------------------------

    @property
    def bijector(self):
        return positive(self.positive_lower)

    def init_params(
        self,
        variance: float = 1.0,
        lengthscales: Union[float, Sequence[float], np.ndarray] = 1.0,
        dtype=None,
    ) -> KernelParams:
        """Build the raw (unconstrained) parameter pytree."""
        dtype = default_float() if dtype is None else dtype
        bij = self.bijector
        variance = jnp.asarray(variance, dtype=dtype)
        lengthscales = jnp.asarray(lengthscales, dtype=dtype)
        return {
            "variance": bij.inverse(variance),
            "lengthscales": bij.inverse(lengthscales),
        }

    def variance(self, params: KernelParams) -> jnp.ndarray:
        return self.bijector.forward(params["variance"])

    def lengthscales(self, params: KernelParams) -> jnp.ndarray:
        return self.bijector.forward(params["lengthscales"])

    def constrained(self, params: KernelParams) -> Dict[str, jnp.ndarray]:
        return {
            "variance": self.variance(params),
            "lengthscales": self.lengthscales(params),
        }

    # -- evaluation ---------------------------------------------------------

    def K(
        self, params: KernelParams, x: jnp.ndarray, x2: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Dense Gram matrix ``K(x, x2)`` of shape [N, M]."""
        ell = self.lengthscales(params)
        xs = x / ell
        ys = None if x2 is None else x2 / ell
        r2 = scaled_squared_distance(xs, ys)
        return kernel_value_from_r2(self.name, r2, self.variance(params))

    def K_diag(self, params: KernelParams, x: jnp.ndarray) -> jnp.ndarray:
        """Diagonal of ``K(x, x)``: constant ``variance`` for stationary kernels."""
        variance = self.variance(params)
        return jnp.full(x.shape[:-1], variance, dtype=x.dtype)


def SquaredExponential(positive_lower: float = 1e-6) -> Kernel:
    return Kernel("se", positive_lower)


def Matern12(positive_lower: float = 1e-6) -> Kernel:
    return Kernel("matern12", positive_lower)


def Matern32(positive_lower: float = 1e-6) -> Kernel:
    return Kernel("matern32", positive_lower)


def Matern52(positive_lower: float = 1e-6) -> Kernel:
    return Kernel("matern52", positive_lower)


_BY_NAME = {
    "se": SquaredExponential,
    "rbf": SquaredExponential,
    "matern12": Matern12,
    "matern32": Matern32,
    "matern52": Matern52,
}


def kernel_by_name(name: str, positive_lower: float = 1e-6) -> Kernel:
    """Kernel factory mirroring the reference CLI names (cli_utils.py:103-135)."""
    try:
        return _BY_NAME[name.lower()](positive_lower)
    except KeyError:
        raise ValueError(f"Unknown kernel name {name!r}; choose from {sorted(_BY_NAME)}")
