"""Parameter transforms (constrained <-> unconstrained).

The reference uses GPflow's ``positive()`` softplus bijector with an optional
global lower bound (reference cli_utils.py:124 ``positive(1e-6)``,
paper_cli_uci.py:61 ``set_default_positive_minimum(1e-9)``).  Here the bound
is explicit per-bijector.  All transforms are pure jnp functions so they can
live inside jitted loss functions; the inverse is only used at init time.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


def _softplus(x):
    # Numerically stable softplus: log(1 + exp(x)) = max(x, 0) + log1p(exp(-|x|)).
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _softplus_inverse(y):
    # Stable inverse softplus: x = y + log(1 - exp(-y)) = y + log(-expm1(-y)).
    return y + jnp.log(-jnp.expm1(-y))


@dataclasses.dataclass(frozen=True)
class Bijector:
    """A pair of pure forward/inverse maps. Hashable, safe as a static arg."""

    name: str
    forward: Callable = dataclasses.field(compare=False)
    inverse: Callable = dataclasses.field(compare=False)

    def __hash__(self):
        return hash(self.name)


def positive(lower: float = 1e-6) -> Bijector:
    """Softplus bijector shifted by ``lower``; matches GPflow `positive`."""

    def forward(x):
        return _softplus(x) + lower

    def inverse(y):
        return _softplus_inverse(jnp.maximum(y - lower, jnp.finfo(jnp.result_type(y)).tiny))

    return Bijector(name=f"positive(lower={lower:g})", forward=forward, inverse=inverse)


identity_bijector = Bijector(name="identity", forward=lambda x: x, inverse=lambda x: x)
