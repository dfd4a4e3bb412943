"""Explicit numerics configuration.

The reference relies on process-global GPflow state
(``gpflow.config.set_default_float`` / ``set_default_jitter`` /
``set_default_positive_minimum`` — reference paper_cli_uci.py:57-61).  JAX has
no such mutable dtype config worth relying on, so we carry an explicit,
hashable :class:`Config` object instead.

What actually consumes it (the knobs are live, not advisory):

* ``jitter`` — default for ``cli_utils.create_model(jitter=None)`` (reaches
  SGPR's Kuu build; CG models use jitter 0 by design).
* ``positive_minimum`` — default for
  ``cli_utils.create_gpr_model(positive_minimum=None)`` (0.0 = keep each
  component's own bijector bound).
* ``dtype_name`` — :func:`enable_x64_if_needed`; per-array dtypes otherwise
  flow through ``default_float()`` (the ambient x64 mode), which every
  ``init_params`` uses.

``set_default_config`` is process-global and never read inside jitted code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Config:
    """Numerics knobs, mirroring the reference's three global settings.

    Attributes:
        dtype_name: "float32" or "float64" (reference ``default_float()``).
            float64 requires ``jax.config.update("jax_enable_x64", True)`` and
            is intended for CPU parity runs; TPU runs use float32 (optionally
            with compensated dot products inside CG).
        jitter: diagonal jitter added by ``Kuu`` builders when requested
            (reference ``default_jitter()``); the CG models deliberately build
            ``Kuu`` with jitter 0 (reference models.py:300).
        positive_minimum: lower bound of the positive bijector (reference
            ``set_default_positive_minimum(1e-9)``, paper_cli_uci.py:61).
    """

    dtype_name: str = "float64"
    jitter: float = 1e-6
    positive_minimum: float = 0.0

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype(self.dtype_name)

    def with_updates(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


_DEFAULT = Config()


def default_config() -> Config:
    return _DEFAULT


def set_default_config(config: Config) -> None:
    global _DEFAULT
    _DEFAULT = config


def enable_x64_if_needed(config: Config) -> None:
    """Flip the global x64 flag when a float64 config is requested."""
    if np.dtype(config.dtype_name) == np.float64:
        jax.config.update("jax_enable_x64", True)


def enable_nan_checks(enabled: bool = True) -> None:
    """Runtime NaN sanitizer behind a flag (SURVEY.md section 5: the TPU-build
    analogue of the reference's ``tf.debugging.check_numerics`` tripwire,
    optimize.py:359-360, applied globally via ``jax_debug_nans``)."""
    jax.config.update("jax_debug_nans", enabled)


def default_float() -> jnp.dtype:
    """The canonical float dtype under the current x64 mode (float64 on
    CPU-parity runs with x64 enabled, float32 on TPU).  Used as the default
    for ``init_params`` so TPU users don't silently hit the float64
    truncation warning."""
    return jnp.asarray(0.0).dtype
