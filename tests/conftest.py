"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Parity tests (CG vs dense solve, model golden values) run in float64 on CPU —
the reference's own fp64 configuration (BASELINE.md configs 1-3).  The
8-device virtual mesh is how JAX code tests multi-chip sharding without a
real TPU slice (SURVEY.md section 4).
"""

import os

# NOTE: this environment pre-imports jax at interpreter startup, so setting
# JAX_PLATFORMS via os.environ here is too late — but the backend is not yet
# initialised, so jax.config.update still takes effect.  XLA_FLAGS is read at
# first client creation, so the env var works as long as no array op ran yet.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's wall time is dominated by
# XLA-compiling ~100 shard_map/scan programs on a single host core (the
# multi-device tests especially).  Caching compiled executables under
# .jax_cache/ (gitignored) makes warm reruns start executing immediately.
#
# Dir scheme (per-host CPU fingerprint; why: see cggp_tpu/utils/cache.py —
# a cache written on a different host poisons every lookup, measured 82 s
# for a 5 s test).
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from cggp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
