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
# The dir is keyed by a CPU-feature fingerprint: XLA:CPU AOT artifacts embed
# the builder's machine features and the loader REJECTS mismatches (falls
# back to a silent recompile), so a cache written on a different host poisons
# every lookup — measured 82 s for a 5 s test.  A per-machine subdir keeps
# each host's cache clean.
import hashlib


def _cpu_fingerprint() -> str:
    # Hash model name AND flags: XLA synthesizes extra features (e.g.
    # +prefer-no-gather) from the CPU *model*, so two hosts with identical
    # cpuinfo flags can still produce mutually-rejecting AOT artifacts.
    try:
        lines = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    lines.append(line)
                    if len(lines) == 2:
                        break
        if lines:
            return hashlib.sha256("".join(lines).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(__file__), os.pardir, ".jax_cache", _cpu_fingerprint()
    ),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
