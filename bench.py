"""Round benchmark: batched-CG Gram-matvec throughput on the local accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md), so the baseline is the
north-star target from BASELINE.json: >=60% of the per-chip HBM roofline on
the CG kernel-matvec.  ``vs_baseline`` is achieved GB/s divided by that
target (1.0 = target met, >1 = beaten).

M=32768 is the deepest bandwidth-dominated point that fits one chip's HBM
comfortably (4.3 GB matrix; measured 721 vs 677 GB/s at M=16384 — see
benchmarks/scaling_results_v5e.csv for the curve; smaller M is
iteration-latency-bound).  All matmuls run at HIGHEST precision — the
numerically required mode (docs/PERF.md): the default bf16 precision is ~40%
faster here but diverges CG outright.

What is measured: the hot loop of every CGGP training step — row-batched PCG
on ``Kuu + Lambda`` (fp32, 16 RHS rows, fixed iteration count).  Each
iteration streams the [M, M] matrix once from HBM for the ``p @ A`` matvec,
so effective GB/s = iters * M^2 * 4 bytes / time.
"""

from __future__ import annotations

import json
import time

import numpy as np

M = 32768
NUM_RHS = 16
ITERS = 300  # ~1.8 s/repeat: amortizes the ~30 ms device->host sync (docs/PERF.md)
REPEATS = 3

# Per-chip HBM bandwidth (GB/s) by platform; v5e = 819 GB/s.
HBM_GBPS = {"tpu": 819.0, "cpu": 50.0, "gpu": 1000.0}
TARGET_FRACTION = 0.60


def main() -> None:
    import jax

    # Persistent compile cache: first-compile through the remote-device
    # tunnel is minutes; cached re-runs start in seconds (docs/PERF.md).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax without these flags: just compile

    import jax.numpy as jnp

    from cggp_tpu.ops.cg import conjugate_gradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal

    platform = jax.devices()[0].platform
    if platform == "axon":  # tunnel name for the real TPU chip
        platform = "tpu"

    rng = np.random.RandomState(0)
    kernel = Matern32()
    kp = kernel.init_params(
        variance=1.0, lengthscales=np.full(8, 1.2), dtype=jnp.float32
    )
    z = jnp.asarray(rng.uniform(-2, 2, (M, 8)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.05, 0.5, (M,)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((NUM_RHS, M)), jnp.float32)

    @jax.jit
    def solve(z, lam, rhs):
        a = add_diagonal(kernel.K(kp, z), lam)
        # threshold 0 -> always runs the full ITERS iterations (deterministic work)
        sol, stats = conjugate_gradient(
            a, rhs, jnp.zeros_like(rhs), 0.0,
            max_iterations=ITERS, max_steps_cycle=ITERS + 1,
        )
        # Reduce to scalars INSIDE the jit so one tiny host fetch fully syncs:
        # block_until_ready alone is unreliable over remote-device tunnels.
        return jnp.sum(sol), stats.steps

    checksum, steps = solve(z, lam, rhs)  # compile + warm up
    float(checksum)

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        checksum, steps = solve(z, lam, rhs)
        float(checksum)  # device->host fetch = hard sync point
        times.append(time.perf_counter() - t0)
    best = min(times)

    steps = int(steps)
    # Each CG iteration reads the [M, M] fp32 matrix once (the RHS block and
    # vectors are small); the Gram build adds one more full write+read.
    bytes_per_iter = M * M * 4
    gbps = steps * bytes_per_iter / best / 1e9
    iters_per_sec = steps / best

    target = TARGET_FRACTION * HBM_GBPS.get(platform, 819.0)
    print(json.dumps({
        "metric": "cg_matvec_throughput",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 4),
        "platform": platform,
        "cg_iters_per_sec": round(iters_per_sec, 1),
        "M": M,
        "num_rhs": NUM_RHS,
        "cg_steps": steps,
        "wall_s": round(best, 4),
    }))


if __name__ == "__main__":
    main()
