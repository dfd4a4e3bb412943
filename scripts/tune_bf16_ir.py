#!/usr/bin/env python
"""Chip sweep: bf16_ir inner_rtol at the bench shape (M=32768, 16 RHS).

Picks the default inner tolerance from real-chip evidence instead of the
round-2 single-point tuning.  Classic IR behavior: inner accuracy past the
bf16 perturbation level is wasted iterations, too loose wastes exact
re-anchors — the optimum sits near sqrt(eps_bf16) ~ 1e-2 on the squared-
residual metric.  Writes logs/tune_bf16_ir.json.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cggp_tpu.ops import cg as cgmod
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal
    from cggp_tpu.utils import cache

    cache.enable_persistent_cache(jax, "tune-")

    m, num_rhs = 32768, 16
    rng = np.random.RandomState(0)
    kernel = Matern32()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(8, 1.2),
                            dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-2, 2, (m, 8)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.05, 0.5, (m,)), jnp.float32)
    a = jax.jit(lambda z, lam: add_diagonal(kernel.K(kp, z), lam))(z, lam)
    a.block_until_ready()
    rhs = jnp.asarray(rng.standard_normal((num_rhs, m)), jnp.float32)
    v0 = jnp.zeros_like(rhs)

    rows = []
    for target in (1e-4, 1e-6):
        for rtol in (1e-1, 3e-2, 1e-2, 3e-3, 1e-3, 1e-4):
            @functools.partial(jax.jit, static_argnames=("rtol", "target"))
            def solve(a, rhs, v0, rtol=rtol, target=target):
                matrix_bf16 = a.astype(jnp.bfloat16)

                def matvec_lo(p):
                    out = jax.lax.dot_general(
                        p.astype(jnp.bfloat16), matrix_bf16,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return out.astype(a.dtype)

                def matvec_hi(p):
                    return jnp.matmul(p, a, precision=jax.lax.Precision.HIGHEST)

                eye = cgmod.EyePreconditioner()
                sol, stats = cgmod.ir_cg_loop(
                    matvec_hi, matvec_lo,
                    eye.apply, eye.state,
                    rhs, v0,
                    error_threshold=target, max_iterations=2 * m,
                    inner_rtol=rtol, relative_threshold=True,
                )
                return jnp.sum(sol), stats.steps, jnp.max(stats.error)

            checksum, steps, err = solve(a, rhs, v0)
            float(checksum)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                checksum, steps, err = solve(a, rhs, v0)
                float(checksum)
                walls.append(time.perf_counter() - t0)
            row = {"target": target, "inner_rtol": rtol,
                   "steps": int(steps), "wall_s": round(min(walls), 4),
                   "max_error": float(err)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    path = os.path.join(REPO, "logs", "tune_bf16_ir.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
