"""Go/no-go microbenchmark for chol-factor CG preconditioning.

Measures, on the local accelerator, the per-step cost of building the
exact-factor preconditioner state (blocked Cholesky of ``Kmm + Lambda``
plus the triangular inverse ``W = L^{-1}``) against the cost of the
pivoted-Cholesky rank-256 build it would replace, at the bench e2e shape
(M~1k) and larger.  The chol-precond apply work per CG iteration is two
[R, M] x [M, M] matmuls (same order as the matvec), so the decision
hinges almost entirely on the build wall measured here: the factor only
pays if (build_chol - build_pivchol) < (iterations saved) x (per-iter
cost).

Timing protocol per docs/PERF.md: many repeats inside one jit via
lax.scan (inputs perturbed per step so XLA cannot CSE the factorization),
one scalar fetch at the end as the sync point.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal, pivoted_cholesky

    platform = jax.devices()[0].platform
    results = {"platform": "tpu" if platform == "axon" else platform}

    kernel = Matern32()
    rng = np.random.RandomState(0)

    import os as _os

    sizes = (989, 2048, 4096, 8192) if _os.environ.get(
        "CGGP_PROBE_BIG") else (989, 2048, 4096)
    for m in sizes:
        kp = kernel.init_params(variance=1.0, lengthscales=np.full(3, 1.2),
                                dtype=jnp.float32)
        z = jnp.asarray(rng.uniform(-2, 2, (m, 3)), jnp.float32)
        lam = jnp.asarray(rng.uniform(1e-4, 5e-4, (m,)), jnp.float32)
        a = add_diagonal(kernel.K(kp, z), lam)

        reps = 20 if m <= 2048 else 8

        @jax.jit
        def chol_inv_scan(a):
            def step(carry, i):
                # Perturb the diagonal per step so the factorization cannot
                # be hoisted/CSE'd out of the scan.
                ai = a + (1e-6 * (i + 1).astype(a.dtype)) * jnp.eye(
                    a.shape[0], dtype=a.dtype
                )
                l = jnp.linalg.cholesky(ai)
                w = jax.scipy.linalg.solve_triangular(
                    l, jnp.eye(a.shape[0], dtype=a.dtype), lower=True
                )
                return carry + jnp.sum(w[0]), None

            out, _ = jax.lax.scan(step, jnp.zeros((), a.dtype),
                                  jnp.arange(reps, dtype=jnp.int32))
            return out

        @jax.jit
        def chol_only_scan(a):
            def step(carry, i):
                ai = a + (1e-6 * (i + 1).astype(a.dtype)) * jnp.eye(
                    a.shape[0], dtype=a.dtype
                )
                l = jnp.linalg.cholesky(ai)
                return carry + jnp.sum(l[0]), None

            out, _ = jax.lax.scan(step, jnp.zeros((), a.dtype),
                                  jnp.arange(reps, dtype=jnp.int32))
            return out

        @jax.jit
        def pivchol_scan(a):
            def step(carry, i):
                ai = a + (1e-6 * (i + 1).astype(a.dtype)) * jnp.eye(
                    a.shape[0], dtype=a.dtype
                )
                f = pivoted_cholesky(ai, 256)
                return carry + jnp.sum(f[0]), None

            out, _ = jax.lax.scan(step, jnp.zeros((), a.dtype),
                                  jnp.arange(reps, dtype=jnp.int32))
            return out

        row = {}
        for name, fn in (("chol+triinv", chol_inv_scan),
                         ("chol_only", chol_only_scan),
                         ("pivchol256", pivchol_scan)):
            float(fn(a))  # compile + warm
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(a))
                walls.append(time.perf_counter() - t0)
            row[name + "_ms"] = round(min(walls) / reps * 1e3, 3)
        results[f"m{m}"] = row
        print(json.dumps({f"m{m}": row}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
