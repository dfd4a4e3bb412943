#!/usr/bin/env python
"""Chip experiment: CG matvec at Precision.HIGH (bf16x3) vs HIGHEST (bf16x6).

The façade's fp32 matvec runs at HIGHEST — correct and ~free on the
HBM-bound bench shape (16 RHS), but the fused training solve is a
[1+2P+B, M] block (R ~ 2000) where the matvec is MXU-compute-bound and
HIGHEST pays 6 bf16 passes per operand pair vs HIGH's 3.  bf16x3 carries
~2^-21 relative error (vs fp32's 2^-24): if CG converges identically at
production thresholds, HIGH is a ~2x matvec win on the training shape.

Measures, per (shape, precision): iterations to target, wall time, and
exact-residual quality (computed at HIGHEST), plus solution agreement vs
the HIGHEST solve.  Writes logs/precision_cg_chip.json.
"""
from __future__ import annotations

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

    cache.enable_persistent_cache(jax, "precx-")

    kernel = Matern32()
    rng = np.random.RandomState(0)

    # (name, M, R, lam_low, lam_high, threshold): 'train' mimics the fused
    # production solve — Lambda = sigma^2/counts spans ~1e-5..1e-1 (kappa~1e6,
    # the regime where plain-bf16 CG diverges); 'bench' is the HBM-bound shape.
    shapes = [
        ("train_fused", 1024, 2059, 1e-5, 1e-1, 1e-6),
        ("bench", 32768, 16, 0.05, 0.5, 1e-6),
    ]
    precisions = [("HIGHEST", jax.lax.Precision.HIGHEST),
                  ("HIGH", jax.lax.Precision.HIGH)]

    results = []
    for name, m, r, lo, hi_lam, thresh in shapes:
        dim = 8
        z = jnp.asarray(rng.uniform(-2, 2, (m, dim)), jnp.float32)
        kp = kernel.init_params(variance=1.0, lengthscales=np.full(dim, 1.2),
                                dtype=jnp.float32)
        lam = jnp.asarray(
            np.exp(rng.uniform(np.log(lo), np.log(hi_lam), m)), jnp.float32)
        kmat = jax.jit(lambda z: kernel.K(kp, z))(z)
        a = add_diagonal(kmat, lam)
        a.block_until_ready()
        rhs = jnp.asarray(rng.standard_normal((r, m)), jnp.float32)
        v0 = jnp.zeros_like(rhs)

        # pivchol preconditioning on the ill-conditioned training shape,
        # matching the production config (eye on the bench shape).
        if name == "train_fused":
            precond = cgmod.pivoted_cholesky_preconditioner(kmat, lam, 128)
        else:
            precond = cgmod.EyePreconditioner()

        sols = {}
        for pname, prec in precisions:
            @jax.jit
            def solve(a, rhs, v0, prec=prec, precond=precond, thresh=thresh, m=m):
                def matvec(p):
                    return jnp.matmul(p, a, precision=prec)

                sol, stats = cgmod.cg_loop(
                    matvec, precond.apply, precond.state, rhs, v0,
                    error_threshold=thresh, max_iterations=2 * m,
                    max_steps_cycle=2 * m + 1,
                    mat_for_precond=a, relative_threshold=True,
                )
                return sol, stats.steps, jnp.max(stats.error)

            sol, steps, err = solve(a, rhs, v0)
            sol.block_until_ready()
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                sol, steps, err = solve(a, rhs, v0)
                float(steps)
                walls.append(time.perf_counter() - t0)
            sols[pname] = np.asarray(sol)

            exact_r = np.asarray(
                rhs - jnp.matmul(sol, a, precision=jax.lax.Precision.HIGHEST))
            rel_res = float(np.max(
                np.linalg.norm(exact_r, axis=-1)
                / np.linalg.norm(np.asarray(rhs), axis=-1)))
            row = {
                "shape": name, "M": m, "R": r, "precision": pname,
                "steps": int(steps), "wall_s": round(min(walls), 4),
                "max_rel_residual": rel_res,
            }
            if "HIGHEST" in sols and pname != "HIGHEST":
                denom = np.linalg.norm(sols["HIGHEST"], axis=-1)
                row["sol_rel_diff_vs_highest"] = float(np.max(
                    np.linalg.norm(sols[pname] - sols["HIGHEST"], axis=-1)
                    / np.maximum(denom, 1e-30)))
            results.append(row)
            print(json.dumps(row), flush=True)

    path = os.path.join(REPO, "logs", "precision_cg_chip.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
