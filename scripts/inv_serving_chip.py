"""Chip A/B: per-batch serving variance — cho_solve vs precomputed L^{-1}.

The chol serving cache answers each batch with ``cho_solve((L, True), Kmn)``
— two [M, M] triangular solves per batch.  XLA lowers TriangularSolve on TPU
through blocked diagonal inversions + matmuls, but the panel recursion is
serial; a ONE-TIME explicit ``Linv = L^{-1}`` at cache build turns the whole
per-batch solve into a single MXU matmul (diag variance needs only
``||Linv @ Kmn||^2`` columnwise — the second triangular solve vanishes).

Measures, for M in {1024, 2048, 4096, 8192(, 16384 with --huge)} at batch
T=8192 fp32:

* per-batch wall: cho_solve(+reduce) vs Linv-matmul(+reduce), amortized
  ITERS reps inside one jit (tunnel methodology, docs/PERF.md);
* the one-time Linv build cost (solve_triangular vs I);
* max |fvar_inv - fvar_chol| on a well-conditioned SE system (the chol
  serving domain: kappa*eps << 1), to bound the accuracy cost.

Prints one JSON line per (M,) section.  Usage:
  python scripts/inv_serving_chip.py [--huge] [--iters K]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from cggp_tpu.utils.cache import enable_persistent_cache  # noqa: E402


def main() -> None:
    import jax

    enable_persistent_cache(jax, "bench-")
    import jax.numpy as jnp

    huge = "--huge" in sys.argv
    iters = 50
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal

    hi = jax.lax.Precision.HIGHEST
    kernel = Matern32()
    T = 8192
    d = 3

    sizes = [1024, 2048, 4096, 8192] + ([16384] if huge else [])
    for m in sizes:
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.uniform(-2, 2, (m, d)), jnp.float32)
        xq = jnp.asarray(rng.uniform(-2, 2, (T, d)), jnp.float32)
        kp = kernel.init_params(
            variance=1.0, lengthscales=np.full(d, 1.0), dtype=jnp.float32
        )
        lam = jnp.asarray(rng.uniform(1e-3, 1e-2, (m,)), jnp.float32)
        a = add_diagonal(kernel.K(kp, z), lam)
        kmn = kernel.K(kp, z, xq)  # [M, T]
        knn = kernel.K_diag(kp, xq)

        chol = jnp.linalg.cholesky(a)
        chol.block_until_ready()

        # one-time Linv build cost
        eye = jnp.eye(m, dtype=jnp.float32)
        build = jax.jit(
            lambda L: jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        )
        try:
            linv = build(chol)
            t0 = time.perf_counter()
            linv = build(chol)
            _ = float(jnp.sum(linv[:1]))
            t_build = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"m": m, "error": f"linv build: {type(exc).__name__}"}))
            continue

        def fvar_chol(L, kmn_, knn_):
            inv_kmn = jax.scipy.linalg.cho_solve((L, True), kmn_)
            return knn_ - jnp.sum(kmn_ * inv_kmn, axis=0)

        def fvar_inv(V, kmn_, knn_, prec):
            aa = jnp.matmul(V, kmn_, precision=prec)
            return knn_ - jnp.sum(aa * aa, axis=0)

        def timed(fn, *args):
            f = jax.jit(
                lambda *a: jax.lax.fori_loop(
                    0, iters, lambda i, acc: acc + jnp.sum(fn(*a)[:1]), 0.0
                )
            )
            try:
                f(*args)  # compile
            except Exception as exc:  # noqa: BLE001
                return None, f"compile: {type(exc).__name__}"
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(out)
            return (time.perf_counter() - t0) / iters, None

        t_chol, err_c = timed(fvar_chol, chol, kmn, knn)
        t_inv_hi, err_h = timed(lambda V, k_, n_: fvar_inv(V, k_, n_, hi),
                                linv, kmn, knn)
        t_inv_def, err_d = timed(
            lambda V, k_, n_: fvar_inv(V, k_, n_, jax.lax.Precision.DEFAULT),
            linv, kmn, knn)

        # accuracy (well-conditioned domain)
        v_c = fvar_chol(chol, kmn, knn)
        v_i = fvar_inv(linv, kmn, knn, hi)
        v_d = fvar_inv(linv, kmn, knn, jax.lax.Precision.DEFAULT)
        scale = float(jnp.max(jnp.abs(v_c))) or 1.0
        row = {
            "m": m,
            "t": T,
            "iters": iters,
            "linv_build_s": round(t_build, 4),
            "cho_solve_ms": None if t_chol is None else round(t_chol * 1e3, 3),
            "inv_highest_ms": None if t_inv_hi is None else round(t_inv_hi * 1e3, 3),
            "inv_default_ms": None if t_inv_def is None else round(t_inv_def * 1e3, 3),
            "speedup_highest": None if (t_chol is None or t_inv_hi is None)
            else round(t_chol / t_inv_hi, 2),
            "speedup_default": None if (t_chol is None or t_inv_def is None)
            else round(t_chol / t_inv_def, 2),
            "max_abs_err_highest": float(jnp.max(jnp.abs(v_i - v_c))),
            "max_abs_err_default": float(jnp.max(jnp.abs(v_d - v_c))),
            "rel_err_highest": float(jnp.max(jnp.abs(v_i - v_c))) / scale,
            "errors": [e for e in (err_c, err_h, err_d) if e],
        }
        print(json.dumps(row))


if __name__ == "__main__":
    main()
