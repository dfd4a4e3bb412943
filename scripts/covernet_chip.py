"""Chip A/B: device covernet vs host covertree at the bench e2e workload.

Measures, at N=435k synthetic 3-D (the UCI-3droad scale, bench.py e2e),
for each resolution in {0.35 (M~1k), 0.15 (M~10k)}:

* selection wall time — host covertree (native C++) vs device covernet
  (cold = includes jit compile through the tunnel; warm = best of 3 with
  cached programs);
* resulting M and minimum separation;
* the conditioning that actually matters downstream: CG iterations to a
  relative 1e-6 on ``Kuu + Lambda`` for the same kernel hyperparameters.

Usage: python scripts/covernet_chip.py [--skip-covertree] [--fine]
(--fine adds the res 0.15 section; the host tree alone takes ~68 s there.)
Prints one JSON line per section; results recorded in docs/PERF.md.
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

    from cggp_tpu.data import synthetic
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal
    from cggp_tpu.selection.covernet import covernet_update_inducing_parameters
    from cggp_tpu.selection.update import covertree_update_inducing_parameters

    N, DIM = 435_000, 3
    train, _ = synthetic(n=N, dim=DIM, seed=0)
    x = jnp.asarray(train[0], jnp.float32)
    y = jnp.asarray(train[1], jnp.float32)
    jnp.sum(x).block_until_ready()

    kernel = Matern32()
    kp = kernel.init_params(
        variance=1.0, lengthscales=np.full(DIM, 1.0), dtype=jnp.float32
    )
    sigma2 = jnp.asarray(0.1, jnp.float32)

    def cg_iters(iv, counts):
        lam = sigma2 / counts[:, 0]
        a = add_diagonal(kernel.K(kp, iv), lam)
        m = iv.shape[0]
        rhs = jnp.asarray(
            np.random.RandomState(0).standard_normal((4, m)), jnp.float32
        )
        cg = ConjugateGradient(1e-6, max_iterations=m, relative_threshold=True)
        _, stats = cg.solve_with_stats(a, rhs.T)
        return int(stats.steps), bool(stats.converged)

    def min_sep(z):
        z = np.asarray(z)
        d = np.linalg.norm(z[:, None, :] - z[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return float(d.min())

    resolutions = [(0.35, 2048)]
    if "--fine" in sys.argv:
        resolutions.append((0.15, 16384))

    for res, cap in resolutions:
        t0 = time.perf_counter()
        iv_n, u_n, c_n = covernet_update_inducing_parameters(
            (x, y), res, max_points=cap
        )
        float(jnp.sum(iv_n))
        cold = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            iv_n, u_n, c_n = covernet_update_inducing_parameters(
                (x, y), res, max_points=cap
            )
            float(jnp.sum(iv_n))
            walls.append(time.perf_counter() - t0)
        out = {
            "resolution": res,
            "covernet": {
                "wall_cold_s": round(cold, 2),
                "wall_warm_s": round(min(walls), 3),
                "m": int(iv_n.shape[0]),
                "min_separation": round(min_sep(iv_n), 4),
            },
        }
        if "--skip-covertree" not in sys.argv:
            t0 = time.perf_counter()
            iv_t, u_t, c_t = covertree_update_inducing_parameters((x, y), res)
            float(jnp.sum(iv_t))
            out["covertree"] = {
                "wall_s": round(time.perf_counter() - t0, 2),
                "m": int(iv_t.shape[0]),
            }
            it_t, conv_t = cg_iters(iv_t, c_t)
            out["covertree"].update(cg_iters_1e6=it_t, converged=conv_t)
        it_n, conv_n = cg_iters(iv_n, c_n)
        out["covernet"].update(cg_iters_1e6=it_n, converged=conv_n)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
