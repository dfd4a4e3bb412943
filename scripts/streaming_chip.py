"""Chip A/B: streaming serving-cache extension vs from-scratch rebuild.

Measures, per M in a sweep and a fixed ingest size dM:

  - ``rebuild_chol_s``   — full ``posterior(params', solver="chol")`` after
                           an ingest (the O(M'^3) baseline every streaming
                           update would otherwise pay);
  - ``extend_chol_s``    — ``posterior_extend`` on a chol cache for a pure
                           center append (bordered factor, O(dM M^2));
  - ``rebuild_cg_s``     — full ``posterior(params', solver="cg")`` with the
                           production ``precondition="chol"`` refinement
                           factor (cholesky + triangular inverse);
  - ``extend_cg_s``      — ``posterior_extend`` on that cg cache with
                           Lambda drift on the prefix (the streaming-merge
                           norm: border-extended W, diag-updated system,
                           warm-started nu).

Each timing includes a device->host sync on a scalar reduce of the new
cache's nu (tunnel methodology, docs/PERF.md); best of 3.  A serving
parity check (extend vs rebuild, 4096 query points) guards the numbers.

Prints one JSON line per (m, mode) cell.  Usage:
  python scripts/streaming_chip.py [--dm 128] [--ms 2048,4096,8192]
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

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32

    dm = 128
    if "--dm" in sys.argv:
        dm = int(sys.argv[sys.argv.index("--dm") + 1])
    ms = [2048, 4096, 8192]
    if "--ms" in sys.argv:
        ms = [int(v) for v in sys.argv[sys.argv.index("--ms") + 1].split(",")]

    rng = np.random.RandomState(0)
    dim = 3

    def timed(fn, repeats=3):
        walls = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out.nu))  # device->host fetch = hard sync
            walls.append(time.perf_counter() - t0)
        return min(walls), out

    for m in ms:
        model = CGGP(
            kernel=Matern32(),
            conjugate_gradient=ConjugateGradient(
                1e-5, max_iterations=m + dm, relative_threshold=True
            ),
            num_data=100_000, num_probes=5, precondition="chol",
        )
        z1 = jnp.asarray(rng.uniform(-2, 2, (m, dim)), jnp.float32)
        u1 = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
        c1 = jnp.asarray(rng.uniform(4, 64, (m, 1)), jnp.float32)
        z_new = jnp.asarray(rng.uniform(-2.4, 2.4, (dm, dim)), jnp.float32)
        z2 = jnp.concatenate([z1, z_new])
        u_app = jnp.concatenate([u1, jnp.zeros((dm, 1), jnp.float32)])
        c_app = jnp.concatenate([c1, jnp.ones((dm, 1), jnp.float32)])
        # Drifted variant: merged counts grow on ~1/4 of the old clusters.
        drift = jnp.asarray(
            (rng.uniform(size=(m, 1)) < 0.25).astype(np.float32) * 2.0
        )
        c_drift = jnp.concatenate([c1 + drift, jnp.ones((dm, 1), jnp.float32)])

        params1 = model.init_params(z1, pseudo_u=u1, cluster_counts=c1,
                                    dtype=jnp.float32)
        params2a = model.assign_clusters(params1, z2, u_app, c_app)
        params2d = model.assign_clusters(params1, z2, u_app, c_drift)
        xq = jnp.asarray(rng.uniform(-2, 2, (4096, dim)), jnp.float32)

        post_chol = model.posterior(params1, solver="chol")
        float(jnp.sum(post_chol.nu))
        post_cg = model.posterior(params1, solver="cg")
        float(jnp.sum(post_cg.nu))

        cells = [
            ("rebuild_chol", lambda: model.posterior(params2a, solver="chol")),
            ("extend_chol", lambda: model.posterior_extend(post_chol, params2a)),
            ("rebuild_cg", lambda: model.posterior(params2d, solver="cg")),
            ("extend_cg", lambda: model.posterior_extend(post_cg, params2d)),
        ]
        results = {}
        for name, fn in cells:
            try:
                wall, post = timed(fn)
                results[name] = (wall, post)
            except Exception as exc:  # noqa: BLE001 — failure-isolate cells
                print(json.dumps({"m": m, "dm": dm, "mode": name,
                                  "error": str(exc)[:200]}), flush=True)

        # Parity guard: extend must serve what rebuild serves.
        for pair in (("rebuild_chol", "extend_chol"), ("rebuild_cg", "extend_cg")):
            if pair[0] in results and pair[1] in results:
                mu_r, var_r = model.posterior_predict(results[pair[0]][1], xq)
                mu_e, var_e = model.posterior_predict(results[pair[1]][1], xq)
                err = float(jnp.max(jnp.abs(mu_r - mu_e)) +
                            jnp.max(jnp.abs(var_r - var_e)))
                for name in pair:
                    wall = results[name][0]
                    print(json.dumps({
                        "m": m, "dm": dm, "mode": name,
                        "wall_s": round(wall, 5),
                        "parity_abs_err": float(f"{err:.3g}"),
                    }), flush=True)
        if "rebuild_chol" in results and "extend_chol" in results:
            print(json.dumps({
                "m": m, "dm": dm, "mode": "speedup_chol",
                "x": round(results["rebuild_chol"][0]
                           / results["extend_chol"][0], 2),
            }), flush=True)
        if "rebuild_cg" in results and "extend_cg" in results:
            print(json.dumps({
                "m": m, "dm": dm, "mode": "speedup_cg",
                "x": round(results["rebuild_cg"][0]
                           / results["extend_cg"][0], 2),
            }), flush=True)


if __name__ == "__main__":
    main()
