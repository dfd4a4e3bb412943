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


def padded_pipeline() -> None:
    """Measure the SINGLE-DISPATCH ingest pipeline (make_streaming_ingest_fn)
    per-ingest wall at fixed capacity — the TPU-first streaming path the
    eager extension A/B motivated.  Reports compile wall (first ingest) and
    steady-state wall (best of 5 warm ingests, each a fresh data block, sync
    on a scalar fetch of the new cache's nu)."""
    import jax

    enable_persistent_cache(jax, "bench-")
    import jax.numpy as jnp

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.covernet import covernet_update_inducing_parameters
    from cggp_tpu.training.optimize import make_streaming_ingest_fn

    caps = [2048, 8192]
    if "--caps" in sys.argv:
        caps = [int(v) for v in sys.argv[sys.argv.index("--caps") + 1].split(",")]
    ingest_n = 4096
    rng = np.random.RandomState(0)
    dim = 3

    for cap in caps:
        model = CGGP(
            kernel=Matern32(),
            conjugate_gradient=ConjugateGradient(
                1e-5, max_iterations=cap, relative_threshold=True
            ),
            num_data=100_000, num_probes=5, precondition="chol",
        )
        x0 = jnp.asarray(rng.uniform(-2, 2, (20_000, dim)), jnp.float32)
        y0 = jnp.sin(3.0 * x0[:, :1])
        # Resolution tuned so the initial net fills ~half the capacity.
        res = {2048: 0.28, 8192: 0.155}.get(cap, 0.3)
        z, u, c = covernet_update_inducing_parameters((x0, y0), res, lloyds=0)
        if z.shape[0] > cap - 64:
            print(json.dumps({"cap": cap, "mode": "padded_setup",
                              "error": f"net {z.shape[0]} too close to cap"}),
                  flush=True)
            continue
        params = model.init_params(z, pseudo_u=u, cluster_counts=c,
                                   dtype=jnp.float32, capacity=cap)
        ingest = make_streaming_ingest_fn(model, res)

        def block(i):
            xb = jnp.asarray(rng.uniform(-2.2, 2.2, (ingest_n, dim)),
                             jnp.float32)
            return xb, jnp.sin(3.0 * xb[:, :1])

        xb, yb = block(0)
        t0 = time.perf_counter()
        params, post = ingest(params, xb, yb)
        float(jnp.sum(post.nu))
        compile_wall = time.perf_counter() - t0

        walls = []
        for i in range(1, 6):
            xb, yb = block(i)
            t0 = time.perf_counter()
            params, post = ingest(params, xb, yb)
            float(jnp.sum(post.nu))
            walls.append(time.perf_counter() - t0)
        print(json.dumps({
            "cap": cap, "mode": "padded_ingest", "ingest_n": ingest_n,
            "m_real": int(params["inducing_mask"].sum()),
            "m0": int(z.shape[0]),
            "compile_wall_s": round(compile_wall, 3),
            "warm_wall_s": round(min(walls), 5),
            "warm_walls": [round(w, 4) for w in walls],
        }), flush=True)


if __name__ == "__main__":
    if "--padded" in sys.argv:
        padded_pipeline()
    else:
        main()
