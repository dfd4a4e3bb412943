"""Chip sweep: serving batch size T vs throughput, scan route vs loop route.

Two rounds of measurement behind `auto_serving_batch_size`:

Round A (superseded — kept for the record): a fori_loop microbench over a
single resident batch suggested the chol cache's per-batch ``cho_solve`` is
latency-bound and flat in T (4.0M -> 15.8M points/s from T=8192 to 131072 at
M=1024).  That reading was CONTAMINATED: each fori cell amortized one ~30 ms
tunnel fetch over its window, penalizing small-T cells by ~40%, and the real
serving routes never run one batch 50x.

Round B (this script): the REAL serving programs at bench shapes — a 1M-point
query set served through (1) the one-dispatch ``posterior_predict_scan`` and
(2) the python dispatch loop, at several T, cache build OUTSIDE the timing,
best of 3.  The scan already amortizes dispatch latency, so T mostly moves
XLA's internal blocking; the loop pays 1.5-5 ms tunnel latency per dispatch,
so fewer-bigger batches help it directly.

Prints one JSON line per (m, route, t) cell.  Usage:
  python scripts/serving_batch_chip.py [--m 1024] [--points 1048576]
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

    m = 1024
    if "--m" in sys.argv:
        m = int(sys.argv[sys.argv.index("--m") + 1])
    points = 1_048_576
    if "--points" in sys.argv:
        points = int(sys.argv[sys.argv.index("--points") + 1])

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.training.optimize import posterior_predict_scan

    d = 3
    kernel = Matern32()
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.uniform(-2, 2, (m, d)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
    counts = jnp.asarray(rng.randint(1, 500, (m, 1)), jnp.float32)
    model = CGGP(
        kernel=kernel,
        conjugate_gradient=ConjugateGradient(1e-6, max_iterations=m),
        num_data=435_000,
        num_probes=5,
    )
    params = model.init_params(z, pseudo_u=u, cluster_counts=counts,
                               dtype=jnp.float32)
    post = jax.jit(lambda p: model.posterior(p, solver="chol"))(params)
    xq = jnp.asarray(rng.uniform(-2, 2, (points, d)), jnp.float32)
    float(jnp.sum(post.nu))  # sync the cache build

    for t in (8192, 16384, 32768, 65536, 131072):
        if m * t > 2 ** 28:
            continue

        serve_scan = jax.jit(lambda p_, x_, t_=t: sum(map(jnp.sum, (
            o for o in posterior_predict_scan(model, p_, x_, t_)
            if o is not None))))

        @jax.jit
        def batch_one(p_, xb):
            mu, var = model.posterior_predict(p_, xb, full_cov=False)
            return jnp.sum(mu) + jnp.sum(var)

        try:
            float(serve_scan(post, xq))  # compile
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(serve_scan(post, xq))
                walls.append(time.perf_counter() - t0)
            print(json.dumps({
                "m": m, "route": "scan", "t": t,
                "wall_s": round(min(walls), 4),
                "points_per_s": round(points / min(walls)),
            }))
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"m": m, "route": "scan", "t": t,
                              "error": type(exc).__name__}))

        try:
            nb = points // t
            float(batch_one(post, xq[:t]))  # compile
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                acc = 0.0
                for i in range(nb):
                    acc = batch_one(post, xq[i * t:(i + 1) * t])
                float(acc)
                walls.append(time.perf_counter() - t0)
            print(json.dumps({
                "m": m, "route": "loop", "t": t, "batches": nb,
                "wall_s": round(min(walls), 4),
                "points_per_s": round(nb * t / min(walls)),
            }))
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"m": m, "route": "loop", "t": t,
                              "error": type(exc).__name__}))


if __name__ == "__main__":
    main()
