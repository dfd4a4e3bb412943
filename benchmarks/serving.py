"""Serving-path scaling: cached posterior throughput vs M, chol vs CG.

Measures the round-2 serving caches (docs/PERF.md "Cholesky-backed caches")
on the local accelerator and writes ``serving_results.csv``:

* ``posterior_predict`` points/s with ``solver="chol"`` (one-time [M, M]
  factorization, two triangular solves per batch);
* ``posterior_predict`` points/s with ``solver="cg"`` (pivchol-preconditioned
  CG on each [M, B] Kmn block);
* ``posterior_predict`` points/s with ``solver="lanczos"`` (round 3: LOVE
  rank-128 quad cache, two skinny matmuls per batch, variances conservative
  over-estimates — the only mean+variance path at M where chol cannot
  factorize and the CG block solve OOMs);
* ``posterior_mean`` points/s (solve-free, identical across paths);
* the one-time cache build wall for each solver.

Timing: fixed-shape 8192-point batches, best of 2 sweeps, one host fetch
per sweep (docs/PERF.md methodology).

    python benchmarks/serving.py [--out DIR] [--quick]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="benchmarks")
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _bench_cache_dir

    jax.config.update("jax_compilation_cache_dir", _bench_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32

    platform = jax.devices()[0].platform
    rng = np.random.RandomState(0)
    kernel = Matern32()
    BATCH = 8192
    # M=16384 OOMs the CG path on one v5e chip (the [8192, M] block solve's
    # loop state + preconditioner build); 8192 is its largest clean point.
    # chol's factor crowds HBM past 16384.  lanczos (LOVE) carries both
    # larger points: its per-batch state is one [128, B] block.
    if args.quick:
        m_solvers = [(1024, ("chol", "cg", "lanczos")),
                     (4096, ("chol", "cg", "lanczos"))]
    else:
        m_solvers = [
            (1024, ("chol", "cg", "lanczos")),
            (4096, ("chol", "cg", "lanczos")),
            (8192, ("chol", "cg", "lanczos")),
            (16384, ("chol", "lanczos")),
            (32768, ("lanczos",)),
        ]
    rows = []

    for m, solvers in m_solvers:
        d = 3
        z = jnp.asarray(rng.uniform(-2, 2, (m, d)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((m, 1)), jnp.float32)
        counts = jnp.asarray(rng.uniform(1, 9, (m, 1)), jnp.float32)
        x = jnp.asarray(rng.uniform(-2, 2, (BATCH * 4, d)), jnp.float32)

        model = CGGP(
            kernel=kernel,
            conjugate_gradient=ConjugateGradient(
                1e-6, max_iterations=min(m, 1000), relative_threshold=True
            ),
            num_data=BATCH,
            num_probes=5,
            precondition="pivchol",
            precond_rank=128,
        )
        params = model.init_params(z, pseudo_u=u, cluster_counts=counts,
                                   dtype=jnp.float32)

        for solver in solvers:
            build = jax.jit(lambda p: model.posterior(p, solver=solver))
            predict = jax.jit(
                lambda post, xb: sum(map(jnp.sum,
                                         model.posterior_predict(post, xb)))
            )
            mean = jax.jit(lambda post, xb: jnp.sum(model.posterior_mean(post, xb)))

            # The WHOLE cell is failure-isolated — the timed phase can hit
            # RESOURCE_EXHAUSTED just as easily as the warm-up compile
            # (these failures are exactly what the sweep exists to record),
            # and one dead cell must not lose the rows already measured.
            try:
                post = build(params)
                float(predict(post, x[:BATCH]))  # compile
                float(mean(post, x[:BATCH]))

                t0 = time.perf_counter()
                post = build(params)
                float(jnp.sum(post.nu))
                build_wall = time.perf_counter() - t0

                # CG at large M is slow per batch: fewer batches there.
                n_batches = (2 if m >= 8192 else 4) if solver == "cg" else 4
                sweeps = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    acc = 0.0
                    for i in range(n_batches):
                        acc = predict(post, x[i * BATCH : (i + 1) * BATCH])
                    float(acc)
                    sweeps.append(time.perf_counter() - t0)
                predict_pps = n_batches * BATCH / min(sweeps)

                sweeps = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    for i in range(4):
                        acc = mean(post, x[i * BATCH : (i + 1) * BATCH])
                    float(acc)
                    sweeps.append(time.perf_counter() - t0)
                mean_pps = 4 * BATCH / min(sweeps)

                # One-dispatch lax.map sweep (round 3: the solve-free
                # chol/LOVE per-batch programs scan cleanly —
                # training/optimize.posterior_predict_scan); the CG branch
                # hits the while_loop-in-scan cliff and keeps the loop.
                scan_pps = None
                loop_auto_pps = None
                auto_bs = None
                if solver != "cg":
                    from cggp_tpu.training.optimize import (
                        auto_serving_batch_size,
                        posterior_predict_scan,
                    )

                    # Each extra column is failure-isolated on its own: a
                    # bigger-program compile death here (observed: the
                    # [8192, 32768] cho_solve) must not void the legacy
                    # columns already measured above.
                    try:
                        serve_scan = jax.jit(lambda post, xq: sum(map(
                            jnp.sum,
                            posterior_predict_scan(model, post, xq, BATCH))))
                        float(serve_scan(post, x))  # compile
                        sweeps = []
                        for _ in range(2):
                            t0 = time.perf_counter()
                            acc = serve_scan(post, x)
                            float(acc)
                            sweeps.append(time.perf_counter() - t0)
                        scan_pps = round(4 * BATCH / min(sweeps), 1)
                    except Exception:  # noqa: BLE001 — keep the row
                        scan_pps = None

                    # DISPATCH-LOOP at the auto-sized batch (fewer-bigger
                    # host dispatches — auto_serving_batch_size docstring;
                    # the scan route measures fastest at the 8192 default,
                    # so the auto rule applies to the loop only).  NOTE the
                    # column totals differ: 262144 points here vs 32768 for
                    # the per-batch/scan columns — per-sweep fetch overhead
                    # amortizes differently; compare like against like via
                    # scripts/serving_batch_chip.py (equal totals).
                    try:
                        AUTO_TOTAL = 4 * 65536
                        auto_bs = auto_serving_batch_size(m, AUTO_TOTAL)
                        x_auto = jnp.tile(x, (AUTO_TOTAL // x.shape[0] + 1, 1)
                                          )[:AUTO_TOTAL]
                        float(predict(post, x_auto[:auto_bs]))  # compile
                        nb = AUTO_TOTAL // auto_bs
                        sweeps = []
                        for _ in range(2):
                            t0 = time.perf_counter()
                            for i in range(nb):
                                acc = predict(
                                    post,
                                    x_auto[i * auto_bs:(i + 1) * auto_bs])
                            float(acc)
                            sweeps.append(time.perf_counter() - t0)
                        loop_auto_pps = round(AUTO_TOTAL / min(sweeps), 1)
                    except Exception:  # noqa: BLE001 — keep the row
                        auto_bs = None
                        loop_auto_pps = None

                row = {
                    "platform": platform, "M": m, "batch": BATCH,
                    "solver": solver,
                    "build_wall_s": round(build_wall, 4),
                    "predict_points_per_sec": round(predict_pps, 1),
                    "scan_points_per_sec": scan_pps,
                    "loop_auto_batch": auto_bs,
                    "loop_auto_points_per_sec": loop_auto_pps,
                    "mean_points_per_sec": round(mean_pps, 1),
                }
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                row = {"platform": platform, "M": m, "batch": BATCH,
                       "solver": solver, "build_wall_s": None,
                       "predict_points_per_sec": None,
                       "scan_points_per_sec": None,
                       "loop_auto_batch": None,
                       "loop_auto_points_per_sec": None,
                       "mean_points_per_sec": None,
                       "error": f"{type(exc).__name__}"[:80]}
            rows.append(row)
            print(json.dumps(row))

    out = Path(args.out, "serving_results.csv")
    with out.open("w", newline="") as f:
        fields = ["platform", "M", "batch", "solver", "build_wall_s",
                  "predict_points_per_sec", "scan_points_per_sec",
                  "loop_auto_batch", "loop_auto_points_per_sec",
                  "mean_points_per_sec", "error"]
        w = csv.DictWriter(f, fieldnames=fields, restval="")
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
