"""Scaling/roofline benchmark harness (SURVEY.md section 7, stage 9).

Sweeps the two hot axes and writes ``scaling_results.csv``:

* M (inducing count): batched-CG solve throughput — iters/sec and effective
  matvec GB/s vs the HBM roofline;
* N (data count): fused Pallas Gram-matvec vs XLA for ``K(x, z) @ v``
  (the prediction / Kuf path).

Timing methodology per docs/PERF.md: iterations amortized inside one jit,
one device->host scalar fetch per measurement, persistent compile cache.

    python benchmarks/scaling.py [--out DIR] [--quick]
"""

from __future__ import annotations

import argparse
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
    parser.add_argument("--train", action="store_true",
                        help="also measure end-to-end CDGP training steps/s "
                             "at reference scale (N=435k)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cggp_tpu.ops.cg import conjugate_gradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal
    from cggp_tpu.ops.pallas_gram import gram_matvec

    platform = jax.devices()[0].platform
    hbm_gbps = {"tpu": 819.0, "axon": 819.0}.get(platform, 100.0)
    rng = np.random.RandomState(0)
    kernel = Matern32()
    kp = kernel.init_params(variance=1.0, lengthscales=np.ones(8), dtype=jnp.float32)
    rows = []

    def sync(x):
        return float(jnp.sum(x))

    # -- M sweep: CG throughput ------------------------------------------------
    # 600 iterations per fetch: the ~30 ms device->host sync otherwise
    # dominates the latency-bound small-M rows (docs/PERF.md methodology).
    iters = 600
    m_values = (1024, 2048, 4096) if args.quick else (1024, 2048, 4096, 8192, 16384)
    for m in m_values:
        z = jnp.asarray(rng.uniform(-2, 2, (m, 8)), jnp.float32)
        lam = jnp.asarray(rng.uniform(0.05, 0.5, (m,)), jnp.float32)
        rhs = jnp.asarray(rng.standard_normal((16, m)), jnp.float32)

        @jax.jit
        def solve(z, lam, rhs):
            a = add_diagonal(kernel.K(kp, z), lam)
            sol, _ = conjugate_gradient(a, rhs, jnp.zeros_like(rhs), 0.0,
                                        max_iterations=iters, max_steps_cycle=iters + 1)
            return jnp.sum(sol)

        sync(solve(z, lam, rhs))  # compile
        best = min(
            (lambda t0: (sync(solve(z, lam, rhs)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        gbps = iters * m * m * 4 / best / 1e9
        rows.append({
            "bench": "cg_solve", "M": m, "N": None,
            "value": round(gbps, 1), "unit": "GB/s",
            "iters_per_sec": round(iters / best, 1),
            "roofline_frac": round(gbps / hbm_gbps, 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    # -- N sweep: fused Gram-matvec vs XLA --------------------------------------
    reps = 10
    n_values = (16384, 65536) if args.quick else (16384, 65536, 262144)
    mz = 1024
    z = jnp.asarray(rng.uniform(-2, 2, (mz, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((mz, 16)), jnp.float32)
    var = jnp.asarray(1.0, jnp.float32)
    for n in n_values:
        x = jnp.asarray(rng.uniform(-2, 2, (n, 8)), jnp.float32)

        def loop(fn):
            @jax.jit
            def run(x, z, v):
                def body(i, v):
                    out = fn(x, z, v)
                    return out[:mz] * 1e-3
                return jnp.sum(jax.lax.fori_loop(0, reps, body, v)[:1, :8])
            sync(run(x, z, v))
            t0 = time.perf_counter(); sync(run(x, z, v))
            return (time.perf_counter() - t0) / reps

        t_pallas = loop(lambda x, z, v: gram_matvec(x, z, v, var, "matern32"))
        t_xla = loop(lambda x, z, v: kernel.K(kp, x, z) @ v)
        rows.append({
            "bench": "gram_matvec", "M": mz, "N": n,
            "value": round(t_pallas * 1e3, 3), "unit": "ms(pallas)",
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_speedup": round(t_xla / t_pallas, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    # -- end-to-end training throughput (reference scale) -----------------------
    if args.train:
        import optax

        from cggp_tpu.data import load_data
        from cggp_tpu.models import CGGP
        from cggp_tpu.ops.cg import ConjugateGradient
        from cggp_tpu.selection.update import labels_update_inducing_parameters
        from cggp_tpu.training.optimize import make_adam_multi_step

        n_train, dim, m_ind, batch, chunk = 435_000, 3, 652, 2048, 25
        bundle = load_data("synthetic", dtype=np.float32,
                           synthetic_n=n_train, synthetic_dim=dim)
        x, y = map(jnp.asarray, bundle.train)
        # Random-subset Z + Voronoi cluster stats (covertree selection does
        # not change per-step cost; it changes conditioning, which the
        # preconditioner + relative stop rule absorb).
        iv, u, counts = labels_update_inducing_parameters((x, y), x[:m_ind])
        model = CGGP(
            kernel=kernel,
            conjugate_gradient=ConjugateGradient(
                1e-6, max_iterations=m_ind, relative_threshold=True),
            num_data=x.shape[0], num_probes=5,
            precondition="pivchol", precond_rank=128,
        )
        kp_t = kernel.init_params(variance=1.0, lengthscales=np.ones(dim),
                                  dtype=jnp.float32)
        params = model.init_params(iv, pseudo_u=u, cluster_counts=counts,
                                   dtype=x.dtype)
        params["kernel"] = kp_t
        opt = optax.adam(0.01)
        opt_state = opt.init(params)
        multi = make_adam_multi_step(
            lambda p, b, k: model.training_loss(p, b, k), opt, (x, y),
            model.trainable_mask(params),
        )
        idx_rng = np.random.default_rng(0)

        def idx_chunk():
            return jnp.asarray(
                idx_rng.integers(0, x.shape[0], (chunk, batch)), jnp.int32)

        p, s, losses = multi(params, opt_state, idx_chunk(), jax.random.PRNGKey(0))
        sync(losses)
        num_chunks = 4 if args.quick else 12
        t0 = time.perf_counter()
        for i in range(num_chunks):
            p, s, losses = multi(p, s, idx_chunk(), jax.random.PRNGKey(i + 1))
        sync(losses)
        dt = time.perf_counter() - t0
        rows.append({
            "bench": "train_step", "M": m_ind, "N": n_train,
            "value": round(num_chunks * chunk / dt, 2), "unit": "steps/s",
            "ms_per_step": round(dt / (num_chunks * chunk) * 1e3, 2),
            "batch": batch, "steps_per_call": chunk,
        })
        print(json.dumps(rows[-1]), flush=True)

    import pandas as pd

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(out / "scaling_results.csv", index=False)
    print(f"wrote {out / 'scaling_results.csv'}")


if __name__ == "__main__":
    main()
