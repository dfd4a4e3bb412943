#!/usr/bin/env python
"""One-command chip re-measurement for everything waiting on the TPU tunnel.

The device tunnel wedges for hours when a client dies mid-compile (see
docs/ROADMAP.md round-3 status); this script packs every pending chip
measurement into one run so a single recovery window captures all of it:

1. ``bench.py`` — the driver's headline CG-matvec GB/s + e2e train/serve
   metrics; a green run also refreshes ``logs/bench_last_good.json``, the
   wedge-replay cache that keeps later BENCH_r{N}.json nonzero.
2. The mixed-precision CG variant table (fp32 / bf16_ir / drift-adaptive
   bf16_ru at M=32768, 16 RHS, relative targets 1e-4 and 1e-6) — the
   round-3 drift-adaptive loop is CPU-validated for iteration counts
   (docs/PERF.md round-3 table); this captures real-chip WALL TIMES.

Results land in ``logs/chip_measure.json`` (one JSON object per section)
plus a markdown table on stdout ready for docs/PERF.md.

Usage:
    python scripts/chip_measure.py            # full run (TPU, ~minutes)
    python scripts/chip_measure.py --tiny     # CPU smoke (structure check)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe_backend(timeout_s: int = 150) -> bool:
    """Child-process probe — bench.py's maintained implementation (one copy:
    its clamping/retry fixes apply here automatically)."""
    from bench import _backend_responsive

    return _backend_responsive(timeout_s=timeout_s)


def run_bench() -> dict:
    # A wedge can strike any compile — a hung bench must degrade to an
    # error entry, not crash the script before the other sections run.
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=1800, env=dict(os.environ),
        )
    except subprocess.TimeoutExpired:
        return {"error": "bench.py timed out after 1800s (tunnel re-wedged?)"}
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1]) if lines else {"error": proc.stderr[-500:]}


def bf16_variant_table(m: int, num_rhs: int, targets, repeats: int = 3) -> list:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cggp_tpu.ops.cg import conjugate_gradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.linalg import add_diagonal
    from cggp_tpu.utils import cache

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # --tiny: the tunnel sitecustomize force-overrides jax_platforms to
        # "axon,cpu" at interpreter start (see memory/tpu-tunnel-wedge);
        # re-pin AFTER import, before any device use, or the smoke run
        # blocks on a wedged tunnel.
        jax.config.update("jax_platforms", "cpu")

    cache.enable_persistent_cache(jax, "chipmeasure-")

    rng = np.random.RandomState(0)
    kernel = Matern32()
    kp = kernel.init_params(
        variance=1.0, lengthscales=np.full(8, 1.2), dtype=jnp.float32
    )
    z = jnp.asarray(rng.uniform(-2, 2, (m, 8)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.05, 0.5, (m,)), jnp.float32)
    # Build the Gram UNDER jit: eager construction materializes the r2 /
    # K / A chain as separate [M, M] buffers (~13 GB at M=32768 — observed
    # RESOURCE_EXHAUSTED on the 16 GB chip); fused, only the output lives.
    a = jax.jit(lambda z, lam: add_diagonal(kernel.K(kp, z), lam))(z, lam)
    a.block_until_ready()
    rhs = jnp.asarray(rng.standard_normal((num_rhs, m)), jnp.float32)
    v0 = jnp.zeros_like(rhs)

    rows = []
    for target in targets:
        for impl in ("xla", "bf16_ir", "bf16_ru"):
            @jax.jit
            def solve(a, rhs, v0, impl=impl, target=target):
                sol, stats = conjugate_gradient(
                    a, rhs, v0, target, max_iterations=2 * m,
                    max_steps_cycle=2 * m + 1, matvec_impl=impl,
                    relative_threshold=True,
                )
                # scalar reduce inside jit = reliable sync over the tunnel
                return jnp.sum(sol), stats.steps, jnp.max(stats.error)

            checksum, steps, err = solve(a, rhs, v0)
            float(checksum)  # compile + warm
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                checksum, steps, err = solve(a, rhs, v0)
                float(checksum)
                times.append(time.perf_counter() - t0)
            rows.append({
                "M": m, "target": target, "impl": impl,
                "steps": int(steps), "max_error": float(err),
                "wall_s": round(min(times), 4),
            })
            print(f"  {impl:8s} target={target:g} steps={int(steps):5d} "
                  f"t={min(times):.3f}s", flush=True)
    return rows


def itergpr_section(n: int, dim: int = 3, tiny: bool = False) -> dict:
    """Exact-GP-at-scale measurement (IterGPR, round-3 late addition): one
    MLL value+grad step, the posterior alpha-solve, and mean-only serving
    throughput at an N far beyond the reference's 10k Cholesky cap.  All
    matrix-free — peak memory is one [block, N] panel, not [N, N]."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cggp_tpu.models import IterGPR
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.utils import cache

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # see bf16_variant_table
    cache.enable_persistent_cache(jax, "chipmeasure-")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-2, 2, (n, dim)), jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x).sum(-1, keepdims=True))
        + 0.1 * rng.standard_normal((n, 1)),
        jnp.float32,
    )
    model = IterGPR(
        kernel=Matern32(),
        error_threshold=1e-5, relative_threshold=True,
        max_cg_iterations=64 if tiny else 256,
        num_probes=8, logdet_variant="slq", slq_lanczos_iters=20,
        precondition="pivchol", precond_rank=32 if tiny else 256,
        block=256 if tiny else 4096,
    )
    params = model.init_params(dim, noise_variance=0.1, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    step = jax.jit(jax.value_and_grad(
        lambda p, k: model.training_loss(p, (x, y), key=k)
    ))

    def timed(fn, repeats=2):
        walls = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return min(walls)

    loss, grads = step(params, key)  # compile + warm
    float(loss)
    grad_norm = float(
        sum(float(jnp.sum(jnp.square(g)))
            for g in jax.tree_util.tree_leaves(grads))
    )
    step_wall = timed(lambda: float(step(params, key)[0]))

    build_post = jax.jit(model.posterior)
    post = build_post(params, (x, y))
    float(jnp.sum(post.alpha))
    alpha_wall = timed(
        lambda: float(jnp.sum(build_post(params, (x, y)).alpha))
    )

    serve_b = 1024 if tiny else 8192
    serve_points = 8 * serve_b
    mean_batch = jax.jit(
        lambda post, xb: jnp.sum(model.posterior_mean(post, xb))
    )
    float(mean_batch(post, x[:serve_b]))

    def serve():
        acc = 0.0
        for i in range(serve_points // serve_b):
            start = (i * serve_b) % (n - serve_b)
            acc = mean_batch(post, jax.lax.dynamic_slice_in_dim(x, start, serve_b))
        float(acc)

    serve_wall = timed(serve)

    # Variance serving, both ways: exact per-batch CG solve vs the LOVE-style
    # rank-k Lanczos cache (posterior(solver="lanczos")) — the matrix-free
    # family's solve-free variance path (docs/PERF.md "LOVE-style Lanczos
    # serving"; chip walls were the one pending item there).  Each path runs
    # at its own largest memory-feasible batch: the CG solve carries ~6
    # [batch, N] fp32 live buffers (state vectors + RHS + preconditioner
    # temporaries) ON TOP of the [block, N] kernel panel, so batch 8192 at
    # N=65536 is >13 GB and CRASHES the v5e-16GB worker (observed: the axon
    # worker dies outright instead of raising RESOURCE_EXHAUSTED); 1024 fits
    # with headroom.  The LOVE cache is two skinny matmuls — no CG state —
    # and serves the full 8192 batch: that asymmetry IS the result.
    def var_serve(post_v, batch):
        predict_batch = jax.jit(
            lambda post, xb: tuple(
                jnp.sum(o) for o in model.posterior_predict(post, xb)
            )
        )
        mu, var = predict_batch(post_v, x[:batch])
        float(mu), float(var)  # compile + warm

        def run():
            for i in range(serve_points // batch):
                start = (i * batch) % (n - batch)
                mu, var = predict_batch(
                    post_v, jax.lax.dynamic_slice_in_dim(x, start, batch)
                )
            float(mu), float(var)

        return timed(run)

    var_cg_b = min(serve_b, 1024)
    var_cg_wall = var_serve(post, var_cg_b)

    build_love = jax.jit(lambda p, d: model.posterior(p, d, solver="lanczos"))
    post_love = build_love(params, (x, y))
    float(jnp.sum(post_love.lanczos_r))
    love_build_wall = timed(
        lambda: float(jnp.sum(build_love(params, (x, y)).lanczos_r))
    )
    var_love_wall = var_serve(post_love, serve_b)

    return {
        "n": n, "dim": dim, "loss": float(loss),
        "grad_sq_norm": grad_norm,
        "mll_step_wall_s": round(step_wall, 3),
        "alpha_solve_wall_s": round(alpha_wall, 3),
        "serve_mean_points_per_sec": round(serve_points / serve_wall, 1),
        "serve_var_cg_points_per_sec": round(serve_points / var_cg_wall, 1),
        "serve_var_cg_batch": var_cg_b,
        "serve_var_love_points_per_sec": round(serve_points / var_love_wall, 1),
        "serve_var_love_batch": serve_b,
        "love_rank": int(model.serving_lanczos_rank),
        "love_cache_build_wall_s": round(love_build_wall, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke run (M=1024, skips bench.py)")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    if args.tiny:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    out = {"unix": int(time.time()), "tiny": args.tiny}
    path = os.path.join(REPO, "logs", "chip_measure.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)

    def checkpoint():
        # Incremental: a late failure must not discard earlier green sections.
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    if not args.tiny and not probe_backend():
        print("chip_measure: backend unresponsive (tunnel wedged?) — "
              "nothing measured; re-run after recovery", flush=True)
        sys.exit(2)

    if not args.tiny and not args.skip_bench:
        print("== bench.py ==", flush=True)
        out["bench"] = run_bench()
        print(json.dumps(out["bench"]), flush=True)
        checkpoint()

    # Each section failure-isolated: one OOM/wedge must not lose the rest.
    m = 1024 if args.tiny else 32768
    print(f"== bf16 variant table (M={m}) ==", flush=True)
    try:
        out["bf16_variants"] = bf16_variant_table(m, 16, (1e-4, 1e-6))
    except Exception as exc:  # noqa: BLE001 — record and continue
        out["bf16_variants"] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
        print(f"bf16 section failed: {exc}", flush=True)
    checkpoint()

    n_gp = 2048 if args.tiny else 65536
    print(f"== itergpr exact GP (N={n_gp}) ==", flush=True)
    try:
        out["itergpr"] = itergpr_section(n_gp, tiny=args.tiny)
        print(json.dumps(out["itergpr"]), flush=True)
    except Exception as exc:  # noqa: BLE001
        out["itergpr"] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
        print(f"itergpr section failed: {exc}", flush=True)
    checkpoint()

    # Round-3 late additions: covernet selection A/B + dense fused
    # re-clustering — child scripts with their own JSON lines.
    for name, script, flags in (
        ("covernet", "covernet_chip.py", ["--fine"]),
        ("dense_recluster", "dense_recluster_chip.py", []),
    ):
        if args.tiny:
            break
        print(f"== {name} ==", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", script), *flags],
                capture_output=True, text=True, timeout=1800,
                env=dict(os.environ),
            )
            rows = []
            for l in proc.stdout.splitlines():
                if l.startswith("{"):
                    try:
                        rows.append(json.loads(l))
                    except ValueError:
                        pass  # truncated/interleaved line; keep the good rows
            if proc.returncode != 0:
                # Partial rows are NOT a complete artifact — mark the crash
                # so a half-finished A/B can't masquerade as a full one.
                out[name] = {"error": f"rc={proc.returncode}: "
                                      f"{proc.stderr[-500:]}",
                             "partial_rows": rows}
            else:
                out[name] = rows or {"error": proc.stderr[-500:]}
            for r in rows:
                print(json.dumps(r), flush=True)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
            print(f"{name} section failed: {exc}", flush=True)
        checkpoint()
    print(f"wrote {path}", flush=True)

    # Markdown for docs/PERF.md
    if isinstance(out["bf16_variants"], list):
        print("\n| M | target | impl | steps | wall_s |")
        print("|---|---|---|---|---|")
        for r in out["bf16_variants"]:
            print(f"| {r['M']} | {r['target']:g} | {r['impl']} | "
                  f"{r['steps']} | {r['wall_s']} |")


if __name__ == "__main__":
    main()
