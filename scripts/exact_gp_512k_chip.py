#!/usr/bin/env python
"""Exact GP at N=524,288 on one chip — 2x the demonstrated envelope.

Every leg dispatch-bounded (docs/PERF.md round-4 watchdog rule: ~60 s per
program; one matvec at this N measures ~15 s, so chunks run 2 CG
iterations per dispatch):

1. alpha solve via residual-replacement chunks (1e-3 relative),
2. TRUE log-det value via host-chunked SLQ,
3. mean serving rate (bounded [2048, N] batches).

Artifact: logs/exact_gp_512k_chip.json.  CPU smoke: --tiny.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(tiny: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cggp_tpu.utils.cache import enable_bench_cache

    enable_bench_cache(jax)

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import IterGPR
    from cggp_tpu.models.itergpr import (
        _chunked_mll_parts,
        _chunked_restart_solve,
    )
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.logdet import slq_value_rows_chunked

    if tiny:
        N, BLOCK, CHUNK, SLQ_ITERS, SERVE, MAX_CHUNKS = (
            2048, 512, 8, 8, 512, 48)
    else:
        N = int(os.environ.get("ITERGPR_N", 524_288))
        BLOCK = int(os.environ.get("ITERGPR_BLOCK", 2048))
        # 4 iters/chunk ~ 25 s/dispatch at this N (6 s/iteration measured)
        # — inside the ~60 s watchdog; the first full run at CHUNK=2 spent
        # 96 iterations and stopped at energy 1.48e-3 vs the 1e-3 target,
        # so the budget is sized for ~200+ iterations.
        CHUNK = int(os.environ.get("ITERGPR_CHUNK", 4))
        MAX_CHUNKS = int(os.environ.get("ITERGPR_MAX_CHUNKS", 64))
        SLQ_ITERS = int(os.environ.get("SLQ_ITERS", 20))
        SERVE = 2048
    raw = int(N / 0.67) + 4
    train, _ = synthetic(n=raw, dim=3, seed=0)
    x = jnp.asarray(train[0][:N], jnp.float32)
    y = jnp.asarray(train[1][:N], jnp.float32)
    assert x.shape[0] == N

    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-3, max_cg_iterations=CHUNK,
        num_probes=4, precondition="pivchol", precond_rank=256,
        relative_threshold=True, block=BLOCK)
    params = model.init_params(input_dim=3, dtype=jnp.float32)
    kp = params["kernel"]
    x_pad, lam, mask, y_rows = model._padded_system(params, x, y)
    solve_chunk, matvec, precond_fn, _ = _chunked_mll_parts(model, CHUNK)

    print(f"512k: building pivchol-256 state (N={N}, block={BLOCK})",
          flush=True)
    t0 = time.perf_counter()
    state = precond_fn(kp, x_pad, lam, mask)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), state)
    precond_wall = time.perf_counter() - t0
    print(f"512k: preconditioner in {precond_wall:.1f}s", flush=True)

    print(f"512k: RR-chunked alpha solve (1e-3 rel, {CHUNK} iters/chunk)",
          flush=True)
    t0 = time.perf_counter()
    v, err, converged, chunks = _chunked_restart_solve(
        model, kp, x_pad, lam, mask, y_rows, state, solve_chunk, matvec,
        max_chunks=MAX_CHUNKS)
    float(jnp.sum(v))
    alpha_wall = time.perf_counter() - t0
    b_norm2 = 0.5 * jnp.sum(jnp.square(y_rows), axis=-1)
    # Stop rule is on CG ENERGY (0.5||r||^2 vs threshold * 0.5||b||^2);
    # record both the energy ratio and its sqrt (L2 relative residual) —
    # see rr_chunk_chip.py for the metric note.
    energy = float(jnp.max(err / jnp.maximum(b_norm2, 1e-30)))
    rel = energy ** 0.5
    print(f"512k: alpha {chunks} chunks, converged={converged}, energy "
          f"{energy:.2e} (L2 rel {rel:.2e}), wall {alpha_wall:.1f}s",
          flush=True)

    rng = np.random.default_rng(0)
    probes = jnp.asarray(
        rng.choice([-1.0, 1.0], size=(4, x_pad.shape[0])), jnp.float32)
    probes = probes * mask[None, :]
    print(f"512k: chunked SLQ value ({SLQ_ITERS} Lanczos steps)", flush=True)
    t0 = time.perf_counter()
    logdet = float(slq_value_rows_chunked(
        lambda rows: matvec(kp, x_pad, lam, mask, rows), probes, SLQ_ITERS))
    slq_wall = time.perf_counter() - t0
    print(f"512k: logdet ~= {logdet:.1f}, wall {slq_wall:.1f}s", flush=True)

    xq = x[:SERVE]

    @jax.jit
    def mean_batch(alpha, xb):
        kmn = model.kernel.K(kp, xb, x_pad) * mask[None, :]
        return jnp.sum(kmn @ alpha.T)

    float(mean_batch(v, xq))  # compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(mean_batch(v, xq))
        walls.append(time.perf_counter() - t0)
    rate = SERVE / min(walls)
    print(f"512k: mean serving {rate:,.1f} points/s", flush=True)

    return {
        # Section names carry the REAL N (VERDICT r4 weak-1: no artifact may
        # claim a scale it doesn't contain) — "exact_gp_512k" only at the
        # default N, "exact_gp_<N>" for env-overridden scales.
        "section": ("exact_gp_tiny_smoke" if tiny else
                    ("exact_gp_512k" if N == 524_288 else f"exact_gp_{N}")),
        "smoke": bool(tiny), "n": N, "block": BLOCK,
        "chunk_iters": CHUNK, "dtype": "float32",
        "precondition": "pivchol-256",
        "precond_build_wall_s": round(precond_wall, 1),
        "alpha_chunks": chunks, "alpha_converged": bool(converged),
        "alpha_energy_ratio": energy, "alpha_rel_residual": rel,
        "alpha_wall_s": round(alpha_wall, 1),
        "slq_iters": SLQ_ITERS, "slq_logdet": round(logdet, 1),
        "slq_wall_s": round(slq_wall, 1),
        "mean_serving_points_per_sec": round(rate, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    out = run(args.tiny)
    name = ("exact_gp_512k_chip.json" if out["n"] == 524_288 or args.tiny
            else f"exact_gp_{out['n']}_chip.json")
    os.makedirs(os.path.join(REPO, "logs"), exist_ok=True)
    with open(os.path.join(REPO, "logs", name), "w") as fh:
        json.dump(out, fh, indent=1)
    if not args.tiny:
        # logs/ is gitignored; real-chip measurements also land in
        # benchmarks/ (the committed artifact home).
        with open(os.path.join(REPO, "benchmarks", name), "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
