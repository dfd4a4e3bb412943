#!/usr/bin/env python
"""Residual-replacement chunked CG at N=262,144 on the real chip.

Measures the two figures the carried-direction chunks improve over the
round-4 restart numbers (docs/PERF.md):
- serving-grade alpha solve (1e-5 relative): restart took 64 chunks and
  stalled at 1.16e-4;
- exact-GP training step (MLL value+grad, 1e-4 relative): restart took
  25 chunks / 390 s.

CPU smoke: --tiny.
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

    if tiny:
        N, BLOCK, CHUNK = 2048, 512, 8
    else:
        N = int(os.environ.get("ITERGPR_N", 262_144))
        BLOCK = int(os.environ.get("ITERGPR_BLOCK", 4096))
        CHUNK = int(os.environ.get("ITERGPR_CHUNK", 8))
    raw = int(N / 0.67) + 4
    train, _ = synthetic(n=raw, dim=3, seed=0)
    x = jnp.asarray(train[0][:N], jnp.float32)
    y = jnp.asarray(train[1][:N], jnp.float32)

    # Section names carry the REAL N (VERDICT r4 weak-1): "rr_chunk_262k"
    # only at the default N, "rr_chunk_<N>" for env-overridden scales.
    section = ("rr_chunk_tiny_smoke" if tiny else
               ("rr_chunk_262k" if N == 262_144 else f"rr_chunk_{N}"))
    out = {"section": section, "smoke": bool(tiny), "n": N, "block": BLOCK,
           "chunk_iters": CHUNK, "dtype": "float32",
           "precondition": "pivchol-256"}

    # -- serving-grade alpha (1e-5 relative; restart baseline: 64 chunks,
    #    stalled at 1.16e-4) ------------------------------------------------
    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-5, max_cg_iterations=CHUNK,
        num_probes=8, precondition="pivchol", precond_rank=256,
        relative_threshold=True, block=BLOCK)
    params = model.init_params(input_dim=3, dtype=jnp.float32)
    kp = params["kernel"]
    x_pad, lam, mask, y_rows = model._padded_system(params, x, y)
    solve_chunk, matvec, precond_fn, _ = _chunked_mll_parts(model, CHUNK)
    state = precond_fn(kp, x_pad, lam, mask)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), state)  # sync

    print(f"alpha: starting RR-chunked solve (N={N}, 1e-5 rel, "
          f"{CHUNK} iters/chunk)", flush=True)
    t0 = time.perf_counter()
    v, err, converged, chunks = _chunked_restart_solve(
        model, kp, x_pad, lam, mask, y_rows, state, solve_chunk, matvec,
        max_chunks=64)
    float(jnp.sum(v))
    wall = time.perf_counter() - t0
    b_norm2 = 0.5 * jnp.sum(jnp.square(y_rows), axis=-1)
    # Two views of the same residual: the model's stop rule compares CG
    # ENERGY (0.5||r||^2 <= threshold * 0.5||b||^2 — reference
    # conjugate_gradient.py:59-62 semantics), so "1e-5 converged" means
    # energy ratio <= 1e-5, i.e. ||r||/||b|| <= sqrt(1e-5) ~ 3.2e-3.
    # Round 4's restart baseline reported the ENERGY ratio (1.16e-4
    # plateau); record both so the comparison stays unambiguous.
    energy = float(jnp.max(err / jnp.maximum(b_norm2, 1e-30)))
    rel = energy ** 0.5
    print(f"alpha: {chunks} chunks, converged={converged}, energy ratio "
          f"{energy:.2e} (L2 rel {rel:.2e}), wall {wall:.1f}s", flush=True)
    out.update(alpha_chunks=chunks, alpha_converged=bool(converged),
               alpha_energy_ratio=energy, alpha_rel_residual=rel,
               alpha_wall_s=round(wall, 1))

    # -- training step (1e-4 relative; restart baseline: 25 chunks, 390 s) -
    model_t = IterGPR(
        kernel=Matern32(), error_threshold=1e-4, max_cg_iterations=CHUNK,
        num_probes=8, precondition="pivchol", precond_rank=256,
        relative_threshold=True, block=BLOCK, logdet_variant="zero")
    params_t = model_t.init_params(input_dim=3, dtype=jnp.float32)
    print("train: starting RR-chunked MLL value+grad (1e-4 rel)", flush=True)
    t0 = time.perf_counter()
    val, grads, info = model_t.log_marginal_likelihood_chunked(
        params_t, (x, y), key=jax.random.PRNGKey(0),
        chunk_iterations=CHUNK, max_chunks=64)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), grads)
    wall_t = time.perf_counter() - t0
    finite = bool(np.isfinite(float(val))) and all(
        bool(jnp.all(jnp.isfinite(g)))
        for g in jax.tree_util.tree_leaves(grads))
    print(f"train: {info['chunks']} chunks, converged={info['converged']}, "
          f"finite={finite}, wall {wall_t:.1f}s", flush=True)
    out.update(train_chunks=info["chunks"],
               train_converged=bool(info["converged"]),
               train_grads_finite=finite, train_step_wall_s=round(wall_t, 1))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    out = run(args.tiny)
    name = ("rr_chunk_chip.json" if out["n"] == 262_144 or args.tiny
            else f"rr_chunk_{out['n']}_chip.json")
    os.makedirs(os.path.join(REPO, "logs"), exist_ok=True)
    with open(os.path.join(REPO, "logs", name), "w") as fh:
        json.dump(out, fh, indent=1)
    if not args.tiny:
        # logs/ is gitignored; real-chip measurements also land in
        # benchmarks/ (the committed artifact home — chunked_slq_chip.json
        # precedent).  Smokes stay out of the committed dir by design.
        with open(os.path.join(REPO, "benchmarks", name), "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
