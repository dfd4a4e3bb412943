#!/usr/bin/env python
"""Dispatch-bounded exact-GP completion at N=262,144 on the real chip.

Round-4 follow-up to scripts/config5_chip.py section 2: at N=262k every
single-program leg (MLL, alpha solve, LOVE build) crosses the tunnel's
~60 s execution watchdog (docs/PERF.md round-4).  The chunked-dispatch
machinery already supplied alpha + mean serving; this script measures the
two legs that were still missing beyond the watchdog:

1. TRUE log-marginal-likelihood VALUE via host-chunked SLQ
   (`ops.logdet.slq_value_rows_chunked`, one bounded matvec per Lanczos
   step) — previously the chunked trainer reported the zero-logdet value
   convention only (reference models.py:21-48 keeps values conventional;
   we can now afford the real number at any N the matvec reaches).
2. LOVE variance serving cache via `IterGPR.posterior_chunked
   (solver="lanczos")` (host-chunked Lanczos build, rank 128) + the
   resulting mean+variance serving rate — previously variance serving at
   262k had no path at all (the one-program rank-128 build measures 74.8 s
   at HALF this N).

Writes one JSON object per section to logs/chunked_slq_chip.json and a
markdown table for docs/PERF.md.  CPU smoke: --tiny.
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

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import IterGPR
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.ops.logdet import slq_value_rows_chunked

    if tiny:
        N, BLOCK, RANK, ITERS, PROBES = 2048, 512, 16, 8, 4
    else:
        N = int(os.environ.get("ITERGPR_N", 262_144))
        BLOCK = int(os.environ.get("ITERGPR_BLOCK", 4096))
        RANK = int(os.environ.get("LOVE_RANK", 128))
        ITERS = int(os.environ.get("SLQ_ITERS", 25))
        PROBES = 8
    raw = int(N / 0.67) + 4
    train, _ = synthetic(n=raw, dim=3, seed=0)
    x = jnp.asarray(train[0][:N], jnp.float32)
    y = jnp.asarray(train[1][:N], jnp.float32)
    assert x.shape[0] == N

    # Serving-grade tolerance would re-measure the already-documented alpha
    # wall (64 chunks at 1e-5); 1e-3 bounds this script's alpha leg while the
    # serving RATE is alpha-independent.
    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-3, max_cg_iterations=8,
        num_probes=PROBES, precondition="pivchol", precond_rank=256,
        relative_threshold=True, block=BLOCK, serving_lanczos_rank=RANK,
        slq_lanczos_iters=ITERS,
    )
    params = model.init_params(input_dim=3, dtype=jnp.float32)
    kp = params["kernel"]
    x_pad, lam, mask, _y_rows = model._padded_system(params, x, y)
    matvec = jax.jit(model._matvec)

    # -- 1. true LML value: host-chunked SLQ ------------------------------
    rng = np.random.default_rng(0)
    probes = jnp.asarray(
        rng.choice([-1.0, 1.0], size=(PROBES, x_pad.shape[0])), jnp.float32)
    probes = probes * mask[None, :]

    def mv(rows):
        return matvec(kp, x_pad, lam, mask, rows)

    print(f"slq: starting chunked SLQ (N={N}, {ITERS} Lanczos steps, "
          f"{PROBES} probes)", flush=True)
    t0 = time.perf_counter()
    # first call pays the matvec+orth compiles; keep it in the wall and
    # report a warm per-step rate separately below.
    logdet_est = float(slq_value_rows_chunked(mv, probes, ITERS))
    slq_cold_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    logdet_est2 = float(slq_value_rows_chunked(mv, probes, ITERS))
    slq_warm_wall = time.perf_counter() - t0
    print(f"slq: logdet ~= {logdet_est:.1f} (repeat {logdet_est2:.1f}) "
          f"cold {slq_cold_wall:.1f}s warm {slq_warm_wall:.1f}s", flush=True)
    if not np.isfinite(logdet_est):
        raise RuntimeError("non-finite SLQ logdet")

    # -- 2. chunked LOVE posterior + serving ------------------------------
    print("love: building posterior_chunked (alpha @1e-3 + rank-"
          f"{RANK} chunked Lanczos)", flush=True)
    t0 = time.perf_counter()
    post = model.posterior_chunked(params, (x, y), solver="lanczos",
                                   chunk_iterations=8, max_chunks=12)
    float(jnp.sum(post.alpha) + jnp.sum(post.lanczos_r))  # sync (tunnel rule)
    build_wall = time.perf_counter() - t0
    print(f"love: posterior built in {build_wall:.1f}s", flush=True)

    SERVE_BATCH = min(8192, N)
    xq = x[:SERVE_BATCH]

    @jax.jit
    def love_batch(post, xb):
        mu, var = model.posterior_predict(post, xb)
        return jnp.sum(mu) + jnp.sum(var)

    float(love_batch(post, xq))  # compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(love_batch(post, xq))
        walls.append(time.perf_counter() - t0)
    rate = SERVE_BATCH / min(walls)
    print(f"love: variance serving {rate:,.1f} points/s", flush=True)

    return {
        "section": "chunked_slq_262k",
        "n": N, "block": BLOCK, "dtype": "float32",
        "precondition": "pivchol-256",
        "slq_probes": PROBES, "slq_lanczos_iters": ITERS,
        "slq_logdet_estimate": round(logdet_est, 1),
        "slq_logdet_repeat": round(logdet_est2, 1),
        "slq_cold_wall_s": round(slq_cold_wall, 1),
        "slq_warm_wall_s": round(slq_warm_wall, 1),
        "love_rank": RANK,
        "posterior_chunked_build_wall_s": round(build_wall, 1),
        "love_variance_serving_points_per_sec": round(rate, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    args = ap.parse_args()
    out = run(args.tiny)
    os.makedirs(os.path.join(REPO, "logs"), exist_ok=True)
    path = os.path.join(REPO, "logs", "chunked_slq_chip.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
