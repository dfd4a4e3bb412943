#!/usr/bin/env python
"""BASELINE config-5 scale demonstration on the real chip (round-4 verdict
items 2 and 7).

Section 1 — config 5, single-chip leg: CDGP at N_train ~= 1M synthetic 3-D,
M=8192 inducing, fp32, chol-preconditioned fused training (the same
production configuration bench.py measures at m=989) and cached-chol
serving over the full 1M-point set.  The 8-chip sharded leg of config 5 is
covered by the psum-blocked mesh machinery
(tests/test_parallel.py::test_sharded_cg_config5_shape_m8192 pins the real
M=8192 shape; __graft_entry__.dryrun_multichip executes the sharded train
step); this script supplies the missing SCALE artifact on one chip.

Section 2 — IterGPR (exact GP, matrix-free) at N=262,144: extends the
N=65,536 chip table (docs/PERF.md round-3 itergpr section) by 4x — MLL
value+grad wall, posterior alpha solve, LOVE cache build, and mean/LOVE
variance serving rates.

Writes one JSON object per section to logs/config5_chip.json and prints a
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


def section_config5(tiny: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.update import labels_update_inducing_parameters
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import (
        make_adam_multi_step,
        posterior_predict_scan,
    )

    if tiny:
        N_RAW, M, BATCH, K = 3000, 64, 256, 3
    else:
        # synthetic() returns the 0.67 train split: 1.5M raw -> ~1.005M train.
        # K and the preconditioner are overridable: the first attempt
        # (K=25, chol) crashed the REMOTE COMPILER (tpu_compile_helper exit
        # 1 — the same compiler fragility the M=16384 serving probe hit).
        N_RAW, M, BATCH = 1_500_000, 8192, 2048
        K = int(os.environ.get("CONFIG5_K", 10))
    precondition = os.environ.get("CONFIG5_PRECOND", "chol")
    extra_steps = int(os.environ.get("CONFIG5_EXTRA_STEPS", "0"))
    train, test = synthetic(n=N_RAW, dim=3, seed=0)
    x = jnp.asarray(train[0], jnp.float32)
    y = jnp.asarray(train[1], jnp.float32)
    n_train = int(x.shape[0])

    # M=8192 centers: random subset + device Voronoi counts (config 5 fixes
    # M, not the selection strategy; the covertree/covernet path is the
    # bench e2e's identity).  Counts make Lambda = sigma^2/counts realistic.
    rng = np.random.RandomState(0)
    centers = x[jnp.asarray(rng.choice(n_train, M, replace=False))]
    print(f"config5: selection (N={n_train}, M={M})", flush=True)
    sel_cache = os.path.join(REPO, "logs", f"config5_sel_{n_train}_{M}.npz")
    t0 = time.perf_counter()
    if os.path.exists(sel_cache):
        with np.load(sel_cache) as d:
            iv, u, counts = (jnp.asarray(d["iv"]), jnp.asarray(d["u"]),
                             jnp.asarray(d["counts"]))
    else:
        iv, u, counts = labels_update_inducing_parameters((x, y), centers)
        float(jnp.sum(u))
        os.makedirs(os.path.dirname(sel_cache), exist_ok=True)
        np.savez(sel_cache, iv=np.asarray(iv), u=np.asarray(u),
                 counts=np.asarray(counts))
    selection_wall = time.perf_counter() - t0
    print(f"config5: selection ok in {selection_wall:.1f}s", flush=True)

    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(
            1e-5, max_iterations=min(M, 512), relative_threshold=True,
            matvec_impl="xla_high",
        ),
        num_data=n_train, num_probes=5,
        precondition=precondition,
        precond_rank=256,
    )
    params = model.init_params(iv, pseudo_u=u, cluster_counts=counts,
                               dtype=jnp.float32)

    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    scanfree = os.environ.get("CONFIG5_SCANFREE") == "1"
    if scanfree:
        # Fallback when the flaky remote compile helper cannot handle the
        # K-step scanned program: the reference-style one-step-per-dispatch
        # driver (the [2059, 8192] fused solve compiles reliably outside
        # the scan — measured 35 s compile / 0.22 s warm step).
        from cggp_tpu.training.optimize import _mask_grads

        mask = model.trainable_mask(params)

        @jax.jit
        def one_step(params, opt_state, batch, key):
            loss, grads = jax.value_and_grad(
                lambda p, b, k: model.training_loss(p, b, k)
            )(params, batch, key)
            grads = _mask_grads(grads, mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def multi_step(params, opt_state, idx_chunk, key):
            losses = []
            for i in range(idx_chunk.shape[0]):
                key = jax.random.fold_in(key, i)
                batch = (jnp.take(x, idx_chunk[i], axis=0),
                         jnp.take(y, idx_chunk[i], axis=0))
                params, opt_state, loss = one_step(params, opt_state,
                                                   batch, key)
            return params, opt_state, [loss]
    else:
        multi_step = make_adam_multi_step(
            lambda p, b, k: model.training_loss(p, b, k), optimizer, (x, y),
            trainable_mask=model.trainable_mask(params),
        )
    chunks = minibatch_index_iterator(jax.random.PRNGKey(1), n_train, BATCH, K)
    key = jax.random.PRNGKey(2)

    print(f"config5: compiling {K}-step training chunk (M={M})", flush=True)
    t0 = time.perf_counter()
    # The remote compile helper is flaky under load for this ~80 MB
    # executable (tpu_compile_helper exit 1 on ~half the attempts; the same
    # program compiles fine on a quieter attempt and then persists in the
    # committed cache).  Retry a few times before giving up.
    for attempt in range(4):
        try:
            params, opt_state, losses = multi_step(
                params, opt_state, next(chunks), key)
            float(losses[-1])
            break
        except Exception as exc:  # noqa: BLE001
            print(f"config5: compile attempt {attempt + 1} failed: "
                  f"{repr(exc)[:160]}", flush=True)
            if "remote_compile" not in repr(exc) or attempt == 3:
                raise
            print("config5: flaky helper; retrying in 30s", flush=True)
            time.sleep(30)
    compile_plus_first = time.perf_counter() - t0

    n_windows, chunks_per_window = (2, 2) if tiny else (3, 2)
    walls = []
    step_i = 0
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(chunks_per_window):
            key = jax.random.fold_in(key, step_i)
            step_i += 1
            params, opt_state, losses = multi_step(
                params, opt_state, next(chunks), key)
        final_loss = float(losses[-1])
        walls.append(time.perf_counter() - t0)
    steps_per_sec = chunks_per_window * K / min(walls)
    if not np.isfinite(final_loss):
        raise RuntimeError(f"non-finite loss: {final_loss}")
    steps_run = (1 + n_windows * chunks_per_window) * K
    # Optional longer soak for the quality claim (CONFIG5_EXTRA_STEPS).
    for _ in range(extra_steps // K):
        key = jax.random.fold_in(key, step_i)
        step_i += 1
        params, opt_state, losses = multi_step(params, opt_state,
                                               next(chunks), key)
        steps_run += K
    final_loss = float(losses[-1])
    print(f"config5: {steps_run} total steps, loss {final_loss:.1f}",
          flush=True)

    # Serving: one-time chol cache, then mean+var over the full ~1M-point
    # training set.  At M=8192 the full-set variance sweep CANNOT be one
    # device program: each 8192-point batch pays two [8192, 8192] x T
    # triangular solves, and this tunnel kills any single program past
    # ~60 s (watchdog, measured: 49.6 s ok / ~72 s worker crash — see
    # docs/PERF.md round-4).  Mean+var therefore runs as a host dispatch
    # LOOP (one batch per program); the solve-free mean-only sweep stays a
    # single lax.map dispatch.
    # LOOP_BATCH = 8192: the [8192, 8192] x [8192, 65536] triangular-solve
    # program deterministically crashes the remote compile helper (the same
    # big-triangular fragility as the M=16384 serving probe); 8192-wide RHS
    # compiles.
    SERVE_BATCH = min(8192, n_train)
    LOOP_BATCH = min(8192, n_train)
    build_post = jax.jit(model.posterior, static_argnames="solver")
    print(f"config5: trained ok ({steps_per_sec:.2f} steps/s); "
          "compiling serving", flush=True)

    @jax.jit
    def serve_scan_mean(post, xq):
        mu, _ = posterior_predict_scan(model, post, xq, SERVE_BATCH,
                                       mean_only=True)
        return jnp.sum(mu)

    @jax.jit
    def predict_batch(post, xb):
        mu, var = model.posterior_predict(post, xb, full_cov=False)
        return jnp.sum(mu) + jnp.sum(var)

    serve_points = (n_train // LOOP_BATCH) * LOOP_BATCH
    xq = x[:serve_points]
    post = build_post(params, solver="chol")
    float(serve_scan_mean(post, xq))  # compile
    print("config5: mean-only scan compiled", flush=True)
    float(predict_batch(post, x[:LOOP_BATCH]))
    print("config5: predict_batch compiled", flush=True)

    def timed(fn, repeats=2):
        ws = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            post = build_post(params, solver="chol")
            float(fn(post))
            ws.append(time.perf_counter() - t0)
        return min(ws)

    def loop(post):
        acc = 0.0
        for i in range(serve_points // LOOP_BATCH):
            acc = predict_batch(post, x[i * LOOP_BATCH:(i + 1) * LOOP_BATCH])
        return acc

    serve_wall = timed(loop)
    mean_wall = timed(lambda p: serve_scan_mean(p, xq))

    # LOVE serving leg: rank-k Lanczos variance cache — per-batch variance
    # is two skinny matmuls (NO triangular solves), so the full 1M-point
    # mean+var sweep fits ONE lax.map dispatch even at M=8192 (the chol
    # loop above is triangular-solve bound AND compile-fragile at wide
    # RHS).  Variances are conservative over-estimates converging with the
    # rank (docs/PERF.md LOVE sections); never picked by "auto".
    love_extra = {}
    try:
        t0 = time.perf_counter()
        post_love = build_post(params, solver="lanczos")
        float(jnp.sum(post_love.lanczos_r))
        love_build = time.perf_counter() - t0

        @jax.jit
        def serve_scan_love(post, xq):
            mu, var = posterior_predict_scan(model, post, xq, SERVE_BATCH)
            return jnp.sum(mu) + jnp.sum(var)

        xq_scan = x[: (n_train // SERVE_BATCH) * SERVE_BATCH]
        float(serve_scan_love(post_love, xq_scan))  # compile
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            float(serve_scan_love(post_love, xq_scan))
            walls.append(time.perf_counter() - t0)
        love_extra = {
            "love_build_wall_s": round(love_build, 2),
            "love_rank": int(model.serving_lanczos_rank),
            "serving_love_scan_points_per_sec": round(
                xq_scan.shape[0] / min(walls), 1),
        }
        print(f"config5: LOVE scan {love_extra}", flush=True)
    except Exception as exc:  # noqa: BLE001 — side metric, never fatal
        love_extra = {"love_error": repr(exc)[:200]}

    # Quality at scale: held-out RMSE/NLPD from the trained posterior
    # (synthetic noise sigma=0.1 bounds the achievable RMSE from below).
    xt = jnp.asarray(test[0], jnp.float32)
    yt = np.asarray(test[1], np.float32)
    post = build_post(params, solver="chol")
    eval_batch = min(LOOP_BATCH, int(xt.shape[0]))
    mus, varis = [], []
    for i in range(0, (xt.shape[0] // eval_batch) * eval_batch, eval_batch):
        mu, var = jax.jit(model.posterior_predict)(post, xt[i:i + eval_batch])
        mus.append(np.asarray(mu)); varis.append(np.asarray(var))
    mu = np.concatenate(mus); var = np.concatenate(varis)
    yt = yt[: mu.shape[0]]
    noise = float(model.likelihood.variance(params["likelihood"]))
    rmse = float(np.sqrt(np.mean((mu - yt) ** 2)))
    tot = var + noise
    nlpd = float(np.mean(0.5 * (np.log(2 * np.pi * tot)
                                + (yt - mu) ** 2 / tot)))

    return {
        "test_rmse": round(rmse, 5),
        "test_nlpd": round(nlpd, 5),
        "steps_run": steps_run,
        "section": "config5_single_chip",
        "n_train": n_train, "m": M, "batch": BATCH, "steps_per_call": K,
        "train_mode": "per_step_dispatch" if scanfree else f"scan_{K}",
        "dtype": "float32", "precondition": precondition,
        "matvec_impl": "xla_high", "cg_threshold": "1e-5 relative",
        "selection": "random-subset + device Voronoi counts",
        "selection_wall_s": round(selection_wall, 3),
        "compile_plus_first_chunk_s": round(compile_plus_first, 1),
        "train_steps_per_sec": round(steps_per_sec, 2),
        "final_loss": round(final_loss, 2),
        "serve_points": serve_points,
        "serve_mode": f"dispatch_loop_{LOOP_BATCH} (watchdog-safe); "
                      "mean_only: one-dispatch scan",
        "serving_points_per_sec": round(serve_points / serve_wall, 1),
        "serving_mean_only_points_per_sec": round(serve_points / mean_wall, 1),
        "serve_wall_s": round(serve_wall, 3),
        **love_extra,
    }


def section_itergpr_262k(tiny: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import IterGPR
    from cggp_tpu.ops.kernels import Matern32

    if tiny:
        N, BLOCK, RANK = 2048, 512, 16
    else:
        # Overridable for HBM bisection: the [BLOCK, N] panel plus XLA
        # transients crashed the worker at 262k/4096 on first attempt.
        N = int(os.environ.get("ITERGPR_N", 262_144))
        BLOCK = int(os.environ.get("ITERGPR_BLOCK", 2048))
        RANK = 128
    raw = int(N / 0.67) + 4
    train, _ = synthetic(n=raw, dim=3, seed=0)
    x = jnp.asarray(train[0][:N], jnp.float32)
    y = jnp.asarray(train[1][:N], jnp.float32)
    assert x.shape[0] == N

    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-5, max_cg_iterations=512,
        num_probes=8, precondition="pivchol", precond_rank=256,
        relative_threshold=True, block=BLOCK, serving_lanczos_rank=RANK,
    )
    params = model.init_params(input_dim=3, dtype=jnp.float32)

    mll_grad = jax.jit(jax.value_and_grad(
        lambda p, k: model.log_marginal_likelihood(p, (x, y), k)))
    key = jax.random.PRNGKey(0)
    print(f"itergpr: starting MLL compile (N={N}, block={BLOCK})", flush=True)
    t0 = time.perf_counter()
    val, grads = mll_grad(params, key)
    float(val)
    compile_plus_first = time.perf_counter() - t0
    print(f"itergpr: MLL ok in {compile_plus_first:.1f}s", flush=True)
    walls = []
    for i in range(2):
        t0 = time.perf_counter()
        val, grads = mll_grad(params, jax.random.fold_in(key, i))
        float(val)
        walls.append(time.perf_counter() - t0)
    mll_wall = min(walls)
    if not np.isfinite(float(val)):
        raise RuntimeError(f"non-finite MLL: {val}")

    build_cg = jax.jit(model.posterior, static_argnames="solver")
    t0 = time.perf_counter()
    post = build_cg(params, (x, y), solver="cg")
    float(jnp.sum(post.alpha))
    alpha_wall = time.perf_counter() - t0
    print(f"itergpr: alpha solve ok in {alpha_wall:.1f}s", flush=True)

    t0 = time.perf_counter()
    post_love = build_cg(params, (x, y), solver="lanczos")
    float(jnp.sum(post_love.lanczos_r))
    love_build_wall = time.perf_counter() - t0
    print(f"itergpr: LOVE build ok in {love_build_wall:.1f}s", flush=True)

    SERVE_BATCH = min(8192, N)
    xq = x[:SERVE_BATCH]

    @jax.jit
    def mean_batch(post, xb):
        return jnp.sum(model.posterior_mean(post, xb))

    @jax.jit
    def love_batch(post, xb):
        mu, var = model.posterior_predict(post, xb)
        return jnp.sum(mu) + jnp.sum(var)

    float(mean_batch(post, xq))
    float(love_batch(post_love, xq))

    def rate(fn, post):
        ws = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(post, xq))
            ws.append(time.perf_counter() - t0)
        return SERVE_BATCH / min(ws)

    return {
        "section": "itergpr_262k",
        "n": N, "block": BLOCK, "dtype": "float32",
        "precondition": "pivchol-256", "cg_threshold": "1e-5 relative",
        "love_rank": RANK,
        "compile_plus_first_mll_s": round(compile_plus_first, 1),
        "mll_value_grad_wall_s": round(mll_wall, 2),
        "mll_value": round(float(val), 1),
        "alpha_solve_wall_s": round(alpha_wall, 2),
        "love_build_wall_s": round(love_build_wall, 2),
        "mean_serving_points_per_sec": round(rate(mean_batch, post), 1),
        "love_variance_serving_points_per_sec": round(
            rate(love_batch, post_love), 1),
    }


def section_itergpr_chunked(tiny: bool) -> dict:
    """Exact-GP serving at N=262,144 under the tunnel's ~60 s per-program
    watchdog (measured, docs/PERF.md round-4): the alpha solve runs as a
    host loop of bounded-iteration CG dispatches — restarted CG, each chunk
    re-anchored on the TRUE residual, so the result converges to the same
    tolerance as the single-program solve (each dispatch ~8 iterations
    ~10 s).  Mean serving is per-batch dispatches (one matvec-scale
    program each)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import IterGPR
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

    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-5, max_cg_iterations=CHUNK,
        num_probes=8, precondition="pivchol", precond_rank=256,
        relative_threshold=True, block=BLOCK,
    )
    params = model.init_params(input_dim=3, dtype=jnp.float32)
    kp = params["kernel"]
    x_pad, lam, mask, y_rows = model._padded_system(params, x, y)

    solve = jax.jit(model._solve)
    matvec = jax.jit(model._matvec)
    st = jax.jit(model._precond_state)(kp, x_pad, lam, mask)
    jax.block_until_ready(st)
    target = 1e-5 * float(jnp.linalg.norm(y_rows))

    t0 = time.perf_counter()
    v = jnp.zeros_like(y_rows)
    chunks = 0
    while True:
        r = y_rows - matvec(kp, x_pad, lam, mask, v)
        res = float(jnp.linalg.norm(r))  # host fetch = sync per dispatch
        if res <= target or chunks >= 64:
            break
        dv, _stats = solve(kp, x_pad, lam, r, st, mask)
        v = v + dv
        chunks += 1
        print(f"itergpr-chunked: chunk {chunks} residual {res:.3e} "
              f"(target {target:.3e})", flush=True)
    alpha_wall = time.perf_counter() - t0
    converged = res <= target

    # Mean serving from the solved alpha: per-batch dispatches.
    SERVE_BATCH = min(8192, N)

    @jax.jit
    def mean_batch(alpha, xb):
        kmn = model.kernel.K(kp, xb, x_pad) * mask[None, :]
        return jnp.sum(kmn @ alpha.T)

    xq = x[:SERVE_BATCH]
    float(mean_batch(v, xq))  # compile
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(mean_batch(v, xq))
        walls.append(time.perf_counter() - t0)

    return {
        "section": "itergpr_chunked",
        "n": N, "block": BLOCK, "chunk_iters": CHUNK,
        "dtype": "float32", "precondition": "pivchol-256",
        "alpha_solve_wall_s": round(alpha_wall, 2),
        "alpha_chunks": chunks,
        "alpha_converged": bool(converged),
        "alpha_rel_residual": res / max(target / 1e-5, 1e-30),
        "mean_serving_points_per_sec": round(SERVE_BATCH / min(walls), 1),
    }


def section_itergpr_mll_chunked(tiny: bool) -> dict:
    """Exact-GP TRAINING step beyond the watchdog: one
    ``log_marginal_likelihood_chunked`` value+grad at N=262,144 — every
    dispatch bounded (~8 CG iterations or one matvec).  Tolerance 1e-4
    relative on 0.5||r||^2 (~1e-2 residual norm): optimizer-grade gradients
    (CG gradient error ~ residual), not serving-grade solves."""
    import jax
    import jax.numpy as jnp

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import IterGPR
    from cggp_tpu.ops.kernels import Matern32

    if tiny:
        N, BLOCK, CHUNK = 2048, 512, 8
    else:
        N = int(os.environ.get("ITERGPR_N", 262_144))
        BLOCK = int(os.environ.get("ITERGPR_BLOCK", 4096))
        CHUNK = int(os.environ.get("ITERGPR_CHUNK", 8))
    thresh = float(os.environ.get("ITERGPR_MLL_THRESHOLD", "1e-4"))
    raw = int(N / 0.67) + 4
    train, _ = synthetic(n=raw, dim=3, seed=0)
    x = jnp.asarray(train[0][:N], jnp.float32)
    y = jnp.asarray(train[1][:N], jnp.float32)

    model = IterGPR(
        kernel=Matern32(), error_threshold=thresh, max_cg_iterations=CHUNK,
        num_probes=8, precondition="pivchol", precond_rank=256,
        relative_threshold=True, block=BLOCK, logdet_variant="zero",
    )
    params = model.init_params(input_dim=3, dtype=jnp.float32)

    t0 = time.perf_counter()
    value, grads, info = model.log_marginal_likelihood_chunked(
        params, (x, y), key=jax.random.PRNGKey(0),
        chunk_iterations=CHUNK, max_chunks=64,
    )
    wall = time.perf_counter() - t0
    flat = jax.tree_util.tree_leaves(grads)
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in flat)))
    return {
        "section": "itergpr_mll_chunked",
        "n": N, "block": BLOCK, "chunk_iters": CHUNK,
        "threshold": f"{thresh} relative", "dtype": "float32",
        "mll_value": round(float(value), 1),
        "mll_wall_s": round(wall, 1),
        "solve_chunks": info["chunks"],
        "converged": info["converged"],
        "rel_residual": round(info["rel_residual"], 6),
        "grad_norm": round(gnorm, 4),
        "grad_finite": bool(jnp.isfinite(gnorm)),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="CPU smoke run (structure check)")
    parser.add_argument("--section",
                        choices=["config5", "itergpr", "itergpr-chunked",
                 "itergpr-mll-chunked"],
                        default=None, help="run one section only")
    args = parser.parse_args()

    import jax

    from cggp_tpu.utils import cache

    cache.enable_bench_cache(jax)
    print(f"devices: {jax.devices()}", flush=True)

    results = []
    sections = {
        "config5": section_config5,
        "itergpr": section_itergpr_262k,
        "itergpr-chunked": section_itergpr_chunked,
        "itergpr-mll-chunked": section_itergpr_mll_chunked,
    }
    for name, fn in sections.items():
        if args.section and name != args.section:
            continue
        try:
            t0 = time.perf_counter()
            out = fn(args.tiny)
            out["section_wall_s"] = round(time.perf_counter() - t0, 1)
            results.append(out)
        except Exception as exc:  # noqa: BLE001 — capture partial evidence
            import traceback

            traceback.print_exc()
            results.append({"section": name, "error": repr(exc)[:500]})
        print(json.dumps(results[-1]), flush=True)

    os.makedirs(os.path.join(REPO, "logs"), exist_ok=True)
    with open(os.path.join(REPO, "logs", "config5_chip.json"), "w") as fh:
        json.dump(results, fh, indent=2)

    for out in results:
        print(f"\n### {out.get('section')}")
        for k, v in out.items():
            if k != "section":
                print(f"| {k} | {v} |")


if __name__ == "__main__":
    main()
