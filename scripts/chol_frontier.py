"""Frontier-protocol A/B of precondition="chol" vs pivchol at the bench
e2e workload (docs/PERF.md "round 3: the training frontier"): 1000 Adam
steps, N=435k synthetic 3-D, covertree res 0.35 (M=989), batch 2048, K=25,
xla_high, relative threshold — steps/s plus held-out test RMSE/NLPD so an
accuracy regression cannot hide behind a throughput win.

Usage:  python scripts/chol_frontier.py [chol|pivchol] [rank] [threshold] [res] [steps]

``res`` (default 0.35 -> M=989) sets the covertree spatial resolution —
smaller gives larger M (0.22 -> ~4k, 0.17 -> ~8k on this synthetic), for
validating the precondition="auto" cutoff where the O(M^3) factor build
meets the iteration cut.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "chol"
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-5
    res = float(sys.argv[4]) if len(sys.argv) > 4 else 0.35
    steps = int(sys.argv[5]) if len(sys.argv) > 5 else 1000

    import jax

    from cggp_tpu.utils import cache

    cache.enable_persistent_cache(jax, "bench-")

    import jax.numpy as jnp
    import optax

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.update import covertree_update_inducing_parameters
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import make_adam_multi_step, make_metrics_callback

    N, DIM, BATCH, K, STEPS = 435_000, 3, 2048, 25, steps
    train, test = synthetic(n=N, dim=DIM, seed=0)
    x = jnp.asarray(train[0], jnp.float32)
    y = jnp.asarray(train[1], jnp.float32)
    n_train = int(x.shape[0])

    iv, u, counts = covertree_update_inducing_parameters(
        (x, y), spatial_resolution=res
    )
    m = int(iv.shape[0])
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(
            threshold, max_iterations=m, relative_threshold=True,
            matvec_impl="xla_high",
        ),
        num_data=n_train,
        num_probes=5,
        precondition=mode,
        precond_rank=rank,
    )
    params = model.init_params(iv, pseudo_u=u, cluster_counts=counts,
                               dtype=jnp.float32)

    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    multi_step = make_adam_multi_step(
        lambda p, b, k: model.training_loss(p, b, k), optimizer, (x, y),
        trainable_mask=model.trainable_mask(params),
    )
    chunks = minibatch_index_iterator(jax.random.PRNGKey(1), n_train, BATCH, K)
    key = jax.random.PRNGKey(2)

    params, opt_state, losses = multi_step(params, opt_state, next(chunks), key)
    float(losses[-1])  # compile + warm

    t0 = time.perf_counter()
    n_chunks = STEPS // K
    for i in range(n_chunks):
        key = jax.random.fold_in(key, i)
        params, opt_state, losses = multi_step(params, opt_state,
                                               next(chunks), key)
    final_loss = float(losses[-1])
    wall = time.perf_counter() - t0

    metrics_fn = make_metrics_callback(
        model, (x, y), (jnp.asarray(test[0], jnp.float32),
                        jnp.asarray(test[1], jnp.float32)),
        batch_size=8192, key=jax.random.PRNGKey(7), check_numerics=False,
    )
    metrics = metrics_fn(STEPS, params)

    print(json.dumps({
        "mode": mode if mode == "chol" else f"{mode}-{rank}",
        "threshold": threshold,
        "steps_per_sec": round(n_chunks * K / wall, 2),
        "final_loss": round(final_loss, 2),
        "test_rmse": round(float(metrics["test/rmse"]), 5),
        "test_nlpd": round(float(metrics["test/nlpd"]), 5),
        "m": m, "steps": STEPS, "res": res,
    }), flush=True)


if __name__ == "__main__":
    main()
