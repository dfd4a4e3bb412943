"""Chip A/B: per-chunk re-clustering on the PRODUCTION dense model.

The bench e2e workload (N=435k, batch 2048, K=25, chol-preconditioned dense
CGGP at ~340 steps/s) re-clustering every chunk, three ways:

* ``none``  — static selection (the bench e2e baseline shape);
* ``fused`` — capacity-padded model + ``recluster_fn`` inside the dispatch;
* ``host``  — capacity-padded model + the same covernet update run eagerly
              between dispatches (shape-stable, but pays host dispatch+sync).

At ~73 ms per 25-step chunk, a ~100 ms host update more than doubles the
wall — the fused path is where per-chunk adaptivity stays free.

Prints one JSON line per variant; recorded in docs/PERF.md.
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
    import optax

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.covernet import (
        covernet_update_padded,
        make_device_recluster_fn,
    )
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import make_adam_multi_step

    N, DIM, BATCH, K = 435_000, 3, 2048, 25
    RES, CAP = 0.35, 2048  # euclidean net at the bench resolution (m~1.1k)
    train, _ = synthetic(n=N, dim=DIM, seed=0)
    x = jnp.asarray(train[0], jnp.float32)
    y = jnp.asarray(train[1], jnp.float32)
    n_train = int(x.shape[0])

    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(
            1e-5, max_iterations=CAP, relative_threshold=True,
            matvec_impl="xla_high",
        ),
        num_data=n_train, num_probes=5, precondition="chol",
    )
    z0, u0, c0, mask0 = covernet_update_padded(x, y, RES, CAP, lloyds=0)
    m0 = int(mask0.sum())
    params0 = model.init_params(
        jnp.asarray(z0[:m0]), pseudo_u=u0[:m0], cluster_counts=c0[:m0],
        capacity=CAP, dtype=jnp.float32,
    )
    optimizer = optax.adam(0.01)
    tmask = model.trainable_mask(params0)
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    recluster = make_device_recluster_fn(model, (x, y), RES, CAP, lloyds=0)

    def run(variant: str) -> dict:
        params = params0
        opt_state = optimizer.init(params)
        multi = make_adam_multi_step(
            loss_fn, optimizer, (x, y), trainable_mask=tmask,
            recluster_fn=recluster if variant == "fused" else None,
        )
        chunks = minibatch_index_iterator(jax.random.PRNGKey(1), n_train,
                                          BATCH, K)
        key = jax.random.PRNGKey(2)
        params, opt_state, losses = multi(params, opt_state, next(chunks), key)
        float(losses[-1])  # compile + sync
        if variant == "host":
            params = recluster(params)
            float(jnp.sum(params["inducing_points"]))  # warm its program too
        walls = []
        step_i = 0
        for _ in range(3):  # best of 3 windows of 4 chunks (100 steps)
            t0 = time.perf_counter()
            for _ in range(4):
                key = jax.random.fold_in(key, step_i)
                step_i += 1
                if variant == "host":
                    params = recluster(params)
                params, opt_state, losses = multi(
                    params, opt_state, next(chunks), key
                )
            final = float(losses[-1])
            walls.append(time.perf_counter() - t0)
        if not np.isfinite(final):
            raise RuntimeError(f"{variant}: non-finite loss {final}")
        return {
            "variant": variant,
            "steps_per_sec": round(4 * K / min(walls), 2),
            "m0": m0, "capacity": CAP, "final_loss": round(final, 1),
        }

    for variant in ("none", "fused", "host"):
        print(json.dumps(run(variant)), flush=True)


if __name__ == "__main__":
    main()
