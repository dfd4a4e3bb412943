"""Chip A/B: fully-fused in-training re-clustering vs host-update-per-chunk.

Workload: ImplicitCGGP (masked row-solve model) at N=435k synthetic 3-D,
covernet covariance metric, steps_per_call=25, batch 2048 — three variants:

* ``none``    — no re-clustering (lower bound on chunk cost);
* ``fused``   — ``recluster_fn`` inside the jitted dispatch
                (selection adapts to the live hyperparameters, zero host
                roundtrips);
* ``host``    — covernet update on host between dispatches +
                ``assign_clusters_device`` (same selection, paid through
                per-chunk host dispatch/sync).

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
    from cggp_tpu.models import ImplicitCGGP
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.covernet import (
        covernet_update_padded,
        make_device_recluster_fn,
    )
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import make_adam_multi_step

    N, DIM, BATCH, K = 435_000, 3, 2048, 25
    RES, CAP = 0.30, 2048  # covariance metric: m ~ 1-2k at unit lengthscales
    train, _ = synthetic(n=N, dim=DIM, seed=0)
    x = jnp.asarray(train[0], jnp.float32)
    y = jnp.asarray(train[1], jnp.float32)
    n_train = int(x.shape[0])

    model = ImplicitCGGP(
        kernel=Matern32(), num_data=n_train, num_probes=5,
        error_threshold=1e-5, relative_threshold=True,
        max_cg_iterations=256, block=CAP, precondition="pivchol",
        precond_rank=128,
    )
    kp0 = model.kernel.init_params(dtype=jnp.float32)
    z0, u0, c0, mask0 = covernet_update_padded(
        x, y, RES, CAP, distance_type="covariance",
        kernel=model.kernel, kernel_params=kp0,
    )
    m0 = int(mask0.sum())
    params0 = model.init_params(
        jnp.asarray(z0[:m0]), pseudo_u=u0[:m0], cluster_counts=c0[:m0],
        capacity=CAP, dtype=jnp.float32,
    )
    optimizer = optax.adam(0.01)
    tmask = model.trainable_mask(params0)
    loss_fn = lambda p, b, k: model.training_loss(p, b, k)
    recluster = make_device_recluster_fn(
        model, (x, y), RES, CAP, distance_type="covariance"
    )

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
        # warmup/compile
        params, opt_state, losses = multi(params, opt_state, next(chunks), key)
        float(losses[-1])
        walls = []
        step_i = 0
        for _ in range(3):  # best of 3 windows of 2 chunks
            t0 = time.perf_counter()
            for _ in range(2):
                key = jax.random.fold_in(key, step_i)
                step_i += 1
                if variant == "host":
                    params = recluster(params)  # eager host-dispatched update
                params, opt_state, losses = multi(
                    params, opt_state, next(chunks), key
                )
            final = float(losses[-1])
            walls.append(time.perf_counter() - t0)
        if not np.isfinite(final):
            raise RuntimeError(f"{variant}: non-finite loss {final}")
        steps_per_sec = 2 * K / min(walls)
        return {
            "variant": variant, "steps_per_sec": round(steps_per_sec, 2),
            "m0": m0, "m_final": int(params["inducing_mask"].sum()),
            "capacity": CAP, "final_loss": round(final, 1),
        }

    for variant in ("none", "fused", "host"):
        print(json.dumps(run(variant)), flush=True)


if __name__ == "__main__":
    main()
