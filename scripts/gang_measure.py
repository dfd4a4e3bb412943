#!/usr/bin/env python
"""Chip measurement: gang training aggregate throughput vs the solo trainer.

The sweep story (configs/*.toml grids): G same-shape cells trained as one
vmapped program on one chip. Reports solo steps/s and gang aggregate
steps/s (G x steps / wall) at a small-M cell and the production e2e shape.
Writes logs/gang_measure.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cggp_tpu.utils import cache

    cache.enable_persistent_cache(jax, "gang-")

    from cggp_tpu.data import synthetic
    from cggp_tpu.models import CGGP
    from cggp_tpu.ops.cg import ConjugateGradient
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.update import (
        covertree_update_inducing_parameters,
        labels_update_inducing_parameters,
    )
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.gang import (
        gang_index_chunks,
        init_gang_adam,
        make_adam_gang_multi_step,
        stack_pytrees,
    )
    from cggp_tpu.training.optimize import make_adam_multi_step

    N, DIM, K, CHUNKS, G = 435_000, 3, 25, 3, 8
    train, _ = synthetic(n=N, dim=DIM, seed=0)
    x = jnp.asarray(train[0], jnp.float32)
    y = jnp.asarray(train[1], jnp.float32)
    n_train = int(x.shape[0])

    def build(m_mode, batch):
        if m_mode == "covertree":
            iv, u, counts = covertree_update_inducing_parameters(
                (x, y), spatial_resolution=0.35)
        else:
            iv, u, counts = labels_update_inducing_parameters(
                (x, y), x[:int(m_mode)])
        m = int(iv.shape[0])
        model = CGGP(
            kernel=Matern32(),
            conjugate_gradient=ConjugateGradient(
                1e-6, max_iterations=m, relative_threshold=True,
                matvec_impl="xla_high"),
            num_data=n_train, num_probes=5,
            precondition="pivchol", precond_rank=128)
        params = model.init_params(iv, pseudo_u=u, cluster_counts=counts,
                                   dtype=jnp.float32)
        return model, params, m, batch

    rows = []
    for m_mode, batch in (("256", 1024), ("covertree", 2048)):
        model, params, m, batch = build(m_mode, batch)
        loss_fn = lambda p, b, k: model.training_loss(p, b, k)
        mask = model.trainable_mask(params)

        # Solo baseline (identical schedule to bench.py's e2e section).
        solo = make_adam_multi_step(loss_fn, optax.adam(0.01), (x, y),
                                    trainable_mask=mask)
        opt_state = optax.adam(0.01).init(params)
        chunks = minibatch_index_iterator(jax.random.PRNGKey(1), n_train,
                                          batch, K)
        key = jax.random.PRNGKey(2)
        p, opt_state, losses = solo(params, opt_state, next(chunks), key)
        float(losses[-1])
        t0 = time.perf_counter()
        for i in range(CHUNKS):
            p, opt_state, losses = solo(p, opt_state, next(chunks),
                                        jax.random.fold_in(key, i))
        solo_loss = float(losses[-1])
        solo_wall = time.perf_counter() - t0
        solo_sps = CHUNKS * K / solo_wall

        # Gang of G: same cell swept over inits (the grid-seed axis).
        variants = []
        for g in range(G):
            pg = jax.tree_util.tree_map(jnp.copy, params)
            pg["kernel"]["lengthscales"] = (
                pg["kernel"]["lengthscales"] * (0.8 + 0.1 * g))
            variants.append(pg)
        optimizer, gang_opt_state = init_gang_adam(variants, [0.01] * G)
        gang = make_adam_gang_multi_step(loss_fn, optimizer, (x, y),
                                         trainable_mask=mask)
        gchunks = gang_index_chunks(jax.random.PRNGKey(3), n_train, batch,
                                    K, G)
        keys = jax.random.split(jax.random.PRNGKey(4), G)
        gp = stack_pytrees(variants)
        gp, gang_opt_state, glosses = gang(gp, gang_opt_state, next(gchunks),
                                           keys)
        float(glosses[-1, -1])
        t0 = time.perf_counter()
        for i in range(CHUNKS):
            gp, gang_opt_state, glosses = gang(gp, gang_opt_state,
                                               next(gchunks), keys)
        gang_losses = np.asarray(glosses[-1])
        gang_wall = time.perf_counter() - t0
        gang_sps = G * CHUNKS * K / gang_wall

        row = {
            "M": m, "batch": batch, "gang": G,
            "solo_steps_per_sec": round(solo_sps, 2),
            "gang_aggregate_steps_per_sec": round(gang_sps, 2),
            "gang_speedup_vs_sequential": round(gang_sps / solo_sps, 2),
            "solo_final_loss": round(solo_loss, 1),
            "gang_final_losses_finite": bool(np.all(np.isfinite(gang_losses))),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    path = os.path.join(REPO, "logs", "gang_measure.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
