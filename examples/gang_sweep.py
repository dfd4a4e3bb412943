"""Gang sweep: a learning-rate x init grid trained as ONE compiled program.

The reference runs each grid cell as its own process on its own GPU
(reference configs/*.toml + its process runner); gang training instead
stacks same-shape cells on a leading axis and vmaps the train step — one
chip trains the whole grid concurrently, and on a mesh each cell gets its
own device with zero collectives (training/gang.py).

    JAX_PLATFORMS=cpu python examples/gang_sweep.py
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.models import CGGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.selection.update import covertree_update_inducing_parameters
from cggp_tpu.training.gang import (
    gang_eval_rmse_nlpd,
    stack_pytrees,
    train_gang_adam,
)


def main():
    train, test = synthetic(n=2000, dim=2, seed=0)
    train = tuple(map(jnp.asarray, train))
    test = tuple(map(jnp.asarray, test))
    n = int(train[0].shape[0])

    iv, u, counts = covertree_update_inducing_parameters(train, 0.3)
    model = CGGP(Matern32(), num_data=n,
                 conjugate_gradient=ConjugateGradient(
                     1e-8, max_iterations=int(iv.shape[0]),
                     relative_threshold=True),
                 num_probes=4)
    base = model.init_params(iv, pseudo_u=u, cluster_counts=counts)

    # The grid: learning rates x lengthscale inits (2 x 3 = 6 cells).
    grid = list(itertools.product([0.05, 0.01], [0.5, 1.0, 2.0]))
    variants, lrs = [], []
    for lr, ls_scale in grid:
        p = jax.tree_util.tree_map(jnp.copy, base)
        p["kernel"]["lengthscales"] = p["kernel"]["lengthscales"] * ls_scale
        variants.append(p)
        lrs.append(lr)

    trained, losses = train_gang_adam(
        variants, lambda p, b, k: model.training_loss(p, b, k), train,
        iterations=150, batch_size=256, learning_rates=lrs,
        key=jax.random.PRNGKey(0),
        trainable_mask=model.trainable_mask(base), steps_per_call=25)

    # Rank the whole grid with ONE vmapped evaluation program.
    rmse, nlpd = gang_eval_rmse_nlpd(model, stack_pytrees(trained), test)
    print(f"{'lr':>6} {'ls_scale':>9} {'final_loss':>11} {'test_rmse':>10} {'nlpd':>8}")
    rows = []
    for (lr, ls), loss, r, nl in zip(grid, losses[-1], rmse, nlpd):
        rows.append((float(r), lr, ls))
        print(f"{lr:>6} {ls:>9} {float(loss):>11.1f} {float(r):>10.4f} {float(nl):>8.4f}")
    best = min(rows)
    print(f"best cell: lr={best[1]} ls_scale={best[2]} rmse={best[0]:.4f}")


if __name__ == "__main__":
    main()
