"""Data-parallel training/eval steps: shard the N dimension, replicate params.

The scaling analogue of sequence parallelism for kernel methods
(SURVEY.md section 5): X/y rows are sharded over the mesh, the model's data
terms (``Kuf`` construction, variational expectations, squared errors) run on
local rows, and XLA's GSPMD partitioner inserts the ``psum`` reductions that
the final scalar sums imply.  No shard_map needed on this path — shardings
in, compiler collectives out.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cggp_tpu.parallel.mesh import DATA_AXIS

Array = jnp.ndarray


def make_data_parallel_loss(
    loss_fn: Callable,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> Callable:
    """jit ``loss_fn(params, (x, y), key)`` with batch rows sharded over the
    mesh and everything else replicated.  (Params are NOT donated: a loss
    only reads them, so donation would buy nothing and poison the caller's
    buffers.)"""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        loss_fn,
        in_shardings=(repl, (batch_sharding, batch_sharding), repl),
        out_shardings=repl,
    )


def make_data_parallel_predict(
    predict_fn: Callable,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
) -> Callable:
    """jit ``predict_fn(params, x) -> (mean, var)`` with query rows sharded:
    each device predicts its rows; outputs stay row-sharded."""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        predict_fn,
        in_shardings=(repl, batch_sharding),
        out_shardings=(batch_sharding, batch_sharding),
    )


def make_data_parallel_train_step(
    loss_fn: Callable,
    optimizer,
    mesh: Mesh,
    trainable_mask=None,
    axis_name: str = DATA_AXIS,
) -> Callable:
    """Full Adam step under GSPMD: grads of the sharded-batch loss are
    replicated (XLA reduces them), so the optimizer update is replicated too."""
    import optax

    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        if trainable_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, (batch_sharding, batch_sharding), repl),
        out_shardings=(repl, repl, repl),
    )
