"""Gang training: many same-shape model replicas in ONE compiled program.

The paper's evaluation protocol is grid sweeps — seeds x learning rates x
inits at a fixed inducing count (configs/*.toml mirror the reference's
configs/, e.g. reference configs/geospatial.toml's seed = [111, 222, 333]
rows).  The reference runs each grid cell as its own process pinned to its
own GPU (reference xp_*.py + artemss/mlpex process runner); this module is
the TPU-idiomatic shape instead: stack the replicas on a leading gang axis
and train them all in one jitted program.

Two execution regimes, same code path:

- **Single chip**: a small-M CDGP step underutilizes the MXU (the fused
  [1+2P+B, M] matvec at small M is far from the compute roofline and the
  elementwise CG updates are latency-bound).  ``vmap`` over the gang axis
  batches G such steps into one program — measured on the chip
  (scripts/gang_measure.py, docs/PERF.md): **5.6x aggregate throughput**
  for an 8-gang at the M=256 sweep cell.  At COMPUTE-bound cells the MXU
  is already saturated by one model and ganging buys nothing (0.87x at
  M=989/batch=2048 — the vmapped CG also runs every member to the gang
  max iteration count): run such cells sequentially, or gang them over a
  mesh where each gets its own chip.
- **Mesh**: place the stacked pytrees with the gang axis sharded over the
  device mesh (:func:`shard_gang`) and jit partitions the SAME program
  SPMD — one replica per device, ZERO collectives (the axes never mix).
  This is the multi-chip sweep story: a v5e-8 slice trains 8 grid cells
  concurrently with no communication cost at all.

Batched CG under vmap: ``cg_loop``'s ``lax.while_loop`` keeps iterating
until every gang member's stop rule holds (JAX batches the predicate with
``any``), so per-solve iteration counts are the gang max — harmless for
same-shape grid cells, which converge at similar rates; wildly mixed
conditioning belongs in separate gangs.

Per-model learning rates ride ``optax.inject_hyperparams``: the learning
rate becomes a leaf of the optimizer STATE (stacked to [G] like every
other leaf) instead of a Python constant baked into the update closure.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cggp_tpu.training.batching import minibatch_index_iterator
from cggp_tpu.training.optimize import LossFn, _mask_grads

GANG_AXIS = "gang"


def stack_pytrees(trees: Sequence):
    """Stack same-structure pytrees along a new leading gang axis."""
    if not trees:
        raise ValueError("stack_pytrees: need at least one pytree")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack_pytree(tree, size: int) -> List:
    """Split a gang-stacked pytree back into ``size`` per-model pytrees."""
    return [jax.tree_util.tree_map(lambda x: x[g], tree) for g in range(size)]


def shard_gang(mesh, tree, axis_name: str = None):
    """Place a gang-stacked pytree with the LEADING axis sharded over the
    (1-D) mesh — one model replica per device when G == mesh size.  Leaves
    whose leading dimension does not divide the mesh are replicated rather
    than rejected (optax state can carry gang-invariant scalars)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh_axis = axis_name or mesh.axis_names[0]
    n = mesh.devices.size

    def _put(x):
        x = jnp.asarray(x)
        spec = P(mesh_axis) if (x.ndim >= 1 and x.shape[0] % n == 0) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, tree)


def make_adam_gang_multi_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    data: Tuple[jnp.ndarray, jnp.ndarray],
    trainable_mask: Optional[Dict] = None,
):
    """K-step gang driver: ``lax.scan`` over steps of a ``vmap`` over models.

    Mirrors :func:`make_adam_multi_step`'s contract (one dispatch per K
    optimizer steps, device-side batch gathers, in-scan PRNG splits) with a
    leading gang axis G on params/opt_state/keys and per-step-per-model
    index blocks:

    ``gang_multi_step(params_G, opt_state_G, idx_chunk [K, G, B], keys [G, 2])
    -> (params_G, opt_state_G, losses [K, G])``

    The per-model step body is IDENTICAL to the single-model trainer's, so a
    gang of one reproduces ``make_adam_multi_step`` trajectories exactly
    (pinned by tests/test_gang.py) — gang training changes the schedule,
    never the math.  ``trainable_mask`` is shared across the gang (grid
    cells sweep hyperparameters, not trainability semantics).
    """
    x, y = data

    def one_step(params, opt_state, idx, key):
        key, step_key = jax.random.split(key)
        batch = (jnp.take(x, idx, axis=0), jnp.take(y, idx, axis=0))
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_key)
        grads = _mask_grads(grads, trainable_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, loss

    vstep = jax.vmap(one_step)

    @jax.jit
    def gang_multi_step(params, opt_state, idx_chunk, keys):
        def body(carry, idx):
            params, opt_state, keys = carry
            params, opt_state, keys, loss = vstep(params, opt_state, idx, keys)
            return (params, opt_state, keys), loss

        (params, opt_state, _keys), losses = jax.lax.scan(
            body, (params, opt_state, keys), idx_chunk
        )
        return params, opt_state, losses

    return gang_multi_step


def init_gang_adam(
    params_list: Sequence[Dict],
    learning_rates: Sequence[float],
) -> Tuple[optax.GradientTransformation, object]:
    """Adam with PER-MODEL learning rates via ``optax.inject_hyperparams``:
    the rate is a leaf of each model's optimizer state, so stacking the
    states stacks the rates and the vmapped ``update`` reads each model's
    own.  Returns ``(optimizer, stacked_opt_state)``."""
    if len(params_list) != len(learning_rates):
        raise ValueError(
            f"init_gang_adam: {len(params_list)} param sets vs "
            f"{len(learning_rates)} learning rates"
        )
    optimizer = optax.inject_hyperparams(optax.adam)(
        learning_rate=float(learning_rates[0])
    )
    states = []
    for params, lr in zip(params_list, learning_rates):
        state = optimizer.init(params)
        # Keep optax's own hyperparam dtype (x64-dependent): a forced float32
        # here would flip dtypes between scan carry input and output.
        state.hyperparams["learning_rate"] = jnp.asarray(
            lr, state.hyperparams["learning_rate"].dtype)
        states.append(state)
    return optimizer, stack_pytrees(states)


def gang_index_chunks(
    key: jax.Array, n: int, batch_size: int, chunk: int, gang: int
):
    """Infinite stream of [chunk, G, batch] int32 index blocks — G
    INDEPENDENT epoch-permutation streams (distinct grid cells must not
    share minibatch noise), interleaved per step."""
    iterators = [
        minibatch_index_iterator(jax.random.fold_in(key, g), n, batch_size, chunk)
        for g in range(gang)
    ]
    while True:
        yield jnp.stack([next(it) for it in iterators], axis=1)


def make_gang_predict(model):
    """Vmapped ``predict_f`` over the gang axis: one program evaluates every
    grid cell — ``gang_predict(params_G, x [n, d]) -> (mu [G, n, 1],
    var [G, n, 1])``.  The query block is shared (the sweep evaluates all
    cells on the same test set); per-cell inputs belong in a vmap over the
    caller.  Variational models only (``predict_f(params, x)``) — GPR-style
    data-conditioned prediction needs ``bind_predict_fn`` per cell."""
    return jax.jit(jax.vmap(
        lambda p, xb: model.predict_f(p, xb), in_axes=(0, None)))


def gang_eval_rmse_nlpd(model, params_stack, test_data,
                        batch_size: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Per-cell test RMSE and NLPD for a trained gang, accumulated on device
    (one host fetch per batch of queries, not per cell).  Returns
    ``(rmse [G], nlpd [G])`` — the ranking step of a gang sweep."""
    x_test, y_test = test_data
    n = int(x_test.shape[0])
    predict = make_gang_predict(model)

    @jax.jit
    def batch_stats(params, xb, yb):
        mu, var = predict(params, xb)          # [G, b, 1]
        lpd = jax.vmap(
            lambda p, m, v: model.likelihood.predict_log_density(
                p["likelihood"], m, v, yb)
        )(params, mu, var)
        sq = jnp.sum(jnp.square(yb[None] - mu), axis=(1, 2))
        return sq, jnp.sum(lpd, axis=tuple(range(1, lpd.ndim)))

    sq_total = lpd_total = None
    for start in range(0, n, batch_size):
        xb = x_test[start:start + batch_size]
        yb = y_test[start:start + batch_size]
        sq, lpd = batch_stats(params_stack, jnp.asarray(xb), jnp.asarray(yb))
        sq_total = sq if sq_total is None else sq_total + sq
        lpd_total = lpd if lpd_total is None else lpd_total + lpd
    rmse = np.sqrt(np.asarray(sq_total) / n)
    nlpd = -np.asarray(lpd_total) / n
    return rmse, nlpd


def train_gang_adam(
    params_list: Sequence[Dict],
    loss_fn: LossFn,
    data: Tuple[jnp.ndarray, jnp.ndarray],
    iterations: int,
    batch_size: int,
    learning_rates,
    key: jax.Array,
    trainable_mask: Optional[Dict] = None,
    steps_per_call: int = 25,
    mesh=None,
) -> Tuple[List[Dict], np.ndarray]:
    """Train G same-shape replicas concurrently; returns
    ``(per-model params list, losses [iterations, G])``.

    ``learning_rates`` is a scalar (shared) or a length-G sequence.  With a
    ``mesh``, the stacked pytrees are placed gang-axis-sharded
    (:func:`shard_gang`) — the jitted program partitions SPMD with no
    collectives; G must be a multiple of the mesh size for full sharding
    (other leaves replicate).  Losses come back per step per model so sweep
    tooling can rank cells without re-evaluating.
    """
    gang = len(params_list)
    if np.ndim(learning_rates) == 0:
        learning_rates = [float(learning_rates)] * gang
    optimizer, opt_state = init_gang_adam(params_list, learning_rates)
    params = stack_pytrees(params_list)

    x, y = data
    n = int(x.shape[0])
    multi_step = make_adam_gang_multi_step(
        loss_fn, optimizer, (jnp.asarray(x), jnp.asarray(y)),
        trainable_mask=trainable_mask,
    )

    key, idx_key = jax.random.split(key)
    keys = jax.random.split(key, gang)
    if mesh is not None:
        params = shard_gang(mesh, params)
        opt_state = shard_gang(mesh, opt_state)
        keys = shard_gang(mesh, keys)

    chunks = gang_index_chunks(idx_key, n, batch_size, steps_per_call, gang)
    loss_rows = []
    done = 0
    while done < iterations:
        k = min(steps_per_call, iterations - done)
        idx = next(chunks)[:k]
        if mesh is not None:
            idx = shard_gang(mesh, jnp.swapaxes(idx, 0, 1))
            idx = jnp.swapaxes(idx, 0, 1)
        params, opt_state, losses = multi_step(params, opt_state, idx, keys)
        # The scan consumed per-model keys and returned the advanced ones in
        # the carry — but gang_multi_step deliberately drops them (same
        # policy as make_adam_multi_step): fold the chunk counter instead.
        keys = jax.vmap(jax.random.fold_in)(keys, jnp.full(gang, done))
        loss_rows.append(np.asarray(losses[:k]))
        done += k
    all_losses = np.concatenate(loss_rows, axis=0)
    if not np.all(np.isfinite(all_losses[-1])):
        raise FloatingPointError(
            f"non-finite final gang losses: {all_losses[-1]}")
    return unstack_pytree(params, gang), all_losses
