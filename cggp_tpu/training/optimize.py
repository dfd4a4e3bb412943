"""Training loops and metrics (reference optimize.py:101-389).

* Adam: optax with a jit-compiled step over a parameter pytree, optional
  per-step inducing-point update (reference ``train_using_adam_and_update``,
  optimize.py:198-254).  Non-trainable leaves (pseudo_u, cluster_counts, Z by
  default) are frozen by zeroing their gradients through a static boolean
  mask pytree — the functional analogue of GPflow's ``trainable`` flags.
* L-BFGS: scipy's L-BFGS-B over a raveled fp64 vector with a jitted
  value-and-grad oracle (reference wraps ``gpflow.optimizers.Scipy``,
  optimize.py:153-195); ``step_callback`` runs inducing updates + monitoring
  between optimizer iterations exactly like the reference (:172-187).
* Metrics: batched test RMSE/NLPD + train ELBO with a finite-ness tripwire
  (reference ``make_metrics_callback``, optimize.py:285-364; the
  ``tf.debugging.check_numerics`` guard at :359-360 becomes an explicit
  ``isfinite`` raise).
"""

from __future__ import annotations

import functools
import time
import warnings
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from cggp_tpu.ops.linalg import pad_rows_to_blocks
from cggp_tpu.training.batching import batched_indices, minibatch_iterator
from cggp_tpu.training.monitor import Monitor

Array = jnp.ndarray
LossFn = Callable[[Dict, Tuple[Array, Array], jax.Array], Array]
UpdateFn = Callable[[Dict], Dict]


def _expand_trainable_mask(mask: Dict, params: Dict) -> Dict:
    """Full boolean pytree matching ``params`` from a possibly-PREFIX mask:
    a single bool in the mask freezes/frees the whole corresponding params
    subtree (e.g. ``{"kernel": True, "likelihood": False, ...}``).  All
    trainers accept either form."""
    return jax.tree_util.tree_map(
        lambda m, sub: jax.tree_util.tree_map(
            lambda p: jnp.full(jnp.shape(p), bool(m)), sub
        ),
        mask, params,
        is_leaf=lambda node: isinstance(node, bool),
    )


def _mask_grads(grads: Dict, mask: Optional[Dict]) -> Dict:
    if mask is None:
        return grads
    return jax.tree_util.tree_map(
        jnp.multiply, grads, _expand_trainable_mask(mask, grads)
    )


def make_adam_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    trainable_mask: Optional[Dict] = None,
):
    """Build the jitted Adam step (reference optimize.py:230-232)."""

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        grads = _mask_grads(grads, trainable_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_adam_multi_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    data: Tuple[Array, Array],
    trainable_mask: Optional[Dict] = None,
    precond_fn=None,
    recluster_fn=None,
):
    """Build a jitted K-step Adam driver: ``lax.scan`` over a chunk of batch
    indices, ONE dispatch per K optimizer steps (net-new vs the reference's
    step-per-dispatch loop, optimize.py:230-240).

    Host-side per-step overhead (dispatch, PRNG splits, batch gathers) is
    what bounds small-step training throughput — measured 18.5 ms of compute
    inside a 72 ms wall step on a remote-tunnel chip.  The scan keeps the
    whole chunk on device: batches are gathered from the device-resident
    dataset by an [K, B] index array, keys are split inside the scan.

    ``precond_fn(params) -> state pytree`` (chunk-frozen preconditioning,
    net-new): build the CG preconditioner ONCE per dispatch from the chunk's
    entry params and reuse it for all K steps — ``loss_fn`` must then accept
    a fourth argument ``loss_fn(params, batch, key, precond_state)``
    (``CGGP.precond_state`` / ``training_loss(precond_override=...)``).

    ``recluster_fn(params) -> params`` (net-new, fully-fused re-clustering):
    a PURE jit-composable inducing-point update (fixed shapes — see
    ``selection.covernet.make_device_recluster_fn``) run at the top of every
    dispatch, INSIDE the compiled program: the reference's host-roundtrip
    per-step re-clustering (optimize.py:19-38) becomes part of the training
    chunk itself.  Inducing buffers must be non-trainable (the default) so
    the optimizer state stays aligned across swaps.
    Caveat: the CG stop rule tests the true residual, so converged solves
    are unaffected — but the stale factor's extra iterations can hit the
    solver's cap, where solutions DO degrade (converged=False; see
    CGGP.precond_state and the measured A/B in docs/PERF.md).
    """
    x, y = data

    @jax.jit
    def multi_step(params, opt_state, idx_chunk, key):
        if recluster_fn is not None:
            params = recluster_fn(params)
        precond = precond_fn(params) if precond_fn is not None else None

        def body(carry, idx):
            params, opt_state, key = carry
            key, step_key = jax.random.split(key)
            batch = (jnp.take(x, idx, axis=0), jnp.take(y, idx, axis=0))
            if precond_fn is not None:
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, batch, step_key, precond
                )
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_key)
            grads = _mask_grads(grads, trainable_mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        (params, opt_state, _key), losses = jax.lax.scan(
            body, (params, opt_state, key), idx_chunk
        )
        return params, opt_state, losses

    return multi_step


def _tree_shapes(params: Dict):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), params)


def train_using_adam_and_update(
    params: Dict,
    loss_fn: LossFn,
    data: Tuple[Array, Array],
    iterations: int,
    batch_size: int,
    learning_rate: float,
    key: jax.Array,
    update_fn: Optional[UpdateFn] = None,
    update_during_training: bool = True,
    trainable_mask: Optional[Dict] = None,
    monitor: Optional[Monitor] = None,
    profile_dir: Optional[str] = None,
    profile_steps: Tuple[int, int] = (2, 6),
    scalar_record_step: int = 1,
    steps_per_call: int = 1,
    mesh=None,
    precond_fn=None,
    recluster_fn=None,
    precond_resolver=None,
    loss_fn_for_mode=None,
    resolve_every: int = 1,
    initial_mode=None,
    on_mode_change=None,
) -> Dict:
    """Adam training with optional per-step inducing update
    (reference optimize.py:198-254 semantics).

    ``mesh`` (net-new) turns each step into the hybrid dp+tp SPMD step:
    batch rows are sharded over the mesh (``parallel.shard_batch``) and the
    whole value-and-grad + Adam update runs under GSPMD
    (``parallel.make_data_parallel_train_step``) — the likelihood term is
    computed on local rows with compiler-inserted psums, while an M-sharded
    model (ShardedCGGP) keeps its KL collectives.  Composes with
    ``steps_per_call == 1`` only: the scan-chunked multi-step gathers
    minibatches from the FULL dataset inside jit, which under a row-sharded
    dataset would lower to per-step cross-device gathers.

    ``update_fn(params) -> params`` runs host-side between jitted steps; if it
    changes any array shape (e.g. covertree changed M), the optimizer state is
    re-initialised and the step recompiles — matching the reference's
    behaviour of re-tracing on re-clustered shapes.

    ``steps_per_call > 1`` (net-new) runs K optimizer steps per dispatch via
    ``lax.scan`` (see :func:`make_adam_multi_step`) — host dispatch overhead
    is what bounds small-step throughput, especially on remote-tunnel
    devices.  ``update_fn`` / monitor then run every K steps and
    ``iterations`` rounds up to a multiple of K.  ``precond_fn`` (requires
    ``steps_per_call > 1``) freezes the CG preconditioner per chunk — see
    :func:`make_adam_multi_step`; ``loss_fn`` must then take
    ``(params, batch, key, precond_state)``.  ``recluster_fn`` (requires
    ``steps_per_call > 1``, exclusive with an in-training ``update_fn``)
    re-selects inducing points ON DEVICE inside every dispatch — see
    :func:`make_adam_multi_step` and
    :func:`cggp_tpu.selection.covernet.make_device_recluster_fn`.

    Observability (SURVEY.md section 5 additions over the reference): per-step
    wall time goes to the monitor as ``train/step_time_ms``; with
    ``profile_dir`` set, steps ``profile_steps[0]..[1]`` are captured with
    ``jax.profiler`` for xprof/TensorBoard.

    ``precond_resolver(params) -> mode`` + ``loss_fn_for_mode(mode) ->
    LossFn`` (round-5, closes the eager/jit ``precondition="auto"``
    divergence): the resolver runs HOST-SIDE — at start and again after
    every ``resolve_every``-th re-cluster boundary (an ``update_fn`` call) —
    and the resolved concrete mode is threaded into the jitted step as a
    STATIC choice by rebuilding the step from ``loss_fn_for_mode(mode)``.
    Inside jit the model's ``"auto"`` size rule then only ever acts as the
    compiler/HBM guard (``models/cggp.py`` ``_CHOL_AUTO_MAX_M``); the
    conditioning-based decision (``CGGP.resolve_precondition``'s Lanczos
    kappa estimate) is what every compiled program actually runs.  Steps are
    cached per mode, so a mode flip costs one compile the first time and a
    cache hit after.  ``loss_fn`` is ignored when a resolver is given.
    ``initial_mode`` skips the startup resolve when the caller already
    resolved eagerly (the CLI does — avoids paying the [M, M] Lanczos
    estimate twice before step 0); ``on_mode_change(mode)`` fires on every
    in-training swap so callers can log/record it (monitor callbacks built
    from the initially resolved model do NOT follow the swap — observers
    needing the live mode must use this hook).
    """
    key, data_key = jax.random.split(key)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    if precond_resolver is not None:
        if loss_fn_for_mode is None:
            raise ValueError(
                "precond_resolver requires loss_fn_for_mode (the factory "
                "that builds the concrete-mode loss the jitted step "
                "compiles)")
        if mesh is not None or precond_fn is not None:
            raise ValueError(
                "precond_resolver composes with the plain Adam paths only "
                "(not mesh data-parallel steps or chunk-frozen precond_fn)")
        if resolve_every < 1:
            raise ValueError("resolve_every must be >= 1")
        current_mode = (initial_mode if initial_mode is not None
                        else precond_resolver(params))
        # loss_fn itself stays untouched: the per-mode step caches build
        # from loss_fn_for_mode exactly once per distinct mode.
    else:
        current_mode = None

    if precond_fn is not None and steps_per_call <= 1:
        raise ValueError(
            "precond_fn (chunk-frozen preconditioning) requires "
            "steps_per_call > 1 — at one step per dispatch it is identical "
            "to the model's own per-step build, just with a different "
            "loss_fn signature"
        )
    if recluster_fn is not None:
        if steps_per_call <= 1:
            raise ValueError(
                "recluster_fn (fully-fused re-clustering) requires "
                "steps_per_call > 1 — it re-selects inducing points inside "
                "each scan-chunked dispatch"
            )
        if update_fn is not None and update_during_training:
            raise ValueError(
                "pass either recluster_fn (device, inside the dispatch) or "
                "update_fn with update_during_training (host, between "
                "dispatches), not both — they would re-cluster twice"
            )

    if mesh is not None:
        if steps_per_call > 1:
            raise ValueError(
                "mesh (data-parallel batches) composes with steps_per_call=1 "
                "only — the scan-chunked multi-step gathers from the full "
                "dataset inside jit (see docstring)"
            )
        # Validate the EFFECTIVE batch: minibatch_iterator clamps to the
        # dataset size, so batch_size > n would pass a nominal check and
        # then crash in shard_batch at the first step.
        effective_batch = min(int(batch_size), int(data[0].shape[0]))
        if effective_batch % mesh.devices.size != 0:
            raise ValueError(
                f"effective batch size {effective_batch} (min of batch_size "
                f"{batch_size} and dataset rows {data[0].shape[0]}) must "
                f"divide over the {mesh.devices.size}-device mesh"
            )

    if steps_per_call > 1:
        from cggp_tpu.training.batching import minibatch_index_iterator

        _multi_step_cache: Dict = {}

        def _get_multi_step(mode):
            if mode not in _multi_step_cache:
                fn = loss_fn if mode is None else loss_fn_for_mode(mode)
                _multi_step_cache[mode] = make_adam_multi_step(
                    fn, optimizer, data, trainable_mask,
                    precond_fn=precond_fn, recluster_fn=recluster_fn)
            return _multi_step_cache[mode]

        multi_step = _get_multi_step(current_mode)
        idx_chunks = minibatch_index_iterator(
            data_key, data[0].shape[0], batch_size, steps_per_call
        )
        num_chunks = -(-int(iterations) // int(steps_per_call))
        record_chunks = max(int(scalar_record_step) // int(steps_per_call), 1)
        profiling = False
        for chunk_i in range(num_chunks):
            # The monitor step is the chunk's FIRST global step: multiples of
            # K, so `step % record_step == 0` stays satisfiable whenever
            # record_step is a multiple of K (e.g. the CLI defaults K=25,
            # record_step=50).  Using the chunk's last step (25c-1) made the
            # gate unsatisfiable and silently disabled metrics/checkpoints.
            # NOTE: the logged VALUES (losses[-1], metrics, checkpoints)
            # therefore describe the post-chunk state, i.e. up to K-1 steps
            # after the label — step labels mark chunk starts, values reflect
            # chunk ends.
            iteration = chunk_i * int(steps_per_call)
            if profile_dir is not None and not profiling and \
                    iteration + steps_per_call > profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if update_fn is not None and update_during_training:
                shapes_before = _tree_shapes(params)
                params = update_fn(params)
                if _tree_shapes(params) != shapes_before:
                    opt_state = optimizer.init(params)
                if precond_resolver is not None and \
                        chunk_i % resolve_every == 0:
                    new_mode = precond_resolver(params)
                    if new_mode != current_mode:
                        current_mode = new_mode
                        multi_step = _get_multi_step(new_mode)
                        if on_mode_change is not None:
                            on_mode_change(new_mode)
            idx_chunk = next(idx_chunks)
            key, chunk_key = jax.random.split(key)
            t0 = time.perf_counter()
            params, opt_state, losses = multi_step(
                params, opt_state, idx_chunk, chunk_key
            )
            if monitor is not None:
                if chunk_i % record_chunks == 0:
                    loss_value = float(losses[-1])
                    dt_ms = (time.perf_counter() - t0) * 1e3 / steps_per_call
                    monitor.add_scalar("train/step_time_ms", dt_ms, iteration)
                    monitor.add_scalar("train/loss", loss_value, iteration)
                monitor(iteration, params)
            if profiling and iteration + steps_per_call > profile_steps[1]:
                jax.profiler.stop_trace()
                profiling = False
        if profiling:
            jax.profiler.stop_trace()
        if monitor is not None:
            monitor.flush()
        return params

    batches = minibatch_iterator(data_key, data, batch_size)
    if mesh is not None:
        from cggp_tpu.parallel import replicate, shard_batch
        from cggp_tpu.parallel.data_parallel import make_data_parallel_train_step

        step_spmd = make_data_parallel_train_step(
            loss_fn, optimizer, mesh, trainable_mask
        )
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

        def step(params, opt_state, batch, step_key):
            return step_spmd(params, opt_state, shard_batch(mesh, *batch), step_key)
    else:
        _step_cache: Dict = {}

        def _get_step(mode):
            if mode not in _step_cache:
                fn = loss_fn if mode is None else loss_fn_for_mode(mode)
                _step_cache[mode] = make_adam_step(fn, optimizer, trainable_mask)
            return _step_cache[mode]

        step = _get_step(current_mode)

    for iteration in range(int(iterations)):
        if profile_dir is not None and iteration == profile_steps[0]:
            jax.profiler.start_trace(profile_dir)
        if update_fn is not None and update_during_training:
            shapes_before = _tree_shapes(params)
            params = update_fn(params)
            if _tree_shapes(params) != shapes_before:
                opt_state = optimizer.init(params)
            if precond_resolver is not None and \
                    iteration % resolve_every == 0:
                new_mode = precond_resolver(params)
                if new_mode != current_mode:
                    current_mode = new_mode
                    step = _get_step(new_mode)
                    if on_mode_change is not None:
                        on_mode_change(new_mode)
        batch = next(batches)
        key, step_key = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, batch, step_key)
        if monitor is not None:
            # Fetching the loss synchronizes the device; gate it so steps
            # between records stay fully asynchronous (scalar_record_step > 1
            # is worth ~30 ms/step on remote-tunnel devices).
            if iteration % max(scalar_record_step, 1) == 0:
                loss_value = float(loss)
                monitor.add_scalar("train/step_time_ms",
                                   (time.perf_counter() - t0) * 1e3, iteration)
                monitor.add_scalar("train/loss", loss_value, iteration)
            monitor(iteration, params)
        if profile_dir is not None and iteration == profile_steps[1]:
            jax.profiler.stop_trace()
    # Strict lower bound: the trace only STARTS at iteration ==
    # profile_steps[0], which the 0..iterations-1 loop never reaches when
    # iterations == profile_steps[0] — stop_trace() with no active trace
    # raises and would crash the run at the very end.
    if profile_dir is not None and profile_steps[0] < iterations <= profile_steps[1]:
        jax.profiler.stop_trace()
    if monitor is not None:
        monitor.flush()
    return params


def train_full_batch_adam(
    params: Dict,
    loss_fn: Callable[[Dict, jax.Array], Array],
    iterations: int,
    learning_rate: float = 0.05,
    key: Optional[jax.Array] = None,
    monitor: Optional[Monitor] = None,
    trainable_mask: Optional[Dict] = None,
) -> Dict:
    """Full-batch Adam with a FRESH PRNG key per step (net-new).

    The optimizer for objectives that are stochastic *estimators* over the
    whole training set — IterGPR's marginal likelihood (log-det probes drawn
    per step) is the canonical case: minibatching is not available (the MLL
    does not decompose over rows) and L-BFGS line searches distrust a
    re-randomised loss, but Adam tolerates unbiased gradient noise.
    """
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    if key is None:
        key = jax.random.PRNGKey(0)
    mask = (
        None if trainable_mask is None
        else _expand_trainable_mask(trainable_mask, params)
    )

    @jax.jit
    def step(p, s, k):
        loss, grads = jax.value_and_grad(lambda q: loss_fn(q, k))(p)
        if mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.where(m, g, 0.0), grads, mask
            )
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for i in range(int(iterations)):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if monitor is not None:
            monitor.add_scalar("train/loss", float(loss), i)
            monitor(i, params)
    if monitor is not None:
        monitor.flush()
    return params


def train_chunked_adam(
    params: Dict,
    value_grad_fn: Callable[[Dict, jax.Array], Tuple[Array, Dict, Dict]],
    iterations: int,
    learning_rate: float = 0.05,
    key: Optional[jax.Array] = None,
    monitor: Optional[Monitor] = None,
    trainable_mask: Optional[Dict] = None,
) -> Dict:
    """Host-loop Adam over a dispatch-bounded MLL evaluator (round-4).

    The twin of :func:`train_full_batch_adam` for runtimes with a
    per-program execution budget (docs/PERF.md round-4: ~60 s watchdog):
    ``value_grad_fn(params, key) -> (mll_value, mll_grads, info)`` runs
    EAGERLY as a host loop of bounded device dispatches —
    ``IterGPR.log_marginal_likelihood_chunked`` is the canonical evaluator
    — so no single program scales with the CG iteration count.  Only the
    optimizer update is jitted (one tiny param-shaped program, compiled
    once).  The evaluator returns the *marginal likelihood* and its
    gradients; the trainer ASCENDS it (negates into Adam's descent).

    Steps whose ``info["converged"]`` is false are counted and reported via
    a single RuntimeWarning at the end — matching the CG-stats callback's
    honesty contract (an unconverged chunk budget biases the gradient
    silently otherwise).
    """
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    if key is None:
        key = jax.random.PRNGKey(0)
    mask = (
        None if trainable_mask is None
        else _expand_trainable_mask(trainable_mask, params)
    )

    @jax.jit
    def apply(p, s, mll_grads):
        grads = jax.tree_util.tree_map(lambda g: -g, mll_grads)
        if mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.where(m, g, 0.0), grads, mask
            )
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s

    unconverged = 0
    for i in range(int(iterations)):
        key, sub = jax.random.split(key)
        value, grads, info = value_grad_fn(params, sub)
        if not info.get("converged", True):
            unconverged += 1
        params, opt_state = apply(params, opt_state, grads)
        if monitor is not None:
            monitor.add_scalar("train/loss", -float(value), i)
            monitor(i, params)
    if monitor is not None:
        monitor.flush()
    if unconverged:
        warnings.warn(
            f"train_chunked_adam: {unconverged}/{int(iterations)} steps hit "
            "the chunk budget unconverged — raise max_chunks/chunk_iterations "
            "or loosen the CG target",
            RuntimeWarning,
        )
    return params


def train_using_lbfgs_and_update(
    params: Dict,
    loss_fn: Callable[[Dict], Array],
    max_iterations: int,
    update_fn: Optional[UpdateFn] = None,
    trainable_mask: Optional[Dict] = None,
    monitor: Optional[Monitor] = None,
) -> Dict:
    """scipy L-BFGS-B over the raveled pytree (reference optimize.py:153-195).

    ``loss_fn(params)`` must be deterministic (GPR/SGPR objectives).  Frozen
    leaves get zero gradients, so L-BFGS-B leaves them in place.  The
    ``step_callback`` contract — update inducing state + run the monitor every
    optimizer iteration (:172-187) — is preserved via scipy's ``callback``.
    Shape-changing updates are not allowed inside L-BFGS (the raveled vector
    length is fixed); the reference has the same constraint.
    """
    from scipy.optimize import minimize

    if max_iterations <= 0:
        return params

    # Non-trainable leaves are carried OUTSIDE the optimization vector so the
    # update_fn can modify them mid-run without invalidating x.
    flat0, unravel = ravel_pytree(params)
    mask_flat = (
        jnp.ones_like(flat0, dtype=bool)
        if trainable_mask is None
        else ravel_pytree(_expand_trainable_mask(trainable_mask, params))[0].astype(bool)
    )

    state = {"params": params, "iteration": 0}

    @jax.jit
    def value_and_grad(x, frozen_flat):
        merged = jnp.where(mask_flat, x, frozen_flat)
        p = unravel(merged)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        g_flat, _ = ravel_pytree(grads)
        return loss, jnp.where(mask_flat, g_flat, 0.0)

    def objective(x64):
        x = jnp.asarray(x64, dtype=flat0.dtype)
        frozen_flat, _ = ravel_pytree(state["params"])
        loss, grad = value_and_grad(x, frozen_flat)
        return float(loss), np.asarray(grad, dtype=np.float64)

    def callback(x64):
        x = jnp.asarray(x64, dtype=flat0.dtype)
        frozen_flat, _ = ravel_pytree(state["params"])
        merged = jnp.where(mask_flat, x, frozen_flat)
        state["params"] = unravel(merged)
        if update_fn is not None:
            state["params"] = update_fn(state["params"])
        if monitor is not None:
            monitor(state["iteration"], state["params"])
        state["iteration"] += 1

    result = minimize(
        objective,
        np.asarray(flat0, dtype=np.float64),
        jac=True,
        method="L-BFGS-B",
        options={"maxiter": int(max_iterations)},
        callback=callback,
    )
    x = jnp.asarray(result.x, dtype=flat0.dtype)
    frozen_flat, _ = ravel_pytree(state["params"])
    final = unravel(jnp.where(mask_flat, x, frozen_flat))
    if monitor is not None:
        monitor.flush()
    return final


def train_using_device_lbfgs(
    params: Dict,
    loss_fn: Callable[[Dict], Array],
    max_iterations: int,
    trainable_mask: Optional[Dict] = None,
    monitor: Optional[Monitor] = None,
    record_step: int = 50,
    memory_size: int = 10,
) -> Dict:
    """Device-resident L-BFGS: the whole optimization runs under ``jit``.

    The reference's L-BFGS (and our scipy twin above) pays one
    host<->device round trip per iteration — loss+grad fetched to the host,
    scipy proposes the next point, arrays shipped back (SURVEY §3.3:
    "HOST scipy L-BFGS-B <-> DEVICE jit'd loss/grad round trips").  Here
    ``optax.lbfgs`` (two-loop recursion + zoom line search) steps inside a
    ``lax.scan``, so a whole chunk of iterations is ONE dispatch — the same
    lever that took Adam training from 5 to 59 steps/s (docs/PERF.md).

    Frozen leaves (``trainable_mask``) have their gradients zeroed; with a
    zero gradient history their L-BFGS direction components stay exactly
    zero, so the line search never moves them.  The monitor fires between
    scan chunks of ``record_step`` iterations (labels mark chunk ends).
    Shape-changing update_fns are not supported (same constraint as the
    raveled scipy path); use the scipy twin for covertree-style updates.
    """
    import optax

    if max_iterations <= 0:
        return params

    opt = optax.lbfgs(memory_size=memory_size)

    if trainable_mask is not None:
        # The mask may be a PREFIX tree (e.g. {"kernel": True, ...} freezing
        # a whole subtree): expand each bool over its params subtree.
        grad_mask = _expand_trainable_mask(trainable_mask, params)
    else:
        grad_mask = None

    def masked_value_and_grad(p):
        value, grads = jax.value_and_grad(loss_fn)(p)
        if grad_mask is not None:
            grads = jax.tree_util.tree_map(jnp.multiply, grads, grad_mask)
        return value, grads

    def step(carry, _):
        p, s = carry
        value, grads = masked_value_and_grad(p)
        updates, s = opt.update(
            grads, s, p, value=value, grad=grads, value_fn=loss_fn
        )
        p = optax.apply_updates(p, updates)
        return (p, s), value

    @functools.partial(jax.jit, static_argnames="length")
    def run_chunk(p, s, length):
        return jax.lax.scan(step, (p, s), None, length=length)

    opt_state = opt.init(params)
    chunk = max(1, min(int(record_step), int(max_iterations)))
    done = 0
    while done < max_iterations:
        n = min(chunk, max_iterations - done)
        # length is a static arg per distinct value; only the first and
        # (possibly shorter) last chunk compile.
        (params, opt_state), losses = run_chunk(params, opt_state, n)
        done += n
        if monitor is not None:
            monitor(done, params)
    if monitor is not None:
        monitor.flush()
    return params


def train_vanilla_using_lbfgs(
    params: Dict,
    loss_fn: Callable[[Dict], Array],
    max_iterations: int,
    trainable_mask: Optional[Dict] = None,
) -> Dict:
    """Plain L-BFGS with no inducing update and no monitor
    (reference optimize.py:132-150 ``train_vanilla_using_lbfgs``)."""
    return train_using_lbfgs_and_update(
        params, loss_fn, max_iterations, trainable_mask=trainable_mask
    )


def train_vanilla_using_lbfgs_and_standard_ip_update(
    params: Dict,
    loss_fn: Callable[[Dict], Array],
    clustering_fn: Callable[[], Array],
    max_iterations: int,
    trainable_mask: Optional[Dict] = None,
) -> Dict:
    """L-BFGS re-assigning ONLY the inducing inputs Z from ``clustering_fn``
    after every gradient step (reference optimize.py:101-129).  The reference
    carries a warning that re-clustering every step can converge to poor
    local minima (:113-116) — preserved behaviour, preserved caveat.  The
    clustering must return a same-shape Z (no M changes inside L-BFGS).

    Z is excluded from the L-BFGS vector (it is *assigned*, not optimized —
    otherwise the line search would immediately overwrite each assignment).
    """

    def update_fn(p: Dict) -> Dict:
        new_iv = jnp.asarray(clustering_fn(), dtype=p["inducing_points"].dtype)
        out = dict(p)
        out["inducing_points"] = new_iv
        return out

    if trainable_mask is None:
        trainable_mask = jax.tree_util.tree_map(lambda _: True, params)
    else:
        trainable_mask = dict(trainable_mask)
    trainable_mask["inducing_points"] = jax.tree_util.tree_map(
        lambda _: False, params["inducing_points"]
    )

    return train_using_lbfgs_and_update(
        params, loss_fn, max_iterations, update_fn=update_fn,
        trainable_mask=trainable_mask,
    )


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def make_metrics_callback(
    model,
    train_data: Tuple[Array, Array],
    test_data: Tuple[Array, Array],
    batch_size: int = 4096,
    key: Optional[jax.Array] = None,
    check_numerics: bool = True,
    use_jit: bool = True,
) -> Callable:
    """Batched test RMSE + NLPD and train ELBO (reference optimize.py:285-364).

    Returns ``metrics_fn(step, params) -> dict``; the training loops pass
    their live parameter pytree through the monitor (the reference's
    callbacks read live GPflow variables instead).
    """
    x_test, y_test = test_data
    n_test = x_test.shape[0]
    predict_f = bind_predict_fn(model, train_data)

    def predict_batch(params, xb, yb):
        f_mean, f_var = predict_f(params, xb)
        lpd = model.likelihood.predict_log_density(params["likelihood"], f_mean, f_var, yb)
        sq_err = jnp.square(yb - f_mean)
        return jnp.sum(sq_err), jnp.sum(lpd)

    def elbo_batch(params, xb, yb, key):
        return model.elbo(params, (xb, yb), key) if _takes_key(model) else model.elbo(
            params, (xb, yb)
        )

    if use_jit:
        predict_batch = jax.jit(predict_batch)
        elbo_batch = jax.jit(elbo_batch)

    def metrics_fn(step: int, params: Dict) -> Dict:
        # Accumulate ON DEVICE and fetch once: a float() per batch costs a
        # host sync each (~30 ms on remote-tunnel devices, x N/batch batches).
        sq_err_total = None
        lpd_total = None
        for idx in batched_indices(n_test, batch_size):
            se, lpd = predict_batch(params, x_test[idx], y_test[idx])
            sq_err_total = se if sq_err_total is None else sq_err_total + se
            lpd_total = lpd if lpd_total is None else lpd_total + lpd
        rmse = float(jnp.sqrt(sq_err_total / n_test))
        nlpd = float(-lpd_total / n_test)

        x_train, y_train = train_data
        elbo_key = key if key is not None else jax.random.PRNGKey(0)
        n_eval = min(x_train.shape[0], batch_size)
        elbo = float(elbo_batch(params, x_train[:n_eval], y_train[:n_eval], elbo_key))
        if check_numerics and not np.isfinite(elbo):
            raise FloatingPointError(f"non-finite ELBO at step {step}: {elbo}")
        return {"test/rmse": rmse, "test/nlpd": nlpd, "train/elbo": elbo}

    return metrics_fn


def _takes_key(model) -> bool:
    import inspect

    try:
        return "key" in inspect.signature(model.elbo).parameters
    except (TypeError, ValueError):
        return False


def bind_predict_fn(model, train_data):
    """Uniform ``predict(params, x) -> (mean, var)`` over both model families:
    external-data variational models (``predict_f(params, x_new)``) and
    internal-data models like SGPR/GPR whose predict needs the training set
    (``predict_f(params, data, x_new)`` — the reference gets this for free
    from GPflow's InternalDataTrainingLossMixin)."""
    import inspect

    if "data" in inspect.signature(model.predict_f).parameters:
        return lambda params, x: model.predict_f(params, train_data, x, full_cov=False)
    return lambda params, x: model.predict_f(params, x, full_cov=False)


def make_cg_stats_callback(model, data: Tuple[Array, Array],
                           batch_size: int = 2048,
                           key: Optional[jax.Array] = None,
                           use_jit: bool = True) -> Callable:
    """Monitor callback logging the per-step CG iteration count and residual
    (SURVEY.md section 5: solver stats as first-class observability).

    Also flags UNCONVERGED solves: the reference facade silently drops stats
    (conjugate_gradient.py:204-212), and the production fused solve has been
    measured running into the iteration cap under the reference's absolute
    default threshold (docs/PERF.md) — silently-wrong training.  When the
    solver stops at its iteration cap a ``cg/unconverged`` scalar is logged
    and a one-time host warning is emitted.
    """
    import warnings as _warnings

    x, y = data
    n_eval = min(x.shape[0], batch_size)
    batch = (x[:n_eval], y[:n_eval])
    base_key = key if key is not None else jax.random.PRNGKey(0)
    stats_fn = model.cg_stats
    if use_jit:
        stats_fn = jax.jit(stats_fn)

    # Iteration cap of the model's solver: CGGP carries a ConjugateGradient
    # facade; ShardedCGGP carries max_cg_iterations directly.
    if hasattr(model, "conjugate_gradient"):
        cap = model.conjugate_gradient.max_iterations  # may be None (=> M)
    else:
        cap = getattr(model, "max_cg_iterations", None)
    was_unconverged = [False]

    def cg_stats_fn(step: int, params: Dict) -> Dict:
        stats = stats_fn(params, batch, jax.random.fold_in(base_key, step))
        steps = int(stats.steps)
        max_error = float(np.max(np.asarray(stats.error)))
        limit = cap if cap is not None else params["inducing_points"].shape[0]
        if getattr(stats, "converged", None) is not None:
            # The loop re-evaluates its own stop rule at exit, so this is
            # exact — no false positive when the solve converges on the
            # last permitted iteration.
            unconverged = not bool(stats.converged)
        else:
            # Fallback for stats without the flag: reaching the cap usually
            # means the stop rule was still unmet.
            unconverged = steps >= int(limit)
        # Warn on each converged->unconverged TRANSITION (not just once):
        # a later training phase going unconverged should not be silenced
        # by an earlier warning.
        newly = unconverged and not was_unconverged[0]
        was_unconverged[0] = unconverged
        if newly:
            # steps can be below the cap (e.g. bf16_ir exhausting its
            # refinement cycles): report what actually happened.
            how = (
                f"hit max_iterations={limit}" if steps >= int(limit)
                else f"stopped after {steps} iterations (cap {limit})"
            )
            _warnings.warn(
                f"CG solve {how} without converging at "
                f"step {step} (residual 0.5*rz={max_error:.3e}). Results may "
                "be silently inaccurate — raise max_iterations, enable "
                "relative_threshold, or add a preconditioner (pivchol/rff).",
                RuntimeWarning,
                stacklevel=2,
            )
        return {
            "cg/steps": steps,
            "cg/max_error": max_error,
            "cg/unconverged": int(unconverged),
        }

    return cg_stats_fn


def make_param_callback(model) -> Callable:
    """Constrained kernel/likelihood parameter dump (reference optimize.py:267-282)."""

    def param_fn(step: int, params: Dict) -> Dict:
        del step
        out = {}
        constrained = model.kernel.constrained(params["kernel"])
        for name, value in constrained.items():
            value = np.asarray(value)
            if value.ndim == 0:
                out[f"kernel/{name}"] = value
            else:
                for i, v in enumerate(value.reshape(-1)):
                    out[f"kernel/{name}[{i}]"] = np.asarray(v)
        out["likelihood/variance"] = np.asarray(
            model.likelihood.variance(params["likelihood"])
        )
        return out

    return param_fn


def create_monitor(
    logdir: Optional[str],
    metrics_fn: Optional[Callable] = None,
    param_fn: Optional[Callable] = None,
    record_step: int = 100,
    use_tensorboard: bool = True,
) -> Monitor:
    """Assemble the standard monitor (reference optimize.py:367-389)."""
    monitor = Monitor(logdir, use_tensorboard=use_tensorboard)
    if metrics_fn is not None:
        monitor.add_callback("metrics", metrics_fn, record_step=record_step)
    if param_fn is not None:
        monitor.add_callback("params", param_fn, record_step=record_step)
    return monitor



@functools.lru_cache(maxsize=64)
def _cached_predict_jit(model):
    return jax.jit(lambda p, xb: model.predict_f(p, xb, full_cov=False))


@functools.lru_cache(maxsize=64)
def _posterior_takes_solver(model) -> bool:
    import inspect

    return "solver" in inspect.signature(model.posterior).parameters


@functools.lru_cache(maxsize=64)
def _cached_posterior_jits(model, solver: str = "auto", mesh=None):
    if _posterior_takes_solver(model):
        build = jax.jit(functools.partial(model.posterior, solver=solver))
    else:
        # Cholesky-family models (GPR/SGPR/ClusterGP/LpSVGP) have a single
        # natural serving path; the solver knob is CGGP-specific.
        build = jax.jit(model.posterior)
    predict_kw, mean_kw = {}, {}
    if mesh is not None:
        # Data-parallel serving: query rows sharded over the mesh, the
        # posterior cache replicated; GSPMD partitions the per-batch kernel
        # block + solve over rows (they are row-independent) and the
        # outputs come back row-sharded.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cggp_tpu.parallel.mesh import DATA_AXIS

        rows = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        predict_kw = dict(in_shardings=(repl, rows), out_shardings=(rows, rows))
        mean_kw = dict(in_shardings=(repl, rows), out_shardings=rows)
    return (
        build,
        jax.jit(lambda post, xb: model.posterior_predict(post, xb, full_cov=False),
                **predict_kw),
        jax.jit(model.posterior_mean, **mean_kw),
    )


@functools.lru_cache(maxsize=64)
def _posterior_takes_data(model) -> bool:
    """Internal-data models (GPR/SGPR) bind the training set into the cache:
    ``posterior(params, data)``; variational models are params-only."""
    import inspect

    return "data" in inspect.signature(model.posterior).parameters


@functools.lru_cache(maxsize=64)
def _cached_scan_jit(model, batch_size: int, mean_only: bool, mesh=None):
    """Jitted one-dispatch serving sweep, cached per (model, batch, mode,
    mesh) — same rationale as :func:`_cached_posterior_jits`: a fresh
    closure per call would re-trace AND re-compile the whole lax.map
    program every serve (minutes through a remote-device tunnel)."""
    return jax.jit(lambda post, xq: posterior_predict_scan(
        model, post, xq, batch_size=batch_size, mean_only=mean_only,
        mesh=mesh))


def auto_serving_batch_size(m: int, n: int, floor: int = 8192,
                            cap: int = 65536,
                            block_budget: int = 2 ** 27) -> int:
    """DISPATCH-LOOP serving batch that amortizes per-batch host latency.

    Chip A/B at M=1024, 512k points, best of 3, cache build excluded
    (scripts/serving_batch_chip.py): the python dispatch loop pays 1.5-5 ms
    tunnel latency per batch, so fewer-bigger batches serve more — 3.01M ->
    4.60M points/s from T=8192 to T=65536 (+53%), dipping to 4.28M at
    131072.  The one-dispatch scan route is the control: it has no
    per-batch host cost and its throughput strictly FALLS with T (5.61M at
    8192 -> 4.43M at 131072 — XLA blocks the smaller [M, T] programs
    better), so this rule applies to the LOOP route only; the scan keeps
    the caller's batch (default 8192).

    Memory wall: the [M, T] Kmn block (plus solve workspace) must fit HBM —
    M=4096 at T=65536 (M*T = 2^28) fails to build on the 16 GB chip while
    every measured M*T <= 2^27 cell runs.

    Returns the largest power-of-two T with ``m * T <= block_budget``,
    clamped to ``[floor, cap]`` = [8192, 65536] (never below the proven
    default; 65536 is the measured loop peak) and to the dataset size —
    a batch never exceeds n, so tiny datasets serve as ONE exact-size
    block with no phantom padding rows.
    """
    t = block_budget // max(int(m), 1)
    t = 1 << max(t.bit_length() - 1, 0)  # power-of-two floor
    t = max(floor, min(t, cap))
    return min(t, max(int(n), 1))


def _serving_system_rows(model, params: Dict, train_data) -> Optional[int]:
    """Row count M of the per-batch serving system (the [M, T] kernel-block
    factor/solve), for :func:`auto_serving_batch_size` — the inducing count
    for the sparse families, the train size for the data-bound exact models
    (GPR/SGPR/IterGPR).  ``None`` = unknown (caller keeps its default)."""
    z = params.get("inducing_points") if hasattr(params, "get") else None
    if z is not None:
        return int(z.shape[0])
    if train_data is not None:
        return int(train_data[0].shape[0])
    return None


def predict_in_batches(model, params: Dict, x: Array, batch_size=8192,
                       train_data: Optional[Tuple[Array, Array]] = None,
                       mean_only: bool = False, use_posterior: bool = True,
                       posterior_solver: str = "auto", mesh=None,
                       scan: object = "auto", posterior=None,
                       chunk_iterations: int = 0):
    """Full-dataset posterior (mean, var), asynchronously pipelined (net-new).

    One jitted predict per fixed-size batch, dispatched back-to-back with NO
    host syncs in the loop (results are concatenated on device, fetched by
    the caller).  JAX's async dispatch pipelines the batches, so wall time is
    device compute, not per-batch round trips.

    Measured NEGATIVE alternative (documented so it is not re-attempted): a
    single ``lax.map``/``scan`` over the batches — "one dispatch total" —
    runs the CG ``while_loop`` 12-20x SLOWER inside the scan on TPU (305k ->
    9k points/s at reference scale); dynamic while_loops nested in scan hit
    an XLA performance cliff.  The async python loop is the fast shape.

    When the model exposes a ``posterior()`` cache (CGGP) and ``use_posterior``
    is on, the per-params state — ``(Kmm+Lambda)^{-1} u`` and the
    preconditioner — is built ONCE instead of per batch (measured +23% on
    mean+variance at reference scale), and ``mean_only=True`` serves the
    posterior mean without ANY per-batch CG (measured 16x, 2.0M points/s) —
    the common shape for ranking/regression serving.  ``mean_only`` returns
    ``(mean, None)``.

    ``posterior_solver`` ("auto"/"chol"/"cg") is forwarded to models whose
    ``posterior()`` takes a solver (CGGP/ShardedCGGP); "auto" falls back to
    CG automatically if the Cholesky factor comes back non-finite.

    ``mesh`` (net-new, round 3) serves DATA-PARALLEL: query rows of each
    batch are sharded over the mesh with the posterior cache replicated
    (serving twin of the trainer's dp mode).  Requires the posterior-cache
    path and a single-device-style model — a model that runs its own
    shard_map collectives over the same mesh (ShardedCGGP) would conflict
    with row-sharded inputs and is rejected.

    ``batch_size="auto"`` (net-new, round 3) sizes the DISPATCH-LOOP batch
    via :func:`auto_serving_batch_size` — each python-loop batch pays a
    1.5-5 ms host round trip, so the biggest [M, T] kernel block that fits
    HBM serves up to +53% more points/s at small M (chip A/B in
    scripts/serving_batch_chip.py).  The one-dispatch scan route has no
    per-batch host cost and measures FASTER at the 8192 default, so "auto"
    keeps the scan at 8192; an int fixes BOTH routes to the caller's exact
    chunking.

    ``scan`` (net-new, round 3): ``"auto"`` routes SOLVE-FREE posterior
    caches (chol / LOVE) through :func:`posterior_predict_scan` — the whole
    sweep as one device dispatch, removing per-batch host round trips
    (chip-measured: identical mean+var throughput at a dispatch-free 1%
    variance, mean-only 25.6M vs the loop's 2.2-8.6M points/s at reference
    scale).  ``False`` keeps the python loop; ``True`` forces the scan even
    for a CG posterior (see the cliff warning above).  ``mesh`` serving
    composes with the scan (round 3): each block's rows are
    sharding-constrained inside the ``lax.map`` body so the data-parallel
    sweep is one dispatch too; any scan build failure falls back to the
    mesh dispatch loop.

    ``posterior`` (net-new, round 3): a prebuilt serving cache — e.g. one
    persisted with :func:`cggp_tpu.utils.save_posterior` and read back with
    ``load_posterior`` — serves directly, skipping the per-params cache
    build (the factorization / CG solves).  Routing still applies: the
    cache's own solver fields pick the scan/loop path, and a corrupt
    Cholesky factor fails loudly instead of serving NaNs.
    """
    if mesh is not None:
        if not use_posterior:
            raise ValueError("mesh serving requires the posterior-cache path")
        if getattr(model, "mesh", None) is not None:
            raise ValueError(
                f"{type(model).__name__} runs its own mesh collectives; "
                "data-parallel query sharding composes with single-device "
                "models (CGGP/ImplicitCGGP/Cholesky families) only"
            )
    n = x.shape[0]
    scan_batch = batch_size
    if batch_size == "auto":
        # Latency-amortizing DISPATCH-LOOP batch (auto_serving_batch_size):
        # each python-loop batch pays a host round trip, so serve the
        # biggest [M, T] block that fits.  The one-dispatch scan route has
        # no per-batch host cost and measures FASTER at the small default
        # (its per-block program blocks better), so it keeps 8192.
        m_rows = _serving_system_rows(model, params, train_data)
        batch_size = 8192 if m_rows is None \
            else auto_serving_batch_size(m_rows, n)
        scan_batch = 8192
    batch_size = min(int(batch_size), n)
    scan_batch = min(int(scan_batch), n)
    if mesh is not None and batch_size % mesh.devices.size != 0:
        # Round the batch UP to a mesh multiple (x is padded to a batch
        # multiple below anyway, so this only changes the chunking).
        d = mesh.devices.size
        batch_size = min(-(-batch_size // d) * d, -(-n // d) * d)
    num_batches = -(-n // batch_size)
    pad = num_batches * batch_size - n

    def _padded():
        # Deferred: the scan route pads internally, so the loop/probe copy
        # would be a wasted O(N*d) device allocation on the default path.
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (pad, x.shape[-1]))], axis=0
        ) if pad else x

    # The cache applies when the model's posterior() signature matches what
    # the caller can supply: params-only models without a train_data
    # override, data-bound models (GPR/SGPR) with one.
    posterior_capable = use_posterior and hasattr(model, "posterior") and (
        (train_data is not None) == _posterior_takes_data(model)
    )
    if mean_only and not posterior_capable:
        raise ValueError(
            "mean_only serving needs a posterior()-capable model"
        )
    if scan is True and not posterior_capable:
        raise ValueError(
            "scan=True needs the posterior-cache path (use_posterior=True, "
            "a posterior()-capable model, matching train_data)"
        )
    if posterior is not None and not posterior_capable:
        raise ValueError(
            "posterior= injection needs the posterior-cache path "
            "(use_posterior=True, a posterior()-capable model, matching "
            "train_data)"
        )

    if posterior_capable:
        # Resolve "auto" EAGERLY before jitting: inside jit the system
        # matrix is a tracer and the model's auto rule silently degrades to
        # the size-only choice — the conditioning-aware estimate (Lanczos
        # extremal Ritz values) only exists out here (round-3 review
        # finding: the production serving path never ran it).
        requested_solver = posterior_solver
        if posterior is not None:
            # Serve from a prebuilt cache (e.g. load_posterior): the build
            # — the expensive factorization/solve — is skipped entirely;
            # routing (scan vs loop, probe guards) keys off the cache's own
            # solver fields.  A corrupt loaded chol factor fails loudly via
            # the finite-factor guard below (requested_solver is concrete).
            posterior_solver = (
                "chol" if getattr(posterior, "chol", None) is not None
                else "lanczos"
                if getattr(posterior, "lanczos_r", None) is not None
                else "cg"
            )
            requested_solver = posterior_solver
        elif posterior_solver == "auto" and _posterior_takes_solver(model):
            resolver = getattr(model, "resolve_serving_solver", None)
            if resolver is not None:
                posterior_solver = resolver(params)
        # Models are frozen (hashable) dataclasses: cache the jitted programs
        # per model so repeated calls reuse the compiled executables — a
        # fresh closure per call would re-trace AND re-compile every time
        # (minutes through a remote-device tunnel).
        build, post_predict, post_mean = _cached_posterior_jits(
            model, posterior_solver, mesh
        )
        if posterior is not None:
            post = posterior
        else:
            post = build(params, train_data) if _posterior_takes_data(model) \
                else build(params)
        # auto/chol guard: a raw Cholesky of an ill-conditioned Kmm+Lambda
        # NaNs silently (exactly the regime CGGP's preconditioned CG exists
        # for).  One [M] host check per cache build (not per batch); on a
        # non-finite factor fall back to the CG serving path.  Only for
        # solver-aware models (CGGP/ShardedCGGP): the Cholesky families
        # (GPR/ClusterGP/LpSVGP) have no CG path to fall back to, so a
        # non-finite factor there just surfaces as NaN outputs.
        if (
            posterior_solver != "cg"
            and _posterior_takes_solver(model)
            and getattr(post, "chol", None) is not None
            and not bool(jnp.all(jnp.isfinite(jnp.diagonal(post.chol))))
        ):
            # An EXPLICIT chol request fails loudly; an auto-RESOLVED chol
            # (requested "auto") falls back to CG like before.
            if requested_solver == "chol":
                raise FloatingPointError(
                    "posterior(solver='chol'): non-finite Cholesky factor — "
                    "Kmm+Lambda is too ill-conditioned for a raw fp32 "
                    "factorization; use posterior_solver='cg'"
                )
            warnings.warn(
                "posterior(solver='auto'): Cholesky factor is non-finite "
                "(ill-conditioned Kmm+Lambda); falling back to CG serving",
                RuntimeWarning,
            )
            build, post_predict, post_mean = _cached_posterior_jits(model, "cg", mesh)
            post = build(params, train_data) if _posterior_takes_data(model) \
                else build(params)
        # mean_only is solve-free for EVERY family (a kmn @ nu matmul);
        # mean+var is solve-free unless the cache's solver fields say the
        # per-batch program is CG (chol/lanczos_r present-but-None — the
        # CGGP/RowCGGP "cg" branch, or IterGPR without a LOVE cache).
        # Decided BEFORE the per-batch probe below: on the scan route the
        # probe's compiled program would never run (a wasted tunnel compile
        # + one batch of compute), and a scan failure falls THROUGH to the
        # probe + loop, which keeps its own chol->cg crash-proofing.
        if (
            chunk_iterations > 0
            and mesh is None
            and not mean_only
            and hasattr(model, "posterior_predict_chunked")
            and _posterior_serves_via_cg(post)
        ):
            # Dispatch-bounded variance serving (round-4): the per-batch CG
            # program of a cg cache runs up to max_cg_iterations in ONE
            # dispatch — past a runtime execution watchdog at large N.
            # Host loop of restarted chunks instead; mean_only and
            # solve-free caches (chol/LOVE) stay on the standard routes.
            x_pad_c = _padded()
            outs = [
                model.posterior_predict_chunked(
                    post, x_pad_c[i * batch_size:(i + 1) * batch_size],
                    chunk_iterations=chunk_iterations)
                for i in range(num_batches)
            ]
            mean = jnp.concatenate([m for m, _ in outs])[:n]
            var = jnp.concatenate([v for _, v in outs])[:n]
            return mean, var
        solve_free = mean_only or not _posterior_serves_via_cg(post)
        use_scan = scan is True or (scan == "auto" and solve_free)
        if use_scan:
            try:
                serve = _cached_scan_jit(model, scan_batch, mean_only, mesh)
                out = serve(post, x)
                # Sync before declaring success: execution failures surface
                # asynchronously (RESOURCE_EXHAUSTED on a memory-tight chip),
                # and escaping this try would crash the caller instead of
                # falling back.  [1]-element fetch, same rationale as the
                # probe below.
                jax.tree_util.tree_map(lambda a: np.asarray(a[:1]), out)
                return out
            except Exception as exc:  # noqa: BLE001 — compile/runtime failure
                # An auto-routed scan falls back to the dispatch loop; a
                # FORCED scan fails loudly.
                if scan is True:
                    raise
                warnings.warn(
                    "posterior_predict_scan failed to build/run "
                    f"({type(exc).__name__}); falling back to the dispatch "
                    "loop",
                    RuntimeWarning,
                )
        x_pad = _padded()
        if requested_solver == "auto" and getattr(post, "chol", None) is not None:
            # Second auto/chol guard: the per-batch triangular-solve PROGRAM
            # itself can fail to build at large M (observed in this
            # environment: the remote compiler dies on the
            # [16384, 16384] x [16384, 8192] cho_solve — the chol CACHE
            # builds fine, so the factor check above passes).  Force-compile
            # one batch now; on any failure fall back to CG serving.  Happy
            # path cost: the compile is free (this warms the exact program
            # the loop below runs first) but the batch's COMPUTE runs twice
            # — one redundant serving batch per cache build, accepted for
            # the crash-proofing.  Fetch only a device-sliced [1] element as
            # the sync point (a full-array fetch would ship the whole batch
            # over the tunnel; plain block_until_ready is unreliable there).
            try:
                probe = x_pad[:batch_size]
                out = post_mean(post, probe) if mean_only \
                    else post_predict(post, probe)
                jax.tree_util.tree_map(lambda a: np.asarray(a[:1]), out)
            except Exception as exc:  # noqa: BLE001 — compile/runtime failure
                warnings.warn(
                    "posterior(solver='auto'): chol serving program failed "
                    f"to build/run ({type(exc).__name__}); falling back to "
                    "CG serving",
                    RuntimeWarning,
                )
                build, post_predict, post_mean = _cached_posterior_jits(
                    model, "cg", mesh)
                post = build(params, train_data) \
                    if _posterior_takes_data(model) else build(params)
        if mean_only:
            means = [
                post_mean(post, x_pad[i * batch_size : (i + 1) * batch_size])
                for i in range(num_batches)
            ]
            return jnp.concatenate(means)[:n], None
        predict = lambda _p, xb: post_predict(post, xb)
    elif train_data is None:
        x_pad = _padded()
        predict = _cached_predict_jit(model)
    else:
        x_pad = _padded()
        predict_f = bind_predict_fn(model, train_data)
        predict = jax.jit(lambda p, xb: predict_f(p, xb))
    means, variances = [], []
    for i in range(num_batches):
        mu, var = predict(params, x_pad[i * batch_size : (i + 1) * batch_size])
        means.append(mu)
        variances.append(var)
    return jnp.concatenate(means)[:n], jnp.concatenate(variances)[:n]


def _posterior_serves_via_cg(post) -> bool:
    """True when a posterior cache's per-batch mean+var program runs CG (a
    ``while_loop``): its solver fields exist but are all unset — the
    CGGP/RowCGGP ``solver="cg"`` branch, or IterGPR without a LOVE cache.
    Caches without solver fields at all (GPR/SGPR/Chol families) and caches
    with a factor or LOVE rows are solve-free."""
    has_solver_fields = hasattr(post, "chol") or hasattr(post, "lanczos_r")
    return (has_solver_fields
            and getattr(post, "chol", None) is None
            and getattr(post, "lanczos_r", None) is None)


def posterior_predict_scan(model, post, x: Array, batch_size: int = 8192,
                           mean_only: bool = False, mesh=None):
    """Whole-dataset serving from a prebuilt posterior cache as ONE device
    program (net-new, TPU-first): ``lax.map`` over fixed-size row blocks.

    Complements :func:`predict_in_batches`, whose docstring records the
    scan-over-CG negative result: with a SOLVE-FREE per-batch program — the
    chol cache's ``cho_solve`` + matmuls, or the LOVE cache's two skinny
    matmuls — there is no ``while_loop`` for the scan to de-optimize, and
    the whole sweep compiles to a single dispatch.  That removes every
    per-batch host round trip: through a remote-device tunnel the python
    loop pays 1.5-5 ms dispatch latency per batch (measured 1.6-5.6M
    points/s run-to-run variance at reference scale, tunnel-state
    dependent); the one-dispatch sweep is dispatch-invariant.  A CG-branch
    posterior (``chol is None`` and no ``lanczos_r``) nests its
    ``while_loop`` inside the scan and regresses 12-20x — route that shape
    through :func:`predict_in_batches` (warned, not rejected: small sweeps
    may still prefer one dispatch).

    ``mesh`` (net-new, round 3): DATA-PARALLEL one-dispatch serving — each
    block's query rows are sharding-constrained over the mesh inside the
    ``lax.map`` body, so GSPMD column-partitions the [M, T] kernel block,
    the per-block solve (triangular solves partition over RHS columns),
    and the row-wise reduces, with the cache replicated and no collectives
    until the final gather.  Requires ``batch_size`` divisible by the mesh
    size.  The model must not run its own mesh collectives (callers guard
    this; ShardedCGGP serves through its own shard_map).

    Jit-composable: wrap in ``jax.jit`` with ``post`` as an argument so
    repeated serves reuse the compiled program.  Returns
    ``(mean [N, P], var [N, 1])`` — or ``(mean, None)`` with ``mean_only``.
    """
    # Weight field name differs per family (nu for the inducing-point
    # caches, alpha for IterGPR) — either works as the under-jit sentinel.
    weights = getattr(post, "nu", None)
    if weights is None:
        weights = getattr(post, "alpha", None)
    if (not mean_only and _posterior_serves_via_cg(post)
            and not isinstance(weights, jax.core.Tracer)):
        warnings.warn(
            "posterior_predict_scan: this posterior serves through CG (no "
            "chol/LOVE cache); the while_loop inside lax.map is 12-20x "
            "slower on TPU — prefer predict_in_batches for this shape",
            RuntimeWarning,
        )
    n = x.shape[0]
    batch_size = min(int(batch_size), n)
    constrain_rows = lambda a: a  # noqa: E731 — identity off-mesh
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from cggp_tpu.parallel.mesh import DATA_AXIS

        if batch_size % mesh.devices.size != 0:
            # Round UP to a mesh multiple (x is padded to a batch multiple
            # below anyway); rounding down could silently drop devices.
            dsize = mesh.devices.size
            batch_size = min(-(-batch_size // dsize) * dsize,
                             -(-n // dsize) * dsize)

        def constrain_rows(a):
            spec = PartitionSpec(DATA_AXIS, *([None] * (a.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, spec))

    blocks = pad_rows_to_blocks(x, batch_size)
    if mean_only:
        mu = jax.lax.map(
            lambda xb: constrain_rows(
                model.posterior_mean(post, constrain_rows(xb))), blocks)
        return mu.reshape(-1, mu.shape[-1])[:n], None

    def block_predict(xb):
        mu, var = model.posterior_predict(post, constrain_rows(xb),
                                          full_cov=False)
        return constrain_rows(mu), constrain_rows(var)

    mu, var = jax.lax.map(block_predict, blocks)
    return (mu.reshape(-1, mu.shape[-1])[:n],
            var.reshape(-1, var.shape[-1])[:n])


def make_streaming_ingest_fn(model, resolution: float,
                             block_size: int = 4096,
                             posterior_solver: str = "chol"):
    """Build ``ingest(params, x_new, y_new) -> (params', posterior')`` — the
    whole streaming-serving update as ONE jitted program (net-new, TPU-first).

    Requires capacity-padded params (``init_params(capacity=...)``): the
    inducing buffers keep a static shape, so net growth
    (:func:`~cggp_tpu.selection.covernet.covernet_extend_update_padded`),
    the sufficient-statistics merge, the parameter swap
    (``assign_clusters_device``), and the serving-cache rebuild
    (``model.posterior``) all trace ONCE — every later ingest is a single
    device dispatch, and downstream serving programs never recompile either.

    This is the production TPU answer to streaming ingestion.  The eager
    alternative (``covernet_extend_update`` + ``posterior_extend``) saves
    factor FLOPs with bordered algebra but pays ~15 small dispatches, which
    through a remote-device link costs MORE than the O(M^3) rebuild it
    avoids at M <= 8192 (chip A/B in scripts/streaming_chip.py) — use it for
    compute-bound backends or M past the capacity a padded buffer can hold.

    ``posterior_solver`` picks the cache branch at trace time ("chol" — the
    fp32-safe default at padded capacities <= 16384 — or "cg"); "auto" is
    rejected because its conditioning estimate cannot run under jit
    (``CGGP.posterior`` docstring).  The capacity truncation caveat of the
    padded update applies: watch ``mask.sum()`` for saturation.
    """
    if posterior_solver not in ("chol", "cg"):
        raise ValueError(
            "posterior_solver must be 'chol' or 'cg' for the jitted ingest "
            "(the 'auto' conditioning estimate cannot run under jit)"
        )
    from cggp_tpu.selection.covernet import covernet_extend_update_padded

    @jax.jit
    def ingest(params: Dict, x_new: Array, y_new: Array):
        if "inducing_mask" not in params:
            raise ValueError(
                "make_streaming_ingest_fn requires capacity-padded params "
                "(init_params(capacity=...)) — static shapes are what make "
                "the ingest a single compiled program"
            )
        z, u, counts, mask = covernet_extend_update_padded(
            params["inducing_points"], params["pseudo_u"],
            params["cluster_counts"], params["inducing_mask"],
            (x_new, y_new), resolution, block_size=block_size,
        )
        new_params = model.assign_clusters_device(params, z, u, counts, mask)
        post = model.posterior(new_params, solver=posterior_solver)
        return new_params, post

    return ingest
