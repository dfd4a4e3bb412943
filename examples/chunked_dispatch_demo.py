"""Dispatch-bounded solves and exact-GP training (round-4, net-new).

Production runtimes can cap single device-program execution time (the
measured ~60 s watchdog on this repo's TPU tunnel — docs/PERF.md round-4).
This demo shows the two chunked APIs that keep every dispatch bounded while
preserving the single-program results:

1. ``ConjugateGradient.solve_chunked`` — restarted CG in bounded-iteration
   dispatches, each chunk re-anchored on the TRUE residual; the converged
   solution equals the one-program facade solve.
2. ``IterGPR.log_marginal_likelihood_chunked`` — one exact-GP training step
   (MLL value + gradient) assembled from chunked solves plus a
   single-matvec gradient surrogate; with shared probes it matches the
   fused path's value and gradient.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/chunked_dispatch_demo.py
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.models import IterGPR
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32


def main() -> None:
    rng = np.random.RandomState(0)

    # --- 1. chunked solve vs the one-program facade -----------------------
    n = 256
    kernel = Matern32()
    kp = kernel.init_params(1.0, np.ones(2), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    a = kernel.K(kp, z) + jnp.diag(
        jnp.asarray(rng.uniform(0.1, 0.5, (n,)), jnp.float32))
    rhs = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)

    solver = ConjugateGradient(1e-8, max_iterations=n, relative_threshold=True)
    one_program, _ = solver.solve_with_stats(a, rhs)
    chunked, stats = solver.solve_chunked(a, rhs, chunk_iterations=8)
    err = float(jnp.linalg.norm(chunked - one_program)
                / jnp.linalg.norm(one_program))
    print(f"solve_chunked: {int(stats.steps)} total iterations in bounded "
          f"8-iteration dispatches; vs one-program solve rel err {err:.1e} "
          f"(converged={bool(stats.converged)})")

    # --- 2. chunked exact-GP training step --------------------------------
    n = 512
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (n, 2)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x).sum(-1, keepdims=True))
                    + 0.1 * rng.standard_normal((n, 1)), jnp.float32)
    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-8, max_cg_iterations=400,
        num_probes=8, precondition="pivchol", precond_rank=32,
        relative_threshold=True, block=128, logdet_variant="zero",
    )
    params = model.init_params(input_dim=2, dtype=jnp.float32)
    probes = jnp.asarray(rng.choice([-1.0, 1.0], (8, n)), jnp.float32)

    fused_val, fused_grads = jax.jit(jax.value_and_grad(
        lambda p: model.log_marginal_likelihood(p, (x, y), probes=probes)
    ))(params)
    val, grads, info = model.log_marginal_likelihood_chunked(
        params, (x, y), probes=probes, chunk_iterations=8)
    gerr = max(
        float(jnp.max(jnp.abs(ga - gb)))
        for ga, gb in zip(jax.tree_util.tree_leaves(grads),
                          jax.tree_util.tree_leaves(fused_grads)))
    print(f"chunked MLL: value {float(val):.3f} (fused {float(fused_val):.3f}) "
          f"in {info['chunks']} bounded dispatches; max grad abs err {gerr:.1e}")
    print("every device program above ran at most ~one matvec or "
          f"{8} CG iterations — the dispatch-bounded design rule "
          "(docs/DESIGN.md round-4)")


if __name__ == "__main__":
    main()
