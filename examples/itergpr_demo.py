"""Exact GP regression past the Cholesky wall (IterGPR, net-new).

The reference trains exact GPR on a <=10k-row slice because its linear
algebra is an O(N^3) Cholesky (reference paper_cli_gpr.py:60-66).  IterGPR
keeps the exact posterior but runs everything through matrix-free CG —
this demo trains BOTH on the same data and shows (a) the iterative
marginal likelihood / posterior match the dense oracle where the oracle
exists, and (b) the iterative model keeps going at an N where the dense
[N, N] factorization would dominate (or OOM on an accelerator).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/itergpr_demo.py
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.models import GPR, IterGPR
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.training.optimize import train_full_batch_adam


def main():
    (x, y), (xt, yt) = synthetic(n=3000, dim=2, seed=0)
    x, y, xt, yt = map(jnp.asarray, (x, y, xt, yt))
    n = x.shape[0]

    dense = GPR(kernel=Matern32())
    model = IterGPR(
        kernel=Matern32(), error_threshold=1e-10, max_cg_iterations=400,
        relative_threshold=True, num_probes=16, logdet_variant="slq",
        slq_lanczos_iters=30, precondition="pivchol", precond_rank=64,
        block=512,
    )
    params = dense.init_params(x.shape[-1], noise_variance=0.1)

    # -- oracle agreement at a size the dense model still handles ------------
    mll_dense = float(dense.log_marginal_likelihood(params, (x, y)))
    mll_iter = float(model.log_marginal_likelihood(
        params, (x, y), key=jax.random.PRNGKey(0)
    ))
    print(f"N={n}: dense LML {mll_dense:.2f}  |  iterative (SLQ, 16 probes) "
          f"{mll_iter:.2f}  ({100 * abs(mll_iter - mll_dense) / abs(mll_dense):.2f}% off)")

    post_d = dense.posterior(params, (x, y))
    post_i = model.posterior(params, (x, y))
    mu_d, var_d = dense.posterior_predict(post_d, xt[:256])
    mu_i, var_i = model.posterior_predict(post_i, xt[:256])
    print(f"posterior parity: max|dmu|={float(jnp.max(jnp.abs(mu_i - mu_d))):.2e}, "
          f"max|dvar|={float(jnp.max(jnp.abs(var_i - var_d))):.2e}")

    # -- hyperparameter training from a deliberately bad start (fresh probes
    # per step; the MLL does not decompose over rows, so full-batch Adam) ----
    bad = dense.init_params(x.shape[-1], noise_variance=1.0,
                            lengthscales=5.0 * jnp.ones(x.shape[-1]))
    post_bad = model.posterior(bad, (x, y))
    rmse0 = float(jnp.sqrt(jnp.mean(jnp.square(
        yt - model.posterior_mean(post_bad, xt)))))
    t0 = time.perf_counter()
    trained = train_full_batch_adam(
        bad, lambda p, k: model.training_loss(p, (x, y), key=k),
        iterations=30, learning_rate=0.1, key=jax.random.PRNGKey(1),
    )
    dt = time.perf_counter() - t0
    post = model.posterior(trained, (x, y))
    mu, var = model.posterior_predict(post, xt)
    rmse = float(jnp.sqrt(jnp.mean(jnp.square(yt - mu))))
    print(f"30 full-batch Adam steps in {dt:.1f}s: test RMSE "
          f"{rmse0:.4f} (bad hyperparams) -> {rmse:.4f}; "
          f"min predictive var {float(jnp.min(var)):.2e} (must stay > 0)")


if __name__ == "__main__":
    main()
