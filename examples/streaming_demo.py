"""Streaming serving: ingest data blocks into a live model, keep serving.

An online-regression loop with no reference counterpart (the reference
re-clusters from scratch and refactorizes per predict batch,
optimize.py:19-38, models.py:333-345):

1. train a CGGP on an initial region;
2. data blocks from NEW regions arrive one at a time;
3. each block is ingested by the single-dispatch pipeline
   (``make_streaming_ingest_fn``: net growth + statistics merge + parameter
   swap + serving-cache rebuild, ONE compiled program — static shapes via
   ``init_params(capacity=...)``), and the model immediately serves the new
   region;
4. the eager bordered-extension path (``covernet_extend_update`` +
   ``CGGP.posterior_extend``) runs alongside as the compute-bound-backend
   twin, checked for agreement.

Prints per-ingest wall time, net size, and RMSE on the freshly-ingested
region before/after.  Run: python examples/streaming_demo.py
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cggp_tpu.models import CGGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.selection.covernet import (
    covernet_extend_update,
    covernet_update_inducing_parameters,
)
from cggp_tpu.training.optimize import (
    make_streaming_ingest_fn,
    train_using_adam_and_update,
)

RES = 0.35
CAPACITY = 128
BLOCK = 256

rng = np.random.default_rng(0)


def f(x):
    return np.sin(3.0 * x[:, :1]) + 0.3 * x[:, 1:]


def sample_region(lo, hi, n):
    x = rng.uniform(lo, hi, (n, 2)).astype(np.float32)
    y = (f(x) + 0.05 * rng.standard_normal((n, 1))).astype(np.float32)
    return x, y


def main():
    # 1. Train on the initial region.
    xa, ya = sample_region(-1.0, 1.0, 512)
    z, u, c = covernet_update_inducing_parameters((xa, ya), RES, lloyds=0)
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-8, relative_threshold=True),
        num_data=xa.shape[0], num_probes=5, precondition="chol",
    )
    params = model.init_params(z, pseudo_u=u, cluster_counts=c,
                               dtype=jnp.float32, capacity=CAPACITY)
    params = train_using_adam_and_update(
        params, lambda p, b, k: model.training_loss(p, b, k),
        (jnp.asarray(xa), jnp.asarray(ya)),
        iterations=100, batch_size=256, learning_rate=0.02,
        key=jax.random.PRNGKey(1),
        trainable_mask=model.trainable_mask(params),
    )
    print(f"trained: m={int(params['inducing_mask'].sum())} "
          f"(capacity {CAPACITY})")

    ingest = make_streaming_ingest_fn(model, RES)

    # Eager unpadded twin for the agreement check.
    z_e, u_e, c_e = z, u, c
    params_e = {k: v for k, v in params.items() if k != "inducing_mask"}
    m_real = int(params["inducing_mask"].sum())
    params_e["inducing_points"] = params["inducing_points"][:m_real]
    params_e["pseudo_u"] = params["pseudo_u"][:m_real]
    params_e["cluster_counts"] = params["cluster_counts"][:m_real]
    post_e = model.posterior(params_e, solver="cg")

    regions = [(1.0, 1.6), (1.6, 2.2), (-2.2, -1.0)]
    for i, (lo, hi) in enumerate(regions):
        xb, yb = sample_region(lo, hi, BLOCK)
        xq, yq = sample_region(lo, hi, 200)

        post_before = model.posterior(params, solver="chol")
        mu0, _ = model.posterior_predict(post_before, jnp.asarray(xq))
        rmse0 = float(np.sqrt(np.mean((np.asarray(mu0) - yq) ** 2)))

        t0 = time.perf_counter()
        params, post = ingest(params, jnp.asarray(xb), jnp.asarray(yb))
        jax.block_until_ready(post.nu)
        wall = time.perf_counter() - t0

        mu1, _ = model.posterior_predict(post, jnp.asarray(xq))
        rmse1 = float(np.sqrt(np.mean((np.asarray(mu1) - yq) ** 2)))
        m = int(params["inducing_mask"].sum())
        tag = " (compile)" if i == 0 else ""
        print(f"ingest {i}: region [{lo:+.1f},{hi:+.1f}]  m={m:3d}  "
              f"wall={wall:.3f}s{tag}  RMSE {rmse0:.3f} -> {rmse1:.3f}")

        # Eager twin must agree on the served values.
        z_e, u_e, c_e = covernet_extend_update(z_e, u_e, c_e, (xb, yb), RES)
        params_e = model.assign_clusters(params_e, z_e, u_e, c_e)
        post_e = model.posterior_extend(post_e, params_e)
        mu_e, _ = model.posterior_predict(post_e, jnp.asarray(xq))
        agree = float(np.max(np.abs(np.asarray(mu_e) - np.asarray(mu1))))
        assert m == z_e.shape[0], (m, z_e.shape[0])
        print(f"          eager bordered twin agrees to {agree:.1e}")

    print("streaming demo done")


if __name__ == "__main__":
    main()
