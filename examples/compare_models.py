"""Model comparison on a 1-D dataset: GPR vs SGPR vs ClusterGP vs CDGP.

Runnable equivalent of the reference's legacy/playground_compare_models.py.
Prints an RMSE/NLPD table; all models share the GPR-trained hyperparameters
(the paper's evaluation protocol).

    JAX_PLATFORMS=cpu python examples/compare_models.py
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import load_data
from cggp_tpu.models import CGGP, ClusterGP, GPR, SGPR
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.selection.update import covertree_update_inducing_parameters
from cggp_tpu.training.optimize import (
    bind_predict_fn,
    make_metrics_callback,
    train_using_lbfgs_and_update,
)
from cggp_tpu.utils import assign_flat, flatten_params


def main():
    bundle = load_data("synthetic1d", seed=0, synthetic_n=1000)
    train, test = (
        tuple(map(jnp.asarray, bundle.train)),
        tuple(map(jnp.asarray, bundle.test)),
    )
    n = train[0].shape[0]
    kernel = Matern32()

    gpr = GPR(kernel=kernel)
    gpr_params = train_using_lbfgs_and_update(
        gpr.init_params(input_dim=1), lambda p: gpr.training_loss(p, train), 100
    )
    hyper = flatten_params(gpr_params)

    iv, u, counts = covertree_update_inducing_parameters(train, 0.15)
    print(f"covertree: M={iv.shape[0]} inducing points")

    models = {
        "gpr": (gpr, gpr_params),
        "sgpr": (SGPR(kernel=kernel), None),
        "clustergp": (ClusterGP(kernel=kernel, num_data=n), None),
        "cdgp": (
            CGGP(kernel=kernel, conjugate_gradient=ConjugateGradient(1e-10),
                 num_data=n, num_probes=8),
            None,
        ),
    }

    print(f"{'model':<12} {'rmse':>8} {'nlpd':>8}")
    for name, (model, params) in models.items():
        if params is None:
            params = model.init_params(iv, pseudo_u=u, cluster_counts=counts) \
                if name in ("clustergp", "cdgp") else model.init_params(iv)
            params = assign_flat(params, hyper)
        predict = bind_predict_fn(model, train)
        mu, var = predict(params, test[0])
        rmse = float(jnp.sqrt(jnp.mean(jnp.square(test[1] - mu))))
        nlpd = float(-jnp.mean(model.likelihood.predict_log_density(
            params["likelihood"], mu, var, test[1])))
        print(f"{name:<12} {rmse:8.4f} {nlpd:8.4f}")


if __name__ == "__main__":
    main()
