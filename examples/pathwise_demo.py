"""Pathwise (Matheron) ELBO vs the closed-form expectation
(legacy/playground_pathwise.py:58-120 equivalent).

The Monte-Carlo Gaussian likelihood term of PathwiseClusterGP must converge
to ClusterGP's analytic variational expectation as samples grow.
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.models import ClusterGP, PathwiseClusterGP
from cggp_tpu.ops.kernels import SquaredExponential
from cggp_tpu.selection.update import labels_update_inducing_parameters


def main():
    (x, y), _ = synthetic(n=400, dim=1, seed=0)
    x, y = jnp.asarray(x), jnp.asarray(y)
    kernel = SquaredExponential()

    iv, u, counts = labels_update_inducing_parameters((x, y), x[:24])
    analytic = ClusterGP(kernel=kernel, num_data=x.shape[0])
    params = analytic.init_params(iv, pseudo_u=u, cluster_counts=counts)

    f_mean, f_var = analytic.predict_f(params, x)
    exact = float(jnp.sum(analytic.likelihood.variational_expectations(
        params["likelihood"], f_mean, f_var, y)))
    print(f"analytic variational expectation: {exact:.4f}")

    for num_samples in (8, 64, 512, 4096):
        pw = PathwiseClusterGP(kernel=kernel, num_data=x.shape[0],
                               num_samples=num_samples, num_bases=2048)
        mc = float(pw.compute_likelihood_term(params, (x, y), jax.random.PRNGKey(0)))
        print(f"  pathwise MC ({num_samples:>5d} samples): {mc:.4f} "
              f"(err {abs(mc - exact):.4f})")


if __name__ == "__main__":
    main()
