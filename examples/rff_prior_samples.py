"""RFF prior samples vs exact Cholesky prior samples
(reference playground_rff.py equivalent).

Draws GP prior samples two ways on a 1-D grid — random Fourier features
(`rff_sample`) and the exact Cholesky factor of ``Kxx + jitter`` — and
compares their empirical moments: per-point variance and the empirical
covariance against the exact kernel matrix.  With enough bases and samples
both converge to the same prior, including for Matern12, whose spectral
density is the heavy-tailed multivariate Student-t (χ² scale mixture).

Run: JAX_PLATFORMS=cpu python examples/rff_prior_samples.py
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)  # fp64: the exact-prior Cholesky on a
# dense 1-D grid is too ill-conditioned for fp32 at jitter=1e-6 (NaN factor)

import jax.numpy as jnp
import numpy as np

from cggp_tpu.ops.kernels import Matern12, Matern52, SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.ops.rff import rff_sample

NUM_BASES = 8_192
NUM_DATA = 200
NUM_SAMPLES = 4_096
LENGTHSCALE = 0.555
VARIANCE = 0.333
JITTER = 1e-6


def main():
    inputs = jnp.linspace(0.0, 10.0, NUM_DATA).reshape(-1, 1)

    for name, kernel in (
        ("se", SquaredExponential()),
        ("matern12", Matern12()),
        ("matern52", Matern52()),
    ):
        kp = kernel.init_params(
            variance=VARIANCE, lengthscales=np.array([LENGTHSCALE]),
            dtype=inputs.dtype,
        )
        kxx = kernel.K(kp, inputs)

        # RFF path: [NUM_SAMPLES, N] prior draws from cos/sin features.
        rff = rff_sample(
            inputs, kernel, kp, NUM_BASES, jax.random.PRNGKey(0),
            num_samples=NUM_SAMPLES,
        )

        # Exact path: chol(Kxx + jitter) @ eps (reference playground_rff.py:36-41).
        chol = jnp.linalg.cholesky(
            add_diagonal(kxx, JITTER * jnp.ones(NUM_DATA, inputs.dtype))
        )
        eps = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_DATA, NUM_SAMPLES), dtype=inputs.dtype
        )
        exact = (chol @ eps).T

        def moment_errors(draws):
            var_err = float(jnp.max(jnp.abs(jnp.var(draws, axis=0) - VARIANCE)))
            emp_cov = draws.T @ draws / draws.shape[0]
            cov_err = float(jnp.max(jnp.abs(emp_cov - kxx)))
            return var_err, cov_err

        rff_var, rff_cov = moment_errors(rff)
        ex_var, ex_cov = moment_errors(exact)
        print(
            f"{name:>8s}: max|var-sigma^2|  rff {rff_var:.4f}  exact {ex_var:.4f}"
            f" | max|emp_cov-K|  rff {rff_cov:.4f}  exact {ex_cov:.4f}"
        )


if __name__ == "__main__":
    main()
