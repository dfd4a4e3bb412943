"""Cumulative-Cholesky lower bound on log-det vs the exact value vs SLQ
(reference logdet_test.py equivalent — a runnable demo, not a pytest module).

For ``K + sigma_n^2 I`` on 1-D data, the partial Cholesky of the first n
points gives a lower bound on the full log-determinant:

    logdet >= sum_{i<=n} 2 log L_ii + sum_{j>n} log(max(c_j, sigma_n^2))

where ``c_j`` is the conditional variance of point j given the first n minus
a residual-coupling correction (reference logdet_test.py:20-31).  The bound
tightens monotonically toward the exact value as n grows.  The same exact
value is also estimated by stochastic Lanczos quadrature (`slq_logdet`) —
the estimator CGGP uses to report true ELBO values.

Run: JAX_PLATFORMS=cpu python examples/logdet_bounds.py
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)  # fp64: the reference runs under gpflow's default

import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.ops.logdet import slq_logdet

NOISE = 1e-3


def main():
    # synthetic(n=...) returns the 0.67 TRAIN split — size the demo off the
    # actual array, not the requested n (out-of-range jnp indexing clamps
    # silently and would fabricate "bounds" equal to the exact value).
    (x, _y), _ = synthetic(n=200, dim=1, seed=0)
    x = jnp.asarray(x)
    n = int(x.shape[0])

    kernel = SquaredExponential()
    kp = kernel.init_params(dtype=x.dtype)
    k = add_diagonal(kernel.K(kp, x), NOISE * jnp.ones(n, x.dtype))

    chol = jnp.linalg.cholesky(k)
    log_diag = 2.0 * jnp.log(jnp.diag(chol))
    sub_logdets = jnp.cumsum(log_diag)
    exact = float(sub_logdets[-1])

    print(f"exact logdet (Cholesky): {exact:.4f}")

    slq = slq_logdet(
        k, ConjugateGradient(1e-10, max_iterations=n), num_probes=16,
        key=jax.random.PRNGKey(0), lanczos_iters=40,
    )
    print(f"SLQ estimate (16 probes, 40 Lanczos iters): {float(slq):.4f} "
          f"(err {abs(float(slq) - exact):.4f})")

    print("cumulative-Cholesky lower bound (reference logdet_test.py:20-31):")
    prev = -np.inf
    for m in sorted({max(2, round(f * n)) for f in (0.05, 0.12, 0.25, 0.5, 0.75)} | {n - 1}):
        t = jax.scipy.linalg.solve_triangular(
            chol[:m, :m], k[:m, m:], lower=True
        )
        covar = k[m:, m:] - t.T @ t
        covar_diag = jnp.diag(covar)
        off = covar - jnp.diag(covar_diag)
        elementwise = covar_diag - jnp.sum(jnp.square(off), axis=0) / NOISE
        bound = float(
            sub_logdets[m - 1]
            + jnp.sum(jnp.log(jnp.maximum(elementwise, NOISE)))
        )
        gap = exact - bound
        assert bound <= exact + 1e-8, (bound, exact)
        assert bound >= prev - 1e-8, "bound must tighten monotonically"
        prev = bound
        print(f"  n={m:>3d}: bound {bound:>10.4f}  (gap {gap:.4f})")


if __name__ == "__main__":
    main()
