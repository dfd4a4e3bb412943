"""Preconditioned CG on ill-conditioned systems (net-new; no reference twin).

The reference's preconditioner inventory stops at block-Jacobi
(conjugate_gradient.py:137-157) and never uses it in the paper pipeline.
This example shows when preconditioning pays: an SE system whose diagonal
shift is tiny (lambda = 1e-4 .. 1e-6, i.e. huge cluster counts or tight
noise), where plain CG stalls against the iteration cap while the
pivoted-Cholesky SpectralPreconditioner solves it in tens of iterations —
including at fp32 (the regime where the naive Woodbury apply cancels
catastrophically; see docs/PERF.md).
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.ops.cg import ConjugateGradient, pivoted_cholesky_preconditioner
from cggp_tpu.ops.kernels import SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal


def main():
    (x, _y), _ = synthetic(n=1536, dim=2, seed=0)
    x = jnp.asarray(x)
    n = x.shape[0]
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(2, 0.7))
    kmm = kernel.K(kp, x)
    rhs = jnp.asarray(np.random.RandomState(1).standard_normal((n, 4)), x.dtype)

    print(f"{'lambda':>8} {'rank':>5} {'plain_iters':>11} {'pre_iters':>9} "
          f"{'plain_err':>10} {'pre_err':>10}")
    for lam_val in (1e-2, 1e-4, 1e-6):
        lam = lam_val * jnp.ones(n, x.dtype)
        a = add_diagonal(kmm, lam)
        expected = np.linalg.solve(np.asarray(a, np.float64), np.asarray(rhs, np.float64))

        def err(sol):
            return float(np.abs(np.asarray(sol, np.float64) - expected).max()
                         / np.abs(expected).max())

        cap = 2048
        sol_p, st_p = ConjugateGradient(1e-10, max_iterations=cap).solve_with_stats(a, rhs)
        precond = pivoted_cholesky_preconditioner(kmm, lam, 128)
        sol_q, st_q = ConjugateGradient(
            1e-10, preconditioner=precond, max_iterations=cap
        ).solve_with_stats(a, rhs)
        print(f"{lam_val:>8.0e} {128:>5d} {int(st_p.steps):>11d} {int(st_q.steps):>9d} "
              f"{err(sol_p):>10.2e} {err(sol_q):>10.2e}")


if __name__ == "__main__":
    main()
