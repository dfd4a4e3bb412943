"""CG vs Cholesky on cluster-conditioned systems
(legacy/playground_conjugate_gradient.py equivalent).

Shows how cover-tree minimum separation controls CG iteration counts:
sweeps the spatial resolution, printing condition number and CG iterations
against the Cholesky-solve residual.
"""

# Runnable without installation: put the repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import synthetic
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.selection.update import covertree_update_inducing_parameters


def main():
    (x, y), _ = synthetic(n=2000, dim=2, seed=0)
    data = jnp.asarray(x), jnp.asarray(y)
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(2, 0.5))
    noise = 0.05

    print(f"{'resolution':>10} {'M':>6} {'cond(Kuu+L)':>12} {'cg_iters':>9} {'|cg-chol|':>10}")
    for resolution in (1.0, 0.5, 0.25, 0.1, 0.05):
        iv, u, counts = covertree_update_inducing_parameters(data, resolution)
        lam = noise / counts[:, 0]
        a = add_diagonal(kernel.K(kp, iv), lam)

        solver = ConjugateGradient(1e-12, max_iterations=iv.shape[0])
        sol_cg, stats = solver.solve_with_stats(a, u)
        sol_chol = jnp.linalg.solve(a, u)

        eig = np.linalg.eigvalsh(np.asarray(a))
        print(f"{resolution:>10.2f} {iv.shape[0]:>6d} {eig.max()/eig.min():>12.1f} "
              f"{int(stats.steps):>9d} {float(jnp.abs(sol_cg - sol_chol).max()):>10.2e}")


if __name__ == "__main__":
    main()
