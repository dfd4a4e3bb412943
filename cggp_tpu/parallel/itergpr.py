"""ShardedIterGPR: exact GP regression with the [N, N] system sharded.

Multi-chip twin of :class:`cggp_tpu.models.itergpr.IterGPR` (which itself
lifts the reference's 10k-row exact-GPR Cholesky cap, paper_cli_gpr.py:60-66):
each device owns a ROW BLOCK of ``K(X, X) + sigma^2 I`` built on the fly —
the system never exists whole on any chip (N^2/d kernel evals per device per
matvec) and every CG/Lanczos iteration reduces with one ``psum`` over ICI.
This is the same psum-blocked machinery the M-sharded CGGP uses
(:mod:`cggp_tpu.parallel.sharded_cg`), pointed at the TRAINING INPUTS instead
of inducing points: the "tensor-parallel" axis for an exact GP is N.

All objective/predict math is inherited from IterGPR — this class only
re-wires the solver hooks to their shard_map'd twins and pads N to the mesh
multiple (mask-threaded, pads exactly decoupled).  Marginal-likelihood
values (SLQ), gradients (implicit-function CG backward), the posterior
cache, and serving all work unchanged through the sharded hooks.
"""

from __future__ import annotations

import dataclasses

from jax.sharding import Mesh

from cggp_tpu.models.itergpr import IterGPR, IterGPRPosterior  # noqa: F401
from cggp_tpu.parallel.mesh import DATA_AXIS
from cggp_tpu.parallel.sharded_cg import (
    make_sharded_cg,
    make_sharded_matvec,
    make_sharded_slq_value,
)

# The serving cache is the shared one (alpha row + precond state).
ShardedIterGPRPosterior = IterGPRPosterior


@dataclasses.dataclass(frozen=True)
class ShardedIterGPR(IterGPR):
    """IterGPR with the N axis sharded over a device mesh.

    ``block`` / ``use_pallas`` are inherited but unused — the per-device row
    block IS the panel (N/d rows), built inside the shard_map region.  See
    :class:`IterGPR` for the shared fields (probes, logdet variants,
    preconditioning, relative thresholds).
    """

    mesh: Mesh = None  # type: ignore[assignment]
    axis_name: str = DATA_AXIS

    def __post_init__(self):
        if self.mesh is None:
            raise ValueError("ShardedIterGPR requires a mesh (make_mesh())")
        sharded_solve = make_sharded_cg(
            self.kernel, self.mesh, self.error_threshold,
            self.max_cg_iterations, axis_name=self.axis_name,
            relative_threshold=self.relative_threshold,
        )

        def solve(kp, x, lam, rhs, precond_state=(), mask=None):
            return sharded_solve(kp, x, lam, rhs, precond_state, mask=mask)

        object.__setattr__(self, "_solve", solve)
        object.__setattr__(
            self, "_matvec",
            make_sharded_matvec(self.kernel, self.mesh, self.axis_name),
        )
        slq_value = make_sharded_slq_value(
            self.kernel, self.mesh, self.slq_lanczos_iters, self.axis_name
        )
        self._wire_logdets(self._matvec, solve, slq_value)

    def _pad_multiple_for(self, n: int) -> int:
        return int(self.mesh.devices.size)
