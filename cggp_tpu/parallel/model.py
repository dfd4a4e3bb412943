"""ShardedCGGP: the CGGP model with every Kuu operation M-sharded.

The flagship multi-chip configuration (BASELINE.md config 5): inducing-point
count M scales across the mesh.  All CG solves and Gram matvecs go through
the psum-blocked row-sharded kernels of :mod:`cggp_tpu.parallel.sharded_cg`;
the [*, M] loop state stays replicated, so this is the tensor-parallel
analogue for kernel methods (the "sequence" axis here is M).  Data terms
(variational expectations) are elementwise and ride along replicated; use
:mod:`cggp_tpu.parallel.data_parallel` to shard the N axis for prediction
and metrics sweeps.

Semantics match the single-chip CGGP (cggp_tpu/models/cggp.py, reference
models.py:279-354): Kuu with jitter 0, Λ = σ²/counts, Rademacher-probe trace,
zero-valued logdet with CG-probe gradient — or, with ``logdet_variant="slq"``,
a matrix-free stochastic-Lanczos-quadrature logdet VALUE through the
psum-blocked matvec (same CG-probe gradient), so sharded ELBO values are
meaningful like the single-chip SLQ path.

All objective/predict math lives in :class:`cggp_tpu.models.rowcg.RowSolveCGGP`
(shared with the single-chip matrix-free :class:`~cggp_tpu.models.implicit.ImplicitCGGP`);
this class only wires the shard_map'd backends and the mesh-multiple padding.
"""

from __future__ import annotations

import dataclasses

from jax.sharding import Mesh

# Generic implicit-operator logdet estimators (moved to ops/logdet.py round 3;
# aliased here for back-compat with the round-1/2 public names).
from cggp_tpu.ops.logdet import (
    make_matfree_eval_logdet as make_sharded_eval_logdet,  # noqa: F401
    make_matfree_logdet_from_solves as make_sharded_logdet_from_solves,  # noqa: F401
    make_matfree_slq_logdet as make_sharded_slq_logdet,  # noqa: F401
)
from cggp_tpu.models.rowcg import RowCGGPPosterior, RowSolveCGGP
from cggp_tpu.parallel.mesh import DATA_AXIS
from cggp_tpu.parallel.sharded_cg import (
    make_sharded_cg,
    make_sharded_matvec,
    make_sharded_slq_value,
)

# Back-compat alias: the serving cache is now the shared row-convention one.
ShardedCGGPPosterior = RowCGGPPosterior


@dataclasses.dataclass(frozen=True)
class ShardedCGGP(RowSolveCGGP):
    """CGGP with M sharded over a device mesh.

    Build with :meth:`create`; ``init_params`` pads (Z, u, counts) so M
    divides the mesh size (see :func:`~cggp_tpu.ops.cg_implicit.pad_inducing`
    — pads are exact no-ops).  See :class:`RowSolveCGGP` for the shared
    fields (preconditioning, relative thresholds, logdet variants).
    """

    mesh: Mesh = None  # type: ignore[assignment]
    axis_name: str = DATA_AXIS

    # Serving may materialise the [M, M] replica per chip: at the M this
    # model targets per BASELINE config 5 (<= a few 10k padded), one
    # Cholesky factor fits comfortably and beats per-batch CG.
    _supports_chol_serving = True

    def __post_init__(self):
        if self.mesh is None:
            raise ValueError("ShardedCGGP requires a mesh")
        # Cache the shard_map'd kernels on the instance (frozen dataclass).
        object.__setattr__(
            self,
            "_solve",
            make_sharded_cg(
                self.kernel, self.mesh, self.error_threshold,
                self.max_cg_iterations, axis_name=self.axis_name,
                relative_threshold=self.relative_threshold,
            ),
        )
        object.__setattr__(
            self, "_matvec", make_sharded_matvec(self.kernel, self.mesh, self.axis_name)
        )
        object.__setattr__(
            self, "_slq_value",
            make_sharded_slq_value(
                self.kernel, self.mesh, self.slq_lanczos_iters,
                axis_name=self.axis_name,
            ),
        )
        self._wire_logdets()

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def _pad_multiple_for(self, m: int) -> int:
        return self.num_devices
