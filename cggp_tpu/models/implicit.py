"""ImplicitCGGP: single-chip CGGP that NEVER materialises the [M, M] Gram.

The dense :class:`~cggp_tpu.models.cggp.CGGP` builds ``Kuu`` once per step
(reference models.py:300) — an fp32 [M, M] buffer that stops fitting one
chip's HBM past M ~ 40-50k (and the CG block solve OOMs earlier when the
fused RHS is wide, see benchmarks/serving_results.csv at M=16384).  This
model replaces every Kuu operation with the matrix-free blocked machinery of
:mod:`cggp_tpu.ops.cg_implicit`:

* solves: :func:`~cggp_tpu.ops.cg_implicit.make_implicit_cg` — CG whose
  matvec scans [block, M] kernel panels built on the fly (peak extra memory
  one panel), optionally through the fused Pallas Gram-matvec kernel;
* KL matvecs / logdet gradients: the same blocked matvec + the generic
  implicit-operator estimators (ops/logdet.py);
* SLQ logdet value: batched matrix-free Lanczos
  (:func:`~cggp_tpu.ops.logdet.slq_value_rows`) over the blocked matvec;
* preconditioning: matrix-free pivoted Cholesky (per-pivot kernel rows) or
  an RFF sketch — no Gram build either way.

Semantics match CGGP/ShardedCGGP (reference models.py:279-354): Kuu with
jitter 0, Λ = σ²/counts, Rademacher-probe trace, zero-valued or SLQ logdet.
M is padded to a multiple of ``block`` with exactly-decoupled pseudo-points
(mask-threaded, see :func:`~cggp_tpu.ops.cg_implicit.pad_inducing`).

Peak memory per training step is O(block·M + R·M), R = 1 + probes + batch —
e.g. M = 65536 fp32 with block 2048 is ~0.5 GB of panel + solver state
versus ~17 GB for one dense [M, M] buffer (and 3-4 of those live at once in
the dense step).
"""

from __future__ import annotations

import dataclasses

from cggp_tpu.models.rowcg import RowCGGPPosterior, RowSolveCGGP
from cggp_tpu.ops.cg_implicit import blocked_kuu_matvec, make_implicit_cg
from cggp_tpu.ops.logdet import slq_value_rows

# The serving cache is the shared row-convention one (chol always None here).
ImplicitCGGPPosterior = RowCGGPPosterior


@dataclasses.dataclass(frozen=True)
class ImplicitCGGP(RowSolveCGGP):
    """Matrix-free CGGP for single-chip M beyond the [M, M] HBM budget.

    ``block`` is the panel height of the scanned Gram row blocks (must keep
    ``block * M`` comfortably in HBM; 2048 puts the panel at 0.5 GB for
    M = 65536 fp32).  ``use_pallas=True`` routes the solve matvecs through
    the fused Pallas kernel on TPU (the differentiable VJP matvec always
    uses the blocked XLA path).  See :class:`RowSolveCGGP` for the shared
    fields (preconditioning, relative thresholds, logdet variants).
    """

    block: int = 2048
    use_pallas: bool = False

    _supports_chol_serving = False  # the point of this model: no [M, M]

    def __post_init__(self):
        solve = make_implicit_cg(
            self.kernel, self.error_threshold, self.max_cg_iterations,
            block=self.block, use_pallas=self.use_pallas,
            relative_threshold=self.relative_threshold,
        )
        object.__setattr__(self, "_solve", solve)

        def matvec(kp, z, lam, mask, rows):
            return blocked_kuu_matvec(
                self.kernel, kp, z, lam, rows, block=self.block, mask=mask
            )

        object.__setattr__(self, "_matvec", matvec)

        def slq_value(kp, z, lam, mask, probes):
            return slq_value_rows(
                lambda v: matvec(kp, z, lam, mask, v), probes,
                self.slq_lanczos_iters,
            )

        object.__setattr__(self, "_slq_value", slq_value)
        self._wire_logdets()

    def _pad_multiple_for(self, m: int) -> int:
        # blocked_kuu_matvec handles m <= block densely in one panel; above
        # that M must divide the panel height.
        return self.block if m > self.block else 1
