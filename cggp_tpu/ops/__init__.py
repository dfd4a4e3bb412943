"""Numerics layer: kernels, bijectors, linear algebra, CG, log-det, RFF."""

from cggp_tpu.ops.bijectors import positive, identity_bijector, Bijector
from cggp_tpu.ops.kernels import (
    Kernel,
    SquaredExponential,
    Matern12,
    Matern32,
    Matern52,
    kernel_by_name,
)
from cggp_tpu.ops.linalg import (add_diagonal, chol_extend,
                                 pivoted_cholesky, triangular_inv_extend)
from cggp_tpu.ops.distance import euclid_distance, create_distance_fn
from cggp_tpu.ops.cg import (
    CGState,
    CGStats,
    conjugate_gradient,
    ConjugateGradient,
    EyePreconditioner,
    BlockPreconditioner,
    NystromPreconditioner,
    SpectralPreconditioner,
    CholPreconditioner,
    pivoted_cholesky_preconditioner,
)
from cggp_tpu.ops.logdet import eval_logdet, slq_logdet
from cggp_tpu.ops.rff import (
    basis_theta_parameter,
    basis_vectors,
    rff_preconditioner,
    rff_sample,
)
from cggp_tpu.ops.pallas_gram import gram_matvec, kuu_matvec
from cggp_tpu.ops.pallas_matvec import pallas_matvec

__all__ = [
    "Bijector",
    "positive",
    "identity_bijector",
    "Kernel",
    "SquaredExponential",
    "Matern12",
    "Matern32",
    "Matern52",
    "kernel_by_name",
    "add_diagonal",
    "chol_extend",
    "pivoted_cholesky",
    "triangular_inv_extend",
    "euclid_distance",
    "create_distance_fn",
    "CGState",
    "CGStats",
    "conjugate_gradient",
    "ConjugateGradient",
    "EyePreconditioner",
    "BlockPreconditioner",
    "NystromPreconditioner",
    "SpectralPreconditioner",
    "CholPreconditioner",
    "pivoted_cholesky_preconditioner",
    "eval_logdet",
    "slq_logdet",
    "basis_theta_parameter",
    "basis_vectors",
    "rff_preconditioner",
    "rff_sample",
    "gram_matvec",
    "kuu_matvec",
    "pallas_matvec",
]
