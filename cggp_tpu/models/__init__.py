"""GP model family (reference models.py + GPflow GPR/SGPR baselines).

Models are frozen *specs* (hashable, closed over by jitted functions) with all
numerical state in parameter pytrees — the functional JAX replacement for
GPflow's Module/Parameter machinery.
"""

from cggp_tpu.models.base import CholPosterior, GaussianLikelihood
from cggp_tpu.models.gpr import GPR, GPRPosterior
from cggp_tpu.models.sgpr import SGPR, SGPRPosterior
from cggp_tpu.models.lpsvgp import LpSVGP
from cggp_tpu.models.clustergp import ClusterGP
from cggp_tpu.models.cggp import CGGP, CGGPPosterior
from cggp_tpu.models.implicit import ImplicitCGGP, ImplicitCGGPPosterior
from cggp_tpu.models.itergpr import IterGPR, IterGPRPosterior
from cggp_tpu.models.pathwise import (
    PathwiseClusterGP,
    PathwisePosterior,
    build_pathwise_posterior,
    pathwise_samples_at,
    pathwise_samples_scan,
)

__all__ = [
    "GaussianLikelihood",
    "GPR",
    "SGPR",
    "LpSVGP",
    "ClusterGP",
    "CGGP",
    "ImplicitCGGP",
    "IterGPR",
    "PathwiseClusterGP",
    # serving caches (GPflow posterior() analogues, net-new)
    "CholPosterior",
    "GPRPosterior",
    "SGPRPosterior",
    "CGGPPosterior",
    "ImplicitCGGPPosterior",
    "IterGPRPosterior",
    "PathwisePosterior",
    "build_pathwise_posterior",
    "pathwise_samples_at",
    "pathwise_samples_scan",
]
