"""GP model family (reference models.py + GPflow GPR/SGPR baselines).

Models are frozen *specs* (hashable, closed over by jitted functions) with all
numerical state in parameter pytrees — the functional JAX replacement for
GPflow's Module/Parameter machinery.
"""

from cggp_tpu.models.base import GaussianLikelihood
from cggp_tpu.models.gpr import GPR
from cggp_tpu.models.sgpr import SGPR
from cggp_tpu.models.lpsvgp import LpSVGP
from cggp_tpu.models.clustergp import ClusterGP
from cggp_tpu.models.cggp import CGGP
from cggp_tpu.models.pathwise import PathwiseClusterGP

__all__ = [
    "GaussianLikelihood",
    "GPR",
    "SGPR",
    "LpSVGP",
    "ClusterGP",
    "CGGP",
    "PathwiseClusterGP",
]
