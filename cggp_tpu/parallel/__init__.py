"""SPMD scale-out over TPU meshes (net-new; no reference counterpart).

The reference is single-process/single-GPU (SURVEY.md section 2.10); this
package adds the TPU-native scaling recipe:

* :mod:`cggp_tpu.parallel.mesh` — mesh construction + sharding helpers.
* :mod:`cggp_tpu.parallel.data_parallel` — jit-with-shardings training /
  eval steps: batch rows sharded over the mesh, params replicated, XLA
  inserts the psum collectives (the "How to Scale Your Model" recipe).
* :mod:`cggp_tpu.parallel.sharded_cg` — shard_map CG whose ``p @ (Kuu+Λ)``
  matvec is computed from row-blocks of the Gram matrix built on the fly on
  each device and reduced with ``psum`` — Kuu is never materialised whole on
  any chip, which is what lets M scale past single-chip HBM.
"""

from cggp_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from cggp_tpu.parallel.data_parallel import (
    make_data_parallel_loss,
    make_data_parallel_predict,
)
from cggp_tpu.parallel.sharded_cg import (
    make_sharded_cg,
    pad_inducing,
    pivoted_cholesky_kernel,
    spectral_precond_state,
    ShardedKuuSolver,
)
from cggp_tpu.parallel.model import (
    ShardedCGGP,
    ShardedCGGPPosterior,
    make_sharded_eval_logdet,
)
from cggp_tpu.parallel.itergpr import ShardedIterGPR, ShardedIterGPRPosterior

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_data_parallel_loss",
    "make_data_parallel_predict",
    "pad_inducing",
    "make_sharded_cg",
    "pivoted_cholesky_kernel",
    "spectral_precond_state",
    "ShardedKuuSolver",
    "ShardedCGGP",
    "ShardedCGGPPosterior",
    "ShardedIterGPR",
    "ShardedIterGPRPosterior",
    "make_sharded_eval_logdet",
]
