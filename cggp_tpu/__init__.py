"""cggp_tpu — TPU-native sparse Gaussian processes via conjugate gradients.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`awav/conjugate-gradient-sparse-gp` (the experiment codebase of
"Numerically Stable Sparse Gaussian Processes via Minimum Separation using
Cover Trees", arXiv:2210.07893).

Design principles (TPU-first, not a port):

* **Pure functions over pytrees** — GPflow's OO ``Parameter`` machinery becomes
  parameter pytrees + pure ``elbo``/``predict_f`` functions, jitted once.
* **`lax.while_loop` + `custom_vjp`** — TF ``tf.while_loop`` /
  ``tf.custom_gradient`` CG (reference conjugate_gradient.py:24-122) becomes a
  JAX ``lax.while_loop`` with a hand-written VJP (backward pass = another CG
  solve), safe under ``jit``, ``vmap`` and ``shard_map``.
* **MXU-shaped math** — CG iterations are batched row-vector matvecs
  ``P @ A`` ([b, M] x [M, M]) which XLA tiles directly onto the 128x128 MXU.
* **SPMD scale-out** — the net-new ``parallel`` package shards the data axis
  (N) and the inducing axis (M) over a `jax.sharding.Mesh`, with `psum`-blocked
  Gram matvecs inside `shard_map` (the reference is single-device only).
* **Pallas fused Gram matvecs** — `ops.pallas_gram` computes ``K(Z, X) @ v``
  block-by-block in VMEM without materialising ``K`` in HBM.
* **Native host runtime** — the run-once host hot spot (cover-tree build) is
  OpenMP C++ (`cggp_tpu/native`), ctypes-loaded with a numpy fallback.
"""

from cggp_tpu.config import Config, default_config, set_default_config

__version__ = "0.1.0"

__all__ = ["Config", "default_config", "set_default_config", "__version__"]
