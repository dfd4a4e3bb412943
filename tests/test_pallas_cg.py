"""VMEM-resident Pallas CG vs the dense oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from cggp_tpu.ops.kernels import SquaredExponential
from cggp_tpu.ops.linalg import add_diagonal
from cggp_tpu.ops.pallas_cg import pallas_cg_solve


def _system(rng, m=70, r=5):
    kernel = SquaredExponential()
    kp = kernel.init_params(dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(-1, 1, (m, 2)), jnp.float32)
    lam = jnp.asarray(rng.uniform(0.2, 0.6, (m,)), jnp.float32)
    a = add_diagonal(kernel.K(kp, z), lam)
    rhs = jnp.asarray(rng.standard_normal((r, m)), jnp.float32)
    return a, rhs


def test_pallas_cg_matches_dense(rng):
    a, rhs = _system(rng)
    sol, steps = pallas_cg_solve(a, rhs, 1e-10, 256, interpret=True)
    expected = jnp.linalg.solve(jnp.asarray(a, jnp.float64),
                                jnp.asarray(rhs, jnp.float64).T).T
    np.testing.assert_allclose(np.asarray(sol), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)
    assert 0 < int(steps) <= 256


def test_pallas_cg_threshold_stops_early(rng):
    a, rhs = _system(rng)
    _, steps_loose = pallas_cg_solve(a, rhs, 1e-2, 256, interpret=True)
    _, steps_tight = pallas_cg_solve(a, rhs, 1e-10, 256, interpret=True)
    assert int(steps_loose) < int(steps_tight)
