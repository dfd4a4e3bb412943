"""fp32 vs fp64 parity of the CDGP pipeline (BASELINE.md north star).

The paper's claim: cover-tree minimum separation bounds the condition number
of ``Kuu + Λ``, so CG solves stay accurate in fp32.  The gate mirrors
BASELINE.md: RMSE/NLPD agreement within 1e-3 between an fp32 and an fp64 run
with identical hyperparameters and inducing state.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.data import load_data
from cggp_tpu.models import CGGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.selection.update import covertree_update_inducing_parameters
from cggp_tpu.training.optimize import make_metrics_callback


def _run(dtype, data_f64, test_f64, iv, u, counts):
    cast = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
    train = (cast(data_f64[0]), cast(data_f64[1]))
    test = (cast(test_f64[0]), cast(test_f64[1]))
    model = CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(1e-10, max_iterations=512),
        num_data=train[0].shape[0],
        num_probes=8,
    )
    params = model.init_params(
        cast(iv), pseudo_u=cast(u), cluster_counts=cast(counts),
        lengthscales=0.4 * np.ones(2), noise_variance=0.05, dtype=dtype,
    )
    metrics_fn = make_metrics_callback(
        model, train, test, batch_size=512, key=jax.random.PRNGKey(0),
    )
    return metrics_fn(0, params)


def test_cdgp_fp32_matches_fp64_with_covertree_conditioning():
    bundle = load_data("synthetic", seed=0, synthetic_n=1500, synthetic_dim=2)
    iv, u, counts = covertree_update_inducing_parameters(bundle.train, 0.25)
    assert iv.shape[0] > 30

    m64 = _run(jnp.float64, bundle.train, bundle.test, iv, u, counts)
    m32 = _run(jnp.float32, bundle.train, bundle.test, iv, u, counts)

    assert abs(m32["test/rmse"] - m64["test/rmse"]) < 1e-3, (m32, m64)
    assert abs(m32["test/nlpd"] - m64["test/nlpd"]) < 1e-3, (m32, m64)


def test_sgpr_and_clustergp_fp32_match_fp64():
    """Cholesky-family fp32/fp64 parity (validated on real TPU in round 1;
    this CPU gate guards the shared Gram/solve code paths)."""
    from cggp_tpu.models import ClusterGP, SGPR

    bundle = load_data("synthetic", seed=0, synthetic_n=1500, synthetic_dim=2)
    iv, u, counts = covertree_update_inducing_parameters(bundle.train, 0.25)

    def run(dtype):
        cast = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
        train = (cast(bundle.train[0]), cast(bundle.train[1]))
        test = (cast(bundle.test[0]), cast(bundle.test[1]))
        out = {}
        sgpr = SGPR(kernel=Matern32())
        sp = sgpr.init_params(cast(iv), lengthscales=0.4 * np.ones(2),
                              noise_variance=0.05, dtype=dtype)
        mu, var = sgpr.predict_f(sp, train, test[0])
        out["sgpr_rmse"] = float(jnp.sqrt(jnp.mean(jnp.square(test[1] - mu))))
        out["sgpr_elbo"] = float(sgpr.elbo(sp, train))
        cgp = ClusterGP(kernel=Matern32(), num_data=train[0].shape[0])
        cp = cgp.init_params(cast(iv), pseudo_u=cast(u), cluster_counts=cast(counts),
                             lengthscales=0.4 * np.ones(2), noise_variance=0.05,
                             dtype=dtype)
        mu2, _ = cgp.predict_f(cp, test[0])
        out["cluster_rmse"] = float(jnp.sqrt(jnp.mean(jnp.square(test[1] - mu2))))
        out["cluster_kl"] = float(cgp.prior_kl(cp))
        return out

    r64, r32 = run(jnp.float64), run(jnp.float32)
    assert abs(r32["sgpr_rmse"] - r64["sgpr_rmse"]) < 1e-3, (r32, r64)
    assert abs(r32["cluster_rmse"] - r64["cluster_rmse"]) < 1e-3, (r32, r64)
    assert abs(r32["sgpr_elbo"] - r64["sgpr_elbo"]) / abs(r64["sgpr_elbo"]) < 1e-3
    assert abs(r32["cluster_kl"] - r64["cluster_kl"]) / abs(r64["cluster_kl"]) < 1e-3
