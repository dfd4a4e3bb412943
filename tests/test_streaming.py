"""Streaming ingestion: net growth -> stats merge -> serving-cache extension.

The complete online story (net-new; the reference re-clusters from scratch
and refactorizes per predict batch — optimize.py:19-38, models.py:333-345):

    new data block
      -> covernet_extend            (old centers unchanged, as a prefix)
      -> covernet_extend_update     (exact sufficient-statistics merge)
      -> CGGP.posterior_extend      (bordered-factor cache update, O(dM M^2))
      -> serve

Oracles: full recomputation with the same assignment semantics, dense
Cholesky factors, and the from-scratch ``posterior()`` rebuild.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.models import CGGP
from cggp_tpu.ops.cg import ConjugateGradient
from cggp_tpu.ops.kernels import Matern32
from cggp_tpu.ops.linalg import add_diagonal, chol_extend, triangular_inv_extend
from cggp_tpu.selection.covernet import (
    covernet_extend_update,
    covernet_update_inducing_parameters,
)


def test_chol_extend_matches_full_factorization(rng):
    """Bordered update == full Cholesky of the extended SPD matrix (fp64)."""
    m0, dm = 24, 7
    x = jnp.asarray(rng.uniform(-2, 2, (m0 + dm, 3)))
    kernel = Matern32()
    kp = kernel.init_params(1.0, jnp.ones(3))
    a = add_diagonal(kernel.K(kp, x), jnp.asarray(rng.uniform(0.1, 0.5, m0 + dm)))

    l_full = jnp.linalg.cholesky(a)
    l11 = jnp.linalg.cholesky(a[:m0, :m0])
    l_ext = chol_extend(l11, a[m0:, :m0], a[m0:, m0:])
    np.testing.assert_allclose(np.asarray(l_ext), np.asarray(l_full),
                               rtol=1e-10, atol=1e-12)

    # And the triangular-inverse extension (CholPreconditioner W state).
    eye0 = jnp.eye(m0, dtype=a.dtype)
    w11 = jax.scipy.linalg.solve_triangular(l11, eye0, lower=True)
    w_ext = triangular_inv_extend(w11, l_ext[m0:, :m0], l_ext[m0:, m0:])
    w_full = jax.scipy.linalg.solve_triangular(
        l_full, jnp.eye(m0 + dm, dtype=a.dtype), lower=True
    )
    np.testing.assert_allclose(np.asarray(w_ext), np.asarray(w_full),
                               rtol=1e-9, atol=1e-12)


def test_covernet_extend_update_matches_manual_merge(rng):
    """Merged (Z, u, counts) == a manual recompute in which old points keep
    their original assignments and new points Voronoi-assign over the
    extended net (the documented streaming semantics)."""
    res = 0.45
    x1 = jnp.asarray(rng.uniform(-1, 1, (160, 2)))
    y1 = jnp.sin(2.0 * x1[:, :1]) + 0.1 * x1[:, 1:]
    x2 = jnp.asarray(rng.uniform(-1.6, 1.6, (90, 2)))  # partly outside: grows
    y2 = jnp.sin(2.0 * x2[:, :1]) + 0.1 * x2[:, 1:]

    z1, u1, c1 = covernet_update_inducing_parameters(
        (x1, y1), res, lloyds=0
    )
    z2, u2, c2 = covernet_extend_update(z1, u1, c1, (x2, y2), res)
    m1, m2 = z1.shape[0], z2.shape[0]
    assert m2 > m1, "test setup should actually grow the net"
    np.testing.assert_array_equal(np.asarray(z2[:m1]), np.asarray(z1))

    def labels_of(x, z):
        d = np.linalg.norm(
            np.asarray(x)[:, None, :] - np.asarray(z)[None, :, :], axis=-1
        )
        return d.argmin(axis=1)

    lab_old = labels_of(x1, z1)  # retained original assignments
    lab_new = labels_of(x2, z2)
    counts = np.zeros(m2)
    sums = np.zeros((m2, y1.shape[1]))
    np.add.at(counts, lab_old, 1.0)
    np.add.at(counts, lab_new, 1.0)
    np.add.at(sums, lab_old, np.asarray(y1))
    np.add.at(sums, lab_new, np.asarray(y2))
    safe = np.clip(counts, 1.0, None)
    np.testing.assert_allclose(np.asarray(c2)[:, 0], safe, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u2), sums / safe[:, None],
                               rtol=1e-9, atol=1e-12)


def _make_model(precondition, threshold=1e-14):
    return CGGP(
        kernel=Matern32(),
        conjugate_gradient=ConjugateGradient(
            threshold, relative_threshold=True
        ),
        num_data=250,
        num_probes=3,
        precondition=precondition,
        precond_rank=8,
    )


def _streaming_setup(rng, res=0.45):
    x1 = jnp.asarray(rng.uniform(-1, 1, (160, 2)))
    y1 = jnp.sin(2.0 * x1[:, :1])
    x2 = jnp.asarray(rng.uniform(-1.6, 1.6, (90, 2)))
    y2 = jnp.sin(2.0 * x2[:, :1])
    z1, u1, c1 = covernet_update_inducing_parameters((x1, y1), res, lloyds=0)
    z2, u2, c2 = covernet_extend_update(z1, u1, c1, (x2, y2), res)
    return (x1, y1), (x2, y2), (z1, u1, c1), (z2, u2, c2)


def test_posterior_extend_chol_pure_append_exact(rng):
    """Pure center append (Lambda prefix untouched): the bordered chol cache
    is EXACTLY the from-scratch solver='chol' rebuild."""
    _, _, (z1, u1, c1), (z2, _u2, _c2) = _streaming_setup(rng)
    m1, m2 = z1.shape[0], z2.shape[0]
    model = _make_model(None)
    params1 = model.init_params(z1, pseudo_u=u1, cluster_counts=c1)
    post1 = model.posterior(params1, solver="chol")

    # Append new centers with fresh pseudo-stats; OLD u/counts unchanged.
    u_app = jnp.concatenate([u1, jnp.zeros((m2 - m1, 1), z1.dtype)])
    c_app = jnp.concatenate([c1, jnp.ones((m2 - m1, 1), z1.dtype)])
    params2 = model.assign_clusters(params1, z2, u_app, c_app)

    post2 = model.posterior_extend(post1, params2)
    ref = model.posterior(params2, solver="chol")
    assert post2.chol is not None and post2.kmm_lambda is None
    np.testing.assert_allclose(np.asarray(post2.chol), np.asarray(ref.chol),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(post2.nu), np.asarray(ref.nu),
                               rtol=1e-8, atol=1e-12)

    xq = jnp.asarray(rng.uniform(-1.5, 1.5, (37, 2)))
    mu_e, var_e = model.posterior_predict(post2, xq)
    mu_r, var_r = model.posterior_predict(ref, xq)
    np.testing.assert_allclose(np.asarray(mu_e), np.asarray(mu_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_e), np.asarray(var_r), atol=1e-10)


@pytest.mark.parametrize("precondition", [None, "pivchol", "chol"])
def test_posterior_extend_cg_with_lambda_drift(rng, precondition):
    """The streaming-merge norm: counts grow on touched old clusters (Lambda
    drifts on the prefix).  The cg-mode extension must serve exactly what a
    from-scratch rebuild serves — drift only costs CG iterations.  Covers
    all three preconditioner-state shapes: identity (), spectral 3-tuple
    (rebuilt), and the exact-factor dict (border-extended, stale on the
    drifted diagonal)."""
    _, _, (z1, u1, c1), (z2, u2, c2) = _streaming_setup(rng)
    model = _make_model(precondition)
    params1 = model.init_params(z1, pseudo_u=u1, cluster_counts=c1)
    post1 = model.posterior(params1, solver="cg")
    assert bool(jnp.all(c2[: z1.shape[0]] >= c1)), "merge should touch counts"
    assert not bool(jnp.all(c2[: z1.shape[0]] == c1)), (
        "test setup should actually drift Lambda on the prefix"
    )

    params2 = model.assign_clusters(params1, z2, u2, c2)
    post2 = model.posterior_extend(post1, params2)
    ref = model.posterior(params2, solver="cg")
    np.testing.assert_allclose(np.asarray(post2.kmm_lambda),
                               np.asarray(ref.kmm_lambda),
                               rtol=1e-12, atol=1e-12)

    # Serving parity: the two nu solves stop at slightly different residuals
    # (warm vs cold start), so the comparison floor is the CG stopping noise
    # (~1e-6 at this threshold/kappa), NOT factor-extension error — the
    # factor blocks themselves are pinned at 1e-12 above.
    xq = jnp.asarray(rng.uniform(-1.5, 1.5, (37, 2)))
    mu_e, var_e = model.posterior_predict(post2, xq)
    mu_r, var_r = model.posterior_predict(ref, xq)
    np.testing.assert_allclose(np.asarray(mu_e), np.asarray(mu_r), atol=5e-6)
    np.testing.assert_allclose(np.asarray(var_e), np.asarray(var_r), atol=5e-6)
    # And against the analytic oracle: dense solve of the extended system.
    kp = params2["kernel"]
    a = add_diagonal(model.kernel.K(kp, z2),
                     model.diag_variance(params2)[:, 0])
    kmn = model.kernel.K(kp, z2, xq)
    mu_o = kmn.T @ jnp.linalg.solve(a, params2["pseudo_u"])
    np.testing.assert_allclose(np.asarray(mu_e), np.asarray(mu_o), atol=5e-6)


def test_posterior_extend_nu_refresh_without_growth(rng):
    """dm == 0 (no new centers, but merged pseudo-u/counts): the cache reuses
    its factor blocks and only re-solves nu."""
    _, _, (z1, u1, c1), _ = _streaming_setup(rng)
    model = _make_model("chol")
    params1 = model.init_params(z1, pseudo_u=u1, cluster_counts=c1)
    post1 = model.posterior(params1, solver="cg")

    params2 = model.assign_clusters(params1, z1, u1 + 0.1, c1 + 1.0)
    post2 = model.posterior_extend(post1, params2)
    ref = model.posterior(params2, solver="cg")
    xq = jnp.asarray(rng.uniform(-1, 1, (21, 2)))
    for got, want in zip(model.posterior_predict(post2, xq),
                         model.posterior_predict(ref, xq)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-8)

    # chol cache + unchanged Lambda + changed u: factor reused, nu re-solved.
    post_c = model.posterior(params1, solver="chol")
    params_u = model.assign_clusters(params1, z1, u1 + 0.5, c1)
    post_cu = model.posterior_extend(post_c, params_u)
    ref_cu = model.posterior(params_u, solver="chol")
    np.testing.assert_allclose(np.asarray(post_cu.nu), np.asarray(ref_cu.nu),
                               rtol=1e-9, atol=1e-12)


def test_posterior_extend_rejects_invalid_usage(rng):
    _, _, (z1, u1, c1), (z2, u2, c2) = _streaming_setup(rng)
    model = _make_model("chol")
    params1 = model.init_params(z1, pseudo_u=u1, cluster_counts=c1)
    params2 = model.assign_clusters(params1, z2, u2, c2)

    # chol cache + Lambda drift: a stale cho_solve would serve wrong values.
    post_chol = model.posterior(params1, solver="chol")
    with pytest.raises(ValueError, match="Lambda drifted"):
        model.posterior_extend(post_chol, params2)

    # Kernel hyperparameters changed: every cached block is invalid.
    post_cg = model.posterior(params1, solver="cg")
    params_k = dict(params2)
    params_k["kernel"] = jax.tree_util.tree_map(
        lambda a: a + 0.1, params2["kernel"]
    )
    with pytest.raises(ValueError, match="kernel hyperparameters"):
        model.posterior_extend(post_cg, params_k)

    # Moved prefix: not an extension.
    params_m = dict(params2)
    params_m["inducing_points"] = params2["inducing_points"].at[0, 0].add(0.5)
    with pytest.raises(ValueError, match="unchanged prefix"):
        model.posterior_extend(post_cg, params_m)

    # LOVE cache: the Krylov basis is not incremental.
    post_love = model.posterior(params1, solver="lanczos")
    with pytest.raises(ValueError, match="lanczos"):
        model.posterior_extend(post_love, params2)

    # Capacity-padded cache: growth belongs to assign_clusters_device.
    params_pad = model.init_params(
        z1, pseudo_u=u1, cluster_counts=c1, capacity=z1.shape[0] + 8
    )
    post_pad = model.posterior(params_pad, solver="cg")
    with pytest.raises(ValueError, match="unpadded"):
        model.posterior_extend(post_pad, params2)


def test_posterior_extend_multicolumn_nu(rng):
    """A CG cache built from multi-column pseudo_u [M, P>1] extends with
    growth: the warm-start padding must match nu's column count (round-3
    review finding — zeros((dm, 1)) crashed where a rebuild worked)."""
    _, _, (z1, u1, c1), (z2, u2, c2) = _streaming_setup(rng)
    model = _make_model(None)
    u1w = jnp.concatenate([u1, 2.0 * u1], axis=1)  # [M, 2]
    u2w = jnp.concatenate([u2, 2.0 * u2], axis=1)
    params1 = model.init_params(z1, pseudo_u=u1w, cluster_counts=c1)
    post1 = model.posterior(params1, solver="cg")
    assert post1.nu.shape[1] == 2

    params2 = model.assign_clusters(params1, z2, u2w, c2)
    post2 = model.posterior_extend(post1, params2)
    ref = model.posterior(params2, solver="cg")
    np.testing.assert_allclose(np.asarray(post2.nu), np.asarray(ref.nu),
                               atol=5e-6)


def test_streaming_pipeline_end_to_end(rng):
    """Three ingest rounds: net extend -> stats merge -> cache extend, each
    round's serving checked against a from-scratch rebuild."""
    res = 0.5
    model = _make_model("chol")
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, (120, 2)))
    y0 = jnp.sin(2.0 * x0[:, :1])
    z, u, c = covernet_update_inducing_parameters((x0, y0), res, lloyds=0)
    params = model.init_params(z, pseudo_u=u, cluster_counts=c)
    post = model.posterior(params, solver="cg")
    xq = jnp.asarray(rng.uniform(-1.8, 1.8, (25, 2)))

    lo = 0.8
    for _round in range(3):
        hi = lo + 0.4
        xb = jnp.asarray(rng.uniform(-hi, hi, (70, 2)))
        yb = jnp.sin(2.0 * xb[:, :1])
        z, u, c = covernet_extend_update(z, u, c, (xb, yb), res)
        params = model.assign_clusters(params, z, u, c)
        post = model.posterior_extend(post, params)
        ref = model.posterior(params, solver="cg")
        for got, want in zip(model.posterior_predict(post, xq),
                             model.posterior_predict(ref, xq)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-7)
        lo = hi
    assert z.shape[0] > 0 and post.nu.shape[0] == z.shape[0]


def test_covernet_extend_update_padded_matches_unpadded(rng):
    """The fixed-capacity streaming ingest must equal the unpadded one on the
    real prefix (same scan order, same merge), with pad-convention tails."""
    from cggp_tpu.selection.covernet import covernet_extend_update_padded

    res = 0.45
    _, (x2, y2), (z1, u1, c1), (z2, u2, c2) = _streaming_setup(rng)
    m1, m2 = z1.shape[0], z2.shape[0]
    cap = m2 + 5

    # Build the padded inputs from the unpadded initial state.
    pad = cap - m1
    far = 1.0e6 * (1.0 + jnp.arange(1, cap + 1, dtype=z1.dtype))[:, None]
    z_p = jnp.concatenate([z1, jnp.broadcast_to(far[m1:], (pad, z1.shape[1]))])
    u_p = jnp.concatenate([u1, jnp.zeros((pad, 1), z1.dtype)])
    c_p = jnp.concatenate([c1, jnp.ones((pad, 1), z1.dtype)])
    m_p = jnp.concatenate([jnp.ones((m1, 1), z1.dtype),
                           jnp.zeros((pad, 1), z1.dtype)])

    zo, uo, co, mo = covernet_extend_update_padded(
        z_p, u_p, c_p, m_p, (x2, y2), res
    )
    assert int(mo.sum()) == m2
    # Mask must stay prefix-contiguous.
    np.testing.assert_array_equal(
        np.asarray(mo[:, 0]), (np.arange(cap) < m2).astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(zo[:m2]), np.asarray(z2))
    np.testing.assert_allclose(np.asarray(uo[:m2]), np.asarray(u2),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(co[:m2]), np.asarray(c2),
                               rtol=1e-12)
    # Pad convention on the tail: u 0, counts 1.
    np.testing.assert_array_equal(np.asarray(uo[m2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(co[m2:]), 1.0)


def test_streaming_ingest_fn_single_trace_and_parity(rng):
    """The jitted ingest pipeline: one trace across ingests (static shapes),
    and serving parity with the eager unpadded streaming path."""
    from cggp_tpu.training.optimize import make_streaming_ingest_fn

    res = 0.5
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, (120, 2)))
    y0 = jnp.sin(2.0 * x0[:, :1])
    z, u, c = covernet_update_inducing_parameters((x0, y0), res, lloyds=0)
    model = _make_model("chol")
    cap = 64
    params_p = model.init_params(z, pseudo_u=u, cluster_counts=c, capacity=cap)
    params_e = model.init_params(z, pseudo_u=u, cluster_counts=c)

    ingest = make_streaming_ingest_fn(model, res)
    xq = jnp.asarray(rng.uniform(-1.8, 1.8, (23, 2)))

    # The single-trace check below reads the jitted ingest's cache-entry
    # count, which lives in jax's GLOBAL LRU executable cache.  Under the
    # full suite that cache already holds thousands of entries from earlier
    # test files, and our entry can be LRU-EVICTED mid-test (observed:
    # `_cache_size() == 0` in full-suite runs, 1 in isolation — eviction,
    # not retracing).  Clearing makes the test hermetic: the handful of
    # programs this test traces can never reach the eviction threshold.
    jax.clear_caches()

    lo = 0.8
    for _round in range(3):
        hi = lo + 0.4
        xb = jnp.asarray(rng.uniform(-hi, hi, (64, 2)))
        yb = jnp.sin(2.0 * xb[:, :1])
        params_p, post_p = ingest(params_p, xb, yb)
        # Eager unpadded twin.
        z, u, c = covernet_extend_update(z, u, c, (xb, yb), res)
        params_e = model.assign_clusters(params_e, z, u, c)
        post_e = model.posterior(params_e, solver="chol")
        assert int(params_p["inducing_mask"].sum()) == z.shape[0]
        for got, want in zip(model.posterior_predict(post_p, xq),
                             model.posterior_predict(post_e, xq)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-8)
        lo = hi

    cache_size = getattr(ingest, "_cache_size", lambda: None)()
    if cache_size is not None:
        assert cache_size == 1, (
            f"ingest retraced across same-shape ingests: {cache_size}"
        )

    # Unpadded params are rejected (the pipeline's contract is static shapes).
    with pytest.raises(ValueError, match="capacity-padded"):
        ingest(params_e, xq, jnp.zeros((23, 1)))
    # And 'auto' cannot run under jit.
    with pytest.raises(ValueError, match="auto"):
        make_streaming_ingest_fn(model, res, posterior_solver="auto")


def test_streaming_ingest_capacity_saturation(rng):
    """A net outgrowing the capacity truncates (mask <= capacity), it does
    not error — the documented jit-safe contract."""
    from cggp_tpu.selection.covernet import covernet_extend_update_padded

    res = 0.05  # tiny resolution: nearly every point wants to be a center
    x0 = jnp.asarray(rng.uniform(-1, 1, (40, 2)))
    y0 = jnp.sin(x0[:, :1])
    z, u, c = covernet_update_inducing_parameters((x0, y0), 0.5, lloyds=0)
    m0 = z.shape[0]
    cap = m0 + 4
    pad = cap - m0
    far = 1.0e6 * (1.0 + jnp.arange(1, cap + 1, dtype=z.dtype))[:, None]
    z_p = jnp.concatenate([z, jnp.broadcast_to(far[m0:], (pad, 2))])
    u_p = jnp.concatenate([u, jnp.zeros((pad, 1), z.dtype)])
    c_p = jnp.concatenate([c, jnp.ones((pad, 1), z.dtype)])
    m_p = jnp.concatenate([jnp.ones((m0, 1), z.dtype),
                           jnp.zeros((pad, 1), z.dtype)])
    xb = jnp.asarray(rng.uniform(-1, 1, (50, 2)))
    zo, uo, co, mo = covernet_extend_update_padded(
        z_p, u_p, c_p, m_p, (xb, jnp.sin(xb[:, :1])), res
    )
    assert int(mo.sum()) == cap  # saturated, not crashed
    # Old centers survive truncation untouched.
    np.testing.assert_array_equal(np.asarray(zo[:m0]), np.asarray(z))


def test_streaming_ingest_row_solver_family(rng):
    """make_streaming_ingest_fn works unchanged on the masked row-solver
    models: ImplicitCGGP (matrix-free, cg serving) and ShardedCGGP on the
    8-way virtual mesh — serving parity with the dense padded pipeline."""
    from cggp_tpu.models.implicit import ImplicitCGGP
    from cggp_tpu.parallel import ShardedCGGP, make_mesh
    from cggp_tpu.training.optimize import make_streaming_ingest_fn

    res = 0.5
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, (96, 2)))
    y0 = jnp.sin(2.0 * x0[:, :1])
    z, u, c = covernet_update_inducing_parameters((x0, y0), res, lloyds=0)
    xb = jnp.asarray(rng.uniform(-1.3, 1.3, (64, 2)))
    yb = jnp.sin(2.0 * xb[:, :1])
    xq = jnp.asarray(rng.uniform(-1.2, 1.2, (19, 2)))
    cap = 24  # multiple of the 8-way mesh

    dense = _make_model("chol")
    params_d = dense.init_params(z, pseudo_u=u, cluster_counts=c, capacity=cap)
    ingest_d = make_streaming_ingest_fn(dense, res)
    params_d, post_d = ingest_d(params_d, xb, yb)
    mu_d, var_d = dense.posterior_predict(post_d, xq)
    m_d = int(params_d["inducing_mask"].sum())

    mesh = make_mesh(8)
    kernel = Matern32()
    models = [
        ImplicitCGGP(kernel=kernel, num_data=96, num_probes=3,
                     error_threshold=1e-14, max_cg_iterations=cap),
        ShardedCGGP(kernel=kernel, mesh=mesh, num_data=96, num_probes=3,
                    error_threshold=1e-14, max_cg_iterations=cap),
    ]
    for model in models:
        params = model.init_params(z, pseudo_u=u, cluster_counts=c,
                                   capacity=cap)
        ingest = make_streaming_ingest_fn(model, res, posterior_solver="cg")
        params, post = ingest(params, xb, yb)
        assert int(params["inducing_mask"].sum()) == m_d
        mu, var = model.posterior_predict(post, xq)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_d),
                                   atol=5e-6)
