"""Device greedy delta-net selection (covernet): exactness, guarantees, wiring.

The net must be *exactly* the sequential greedy delta-net in scan order
(the cover tree's leaf-level seeding rule with global claiming, reference
covertree.py:42-156) — verified against a trivially-correct numpy oracle
with a block size small enough to force many blocks and multi-round
in-block resolution.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from cggp_tpu.selection import (
    covernet_lloyds,
    covernet_select,
    covernet_update_inducing_parameters,
)


def _greedy_net_oracle(x: np.ndarray, resolution: float) -> np.ndarray:
    """Sequential greedy delta-net: accept x[i] iff > resolution from all
    earlier accepted centers."""
    centers = []
    for p in x:
        if all(np.linalg.norm(p - c) > resolution for c in centers):
            centers.append(p)
    return np.stack(centers)


def _pairwise_min(a: np.ndarray) -> float:
    d = np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return float(d.min())


@pytest.mark.parametrize("resolution", [0.3, 0.8, 2.0])
def test_covernet_matches_sequential_oracle(rng, resolution):
    x = rng.normal(size=(700, 3))
    # Tiny blocks force many block boundaries and multi-round in-block MIS.
    z, m = covernet_select(jnp.asarray(x), resolution, block_size=64)
    oracle = _greedy_net_oracle(x, resolution)
    assert m == oracle.shape[0]
    np.testing.assert_allclose(np.asarray(z), oracle, rtol=0, atol=1e-12)


def test_covernet_separation_and_coverage(rng):
    x = rng.uniform(-3, 3, size=(2000, 2))
    res = 0.5
    z, m = covernet_select(jnp.asarray(x), res, block_size=256)
    z = np.asarray(z)
    assert _pairwise_min(z) > res  # minimum separation
    d = np.linalg.norm(x[:, None, :] - z[None, :, :], axis=-1)
    assert d.min(axis=1).max() <= res  # coverage


def test_covernet_buffer_auto_doubles(rng):
    x = rng.normal(size=(500, 2))
    res = 0.05  # nearly every point is its own center
    # Default (no cap): the buffer grows until the full net fits.
    z, m = covernet_select(jnp.asarray(x), res, block_size=128)
    oracle = _greedy_net_oracle(x, res)
    assert m == oracle.shape[0] > 64
    np.testing.assert_allclose(np.asarray(z), oracle, atol=1e-12)


def test_covernet_explicit_cap_truncates_with_warning(rng):
    x = rng.normal(size=(500, 2))
    res = 0.05
    with warnings.catch_warnings(record=True) as captured:
        warnings.simplefilter("always")
        z, m = covernet_select(
            jnp.asarray(x), res, max_points=64, block_size=128
        )
    assert m == 64  # hard cap, like every other strategy's -m
    assert any("truncated" in str(w.message) for w in captured)
    # The truncated net is the PREFIX of the full greedy net.
    oracle = _greedy_net_oracle(x, res)
    np.testing.assert_allclose(np.asarray(z), oracle[:64], atol=1e-12)


def test_covernet_lloyds_preserves_separation(rng):
    x = rng.uniform(-3, 3, size=(3000, 2))
    res = 0.7
    z, _ = covernet_select(jnp.asarray(x), res)
    z2 = covernet_lloyds(jnp.asarray(x), z, res, rounds=2)
    assert _pairwise_min(np.asarray(z2)) > res
    # Refinement actually moved something (blob means differ from seeds).
    assert not np.allclose(np.asarray(z2), np.asarray(z))


def test_covernet_update_inducing_parameters(rng):
    x = rng.uniform(-2, 2, size=(800, 2))
    y = rng.normal(size=(800, 1))
    res = 0.6
    iv, means, counts = covernet_update_inducing_parameters(
        (jnp.asarray(x), jnp.asarray(y)), res, lloyds=0
    )
    m = iv.shape[0]
    assert means.shape == (m, 1) and counts.shape == (m, 1)
    # counts total N (no empty cells before Lloyd's: centers are data points)
    assert float(jnp.sum(counts)) == x.shape[0]
    # means match a numpy Voronoi recomputation
    d = np.linalg.norm(x[:, None, :] - np.asarray(iv)[None, :, :], axis=-1)
    labels = d.argmin(axis=1)
    for i in range(m):
        np.testing.assert_allclose(
            np.asarray(means)[i, 0], y[labels == i, 0].mean(), atol=1e-10
        )


def test_covernet_update_with_lloyds_keeps_shapes(rng):
    x = rng.uniform(-2, 2, size=(600, 3))
    y = rng.normal(size=(600,))  # 1-D targets accepted like the other paths
    iv, means, counts = covernet_update_inducing_parameters(
        (jnp.asarray(x), jnp.asarray(y)), 0.8, lloyds=1
    )
    assert iv.shape[0] == means.shape[0] == counts.shape[0]
    assert _pairwise_min(np.asarray(iv)) > 0.8
    assert bool(jnp.all(jnp.isfinite(means))) and bool(jnp.all(counts >= 1.0))


def test_covernet_warns_when_nothing_reduced(rng):
    x = rng.normal(size=(50, 2)) * 100.0  # all points far apart
    with warnings.catch_warnings(record=True) as captured:
        warnings.simplefilter("always")
        covernet_update_inducing_parameters(
            (jnp.asarray(x), jnp.asarray(rng.normal(size=(50, 1)))), 1e-6
        )
    assert any("resolution" in str(w.message) for w in captured)


def test_covernet_covariance_metric_guarantee(rng):
    from cggp_tpu.ops import SquaredExponential

    x = rng.uniform(-2, 2, size=(1500, 2))
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.5, lengthscales=np.array([0.7, 1.3]))
    res = 0.9
    z, m = covernet_select(
        jnp.asarray(x), res, block_size=128,
        distance_type="covariance", kernel=kernel, kernel_params=kp,
    )
    assert 1 < m < x.shape[0]
    # separation in covariance distance: k(a,a)+k(b,b)-2k(a,b) > res^2
    k = np.asarray(kernel.K(kp, z))
    d2 = np.diag(k)[:, None] + np.diag(k)[None, :] - 2 * k
    np.fill_diagonal(d2, np.inf)
    assert d2.min() > res**2
    # coverage in the same metric
    kxz = np.asarray(kernel.K(kp, jnp.asarray(x), z))
    kxx = np.asarray(kernel.K_diag(kp, jnp.asarray(x)))
    d2_xz = kxx[:, None] + np.diag(k)[None, :] - 2 * kxz
    assert d2_xz.min(axis=1).max() <= res**2 + 1e-9


def test_covernet_correlation_equals_oips(rng):
    """For stationary kernels the correlation-metric net IS the OIPS rule
    (reference selection.py:87-96, rho = 1 - resolution) — but evaluated
    blocked-parallel.  Exact set equality against our OIPS scan."""
    from cggp_tpu.ops import Matern32
    from cggp_tpu.selection import oips

    x = rng.uniform(-2, 2, size=(900, 3))
    kernel = Matern32()
    kp = kernel.init_params(variance=1.0, lengthscales=np.full(3, 0.8))
    res = 0.45
    z, m = covernet_select(
        jnp.asarray(x), res, block_size=128,
        distance_type="correlation", kernel=kernel, kernel_params=kp,
    )
    z_oips, _idx = oips(kernel, kp, jnp.asarray(x), rho=1.0 - res,
                        max_points=x.shape[0])
    # OIPS seeds from argmax of the (constant) kernel diagonal = index 0,
    # then scans in the same order: identical acceptance rule => identical set.
    assert m == z_oips.shape[0]
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_oips), atol=1e-12)


def test_covernet_update_kernel_metric_rejects_lloyds(rng):
    from cggp_tpu.ops import SquaredExponential

    x = jnp.asarray(rng.uniform(-2, 2, size=(200, 2)))
    y = jnp.asarray(rng.normal(size=(200, 1)))
    kernel = SquaredExponential()
    kp = kernel.init_params(variance=1.0, lengthscales=np.ones(2))
    with pytest.raises(ValueError, match="euclidean-only"):
        covernet_update_inducing_parameters(
            (x, y), 0.5, lloyds=1, distance_type="covariance",
            kernel=kernel, kernel_params=kp,
        )
    iv, means, counts = covernet_update_inducing_parameters(
        (x, y), 0.5, lloyds=0, distance_type="covariance",
        kernel=kernel, kernel_params=kp,
    )
    assert iv.shape[0] == means.shape[0] == counts.shape[0] > 1


def test_covernet_cli_covariance_dispatch(rng):
    from cggp_tpu.cli.cli_utils import create_model_and_update_fn

    x = jnp.asarray(rng.uniform(-2, 2, size=(300, 2)))
    y = jnp.asarray(rng.normal(size=(300, 1)))
    model, params, update_fn = create_model_and_update_fn(
        "cdgp", (x, y),
        clustering_type="covernet",
        distance_type="covariance",
        clustering_kwargs={"spatial_resolution": 0.8},
    )
    m0 = update_fn(params)["inducing_points"].shape[0]
    # The selection adapts to the CURRENT hyperparameters: a much shorter
    # lengthscale decorrelates points, so the covariance-metric net keeps more.
    params2 = dict(params)
    kp = dict(params["kernel"])
    ell = model.kernel.lengthscales(params["kernel"])
    kp["lengthscales"] = model.kernel.bijector.inverse(ell / 8.0)
    params2["kernel"] = kp
    m1 = update_fn(params2)["inducing_points"].shape[0]
    assert m1 > m0


def test_covernet_cli_dispatch(rng):
    from cggp_tpu.cli.cli_utils import create_model_and_update_fn

    x = jnp.asarray(rng.uniform(-2, 2, size=(300, 2)))
    y = jnp.asarray(rng.normal(size=(300, 1)))
    model, params, update_fn = create_model_and_update_fn(
        "cdgp", (x, y),
        clustering_type="covernet",
        clustering_kwargs={"spatial_resolution": 0.7},
    )
    params = update_fn(params)
    m = params["inducing_points"].shape[0]
    assert m > 1
    assert _pairwise_min(np.asarray(params["inducing_points"])) > 0.7
    import jax

    loss = model.training_loss(params, (x, y), jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(loss))


# ---- fully-fused re-clustering (covernet_update_padded + recluster_fn) ----


def test_covernet_update_padded_matches_trimmed(rng):
    import jax

    from cggp_tpu.selection.covernet import covernet_update_padded

    x = jnp.asarray(rng.uniform(-2, 2, size=(600, 2)))
    y = jnp.asarray(rng.normal(size=(600, 1)))
    res, cap = 0.6, 64
    iv, means, counts = covernet_update_inducing_parameters(
        (x, y), res, lloyds=0
    )
    m = iv.shape[0]
    assert m < cap
    z, u, c, mask = jax.jit(
        lambda x, y: covernet_update_padded(x, y, res, cap, lloyds=0)
    )(x, y)
    assert z.shape == (cap, 2) and u.shape == (cap, 1)
    assert c.shape == (cap, 1) and mask.shape == (cap, 1)
    assert int(mask.sum()) == m
    np.testing.assert_allclose(np.asarray(z[:m]), np.asarray(iv), atol=1e-12)
    np.testing.assert_allclose(np.asarray(u[:m]), np.asarray(means), atol=1e-10)
    np.testing.assert_allclose(np.asarray(c[:m]), np.asarray(counts), atol=0)
    # pads: far coords, u 0, count 1, mask 0 (pad_inducing convention)
    assert float(jnp.min(z[m:, 0])) >= 1e6
    assert float(jnp.max(jnp.abs(u[m:]))) == 0.0
    np.testing.assert_allclose(np.asarray(c[m:]), 1.0)
    np.testing.assert_allclose(np.asarray(mask[m:]), 0.0)


def test_covernet_padded_lloyds_keeps_pads_in_place(rng):
    import jax

    from cggp_tpu.selection.covernet import covernet_update_padded

    x = jnp.asarray(rng.uniform(-2, 2, size=(800, 2)))
    y = jnp.asarray(rng.normal(size=(800, 1)))
    z, u, c, mask = covernet_update_padded(x, y, 0.7, 32, lloyds=2)
    m = int(mask.sum())
    assert _pairwise_min(np.asarray(z[:m])) > 0.7
    assert float(jnp.min(z[m:, 0])) >= 1e6  # pads unmoved by the mean-shift


def test_fused_recluster_training_chunk(rng):
    """One jitted dispatch = device re-selection + K Adam steps: finite loss,
    inducing buffers swapped in-place (no shape change), and under the
    covariance metric the selection tracks the current hyperparameters."""
    import jax
    import optax

    from cggp_tpu.models import ImplicitCGGP
    from cggp_tpu.selection.covernet import (
        covernet_update_padded,
        make_device_recluster_fn,
    )
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import make_adam_multi_step

    x = jnp.asarray(rng.uniform(-2, 2, size=(256, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(256, 1)), jnp.float32)
    res, cap = 0.6, 64
    kernel_kw = dict(distance_type="covariance")

    model = ImplicitCGGP(
        kernel=__import__("cggp_tpu.ops.kernels", fromlist=["Matern32"]).Matern32(),
        num_data=256, num_probes=3, error_threshold=1e-8,
        max_cg_iterations=cap, block=cap,
    )
    z0, u0, c0, mask0 = covernet_update_padded(
        x, y, res, cap, kernel=model.kernel,
        kernel_params=model.kernel.init_params(dtype=jnp.float32), **kernel_kw,
    )
    m0 = int(mask0.sum())
    assert 1 < m0 < cap
    params = model.init_params(
        jnp.asarray(z0[:m0]), pseudo_u=u0[:m0], cluster_counts=c0[:m0],
        capacity=cap, dtype=jnp.float32,
    )
    assert params["inducing_points"].shape == (cap, 2)

    recluster = make_device_recluster_fn(
        model, (x, y), res, cap, **kernel_kw
    )
    optimizer = optax.adam(0.05)
    opt_state = optimizer.init(params)
    multi_step = make_adam_multi_step(
        lambda p, b, k: model.training_loss(p, b, k), optimizer, (x, y),
        trainable_mask=model.trainable_mask(params),
        recluster_fn=recluster,
    )
    chunks = minibatch_index_iterator(jax.random.PRNGKey(0), 256, 64, 5)
    key = jax.random.PRNGKey(1)
    losses_all = []
    for i in range(3):
        key = jax.random.fold_in(key, i)
        params, opt_state, losses = multi_step(params, opt_state, next(chunks), key)
        losses_all.extend(np.asarray(losses).tolist())
    assert np.all(np.isfinite(losses_all))
    assert params["inducing_points"].shape == (cap, 2)  # never recompiled shapes
    # Lengthscales moved over 15 steps, so the covariance-metric net differs
    # from the initial selection.
    m1 = int(params["inducing_mask"].sum())
    assert m1 >= 1
    changed = (m1 != m0) or not np.allclose(
        np.asarray(params["inducing_points"][:min(m0, m1)]),
        np.asarray(z0[:min(m0, m1)]),
    )
    assert changed


def test_fused_recluster_matches_host_update(rng):
    """recluster_fn inside the dispatch == host covernet update + plain chunk
    (euclidean metric: the net is data-only, so both paths select the same
    buffers and the loss trajectories coincide)."""
    import jax
    import optax

    from cggp_tpu.models import ImplicitCGGP
    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.selection.covernet import (
        covernet_update_padded,
        make_device_recluster_fn,
    )
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import make_adam_multi_step

    x = jnp.asarray(rng.uniform(-2, 2, size=(200, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(200, 1)), jnp.float32)
    res, cap = 0.5, 32
    model = ImplicitCGGP(
        kernel=Matern32(), num_data=200, num_probes=3,
        error_threshold=1e-10, max_cg_iterations=cap, block=cap,
    )
    z0, u0, c0, mask0 = covernet_update_padded(x, y, res, cap, lloyds=0)
    m0 = int(mask0.sum())
    params = model.init_params(
        jnp.asarray(z0[:m0]), pseudo_u=u0[:m0], cluster_counts=c0[:m0],
        capacity=cap, dtype=jnp.float32,
    )
    optimizer = optax.adam(0.05)
    mask = model.trainable_mask(params)

    fused = make_adam_multi_step(
        lambda p, b, k: model.training_loss(p, b, k), optimizer, (x, y),
        trainable_mask=mask,
        recluster_fn=make_device_recluster_fn(model, (x, y), res, cap, lloyds=0),
    )
    plain = make_adam_multi_step(
        lambda p, b, k: model.training_loss(p, b, k), optimizer, (x, y),
        trainable_mask=mask,
    )
    idx = next(minibatch_index_iterator(jax.random.PRNGKey(3), 200, 50, 4))
    key = jax.random.PRNGKey(4)
    p1, _, l1 = fused(params, optimizer.init(params), idx, key)
    p2, _, l2 = plain(params, optimizer.init(params), idx, key)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1["kernel"]["lengthscales"]),
        np.asarray(p2["kernel"]["lengthscales"]), rtol=1e-6,
    )


def test_fused_recluster_sharded_mesh(rng):
    """Fused device re-clustering composes with the M-sharded model on the
    8-way virtual mesh (capacity divides the mesh, one compiled program)."""
    import jax
    import optax

    from cggp_tpu.ops.kernels import Matern32
    from cggp_tpu.parallel import ShardedCGGP, make_mesh
    from cggp_tpu.selection.covernet import (
        covernet_update_padded,
        make_device_recluster_fn,
    )
    from cggp_tpu.training.batching import minibatch_index_iterator
    from cggp_tpu.training.optimize import make_adam_multi_step

    x = jnp.asarray(rng.uniform(-2, 2, (256, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(256, 1)), jnp.float32)
    mesh = make_mesh(8)
    cap, res = 64, 1.0
    model = ShardedCGGP(
        kernel=Matern32(), mesh=mesh, num_data=256, num_probes=3,
        error_threshold=1e-8, max_cg_iterations=cap,
    )
    z0, u0, c0, mask0 = covernet_update_padded(x, y, res, cap, lloyds=0)
    m0 = int(mask0.sum())
    assert m0 < cap
    params = model.init_params(
        jnp.asarray(z0[:m0]), pseudo_u=u0[:m0], cluster_counts=c0[:m0],
        capacity=cap, dtype=jnp.float32,
    )
    assert params["inducing_points"].shape == (cap, 3)
    optimizer = optax.adam(0.02)
    multi = make_adam_multi_step(
        lambda p, b, k: model.training_loss(p, b, k), optimizer, (x, y),
        trainable_mask=model.trainable_mask(params),
        recluster_fn=make_device_recluster_fn(model, (x, y), res, cap,
                                              lloyds=0),
    )
    idx = next(minibatch_index_iterator(jax.random.PRNGKey(0), 256, 64, 3))
    params, _, losses = multi(params, optimizer.init(params), idx,
                              jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(losses)))
    assert params["inducing_points"].shape == (cap, 3)
    assert int(params["inducing_mask"].sum()) == m0  # euclid net is data-only


def test_init_params_capacity_validation(rng):
    from cggp_tpu.models import ImplicitCGGP
    from cggp_tpu.ops.kernels import Matern32

    x = jnp.asarray(rng.uniform(-1, 1, (32, 2)))
    model = ImplicitCGGP(kernel=Matern32(), num_data=32, block=16)
    counts = jnp.ones((10, 1))
    u = jnp.zeros((10, 1))
    with pytest.raises(ValueError, match="capacity 8 <"):
        model.init_params(x[:10], pseudo_u=u, cluster_counts=counts, capacity=8)
    with pytest.raises(ValueError, match="multiple"):
        model.init_params(x[:10], pseudo_u=u, cluster_counts=counts, capacity=17)
    p = model.init_params(x[:10], pseudo_u=u, cluster_counts=counts, capacity=32)
    assert p["inducing_points"].shape == (32, 2)
    assert int(p["inducing_mask"].sum()) == 10


def test_covernet_extend_equals_full_scan(rng):
    """Streaming growth == from-scratch net over the concatenation (old
    covered points would be re-rejected, so only the new block matters)."""
    from cggp_tpu.selection import covernet_extend

    x1 = rng.normal(size=(400, 2))
    x2 = rng.normal(size=(350, 2)) + 1.5  # partly new territory
    res = 0.4
    z1, m1 = covernet_select(jnp.asarray(x1), res, block_size=128)
    z2, m2 = covernet_extend(z1, jnp.asarray(x2), res, block_size=128)
    z_full, m_full = covernet_select(
        jnp.asarray(np.concatenate([x1, x2])), res, block_size=128
    )
    assert m2 == m_full > m1
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z_full), atol=1e-12)
    # the original centers are an unchanged prefix
    np.testing.assert_allclose(np.asarray(z2[:m1]), np.asarray(z1), atol=0)


def test_covernet_extend_cap_and_noop(rng):
    from cggp_tpu.selection import covernet_extend

    x1 = rng.normal(size=(300, 2))
    res = 0.5
    z1, m1 = covernet_select(jnp.asarray(x1), res)
    # Re-feeding covered data adds nothing.
    z_same, m_same = covernet_extend(z1, jnp.asarray(x1), res)
    assert m_same == m1
    # A hard cap truncates with a warning.
    x2 = rng.normal(size=(300, 2)) + 10.0
    with warnings.catch_warnings(record=True) as captured:
        warnings.simplefilter("always")
        z2, m2 = covernet_extend(z1, jnp.asarray(x2), res, max_points=m1 + 2)
    assert m2 == m1 + 2
    assert any("truncated" in str(w.message) for w in captured)
