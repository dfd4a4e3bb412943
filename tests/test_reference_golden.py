"""Cross-implementation golden tests against the REFERENCE code itself.

Round-1 parity was self-parity (fp32 vs fp64 of the same JAX code,
tests/test_parity.py) — it could not catch a semantic error shared by both
precisions.  These tests run the reference's own implementations — the pure-TF
CG solver (/root/reference/cggp/conjugate_gradient.py:24-122) and the numpy
cover tree (/root/reference/cggp/covertree.py:25-176), both importable in this
environment — on the same inputs as the TPU-native JAX re-implementations and
assert the outputs agree to fp64 tolerance.

Only behaviour is compared (solutions, gradients, iteration counts, tree
centers/means/counts); no reference code is copied.
"""

from __future__ import annotations

import sys
import warnings

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"

tf = pytest.importorskip("tensorflow")

if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

try:
    from cggp.conjugate_gradient import (  # noqa: E402
        ConjugateGradient as RefConjugateGradient,
        conjugate_gradient as ref_conjugate_gradient,
    )
    from cggp.covertree import CoverTree as RefCoverTree  # noqa: E402
except Exception as exc:  # pragma: no cover - reference not present
    pytest.skip(f"reference not importable: {exc}", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cggp_tpu.ops.cg import ConjugateGradient, conjugate_gradient  # noqa: E402
from cggp_tpu.selection.covertree import CoverTree  # noqa: E402


def _spd_system(n=64, m=5, seed=0, dtype=np.float64):
    """SE-kernel Gram + noise diagonal: the system class CG solves in CDGP."""
    rng = np.random.RandomState(seed)
    x = rng.uniform(-2.0, 2.0, (n, 3)).astype(dtype)
    r2 = np.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    a = np.exp(-0.5 * r2) + 0.5 * np.eye(n, dtype=dtype)
    b = rng.standard_normal((m, n)).astype(dtype)
    return a.astype(dtype), b


class TestCGGolden:
    """Repo CG vs the reference's conjugate_gradient() on identical systems."""

    def test_solution_matches_reference(self):
        a, b = _spd_system()
        v0 = np.zeros_like(b)
        thr = 1e-12

        ref_sol, (ref_steps, _ref_err) = ref_conjugate_gradient(
            tf.constant(a), tf.constant(b), tf.constant(v0), thr,
            max_iterations=200, max_steps_cycle=201,
        )
        sol, stats = conjugate_gradient(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(v0), thr,
            max_iterations=200, max_steps_cycle=201,
        )
        np.testing.assert_allclose(
            np.asarray(sol), ref_sol.numpy(), rtol=5e-8, atol=5e-8
        )
        # Identical stop rule + update order => identical iteration counts.
        assert int(stats.steps) == int(ref_steps.numpy())
        # And both actually solve the system.
        # Stop rule is 0.5||r||^2 <= 1e-12 per row => residual elements ~1e-7.
        np.testing.assert_allclose(np.asarray(sol) @ a, b, rtol=1e-5, atol=1e-5)

    def test_restart_cycle_matches_reference(self):
        """Exercise the periodic residual-recompute branch (reference :71-76)."""
        a, b = _spd_system(n=48, m=3, seed=1)
        v0 = np.zeros_like(b)
        thr = 1e-13

        ref_sol, (ref_steps, _) = ref_conjugate_gradient(
            tf.constant(a), tf.constant(b), tf.constant(v0), thr,
            max_iterations=120, max_steps_cycle=7,
        )
        sol, stats = conjugate_gradient(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(v0), thr,
            max_iterations=120, max_steps_cycle=7,
        )
        np.testing.assert_allclose(
            np.asarray(sol), ref_sol.numpy(), rtol=1e-9, atol=1e-9
        )
        assert int(stats.steps) == int(ref_steps.numpy())

    def test_gradients_match_reference(self):
        """d(loss)/d(matrix), d(loss)/d(rhs) through both custom VJPs agree
        with each other AND with dense-solve autodiff (reference cg_test.py
        pattern, now cross-implementation)."""
        a, b = _spd_system(n=32, m=4, seed=2)
        v0 = np.zeros_like(b)
        w = np.random.RandomState(3).standard_normal(b.shape)
        thr = 1e-14

        # Reference: TF custom gradient.
        a_tf = tf.Variable(a)
        b_tf = tf.Variable(b)
        with tf.GradientTape() as tape:
            sol_tf, _ = ref_conjugate_gradient(
                a_tf, b_tf, tf.constant(v0), thr,
                max_iterations=100, max_steps_cycle=101,
            )
            loss_tf = tf.reduce_sum(sol_tf * w)
        ref_da, ref_db = tape.gradient(loss_tf, [a_tf, b_tf])

        # Reference dense-solve autodiff oracle (v A = b => v = b A^{-1}).
        with tf.GradientTape() as tape2:
            dense_tf = tf.transpose(tf.linalg.solve(a_tf, tf.transpose(b_tf)))
            loss_dense_tf = tf.reduce_sum(dense_tf * w)
        oracle_da, oracle_db = tape2.gradient(loss_dense_tf, [a_tf, b_tf])

        # Repo: JAX custom VJP.
        def loss_jax(a_, b_):
            sol, _ = conjugate_gradient(
                a_, b_, jnp.asarray(v0), thr,
                max_iterations=100, max_steps_cycle=101,
            )
            return jnp.sum(sol * w)

        da, db = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))

        # Repo dense autodiff oracle.
        def loss_dense(a_, b_):
            return jnp.sum(jnp.linalg.solve(a_, b_.T).T * w)

        da_o, db_o = jax.grad(loss_dense, argnums=(0, 1))(
            jnp.asarray(a), jnp.asarray(b)
        )

        # Cross-implementation CG-vs-CG parity.
        np.testing.assert_allclose(np.asarray(db), ref_db.numpy(), rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(da), ref_da.numpy(), rtol=1e-6, atol=1e-7)
        # Each implementation vs its own dense oracle.
        np.testing.assert_allclose(np.asarray(db), np.asarray(db_o), rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(ref_db.numpy(), oracle_db.numpy(), rtol=1e-6, atol=1e-8)
        # dA: both CG paths produce the same rank-structured estimate
        # -solution^T db, which differs from the dense-symmetric oracle by a
        # symmetrization; compare the symmetric parts.
        sym = lambda m: 0.5 * (m + m.T)
        np.testing.assert_allclose(
            sym(np.asarray(da)), sym(ref_da.numpy()), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(
            sym(np.asarray(da)), sym(np.asarray(da_o)), rtol=1e-5, atol=1e-7
        )

    def test_facade_matches_reference(self):
        """Column-convention facade (reference :160-212 vs ops/cg.py facade)."""
        a, b = _spd_system(n=40, m=3, seed=4)
        rhs_cols = b.T  # [n, m] column convention

        ref_solver = RefConjugateGradient(1e-12)
        ref = ref_solver(tf.constant(a), tf.constant(rhs_cols))

        solver = ConjugateGradient(1e-12)
        out = solver(jnp.asarray(a), jnp.asarray(rhs_cols))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=5e-8, atol=5e-8)


class TestCoverTreeGolden:
    """Repo CoverTree(backend='reference') vs the reference's numpy tree."""

    @pytest.mark.parametrize("voronoi", [True, False])
    @pytest.mark.parametrize("lloyds", [True, False])
    def test_tree_matches_reference(self, lloyds, voronoi):
        rng = np.random.RandomState(11)
        n = 300
        x = rng.uniform(-3.0, 3.0, (n, 2))
        y = np.sin(x[:, :1]) + 0.1 * rng.standard_normal((n, 1))
        res = 0.75

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ref_tree = RefCoverTree(
                lambda args: np.linalg.norm(args[0] - args[1], axis=-1),
                (x.copy(), y.copy()),
                spatial_resolution=res,
                lloyds=lloyds,
                voronoi=voronoi,
            )
            tree = CoverTree(
                None, (x.copy(), y.copy()), spatial_resolution=res,
                lloyds=lloyds, voronoi=voronoi, backend="reference",
            )

        # Same level structure and radii.
        assert tree.num_levels == len(ref_tree.levels)
        assert tree.max_radius == pytest.approx(ref_tree.levels[0][0].radius)

        # Node-for-node identical centers at every level.
        for lvl, ref_lvl in enumerate(ref_tree.levels):
            ref_centers = np.stack([node.point for node in ref_lvl])
            np.testing.assert_allclose(
                tree.level_centers[lvl], ref_centers, rtol=0, atol=0
            )

        # Identical pseudo-observation init: cluster means and counts.
        ref_means, ref_counts = ref_tree.cluster_mean_and_counts
        means, counts = tree.cluster_mean_and_counts
        np.testing.assert_allclose(counts, ref_counts, rtol=0, atol=0)
        np.testing.assert_allclose(means, ref_means, rtol=1e-12, atol=1e-12)

        # Identical cluster memberships (order-insensitive per cluster).
        for i, ref_ys in enumerate(ref_tree.cluster_ys):
            got = np.sort(tree.cluster_ys[i].ravel())
            want = np.sort(np.asarray(ref_ys).ravel())
            np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_fixed_num_levels_matches_reference(self):
        """No spatial_resolution: num_levels drives the radii (reference :50-57)."""
        rng = np.random.RandomState(5)
        x = rng.standard_normal((150, 3))
        y = rng.standard_normal((150, 1))

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ref_tree = RefCoverTree(lambda a: None, (x, y), num_levels=4)
            tree = CoverTree(None, (x, y), num_levels=4, backend="reference")

        np.testing.assert_allclose(tree.centroids, ref_tree.centroids, rtol=0, atol=0)
        _, ref_counts = ref_tree.cluster_mean_and_counts
        _, counts = tree.cluster_mean_and_counts
        np.testing.assert_allclose(counts, ref_counts)
