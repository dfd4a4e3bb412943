"""Device-resident greedy delta-net inducing-point selection ("covernet").

The cover tree's leaf level (reference covertree.py:42-156) delivers the two
properties the CGGP models actually consume downstream:

* **minimum separation** — every pair of final centers is > ``resolution``
  apart (each new center claims the ``d <= radius`` ball, so later seeds are
  strictly further away), which bounds the condition number of
  ``Kuu + Lambda`` (the paper's headline argument);
* **coverage** — every data point is within ``resolution`` of some center.

The tree construction itself is host-side and sequential (62-68 s at N=435k
even through the multithreaded C++ backend, docs/PERF.md) because the level
hierarchy forces point-at-a-time seeding.  This module produces a *flat*
greedy delta-net with the same two guarantees entirely on device:

* scan order defines the net: ``x[0]`` is a center; ``x[i]`` becomes a
  center iff its distance to every earlier center is > ``resolution`` —
  the textbook greedy net, identical to the cover tree's leaf-level seeding
  rule with global claiming (``selection/covertree.py`` numpy backend);
* the sequential scan is evaluated exactly, but in parallel: points stream
  through in blocks; within a block, repeated *parallel-MIS rounds* (each
  round accepts every candidate with no earlier surviving candidate inside
  ``resolution``, then removes everything the new centers cover) reproduce
  the sequential result — each round runs as [B, B] mask algebra on the
  MXU/VPU instead of one point at a time.  Blelloch et al. show such
  round-based greedy-MIS evaluation needs only polylog rounds for random
  orders; here every round is one fused device op, and progress is
  guaranteed (the lowest-indexed candidate is always accepted).

Net effect: the update-time selection moves from a minutes-scale host build
to a sub-second jitted program at N=435k (measured in docs/PERF.md), with
bit-deterministic output for a fixed scan order.

An optional post-selection Lloyd's refinement mirrors the cover tree's
``lloyds=True`` mean-shift (reference covertree.py:72-84): centers move to
their Voronoi-cell means *only when the move provably keeps the minimum
separation* (checked conservatively against both the moved and unmoved
positions of every other center, so the parallel update can never create a
violating pair).
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cggp_tpu.selection.kmeans import kmeans_indices_and_distances
from cggp_tpu.selection.update import _means_and_counts_from_labels

Array = jnp.ndarray


def _sqdist(a: Array, b: Array) -> Array:
    """Pairwise squared euclidean [n, m].

    HIGHEST-precision matmul: the accept/reject comparisons against
    ``resolution**2`` happen near the boundary, where bf16 matmul error
    (default TPU precision) would flip memberships run-to-run.
    """
    a2 = jnp.sum(jnp.square(a), axis=-1)
    b2 = jnp.sum(jnp.square(b), axis=-1)
    ab = jax.lax.dot_general(
        a, b,
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * ab, 0.0)


def _kernel_metric(kernel, kp, a: Array, b: Array, distance_type: str) -> Array:
    """Pairwise kernel-induced distance measure [n, m] (reference
    distance.py:6-34 semantics): ``covariance`` returns the SQUARED distance
    k(a,a) + k(b,b) - 2 k(a,b) (compared against resolution^2), ``correlation``
    returns 1 - k(a,b)/sqrt(k(a,a) k(b,b)) (compared against resolution)."""
    k_ab = kernel.K(kp, a, b)
    da = kernel.K_diag(kp, a)
    db = kernel.K_diag(kp, b)
    if distance_type == "covariance":
        return jnp.maximum(da[:, None] + db[None, :] - 2.0 * k_ab, 0.0)
    return 1.0 - k_ab / jnp.sqrt(da[:, None] * db[None, :])


def _scan_loop(
    pair_metric, x_pad: Array, n_valid: Array, thresh: Array,
    max_points: int, block_size: int,
    z_init: Optional[Array] = None, count_init: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Blocked exact greedy net scan over a pairwise metric.

    ``pair_metric(a, b) -> [n, m]`` yields the quantity compared against
    ``thresh`` (squared distance vs resolution^2 for euclidean/covariance,
    plain correlation distance vs resolution).  Returns
    ``(z [max_points, D], count, overflow)`` — ``overflow`` is True iff a
    greedy-accepted point was dropped for lack of buffer space (i.e. the
    true net is LARGER than max_points; count == max_points alone cannot
    distinguish an exact fit from truncation).
    """
    npad, d = x_pad.shape
    nblocks = npad // block_size
    bidx = jnp.arange(block_size, dtype=jnp.int32)
    # [i, j] True when j precedes i in scan order.
    earlier = bidx[None, :] < bidx[:, None]

    def block_body(b, state):
        z, count, overflow = state
        xb = jax.lax.dynamic_slice_in_dim(x_pad, b * block_size, block_size)
        valid = (b * block_size + bidx) < n_valid

        # Candidates: valid points not covered by any accepted center so far.
        d2_acc = pair_metric(xb, z)  # [B, max_points]
        slot = jnp.arange(max_points) < count
        min_d2 = jnp.min(
            jnp.where(slot[None, :], d2_acc, jnp.inf), axis=1,
            initial=jnp.inf,
        )
        cand = valid & (min_d2 > thresh)

        # Parallel-MIS rounds == the sequential greedy result within the block.
        conflict = pair_metric(xb, xb) <= thresh  # incl. diagonal (0 <= thresh)

        def mis_cond(s):
            c, _ = s
            return jnp.any(c)

        def mis_body(s):
            c, acc = s
            # Accept candidates with no earlier surviving candidate in range:
            # the sequential scan would reach them with no in-range center.
            blocked = jnp.any(conflict & earlier & c[None, :], axis=1)
            a_round = c & ~blocked
            # New centers cover (claim) everything within resolution —
            # including themselves via the diagonal.
            covered = jnp.any(conflict & a_round[None, :], axis=1)
            return c & ~covered, acc | a_round

        _, accepted = jax.lax.while_loop(
            mis_cond, mis_body, (cand, jnp.zeros_like(cand))
        )

        # Append accepted points in scan order.  On buffer overflow the
        # tail is dropped deterministically (count saturates at max_points;
        # the host wrapper detects saturation and retries with a larger
        # buffer).
        pos = count + jnp.cumsum(accepted.astype(jnp.int32)) - 1
        write = accepted & (pos < max_points)
        safe_pos = jnp.where(write, pos, max_points)  # OOB rows -> dropped
        z = z.at[safe_pos].set(xb, mode="drop")
        # A greedy-accepted point that did not fit = genuine truncation
        # (distinguishes an exactly-capacity net from a clipped one).
        overflow = overflow | jnp.any(accepted & ~write)
        count = jnp.minimum(
            count + jnp.sum(accepted, dtype=jnp.int32), max_points
        ).astype(jnp.int32)
        return z, count, overflow

    if z_init is None:
        z0 = jnp.zeros((max_points, d), dtype=x_pad.dtype)
        c0 = jnp.asarray(0, jnp.int32)
    else:
        # Streaming continuation: the scan starts with an already-accepted
        # center prefix — new points only become centers when they clear
        # every existing one (see covernet_extend).
        z0 = z_init
        c0 = jnp.asarray(count_init, jnp.int32)
    return jax.lax.fori_loop(
        0, nblocks, block_body, (z0, c0, jnp.asarray(False))
    )


@partial(jax.jit, static_argnums=(3, 4))
def _covernet_scan(
    x_pad: Array, n_valid: Array, delta2: Array, max_points: int, block_size: int
) -> Tuple[Array, Array]:
    """Euclidean greedy delta-net scan (squared distances vs resolution^2)."""
    return _scan_loop(_sqdist, x_pad, n_valid, delta2, max_points, block_size)


@partial(jax.jit, static_argnums=(3, 4))
def _covernet_scan_extend(
    x_pad: Array, n_valid: Array, delta2: Array, max_points: int,
    block_size: int, z_init: Array, count_init: Array,
) -> Tuple[Array, Array]:
    """Euclidean scan continuing from an accepted-center prefix."""
    return _scan_loop(_sqdist, x_pad, n_valid, delta2, max_points, block_size,
                      z_init=z_init, count_init=count_init)


@partial(jax.jit, static_argnums=(0, 5, 6, 7))
def _covernet_scan_kernel(
    kernel, kp, x_pad: Array, n_valid: Array, thresh: Array,
    max_points: int, block_size: int, distance_type: str,
) -> Tuple[Array, Array]:
    """Kernel-metric greedy net scan.  ``kp`` is traced, so re-selecting with
    updated hyperparameters (in-training re-clustering) reuses the compiled
    program."""
    metric = lambda a, b: _kernel_metric(kernel, kp, a, b, distance_type)
    return _scan_loop(metric, x_pad, n_valid, thresh, max_points, block_size)


def _pad_blocks(x: Array, block_size: int) -> Tuple[Array, Array, int]:
    """Shared scan plumbing: clamp ``block_size`` to the data (pow2, >=64)
    and pad the row count to a block multiple with copies of ``x[0]``
    (rejected by the scan via ``n_valid``).  Returns
    ``(x_pad, n_valid, block_size)`` — used by both :func:`covernet_select`
    and :func:`covernet_extend` so the pad/clamp rules cannot drift apart."""
    n, d = x.shape
    block_size = int(min(block_size, max(64, 1 << max(n - 1, 1).bit_length())))
    pad = (-n) % block_size
    if pad:
        x_pad = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad, d))])
    else:
        x_pad = x
    return x_pad, jnp.asarray(n, jnp.int32), block_size


def covernet_select(
    x: Array,
    resolution: float,
    max_points: Optional[int] = None,
    block_size: int = 4096,
    distance_type: str = "euclidean",
    kernel=None,
    kernel_params=None,
) -> Tuple[Array, int]:
    """Greedy delta-net over ``x`` in scan order; returns ``(z [m, D], m)``.

    Guarantees (non-saturated): pairwise center separation > ``resolution``,
    every point within ``resolution`` of a center — in the chosen metric.
    ``max_points`` is a HARD CAP like every other strategy's ``-m``: the net
    is truncated at that many centers (separation still guaranteed; coverage
    only up to the truncation point, with a warning).  With ``max_points=
    None`` the buffer starts at 1024 and auto-doubles (power-of-two ladder,
    so retries reuse the compile cache) until the full net fits.

    ``distance_type`` extends the net to the kernel-induced distances of
    reference distance.py:6-34 (which the reference's covertree advertises
    but ignores, covertree.py:36-47): ``"covariance"`` keeps every pair of
    centers with ``k(zi,zi) + k(zj,zj) - 2 k(zi,zj) > resolution^2``, a
    hyperparameter-adaptive bound on the off-diagonal mass of ``Kuu``;
    ``"correlation"`` keeps ``k(zi,zj)/sqrt(k k) < 1 - resolution`` — for
    stationary kernels exactly OIPS's acceptance rule (selection.py:87-96
    with ``rho = 1 - resolution``), evaluated blocked-parallel instead of
    point-at-a-time.  Hyperparameters are traced, so re-selection under
    updated params reuses the compiled program.
    """
    x = jnp.asarray(x)  # numpy float64 in -> default float (silently) here,
    # not inside the jit where an explicit-dtype request would warn
    n = x.shape[0]
    x_pad, n_valid, block_size = _pad_blocks(x, block_size)
    if distance_type == "euclidean":
        thresh = jnp.asarray(resolution, x_pad.dtype) ** 2
    elif distance_type in ("covariance", "correlation"):
        if kernel is None or kernel_params is None:
            raise ValueError(
                f"distance_type={distance_type!r} needs kernel and kernel_params"
            )
        thresh = jnp.asarray(resolution, x_pad.dtype)
        if distance_type == "covariance":
            thresh = thresh**2
            # Attainable range check: for stationary kernels the covariance
            # distance is bounded by sqrt(2 * variance), so a resolution at
            # or beyond that bound degenerates the net to a single center —
            # easy to hit mid-training as the variance shrinks.
            var = float(jnp.mean(kernel.K_diag(kernel_params, x[:1])))
            if resolution**2 >= 2.0 * var:
                warnings.warn(
                    f"covernet: covariance resolution {resolution} >= "
                    f"sqrt(2*variance)={np.sqrt(2 * var):.4g} — the metric "
                    "cannot exceed it, so only one center will be kept; "
                    "lower the resolution (it lives on the kernel's scale, "
                    "not the input's)."
                )
        elif resolution >= 1.0:
            warnings.warn(
                f"covernet: correlation resolution {resolution} >= 1 — "
                "positive-kernel correlation distance cannot exceed 1, so "
                "only one center will be kept; use a resolution in (0, 1) "
                "(the OIPS rho is 1 - resolution)."
            )
    else:
        raise ValueError(f"unknown distance_type {distance_type!r}")

    if max_points is None:
        cap = min(1024, max(n, 64))
    else:
        cap = min(max(int(max_points), 1), n)

    while True:
        if distance_type == "euclidean":
            z, count, overflow = _covernet_scan(
                x_pad, n_valid, thresh, cap, block_size
            )
        else:
            z, count, overflow = _covernet_scan_kernel(
                kernel, kernel_params, x_pad, n_valid, thresh, cap, block_size,
                distance_type,
            )
        m = int(count)
        if not bool(overflow):
            break
        if max_points is not None:
            # Explicit cap: truncate like kmeans/oips/uniform bound M, but
            # say so — the coverage guarantee stops at the truncation point.
            warnings.warn(
                f"covernet: net truncated at max_points={cap} (resolution "
                f"{resolution} wants more centers); separation holds, "
                "coverage is incomplete — raise max_points or the resolution."
            )
            break
        cap = min(cap * 2, n)
    return z[:m], m


def covernet_extend(
    z: Array,
    x_new: Array,
    resolution: float,
    max_points: Optional[int] = None,
    block_size: int = 4096,
) -> Tuple[Array, int]:
    """Streaming net growth: extend an existing net ``z`` with new data.

    Returns the updated ``(z', m')`` — the original centers (unchanged, as a
    prefix) plus every ``x_new`` point that clears ``resolution`` against
    all centers accepted before it.  EXACTLY equal to
    ``covernet_select(concat(x_old, x_new), resolution)`` when ``z`` was the
    net of ``x_old`` (covered old points would be re-rejected anyway), so
    online ingestion needs only the new block — the covertree has no
    incremental analogue (the reference rebuilds the whole tree per update,
    optimize.py:19-38).  ``max_points`` caps the TOTAL like
    :func:`covernet_select` (None = grow as needed).  Existing centers are
    never dropped: ``max_points < len(z)`` keeps all of ``z`` (with a
    warning) and accepts nothing new.
    """
    z = jnp.asarray(z)
    x_new = jnp.asarray(x_new, z.dtype)
    m0, d = z.shape
    n = x_new.shape[0]
    x_pad, n_valid, block_size = _pad_blocks(x_new, block_size)
    delta2 = jnp.asarray(resolution, z.dtype) ** 2

    warned_below = False
    if max_points is None:
        cap = max(64, 1 << (max(m0 + 64, 1) - 1).bit_length())
    else:
        if int(max_points) < m0:
            warnings.warn(
                f"covernet_extend: max_points={int(max_points)} is below "
                f"the existing net size {m0}; existing centers are never "
                "dropped, so no new centers will be accepted."
            )
            warned_below = True  # the truncation warning would be redundant
        cap = max(int(max_points), m0)

    while True:
        z_init = jnp.zeros((cap, d), z.dtype).at[:m0].set(z)
        zb, count, overflow = _covernet_scan_extend(
            x_pad, n_valid, delta2, cap, block_size,
            z_init, jnp.asarray(m0, jnp.int32),
        )
        m = int(count)
        if not bool(overflow):
            break
        if max_points is not None:
            if not warned_below:
                warnings.warn(
                    f"covernet_extend: net truncated at max_points="
                    f"{int(max_points)} (buffer {cap}); separation holds, "
                    "coverage of the new data is incomplete."
                )
            break
        cap = cap * 2
    return zb[:m], m


def covernet_extend_update(
    z: Array,
    pseudo_u: Array,
    cluster_counts: Array,
    data_new: Tuple[Array, Array],
    resolution: float,
    max_points: Optional[int] = None,
    block_size: int = 4096,
) -> Tuple[Array, Array, Array]:
    """Streaming inducing-parameter update: ingest a new data block.

    Extends the net with :func:`covernet_extend` (old centers unchanged, as
    a prefix) and MERGES the per-cluster sufficient statistics: each new
    point is Voronoi-assigned to its nearest center of the extended net and
    folded into that cluster's running mean/count —

        counts'_j = counts_j + n_new_j
        u'_j      = (u_j * counts_j + sum_new_j) / counts'_j

    Returns ``(Z', pseudo_u', cluster_counts')`` shaped ``[M', ...]`` with
    the original clusters in the first ``M`` slots.  This is the streaming
    twin of :func:`covernet_update_inducing_parameters` — O(n_new) work per
    ingest instead of a full rescan (the reference re-clusters from scratch
    every update, optimize.py:19-38).

    Semantics: exactly equal to a full recompute over all data in which OLD
    points keep their original assignments (valid: old centers never move,
    so old memberships stay radius-bounded by the net's coverage) and new
    points are Voronoi-assigned over the extended net.  A full re-partition
    may differ — points previously assigned to an old center can be closer
    to a new one; run the full update when exact Voronoi stats matter.
    Recorded counts are treated as true counts: a cluster carrying the
    empty-cell sentinel (count 1, mean 0 — reference optimize.py:70) absorbs
    one phantom zero observation into its merged mean.
    """
    z = jnp.asarray(z)
    x_new = jnp.asarray(data_new[0], z.dtype)
    y_new = jnp.asarray(data_new[1], z.dtype)
    if y_new.ndim == 1:
        y_new = y_new[:, None]
    u = jnp.asarray(pseudo_u, z.dtype)
    counts = jnp.asarray(cluster_counts, z.dtype)
    if counts.ndim == 1:
        counts = counts[:, None]
    m0 = z.shape[0]

    z_ext, m1 = covernet_extend(z, x_new, resolution, max_points, block_size)
    new_sums, new_counts = _voronoi_sums_counts(x_new, y_new, z_ext)

    old_sums = jnp.zeros_like(new_sums).at[:m0].set(u * counts)
    old_counts = jnp.zeros_like(new_counts).at[:m0].set(counts)
    total_counts = old_counts + new_counts
    safe_counts = jnp.clip(total_counts, 1.0, None)
    means = (old_sums + new_sums) / safe_counts
    return z_ext, means, safe_counts


@jax.jit
def _voronoi_sums_counts(x: Array, y: Array, z: Array):
    """Per-cluster y SUMS [M, P] and raw counts [M, 1] (no empty-cell
    clipping — the streaming merge needs true additive statistics)."""
    labels, _ = kmeans_indices_and_distances(z, x)
    m = z.shape[0]
    ones = jnp.ones(x.shape[0], dtype=y.dtype)
    counts = jax.ops.segment_sum(ones, labels, num_segments=m)
    sums = jax.ops.segment_sum(y, labels, num_segments=m)
    return sums, counts[:, None]


def covernet_extend_update_padded(
    z: Array,
    pseudo_u: Array,
    cluster_counts: Array,
    mask: Array,
    data_new: Tuple[Array, Array],
    resolution: float,
    block_size: int = 4096,
) -> Tuple[Array, Array, Array, Array]:
    """Fixed-capacity streaming ingest — fully jit-composable.

    The static-shape twin of :func:`covernet_extend_update`: all inputs and
    outputs keep the ``[capacity, ...]`` leading dimension of
    :func:`covernet_update_padded` (real clusters in the first ``m`` slots,
    pad_inducing-convention pads after, ``mask`` marking real rows), so the
    whole ingest path — net growth, Voronoi assignment of the new block,
    sufficient-statistics merge — traces ONCE and never recompiles across
    ingests.  Compose with ``assign_clusters_device`` and a jitted
    ``posterior`` rebuild for a single-dispatch ingest-to-serving-cache
    pipeline (``training.optimize.make_streaming_ingest_fn``).

    Why this exists next to ``posterior_extend``'s bordered algebra: through
    a remote-dispatch link the eager extension's ~15 small ops cost more
    than the O(M'^3) rebuild they avoid (chip-measured 0.3-0.7x at
    M=1024-8192, scripts/streaming_chip.py) — on TPU the win comes from
    static shapes + one compiled program, not from shaving flops.

    Same merge semantics as :func:`covernet_extend_update` (old points keep
    their assignments; recorded counts treated as true counts).  ``mask``
    must be prefix-contiguous (the convention every padded producer keeps).
    A net outgrowing the capacity is silently truncated (warnings cannot
    fire under jit): separation holds, coverage of the new data stops at the
    truncation point — size the capacity with headroom and watch
    ``mask.sum()``.
    """
    z = jnp.asarray(z)
    x_new = jnp.asarray(data_new[0], z.dtype)
    y_new = jnp.asarray(data_new[1], z.dtype)
    if y_new.ndim == 1:
        y_new = y_new[:, None]
    u = jnp.asarray(pseudo_u, z.dtype)
    counts = jnp.asarray(cluster_counts, z.dtype)
    if counts.ndim == 1:
        counts = counts[:, None]
    mask = jnp.asarray(mask, z.dtype)
    if mask.ndim == 1:
        mask = mask[:, None]
    capacity = z.shape[0]

    m0 = jnp.sum(mask, dtype=jnp.int32)
    x_pad, n_valid, block_size = _pad_blocks(x_new, block_size)
    delta2 = jnp.asarray(resolution, z.dtype) ** 2
    # Slots >= count are invisible to the scan (its accept test masks by
    # count, not coordinates), so the far-coordinate pads pass through
    # untouched and new centers overwrite pad slots in place.
    z_ext, count, _overflow = _covernet_scan_extend(
        x_pad, n_valid, delta2, capacity, block_size, z, m0
    )
    slot = (jnp.arange(capacity) < count)[:, None]
    mask_ext = slot.astype(z.dtype)

    new_sums, new_counts = _voronoi_sums_counts(x_new, y_new, z_ext)
    # Pad rows carry the count-1 sentinel — mask them out of the merge.
    old_sums = u * counts * mask
    old_counts = counts * mask
    total = old_counts + new_counts
    safe = jnp.clip(total, 1.0, None)
    means = (old_sums + new_sums) / safe * mask_ext
    counts_out = jnp.where(mask_ext > 0, safe, jnp.ones_like(safe))
    return z_ext, means, counts_out, mask_ext


def covernet_lloyds(
    x: Array,
    z: Array,
    resolution: float,
    rounds: int = 1,
) -> Array:
    """Separation-preserving Lloyd's refinement of net centers.

    Mirrors the cover tree's mean-shift (reference covertree.py:72-84): each
    center moves to the mean of its Voronoi cell unless that would violate
    the minimum-separation guarantee.  The check is conservative — a proposed
    position must clear ``resolution`` against both the *proposed* and
    *current* positions of every other center — so the parallel update can
    never produce a violating pair regardless of which moves are accepted.
    Coverage can relax to at most 2x``resolution`` after a move (the cell
    mean sits inside the cell's circumscribed ball); the conditioning
    guarantee, which depends on separation only, is preserved exactly.
    """
    x = jnp.asarray(x)
    delta2 = jnp.asarray(resolution, x.dtype) ** 2
    for _ in range(int(rounds)):
        z = _lloyds_round(x, z, delta2)
    return z


@jax.jit
def _lloyds_round(x: Array, z: Array, delta2: Array) -> Array:
    """One separation-preserving mean-shift round (module-level jit: a
    closure-level ``jax.jit`` would retrace on every call)."""
    labels, _ = kmeans_indices_and_distances(z, x)
    m = z.shape[0]
    ones = jnp.ones(x.shape[0], dtype=x.dtype)
    counts = jax.ops.segment_sum(ones, labels, num_segments=m)
    sums = jax.ops.segment_sum(x, labels, num_segments=m)
    proposed = jnp.where(
        (counts > 0)[:, None], sums / jnp.clip(counts, 1.0, None)[:, None], z
    )
    off = ~jnp.eye(m, dtype=bool)
    d_pp = jnp.where(off, _sqdist(proposed, proposed), jnp.inf)
    d_po = jnp.where(off, _sqdist(proposed, z), jnp.inf)
    ok = jnp.minimum(jnp.min(d_pp, axis=1), jnp.min(d_po, axis=1)) > delta2
    return jnp.where(ok[:, None], proposed, z)


def covernet_update_inducing_parameters(
    data: Tuple[Array, Array],
    spatial_resolution: float,
    max_points: Optional[int] = None,
    lloyds: int = 1,
    block_size: int = 4096,
    distance_type: str = "euclidean",
    kernel=None,
    kernel_params=None,
) -> Tuple[Array, Array, Array]:
    """Device delta-net -> ``(Z, pseudo_u, cluster_counts)``.

    Drop-in twin of :func:`covertree_update_inducing_parameters`
    (reference optimize.py:19-38) with the whole selection on device: net
    scan, optional separation-preserving Lloyd's rounds, Voronoi labels, and
    per-cluster means/counts.  Voronoi cells of a net are never empty before
    Lloyd's (each center is a data point claiming at least itself); after a
    mean move an emptied cell keeps count 1 / mean 0 like the labels path.

    Kernel metrics (``distance_type`` covariance/correlation) select under
    the kernel-induced distance; the Voronoi labeling stays euclidean like
    the reference's selection->parameters plumbing (optimize.py:50-51 labels
    by squared euclidean distance for every non-kmeans strategy).  Lloyd's
    mean-shift is euclidean geometry and is rejected for kernel metrics.
    """
    x = jnp.asarray(data[0])
    y = jnp.asarray(data[1], dtype=x.dtype)
    if y.ndim == 1:
        y = y[:, None]
    if distance_type != "euclidean" and lloyds:
        raise ValueError(
            "covernet Lloyd's refinement is euclidean-only; pass lloyds=0 "
            f"with distance_type={distance_type!r}"
        )
    z, m = covernet_select(
        x, spatial_resolution, max_points, block_size,
        distance_type=distance_type, kernel=kernel, kernel_params=kernel_params,
    )
    if m == x.shape[0] and m > 1:
        warnings.warn(
            f"covernet: resolution {spatial_resolution} kept all {m} points "
            "as centers; increase the resolution for an actual reduction."
        )
    if lloyds:
        z = covernet_lloyds(x, z, spatial_resolution, rounds=lloyds)
    means, counts = _voronoi_means_counts(x, y, z)
    return z, means, counts


@jax.jit
def _voronoi_means_counts(x: Array, y: Array, z: Array):
    labels, _ = kmeans_indices_and_distances(z, x)
    return _means_and_counts_from_labels(y, labels, z.shape[0])


def covernet_update_padded(
    x: Array,
    y: Array,
    spatial_resolution: float,
    capacity: int,
    block_size: int = 4096,
    lloyds: int = 0,
    distance_type: str = "euclidean",
    kernel=None,
    kernel_params=None,
) -> Tuple[Array, Array, Array, Array]:
    """Fixed-capacity covernet update -> ``(Z, u, counts, mask)``, all
    ``[capacity, ...]`` — jit-composable (no host fetch, no shape change).

    The fully-fused re-clustering building block: every output keeps the
    static ``capacity`` leading dimension, with the net's real centers in the
    first ``count`` slots and :func:`~cggp_tpu.ops.cg_implicit.pad_inducing`
    convention pads after (coords ``1e6*(1+i)``, count 1, pseudo-u 0, mask 0)
    — exact no-ops in every masked-model objective.  Compose with
    :meth:`~cggp_tpu.models.rowcg.RowSolveCGGP.assign_clusters_device` inside
    a jitted training chunk (``make_adam_multi_step(recluster_fn=...)``) so
    inducing points re-select ON DEVICE every dispatch, adapting to the
    current hyperparameters under kernel metrics with zero host roundtrips.

    A net larger than ``capacity`` is silently truncated (separation holds,
    coverage stops at the truncation point; warnings cannot fire under jit) —
    size ``capacity`` with headroom and check ``mask.sum()`` when in doubt.
    """
    if distance_type == "euclidean":
        thresh = jnp.asarray(spatial_resolution, x.dtype) ** 2
    elif distance_type in ("covariance", "correlation"):
        if kernel is None or kernel_params is None:
            raise ValueError(
                f"distance_type={distance_type!r} needs kernel and kernel_params"
            )
        thresh = jnp.asarray(spatial_resolution, x.dtype)
        if distance_type == "covariance":
            thresh = thresh**2
    else:
        raise ValueError(f"unknown distance_type {distance_type!r}")
    if lloyds and distance_type != "euclidean":
        raise ValueError(
            "covernet Lloyd's refinement is euclidean-only; pass lloyds=0 "
            f"with distance_type={distance_type!r}"
        )
    if y.ndim == 1:
        y = y[:, None]

    n, d = x.shape
    block_size = int(min(block_size, max(64, 1 << (n - 1).bit_length())))
    pad = (-n) % block_size
    if pad:
        x_pad = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad, d))])
    else:
        x_pad = x
    n_valid = jnp.asarray(n, jnp.int32)
    capacity = int(capacity)

    if distance_type == "euclidean":
        z_buf, count, _overflow = _covernet_scan(
            x_pad, n_valid, thresh, capacity, block_size
        )
    else:
        z_buf, count, _overflow = _covernet_scan_kernel(
            kernel, kernel_params, x_pad, n_valid, thresh, capacity,
            block_size, distance_type,
        )
    slot = jnp.arange(capacity) < count
    far = 1.0e6 * (1.0 + jnp.arange(1, capacity + 1, dtype=x.dtype))[:, None]
    z = jnp.where(slot[:, None], z_buf, jnp.broadcast_to(far, (capacity, d)))
    if lloyds:
        delta2 = jnp.asarray(spatial_resolution, x.dtype) ** 2
        for _ in range(int(lloyds)):
            # Pad slots have empty Voronoi cells (far coords never win the
            # argmin), so the mean-shift leaves them in place.
            z = _lloyds_round(x, z, delta2)
    means, counts = _voronoi_means_counts(x, y, z)
    mask = slot.astype(x.dtype)[:, None]
    return z, means * mask, counts, mask


def make_device_recluster_fn(
    model,
    data: Tuple[Array, Array],
    spatial_resolution: float,
    capacity: int,
    block_size: int = 4096,
    lloyds: int = 0,
    distance_type: str = "euclidean",
):
    """Build ``recluster(params) -> params``: a pure, jit-composable
    inducing-point update for a masked row-solve model
    (:class:`~cggp_tpu.models.implicit.ImplicitCGGP` /
    :class:`~cggp_tpu.parallel.model.ShardedCGGP`) whose params were built
    with ``init_params(..., capacity=capacity)``.

    Under kernel metrics the selection reads the CURRENT kernel params each
    call, so in-training re-selection adapts to the moving hyperparameters —
    the TPU-first answer to the reference's host-roundtrip re-clustering
    (optimize.py:19-38 pulls data to numpy every update).
    """
    x = jnp.asarray(data[0])
    y = jnp.asarray(data[1], dtype=x.dtype)
    multiple = model._pad_multiple_for(int(capacity))
    if int(capacity) % multiple != 0:
        raise ValueError(
            f"capacity {capacity} must be a multiple of {multiple} "
            "(the model's pad multiple: mesh size for ShardedCGGP, panel "
            "block for ImplicitCGGP)"
        )

    def recluster(params: Dict) -> Dict:
        kernel_kwargs = (
            {} if distance_type == "euclidean"
            else {"kernel": model.kernel, "kernel_params": params["kernel"]}
        )
        z, u, counts, mask = covernet_update_padded(
            x, y, spatial_resolution, capacity, block_size=block_size,
            lloyds=lloyds, distance_type=distance_type, **kernel_kwargs,
        )
        return model.assign_clusters_device(params, z, u, counts, mask)

    return recluster
