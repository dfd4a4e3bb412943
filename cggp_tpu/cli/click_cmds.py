"""Selection-strategy click subgroups shared by the experiment drivers
(reference click_cmds.py:7-179).

Each group builds ``(model, params, update_fn)`` from the parent context and
stores it as ``ip_ctx`` for terminal commands like ``compute-metrics`` /
``train-adam``.  :func:`make_selection_groups` returns *fresh* group objects
so each driver (uci, geospatial, ...) can attach its own terminal commands.

Unlike the reference, the ``kmeans2`` group really dispatches to scipy
k-means++ (reference click_cmds.py:73 set ``clustering_type="kmeans"`` —
SURVEY.md known-bugs 6).
"""

from __future__ import annotations

from typing import Dict

import click

from cggp_tpu.cli.cli_utils import DistanceChoices, create_model_and_update_fn


def _build_ip_ctx(ctx: click.Context, clustering_type: str, clustering_kwargs: Dict,
                  distance_type: str) -> None:
    common_ctx: Dict = ctx.obj["common_ctx"]
    model, params, update_fn = create_model_and_update_fn(
        common_ctx["model_class"],
        common_ctx["dataset"].train,
        clustering_type=clustering_type,
        distance_type=distance_type,
        error_threshold=common_ctx.get("error_threshold", 1e-6),
        dtype=common_ctx.get("dtype"),
        seed=common_ctx.get("seed", 0),
        dot=common_ctx.get("dot", "standard"),
        jitter=common_ctx.get("jitter", 1e-6),
        relative_threshold=common_ctx.get("relative_threshold", False),
        model_kwargs=common_ctx.get("model_kwargs"),
        clustering_kwargs=clustering_kwargs,
        kernel_fn=common_ctx.get("kernel_fn"),
    )
    ctx.obj["ip_ctx"] = dict(
        model=model,
        params=params,
        update_fn=update_fn,
        clustering_type=clustering_type,
        clustering_kwargs=clustering_kwargs,
        distance_type=distance_type,
    )


def make_selection_groups() -> Dict[str, click.Group]:
    """Fresh covertree/covernet/kmeans/kmeans2/oips/uniform/greedy groups."""

    @click.group("covertree")
    @click.option("-s", "--spatial-resolution", type=float, required=True)
    @click.option("-d", "--distance-type", type=DistanceChoices, default="euclidean")
    @click.pass_context
    def covertree(ctx, spatial_resolution, distance_type):
        _build_ip_ctx(
            ctx, "covertree", {"spatial_resolution": spatial_resolution}, distance_type
        )

    @click.group("covernet")
    @click.option("-s", "--spatial-resolution", type=float, required=True)
    @click.option("-m", "--max-num-ip", type=int, default=None,
                  help="Hard cap on M (net truncated with a warning, like "
                       "every other strategy's -m). Default: grow until the "
                       "resolution's full net fits.")
    @click.option("--lloyds", type=int, default=None,
                  help="Separation-preserving Lloyd's refinement rounds "
                       "(default 1; euclidean metric only).")
    @click.option("-d", "--distance-type", type=DistanceChoices, default="euclidean")
    @click.pass_context
    def covernet(ctx, spatial_resolution, max_num_ip, lloyds, distance_type):
        _build_ip_ctx(
            ctx, "covernet",
            {"spatial_resolution": spatial_resolution, "max_points": max_num_ip,
             "lloyds": lloyds},
            distance_type,
        )

    @click.group("kmeans")
    @click.option("-m", "--max-num-ip", type=int, required=True)
    @click.option("-d", "--distance-type", type=DistanceChoices, default="euclidean")
    @click.pass_context
    def kmeans(ctx, max_num_ip, distance_type):
        _build_ip_ctx(ctx, "kmeans", {"max_points": max_num_ip}, distance_type)

    @click.group("kmeans2")
    @click.option("-m", "--max-num-ip", type=int, required=True)
    @click.option("-d", "--distance-type", type=DistanceChoices, default="euclidean")
    @click.pass_context
    def kmeans2(ctx, max_num_ip, distance_type):
        _build_ip_ctx(ctx, "kmeans2", {"max_points": max_num_ip}, distance_type)

    @click.group("oips")
    @click.option("-r", "--rho", type=float, required=True)
    @click.option("-m", "--max-num-ip", type=int)
    @click.option("-d", "--distance-type", type=DistanceChoices, default="euclidean")
    @click.pass_context
    def oips(ctx, rho, max_num_ip, distance_type):
        _build_ip_ctx(
            ctx, "oips", {"rho": rho, "max_points": max_num_ip}, distance_type
        )

    @click.group("uniform")
    @click.option("-m", "--max-num-ip", type=int, required=True)
    @click.option("-d", "--distance-type", type=DistanceChoices, default="euclidean")
    @click.pass_context
    def uniform(ctx, max_num_ip, distance_type):
        _build_ip_ctx(ctx, "uniform", {"max_points": max_num_ip}, distance_type)

    @click.group("greedy")
    @click.option("-m", "--max-num-ip", type=int, required=True)
    @click.option("-d", "--distance-type", type=DistanceChoices, default="euclidean")
    @click.pass_context
    def greedy(ctx, max_num_ip, distance_type):
        _build_ip_ctx(ctx, "greedy", {"max_points": max_num_ip}, distance_type)

    return {
        "covertree": covertree,
        "covernet": covernet,
        "kmeans": kmeans,
        "kmeans2": kmeans2,
        "oips": oips,
        "uniform": uniform,
        "greedy": greedy,
    }
