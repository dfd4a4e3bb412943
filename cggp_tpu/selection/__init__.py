"""Inducing-point selection strategies (reference selection.py / covertree.py).

Every strategy is a first-class component (SURVEY.md section 2.2):
cover tree (host numpy, run-once), k-means Lloyd (device ``lax.while_loop``),
k-means++ (scipy), OIPS, uniform, greedy max-variance.
"""

from cggp_tpu.selection.kmeans import kmeans_indices_and_distances, kmeans_lloyd
from cggp_tpu.selection.points import greedy_selection, oips, uniform
from cggp_tpu.selection.covertree import CoverTree
from cggp_tpu.selection.covernet import (
    covernet_extend,
    covernet_extend_update,
    covernet_extend_update_padded,
    covernet_lloyds,
    covernet_select,
    covernet_update_inducing_parameters,
)
from cggp_tpu.selection.update import (
    covertree_update_inducing_parameters,
    kmeans_update_inducing_parameters,
    labels_update_inducing_parameters,
)

__all__ = [
    "kmeans_indices_and_distances",
    "kmeans_lloyd",
    "greedy_selection",
    "oips",
    "uniform",
    "CoverTree",
    "covernet_extend",
    "covernet_extend_update",
    "covernet_extend_update_padded",
    "covernet_lloyds",
    "covernet_select",
    "covernet_update_inducing_parameters",
    "covertree_update_inducing_parameters",
    "kmeans_update_inducing_parameters",
    "labels_update_inducing_parameters",
]
