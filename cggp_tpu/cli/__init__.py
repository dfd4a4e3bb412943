"""Command-line experiment drivers (reference cli.py / paper_cli_*.py).

One unified entry point — ``python -m cggp_tpu.cli <group> ...`` — whose
groups mirror the reference's per-script command trees:

* ``uci``        -> paper_cli_uci.py    (selection subgroups + compute-metrics)
* ``gpr``        -> paper_cli_gpr.py    (reference-hyperparameter producer)
* ``geospatial`` -> paper_cli_geospatial.py (train-adam drivers)
* ``train``      -> cli.py train-cggp-adam (generic Adam training; the
                    reference script is import-broken — SURVEY.md known-bugs
                    1-2 — ours works)
* ``predict``    -> paper_cli_predict_mu_var.py
* ``uci-csv``    -> paper_cli_uci_csv.py (results.json aggregation)
* ``sweep``      -> runs the TOML sweep grids (the reference ships configs
                    for an external runner; ours is built in)
"""

from cggp_tpu.cli.cli_utils import (
    DatasetType,
    FloatType,
    KernelType,
    LogdirPath,
    create_model,
    create_model_and_update_fn,
    create_update_fn,
)

__all__ = [
    "DatasetType",
    "FloatType",
    "KernelType",
    "LogdirPath",
    "create_model",
    "create_model_and_update_fn",
    "create_update_fn",
]
