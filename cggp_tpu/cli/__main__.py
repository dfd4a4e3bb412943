"""Unified CLI entry point: ``python -m cggp_tpu.cli <group> ...``.

Groups mirror the reference's per-script command trees (see package
docstring in ``cggp_tpu/cli/__init__.py``).
"""

import click

from cggp_tpu.cli.condition_wasserstein import main as condition_wasserstein_main
from cggp_tpu.cli.geospatial_csv import main as geospatial_csv_main
from cggp_tpu.cli.paper_gpr import main as gpr_main
from cggp_tpu.cli.paper_geospatial import main as geospatial_main
from cggp_tpu.cli.paper_uci import main as uci_main
from cggp_tpu.cli.predict import main as predict_main
from cggp_tpu.cli.sweep import main as sweep_main
from cggp_tpu.cli.train import main as train_main
from cggp_tpu.cli.uci_csv import main as uci_csv_main
from cggp_tpu.cli.uci_plot import main as uci_plot_main


@click.group()
def cli():
    """TPU-native conjugate-gradient sparse GP experiment drivers."""


cli.add_command(uci_main, "uci")
cli.add_command(gpr_main, "gpr")
cli.add_command(geospatial_main, "geospatial")
cli.add_command(train_main, "train")
cli.add_command(predict_main, "predict")
cli.add_command(uci_csv_main, "uci-csv")
cli.add_command(uci_plot_main, "uci-plot")
cli.add_command(geospatial_csv_main, "geospatial-csv")
cli.add_command(condition_wasserstein_main, "condition-wasserstein")
cli.add_command(sweep_main, "sweep")


if __name__ == "__main__":
    cli()
