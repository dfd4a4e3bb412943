"""Plot aggregated UCI sweep results (reference paper_cli_uci_plot.py:18-105).

Consumes the ``results.csv`` produced by ``uci-csv`` (or scans results.json
roots directly) and renders metric-vs-M curves per (model, precision,
clustering) group.
"""

from __future__ import annotations

from pathlib import Path

import click

from cggp_tpu.cli.cli_utils import LogdirPath
from cggp_tpu.cli.uci_csv import collect_results


@click.command("uci-plot")
@click.argument("roots", nargs=-1, required=True)
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-m", "--metric", default="test/rmse")
@click.option("-x", "--x-axis", default="num_inducing_points")
def main(roots, logdir, metric, x_axis):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    root0 = Path(roots[0])
    if root0.suffix == ".csv":
        frame = pd.read_csv(root0)
    else:
        frame = collect_results(roots)
    if frame.empty:
        raise click.UsageError(f"No results found under {list(roots)}")

    keys = [k for k in ("model", "precision", "clustering_type") if k in frame.columns]
    fig, ax = plt.subplots(figsize=(7, 5))
    if keys:
        for name, group in frame.groupby(keys):
            label = "/".join(str(v) for v in (name if isinstance(name, tuple) else (name,)))
            group = group.sort_values(x_axis)
            agg = group.groupby(x_axis)[metric].agg(["mean", "std"]).reset_index()
            ax.errorbar(agg[x_axis], agg["mean"], yerr=agg["std"].fillna(0.0),
                        marker="o", capsize=3, label=label)
        ax.legend()
    else:
        ax.plot(frame[x_axis], frame[metric], "o")
    ax.set_xlabel(x_axis)
    ax.set_ylabel(metric)
    ax.set_xscale("log")
    fig.tight_layout()
    out = Path(logdir, f"uci_{metric.replace('/', '_')}.png")
    fig.savefig(out, dpi=120)
    click.echo(f"wrote {out}")


if __name__ == "__main__":
    main()
