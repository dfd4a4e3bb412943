"""Aggregate many ``results.json`` files into CSV tables
(reference paper_cli_uci_csv.py:18-91, which used TinyDB over the sweep grid;
plain JSON scanning + pandas here).

Collects every ``results.json`` under the given roots (wildcards allowed),
flattens them into one tidy DataFrame, writes ``results.csv`` and — when a
groupby key list is given — per-group mean/std summary CSVs, the shape the
paper's tables are built from.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import click
import pandas as pd

from cggp_tpu.cli.cli_utils import LogdirPath, expand_paths_with_wildcards


def collect_results(roots: Sequence[str]) -> pd.DataFrame:
    rows = []
    for root in expand_paths_with_wildcards(list(roots)) or list(roots):
        for path in sorted(Path(root).rglob("results.json")):
            with open(path) as fh:
                row = json.load(fh)
            row["__path"] = str(path)
            rows.append(row)
    return pd.DataFrame(rows)


@click.command("uci-csv")
@click.argument("roots", nargs=-1, required=True)
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option(
    "-g", "--groupby", multiple=True,
    default=("model", "dataset", "precision", "clustering_type", "jitter"),
)
@click.option(
    "-m", "--metrics", multiple=True,
    default=("test/rmse", "test/nlpd", "train/elbo", "condition_number",
             "num_inducing_points"),
)
def main(roots, logdir, groupby, metrics):
    frame = collect_results(roots)
    if frame.empty:
        raise click.UsageError(f"No results.json found under {list(roots)}")
    out = Path(logdir, "results.csv")
    frame.to_csv(out, index=False)
    click.echo(f"wrote {out} ({len(frame)} rows)")

    # Lanczos condition numbers are systematically optimistic (eig_min is
    # an over-estimate, ops/logdet.py): flag any aggregation that would
    # average the exact eigvalsh estimator with lanczos in one group.
    if "condition_method" in frame.columns and "condition_number" in metrics:
        mixed = frame.groupby(
            [k for k in groupby if k in frame.columns] or ["__path"]
        )["condition_method"].nunique()
        if (mixed > 1).any():
            click.echo(
                "WARNING: condition_number mixes estimators "
                f"({sorted(frame['condition_method'].dropna().unique())}) "
                "within a summary group — lanczos eig_min is an "
                "over-estimate, so those means are not comparable. "
                "Add 'condition_method' to --groupby to split them."
            )

    keys = [k for k in groupby if k in frame.columns]
    cols = [m for m in metrics if m in frame.columns]
    if keys and cols:
        summary = frame.groupby(keys)[cols].agg(["mean", "std", "count"])
        summary_out = Path(logdir, "summary.csv")
        summary.to_csv(summary_out)
        click.echo(f"wrote {summary_out} ({len(summary)} groups)")


if __name__ == "__main__":
    main()
