"""Dump normalized train/test CSVs of a dataset
(reference paper_cli_geospatial_dataset_csv.py:14-41)."""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from cggp_tpu.cli.cli_utils import DatasetType, LogdirPath


@click.command("geospatial-csv")
@click.option("-d", "--dataset", "dataset_fn", type=DatasetType(), required=True)
@click.option("-l", "--logdir", type=LogdirPath(), default=LogdirPath.default_logdir)
@click.option("-s", "--seed", type=int, default=0)
def main(dataset_fn, logdir, seed):
    import pandas as pd

    data = dataset_fn(seed)
    for split_name, (x, y) in (("train", data.train), ("test", data.test)):
        frame = pd.DataFrame(
            np.concatenate([np.asarray(x), np.asarray(y)], axis=-1),
            columns=[f"x{i}" for i in range(x.shape[-1])] + ["y"],
        )
        out = Path(logdir, f"{data.name}_{split_name}.csv")
        frame.to_csv(out, index=False)
        click.echo(f"wrote {out} ({len(frame)} rows)")


if __name__ == "__main__":
    main()
