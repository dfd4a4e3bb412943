#!/usr/bin/env python
"""Populate the local data directory used by ``cggp_tpu.data``.

The reference pulls UCI regression sets through the unmaintained
``bayesian_benchmarks`` git dependency and downloads snelson1d ad hoc
(reference data.py:26-60, :113-132); this tool fetches the same datasets
into ``$CGGP_DATA_DIR`` (default ``~/.datasets``) in the layout the loaders
expect:

    {data_dir}/uci/{name}.npz            arrays X [N, D], Y [N, 1]
    {data_dir}/snelson1d/snelson_train_inputs / _outputs
    {data_dir}/east_africa/east_africa_{train,test}.csv   (user-provided)

UCI sources are the standard GP-benchmark mirrors (same files
bayesian_benchmarks uses).  Requires network access; in hermetic
environments place the files manually or use the ``synthetic*`` datasets.

    python scripts/fetch_data.py snelson1d elevators pol
    python scripts/fetch_data.py --list
"""

from __future__ import annotations

import argparse
import io
import shutil
import sys
import zipfile
from pathlib import Path
from urllib.request import urlopen

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cggp_tpu.data import data_dir  # noqa: E402

SNELSON_URL = "http://www.gatsby.ucl.ac.uk/~snelson/SPGP_dist.zip"

# The uciml/Wilson dataset mirror used by bayesian_benchmarks.
UCI_BASE = "https://raw.githubusercontent.com/treforevans/uci_datasets/master/uci_datasets/{name}/data.csv.gz"
UCI_NAMES = {
    "power": "power", "naval": "naval", "elevators": "elevators",
    "bike": "bike", "pol": "pol", "houseelectric": "houseelectric",
    "3droad": "3droad", "buzz": "buzz", "keggdirected": "keggdirected",
    "keggundirected": "keggundirected", "song": "song",
}


def fetch_snelson(target: Path) -> None:
    target.mkdir(parents=True, exist_ok=True)
    print(f"downloading {SNELSON_URL} ...")
    with urlopen(SNELSON_URL) as response:
        blob = response.read()
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        zf.extractall(target)
    dist = target / "SPGP_dist"
    shutil.copy(dist / "train_inputs", target / "snelson_train_inputs")
    shutil.copy(dist / "train_outputs", target / "snelson_train_outputs")
    shutil.rmtree(dist)
    print(f"wrote {target}/snelson_train_{{inputs,outputs}}")


def fetch_uci(name: str, target: Path) -> None:
    import gzip

    import numpy as np

    url = UCI_BASE.format(name=UCI_NAMES[name])
    print(f"downloading {url} ...")
    with urlopen(url) as response:
        blob = gzip.decompress(response.read())
    data = np.loadtxt(io.BytesIO(blob), delimiter=",")
    x, y = data[:, :-1], data[:, -1:]
    target.mkdir(parents=True, exist_ok=True)
    out = target / f"{name}.npz"
    np.savez(out, X=x, Y=y)
    print(f"wrote {out}: X {x.shape}, Y {y.shape}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("datasets", nargs="*", help="names to fetch")
    parser.add_argument("--list", action="store_true")
    args = parser.parse_args()

    names = ["snelson1d", *sorted(UCI_NAMES)]
    if args.list or not args.datasets:
        print("available:", ", ".join(names))
        print("east_africa is distribution-restricted: place "
              "east_africa_{train,test}.csv under "
              f"{data_dir() / 'east_africa'} manually.")
        return

    for name in args.datasets:
        if name == "snelson1d":
            fetch_snelson(data_dir() / "snelson1d")
        elif name in UCI_NAMES:
            fetch_uci(name, data_dir() / "uci")
        else:
            raise SystemExit(f"unknown dataset {name!r}; available: {names}")


if __name__ == "__main__":
    main()
