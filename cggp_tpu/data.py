"""Dataset loading, splits, and normalization (reference data.py:1-147).

Same dataset names, split proportion (0.67), and per-column normalization
semantics as the reference.  Differences forced by the environment:

* the reference pulls UCI sets through the unmaintained
  ``bayesian_benchmarks`` git dependency and downloads snelson1d from
  gatsby.ucl.ac.uk (data.py:26-60, :113-132).  This build reads the same
  datasets from a local data directory (``$CGGP_DATA_DIR``, default
  ``~/.datasets``) — ``{name}.npz`` with ``X``/``Y`` arrays for UCI, the
  snelson ``snelson_train_inputs``/``_outputs`` text files, and the
  ``east_africa_{train,test}.csv`` pair — and raises a clear error telling
  the user where to put files instead of attempting network IO.
* ``synthetic`` datasets are net-new: deterministic GP-flavoured regression
  problems of any size, so every pipeline is runnable hermetically (and the
  N≈1M scaling benchmarks of BASELINE.md config 5 have a data source).
"""

from __future__ import annotations

import os
from collections import namedtuple
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

Dataset = Tuple[np.ndarray, np.ndarray]
DatasetBundle = namedtuple("DatasetBundle", "name, train, test")

SPLIT_PROPORTION = 0.67

# The reference's allowed names (cli_utils.py:72-86) plus the synthetic family.
DATASET_NAMES = [
    "snelson1d",
    "power",
    "naval",
    "elevators",
    "bike",
    "pol",
    "houseelectric",
    "3droad",
    "buzz",
    "keggdirected",
    "keggundirected",
    "song",
    "east_africa",
    "synthetic1d",
    "synthetic",
]


def data_dir() -> Path:
    return Path(os.environ.get("CGGP_DATA_DIR", "~/.datasets")).expanduser()


def norm(x: np.ndarray):
    """Zero-mean/unit-std per column, +1e-6 on std (reference data.py:101-105)."""
    mu = np.mean(x, axis=0, keepdims=True)
    std = np.std(x, axis=0, keepdims=True) + 1e-6
    return (x - mu) / std, mu, std


def norm_dataset(data: Dataset):
    return norm(data[0]), norm(data[1])


def _split(x: np.ndarray, y: np.ndarray, prop: float, seed: int) -> Tuple[Dataset, Dataset]:
    """Shuffled prop-split with a seeded RandomState (the bayesian_benchmarks
    convention the reference relies on, data.py:123-132)."""
    n = x.shape[0]
    ind = np.arange(n)
    rng = np.random.RandomState(seed)
    rng.shuffle(ind)
    n_train = int(np.floor(prop * n))
    tr, te = ind[:n_train], ind[n_train:]
    return (x[tr], y[tr]), (x[te], y[te])


SNELSON_URL = "http://www.gatsby.ucl.ac.uk/~snelson/SPGP_dist.zip"


def snelson1d(
    target_dir: Optional[str] = None, allow_download: Optional[bool] = None
) -> Tuple[Dataset, Dataset]:
    """Snelson's 200-point 1-D set (reference data.py:26-60).

    Served from the local cache; on a miss, downloads and caches SPGP_dist.zip
    (the reference's auto-acquisition semantics) when ``allow_download`` is
    true — explicitly, or via ``CGGP_ALLOW_DOWNLOAD=1`` for network-enabled
    environments.  Hermetic environments keep the offline-safe error.

    Train and test are the same arrays, as in the reference.
    """
    target = Path(target_dir) if target_dir else data_dir() / "snelson1d"
    inputs_path = target / "snelson_train_inputs"
    outputs_path = target / "snelson_train_outputs"
    if allow_download is None:
        allow_download = os.environ.get("CGGP_ALLOW_DOWNLOAD", "") == "1"
    if not (inputs_path.exists() and outputs_path.exists()):
        if allow_download:
            _download_snelson(target, inputs_path, outputs_path)
        else:
            raise FileNotFoundError(
                f"snelson1d data not found under {target}. Download "
                "SPGP_dist.zip (gatsby.ucl.ac.uk/~snelson) and place "
                "train_inputs/train_outputs there as snelson_train_inputs / "
                "snelson_train_outputs, or set CGGP_ALLOW_DOWNLOAD=1 / pass "
                "allow_download=True in a network-enabled environment."
            )
    x = np.loadtxt(inputs_path)[:, None]
    y = np.loadtxt(outputs_path)[:, None]
    return (x, y), (x, y)


def _download_snelson(target: Path, inputs_path: Path, outputs_path: Path) -> None:
    """Fetch + unzip + cache (reference data.py:26-60 download path)."""
    import io
    import zipfile
    from urllib.request import urlopen

    target.mkdir(parents=True, exist_ok=True)
    with urlopen(SNELSON_URL, timeout=60) as response:
        blob = response.read()
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = {Path(n).name: n for n in zf.namelist()}
        inputs_path.write_bytes(zf.read(names["train_inputs"]))
        outputs_path.write_bytes(zf.read(names["train_outputs"]))


def east_africa(
    dirpath: Optional[str] = None, train_proportion: float = 0.7, seed: int = 0
) -> Tuple[Dataset, Dataset]:
    """Geospatial CSVs reshuffled 70/30 by seed (reference data.py:63-98)."""
    import pandas as pd

    dirpath = Path(dirpath) if dirpath else data_dir() / "east_africa"
    frames = []
    for split_name in ("train", "test"):
        path = Path(dirpath, f"east_africa_{split_name}.csv")
        if not path.exists():
            raise FileNotFoundError(
                f"east_africa data not found: {path}. Place "
                "east_africa_train.csv / east_africa_test.csv there."
            )
        frames.append(np.array(pd.read_csv(path)))
    stacked = np.concatenate(frames, axis=0)
    x, y = stacked[:, :-1], stacked[:, -1:]
    return _split(x, y, train_proportion, seed)


def _uci_source(name: str) -> Optional[Path]:
    """First existing on-disk source for a UCI set, trying our .npz format
    and the bayesian_benchmarks/Wilson native layouts.

    bayesian_benchmarks (the reference's loader, data.py:123-132) extracts
    Wilson's archives to ``{DATA_PATH}/uci/{name}/{name}.mat`` — a MATLAB
    file whose ``data`` array holds features with the target as the LAST
    column.  Mirrors sometimes ship flat ``{name}.mat`` or headerless
    ``data.csv``; all are accepted so driver-staged data needs no conversion.
    """
    base = data_dir() / "uci"
    for candidate in (
        base / f"{name}.npz",
        base / name / f"{name}.npz",
        base / name / f"{name}.mat",
        base / f"{name}.mat",
        base / f"wilson_{name}" / f"{name}.mat",
        base / f"Wilson_{name}" / f"{name}.mat",
        base / name / "data.csv",
        base / f"{name}.csv",
        base / name / "data.txt",
    ):
        if candidate.exists():
            return candidate
    return None


def _read_uci_arrays(path: Path) -> Tuple[np.ndarray, np.ndarray]:
    """Read (X, Y) from any accepted on-disk format (see :func:`_uci_source`)."""
    if path.suffix == ".npz":
        with np.load(path) as blob:
            if "X" in blob and "Y" in blob:
                x = np.asarray(blob["X"], np.float64)
                y = np.asarray(blob["Y"], np.float64)
                return x, y if y.ndim > 1 else y[:, None]
            data = np.asarray(blob["data"], np.float64)  # Wilson-style blob
    elif path.suffix == ".mat":
        from scipy.io import loadmat

        blob = loadmat(str(path))
        if "data" in blob:
            data = np.asarray(blob["data"], np.float64)
        else:  # tolerate a single differently-named array
            arrays = [v for k, v in blob.items()
                      if not k.startswith("__") and hasattr(v, "ndim")]
            if len(arrays) != 1:
                raise ValueError(
                    f"{path}: expected a 'data' array (Wilson .mat format); "
                    f"found keys {sorted(k for k in blob if not k.startswith('__'))}"
                )
            data = np.asarray(arrays[0], np.float64)
    elif path.suffix in (".csv", ".txt"):
        delimiter = "," if path.suffix == ".csv" else None
        data = np.asarray(np.loadtxt(path, delimiter=delimiter), np.float64)
    else:
        raise ValueError(f"unrecognised UCI data file: {path}")
    # Wilson convention: target is the last column.
    return data[:, :-1], data[:, -1:]


def available_uci_datasets() -> Tuple[str, ...]:
    """UCI sets with data present on disk (any accepted layout) — lets
    harnesses auto-pick up driver-staged real data with zero new code."""
    skip = {"snelson1d", "east_africa", "synthetic1d", "synthetic"}
    return tuple(
        n for n in DATASET_NAMES if n not in skip and _uci_source(n) is not None
    )


def uci(name: str, seed: int = 0, prop: float = SPLIT_PROPORTION) -> Tuple[Dataset, Dataset]:
    """UCI regression set from ``{data_dir}/uci/`` in our .npz format (keys
    X, Y) or the bayesian_benchmarks/Wilson native layouts
    (``{name}/{name}.mat`` with a last-column-target ``data`` array,
    headerless csv/txt) — see :func:`_uci_source`.

    Split matches the reference's ``bayesian_benchmarks`` semantics
    (data.py:123-132): indices shuffled by a RandomState seeded with the
    split index (identical stream to bbd's ``np.random.seed``), first
    ``int(prop * N)`` rows train.  Note: the reference's ``naval``/``power``
    go through bbd-specific preprocessing (column drops, target selection) —
    stage those pre-processed, last-column-target.
    """
    path = _uci_source(name)
    if path is None:
        raise FileNotFoundError(
            f"UCI dataset {name!r} not found under {data_dir() / 'uci'}. "
            f"Accepted layouts: {name}.npz (arrays 'X' [N, D], 'Y' [N, 1]), "
            f"the bayesian_benchmarks extraction {name}/{name}.mat ('data' "
            "array, target = last column), or headerless data.csv/.txt."
        )
    x, y = _read_uci_arrays(path)
    return _split(x, y, prop, seed)


def synthetic(
    n: int = 2000, dim: int = 2, seed: int = 0, noise: float = 0.1,
    prop: float = SPLIT_PROPORTION,
) -> Tuple[Dataset, Dataset]:
    """Deterministic GP-flavoured regression problem (net-new, hermetic).

    A fixed random-Fourier function of the inputs — smooth, stationary-ish,
    and cheap to generate at any N (used by the scaling benchmarks,
    BASELINE.md config 5).

    Note: the spectral scale (1.5 per dimension) makes the target
    increasingly high-frequency with ``dim`` — at dim >= ~6 it is
    near-unlearnable at moderate N (verified: exact GPR reaches only ~0.93
    RMSE at dim=8, N=3k). Use dim <= 4 for quality benchmarks; high dims
    still exercise throughput paths.
    """
    rng = np.random.RandomState(seed)
    x = rng.uniform(-2.0, 2.0, size=(n, dim))
    w_rng = np.random.RandomState(12345)  # function is fixed across seeds
    num_features = 32
    theta = w_rng.normal(size=(dim, num_features)) * 1.5
    weights = w_rng.normal(size=(2 * num_features,)) / np.sqrt(num_features)
    phi = np.concatenate([np.cos(x @ theta), np.sin(x @ theta)], axis=-1)
    y = (phi @ weights)[:, None] + noise * rng.standard_normal((n, 1))
    return _split(x, y, prop, seed)


def load_data(
    name: str,
    normalise: bool = True,
    seed: int = 0,
    dtype=np.float64,
    synthetic_n: int = 2000,
    synthetic_dim: int = 2,
) -> DatasetBundle:
    """Name-dispatched loader (reference data.py:113-147): test columns are
    normalized by the *train* statistics."""
    if name == "snelson1d":
        train, test = snelson1d()
    elif name == "east_africa":
        train, test = east_africa(train_proportion=0.7, seed=seed)
    elif name == "synthetic1d":
        train, test = synthetic(n=synthetic_n, dim=1, seed=seed)
    elif name == "synthetic":
        train, test = synthetic(n=synthetic_n, dim=synthetic_dim, seed=seed)
    elif name in DATASET_NAMES:
        train, test = uci(name, seed=seed)
    else:
        raise ValueError(f"Unknown dataset {name!r}; choose from {DATASET_NAMES}")

    if normalise:
        (x_train, x_mu, x_std), (y_train, y_mu, y_std) = norm_dataset(train)
        x_test = (test[0] - x_mu) / x_std
        y_test = (test[1] - y_mu) / y_std
    else:
        (x_train, y_train), (x_test, y_test) = train, test

    cast = lambda a: np.asarray(a, dtype=dtype)
    return DatasetBundle(
        name, (cast(x_train), cast(y_train)), (cast(x_test), cast(y_test))
    )


def cast_bundle(bundle: DatasetBundle, dtype) -> DatasetBundle:
    """Cast all bundle arrays (used by drivers to honour --precision)."""
    cast = lambda split: tuple(np.asarray(a, dtype=dtype) for a in split)
    return DatasetBundle(bundle.name, cast(bundle.train), cast(bundle.test))
