"""Dataset loader tests (reference data.py semantics)."""

import numpy as np
import pytest

from cggp_tpu.data import DATASET_NAMES, load_data, norm, synthetic


def test_synthetic_split_and_shapes():
    bundle = load_data("synthetic", seed=0, synthetic_n=300, synthetic_dim=3)
    (xt, yt), (xs, ys) = bundle.train, bundle.test
    assert xt.shape == (201, 3) and yt.shape == (201, 1)  # floor(0.67 * 300)
    assert xs.shape == (99, 3) and ys.shape == (99, 1)
    assert bundle.name == "synthetic"


def test_split_deterministic_per_seed():
    a = load_data("synthetic", seed=3, synthetic_n=200)
    b = load_data("synthetic", seed=3, synthetic_n=200)
    c = load_data("synthetic", seed=4, synthetic_n=200)
    np.testing.assert_array_equal(a.train[0], b.train[0])
    assert not np.array_equal(a.train[0], c.train[0])


def test_normalization_uses_train_stats():
    bundle = load_data("synthetic", seed=0, synthetic_n=500)
    xt, yt = bundle.train
    # Train columns are zero-mean/unit-std...
    np.testing.assert_allclose(xt.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(xt.std(axis=0), 1.0, atol=1e-3)
    # ...test columns are normalized by TRAIN stats, so not exactly standard.
    xs, _ = bundle.test
    assert not np.allclose(xs.mean(axis=0), 0.0, atol=1e-9)


def test_norm_matches_reference_epsilon():
    x = np.array([[1.0], [2.0], [3.0]])
    normed, mu, std = norm(x)
    np.testing.assert_allclose(mu, [[2.0]])
    np.testing.assert_allclose(std, [[np.std(x) + 1e-6]])
    np.testing.assert_allclose(normed, (x - mu) / std)


def test_unknown_dataset_raises():
    with pytest.raises(ValueError, match="Unknown dataset"):
        load_data("not-a-dataset")


def test_missing_local_data_raises_helpfully(tmp_path, monkeypatch):
    monkeypatch.setenv("CGGP_DATA_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="elevators"):
        load_data("elevators")


def test_uci_local_npz_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("CGGP_DATA_DIR", str(tmp_path))
    rng = np.random.default_rng(0)
    (tmp_path / "uci").mkdir(parents=True)
    np.savez(tmp_path / "uci" / "elevators.npz",
             X=rng.normal(size=(100, 4)), Y=rng.normal(size=(100, 1)))
    bundle = load_data("elevators", seed=1)
    assert bundle.train[0].shape == (67, 4)
    assert bundle.test[0].shape == (33, 4)


def test_reference_dataset_names_present():
    for name in ["snelson1d", "power", "naval", "elevators", "bike", "pol",
                 "houseelectric", "3droad", "buzz", "keggdirected",
                 "keggundirected", "song", "east_africa"]:
        assert name in DATASET_NAMES


def test_snelson_download_path(tmp_path, monkeypatch):
    """--allow-download semantics (reference data.py:26-60): cache miss +
    allow_download fetches SPGP_dist.zip, extracts, caches; offline-safe via
    a file:// URL so no network is touched."""
    import io
    import zipfile

    import cggp_tpu.data as data_mod

    x = np.linspace(0.0, 6.0, 200)
    y = np.sin(x)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("SPGP_dist/train_inputs", "\n".join(f"{v:.8f}" for v in x))
        zf.writestr("SPGP_dist/train_outputs", "\n".join(f"{v:.8f}" for v in y))
    zip_path = tmp_path / "SPGP_dist.zip"
    zip_path.write_bytes(buf.getvalue())
    monkeypatch.setattr(data_mod, "SNELSON_URL", zip_path.as_uri())

    cache = tmp_path / "cache"
    # Offline default: cache miss raises, mentioning the opt-in.
    with pytest.raises(FileNotFoundError, match="CGGP_ALLOW_DOWNLOAD"):
        data_mod.snelson1d(target_dir=str(cache))

    (xt, yt), (xv, yv) = data_mod.snelson1d(target_dir=str(cache), allow_download=True)
    assert xt.shape == (200, 1) and yt.shape == (200, 1)
    np.testing.assert_allclose(xt[:, 0], x, atol=1e-6)
    # Cached: a second load needs no download (URL removed to prove it).
    monkeypatch.setattr(data_mod, "SNELSON_URL", "http://unreachable.invalid/x.zip")
    (xt2, _), _ = data_mod.snelson1d(target_dir=str(cache))
    np.testing.assert_allclose(xt2, xt)

    # Env-var opt-in path resolves the default.
    monkeypatch.setenv("CGGP_ALLOW_DOWNLOAD", "1")
    monkeypatch.setattr(data_mod, "SNELSON_URL", zip_path.as_uri())
    cache2 = tmp_path / "cache2"
    (xt3, _), _ = data_mod.snelson1d(target_dir=str(cache2))
    np.testing.assert_allclose(xt3, xt)


# -- round 3: bayesian_benchmarks/Wilson native on-disk layouts ---------------


def _wilson_raw(n=50, d=3, seed=7):
    rng = np.random.RandomState(seed)
    x = rng.standard_normal((n, d))
    y = rng.standard_normal((n, 1))
    return x, y, np.concatenate([x, y], axis=-1)


def test_uci_wilson_mat_layout(tmp_path, monkeypatch):
    """The exact bayesian_benchmarks extraction layout the reference's loader
    reads (data.py:123-132): {DATA}/uci/{name}/{name}.mat with a 'data'
    array whose LAST column is the target."""
    from scipy.io import savemat

    from cggp_tpu.data import load_data, uci

    monkeypatch.setenv("CGGP_DATA_DIR", str(tmp_path))
    x, y, data = _wilson_raw()
    target = tmp_path / "uci" / "elevators"
    target.mkdir(parents=True)
    savemat(str(target / "elevators.mat"), {"data": data})

    (xtr, ytr), (xte, yte) = uci("elevators", seed=0)
    assert xtr.shape[0] == int(0.67 * 50) and xtr.shape[1] == 3
    # Same split as the npz path given the same raw arrays.
    np.testing.assert_array_equal(np.sort(np.r_[ytr, yte], axis=0),
                                  np.sort(y, axis=0))
    bundle = load_data("elevators", seed=0)
    assert np.isfinite(bundle.train[0]).all()


def test_uci_all_layouts_agree(tmp_path, monkeypatch):
    """npz (X/Y), flat .mat, dir .mat, data.csv and flat .csv must all load
    identical arrays and produce identical seeded splits."""
    from scipy.io import savemat

    import cggp_tpu.data as data_mod

    x, y, data = _wilson_raw()
    loads = {}
    for layout in ("npz", "mat_flat", "mat_dir", "csv_dir", "csv_flat"):
        root = tmp_path / layout
        base = root / "uci"
        base.mkdir(parents=True)
        if layout == "npz":
            np.savez(base / "pol.npz", X=x, Y=y)
        elif layout == "mat_flat":
            savemat(str(base / "pol.mat"), {"data": data})
        elif layout == "mat_dir":
            (base / "pol").mkdir()
            savemat(str(base / "pol" / "pol.mat"), {"data": data})
        elif layout == "csv_dir":
            (base / "pol").mkdir()
            np.savetxt(base / "pol" / "data.csv", data, delimiter=",")
        else:
            np.savetxt(base / "pol.csv", data, delimiter=",")
        monkeypatch.setenv("CGGP_DATA_DIR", str(root))
        assert data_mod.available_uci_datasets() == ("pol",)
        loads[layout] = data_mod.uci("pol", seed=3)

    ref = loads.pop("npz")
    for layout, got in loads.items():
        for a, b in zip(ref[0] + ref[1], got[0] + got[1]):
            np.testing.assert_allclose(a, b, atol=1e-12, err_msg=layout)


def test_uci_split_matches_bayesian_benchmarks_semantics(tmp_path, monkeypatch):
    """The reference relies on bbd's split (np.random.seed(split); shuffle;
    first int(N * prop) rows train) — byte-identical indices required."""
    import cggp_tpu.data as data_mod

    monkeypatch.setenv("CGGP_DATA_DIR", str(tmp_path))
    x, y, _ = _wilson_raw(n=101)
    (tmp_path / "uci").mkdir(parents=True)
    np.savez(tmp_path / "uci" / "bike.npz", X=x, Y=y)

    for seed in (0, 1, 5):
        (xtr, _), (xte, _) = data_mod.uci("bike", seed=seed)
        ind = np.arange(101)
        np.random.seed(seed)  # bbd uses the global stream; RandomState(seed)
        np.random.shuffle(ind)  # produces the identical permutation
        n_train = int(101 * 0.67)
        np.testing.assert_array_equal(xtr, x[ind[:n_train]])
        np.testing.assert_array_equal(xte, x[ind[n_train:]])
