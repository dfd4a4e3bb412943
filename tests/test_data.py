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
