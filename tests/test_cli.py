"""CLI smoke tests via click's CliRunner (the pattern the reference sketches
at cli.py:172-189; SURVEY.md section 4 calls for making it real)."""

import json
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from cggp_tpu.cli.__main__ import cli
from cggp_tpu.cli.sweep import expand_experiments


@pytest.fixture
def runner():
    return CliRunner()


def _run(runner, args):
    result = runner.invoke(cli, args, catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return result


def test_gpr_then_uci_compute_metrics(runner, tmp_path):
    """The load-bearing workflow: gpr trains + saves config dir; uci loads it
    (reference paper_cli_gpr.py -> paper_cli_uci.py --config-dir)."""
    gpr_dir = tmp_path / "gpr"
    _run(runner, [
        "gpr", "-d", "synthetic1d", "-n", "5", "-l", str(gpr_dir),
        "-k", "matern32", "-s", "0", "--no-tensorboard",
    ])
    assert (gpr_dir / "params.npz").exists()
    assert (gpr_dir / "info.json").exists()
    results = json.loads((gpr_dir / "results.json").read_text())
    assert np.isfinite(results["test/rmse"])

    uci_dir = tmp_path / "uci"
    result = _run(runner, [
        "uci", "-mc", "cdgp", "-p", "fp64", "-j", "1e-6",
        "-c", str(gpr_dir),
        "kmeans", "-m", "16",
        "compute-metrics", "-l", str(uci_dir),
    ])
    out = json.loads((uci_dir / "results.json").read_text())
    assert out["model"] == "cdgp"
    assert out["dataset"] == "synthetic1d"
    assert out["num_inducing_points"] == 16
    assert np.isfinite(out["test/rmse"])
    assert out["condition_number"] > 1.0
    # Estimator provenance: dense eigvalsh at M=16; lanczos rows are tagged
    # so aggregated CSVs never silently mix the two.
    assert out["estimator"] == "eigvalsh"
    assert out["eig_min_is_upper_bound"] is False
    assert "Script finished" in result.output


def test_uci_covertree_sgpr(runner, tmp_path):
    gpr_dir = tmp_path / "gpr"
    _run(runner, [
        "gpr", "-d", "synthetic1d", "-n", "2", "-l", str(gpr_dir), "-s", "1",
    ])
    uci_dir = tmp_path / "uci"
    _run(runner, [
        "uci", "-mc", "sgpr", "-p", "fp64", "-j", "1e-6", "-c", str(gpr_dir),
        "covertree", "-s", "0.5",
        "compute-metrics", "-l", str(uci_dir),
    ])
    out = json.loads((uci_dir / "results.json").read_text())
    assert out["clustering_type"] == "covertree"
    assert out["num_inducing_points"] > 1


def test_train_cggp_adam(runner, tmp_path):
    logdir = tmp_path / "train"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(logdir), "-s", "0",
        "train-cggp-adam", "-n", "3", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean", "--no-tensorboard",
    ])
    assert (logdir / "params.npz").exists()
    assert "Script finished" in result.output


def test_geospatial_train_adam(runner, tmp_path):
    logdir = tmp_path / "geo"
    _run(runner, [
        "geospatial", "-d", "synthetic", "-mc", "cdgp", "-l", str(logdir),
        "-s", "0", "kmeans", "-m", "8",
        "train-adam", "-n", "3", "-b", "64", "-r", "2", "--no-tensorboard",
    ])
    assert (logdir / "params.npz").exists()
    assert (logdir / "test_mean.npy").exists()
    mean = np.load(logdir / "test_mean.npy")
    assert mean.ndim == 2 and np.all(np.isfinite(mean))


def test_predict_from_config_dir(runner, tmp_path):
    logdir = tmp_path / "geo"
    _run(runner, [
        "geospatial", "-d", "synthetic1d", "-mc", "cdgp", "-l", str(logdir),
        "-s", "0", "kmeans", "-m", "8",
        "train-adam", "-n", "2", "-b", "64", "--no-tensorboard",
    ])
    out = tmp_path / "pred"
    out.mkdir()
    _run(runner, ["predict", "-c", str(logdir), "-l", str(out), "-mc", "cdgp"])
    assert (out / "test_mean.npy").exists()

    # --posterior-dir: first call builds + saves the serving cache, second
    # call loads it (build skipped) and must dump identical arrays.
    pdir = tmp_path / "cache"
    out2 = tmp_path / "pred2"
    out2.mkdir()
    r1 = _run(runner, ["predict", "-c", str(logdir), "-l", str(out2),
                       "-mc", "cdgp", "--posterior-dir", str(pdir)])
    assert "built and saved" in r1.output
    assert (pdir / "posterior.json").exists()
    out3 = tmp_path / "pred3"
    out3.mkdir()
    r2 = _run(runner, ["predict", "-c", str(logdir), "-l", str(out3),
                       "-mc", "cdgp", "--posterior-dir", str(pdir)])
    assert "build skipped" in r2.output
    np.testing.assert_array_equal(np.load(out2 / "test_mean.npy"),
                                  np.load(out3 / "test_mean.npy"))
    np.testing.assert_array_equal(np.load(out / "test_mean.npy"),
                                  np.load(out2 / "test_mean.npy"))

    # Stale-cache guard: the cache carries a fingerprint of (model class,
    # params); pointing --posterior-dir at a cache built for DIFFERENT
    # trained params must refuse instead of silently serving stale numbers.
    assert (pdir / "cache_meta.json").exists()
    logdir_b = tmp_path / "geo_b"
    _run(runner, [
        "geospatial", "-d", "synthetic1d", "-mc", "cdgp", "-l", str(logdir_b),
        "-s", "1", "kmeans", "-m", "8",
        "train-adam", "-n", "2", "-b", "64", "--no-tensorboard",
    ])
    out4 = tmp_path / "pred4"
    out4.mkdir()
    r3 = runner.invoke(
        cli,
        ["predict", "-c", str(logdir_b), "-l", str(out4), "-mc", "cdgp",
         "--posterior-dir", str(pdir)],
    )
    assert r3.exit_code != 0
    assert "fingerprint" in r3.output


def test_uci_csv_aggregation(runner, tmp_path):
    # Two seeds of the same config, one per estimator: the aggregation must
    # warn that condition_number means would mix eigvalsh with the
    # optimistic lanczos estimator (ADVICE round 1).
    for i, (rmse, est) in enumerate([(0.1, "eigvalsh"), (0.2, "lanczos")]):
        d = tmp_path / f"run{i}"
        d.mkdir()
        (d / "results.json").write_text(json.dumps({
            "model": "cdgp", "dataset": "synthetic1d", "precision": "fp64",
            "clustering_type": "kmeans", "jitter": 1e-6,
            "test/rmse": rmse, "test/nlpd": 0.5, "train/elbo": -100.0,
            "condition_number": 10.0, "condition_method": est,
            "num_inducing_points": 16, "seed": i,
        }))
    out = tmp_path / "csv"
    result = _run(runner, ["uci-csv", str(tmp_path), "-l", str(out)])
    assert "mixes estimators" in result.output
    import pandas as pd

    frame = pd.read_csv(out / "results.csv")
    assert len(frame) == 2
    summary = pd.read_csv(out / "summary.csv")
    assert len(summary) >= 1

    # Splitting by estimator silences the warning.
    out2 = tmp_path / "csv2"
    result = _run(runner, ["uci-csv", str(tmp_path), "-l", str(out2),
                           "-g", "model", "-g", "condition_method"])
    assert "mixes estimators" not in result.output


def test_sweep_grid_expansion(tmp_path):
    config = {
        "cmd": "python driver.py -d {dataset} -s {seed}",
        "exp": [{
            "cmd": '{cmd} -m {max_ip} --logdir "{uid}"',
            "uid": "./{rootdir}/{dataset}/m{max_ip}/{seed}",
            "rootdir": "logs",
            "dataset": ["naval", "power"],
            "max_ip": [100, 500],
            "seed": [111],
        }],
    }
    jobs = list(expand_experiments(config))
    assert len(jobs) == 4  # 2 datasets x 2 max_ip x 1 seed
    cmds = {j["cmd"] for j in jobs}
    assert 'python driver.py -d naval -s 111 -m 100 --logdir "./logs/naval/m100/111"' in cmds


def test_sweep_dry_run(runner, tmp_path):
    config_path = tmp_path / "sweep.toml"
    config_path.write_text(
        'cmd = "echo {dataset} {seed}"\n'
        "[[exp]]\n"
        'cmd = "{cmd}"\n'
        'uid = "./logs/{dataset}/{seed}"\n'
        'dataset = ["a", "b"]\n'
        "seed = [1, 2]\n"
        "[flags]\n"
        "num_proc = 2\n"
    )
    result = _run(runner, ["sweep", str(config_path), "--dry-run"])
    assert "4 jobs" in result.output


def test_sweep_dry_run_checked_in_configs(runner):
    """Every checked-in grid (all 5 reference mirrors + net-new smokes)
    expands through the sweep runner."""
    import tomllib

    for name in ("gpr", "uci-cdgp", "uci-sgpr", "geospatial", "geospatial-csv",
                  "smoke", "smoke-uci"):
        path = Path("configs") / f"{name}.toml"
        assert path.exists(), path
        config = tomllib.load(open(path, "rb"))
        jobs = list(expand_experiments(config))
        assert jobs, f"{name}.toml expanded to zero jobs"
        result = _run(runner, ["sweep", str(path), "--dry-run"])
        assert "jobs" in result.output

    # geospatial-csv mirrors the reference grid exactly: 10 seeds x 1 dataset.
    config = tomllib.load(open(Path("configs/geospatial-csv.toml"), "rb"))
    assert len(list(expand_experiments(config))) == 10


def test_kernel_type_inline_params(runner, tmp_path):
    """The reference's KernelType parser is broken (missing ast import,
    SURVEY.md known-bugs 3); ours must parse inline len/var."""
    from cggp_tpu.cli.cli_utils import KernelType

    fn = KernelType().convert("se_len=0.5_var=2.0", None, None)
    kernel, init = fn(3)
    assert kernel.name == "se"
    np.testing.assert_allclose(init["lengthscales"], 0.5 * np.ones(3))
    assert init["variance"] == 2.0


def test_condition_wasserstein(runner, tmp_path):
    out = tmp_path / "cw"
    result = _run(runner, [
        "condition-wasserstein", "-l", str(out), "-n", "80",
        "-d", "1", "-r", "1.0", "-r", "0.3", "--plot",
    ])
    import pandas as pd

    frame = pd.read_csv(out / "condition_wasserstein_dim1.csv")
    assert len(frame) == 2
    assert (frame["condition_number"] >= 1.0).all()
    assert (frame["wasserstein2"] >= -1e-6).all()
    # Finer resolution -> more inducing points -> smaller W2 distance.
    fine, coarse = frame.iloc[1], frame.iloc[0]
    assert fine["num_inducing_points"] >= coarse["num_inducing_points"]
    assert (out / "condition_wasserstein.png").exists()


def test_geospatial_csv(runner, tmp_path):
    out = tmp_path / "csv"
    _run(runner, ["geospatial-csv", "-d", "synthetic1d", "-l", str(out)])
    import pandas as pd

    frame = pd.read_csv(out / "synthetic1d_train.csv")
    assert list(frame.columns) == ["x0", "y"]


def test_uci_plot(runner, tmp_path):
    for i, m in enumerate([16, 32]):
        d = tmp_path / f"run{i}"
        d.mkdir()
        import json as _json

        (d / "results.json").write_text(_json.dumps({
            "model": "cdgp", "precision": "fp64", "clustering_type": "kmeans",
            "test/rmse": 0.1 * (i + 1), "num_inducing_points": m,
        }))
    out = tmp_path / "plots"
    _run(runner, ["uci-plot", str(tmp_path), "-l", str(out)])
    assert (out / "uci_test_rmse.png").exists()


def test_uci_rff_preconditioner_slq_compensated(runner, tmp_path):
    """BASELINE config 4 path: RFF preconditioner + SLQ logdet + Kahan dots."""
    gpr_dir = tmp_path / "gpr"
    _run(runner, ["gpr", "-d", "synthetic1d", "-n", "2", "-l", str(gpr_dir)])
    uci_dir = tmp_path / "uci"
    _run(runner, [
        "uci", "-mc", "cdgp", "-p", "fp64", "-j", "1e-6", "-c", str(gpr_dir),
        "-P", "rff", "--num-rff-bases", "64",
        "--logdet-variant", "slq", "--dot", "compensated",
        "kmeans", "-m", "16",
        "compute-metrics", "-l", str(uci_dir),
    ])
    out = json.loads((uci_dir / "results.json").read_text())
    assert out["preconditioner"] == "rff"
    assert out["logdet_variant"] == "slq"
    assert out["dot"] == "compensated"
    assert np.isfinite(out["test/rmse"]) and np.isfinite(out["train/elbo"])


def test_uci_pivchol_preconditioner(runner, tmp_path):
    """Pivoted-Cholesky CG preconditioning reachable from the CLI."""
    gpr_dir = tmp_path / "gpr"
    _run(runner, ["gpr", "-d", "synthetic1d", "-n", "2", "-l", str(gpr_dir)])
    uci_dir = tmp_path / "uci"
    _run(runner, [
        "uci", "-mc", "cdgp", "-p", "fp64", "-j", "1e-6", "-c", str(gpr_dir),
        "-P", "pivchol", "--precond-rank", "8",
        "kmeans", "-m", "16",
        "compute-metrics", "-l", str(uci_dir),
    ])
    out = json.loads((uci_dir / "results.json").read_text())
    assert out["preconditioner"] == "pivchol"
    assert np.isfinite(out["test/rmse"]) and np.isfinite(out["train/elbo"])


def test_train_cggp_adam_sharded(runner, tmp_path):
    """Multi-chip training through the CLI on the 8-way virtual mesh."""
    logdir = tmp_path / "sharded"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(logdir), "-s", "0",
        "train-cggp-adam", "-n", "3", "-b", "64", "-m", "10",
        "-c", "kmeans", "-d", "euclidean", "--num-devices", "8",
        "--no-tensorboard",
    ])
    assert "sharded over 8 devices" in result.output
    assert "M=10 padded to 16" in result.output
    assert (logdir / "params.npz").exists()


def test_train_cggp_adam_preconditioned(runner, tmp_path):
    """Per-step pivoted-Cholesky preconditioning reachable from the train
    CLI, single-chip and sharded."""
    logdir = tmp_path / "pre"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(logdir), "-s", "0",
        "train-cggp-adam", "-n", "3", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean", "-P", "pivchol",
        "--precond-rank", "6", "--no-tensorboard",
    ])
    assert (logdir / "params.npz").exists()
    assert "Script finished" in result.output

    logdir2 = tmp_path / "pre_sharded"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(logdir2), "-s", "0",
        "train-cggp-adam", "-n", "3", "-b", "64", "-m", "10",
        "-c", "kmeans", "-d", "euclidean", "--num-devices", "8",
        "-P", "pivchol", "--precond-rank", "6", "--no-tensorboard",
    ])
    assert "sharded over 8 devices" in result.output
    assert (logdir2 / "params.npz").exists()


def test_train_checkpoint_and_resume(runner, tmp_path):
    """Periodic orbax checkpoints + --resume-from (both the ckpt dir and the
    params.npz config-dir fallback).  The training CG is CONVERGED (round-4
    verdict: the old 8-iteration cap resumed an unconverged state, so the
    test never verified a trained state round-trips) and the resumed run's
    first recorded ELBO must continue where run1's left off."""
    run1 = tmp_path / "run1"
    cg_args = ["--max-cg-iterations", "64", "-e", "1e-8"]
    _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(run1), "-s", "0",
        "train-cggp-adam", "-n", "4", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean", "--checkpoint-every", "2",
        "--no-tensorboard", "-r", "1", *cg_args,
    ])
    assert (run1 / "ckpt").is_dir()
    assert any(p.name.isdigit() for p in (run1 / "ckpt").iterdir())

    # Every logged training solve converged (cg/unconverged == 0): the
    # checkpointed state is a CONVERGED solver state, not a cap-clipped one.
    cg_logs = np.load(run1 / "cg.logs.npy", allow_pickle=True)
    assert len(cg_logs) > 0
    assert all(int(e["cg/unconverged"]) == 0 for e in cg_logs), cg_logs
    run1_metrics = np.load(run1 / "metrics.logs.npy", allow_pickle=True)
    run1_final_elbo = float(run1_metrics[-1]["train/elbo"])

    # Same seed: -s also seeds the synthetic DATASET and split, and loss
    # continuity is only defined against the same data.
    run2 = tmp_path / "run2"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(run2), "-s", "0",
        "train-cggp-adam", "-n", "2", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean",
        "--resume-from", str(run1), "--no-tensorboard", "-r", "1", *cg_args,
    ])
    assert "resumed from orbax checkpoint" in result.output

    # Loss continuity: the resumed run's first recorded ELBO sits at run1's
    # final level (same params driving the metrics), not back at the fresh
    # init's.  Tolerance covers the one Adam step + eval-batch difference.
    run2_metrics = np.load(run2 / "metrics.logs.npy", allow_pickle=True)
    run2_first_elbo = float(run2_metrics[0]["train/elbo"])
    assert abs(run2_first_elbo - run1_final_elbo) <= 0.05 * abs(run1_final_elbo), (
        run1_final_elbo, run2_first_elbo)

    # config-dir fallback: point at a logdir with params.npz but no ckpt/
    import shutil

    run1_nockpt = tmp_path / "run1_nockpt"
    shutil.copytree(run1, run1_nockpt)
    shutil.rmtree(run1_nockpt / "ckpt")
    run3 = tmp_path / "run3"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(run3), "-s", "2",
        "train-cggp-adam", "-n", "2", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean",
        "--resume-from", str(run1_nockpt), "--no-tensorboard",
    ])
    assert "resumed from config dir" in result.output


def test_sweep_platform_pinning(runner, tmp_path):
    """[flags] platforms / --platform export JAX_PLATFORMS to sweep children
    (the TPU-native analogue of the reference's gpu_indices pinning); a
    cpu-pinned child must also have the TPU-tunnel var dropped (the axon
    sitecustomize otherwise overrides JAX_PLATFORMS=cpu)."""
    marker = tmp_path / "childenv.txt"
    child = (
        "import os, pathlib; "
        "pathlib.Path(r'%s').write_text("
        "os.environ.get('JAX_PLATFORMS', '') + '|' + "
        "os.environ.get('PALLAS_AXON_POOL_IPS', '<unset>'))" % marker
    )
    config_path = tmp_path / "sweep.toml"
    config_path.write_text(
        f'cmd = "python -c \\"{child}\\""\n'
        "[[exp]]\n"
        'cmd = "{cmd}"\n'
        'uid = ""\n'
        "dummy = [1]\n"
        "[flags]\n"
        'platforms = "cpu"\n'
    )
    from cggp_tpu.cli.sweep import run_sweep
    import tomllib

    config = tomllib.load(open(config_path, "rb"))
    import os

    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "placeholder-for-test")
    try:
        codes = run_sweep(config, dry_run=False, echo=lambda *a: None)
    finally:
        if os.environ.get("PALLAS_AXON_POOL_IPS") == "placeholder-for-test":
            del os.environ["PALLAS_AXON_POOL_IPS"]
    assert codes == [0]
    platform, pool = marker.read_text().split("|")
    assert platform == "cpu"
    assert pool == "<unset>"


def test_dataset_type_synthetic_inline_params():
    """synthetic:n=NNN:dim=D inline sizing (net-new; reference-scale CLI runs
    without dataset files)."""
    from cggp_tpu.cli.cli_utils import DatasetType

    fn = DatasetType().convert("synthetic:n=500:dim=3", None, None)
    bundle = fn(0)
    assert bundle.train[0].shape[1] == 3
    assert bundle.train[0].shape[0] + bundle.test[0].shape[0] == 500

    fn = DatasetType().convert("synthetic1d", None, None)  # plain names still work
    assert fn(0).train[0].shape[1] == 1


def test_train_cggp_adam_trainable_u(runner, tmp_path):
    """--trainable-u (free-variational pseudo-observations) trains end-to-end."""
    logdir = tmp_path / "tu"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(logdir), "-s", "0",
        "train-cggp-adam", "-n", "3", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean", "--trainable-u",
        "--no-tensorboard",
    ])
    assert (logdir / "params.npz").exists()
    assert "Script finished" in result.output


def test_train_resume_preserves_trainable_u(runner, tmp_path):
    """--resume-from + --trainable-u must NOT re-cluster after restore: the
    trained variational mean (pseudo_u) and inducing state survive verbatim
    (advisor finding: the upfront update_fn ran after checkpoint restore and
    silently reset pseudo_u/Z/cluster_counts)."""
    run1 = tmp_path / "tu1"
    _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(run1), "-s", "0",
        "train-cggp-adam", "-n", "3", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean", "--trainable-u",
        "--no-tensorboard",
    ])
    trained = dict(np.load(run1 / "params.npz"))

    # Resume with ZERO further iterations: the saved params of run2 must be
    # exactly the restored state — any re-cluster would change pseudo_u.
    run2 = tmp_path / "tu2"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(run2), "-s", "7",
        "train-cggp-adam", "-n", "0", "-b", "64", "-m", "8",
        "-c", "kmeans", "-d", "euclidean", "--trainable-u",
        "--resume-from", str(run1), "--no-tensorboard",
    ])
    assert "resumed from config dir" in result.output
    resumed = dict(np.load(run2 / "params.npz"))
    for name in ("pseudo_u", "inducing_points", "cluster_counts"):
        np.testing.assert_array_equal(
            resumed[name], trained[name], err_msg=f"{name} clobbered on resume"
        )


def test_dataset_type_round_trips_inline_sizing():
    """Saved configs must record the FULL synthetic spec so --config-dir
    reloads rebuild the same-sized dataset (code-review finding)."""
    from cggp_tpu.cli.cli_utils import DatasetType

    bundle = DatasetType().convert("synthetic:n=600:dim=3", None, None)(0)
    assert bundle.name == "synthetic:n=600:dim=3"
    again = DatasetType().convert(bundle.name, None, None)(0)
    np.testing.assert_array_equal(again.train[0], bundle.train[0])

    # synthetic1d is fixed to dim=1: explicit dim must be rejected
    import click

    with pytest.raises(click.exceptions.UsageError):
        DatasetType().convert("synthetic1d:dim=3", None, None)


def test_wasserstein2_analytic_oracle():
    """W2^2 against the closed form for commuting (diagonal) covariances:
    |mu1-mu2|^2 + sum_i (sqrt(l1_i) - sqrt(l2_i))^2 — and the reference's
    V*sqrt(D) 'matrix_sqrt' (paper_condition_wasserstein.py:42-48) would NOT
    pass the rotated case below (documented divergence, docs/PARITY.md §5)."""
    import jax.numpy as jnp

    from cggp_tpu.cli.condition_wasserstein import wasserstein2

    rng = np.random.default_rng(0)
    mu1 = jnp.asarray(rng.standard_normal((4, 1)))
    mu2 = jnp.asarray(rng.standard_normal((4, 1)))
    l1 = jnp.asarray([0.5, 1.0, 2.0, 4.0])
    l2 = jnp.asarray([1.5, 0.25, 3.0, 1.0])

    # Diagonal case.
    w2 = float(wasserstein2((mu1, jnp.diag(l1)), (mu2, jnp.diag(l2))))
    expected = float(jnp.sum((mu1 - mu2) ** 2)
                     + jnp.sum((jnp.sqrt(l1) - jnp.sqrt(l2)) ** 2))
    np.testing.assert_allclose(w2, expected, rtol=1e-10)

    # Rotated (non-commuting basis) case: W2 is invariant under a SHARED
    # rotation of both covariances and means.
    q, _ = np.linalg.qr(rng.standard_normal((4, 4)))
    q = jnp.asarray(q)
    w2_rot = float(wasserstein2(
        (q @ mu1, q @ jnp.diag(l1) @ q.T), (q @ mu2, q @ jnp.diag(l2) @ q.T)
    ))
    np.testing.assert_allclose(w2_rot, expected, rtol=1e-8)


def test_uci_cdgp_implicit(runner, tmp_path):
    """Net-new, round 3: the UCI evaluation protocol over the MATRIX-FREE
    model (`-mc cdgp-implicit`) — large-M runs without the [M, M] Gram.
    The -P preconditioner becomes a construction-time field (the model
    rebuilds its factor per solve), and the condition-number properties go
    through the masked matrix-free Lanczos (estimator-tagged)."""
    gpr_dir = tmp_path / "gpr"
    _run(runner, [
        "gpr", "-d", "synthetic1d", "-n", "5", "-l", str(gpr_dir),
        "-k", "matern32", "-s", "0", "--no-tensorboard",
    ])

    uci_dir = tmp_path / "uci_implicit"
    result = _run(runner, [
        "uci", "-mc", "cdgp-implicit", "-p", "fp64", "-j", "1e-6",
        "-c", str(gpr_dir), "-P", "pivchol", "--precond-rank", "8",
        "kmeans", "-m", "16",
        "compute-metrics", "-l", str(uci_dir),
    ])
    out = json.loads((uci_dir / "results.json").read_text())
    assert out["model"] == "cdgp-implicit"
    assert np.isfinite(out["test/rmse"])
    assert out["condition_number"] > 1.0
    assert out["estimator"] == "lanczos"  # matrix-free route, never [M, M]
    assert out["preconditioner"] == "pivchol"
    assert "Script finished" in result.output

    # Same protocol, same hyperparameters: the matrix-free model must score
    # the same RMSE as the dense cdgp to solver tolerance.
    uci_dense = tmp_path / "uci_dense"
    _run(runner, [
        "uci", "-mc", "cdgp", "-p", "fp64", "-j", "1e-6",
        "-c", str(gpr_dir),
        "kmeans", "-m", "16",
        "compute-metrics", "-l", str(uci_dense),
    ])
    dense = json.loads((uci_dense / "results.json").read_text())
    # Both runs stop at 0.5||r||^2 <= 1e-6 (absolute): solutions agree to
    # ~1e-3 residual, so scores differ at the ~1e-4 relative level.
    np.testing.assert_allclose(out["test/rmse"], dense["test/rmse"],
                               rtol=1e-3)


def test_train_cggp_adam_fused_recluster(runner, tmp_path):
    logdir = tmp_path / "fused"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(logdir), "-s", "0",
        "train-cggp-adam", "-n", "50", "-b", "64", "-m", "16",
        "-c", "covernet", "-d", "euclidean", "--spatial-resolution", "0.5",
        "--recluster", "fused", "--steps-per-call", "25",
        "--no-tensorboard",
    ])
    assert "fused re-clustering" in result.output
    assert (logdir / "params.npz").exists()
    import json

    info = json.loads((logdir / "info.json").read_text())
    assert info["recluster"] == "fused" and info["capacity"] == 16
    # capacity-pinned buffers in the saved params
    params = np.load(logdir / "params.npz")
    assert params["inducing_points"].shape[0] == 16


def test_train_fused_recluster_usage_errors(runner, tmp_path):
    result = runner.invoke(cli, [
        "train", "-d", "synthetic1d", "-l", str(tmp_path / "x"), "-s", "0",
        "train-cggp-adam", "-n", "4", "-b", "64",
        "-c", "kmeans", "-m", "8", "--recluster", "fused",
        "--steps-per-call", "2", "--no-tensorboard",
    ], catch_exceptions=False)
    assert result.exit_code != 0
    assert "requires -c covernet" in result.output


def test_train_fused_recluster_sharded(runner, tmp_path):
    logdir = tmp_path / "fused_sharded"
    result = _run(runner, [
        "train", "-d", "synthetic1d", "-l", str(logdir), "-s", "0",
        "train-cggp-adam", "-n", "50", "-b", "64", "-m", "16",
        "-c", "covernet", "-d", "euclidean", "--spatial-resolution", "0.5",
        "--recluster", "fused", "--steps-per-call", "25",
        "--num-devices", "4", "--no-tensorboard",
    ])
    assert "fused re-clustering" in result.output
    params = np.load(logdir / "params.npz")
    assert params["inducing_points"].shape[0] == 16
    assert np.isfinite(params["pseudo_u"]).all()


def test_gpr_iterative_chunked_training(runner, tmp_path):
    """--chunk-iterations: the dispatch-bounded exact-GP trainer from the
    CLI (round-4) — Adam over log_marginal_likelihood_chunked, chunked
    posterior metrics, true-LML (SLQ) reporting.  Loss must improve and the
    artifacts must match the plain gpr contract."""
    logdir = tmp_path / "gpr_chunked"
    result = _run(runner, [
        "gpr", "-d", "synthetic1d", "-n", "6", "-l", str(logdir),
        "-k", "matern32", "-s", "0", "--no-tensorboard",
        "--iterative", "-o", "adam", "--chunk-iterations", "6",
        "--cg-threshold", "1e-8", "--block", "64", "--num-probes", "4",
    ])
    assert (logdir / "params.npz").exists()
    results = json.loads((logdir / "results.json").read_text())
    assert results["model"] == "gpr-iter"
    assert np.isfinite(results["test/rmse"])
    assert np.isfinite(results["train/lml"])
    entries = np.load(logdir / "train.logs.npy", allow_pickle=True)
    losses = [float(e["loss"]) for e in entries]
    assert len(losses) == 6
    # The logged per-step value rides the zero-logdet convention (monotone
    # descent of the TRUE loss is pinned at the API level:
    # tests/test_training.py::test_train_chunked_adam_improves_true_mll).
    assert np.all(np.isfinite(losses))
    assert "Script finished" in result.output

    # Guard: the flag is Adam+iterative-only.
    bad = runner.invoke(cli, [
        "gpr", "-d", "synthetic1d", "-n", "2", "-l", str(tmp_path / "x"),
        "--chunk-iterations", "4",
    ])
    assert bad.exit_code != 0


def test_gpr_iter_predict_workflow(runner, tmp_path):
    """The reference predict_mu_var workflow for the exact-GP family
    (net-new): gpr --iterative trains + saves a config dir; predict
    -mc gpr-iter rebuilds, serves mu/var for train and test splits, and
    persists/reuses the posterior cache — including the dispatch-bounded
    --chunk-iterations build."""
    gpr_dir = tmp_path / "gpr"
    _run(runner, [
        "gpr", "-d", "synthetic1d", "-n", "4", "-l", str(gpr_dir),
        "-k", "matern32", "-s", "0", "--no-tensorboard",
        "--iterative", "-o", "adam", "--block", "64", "--num-probes", "4",
        "-pm", "0.01",
    ])

    pred_dir = tmp_path / "pred"
    cache_dir = tmp_path / "cache"
    result = _run(runner, [
        "predict", "-c", str(gpr_dir), "-l", str(pred_dir),
        "-mc", "gpr-iter", "-tb", "128", "-e", "1e-14",
        "--posterior-dir", str(cache_dir),
        "--chunk-iterations", "6",
    ])
    assert "bounded chunks" in result.output
    assert "saved to" in result.output
    test_mean = np.load(pred_dir / "test_mean.npy")
    test_var = np.load(pred_dir / "test_variances.npy")
    assert np.all(np.isfinite(test_mean)) and np.all(test_var > 0)

    # Second run reuses the persisted cache (no rebuild) and reproduces the
    # dumped posterior bit-for-bit.
    pred2 = tmp_path / "pred2"
    result2 = _run(runner, [
        "predict", "-c", str(gpr_dir), "-l", str(pred2),
        "-mc", "gpr-iter", "-tb", "128", "-e", "1e-14",
        "--posterior-dir", str(cache_dir),
        "--chunk-iterations", "6",
    ])
    assert "build skipped" in result2.output
    np.testing.assert_array_equal(np.load(pred2 / "test_mean.npy"), test_mean)

    # Dense-GPR serving from the same config dir.
    pred3 = tmp_path / "pred3"
    _run(runner, [
        "predict", "-c", str(gpr_dir), "-l", str(pred3),
        "-mc", "gpr", "-tb", "128",
    ])
    dense_mean = np.load(pred3 / "test_mean.npy")
    np.testing.assert_allclose(dense_mean, test_mean, rtol=1e-5, atol=1e-7)

    # The rebuild honors the training bijector bound (-pm 0.01 recorded in
    # info.json; review finding: a default-bound rebuild re-transforms
    # every unconstrained leaf to shifted values): predict's dump must
    # match an in-process model built with the SAME bound.
    import json as _json

    from cggp_tpu.cli.cli_utils import (
        DatasetType, KernelType, create_itergpr_model,
    )
    from cggp_tpu.utils import assign_flat, load_config_dir

    flat, info = load_config_dir(gpr_dir)
    assert float(info["positive_minimum"]) == 0.01
    data = DatasetType().convert("synthetic1d", None, None)(0)
    model, params = create_itergpr_model(
        data.train, KernelType().convert("matern32", None, None),
        positive_minimum=0.01, cg_threshold=1e-14, block=64, num_probes=4)
    params = assign_flat(params, flat)
    mu_proc, _ = model.predict_f(
        params, tuple(map(np.asarray, data.train)), np.asarray(data.test[0]))
    np.testing.assert_allclose(np.asarray(mu_proc), test_mean,
                               rtol=1e-5, atol=1e-7)
