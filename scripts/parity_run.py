#!/usr/bin/env python
"""BASELINE parity harness: CDGP fp32 (accelerator) vs fp64 (CPU).

Runs the reference evaluation pipeline (gpr -> uci compute-metrics, i.e.
reference paper_cli_gpr.py -> paper_cli_uci.py) twice per dataset/seed/
clustering — once in fp64 on CPU (the reference oracle configuration) and
once in fp32 on the default platform (TPU when present) — and writes a CSV
with per-run RMSE/NLPD and the fp32-vs-fp64 deltas.  The BASELINE.md
north-star gate is |delta| <= 1e-3 on RMSE and NLPD.

Real UCI datasets (elevators/pol/bike/3droad — BASELINE configs 1-3) run as
    CGGP_DATA_DIR=... python scripts/parity_run.py elevators pol
once `$CGGP_DATA_DIR/uci/{name}.npz` exists (scripts/fetch_data.py needs a
network-enabled environment; this container has zero egress).  Hermetic
environments use the synthetic family, which exercises the identical
pipeline:
    python scripts/parity_run.py "synthetic:n=16000:dim=4"

Results land in benchmarks/parity_results.csv by default.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, env_overrides=None, cwd=REPO):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # First-compile through the remote-device tunnel is minutes per program;
    # share one persistent compile cache across all child runs.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    if env_overrides:
        for k, v in env_overrides.items():
            if v is None:
                env.pop(k, None)
            else:
                env[k] = v
    cmd = [sys.executable, "-m", "cggp_tpu.cli", *args]
    proc = subprocess.run(cmd, env=env, cwd=cwd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"CLI failed rc={proc.returncode}: {' '.join(cmd)}\n{proc.stderr[-2000:]}"
        )
    return proc


# JAX_PLATFORMS=cpu alone is NOT enough: the TPU-tunnel sitecustomize
# force-registers the single-chip backend whenever PALLAS_AXON_POOL_IPS is
# set, overriding it.  Drop the var (None = remove) so fp64 children really
# run on host CPU — the reference's oracle configuration.
CPU_ENV = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": None}


def one_dataset(dataset: str, seed: int, clustering: str, m_or_res: str,
                jitter: float, workdir: Path, gpr_iters: int = 60):
    """gpr (fp64 CPU) -> uci compute-metrics in fp64-CPU and fp32-default."""
    gpr_dir = workdir / "gpr"
    run_cli(
        ["gpr", "-d", dataset, "-n", str(gpr_iters), "-l", str(gpr_dir),
         "-k", "matern32", "-s", str(seed), "--no-tensorboard"],
        env_overrides=CPU_ENV,
    )

    sel_args = (["covertree", "-s", m_or_res] if clustering == "covertree"
                else [clustering, "-m", m_or_res])
    rows = []
    for precision, env in (("fp64", CPU_ENV), ("fp32", None)):
        out_dir = workdir / f"uci_{precision}"
        run_cli(
            # seed + dataset ride in from the gpr config dir (the reference's
            # own contract, paper_cli_uci.py:64-75).
            ["uci", "-mc", "cdgp", "-p", precision, "-j", str(jitter),
             "-c", str(gpr_dir),
             *sel_args, "compute-metrics", "-l", str(out_dir)],
            env_overrides=env,
        )
        results = json.loads((out_dir / "results.json").read_text())
        rows.append({
            "dataset": dataset, "seed": seed, "model": "cdgp",
            "clustering": clustering, "jitter": jitter,
            "precision": precision,
            "platform": "cpu" if env is CPU_ENV else "default",
            "num_inducing_points": results["num_inducing_points"],
            "rmse": results["test/rmse"], "nlpd": results["test/nlpd"],
            "elbo": results["train/elbo"],
            "condition_number": results["condition_number"],
            "estimator": results.get("estimator", ""),
        })
    fp64, fp32 = rows
    for r in rows:
        r["rmse_delta_vs_fp64"] = abs(fp32["rmse"] - fp64["rmse"])
        r["nlpd_delta_vs_fp64"] = abs(fp32["nlpd"] - fp64["nlpd"])
    return rows


def default_datasets():
    """Real UCI sets if any are staged under $CGGP_DATA_DIR (any accepted
    layout — npz / Wilson .mat / csv), else the hermetic synthetic family.
    The moment the driver stages real data, parity rows become real with
    zero new code."""
    sys.path.insert(0, str(REPO))
    from cggp_tpu.data import available_uci_datasets

    real = list(available_uci_datasets())
    if real:
        print(f"found staged UCI data: {real} (CGGP_DATA_DIR="
              f"{os.environ.get('CGGP_DATA_DIR', '~/.datasets')})")
        return real
    return ["synthetic:n=16000:dim=4", "synthetic:n=15000:dim=3"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("datasets", nargs="*", default=None)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--clustering", default="covertree",
                    choices=["covertree", "kmeans", "oips", "uniform", "greedy"])
    ap.add_argument("--m-or-res", default=None,
                    help="covertree spatial resolution or -m for others")
    ap.add_argument("--jitter", type=float, default=1e-6)
    ap.add_argument("--gate", type=float, default=1e-3,
                    help="parity gate on |fp32 - fp64| RMSE/NLPD")
    ap.add_argument("-o", "--output",
                    default=str(REPO / "benchmarks" / "parity_results.csv"))
    args = ap.parse_args()
    if not args.datasets:
        args.datasets = default_datasets()
    m_or_res = args.m_or_res or ("0.5" if args.clustering == "covertree" else "512")

    all_rows = []
    worst = 0.0
    for dataset in args.datasets:
        for seed in args.seeds:
            with tempfile.TemporaryDirectory() as tmp:
                rows = one_dataset(dataset, seed, args.clustering, m_or_res,
                                   args.jitter, Path(tmp))
            all_rows.extend(rows)
            d_rmse = rows[0]["rmse_delta_vs_fp64"]
            d_nlpd = rows[0]["nlpd_delta_vs_fp64"]
            worst = max(worst, d_rmse, d_nlpd)
            status = "OK" if max(d_rmse, d_nlpd) <= args.gate else "FAIL"
            print(f"{dataset} seed={seed}: |dRMSE|={d_rmse:.2e} "
                  f"|dNLPD|={d_nlpd:.2e} [{status}]")

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(all_rows[0].keys()))
        writer.writeheader()
        writer.writerows(all_rows)
    print(f"wrote {out} ({len(all_rows)} rows); worst delta {worst:.2e} "
          f"(gate {args.gate:g})")
    if worst > args.gate:
        sys.exit(1)


if __name__ == "__main__":
    main()
