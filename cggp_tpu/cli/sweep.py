"""Built-in TOML sweep runner.

The reference ships TOML grids (configs/*.toml) for an *external* runner that
is not in the repo (SURVEY.md L6): a top-level ``cmd`` template, ``[[exp]]``
blocks whose list-valued fields are grid axes, ``{uid}`` path templates, and
``[flags]`` with ``num_proc``/``gpu_indices``/``restart``.  This module
implements that contract natively: the grid is the cartesian product of list
fields, each job's command is rendered and executed as a subprocess, and
``num_proc`` jobs run concurrently.  ``gpu_indices`` becomes per-process
device pinning via ``JAX_DEFAULT_DEVICE_INDEX`` (TPU chips instead of CUDA
devices).
"""

from __future__ import annotations

import itertools
import os
import subprocess
import sys
import tomllib
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List

import click


def expand_experiments(config: Dict) -> Iterator[Dict]:
    """Yield one rendered job dict per grid point of every [[exp]] block."""
    base_cmd = config.get("cmd", "")
    for exp in config.get("exp", []):
        fields = {k: v for k, v in exp.items() if k not in ("cmd", "uid")}
        axes = {k: v for k, v in fields.items() if isinstance(v, list)}
        scalars = {k: v for k, v in fields.items() if not isinstance(v, list)}
        axis_names = sorted(axes)
        for combo in itertools.product(*(axes[a] for a in axis_names)):
            values = dict(scalars)
            values.update(dict(zip(axis_names, combo)))
            # Resolve in two passes: base cmd first, then uid, then exp cmd.
            # The base template is only rendered when this block actually
            # references {cmd} — stage blocks with self-contained commands
            # need not define the base template's fields.
            uses_base = "{cmd}" in exp.get("cmd", "{cmd}")
            rendered_cmd_base = base_cmd.format(**values, uid="{uid}", cmd="{cmd}") \
                if (base_cmd and uses_base) else ""
            uid = exp.get("uid", "").format(**values, cmd="")
            values["uid"] = uid
            values["cmd"] = rendered_cmd_base.replace("{uid}", uid)
            final_cmd = exp.get("cmd", "{cmd}").format(**values)
            yield {"cmd": final_cmd, "uid": uid, "values": values}


def run_sweep(config: Dict, dry_run: bool = False, echo=print) -> List[int]:
    flags = config.get("flags", {})
    num_proc = int(flags.get("num_proc", 1))
    restart = bool(flags.get("restart", False))
    device_indices = flags.get("gpu_indices", flags.get("device_indices", None))
    # TPU-native analogue of the reference's gpu_indices pinning: a platform
    # (or per-process round-robin list) exported as JAX_PLATFORMS to each
    # child.  A single-chip/tunnel TPU cannot host concurrent processes -
    # pin sweeps to "cpu", or run num_proc=1 for device sweeps.
    platforms = flags.get("platforms", None)
    if isinstance(platforms, str):
        platforms = [platforms]

    jobs = list(expand_experiments(config))
    echo(f"sweep: {len(jobs)} jobs, num_proc={num_proc}")

    def run_one(i_job):
        i, job = i_job
        uid = job["uid"]
        if not restart and uid and Path(uid, "results.json").exists():
            echo(f"[{i}] skip (results exist): {uid}")
            return 0
        env = dict(os.environ)
        if device_indices:
            # Real per-process device pinning (the reference's gpu_indices
            # semantics, configs/uci-cdgp.toml:96-102): restrict which chip
            # each child's runtime may see.  CUDA_VISIBLE_DEVICES covers
            # GPUs; TPU_VISIBLE_DEVICES covers libtpu.  (The previous
            # JAX_DEFAULT_DEVICE_INDEX export was read by nothing.)
            idx = str(device_indices[i % len(device_indices)])
            env["CUDA_VISIBLE_DEVICES"] = idx
            env["TPU_VISIBLE_DEVICES"] = idx
        if platforms:
            target = str(platforms[i % len(platforms)])
            env["JAX_PLATFORMS"] = target
            if target == "cpu":
                # The TPU-tunnel sitecustomize initialises its backend at
                # interpreter startup whenever this var is set, OVERRIDING
                # JAX_PLATFORMS=cpu — a cpu-pinned child would silently run
                # on (and contend for) the tunnel device.  Drop it.
                env.pop("PALLAS_AXON_POOL_IPS", None)
        echo(f"[{i}] {job['cmd']}")
        if dry_run:
            return 0
        proc = subprocess.run(job["cmd"], shell=True, env=env)
        return proc.returncode

    with ThreadPoolExecutor(max_workers=num_proc) as pool:
        return list(pool.map(run_one, enumerate(jobs)))


@click.command("sweep")
@click.argument("config_path", type=click.Path(exists=True))
@click.option("--dry-run/--no-dry-run", default=False)
@click.option("--platform", default=None,
              help="Override [flags] platforms: JAX_PLATFORMS for every job.")
def main(config_path, dry_run, platform):
    """Run a TOML sweep grid (reference configs/*.toml format)."""
    with open(config_path, "rb") as fh:
        config = tomllib.load(fh)
    if platform:
        config.setdefault("flags", {})["platforms"] = platform
    codes = run_sweep(config, dry_run=dry_run, echo=click.echo)
    failed = sum(1 for c in codes if c != 0)
    click.echo(f"sweep finished: {len(codes) - failed} ok, {failed} failed")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
