"""Parameter snapshots and the config-dir contract.

The reference's load-bearing reproduction mechanism is ``params.npy`` +
``info.json`` directories: GPR training saves them (paper_cli_gpr.py:126-128)
and UCI evaluation loads them back with ``gpflow.utilities.multiple_assign``
(paper_cli_uci.py:64-75, :123-124).  We keep the same contract with a flat
name -> array ``params.npz`` (named arrays instead of a pickled dict) and the
same ``info.json`` metadata sidecar.

Names are slash-joined pytree paths of the *raw* (unconstrained) parameter
pytree, e.g. ``kernel/lengthscales``; :func:`assign_flat` plays the role of
``multiple_assign`` — it overwrites matching leaves of a (possibly different)
model's params and leaves the rest untouched, which is exactly how GPR
hyperparameters flow into SGPR/CDGP models in the reference workflow.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def flatten_params(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict pytree to ``{"a/b": ndarray}``."""
    flat: Dict[str, np.ndarray] = {}
    for key, value in params.items():
        name = f"{prefix}{key}"
        if isinstance(value, dict):
            flat.update(flatten_params(value, prefix=f"{name}/"))
        else:
            flat[name] = np.asarray(value)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict:
    """Inverse of :func:`flatten_params`."""
    nested: Dict = {}
    for name, value in flat.items():
        parts = name.split("/")
        node = nested
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return nested


def assign_flat(params: Dict, flat: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """Return ``params`` with leaves overwritten from matching ``flat`` names.

    Non-matching names in ``flat`` are ignored (the reference's wildcard
    ``multiple_assign`` semantics); non-matching leaves in ``params`` are
    kept.  Dtypes follow the destination leaf.
    """
    out: Dict = {}
    for key, value in params.items():
        name = f"{prefix}{key}"
        if isinstance(value, dict):
            out[key] = assign_flat(value, flat, prefix=f"{name}/")
        elif name in flat:
            out[key] = jnp.asarray(flat[name], dtype=value.dtype)
        else:
            out[key] = value
    return out


def save_config_dir(dirpath, params: Dict, info: Dict) -> None:
    """Write ``params.npz`` + ``info.json`` (paper_cli_gpr.py:126-128 contract)."""
    dirpath = Path(dirpath)
    dirpath.mkdir(parents=True, exist_ok=True)
    np.savez(str(dirpath / "params.npz"), **flatten_params(params))
    with open(dirpath / "info.json", "w") as fh:
        json.dump(info, fh, indent=2, default=str)


def load_config_dir(dirpath) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Read back ``(flat params, info)`` (paper_cli_uci.py:64-75 contract)."""
    dirpath = Path(dirpath)
    with np.load(str(dirpath / "params.npz")) as data:
        flat = {name: data[name] for name in data.files}
    info_path = dirpath / "info.json"
    info = {}
    if info_path.exists():
        with open(info_path) as fh:
            info = json.load(fh)
    return flat, info


def store_as_json(path, payload: Dict) -> None:
    """``results.json`` writer (paper_cli_uci.py:164-170)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=2, default=str)


# ---------------------------------------------------------------------------
# Orbax-backed checkpoints (net-new): async-capable, sharding-aware snapshots
# for long multi-chip training runs.  The npz config-dir contract above stays
# the reproduction interface; orbax is the operational checkpoint/restore.
# ---------------------------------------------------------------------------


def save_checkpoint(dirpath, params: Dict, step: int = 0) -> None:
    """Write an orbax checkpoint at ``{dirpath}/{step}``."""
    import orbax.checkpoint as ocp

    path = Path(dirpath).resolve() / str(step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_checkpoint(dirpath, params_like: Dict, step: Optional[int] = None) -> Dict:
    """Restore the checkpoint at ``step`` (default: latest) using
    ``params_like`` as the shape/dtype/sharding template."""
    import orbax.checkpoint as ocp

    base = Path(dirpath).resolve()
    if step is None:
        steps = sorted(int(p.name) for p in base.iterdir() if p.name.isdigit())
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {base}")
        step = steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(base / str(step), params_like)
