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


# ---------------------------------------------------------------------------
# Serving-cache persistence (net-new): build a posterior cache once (the
# expensive part — factorization / CG solves / LOVE basis), persist it, and
# serve from many processes without re-solving.  The reference has no
# counterpart: it refactorizes inside every predict call (models.py:333-345).
#
# Every model family's cache is a NamedTuple pytree (CGGPPosterior,
# IterGPRPosterior, PathwisePosterior, ...) whose leaves are arrays, nested
# dicts (kernel_params), tuples (precond_state), Nones, and the odd static
# scalar — so persistence is a structure-preserving encode: arrays go to
# ``posterior.npz`` under slash-joined path names, the structure (including
# the NamedTuple class, restored by import on load) goes to
# ``posterior.json``.
# ---------------------------------------------------------------------------


def _encode_pytree(obj, path: str, arrays: Dict[str, np.ndarray]):
    """JSON-able structure descriptor; array leaves spilled to ``arrays``."""
    if obj is None:
        return None
    if isinstance(obj, (bool, int, float, str)):
        return {"kind": "scalar", "value": obj}
    if isinstance(obj, dict):
        return {"kind": "dict", "items": {
            str(k): _encode_pytree(v, f"{path}/{k}", arrays)
            for k, v in obj.items()}}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        cls = type(obj)
        return {"kind": "namedtuple",
                "class": [cls.__module__, cls.__qualname__],
                "items": {f: _encode_pytree(v, f"{path}/{f}", arrays)
                          for f, v in zip(obj._fields, obj)}}
    if isinstance(obj, (tuple, list)):
        return {"kind": "tuple" if isinstance(obj, tuple) else "list",
                "items": [_encode_pytree(v, f"{path}/{i}", arrays)
                          for i, v in enumerate(obj)]}
    arrays[path] = np.asarray(obj)
    return {"kind": "array", "name": path}


def _decode_pytree(desc, arrays):
    if desc is None:
        return None
    kind = desc["kind"]
    if kind == "scalar":
        return desc["value"]
    if kind == "array":
        saved = arrays[desc["name"]]
        out = jnp.asarray(saved)
        if out.dtype != saved.dtype:
            # jnp.asarray silently downcasts 64-bit leaves when
            # jax_enable_x64 is off in the loading process, which would break
            # the documented exact round trip without any signal.
            raise ValueError(
                f"posterior leaf {desc['name']!r} was saved as {saved.dtype} "
                f"but loads as {out.dtype}; enable jax_enable_x64 in the "
                f"loading process (caches must be loaded under the same x64 "
                f"setting they were saved with)")
        return out
    if kind == "dict":
        return {k: _decode_pytree(v, arrays) for k, v in desc["items"].items()}
    if kind in ("tuple", "list"):
        seq = [_decode_pytree(v, arrays) for v in desc["items"]]
        return tuple(seq) if kind == "tuple" else seq
    if kind == "namedtuple":
        module, qualname = desc["class"]
        if not module.startswith("cggp_tpu."):
            # The class is imported on load; restrict to this package so a
            # tampered sidecar cannot name arbitrary import targets.
            raise ValueError(f"refusing to import posterior class from "
                             f"{module!r} (not a cggp_tpu module)")
        import importlib

        cls = importlib.import_module(module)
        for part in qualname.split("."):
            cls = getattr(cls, part)
        # The module-prefix check above only constrains the import target;
        # the getattr walk could still escape the package through the
        # module's own imports (e.g. qualname "subprocess.check_output").
        # Require the RESOLVED object to be a NamedTuple class defined in
        # this package before calling it.
        if not (isinstance(cls, type) and issubclass(cls, tuple)
                and hasattr(cls, "_fields")
                and cls.__module__.startswith("cggp_tpu.")):
            raise ValueError(
                f"refusing to instantiate {module}.{qualname}: not a "
                f"NamedTuple class defined in cggp_tpu")
        fields = {k: _decode_pytree(v, arrays) for k, v in desc["items"].items()}
        return cls(**fields)
    raise ValueError(f"unknown descriptor kind: {kind!r}")


def save_posterior(dirpath, post) -> None:
    """Write a serving cache to ``{dirpath}/posterior.{npz,json}``.

    ``post`` is any model family's posterior NamedTuple
    (:meth:`CGGP.posterior`, :meth:`IterGPR.posterior`,
    :func:`build_pathwise_posterior`, ...).  Load with
    :func:`load_posterior`; the round trip is exact (dtypes preserved), so
    a serving process can skip the cache build entirely.
    """
    dirpath = Path(dirpath)
    dirpath.mkdir(parents=True, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    desc = _encode_pytree(post, "post", arrays)
    if not (isinstance(desc, dict) and desc["kind"] == "namedtuple"):
        raise TypeError(
            f"save_posterior expects a posterior NamedTuple, got {type(post)}"
        )
    np.savez(str(dirpath / "posterior.npz"), **arrays)
    with open(dirpath / "posterior.json", "w") as fh:
        json.dump(desc, fh, indent=2)


def posterior_fingerprint(model_class: str, params: Dict,
                          extra: str = "") -> str:
    """Stable identity of (model class, trained params[, data identity]) for
    cache validation.

    Stored next to a persisted serving cache so a later process can detect
    that the cache was built for different parameters (e.g. after
    retraining) instead of silently serving a stale shape-compatible one.
    ``extra`` folds in anything else the cache depends on — e.g. the
    dataset identity for models whose posterior is built from training data
    (GPR/SGPR/IterGPR: ``alpha = (K(X_A) + s^2 I)^{-1} y_A`` served against
    dataset B is exactly the silent staleness this guard exists for).
    """
    import hashlib

    h = hashlib.sha256(f"{model_class}|{extra}".encode())
    flat = flatten_params(params)
    for name in sorted(flat):
        arr = flat[name]
        h.update(name.encode())
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:16]


def load_posterior(dirpath):
    """Read back the serving cache written by :func:`save_posterior`."""
    dirpath = Path(dirpath)
    with open(dirpath / "posterior.json") as fh:
        desc = json.load(fh)
    with np.load(str(dirpath / "posterior.npz")) as npz:
        arrays = {k: npz[k] for k in npz.files}
    return _decode_pytree(desc, arrays)
