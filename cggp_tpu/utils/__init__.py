"""Utility helpers: parameter store (config-dir contract), timers."""

from cggp_tpu.utils.store import (
    assign_flat,
    flatten_params,
    load_checkpoint,
    load_config_dir,
    load_posterior,
    posterior_fingerprint,
    save_checkpoint,
    save_config_dir,
    save_posterior,
    unflatten_params,
)

__all__ = [
    "assign_flat",
    "flatten_params",
    "load_checkpoint",
    "load_config_dir",
    "load_posterior",
    "posterior_fingerprint",
    "save_checkpoint",
    "save_config_dir",
    "save_posterior",
    "unflatten_params",
]
