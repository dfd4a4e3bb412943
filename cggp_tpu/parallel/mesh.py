"""Device-mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (v5e slice or the CPU
    virtual-device farm under xla_force_host_platform_device_count)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} are available — a silently smaller mesh "
                "would change shardings and padding without warning"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = DATA_AXIS):
    """Place arrays with rows sharded over the mesh (pads are the caller's
    job: row counts must divide the mesh size)."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) != 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def pad_rows_to_multiple(x: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    """Zero-pad rows to a multiple; returns (padded, original_n)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_widths = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_widths), n
