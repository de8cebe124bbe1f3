"""Device mesh + sharding helpers.

The scaling axis of this workload is rays (SURVEY.md section 2.7): rays are
embarrassingly parallel, so the mesh is one ``data`` axis; parameters are
replicated and gradients all-reduce over ICI via the compiler (we annotate
shardings and let XLA insert the psums — the scaling-book recipe).

Works identically on the real TPU topology and on the virtual CPU mesh used
in tests (``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (ray) sharding for batch arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Device-put every batch array sharded on its leading axis.  Arrays whose
    leading dim does not divide the mesh are replicated instead."""
    n = mesh.devices.size
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] % n == 0:
            out[k] = jax.device_put(v, batch_sharding(mesh, axis))
        else:
            out[k] = jax.device_put(v, replicated(mesh))
    return out


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
