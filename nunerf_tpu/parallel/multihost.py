"""Multi-host scaling support.

The reference is single-GPU only (``multi_gpus`` raises NotImplementedError,
train/trainer.py:74-75).  Here multi-host training means: call
``init_multihost()`` at process start on every host, build the global mesh,
and feed each host its shard of every global ray batch (same shared RNG seed
-> identical shuffles, no cross-host data exchange; SURVEY.md section 5).
Gradients all-reduce over ICI/DCN via the sharding-induced psums.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """Initialize jax.distributed (no-op for single-process runs)."""
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_local_batch(global_batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Slice this host's contiguous shard of a globally-identical batch.

    All hosts draw the same global batch from the same seeded shuffle; each
    keeps ``global_rn / num_hosts`` rays.  Combined with
    ``jax.make_array_from_process_local_data`` this forms the global sharded
    array without any host-to-host copies.
    """
    import jax
    n_hosts = jax.process_count()
    idx = jax.process_index()
    out = {}
    for k, v in global_batch.items():
        per = v.shape[0] // n_hosts
        out[k] = v[idx * per:(idx + 1) * per]
    return out


def global_sharded_batch(local_batch: Dict, mesh, axis: str = "data"):
    """Assemble process-local shards into global arrays on the mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in local_batch.items():
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v), global_shape)
    return out
