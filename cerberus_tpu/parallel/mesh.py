"""Device-mesh utilities.

The reference has no distributed layer (SURVEY.md §2: a single-process
estimator with 3 mutexes and 4 pthreads). Here scale-out is first-class:
independent estimation windows (Monte-Carlo seeds, bag segments, calibration
perturbations) are batched and sharded over a `jax.sharding.Mesh` 'batch'
axis riding ICI; collectives replace shared-memory assembly.

Multi-host: call `init_distributed()` (jax.distributed.initialize) before
building the mesh; the same code then spans hosts over DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None, num_processes: int = 1,
                     process_id: int = 0):
    """Initialize multi-host JAX (no-op for single-process)."""
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
