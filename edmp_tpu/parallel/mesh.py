"""Device mesh helpers.

The parallelism model (SURVEY.md §2.3, greenfield by design): everything is
data-parallel over a single ``('scenes',)`` axis — scenes x guides x samples
fold into one batch dimension (see planner.plan_scenes), params replicate
(~15M), and XLA partitions the batched program with no hand-written
collectives on the hot path.  TP/PP/SP/EP are deliberately descoped: horizon
is fixed at 50, attention is disabled, the model replicates trivially.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENE_AXIS = "scenes"
DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = SCENE_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_local_mesh(axis: str = SCENE_AXIS) -> Mesh:
    """Mesh over this host's chips only — pairs with the per-host scene
    sharding of the sweep (each host runs its own data-parallel mesh; scene
    spools are per-host, so no global arrays are needed)."""
    return Mesh(np.asarray(jax.local_devices()), (axis,))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-scene arrays/pytrees."""
    return NamedSharding(mesh, P(SCENE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multihost_initialize(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host launcher hook: ``jax.distributed.initialize``.

    Single-process runs (the common case in this repo's environment) are a
    no-op; on a pod slice each host calls this before building the mesh so
    ``jax.devices()`` spans the slice (ICI within, DCN across hosts).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def process_scene_slice(total_scenes: int) -> slice:
    """Deterministic per-host shard of a scene sweep (contiguous blocks)."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-total_scenes // n)
    return slice(i * per, min((i + 1) * per, total_scenes))
