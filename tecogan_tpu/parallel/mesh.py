"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[dict] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh from an {axis_name: size} spec.

    Defaults to a 1-D data mesh over all local devices. Sizes may use -1 for
    "all remaining devices" (at most one).
    """
    devices = list(devices if devices is not None else jax.devices())
    axes = dict(axes or {"data": -1})
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {axes} needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Make a global batch with the leading dim sharded over ``axis``.

    Single-process: a plain sharded device_put. Multi-process (after
    :func:`init_distributed`): ``batch`` is this process's LOCAL shard —
    each host loads its own slice of the global batch (the loader's
    per-host file sharding), and the global array is assembled from the
    process-local data without any cross-host copy.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch,
        )
    return jax.device_put(batch, sharding)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host setup (SURVEY.md §2.3: ``jax.distributed.initialize`` +
    mesh; collectives ride ICI within a slice and DCN across slices).

    On single-host runs (or TPU environments where JAX auto-detects the
    topology) every argument may be omitted. Returns the process count.

    Must be called before any backend-touching JAX call: the decision to
    initialize is made from the arguments alone (``jax.process_count()``
    itself initializes the XLA backend, after which
    ``jax.distributed.initialize`` raises), and double-initialization is
    guarded via the distributed client state, not a backend query.
    """
    if coordinator_address or num_processes or process_id is not None:
        from jax._src import distributed as _dist

        if _dist.global_state.client is None:  # not yet initialized
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    return jax.process_count()
