"""Multi-host helpers: process-sharded data + distributed init.

The reference's only multi-process mechanism is communication-free dataset
sharding by (world_size, rank) (``huggingface_pipelines/dataset.py:89-90``).
The JAX-native equivalents:

- ``initialize()``: ``jax.distributed.initialize`` (no-op single-process),
- ``shard_for_host(items)``: this host's contiguous slice of a work list,
- ``host_batch_sharding(mesh)``: per-host input sharding for
  ``jax.make_array_from_process_local_data`` feeding a global batch.
"""

from __future__ import annotations

from typing import Optional, Sequence, TypeVar

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

T = TypeVar("T")


def initialize(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Distributed init. MUST run before any backend-touching JAX call —
    probing ``jax.process_count()`` here would itself initialize the
    backend and make ``jax.distributed.initialize`` impossible (caught by
    tests/unit/test_multihost.py, which launches real worker processes).
    A no-op unless a coordinator is given explicitly or via the standard
    cluster environment.
    """
    import os

    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    elif "JAX_COORDINATOR_ADDRESS" in os.environ or kwargs:
        jax.distributed.initialize(**kwargs)


def shard_for_host(items: Sequence[T]) -> Sequence[T]:
    """This process's shard (drop-in for the world_size/rank pattern)."""
    world, rank = jax.process_count(), jax.process_index()
    return items[rank::world]


def host_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def global_batch_from_local(mesh: Mesh, local_batch, axis: str = "data"):
    """Assemble a globally-sharded array from per-host local batches."""
    sharding = host_batch_sharding(mesh, axis)
    return jax.make_array_from_process_local_data(sharding, local_batch)
