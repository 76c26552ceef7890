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

from typing import Any, Optional, Sequence, TypeVar

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

T = TypeVar("T")


def _multiprocess_cluster_env() -> bool:
    """True when the environment indicates a MULTI-process launch that
    ``jax.distributed.initialize()`` can auto-detect with no arguments:
    an explicit coordinator env var, SLURM / Open MPI / PMI with more
    than one task, or a Cloud TPU pod slice with more than one worker.
    Presence alone is not enough — e.g. single-worker TPU setups export
    ``TPU_WORKER_HOSTNAMES`` too — so process counts are parsed.
    """
    import os

    env = os.environ
    if any(
        v in env
        for v in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    ):
        return True

    def _count(var: str) -> int:
        try:
            return int(env.get(var, "1"))
        except ValueError:
            return 1

    if max(_count("SLURM_NTASKS"), _count("SLURM_NPROCS")) > 1:
        return True
    if max(_count("OMPI_COMM_WORLD_SIZE"), _count("PMI_SIZE")) > 1:
        return True
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def initialize(coordinator_address: Optional[str] = None, **kwargs: Any) -> None:
    """Distributed init. MUST run before any backend-touching JAX call —
    probing ``jax.process_count()`` here would itself initialize the
    backend and make ``jax.distributed.initialize`` impossible (caught by
    tests/unit/test_multihost.py, which launches real worker processes).

    With no arguments this is a no-op on a standalone machine; in a
    detected multi-process cluster environment (SLURM, Open MPI/PMI,
    Cloud TPU pods, explicit coordinator env vars — see
    ``_multiprocess_cluster_env``) it defers to
    ``jax.distributed.initialize()``'s own auto-detection.
    """
    if coordinator_address is not None or kwargs:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    elif _multiprocess_cluster_env():
        jax.distributed.initialize()


def shard_for_host(items: Sequence[T]) -> Sequence[T]:
    """This process's shard (drop-in for the world_size/rank pattern)."""
    world, rank = jax.process_count(), jax.process_index()
    return items[rank::world]


def host_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def global_batch_from_local(mesh: Mesh, local_batch: Any, axis: str = "data") -> Any:
    """Assemble a globally-sharded array from per-host local batches."""
    sharding = host_batch_sharding(mesh, axis)
    return jax.make_array_from_process_local_data(sharding, local_batch)
