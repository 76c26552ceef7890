"""Multi-host path with REAL process coordination (SURVEY §2.4).

Launches worker subprocesses that ``jax.distributed.initialize`` against a
local coordinator, build a global mesh spanning both processes' devices,
and run host sharding + global-batch assembly + a mesh-sharded toy encode.
This is the executable counterpart of the reference's world/rank dataset
sharding (``huggingface_pipelines/dataset.py:89-90``) plus the JAX-native
cross-host collectives the reference has no equivalent of.
"""

import os
from pathlib import Path
import socket
import subprocess
import sys

import pytest

WORKER = Path(__file__).parent.parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nprocs", [2])
def test_multihost_workers_coordinate(nprocs):
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(nprocs), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_WORKER_OK {i}" in out, out[-2000:]


def test_initialize_noop_without_coordinator():
    """Single-process call is a no-op (must not raise, must not require a
    pristine backend)."""
    from sonar_tpu.parallel.multihost import initialize, shard_for_host

    initialize()  # no coordinator, no cluster env -> no-op
    assert shard_for_host([1, 2, 3]) == [1, 2, 3]


def test_multiprocess_cluster_env_detection(monkeypatch):
    from sonar_tpu.parallel import multihost as mh

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_NTASKS",
                "SLURM_NPROCS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert not mh._multiprocess_cluster_env()

    # single-worker TPU setups export the hostnames var too — not a cluster
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not mh._multiprocess_cluster_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    assert mh._multiprocess_cluster_env()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")

    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert not mh._multiprocess_cluster_env()
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert mh._multiprocess_cluster_env()
    monkeypatch.delenv("SLURM_NTASKS")

    monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "2")
    assert mh._multiprocess_cluster_env()
    monkeypatch.delenv("OMPI_COMM_WORLD_SIZE")

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert mh._multiprocess_cluster_env()
