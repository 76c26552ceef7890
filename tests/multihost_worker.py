"""Worker process for the multi-host tests (launched by test_multihost.py).

Runs REAL ``jax.distributed`` coordination between processes on CPU: each
worker owns 2 virtual devices of a (nprocs*2)-device global mesh. Must set
platform env BEFORE importing jax — and ``multihost.initialize`` must run
before anything touches the backend.
"""

import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Share the suite's persistent compile cache (same CPU-flag-keyed dir
# scheme as conftest.py — kept inline: importing conftest would drag
# pytest into every worker) so repeat runs skip the workers' compiles too.
def _cpu_cache_dir() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            cpu_flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        cpu_flags = ""
    key = hashlib.sha1(cpu_flags.encode()).hexdigest()[:8]
    return os.path.expanduser(f"~/.cache/sonar_tpu_xla_tests-{key}")


jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from sonar_tpu.parallel.multihost import (  # noqa: E402
    global_batch_from_local,
    initialize,
    shard_for_host,
)

initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=proc_id,
    local_device_ids=[0, 1],
)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.local_devices()) == 2

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

n_global = nprocs * 2
mesh = Mesh(np.array(jax.devices()).reshape(n_global, 1), ("data", "model"))

# -- communication-free work-list sharding (the reference's world/rank) ----
items = list(range(10))
mine = shard_for_host(items)
assert mine == items[proc_id::nprocs], mine

# -- per-host local batch -> globally sharded array + cross-host reduce ----
local = np.asarray(
    [[float(proc_id * 2 + d)] * 4 for d in range(2)], np.float32
)
with mesh:
    g = global_batch_from_local(mesh, local)
    assert g.shape == (n_global, 4)
    total = float(jax.jit(jnp.sum)(g))
    want = sum(r * 4.0 for r in range(n_global))
    np.testing.assert_allclose(total, want)

# -- mesh-sharded toy encode across processes ------------------------------
from sonar_tpu.models.sonar_text import (  # noqa: E402
    SonarTextEncoder,
    sonar_text_encoder_archs,
)

model = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
params = model.init_params(jax.random.PRNGKey(0))  # same seed on every host
with mesh:
    params = jax.device_put(
        params, NamedSharding(mesh, P())  # replicated
    )
    rng = np.random.default_rng(proc_id)
    seqs_local = rng.integers(4, 1000, size=(2, 8)).astype(np.int32)
    lens_local = np.full((2,), 8, np.int32)
    seqs = global_batch_from_local(mesh, seqs_local)
    lens = global_batch_from_local(mesh, lens_local)
    emb = jax.jit(
        lambda p, s, l: model.apply(p, s, l).sentence_embeddings
    )(params, seqs, lens)
    # every host materializes its addressable shards; checksum via psum-like
    # global reduce so all hosts agree
    checksum = float(jax.jit(lambda e: jnp.sum(jnp.abs(e)))(emb))
    assert np.isfinite(checksum) and checksum > 0.0

# -- sharded mining across processes (VERDICT r4 #6) -----------------------
# The headline scale-out use case: sharded_cosine_topk / mine_bitexts over
# the same spanning mesh, asserted equal to the single-device path. Same
# deterministic banks on every host (mining shards the BANK over the mesh
# axis, so inputs are replicated, not per-host).
from sonar_tpu.parallel.mining import (  # noqa: E402
    cosine_topk,
    mine_bitexts,
    sharded_cosine_topk,
)

bank_rng = np.random.default_rng(7)
x_bank = bank_rng.normal(size=(16, 8)).astype(np.float32)
y_bank = bank_rng.normal(size=(24, 8)).astype(np.float32)
with mesh:
    s_scores, s_idx = sharded_cosine_topk(x_bank, y_bank, k=4, mesh=mesh)
    d_scores, d_idx = cosine_topk(x_bank, y_bank, k=4)
    np.testing.assert_array_equal(np.asarray(s_idx), np.asarray(d_idx))
    np.testing.assert_allclose(
        np.asarray(s_scores), np.asarray(d_scores), atol=1e-6
    )
    m_src, m_tgt, m_margin = mine_bitexts(x_bank, y_bank, k=4, mesh=mesh)
    l_src, l_tgt, l_margin = mine_bitexts(x_bank, y_bank, k=4)
    np.testing.assert_array_equal(m_src, l_src)
    np.testing.assert_array_equal(m_tgt, l_tgt)
    np.testing.assert_allclose(m_margin, l_margin, atol=1e-6)
assert len(m_src) > 0  # the random banks must actually mine some pairs

print(f"MULTIHOST_WORKER_OK {proc_id} total={total} checksum={checksum:.4f} "
      f"mined={len(m_src)}")
