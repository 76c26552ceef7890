"""Per-block exact-selection A/B at the mining sim shape.

cosine_topk's scan body selects top-kb from a [N, block] similarity slab.
The beam-decode winner (block-max gather, ops/topk.exact_top_k_wide) was
adopted for mining without a shape-specific A/B; this probes the candidates
at N=65536, block=8192, k=8 — many rows x modest width, the opposite corner
from decode's few rows x 256k width.

Slabs are generated ON DEVICE (jax.random) — a [65536, 8192] fp32 slab is
2 GB, ~80 s of tunnel upload each if built on the host.
"""

import os
from pathlib import Path
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sonar_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.ops.topk import exact_top_k_wide

N, W, K = 65536, 8192, 8
PASSES = 4


def timeit(f, slabs):
    g = jax.jit(f)
    v, i = g(slabs[0])
    np.asarray(v[:2])
    ts = []
    for s in slabs[1:]:
        t0 = time.perf_counter()
        v, i = g(s)
        np.asarray(v[:2, :2]), np.asarray(i[:2, :2])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"devices: {jax.devices()}  sim [{N}, {W}] top-{K}")
    make = jax.jit(lambda key: jax.random.normal(key, (N, W), jnp.float32))
    slabs = [make(jax.random.PRNGKey(i)) for i in range(PASSES + 1)]
    for s in slabs:
        s.block_until_ready()
    cands = [("lax.top_k      ", lambda x: jax.lax.top_k(x, K))]
    for bs in (256, 512, 1024, 2048):
        cands.append((
            f"gather bs={bs:4d} ",
            lambda x, bs=bs: exact_top_k_wide(x, K, block_size=bs),
        ))
    cands.append(("approx_max_k   ", lambda x: jax.lax.approx_max_k(x, K)))
    for name, f in cands:
        dt = timeit(f, slabs)
        print(f"{name}: {dt*1e3:7.1f} ms per [{N},{W}] selection", flush=True)


if __name__ == "__main__":
    main()
