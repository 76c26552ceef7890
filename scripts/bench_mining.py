"""Cosine top-k mining throughput on one chip (the xsim/mining hot op).

Workload: src bank [N, 1024] against tgt bank [M, 1024], top-8 by cosine,
bf16 MXU matmul in [8192, M] row blocks. Slope over distinct banks.
"""

import os
import sys
import time
from pathlib import Path

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sonar_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.parallel.mining import cosine_topk

N, M, D, K = 65536, 65536, 1024, 8
PASSES = 3


def run(dot_dtype, banks, approx=False):
    f = jax.jit(
        lambda q, b: cosine_topk(q, b, K, dot_dtype=dot_dtype, approx=approx)
    )
    s, i = f(*banks[0])
    np.asarray(s[:2])
    ts = []
    for src, tgt in banks[1:]:
        t0 = time.perf_counter()
        s, i = f(src, tgt)
        np.asarray(s[:2, :2]), np.asarray(i[:2, :2])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"devices: {jax.devices()}  N=M={N} D={D} top{K}")
    rng = np.random.default_rng(0)
    banks = [
        (jnp.asarray(rng.normal(size=(N, D)), jnp.float32),
         jnp.asarray(rng.normal(size=(M, D)), jnp.float32))
        for _ in range(PASSES + 1)
    ]
    flops = 2.0 * N * M * D
    for name, dt_, ap in (
        ("fp32 exact ", None, False),
        ("bf16 exact ", jnp.bfloat16, False),
        ("bf16 approx", jnp.bfloat16, True),
    ):
        dt = run(dt_, banks, ap)
        print(f"{name}: {dt*1e3:6.0f} ms per {N}x{M} pass  "
              f"({N/dt:,.0f} src rows/s, {flops/dt/1e12:.1f} TFLOPS)",
              flush=True)
    # recall of approx vs exact on one pair
    s_e, i_e = jax.jit(lambda q, b: cosine_topk(q, b, K))(*banks[0])
    s_a, i_a = jax.jit(
        lambda q, b: cosine_topk(q, b, K, dot_dtype=jnp.bfloat16, approx=True)
    )(*banks[0])
    ie, ia = np.asarray(i_e), np.asarray(i_a)
    recall = np.mean([len(set(a) & set(b)) / K for a, b in zip(ie, ia)])
    print(f"approx top-{K} recall vs exact: {recall:.4f}")


if __name__ == "__main__":
    main()
