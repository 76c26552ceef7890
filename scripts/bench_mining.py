"""Cosine top-k mining throughput on one chip (the xsim/mining hot op).

Workload: src bank [N, 1024] against tgt bank [M, 1024], top-8 by cosine,
bf16 MXU matmul in [8192, M] row blocks. Slope over distinct banks.
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
        ("int8 exact ", "int8", False),
        ("int8 approx", "int8", True),
    ):
        dt = run(dt_, banks, ap)
        print(f"{name}: {dt*1e3:6.0f} ms per {N}x{M} pass  "
              f"({N/dt:,.0f} src rows/s, {flops/dt/1e12:.1f} TFLOPS)",
              flush=True)
    # recall of the fast modes vs fp32 exact on one pair
    _, i_e = jax.jit(lambda q, b: cosine_topk(q, b, K))(*banks[0])
    ie = np.asarray(i_e)
    for name, dt_, ap in (
        ("bf16 approx", jnp.bfloat16, True),
        ("int8 exact ", "int8", False),
        ("int8 approx", "int8", True),
    ):
        _, i_a = jax.jit(
            lambda q, b: cosine_topk(q, b, K, dot_dtype=dt_, approx=ap)
        )(*banks[0])
        ia = np.asarray(i_a)
        recall = np.mean([len(set(a) & set(b)) / K for a, b in zip(ie, ia)])
        top1 = float((ie[:, 0] == ia[:, 0]).mean())
        print(f"{name} top-{K} recall vs fp32 exact: {recall:.4f} "
              f"(top-1 {top1:.4f})")


if __name__ == "__main__":
    main()
