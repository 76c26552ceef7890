"""Tile-parameter sweep for the fused int8 FFN kernel (slope-timed).

The kernel runs ~315-325 TOPS (80% of v5e's 394 int8 peak) at its
defaults (block_m=256, n_splits=2); this sweeps block_m x n_splits to see
whether different VMEM tiling closes any of the remaining 20%.
"""

import functools
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

from sonar_tpu.ops.pallas.ffn import fused_int8_ffn_ln
from sonar_tpu.ops.quantization import quantize_kernel

M, D, F = 8192, 1024, 8192
I1, I2 = 20, 100
PASSES = 5


def mix(x, out):
    red = out.reshape(out.shape[0], -1).astype(jnp.float32).sum(axis=1, keepdims=True)
    return x + (red * 1e-6).astype(x.dtype)


def slope_time(step, x0):
    def make(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                return mix(c, step(c)), None

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c.reshape(-1)[:8]

        return run

    times = {}
    for iters in (I1, I2):
        run = make(iters)
        np.asarray(run(x0))
        ts = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            ts.append(time.perf_counter() - t0)
        times[iters] = sorted(ts)[len(ts) // 2]
    return (times[I2] - times[I1]) / (I2 - I1)


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} F={F}")
    rng = jax.random.PRNGKey(0)
    mk = lambda i, s, sc=1.0: jax.random.normal(jax.random.fold_in(rng, i), s) * sc
    ln_s = (1 + 0.1 * mk(1, (D,))).astype(jnp.float32)
    ln_b = (0.1 * mk(2, (D,))).astype(jnp.float32)
    w1q, w1s = quantize_kernel(mk(3, (D, F), 0.03))
    b1 = (0.1 * mk(4, (F,))).astype(jnp.float32)
    w2q, w2s = quantize_kernel(mk(5, (F, D), 0.03))
    b2 = (0.1 * mk(6, (D,))).astype(jnp.float32)
    x0 = mk(7, (M, D)).astype(jnp.bfloat16)
    ops = 2 * 2 * M * D * F

    for n_splits in (2, 4):
        for block_m in (128, 256, 512, 1024):
            try:
                step = functools.partial(
                    fused_int8_ffn_ln,
                    ln_scale=ln_s, ln_bias=ln_b,
                    w1_q=w1q, w1_scale=w1s, b1=b1,
                    w2_q=w2q, w2_scale=w2s, b2=b2,
                    block_m=block_m, n_splits=n_splits,
                )
                t = slope_time(step, x0)
                print(f"n_splits={n_splits} block_m={block_m:5d}: "
                      f"{t*1e3:6.3f} ms  {ops/t/1e12:6.1f} TOPS")
            except Exception as e:
                print(f"n_splits={n_splits} block_m={block_m:5d}: "
                      f"FAILED {str(e)[:80]}")


if __name__ == "__main__":
    main()
