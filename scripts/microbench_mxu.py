"""MXU microbenchmark with overhead-free "slope" timing.

The axon tunnel adds a large fixed cost per dispatch (~30 ms measured), so
per-iteration times from a single scan length are inflated. Here every
measurement runs the same jitted scan at two lengths (I1, I2) and reports
the slope (t2 - t1) / (I2 - I1): pure per-iteration device time.

Findings drive the int8 encode-path kernels: on this chip s8 x s8 -> s32
reaches ~320 TOPS at 8192^3 (81% of the 394 nominal), i.e. the int8 MXU
path is real — kernels must be shaped to hit it.
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

M, D, F = 8192, 1024, 8192
I1, I2 = 10, 50
PASSES = 3


def mix(x, out):
    """Fold EVERY element of out into the carry so nothing can be DCE'd:
    per-row full reduction broadcast back onto the carry rows."""
    rows = x.shape[0]
    red = out.reshape(rows, -1).astype(jnp.float32).sum(axis=1, keepdims=True)
    red = red.reshape((rows,) + (1,) * (x.ndim - 1))
    return x + (red * 1e-6).astype(x.dtype)


def slope_time(step, x0):
    """Overhead-free seconds/iteration via two scan lengths."""

    def make(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                o = step(c)
                return mix(c, o), None

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


def report(name, secs, flops):
    print(f"{name:46s} {secs * 1e3:7.3f} ms  {flops / secs / 1e12:6.1f} T(FL)OPS")


def main():
    print(f"devices: {jax.devices()}  M={M} D={D} F={F} slope {I1}->{I2}")
    rng = np.random.default_rng(0)
    w1b = jnp.asarray(rng.normal(size=(D, F)) * 0.02, jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(F, D)) * 0.02, jnp.bfloat16)
    w1q = jnp.asarray(rng.integers(-127, 128, size=(D, F)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 128, size=(F, D)), jnp.int8)
    xb = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)

    # --- FFN pair, bf16 XLA ---
    step = lambda x: (jnp.maximum(x @ w1b, 0) @ w2b).astype(jnp.bfloat16)
    report("bf16 FFN pair (XLA)", slope_time(step, xb), 2 * M * D * F * 2)

    # --- FFN pair, s8 XLA, static scales ---
    def step_s8(x):
        xq = jnp.clip(jnp.round(x * 16.0), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w1q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        h = jnp.maximum(acc, 0).astype(jnp.float32) * (1 / 2048.0)
        hq = jnp.clip(jnp.round(h), -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc2.astype(jnp.bfloat16) * 1e-3

    report("s8 FFN pair static-scale (XLA)", slope_time(step_s8, xb),
           2 * M * D * F * 2)

    # --- FFN pair, s8 XLA, dynamic per-row scales (current int8_linear) ---
    def step_s8_dyn(x):
        from sonar_tpu.ops.quantization import int8_linear

        h = int8_linear({"kernel_q": w1q, "scale": jnp.ones((1, F))}, x)
        h = jnp.maximum(h, 0)
        return int8_linear({"kernel_q": w2q, "scale": jnp.ones((1, D))}, h)

    report("s8 FFN pair dynamic (XLA int8_linear)", slope_time(step_s8_dyn, xb),
           2 * M * D * F * 2)

    # --- committed fused Pallas FFN kernel ---
    from sonar_tpu.ops.pallas.ffn import fused_int8_ffn

    s1 = jnp.full((1, F), 1e-2, jnp.float32)
    b1 = jnp.zeros((F,), jnp.float32)
    s2 = jnp.full((1, D), 1e-2, jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    for bm in (256, 512):
        step = lambda x: fused_int8_ffn(x, w1q, s1, b1, w2q, s2, b2, block_m=bm)
        report(f"fused int8 FFN Pallas (bm={bm})", slope_time(step, xb),
               2 * M * D * F * 2)

    # --- raw dots at FFN shapes, s8 (epilogue rowsum) ---
    def dot1(x):
        xq = x.astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w1q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc.sum(1, keepdims=True).astype(jnp.float32) * 1e-6

    xi = jnp.asarray(rng.integers(-8, 8, size=(M, D)), jnp.bfloat16)
    report("s8 [M,1024]@[1024,8192] (XLA)", slope_time(dot1, xi), 2 * M * D * F)

    def dot2(h):
        hq = h.astype(jnp.int8)
        acc = jax.lax.dot_general(
            hq, w2q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc.sum(1, keepdims=True).astype(jnp.float32) * 1e-6

    hi = jnp.asarray(rng.integers(-8, 8, size=(M, F)), jnp.bfloat16)
    report("s8 [M,8192]@[8192,1024] (XLA)", slope_time(dot2, hi), 2 * M * D * F)


if __name__ == "__main__":
    main()
