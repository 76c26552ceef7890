"""Slope-timed A/B: XLA Conformer half-FFN branch vs the fused bf16 Pallas
kernel (VERDICT r2 #7). Speech shapes: M = B*S rows of D=1024, F=4096.

Methodology per the tunnel rules (CLAUDE.md): single process, jit(lax.scan)
at two lengths, every output element folded into the carry, value mixing so
no content caching.
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

from sonar_tpu.nn.core import layer_norm
from sonar_tpu.ops.pallas.ffn import fused_bf16_ffn_ln_residual

D, F = 1024, 4096
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
    print(f"devices: {jax.devices()}  D={D} F={F} slope {I1}->{I2}")
    rng = jax.random.PRNGKey(0)
    mk = lambda i, shape, s=1.0: (
        jax.random.normal(jax.random.fold_in(rng, i), shape, jnp.float32) * s
    )
    ln_s = (1 + 0.1 * mk(1, (D,))).astype(jnp.float32)
    ln_b = (0.1 * mk(2, (D,))).astype(jnp.float32)
    w1 = mk(3, (D, F), 0.03).astype(jnp.bfloat16)
    b1 = (0.1 * mk(4, (F,))).astype(jnp.float32)
    w2 = mk(5, (F, D), 0.03).astype(jnp.bfloat16)
    b2 = (0.1 * mk(6, (D,))).astype(jnp.float32)
    ln_params = {"weight": ln_s, "bias": ln_b}

    def xla_branch(x):
        ln = layer_norm(ln_params, x)
        h = jax.nn.silu(
            jnp.dot(ln, w1, preferred_element_type=jnp.float32) + b1
        ).astype(x.dtype)
        y = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        return x + 0.5 * y.astype(x.dtype)

    for m in (2048, 4096, 8192):
        x0 = mk(7, (m, D)).astype(jnp.bfloat16)
        flops = 2 * 2 * m * D * F  # two matmuls
        t_xla = slope_time(xla_branch, x0)
        t_ker = slope_time(
            functools.partial(
                fused_bf16_ffn_ln_residual, ln_scale=ln_s, ln_bias=ln_b,
                w1=w1, b1=b1, w2=w2, b2=b2,
            ),
            x0,
        )
        # re-check XLA second to guard against drift
        t_xla2 = slope_time(xla_branch, x0)
        # numerics
        a = np.asarray(xla_branch(x0), np.float32)
        b = np.asarray(
            fused_bf16_ffn_ln_residual(x0, ln_s, ln_b, w1, b1, w2, b2),
            np.float32,
        )
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        print(
            f"M={m:5d}  xla {t_xla*1e3:7.3f}/{t_xla2*1e3:7.3f} ms "
            f"({flops/t_xla/1e12:5.1f} TFLOPS)   "
            f"kernel {t_ker*1e3:7.3f} ms ({flops/t_ker/1e12:5.1f} TFLOPS)  "
            f"cosine {cos:.6f}"
        )


if __name__ == "__main__":
    main()
