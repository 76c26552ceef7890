"""Slope-timed breakdown + A/B of the Conformer conv module on chip.

The speech breakdown attributes ~5 ms of the 52.6 ms batch to the conv
module, whose matmuls (pw1 D->2D, pw2 D->D) are only ~50 GFLOP at speech
shapes (~0.5 ms at MXU rates) and whose depthwise k=31 conv is a rounding
error in FLOPs. This probes where the time actually goes and whether a
different depthwise lowering (31 shifted FMAs instead of
conv_general_dilated with feature_group_count=D) helps.

Methodology per the tunnel rules (CLAUDE.md): single process, jit(lax.scan)
slope at two lengths, outputs folded into the carry, value mixing.
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

from sonar_tpu.nn.conformer import conv_module
from sonar_tpu.nn.core import linear

B, S, D, K = 8, 1000, 1024, 31
I1, I2 = 20, 100
PASSES = 5


def mix(x, out):
    red = out.reshape(out.shape[0], -1).astype(jnp.float32).sum(axis=1, keepdims=True)
    return x + (red[:, None] * 1e-6).astype(x.dtype)


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
    print(f"devices: {jax.devices()}  B={B} S={S} D={D} K={K} slope {I1}->{I2}")
    rng = jax.random.PRNGKey(0)
    mk = lambda i, shape, s=1.0: (
        jax.random.normal(jax.random.fold_in(rng, i), shape, jnp.float32) * s
    )
    params = {
        "pointwise_conv1": {"kernel": mk(1, (D, 2 * D), 0.03).astype(jnp.bfloat16)},
        "depthwise_conv": {"kernel": mk(2, (K, 1, D), 0.1).astype(jnp.bfloat16)},
        "batch_norm": {
            "weight": (1 + 0.1 * mk(3, (D,))).astype(jnp.float32),
            "bias": (0.1 * mk(4, (D,))).astype(jnp.float32),
            "running_mean": (0.1 * mk(5, (D,))).astype(jnp.float32),
            "running_var": (1 + 0.1 * jnp.abs(mk(6, (D,)))).astype(jnp.float32),
        },
        "pointwise_conv2": {"kernel": mk(7, (D, D), 0.03).astype(jnp.bfloat16)},
    }
    x0 = mk(8, (B, S, D)).astype(jnp.bfloat16)
    kd = params["depthwise_conv"]["kernel"]

    # -- whole module (current lowering) --------------------------------
    t_mod = slope_time(lambda x: conv_module(params, x, None), x0)

    # -- components -----------------------------------------------------
    def pw_only(x):
        y = linear(params["pointwise_conv1"], x)
        a, g = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.sigmoid(g)
        return linear(params["pointwise_conv2"], y[..., :D])

    t_pw = slope_time(pw_only, x0)

    def dconv_xla(x):
        k = kd.astype(x.dtype)
        pad = (K - 1) // 2
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1,), padding=[(pad, K - 1 - pad)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=D,
        )

    t_dc = slope_time(dconv_xla, x0)

    # -- alternative depthwise lowering: 31 shifted FMAs ----------------
    def dconv_shift(x):
        pad = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, K - 1 - pad), (0, 0)))
        w = kd[:, 0, :].astype(x.dtype)  # [K, D]
        acc = jnp.zeros(x.shape, jnp.float32)
        for j in range(K):
            acc = acc + xp[:, j : j + S, :].astype(jnp.float32) * w[j]
        return acc.astype(x.dtype)

    t_ds = slope_time(dconv_shift, x0)

    a = np.asarray(dconv_xla(x0), np.float32)
    b = np.asarray(dconv_shift(x0), np.float32)
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))

    def conv_module_shift(x):
        y = linear(params["pointwise_conv1"], x)
        a_, g = jnp.split(y, 2, axis=-1)
        y = a_ * jax.nn.sigmoid(g)
        y = dconv_shift(y)
        bn = params["batch_norm"]
        y32 = y.astype(jnp.float32)
        y32 = (y32 - bn["running_mean"]) * jax.lax.rsqrt(bn["running_var"] + 1e-5)
        y = (y32 * bn["weight"] + bn["bias"]).astype(x.dtype)
        y = jax.nn.silu(y)
        return linear(params["pointwise_conv2"], y)

    t_mod_shift = slope_time(conv_module_shift, x0)

    flops_pw = 2 * B * S * D * (2 * D + D)
    print(
        f"conv_module (current): {t_mod*1e3:7.3f} ms/layer-call  "
        f"(x24 layers = {t_mod*24*1e3:.1f} ms/batch)\n"
        f"  pointwise-only:      {t_pw*1e3:7.3f} ms ({flops_pw/t_pw/1e12:5.1f} TFLOPS)\n"
        f"  depthwise XLA conv:  {t_dc*1e3:7.3f} ms\n"
        f"  depthwise 31-FMA:    {t_ds*1e3:7.3f} ms  (cosine vs conv {cos:.6f})\n"
        f"conv_module (31-FMA):  {t_mod_shift*1e3:7.3f} ms/layer-call"
    )


if __name__ == "__main__":
    main()
