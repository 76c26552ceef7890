"""Per-component slope timing of one encoder layer at the bench shape.

Shapes: [B=256, S=32, D=1024] = 8192 tokens, F=8192, H=16.
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

B, S, D, F, H = 256, 32, 1024, 8192, 16
K1, K2 = 10, 50
PASSES = 3


def slope(step, x0):
    def make(iters):
        @jax.jit
        def run(x):
            def body(c, _):
                o = step(c)
                # full-shape mix: every output element feeds the carry
                return c + (o * 1e-6).astype(c.dtype), None

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c.reshape(-1)[:8]

        return run

    times = {}
    for iters in (K1, K2):
        run = make(iters)
        np.asarray(run(x0))
        ts = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            ts.append(time.perf_counter() - t0)
        times[iters] = sorted(ts)[len(ts) // 2]
    return (times[K2] - times[K1]) / (K2 - K1)


def report(name, secs, flops=None):
    extra = f"  {flops / secs / 1e12:6.1f} T(FL)OPS" if flops else ""
    print(f"{name:44s} {secs * 1e3:7.3f} ms{extra}")


def main():
    print(f"devices: {jax.devices()}  [B,S,D,F]=[{B},{S},{D},{F}]")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(S // 2, S + 1, size=(B,)), jnp.int32)
    bias2d = jnp.where(
        jnp.arange(S)[None, :] < lens[:, None], 0.0, jnp.finfo(jnp.float32).min
    ).astype(jnp.float32)
    bias4d = bias2d[:, None, None, :]

    from sonar_tpu.nn.transformer import (
        AttentionSpec,
        encoder_layer,
        fuse_qkv,
        init_encoder_layer,
        set_ffn_impl,
    )
    from sonar_tpu.ops.quantization import quantize_params_int8

    spec = AttentionSpec(model_dim=D, num_heads=H)
    params = init_encoder_layer(jax.random.PRNGKey(0), spec, F, dtype=jnp.bfloat16)
    params = fuse_qkv(params)
    params_q = quantize_params_int8(params)

    n_tok = B * S
    layer_flops = 2 * n_tok * D * (3 * D + D + 2 * F) + 4 * B * H * S * S * (D // H)

    # whole layer: block kernels vs XLA
    step = lambda x: encoder_layer(params_q, x, bias4d, H, "relu", "pre")
    report("encoder layer int8 (block kernels)", slope(step, x0), layer_flops)

    import sonar_tpu.nn.transformer as T

    orig = T._block_kernels_eligible
    T._block_kernels_eligible = lambda *a, **k: False
    step = lambda x: encoder_layer(params_q, x, bias4d, H, "relu", "pre")
    report("encoder layer int8 (XLA+short_attn+ffnP)", slope(step, x0), layer_flops)
    set_ffn_impl("xla")
    step = lambda x: encoder_layer(params_q, x, bias4d, H, "relu", "pre")
    report("encoder layer int8 (XLA everything)", slope(step, x0), layer_flops)
    set_ffn_impl("auto")
    T._block_kernels_eligible = orig

    step = lambda x: encoder_layer(params, x, bias4d, H, "relu", "pre")
    report("encoder layer bf16", slope(step, x0), layer_flops)

    # attention block alone
    from sonar_tpu.ops.pallas.attn_block import fused_attn_block

    sa, ln = params_q["self_attn"], params_q["self_attn_layer_norm"]
    attn_flops = 2 * n_tok * D * 4 * D + 4 * B * H * S * S * (D // H)
    step = lambda x: fused_attn_block(
        x, bias2d, ln["weight"], ln["bias"],
        sa["qkv_proj"]["kernel_q"], sa["qkv_proj"]["scale"], sa["qkv_proj"]["bias"],
        sa["output_proj"]["kernel_q"], sa["output_proj"]["scale"],
        sa["output_proj"]["bias"], H,
    )
    report("fused_attn_block (Pallas)", slope(step, x0), attn_flops)

    from sonar_tpu.nn.core import layer_norm
    from sonar_tpu.nn.transformer import mha

    step = lambda x: x + mha(params_q["self_attn"],
                             layer_norm(ln, x), layer_norm(ln, x), bias4d, H)
    report("attn residual branch (XLA int8+shortattn)", slope(step, x0), attn_flops)

    # FFN alone
    from sonar_tpu.ops.pallas.ffn import fused_int8_ffn_ln

    f, lnf = params_q["ffn"], params_q["ffn_layer_norm"]
    ffn_flops = 2 * n_tok * D * 2 * F
    step = lambda x: x + fused_int8_ffn_ln(
        x.reshape(-1, D), lnf["weight"], lnf["bias"],
        f["inner_proj"]["kernel_q"], f["inner_proj"]["scale"], f["inner_proj"]["bias"],
        f["output_proj"]["kernel_q"], f["output_proj"]["scale"], f["output_proj"]["bias"],
    ).reshape(B, S, D)
    report("fused_int8_ffn_ln (Pallas)", slope(step, x0), ffn_flops)

    from sonar_tpu.nn.transformer import ffn as ffn_fn

    set_ffn_impl("xla")
    step = lambda x: x + ffn_fn(params_q["ffn"], layer_norm(lnf, x), "relu")
    report("ffn residual branch (XLA int8)", slope(step, x0), ffn_flops)
    set_ffn_impl("auto")

    # embedding + pooling overhead probe: full model minus 24 layers ~ see
    # bench_model_slope totals.


if __name__ == "__main__":
    main()
