"""Fully-fused pre-LN int8 self-attention residual block.

Computes, per encoder layer: ``x + O(attn(QKV(LN(x))))`` in one Pallas
kernel — LayerNorm (fp32 stats), per-row dynamic int8 quantization, the
fused QKV projection, per-head attention with key-padding masking, the
output projection, and the residual add. Weights (int8 QKV [D, 3D] + output
[D, D] + scales/biases + LN affine) are grid-constant and resident in VMEM
(~4 MB int8 for the SONAR text dims).

Trick: the grid processes ``bb`` sequences per step but flattens them into
one [bb*S, D] row block so every matmul is a clean 2-D MXU dot; attention
stays per-sequence via a block-diagonal mask (row i attends row j iff
i//S == j//S), composed with the caller's additive key-padding bias.
Attention FLOPs grow by bb, but at sentence lengths they are noise next to
the projections.

Numerics: fp32 LN statistics (eps 1e-5, matching ``nn.core.layer_norm``),
fp32 logits/softmax, the same per-row dynamic-quant scheme as
``ops.quantization.int8_linear``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp


def _quant_rows(x32):
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _attn_block_kernel(
    x_ref, bias_ref, ln_s_ref, ln_b_ref,
    wqkv_ref, sqkv_ref, bqkv_ref, wo_ref, so_ref, bo_ref,
    o_ref, *, num_heads: int, head_dim: int, seq_len: int, bb: int,
):
    d = num_heads * head_dim
    n = bb * seq_len
    x = x_ref[...].reshape(n, d)                       # [N, D] bf16
    x32 = x.astype(jnp.float32)

    # LayerNorm (fp32 stats, eps 1e-5).
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    h = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * ln_s_ref[...] + ln_b_ref[...]              # [N, D] fp32

    # QKV projection (int8).
    h_q, h_scale = _quant_rows(h)
    qkv = jax.lax.dot_general(
        h_q, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * h_scale * sqkv_ref[...] + bqkv_ref[...]
    qkv = qkv.astype(jnp.bfloat16)                     # [N, 3D]

    # Block-diagonal mask: same sequence iff same row block; plus the
    # caller's additive key-padding bias (flattened [1, N]).
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // seq_len
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // seq_len
    neg = jnp.float32(-1e30)
    mask = jnp.where(row == col, 0.0, neg) + bias_ref[0]  # [N,N] + [1,N]

    scale = jnp.float32(head_dim ** -0.5)
    heads = []
    for hd in range(num_heads):
        lo, hi = hd * head_dim, (hd + 1) * head_dim
        q = qkv[:, lo:hi]
        k = qkv[:, d + lo:d + hi]
        v = qkv[:, 2 * d + lo:2 * d + hi]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + mask                               # [N, N]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(
            p.astype(jnp.bfloat16), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    attn = jnp.concatenate(heads, axis=-1)             # [N, D] fp32

    # Output projection (int8) + residual.
    a_q, a_scale = _quant_rows(attn)
    out = jax.lax.dot_general(
        a_q, wo_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * a_scale * so_ref[...] + bo_ref[...]
    o_ref[...] = (x32 + out).astype(o_ref.dtype).reshape(bb, seq_len, d)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_b", "interpret")
)
def fused_attn_block(
    x: jnp.ndarray,              # [B, S, D]
    bias: Optional[jnp.ndarray], # [B, S] additive fp32 key-padding bias
    ln_scale: jnp.ndarray,       # [D]
    ln_bias: jnp.ndarray,        # [D]
    wqkv_q: jnp.ndarray,         # [D, 3D] int8
    sqkv: jnp.ndarray,           # [1, 3D] fp32
    bqkv: jnp.ndarray,           # [3D]
    wo_q: jnp.ndarray,           # [D, D] int8
    so: jnp.ndarray,             # [1, D] fp32
    bo: jnp.ndarray,             # [D]
    num_heads: int,
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    b, s, d = x.shape
    head_dim = d // num_heads
    # Keep the flattened row block at <= 256 rows: the [bb*S, bb*S] logits
    # plus the [bb*S, 3D] QKV tensor must fit the ~16 MB VMEM budget next
    # to the resident weights (S=128 at bb=8 overflows by design).
    bb = min(block_b, b, max(1, 256 // s))
    pad_b = (-b) % bb
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    bp = b + pad_b
    if bias is None:
        bias_arr = jnp.zeros((bp, s), jnp.float32)
    else:
        bias_arr = bias.astype(jnp.float32)
        if pad_b:
            bias_arr = jnp.pad(bias_arr, ((0, pad_b), (0, 0)))
    # Flatten per grid step to [1, bb*S] for broadcasting over logit rows.
    bias_arr = bias_arr.reshape(bp // bb, 1, bb * s)

    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel, num_heads=num_heads, head_dim=head_dim,
            seq_len=s, bb=bb,
        ),
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bb * s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, s, d), x.dtype),
        interpret=interpret,
    )(
        x, bias_arr,
        ln_scale.reshape(1, d).astype(jnp.float32),
        ln_bias.reshape(1, d).astype(jnp.float32),
        wqkv_q, sqkv.reshape(1, 3 * d).astype(jnp.float32),
        bqkv.reshape(1, 3 * d).astype(jnp.float32),
        wo_q, so.reshape(1, d).astype(jnp.float32),
        bo.reshape(1, d).astype(jnp.float32),
    )
    return out[:b]
