"""Fused short-sequence self-attention consuming the QKV projection output
directly ([B, S, 3*H*Dh]) — no head-split transposes.

Why: at SONAR's sentence lengths (S <= 128) the attention FLOPs are trivial,
but the XLA path around them is not — a device trace of the int8 encode
showed, per layer: three layout copies of q/k/v ([B,S,H,Dh] {0,3,2,1} ->
{3,1,2,0}) plus fp32 logit/probability buffers spilling between memory
spaces, together ~1.3 ms of the ~2.5 ms layer. This kernel takes the fused
QKV matmul's output in its natural layout, slices heads inside VMEM (free),
and keeps logits/softmax/PV entirely on-chip; only the [B, S, H*Dh]
attention output is written, already in the layout the output projection
wants.

Numerics match ``ops.attention.sdpa_xla``: fp32 logits and softmax, PV in
the input dtype with fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp


def _short_attn_kernel(qkv_ref, bias_ref, o_ref, *, num_heads: int,
                       head_dim: int, scale: float):
    # Per-head 2-D dots: Mosaic rejects batched 3-D matmuls at these shapes;
    # the unrolled loop of [S, Dh] x [Dh, S] dots compiles cleanly and all
    # intermediates stay in VMEM/registers.
    qkv = qkv_ref[0]                     # [S, 3*H*Dh]
    d = num_heads * head_dim
    bias = bias_ref[0]                   # [1, S] fp32 (key padding)
    for h in range(num_heads):
        lo, hi = h * head_dim, (h + 1) * head_dim
        q = qkv[:, lo:hi]
        k = qkv[:, d + lo:d + hi]
        v = qkv[:, 2 * d + lo:2 * d + hi]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias                 # [S, S]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, lo:hi] = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret")
)
def short_qkv_attention(
    qkv: jnp.ndarray,                    # [B, S, 3*H*Dh]
    bias: Optional[jnp.ndarray],         # [B, S] additive fp32 key bias
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns merged-head attention output [B, S, H*Dh]."""
    b, s, three_d = qkv.shape
    d = three_d // 3
    head_dim = d // num_heads
    scale = head_dim ** -0.5
    if bias is None:
        bias_arr = jnp.zeros((b, 1, s), jnp.float32)
    else:
        bias_arr = bias.astype(jnp.float32).reshape(b, 1, s)

    return pl.pallas_call(
        functools.partial(
            _short_attn_kernel, num_heads=num_heads, head_dim=head_dim,
            scale=scale,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, three_d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        interpret=interpret,
    )(qkv, bias_arr)
