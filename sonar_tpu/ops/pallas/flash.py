"""Fused attention Pallas kernel for SONAR-scale sequences (S <= 514).

Design: SONAR sequences are short (text <= 514, packed rows 128, speech
pooler memory ~512), so each (batch, head) pair's full K/V fits comfortably
in VMEM (512 x 64 x 2B = 64 KB). The kernel fuses QK^T -> bias -> fp32
softmax -> PV for one query block against the entire key range in a single
grid step — the [S, S] logit and probability matrices never touch HBM (the
XLA path materializes both per layer; for the packed-encode mode at S=128
they dominate HBM traffic).

Two bias modes (head-independent):
- key padding bias [B, 1, 1, Skv],
- full bias [B, 1, Sq, Skv] (block-diagonal segment masks in packed mode).

No streaming running-max is needed at these lengths; numerics match the
unfused fp32-softmax reference exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]                    # [bq, dh]
    k = k_ref[0, 0]                    # [S, dh]
    v = v_ref[0, 0]                    # [S, dh]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # [bq, S]
    logits = logits * scale + bias_ref[0]  # bias [1, S] or [bq, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block",))
def pallas_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    q_block: int = 128,
) -> jnp.ndarray:
    """q, k, v: [B, H, S, Dh]; bias [B, 1, 1, Skv] (key padding) or
    [B, 1, Sq, Skv] (full, head-independent). Returns [B, H, Sq, Dh]."""
    b, h, sq, dh = q.shape
    skv = k.shape[2]
    scale = dh ** -0.5

    full_bias = bias is not None and bias.shape[-2] != 1

    q_block = min(q_block, sq)
    pad_q = (-sq) % q_block
    sq_p = sq + pad_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))

    if bias is None:
        bias_arr = jnp.zeros((b, 1, skv), jnp.float32)
    elif full_bias:
        bias_arr = bias[:, 0].astype(jnp.float32)               # [B, Sq, Skv]
        if pad_q:
            bias_arr = jnp.pad(bias_arr, ((0, 0), (0, pad_q), (0, 0)))
    else:
        bias_arr = bias[:, 0].astype(jnp.float32)               # [B, 1, Skv]

    qf = q.reshape(b, h, sq_p, dh)

    if full_bias:
        bias_spec = pl.BlockSpec((1, q_block, skv), lambda i, j, g: (i, g, 0),
                                 memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, 1, skv), lambda i, j, g: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, dh), q.dtype),
        grid=(b, h, sq_p // q_block),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, dh), lambda i, j, g: (i, j, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, dh), lambda i, j, g: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, dh), lambda i, j, g: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, dh), lambda i, j, g: (i, j, g, 0),
                               memory_space=pltpu.VMEM),
    )(qf, k, v, bias_arr)
    return out[:, :, :sq]
