"""Fused attention Pallas kernel for SONAR-scale sequences (S <= 514).

Design: SONAR sequences are short (text <= 514, speech pooler memory ~512),
so each (batch, head) pair's full K/V fits comfortably in VMEM
(512 x 64 x 2B = 64 KB). The kernel therefore fuses QK^T -> bias ->
fp32 softmax -> PV for one query block against the *entire* key range in a
single grid step — the [S, S] logit matrix never touches HBM (the XLA path
materializes it per layer). No streaming running-max is needed at these
lengths; numerics match the unfused fp32-softmax reference exactly.

Grid: (batch*heads, q_blocks). Block shapes are aligned to the MXU
(q_block x head_dim and head_dim x S contractions).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]                       # [bq, dh]
    k = k_ref[0]                       # [S, dh]
    v = v_ref[0]                       # [S, dh]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # [bq, S]
    logits = logits * scale + bias_ref[0]  # [1, S] broadcasts over bq
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
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
    """q, k, v: [B, H, S, Dh]; bias broadcastable to [B, H, Sq, Skv] (only
    key-dimension padding bias [B, 1, 1, Skv] is supported, the SONAR
    encoder case). Returns [B, H, Sq, Dh]."""
    b, h, sq, dh = q.shape
    skv = k.shape[2]
    scale = dh ** -0.5

    if bias is None:
        key_bias = jnp.zeros((b, skv), jnp.float32)
    else:
        key_bias = jnp.broadcast_to(bias, (b, 1, 1, skv))[:, 0, 0, :].astype(
            jnp.float32
        )

    q_block = min(q_block, sq)
    if sq % q_block != 0:
        pad = q_block - sq % q_block
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        sq_p = sq + pad
    else:
        sq_p = sq

    qf = q.reshape(b * h, sq_p, dh)
    kf = k.reshape(b * h, skv, dh)
    vf = v.reshape(b * h, skv, dh)

    grid = (b * h, sq_p // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(qf, kf, vf, _expand_bias(key_bias, h))
    out = out.reshape(b, h, sq_p, dh)
    return out[:, :, :sq]


def _expand_bias(key_bias: jnp.ndarray, h: int) -> jnp.ndarray:
    """[B, S] -> [B*H, 1, S]: fused bh leading axis + a unit row dim so the
    (1, 1, S) block satisfies Mosaic's tiling rules (dim -2 equals the full
    array dim)."""
    b, s = key_bias.shape
    return jnp.broadcast_to(key_bias[:, None, :], (b, h, s)).reshape(b * h, 1, s)
