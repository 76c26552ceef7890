"""Fused rel-pos attention kernel (Conformer), hybrid XLA+Pallas.

The Transformer-XL score has two parts: ac = (q+u)K^T and the rel-shifted
bd term. The shift needs per-row lane offsets, which Mosaic cannot express
(dynamic lane-dim loads must be 128-aligned), so bd stays on the efficient
XLA pad/reshape path; the kernel fuses everything else — the ac matmul,
bd add, bias, fp32 softmax and PV — so neither ac nor the probability
matrix ever materializes in HBM (at speech lengths those are the largest
intermediates).

Validated in interpret mode and on hardware against the pure-XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp
import numpy as np


def _kernel(q_ref, k_ref, v_ref, bd_ref, u_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)            # [bq, dh]
    k = k_ref[0, 0].astype(jnp.float32)            # [S, dh]
    v = v_ref[0, 0]                                # [S, dh]
    u = u_ref[0].astype(jnp.float32)               # [1, dh]
    bd = bd_ref[0, 0].astype(jnp.float32)          # [bq, S]

    ac = jax.lax.dot_general(
        q + u, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bq, S]
    scores = (ac + bd) * scale + bias_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _kernel_v2(q_ref, k_ref, v_ref, wr_ref, si_ref, ci_ref, basis_ref,
               u_ref, vb_ref, bias_ref, o_ref, *, scale: float, half: int):
    q32 = q_ref[0, 0].astype(jnp.float32)          # [bq, dh]
    k = k_ref[0, 0]                                # [S, dh]
    v = v_ref[0, 0]                                # [S, dh]
    u = u_ref[0].astype(jnp.float32)               # [1, dh]
    vb = vb_ref[0].astype(jnp.float32)             # [1, dh]
    dt = k.dtype

    # positional term, built entirely in VMEM: z = (q+v) Wr_h^T, rotate by
    # the i-basis, then one matmul against the j-basis
    qv = (q32 + vb).astype(dt)                     # [bq, dh]
    z = jax.lax.dot_general(
        qv, wr_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bq, D]
    si = si_ref[...].astype(jnp.float32)           # [bq, half]
    ci = ci_ref[...].astype(jnp.float32)
    z_s, z_c = z[:, :half], z[:, half:]
    w = jnp.concatenate(
        [z_s * si + z_c * ci, z_c * si - z_s * ci], axis=-1
    ).astype(dt)                                   # [bq, D]
    bd = jax.lax.dot_general(
        w, basis_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bq, S]

    ac = jax.lax.dot_general(
        (q32 + u).astype(dt), k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = (ac + bd) * scale + bias_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def relpos_flash_attention_v2(
    q: jnp.ndarray,            # [B, H, S, Dh] (pre-bias)
    k: jnp.ndarray,
    v: jnp.ndarray,
    wr_heads: jnp.ndarray,     # [H, D, Dh] r_proj kernel per head
    si: jnp.ndarray,           # [S, half] sin(i*w) i-basis
    ci: jnp.ndarray,           # [S, half] cos(i*w)
    basis: jnp.ndarray,        # [S, D] = [cos(j*w) | sin(j*w)] j-basis
    u_bias: jnp.ndarray,       # [H, Dh]
    v_bias: jnp.ndarray,       # [H, Dh]
    key_bias: Optional[jnp.ndarray] = None,  # [B, S] additive fp32
    q_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fully fused Conformer rel-pos attention.

    v1 takes the bd matrix precomputed; this version builds it inside the
    kernel from the trig-factored form (see ``nn.conformer``): per q-block,
    z = (q + v_bias) @ Wr_h^T, an elementwise i-rotation, and one matmul
    against the [S, D] cos/sin j-basis — so neither bd [B,H,S,S] nor the
    rotated z/w [B,H,S,D] tensors (~260 MB/layer at speech shapes) ever
    touch HBM. All in-kernel ops are MXU dots or elementwise; no shuffles,
    no rel-shift.
    """
    b, h, s, dh = q.shape
    d = wr_heads.shape[1]
    half = si.shape[1]
    scale = 1.0 / np.sqrt(dh)

    pad_s = (-s) % q_block
    sp = s + pad_s
    if pad_s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        si = jnp.pad(si, ((0, pad_s), (0, 0)))
        ci = jnp.pad(ci, ((0, pad_s), (0, 0)))
        basis = jnp.pad(basis, ((0, pad_s), (0, 0)))
    if key_bias is None:
        key_bias = jnp.zeros((b, s), jnp.float32)
    if pad_s:
        key_bias = jnp.pad(
            key_bias, ((0, 0), (0, pad_s)),
            constant_values=jnp.finfo(jnp.float32).min,
        )

    out = pl.pallas_call(
        functools.partial(_kernel_v2, scale=scale, half=half),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, dh), q.dtype),
        grid=(b, h, sp // q_block),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, dh), lambda i, j, g: (i, j, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, dh), lambda i, j, g: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, dh), lambda i, j, g: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, dh), lambda i, j, g: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, half), lambda i, j, g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, half), lambda i, j, g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, d), lambda i, j, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda i, j, g: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda i, j, g: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp), lambda i, j, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, dh), lambda i, j, g: (i, j, g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, wr_heads, si, ci, basis, u_bias[:, None, :],
      v_bias[:, None, :], key_bias[:, None, :])
    return out[:, :, :s]


@functools.partial(jax.jit, static_argnames=("q_block", "interpret"))
def relpos_flash_attention(
    q: jnp.ndarray,            # [B, H, S, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bd: jnp.ndarray,           # [B, H, S, S] pre-shifted rel-pos term
    u_bias: jnp.ndarray,       # [H, Dh]
    key_bias: Optional[jnp.ndarray] = None,  # [B, S] additive fp32
    q_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, s, dh = q.shape
    scale = 1.0 / np.sqrt(dh)

    pad_s = (-s) % q_block
    sp = s + pad_s
    if pad_s:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        bd = jnp.pad(bd, ((0, 0), (0, 0), (0, pad_s), (0, pad_s)))
    if key_bias is None:
        key_bias = jnp.zeros((b, s), jnp.float32)
    if pad_s:
        key_bias = jnp.pad(
            key_bias, ((0, 0), (0, pad_s)), constant_values=jnp.finfo(jnp.float32).min
        )

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, dh), q.dtype),
        grid=(b, h, sp // q_block),
        in_specs=[
            pl.BlockSpec((1, 1, q_block, dh), lambda i, j, g: (i, j, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, dh), lambda i, j, g: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp, dh), lambda i, j, g: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_block, sp), lambda i, j, g: (i, j, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda i, j, g: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sp), lambda i, j, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, dh), lambda i, j, g: (i, j, g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, bd, u_bias[:, None, :], key_bias[:, None, :])
    return out[:, :, :s]
