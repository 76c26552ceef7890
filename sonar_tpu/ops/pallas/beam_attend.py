"""Fused beam-decode self-attention kernels.

Beam decode must, per layer per step: follow the K winning beams (a gather
over the beam dim of the KV cache — fairseq2 semantics via
``IncrementalStateBag.reorder``), insert the new position's K/V, and attend
each beam row to its own history. Left to XLA, the attend lowers to ~1000
tiny batched MXU dots per layer ([1, Dh] @ [Dh, S] per (batch, head, beam) at
Dh=64, S=35 — ~4% MXU utilization, 530+ us/layer measured on v5e, 85% of the
decode step), and mult-reduce formulations materialize 45 MB/layer of
broadcast intermediates instead of fusing.

``beam_reorder_attend`` does all three in ONE kernel, grid over the sentence
batch: the cache block lives in VMEM, the winner-gather and the new-KV
insert happen on the way to the output block (the full cache rewrite is HBM
traffic the step pays anyway — the gather rides it for free), and
scores/softmax/PV are VPU multiply-reduces over [H, S, Dh] tiles. HBM
traffic per layer = read cache + write cache + (new K/V, attend output):
the floor.

Numerics: fp32 scores/softmax/accumulation, same as the XLA path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp


def _masked_attend_kernel(q_ref, k_ref, v_ref, anc_ref, vbias_ref, o_ref, *,
                          beam: int, seq: int, dh: int, g: int):
    """Ancestry-masked beam attend, one [G, ...] block of the merged B*H axis.

    No dynamic slices anywhere: the only indexing is a static unroll over the
    K query beams; everything else is full-block broadcast multiply-reduce,
    which Mosaic lowers to dense VPU ops (the per-row gathers/shuffles are
    what sank the earlier kernel formulations).
    """
    anc = anc_ref[0]                                       # [K, S] int32
    vbias = vbias_ref[0]                                   # [1, S] fp32
    kc = k_ref[...].astype(jnp.float32)                    # [G, C, S, Dh]
    vc = v_ref[...].astype(jnp.float32)                    # [G, C, S, Dh]
    scale = jnp.float32(dh ** -0.5)
    crange = jax.lax.broadcasted_iota(jnp.int32, (beam, seq), 0)  # [C, S]
    for kq in range(beam):
        # additive mask: position s visible to query beam kq only through
        # the cache row that produced its token at s (and only s <= idx,
        # folded into vbias).
        allow = (anc[kq][None, :] == crange).astype(jnp.float32)  # [C, S]
        bias = (allow - 1.0) * 1e30 + vbias                       # [C, S]
        q = q_ref[:, kq].astype(jnp.float32) * scale              # [G, Dh]
        logits = jnp.sum(q[:, None, None, :] * kc, axis=-1)       # [G, C, S]
        logits = logits + bias[None]
        # softmax over (C, S), reduced one axis at a time (Mosaic has no
        # multi-axis vector reductions)
        m = jnp.max(jnp.max(logits, axis=2), axis=1)              # [G]
        p = jnp.exp(logits - m[:, None, None])
        z = jnp.sum(jnp.sum(p, axis=2), axis=1)                   # [G]
        p = p / z[:, None, None]
        # PV: reduce the untiled C axis first (plain vector adds), then the
        # sublane S axis — reducing S first forces an invalid relayout
        out = jnp.sum(jnp.sum(p[..., None] * vc, axis=1), axis=1)  # [G, Dh]
        o_ref[:, kq] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def beam_masked_attend(
    q: jnp.ndarray,        # [BH, K, Dh] (unscaled; BH = B*H, b-major)
    k_cache: jnp.ndarray,  # [BH, C, S, Dh] (view of [B, H, C, S, Dh])
    v_cache: jnp.ndarray,  # [BH, C, S, Dh]
    anc: jnp.ndarray,      # [B, K, S] int32 winner cache row per (beam, pos)
    valid_bias: jnp.ndarray,  # [S] fp32 additive (0 for s <= idx, -big after)
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ancestry-masked beam self-attend -> [BH, K, Dh].

    Drop-in compute core for ``nn.transformer._beam_self_attend``: XLA lowers
    that einsum to ~B*H tiny batched MXU dots ([K, Dh] @ [Dh, C*S]) at ~4%
    utilization (chip-measured 527 us/layer at B=64, 84% of the decode
    step); here the same arithmetic runs as dense VPU multiply-reduces over
    [G, C, S, Dh] blocks.

    The grid is over BH in blocks of G with G | num_heads, so every block
    lies inside one sentence and shares a single [K, S] ancestry table.
    """
    bh, beam, dh = q.shape
    seq = k_cache.shape[-2]
    g = num_heads
    while g > 8 or num_heads % g:
        g -= 1
    cache_spec = pl.BlockSpec(
        (g, beam, seq, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _masked_attend_kernel, beam=beam, seq=seq, dh=dh, g=g
        ),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, beam, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            cache_spec,
            cache_spec,
            pl.BlockSpec((1, beam, seq),
                         lambda i, _h=num_heads, _g=g: (i * _g // _h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, seq), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, beam, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, beam, dh), q.dtype),
        interpret=interpret,
    )(q, k_cache, v_cache, anc, valid_bias.reshape(1, 1, seq))
    return out


def _diag_attend_kernel(q_ref, k_ref, v_ref, vbias_ref, o_ref, *,
                        beam: int, heads: int, seq: int, dh: int, bb: int):
    vbias = vbias_ref[0]                                   # [1, S]
    scale = jnp.float32(dh ** -0.5)
    for c in range(beam):
        qc = q_ref[:, c].astype(jnp.float32) * scale       # [bb, H, Dh]
        kk = k_ref[:, :, c].astype(jnp.float32)            # [bb, H, S, Dh]
        logits = jnp.sum(qc[:, :, None, :] * kk, axis=-1)  # [bb, H, S]
        logits = logits + vbias[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        vv = v_ref[:, :, c].astype(jnp.float32)            # [bb, H, S, Dh]
        out = jnp.sum(p[..., None] * vv, axis=2)           # [bb, H, Dh]
        o_ref[:, pl.dslice(c, 1)] = out[:, None].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def beam_diag_attend(
    q: jnp.ndarray,        # [B, K, H, Dh] (unscaled)
    k_cache: jnp.ndarray,  # [B, H, K, S, Dh] post-reorder/write
    v_cache: jnp.ndarray,  # [B, H, K, S, Dh]
    valid_bias: jnp.ndarray,  # [S] fp32 additive (0 for s <= idx, -big after)
    block_b: int = 4,  # VMEM: 2 bf16 cache blocks + per-c fp32 temporaries
    interpret: bool = False,
) -> jnp.ndarray:
    """Diagonal attend: beam row k attends its own cache slot. -> [B,K,H,Dh].

    Grid is blocked over the sentence batch so each grid step's VPU ops run
    on [bb, H, S, Dh] tiles (the per-(batch, head) matrices are far too small
    for the MXU: [1, Dh] @ [Dh, S]).
    """
    b, beam, heads, dh = q.shape
    seq = k_cache.shape[-2]
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    out = pl.pallas_call(
        functools.partial(
            _diag_attend_kernel, beam=beam, heads=heads, seq=seq, dh=dh, bb=bb
        ),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, beam, heads, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, heads, beam, seq, dh), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, heads, beam, seq, dh), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, seq), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, beam, heads, dh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, beam, heads, dh), q.dtype),
        interpret=interpret,
    )(q, k_cache, v_cache, valid_bias.reshape(1, 1, seq))
    return out


def _reorder_attend_kernel(
    sel_ref,                 # [B, K] int32 scalar-prefetch: winner per row
    q_ref,                   # [1, K, H, Dh]
    knew_ref, vnew_ref,      # [1, K, H, Dh]
    kold_ref, vold_ref,      # [1, H, K, S, Dh]
    vbias_ref,               # [1, 1, S] fp32 additive (0 / -big beyond idx)
    at_ref,                  # [1, 1, S] fp32 1.0 at write position else 0.0
    kout_ref, vout_ref,      # [1, H, K, S, Dh]
    o_ref,                   # [1, K, H, Dh]
    *, beam: int, heads: int, seq: int, dh: int,
):
    b = pl.program_id(0)
    vbias = vbias_ref[0]                       # [1, S]
    at = at_ref[0]                             # [1, S] (1.0 at idx)
    scale = jnp.float32(dh ** -0.5)
    for c in range(beam):
        src = sel_ref[b, c]
        # fp32 working copies: Mosaic only supports non-trivial minor-dim
        # broadcasts for 32-bit types
        kg = kold_ref[0, :, pl.dslice(src, 1)][:, 0].astype(jnp.float32)
        vg = vold_ref[0, :, pl.dslice(src, 1)][:, 0].astype(jnp.float32)
        # insert this step's K/V at the write position (at == 1.0 there);
        # dim-insert on fp32 first (i1/16-bit minor-dim inserts unsupported)
        atm = at[0][None, :, None] != 0.0                         # [1, S, 1]
        knc = knew_ref[0, c].astype(jnp.float32)[:, None, :]      # [H, 1, Dh]
        vnc = vnew_ref[0, c].astype(jnp.float32)[:, None, :]
        kk = jnp.where(atm, knc, kg)                              # [H, S, Dh]
        vv = jnp.where(atm, vnc, vg)
        # dim-insert on fp32 (16-bit minor-dim inserts unsupported), then cast
        kout_ref[0, :, pl.dslice(c, 1)] = kk[:, None].astype(kout_ref.dtype)
        vout_ref[0, :, pl.dslice(c, 1)] = vv[:, None].astype(vout_ref.dtype)
        # diagonal attend: row c attends its own (reordered) history
        qc = q_ref[0, c].astype(jnp.float32)[:, None, :] * scale  # [H, 1, Dh]
        logits = jnp.sum(qc * kk, axis=-1)                        # [H, S]
        logits = logits + vbias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)                # [H, S]
        o_ref[0, c] = jnp.sum(p[:, :, None] * vv, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_reorder_attend(
    q: jnp.ndarray,        # [B, K, H, Dh] (unscaled)
    k_new: jnp.ndarray,    # [B, K, H, Dh] this step's keys per row
    v_new: jnp.ndarray,    # [B, K, H, Dh]
    k_cache: jnp.ndarray,  # [B, H, K, S, Dh] pre-reorder
    v_cache: jnp.ndarray,  # [B, H, K, S, Dh]
    sel: jnp.ndarray,      # [B, K] int32: winner row to inherit history from
    valid_bias: jnp.ndarray,  # [S] fp32 additive (0 for s <= idx, -big after)
    write_onehot: jnp.ndarray,  # [S] fp32: 1.0 at the write position
    interpret: bool = False,
) -> Any:
    """-> (attended [B, K, H, Dh], k_cache' [B,H,K,S,Dh], v_cache')."""
    b, beam, heads, dh = q.shape
    seq = k_cache.shape[-2]
    cache_spec = pl.BlockSpec(
        (1, heads, beam, seq, dh), lambda i, sel_ref: (i, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, beam, heads, dh), lambda i, sel_ref: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    svec_spec = pl.BlockSpec(
        (1, 1, seq), lambda i, sel_ref: (0, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[row_spec, row_spec, row_spec, cache_spec, cache_spec,
                  svec_spec, svec_spec],
        out_specs=[cache_spec, cache_spec, row_spec],
    )
    kout, vout, out = pl.pallas_call(
        functools.partial(
            _reorder_attend_kernel, beam=beam, heads=heads, seq=seq, dh=dh
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((b, beam, heads, dh), q.dtype),
        ],
        interpret=interpret,
    )(sel, q, k_new, v_new, k_cache, v_cache,
      valid_bias.reshape(1, 1, seq), write_onehot.reshape(1, 1, seq))
    return out, kout, vout
