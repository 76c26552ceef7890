"""Padding / attention mask utilities.

TPU-first convention: batches are always right-padded to a static bucketed
length, so the canonical padding representation is ``seq_lens`` (int32 [B]).
Boolean masks are derived on demand with ``arange < len`` — cheap, fusible,
and shape-static under jit.

The reference (facebookresearch/SONAR) uses fairseq2's ``PaddingMask``
(float mask of 0/-inf); here masks are boolean (True = valid position) and
converted to additive form only inside attention.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -jnp.inf


def length_mask(seq_lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] int lengths -> [B, max_len] bool mask (True = valid)."""
    positions = jnp.arange(max_len, dtype=jnp.int32)
    return positions[None, :] < seq_lens[:, None]


def mask_from_lengths(
    seq_lens: Optional[jnp.ndarray], max_len: int
) -> Optional[jnp.ndarray]:
    if seq_lens is None:
        return None
    return length_mask(seq_lens, max_len)


def apply_padding_mask(
    seqs: jnp.ndarray, mask: Optional[jnp.ndarray], pad_value: float = 0.0
) -> jnp.ndarray:
    """Zero (or fill) padded positions of [B, S, D] given [B, S] bool mask."""
    if mask is None:
        return seqs
    fill = jnp.asarray(pad_value, dtype=seqs.dtype)
    return jnp.where(mask[..., None], seqs, fill)


def causal_mask(q_len: int, kv_len: int, offset: int = 0) -> jnp.ndarray:
    """[q_len, kv_len] bool causal mask; query i attends kv j iff j <= i+offset.

    ``offset`` supports incremental decoding where the query block starts at
    absolute position ``offset`` within the KV buffer.
    """
    q_pos = jnp.arange(q_len, dtype=jnp.int32)[:, None] + offset
    kv_pos = jnp.arange(kv_len, dtype=jnp.int32)[None, :]
    return kv_pos <= q_pos


def combine_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """Logical-AND of broadcastable boolean masks; None entries are skipped."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_and(out, m)
    return out


def additive_bias(mask: Optional[jnp.ndarray], dtype: "jnp.dtype" = jnp.float32) -> Optional[jnp.ndarray]:
    """Bool mask -> additive attention bias (0 where valid, large-negative else).

    Uses the dtype's ``-inf`` replacement ``finfo.min`` to stay NaN-free when a
    whole row is masked (softmax then yields uniform garbage which is later
    discarded via the padding mask, matching reference behavior of ignoring
    padded rows).
    """
    if mask is None:
        return None
    neg = jnp.finfo(dtype).min
    return jnp.where(mask, jnp.asarray(0.0, dtype), jnp.asarray(neg, dtype))
