"""Sequence pooling to fixed-size sentence embeddings.

Semantics replicate ``SonarTextTransformerEncoderModel.static_pooling``
(reference ``sonar/models/sonar_text/model.py:86-128``), including the
``1e-7`` mean-pooling epsilon required for exact numeric parity.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp

from sonar_tpu.ops.masks import length_mask


class Pooling(enum.Enum):
    MAX = "max"
    MEAN = "mean"
    LAST = "last"
    ATTENTION = "attention"


def static_pool(
    seqs: jnp.ndarray,
    seq_lens: Optional[jnp.ndarray],
    pooling: Pooling,
) -> jnp.ndarray:
    """[B, S, D] -> [B, D]. ``seq_lens=None`` means all positions are valid."""
    b, s, _ = seqs.shape
    mask = None if seq_lens is None else length_mask(seq_lens, s)

    if pooling == Pooling.LAST:
        if seq_lens is None:
            return seqs[:, -1]
        idx = jnp.clip(seq_lens - 1, 0, s - 1)
        return jnp.take_along_axis(seqs, idx[:, None, None], axis=1)[:, 0]

    if pooling == Pooling.MAX:
        if mask is not None:
            seqs = jnp.where(mask[..., None], seqs, -jnp.inf)
        return jnp.max(seqs, axis=1)

    if pooling == Pooling.MEAN:
        if mask is not None:
            seqs = jnp.where(mask[..., None], seqs, 0.0)
        total = jnp.sum(seqs, axis=1)
        if seq_lens is None:
            denom = jnp.full((b,), float(s), total.dtype)
        else:
            denom = seq_lens.astype(total.dtype)
        # 1e-7 epsilon matches the reference exactly (model.py:116-120).
        return total * (1.0 / (denom + 1e-7))[:, None]

    raise NotImplementedError(f"static pooling does not support {pooling}")
