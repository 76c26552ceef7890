"""Position encoders: fairseq-legacy sinusoidal and learned.

The SONAR text stack requires exact fairseq1-style sinusoidal encodings for
checkpoint parity (reference ``sonar/models/sonar_text/factory.py:88-92``
passes ``_legacy_pad_idx`` to fairseq2's ``SinusoidalPositionEncoder``):

- table[p] = concat(sin(p * w), cos(p * w)) with
  w_i = exp(-i * ln(10000) / (half - 1)), i in [0, half)  — *half-split*
  layout, NOT interleaved, and the (half - 1) denominator of fairseq1.
- With a legacy pad index, token at sequence position t reads table row
  ``t + pad_idx + 1`` (fairseq1 reserved rows 0..pad_idx). The ``basic``
  encoder config compensates by growing ``max_seq_len`` 512 -> 514
  (``sonar/models/sonar_text/factory.py:56-59``).

The table is a deterministic function of (max_len, dim) — computed once per
model build, closed over by the jitted forward, never checkpointed.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.nn.core import Params


def sinusoidal_table(max_len: int, dim: int, dtype: "jnp.dtype" = jnp.float32) -> jnp.ndarray:
    """[max_len, dim] fairseq1-style sinusoidal table (half-split sin|cos).

    Computed host-side in float64 (it is a build-time constant) so the fp32
    result is exactly the rounded true value, matching the torch reference.
    """
    half = dim // 2
    if half > 1:
        inv_freq = np.exp(
            np.arange(half, dtype=np.float64) * (-math.log(10000.0) / (half - 1))
        )
    else:
        inv_freq = np.ones((half,), np.float64)
    args = np.arange(max_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((max_len, 1))], axis=1)
    return jnp.asarray(table, dtype)


class SinusoidalPositionEncoder:
    """Stateless sinusoidal PE with optional fairseq legacy pad offset.

    ``max_seq_len`` is the table row count (already including the +pad_idx+1
    headroom for legacy configs). ``step`` supports incremental decoding.
    """

    def __init__(self, dim: int, max_seq_len: int, legacy_pad_idx: Optional[int] = None):
        self.dim = dim
        self.max_seq_len = max_seq_len
        self.offset = 0 if legacy_pad_idx is None else legacy_pad_idx + 1
        self._table = sinusoidal_table(max_seq_len, dim)

    def __call__(self, seqs: jnp.ndarray, step: int | jnp.ndarray = 0) -> jnp.ndarray:
        """seqs: [B, S, D]; returns seqs + PE[offset+step : offset+step+S]."""
        seq_len = seqs.shape[1]
        table = self._table.astype(seqs.dtype)
        if isinstance(step, (int,)) and step == 0:
            pe = jax.lax.slice_in_dim(table, self.offset, self.offset + seq_len)
        else:
            start = jnp.asarray(step, jnp.int32) + self.offset
            pe = jax.lax.dynamic_slice_in_dim(table, start, seq_len, axis=0)
        return seqs + pe[None, :, :]


class LearnedPositionEncoder:
    """Learned positional embeddings (fairseq2 ``LearnedPositionEncoder``)."""

    def __init__(self, dim: int, max_seq_len: int):
        self.dim = dim
        self.max_seq_len = max_seq_len

    def init(self, rng: jax.Array, dtype: "jnp.dtype" = jnp.float32) -> Params:
        return {"weight": jax.random.normal(rng, (self.max_seq_len, self.dim), dtype)}

    def __call__(
        self, params: Params, seqs: jnp.ndarray, step: int | jnp.ndarray = 0
    ) -> jnp.ndarray:
        seq_len = seqs.shape[1]
        table = params["weight"].astype(seqs.dtype)
        start = jnp.asarray(step, jnp.int32)
        pe = jax.lax.dynamic_slice_in_dim(table, start, seq_len, axis=0)
        return seqs + pe[None, :, :]
