"""Exact top-k over very wide trailing axes, two-stage.

``lax.top_k`` over an NLLB-scale vocabulary (256k columns) sorts the whole
row; at beam-search k (~2*beam) that is almost all wasted work. The standard
TPU remedy is ``lax.approx_max_k``, but its recall is not bit-guaranteed, so
parity-first paths can't use it. This module keeps exactness and removes most
of the sort width instead: any global top-k element is a within-block top-k
element of its block, so per-block top-k (sorting ``block_size``-wide
segments) followed by one k-from-(nb*k) merge is exact — including
``lax.top_k``'s lowest-index tie ordering, because blocks concatenate in
index order and each block's candidates are already index-ordered among ties
(same argument as the blocked bank merge in ``parallel/mining.cosine_topk``).

Used by the exact (parity-default) candidate selection in
``generation/beam_search.py``; the reference's generator delegates to plain
``torch.topk`` (fairseq2 beam search, used via
``/root/reference/sonar/inference_pipelines/text.py:109``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_FILL = -jnp.inf


def exact_top_k_wide(
    x: jnp.ndarray, k: int, block_size: int = 4096
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact ``lax.top_k(x, k)`` over the last axis, blocked.

    Bit-identical to ``jax.lax.top_k`` (values, indices, and lowest-index
    tie ordering) for finite float input; rows containing -inf get the same
    values but may order tied -inf indices differently. Rows narrower than
    two blocks fall through to plain ``top_k`` — the two-stage split only
    pays off when the merge width (nb * k) is much smaller than the row.
    """
    width = x.shape[-1]
    if k > width:
        raise ValueError(f"k={k} > trailing width {width}")
    if width <= 2 * block_size:
        return jax.lax.top_k(x, k)

    nb = -(-width // block_size)
    pad = nb * block_size - width
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=_NEG_FILL)
    blocked = x.reshape(x.shape[:-1] + (nb, block_size))
    kb = min(k, block_size)
    bs_vals, bs_idx = jax.lax.top_k(blocked, kb)          # [..., nb, kb]
    offs = (jnp.arange(nb, dtype=bs_idx.dtype) * block_size)[:, None]
    cand_idx = (bs_idx + offs).reshape(x.shape[:-1] + (nb * kb,))
    cand_vals = bs_vals.reshape(x.shape[:-1] + (nb * kb,))
    vals, pos = jax.lax.top_k(cand_vals, k)               # [..., k]
    idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
    if pad:
        # Padded -inf columns can only be selected when the row holds fewer
        # than k finite values; clamp those indices into the real row the
        # same way top_k over the unpadded row would order them (it can't —
        # all real candidates are already ahead — so any in-range index is
        # equivalent; keep monotone order for determinism).
        idx = jnp.minimum(idx, width - 1)
    return vals, idx
