"""Exact top-k over very wide trailing axes, via block-max gathering.

``lax.top_k`` over an NLLB-scale vocabulary (256k columns) sorts the whole
row; at beam-search k (~2*beam) that is almost all wasted work. The standard
TPU remedy is ``lax.approx_max_k``, but its recall is not bit-guaranteed, so
parity-first paths can't use it. This module keeps exactness and removes
almost all of the sort width instead:

1. reduce the row to per-block maxima (one cheap HBM pass),
2. pick the top-k BLOCKS by ``(max desc, block index asc)`` — a tiny sort,
3. gather just those k blocks and run one ``lax.top_k`` over ``k * bs``
   columns instead of the full row.

Exactness proof (including ``lax.top_k``'s lowest-index tie ordering): let
element ``e`` (value v, index i) lie in block ``b`` and suppose ``b`` is not
among the k blocks selected by key ``(max desc, index asc)``. Then k blocks
beat ``b``'s key; each such block's maximum either has value > v (beats e),
or value == b's max == v in an earlier block, hence a lower index (beats e).
So at least k elements beat ``e`` and it cannot be in the global top-k.
Gathering the selected blocks in ascending block-index order makes the
concatenated candidate row globally index-ordered, so the final
``lax.top_k`` reproduces the full-row tie order bit-for-bit.

An earlier revision used per-block top-k over ALL blocks plus a merge;
gathering only k blocks removes ~nb/k of that sort work (chip A/B in
scripts/bench_exact_topk.py).

Used by the exact (parity-default) candidate selection in
``generation/beam_search.py`` and the prefilters in
``generation/sampling.py``; the reference's generator delegates to plain
``torch.topk`` (fairseq2 beam search, used via
``/root/reference/sonar/inference_pipelines/text.py:109``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_FILL = -jnp.inf


def exact_top_k_wide(
    x: jnp.ndarray, k: int, block_size: int = 512
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact ``lax.top_k(x, k)`` over the last axis, block-max gathered.

    Bit-identical to ``jax.lax.top_k`` (values, indices, and lowest-index
    tie ordering) for finite float input; rows containing -inf get the same
    values but may order tied -inf indices differently. Rows narrower than
    two blocks (or with fewer than k blocks) fall through to plain
    ``top_k`` — the split only pays off when the merge width (k * bs) is
    much smaller than the row.
    """
    width = x.shape[-1]
    if k > width:
        raise ValueError(f"k={k} > trailing width {width}")
    nb = -(-width // block_size)
    if width <= 2 * block_size or nb < k:
        return jax.lax.top_k(x, k)

    pad = nb * block_size - width
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=_NEG_FILL)
    blocked = x.reshape(x.shape[:-1] + (nb, block_size))
    bmax = blocked.max(axis=-1)                           # [..., nb]
    # Top-k blocks by (max desc, block index asc) == lax.top_k tie order.
    _, bidx = jax.lax.top_k(bmax, k)                      # [..., k]
    # Ascending block order keeps the gathered row globally index-ordered,
    # which is what makes the final top_k's tie order match the full row's.
    bidx = jnp.sort(bidx, axis=-1)
    cand = jnp.take_along_axis(
        blocked, bidx[..., None].astype(jnp.int32), axis=-2
    )                                                     # [..., k, bs]
    cols = (
        bidx[..., None].astype(jnp.int32) * block_size
        + jnp.arange(block_size, dtype=jnp.int32)
    )                                                     # [..., k, bs]
    flat_v = cand.reshape(cand.shape[:-2] + (k * block_size,))
    flat_i = cols.reshape(cols.shape[:-2] + (k * block_size,))
    vals, pos = jax.lax.top_k(flat_v, k)                  # [..., k]
    idx = jnp.take_along_axis(flat_i, pos, axis=-1)
    if pad:
        # Padded -inf columns can only be selected when the row holds fewer
        # than k finite values; clamp those indices into the real row the
        # same way top_k over the unpadded row would order them (it can't —
        # all real candidates are already ahead — so any in-range index is
        # equivalent; keep monotone order for determinism).
        idx = jnp.minimum(idx, width - 1)
    return vals, idx
