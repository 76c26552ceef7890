"""Transformer embedding frontend (fairseq2 ``TransformerEmbeddingFrontend``).

Pipeline: scaled token embedding (x sqrt(d) unless ``no_scale``) -> positional
encoding -> optional LayerNorm -> dropout. Reference construction:
``sonar/models/sonar_text/factory.py:94-100``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sonar_tpu.nn.core import Params, dropout, embedding_lookup, layer_norm
from sonar_tpu.nn.position import LearnedPositionEncoder, SinusoidalPositionEncoder


class EmbeddingFrontend:
    """Static (non-parametric) parts of the frontend live on this object;
    parameters (embed table, optional LN / learned PE) live in the pytree:

    params = {"embed": {"weight": [V, D]}, "layer_norm": {...}?, "pos": {...}?}
    """

    def __init__(
        self,
        model_dim: int,
        max_seq_len: int,
        no_scale: bool = False,
        layernorm: bool = False,
        learned_pos: bool = False,
        legacy_pad_idx: Optional[int] = None,
        no_pos: bool = False,
        dropout_p: float = 0.1,
    ):
        self.model_dim = model_dim
        self.max_seq_len = max_seq_len
        self.scale = 1.0 if no_scale else float(model_dim) ** 0.5
        self.layernorm = layernorm
        self.dropout_p = dropout_p
        self.no_pos = no_pos
        self.learned_pos = learned_pos
        if no_pos:
            self.pos_encoder = None
        elif learned_pos:
            self.pos_encoder = LearnedPositionEncoder(model_dim, max_seq_len)
        else:
            self.pos_encoder = SinusoidalPositionEncoder(
                model_dim, max_seq_len, legacy_pad_idx=legacy_pad_idx
            )

    def __call__(
        self,
        params: Params,
        seqs: jnp.ndarray,
        step: int | jnp.ndarray = 0,
        dtype=jnp.float32,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """seqs: [B, S] int token ids -> [B, S, D] embeddings."""
        x = embedding_lookup(params["embed"], seqs, dtype=dtype)
        if self.scale != 1.0:
            x = x * jnp.asarray(self.scale, dtype)
        if self.pos_encoder is not None:
            if self.learned_pos:
                x = self.pos_encoder(params["pos"], x, step=step)
            else:
                x = self.pos_encoder(x, step=step)
        if self.layernorm:
            x = layer_norm(params["layer_norm"], x)
        return dropout(x, self.dropout_p, dropout_rng)
