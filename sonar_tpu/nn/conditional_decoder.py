"""Embedding-conditioned Transformer decoder (SONAR text decoder).

Functional counterpart of ``ConditionalTransformerDecoderModel``
(reference ``sonar/nn/conditional_decoder_model.py:26-94``) built per
``SonarTextDecoderFactory`` (``sonar/models/sonar_text/factory.py:229-315``):

- ``encode()`` is the identity: the "encoder output" is a length-1 sequence
  holding one sentence embedding (the 1024-d bottleneck),
- decoder layers are pre-LN (hard-coded, ``factory.py:273,300``) with a final
  stack LayerNorm,
- the output projection is *tied* to the input embedding
  (``factory.py:303-315``): logits = h @ E^T.

Both a full-sequence path (teacher-forced scoring/training) and an
incremental path (one position per call against a static ``DecoderCache``,
for the ``lax.while_loop`` generators) are provided.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sonar_tpu.models.sonar_text.config import SonarTextDecoderConfig
from sonar_tpu.nn.core import Params, init_layer_norm, init_scaled_embedding, layer_norm
from sonar_tpu.nn.frontend import EmbeddingFrontend
from sonar_tpu.nn.transformer import (
    AttentionSpec,
    DecoderCache,
    decoder_stack,
    decoder_step,
    init_decoder_cache,
    init_decoder_layer,
    stack_layers,
)
from sonar_tpu.ops.masks import additive_bias, causal_mask, combine_masks, length_mask


class ConditionalTransformerDecoder:
    def __init__(self, config: SonarTextDecoderConfig, dtype: "jnp.dtype" = jnp.float32,
                 remat: bool = False):
        self.config = config
        self.dtype = dtype
        self.remat = remat
        self.max_seq_len = config.max_seq_len
        self.frontend = EmbeddingFrontend(
            model_dim=config.model_dim,
            max_seq_len=config.max_seq_len,
            no_scale=config.no_scale_embedding,
            layernorm=config.layernorm_embedding,
            learned_pos=config.learned_pos,
            legacy_pad_idx=config.vocab_info.pad_idx,
            no_pos=config.no_token_positional_embeddings,
            dropout_p=config.emb_dropout_p,
        )
        # Usable generation length given the legacy PE offset.
        pad_off = (config.vocab_info.pad_idx or 0) + 1
        self.max_target_len = config.max_seq_len - (
            0 if config.no_token_positional_embeddings or config.learned_pos else pad_off
        )

    # -- init ---------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Params:
        cfg = self.config
        r_embed, r_layers, r_pos = jax.random.split(rng, 3)
        self_spec = AttentionSpec(cfg.model_dim, cfg.num_encoder_attn_heads)
        cross_spec = AttentionSpec(
            cfg.model_dim, cfg.num_encoder_attn_heads, kv_dim=cfg.input_dim
        )
        layers = [
            init_decoder_layer(r, self_spec, cross_spec, cfg.ffn_inner_dim)
            for r in jax.random.split(r_layers, cfg.num_decoder_layers)
        ]
        params: Params = {
            "decoder_frontend": {
                "embed": init_scaled_embedding(
                    r_embed, cfg.vocab_info.size, cfg.model_dim, cfg.vocab_info.pad_idx
                )
            },
            "decoder": {
                "layers": stack_layers(layers),
                "layer_norm": init_layer_norm(cfg.model_dim),
            },
            # final_proj is tied: logits use decoder_frontend.embed.weight.
        }
        if cfg.learned_pos:
            params["decoder_frontend"]["pos"] = self.frontend.pos_encoder.init(r_pos)
        if cfg.layernorm_embedding:
            params["decoder_frontend"]["layer_norm"] = init_layer_norm(cfg.model_dim)
        return params

    # -- full-sequence ------------------------------------------------------

    def decode(
        self,
        params: Params,
        seqs: jnp.ndarray,
        seq_lens: Optional[jnp.ndarray],
        memory: jnp.ndarray,
        memory_lens: Optional[jnp.ndarray] = None,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Teacher-forced decode: [B, S] ids + [B, S_mem, D_in] memory -> [B, S, D]."""
        cfg = self.config
        s = seqs.shape[1]
        causal = causal_mask(s, s)[None, None, :, :]
        pad = None
        if seq_lens is not None:
            pad = length_mask(seq_lens, s)[:, None, None, :]
        self_bias = additive_bias(combine_masks(causal, pad))
        memory_bias = None
        if memory_lens is not None:
            memory_bias = additive_bias(
                length_mask(memory_lens, memory.shape[1])
            )[:, None, None, :]

        x = self.frontend(
            params["decoder_frontend"], seqs, dtype=self.dtype, dropout_rng=dropout_rng
        )
        x = decoder_stack(
            params["decoder"]["layers"],
            x,
            self_bias,
            memory.astype(self.dtype),
            memory_bias,
            cfg.num_encoder_attn_heads,
            cfg.activation_fn,
            norm_order="pre",
            remat=self.remat,
        )
        return layer_norm(params["decoder"]["layer_norm"], x)

    def project(self, params: Params, decoder_out: jnp.ndarray) -> jnp.ndarray:
        """Tied projection: logits = h @ E^T (fp32 accumulation)."""
        embed = params["decoder_frontend"]["embed"]["weight"]
        return jnp.einsum(
            "bsd,vd->bsv",
            decoder_out,
            embed.astype(decoder_out.dtype),
            preferred_element_type=jnp.float32,
        )

    def forward(
        self,
        params: Params,
        seqs: jnp.ndarray,
        seq_lens: Optional[jnp.ndarray],
        memory: jnp.ndarray,
        memory_lens: Optional[jnp.ndarray] = None,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """decode + project -> [B, S, V] fp32 logits."""
        h = self.decode(params, seqs, seq_lens, memory, memory_lens, dropout_rng)
        return self.project(params, h)

    # -- incremental --------------------------------------------------------

    def init_cache(
        self,
        params: Params,
        memory: jnp.ndarray,
        max_len: int,
        beam_size: Optional[int] = None,
    ) -> DecoderCache:
        cfg = self.config
        return init_decoder_cache(
            params["decoder"]["layers"],
            memory.astype(self.dtype),
            cfg.num_encoder_attn_heads,
            max_len,
            memory.shape[0],
            cfg.model_dim,
            self.dtype,
            beam_size=beam_size,
        )

    def step(
        self,
        params: Params,
        tokens: jnp.ndarray,
        cache: DecoderCache,
        memory_bias: Optional[jnp.ndarray] = None,
        ancestry: Optional[jnp.ndarray] = None,
        beam_size: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, DecoderCache]:
        """One decode step: tokens [B] int32 at position cache.index -> ([B, V], cache).

        ancestry/beam_size: beam-decode mode — self-attention reads the
        un-reordered KV cache through the [B, S_max] ancestry table (see
        ``nn.transformer.decoder_step``).
        """
        cfg = self.config
        x = self.frontend(
            params["decoder_frontend"],
            tokens[:, None],
            step=cache.index,
            dtype=self.dtype,
        )
        x, cache = decoder_step(
            params["decoder"]["layers"],
            x,
            cache,
            memory_bias,
            cfg.num_encoder_attn_heads,
            cfg.activation_fn,
            ancestry=ancestry,
            beam_size=beam_size,
        )
        x = layer_norm(params["decoder"]["layer_norm"], x)
        logits = self.project(params, x)[:, 0]
        return logits, cache
