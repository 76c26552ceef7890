"""SONAR text encoder: NLLB-style Transformer encoder + pooling.

Functional reimplementation of ``SonarTextTransformerEncoderModel``
(reference ``sonar/models/sonar_text/model.py:31-143``) and its factory
(``factory.py:50-226``):

- frontend: scaled embedding + legacy-offset sinusoidal PE
  (``_from_fairseq`` grows max_seq_len by pad_idx+1, ``factory.py:56-59``),
- N pre-LN encoder layers (per-layer PRE hard-coded, ``factory.py:127``);
  a trailing stack LN only when the config is ``normalize_before``,
- model-level final LayerNorm (always present, ``factory.py:117``),
- pooling MEAN/MAX/LAST or ATTENTION via a tiny Transformer decoder over a
  single BOS token (``sonar/nn/encoder_pooler.py:47-89``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sonar_tpu.models.common import SonarEncoderOutput
from sonar_tpu.models.sonar_text.config import SonarTextEncoderConfig
from sonar_tpu.nn.core import (
    Params,
    embedding_lookup,
    init_layer_norm,
    init_linear,
    init_scaled_embedding,
    layer_norm,
    linear,
)
from sonar_tpu.nn.frontend import EmbeddingFrontend
from sonar_tpu.nn.pooling import Pooling, static_pool
from sonar_tpu.nn.transformer import (
    AttentionSpec,
    decoder_stack,
    encoder_stack,
    init_decoder_layer,
    init_encoder_layer,
    stack_layers,
)
from sonar_tpu.ops.masks import additive_bias, length_mask


class SonarTextEncoder:
    """Config-bound functional model: ``init_params`` + pure ``apply``."""

    def __init__(self, config: SonarTextEncoderConfig,
                 dtype: "jnp.dtype" = jnp.float32,
                 remat: bool = False, scan_unroll: int = 1):
        self.config = config
        self.dtype = dtype
        # lax.scan unroll over the layer stack (perf knob; 1 = smallest
        # program, >1 lets XLA overlap weight prefetch across layers).
        self.scan_unroll = scan_unroll
        # Rematerialize encoder layers in the backward pass (fine-tuning
        # memory knob; inference unaffected).
        self.remat = remat
        self.pooling = Pooling(config.pooling.lower())

        max_seq_len = config.max_seq_len
        if config._from_fairseq:
            assert config.vocab_info.pad_idx is not None
            max_seq_len += config.vocab_info.pad_idx + 1
        self.max_seq_len = max_seq_len
        # Longest real token sequence the PE table can serve: the sinusoidal
        # legacy offset (pad_idx + 1) consumes leading table rows. The
        # reference truncates to pos_encoder.max_seq_len (text.py:202-209);
        # we cap at the actually-servable length instead to avoid OOB.
        if config.no_token_positional_embeddings or config.learned_pos:
            self.max_source_len = max_seq_len
        else:
            self.max_source_len = max_seq_len - ((config.vocab_info.pad_idx or 0) + 1)

        self.embedding_dim = config.embedding_dim or config.model_dim
        self.norm_order = "pre" if config.normalize_before else "post"

        self.frontend = EmbeddingFrontend(
            model_dim=config.model_dim,
            max_seq_len=max_seq_len,
            no_scale=config.no_scale_embedding,
            layernorm=config.layernorm_embedding,
            learned_pos=config.learned_pos,
            legacy_pad_idx=config.vocab_info.pad_idx,
            no_pos=config.no_token_positional_embeddings,
            dropout_p=config.emb_dropout_p,
        )
        if self.pooling == Pooling.ATTENTION:
            self.pooler_frontend = EmbeddingFrontend(
                model_dim=self.embedding_dim,
                max_seq_len=1,
                dropout_p=config.emb_dropout_p,
            )

    # -- init ---------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Params:
        cfg = self.config
        r_embed, r_layers, r_pooler, r_pos = jax.random.split(rng, 4)
        params: Params = {
            "encoder_frontend": {
                "embed": init_scaled_embedding(
                    r_embed, cfg.vocab_info.size, cfg.model_dim, cfg.vocab_info.pad_idx
                )
            },
            "encoder": {"layers": self._init_encoder_layers(r_layers)},
            "layer_norm": init_layer_norm(cfg.model_dim),
        }
        if cfg.learned_pos:
            params["encoder_frontend"]["pos"] = self.frontend.pos_encoder.init(r_pos)
        if cfg.layernorm_embedding:
            params["encoder_frontend"]["layer_norm"] = init_layer_norm(cfg.model_dim)
        if cfg.normalize_before:
            params["encoder"]["layer_norm"] = init_layer_norm(cfg.model_dim)
        if self.pooling == Pooling.ATTENTION:
            params["pooler"] = self._init_pooler(r_pooler)
        return params

    def _init_encoder_layers(self, rng: jax.Array) -> Params:
        cfg = self.config
        spec = AttentionSpec(cfg.model_dim, cfg.num_encoder_attn_heads)
        layers = [
            init_encoder_layer(r, spec, cfg.ffn_inner_dim)
            for r in jax.random.split(rng, cfg.num_encoder_layers)
        ]
        return stack_layers(layers)

    def _init_pooler(self, rng: jax.Array) -> Params:
        cfg = self.config
        emb_dim = self.embedding_dim
        r_embed, r_layers, r_proj = jax.random.split(rng, 3)
        self_spec = AttentionSpec(emb_dim, cfg.num_decoder_attn_heads)
        cross_spec = AttentionSpec(
            emb_dim, cfg.num_decoder_attn_heads, kv_dim=cfg.model_dim
        )
        layers = [
            init_decoder_layer(
                r,
                self_spec,
                cross_spec,
                cfg.decoder_ffn_inner_dim or cfg.ffn_inner_dim,
            )
            for r in jax.random.split(rng, cfg.num_decoder_layers)
        ]
        pooler: Params = {
            "decoder_frontend": {"embed": init_scaled_embedding(r_embed, 1, emb_dim, 0)},
            "decoder": {"layers": stack_layers(layers)},
            "projection_out": init_linear(r_proj, emb_dim, emb_dim),
        }
        if cfg.normalize_before:
            pooler["decoder"]["layer_norm"] = init_layer_norm(emb_dim)
        return pooler

    # -- forward ------------------------------------------------------------

    def apply(
        self,
        params: Params,
        seqs: jnp.ndarray,
        seq_lens: Optional[jnp.ndarray] = None,
        dropout_rng: Optional[jax.Array] = None,
        stack_fn: Optional[Callable] = None,
    ) -> SonarEncoderOutput:
        """seqs: [B, S] int32 token ids; seq_lens: [B] or None.

        ``stack_fn(stacked_layer_params, x, bias) -> x`` optionally replaces
        the default ``lax.scan`` layer stack — the seam the pipeline-parallel
        executor (`parallel/pipeline.py`) plugs into.
        """
        cfg = self.config
        dtype = self.dtype
        bias = None
        if seq_lens is not None:
            mask = length_mask(seq_lens, seqs.shape[1])
            bias = additive_bias(mask)[:, None, None, :]

        rngs = (
            jax.random.split(dropout_rng, 2) if dropout_rng is not None else (None, None)
        )
        x = self.frontend(
            params["encoder_frontend"], seqs, dtype=dtype, dropout_rng=rngs[0]
        )
        if stack_fn is not None:
            x = stack_fn(params["encoder"]["layers"], x, bias)
        else:
            x = encoder_stack(
                params["encoder"]["layers"],
                x,
                bias,
                cfg.num_encoder_attn_heads,
                cfg.activation_fn,
                norm_order="pre",
                remat=self.remat,
                unroll=self.scan_unroll,
            )
        if "layer_norm" in params["encoder"]:
            x = layer_norm(params["encoder"]["layer_norm"], x)
        encoded = layer_norm(params["layer_norm"], x)

        if self.pooling == Pooling.ATTENTION:
            embeddings = self._attention_pool(params["pooler"], encoded, seq_lens)
        else:
            embeddings = static_pool(encoded, seq_lens, self.pooling)
        return SonarEncoderOutput(
            encoded_seqs=encoded, sentence_embeddings=embeddings, seq_lens=seq_lens
        )

    def apply_packed(
        self,
        params: Params,
        tokens: jnp.ndarray,        # [B, L]
        segment_ids: jnp.ndarray,   # [B, L]; 0 = pad, 1..K = segments
        positions: jnp.ndarray,     # [B, L]; restart per segment
        max_segments: int,
    ) -> jnp.ndarray:
        """Packed forward (see ``sonar_tpu.data.packing``): several sentences
        per row with block-diagonal attention, per-segment positions and
        per-segment mean pooling. -> [B, max_segments, D] (row k holds
        segment k+1; unfilled slots are zero). Mean pooling only (the only
        pooling the released SONAR text encoders use)."""
        cfg = self.config
        dtype = self.dtype
        if self.pooling != Pooling.MEAN:
            raise NotImplementedError("packed encoding supports MEAN pooling")
        if self.config.learned_pos or self.config.no_token_positional_embeddings:
            raise NotImplementedError("packed encoding needs sinusoidal PE")

        # Frontend with per-token positions.
        x = embedding_lookup(params["encoder_frontend"]["embed"], tokens, dtype=dtype)
        if self.frontend.scale != 1.0:
            x = x * jnp.asarray(self.frontend.scale, dtype)
        table = self.frontend.pos_encoder._table.astype(dtype)
        x = x + jnp.take(table, positions + self.frontend.pos_encoder.offset, axis=0)

        # Block-diagonal attention within segments.
        same = segment_ids[:, :, None] == segment_ids[:, None, :]
        valid = (segment_ids > 0)[:, :, None] & (segment_ids > 0)[:, None, :]
        bias = additive_bias(same & valid)[:, None, :, :]

        x = encoder_stack(
            params["encoder"]["layers"], x, bias,
            cfg.num_encoder_attn_heads, cfg.activation_fn, norm_order="pre",
        )
        if "layer_norm" in params["encoder"]:
            x = layer_norm(params["encoder"]["layer_norm"], x)
        encoded = layer_norm(params["layer_norm"], x)

        # Per-segment masked mean with the reference 1e-7 epsilon.
        onehot = jax.nn.one_hot(segment_ids - 1, max_segments, dtype=jnp.float32)
        onehot = onehot * (segment_ids > 0)[..., None]
        sums = jnp.einsum(
            "bld,blk->bkd", encoded.astype(jnp.float32), onehot,
            preferred_element_type=jnp.float32,
        )
        counts = onehot.sum(axis=1)                              # [B, K]
        return (sums / (counts + 1e-7)[..., None]).astype(jnp.float32)

    def _attention_pool(
        self,
        pooler: Params,
        encoded: jnp.ndarray,
        seq_lens: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """Tiny Transformer decoder attending from one BOS token, then proj.

        Reference ``AttentionEncoderOutputPooler.__call__``
        (``sonar/nn/encoder_pooler.py:69-89``).
        """
        cfg = self.config
        b, s, _ = encoded.shape
        memory_bias = None
        if seq_lens is not None:
            memory_bias = additive_bias(length_mask(seq_lens, s))[:, None, None, :]

        bos = jnp.zeros((b, 1), jnp.int32)
        x = self.pooler_frontend(pooler["decoder_frontend"], bos, dtype=encoded.dtype)
        x = decoder_stack(
            pooler["decoder"]["layers"],
            x,
            None,
            encoded,
            memory_bias,
            cfg.num_decoder_attn_heads,
            cfg.activation_fn,
            norm_order=self.norm_order,
        )
        if "layer_norm" in pooler["decoder"]:
            x = layer_norm(pooler["decoder"]["layer_norm"], x)
        return linear(pooler["projection_out"], x)[:, 0]
