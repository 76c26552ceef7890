"""SONAR speech encoder: w2v-BERT Conformer -> attention pooler -> 1024-d.

Functional counterpart of ``SonarSpeechEncoderModel``
(``sonar/models/sonar_speech/model.py:21-86``):

- frontend: stack fbank frames (stride 2 -> 160-d), LayerNorm, Linear to
  model_dim (fairseq2 ``Wav2Vec2Frontend`` fbank path, pinned by the
  key-map entries ``post_extract_layer_norm`` / ``model_dim_proj``),
- 24 Conformer blocks with relative-position attention,
- the "workaround" final LayerNorm (redundant pre-LN artifact of the
  fairseq1 w2v-BERT pretraining, relocated by the checkpoint converter —
  ``model.py:63-66``, ``handler.py:102-108``),
- attention pooler: 3/6-layer post-LN Transformer decoder attending from a
  single BOS embedding, then an unbiased output projection.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sonar_tpu.models.common import SonarEncoderOutput
from sonar_tpu.models.sonar_speech.config import SonarSpeechEncoderConfig
from sonar_tpu.nn.conformer import conformer_stack, init_conformer_stack
from sonar_tpu.nn.core import (
    Params,
    init_layer_norm,
    init_linear,
    init_scaled_embedding,
    layer_norm,
    linear,
)
from sonar_tpu.nn.frontend import EmbeddingFrontend
from sonar_tpu.nn.transformer import (
    AttentionSpec,
    decoder_stack,
    init_decoder_layer,
    stack_layers,
)
from sonar_tpu.ops.masks import additive_bias, length_mask


class SonarSpeechEncoder:
    def __init__(self, config: SonarSpeechEncoderConfig,
                 dtype: "jnp.dtype" = jnp.float32):
        self.config = config
        self.dtype = dtype
        self.pooler_frontend = EmbeddingFrontend(
            model_dim=config.model_dim,
            max_seq_len=config.max_seq_len,
            dropout_p=config.dropout_p,
        )

    # -- init ---------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Params:
        cfg = self.config
        r_front, r_enc, r_pool = jax.random.split(rng, 3)
        r_f1, r_f2 = jax.random.split(r_front)
        params: Params = {
            "encoder_frontend": {
                "post_extract_layer_norm": init_layer_norm(cfg.frontend.feature_dim),
                "model_dim_proj": init_linear(
                    r_f1, cfg.frontend.feature_dim, cfg.model_dim
                ),
            },
            "encoder": {"layers": init_conformer_stack(r_enc, cfg.conformer)},
            # The fairseq1 workaround LN (always present for conformer).
            "layer_norm": init_layer_norm(cfg.model_dim),
            "encoder_pooler": self._init_pooler(r_pool),
        }
        return params

    def _init_pooler(self, rng: jax.Array) -> Params:
        cfg = self.config
        r_embed, r_layers, r_proj = jax.random.split(rng, 3)
        spec = AttentionSpec(cfg.model_dim, cfg.num_decoder_attn_heads)
        layers = [
            init_decoder_layer(r, spec, spec, cfg.ffn_inner_dim)
            for r in jax.random.split(r_layers, cfg.num_decoder_layers)
        ]
        pooler: Params = {
            "decoder_frontend": {
                # num_embeddings = w2v2 model_dim (!) — quirk preserved from
                # the reference factory (factory.py:94-100).
                "embed": init_scaled_embedding(
                    r_embed, cfg.model_dim, cfg.model_dim, cfg.pad_idx
                )
            },
            "decoder": {"layers": stack_layers(layers)},
            "projection_out": init_linear(
                r_proj, cfg.model_dim, cfg.model_dim, bias=False
            ),
        }
        if cfg.decoder_norm_order == "pre":
            pooler["decoder"]["layer_norm"] = init_layer_norm(cfg.model_dim)
        return pooler

    # -- forward ------------------------------------------------------------

    def frontend(self, params: Params, fbank: jnp.ndarray,
                 frame_lens: jnp.ndarray) -> tuple:
        """[B, T, 80] fbank -> ([B, T//2, model_dim], out_lens)."""
        cfg = self.config.frontend
        b, t, c = fbank.shape
        t2 = t // cfg.fbank_stride
        x = fbank[:, : t2 * cfg.fbank_stride].reshape(b, t2, c * cfg.fbank_stride)
        x = x.astype(self.dtype)
        x = layer_norm(params["post_extract_layer_norm"], x)
        x = linear(params["model_dim_proj"], x)
        out_lens = frame_lens // cfg.fbank_stride
        return x, out_lens

    def apply(
        self,
        params: Params,
        fbank: jnp.ndarray,
        frame_lens: Optional[jnp.ndarray] = None,
        stack_fn: Optional[Callable] = None,
    ) -> SonarEncoderOutput:
        """fbank: [B, T, num_mel] float; frame_lens: [B] valid frame counts.

        ``stack_fn(stacked_layer_params, x, attn_bias, pad_mask) -> x``
        optionally replaces the default Conformer ``lax.scan`` stack — the
        seam the sequence-parallel executor (`parallel/sequence.py`) plugs
        into.
        """
        cfg = self.config
        if frame_lens is None:
            frame_lens = jnp.full((fbank.shape[0],), fbank.shape[1], jnp.int32)
        x, seq_lens = self.frontend(params["encoder_frontend"], fbank, frame_lens)

        s = x.shape[1]
        mask = length_mask(seq_lens, s)
        bias = additive_bias(mask)[:, None, None, :]
        if stack_fn is not None:
            x = stack_fn(params["encoder"]["layers"], x, bias, mask)
        else:
            x = conformer_stack(
                params["encoder"]["layers"], x, bias, mask, cfg.conformer
            )
        encoded = layer_norm(params["layer_norm"], x)

        pooled = self._attention_pool(params["encoder_pooler"], encoded, seq_lens)
        return SonarEncoderOutput(
            encoded_seqs=encoded, sentence_embeddings=pooled, seq_lens=seq_lens
        )

    def _attention_pool(
        self, pooler: Params, encoded: jnp.ndarray, seq_lens: jnp.ndarray
    ) -> jnp.ndarray:
        cfg = self.config
        b, s, _ = encoded.shape
        memory_bias = additive_bias(length_mask(seq_lens, s))[:, None, None, :]
        bos = jnp.full((b, 1), cfg.bos_idx, jnp.int32)
        x = self.pooler_frontend(pooler["decoder_frontend"], bos, dtype=encoded.dtype)
        x = decoder_stack(
            pooler["decoder"]["layers"],
            x,
            None,
            encoded,
            memory_bias,
            cfg.num_decoder_attn_heads,
            "relu",
            norm_order=cfg.decoder_norm_order,
        )
        if "layer_norm" in pooler["decoder"]:
            x = layer_norm(pooler["decoder"]["layer_norm"], x)
        return linear(pooler["projection_out"], x)[:, 0]
