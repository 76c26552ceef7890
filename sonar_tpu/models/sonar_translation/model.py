"""Encoder–decoder composition (the 1024-d bottleneck glue).

Counterpart of ``SonarEncoderDecoderModel`` / ``DummyEncoderModel``
(reference ``sonar/models/sonar_translation/model.py:18-95``): ``encode()``
runs any SONAR encoder and hands the decoder a *length-1 memory* holding the
pooled sentence embedding — the core SONAR trick — while ``decode`` /
``project`` delegate to the conditional decoder.

In SONAR-TPU the composition works over runtime bundles (JitTextEncoder /
JitSpeechEncoder + JitTextDecoder) so any modality pairs with the shared
text decoder, exactly like the reference's speech->text stack
(``speech.py:363-376``).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np


class DummyEncoderModel:
    """Pass-through encoder: inputs are already sentence embeddings
    (reference ``sonar_translation/model.py:81-95``)."""

    def encode(self, embeddings: np.ndarray) -> np.ndarray:
        return np.asarray(embeddings, np.float32)


class SonarEncoderDecoderModel:
    """Pairs an encoder bundle with a decoder runtime.

    encoder: object with ``encode_batch(SequenceBatch)`` (text) or
    ``encode_waveforms(list)`` (speech) or ``DummyEncoderModel``;
    decoder: ``JitTextDecoder``.
    """

    def __init__(self, encoder: Any, decoder: Any):
        self.encoder = encoder
        self.decoder = decoder

    def encode_to_memory(self, encoder_inputs: Any) -> np.ndarray:
        """-> [B, 1, D] length-1 decoder memory."""
        if isinstance(self.encoder, DummyEncoderModel):
            emb = self.encoder.encode(encoder_inputs)
        elif hasattr(self.encoder, "encode_waveforms"):
            emb = self.encoder.encode_waveforms(encoder_inputs)
        else:
            emb = self.encoder.encode_batch(encoder_inputs)
        return np.asarray(emb, np.float32)[:, None, :]

    def generate(
        self,
        encoder_inputs: Any,
        prefix_ids: Sequence[int],
        gen_config: Any,
        sampler: Any = None,
    ) -> Any:
        memory = self.encode_to_memory(encoder_inputs)
        if sampler is not None:
            return self.decoder.generate_sample(
                memory,
                prefix_ids,
                sampler,
                max_gen_len=gen_config.max_gen_len,
                min_gen_len=gen_config.min_gen_len,
            )
        return self.decoder.generate_beam(memory, prefix_ids, gen_config)


def create_sonar_text_encoder_decoder_model(
    encoder: Any, decoder: Any
) -> SonarEncoderDecoderModel:
    """Reference ``sonar_translation/factory.py:24-48`` equivalent."""
    return SonarEncoderDecoderModel(encoder, decoder)


def create_sonar_speech_to_text_model(
    speech_encoder: Any, text_decoder: Any
) -> SonarEncoderDecoderModel:
    """Reference ``sonar_translation/factory.py:51-73`` equivalent."""
    return SonarEncoderDecoderModel(speech_encoder, text_decoder)
