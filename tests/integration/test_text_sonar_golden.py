"""Golden-value parity tests against the published SONAR text checkpoints.

Mirrors the reference integration suite (``tests/integration_tests/
test_text_sonar.py``): the golden numbers below were produced by the
original fairseq implementation and are the cross-framework parity oracle
(BASELINE.md). These tests need the real checkpoints; they auto-skip unless
the download cache is pre-seeded (zero-egress environments).
"""

import numpy as np
import pytest

from sonar_tpu.assets.store import cache_dir, cache_filename, default_store


def _cached(name: str) -> bool:
    card = default_store().model_card(name)
    return (cache_dir() / cache_filename(card.checkpoint)).exists()


def _tokenizer_cached() -> bool:
    card = default_store().tokenizer_card("text_sonar_basic_encoder")
    return (cache_dir() / cache_filename(card.model)).exists()


needs_encoder = pytest.mark.skipif(
    not (_cached("text_sonar_basic_encoder") and _tokenizer_cached()),
    reason="text_sonar_basic_encoder checkpoint/tokenizer not in cache",
)
needs_decoder = pytest.mark.skipif(
    not (_cached("text_sonar_basic_decoder") and _tokenizer_cached()),
    reason="text_sonar_basic_decoder checkpoint not in cache",
)

ENG = ["My name is SONAR.", "I can embed the sentences into vector space."]
FRA = ["Mon nom est SONAR.", "Je peux plonger les phrases dans l'espace vectoriel."]

# Golden 2x2 normalized-embedding cosine matrix (reference
# test_text_sonar.py:52-53, rtol=atol=1e-4).
GOLDEN_COSINE = np.asarray([[0.9367, 0.3658], [0.3787, 0.8596]])


def _cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    return an @ bn.T


@needs_encoder
def test_golden_cross_lingual_cosine():
    from sonar_tpu import TextToEmbeddingModelPipeline

    pipe = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder", tokenizer="text_sonar_basic_encoder"
    )
    emb_en = pipe.predict(ENG, source_lang="eng_Latn")
    emb_fr = pipe.predict(FRA, source_lang="fra_Latn")
    got = _cosine_matrix(emb_en, emb_fr)
    # fp32 default pipeline: the reference's exact tolerance
    # (test_text_sonar.py:53). A bf16/TPU run gets its own looser check.
    np.testing.assert_allclose(got, GOLDEN_COSINE, rtol=1e-4, atol=1e-4)


@needs_encoder
def test_golden_cross_lingual_cosine_bf16():
    """Same golden matrix through the bf16 serving path: explicitly looser
    tolerance for the reduced mantissa (labeled separately so the fp32
    assertion above stays at the reference's 1e-4)."""
    import jax.numpy as jnp

    from sonar_tpu import TextToEmbeddingModelPipeline

    pipe = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder",
        tokenizer="text_sonar_basic_encoder",
        dtype=jnp.bfloat16,
    )
    emb_en = pipe.predict(ENG, source_lang="eng_Latn")
    emb_fr = pipe.predict(FRA, source_lang="fra_Latn")
    got = _cosine_matrix(emb_en, emb_fr)
    np.testing.assert_allclose(got, GOLDEN_COSINE, rtol=1e-2, atol=1e-2)


@needs_encoder
def test_batching_invariance_real_model():
    from sonar_tpu import TextToEmbeddingModelPipeline

    pipe = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder", tokenizer="text_sonar_basic_encoder"
    )
    base = pipe.predict(ENG + FRA, source_lang="eng_Latn", batch_size=1)
    for kwargs in (dict(batch_size=2), dict(batch_size=None, batch_max_tokens=30)):
        got = pipe.predict(ENG + FRA, source_lang="eng_Latn", **kwargs)
        np.testing.assert_allclose(got, base, atol=1e-4)


@needs_decoder
@needs_encoder
def test_golden_translations():
    """Exact-string eng->fra parity (reference test_text_sonar.py:107-118)."""
    from sonar_tpu import TextToTextModelPipeline

    pipe = TextToTextModelPipeline(
        encoder="text_sonar_basic_encoder",
        decoder="text_sonar_basic_decoder",
        tokenizer="text_sonar_basic_encoder",
    )
    out = pipe.predict(
        ["Hello, my name is Paul", "I work as a teacher."],
        source_lang="eng_Latn",
        target_lang="fra_Latn",
    )
    assert out == ["Bonjour, mon nom est Paul", "Je travaille comme professeur."]


@needs_decoder
@needs_encoder
def test_embedding_roundtrip():
    from sonar_tpu import (
        EmbeddingToTextModelPipeline,
        TextToEmbeddingModelPipeline,
    )

    embed = TextToEmbeddingModelPipeline(
        encoder="text_sonar_basic_encoder", tokenizer="text_sonar_basic_encoder"
    )
    decode = EmbeddingToTextModelPipeline(
        decoder="text_sonar_basic_decoder", tokenizer="text_sonar_basic_encoder"
    )
    emb = embed.predict(ENG, source_lang="eng_Latn")
    out = decode.predict(emb, target_lang="eng_Latn")
    assert out == ENG
