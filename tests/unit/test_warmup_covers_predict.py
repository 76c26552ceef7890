"""The cold-start contract: after ``warmup()``, ``predict()`` compiles NO
runtime program (encoder apply / stacked apply / beam fn).

This is the end-to-end form of the precision-policy pin
(``test_precision_policy.py``): warmup and predict must not only trace
identical modules, the predict call on a warmed pipeline must never reach
XLA compilation for a model program at all (same-instance jit caches).
Guards both precision-context drift AND shape-enumeration drift between
the warmup paths and the serve paths.
"""

import contextlib
import dataclasses
from pathlib import Path
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from helpers import build_toy_nllb

from sonar_tpu import (
    EmbeddingToTextModelPipeline,
    TextToEmbeddingModelPipeline,
    TextToTextModelPipeline,
)
from sonar_tpu.models.sonar_text import (
    SonarTextEncoder,
    sonar_text_decoder_archs,
    sonar_text_encoder_archs,
)
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

# Runtime program names (jit'd function names in the runtimes); eager host
# ops (convert_element_type, concatenate, ...) are allowed to compile.
MODEL_PROGRAMS = {"jit__apply", "jit__stacked", "jit_fn"}


@contextlib.contextmanager
def forbid_model_compiles():
    import jax._src.compiler as C

    real = C.compile_or_get_cached
    seen = []

    def wrap(backend, computation, *a, **k):
        try:
            name = str(computation.operation.attributes["sym_name"]).strip('"')
        except Exception:
            name = "?"
        if name.split("$")[0] in MODEL_PROGRAMS:
            seen.append(name)
        return real(backend, computation, *a, **k)

    C.compile_or_get_cached = wrap
    try:
        yield seen
    finally:
        C.compile_or_get_cached = real


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    tok = build_toy_nllb(tmp_path_factory.mktemp("warmtok"))
    enc_cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_encoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    dec_cfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    encoder = SonarTextEncoder(enc_cfg)
    enc_params = encoder.init_params(jax.random.PRNGKey(0))
    decoder = ConditionalTransformerDecoder(dec_cfg)
    dec_params = decoder.init_params(jax.random.PRNGKey(1))
    return tok, (encoder, enc_params), (decoder, dec_params)


def test_text_embed_static_predict_fully_warmed(bundle):
    tok, enc, _ = bundle
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    # Tiny budget, capped length: warmup enumerates buckets with the SAME
    # function predict's static path uses (_static_len_buckets_for), so
    # the coverage coupling under test is real — while the toy's 512
    # max_seq_len doesn't drag all 10 suite buckets into one test's cold
    # cost (the production 8192-token default compiles [1024, 8]-class
    # programs: ~23 s cold for this test alone). 32 matches
    # test_text_pipelines' windowed-drain budget for compile-cache hits.
    from sonar_tpu.inference_pipelines.text import _static_len_buckets_for

    pipe.model.warmup(len_buckets=_static_len_buckets_for(16),
                      tokens_per_batch=32)
    with forbid_model_compiles() as seen:
        out = pipe.predict(
            ["hello world", "my name is paul", "hello"],
            source_lang="eng_Latn", batching="static", batch_max_tokens=32,
            max_seq_len=16,
        )
    assert out.shape[0] == 3
    assert not seen, f"predict compiled after warmup: {seen}"


def test_embedding_to_text_predict_fully_warmed(bundle):
    tok, _, dec = bundle
    pipe = EmbeddingToTextModelPipeline(decoder=dec, tokenizer=tok)
    pipe.warmup(batch_size=2, target_lang="eng_Latn", max_seq_len=8)
    emb = np.random.default_rng(0).normal(
        size=(2, pipe.decoder.model.config.model_dim)
    ).astype(np.float32)
    with forbid_model_compiles() as seen:
        texts = pipe.predict(emb, target_lang="eng_Latn", batch_size=2,
                             max_seq_len=8)
    assert len(texts) == 2
    assert not seen, f"predict compiled after warmup: {seen}"


def test_speech_embed_predict_fully_warmed():
    from sonar_tpu.inference_pipelines.speech import (
        SpeechToEmbeddingModelPipeline,
    )
    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )

    model = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = SpeechToEmbeddingModelPipeline(encoder=(model, params))
    pipe.warmup(batch_size=2, max_wave_len=16000)
    rng = np.random.default_rng(0)
    waves = [(rng.normal(size=12000) * 0.1).astype(np.float32),
             (rng.normal(size=15000) * 0.1).astype(np.float32)]
    with forbid_model_compiles() as seen:
        out = pipe.predict(waves, batch_size=2)
    assert out.shape == (2, model.config.model_dim)
    assert not seen, f"predict compiled after warmup: {seen}"


def test_text_to_text_predict_fully_warmed(bundle):
    tok, enc, dec = bundle
    pipe = TextToTextModelPipeline(encoder=enc, decoder=dec, tokenizer=tok)
    pipe.warmup(batch_size=2, target_lang="fra_Latn", max_seq_len=8)
    with forbid_model_compiles() as seen:
        out = pipe.predict(
            ["hello world", "my name is paul"],
            source_lang="eng_Latn", target_lang="fra_Latn",
            batch_size=2, max_seq_len=8,
        )
    assert len(out) == 2
    assert not seen, f"predict compiled after warmup: {seen}"
