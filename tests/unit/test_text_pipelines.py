"""End-to-end text pipelines on toy models + synthetic NLLB tokenizer."""

import dataclasses
from pathlib import Path
import sys
import warnings

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
from sonar_tpu.generation.sampling import TopPSampler
from sonar_tpu.models.sonar_text import (
    SonarTextEncoder,
    sonar_text_decoder_archs,
    sonar_text_encoder_archs,
)
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

SENTENCES = [
    "hello world",
    "my name is paul",
    "i work as a teacher",
    "the cat sat on the mat",
    "hello",
]


@pytest.fixture(scope="module")
def toy_bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tok")
    tok = build_toy_nllb(tmp)
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


def test_text_to_embedding_order_and_shape(toy_bundle):
    tok, enc, _ = toy_bundle
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    emb = pipe.predict(SENTENCES, source_lang="eng_Latn", batch_size=2)
    assert emb.shape == (5, 32)
    assert np.isfinite(emb).all()


def test_batching_invariance(toy_bundle):
    """Reference test_order_preserving analogue: embeddings must not depend
    on batch_size / batch_max_tokens choices."""
    tok, enc, _ = toy_bundle
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    base = pipe.predict(SENTENCES, source_lang="eng_Latn", batch_size=1)
    for kwargs in (
        dict(batch_size=2),
        dict(batch_size=len(SENTENCES)),
        dict(batch_size=None, batch_max_tokens=8),
        dict(batch_size=None, batch_max_tokens=30),
    ):
        got = pipe.predict(SENTENCES, source_lang="eng_Latn", **kwargs)
        np.testing.assert_allclose(got, base, atol=1e-5, err_msg=str(kwargs))


def test_file_input(toy_bundle, tmp_path):
    tok, enc, _ = toy_bundle
    f = tmp_path / "input.txt"
    f.write_text("\n".join(SENTENCES) + "\n")
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    from_file = pipe.predict(f, source_lang="eng_Latn", batch_size=2)
    from_list = pipe.predict(SENTENCES, source_lang="eng_Latn", batch_size=2)
    np.testing.assert_allclose(from_file, from_list, atol=1e-5)


def test_truncation_warning(toy_bundle):
    tok, enc, _ = toy_bundle
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pipe.predict(["hello world hello world hello"], source_lang="eng_Latn",
                     max_seq_len=4)
        assert any("truncated" in str(x.message) for x in w)


def test_max_seq_len_validation(toy_bundle):
    tok, enc, _ = toy_bundle
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    with pytest.raises(ValueError):
        pipe.predict(SENTENCES, source_lang="eng_Latn", max_seq_len=10_000)
    with pytest.raises(ValueError):
        pipe.predict(SENTENCES, source_lang="eng_Latn", batch_size=None)


def test_embedding_to_text_and_back(toy_bundle):
    tok, enc, dec = toy_bundle
    embed = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    emb = embed.predict(SENTENCES[:2], source_lang="eng_Latn", batch_size=2)
    e2t = EmbeddingToTextModelPipeline(decoder=dec, tokenizer=tok)
    texts = e2t.predict(emb, target_lang="eng_Latn", max_seq_len=8)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)

    sampled = e2t.predict(
        emb, target_lang="eng_Latn", max_seq_len=8, sampler=TopPSampler(p=0.9)
    )
    assert len(sampled) == 2


def test_text_to_text(toy_bundle):
    tok, enc, dec = toy_bundle
    t2t = TextToTextModelPipeline(encoder=enc, decoder=dec, tokenizer=tok)
    out = t2t.predict(
        SENTENCES[:3], source_lang="eng_Latn", target_lang="fra_Latn",
        batch_size=2, max_seq_len=8,
    )
    assert len(out) == 3
    assert all(isinstance(t, str) for t in out)


def test_text_to_embedding_static_batching_matches_dynamic(toy_bundle):
    tok, (encoder, enc_params), _ = toy_bundle
    pipe = TextToEmbeddingModelPipeline(encoder=(encoder, enc_params), tokenizer=tok)
    dyn = pipe.predict(SENTENCES, source_lang="eng_Latn", batch_size=2)
    sta = pipe.predict(
        SENTENCES, source_lang="eng_Latn", batch_size=2, batching="static"
    )
    assert sta.shape == dyn.shape
    np.testing.assert_allclose(sta, dyn, atol=1e-4)

    with pytest.raises(ValueError, match="unknown batching mode"):
        pipe.predict(SENTENCES, source_lang="eng_Latn", batching="nope")


def test_encode_batches_stacked_dispatch(toy_bundle):
    """Same-shape batches are stacked into one scanned dispatch; results must
    match per-batch encode exactly and stay in input order (incl. the
    non-stacked remainder and mixed shapes)."""
    from sonar_tpu.data.collate import SequenceBatch
    from sonar_tpu.inference_pipelines.text import JitTextEncoder

    _, (encoder, enc_params), _ = toy_bundle
    rng = np.random.default_rng(0)

    def make(bsz, slen):
        seqs = rng.integers(4, 30, size=(bsz, slen)).astype(np.int32)
        lens = rng.integers(max(1, slen // 2), slen + 1, size=(bsz,)).astype(
            np.int32
        )
        true = int(bsz - 1)  # one padding row per batch
        lens[true:] = 0
        return SequenceBatch(seqs=seqs, seq_lens=lens, true_batch=true)

    # 5 batches of shape A (stack of 2x2 + remainder 1) and 3 of shape B
    batches = [make(4, 6) for _ in range(5)] + [make(8, 3) for _ in range(3)]
    rng.shuffle(batches)

    jit_enc = JitTextEncoder(encoder, enc_params, dispatch_stack=2)
    stacked = jit_enc.encode_batches(batches)
    single = [jit_enc.encode_batch(b) for b in batches]
    assert len(stacked) == len(batches)
    for got, want, b in zip(stacked, single, batches):
        assert got.shape == (b.true_batch, want.shape[1])
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_static_batching_windowed_drain_restores_order(toy_bundle, monkeypatch):
    """The bounded-memory windowed drain (window < number of batches) must
    produce the same embeddings, in input order, as the dynamic path."""
    import sonar_tpu.inference_pipelines.text as T

    tok, enc, dec = toy_bundle
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    rng = np.random.default_rng(0)
    words = ["hello", "world", "cat", "name", "my"]
    sents = [
        " ".join(rng.choice(words, size=rng.integers(1, 7)))
        for _ in range(60)
    ]
    want = pipe.predict(sents, source_lang="eng_Latn", batch_size=4)

    monkeypatch.setattr(T, "_STATIC_ENCODE_WINDOW", 2)
    got = pipe.predict(
        sents, source_lang="eng_Latn", batch_max_tokens=32, batching="static"
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_encode_batches_iter_matches_list(toy_bundle):
    """The streaming executor (encode_batches_iter) must equal
    encode_batches on mixed shapes, incl. leftover sub-stack singles and a
    tiny rolling-materialization bound."""
    from sonar_tpu.data.collate import SequenceBatch
    from sonar_tpu.inference_pipelines.text import JitTextEncoder

    _, (encoder, enc_params), _ = toy_bundle
    jit_enc = JitTextEncoder(encoder, enc_params, dispatch_stack=2)
    rng = np.random.default_rng(3)
    batches = []

    # Shape pool shared with the other executor tests in this file (each
    # distinct (bsz, slen) costs one encoder compile on a cold cache).
    for shape, count in (((4, 6), 5), ((8, 3), 3), ((2, 6), 1)):
        for _ in range(count):
            seqs = rng.integers(4, 20, size=shape).astype(np.int32)
            lens = np.full((shape[0],), shape[1], np.int32)
            batches.append(
                SequenceBatch(seqs=seqs, seq_lens=lens, true_batch=shape[0])
            )
    want = jit_enc.encode_batches(batches)
    got = jit_enc.encode_batches_iter(iter(batches), max_pending=1)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_encoder_warmup_compiles_serving_shapes(toy_bundle):
    """warmup() precompiles every (rows, bucket) shape (+ stacked variants)
    and does not disturb results."""
    from sonar_tpu.inference_pipelines.text import JitTextEncoder

    _, (encoder, enc_params), _ = toy_bundle
    jit_enc = JitTextEncoder(encoder, enc_params, dispatch_stack=2)
    n = jit_enc.warmup(len_buckets=(8, 16), tokens_per_batch=64)
    assert n == 4  # 2 buckets x (single + stacked)
    import jax.numpy as jnp

    from sonar_tpu.data.collate import SequenceBatch

    seqs = np.full((8, 8), 5, np.int32)
    batch = SequenceBatch(
        seqs=seqs, seq_lens=np.full((8,), 8, np.int32), true_batch=8
    )
    got = jit_enc.encode_batch(batch)
    want = encoder.apply(
        enc_params, jnp.asarray(seqs), jnp.asarray(batch.seq_lens)
    ).sentence_embeddings
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_decoder_warmup(toy_bundle):
    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.decoder_runtime import JitTextDecoder

    _, _, (decoder, dec_params) = toy_bundle
    runtime = JitTextDecoder(decoder, dec_params)
    # Same config the file's predict() tests reach via max_seq_len=8: the
    # B=2 program is then a compile-cache hit, not a fresh ~1s compile.
    cfg = BeamSearchConfig.from_kwargs(decoder.max_target_len, max_seq_len=8)
    assert runtime.warmup(cfg, prefix_len=2, batch_sizes=(2, 4)) == 2
    # warmed program serves a real call at the same (config, prefix, batch)
    mem = np.random.default_rng(0).normal(size=(2, 1, decoder.config.model_dim))
    tokens, scores, lens = runtime.generate_beam(
        mem.astype(np.float32),
        [decoder.config.vocab_info.eos_idx, 5],
        cfg,
    )
    assert tokens.shape[0] == 2 and np.isfinite(scores).all()


def test_encode_batches_iter_randomized_streams(toy_bundle):
    """Property test: random shape streams x max_pending values — the
    streaming executor must equal the list executor exactly."""
    from sonar_tpu.data.collate import SequenceBatch
    from sonar_tpu.inference_pipelines.text import JitTextEncoder

    _, (encoder, enc_params), _ = toy_bundle
    jit_enc = JitTextEncoder(encoder, enc_params, dispatch_stack=3)
    # Same shape pool as the executor tests above (single-batch programs
    # shared; only the stack=3 variants are new compiles).
    shapes = [(4, 6), (8, 3), (2, 6)]
    for trial, max_pending in ((0, 0), (1, 1), (2, 2), (3, 64)):
        rng = np.random.default_rng(trial)
        batches = []
        for _ in range(int(rng.integers(1, 14))):
            bsz, slen = shapes[int(rng.integers(len(shapes)))]
            seqs = rng.integers(4, 20, size=(bsz, slen)).astype(np.int32)
            lens = rng.integers(1, slen + 1, size=(bsz,)).astype(np.int32)
            true = int(rng.integers(1, bsz + 1))
            batches.append(
                SequenceBatch(seqs=seqs, seq_lens=lens, true_batch=true)
            )
        want = jit_enc.encode_batches(batches)
        got = jit_enc.encode_batches_iter(iter(batches), max_pending=max_pending)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-6)


def test_file_input_static_batching(toy_bundle, tmp_path):
    """File input through the static (streaming-executor) path must equal
    the dynamic path, order preserved."""
    tok, enc, _ = toy_bundle
    f = tmp_path / "input.txt"
    f.write_text("\n".join(SENTENCES) + "\n")
    pipe = TextToEmbeddingModelPipeline(encoder=enc, tokenizer=tok)
    want = pipe.predict(SENTENCES, source_lang="eng_Latn", batch_size=2)
    got = pipe.predict(f, source_lang="eng_Latn", batch_size=2,
                       batching="static")
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_translate_stream_matches_sequential(toy_bundle):
    """The pipelined translate path (rolling in-flight window) yields
    exactly what sequential batch_translate calls produce, across window
    sizes and uneven tail chunks."""
    from sonar_tpu.generation.beam_search import BeamSearchConfig
    from sonar_tpu.generation.text_converter import TextTranslator

    tok, enc, dec = toy_bundle
    t2t = TextToTextModelPipeline(encoder=enc, decoder=dec, tokenizer=tok)
    translator = TextTranslator(
        encoder=t2t.model, decoder=t2t.decoder, tokenizer=t2t.tokenizer,
        source_lang="eng_Latn", target_lang="fra_Latn",
        gen_config=BeamSearchConfig.from_kwargs(
            t2t.decoder.max_target_len, max_seq_len=8),
    )
    chunks = [SENTENCES[:2], SENTENCES[2:4], SENTENCES[4:5]]
    want = [translator.batch_translate(c) for c in chunks]
    for window in (1, 2, 4):
        got = list(translator.translate_stream(iter(chunks), window=window))
        assert got == want, window
    assert list(translator.translate_stream(iter([]), window=2)) == []

    # the public pipeline (which routes through the stream) agrees too
    flat = t2t.predict([s for c in chunks for s in c],
                       source_lang="eng_Latn", target_lang="fra_Latn",
                       batch_size=2, max_seq_len=8)
    assert len(flat) == 5
