"""Speech stack: conformer invariants, encoder forward, pipelines, converter."""

from pathlib import Path
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from sonar_tpu.data.audio import AudioDecoder, decode_wav_bytes, write_wav
from sonar_tpu.models.sonar_speech.config import sonar_speech_encoder_archs
from sonar_tpu.models.sonar_speech.model import SonarSpeechEncoder
from sonar_tpu.nn.conformer import (
    ConformerConfig,
    conformer_stack,
    init_conformer_stack,
    rel_pos_attention,
    init_rel_pos_attention,
)
from sonar_tpu.ops.fbank import FbankConfig
from sonar_tpu.ops.masks import additive_bias, length_mask


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wave = (rng.normal(size=3200) * 0.1).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, wave, 16000)
    out = decode_wav_bytes(p.read_bytes())
    assert out.sample_rate == 16000.0
    assert out.waveform.shape == (3200, 1)
    np.testing.assert_allclose(out.waveform[:, 0], wave, atol=1e-3)


def test_audio_decoder_accepts_arrays_and_paths(tmp_path):
    dec = AudioDecoder()
    wave = np.zeros(1600, np.float32)
    out = dec(wave)
    assert out["waveform"].shape == (1600, 1)
    # stereo [2, T] -> [T, 2]
    out2 = dec(np.zeros((2, 1600), np.float32))
    assert out2["waveform"].shape == (1600, 2)
    p = tmp_path / "b.wav"
    write_wav(p, wave)
    assert dec(str(p))["waveform"].shape == (1600, 1)


def test_rel_pos_attention_shift_correctness():
    """Gather-based rel-pos term == brute-force per-pair computation."""
    cfg = ConformerConfig(model_dim=16, num_layers=1, num_heads=2, ffn_inner_dim=32,
                          depthwise_kernel_size=3)
    params = init_rel_pos_attention(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16))
    out = rel_pos_attention(params, x, None, cfg)
    assert out.shape == (1, 5, 16)

    # Brute force: compute scores with explicit R_{i-j} per pair.
    from sonar_tpu.nn.conformer import rel_pos_table
    from sonar_tpu.nn.core import linear
    from sonar_tpu.nn.transformer import _split_heads

    s, h, hd = 5, 2, 8
    q = _split_heads(linear(params["q_proj"], x), h)
    k = _split_heads(linear(params["k_proj"], x), h)
    r = linear(params["sdpa"]["r_proj"], rel_pos_table(s, 16)).reshape(2 * s - 1, h, hd)
    u = params["sdpa"]["u_bias"]
    v = params["sdpa"]["v_bias"]
    scores = np.zeros((1, h, s, s))
    for i in range(s):
        for j in range(s):
            ridx = (s - 1) - (i - j)
            for hh in range(h):
                ac = float(jnp.dot(q[0, hh, i] + u[hh], k[0, hh, j]))
                bd = float(jnp.dot(q[0, hh, i] + v[hh], r[ridx, hh]))
                scores[0, hh, i, j] = (ac + bd) / np.sqrt(hd)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    vv = _split_heads(linear(params["v_proj"], x), h)
    want = jnp.einsum("bhij,bhjd->bhid", probs, vv)
    want = want.transpose(0, 2, 1, 3).reshape(1, s, 16)
    want = linear(params["output_proj"], want)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_conformer_padding_invariance():
    cfg = ConformerConfig(model_dim=16, num_layers=2, num_heads=2, ffn_inner_dim=32,
                          depthwise_kernel_size=5)
    stacked = init_conformer_stack(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 16))
    lens = jnp.asarray([6, 10], jnp.int32)
    mask = length_mask(lens, 10)
    bias = additive_bias(mask)[:, None, None, :]

    y1 = conformer_stack(stacked, x, bias, mask, cfg)
    x2 = x.at[0, 6:].set(77.0)
    y2 = conformer_stack(stacked, x2, bias, mask, cfg)
    np.testing.assert_allclose(np.asarray(y1[0, :6]), np.asarray(y2[0, :6]), atol=1e-4)


def test_speech_encoder_forward_and_pipeline(tmp_path):
    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    fbank = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 8))
    out = model.apply(params, fbank, jnp.asarray([20, 12], jnp.int32))
    assert out.sentence_embeddings.shape == (2, 32)
    assert np.isfinite(np.asarray(out.sentence_embeddings)).all()

    # Full pipeline with 8-mel toy fbank over real wavs.
    from sonar_tpu.inference_pipelines.speech import (
        JitSpeechEncoder,
        SpeechToEmbeddingModelPipeline,
    )

    enc = JitSpeechEncoder(
        model, params, fbank_config=FbankConfig(num_mel_bins=8)
    )
    rng = np.random.default_rng(3)
    w1 = (rng.normal(size=8000) * 0.1).astype(np.float32)
    w2 = (rng.normal(size=12000) * 0.1).astype(np.float32)
    p1 = tmp_path / "w1.wav"
    write_wav(p1, w1)

    pipe = SpeechToEmbeddingModelPipeline(encoder=enc)
    emb = pipe.predict([str(p1), w2], batch_size=2)
    assert emb.shape == (2, 32)
    assert np.isfinite(emb).all()

    # Batching invariance: same wav alone or with another in the batch.
    solo = pipe.predict([str(p1)], batch_size=1)
    np.testing.assert_allclose(solo[0], emb[0], atol=2e-4)


def test_speech_pipeline_length_sort_restores_order():
    """Array inputs are batched length-sorted (similar durations share a
    batch) and results come back in input order."""
    from sonar_tpu.inference_pipelines.speech import (
        JitSpeechEncoder,
        SpeechToEmbeddingModelPipeline,
    )

    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    enc = JitSpeechEncoder(model, params,
                           fbank_config=FbankConfig(num_mel_bins=8))
    pipe = SpeechToEmbeddingModelPipeline(encoder=enc)
    rng = np.random.default_rng(5)
    waves = [(rng.normal(size=n) * 0.1).astype(np.float32)
             for n in (14000, 6000, 11000, 7000, 16000)]
    batched = pipe.predict(waves, batch_size=2)
    solo = np.concatenate(
        [pipe.predict([w], batch_size=1) for w in waves], axis=0
    )
    assert batched.shape == solo.shape == (5, 32)
    np.testing.assert_allclose(batched, solo, atol=2e-4)


def test_speech_to_text_pipeline(tmp_path):
    import dataclasses

    from helpers import build_toy_nllb

    from sonar_tpu.inference_pipelines.speech import (
        JitSpeechEncoder,
        SpeechToTextModelPipeline,
    )
    from sonar_tpu.models.sonar_text.config import sonar_text_decoder_archs
    from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder

    tok = build_toy_nllb(tmp_path)
    scfg = sonar_speech_encoder_archs.get("toy")
    smodel = SonarSpeechEncoder(scfg)
    sparams = smodel.init_params(jax.random.PRNGKey(0))
    enc = JitSpeechEncoder(smodel, sparams, fbank_config=FbankConfig(num_mel_bins=8))

    dcfg = dataclasses.replace(
        sonar_text_decoder_archs.get("toy"),
        model_dim=32,
        vocab_info=dataclasses.replace(
            sonar_text_decoder_archs.get("toy").vocab_info, size=len(tok.model)
        ),
    )
    dec = ConditionalTransformerDecoder(dcfg)
    dparams = dec.init_params(jax.random.PRNGKey(1))

    pipe = SpeechToTextModelPipeline(encoder=enc, decoder=(dec, dparams), tokenizer=tok)
    rng = np.random.default_rng(5)
    waves = [(rng.normal(size=6400) * 0.1).astype(np.float32) for _ in range(3)]
    texts = pipe.predict(waves, target_lang="eng_Latn", batch_size=2, max_seq_len=6)
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)


def test_speech_checkpoint_converter_structure(rng):
    """Synthetic fairseq1 w2v-BERT state -> params matching toy-init layout."""
    torch = pytest.importorskip("torch")
    from sonar_tpu.assets.checkpoint_speech import speech_encoder_params

    D, F, K, L, MEL = 32, 64, 7, 2, 8

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    state = {
        "encoder.w2v_model.mask_emb": t(D),
        "encoder.w2v_model.layer_norm.weight": t(MEL * 2),
        "encoder.w2v_model.layer_norm.bias": t(MEL * 2),
        "encoder.w2v_model.post_extract_proj.weight": t(D, MEL * 2),
        "encoder.w2v_model.post_extract_proj.bias": t(D),
        "encoder.w2v_model.encoder.layer_norm.weight": t(D),
        "encoder.w2v_model.encoder.layer_norm.bias": t(D),
        "decoder.embed_tokens.weight": t(D, D),
        "decoder.embed_out": t(D, D),
    }
    for i in range(L):
        p = f"encoder.w2v_model.encoder.layers.{i}"
        for f_ in ("ffn1", "ffn2"):
            state[f"{p}.{f_}.layer_norm.weight"] = t(D)
            state[f"{p}.{f_}.layer_norm.bias"] = t(D)
            state[f"{p}.{f_}.w_1.weight"] = t(F, D)
            state[f"{p}.{f_}.w_1.bias"] = t(F)
            state[f"{p}.{f_}.w_2.weight"] = t(D, F)
            state[f"{p}.{f_}.w_2.bias"] = t(D)
        state[f"{p}.self_attn_layer_norm.weight"] = t(D)
        state[f"{p}.self_attn_layer_norm.bias"] = t(D)
        for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
            state[f"{p}.self_attn.{proj}.weight"] = t(D, D)
            state[f"{p}.self_attn.{proj}.bias"] = t(D)
        state[f"{p}.self_attn.linear_pos.weight"] = t(D, D)
        state[f"{p}.self_attn.pos_bias_u"] = t(4, D // 4)
        state[f"{p}.self_attn.pos_bias_v"] = t(4, D // 4)
        state[f"{p}.conv_module.layer_norm.weight"] = t(D)
        state[f"{p}.conv_module.layer_norm.bias"] = t(D)
        state[f"{p}.conv_module.pointwise_conv1.weight"] = t(2 * D, D, 1)
        state[f"{p}.conv_module.depthwise_conv.weight"] = t(D, 1, K)
        state[f"{p}.conv_module.batch_norm.weight"] = t(D)
        state[f"{p}.conv_module.batch_norm.bias"] = t(D)
        state[f"{p}.conv_module.batch_norm.running_mean"] = t(D)
        state[f"{p}.conv_module.batch_norm.running_var"] = torch.abs(t(D)) + 0.5
        state[f"{p}.conv_module.batch_norm.num_batches_tracked"] = torch.tensor(7)
        state[f"{p}.conv_module.pointwise_conv2.weight"] = t(D, D, 1)
        state[f"{p}.final_layer_norm.weight"] = t(D)
        state[f"{p}.final_layer_norm.bias"] = t(D)
    for i in range(2):
        p = f"decoder.layers.{i}"
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                state[f"{p}.{attn}.{proj}.weight"] = t(D, D)
                state[f"{p}.{attn}.{proj}.bias"] = t(D)
            state[f"{p}.{attn}_layer_norm.weight"] = t(D)
            state[f"{p}.{attn}_layer_norm.bias"] = t(D)
        state[f"{p}.fc1.weight"] = t(F, D)
        state[f"{p}.fc1.bias"] = t(F)
        state[f"{p}.fc2.weight"] = t(D, F)
        state[f"{p}.fc2.bias"] = t(D)
        state[f"{p}.final_layer_norm.weight"] = t(D)
        state[f"{p}.final_layer_norm.bias"] = t(D)

    np_state = {k: v.numpy() for k, v in state.items()}
    params = speech_encoder_params(np_state)

    model = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    want = model.init_params(jax.random.PRNGKey(0))
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    want_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths

    # Converted params must run.
    fbank = jax.random.normal(jax.random.PRNGKey(2), (1, 12, MEL))
    out = model.apply(params, fbank, jnp.asarray([12], jnp.int32))
    assert np.isfinite(np.asarray(out.sentence_embeddings)).all()


def test_non_16k_wav_is_resampled(tmp_path):
    """A 32 kHz wav is resampled to 16 kHz before fbank/encoding."""
    from sonar_tpu.inference_pipelines.speech import SpeechModelPipelineInterface

    rng = np.random.default_rng(7)
    wave_32k = (rng.normal(size=32000) * 0.1).astype(np.float32)
    p = tmp_path / "hi.wav"
    write_wav(p, wave_32k, 32000)

    iface = SpeechModelPipelineInterface()
    wave = iface._decode_audio(str(p))
    assert abs(wave.shape[0] - 16000) <= 2  # 1 second at 16 kHz


def test_fbank_dtype_honored(tmp_path):
    """fbank_dtype parity (reference speech.py:289,346-349): half precision
    maps to bf16 features on TPU and changes the computed embedding dtype
    path; fp32 default unchanged; bogus dtype rejected."""
    import pytest as _pytest

    from sonar_tpu.inference_pipelines.speech import (
        JitSpeechEncoder,
        SpeechToEmbeddingModelPipeline,
        _normalize_fbank_dtype,
    )

    assert _normalize_fbank_dtype(None) is None
    assert _normalize_fbank_dtype("float16") == jnp.bfloat16
    assert _normalize_fbank_dtype(np.float32) == jnp.float32
    with _pytest.raises(ValueError):
        _normalize_fbank_dtype("int8")

    cfg = sonar_speech_encoder_archs.get("toy")
    model = SonarSpeechEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    enc = JitSpeechEncoder(model, params, fbank_config=FbankConfig(num_mel_bins=8))
    pipe = SpeechToEmbeddingModelPipeline(encoder=enc, fbank_dtype="float16")
    assert enc.fbank_dtype == jnp.bfloat16

    rng = np.random.default_rng(0)
    emb = pipe.predict([(rng.normal(size=8000) * 0.1).astype(np.float32)],
                       batch_size=1)
    assert emb.shape == (1, 32) and np.isfinite(emb).all()
