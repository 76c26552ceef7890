"""Int8 quantized inference: kernel math oracle + embedding quality."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.models.sonar_text import SonarTextEncoder, sonar_text_encoder_archs
from sonar_tpu.ops.quantization import int8_linear, quantize_params_int8


def test_int8_linear_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(3, 16)).astype(np.float32)

    params = quantize_params_int8({"q_proj": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}})["q_proj"]
    got = np.asarray(int8_linear(params, jnp.asarray(x)))

    # independent numpy quantization
    sw = np.maximum(np.abs(w).max(axis=0, keepdims=True) / 127.0, 1e-12)
    wq = np.clip(np.round(w / sw), -127, 127)
    sx = np.maximum(np.abs(x).max(axis=1, keepdims=True) / 127.0, 1e-12)
    xq = np.clip(np.round(x / sx), -127, 127)
    want = (xq @ wq) * sx * sw + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # error vs exact fp well-bounded
    exact = x @ w + b
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 0.05


def test_quantized_encoder_embedding_quality():
    """Toy encoder: int8 embeddings stay close to fp32 (cosine >= 0.99)."""
    model = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    qparams = quantize_params_int8(params)

    seqs = jnp.asarray([[2, 5, 6, 9, 3, 1], [2, 7, 8, 3, 1, 1]], jnp.int32)
    lens = jnp.asarray([5, 4], jnp.int32)
    a = np.asarray(model.apply(params, seqs, lens).sentence_embeddings)
    b = np.asarray(model.apply(qparams, seqs, lens).sentence_embeddings)
    cos = (a * b).sum(axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    assert (cos >= 0.99).all(), cos


def test_quantize_skips_layernorm_and_embed():
    model = SonarTextEncoder(sonar_text_encoder_archs.get("toy"))
    params = quantize_params_int8(model.init_params(jax.random.PRNGKey(0)))
    assert "weight" in params["layer_norm"]
    assert params["encoder_frontend"]["embed"]["weight"].dtype == jnp.float32
    layer_attn = params["encoder"]["layers"]["self_attn"]["q_proj"]
    assert layer_attn["kernel_q"].dtype == jnp.int8
    assert "kernel" not in layer_attn


def test_quantized_speech_encoder_quality():
    import jax
    import jax.numpy as jnp

    from sonar_tpu.models.sonar_speech import (
        SonarSpeechEncoder,
        sonar_speech_encoder_archs,
    )

    model = SonarSpeechEncoder(sonar_speech_encoder_archs.get("toy"))
    params = model.init_params(jax.random.PRNGKey(0))
    qparams = quantize_params_int8(params)
    fbank = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 8))
    lens = jnp.asarray([24, 16], jnp.int32)
    a = np.asarray(model.apply(params, fbank, lens).sentence_embeddings)
    b = np.asarray(model.apply(qparams, fbank, lens).sentence_embeddings)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    assert (cos >= 0.98).all(), cos
