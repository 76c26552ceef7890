"""SONAR text encoder / conditional decoder structural + invariance tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.models.sonar_text import (
    SonarTextEncoder,
    sonar_text_decoder_archs,
    sonar_text_encoder_archs,
)
from sonar_tpu.nn.conditional_decoder import ConditionalTransformerDecoder


def test_toy_encoder_forward_shapes():
    cfg = sonar_text_encoder_archs.get("toy")
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    seqs = jnp.asarray([[2, 5, 6, 3, 1, 1], [2, 7, 3, 1, 1, 1]], jnp.int32)
    lens = jnp.asarray([4, 3], jnp.int32)
    out = model.apply(params, seqs, lens)
    assert out.encoded_seqs.shape == (2, 6, cfg.model_dim)
    assert out.sentence_embeddings.shape == (2, cfg.model_dim)
    assert np.isfinite(np.asarray(out.sentence_embeddings)).all()


def test_encoder_batching_invariance():
    """Same sentence embedded alone or in a padded batch -> same embedding."""
    cfg = sonar_text_encoder_archs.get("toy")
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    seq = [2, 5, 6, 9, 3]
    single = model.apply(
        params, jnp.asarray([seq], jnp.int32), jnp.asarray([5], jnp.int32)
    ).sentence_embeddings

    padded = jnp.asarray([seq + [1, 1, 1], [2, 7, 3, 1, 1, 1, 1, 1]], jnp.int32)
    batched = model.apply(
        params, padded, jnp.asarray([5, 3], jnp.int32)
    ).sentence_embeddings

    np.testing.assert_allclose(
        np.asarray(single[0]), np.asarray(batched[0]), atol=1e-5
    )


def test_attention_pooling_encoder():
    cfg = dataclasses.replace(
        sonar_text_encoder_archs.get("toy"), pooling="attention", embedding_dim=24
    )
    model = SonarTextEncoder(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    seqs = jnp.asarray([[2, 5, 3, 1]], jnp.int32)
    out = model.apply(params, seqs, jnp.asarray([3], jnp.int32))
    assert out.sentence_embeddings.shape == (1, 24)


def test_toy_decoder_full_vs_incremental():
    cfg = sonar_text_decoder_archs.get("toy")
    dec = ConditionalTransformerDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))

    b, s = 2, 5
    seqs = jnp.asarray([[3, 2, 10, 11, 12], [3, 2, 20, 21, 22]], jnp.int32)
    memory = jax.random.normal(jax.random.PRNGKey(1), (b, 1, cfg.model_dim))

    full_logits = dec.forward(params, seqs, None, memory)
    assert full_logits.shape == (b, s, cfg.vocab_info.size)

    cache = dec.init_cache(params, memory, max_len=s)
    step_logits = []
    for t in range(s):
        logits, cache = dec.step(params, seqs[:, t], cache)
        step_logits.append(logits)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(step_logits), atol=1e-4
    )


def test_decoder_tied_projection():
    """Logits must be produced by the embedding matrix (tied weights)."""
    cfg = sonar_text_decoder_archs.get("toy")
    dec = ConditionalTransformerDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    h = jax.random.normal(jax.random.PRNGKey(2), (1, 1, cfg.model_dim))
    logits = dec.project(params, h)
    want = np.asarray(h) @ np.asarray(
        params["decoder_frontend"]["embed"]["weight"]
    ).T
    np.testing.assert_allclose(np.asarray(logits), want, atol=1e-4)


def test_low_dim_decoder_with_distinct_input_dim():
    cfg = dataclasses.replace(sonar_text_decoder_archs.get("toy"), input_dim=16)
    dec = ConditionalTransformerDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    memory = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16))
    logits = dec.forward(params, jnp.asarray([[3, 2]], jnp.int32), None, memory)
    assert logits.shape == (1, 2, cfg.vocab_info.size)
