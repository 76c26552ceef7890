"""Transformer stack invariants: masking, norm orders, incremental parity."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.nn.transformer import (
    AttentionSpec,
    decoder_stack,
    decoder_step,
    init_decoder_cache,
    init_decoder_layer,
    init_encoder_layer,
    encoder_stack,
    stack_layers,
)
from sonar_tpu.ops.masks import additive_bias, causal_mask, combine_masks, length_mask

DIM, HEADS, FFN, LAYERS = 16, 4, 32, 3


def _enc_params(rng):
    spec = AttentionSpec(DIM, HEADS)
    return stack_layers(
        [init_encoder_layer(r, spec, FFN) for r in jax.random.split(rng, LAYERS)]
    )


def _dec_params(rng, kv_dim=None):
    self_spec = AttentionSpec(DIM, HEADS)
    cross_spec = AttentionSpec(DIM, HEADS, kv_dim=kv_dim)
    return stack_layers(
        [
            init_decoder_layer(r, self_spec, cross_spec, FFN)
            for r in jax.random.split(rng, LAYERS)
        ]
    )


def test_encoder_padding_invariance():
    """Outputs at valid positions must not depend on values in padded slots."""
    params = _enc_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, DIM))
    lens = jnp.asarray([5, 8], jnp.int32)
    bias = additive_bias(length_mask(lens, 8))[:, None, None, :]

    y1 = encoder_stack(params, x, bias, HEADS, "relu")
    x2 = x.at[0, 5:].set(123.0)
    y2 = encoder_stack(params, x2, bias, HEADS, "relu")
    np.testing.assert_allclose(np.asarray(y1[0, :5]), np.asarray(y2[0, :5]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1[1]), np.asarray(y2[1]), atol=1e-5)


def test_norm_orders_differ():
    params = _enc_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, DIM))
    y_pre = encoder_stack(params, x, None, HEADS, "relu", norm_order="pre")
    y_post = encoder_stack(params, x, None, HEADS, "relu", norm_order="post")
    assert not np.allclose(np.asarray(y_pre), np.asarray(y_post))


def test_decoder_incremental_matches_full():
    """Step-by-step decode with KV cache == full causal decode."""
    rng = jax.random.PRNGKey(0)
    params = _dec_params(rng)
    b, s = 2, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, DIM))
    memory = jax.random.normal(jax.random.PRNGKey(2), (b, 1, DIM))

    causal = causal_mask(s, s)[None, None, :, :]
    self_bias = additive_bias(causal)
    full = decoder_stack(params, x, self_bias, memory, None, HEADS, "relu")

    cache = init_decoder_cache(params, memory, HEADS, max_len=s, batch=b,
                               model_dim=DIM, dtype=jnp.float32)
    outs = []
    for t in range(s):
        y, cache = decoder_step(params, x[:, t : t + 1], cache, None, HEADS, "relu")
        outs.append(y)
    step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step), atol=1e-4)


def test_decoder_incremental_matches_full_long_memory():
    """Generic incremental path (memory length > 1, masked): the length-1
    cross-attention collapse (DecoderCache.cross_out) must NOT engage, and
    per-step cross attention over a padded memory must match the full
    decode."""
    params = _dec_params(jax.random.PRNGKey(6))
    b, s, s_mem = 2, 5, 3
    x = jax.random.normal(jax.random.PRNGKey(7), (b, s, DIM))
    memory = jax.random.normal(jax.random.PRNGKey(8), (b, s_mem, DIM))
    mem_lens = jnp.asarray([3, 2], jnp.int32)
    memory_bias = additive_bias(length_mask(mem_lens, s_mem))[:, None, None, :]

    self_bias = additive_bias(causal_mask(s, s)[None, None, :, :])
    full = decoder_stack(
        params, x, self_bias, memory, memory_bias, HEADS, "relu"
    )

    cache = init_decoder_cache(params, memory, HEADS, max_len=s, batch=b,
                               model_dim=DIM, dtype=jnp.float32)
    assert cache.cross_out is None and cache.cross_k.shape[-2] == s_mem
    outs = []
    for t in range(s):
        y, cache = decoder_step(
            params, x[:, t : t + 1], cache, memory_bias, HEADS, "relu"
        )
        outs.append(y)
    step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step), atol=1e-4)


def test_length1_cross_collapse_sets_cross_out():
    """init_decoder_cache precomputes the cross constant for length-1 memory
    and a step with memory_bias then raises."""
    import pytest

    params = _dec_params(jax.random.PRNGKey(9))
    memory = jax.random.normal(jax.random.PRNGKey(10), (2, 1, DIM))
    cache = init_decoder_cache(params, memory, HEADS, max_len=4, batch=2,
                               model_dim=DIM, dtype=jnp.float32)
    assert cache.cross_out is not None
    assert cache.cross_out.shape == (LAYERS, 2, 1, DIM)
    assert cache.cross_k.shape[-2] == 0
    bias = jnp.zeros((2, 1, 1, 1), jnp.float32)
    with pytest.raises(ValueError, match="length-1"):
        decoder_step(params, memory * 0.0, cache, bias, HEADS, "relu")


def test_cross_attention_kv_dim():
    params = _dec_params(jax.random.PRNGKey(3), kv_dim=24)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, DIM))
    memory = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 24))
    out = decoder_stack(params, x, None, memory, None, HEADS, "relu")
    assert out.shape == (2, 3, DIM)


def test_causal_and_padding_mask_combination():
    m = combine_masks(
        causal_mask(4, 4)[None, None], length_mask(jnp.asarray([2]), 4)[:, None, None, :]
    )
    got = np.asarray(m[0, 0])
    assert got[3, 1] and not got[3, 2] and not got[0, 1]
