"""Short-sequence fused QKV attention kernel vs sdpa_xla (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from sonar_tpu.ops.attention import sdpa_xla
from sonar_tpu.ops.pallas.short_attn import short_qkv_attention


def _ref(qkv, bias, num_heads):
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def split(t):
        return t.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)
    bias4 = None if bias is None else bias[:, None, None, :]
    out = sdpa_xla(split(q), split(k), split(v), bias=bias4)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)


def test_short_attn_matches_sdpa():
    rng = np.random.default_rng(0)
    b, s, h, dh = 3, 32, 4, 64
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * h * dh)) * 0.3, jnp.float32)
    lens = np.asarray([32, 17, 5])
    bias = jnp.asarray(
        np.where(np.arange(s)[None, :] < lens[:, None], 0.0, -1e30), jnp.float32
    )
    got = short_qkv_attention(qkv, bias, h, interpret=True)
    want = _ref(qkv, bias, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_short_attn_no_bias_bf16():
    rng = np.random.default_rng(1)
    b, s, h, dh = 2, 24, 8, 32
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * h * dh)) * 0.3, jnp.bfloat16)
    got = short_qkv_attention(qkv, None, h, interpret=True)
    want = _ref(qkv, None, h)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )
