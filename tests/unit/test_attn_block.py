"""Whole-block attention kernel vs the XLA int8 composition (interpret)."""

import jax.numpy as jnp
import numpy as np

from sonar_tpu.ops.attention import sdpa_xla
from sonar_tpu.ops.pallas.attn_block import fused_attn_block
from sonar_tpu.ops.quantization import int8_linear, quantize_kernel


def _ref_block(x, bias_rows, lnw, lnb, wqkv_q, sqkv, bqkv, wo_q, so, bo, h):
    """x + O(attn(QKV(LN(x)))) using the independent XLA int8 pieces."""
    b, s, d = x.shape
    dh = d // h
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    hidden = ((x32 - mean) / jnp.sqrt(var + 1e-5)) * lnw + lnb
    qkv = int8_linear(
        {"kernel_q": wqkv_q, "scale": sqkv, "bias": bqkv},
        hidden.astype(jnp.float32),
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda t: t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    bias4 = None if bias_rows is None else bias_rows[:, None, None, :]
    out = sdpa_xla(split(q), split(k), split(v), bias=bias4)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    proj = int8_linear({"kernel_q": wo_q, "scale": so, "bias": bo}, out)
    return x32 + proj


def test_attn_block_matches_xla_composition():
    rng = np.random.default_rng(0)
    b, s, h, dh = 4, 16, 2, 64
    d = h * dh
    x = jnp.asarray(rng.normal(size=(b, s, d)) * 0.5, jnp.float32)
    lens = np.asarray([16, 9, 3, 16])
    bias = jnp.asarray(
        np.where(np.arange(s)[None, :] < lens[:, None], 0.0, -1e30), jnp.float32
    )
    lnw = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    wqkv_q, sqkv = quantize_kernel(jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32))
    bqkv = jnp.asarray(rng.normal(size=(3 * d,)) * 0.05, jnp.float32)
    wo_q, so = quantize_kernel(jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32))
    bo = jnp.asarray(rng.normal(size=(d,)) * 0.05, jnp.float32)

    got = fused_attn_block(
        x, bias, lnw, lnb, wqkv_q, sqkv, bqkv, wo_q, so, bo,
        num_heads=h, block_b=2, interpret=True,
    )
    want = _ref_block(x, bias, lnw, lnb, wqkv_q, sqkv, bqkv, wo_q, so, bo, h)
    scale = float(np.abs(np.asarray(want)).max())
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.02 * scale
    )


def test_attn_block_batch_padding():
    """b not divisible by block_b: padded rows must not leak into output."""
    rng = np.random.default_rng(1)
    b, s, h, dh = 3, 8, 2, 64
    d = h * dh
    x = jnp.asarray(rng.normal(size=(b, s, d)) * 0.5, jnp.bfloat16)
    lnw = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    wqkv_q, sqkv = quantize_kernel(jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.05, jnp.float32))
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wo_q, so = quantize_kernel(jnp.asarray(rng.normal(size=(d, d)) * 0.05, jnp.float32))
    bo = jnp.zeros((d,), jnp.float32)

    full = fused_attn_block(x, None, lnw, lnb, wqkv_q, sqkv, bqkv, wo_q, so,
                            bo, num_heads=h, block_b=2, interpret=True)
    assert full.shape == (3, s, d)
    solo = fused_attn_block(x[2:3], None, lnw, lnb, wqkv_q, sqkv, bqkv, wo_q,
                            so, bo, num_heads=h, block_b=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(full[2], np.float32), np.asarray(solo[0], np.float32),
        atol=2e-2,
    )
