"""Sinusoidal PE numerics vs an independent fairseq1-formula oracle."""

import math

import jax.numpy as jnp
import numpy as np

from sonar_tpu.nn.position import SinusoidalPositionEncoder, sinusoidal_table


def _oracle_table(max_len: int, dim: int) -> np.ndarray:
    """fairseq1 SinusoidalPositionalEmbedding.get_embedding, re-derived."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    inv = np.exp(np.arange(half, dtype=np.float64) * -emb)
    args = np.arange(max_len, dtype=np.float64)[:, None] * inv[None, :]
    out = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        out = np.concatenate([out, np.zeros((max_len, 1))], axis=1)
    return out.astype(np.float32)


def test_table_matches_fairseq1_formula():
    for dim in (8, 16, 1024):
        got = np.asarray(sinusoidal_table(64, dim))
        want = _oracle_table(64, dim)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_odd_dim_pads_zero_column():
    table = np.asarray(sinusoidal_table(10, 7))
    assert table.shape == (10, 7)
    np.testing.assert_array_equal(table[:, -1], np.zeros(10))


def test_legacy_pad_offset():
    """With legacy pad_idx=1, token position t reads table row t+2."""
    enc = SinusoidalPositionEncoder(16, max_seq_len=20, legacy_pad_idx=1)
    x = jnp.zeros((1, 4, 16))
    out = np.asarray(enc(x))[0]
    want = _oracle_table(20, 16)[2:6]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_step_offset_for_incremental_decoding():
    enc = SinusoidalPositionEncoder(16, max_seq_len=20, legacy_pad_idx=1)
    x = jnp.zeros((1, 1, 16))
    out = np.asarray(enc(x, step=jnp.asarray(3)))[0, 0]
    want = _oracle_table(20, 16)[5]
    np.testing.assert_allclose(out, want, atol=1e-5)
