"""Pooling semantics (counterpart of reference tests/unit_tests/test_sonar_pooling.py)."""

import jax.numpy as jnp
import numpy as np

from sonar_tpu.nn.pooling import Pooling, static_pool


def _data():
    rng = np.random.default_rng(42)
    seqs = jnp.asarray(rng.normal(size=(3, 5, 4)).astype(np.float32))
    seq_lens = jnp.asarray([5, 3, 1], jnp.int32)
    return seqs, seq_lens


def test_mean_pooling_masked():
    seqs, seq_lens = _data()
    out = static_pool(seqs, seq_lens, Pooling.MEAN)
    ref = np.stack(
        [
            np.asarray(seqs)[i, : int(seq_lens[i])].sum(0) / (float(seq_lens[i]) + 1e-7)
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_mean_pooling_no_mask_uses_full_length_epsilon():
    seqs, _ = _data()
    out = static_pool(seqs, None, Pooling.MEAN)
    ref = np.asarray(seqs).sum(1) * (1.0 / (5.0 + 1e-7))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_max_pooling_masked():
    seqs, seq_lens = _data()
    out = static_pool(seqs, seq_lens, Pooling.MAX)
    ref = np.stack(
        [np.asarray(seqs)[i, : int(seq_lens[i])].max(0) for i in range(3)]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_last_pooling_masked_and_unmasked():
    seqs, seq_lens = _data()
    out = static_pool(seqs, seq_lens, Pooling.LAST)
    ref = np.stack(
        [np.asarray(seqs)[i, int(seq_lens[i]) - 1] for i in range(3)]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)

    out2 = static_pool(seqs, None, Pooling.LAST)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(seqs)[:, -1], rtol=1e-6)


def test_pooling_ignores_pad_values():
    seqs, seq_lens = _data()
    junk = jnp.where(
        (jnp.arange(5)[None, :, None] < seq_lens[:, None, None]), seqs, 1e9
    )
    for pooling in (Pooling.MEAN, Pooling.MAX, Pooling.LAST):
        a = static_pool(seqs, seq_lens, pooling)
        b = static_pool(junk, seq_lens, pooling)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
