"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.ops.attention import sdpa_xla
from sonar_tpu.ops.masks import additive_bias, length_mask


def _pallas_interpret(q, k, v, bias):
    """Run the kernel in interpreter mode (no TPU needed)."""
    from jax.experimental import pallas as pl

    import sonar_tpu.ops.pallas.flash as flash

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    pl.pallas_call = patched
    try:
        return flash.pallas_flash_attention.__wrapped__(q, k, v, bias=bias)
    finally:
        pl.pallas_call = orig


@pytest.mark.parametrize("sq,skv", [(128, 128), (256, 130), (130, 256)])
def test_flash_matches_xla(sq, skv):
    rng = jax.random.PRNGKey(0)
    b, h, dh = 2, 4, 64
    q = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, sq, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, skv, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, skv, dh), jnp.float32)
    lens = jnp.asarray([skv, skv // 2], jnp.int32)
    bias = additive_bias(length_mask(lens, skv))[:, None, None, :]

    want = sdpa_xla(q, k, v, bias=bias)
    got = _pallas_interpret(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_full_block_diagonal_bias():
    """Packed-mode bias [B, 1, Sq, Skv] (block-diagonal segments)."""
    rng = jax.random.PRNGKey(3)
    b, h, s, dh = 2, 2, 128, 64
    q = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, s, dh))
    k = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, s, dh))
    v = jax.random.normal(jax.random.fold_in(rng, 3), (b, h, s, dh))
    seg = jnp.asarray(
        np.repeat(np.arange(1, 5), s // 4)[None, :].repeat(b, 0)
    )
    mask = (seg[:, :, None] == seg[:, None, :])
    bias = additive_bias(mask)[:, None, :, :]

    want = sdpa_xla(q, k, v, bias=bias)
    got = _pallas_interpret(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_no_bias():
    rng = jax.random.PRNGKey(7)
    q = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2, 128, 64))
    k = jax.random.normal(jax.random.fold_in(rng, 2), (1, 2, 128, 64))
    v = jax.random.normal(jax.random.fold_in(rng, 3), (1, 2, 128, 64))
    want = sdpa_xla(q, k, v)
    got = _pallas_interpret(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
