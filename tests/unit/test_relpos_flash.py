"""Fused rel-pos attention kernel vs the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.ops.pallas.relpos_flash import relpos_flash_attention


def _shift(bd_full):
    b, h, s, _ = bd_full.shape
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]
    idx = (s - 1) - rows + cols
    return jnp.take_along_axis(bd_full, jnp.broadcast_to(idx, (b, h, s, s)), axis=3)


def _reference(q, k, v, bd, u, key_bias, scale):
    ac = jnp.einsum("bhid,bhjd->bhij", q + u[None, :, None, :], k)
    scores = (ac + bd) * scale
    if key_bias is not None:
        scores = scores + key_bias[:, None, None, :]
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p, v)


@pytest.mark.parametrize("s,q_block", [(128, 128), (130, 128), (256, 128), (96, 128)])
def test_relpos_flash_matches_reference(s, q_block):
    rng = jax.random.PRNGKey(0)
    b, h, dh = 2, 2, 64
    mk = lambda i, shape: jax.random.normal(jax.random.fold_in(rng, i), shape) * 0.5
    q, k, v = mk(1, (b, h, s, dh)), mk(2, (b, h, s, dh)), mk(3, (b, h, s, dh))
    r = mk(4, (h, 2 * s - 1, dh))
    u = mk(5, (h, dh))
    vb = mk(6, (h, dh))
    bd = _shift(jnp.einsum("bhid,hpd->bhip", q + vb[None, :, None, :], r))
    lens = jnp.asarray([s, max(1, s // 2)], jnp.int32)
    key_bias = jnp.where(
        jnp.arange(s)[None, :] < lens[:, None], 0.0, jnp.finfo(jnp.float32).min
    )

    want = _reference(q, k, v, bd, u, key_bias, dh ** -0.5)
    got = relpos_flash_attention(q, k, v, bd, u, key_bias, q_block=q_block,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("s", [128, 130, 257])
def test_conformer_kernel_path_matches_xla_in_interpret(s):
    """Force the kernel path on CPU via interpret monkey-patching and compare
    whole-block outputs with the XLA path, incl. ragged lengths (the kernel
    pads S to the q-block and masks via key_bias) and a padded batch."""
    from jax.experimental import pallas as pl

    import sonar_tpu.nn.conformer as C
    from sonar_tpu.ops import attention as A
    from sonar_tpu.ops.masks import additive_bias, length_mask

    cfg = C.ConformerConfig(model_dim=128, num_layers=1, num_heads=2,
                            ffn_inner_dim=64, depthwise_kernel_size=5)
    params = C.init_rel_pos_attention(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, s, 128))
    lens = jnp.asarray([s, max(1, s - 37)], jnp.int32)
    bias = additive_bias(length_mask(lens, s))[:, None, None, :]

    want = C.rel_pos_attention(params, x, bias, cfg)  # XLA (cpu backend)

    orig_call = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_call(*args, **kwargs)

    pl.pallas_call = patched
    A.set_attention_impl("pallas")
    try:
        got = C.rel_pos_attention(params, x, bias, cfg)
    finally:
        pl.pallas_call = orig_call
        A.set_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
