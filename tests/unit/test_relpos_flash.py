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


from functools import partial


@partial(jax.jit, static_argnames=("s",))
def _build_inputs(s):
    """All test inputs in ONE compiled program (eager building cost one
    XLA compile per random draw / op, ~10 per parametrization)."""
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
    return q, k, v, bd, u, key_bias


_reference_jit = jax.jit(_reference, static_argnames=("scale",))


@pytest.mark.parametrize("s,q_block", [(128, 128), (130, 128), (256, 128), (96, 128)])
def test_relpos_flash_matches_reference(s, q_block):
    b, h, dh = 2, 2, 64
    q, k, v, bd, u, key_bias = _build_inputs(s)

    want = _reference_jit(q, k, v, bd, u, key_bias, scale=dh ** -0.5)
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

    # Fresh jax.jit wrapper PER CALL: one compile each instead of ~20 eager
    # op dispatches — and separate caches, so the pallas-forced second call
    # cannot reuse the XLA-path program traced by the first.
    want = jax.jit(C.rel_pos_attention, static_argnames="cfg")(
        params, x, bias, cfg=cfg
    )  # XLA (cpu backend)

    orig_call = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig_call(*args, **kwargs)

    pl.pallas_call = patched
    A.set_attention_impl("pallas")
    try:
        got = jax.jit(C.rel_pos_attention, static_argnames="cfg")(
            params, x, bias, cfg=cfg
        )
    finally:
        pl.pallas_call = orig_call
        A.set_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_relpos_kernel_gate_bounds():
    """Shape-aware dispatch: the v2 kernel keeps the whole [S, D] basis in
    VMEM, so long clips (S > 2048) must auto-fall back to the XLA
    trig-factored lowering, and the kernel's key mask only represents a
    broadcastable [B, 1, 1, S] bias."""
    import sonar_tpu.nn.conformer as C
    from sonar_tpu.ops import attention as A

    x = jnp.zeros((1, 1, 1))
    A.set_attention_impl("pallas")
    try:
        assert C._use_relpos_kernel(x, None, 512, 64)
        assert C._use_relpos_kernel(x, None, 2048, 64)
        assert not C._use_relpos_kernel(x, None, 2049, 64)
        assert not C._use_relpos_kernel(x, None, 3000, 64)  # 60 s clip
        assert not C._use_relpos_kernel(x, None, 64, 64)
        bias_key = jnp.zeros((2, 1, 1, 512))
        bias_heads = jnp.zeros((2, 4, 1, 512))
        assert C._use_relpos_kernel(x, bias_key, 512, 64)
        assert not C._use_relpos_kernel(x, bias_heads, 512, 64)
        with A.no_tpu_kernels():
            assert not C._use_relpos_kernel(x, None, 512, 64)
    finally:
        A.set_attention_impl("auto")


def test_long_clip_rel_pos_attention_falls_back(monkeypatch):
    """S past the kernel envelope encodes via the XLA lowering even when the
    kernel impl is forced — no manual set_attention_impl needed. Any attempt
    to build the kernel would trip the sentinel."""
    import sonar_tpu.nn.conformer as C
    import sonar_tpu.ops.pallas.relpos_flash as RF
    from sonar_tpu.ops import attention as A
    from sonar_tpu.ops.masks import additive_bias, length_mask

    def boom(*a, **k):  # pragma: no cover - sentinel
        raise AssertionError("kernel path must not dispatch past S=2048")

    monkeypatch.setattr(RF, "relpos_flash_attention_v2", boom)

    s = 2176  # > 2048, past the VMEM envelope
    cfg = C.ConformerConfig(model_dim=128, num_layers=1, num_heads=2,
                            ffn_inner_dim=64, depthwise_kernel_size=5)
    params = C.init_rel_pos_attention(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, s, 128)) * 0.5
    bias = additive_bias(length_mask(jnp.asarray([s - 100], jnp.int32), s))
    bias = bias[:, None, None, :]

    A.set_attention_impl("pallas")
    try:
        got = jax.jit(C.rel_pos_attention, static_argnames="cfg")(
            params, x, bias, cfg=cfg
        )
    finally:
        A.set_attention_impl("auto")
    assert got.shape == (1, s, 128)
    assert bool(np.isfinite(np.asarray(got)).all())
